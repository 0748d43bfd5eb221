package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.gen.Synthetic

/** Multi-day ETL replay at corpus scale (VERDICT r12 "what's missing" #2):
  * N consecutive `--today` runs of the REAL [[graft.pipeline.EtlRun]]
  * against one ACCUMULATING warehouse — dims re-versioning daily, facts
  * and audit logs appending daily — recording per-day wall and per-stage
  * job time, so the flat-vs-growing question is answered by an artifact
  * instead of a two-day fixture test.
  *
  * The daily raw inputs follow the reference's OLTP drift model
  * (populate.py change_existent_users/products + fresh transactions):
  * each day mutates a seeded ~2% of users and products (SCD2 re-version
  * triggers), decrements stock by the previous day's successful sales
  * (stock-history change rows), and appends a fresh block of transactions
  * with globally unique ids. Input staging is UNTIMED; the timed region is
  * exactly `EtlRun.run(day)` (eager — every stage write happens inside).
  *
  * Growth expectations to check against the artifact (all by design):
  *  - dim_user/dim_product snapshot rewrite: current rows + ~2%/day closed
  *    versions → linear in days but tiny slope (the SCD2 full-snapshot
  *    rewrite is the suspect the verdict named);
  *  - fact_transactions anti-join (J5: id-only vs the WHOLE target, the
  *    reference's re-run contract): scan grows linearly with loaded days;
  *  - fact_stock_history current-flag probe (J2/P2): table grows by the
  *    day's changed products only.
  *
  * Usage: tools/run_main.sh graft.tools.EtlReplayBench
  *   env SPARK_GRAFT_DAYS      (default 30)
  *       SPARK_GRAFT_USERS     (default 500000)
  *       SPARK_GRAFT_PRODUCTS  (default 50000)
  *       SPARK_GRAFT_TX_PER_DAY(default 2000000)  ≈ sf10 facts over 30 days
  *       SPARK_GRAFT_CPUS      (default 32)
  *       SPARK_GRAFT_OUT       (default /root/repo/BENCH_etl_replay_sf10.json)
  */
object EtlReplayBench {

  def main(args: Array[String]): Unit = {
    val days = sys.env.getOrElse("SPARK_GRAFT_DAYS", "30").toInt
    val nUsers = sys.env.getOrElse("SPARK_GRAFT_USERS", "500000").toInt
    val nProducts = sys.env.getOrElse("SPARK_GRAFT_PRODUCTS", "50000").toInt
    val txPerDay = sys.env.getOrElse("SPARK_GRAFT_TX_PER_DAY", "2000000").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val outPath = sys.env.getOrElse("SPARK_GRAFT_OUT", "/root/repo/BENCH_etl_replay_sf10.json")

    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // the daily increment is MB-scale: per-job core-count AQE start is
      // the posture q180 adopted for exactly this job shape (VERDICT r11
      // #3); a replay session runs nothing else, so it is session-global
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // per-stage attribution: EtlRun labels each phase's jobs "etl:<stage>"
    val active = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val stageMs = new java.util.concurrent.ConcurrentHashMap[String, java.util.concurrent.atomic.AtomicLong]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val desc = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description"))).getOrElse("")
        if (desc.startsWith("etl:")) active.put(js.jobId, (js.time, desc.stripPrefix("etl:")))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit =
        Option(active.remove(je.jobId)).foreach { case (t0, stage) =>
          stageMs.computeIfAbsent(stage, _ => new java.util.concurrent.atomic.AtomicLong())
            .addAndGet(je.time - t0): Unit
        }
    })

    val wh = java.nio.file.Files.createTempDirectory("graft_etl_replay").toFile
    sys.addShutdownHook {
      def rm(f: java.io.File): Unit = { if (f.isDirectory) f.listFiles().foreach(rm); f.delete(): Unit }
      rm(wh)
    }
    def path(t: String) = s"$wh/$t"
    def day(d: Int) = java.time.LocalDate.parse("2025-03-01").plusDays(d.toLong).toString

    val etl = new graft.pipeline.EtlRun(spark, wh.toString)
    val perDay = Vector.newBuilder[String]

    for (d <- 0 until days) {
      val today = day(d)

      // ---- UNTIMED input staging: the OLTP side drifts, the ETL ingests.
      // users/products: day 0 generates the base; later days mutate a
      // seeded ~2% of the PREVIOUS raw snapshot (read back from the
      // warehouse so the lineage stays one mutation deep, not d deep).
      val (users, products) =
        if (d == 0)
          (Synthetic.users(spark, nUsers), Synthetic.products(spark, nProducts))
        else {
          val prevU = spark.read.schema(graft.schemas.Schemas.users).parquet(path("users"))
          val prevP = spark.read.schema(graft.schemas.Schemas.products).parquet(path("products"))
          val prevTx = spark.read.schema(graft.schemas.Schemas.transactions)
            .parquet(path("transactions")).filter(col("date") === day(d - 1))
          // product drift re-versions dim_product via NAME (not price:
          // Synthetic.transactions prices off the base formula, so price
          // drift would flood price_mismatch warnings that the reference's
          // catalog-consistent OLTP never produces); stock drifts via +10
          // restocks and the previous day's sales decrements
          val drifted = prevP
            .withColumn("__r", Synthetic.rnd(s"mp$d", col("product_id")))
            .withColumn("name", when(col("__r") < 0.01,
              concat(col("name"), lit(s" v$d"))).otherwise(col("name")))
            .withColumn("stock", when(col("__r") >= 0.01 && col("__r") < 0.02,
              col("stock") + 10).otherwise(col("stock")))
            .drop("__r")
          (Synthetic.mutateUsers(prevU, 0.02, tag = s"mu$d"),
            Synthetic.applyStockDecrements(drifted, prevTx))
        }
      // overwrite via a temp dir: the source frames READ the same paths
      // they replace, so materialize first, then swap
      Seq("users" -> users, "products" -> products).foreach { case (t, df) =>
        df.write.mode("overwrite").parquet(path(s"${t}__next"))
        graft.io.Fs.deleteRecursively(path(t), spark.sessionState.newHadoopConf())
        new java.io.File(path(s"${t}__next")).renameTo(new java.io.File(path(t))): Unit
        // external overwrite of a path a long-lived session reads:
        // invalidate cached plans/listings for it (EtlRunSpec.writeOltp's
        // documented pattern)
        spark.catalog.refreshByPath(path(t))
      }
      Synthetic.transactions(spark, txPerDay, today, nUsers, nProducts,
          firstId = 1L + d.toLong * txPerDay)
        .write.mode("append").partitionBy("date").parquet(path("transactions"))
      spark.catalog.refreshByPath(path("transactions"))

      // ---- TIMED: the pipeline itself (eager; run-log row forced inside)
      stageMs.clear()
      val t0 = System.nanoTime()
      val runLog = etl.run(today)
      val status = runLog.select("status").first().getString(0)
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(200) // drain listener events before snapshotting stages

      // ---- UNTIMED: accumulation telemetry
      import graft.schemas.Schemas
      val factRows = etl.table("fact_transactions", Schemas.factTransactions).count()
      val dimUserRows = etl.table("dim_user", Schemas.dimUser).count()
      val dimProductRows = etl.table("dim_product", Schemas.dimProduct).count()
      val stockRows = etl.table("fact_stock_history", Schemas.factStockHistory).count()
      val errRows = etl.table("etl_error_log", Schemas.etlErrorLog).count()

      val stages = {
        import scala.jdk.CollectionConverters._
        stageMs.asScala.toSeq.sortBy(-_._2.get())
          .map { case (k, v) => s""""$k":${v.get() / 1e3}""" }.mkString(",")
      }
      val line = s"""{"day":"$today","i":$d,"wall_s":${math.round(wall * 1000) / 1000.0},""" +
        s""""status":"$status","fact_tx_rows":$factRows,"dim_user_rows":$dimUserRows,""" +
        s""""dim_product_rows":$dimProductRows,"stock_rows":$stockRows,""" +
        s""""error_rows":$errRows,"stage_s":{$stages}}"""
      System.err.println(s"[etl-replay] $line")
      perDay += line
    }

    val daysJson = perDay.result().mkString("[", ",", "]")
    val doc = s"""{"metric":"etl_replay","days":$days,"n_users":$nUsers,""" +
      s""""n_products":$nProducts,"tx_per_day":$txPerDay,"cpus":$cpus,""" +
      s""""per_day":$daysJson}"""
    java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      doc.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(doc)
    spark.stop()
  }
}
