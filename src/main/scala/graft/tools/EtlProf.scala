package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Job-level profile of one q180-shaped EtlRun: which of the pipeline's
  * sequential Spark jobs carry the fixed per-run cost (VERDICT r10 #1 —
  * after the fixture staging moved off the timed path, the remaining
  * timed q180 cost IS EtlRun's job chain; this tool shows where).
  *
  * Usage: tools/run_main.sh graft.tools.EtlProf [nRuns=2]
  */
object EtlProf {
  def main(args: Array[String]): Unit = {
    val nRuns = if (args.nonEmpty) args(0).toInt else 2
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val done = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val desc = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .getOrElse(js.stageInfos.map(_.name.takeWhile(_ != '\n')).distinct.mkString(" | "))
        jobs.put(js.jobId, (js.time, desc))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        Option(jobs.remove(je.jobId)).foreach { case (t0, desc) =>
          done.add((je.jobId, je.time - t0, desc))
        }
      }
    })

    for (run <- 1 to nRuns) {
      done.clear()
      val wh = graft.queries.EtlStage.freshWarehouse(spark)
      done.clear() // staging's own jobs are not the probe target
      val t0 = System.nanoTime()
      new graft.pipeline.EtlRun(spark, wh).run(graft.queries.EtlStage.day)
        .write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // let listener events drain
      val rows = done.toArray(Array.empty[(Int, Long, String)]).sortBy(_._1)
      println(f"== run $run: wall $wall%.2f s, ${rows.length} jobs, " +
        f"sum ${rows.map(_._2).sum / 1e3}%.2f s ==")
      rows.foreach { case (id, ms, desc) =>
        println(f"  job $id%3d ${ms / 1e3}%6.2f s  ${desc.take(110)}")
      }
    }
    spark.stop()
  }
}
