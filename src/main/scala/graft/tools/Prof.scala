package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch profiler: time named registered queries one by one.
  * Usage: runMain graft.tools.Prof <sfDir> <q> [q...]  (delete after use) */
object Prof {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // same extensions as Bench/Verify — the pushdown-rule plans this
      // tool audits must be the plans those harnesses run
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.tail.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        println(f"[prof] $name run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
      if (sys.env.contains("PROF_EXPLAIN")) fn(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
