package graft.tools

import org.apache.spark.sql.SparkSession

/** Plan auditor: prints the formatted physical plan of named registered
  * queries plus a one-line summary of exchanges / pushed filters.
  * Usage: runMain graft.tools.PlanAudit <sfDir> <q> [q...]
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      // same extensions as Bench/Verify — the pushdown-rule plans this
      // tool audits must be the plans those harnesses run
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.tail.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.executedPlan.toString
      val nShuffle = graft.ops.Bucketing.shuffleCount(df)
      val nBroadcast = "BroadcastExchange".r.findAllIn(plan).length
      val pushed = "PushedFilters: \\[[^\\]]*\\]".r.findAllIn(plan).toSeq
      println(s"=== $name: shuffles=$nShuffle broadcasts=$nBroadcast")
      pushed.foreach(p => println(s"    $p"))
      if (sys.env.contains("AUDIT_FULL")) df.explain("formatted")
    }
    spark.stop()
  }
}
