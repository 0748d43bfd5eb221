package graft

/** Registry integrity: every `SparkEntry.queries` entry must at least
  * ANALYZE against the real testdata. This is the cheap guard the r4
  * regression proved necessary — a runtime-level type change (parquet
  * TIMESTAMP(NANOS) reading as NTZ on Spark 4.1+) broke four queries at
  * analysis time and the loss surfaced only as silently missing
  * correctness rows. Resolution takes milliseconds per query; any
  * analysis-time exception fails here with the query named.
  */
class RegistrySpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("every registered query analyzes against sf0.001") {
    val broken = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try { fn(spark, sfDir).queryExecution.analyzed; None }
      catch { case e: Throwable =>
        Some(s"$name: ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(300)}")
      }
    }
    assert(broken.isEmpty, s"\n${broken.size} queries fail analysis:\n" +
      broken.mkString("\n"))
  }

  test("every oracle key names a registered query, and the flagship runs") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracleSql keys with no query: $orphans")
    assert(SparkEntry.entry(spark).limit(1).count() === 1)
  }
}
