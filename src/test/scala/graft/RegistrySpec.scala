package graft

/** Registry integrity: every `SparkEntry.queries` entry must EXECUTE to a
  * noop sink against the real testdata. The r4 regression proved the
  * analyze-level guard necessary (a parquet TIMESTAMP(NANOS)→NTZ runtime
  * change broke four queries and the loss surfaced only as silently missing
  * correctness rows); r5's verdict asked for the stronger form — execution
  * also catches codegen failures, runtime casts, and corrupt partitions
  * that analysis cannot see. Any exception fails here with the query named.
  * Wall cost at sf0.001 is ~2 minutes for the whole registry.
  */
class RegistrySpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("every registered query EXECUTES against sf0.001") {
    // Pre-warm the shared labels artifact once, outside the per-query
    // loop: ClusterLabels.apply eagerly materializes the LSH+closure
    // subtree at DataFrame-construction time, so without this the first
    // consumer (q134) would carry the build cost and a build failure
    // would be misattributed to it.
    try graft.queries.ClusterLabels(spark, sfDir)
    catch { case e: Throwable =>
      fail(s"shared ClusterLabels build failed: ${e.getClass.getSimpleName}: " +
        String.valueOf(e.getMessage).take(300))
    }
    val broken = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save(); None
      }
      catch { case e: Throwable =>
        Some(s"$name: ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(300)}")
      }
      finally spark.catalog.clearCache()
    }
    assert(broken.isEmpty, s"\n${broken.size} queries fail execution:\n" +
      broken.mkString("\n"))
  }

  test("every oracle key names a registered query, and the flagship runs") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracleSql keys with no query: $orphans")
    assert(SparkEntry.entry(spark).limit(1).count() === 1)
  }
}
