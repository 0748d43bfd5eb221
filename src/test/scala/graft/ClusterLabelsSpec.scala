package graft

import org.apache.spark.sql.functions._
import graft.queries.ClusterLabels

/** The shared materialized cluster-labels artifact (consumed by q72, q134,
  * q154, q163): structural invariants plus memo/rebuild determinism — if
  * the artifact ever drifted between consumers, three green queries would
  * silently disagree about what a "cluster" is.
  */
class ClusterLabelsSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("labels are min-id components, counts consistent, memo and rebuild stable") {
    val a = ClusterLabels(spark, sfDir).cache()
    // min-label propagation: the label IS the smallest member id...
    assert(a.filter(col("cluster_id") > col("doc_id")).count() === 0)
    // ...and that member exists, so representatives biject with clusters
    val reps = a.filter(col("doc_id") === col("cluster_id")).count()
    assert(reps === a.select("cluster_id").distinct().count())
    // one row per doc
    assert(a.select("doc_id").distinct().count() === a.count())
    // n_members agrees with the actual member count of every cluster
    val bad = a.groupBy("cluster_id")
      .agg(count(lit(1)).as("n"),
        min("n_members").as("lo"), max("n_members").as("hi"))
      .filter(col("n") =!= col("lo") || col("n") =!= col("hi"))
    assert(bad.count() === 0)
    // the injected verbatim copies (doc_id+20000) must cluster with their
    // originals — near-dup recall floor on the known-dup corpus
    val verbatimClustered = a.filter(col("doc_id") >= 20000 && col("n_members") === 1).count()
    assert(verbatimClustered === 0, "a verbatim copy escaped its cluster")

    // memoized read returns identical content
    val b = ClusterLabels(spark, sfDir)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    // rebuild after reset is deterministic (reset deletes the old scratch
    // dir, so pin a's content on the driver before invalidating it)
    val aRows = sortedRows(a)
    a.unpersist()
    ClusterLabels.reset()
    val c = ClusterLabels(spark, sfDir)
    assert(sortedRows(c) === aRows)
  }
}
