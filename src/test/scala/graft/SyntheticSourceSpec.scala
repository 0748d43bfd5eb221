package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import graft.sources.SyntheticSource

/** DataSource V2 connector contract: deterministic content, planning-time
  * partition pruning from pushed id-range filters, and column pruning
  * down to the reader (a pruned column is never materialized).
  */
class SyntheticSourceSpec extends SparkSpec {

  private def synth(rows: Long, slices: Int): DataFrame =
    spark.read.format("graft.sources.SyntheticSource")
      .option("rows", rows).option("slices", slices).load()

  private def scanDesc(df: DataFrame): String = {
    df.collect() // force planning through AQE's final plan
    def find(p: SparkPlan): Option[String] = p match {
      case a: AdaptiveSparkPlanExec => find(a.executedPlan)
      case b: BatchScanExec         => Some(b.scan.description())
      case other => other.children.iterator.map(find).collectFirst {
        case Some(d) => d }
    }
    find(df.queryExecution.executedPlan)
      .getOrElse(sys.error(df.queryExecution.executedPlan.toString))
  }

  test("content is the documented LCG, deterministic across reads") {
    val df = synth(1000, 8).cache()
    assert(df.count() === 1000)
    val r = df.filter(col("id") === 123).head()
    assert(r.getLong(0) === 123L)
    assert(r.getLong(1) === SyntheticSource.bucket(123))
    assert(r.getLong(2) === SyntheticSource.cents(123))
    assert(r.getString(3) === SyntheticSource.tag(123))
    // mixing constants stay inside non-negative int64 (DuckDB parity)
    assert(SyntheticSource.h2(999999999L) >= 0)
    df.unpersist()
  }

  test("id-range filters prune partitions at plan time") {
    // rows=1000 slices=8 → per=125; id<250 covers exactly 2 slices
    val pruned = synth(1000, 8).filter(col("id") < 250)
    val d = scanDesc(pruned)
    assert(d.contains("range=[0,250)") && d.contains("partitions=2"), d)
    assert(pruned.count() === 250)

    // conjunction intersects: [125, 375) → slices 1..2 (2 partitions)
    val both = synth(1000, 8)
      .filter(col("id") >= 125 && col("id") <= 374)
    val d2 = scanDesc(both)
    assert(d2.contains("range=[125,375)") && d2.contains("partitions=2"), d2)
    assert(both.count() === 250)

    // empty intersection plans ZERO partitions and still answers
    val empty = synth(1000, 8).filter(col("id") >= 600 && col("id") < 500)
    assert(empty.count() === 0)
  }

  test("pushed filters remain residual: equality still exact") {
    val one = synth(1000, 8).filter(col("id") === 777)
    val d = scanDesc(one)
    assert(d.contains("range=[777,778)") && d.contains("partitions=1"), d)
    assert(one.collect().map(_.getLong(0)).toSeq === Seq(777L))
  }

  test("column pruning reaches the reader") {
    val slim = synth(1000, 8).select("bucket")
    val d = scanDesc(slim)
    assert(d.contains("cols=bucket"), d)
    assert(slim.distinct().count() === 97)
    // unsupported-column filter stays residual but doesn't break pruning
    val filtered = synth(1000, 8).filter(col("tag") === "t3").select("cents")
    assert(filtered.count() ===
      (0L until 1000L).count(SyntheticSource.tag(_) == "t3"))
  }

  test("aggregate over the source matches a driver-side recompute") {
    val got = synth(10000, 16)
      .filter(col("id") >= 2500 && col("id") < 5000)
      .groupBy("bucket").agg(sum("cents").as("s"), count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    val want = (2500L until 5000L)
      .groupBy(SyntheticSource.bucket)
      .map { case (b, ids) =>
        (b, (ids.map(SyntheticSource.cents).sum, ids.size.toLong)) }
    assert(got === want)
  }
}
