package graft

import org.apache.spark.sql.functions._
import graft.ops.Quantiles

/** [[graft.ops.Quantiles.exactQuantiles]] must reproduce Spark's exact
  * `percentile` BIT-FOR-BIT (same interpolation arithmetic) while holding
  * only histogram counters per group — checked against the built-in on
  * adversarial shapes: ties, constant groups, single-row groups, skewed
  * mass, negative values, and tiny bucket counts that force multi-rank
  * buckets and cross-bucket interpolation.
  */
class QuantilesSpec extends SparkSpec {
  import spark.implicits._

  private val qs = Seq("p25" -> 0.25, "p50" -> 0.5, "p95" -> 0.95)

  private def check(data: Seq[(String, Long)], nBuckets: Int): Unit = {
    val df = data.toDF("grp", "v").repartition(4)
    val got = Quantiles.exactQuantiles(df, Seq("grp"), "v", qs, nBuckets)
      .collect().map(r => r.getAs[String]("grp") ->
        (r.getAs[Double]("p25"), r.getAs[Double]("p50"), r.getAs[Double]("p95"))).toMap
    val want = df.groupBy("grp")
      .agg(expr("percentile(v, 0.25)").as("p25"),
        expr("percentile(v, 0.5)").as("p50"),
        expr("percentile(v, 0.95)").as("p95"))
      .collect().map(r => r.getAs[String]("grp") ->
        (r.getAs[Double]("p25"), r.getAs[Double]("p50"), r.getAs[Double]("p95"))).toMap
    assert(got.keySet === want.keySet)
    want.foreach { case (k, w) =>
      assert(got(k) === w, s"group $k (nBuckets=$nBuckets)")
    }
  }

  test("matches built-in percentile exactly across adversarial shapes") {
    val rnd = new scala.util.Random(42)
    val data =
      (1 to 500).map(_ => ("uniform", rnd.nextLong() % 100000)) ++
      (1 to 300).map(_ => ("ties", (rnd.nextInt(5) * 10).toLong)) ++
      (1 to 50).map(_ => ("constant", 7L)) ++
      Seq(("single", 42L)) ++
      (1 to 400).map(i => ("skew", if (i < 390) 1L else i * 1000L)) ++
      (1 to 200).map(_ => ("negative", rnd.nextLong() % 1000 - 5000))
    check(data, nBuckets = 4096)
    // tiny histogram: many ranks share buckets, interpolation spans buckets
    check(data, nBuckets = 4)
  }

  test("global (no groupCols) quantiles match the single-group built-in") {
    val df = (1 to 1000).map(i => (i * 37 % 501).toLong).toDF("v").repartition(8)
    val got = Quantiles.exactQuantiles(df, Nil, "v", Seq("p01" -> 0.01, "p99" -> 0.99))
      .collect().head
    val want = df.agg(expr("percentile(v, 0.01)"), expr("percentile(v, 0.99)"))
      .collect().head
    assert(got.getAs[Double]("p01") === want.getDouble(0))
    assert(got.getAs[Double]("p99") === want.getDouble(1))
  }

  // ---- valueHistogramQuantiles: the two-exchange path ----

  private def checkVH(data: Seq[(String, Long)]): Unit = {
    val df = data.toDF("grp", "v").repartition(4)
    val got = Quantiles.valueHistogramQuantiles(df, Seq("grp"), "v", qs,
        countCol = Some("n"))
      .collect().map(r => r.getAs[String]("grp") ->
        ((r.getAs[Double]("p25"), r.getAs[Double]("p50"), r.getAs[Double]("p95")),
          r.getAs[Long]("n"))).toMap
    val want = df.groupBy("grp")
      .agg(expr("percentile(v, 0.25)").as("p25"),
        expr("percentile(v, 0.5)").as("p50"),
        expr("percentile(v, 0.95)").as("p95"),
        expr("count(v)").as("n"))
      .collect().map(r => r.getAs[String]("grp") ->
        ((r.getAs[Double]("p25"), r.getAs[Double]("p50"), r.getAs[Double]("p95")),
          r.getAs[Long]("n"))).toMap
    assert(got.keySet === want.keySet)
    want.foreach { case (k, w) => assert(got(k) === w, s"group $k") }
  }

  test("value-histogram path matches built-in percentile across adversarial shapes") {
    val rnd = new scala.util.Random(7)
    checkVH(
      (1 to 500).map(_ => ("uniform", rnd.nextLong() % 100000)) ++
      (1 to 300).map(_ => ("ties", (rnd.nextInt(5) * 10).toLong)) ++
      (1 to 50).map(_ => ("constant", 7L)) ++
      Seq(("single", 42L)) ++
      (1 to 400).map(i => ("skew", if (i < 390) 1L else i * 1000L)) ++
      (1 to 200).map(_ => ("negative", rnd.nextLong() % 1000 - 5000)))
  }

  test("value-histogram path: global quantiles + the exact two-exchange plan") {
    val df = (1 to 1000).map(i => (i * 37 % 501).toLong).toDF("v").repartition(8)
    val got = Quantiles.valueHistogramQuantiles(df, Nil, "v",
      Seq("p01" -> 0.01, "p99" -> 0.99))
    // the operator's own contract: exactly 2 exchanges beyond the input's
    // repartition — histogram groupBy + the group-keyed cumulative window
    // (the flanking-value aggregate reuses the window's partitioning).
    // Counted BEFORE execution: a post-collect AQE plan string appends the
    // "Initial Plan" section, double-counting every exchange.
    val n = got.queryExecution.executedPlan.toString
      .linesIterator.count(l => l.contains("Exchange") && !l.contains("Broadcast"))
    assert(n <= 3, s"expected <= 3 exchanges (incl. the test repartition), saw $n")
    val want = df.agg(expr("percentile(v, 0.01)"), expr("percentile(v, 0.99)"))
      .collect().head
    val row = got.collect().head
    assert(row.getAs[Double]("p01") === want.getDouble(0))
    assert(row.getAs[Double]("p99") === want.getDouble(1))
  }

  test("value-histogram path ignores nulls like percentile") {
    val df = Seq[(String, java.lang.Long)](("a", 1L), ("a", null), ("a", 3L),
      ("b", null)).toDF("grp", "v")
    val got = Quantiles.valueHistogramQuantiles(df, Seq("grp"), "v",
      Seq("p50" -> 0.5), countCol = Some("n")).collect()
      .map(r => r.getAs[String]("grp") ->
        (r.getAs[Double]("p50"), r.getAs[Long]("n"))).toMap
    // group b has no non-null values: no row (same as exactQuantiles' base)
    assert(got === Map("a" -> ((2.0, 2L))))
  }
}
