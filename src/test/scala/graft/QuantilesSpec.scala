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
}
