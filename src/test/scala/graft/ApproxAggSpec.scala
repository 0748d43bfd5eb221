package graft

import org.apache.spark.sql.functions._

/** Approximate-aggregate calibration (q112): the sketches must land within
  * their configured error of the exact twins on real data. q112 now carries
  * the bound as oracle-checked booleans; this spec asserts the underlying
  * raw sketch values too, so a calibration drift is caught with the actual
  * approx/exact numbers in the failure message, not just a false boolean.
  */
class ApproxAggSpec extends SparkSpec {

  test("HLL distinct and quantile sketch stay within 5% of exact on events") {
    import org.apache.spark.sql.DataFrame
    val raw = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val ev: DataFrame = raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => raw
    }
    val rows = ev
      .withColumn("cents", round(col("value") * 100, 0).cast("long"))
      .groupBy("event_type")
      .agg(countDistinct("user_id").as("n_users_exact"),
        approx_count_distinct(col("user_id"), rsd = 0.02).as("n_users_approx"),
        expr("percentile(cents, 0.5)").as("p50_exact"),
        expr("approx_percentile(cents, 0.5, 10000)").as("p50_approx"))
      .collect()
    assert(rows.length > 0)
    rows.foreach { r =>
      val exactD = r.getAs[Long]("n_users_exact").toDouble
      val approxD = r.getAs[Long]("n_users_approx").toDouble
      assert(math.abs(approxD - exactD) / exactD < 0.05,
        s"${r.getAs[String]("event_type")}: HLL $approxD vs exact $exactD")
      val exactP = r.getAs[Double]("p50_exact")
      val approxP = r.getAs[Long]("p50_approx").toDouble
      assert(math.abs(approxP - exactP) / exactP < 0.05,
        s"${r.getAs[String]("event_type")}: p50 $approxP vs exact $exactP")
    }
  }

  test("q112 registry row reports every calibration boolean true") {
    val rows = SparkEntry.queries("q112_approx_aggregates")(
      spark, "/root/testdata/sf0.001").collect()
    assert(rows.length > 0)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("users_within_5pct"),
        s"${r.getAs[String]("event_type")}: HLL outside 5%")
      assert(r.getAs[Boolean]("p50_within_5pct"),
        s"${r.getAs[String]("event_type")}: p50 sketch outside 5%")
    }
  }
}
