package graft

import org.apache.spark.sql.functions._

/** Approximate-aggregate calibration (q112): the sketches must land within
  * their configured error of the exact twins on real data — there is no
  * SQL oracle for engine-specific sketch values, so this bound IS the
  * correctness contract.
  */
class ApproxAggSpec extends SparkSpec {

  test("HLL distinct and quantile sketch stay within 5% of exact on events") {
    val rows = SparkEntry.queries("q112_approx_aggregates")(
      spark, "/root/testdata/sf0.001").collect()
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
}
