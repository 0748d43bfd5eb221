package graft

import org.apache.spark.sql.functions._
import graft.ops.Bucketing

/** Bucketed co-located joins: same key + same bucket count → zero shuffle
  * exchanges; unbucketed control → shuffles on both sides.
  */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  test("two tables bucketed on the join key join with zero exchanges") {
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val lineitem = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select("l_orderkey", "l_quantity")
    Bucketing.writeBucketed(orders, "b_orders", Seq("o_orderkey"), 8)
    Bucketing.writeBucketed(
      lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
      "b_lineitem", Seq("o_orderkey"), 8)

    // hint forces SortMergeJoin: zero exchanges then proves bucket
    // co-location, not a broadcast that would be 0-exchange trivially
    val joined = Bucketing.read(spark, "b_orders").hint("merge")
      .join(Bucketing.read(spark, "b_lineitem"), Seq("o_orderkey"))
    joined.collect()
    assert(Bucketing.shuffleCount(joined) === 0,
      joined.queryExecution.executedPlan.toString)

    // control: the same join over raw parquet shuffles both sides (hint
    // forces SortMergeJoin — at this tiny sf AQE would broadcast instead)
    val control = orders.hint("merge").join(
      lineitem.withColumnRenamed("l_orderkey", "o_orderkey"), Seq("o_orderkey"))
    control.collect()
    assert(Bucketing.shuffleCount(control) >= 1)

    // results identical
    assert(joined.count() === control.count())
  }

  test("aggregation on the bucket key is also shuffle-free") {
    val agg = Bucketing.read(spark, "b_lineitem")
      .groupBy("o_orderkey").agg(sum("l_quantity").as("q"))
    agg.collect()
    assert(Bucketing.shuffleCount(agg) === 0,
      agg.queryExecution.executedPlan.toString)
  }
}
