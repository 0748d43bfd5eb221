package graft

import org.apache.spark.sql.functions._
import graft.ops.AsOfJoin

/** Point-in-time joins (J3): broadcast-array pitLookup and the union-window
  * asOfUnion — same semantics, two physical shapes.
  */
class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def dim = Seq(
    (10, "v1", "2024-01-01", Some("2024-02-29")),
    (10, "v2", "2024-03-01", None),
    (20, "w1", "2024-01-15", None)
  ).toDF("user_id", "name", "start_date", "end_date")
    .withColumn("start_date", to_date(col("start_date")))
    .withColumn("end_date", to_date(col("end_date")))

  private def facts = Seq(
    (1, 10, "2024-01-05"),  // inside v1
    (2, 10, "2024-03-01"),  // boundary: start_date inclusive -> v2
    (3, 10, "2024-02-29"),  // boundary: end_date inclusive -> v1
    (4, 20, "2024-01-01"),  // before any version -> null
    (5, 99, "2024-01-01")   // unknown key -> null (orphan)
  ).toDF("tx", "user_id", "d")

  test("pitLookup picks the version valid at the fact date, inclusive bounds") {
    val out = AsOfJoin.pitLookup(facts, dim, col("user_id"), "user_id",
      col("d"), Seq("name"))
    val m = out.select("tx", "pit_name").as[(Int, Option[String])].collect().toMap
    assert(m === Map(1 -> Some("v1"), 2 -> Some("v2"), 3 -> Some("v1"),
      4 -> None, 5 -> None))
  }

  test("pitLookup plan has no exchange on the fact side (broadcast only)") {
    val out = AsOfJoin.pitLookup(facts, dim, col("user_id"), "user_id",
      col("d"), Seq("name"))
    val plan = out.queryExecution.executedPlan.toString
    // the only exchange allowed is the broadcast of the collapsed dim
    assert(!plan.contains("ShuffleExchange") || !plan.split("\n")
      .exists(l => l.contains("Exchange hashpartitioning")),
      s"unexpected shuffle in plan:\n$plan")
  }

  test("asOfUnion matches most recent right value at or before left time") {
    val quotes = Seq(
      ("A", 1L, 10.0), ("A", 5L, 11.0), ("B", 3L, 20.0)
    ).toDF("sym", "ts", "px")
    val trades = Seq(
      ("A", 1L, 100), ("A", 4L, 200), ("A", 6L, 300), ("B", 2L, 400)
    ).toDF("sym", "ts", "qty")
    val out = AsOfJoin.asOfUnion(trades, quotes, "sym", "ts", "ts", Seq("px"))
    val m = out.select("qty", "asof_px").as[(Int, Option[Double])].collect().toMap
    assert(m === Map(100 -> Some(10.0), 200 -> Some(10.0),
      300 -> Some(11.0), 400 -> None))
  }

  test("asOfUnion ties on (key, time) resolve deterministically to the max value") {
    val right = Seq(("A", 1L, 1.0), ("A", 1L, 9.0)).toDF("sym", "ts", "px")
    val left = Seq(("A", 2L, 7)).toDF("sym", "ts", "qty")
    val out = AsOfJoin.asOfUnion(left, right, "sym", "ts", "ts", Seq("px"))
    assert(out.select("asof_px").as[Double].head() === 9.0)
  }
}
