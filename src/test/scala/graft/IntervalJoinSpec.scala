package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.ops.IntervalJoin

/** Banded interval join vs the naive range join: identical pairs, each
  * exactly once, with both window boundaries exercised (inclusive start,
  * exclusive end) and rows straddling bucket edges.
  */
class IntervalJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  test("within == naive range join; boundaries half-open; no duplicate pairs") {
    // window = 60 s; bucket edges at :00 — cases cross them deliberately
    val left = Seq(
      (1L, 10L, ts(100)), // matches r at 100 (inclusive start), 159; not 160
      (2L, 10L, ts(119)), // window [119, 179) straddles the 120 bucket edge
      (3L, 11L, ts(240)), // other key
      (4L, 12L, ts(300))  // no right rows at all
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (10L, ts(100), 1.0), (10L, ts(159), 2.0), (10L, ts(160), 3.0),
      (10L, ts(178), 4.0), (10L, ts(179), 5.0),
      (11L, ts(241), 6.0), (11L, ts(500), 7.0)
    ).toDF("user_id", "p_ts", "value")

    val banded = IntervalJoin.within(left, right, "user_id", "ts", "p_ts", 60)
      .select("event_id", "p_ts", "value")
    val naive = left.join(right, Seq("user_id"))
      .filter(unix_micros(col("p_ts")) >= unix_micros(col("ts")) &&
        unix_micros(col("p_ts")) < unix_micros(col("ts")) + 60000000L)
      .select("event_id", "p_ts", "value")
    assert(sortedRows(banded) === sortedRows(naive))

    val got = banded.as[(Long, Timestamp, Double)].collect().toSet
    // click 1 [100,160): rows at 100 and 159, NOT 160
    assert(got.filter(_._1 == 1L).map(_._3) === Set(1.0, 2.0))
    // click 2 [119,179): rows at 159, 160, 178 — crossing the bucket edge
    assert(got.filter(_._1 == 2L).map(_._3) === Set(2.0, 3.0, 4.0))
    assert(got.filter(_._1 == 4L).isEmpty)
    // exactly-once: no pair appears twice
    assert(banded.count() === banded.distinct().count())
  }

  test("within rejects overlapping non-key column names") {
    val l = Seq((1L, ts(0))).toDF("k", "ts")
    val r = Seq((1L, ts(0))).toDF("k", "ts")
    intercept[IllegalArgumentException] {
      IntervalJoin.within(l, r, "k", "ts", "ts", 60)
    }
  }
}
