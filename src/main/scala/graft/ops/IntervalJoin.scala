package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bounded-window interval join: all (left, right) pairs with equal key and
  * `rightTime ∈ [leftTime, leftTime + window)` — the "purchases within 30
  * minutes of a click" shape (a batch twin of a watermarked stream-stream
  * join).
  *
  * A naive range join is quadratic per key. Here both sides are bucketed by
  * `floor(time / window)` and the LEFT row replicates into the two buckets
  * its window can touch — each side shuffles ONCE on (key, bucket), the
  * fan-out is a bounded 2×, and every qualifying pair is produced exactly
  * once (the right row's bucket equals the left's bucket or the left's
  * bucket + 1, never both). This is the standard banding that keeps
  * interval joins linear at 100 TB.
  */
object IntervalJoin {

  private def bucketOf(time: Column, windowUs: Long): Column =
    (unix_micros(time) / lit(windowUs)).cast("long")

  /** @param left      rows with `key` and `leftTime` (timestamp)
    * @param right     rows with `key` and `rightTime` (timestamp); all other
    *                  column names must be disjoint from `left`'s
    * @param windowSec half-open match window in seconds
    */
  def within(left: DataFrame, right: DataFrame, key: String,
             leftTime: String, rightTime: String, windowSec: Long): DataFrame = {
    val overlap = left.columns.toSet.intersect(right.columns.toSet) - key
    require(overlap.isEmpty,
      s"rename overlapping non-key columns before joining: ${overlap.mkString(", ")}")
    val wUs = windowSec * 1000000L
    val l = left.withColumn("__bucket",
      explode(array(bucketOf(col(leftTime), wUs), bucketOf(col(leftTime), wUs) + 1)))
    val r = right.withColumn("__bucket", bucketOf(col(rightTime), wUs))
    l.join(r, Seq(key, "__bucket"))
      .filter(unix_micros(col(rightTime)) >= unix_micros(col(leftTime)) &&
        unix_micros(col(rightTime)) < unix_micros(col(leftTime)) + wUs)
      .drop("__bucket")
  }
}
