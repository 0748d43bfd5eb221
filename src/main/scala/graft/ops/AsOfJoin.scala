package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Point-in-time (as-of) joins — the one operator family the reference needs
  * that plain equi-joins don't cover (reference ETL/etl.py:326-360: per
  * transaction, the dimension version valid at the transaction's own date,
  * `ORDER BY start_date DESC LIMIT 1`).
  *
  * Two physical shapes, chosen by the caller to match data size:
  *
  *  1. [[pitLookup]] — fact × SCD2 dimension. Non-equi join (range predicate
  *     on the validity window) + window top-1 tie-break. The dimension side
  *     is broadcast: Catalyst plans a BroadcastHashJoin on the equi part of
  *     the condition with the range residual as a filter, so the fact side
  *     never shuffles — the right plan when dims are millions of rows and
  *     facts are 100 TB.
  *
  *  2. [[asOfUnion]] — big × big (e.g. event stream vs event stream), where
  *     a range join would explode. Union the two inputs tagged by side and
  *     run ONE window `last(value, ignoreNulls) over (partition by key
  *     order by time, tiebreak)`: each left row picks up the most recent
  *     right value with `time_r <= time_l`. Exactly one shuffle on the key,
  *     no pair blowup — the merge-sort formulation of as-of join.
  */
object AsOfJoin {

  /** Latest dimension version valid at each fact row's date.
    *
    * @param fact     fact rows
    * @param dim      SCD2 snapshot (start_date, end_date nullable, any attrs)
    * @param factKey  fact natural-key column
    * @param dimKey   dim natural-key column (name in `dim`)
    * @param factDate fact's own event date column
    * @param factRowId unique fact row id for the top-1 window
    * @param dimCols  columns to carry from the matched dim version
    * Unmatched fact rows survive with null dim columns (the reference logs
    * them as `orphan_*` warnings and skips them — callers split on null).
    */
  def pitLookup(fact: DataFrame, dim: DataFrame, factKey: Column, dimKey: String,
                factDate: Column, factRowId: Column, dimCols: Seq[String]): DataFrame = {
    val d = broadcast(dim.select((dimKey +: "start_date" +: "end_date" +: dimCols).distinct
      .map(c => col(c).as(s"pit_$c")): _*))
    val cond = factKey === col(s"pit_$dimKey") &&
      col("pit_start_date") <= to_date(factDate) &&
      (col("pit_end_date").isNull || col("pit_end_date") >= to_date(factDate))
    val w = Window.partitionBy(factRowId).orderBy(col("pit_start_date").desc)
    fact.join(d, cond, "left_outer")
      .withColumn("pit_rn", row_number().over(w))
      .filter(col("pit_rn") === 1)
      .drop("pit_rn", s"pit_$dimKey", "pit_start_date", "pit_end_date")
  }

  /** For every left row: the most recent right row with
    * `rightTime <= leftTime`, matched per key. Carries `valueCols` from the
    * right side as `asof_<col>` (null when no prior right row exists).
    *
    * Both inputs shuffle once on `key`; within each partition Spark sorts by
    * (time, side) and the `last(..., ignoreNulls=true)` running window does
    * the as-of matching in a single pass. Right rows at exactly the same
    * timestamp sort BEFORE left rows (side 0 < 1), i.e. the match is
    * inclusive (`<=`), mirroring the reference's `start_date <= tx_date`.
    */
  def asOfUnion(left: DataFrame, right: DataFrame, key: String, leftTime: String,
                rightTime: String, valueCols: Seq[String]): DataFrame = {
    val rightTagged = right.select(
      col(key).as("asof_key"), col(rightTime).as("asof_ts"), lit(0).as("asof_side"),
      struct(valueCols.map(col): _*).as("asof_vals")
    )
    val l2 = left.select(
      col(key).as("asof_key"), col(leftTime).as("asof_ts"), lit(1).as("asof_side"),
      struct(left.columns.map(col): _*).as("asof_left"),
      lit(null).cast(rightTagged.schema("asof_vals").dataType).as("asof_vals")
    )
    val r2 = rightTagged.withColumn("asof_left",
      lit(null).cast(l2.schema("asof_left").dataType)).select(l2.columns.map(col): _*)
    val w = Window.partitionBy("asof_key")
      .orderBy(col("asof_ts"), col("asof_side"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val matched = l2.unionByName(r2)
      .withColumn("asof_match", last(col("asof_vals"), ignoreNulls = true).over(w))
      .filter(col("asof_side") === 1)
    val leftCols = left.columns.map(c => col(s"asof_left.$c").as(c))
    val valCols = valueCols.map(c => col(s"asof_match.$c").as(s"asof_$c"))
    matched.select(leftCols ++ valCols: _*)
  }
}
