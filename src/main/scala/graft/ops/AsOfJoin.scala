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
  *  1. [[pitLookup]] — fact × SCD2 dimension, dimension small enough to
  *     broadcast. The dimension is pre-collapsed to ONE row per natural key
  *     holding a start_date-sorted array of its versions; the join is then a
  *     plain broadcast hash equi-join on the key and the version pick is a
  *     per-row higher-order `filter` + `element_at(…, -1)` over the array.
  *     The fact side never shuffles and never sorts — zero exchanges beyond
  *     the broadcast itself, which is the plan you want when facts are
  *     100 TB and dims are millions of rows.
  *
  *  2. [[asOfUnion]] — big × big (e.g. event stream vs event stream), where
  *     a range join would explode. Union the two inputs tagged by side and
  *     run ONE window `last(value, ignoreNulls) over (partition by key
  *     order by time, side, tiebreak)`: each left row picks up the most
  *     recent right value with `time_r <= time_l`. Exactly one shuffle on
  *     the key, no pair blowup — the merge-sort formulation of as-of join.
  */
object AsOfJoin {

  /** Latest dimension version valid at each fact row's date.
    *
    * @param fact     fact rows
    * @param dim      SCD2 snapshot (start_date, end_date nullable, any attrs)
    * @param factKey  fact natural-key column
    * @param dimKey   dim natural-key column (name in `dim`)
    * @param factDate fact's own event date column
    * @param dimCols  columns to carry from the matched dim version, emitted
    *                 as `pit_<col>`
    * Unmatched fact rows survive with null dim columns (the reference logs
    * them as `orphan_*` warnings and skips them — callers split on null).
    * If several versions share a start_date the later struct (field-wise
    * comparison past start_date) wins — deterministic.
    */
  def pitLookup(fact: DataFrame, dim: DataFrame, factKey: Column, dimKey: String,
                factDate: Column, dimCols: Seq[String]): DataFrame = {
    val attrCols = dimCols.filterNot(Seq(dimKey, "start_date", "end_date").contains)
    // one row per key: versions sorted by start_date ascending (struct sort
    // compares start_date first), so element_at(filtered, -1) is the
    // latest valid version
    // tie-break: on equal start_date the OPEN version (end_date null) must
    // win, but null sorts first in a struct sort — sort on an explicit
    // open flag (open=1 lands last) then end_date. A sentinel date like
    // 9999-12-31 would collide with sources that emit that very sentinel
    // as a closed end_date.
    val versions = dim
      .groupBy(col(dimKey).as("pit_key"))
      .agg(sort_array(collect_list(struct(
        (col("start_date") +:
          when(col("end_date").isNull, 1).otherwise(0).as("__open_sort") +:
          col("end_date") +: attrCols.map(col)): _*
      ))).as("pit_versions"))
    val matched = filter(col("pit_versions"), v =>
      v.getField("start_date") <= to_date(factDate) &&
        (v.getField("end_date").isNull || v.getField("end_date") >= to_date(factDate)))
    // try_element_at: the filtered array is EMPTY when the fact date
    // precedes every version of its key — that row must yield null dim
    // attrs (orphan path), not throw
    val pick = try_element_at(matched, lit(-1))
    fact.join(broadcast(versions), factKey === col("pit_key"), "left_outer")
      .withColumn("pit_hit", pick)
      .select(fact.columns.map(col).toSeq ++
        attrCols.map(c => col("pit_hit").getField(c).as(s"pit_$c")): _*)
  }

  /** For every left row: the most recent right row with
    * `rightTime <= leftTime`, matched per key. Carries `valueCols` from the
    * right side as `asof_<col>` (null when no prior right row exists).
    *
    * Both inputs shuffle once on `key`; within each partition Spark sorts by
    * (time, side, values) and the `last(..., ignoreNulls=true)` running
    * window does the as-of matching in a single pass. Right rows at exactly
    * the same timestamp sort BEFORE left rows (side 0 < 1), i.e. the match
    * is inclusive (`<=`), mirroring the reference's `start_date <= tx_date`.
    * Right rows tied on (key, time) are broken by the value struct itself
    * (field-wise max wins) so the result is deterministic across runs and
    * partitionings.
    */
  def asOfUnion(left: DataFrame, right: DataFrame, key: String, leftTime: String,
                rightTime: String, valueCols: Seq[String]): DataFrame = {
    val rightTagged = right.select(
      col(key).as("asof_key"), col(rightTime).as("asof_ts"), lit(0).as("asof_side"),
      struct(valueCols.map(col): _*).as("asof_vals")
    )
    val l2 = left.select(
      col(key).as("asof_key"), col(leftTime).as("asof_ts"), lit(1).as("asof_side"),
      struct(left.columns.map(col).toSeq: _*).as("asof_left"),
      lit(null).cast(rightTagged.schema("asof_vals").dataType).as("asof_vals")
    )
    val r2 = rightTagged.withColumn("asof_left",
      lit(null).cast(l2.schema("asof_left").dataType)).select(l2.columns.map(col).toSeq: _*)
    val w = Window.partitionBy("asof_key")
      .orderBy(col("asof_ts"), col("asof_side"), col("asof_vals"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val matched = l2.unionByName(r2)
      .withColumn("asof_match", last(col("asof_vals"), ignoreNulls = true).over(w))
      .filter(col("asof_side") === 1)
    val leftCols = left.columns.map(c => col(s"asof_left.$c").as(c))
    val valCols = valueCols.map(c => col(s"asof_match.$c").as(s"asof_$c"))
    matched.select((leftCols ++ valCols).toSeq: _*)
  }
}
