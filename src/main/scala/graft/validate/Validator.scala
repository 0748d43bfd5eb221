package graft.validate

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** One data-contract rule: if `condition` is true for a row, the rule fired.
  *
  * Mirrors the reference's `DataValidator` checks (reference
  * ETL/validation.py:31-176): each check appends an error-log record; a row
  * is rejected only when a rule of severity `error` fired — `warning` rules
  * log but never reject (validation.py:155-165).
  *
  * @param errorType stable machine key, e.g. "orphan_user"
  * @param severity  "error" (rejects the row) or "warning" (logs only)
  * @param condition boolean Column; true means VIOLATION
  * @param message   human-readable message Column (may interpolate row values)
  */
final case class Rule(errorType: String, severity: String, condition: Column, message: Column)

object Rule {
  val Error = "error"
  val Warning = "warning"
  def error(errorType: String, condition: Column, message: Column): Rule =
    Rule(errorType, Error, condition, message)
  def warning(errorType: String, condition: Column, message: Column): Rule =
    Rule(errorType, Warning, condition, message)
}

/** Set-based rule engine: evaluates every rule in ONE projection pass and
  * yields both streams (valid rows, error log) from the same annotated
  * DataFrame — no per-row Python loop, no second scan.
  *
  * Design (SURVEY.md §2.9 U1): a `failed_rules` column of
  * `array<struct<error_type,severity,message>>` built with
  * `array(when(rule, struct(...)), ...)` + `filter(isNotNull)`. The error
  * stream is `explode(failed_rules)` (a built-in Generator — codegen
  * friendly, stays inside whole-stage codegen); validity is
  * `!exists(failed_rules, severity == 'error')`. Each output is a narrow
  * transformation over the annotated frame, so at 100 TB the contract costs
  * one scan and zero shuffles.
  */
final class Validator(rules: Seq[Rule], entity: String, recordId: Column,
                      tableName: String = "") {

  val failedRulesCol = "failed_rules"

  /** Input + `failed_rules` array column (empty array when clean). */
  def annotate(df: DataFrame): DataFrame = {
    val fired = rules.map { r =>
      when(
        r.condition,
        struct(
          lit(r.errorType).as("error_type"),
          lit(r.severity).as("severity"),
          r.message.as("message")
        )
      )
    }
    df.withColumn(failedRulesCol, filter(array(fired: _*), x => x.isNotNull))
  }

  private def hasError(c: Column): Column =
    exists(c, r => r.getField("severity") === Rule.Error)

  /** Rows with no error-severity violation (warnings pass through),
    * `failed_rules` dropped. */
  def valid(annotated: DataFrame): DataFrame =
    annotated.filter(!hasError(col(failedRulesCol))).drop(failedRulesCol)

  /** Rows rejected by at least one error-severity rule. */
  def rejected(annotated: DataFrame): DataFrame =
    annotated.filter(hasError(col(failedRulesCol))).drop(failedRulesCol)

  /** The error log: one row per (record, fired rule) — the Spark shape of
    * `etl_error_log` (reference ETL/scripts/create_db.py:29-42). */
  def errors(annotated: DataFrame): DataFrame =
    annotated
      .select(recordId.cast("string").as("record_id"), explode(col(failedRulesCol)).as("e"))
      .select(
        lit(entity).as("entity"),
        col("record_id"),
        col("e.error_type").as("error_type"),
        col("e.severity").as("severity"),
        col("e.message").as("message")
      )

  /** [[errors]] widened to the reference `etl_error_log` column set
    * (run_id, entity, table_name, record_id, error_type, message,
    * created_at, severity — ETL/scripts/create_db.py:29-42). `createdAt`
    * is a parameter so tests/oracles can pin a deterministic timestamp. */
  def errorLog(annotated: DataFrame, runId: Column,
               createdAt: Column = current_timestamp()): DataFrame =
    errors(annotated).select(
      runId.cast("long").as("run_id"),
      col("entity"),
      lit(tableName).as("table_name"),
      col("record_id"),
      col("error_type"),
      col("message"),
      createdAt.as("created_at"),
      col("severity")
    )

  /** DQ rollup `GROUP BY error_type, severity ORDER BY count DESC`
    * (reference demo.ipynb cell 16 / SURVEY.md A3). */
  def dqSummary(annotated: DataFrame): DataFrame =
    errors(annotated)
      .groupBy("error_type", "severity")
      .agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), col("error_type"))
}
