package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, FloatType}

/** Thin accessibility bridge: `ExpressionUtils` (Column <-> Expression) and
  * `AbstractDataType` are `private[sql]`, so third-party Catalyst
  * expressions need one file inside the `org.apache.spark.sql` namespace —
  * the standard pattern for external Spark extension libraries. Keep ALL
  * real logic in the `graft` packages; only re-exports live here.
  */
object bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
  /** input-type spec for array<float> binary expressions */
  val floatArrayInputs: Seq[AbstractDataType] = Seq(ArrayType(FloatType), ArrayType(FloatType))
  /** input-type spec for array<float> unary expressions */
  val floatArrayInput: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  /** input-type spec for array<string> unary expressions */
  val stringArrayInput: Seq[AbstractDataType] =
    Seq(ArrayType(org.apache.spark.sql.types.StringType))
  /** input-type spec for string unary expressions */
  val stringInput: Seq[AbstractDataType] =
    Seq(org.apache.spark.sql.types.StringType)
  /** input-type spec for (binary, long) binary expressions (sketch probes) */
  val binaryLongInputs: Seq[AbstractDataType] =
    Seq(org.apache.spark.sql.types.BinaryType, org.apache.spark.sql.types.LongType)
  /** Where the session catalog would place an unqualified managed table —
    * robust to relative/space-containing warehouse dirs, unlike parsing
    * `spark.sql.warehouse.dir` through java.net.URI by hand. */
  def defaultTablePath(spark: org.apache.spark.sql.SparkSession, table: String): java.net.URI =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.catalog
      .defaultTablePath(org.apache.spark.sql.catalyst.TableIdentifier(table))
  /** A FRESH physical plan for `df`'s logical plan — never executed, so it
    * renders the deterministic INITIAL AQE plan regardless of whether the
    * frame itself was materialized. Plan audits need this for lineage-cut
    * subtrees: a cut frame that executed during a fixpoint loop carries an
    * AQE-finalized plan whose exchange counts reflect runtime broadcast
    * flips (context-dependent); the initial plan is a pure function of the
    * logical plan + static stats. Audit-only, plan is never run. */
  def freshInitialPlan(df: org.apache.spark.sql.DataFrame): String =
    df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.executePlan(df.queryExecution.logical)
      .executedPlan.toString
  /** Deterministic listener drain (`listenerBus` is `private[spark]`):
    * blocks until every queued event is delivered, replacing the replay
    * harness's fixed Thread.sleep whose late-arriving job-end events bled
    * a day's stage time into the next (ADVICE r13). */
  def waitListenerBusEmpty(sc: org.apache.spark.SparkContext): Unit =
    // generous explicit bound, and degrade instead of abort: the no-arg
    // variant throws TimeoutException on a slow drain (~10 s internal
    // bound), which after a heavy sf100 replay day would crash the whole
    // multi-day sweep rather than skew one day's stage attribution
    // (ADVICE r14). A drain that somehow exceeds 2 min falls through —
    // same behavior as the old fixed-sleep approach, minus the crash.
    try sc.listenerBus.waitUntilEmpty(120000L)
    catch {
      case _: java.util.concurrent.TimeoutException =>
        System.err.println("[bridge] listener bus did not drain in 120 s; " +
          "proceeding — stage attribution for this window may be incomplete")
    }
}
