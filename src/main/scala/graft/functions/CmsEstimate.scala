package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.util.sketch.CountMinSketch

/** Point-estimate probe into a serialized count-min sketch — the read side
  * Spark's own `count_min_sketch` aggregate lacks (the aggregate emits the
  * sketch as `binary`; nothing in `functions._` can query it, which forces
  * a driver-side `CountMinSketch.readFrom` collect in vanilla Spark).
  * With this expression the probe stays declarative: the 1-row sketch
  * rides a broadcast and every key row evaluates inside whole-stage
  * codegen, so heavy-hitter estimation over 100 TB is sketch-build (one
  * commutative aggregate, mergeable partials) + broadcast probe — no
  * second full scan, no driver round-trip.
  *
  * CMS guarantees (and [[graft.queries.QCurate]] q129 asserts as
  * oracle-checked booleans): estimates never undercount, and overcount by
  * at most `eps * N` with the aggregate's configured confidence.
  */
case class CmsEstimate(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes = bridge.binaryLongInputs
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_cms_estimate"

  // one serialized sketch typically serves MANY probe rows (it arrives via
  // a 1-row broadcast) — deserialize once per distinct byte image, not per
  // row; the equality check is cheap next to a per-row readFrom
  @transient private var lastBytes: Array[Byte] = _
  @transient private var lastSketch: CountMinSketch = _

  override def nullSafeEval(sketchBytes: Any, key: Any): Any = {
    val bytes = sketchBytes.asInstanceOf[Array[Byte]]
    if (lastSketch == null || !java.util.Arrays.equals(bytes, lastBytes)) {
      lastSketch = CountMinSketch.readFrom(bytes)
      lastBytes = bytes
    }
    lastSketch.estimateCount(key.asInstanceOf[java.lang.Long])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (sk, k) => {
      val ref = ctx.addReferenceObj("cmsEst", this, classOf[CmsEstimate].getName)
      s"${ev.value} = ((java.lang.Long) $ref.nullSafeEval($sk, java.lang.Long.valueOf($k))).longValue();"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmsEstimate =
    copy(left = newLeft, right = newRight)
}

object Cms {
  /** `estimate(sketch, key)` — probe a `count_min_sketch(...)` binary. */
  def estimate(sketch: Column, key: Column): Column =
    bridge.column(CmsEstimate(bridge.expression(sketch), bridge.expression(key)))
}
