package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Fused native sign-random-projection bucket id over an `array<float>`
  * vector — semantically identical to the HOF form
  * ([[graft.vector.VectorOps.srpBucketHof]]: per plane, `aggregate(
  * zip_with(vec, indexes, (x, i) => x * plane[i]))`, bit p set when the
  * projection is positive) but ONE JVM call per row instead of
  * `nPlanes` interpreted per-element lambda folds. The r9/r10 lesson
  * keeps repeating: higher-order functions evaluate OUTSIDE whole-stage
  * codegen, and q35's multi-table keys put 48 planes × dims of that tax
  * on every embedding row (the dominant term of its 100× cost).
  *
  * Bit-parity contract (NativeExprSpec pins it against the HOF form; the
  * SRP oracles q34/q35/q54/q121 hash-match it end-to-end):
  *  - plane constants are the same Scala-side fold
  *    ([[graft.vector.VectorOps.planeConst]]: md5-derived double in
  *    [-1, 1), keyed by the GLOBAL plane index `planeOffset + p`);
  *  - each plane's projection accumulates float→double products in
  *    index order — the exact association order of the sequential HOF
  *    left-fold — so the `> 0` sign test sees a bit-identical double;
  *  - dimensions at or beyond `maxDims` fall back to the md5 constant
  *    computed on demand (the HOF's `try_element_at` + md5 fallback);
  *  - a NULL element poisons every plane's sum in the HOF form
  *    (`when(null > 0, ...)` takes the otherwise-0 branch for ALL
  *    planes), so the fused form returns 0L the same way;
  *  - a NULL ARRAY likewise yields bucket 0L, not NULL — the HOF form's
  *    per-plane `when` folds a null projection to the otherwise-0 branch
  *    and the DuckDB oracles' `CASE WHEN ... ELSE 0` shape agrees, so
  *    the native form must not let UnaryExpression's null-intolerant
  *    default diverge the band keys (ADVICE r10).
  */
case class SrpBucket(child: Expression, nPlanes: Int, planeOffset: Int,
                     maxDims: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = bridge.floatArrayInput
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_srp_bucket"

  @transient private lazy val planes: Array[Array[Double]] =
    Array.tabulate(nPlanes, maxDims)((p, i) =>
      graft.vector.VectorOps.planeConst(planeOffset + p, i))

  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) 0L else compute(v.asInstanceOf[ArrayData])
  }

  /** Primitive-typed entry point shared by eval and codegen (a scala
    * `Long` return compiles to a primitive `long`, so the generated code
    * assigns without boxing). */
  def compute(arr: ArrayData): Long = {
    val n = arr.numElements()
    var i = 0
    while (i < n) { // null element → all plane sums null → no bit set
      if (arr.isNullAt(i)) return 0L
      i += 1
    }
    var bits = 0L
    var p = 0
    while (p < nPlanes) {
      val row = planes(p)
      var s = 0.0
      var j = 0
      while (j < n) {
        val c = if (j < maxDims) row(j)
                else graft.vector.VectorOps.planeConst(planeOffset + p, j)
        s += arr.getFloat(j).toDouble * c
        j += 1
      }
      if (s > 0) bits += (1L << p)
      p += 1
    }
    bits
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("srpBucket", this, classOf[SrpBucket].getName)
    val childGen = child.genCode(ctx)
    ev.copy(
      code = code"""
        ${childGen.code}
        long ${ev.value} = ${childGen.isNull} ? 0L : $ref.compute(${childGen.value});
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): SrpBucket =
    copy(child = newChild)
}
