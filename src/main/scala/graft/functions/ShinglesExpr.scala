package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native `n`-word shingling over a token array — semantically identical
  * to [[graft.text.TextOps.shinglesHof]] (`transform(sequence(...),
  * i => concat_ws(" ", element_at(tk, i)...))`) but one JVM call per row.
  * Shingling is the FIRST step of every text-dedup/fingerprint pipeline,
  * so its per-element interpreted overhead multiplies into everything
  * downstream; with [[MinhashBands]] and [[JaccardSim]] this completes
  * the native path for the three per-row hot spots.
  *
  * Parity: windows of exactly `n` tokens joined by single spaces
  * (`UTF8String.concatWs` — byte-identical to `concat_ws`), docs shorter
  * than `n` tokens yield an EMPTY array (not null), NULL input → NULL.
  * Token arrays come from `split`, which never yields null elements;
  * a null element would be skipped by concat_ws, and we mirror that.
  */
case class ShinglesExpr(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = bridge.stringArrayInput
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_shingles"

  override def nullSafeEval(input: Any): Any = {
    val tk = input.asInstanceOf[ArrayData]
    val m = tk.numElements()
    if (m < n) return new GenericArrayData(Array.empty[AnyRef])
    val sep = UTF8String.fromString(" ")
    val out = new Array[AnyRef](m - n + 1)
    var i = 0
    while (i <= m - n) {
      val parts = new Array[UTF8String](n)
      var j = 0
      while (j < n) {
        // concat_ws skips nulls; concatWs treats null as absent too
        parts(j) = if (tk.isNullAt(i + j)) null else tk.getUTF8String(i + j)
        j += 1
      }
      out(i) = UTF8String.concatWs(sep, parts: _*)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("shingles", this, classOf[ShinglesExpr].getName)
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.nullSafeEval($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): ShinglesExpr =
    copy(child = newChild)
}
