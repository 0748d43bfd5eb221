package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native normalize-and-tokenize — semantically identical to
  * `split(regexp_replace(lower(trim(text)), "\\s+", " "), " ")` (the
  * [[graft.text.TextOps.tokensHof]] executable specification) but one
  * JVM call per row with NO regex engine: trim and lowercase reuse the
  * exact `UTF8String` operations the built-in `trim`/`lower`
  * expressions call, and the `\s+`-collapse + single-space split is one
  * byte walk (every `\s` class member — TAB/LF/VT/FF/CR/space — is
  * single-byte in UTF-8, so multibyte characters can never false-match).
  * Tokenization is the per-row hot spot ABOVE shingling in every text
  * pipeline (two regex passes over the full text per row — measured
  * 4.3 s of q177's 17 s at 100× rows); with [[ShinglesExpr]],
  * [[MinhashBands]] and [[JaccardSim]] this makes the whole
  * text→tokens→shingles→bands path regex-free and native.
  *
  * Parity corners (all pinned in NativeExprSpec against the regex
  * formulation): leading non-space whitespace yields a leading empty
  * token (trim strips only 0x20, the collapsed run then splits), a
  * trailing run yields a trailing empty token (`split` keeps trailing
  * empties at limit −1), empty/all-space input yields `[""]`, and
  * interior runs of mixed whitespace act as ONE separator.
  */
case class NormTokensExpr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = bridge.stringInput
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_norm_tokens"

  private def isWs(b: Byte): Boolean =
    b == 0x20 || (b >= 0x09 && b <= 0x0d)

  override def nullSafeEval(input: Any): Any = {
    val lowered = input.asInstanceOf[UTF8String].trim().toLowerCase()
    val bs = lowered.getBytes
    val n = bs.length
    val out = new scala.collection.mutable.ArrayBuffer[AnyRef](8)
    var i = 0
    var start = 0
    while (i < n) {
      if (isWs(bs(i))) {
        out += UTF8String.fromBytes(bs, start, i - start)
        while (i < n && isWs(bs(i))) i += 1
        start = i
      } else i += 1
    }
    out += UTF8String.fromBytes(bs, start, n - start)
    new GenericArrayData(out.toArray)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("normTokens", this, classOf[NormTokensExpr].getName)
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.nullSafeEval($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): NormTokensExpr =
    copy(child = newChild)
}
