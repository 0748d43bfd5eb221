package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{DataType, LongType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-document Gopher-style repetition masses over a token array, in ONE
  * JVM call per row: character mass (`count · length`) of the most frequent
  * 1/2/3-gram (count DESC, gram ASC binary tie-break — exactly
  * `row_number() OVER (ORDER BY c DESC, gram ASC)`) and the duplicated
  * 5-gram mass (`Σ_{c≥2} (c−1)·length`). Missing gram sizes (doc shorter
  * than `n` tokens) contribute 0, mirroring the exploded form's
  * `coalesce(max(...), 0)` over an absent group.
  *
  * These are row-local quantities: the exploded
  * `explode → groupBy(doc_id, n, gram) → window → rollup` formulation that
  * remains the q123 ORACLE shuffles the entire gram stream (~#tokens·4
  * rows, each carrying the gram string — measured 100× corpus: every
  * executor thread in shuffle-spill writes, 42 s wall) to compute values
  * that never leave the row. One hash-count pass per gram size here; the
  * only downstream shuffle left in q123 is nothing at all.
  *
  * Parity contract (pinned in NativeExprSpec against the exploded HOF
  * form): grams are space-joined token windows ([[ShinglesExpr]]
  * semantics), lengths are CHARACTER counts (`UTF8String.numChars` ≡
  * `length()` in both engines), tie-break compares gram bytes unsigned
  * (`UTF8String.compareTo` ≡ DuckDB's default binary collation). Null
  * input → null; null tokens never occur ([[NormTokensExpr]] output).
  */
case class RepetitionStats(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = bridge.stringArrayInput
  override def dataType: DataType = StructType(Seq(
    StructField("m1", LongType, nullable = false),
    StructField("m2", LongType, nullable = false),
    StructField("m3", LongType, nullable = false),
    StructField("dup5", LongType, nullable = false)))
  override def prettyName: String = "graft_repetition_stats"

  override def nullSafeEval(input: Any): Any =
    RepetitionStats.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("repStats", this, classOf[RepetitionStats].getName)
      s"${ev.value} = (org.apache.spark.sql.catalyst.InternalRow) $ref.nullSafeEval($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): RepetitionStats =
    copy(child = newChild)
}

object RepetitionStats {
  private val sep = UTF8String.fromString(" ")

  /** Count n-gram occurrences; one HashMap pass per gram size. */
  private def gramCounts(tk: ArrayData, n: Int): java.util.HashMap[UTF8String, Int] = {
    val m = tk.numElements()
    val out = new java.util.HashMap[UTF8String, Int]()
    if (m < n) return out
    var i = 0
    while (i <= m - n) {
      val gram =
        if (n == 1) tk.getUTF8String(i)
        else {
          val parts = new Array[UTF8String](n)
          var j = 0
          while (j < n) {
            parts(j) = if (tk.isNullAt(i + j)) null else tk.getUTF8String(i + j)
            j += 1
          }
          UTF8String.concatWs(sep, parts: _*)
        }
      out.merge(gram, 1, (a, b) => a + b)
      i += 1
    }
    out
  }

  /** Mass of the (c DESC, gram ASC) top gram; 0 when no grams. */
  private def topMass(counts: java.util.HashMap[UTF8String, Int]): Long = {
    var bestC = 0
    var bestG: UTF8String = null
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val c = e.getValue
      if (c > bestC || (c == bestC && bestG != null && e.getKey.compareTo(bestG) < 0)) {
        bestC = c
        bestG = e.getKey
      }
    }
    if (bestG == null) 0L else bestC.toLong * bestG.numChars()
  }

  def compute(tk: ArrayData): InternalRow = {
    val m1 = topMass(gramCounts(tk, 1))
    val m2 = topMass(gramCounts(tk, 2))
    val m3 = topMass(gramCounts(tk, 3))
    var dup5 = 0L
    val it = gramCounts(tk, 5).entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getValue >= 2) dup5 += (e.getValue - 1).toLong * e.getKey.numChars()
    }
    new GenericInternalRow(Array[Any](m1, m2, m3, dup5))
  }
}
