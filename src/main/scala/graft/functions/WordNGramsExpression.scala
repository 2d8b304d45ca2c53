package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Word n-grams of a token array (space-joined sliding windows) in ONE
  * fused per-row loop — distinct set or in-order multiset.
  *
  * Composable form: `transform(sequence(1, size−n+1), i =>
  * array_join(slice(toks, i, n), " "))` (+ `array_distinct`). Higher-order
  * lambdas get no codegen, and worse, any expression tree inside the lambda
  * body — e.g. an inlined `split(lower(trim(text)))` tokenizer — is
  * re-evaluated per element, turning one tokenize per document into one per
  * gram position (measured ~4 s for 5 000 × 300-char docs at sf0.1; this
  * kernel does the same corpus in ~50 ms). Here the token array is
  * evaluated exactly once and the windows are assembled in a linear scan
  * with a reused buffer.
  *
  * Semantics parity with the lambda form (the DuckDB oracles are written
  * against it): null tokens are skipped by the join exactly like
  * `array_join` without a null replacement; `distinct = true` keeps first
  * occurrences in order exactly like `array_distinct`; arrays shorter than
  * `n` yield an EMPTY gram set.
  */
case class WordNGrams(child: Expression, n: Int, distinct: Boolean)
    extends UnaryExpression {
  require(n >= 1, "n-gram size must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<string>, got $t")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_word_ngrams"

  override def nullSafeEval(a: Any): Any =
    WordNGrams.compute(a.asInstanceOf[ArrayData], n, distinct)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.WordNGrams$$.MODULE$$.compute($c, $n, $distinct)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordNGrams {
  private val Space = UTF8String.fromString(" ")

  /** Tight-loop kernel; public so generated code can call it. */
  def compute(toks: ArrayData, n: Int, distinct: Boolean): ArrayData = {
    val len = toks.numElements()
    val count = len - (n - 1)
    if (count <= 0) return new GenericArrayData(Array.empty[Any])
    val window = new Array[UTF8String](n)
    if (distinct) {
      val seen = new java.util.LinkedHashSet[UTF8String](count * 2 + 1)
      var i = 0
      while (i < count) {
        seen.add(gramAt(toks, i, n, window))
        i += 1
      }
      new GenericArrayData(seen.toArray.asInstanceOf[Array[Any]])
    } else {
      val out = new Array[Any](count)
      var i = 0
      while (i < count) {
        out(i) = gramAt(toks, i, n, window)
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  /** Space-join of `toks[i, i+n)`, skipping nulls like `array_join` with no
    * null replacement (concatWs has the identical skip-null contract). */
  private def gramAt(toks: ArrayData, i: Int, n: Int,
      window: Array[UTF8String]): UTF8String = {
    var j = 0
    while (j < n) {
      window(j) = if (toks.isNullAt(i + j)) null else toks.getUTF8String(i + j)
      j += 1
    }
    UTF8String.concatWs(Space, window: _*)
  }

  /** Column wrapper: distinct gram set (first-occurrence order). */
  def wordNGrams(toks: Column, n: Int): Column =
    GraftSqlBridge.column(
      WordNGrams(GraftSqlBridge.expression(toks), n, distinct = true))

  /** Column wrapper: all grams in order (multiset). */
  def wordNGramsAll(toks: Column, n: Int): Column =
    GraftSqlBridge.column(
      WordNGrams(GraftSqlBridge.expression(toks), n, distinct = false))
}
