package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing fingerprint set of a string in ONE fused per-row loop
  * (Schleimer/Wilkerson/Aiken, SIGMOD'03 — the MOSS algorithm): k-gram
  * polynomial rolling hashes over the LOWERCASED text, minimum hash of
  * every w-window, distinct + sorted.
  *
  * The hash is an explicit base-257 polynomial mod 1000003 over code
  * points — not an engine-private hash — so DuckDB can recompute the very
  * same fingerprints and the operator gets a value oracle. The composable
  * higher-order-function formulation ([[TextAnalysis-adjacent spec]])
  * re-evaluates the inner arrays per lambda element (no CSE through
  * lambdas: O(n³) per row — measured minutes per 500-doc batch); this
  * kernel is O(n·k + n·w) with zero allocation beyond the output. */
case class WinnowingFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression {
  require(k >= 1 && w >= 1, "k-gram size and window must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects string, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_winnowing"

  override def nullSafeEval(a: Any): Any =
    WinnowingFingerprints.compute(a.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.WinnowingFingerprints$$.MODULE$$.compute($c, $k, $w)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WinnowingFingerprints {
  private val P = 1000003L
  private val B = 257L

  /** Tight-loop kernel; public so generated code can call it. */
  def compute(s: UTF8String, k: Int, w: Int): ArrayData = {
    // locale-independent lowercase (UTF8String.toLowerCase falls back to
    // the DEFAULT locale for non-ASCII — a Turkish-locale JVM would map
    // 'I' to U+0131 and silently diverge from DuckDB's utf8proc lower()),
    // then code points (== DuckDB ord(substring(t, i, 1)))
    val lower = s.toString.toLowerCase(java.util.Locale.ROOT)
    val n = lower.codePointCount(0, lower.length)
    if (n < k) return new GenericArrayData(Array.empty[Any])
    val cps = new Array[Int](n)
    var ci = 0
    var off = 0
    while (off < lower.length) {
      val cp = lower.codePointAt(off)
      cps(ci) = cp
      ci += 1
      off += Character.charCount(cp)
    }
    val m = n - k + 1
    val hashes = new Array[Long](m)
    var i = 0
    while (i < m) {
      var h = 0L
      var j = 0
      while (j < k) { h = (h * B + cps(i + j)) % P; j += 1 }
      hashes(i) = h
      i += 1
    }
    val mins = new java.util.TreeSet[java.lang.Long]()
    if (m <= w) {
      var best = Long.MaxValue
      var t = 0
      while (t < m) { if (hashes(t) < best) best = hashes(t); t += 1 }
      mins.add(best)
    } else {
      var t = 0
      while (t <= m - w) {
        var best = Long.MaxValue
        var j = 0
        while (j < w) { if (hashes(t + j) < best) best = hashes(t + j); j += 1 }
        mins.add(best)
        t += 1
      }
    }
    val out = new Array[Any](mins.size)
    val it = mins.iterator()
    var oi = 0
    while (it.hasNext) { out(oi) = it.next().longValue(); oi += 1 }
    new GenericArrayData(out)
  }

  /** Column wrapper. */
  def winnowing(text: Column, k: Int, w: Int): Column =
    GraftSqlBridge.column(
      WinnowingFingerprints(GraftSqlBridge.expression(text), k, w))
}
