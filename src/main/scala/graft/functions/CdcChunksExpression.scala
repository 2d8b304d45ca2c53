package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunking (Rabin-style CDC — the storage-dedup cut rule
  * of LBFS/rsync lineage, the shape FastCDC normalizes): split a document
  * at positions where a k-codepoint rolling hash satisfies
  * `h % divisor == divisor - 1`, yielding chunks whose boundaries move
  * WITH the content — an insertion perturbs only the chunks it touches,
  * while every downstream chunk re-aligns and deduplicates against other
  * document versions (fixed-width chunking loses alignment at the first
  * edit). Expected chunk length ≈ `divisor` codepoints.
  *
  * One fused per-row loop over the LOWERCASED text's code points
  * (locale-independent lowercase + the same base-257 mod-1000003 boundary
  * hash as [[WinnowingFingerprints]] — explicit arithmetic, not an
  * engine-private hash, so DuckDB re-derives identical boundaries and the
  * operator gets a full value oracle). Each chunk is emitted as
  * `struct(h: long, l: int)`: `l` the codepoint length, `h` a 61-bit
  * double polynomial identity hash
  * `h1 * 1000000007 + h2` with `h1` base-257 mod 2³¹−1 and `h2` base-131
  * mod 10⁹+7 — both folds stay inside BIGINT range in SQL, and the
  * combined ~2⁶¹ space keeps birthday collisions negligible at corpus
  * scale (~10⁹ chunks ⇒ ~10⁻⁴ collision odds overall).
  *
  * Production note: FastCDC adds min/max chunk-length normalization —
  * a stateful per-row extension of this loop (boundary eligibility then
  * depends on the previous cut); kept out here because the pure
  * content-local rule is the part that matters for cross-version dedup
  * and is the contract the SQL oracle can replay.
  */
case class CdcChunks(child: Expression, k: Int, divisor: Int)
    extends UnaryExpression {
  require(k >= 1, "window must be >= 1")
  require(divisor >= 2, "divisor must be >= 2")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects string, got $t")
  }
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("h", LongType, nullable = false),
      StructField("l", IntegerType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "graft_cdc_chunks"

  override def nullSafeEval(a: Any): Any =
    CdcChunks.compute(a.asInstanceOf[UTF8String], k, divisor)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.CdcChunks$$.MODULE$$.compute($c, $k, $divisor)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CdcChunks {
  private val BoundP = 1000003L // boundary rolling hash modulus (winnowing's)
  private val B1 = 257L
  private val P1 = 2147483647L // 2^31 - 1
  private val B2 = 131L
  private val P2 = 1000000007L

  /** Tight-loop kernel; public so generated code can call it. */
  def compute(s: UTF8String, k: Int, divisor: Int): ArrayData = {
    // same lowercase + codepoint conventions as WinnowingFingerprints
    // (ROOT locale; DuckDB ord(substring(lower(t), i, 1)) parity)
    val lower = s.toString.toLowerCase(java.util.Locale.ROOT)
    val n = lower.codePointCount(0, lower.length)
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val cps = new Array[Int](n)
    var ci = 0
    var off = 0
    while (off < lower.length) {
      val cp = lower.codePointAt(off)
      cps(ci) = cp
      ci += 1
      off += Character.charCount(cp)
    }
    val target = (divisor - 1).toLong
    val chunks = scala.collection.mutable.ArrayBuffer.empty[Any]
    var start = 0
    def emit(endExcl: Int): Unit = if (endExcl > start) {
      var h1 = 0L
      var h2 = 0L
      var i = start
      while (i < endExcl) {
        h1 = (h1 * B1 + cps(i)) % P1
        h2 = (h2 * B2 + cps(i)) % P2
        i += 1
      }
      chunks += new GenericInternalRow(
        Array[Any](h1 * P2 + h2, endExcl - start))
      start = endExcl
    }
    if (n >= k) {
      // rolling boundary hash of the k-window ENDING at j (recomputed per
      // window: k is small and a remove-leading-term rolling update needs
      // a modular inverse; O(n·k) matches the winnowing kernel's cost)
      var j = k - 1
      while (j < n) {
        var h = 0L
        var i = j - k + 1
        while (i <= j) { h = (h * B1 + cps(i)) % BoundP; i += 1 }
        if (h % divisor == target) emit(j + 1)
        j += 1
      }
    }
    emit(n) // trailing chunk (or whole doc when n < k / no boundary hit)
    new GenericArrayData(chunks.toArray)
  }

  /** Column wrapper. */
  def cdcChunks(text: Column, k: Int, divisor: Int): Column =
    GraftSqlBridge.column(
      CdcChunks(GraftSqlBridge.expression(text), k, divisor))
}
