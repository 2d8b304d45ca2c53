package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** 64-bit SimHash of a token array in ONE fused per-row loop.
  *
  * The composable formulation (explode tokens → hash → 64 sum-aggregates
  * → bit recombine) shuffles one row per token and pays a 64-column
  * aggregate; this expression computes the identical hash map-side: per
  * token two polynomial hashes and 64 vote updates in a local array — no
  * shuffle, no wide agg, and the explode row blow-up disappears. Semantics
  * match the aggregate formulation bit-for-bit: vote +1 when the token's
  * bit-b parity is set else −1, output bit b = (vote > 0), null tokens
  * skipped.
  *
  * The per-token hash is deliberately NOT an engine-private hash: two
  * explicit polynomial hashes over code points (base 257 mod 1000003 and
  * base 263 mod 999983 — the same construction as
  * [[WinnowingFingerprints]]) are combined Kirsch–Mitzenhauser style,
  * bit b's vote = parity of (h1 + (b+1)·h2) mod 1000003. DuckDB can
  * recompute the identical fingerprint with list_reduce, which upgrades the
  * d05 driver gate from a rows-only check to a full value oracle.
  *
  * SimHash itself follows Charikar (STOC'02) as used by the reference-class
  * dedup pipelines; the caller is responsible for token distinctness
  * (`array_distinct`) so repeated tokens don't double-vote.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<string>, got $t")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash64"

  override def nullSafeEval(a: Any): Any =
    SimHash64.compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.SimHash64$$.MODULE$$.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash64 {
  private val P1 = 1000003L
  private val B1 = 257L
  private val P2 = 999983L
  private val B2 = 263L

  /** The two SQL-reproducible polynomial hashes of one token (over code
    * points, == DuckDB `ord(substring(tok, i, 1))` folds). Exposed so the
    * explode/aggregate test formulation hashes exactly like the kernel. */
  def tokenHashes(s: String): (Long, Long) = {
    var h1 = 0L
    var h2 = 0L
    var off = 0
    while (off < s.length) {
      val cp = s.codePointAt(off)
      h1 = (h1 * B1 + cp) % P1
      h2 = (h2 * B2 + cp) % P2
      off += Character.charCount(cp)
    }
    (h1, h2)
  }

  /** Tight-loop kernel; public so generated code can call it. */
  def compute(arr: ArrayData): Long = {
    val votes = new Array[Int](64)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val (h1, h2) = tokenHashes(arr.getUTF8String(i).toString)
        var b = 0
        while (b < 64) {
          if (((h1 + (b + 1) * h2) % P1 & 1L) != 0L) votes(b) += 1
          else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** Column wrapper. */
  def simhash64(tokens: Column): Column =
    GraftSqlBridge.column(SimHash64(GraftSqlBridge.expression(tokens)))
}
