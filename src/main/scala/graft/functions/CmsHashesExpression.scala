package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** All `depth` count-min-sketch row buckets of a key in ONE fused
  * codepoint walk.
  *
  * Identical math to `Sketches.cmsBucket` (kept as the test oracle and the
  * DuckDB-replayed spec): per row j the d13 polynomial fold
  * `acc·base_j + cp (mod 2³¹−1)` over the key's codepoints, then mod the
  * grid width. The composable form pays `depth` higher-order-function
  * passes, each re-splitting the key into per-codepoint UTF8Strings and
  * re-decoding each via `ascii` (HOF lambdas get no codegen and no CSE —
  * the t46 lesson); this kernel decodes each codepoint once and advances
  * all `depth` accumulators in a local array — one string walk instead of
  * `depth` split+fold passes, zero allocation per codepoint. Bases and
  * modulus are compile-time constants of the sketch, so buckets stay
  * reproducible anywhere.
  */
case class CmsRowBuckets(child: Expression, bases: Seq[Long], prime: Long,
    width: Long) extends UnaryExpression {
  // compute() folds with plain `%`, which equals the spec's pmod ONLY
  // while every step stays non-negative and below 2⁶³: acc < prime and
  // cp ≤ 0x10FFFF, so acc·base + cp < prime·base + 2²¹ — bounded by
  // requiring base ≤ (2⁶³−1−2²¹)/prime. Fail loudly at construction
  // instead of silently diverging from cmsBucket/featureHashSpec for an
  // out-of-family base (round-16 advisor note).
  require(prime > 0 && width > 0, s"$prettyName: prime/width must be positive")
  require(bases.forall(b => b > 0 && b <= (Long.MaxValue - 0x200000L) / prime),
    s"$prettyName: a base must satisfy 0 < base <= (2^63-1-2^21)/prime " +
      s"so the %-fold equals pmod (got bases=$bases, prime=$prime)")

  // one conversion per expression instance, not per row — nullSafeEval
  // (the interpreted path) otherwise allocated a fresh array per key
  @transient private lazy val basesArr: Array[Long] = bases.toArray

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects string, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_cms_row_buckets"

  override def nullSafeEval(a: Any): Any =
    CmsRowBuckets.compute(a.asInstanceOf[UTF8String], basesArr, prime,
      width)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val basesRef = ctx.addReferenceObj("cmsBases", basesArr,
      "long[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.CmsRowBuckets$$.MODULE$$.compute($c, $basesRef, " +
        s"${prime}L, ${width}L)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CmsRowBuckets {
  /** Tight-loop kernel; public so generated code can call it. Walks the
    * key's codepoints (matching `split(key, "")` + `ascii`, which keep
    * surrogate pairs whole — the q40 astral contract) and folds every row
    * base in the same pass. All accumulators stay in [0, prime) and
    * `acc·base + cp` < 2⁶³ for the repo's base/prime families, so `%`
    * equals `pmod`. */
  def compute(key: UTF8String, bases: Array[Long], prime: Long,
      width: Long): ArrayData = {
    val d = bases.length
    val acc = new Array[Long](d)
    val s = key.toString
    val n = s.length
    var i = 0
    while (i < n) {
      val cp = s.codePointAt(i)
      i += Character.charCount(cp)
      var j = 0
      while (j < d) {
        acc(j) = (acc(j) * bases(j) + cp) % prime
        j += 1
      }
    }
    var j = 0
    while (j < d) { acc(j) = acc(j) % width; j += 1 }
    new GenericArrayData(acc)
  }

  /** Column wrapper: `[bucket_0, …, bucket_{depth−1}]` of the key. */
  def of(key: Column, bases: Seq[Long], prime: Long, width: Long): Column =
    GraftSqlBridge.column(
      CmsRowBuckets(GraftSqlBridge.expression(key), bases, prime, width))
}
