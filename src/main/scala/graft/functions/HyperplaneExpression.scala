package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Random-hyperplane LSH signature of an `array<double>` vector in ONE
  * fused per-row loop: bit p = sign of ⟨vec, plane_p⟩, where plane_p's
  * component for dim i derives deterministically from
  * `xxhash64(p, i)` mapped to [−1, 1) — exactly the
  * `Similarity.hyperplaneBucketsHof` formulation (kept as the spec oracle),
  * which pays `nPlanes` interpreted lambda passes per vector. The hash
  * chain matches Spark's `xxhash64(lit(p), i)` over two int columns
  * (seed 42, then chained), so signatures are identical bit-for-bit and
  * reproducible on any cluster.
  */
case class HyperplaneSignature(child: Expression, nPlanes: Int)
    extends UnaryExpression {
  require(nPlanes >= 1 && nPlanes <= 64, "1..64 sign bits fit one long")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<double>, got $t")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_hyperplane_sig"

  override def nullSafeEval(a: Any): Any =
    HyperplaneSignature.compute(a.asInstanceOf[ArrayData], nPlanes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.HyperplaneSignature$$.MODULE$$.compute($c, $nPlanes)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HyperplaneSignature {
  /** Tight-loop kernel; public so generated code can call it. */
  def compute(arr: ArrayData, nPlanes: Int): Long = {
    val n = arr.numElements()
    var sig = 0L
    var p = 0
    while (p < nPlanes) {
      // Spark's xxhash64(p, i): seed 42, each int column hashed in turn
      val hp = XXH64.hashInt(p, 42L)
      var d = 0.0
      var i = 0
      while (i < n) {
        val h = java.lang.Math.floorMod(XXH64.hashInt(i, hp), 2000001L)
        d += arr.getDouble(i) * (h.toDouble / 1000000.0 - 1.0)
        i += 1
      }
      if (d >= 0) sig |= (1L << p)
      p += 1
    }
    sig
  }

  /** Column wrapper. */
  def hyperplaneSig(vec: Column, nPlanes: Int): Column =
    GraftSqlBridge.column(
      HyperplaneSignature(GraftSqlBridge.expression(vec), nPlanes))
}
