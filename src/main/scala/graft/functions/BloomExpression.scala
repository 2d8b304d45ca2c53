package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Codegen'd Bloom-filter membership probe over a broadcast sketch.
  *
  * Spark's own `BloomFilterMightContain` is not public API, and a Scala
  * UDF probe (the previous d12 implementation, kept as the spec's
  * cross-check) boxes every row and blocks whole-stage codegen for the
  * enclosing filter. This expression stays inside the codegen span: one
  * virtual call per row into the sketch's bit array, probing the string's
  * UTF-8 bytes directly (`mightContainBinary` — byte-identical to
  * `BloomFilter.mightContainString`, which round-trips through the same
  * UTF-8 bytes) with no String allocation.
  *
  * The broadcast handle itself is the expression's second "child": each
  * executor resolves `.value()` once per codegen instance, not per row.
  */
case class BloomMightContain(child: Expression,
    bloomBc: Broadcast[BloomFilter]) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects string, got $t")
  }
  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_might_contain"

  override def nullSafeEval(s: Any): Any =
    bloomBc.value.mightContainBinary(s.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("graftBloomBc", bloomBc,
      classOf[Broadcast[_]].getName)
    // resolve the broadcast once per operator instance, not per row
    val bloom = ctx.addMutableState(classOf[BloomFilter].getName, "graftBloom",
      v => s"$v = (${classOf[BloomFilter].getName}) $bcRef.value();")
    defineCodeGen(ctx, ev, c => s"$bloom.mightContainBinary($c.getBytes())")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BloomMightContain {
  /** Column wrapper. */
  def bloomMightContain(col: Column, bc: Broadcast[BloomFilter]): Column =
    GraftSqlBridge.column(
      BloomMightContain(GraftSqlBridge.expression(col), bc))
}
