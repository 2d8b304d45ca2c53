package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData, MapData}
import org.apache.spark.sql.types.{ArrayType, DataType, MapType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One greedy left-to-right batch-merge pass over a symbol array in a
  * single native loop — the trainer's inner kernel.
  *
  * Identical semantics to `Bpe.applyMergeMapFold` (kept as the spec twin
  * BpeSpec pins element-for-element): walk the symbols; whenever the
  * length-prefixed pair key `len(last) ":" last x` is in the merge map,
  * replace the accumulator's last element with the merged symbol, else
  * append. The composable HOF form rebuilt the accumulator ARRAY per
  * element (`concat(slice(acc, 1, n−1), …)` — quadratic copying per word,
  * paid EVERY driver round of a train), and higher-order lambdas get no
  * codegen; this kernel keeps one in-place buffer and probes the (≤
  * maxBatch-sized) merge map by direct byte comparison — no per-element
  * allocation beyond the key. */
case class BpeMergePass(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), MapType(StringType, StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (array<string>, map<string,string>), got ($l, $r)")
    }
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def prettyName: String = "graft_bpe_merge_pass"

  override def nullSafeEval(a: Any, m: Any): Any =
    BpeMergePass.compute(a.asInstanceOf[ArrayData], m.asInstanceOf[MapData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, m) =>
      s"graft.functions.BpeMergePass$$.MODULE$$.compute($a, $m)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

object BpeMergePass {
  private val Colon = UTF8String.fromString(":")

  /** Tight-loop kernel; public so generated code can call it. Outputs are
    * CLONED off the (possibly buffer-backed) input array; merged symbols
    * come from the broadcast map's stable bytes. A null symbol never
    * merges (the fold's null pair key probes nothing) and is appended
    * as-is. */
  def compute(syms: ArrayData, m: MapData): ArrayData = {
    val n = syms.numElements()
    val keys = m.keyArray()
    val vals = m.valueArray()
    val mn = m.numElements()
    val buf = new Array[Any](n)
    var len = 0
    var i = 0
    while (i < n) {
      val x: UTF8String =
        if (syms.isNullAt(i)) null else syms.getUTF8String(i)
      var merged: UTF8String = null
      if (len > 0 && x != null) {
        val l = buf(len - 1).asInstanceOf[UTF8String]
        if (l != null) {
          val key = UTF8String.concat(
            UTF8String.fromString(java.lang.Integer.toString(l.numChars())),
            Colon, l, x)
          var j = 0
          while (j < mn && merged == null) {
            if (keys.getUTF8String(j).equals(key)) {
              merged = vals.getUTF8String(j)
            }
            j += 1
          }
        }
      }
      if (merged != null) buf(len - 1) = merged.clone()
      else { buf(len) = if (x == null) null else x.clone(); len += 1 }
      i += 1
    }
    if (len == n) new GenericArrayData(buf)
    else new GenericArrayData(java.util.Arrays.copyOf(
      buf.asInstanceOf[Array[AnyRef]], len).asInstanceOf[Array[Any]])
  }

  /** Column wrapper. */
  def of(syms: Column, m: Column): Column =
    GraftSqlBridge.column(BpeMergePass(
      GraftSqlBridge.expression(syms), GraftSqlBridge.expression(m)))
}
