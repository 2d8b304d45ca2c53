package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Native Catalyst kernels for the product-quantization hot paths
  * (§2.10 escalation: higher-order functions evaluate interpreted — one
  * boxed lambda call per element — and the PQ loops are m·ksub·dsub deep
  * per ROW, so the HOF forms pay millions of closure calls per partition;
  * measured 6–7 s per s08/s09 gate at sf0.1, ~SF-independent. These fuse
  * the loops into one generated method inside WholeStageCodegen; the HOF
  * formulations remain in [[graft.pipeline.Similarity]] as the
  * equivalence oracles for the spec, same convention as cosineHof).
  *
  * Arithmetic is bit-identical to the HOF forms: squared-distance
  * accumulation in index order, argmin keeps the FIRST minimum (the
  * `array_position(array_min)` tie rule), ADC sums lookup values in
  * subspace order. */

/** `PqEncodeCodes(vec, cb)`: array<double> × array<array<array<double>>>
  * → array<int> — per subspace j, the index of the nearest centroid of
  * cb[j] to the j-th slice of `vec`. NULL when the codebook geometry does
  * not tile the vector. */
case class PqEncodeCodes(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _),
          ArrayType(ArrayType(ArrayType(DoubleType, _), _), _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (array<double>, array<array<array<double>>>), got ($l, $r)")
    }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_pq_encode"
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val vec = a.asInstanceOf[ArrayData]
    val cb = b.asInstanceOf[ArrayData]
    val m = cb.numElements()
    if (m == 0 || cb.getArray(0).numElements() == 0) return null
    val dsub = cb.getArray(0).getArray(0).numElements()
    if (vec.numElements() != m * dsub) return null
    val codes = new Array[Int](m)
    var j = 0
    while (j < m) {
      val sub = cb.getArray(j)
      val ksub = sub.numElements()
      if (ksub == 0) return null
      val base = j * dsub
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < ksub) {
        val cent = sub.getArray(c)
        // ragged codebook (a centroid shorter/longer than dsub) would
        // read out of bounds in the codegen path — NULL per the contract
        if (cent.numElements() != dsub) return null
        var d = 0.0
        var i = 0
        while (i < dsub) {
          val t = vec.getDouble(base + i) - cent.getDouble(i)
          d += t * t
          i += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      codes(j) = best
      j += 1
    }
    new GenericArrayData(codes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val m = ctx.freshName("m")
      val dsub = ctx.freshName("dsub")
      val codes = ctx.freshName("codes")
      val j = ctx.freshName("j")
      val sub = ctx.freshName("sub")
      val ksub = ctx.freshName("ksub")
      val base = ctx.freshName("base")
      val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD")
      val c = ctx.freshName("c")
      val cent = ctx.freshName("cent")
      val d = ctx.freshName("d")
      val i = ctx.freshName("i")
      val t = ctx.freshName("t")
      s"""
        final int $m = $b.numElements();
        final int $dsub = ($m == 0 || $b.getArray(0).numElements() == 0) ? 0
          : $b.getArray(0).getArray(0).numElements();
        if ($m == 0 || $dsub == 0 || $a.numElements() != $m * $dsub) {
          ${ev.isNull} = true;
        } else {
          final int[] $codes = new int[$m];
          for (int $j = 0; $j < $m && !${ev.isNull}; $j++) {
            final org.apache.spark.sql.catalyst.util.ArrayData $sub =
              $b.getArray($j);
            final int $ksub = $sub.numElements();
            if ($ksub == 0) { ${ev.isNull} = true; continue; }
            final int $base = $j * $dsub;
            int $best = 0;
            double $bestD = Double.MAX_VALUE;
            for (int $c = 0; $c < $ksub && !${ev.isNull}; $c++) {
              final org.apache.spark.sql.catalyst.util.ArrayData $cent =
                $sub.getArray($c);
              if ($cent.numElements() != $dsub) { ${ev.isNull} = true; continue; }
              double $d = 0.0;
              for (int $i = 0; $i < $dsub; $i++) {
                final double $t = $a.getDouble($base + $i) - $cent.getDouble($i);
                $d += $t * $t;
              }
              if ($d < $bestD) { $bestD = $d; $best = $c; }
            }
            $codes[$j] = $best;
          }
          if (!${ev.isNull}) {
            ${ev.value} =
              new org.apache.spark.sql.catalyst.util.GenericArrayData($codes);
          }
        }
      """
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

/** `PqAdcDistance(lut, codes)`: array<array<double>> × array<int> →
  * double — Σ_j lut[j][codes[j]], the asymmetric-distance lookup per
  * (query, code row). NULL on shape mismatch or out-of-range code. */
case class PqAdcDistance(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(ArrayType(DoubleType, _), _), ArrayType(IntegerType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (array<array<double>>, array<int>), got ($l, $r)")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_pq_adc"
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val lut = a.asInstanceOf[ArrayData]
    val codes = b.asInstanceOf[ArrayData]
    val m = lut.numElements()
    if (codes.numElements() != m) return null
    var sum = 0.0
    var j = 0
    while (j < m) {
      val row = lut.getArray(j)
      val c = codes.getInt(j)
      if (c < 0 || c >= row.numElements()) return null
      sum += row.getDouble(c)
      j += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val m = ctx.freshName("m")
      val sum = ctx.freshName("sum")
      val j = ctx.freshName("j")
      val row = ctx.freshName("row")
      val c = ctx.freshName("c")
      s"""
        final int $m = $a.numElements();
        if ($b.numElements() != $m) {
          ${ev.isNull} = true;
        } else {
          double $sum = 0.0;
          for (int $j = 0; $j < $m && !${ev.isNull}; $j++) {
            final org.apache.spark.sql.catalyst.util.ArrayData $row =
              $a.getArray($j);
            final int $c = $b.getInt($j);
            if ($c < 0 || $c >= $row.numElements()) {
              ${ev.isNull} = true;
            } else {
              $sum += $row.getDouble($c);
            }
          }
          ${ev.value} = $sum;
        }
      """
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

object PqExpressions {
  def encode(vec: Column, cb: Column): Column =
    GraftSqlBridge.column(PqEncodeCodes(
      GraftSqlBridge.expression(vec), GraftSqlBridge.expression(cb)))

  def adcDistance(lut: Column, codes: Column): Column =
    GraftSqlBridge.column(PqAdcDistance(
      GraftSqlBridge.expression(lut), GraftSqlBridge.expression(codes)))
}
