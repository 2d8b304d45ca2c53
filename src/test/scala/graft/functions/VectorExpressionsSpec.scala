package graft.functions

import graft.SparkSpec
import graft.pipeline.Similarity
import graft.util.Tables
import org.apache.spark.sql.functions._

/** The native cosine expression must be bit-identical to the
  * higher-order-function fold it replaces (same index-order accumulation),
  * in both codegen and interpreted evaluation. */
class VectorExpressionsSpec extends SparkSpec {

  test("native cosine == fold cosine, bit for bit, on real embeddings") {
    val emb = Tables.embeddings(spark, sfTiny)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val pairs = emb.as("a").join(emb.as("b"),
        col("a.vec_id") + 1 === col("b.vec_id"))
      .select(col("a.v").as("va"), col("b.v").as("vb"))
    val both = pairs.select(
      Similarity.cosine(col("va"), col("vb")).as("native"),
      Similarity.cosineHof(col("va"), col("vb")).as("fold"))
    val rows = both.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, f) = (r.getDouble(0), r.getDouble(1))
      assert(java.lang.Double.doubleToLongBits(n) ==
        java.lang.Double.doubleToLongBits(f), s"native=$n fold=$f")
    }
  }

  test("native cosine handles length mismatch like zip_with/aggregate") {
    import spark.implicits._
    // zip_with pads the shorter side with nulls -> the fold aggregates to
    // null; the native expression must agree
    val df = Seq((Seq(1.0, 2.0, 3.0), Seq(2.0, 0.5))).toDF("a", "b")
    assert(df.select(Similarity.cosine($"a", $"b")).head().isNullAt(0))
    assert(df.select(Similarity.cosineHof($"a", $"b")).head().isNullAt(0))
    // null input -> null out (BinaryExpression null semantics)
    val withNull = Seq((Seq(1.0), Option.empty[Seq[Double]])).toDF("a", "b")
    assert(withNull.select(Similarity.cosine($"a", $"b")).head().isNullAt(0))
  }
}
