package graft.pipeline

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** SQ8 scalar quantization: code range, reconstruction bound, and top-k
  * quality against an exact driver-side L2 scan. */
class Sq8Spec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = spark.read.parquet(s"$sfTiny/embeddings.parquet")

  test("codes are in [0,255] and reconstruction stays within half a step") {
    val (mn, mx) = Similarity.sq8Train(emb)
    val codes = Similarity.sq8Encode(emb, mn, mx)
      .as[(Long, Seq[Int])].collect().toMap
    val vecs = emb.select($"vec_id", $"embedding".cast("array<double>"))
      .as[(Long, Seq[Double])].collect().toMap
    vecs.foreach { case (id, v) =>
      val cs = codes(id)
      assert(cs.forall(c => c >= 0 && c <= 255))
      v.indices.foreach { i =>
        val step = (mx(i) - mn(i)) / 255.0
        if (step > 0) {
          val dec = mn(i) + (cs(i).toDouble * (mx(i) - mn(i))) / 255.0
          assert(math.abs(v(i) - dec) <= step / 2 + 1e-12,
            s"vec $id dim $i off by more than half a step")
        }
      }
    }
  }

  test("a constant dimension encodes 0 and decodes to its min") {
    val df = Seq((1L, Seq(0.5f, 1.0f)), (2L, Seq(0.5f, 2.0f)))
      .toDF("vec_id", "embedding")
    val (mn, mx) = Similarity.sq8Train(df)
    assert(mn(0) == 0.5 && mx(0) == 0.5)
    val codes = Similarity.sq8Encode(df, mn, mx)
      .as[(Long, Seq[Int])].collect().toMap
    assert(codes(1L)(0) == 0 && codes(2L)(0) == 0)
    assert(codes(1L)(1) == 0 && codes(2L)(1) == 255)
  }

  test("SQ8 top-5 recalls the exact L2 top-5 almost perfectly at 8-bit " +
    "resolution") {
    val (mn, mx) = Similarity.sq8Train(emb)
    val codes = Similarity.sq8Encode(emb, mn, mx)
    val qs = emb.filter($"vec_id" < 8)
    val ann = Similarity.sq8TopK(qs, codes, mn, mx, 5)
      .select($"qid", $"nid").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    val vecs = emb.select($"vec_id", $"embedding".cast("array<double>"))
      .as[(Long, Seq[Double])].collect()
    val exact = vecs.filter(_._1 < 8).map { case (qid, q) =>
      qid -> vecs.filter(_._1 != qid)
        .map { case (nid, v) =>
          (nid, q.zip(v).map { case (a, b) => (a - b) * (a - b) }.sum)
        }
        .sortBy { case (nid, d2) => (d2, nid) }.take(5).map(_._1).toSet
    }.toMap
    val recall = exact.map { case (qid, ex) =>
      ann(qid).intersect(ex).size.toDouble / ex.size
    }.sum / exact.size
    assert(recall >= 0.9, s"SQ8 recall@5 collapsed: $recall")
  }
}
