package graft.tools

import org.apache.spark.sql.functions._

import graft.pipeline.Similarity
import graft.util.Tables

/** Measure PQ/ADC recall vs the brute top-k across rerank factors and
  * codebook shapes — picks the s08 gate's floor from data, not hope.
  * Usage: SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.ProbePq"
  */
object ProbePq {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = graft.util.Sessions.local(32)
    import spark.implicits._
    val emb = Tables.embeddings(spark, sfDir)
    val queries = emb.filter($"vec_id" < 8)
    val brute = Similarity.bruteForceTopK(queries, emb, 5)
      .select($"qid", $"nid").cache()
    val nBrute = brute.count()
    for (m <- Seq(8, 16); ksub <- Seq(16, 64)) {
      val cb = Similarity.pqTrain(emb, m, ksub, iters = 4)
      val codes = Similarity.pqEncode(emb, cb).cache()
      codes.count()
      for (rf <- Seq(4, 8, 16)) {
        val ann = Similarity.pqTopK(queries, codes, emb, cb, 5, rf)
        val hits = brute.join(ann.select($"qid", $"nid"),
          Seq("qid", "nid"), "left_semi").count()
        println(f"[pq] m=$m ksub=$ksub rf=$rf recall=${hits.toDouble / nBrute}%.3f")
      }
      codes.unpersist()
    }
    // IVFADC composition: cell pruning in front of the ADC scan
    val cb = Similarity.pqTrain(emb, 16, 64, iters = 4)
    for (nprobe <- Seq(3, 4, 6); rf <- Seq(8, 16)) {
      val ann = Similarity.pqIvfTopK(queries, emb, cb, 5, nprobe,
        nCells = 8, iters = 4, rerankFactor = rf)
      val hits = brute.join(ann.select($"qid", $"nid"),
        Seq("qid", "nid"), "left_semi").count()
      println(f"[pq] ivfadc nprobe=$nprobe/8 rf=$rf recall=${hits.toDouble / nBrute}%.3f")
    }
    spark.stop()
  }
}
