package graft.tools

import org.apache.spark.sql.functions._

import graft.pipeline.Similarity
import graft.util.Tables

/** One-off floor probe for the s05 LSH kNN-join contract (dev tool). */
object ProbeS05 {
  def main(args: Array[String]): Unit = {
    val spark = graft.util.Sessions.local(16)
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val d = s"/root/testdata/$sf"
      val emb = Tables.embeddings(spark, d)
      for ((b, l) <- Seq((3, 8), (4, 8), (4, 12), (5, 10))) {
        val ann = Similarity.knnJoinLshMulti(emb, 3, b, l)
        val brute = Similarity.bruteForceTopK(emb, emb, 3)
        val hits = brute.select(col("qid"), col("nid"))
          .join(ann.select(col("qid"), col("nid")), Seq("qid", "nid"),
            "left_semi")
        val n = emb.count()
        val nCov = ann.select(col("qid")).distinct().count()
        val nHits = hits.count()
        val nBrute = brute.count()
        println(f"[probe] $sf b=$b L=$l n=$n covered=$nCov " +
          f"hits=$nHits brute=$nBrute recall=${nHits.toDouble / nBrute}%.3f " +
          f"coverage=${nCov.toDouble / n}%.3f")
      }
    }
    spark.stop()
  }
}
