package graft.tools

import org.apache.spark.sql.functions._
import graft.pipeline.Similarity
import graft.util.Tables

/** Measure s10's incremental-PQ recall@5 (seed-trained codebook, appended
  * batch) against brute force — the measured grid behind the gate's 0.5
  * floor. Usage: runMain graft.tools.ProbeS10 [sfDir...] */
object ProbeS10 {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")
    val spark = graft.util.Sessions.local(8)
    import spark.implicits._
    // the one recall measurement both probes report: brute truth count +
    // left-semi hit count
    def recall(tag: String, d: String,
        ann: org.apache.spark.sql.DataFrame,
        brute: org.apache.spark.sql.DataFrame): Unit = {
      val nBrute = brute.count()
      val hits = brute.select($"qid", $"nid")
        .join(ann.select($"qid", $"nid"), Seq("qid", "nid"), "left_semi")
        .count()
      println(s"$tag $d recall@5 = ${hits.toDouble / nBrute} " +
        s"($hits/$nBrute)")
    }
    dirs.foreach { d =>
      val emb = Tables.embeddings(spark, d)
      val seed = emb.filter(pmod($"vec_id", lit(5)) =!= 4)
      val batch = emb.filter(pmod($"vec_id", lit(5)) === 4)
      val dir = java.nio.file.Files
        .createTempDirectory("graft_probe_s10").toString
      val cb = Similarity.pqTrain(seed, m = 16, ksub = 64, iters = 4)
      Similarity.writePqIndex(spark, cb, Similarity.pqEncode(seed, cb), dir)
      Similarity.appendPqIndex(spark, dir, batch)
      val (cb2, codes2) = Similarity.readPqIndex(spark, dir)
      recall("PROBE_S10", d,
        Similarity.pqTopK(emb.filter($"vec_id" < 8), codes2, emb, cb2,
          k = 5, rerankFactor = 8),
        Similarity.bruteForceTopK(emb.filter($"vec_id" < 8), emb, 5))

      // s11 delete-maintenance recall: full-corpus-trained codebook,
      // vec_id%7==3 slice deleted, probe the remaining corpus
      val dDir = java.nio.file.Files
        .createTempDirectory("graft_probe_s11").toString
      val cbFull = Similarity.pqTrain(emb, m = 16, ksub = 64, iters = 4)
      Similarity.writePqIndex(spark, cbFull,
        Similarity.pqEncode(emb, cbFull), dDir)
      Similarity.removeFromPqIndex(spark, dDir,
        emb.filter(pmod($"vec_id", lit(7)) === 3))
      val (cbD, codesD) = Similarity.readPqIndex(spark, dDir)
      val remaining = emb.filter(pmod($"vec_id", lit(7)) =!= 3)
      val qD = remaining.filter($"vec_id" < 8)
      recall("PROBE_S11", d,
        Similarity.pqTopK(qD, codesD, remaining, cbD, k = 5,
          rerankFactor = 8),
        Similarity.bruteForceTopK(qD, remaining, 5))
    }
    spark.stop()
  }
}
