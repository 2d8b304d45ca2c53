package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.pipeline.{Dedup, Similarity, TextAnalysis}
import graft.util.Tables

/** Scale rehearsal: replicate the sf0.1 tables k× in memory (ids offset per
  * replica, so dedup semantics stay honest) and measure the pipeline
  * operators on the enlarged corpus. The point is the growth CURVE, not the
  * absolute numbers: map-side ops should scale ~linearly, banded LSH ops
  * with output size, and nothing should fall off a quadratic cliff.
  * Usage: sbt "runMain graft.tools.ScaleRehearsal [k]"
  */
object ScaleRehearsal {
  def main(args: Array[String]): Unit = {
    val k = args.headOption.map(_.toInt).getOrElse(10)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.util.Sessions.local(32)

    /** k replicas with offset ids; text perturbed per replica (replica tag
      * appended) so exact-dup counts do not degenerate to k copies. */
    def replicateDocs(mult: Int): DataFrame = {
      val docs = Tables.documents(spark, sfDir)
      val n = 1000000L
      docs.crossJoin(spark.range(mult).toDF("rep"))
        .select((col("doc_id") + col("rep") * n).as("doc_id"),
          col("source"), col("lang"),
          concat(col("text"), lit(" rep"), col("rep")).as("text"))
        .repartition(32)
        .localCheckpoint(true)
    }
    def replicateEmb(mult: Int): DataFrame = {
      val emb = Tables.embeddings(spark, sfDir)
      val n = 1000000L
      emb.crossJoin(spark.range(mult).toDF("rep"))
        .select((col("vec_id") + col("rep") * n).as("vec_id"),
          col("embedding"))
        .repartition(32)
        .localCheckpoint(true)
    }

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val rows = f
      println(f"[rehearsal] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs rows=$rows")
    }

    val base = Tables.documents(spark, sfDir).count()
    println(s"[rehearsal] base docs=$base k=$k -> ${base * k} docs")
    val docs = replicateDocs(k)
    val emb = replicateEmb(math.min(k, 4))

    time(s"t01 token stats x$k") {
      docs.select(TextAnalysis.tokenCount(col("text")).as("n")).agg(sum("n"))
        .head(); docs.count()
    }
    time(s"t03 lang id x$k") {
      docs.withColumn("toks", TextAnalysis.tokens(col("text")))
        .withColumn("pred", TextAnalysis.langIdOf(col("toks")))
        .groupBy("pred").count().count()
    }
    time(s"t05 vocab x$k") {
      docs.select(explode(TextAnalysis.tokens(col("text"))).as("tok"))
        .groupBy("tok").count().count()
    }
    time(s"d01 exact dedup x$k") { Dedup.exactDedup(docs).count() }
    time(s"t04 fingerprints x$k") {
      docs.select(TextAnalysis.fingerprint(col("text")).as("fp"))
        .agg(countDistinct("fp")).head(); docs.count()
    }
    time(s"d05 simhash pairs (hamming<=1) x$k") {
      Dedup.simhashPairs(docs, 1).count()
    }
    time(s"d07 components over simhash pairs x$k") {
      Dedup.connectedComponents(Dedup.simhashPairs(docs, 1)).count()
    }
    val m = math.min(k, 4)
    time(s"d06 bucketed embedding near-dup x$m") {
      Dedup.embeddingNearDupPairsBucketed(emb, 0.4).count()
    }
    time(s"s01 brute top-k over x$m corpus") {
      Similarity.bruteForceTopK(
        emb.filter(col("vec_id") < 8), emb, 5).count()
    }
    spark.stop()
  }
}
