package graft.pipeline

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** CCNet perplexity tiers: the exact NTILE form and its map-side
  * broadcast-cutoff production twin. */
class PerplexityBucketsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = spark.read
    .parquet(s"$sfTiny/documents.parquet")

  test("tiers are balanced per language and ordered by score") {
    val b = TextAnalysis.perplexityBuckets(docs, 3).cache()
    val sizes = b.groupBy($"lang", $"bucket").count()
      .as[(String, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._3))
    sizes.foreach { case (lang, ns) =>
      assert(ns.max - ns.min <= 1, s"$lang tiers unbalanced: ${ns.toSeq}")
    }
    // every head-tier score >= every tail-tier score within a language
    val byLang = b.select($"lang", $"bucket", $"avg_kn_logprob")
      .as[(String, Long, Double)].collect().groupBy(_._1)
    byLang.foreach { case (lang, rows) =>
      val head = rows.filter(_._2 == 1L).map(_._3)
      val tail = rows.filter(_._2 == 3L).map(_._3)
      // a language with <3 scored docs legitimately has no tier 3 —
      // assert cleanly instead of crashing on empty.max
      assert(head.nonEmpty, s"$lang: no head tier")
      if (tail.nonEmpty)
        assert(head.min >= tail.max, s"$lang: head below tail")
    }
    b.unpersist()
  }

  test("map-side cutoff assignment reproduces the exact NTILE form " +
    "row-for-row on the corpus") {
    val exact = TextAnalysis.perplexityBuckets(docs, 3).cache()
    // exact boundaries: the LAST tuple of buckets 1..2 per language in
    // (score DESC, id ASC) order — i.e. the order-maximal tuple
    val cutoffs = exact.filter($"bucket" < 3)
      .select($"lang", $"bucket", $"avg_kn_logprob", $"doc_id")
      .as[(String, Long, Double, Long)].collect()
      .groupBy(x => (x._1, x._2)).map { case ((lang, b), rows) =>
        (lang, b, rows.maxBy(r => (-r._3, r._4)) match {
          case (_, _, s, i) => (s, i)
        })
      }
      .groupBy(_._1).view
      .mapValues(_.toSeq.sortBy(_._2).map(_._3)).toMap
    val assigned = TextAnalysis.assignPerplexityBuckets(
      exact.drop("bucket"), cutoffs)
    val l = exact.select($"doc_id", $"bucket").as[(Long, Long)]
      .collect().toMap
    val r = assigned.select($"doc_id", $"bucket").as[(Long, Long)]
      .collect().toMap
    assert(l == r, "cutoff assignment diverged from NTILE")
    exact.unpersist()
  }

  test("boundary ties: the tuple compare keeps assignment exact when " +
    "scores collide across a tier boundary") {
    // four docs, one language, identical scores — NTILE(2) puts ids
    // (1,2) in tier 1 and (3,4) in tier 2 purely by the id tiebreak;
    // a score-only cutoff could not express that split
    val scored = Seq(
      (1L, -2.5, "en"), (2L, -2.5, "en"), (3L, -2.5, "en"), (4L, -2.5, "en"))
      .toDF("doc_id", "avg_kn_logprob", "lang")
    val cutoffs = Map("en" -> Seq((-2.5, 2L)))
    val out = TextAnalysis.assignPerplexityBuckets(scored, cutoffs)
      .select($"doc_id", $"bucket").as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 2L))
  }
}
