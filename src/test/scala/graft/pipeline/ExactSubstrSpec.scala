package graft.pipeline

import graft.SparkSpec

/** Exact-substring dedup (d16): character-precise maximal removal spans,
  * within-document duplication, interval fusion, and the contrast with
  * d09's cross-document token-gram coverage statistic. */
class ExactSubstrSpec extends SparkSpec {
  import spark.implicits._

  /** Collision-proof filler: every 40-char window embeds the tag and a
    * running index, so no two pad windows anywhere in the corpus match. */
  private def pad(tag: String, n: Int): String =
    (0 until n).map(j => f"$tag${j}%04d").mkString(" ")

  // boundary chars around every planted copy are UNIQUE per copy, so the
  // maximal duplicated span is exactly the planted passage — without them
  // common context (e.g. the space both copies follow) provably extends
  // the true maximal span, as the suffix semantics require
  private val shared = "the quick brown fox jumps over the lazy dog " +
    "and keeps on running through the night"
  private val phrase = "repeated internal boilerplate block number one"

  test("planted cross-doc duplicate yields one maximal span per doc, " +
    "character-exact") {
    assert(shared.length >= 41)
    val t1 = pad("aq", 12) + " 1" + shared + "2 " + pad("az", 12)
    val t2 = pad("bq", 12) + " 3" + shared + "4 " + pad("bz", 12)
    val docs = Seq((1L, t1), (2L, t2)).toDF("doc_id", "text")
    val spans = Dedup.exactSubstrSpans(docs, minLen = 40)
      .as[(Long, Long, Long)].collect().sortBy(r => (r._1, r._2))
    assert(spans.length == 2, s"expected one span per doc, got ${spans.toSeq}")
    Seq((1L, t1), (2L, t2)).zip(spans).foreach { case ((id, t), (sid, s, e)) =>
      assert(sid == id)
      val start = t.indexOf(shared) + 1 // spans are 1-based inclusive
      assert(s == start && e == start + shared.length - 1,
        s"doc $id span [$s,$e] != planted " +
          s"[$start,${start + shared.length - 1}]")
    }
  }

  test("within-doc repetition is flagged (the signal d09 cannot see)") {
    assert(phrase.length >= 46)
    val t3 = pad("cq", 10) + " 1" + phrase + "2 " + pad("cm", 10) + " 3" +
      phrase + "4 " + pad("cz", 10)
    val others = Seq((1L, pad("dq", 40)), (2L, pad("eq", 40)))
    val docs = (others :+ (3L, t3)).toDF("doc_id", "text")
    val spans = Dedup.exactSubstrSpans(docs, minLen = 40)
      .as[(Long, Long, Long)].collect().sortBy(_._2)
    assert(spans.forall(_._1 == 3L), s"only doc 3 holds duplicates: ${spans.toSeq}")
    assert(spans.length == 2, s"both copies must be flagged: ${spans.toSeq}")
    val first = t3.indexOf(phrase) + 1
    val second = t3.indexOf(phrase, t3.indexOf(phrase) + 1) + 1
    assert(spans(0) == ((3L, first.toLong, (first + phrase.length - 1).toLong)))
    assert(spans(1) == ((3L, second.toLong, (second + phrase.length - 1).toLong)))
    // d09's coverage statistic requires >= 2 DISTINCT documents per gram:
    // the same corpus shows zero duplicated-span signal there
    val d09 = Dedup.duplicatedSpanCoverage(docs, gramLen = 5)
      .filter($"covered_tokens" > 0)
    assert(d09.count() == 0,
      "d09 saw within-doc repetition it is by construction blind to")
  }

  test("unique corpus emits no spans; cross-doc dup is also visible to d09") {
    val unique = Seq((1L, pad("fq", 30)), (2L, pad("gq", 30)))
      .toDF("doc_id", "text")
    assert(Dedup.exactSubstrSpans(unique, minLen = 40).count() == 0)
    // and where the duplicate IS cross-document, d16 and d09 agree a
    // signal exists (same planted passage, token-level for d09)
    val t1 = pad("hq", 12) + " 1" + shared + "2 " + pad("hz", 12)
    val t2 = pad("iq", 12) + " 3" + shared + "4 " + pad("iz", 12)
    val both = Seq((1L, t1), (2L, t2)).toDF("doc_id", "text")
    assert(Dedup.exactSubstrSpans(both, minLen = 40).count() == 2)
    assert(Dedup.duplicatedSpanCoverage(both, gramLen = 5)
      .filter($"covered_tokens" > 0).count() == 2)
  }

  test("span removal splices exactly; the cleaned corpus re-scans to " +
    "zero spans") {
    import org.apache.spark.sql.functions.col
    // doc 3 holds TWO planted copies (two disjoint spans — exercises the
    // multi-span fold); docs 1/2 share one passage; doc 4 is untouched
    val t1 = pad("aq", 12) + " 1" + shared + "2 " + pad("az", 12)
    val t2 = pad("bq", 12) + " 3" + shared + "4 " + pad("bz", 12)
    val t3 = pad("cq", 10) + " 1" + phrase + "2 " + pad("cm", 10) + " 3" +
      phrase + "4 " + pad("cz", 10)
    val t4 = pad("dq", 40)
    val docs = Seq((1L, t1), (2L, t2), (3L, t3), (4L, t4))
      .toDF("doc_id", "text")
    val spans = Dedup.exactSubstrSpans(docs, minLen = 40)
    val cleaned = Dedup.removeSpans(docs, spans)
      .as[(Long, String, String)].collect().sortBy(_._1).toSeq
    assert(cleaned.map(_._1) == Seq(1L, 2L, 3L, 4L))
    // manual splice oracle: cut [s,e] out of the normalized text
    val spanMap = spans.as[(Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    cleaned.foreach { case (id, t, clean) =>
      val expected = spanMap.get(id) match {
        case None => t
        case Some(sp) =>
          val keep = new StringBuilder
          var pos = 1L
          sp.foreach { case (_, s, e) =>
            keep ++= t.substring(pos.toInt - 1, s.toInt - 1); pos = e + 1
          }
          keep ++= t.substring(pos.toInt - 1)
          keep.toString
      }
      assert(clean == expected, s"doc $id splice mismatch")
    }
    assert(cleaned.count { case (id, t, c) => c != t } == 3,
      "exactly docs 1,2,3 must shrink")
    // the fixed point (modulo splice junctions, which the unique pad
    // boundaries here rule out): nothing left to remove
    val again = Dedup.exactSubstrSpans(
      cleaned.toDF("doc_id", "t", "text").select(col("doc_id"), col("text")),
      minLen = 40)
    assert(again.count() == 0,
      "re-running d16 on the cleaned corpus still finds spans")
  }
}
