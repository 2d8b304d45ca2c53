package graft.pipeline

import graft.SparkSpec

/** Gopher quality-rule bundle (t19): each rule isolated on a crafted
  * violator while every other rule passes. */
class GopherRulesSpec extends SparkSpec {
  import spark.implicits._

  // a passing base doc: 60 words, mean length 3.3 (the original draft's
  // "of"/"to" fillers pulled the mean to 2.9 — under the rule floor),
  // no symbols, all alphabetic, plenty of stop words
  private val good =
    ("the cat sat near the mat and dogs run fast " * 6).trim

  private def rules(rows: (Long, String)*): Map[Long, (Boolean, Boolean,
      Boolean, Boolean, Boolean, Boolean)] =
    TextAnalysis.gopherRules(rows.toDF("doc_id", "text"), minWords = 50)
      .select($"doc_id", $"r_wc", $"r_mwl", $"r_sym", $"r_alpha",
        $"r_stop", $"r_pass_all")
      .as[(Long, Boolean, Boolean, Boolean, Boolean, Boolean, Boolean)]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6, r._7)))
      .toMap

  test("base doc passes every rule") {
    assert(rules((1L, good))(1L) == ((true, true, true, true, true, true)))
  }

  test("each rule fails in isolation") {
    val shortDoc = "the cat of and to sat mat dog run now" // 10 words
    val longWords = (Seq.fill(30)("the") ++
      Seq.fill(30)("pneumonoultramicroscopics")).mkString(" ") // mwl > 10
    val symbols = good + " " + Seq.fill(12)("#").mkString(" ") // 12 sym / 72 w
    val numeric = (Seq.fill(20)("the") ++ (1 to 40).map(_.toString))
      .mkString(" ") // 20/60 alphabetic < 80%
    val noStops = Seq.fill(60)("spark").mkString(" ") + " the" // 1 stop hit
    val r = rules((1L, shortDoc), (2L, longWords), (3L, symbols),
      (4L, numeric), (5L, noStops))
    assert(r(1L)._1 == false && r(1L)._6 == false, "word-count rule")
    assert(r(2L)._2 == false, "mean-word-length rule")
    assert(r(2L)._1, "long-word doc still clears word count")
    assert(r(3L)._3 == false, "symbol-ratio rule")
    assert(r(4L)._4 == false, "alpha-word rule")
    assert(r(5L)._5 == false, "stop-word rule")
    // every violator fails pass_all; no cross-contamination on rule 3-5's
    // other verdicts
    assert(Seq(2L, 3L, 4L, 5L).forall(id => r(id)._6 == false))
    assert(r(5L)._1 && r(5L)._2 && r(5L)._3 && r(5L)._4)
  }
}
