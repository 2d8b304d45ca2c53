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

  test("each rule fails in isolation — every other rule passes") {
    val shortDoc = "the cat and dog sat near mat run now fast" // 10 words
    val longWords = (Seq.fill(30)("the") ++
      Seq.fill(30)("pneumonoultramicroscopics")).mkString(" ") // mwl > 10
    // '###' tokens are length 3 (mean stays in [3,10]) and 83% of words
    // stay alphabetic; 36 '#' occurrences vs 72 words trips only r_sym
    val symbols = good + " " + Seq.fill(12)("###").mkString(" ")
    // 3-digit numbers keep the mean at exactly 3.0 (the rule boundary —
    // 3n <= suml holds with equality); 20/60 alphabetic trips only r_alpha
    val numeric = (Seq.fill(20)("the") ++ (100 until 140).map(_.toString))
      .mkString(" ")
    val noStops = Seq.fill(60)("spark").mkString(" ") + " the" // 1 stop hit
    val r = rules((1L, shortDoc), (2L, longWords), (3L, symbols),
      (4L, numeric), (5L, noStops))
    // exactly ONE rule fails per violator (isolation asserted for all)
    assert(r(1L) == ((false, true, true, true, true, false)),
      s"word-count violator: ${r(1L)}")
    assert(r(2L) == ((true, false, true, true, true, false)),
      s"mean-word-length violator: ${r(2L)}")
    assert(r(3L) == ((true, true, false, true, true, false)),
      s"symbol-ratio violator: ${r(3L)}")
    assert(r(4L) == ((true, true, true, false, true, false)),
      s"alpha-word violator: ${r(4L)}")
    assert(r(5L) == ((true, true, true, true, false, false)),
      s"stop-word violator: ${r(5L)}")
  }
}
