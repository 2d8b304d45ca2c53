package graft.pipeline

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Hashed-bigram NB quality classifier (q30): feature-hash bounds and
  * held-out separation of crafted quality tiers. */
class QualityClassifierSpec extends SparkSpec {
  import spark.implicits._

  // two synthetic tiers with tier-internal bigram reuse (rotations of a
  // tier vocabulary), so held-out docs hit features the train slice saw —
  // the spam-pattern assumption every n-gram quality filter rests on
  private val fluent = Seq("the", "cat", "sat", "on", "the", "mat", "and",
    "the", "dog", "ran", "to", "the", "park", "with", "a", "ball", "in",
    "the", "sun", "for", "fun")
  private val junk = (0 until 21).map(j => s"zzq$j")

  private def rot(v: Seq[String], k: Int): String =
    (v.drop(k % v.size) ++ v.take(k % v.size)).mkString(" ")

  private def corpus(n: Int) = {
    val pos = (0 until n).map(i => (i.toLong * 2 + 1, rot(fluent, i), 1))
    val neg = (0 until n).map(i => (100000L + i * 2 + 1, rot(junk, i), 0))
    // interleave ids so the doc_id%2 train split cuts BOTH tiers; the +1
    // keeps ids odd/even balanced via the explicit is_train expr below
    (pos ++ neg).toDF("doc_id", "text", "tier")
  }

  test("feature hash lands in [0, dims) and is split-artifact-free") {
    val h = Seq("the cat", "zzq1 zzq2", "a b").toDF("g")
      .select(QualityClassifier.featureHash($"g", 64).as("f"))
      .as[Long].collect()
    assert(h.forall(v => v >= 0 && v < 64))
    // same gram twice hashes identically (pure function of content)
    val two = Seq("the cat", "the cat").toDF("g")
      .select(QualityClassifier.featureHash($"g", 4096).as("f"))
      .as[Long].collect()
    assert(two(0) == two(1))
  }

  test("fused featureHash kernel == composable spec fold, astral rows " +
    "included (round-16 optimization pin)") {
    val grams = Seq("the cat", "zzq1 zzq2", "😀𠀀 a", "a😀b 𠀀", "√ x",
      "x" * 300).toDF("g")
    val both = grams.select(
      QualityClassifier.featureHash($"g", 4096).as("fused"),
      QualityClassifier.featureHashSpec($"g", 4096).as("spec"))
    assert(both.filter($"fused" =!= $"spec").isEmpty,
      "fused featureHash diverged from the spec fold")
  }

  test("held-out crafted tiers separate: accuracy >= 0.9, scores ordered") {
    val docs = corpus(40)
    val scored = QualityClassifier.nbTrainScore(docs,
        label = $"tier", isTrain = pmod($"doc_id", lit(4)) < 2)
      .filter(!$"is_train")
    val rows = scored.select($"label", $"score", $"pred")
      .as[(Int, Long, Int)].collect()
    assert(rows.nonEmpty)
    val acc = rows.count(r => r._1 == r._3).toDouble / rows.size
    assert(acc >= 0.9, s"held-out accuracy $acc")
    val posMean = rows.filter(_._1 == 1).map(_._2.toDouble).sum /
      rows.count(_._1 == 1)
    val negMean = rows.filter(_._1 == 0).map(_._2.toDouble).sum /
      rows.count(_._1 == 0)
    assert(posMean > 0 && negMean < 0,
      s"tier score means do not straddle the decision boundary: " +
        s"pos=$posMean neg=$negMean")
  }

  test("docs shorter than two tokens score bias-only and survive") {
    val docs = Seq((1L, "single", 1), (2L, "the cat sat", 1),
      (3L, "zzq1 zzq2 zzq3", 0), (4L, "w", 0)).toDF("doc_id", "text", "tier")
    val out = QualityClassifier.nbTrainScore(docs, $"tier", lit(true))
    assert(out.count() == 4, "a gram-less doc fell out of the scoring")
    // balanced priors => bias 0 => gram-less docs sit exactly on 0
    val biasOnly = out.filter($"doc_id".isin(1L, 4L))
      .select($"score").as[Long].collect()
    assert(biasOnly.forall(_ == 0L))
  }
}
