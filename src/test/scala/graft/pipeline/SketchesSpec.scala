package graft.pipeline

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Count-min sketch: over-count bound, mergeability (the point of the
  * structure), grid footprint, and totality on unseen keys. */
class SketchesSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = spark.read.parquet(s"$sfTiny/documents.parquet")

  test("estimates never under-count, and the grid footprint is bounded " +
    "by d x w regardless of corpus size") {
    val cms = Sketches.cmsBuild(docs).cache()
    assert(cms.count() <= Sketches.CmsDepth.toLong * Sketches.CmsWidth)
    val exact = Sketches.wordOccurrences(docs)
      .groupBy($"word").agg(count(lit(1)).as("exact_cnt"))
    val est = Sketches.cmsEstimate(cms, exact)
      .as[(String, Long, Long)].collect()
    assert(est.nonEmpty)
    est.foreach { case (w, ex, e) =>
      assert(e >= ex, s"CMS under-counted '$w': $e < $ex")
    }
    cms.unpersist()
  }

  test("sketches MERGE: per-half grids summed equal the whole-corpus grid") {
    val whole = Sketches.cmsBuild(docs)
      .as[(Int, Long, Long)].collect().toSet
    val even = Sketches.cmsBuild(docs.filter($"doc_id" % 2 === 0))
    val odd = Sketches.cmsBuild(docs.filter($"doc_id" % 2 =!= 0))
    val merged = even.union(odd)
      .groupBy($"j", $"bucket").agg(sum($"cnt").as("cnt"))
      .as[(Int, Long, Long)].collect().toSet
    assert(merged == whole)
  }

  test("fused bucket kernel == composable cmsBucket fold, bucket-for-" +
    "bucket, astral rows included (round-16 optimization pin)") {
    // every distinct corpus word plus planted edge cases: astral pairs
    // (codepoint walk must not split surrogates), mixed BMP/astral,
    // single char, long token
    val words = Sketches.wordOccurrences(docs).distinct()
      .union(Seq("😀𠀀", "a😀b", "√", "x" * 500, "𠀀")
        .toDF("word"))
    val both = words.select($"word",
      Sketches.cmsBuckets($"word").as("fused"),
      array((0 until Sketches.CmsDepth).map(j =>
        Sketches.cmsBucket($"word", j)): _*).as("composable"))
    assert(both.filter($"fused" =!= $"composable").isEmpty,
      "fused CMS kernel diverged from the spec fold")
    assert(both.count() > 0)
  }

  test("an unseen key estimates 0 on a sparse grid (COALESCE totality)") {
    val tiny = Seq((1L, "alpha beta gamma")).toDF("doc_id", "text")
    val cms = Sketches.cmsBuild(tiny)
    val est = Sketches.cmsEstimate(cms,
        Seq("zzzz-not-in-corpus").toDF("word"))
      .as[(String, Long)].head()
    assert(est._2 == 0L)
  }
}
