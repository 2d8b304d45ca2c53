package graft.functions

import graft.SparkSpec
import graft.pipeline.Dedup
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests: each fused native kernel must be extensionally equal to
  * the composable Spark-functions formulation it replaced, over adversarial
  * inputs — unicode (multi-byte, astral plane), whitespace runs, empty and
  * sub-n strings, duplicate-heavy token lists. A divergence here is a
  * silent oracle break, so these run on every build. (Raw scalacheck Gen
  * with fixed seeds: the scalatest bridge artifact isn't on the offline
  * classpath, and deterministic cases beat shrinking for Spark jobs.) */
class KernelPropertySpec extends SparkSpec {

  private val weirdChars =
    Gen.oneOf(Gen.alphaNumChar, Gen.oneOf(' ', '\t', '\n', 'é', 'ß', '中',
      '文', '☃'), Gen.asciiPrintableChar)
  private val textGen: Gen[String] = for {
    n <- Gen.chooseNum(0, 40)
    cs <- Gen.listOfN(n, weirdChars)
    astral <- Gen.oneOf("", "𝄞", "💾") // surrogate pairs
  } yield cs.mkString + astral

  private def cases[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).map(i => g.pureApply(Gen.Parameters.default, Seed(i.toLong)))

  test("CharNGrams == array_distinct(transform(...)) on adversarial strings") {
    import spark.implicits._
    cases(Gen.listOfN(30, textGen), 8).foreach { texts =>
      val df = texts.toDF("t")
      val fused = df.select(Dedup.ngrams($"t", 3)).collect()
        .map(_.getSeq[String](0).toSeq).toSeq
      val lambda = df.select(Dedup.ngramsViaTransform($"t", 3)).collect()
        .map(_.getSeq[String](0).toSeq).toSeq
      assert(fused === lambda, s"diverged on $texts")
    }
  }

  test("WordNGrams == HOF slice/join forms on adversarial token arrays") {
    import spark.implicits._
    import graft.pipeline.TextAnalysis
    // duplicate-heavy token lists exercise the distinct path; sub-n and
    // empty arrays the degenerate path; weird chars the join itself
    val tokGen = Gen.listOf(Gen.oneOf(Gen.oneOf("a", "b", "a b"), textGen))
    cases(Gen.listOfN(20, tokGen), 8).foreach { docs =>
      val df = docs.map(_.toArray).toDF("toks")
      for (n <- Seq(1, 2, 5)) {
        val fusedD = df.select(TextAnalysis.wordNGrams($"toks", n))
          .collect().map(_.getSeq[String](0).toSeq).toSeq
        val hofD = df.select(TextAnalysis.wordNGramsHof($"toks", n))
          .collect().map(_.getSeq[String](0).toSeq).toSeq
        assert(fusedD === hofD, s"distinct diverged at n=$n on $docs")
        val fusedA = df.select(TextAnalysis.wordNGramsAll($"toks", n))
          .collect().map(_.getSeq[String](0).toSeq).toSeq
        val hofA = df.select(TextAnalysis.wordNGramsAllHof($"toks", n))
          .collect().map(_.getSeq[String](0).toSeq).toSeq
        assert(fusedA === hofA, s"multiset diverged at n=$n on $docs")
      }
    }
  }

  test("MinHashSignature == lambda permutations on adversarial gram sets") {
    import spark.implicits._
    cases(Gen.listOfN(20, Gen.listOf(textGen)), 8).foreach { docs =>
      val df = docs.map(_.toArray).toDF("grams")
      val fused = df.select(MinHashSignature.minhashSig($"grams", 16))
        .collect().map(_.getSeq[Long](0).toSeq).toSeq
      val lambda = df.select(Dedup.minhashSignature($"grams", 16))
        .collect().map(r => Option(r.getSeq[Long](0)).map(_.toSeq).orNull)
        .toSeq
      // lambda array_min of an EMPTY gram set is null per permutation; the
      // kernel uses Long.MaxValue sentinels (no null signature entries) —
      // compare non-empty docs, assert the kernel's sentinel otherwise
      fused.lazyZip(lambda).lazyZip(docs).foreach { (f, l, d) =>
        if (d.nonEmpty) assert(f === l, s"diverged on $d")
        else assert(f.forall(_ == Long.MaxValue))
      }
    }
  }

  test("SimHash64 == explode/aggregate votes on adversarial token sets") {
    import spark.implicits._
    cases(Gen.listOfN(20, textGen.suchThat(_.trim.nonEmpty)), 8)
      .foreach { texts =>
        val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
          .toDF("doc_id", "text")
        val fused = Dedup.simhash(df).orderBy("id").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSeq
        val agg = Dedup.simhashViaAggregate(df).orderBy("id").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSeq
        assert(fused === agg, s"diverged on $texts")
      }
  }

  test("HyperplaneSignature == HOF plane formulation on random vectors") {
    import graft.pipeline.Similarity
    import spark.implicits._
    val vecGen = for {
      d <- Gen.chooseNum(1, 48)
      xs <- Gen.listOfN(d, Gen.chooseNum(-1e3, 1e3).map(_ / 7.0))
    } yield xs.toArray
    cases(Gen.listOfN(25, vecGen), 6).foreach { vecs =>
      val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("vec_id", "embedding")
      val fused = Similarity.hyperplaneBuckets(df, 24)
        .orderBy("id").collect().map(_.getLong(1)).toSeq
      val hof = Similarity.hyperplaneBucketsHof(df, 24)
        .orderBy("id").collect().map(_.getLong(1)).toSeq
      assert(fused === hof)
    }
  }

  test("prefix-filtered jaccardPairs == brute force on duplicate-heavy corpora") {
    import spark.implicits._
    val corpusGen = for {
      base <- Gen.listOfN(6, textGen.suchThat(_.length >= 5))
      // near-dups: copies with a small suffix tweak
      dups <- Gen.listOfN(6, Gen.zip(Gen.oneOf(base), Gen.alphaChar))
    } yield base ++ dups.map { case (b, c) => b + c }
    cases(corpusGen, 6).foreach { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val brute = Dedup.jaccardPairsBrute(df, 3, 0.6).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val indexed = Dedup.jaccardPairs(df, 3, 0.6).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(indexed === brute, s"diverged on $texts")
    }
  }

  test("CdcChunks: partition property + shift resistance on adversarial strings") {
    import spark.implicits._
    import graft.pipeline.Dedup
    // 1) chunks PARTITION the lowered text: lengths are positive and sum
    //    to its codepoint count, on unicode/astral/empty inputs
    cases(Gen.listOfN(40, textGen), 6).foreach { texts =>
      val rows = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val got = Dedup.cdcChunks(rows, 3, 4) // small k/divisor: many cuts
        .groupBy($"doc_id")
        .agg(org.apache.spark.sql.functions.sum($"cp_len").as("s"),
          org.apache.spark.sql.functions.min($"cp_len").as("mn"))
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      texts.zipWithIndex.foreach { case (t, i) =>
        val lower = t.toLowerCase(java.util.Locale.ROOT)
        val n = lower.codePointCount(0, lower.length).toLong
        if (n == 0) assert(!got.contains(i.toLong), s"empty doc $i chunked")
        else {
          val (s, mn) = got(i.toLong)
          assert(s == n, s"chunk lengths of doc $i sum to $s, text has $n cps")
          assert(mn >= 1, s"doc $i emitted an empty chunk")
        }
      }
    }
    // 2) SHIFT RESISTANCE — the reason CDC exists: editing a prefix leaves
    //    the suffix's chunking aligned. Two docs sharing a long suffix
    //    after different-length prefixes must share every chunk except the
    //    O(1) chunks overlapping the edit region.
    val suffix = ("the quick brown fox jumps over the lazy dog " * 20)
    val df = Seq((1L, "AAAA " + suffix), (2L, "BBBBBBBBBB " + suffix))
      .toDF("doc_id", "text")
    val byDoc = Dedup.cdcChunks(df, 8, 32).collect()
      .groupBy(_.getLong(0))
      .map { case (id, rs) => id -> rs.map(_.getLong(2)).toSeq }
    val shared = byDoc(1L).intersect(byDoc(2L))
    assert(shared.size >= byDoc(1L).size - 2,
      s"prefix edit broke suffix alignment: ${byDoc(1L).size} chunks, " +
        s"only ${shared.size} survived")
  }

  test("BloomMightContain == UDF probe on adversarial strings") {
    import spark.implicits._
    import org.apache.spark.sql.functions.udf
    cases(Gen.listOfN(60, textGen), 4).foreach { texts =>
      // sketch over half the strings; probe ALL of them (members must hit,
      // non-members may false-positive — but identically in both probes,
      // since both hash the same UTF-8 bytes against the same bit array)
      val members = texts.zipWithIndex.collect { case (t, i) if i % 2 == 0 => t }
      val bloom = members.toDF("g").stat
        .bloomFilter("g", math.max(members.size.toLong, 1L), 0.03)
      val bc = spark.sparkContext.broadcast(bloom)
      val probeUdf = udf((g: String) => g != null && bc.value.mightContain(g))
      val df = texts.toDF("g")
      val native = df.select(BloomMightContain.bloomMightContain($"g", bc))
        .collect().map(_.getBoolean(0)).toSeq
      val viaUdf = df.select(probeUdf($"g")).collect()
        .map(_.getBoolean(0)).toSeq
      assert(native === viaUdf, s"probe diverged on $texts")
      members.foreach(m => assert(bloom.mightContain(m), "false negative"))
      bc.destroy()
    }
  }
}
