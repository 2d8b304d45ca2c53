package graft.pipeline

import graft.SparkSpec
import graft.util.Tables
import org.apache.spark.sql.functions._

class PipelineSpec extends SparkSpec {

  test("minhash LSH finds exactly the brute-force jaccard pairs (sf0.001)") {
    import spark.implicits._
    val docs = Tables.documents(spark, sfTiny).filter($"doc_id" < 300)
    val brute = Dedup.jaccardPairs(docs, 3, 0.8)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minhashDedup(docs, 3, 128, 2, 0.8)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(brute.nonEmpty, "fixture should contain near-dup pairs")
    assert(lsh === brute)
  }

  test("inverted-index jaccard matches the all-pairs baseline exactly") {
    import spark.implicits._
    val docs = Tables.documents(spark, sfTiny).filter($"doc_id" < 300)
    val brute = Dedup.jaccardPairsBrute(docs, 3, 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val indexed = Dedup.jaccardPairs(docs, 3, 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(brute.nonEmpty)
    assert(indexed === brute)
  }

  test("bucketed embedding near-dup: exact-verified subset with high recall") {
    val emb = Tables.embeddings(spark, sfTiny)
    val threshold = 0.85
    val exact = Dedup.embeddingNearDupPairs(emb, threshold)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val bucketed = Dedup.embeddingNearDupPairsBucketed(emb, threshold)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(bucketed.subsetOf(exact), "verify step must make candidates exact")
    if (exact.nonEmpty) {
      val recall = (exact & bucketed).size.toDouble / exact.size
      assert(recall >= 0.7, s"LSH-banded recall too low: $recall over ${exact.size}")
    }
  }

  test("simhash separates near-dups from random pairs (lower hamming)") {
    import spark.implicits._
    val docs = Tables.documents(spark, sfTiny).filter($"doc_id" < 300)
    val near = Dedup.jaccardPairs(docs, 3, 0.95)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(near.nonEmpty)
    val sh = Dedup.simhash(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(sh(a) ^ sh(b))
    val nearMean = near.map { case (a, b) => ham(a, b) }.sum.toDouble / near.length
    val ids = sh.keys.toArray.sorted
    val randPairs = ids.take(60).flatMap(a => ids.takeRight(60).map(b => (a, b)))
      .filter { case (a, b) => a < b && !near.contains((a, b)) }
    val randMean = randPairs.map { case (a, b) => ham(a, b) }.sum.toDouble /
      randPairs.length
    assert(nearMean < randMean / 2,
      s"near-dup mean hamming $nearMean should be << random $randMean")
  }

  test("connected components: path graphs, separate clusters, singleton-free") {
    import spark.implicits._
    // two components: a diameter-4 path {1,2,3,4,5} and a pair {10,11};
    // the path exercises the multi-round star contraction
    val pairs = Seq((2L, 1L), (2L, 3L), (4L, 3L), (4L, 5L), (10L, 11L))
      .toDF("id_a", "id_b")
    val want = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      10L -> 10L, 11L -> 10L)
    // localLimit = 0 forces the distributed star-contraction path
    val distributed = Dedup.connectedComponents(pairs, localLimit = 0)
      .as[(Long, Long)].collect().toMap
    assert(distributed == want)
    // default guard takes the driver union-find path: must agree
    val local = Dedup.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    assert(local == want)
  }

  test("property: star-contraction CC == union-find on random graphs") {
    import spark.implicits._
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val edgeGen = for {
      n <- Gen.chooseNum(0, 40)
      es <- Gen.listOfN(n, Gen.zip(Gen.chooseNum(0L, 25L), Gen.chooseNum(0L, 25L)))
    } yield es
    (0 until 6).foreach { seed =>
      val edges = edgeGen.pureApply(Gen.Parameters.default, Seed(seed.toLong))
      val pairs = edges.toDF("id_a", "id_b")
      val got = Dedup.connectedComponents(pairs, localLimit = 0)
        .as[(Long, Long)].collect().toMap
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.filter { case (a, b) => a != b }.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      // ids seen only in self-loops are singleton clusters (contract:
      // every id in `pairs` gets a label); real-edge labels win on overlap
      val selfSingletons = edges.collect { case (x, y) if x == y => x -> x }
      val want = (selfSingletons ++
        parent.keys.map(k => k -> find(k))).toMap
      assert(got == want, s"seed=$seed edges=$edges")
    }
  }

  test("connected components agree with local union-find on jaccard pairs") {
    import spark.implicits._
    val docs = Tables.documents(spark, sfTiny).filter($"doc_id" < 300)
    val pairs = Dedup.jaccardPairs(docs, 3, 0.8)
      .select($"id_a", $"id_b").as[(Long, Long)].collect()
    val got = Dedup.connectedComponents(
      Dedup.jaccardPairs(docs, 3, 0.8), localLimit = 0)
      .as[(Long, Long)].collect().toMap
    // local union-find oracle
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val want = parent.keys.map(k => k -> find(k)).toMap
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("as-of join: latest at-or-before right row, ties and nulls exact") {
    import spark.implicits._
    val left = Seq((1L, 100L, 10L), (1L, 101L, 20L), (2L, 200L, 5L))
      .toDF("key", "lid", "lts")
    val right = Seq(
      (1L, 42L, 10L, Some("a")), // same ts as lid=100 -> <= wins
      (1L, 41L, 10L, Some("b")), // equal right ts: larger tieBreak (42) wins
      (1L, 43L, 15L, None),      // latest for lid=101; null field must NOT
                                 // let row 42's "a" shine through
      (2L, 50L, 9L, Some("c")))  // AFTER the key-2 left row (ts 5) -> no match
      .toDF("key", "rid", "rts", "extra")
    val got = AsOfJoin.asOf(left, right, Seq("key"), "lts", "rts",
        Seq("rid", "extra"), "rid")
      .select($"lid", $"asof_rid", $"asof_extra")
      .as[(Long, Option[Long], Option[String])]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(100L) == ((Some(42L), Some("a")))) // ts tie: max rid row
    assert(got(101L) == ((Some(43L), None))) // atomic row: null rides along
    assert(got(200L) == ((None, None)))      // nothing at-or-before
    // a null-timestamp right row must match nothing, not everything
    val nullTs = Seq((2L, 60L, Option.empty[Long], Some("x")))
      .toDF("key", "rid", "rts", "extra")
    val got2 = AsOfJoin.asOf(left.filter($"key" === 2L), nullTs,
        Seq("key"), "lts", "rts", Seq("rid", "extra"), "rid")
      .select($"lid", $"asof_rid").as[(Long, Option[Long])].collect().toMap
    assert(got2(200L).isEmpty)
  }

  test("property: as-of join equals brute-force latest-at-or-before") {
    import spark.implicits._
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val rowGen = Gen.zip(Gen.chooseNum(0L, 5L), Gen.chooseNum(0L, 20L))
    val gen = Gen.zip(Gen.listOfN(25, rowGen), Gen.listOfN(25, rowGen))
    (0 until 5).foreach { seed =>
      val (lRaw, rRaw) = gen.pureApply(Gen.Parameters.default, Seed(seed.toLong))
      val l = lRaw.zipWithIndex.map { case ((k, ts), i) => (k, i.toLong, ts) }
      val r = rRaw.zipWithIndex.map { case ((k, ts), i) => (k, 100L + i, ts) }
      val got = AsOfJoin.asOf(
          l.toDF("key", "lid", "lts"), r.toDF("key", "rid", "rts"),
          Seq("key"), "lts", "rts", Seq("rid"), "rid")
        .select($"lid", $"asof_rid").as[(Long, Option[Long])]
        .collect().toMap
      val want = l.map { case (k, lid, lts) =>
        val cands = r.filter { case (rk, _, rts) => rk == k && rts <= lts }
        // latest rts; among equal rts the max tiebreak (rid) wins
        lid -> cands.sortBy { case (_, rid, rts) => (rts, rid) }
          .lastOption.map(_._2)
      }.toMap
      assert(got == want, s"seed=$seed")
    }
  }

  /** The composable higher-order-function winnowing formulation the fused
    * kernel must reproduce — SHORT STRINGS ONLY: lambda bodies re-evaluate
    * the inner arrays per element (no CSE through lambdas), so this is
    * O(n³) per row; it lives here so the production jar carries only the
    * kernel. */
  private def winnowingViaTransform(text: org.apache.spark.sql.Column,
      k: Int = 8, w: Int = 4): org.apache.spark.sql.Column = {
    val P = 1000003L
    val B = 257L
    val t = lower(text)
    val n = length(t)
    val codes = transform(sequence(lit(1), n), i => ascii(t.substr(i, lit(1))))
    val hashes = when(n < k, array().cast("array<bigint>"))
      .otherwise(transform(sequence(lit(1), n - (k - 1)), i =>
        aggregate(slice(codes, i, lit(k)), lit(0L),
          (acc, c) => (acc * B + c) % P)))
    val m = size(hashes)
    when(m === 0, array().cast("array<bigint>"))
      .when(m <= w, array(array_min(hashes)))
      .otherwise(array_sort(array_distinct(
        transform(sequence(lit(1), m - (w - 1)),
          t0 => array_min(slice(hashes, t0, lit(w)))))))
  }

  test("winnowing kernel matches the composable formulation; containment") {
    import spark.implicits._
    // short strings only: the composable form is O(n³) by construction
    val texts = Seq("", "short", "abcdefgh", "the quick brown fox jumps",
      "aaaaaaaaaaaaaaaa", "MiXeD CaSe AbCdEfGh xyzw", "ünïcödé tëxt hërë!?")
    val df = texts.toDF("text")
    val a = df.select(TextAnalysis.winnowingFingerprints($"text").as("fp"))
      .as[Seq[Long]].collect()
    val b = df.select(winnowingViaTransform($"text").as("fp"))
      .as[Seq[Long]].collect()
    assert(a.toSeq == b.toSeq)
    // winnowing guarantee: a shared substring of length >= k+w-1 (11) chars
    // forces at least one shared fingerprint
    val shared = "copiedpassagehere"
    val docs = Seq(s"prefix one $shared tail", s"other text $shared!!")
      .toDF("text")
    val fps = docs.select(TextAnalysis.winnowingFingerprints($"text").as("fp"))
      .as[Seq[Long]].collect()
    assert(fps(0).toSet.intersect(fps(1).toSet).nonEmpty)
  }

  test("sequence packing: offsets are a pure function of id order") {
    import spark.implicits._
    // docs of 4,4,4 tokens, L=10: doc1 [0,4), doc2 [4,8), doc3 [8,12)
    // -> seq0 holds docs 1,2,3 (doc3 spans into seq1)
    val docs = Seq((1L, 4L), (2L, 4L), (3L, 4L)).toDF("doc_id", "n_tokens")
    val got = graft.pipeline.Packing.packStats(docs, 10)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(0L -> 3L, 1L -> 1L))
    // offsets independent of input partitioning
    val shuffled = Seq((3L, 4L), (1L, 4L), (2L, 4L))
      .toDF("doc_id", "n_tokens").repartition(7)
    val offs = graft.pipeline.Packing
      .tokenOffsets(shuffled, "doc_id", "n_tokens")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(offs.map(r => (r._1, r._3)).toSeq ==
      Seq((1L, 0L), (2L, 4L), (3L, 8L)))
    // duplicate ids are rejected, not silently given partition-dependent
    // offsets (the contract tokenOffsets documents)
    val dup = Seq((1L, 4L), (1L, 2L), (2L, 3L)).toDF("doc_id", "n_tokens")
    val err = intercept[Exception] {
      graft.pipeline.Packing.tokenOffsets(dup, "doc_id", "n_tokens").collect()
    }
    assert(err.getMessage.contains("duplicate"))
  }

  test("packTokenIds: concat-and-chop equals the driver-side reference, " +
    "boundary-spanning docs included, partitioning-independent") {
    import spark.implicits._
    // ids per doc sized so docs SPAN sequence boundaries at L=5:
    // doc1 [0,3), doc2 [3,10), doc3 [10,12) -> seqs [0,5) [5,10) [10,12)
    val docs = Seq(
      (1L, Seq(10L, 11L, 12L)),
      (2L, (20L until 27L).toSeq),
      (3L, Seq(30L, 31L))).toDF("doc_id", "ids")
    val exp = (Seq(10L, 11L, 12L) ++ (20L until 27L) ++ Seq(30L, 31L))
      .grouped(5).toSeq
    Seq(1, 7).foreach { parts =>
      val got = graft.pipeline.Packing
        .packTokenIds(docs.repartition(parts), 5)
        .as[(Long, Seq[Long])].collect().sortBy(_._1)
      assert(got.map(_._1).toSeq == exp.indices.map(_.toLong),
        s"seq ids at parts=$parts")
      assert(got.map(_._2).toSeq == exp, s"chop drift at parts=$parts")
    }
    // the final partial sequence is emitted, not dropped
    assert(exp.last.size == 2)
  }

  test("packTokenIdsWithBoundaries: spans tile every sequence exactly " +
    "and carry clipped doc intervals") {
    import spark.implicits._
    // same fixture as packTokenIds: doc1 [0,3), doc2 [3,10), doc3
    // [10,12) at L=5 -> seq0: (1,0,3)(2,3,2); seq1: (2,0,5);
    // seq2: (2,0,0)? no — doc2 ends at 10 exactly, so seq2: (3,0,2)
    val docs = Seq(
      (1L, Seq(10L, 11L, 12L)),
      (2L, (20L until 27L).toSeq),
      (3L, Seq(30L, 31L))).toDF("doc_id", "ids")
    Seq(1, 7).foreach { parts =>
      val got = graft.pipeline.Packing
        .packTokenIdsWithBoundaries(docs.repartition(parts), 5)
        .select($"seq_id", $"ids",
          expr("transform(segs, s -> struct(s.doc_id, s.start, s.len))"))
        .as[(Long, Seq[Long], Seq[(Long, Int, Int)])]
        .collect().sortBy(_._1)
      assert(got.map(g => (g._1, g._3)).toSeq == Seq(
        (0L, Seq((1L, 0, 3), (2L, 3, 2))),
        (1L, Seq((2L, 0, 5))),
        (2L, Seq((3L, 0, 2)))), s"span drift at parts=$parts")
      // ids identical to the span-free packer; spans tile the sequence
      val plain = graft.pipeline.Packing.packTokenIds(docs, 5)
        .as[(Long, Seq[Long])].collect().toMap
      got.foreach { case (sid, ids, segs) =>
        assert(ids == plain(sid))
        var pos = 0
        segs.foreach { case (_, st, ln) =>
          assert(st == pos, s"gap before span at $st in seq $sid")
          pos = st + ln
        }
        assert(pos == ids.size, s"spans must tile sequence $sid")
      }
    }
  }

  test("binPackDocs equals the sequential next-fit-decreasing reference, " +
    "never splits sub-capacity docs, and is partitioning-independent") {
    import spark.implicits._
    val C = 50
    // lengths exercise every plan branch: a doc over capacity (chops),
    // exact fits, a run spilling the open bin into fresh bins, tiny
    // tails landing in a leftover remainder
    val lens = Seq(1L -> 120L, 2L -> 50L, 3L -> 30L, 4L -> 30L, 5L -> 30L,
      6L -> 20L, 7L -> 20L, 8L -> 14L, 9L -> 7L, 10L -> 7L, 11L -> 3L)
    // sequential reference: chop > C, sort by (len desc, id, chunk),
    // one open bin, close it when the next piece does not fit
    val pieces = lens.flatMap { case (id, n) =>
      (0L to (n - 1) / C).map(c => (id, c, math.min(n - c * C, C)))
    }
    var bin = 0L; var rem = C.toLong
    val ref = pieces.sortBy { case (id, c, l) => (-l, id, c) }
      .map { case (id, c, l) =>
        if (l <= rem) { rem -= l; (id, c) -> bin }
        else { bin += 1; rem = C.toLong - l; (id, c) -> bin }
      }.toMap
    Seq(1, 7).foreach { parts =>
      val got = graft.pipeline.Packing
        .binPackDocs(lens.toDF("doc_id", "n_tokens").repartition(parts), C)
        .as[(Long, Long, Long, Long)].collect()
      assert(got.map(r => (r._1, r._2) -> r._4).toMap == ref,
        s"NFD drift at parts=$parts")
      // never split below capacity; fills bounded by capacity
      assert(got.filter(_._1 != 1L).forall(_._2 == 0L))
      got.groupBy(_._4).foreach { case (b, ps) =>
        assert(ps.map(_._3).sum <= C, s"bin $b overfilled")
      }
    }
    // out-of-range pieces are rejected loudly
    val err = intercept[IllegalArgumentException] {
      graft.pipeline.Packing.binPackPieces(
        Seq((1L, 0L, 99L)).toDF("id", "chunk", "len"), 50)
    }
    assert(err.getMessage.contains("chop"))
    // a negative chunk would ALIAS the previous id's top chunk in the
    // composite rank key (0*2^20+1048575 == 1*2^20-1) — rejected, not
    // silently fanned out
    val err2 = intercept[IllegalArgumentException] {
      graft.pipeline.Packing.binPackPieces(
        Seq((0L, 1048575L, 5L), (1L, -1L, 5L))
          .toDF("id", "chunk", "len"), 50)
    }
    assert(err2.getMessage.contains("composite"))
  }

  test("epochShuffle: a true permutation, identical bytes from " +
    "(data, seed) on any partitioning, seed-sensitive") {
    import spark.implicits._
    val ids = (0L until 500L).toSeq
    def run(seed: Long, parts: Int) = graft.pipeline.Packing
      .epochShuffle(spark.range(500).toDF("id").repartition(parts), seed)
      .as[(Long, Long)].collect().sortBy(_._1)
    val a = run(42L, 1)
    assert(a.map(_._1).toSeq == ids, "positions must be dense 0..n-1")
    assert(a.map(_._2).sorted.toSeq == ids, "must be a permutation")
    assert(a.map(_._2).toSeq != ids, "must actually shuffle")
    assert(run(42L, 7).toSeq == a.toSeq,
      "same seed must give identical order on any partitioning")
    assert(run(43L, 1).map(_._2).toSeq != a.map(_._2).toSeq,
      "a different seed must give a different order")
  }

  test("persisted contamination index: probe equals the full recompute " +
    "and the gram order is pinned in the index meta") {
    import spark.implicits._
    val docs = graft.util.Tables.documents(spark, sfTiny)
      .filter($"text".isNotNull)
    val bench = docs.filter($"doc_id" % 11 === 0)
    val train = docs.filter($"doc_id" % 11 =!= 0)
    Seq(4, 5).foreach { n =>
      val dir = java.nio.file.Files
        .createTempDirectory(s"contam_idx_$n").toString
      graft.pipeline.TextAnalysis.writeContamIndex(bench, dir, n = n)
      val viaIndex = graft.pipeline.TextAnalysis
        .contaminatedDocsAgainstIndex(train, dir)
        .as[Long].collect().toSet
      val recompute = graft.pipeline.TextAnalysis
        .contaminatedDocs(train, bench, n)
        .as[Long].collect().toSet
      // the probe never passes n — it comes from the index meta, so a
      // build at n=5 probes at 5 (a silent shingle-length mismatch is
      // structurally impossible)
      assert(viaIndex === recompute, s"index-probe drift at n=$n")
      assert(viaIndex.nonEmpty, s"vacuous fixture at n=$n")
    }
  }

  test("incremental minhash finds exactly the cross-split exact pairs") {
    import spark.implicits._
    val docs = graft.util.Tables.documents(spark, sfTiny)
    val inc = Dedup.minhashIncrementalWords(
        docs.filter($"doc_id" % 17 === 0), docs.filter($"doc_id" % 17 =!= 0))
      .select($"new_id", $"corpus_id").as[(Long, Long)].collect().toSet
    // the exact inverted-index path over the FULL table, restricted to
    // pairs straddling the split, re-oriented (new side first)
    val exact = Dedup.jaccardPairsWords(docs, 5, 0.8)
      .select($"id_a", $"id_b").as[(Long, Long)].collect()
      .flatMap { case (a, b) =>
        (a % 17 == 0, b % 17 == 0) match {
          case (true, false) => Some((a, b))
          case (false, true) => Some((b, a))
          case _ => None
        }
      }.toSet
    assert(inc === exact)
  }

  test("budget fill: top-ranked prefix that fits, partition-independent") {
    import spark.implicits._
    // rank order by (score desc, id): 3(0.9,n=5) 1(0.8,n=5) 4(0.8,n=5)
    // 2(0.1,n=5); budget 12 -> cum 5,10,15,20 -> kept {3,1}
    val docs = Seq((1L, 5L, 0.8), (2L, 5L, 0.1), (3L, 5L, 0.9),
      (4L, 5L, 0.8)).toDF("doc_id", "n_tok", "q").repartition(7)
    val got = graft.pipeline.Packing
      .budgetFill(docs, "doc_id", "n_tok", "q", 12L)
      .select("id", "cum", "kept").as[(Long, Long, Boolean)]
      .collect().sortBy(_._1)
    assert(got.toSeq === Seq((1L, 10L, true), (2L, 20L, false),
      (3L, 5L, true), (4L, 15L, false)))
    // the straddler rule: the prefix includes non-kept rows, so a later
    // smaller doc can NOT sneak in past a too-big higher-ranked one
    val docs2 = Seq((1L, 10L, 0.9), (2L, 100L, 0.5), (3L, 1L, 0.1))
      .toDF("doc_id", "n_tok", "q")
    val kept2 = graft.pipeline.Packing
      .budgetFill(docs2, "doc_id", "n_tok", "q", 20L)
      .filter($"kept").select("id").as[Long].collect().toSet
    assert(kept2 === Set(1L))
  }

  test("repetition stats: top-gram occurrence counts, short docs zeroed") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spam spam spam spam ham"),   // bigrams: "spam spam"x3, "spam ham" -> top 3/4
      (2L, "all words here are unique"), // every bigram once -> top 1/4
      (3L, "x"))                         // < 2 tokens -> zero grams
      .toDF("doc_id", "text")
    val got = TextAnalysis.repetitionStats(docs, 2)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((1L, 4L, 3L), (2L, 4L, 1L), (3L, 0L, 0L)))
    // the Gopher 20% flag is integer-exact: 3*10 > 4*2, 1*10 <= 4*2... (10 > 8)
    assert(got.map(r => r._3 * 10 > r._2 * 2).toSeq ==
      Seq(true, true, false)) // doc2: 10 > 8 flags too at 20%; doc3 never
  }

  test("decontamination: train docs sharing a benchmark n-gram are flagged") {
    import spark.implicits._
    val bench = Seq((100L, "the quick brown fox jumps over lazy dogs"))
      .toDF("doc_id", "text")
    val train = Seq(
      (1L, "prefix text the quick brown fox jumps over something"), // shares a 5-gram
      (2L, "completely unrelated training document with other words"),
      (3L, "too short"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.contaminatedDocs(train, bench, 5)
      .as[Long].collect().sorted
    assert(got.toSeq == Seq(1L))
  }

  test("bloom-prefiltered decontamination equals the exact semi-join (sf0.001)") {
    import spark.implicits._
    val docs = Tables.documents(spark, sfTiny)
    val train = docs.filter($"doc_id" % 7 =!= 0)
    val bench = docs.filter($"doc_id" % 7 === 0)
    val exact = TextAnalysis.contaminatedDocs(train, bench, 4)
      .as[Long].collect().toSet
    val bloom = TextAnalysis.contaminatedDocsBloom(train, bench, 4)
      .as[Long].collect().toSet
    assert(exact.nonEmpty, "fixture should contain contaminated docs")
    // Bloom has no false negatives and candidates are exact-verified, so
    // the sketch path must reproduce the exact result set bit-for-bit
    assert(bloom === exact)
  }

  test("semantic dedup: transitive min-id groups within cells, cross-cell kept") {
    import spark.implicits._
    // cell 0: a chain u1~u2~u3 (adjacent cosines above threshold, u1·u3
    // below) must contract to ONE survivor (min id) — the transitive
    // contract; u4 orthogonal, kept. cell 1: v5 IDENTICAL to u1 but in
    // another cell — kept (the SemDeDup cell-pruning approximation:
    // cross-cell near-dups are invisible by design).
    val e = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f), 0),
      (2L, Array(0.9f, 0.436f, 0.0f), 0), // cos(u1,u2)=0.9
      (3L, Array(0.62f, 0.785f, 0.0f), 0), // cos(u2,u3)≈0.9, cos(u1,u3)=0.62
      (4L, Array(0.0f, 0.0f, 1.0f), 0),
      (5L, Array(1.0f, 0.0f, 0.0f), 1)
    ).toDF("vec_id", "embedding", "label")
    val flags = graft.pipeline.Similarity.semanticDedupFlags(e, 0.85)
      .collect().map(r => r.getLong(1) -> r.getBoolean(2)).toMap
    assert(flags === Map(1L -> true, 2L -> false, 3L -> false,
      4L -> true, 5L -> true))
  }

  test("duplicate word-ngram stats: shared grams flagged, short docs zeroed") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"), // shares 5-grams w/ 2
      (2L, "the quick brown fox jumps far away"),
      (3L, "completely unrelated text with many distinct words here"),
      (4L, "too short")) // < 5 tokens -> 0 grams
      .toDF("doc_id", "text")
    val got = TextAnalysis.dupNGramStats(docs, 5)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    val byId = got.map(r => r._1 -> ((r._2, r._3))).toMap
    assert(byId(1L)._1 == 5 && byId(1L)._2 == 1) // "the quick brown fox jumps"
    assert(byId(2L)._1 == 3 && byId(2L)._2 == 1)
    assert(byId(3L) == ((4L, 0L)))
    assert(byId(4L) == ((0L, 0L)))
  }

  test("fused ngram kernel matches the transform/array_distinct formulation") {
    import spark.implicits._
    val docs = Tables.documents(spark, sfTiny).limit(200)
      .select($"doc_id", lower($"text").as("t"))
    val fused = docs.select($"doc_id", Dedup.ngrams($"t", 3).as("g"))
      .orderBy("doc_id").collect().map(_.getSeq[String](1).toSeq).toSeq
    val lambda = docs.select($"doc_id", Dedup.ngramsViaTransform($"t", 3).as("g"))
      .orderBy("doc_id").collect().map(_.getSeq[String](1).toSeq).toSeq
    assert(fused === lambda)
    // sub-n and empty edge cases
    val edge = Seq("", "a", "ab", "abc", "abcd").toDF("t")
    val f2 = edge.select(Dedup.ngrams($"t", 3).as("g"))
      .collect().map(_.getSeq[String](0).toSeq).toSeq
    val l2 = edge.select(Dedup.ngramsViaTransform($"t", 3).as("g"))
      .collect().map(_.getSeq[String](0).toSeq).toSeq
    assert(f2 === l2)
  }

  test("fused minhash kernel matches the lambda formulation") {
    import spark.implicits._
    val docs = Tables.documents(spark, sfTiny).filter($"doc_id" < 100)
      .select($"doc_id", Dedup.ngrams(lower($"text"), 3).as("grams"))
    val fused = docs.select($"doc_id",
        graft.functions.MinHashSignature.minhashSig($"grams", 32).as("sig"))
      .orderBy("doc_id").collect().map(_.getSeq[Long](1).toSeq).toSeq
    val lambda = docs.select($"doc_id",
        Dedup.minhashSignature($"grams", 32).as("sig"))
      .orderBy("doc_id").collect().map(_.getSeq[Long](1).toSeq).toSeq
    assert(fused === lambda)
  }

  test("fused simhash kernel matches the explode/aggregate formulation") {
    val docs = Tables.documents(spark, sfTiny)
    val fused = Dedup.simhash(docs).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val agg = Dedup.simhashViaAggregate(docs).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(fused === agg)
  }

  test("simhash is deterministic and defined for every doc") {
    val docs = Tables.documents(spark, sfTiny)
    val a = Dedup.simhash(docs).orderBy("id").collect().map(_.getLong(1)).toSeq
    val b = Dedup.simhash(docs).orderBy("id").collect().map(_.getLong(1)).toSeq
    assert(a === b)
    assert(a.length === docs.count())
  }

  test("IVF top-k over geometric cells achieves decent recall vs brute force") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, sfTiny)
    val cells = Similarity.hyperplaneBuckets(emb, 3)
      .withColumnRenamed("id", "vec_id").withColumnRenamed("bucket", "cell")
    val withCells = emb.join(cells, "vec_id")
    val q = withCells.filter($"vec_id" < 8)
    val brute = Similarity.bruteForceTopK(q, emb, 5)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.ivfTopK(q, withCells, 5, 3, cellCol = "cell")
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute & ivf).size.toDouble / brute.size
    assert(recall >= 0.4, s"IVF nprobe=3/8 geometric-cell recall too low: $recall")
  }

  test("k-means cells: deterministic partition; IVF recall beats threshold") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, sfTiny)
    val cells1 = Similarity.kmeansCells(emb, 8, iters = 3).orderBy("id")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
    val cells2 = Similarity.kmeansCells(emb, 8, iters = 3).orderBy("id")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
    assert(cells1 === cells2, "k-means must be deterministic")
    assert(cells1.map(_._1).distinct.length === cells1.length,
      "every vector lands in exactly one cell")
    assert(cells1.map(_._2).distinct.length > 1, "multiple cells in use")
    assert(cells1.map(_._2).forall(c => c >= 0 && c < 8))

    val q = emb.filter($"vec_id" < 8)
    val brute = Similarity.bruteForceTopK(q, emb, 5)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.ivfTopKKmeans(q, emb, 5, 3, nCells = 8, iters = 3)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute & ivf).size.toDouble / brute.size
    assert(recall >= 0.5, s"k-means IVF nprobe=3/8 recall too low: $recall")
  }

  test("PQ: deterministic codebook, valid codes, ADC+rerank recall") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, sfTiny)
    val dim = emb.select(size($"embedding")).head().getInt(0)
    val m = 8
    val cb1 = Similarity.pqTrain(emb, m, ksub = 16, iters = 3)
    val cb2 = Similarity.pqTrain(emb, m, ksub = 16, iters = 3)
    assert(cb1.map(_.map(_.toSeq).toSeq).toSeq ===
      cb2.map(_.map(_.toSeq).toSeq).toSeq, "PQ training must be deterministic")
    assert(cb1.length === m)
    cb1.foreach { sub =>
      assert(sub.nonEmpty && sub.length <= 16)
      sub.foreach(c => assert(c.length === dim / m))
    }
    val codes = Similarity.pqEncode(emb, cb1).collect()
      .map(r => (r.getLong(0), r.getSeq[Int](1)))
    assert(codes.length === emb.count())
    codes.foreach { case (_, cs) =>
      assert(cs.length === m)
      cs.foreach(c => assert(c >= 0 && c < 16))
    }
    val q = emb.filter($"vec_id" < 8)
    val brute = Similarity.bruteForceTopK(q, emb, 5)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ann = Similarity.pqTopK(q, Similarity.pqEncode(emb, cb1), emb, cb1,
        5, rerankFactor = 8)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute & ann).size.toDouble / brute.size
    assert(recall >= 0.5, s"PQ ADC+rerank recall too low: $recall")
  }

  test("IVFADC: recall within the cell bound; full-probe equals plain PQ") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, sfTiny)
    val q = emb.filter($"vec_id" < 8)
    val cb = Similarity.pqTrain(emb, 8, ksub = 16, iters = 3)
    val brute = Similarity.bruteForceTopK(q, emb, 5)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivfadc = Similarity.pqIvfTopK(q, emb, cb, 5, nprobe = 4, nCells = 8,
        iters = 3, rerankFactor = 8)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert((brute & ivfadc).size.toDouble / brute.size >= 0.4)
    // probing ALL cells removes the pruning: result must equal plain PQ
    // over the full code table (same codebook, same rerank budget)
    val full = Similarity.pqIvfTopK(q, emb, cb, 5, nprobe = 8, nCells = 8,
        iters = 3, rerankFactor = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val plain = Similarity.pqTopK(q, Similarity.pqEncode(emb, cb), emb, cb,
        5, rerankFactor = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(full === plain)
  }

  test("data-quality audit: exact violation counts on a crafted frame") {
    import spark.implicits._
    val df = Seq(
      (Some(1L), Some(5.0), "a"),   // clean
      (Some(1L), Some(500.0), "a"), // dup key + out of range
      (None, Some(5.0), "b"),       // null key (not-null + FK skip-null)
      (Some(9L), None, "c"),        // FK miss (9 not in dim) + null range
      (Some(2L), Some(-1.0), "d")   // below range
    ).toDF("k", "v", "tag")
    val dim = Seq(1L, 2L, 3L).toDF("id")
    val out = DataQuality.audit(df, Seq(
      DataQuality.NotNull("k"),
      DataQuality.InRange("v", 0.0, 100.0),
      DataQuality.Satisfies("tag_not_d", "tag <> 'd'"),
      DataQuality.Unique(Seq("k")),
      DataQuality.RefIntegrity("k", dim, "id", "dim")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out("not_null(k)") === 1)
    assert(out("in_range(v,0.0,100.0)") === 3) // 500, null, -1
    assert(out("satisfies(tag_not_d)") === 1)
    assert(out("unique(k)") === 1) // key 1 appears twice -> 1 excess row
    assert(out("ref_integrity(k->dim.id)") === 1) // the 9; null k skipped
  }

  test("PQ index: parquet round trip is lossless; probe matches in-memory") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, sfTiny)
    val cb = Similarity.pqTrain(emb, 8, ksub = 16, iters = 3)
    val codes = Similarity.pqEncode(emb, cb)
    val dir = java.nio.file.Files.createTempDirectory("graft-pq").toString
    Similarity.writePqIndex(spark, cb, codes, dir)
    val (cb2, codes2) = Similarity.readPqIndex(spark, dir)
    assert(cb2.map(_.map(_.toSeq).toSeq).toSeq ===
      cb.map(_.map(_.toSeq).toSeq).toSeq, "codebook round trip")
    val q = emb.filter($"vec_id" < 4)
    val a = Similarity.pqTopK(q, codes, emb, cb, 3, 8)
      .collect().map(_.toSeq).toSeq.sortBy(_.toString)
    val b = Similarity.pqTopK(q, codes2, emb, cb2, 3, 8)
      .collect().map(_.toSeq).toSeq.sortBy(_.toString)
    assert(a === b)
  }

  test("native PQ kernels match their HOF formulations bit-exactly") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, sfTiny)
    val cb = Similarity.pqTrain(emb, 8, ksub = 16, iters = 3)
    val native = Similarity.pqEncode(emb, cb).orderBy("id")
      .collect().map(r => (r.getLong(0), r.getSeq[Int](1))).toSeq
    val hof = Similarity.pqEncodeHof(emb, cb).orderBy("id")
      .collect().map(r => (r.getLong(0), r.getSeq[Int](1))).toSeq
    assert(native === hof)
    // ADC: every (query LUT × code row) distance equal under both forms
    val q = emb.filter($"vec_id" < 4)
    val frame = Similarity.pqEncode(emb, cb)
      .crossJoin(broadcast(Similarity.adcLuts(
        q.select($"vec_id".as("qid"),
          $"embedding".cast("array<double>").as("qvec")), cb)))
    val both = frame
      .select($"qid", $"id",
        graft.functions.PqExpressions.adcDistance($"lut", $"codes").as("n"),
        Similarity.adcDistHof.as("h"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      assert(r.getDouble(2) === r.getDouble(3),
        s"ADC mismatch for (${r.getLong(0)}, ${r.getLong(1)})")
    }
  }

  test("PQ encodes a codebook centroid to its own code exactly") {
    import spark.implicits._
    // a vector that IS the concatenation of one centroid per subspace has
    // zero quantization error in every subspace — the argmin must pick
    // exactly those codes (ties impossible at distance 0 unless centroids
    // duplicate, which deterministic Lloyd over distinct data avoids here)
    val emb = Tables.embeddings(spark, sfTiny)
    val m = 8
    val cb = Similarity.pqTrain(emb, m, ksub = 16, iters = 3)
    val picked = (0 until m).map(j => j % cb(j).length)
    val synth = picked.zipWithIndex.flatMap { case (c, j) => cb(j)(c) }
    val one = Seq((0L, synth)).toDF("vec_id", "embedding")
    val got = Similarity.pqEncode(one, cb).head().getSeq[Int](1)
    assert(got === picked)
  }

  test("knn join within cells: equals per-cell brute force, respects cells") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, sfTiny)
    val knn = Similarity.knnJoinWithinCells(emb, 3)
    val rows = knn.collect()
    // every (qid, nid) pair shares the quantizer cell
    val cellOf = emb.select($"vec_id", $"label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(rows.forall(r => cellOf(r.getLong(1)) == cellOf(r.getLong(3))))
    // per query: at most k rows, ranks contiguous from 1, cos non-increasing
    val byQ = rows.groupBy(_.getLong(1))
    assert(byQ.values.forall { rs =>
      val sorted = rs.sortBy(_.getLong(2))
      sorted.length <= 3 &&
        sorted.map(_.getLong(2)).toSeq == (1L to sorted.length).toSeq &&
        sorted.map(_.getDouble(4)).toSeq.sliding(2).forall {
          case Seq(a, b) => a >= b; case _ => true }
    })
    // equals brute force restricted to the query's cell, for a sample cell
    val cell0 = emb.filter($"label" === 0)
    val brute = Similarity.bruteForceTopK(cell0, cell0, 3)
      .select("qid", "rank", "nid").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val inCell0 = rows.filter(r => r.getInt(0) == 0)
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(inCell0 === brute)
  }

  test("multi-table LSH knn join: recall beats one table, ranks well-formed") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, sfTiny)
    val brute = Similarity.bruteForceTopK(emb, emb, 3)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def recall(df: org.apache.spark.sql.DataFrame): Double = {
      val s = df.select("qid", "nid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      (brute & s).size.toDouble / brute.size
    }
    val one = recall(Similarity.knnJoinLsh(emb, 3, 4))
    val multi = Similarity.knnJoinLshMulti(emb, 3, 4, 12)
    val multiRecall = recall(multi)
    assert(multiRecall > one,
      s"OR-amplification must beat one table: $multiRecall vs $one")
    assert(multiRecall >= 0.7, s"multi-table recall floor: $multiRecall")
    // well-formed: contiguous ranks from 1, at most k per query
    val byQ = multi.collect().groupBy(_.getLong(0))
    assert(byQ.values.forall { rs =>
      val ranks = rs.map(_.getLong(1)).sorted.toSeq
      ranks.length <= 3 && ranks == (1L to ranks.length).toSeq
    })
    // determinism: same buckets, same candidates, same answer
    val again = Similarity.knnJoinLshMulti(emb, 3, 4, 12)
      .orderBy("qid", "rank").collect().map(_.toSeq).toSeq
    assert(again === multi.orderBy("qid", "rank").collect().map(_.toSeq).toSeq)
  }

  test("hyperplane buckets are deterministic and group similar vectors") {
    val emb = Tables.embeddings(spark, sfTiny)
    val a = Similarity.hyperplaneBuckets(emb, 8).orderBy("id").collect()
    val b = Similarity.hyperplaneBuckets(emb, 8).orderBy("id").collect()
    assert(a.map(_.getLong(1)).toSeq === b.map(_.getLong(1)).toSeq)
  }

  test("language-ID returns a language or 'und' for every doc") {
    import spark.implicits._
    val preds = Tables.documents(spark, sfTiny)
      .select(TextAnalysis.langId($"text").as("pred"))
      .groupBy("pred").count().collect().map(_.getString(0)).toSet
    val allowed = TextAnalysis.LangStopwords.keySet + "und"
    assert(preds.subsetOf(allowed))
  }

  test("fingerprints collide exactly when normalized text collides") {
    import spark.implicits._
    val row = Tables.documents(spark, sfTiny)
      .select(TextAnalysis.fingerprint($"text").as("fp"),
        Dedup.normText($"text").as("norm"))
      .agg(countDistinct($"fp").as("nfp"), countDistinct($"norm").as("nn"))
      .head()
    assert(row.getLong(0) === row.getLong(1))
  }

  test("quality score stays within [0,1]") {
    import spark.implicits._
    val bad = Tables.documents(spark, sfTiny)
      .select(TextAnalysis.qualityScore($"text").as("q"))
      .filter($"q" < 0.0 || $"q" > 1.0 || $"q".isNull)
    assert(bad.isEmpty)
  }

  test("simhash kernel matches the cross-engine golden values") {
    import spark.implicits._
    // goldens computed by an independent reimplementation of the double
    // polynomial hash (the same one the DuckDB d05 oracle folds)
    val got = Seq(
      (1L, "hello world"),
      (2L, ""), // one empty token -> every vote -1 -> fingerprint 0
      (3L, "abc def ghi")).toDF("doc_id", "text")
    val fp = Dedup.simhash(got).orderBy("id").collect().map(_.getLong(1))
    assert(fp.toSeq === Seq(6960352840930083104L, 0L, 1338759684199946091L))
  }

  test("pii counts and redaction: golden spans on crafted text") {
    import spark.implicits._
    val docs = Seq(
      (1L, "reach me at jane.doe+spam@mail.example.org or 555-867-5309x"),
      (2L, "server 10.0.255.7 and backup 192.168.1.1 phone 123.456.7890"),
      (3L, "no pii here, just words and 42 numbers")).toDF("doc_id", "text")
    val r = docs.select($"doc_id",
      TextAnalysis.emailCount($"text").as("e"),
      TextAnalysis.phoneCount($"text").as("p"),
      TextAnalysis.ipv4Count($"text").as("i"),
      TextAnalysis.redactPii($"text").as("red"))
      .orderBy($"doc_id").collect()
    assert(r(0).getInt(1) === 1 && r(0).getInt(2) === 0 && r(0).getInt(3) === 0)
    // 555-867-5309x: trailing word char keeps \b from matching -> not a phone
    assert(r(0).getString(4) ===
      "reach me at [EMAIL] or 555-867-5309x")
    assert(r(1).getInt(2) === 1 && r(1).getInt(3) === 2)
    assert(r(1).getString(4) === "server [IP] and backup [IP] phone [PHONE]")
    assert(r(2).getInt(1) === 0 && r(2).getInt(2) === 0 && r(2).getInt(3) === 0)
    assert(r(2).getString(4) === "no pii here, just words and 42 numbers")
  }

  test("tf-idf top-k ranks corpus-rare tokens above ubiquitous ones") {
    import spark.implicits._
    val docs = Seq(
      (1L, "common common rare"),
      (2L, "common filler words"),
      (3L, "common other stuff")).toDF("doc_id", "text")
    val top = TextAnalysis.tfIdfTopK(docs, 2).orderBy("doc_id", "rnk")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    // 'common' appears in every doc -> idf = ln(1) = 0; 'rare' tops doc 1
    assert(top.head === ((1L, 1L, "rare")))
    assert(!top.exists { case (_, rnk, tok) => tok == "common" && rnk == 1L })
  }

  test("keep-list skew guard: 1000 exact copies collapse before banding") {
    import graft.pipeline.Dedup
    import spark.implicits._
    // a duplicate-heavy crawl: 1000 byte-identical copies + 3 distinct
    // docs; the exact layer must collapse the copies to ONE representative
    // before LSH, so the near-dup layer bands 4 docs, not 1003
    val copy = "the same page scraped a thousand times over and over again"
    val docs = ((0L until 1000L).map(i => (i, copy)) ++ Seq(
      (2000L, "an unrelated document about entirely different things"),
      (2001L, "another distinct page with its own words and content"),
      (2002L, copy + " tail"))).toDF("doc_id", "text")
    val r = Dedup.dedupKeepList(docs).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getBoolean(2)))
    assert(r.length === 1003)
    // every copy (and the near-dup tail variant) collapses to keeper 0
    assert(r.filter(_._1 < 1000).forall(_._2 == 0L))
    assert(r.count(_._3) === 3) // 0, 2000, 2001 survive
    assert(r.find(_._1 == 2002L).get._2 === 0L)
  }

  test("pipeline funnel: counts are monotone down the filter chain") {
    val rows = graft.queries.PipelineQueries
      .q16PipelineFunnel(spark, sfTiny).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val c = Seq("n_docs", "n_en", "n_quality", "n_clean", "n_keep",
        "n_final").map(r.getAs[Long])
      assert(c.zip(c.tail).forall { case (a, b) => a >= b },
        s"funnel not monotone: $c")
    }
  }

  test("dedup keep-list: exact copies collapse, near-dup chains merge") {
    import graft.pipeline.Dedup
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog and runs far away"
    val docs = Seq(
      (1L, base),
      (2L, base),                 // exact copy
      (3L, "  " + base + "  "),   // exact after trim-normalization
      (4L, base + " xx"),         // near-dup (word-5-shingle jaccard 0.9)
      (5L, "completely different content about spark catalyst engines"),
      (6L, ""),                   // empty texts: exact group, no grams --
      (7L, ""),                   // must merge via the exact layer only
      (8L, null.asInstanceOf[String]) // null text: excluded by contract
    ).toDF("doc_id", "text")
    val r = Dedup.dedupKeepList(docs).orderBy("doc_id").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getBoolean(2))).toSeq
    assert(r === Seq((1L, 1L, true), (2L, 1L, false), (3L, 1L, false),
      (4L, 1L, false), (5L, 5L, true), (6L, 6L, true), (7L, 6L, false)))
  }

  test("word-shingle jaccard pairs: golden pair set, sub-w docs excluded") {
    import graft.pipeline.Dedup
    import spark.implicits._
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq(
      (1L, base),               // 10 tokens -> 6 distinct 5-shingles
      (2L, base + " tail"),     // 7 shingles; J = 6/7 ~ 0.857 >= 0.8
      (3L, "totally different words one two three four five six seven"),
      (4L, "short doc"),        // < 5 tokens: no shingles, never paired
      (5L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val got = Dedup.jaccardPairsWords(docs, 5, 0.8).orderBy("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq === Seq((1L, 2L, 6.0 / 7.0)))
  }

  test("bigram-LM score: hand-computed MLE log probs, fold-order exact") {
    import spark.implicits._
    // uni: a:3 b:3 c:1; bigrams: (a,b):3 (b,a):1 (b,c):1
    val docs = Seq(
      (1L, "a b a b"), // lp = ln(3/3), ln(1/3), ln(3/3) -> avg = ln(1/3)/3
      (2L, "a b c"),   // lp = ln(3/3), ln(1/3)          -> avg = ln(1/3)/2
      (3L, null.asInstanceOf[String])) // dropped: no text
      .toDF("doc_id", "text")
    val got = TextAnalysis.bigramLmScore(docs).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    def r4(x: Double) = math.rint(x * 10000) / 10000
    assert(got.toSeq === Seq(
      (1L, 3L, r4(math.log(1.0 / 3) / 3)),
      (2L, 2L, r4(math.log(1.0 / 3) / 2))))
  }

  test("Kneser-Ney bigram score: hand-computed discount + continuation " +
    "backoff, fold-order exact") {
    import spark.implicits._
    // bigrams: (a,b):3 (b,a):1 (b,c):1; cw1: a=3 b=2; N1+(a·)=1 N1+(b·)=2;
    // N1+(·a)=N1+(·b)=N1+(·c)=1; N1+(··)=3
    val docs = Seq(
      (1L, "a b a b"),
      (2L, "a b c"),
      (3L, null.asInstanceOf[String])) // dropped: no text
      .toDF("doc_id", "text")
    // the engine's exact parenthesization, replayed on doubles
    def p(cb: Double, cw1: Double, n1w1: Double, nc: Double): Double =
      math.max(cb - 0.75, 0.0) / cw1 + ((0.75 * n1w1) / cw1) * (nc / 3.0)
    val pab = p(3, 3, 1, 1); val pba = p(1, 2, 2, 1); val pbc = p(1, 2, 2, 1)
    def r4(x: Double) = math.rint(x * 10000) / 10000
    val got = TextAnalysis.knBigramScore(docs).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq === Seq(
      (1L, 3L, r4((math.log(pab) + math.log(pba) + math.log(pab)) / 3)),
      (2L, 2L, r4((math.log(pab) + math.log(pbc)) / 2))))
    // the discounted mass really went somewhere: every probability is
    // strictly between the pure-MLE and zero, and P(b|a) dominates
    assert(pab > pba && pab < 1.0 && pba > 0.0)
  }

  test("Kneser-Ney trigram score: hand-computed recursive backoff " +
    "(trigram over continuation bigram over continuation unigram)") {
    import spark.implicits._
    // trigram types: abc:1 bca:2 cab:1 abd:1
    // ctx(a,b)=2/n1=2  ctx(b,c)=2/n1=1  ctx(c,a)=1/n1=1
    // cont(b,c)=1 cont(c,a)=1 cont(a,b)=1 cont(b,d)=1; ntot=4
    // mid(b): tot=2 n1=2; mid(c): 1,1; mid(a): 1,1
    // contU: a=1 b=1 c=1 d=1
    val docs = Seq(
      (1L, "a b c a b d"),
      (2L, "b c a")).toDF("doc_id", "text")
    def p2(contbg: Double, midtot: Double, midn1: Double,
        cont: Double): Double =
      math.max(contbg - 0.75, 0.0) / midtot +
        ((0.75 * midn1) / midtot) * (cont / 4.0)
    def p3(cb: Double, ctx: Double, n1ctx: Double, pp2: Double): Double =
      math.max(cb - 0.75, 0.0) / ctx + ((0.75 * n1ctx) / ctx) * pp2
    val pAbc = p3(1, 2, 2, p2(1, 2, 2, 1)) // trigram (a,b,c)
    val pBca = p3(2, 2, 1, p2(1, 1, 1, 1))
    val pCab = p3(1, 1, 1, p2(1, 1, 1, 1))
    val pAbd = p3(1, 2, 2, p2(1, 2, 2, 1))
    def r4(x: Double) = math.rint(x * 10000) / 10000
    val got = TextAnalysis.knTrigramScore(docs).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq === Seq(
      (1L, 4L, r4((math.log(pAbc) + math.log(pBca) + math.log(pCab) +
        math.log(pAbd)) / 4)),
      (2L, 1L, r4(math.log(pBca)))))
    // the seen-twice trigram (b,c,a) must dominate the once-seen ones
    assert(pBca > pAbc && pBca > pCab)
  }

  test("Kneser-Ney order-4 and order-5 scores: generalized backoff " +
    "chain matches a driver-side reference at every layer") {
    Seq(4, 5).foreach(knOrderAgainstReference)
  }

  private def knOrderAgainstReference(n: Int): Unit = {
    import spark.implicits._
    val corpus = Seq((1L, "a b c a b c d a b c"), (2L, "b c a b c d"),
      (3L, "c d a b c"))
    val docs = corpus.toDF("doc_id", "text")
    val D = 0.75
    // independent reference: the same continuation cascade and the same
    // fixed parenthesization, over plain Scala maps
    val toks = corpus.map { case (id, t) =>
      id -> t.toLowerCase.trim.split("\\s+").toVector }
    val grams = toks.flatMap { case (id, ts) =>
      ts.sliding(n).filter(_.size == n).zipWithIndex
        .map { case (g, i) => (id, i + 1, g.toVector) } }
    val tN = grams.groupBy(_._3).map { case (g, xs) => g -> xs.size.toLong }
    val contByK = scala.collection.mutable
      .Map[Int, Map[Vector[String], Long]](n -> tN)
    (n - 1).to(1, -1).foreach { k =>
      contByK(k) = contByK(k + 1).keys.toSeq.groupBy(_.takeRight(k))
        .map { case (key, ks) => key -> ks.size.toLong }
    }
    val ctx = tN.toSeq.groupBy(_._1.take(n - 1))
      .map { case (key, xs) => key -> (xs.map(_._2).sum, xs.size.toLong) }
    val mids = (2 to n - 1).map { k =>
      k -> contByK(k).toSeq.groupBy(_._1.take(k - 1))
        .map { case (key, xs) => key -> (xs.map(_._2).sum, xs.size.toLong) }
    }.toMap
    val ntot = contByK(2).size.toLong
    def p(g: Vector[String]): Double = {
      var acc = contByK(1)(Vector(g.last)).toDouble / ntot
      (2 to n - 1).foreach { k =>
        val ck = contByK(k)(g.takeRight(k)).toDouble
        val (tot, n1) = mids(k)(g.takeRight(k).take(k - 1))
        acc = math.max(ck - D, 0.0) / tot + ((D * n1) / tot) * acc
      }
      val (ct, n1c) = ctx(g.take(n - 1))
      math.max(tN(g).toDouble - D, 0.0) / ct + ((D * n1c) / ct) * acc
    }
    def r4(x: Double) = BigDecimal(x)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val want = grams.groupBy(_._1).map { case (id, xs) =>
      val lps = xs.sortBy(_._2).map(x => math.log(p(x._3)))
      (id, lps.size.toLong, r4(lps.foldLeft(0.0)(_ + _) / lps.size))
    }
    val got = TextAnalysis.knNGramScore(docs, n,
        nCol = s"n_${n}grams", avgCol = s"avg_kn${n}_logprob")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq.sortBy(_._1) === want.toSeq.sortBy(_._1),
      s"order-$n chain diverges from the reference")
  }

  test("PII scrub: counts and redaction with hand-known values, fixed " +
    "replacement order (email before phone before IP)") {
    import spark.implicits._
    val docs = Seq(
      (1L, "reach a.b@c.io or user7@example.com now"), // 2 emails
      (2L, "call 555-867-5309 from 10.0.36.1"), // 1 phone + 1 ip
      (3L, "clean text only"),
      (4L, "1.2.3.4.5 edge"), // leftmost-first: matches 1.2.3.4
      (5L, null.asInstanceOf[String]), // dropped
      // staged counting: the phone-shaped local part is swallowed by the
      // email redaction, so it must NOT also count as a phone
      (6L, "ping 555-867-5309@mail.com"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.piiScrub(docs).orderBy($"doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4)))
    def h(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    assert(got.toSeq === Seq(
      (1L, 2L, 0L, 0L, h("reach [EMAIL] or [EMAIL] now")),
      (2L, 0L, 1L, 1L, h("call [PHONE] from [IP]")),
      (3L, 0L, 0L, 0L, h("clean text only")),
      (4L, 0L, 0L, 1L, h("[IP].5 edge")),
      (6L, 1L, 0L, 0L, h("ping [EMAIL]"))))
    // ONE pattern set engine-wide: the scrub's redacted string equals
    // redactPii's output exactly (same patterns, same order, same tokens)
    val drift = docs.filter($"text".isNotNull)
      .select($"doc_id", md5(TextAnalysis.redactPii($"text")).as("m"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    got.foreach { case (id, _, _, _, m) =>
      assert(drift(id) == m, s"piiScrub diverges from redactPii on $id")
    }
  }

  test("chunk spans cover every token with exact overlap arithmetic") {
    import spark.implicits._
    val docs = Seq(
      (1L, (1 to 5).map(i => s"w$i").mkString(" ")),   // n <= size: 1 chunk
      (2L, (1 to 16).map(i => s"w$i").mkString(" ")),  // n == size: 1 chunk
      (3L, (1 to 28).map(i => s"w$i").mkString(" ")),  // n == size+stride
      (4L, (1 to 29).map(i => s"w$i").mkString(" ")))  // one extra token
      .toDF("doc_id", "text")
    val spans = TextAnalysis.chunkSpans(docs, 16, 12)
      .orderBy("doc_id", "chunk_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(spans.filter(_._1 == 1L).toSeq === Seq((1L, 0L, 0L, 5L)))
    assert(spans.filter(_._1 == 2L).toSeq === Seq((2L, 0L, 0L, 16L)))
    assert(spans.filter(_._1 == 3L).toSeq ===
      Seq((3L, 0L, 0L, 16L), (3L, 1L, 12L, 16L)))
    assert(spans.filter(_._1 == 4L).toSeq ===
      Seq((4L, 0L, 0L, 16L), (4L, 1L, 12L, 16L), (4L, 2L, 24L, 5L)))
    // coverage property: last chunk always ends exactly at n
    spans.groupBy(_._1).foreach { case (_, cs) =>
      val last = cs.maxBy(_._2)
      val n = cs.head._1 match {
        case 1L => 5L; case 2L => 16L; case 3L => 28L; case _ => 29L
      }
      assert(last._3 + last._4 === n)
    }
  }

  test("duplicated-span coverage unions overlapping gram intervals") {
    import spark.implicits._
    val shared = (1 to 10).map(i => s"s$i").mkString(" ") // 10-token span
    val docs = Seq(
      (1L, s"$shared alpha beta gamma delta epsilon zeta eta theta"),
      (2L, s"prefix words here also longer $shared"),
      (3L, "totally unrelated text with no duplicated spans at all x y z"))
      .toDF("doc_id", "text")
    val cov = Dedup.duplicatedSpanCoverage(docs, 8)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // the shared 10-token span yields three overlapping 8-gram intervals
    // per doc; the union must count 10 tokens once, not 24
    assert(cov.toSeq === Seq((1L, 18L, 10L), (2L, 15L, 10L)))
  }

  test("IVF index: parquet round trip is lossless; probe matches in-memory") {
    import org.apache.spark.sql.functions._
    val emb = graft.util.Tables.embeddings(spark, sfTiny)
    val (cent, assign) = Similarity.buildIvfIndex(emb, nCells = 4, iters = 2)
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf").toString
    Similarity.writeIvfIndex(cent, assign, dir)
    val (cent2, assign2) = Similarity.readIvfIndex(spark, dir)
    // doubles survive parquet bit-exactly -> identical tables
    assert(cent2.orderBy(col("cell")).collect().map(_.toSeq).toSeq ===
      cent.orderBy(col("cell")).collect().map(_.toSeq).toSeq)
    assert(assign2.count() === assign.count())
    assert(assign2.join(assign, Seq("id", "cell"), "left_anti").count() === 0)
    // probing the LOADED index equals probing the built frames
    val q = emb.filter(col("vec_id") < 4)
    val a = Similarity.ivfProbeIndex(q, emb, cent, assign, 3, 2)
      .orderBy(col("qid"), col("rank")).collect().map(_.toSeq).toSeq
    val b = Similarity.ivfProbeIndex(q, emb, cent2, assign2, 3, 2)
      .orderBy(col("qid"), col("rank")).collect().map(_.toSeq).toSeq
    assert(a === b)
    assert(a.nonEmpty)
  }

  test("global rank: dense 0..n-1, (n desc, id) order, partition-independent") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val rows = Seq((1L, 5L), (2L, 9L), (3L, 5L), (4L, 1L), (5L, 9L), (6L, 7L))
    def rank(parts: Int) = Packing.globalRankDesc(
        rows.toDF("doc_id", "n_tokens").repartition(parts),
        "doc_id", "n_tokens")
      .orderBy(col("rank")).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSeq
    // (9,2) (9,5) (7,6) (5,1) (5,3) (1,4)
    val expected = Seq((2L, 0L), (5L, 1L), (6L, 2L), (1L, 3L), (3L, 4L), (4L, 5L))
    assert(rank(1) === expected)
    assert(rank(7) === expected)
  }

  test("group rank: equals the per-group window rank, partition-independent") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    val rows = (1L to 97L).map(i => (if (i % 3 == 0) "en" else if (i % 3 == 1) "de" else "fr", i * 7 % 101))
    val df = rows.toDF("lang", "doc_id")
    val expected = df
      .withColumn("rk",
        row_number().over(Window.partitionBy($"lang").orderBy($"doc_id"))
          .cast("long"))
      .select($"lang", $"doc_id", $"rk")
      .orderBy($"lang", $"doc_id")
      .collect().map(_.toSeq).toSeq
    Seq(1, 5, 32).foreach { parts =>
      val got = Packing.groupRankAsc(df.repartition(parts), "lang", "doc_id")
        .orderBy(col("g"), col("id")).collect().map(_.toSeq).toSeq
      assert(got === expected, s"parts=$parts")
    }
  }
}
