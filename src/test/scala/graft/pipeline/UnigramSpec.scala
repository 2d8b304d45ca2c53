package graft.pipeline

import graft.SparkSpec

/** t21/t22 — unigram-LM (SentencePiece-family) tokenizer: the
  * distributed hard-EM train and the dictionary-join encode must equal
  * an INDEPENDENT driver-side reference that enumerates every
  * segmentation exhaustively (no DP, no Spark) and replays the EM loop
  * over plain Scala collections. Plus the tie-break, coverage, pruning
  * and beyond-BMP edge cases the DP must honor. */
class UnigramSpec extends SparkSpec {
  import spark.implicits._

  // ---- independent reference implementation (exhaustive, driver-side) --

  private def refTokens(text: String): Seq[String] =
    text.trim.toLowerCase.split("\\s+").toSeq.filter(_.nonEmpty)

  private def refWordCounts(texts: Seq[String]): Map[String, Long] =
    texts.flatMap(refTokens).groupBy(identity)
      .map { case (w, g) => (w, g.size.toLong) }

  private def cps(w: String): Vector[String] = {
    val b = Vector.newBuilder[String]
    var i = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      b += new String(Character.toChars(cp))
      i += Character.charCount(cp)
    }
    b.result()
  }

  private def utf8Lt(a: String, b: String): Boolean =
    org.apache.spark.unsafe.types.UTF8String.fromString(a)
      .compareTo(org.apache.spark.unsafe.types.UTF8String.fromString(b)) < 0

  private def refSeed(words: Map[String, Long], maxLen: Int,
      seedSize: Int): Map[String, Long] = {
    val counts = scala.collection.mutable.HashMap.empty[String, Long]
    words.foreach { case (w, c) =>
      val ch = cps(w)
      for (i <- ch.indices; l <- 1 to math.min(maxLen, ch.length - i)) {
        val p = ch.slice(i, i + l).mkString
        counts.update(p, counts.getOrElse(p, 0L) + c)
      }
    }
    val (singles, multis) = counts.toSeq.partition(p => cps(p._1).size == 1)
    val top = multis.sortWith { case ((p1, c1), (p2, c2)) =>
      if (c1 != c2) c1 > c2 else utf8Lt(p1, p2)
    }.take(seedSize)
    (singles ++ top).toMap
  }

  private def refScores(counts: Map[String, Long]): Map[String, Long] = {
    val t = counts.valuesIterator.map(c => math.max(c, 1L)).sum
    counts.map { case (p, c) =>
      p -> math.floor(
        1e6 * (math.log(math.max(c, 1L).toDouble) - math.log(t.toDouble)))
        .toLong
    }
  }

  /** Every segmentation of `w` into vocab pieces (≤ maxLen chars),
    * exhaustively. */
  private def allSegs(w: Vector[String], sc: Map[String, Long],
      maxLen: Int): Seq[List[String]] =
    if (w.isEmpty) Seq(Nil)
    else (1 to math.min(maxLen, w.length)).flatMap { l =>
      val p = w.take(l).mkString
      if (sc.contains(p)) allSegs(w.drop(l), sc, maxLen).map(p :: _)
      else Nil
    }

  /** The engine's documented tie-break, stated globally: maximal total
    * score, then the lexicographically greatest piece-length sequence
    * read from the END (the longer LAST piece wins, then recursively on
    * the prefix). */
  private def refSegment(w: String, sc: Map[String, Long],
      maxLen: Int): List[String] = {
    val segs = allSegs(cps(w), sc, maxLen)
    assert(segs.nonEmpty, s"reference: '$w' not coverable")
    segs.maxBy { seg =>
      (seg.map(sc).sum,
        seg.map(p => cps(p).size).reverse.map(l => f"$l%03d").mkString)
    }
  }

  private def refEm(words: Map[String, Long], iters: Int, seedSize: Int,
      maxLen: Int): Map[String, Long] = {
    var counts = refSeed(words, maxLen, seedSize)
    for (_ <- 1 to iters) {
      val sc = refScores(counts)
      val used = scala.collection.mutable.HashMap.empty[String, Long]
      words.foreach { case (w, c) =>
        refSegment(w, sc, maxLen).foreach(p =>
          used.update(p, used.getOrElse(p, 0L) + c))
      }
      counts = counts.flatMap { case (p, _) =>
        val c = used.getOrElse(p, 0L)
        if (c > 0L || cps(p).size == 1) Some((p, c)) else None
      }
    }
    counts
  }

  // ---- train == reference, end to end --------------------------------

  test("distributed train equals the exhaustive-enumeration reference " +
    "EM on a crafted corpus") {
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "the quick fox runs", "lazy lazy dog dog dog",
      "quick brown quick brown", "over and over and over",
      "foxes and dogs jump", "a b ab ba aab abab")
    val docs = texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val iters = 3; val seed = 64; val maxLen = 4
    val m = Unigram.train(docs, iters, seed, maxLen)
    val ref = refEm(refWordCounts(texts), iters, seed, maxLen)
    val refScored = refScores(ref)
    assert(m.pieces.map { case (p, c, _) => (p, c) }.toMap == ref,
      "piece/count inventory diverges from the reference EM")
    assert(m.pieces.map { case (p, _, s) => (p, s) }.toMap == refScored,
      "final micro-log-prob scores diverge from the reference")
  }

  test("distributed train equals the reference on the documents fixture") {
    val texts = graft.util.Tables.documents(spark, sfTiny)
      .filter($"text".isNotNull).select($"text").as[String].collect().toSeq
    val m = Unigram.train(
      graft.util.Tables.documents(spark, sfTiny), 2, 128, 5)
    val ref = refEm(refWordCounts(texts), 2, 128, 5)
    assert(m.pieces.map { case (p, c, _) => (p, c) }.toMap == ref)
  }

  // ---- Viterbi edge cases ---------------------------------------------

  test("Viterbi tie-break prefers the longer last piece, recursively") {
    // [a,b] and [ab] tie at -10 → the longer last piece wins
    assert(Unigram.viterbi("ab",
      Map("a" -> -5L, "b" -> -5L, "ab" -> -10L), 6) == Seq("ab"))
    // aab: [a,ab]=-12 beats [aa,b]=-13 and [a,a,b]=-13 on TOTAL
    assert(Unigram.viterbi("aab",
      Map("a" -> -4L, "aa" -> -8L, "ab" -> -8L, "b" -> -5L), 6) ==
      Seq("a", "ab"))
    // aa: [a,a]=-8 ties [aa]=-8 → longer last piece
    assert(Unigram.viterbi("aa",
      Map("a" -> -4L, "aa" -> -8L), 6) == Seq("aa"))
    // the recursive leg: abab with all pair scores equal — [ab,ab] ties
    // [a,b,ab] etc on total; longest last, then longest second-to-last
    assert(Unigram.viterbi("abab",
      Map("a" -> -5L, "b" -> -5L, "ab" -> -10L, "ba" -> -10L), 6) ==
      Seq("ab", "ab"))
  }

  test("Viterbi matches the exhaustive reference on every corpus word " +
    "under mid-EM scores") {
    val words = refWordCounts(Seq("the quick brown fox", "customer order",
      "aggregate window filter", "abab aab"))
    val sc = refScores(refSeed(words, 4, 32))
    words.keysIterator.foreach { w =>
      assert(Unigram.viterbi(w, sc, 4) == refSegment(w, sc, 4),
        s"DP vs exhaustive diverge on '$w'")
    }
  }

  test("Viterbi is codepoint-exact beyond the BMP") {
    val x = new String(Character.toChars(0x1D54F)) // 𝕏, 2 UTF-16 units
    val sc = Map(x -> -3L, "a" -> -4L, s"$x$x" -> -6L, s"a$x" -> -5L)
    // [a𝕏, 𝕏] = -8 wins on total over [a, 𝕏𝕏] = -10 — a UTF-16-unit DP
    // would mis-slice the surrogate pair and never find the a𝕏 piece
    assert(Unigram.viterbi(s"a$x$x", sc, 6) == Seq(s"a$x", x))
    // tie on total falls to the longer last piece measured in CODEPOINTS
    assert(Unigram.viterbi(s"$x$x", Map(x -> -3L, s"$x$x" -> -6L), 6) ==
      Seq(s"$x$x"))
  }

  test("an unknown character falls back to a single-char piece at " +
      "UnkUlogp on the encode posture; the train posture still fails " +
      "loud (coverage invariant)") {
    // 'b' is absent from the vocabulary: it must segment as its own
    // piece, and the neighbors still take their trained pieces
    assert(Unigram.viterbi("abc", Map("a" -> -1L, "c" -> -1L), 6,
      fallback = true) == Seq("a", "b", "c"))
    // the fallback never outbids a trained piece: 'ab' (-3) beats
    // [a, b-fallback] (-1 + UnkUlogp) even though both cover
    assert(Unigram.viterbi("ab", Map("a" -> -1L, "ab" -> -3L), 6,
      fallback = true) == Seq("ab"))
    // an entirely-unknown word segments to all single chars
    assert(Unigram.viterbi("xyz", Map("a" -> -1L), 6,
      fallback = true) == Seq("x", "y", "z"))
    // train/prune posture (fallback off): an uncoverable word is a
    // coverage-invariant violation and must raise, not absorb
    val e = intercept[IllegalArgumentException] {
      Unigram.viterbi("abc", Map("a" -> -1L, "c" -> -1L), 6)
    }
    assert(e.getMessage.contains("coverage"))
  }

  test("EM prunes abandoned multi-char pieces but never single chars") {
    // enough singleton mass that T > 4·c(aa), so 'aa' out-scores two
    // 'a's (ln c_aa − ln T > 2(ln c_a − ln T) ⇔ c_aa·T > c_a²) and the
    // single 'a' drops to a zero count — but must stay in the vocab
    val texts = Seq("aa aa aa b c d e f g h")
    val docs = Seq((1L, texts.head)).toDF("doc_id", "text")
    val m = Unigram.train(docs, 2, 16, 2)
    val pieces = m.pieces.map(_._1).toSet
    // 'aa' dominates; the single chars survive with raw (possibly 0)
    // Viterbi counts
    assert(pieces.contains("aa") && pieces.contains("a") &&
      pieces.contains("b"))
    val aCnt = m.pieces.find(_._1 == "a").get._2
    assert(aCnt == 0L, s"'a' should be unused once 'aa' wins, got $aCnt")
  }

  test("prune equals an exhaustive-reference shrink step: leave-one-out " +
    "loss ranking + restricted E-step") {
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "the quick fox runs", "lazy lazy dog dog dog",
      "quick brown quick brown", "over and over and over",
      "foxes and dogs jump", "a b ab ba aab abab")
    val docs = texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val iters = 2; val seed = 64; val maxLen = 4; val target = 5
    val m = Unigram.train(docs, iters, seed, maxLen)
    val pruned = Unigram.prune(docs, m, target)
    // reference: exhaustive alternative-encoding loss (max total over
    // ALL segmentations of the piece's own string without itself), the
    // same keep rule, one reference E-step, zero-usage multi prune
    val sc = m.pieces.map { case (p, _, lp) => (p, lp) }.toMap
    val (singles, multis) = m.pieces.partition(p => cps(p._1).size == 1)
    val kept = multis.map { case (p, cnt, lp) =>
      val alt = allSegs(cps(p), sc - p, maxLen)
        .map(_.map(sc).sum).max
      (p, cnt, cnt * (lp - alt))
    }.sortWith { case ((p1, _, l1), (p2, _, l2)) =>
      if (l1 != l2) l1 > l2 else utf8Lt(p1, p2)
    }.take(target)
    val restricted = (singles.map(p => (p._1, p._2)) ++
      kept.map(t => (t._1, t._2))).toMap
    val sc2 = refScores(restricted)
    val words = refWordCounts(texts)
    val used = scala.collection.mutable.HashMap.empty[String, Long]
    words.foreach { case (w, c) =>
      refSegment(w, sc2, maxLen).foreach(p =>
        used.update(p, used.getOrElse(p, 0L) + c))
    }
    val refCounts = restricted.flatMap { case (p, _) =>
      val c = used.getOrElse(p, 0L)
      if (c > 0L || cps(p).size == 1) Some((p, c)) else None
    }
    val refScored = refScores(refCounts)
    assert(pruned.pieces.map { case (p, c, _) => (p, c) }.toMap == refCounts,
      "pruned piece/count inventory diverges from the reference shrink")
    assert(pruned.pieces.map { case (p, _, s) => (p, s) }.toMap == refScored)
    // the budget binds and singles all survive
    assert(pruned.pieces.count(p => cps(p._1).size > 1) <= target)
    assert(singles.map(_._1).toSet.subsetOf(pruned.pieces.map(_._1).toSet))
  }

  test("model round-trips through parquet and the re-read model encodes " +
    "identically (build-once / encode-many)") {
    val texts = Seq("the quick brown fox", "the lazy dog")
    val docs = texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val m = Unigram.train(docs, 2, 64, 4)
    val dir = java.nio.file.Files
      .createTempDirectory("graft_unigram").toString
    Unigram.writeModel(spark, m, dir)
    val m2 = Unigram.readModel(spark, dir)
    assert(m2.maxPieceLen == m.maxPieceLen)
    assert(m2.pieces.toSet == m.pieces.toSet,
      "piece/count/score triples changed across the parquet round trip")
    val a = Unigram.encodeTokenCounts(docs, m)
      .as[(Long, Long, Long)].collect().toSet
    val b = Unigram.encodeTokenCounts(docs, m2)
      .as[(Long, Long, Long)].collect().toSet
    assert(a == b, "re-read model encodes differently")
  }

  // ---- encode ----------------------------------------------------------

  test("encodeTokenCounts equals a per-doc reference recount") {
    val texts = Seq(
      "the quick brown fox", "the lazy dog", "quick quick fox")
    val docs = texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val m = Unigram.train(docs, 2, 64, 4)
    val sc = m.pieces.map { case (p, _, s) => (p, s) }.toMap
    val got = Unigram.encodeTokenCounts(docs, m)
      .as[(Long, Long, Long)].collect().toSet
    val want = texts.zipWithIndex.map { case (t, i) =>
      val toks = refTokens(t)
      (i.toLong, toks.size.toLong,
        toks.map(w => refSegment(w, sc, m.maxPieceLen).size.toLong).sum)
    }.toSet
    assert(got == want)
  }

  test("prune over a corpus with characters outside the model alphabet " +
    "completes (encode-posture E-step) and never adopts the novel chars") {
    val train = Seq((1L, "aa aa aa ab ab b")).toDF("doc_id", "text")
    val m = Unigram.train(train, 2, 16, 2)
    // the prune corpus smuggles in 'z' — absent from the model alphabet;
    // before the posture split this aborted the job, before round 12 it
    // silently worked: the contract is it WORKS and 'z' stays out
    val pruneCorpus = Seq((1L, "aa aa ab zz za b")).toDF("doc_id", "text")
    val pruned = Unigram.prune(pruneCorpus, m, 1)
    val pieces = pruned.pieces.map(_._1).toSet
    assert(!pieces.exists(_.contains("z")),
      s"novel char leaked into the pruned model: $pieces")
    assert(pieces.contains("a") && pieces.contains("b"))
  }

  test("encode dictionary broadcasts only under the LimitProbe guard; " +
    "the forced shuffled fallback returns identical results") {
    val docs = Seq((1L, "the quick fox"), (2L, "quick quick dog"))
      .toDF("doc_id", "text")
    val m = Unigram.train(docs, 2, 32, 4)
    val open = Unigram.encodeTokenCounts(docs, m)
    val tripped = Unigram.encodeTokenCounts(docs, m, dictBroadcastLimit = 0)
    assert(open.queryExecution.analyzed.toString.contains("ResolvedHint"),
      "small dictionary lost its broadcast hint")
    assert(!tripped.queryExecution.analyzed.toString.contains("ResolvedHint"),
      "oversized dictionary is still force-broadcast")
    assert(open.orderBy($"doc_id").collect().toSeq ==
      tripped.orderBy($"doc_id").collect().toSeq,
      "shuffled fallback diverges from the broadcast path")
  }

  test("encoding a corpus with characters the model never saw is total " +
    "(char fallback), batch == per-word DP") {
    val train = Seq((1L, "the fast fox the fox")).toDF("doc_id", "text")
    val m = Unigram.train(docs = train, iters = 2, seedSize = 32,
      maxPieceLen = 4)
    val sc = m.pieces.map { case (p, _, s) => (p, s) }.toMap
    // 'quiz' brings q/u/i/z — none in the train alphabet beyond t/h/e/...
    val enc = Seq((1L, "the fox"), (2L, "quiz fox"), (3L, "zzz"))
      .toDF("doc_id", "text")
    val got = Unigram.encodeTokenCounts(enc, m)
      .as[(Long, Long, Long)].collect().toSet
    def n(w: String) = Unigram.viterbi(w, sc, m.maxPieceLen,
      fallback = true).size.toLong
    assert(got == Set(
      (1L, 2L, n("the") + n("fox")),
      (2L, 2L, n("quiz") + n("fox")),
      (3L, 1L, n("zzz"))))
  }
}
