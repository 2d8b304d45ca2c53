package graft.pipeline

import graft.SparkSpec

/** WordPiece tokenizer: distributed likelihood-scored training vs a plain
  * driver-side reference trainer, the greedy longest-match encode kernel,
  * the `[UNK]` whole-word rule, and the corpus encode rollup. */
class WordpieceSpec extends SparkSpec {
  import spark.implicits._

  /** CODEPOINT split — the engine (Spark `split("")`) walks codepoints,
    * so the reference must too or an astral-plane word would seed lone
    * surrogates as symbols and hide real drift. */
  private def codepoints(w: String): Vector[String] =
    w.codePoints().toArray.toVector
      .map(cp => new String(Character.toChars(cp)))

  /** Plain single-threaded WordPiece trainer (the HF `tokenizers` trainer
    * semantics: merge the pair maximizing count/(count(l)·count(r)), ties
    * on (lhs, rhs) in UTF-8 byte order — the engine's `Bpe.cmpUtf8`, NOT
    * Scala's UTF-16 String ordering, which disagrees on astral chars) —
    * the independent oracle the distributed trainer must match
    * merge-for-merge. */
  private def referenceTrain(wordCounts: Map[String, Long], numMerges: Int)
      : (Seq[(String, String, Long)], Set[String]) = {
    def initial(w: String): Vector[String] =
      codepoints(w).zipWithIndex
        .map { case (c, i) => if (i == 0) c else "##" + c }
    var vocabWords: Map[String, (Long, Vector[String])] =
      wordCounts.map { case (w, c) => w -> (c, initial(w)) }
    val pieces = scala.collection.mutable.Set.empty[String]
    vocabWords.values.foreach(_._2.foreach(pieces += _))
    val merges = Seq.newBuilder[(String, String, Long)]
    var k = 0
    var done = false
    while (k < numMerges && !done) {
      val pairs = scala.collection.mutable.Map.empty[(String, String), Long]
      val syms = scala.collection.mutable.Map.empty[String, Long]
      vocabWords.values.foreach { case (c, ss) =>
        ss.foreach(s => syms(s) = syms.getOrElse(s, 0L) + c)
        ss.sliding(2).foreach {
          case Vector(a, b) => pairs((a, b)) = pairs.getOrElse((a, b), 0L) + c
          case _ =>
        }
      }
      if (pairs.isEmpty) done = true
      else {
        // argmax on the IEEE double score, ties broken (lhs, rhs) ASC in
        // UTF-8 byte order — exactly the engine's (score DESC, lhs, rhs)
        // total order; an explicit fold because minBy can't carry cmpUtf8
        var bl: String = null; var br: String = null
        var bc = 0L; var bs = Double.NegativeInfinity
        pairs.foreach { case ((a, b), n) =>
          val sc = n.toDouble / (syms(a).toDouble * syms(b).toDouble)
          val wins =
            if (bl == null) true
            else if (sc != bs) sc > bs
            else {
              val cl = Bpe.cmpUtf8(a, bl)
              cl < 0 || (cl == 0 && Bpe.cmpUtf8(b, br) < 0)
            }
          if (wins) { bl = a; br = b; bc = n; bs = sc }
        }
        val (l, r, c) = (bl, br, bc)
        merges += ((l, r, c))
        val merged = l + (if (r.startsWith("##")) r.substring(2) else r)
        pieces += merged
        vocabWords = vocabWords.map { case (w, (cnt, ss)) =>
          val out = Vector.newBuilder[String]
          var last: Option[String] = None
          ss.foreach { x =>
            if (last.contains(l) && x == r) { out += merged; last = None }
            else { last.foreach(out += _); last = Some(x) }
          }
          last.foreach(out += _)
          w -> (cnt, out.result())
        }
        k += 1
      }
    }
    (merges.result(), pieces.toSet)
  }

  /** Reference greedy longest-match segmentation — positions and the
    * [[Wordpiece.MaxInputChars]] bound in CODEPOINTS (the engine's
    * contract), so astral-plane words exercise the same boundaries the
    * engine's surrogate-safe walk does. */
  private def referenceEncode(w: String, vocab: Set[String])
      : (Long, Boolean) = {
    if (w.isEmpty) return (0L, false)
    val cps = codepoints(w)
    if (cps.length > Wordpiece.MaxInputChars) return (1L, true)
    var pos = 0
    var n = 0L
    while (pos < cps.length) {
      val hit = (cps.length to (pos + 1) by -1)
        .find(e => vocab.contains(
          (if (pos == 0) "" else "##") + cps.slice(pos, e).mkString))
      hit match {
        case None => return (1L, true)
        case Some(e) => n += 1; pos = e
      }
    }
    (n, false)
  }

  // the last line plants astral-plane words (𝄞 = U+1D11E, two UTF-16
  // units): the trainer must split them into codepoint symbols (never
  // lone surrogates) and the tie-break must stay UTF-8-ordered
  private val corpus = Seq(
    "hugs hug hugging pug pugs",
    "hug hug hugs bug bugs bun",
    "hugging pugs bun gun gunning",
    "bug bun hug pug gun hugs 𝄞ug 𝄞ug 𝄞ugs")

  private lazy val docs = corpus.zipWithIndex
    .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")

  test("distributed train matches the reference trainer merge-for-merge") {
    val model = Wordpiece.train(docs, numMerges = 10)
    val wc = corpus.flatMap(_.split("\\s+")).groupBy(identity)
      .map { case (w, g) => w -> g.size.toLong }
    val (refMerges, refVocab) = referenceTrain(wc, 10)
    assert(model.merges.map(m => (m.lhs, m.rhs, m.freq)) == refMerges)
    assert(model.vocab == refVocab)
  }

  test("single-partition scored argmax equals the distributed chain " +
    "merge-for-merge") {
    // parts=1 rides topScoredPairSinglePartition; minParts=2 forces the
    // DataFrame chain — both must produce the identical merge list,
    // ties and score arithmetic included
    val fast = Wordpiece.train(docs, numMerges = 10)
    val dist = Wordpiece.train(docs, numMerges = 10, minParts = 2)
    assert(fast.merges == dist.merges)
    assert(fast.vocab == dist.vocab)
  }

  test("likelihood argmax genuinely diverges from BPE's frequency argmax") {
    // 'u' follows 'h'/'p'/'b' everywhere, so (##u,##g)-class pairs have
    // the highest raw frequency, but rare symbols with near-exclusive
    // attachment win the likelihood score — the two trainers must pick
    // different first merges on this corpus or the gate is vacuous
    val wp = Wordpiece.train(docs, numMerges = 1).merges.head
    val bpe = Bpe.train(docs, numMerges = 1).merges.head
    assert((wp.lhs, stripHash(wp.rhs)) != (bpe.lhs, bpe.rhs),
      s"first merges coincide: $wp vs $bpe — pick a different corpus")
  }

  private def stripHash(s: String): String =
    if (s.startsWith("##")) s.substring(2) else s

  test("encode kernel: greedy longest match, ## continuations, UNK rule") {
    val vocab = Set("h", "##u", "##g", "##gs", "hug", "hugg", "##ing",
      "b", "##un")
    // greedy is NOT backtracking: "hugg" wins at pos 0 (longer than
    // "hug"), stranding "s" — "##s" is absent, so the whole word is UNK
    // even though hug|##gs would have segmented it
    assert(Wordpiece.encodeWord("huggs", vocab) == (1L, true))
    assert(Wordpiece.encodeWord("hugging", vocab) == (2L, false)) // hugg|##ing
    assert(Wordpiece.encodeWord("hug", vocab) == (1L, false))
    assert(Wordpiece.encodeWord("bun", vocab) == (2L, false)) // b|##un
    assert(Wordpiece.encodeWord("", vocab) == (0L, false))
    // 'z' has no vocab entry → whole word is one [UNK]
    assert(Wordpiece.encodeWord("buzz", vocab) == (1L, true))
    // word-initial continuation forms don't leak: "ug" fails at pos 0
    // even though ##u and ##g exist
    assert(Wordpiece.encodeWord("ug", vocab) == (1L, true))
    // the 100-codepoint bound: a segmentable-but-overlong word is [UNK]
    val long = "h" + "u".repeat(120)
    assert(Wordpiece.encodeWord(long, vocab + "##u") == (1L, true))
  }

  test("greedy kernel equals the reference encoder on every corpus word " +
    "under the trained model, plus planted OOV") {
    val model = Wordpiece.train(docs, numMerges = 10)
    val words = corpus.flatMap(_.split("\\s+")).distinct ++
      Seq("zebra", "gnu", "hugz", "snugging", "𝄞hug", "hug𝄞", "𠀀𠀁")
    words.foreach { w =>
      assert(Wordpiece.encodeWord(w, model.vocab) ==
        referenceEncode(w, model.vocab), s"kernel drift on '$w'")
    }
  }

  test("model IO round trip preserves merges, vocab, and every encode " +
    "decision") {
    val model = Wordpiece.train(docs, numMerges = 10)
    val dir = java.nio.file.Files.createTempDirectory("wp_io").toString
    Wordpiece.writeModel(spark, model, dir)
    val back = Wordpiece.readModel(spark, dir)
    assert(back.merges == model.merges)
    assert(back.vocab == model.vocab)
    val words = corpus.flatMap(_.split("\\s+")).distinct ++ Seq("zzz", "gnu")
    words.foreach { w =>
      assert(Wordpiece.encodeWord(w, back.vocab) ==
        Wordpiece.encodeWord(w, model.vocab))
    }
  }

  test("kernel equals the reference encoder on 40 randomized " +
    "vocabularies x 25 random probe words (the BPE property precedent)") {
    // deterministic LCG — reproducible without Random's global state
    var seed = 0x9E3779B97F4A7C15L
    def nextInt(bound: Int): Int = {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      (((seed >>> 33) % bound).toInt + bound) % bound
    }
    // one astral member (😀 = U+1F600) so every trial exercises
    // surrogate-pair boundaries in both kernel and reference
    val alphabet = Vector("a", "b", "c", "d", "😀", "f")
    def randWord(maxLen: Int): String =
      (0 until (1 + nextInt(maxLen))).map(_ =>
        alphabet(nextInt(alphabet.length))).mkString
    (1 to 40).foreach { trial =>
      // random vocab: all single-char forms for a SUBSET of the alphabet
      // (so UNK genuinely fires), plus random multi-char pieces in both
      // positional forms
      val kept = alphabet.filter(_ => nextInt(4) > 0)
      val vocab = scala.collection.mutable.Set.empty[String]
      kept.foreach { c => vocab += c; vocab += s"##$c" }
      (0 until 12).foreach { _ =>
        val p = randWord(4)
        vocab += (if (nextInt(2) == 0) p else "##" + p)
      }
      val v = vocab.toSet
      (1 to 25).foreach { _ =>
        val w = randWord(8)
        assert(Wordpiece.encodeWord(w, v) == referenceEncode(w, v),
          s"trial $trial drift on '$w' under $v")
      }
    }
  }

  test("token streams: per-doc piece sequences equal a driver-side " +
    "walk, [UNK] sentinels inline, counts never drift from streams") {
    import org.apache.spark.sql.functions._
    val model = Wordpiece.train(docs, numMerges = 10)
    val docsOov = docs.union(Seq((4L, "hug zzz hugs")).toDF("doc_id", "text"))
    val streams = Wordpiece.tokenStreams(docsOov, model)
      .as[(Long, Seq[String])].collect().toMap
    (corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) } :+
      (4L, "hug zzz hugs")).foreach { case (id, text) =>
      val exp = text.toLowerCase.split("\\s+").filter(_.nonEmpty)
        .flatMap(w => Wordpiece.encodeWordPieces(w, model.vocab)).toSeq
      assert(streams(id) == exp, s"stream drift on doc $id")
    }
    assert(streams(4L).contains(Wordpiece.UnkToken))
    // the count path is DERIVED from the piece walk — pin it anyway
    val counts = Wordpiece.encodeTokenCounts(docsOov, model)
      .select(col("doc_id"), col("n_wp_tokens"))
      .as[(Long, Long)].collect().toMap
    streams.foreach { case (id, s) =>
      assert(counts(id) == s.length.toLong, s"count/stream drift on $id")
    }
  }

  test("corpus encode rollup: totals and UNK counts per document") {
    val model = Wordpiece.train(docs, numMerges = 10)
    // doc 4 plants an unseen char ('z') and an unseen-initial word
    val docsOov = docs.union(Seq((4L, "hug zzz hugs")).toDF("doc_id", "text"))
    val out = Wordpiece.encodeTokenCounts(docsOov, model)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    val wc = (d: String) => d.split("\\s+").filter(_.nonEmpty)
    corpus.zipWithIndex.foreach { case (t, i) =>
      val ws = wc(t.toLowerCase)
      val expTok = ws.map(w => referenceEncode(w, model.vocab)._1).sum
      val expUnk = ws.count(w => referenceEncode(w, model.vocab)._2)
      assert(out(i.toLong) == ((ws.length.toLong, expTok, expUnk.toLong)),
        s"rollup drift on doc $i")
    }
    val (n4, t4, u4) = out(4L)
    assert(n4 == 3L && u4 == 1L, "planted OOV doc must carry one UNK word")
    assert(t4 == referenceEncode("hug", model.vocab)._1 + 1L +
      referenceEncode("hugs", model.vocab)._1)
  }
}
