package graft.pipeline

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Byte-level BPE (GPT-2 family): byte symbolization parity between the
  * codegen'd expression and the driver kernel, distributed training vs a
  * plain driver-side byte-level reference trainer on a multi-script
  * corpus, and the UNK-free totality contract on scripts training never
  * saw. */
class ByteBpeSpec extends SparkSpec {
  import spark.implicits._

  /** Plain single-threaded byte-level BPE trainer — the char-level
    * [[BpeSpec]] reference with byte initial symbols; ties on
    * (lhs, rhs) are plain lexicographic (hex symbols are ASCII, where
    * UTF-8 and UTF-16 order agree). */
  private def referenceTrain(wordCounts: Map[String, Long], numMerges: Int)
      : (Seq[(String, String, Long)], Map[String, Vector[String]]) = {
    var vocab: Map[String, (Long, Vector[String])] =
      wordCounts.map { case (w, c) =>
        w -> (c, ByteBpe.byteSymsLocal(w).toVector)
      }
    val merges = Seq.newBuilder[(String, String, Long)]
    var k = 0
    var done = false
    while (k < numMerges && !done) {
      val pairs = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.values.foreach { case (c, syms) =>
        syms.sliding(2).foreach {
          case Vector(a, b) => pairs((a, b)) = pairs.getOrElse((a, b), 0L) + c
          case _ =>
        }
      }
      if (pairs.isEmpty) done = true
      else {
        val ((l, r), c) = pairs.minBy { case ((a, b), n) => (-n, a, b) }
        merges += ((l, r, c))
        vocab = vocab.map { case (w, (cnt, syms)) =>
          val out = Vector.newBuilder[String]
          var last: Option[String] = None
          syms.foreach { x =>
            if (last.contains(l) && x == r) { out += (l + r); last = None }
            else { last.foreach(out += _); last = Some(x) }
          }
          last.foreach(out += _)
          w -> (cnt, out.result())
        }
        k += 1
      }
    }
    (merges.result(), vocab.map { case (w, (_, s)) => w -> s })
  }

  // deliberately multi-script: ASCII, Latin-1 accents (2-byte UTF-8),
  // Cyrillic (2-byte), CJK (3-byte), astral emoji (4-byte) — the corpus
  // the char-level trio needs OOV machinery for and this family eats raw
  private val corpus = Seq(
    "hug hug hugs pug привет мир привет",
    "naïve naïve café 日本語 日本語 hug",
    "мир мир 😀😀 😀x café pug hugs",
    "hug pug 日本語 naïve привет 😀😀")

  private lazy val docs = corpus.zipWithIndex
    .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")

  private def wordCountsLocal: Map[String, Long] =
    corpus.flatMap(_.split("\\s+")).filter(_.nonEmpty)
      .groupBy(identity).map { case (w, g) => w -> g.size.toLong }

  test("byteSyms expression equals the driver kernel on every corpus " +
    "word, and symbols concatenate back to the word's hex") {
    val rows = ByteBpe.wordCounts(docs)
      .select(col("word"), col("syms")).as[(String, Seq[String])]
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { case (w, syms) =>
      assert(syms == ByteBpe.byteSymsLocal(w).toSeq,
        s"expression/kernel symbolization drift on '$w'")
      val hex = w.getBytes("UTF-8").map(b => f"${b & 0xff}%02X").mkString
      assert(syms.mkString == hex, s"hex reassembly drift on '$w'")
      assert(syms.forall(_.length == 2))
    }
  }

  test("distributed train matches the byte-level reference trainer " +
    "merge-for-merge, batched and sequential") {
    val (refMerges, refVocab) = referenceTrain(wordCountsLocal, 15)
    Seq(64, 1).foreach { mb =>
      val model = ByteBpe.train(docs, numMerges = 15, maxBatch = mb)
      assert(model.merges.map(m => (m.lhs, m.rhs, m.freq)) == refMerges,
        s"merge drift at maxBatch=$mb")
      val vocab = model.vocab.select(col("word"), col("syms"))
        .as[(String, Seq[String])].collect().toMap
      refVocab.foreach { case (w, s) =>
        assert(vocab(w) == s, s"vocab drift on '$w' at maxBatch=$mb")
      }
    }
  }

  test("encode is TOTAL on scripts training never saw: every byte " +
    "accounted for, no UNK anywhere in the family") {
    val model = ByteBpe.train(docs, numMerges = 15)
    val ranks = Bpe.rankMap(model.merges)
    // Greek, Hangul, astral CJK-B, combining marks — none in the corpus
    Seq("αβγ", "한국어", "𠀀𠀁", "éclair", "𝄞music", "ascii")
      .foreach { w =>
        val toks = ByteBpe.encodeWordGreedy(w, ranks)
        assert(toks.nonEmpty)
        val hex = w.getBytes("UTF-8").map(b => f"${b & 0xff}%02X").mkString
        assert(toks.mkString == hex,
          s"totality break on '$w': tokens must partition the byte string")
      }
  }

  test("greedy kernel equals rank-order merge application on every " +
    "corpus word (the trained-vocab equivalence)") {
    val model = ByteBpe.train(docs, numMerges = 15)
    val ranks = Bpe.rankMap(model.merges)
    val vocab = model.vocab.select(col("word"), col("syms"))
      .as[(String, Seq[String])].collect().toMap
    vocab.foreach { case (w, syms) =>
      assert(ByteBpe.encodeWordGreedy(w, ranks).toSeq == syms,
        s"greedy/vocab drift on '$w'")
    }
  }

  test("encodeTokenCounts is total with OOV docs and equals the " +
    "driver-side rollup; model IO round-trips the counts") {
    val model = ByteBpe.train(docs, numMerges = 15)
    val ranks = Bpe.rankMap(model.merges)
    val docsOov = docs.union(
      Seq((4L, "한국어 αβγ hug 𠀀𠀁")).toDF("doc_id", "text"))
    val out = ByteBpe.encodeTokenCounts(docsOov, model)
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    (corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) } :+
      (4L, "한국어 αβγ hug 𠀀𠀁")).foreach { case (id, text) =>
      val ws = text.toLowerCase.split("\\s+").filter(_.nonEmpty)
      val exp = ws.map(w => ByteBpe.encodeWordGreedy(w, ranks).length.toLong)
        .sum
      assert(out(id) == ((ws.length.toLong, exp)), s"rollup drift on $id")
    }
    val dir = java.nio.file.Files.createTempDirectory("bytebpe_io").toString
    ByteBpe.writeModel(spark, model, dir)
    val back = ByteBpe.readModel(spark, dir)
    assert(back.merges == model.merges)
    val out2 = ByteBpe.encodeTokenCounts(docsOov, back)
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(out2 == out)
  }

  test("decodeStream inverts the stream exactly on every script, " +
    "OOV docs included") {
    val model = ByteBpe.train(docs, numMerges = 15)
    // encode docs training never saw (pure-OOV scripts) plus the corpus
    val docsOov = (corpus ++ Seq("한국어 형태소", "𠀀𠀁 𝄞 mixedé😀"))
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val decoded = ByteBpe.tokenStreams(docsOov, model)
      .select(col("doc_id"), ByteBpe.decodeStream(col("stream")))
      .as[(Long, String)].collect().toMap
    (corpus ++ Seq("한국어 형태소", "𠀀𠀁 𝄞 mixedé😀")).zipWithIndex
      .foreach { case (t, i) =>
        val normal = t.toLowerCase.split("\\s+").filter(_.nonEmpty)
          .mkString("")
        assert(decoded(i.toLong) == normal,
          s"detokenize drift on doc $i: '${decoded(i.toLong)}'")
      }
  }

  test("token streams concatenate per doc in order and agree with the " +
    "count path") {
    val model = ByteBpe.train(docs, numMerges = 15)
    val streams = ByteBpe.tokenStreams(docs, model)
      .as[(Long, Seq[String])].collect().toMap
    val counts = ByteBpe.encodeTokenCounts(docs, model)
      .select(col("doc_id"), col("n_bytebpe_tokens"))
      .as[(Long, Long)].collect().toMap
    val ranks = Bpe.rankMap(model.merges)
    corpus.zipWithIndex.foreach { case (t, i) =>
      val exp = t.toLowerCase.split("\\s+").filter(_.nonEmpty)
        .flatMap(w => ByteBpe.encodeWordGreedy(w, ranks)).toSeq
      assert(streams(i.toLong) == exp, s"stream drift on doc $i")
      assert(counts(i.toLong) == exp.length.toLong)
    }
  }
}
