package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Unigram-LM subword tokenizer (Kudo, ACL 2018 — the SentencePiece
  * model family; the OTHER production tokenizer besides BPE): a seed
  * vocabulary of frequent substrings is re-estimated by EM — each E-step
  * segments every word into the most probable piece sequence under the
  * current piece probabilities (a Viterbi pass), the M-step recounts
  * piece usage — and pieces the model stops using are pruned.
  *
  * Re-expressed in the shape that survives 100 TB (the [[Bpe.train]]
  * word-table trick):
  *
  *   1. ONE full-corpus shuffle builds the distinct-word table
  *      ([[Bpe.wordCounts]]) — everything after is vocabulary-sized.
  *   2. Seed counting is a bounded explode over the WORD table (≤
  *      maxPieceLen substrings per character position) + one map-side-
  *      partial groupBy; the top-`seedSize` cut is a bounded
  *      `orderBy.limit` (never a full sort to the driver).
  *   3. Each E-step is a MAP-SIDE Viterbi over the word table — integer
  *      dynamic programming against a broadcast piece→score map, no
  *      shuffle — followed by one vocabulary-sized groupBy (the M-step).
  *      Per-word cost is O(len × maxPieceLen); the corpus is never
  *      touched again.
  *   4. The vocabulary itself is driver-sized BY CONSTRUCTION (≤ seedSize
  *      + alphabet, the caller's budget — exactly the object SentencePiece
  *      holds in memory), so collecting the M-step counts and broadcasting
  *      the scores is bounded, not corpus-dependent.
  *
  * Exactness (the t13/q30 fixed-point conventions): piece scores are
  * INTEGER micro-log-probs — `floor(1e6 × (ln cEff − ln T))` with
  * `cEff = max(count, 1)` and `T = Σ cEff` — so after the two
  * ulp-identical `ln`s of integer-valued doubles (t13-established across
  * Spark and DuckDB) every Viterbi comparison, count, and EM round is
  * exact integer arithmetic an independent engine replays bit-for-bit.
  * `floor`, not `round`: floor never has the half-way ambiguity.
  *
  * Viterbi is HARD EM (the segmentation, not the lattice expectation,
  * carries the counts): deterministic, SQL-replayable, and the standard
  * practical simplification; the full forward-backward E-step changes
  * the counts but not the dataflow shape. Ties break to the LONGER last
  * piece at every DP cell (then recursively on the remaining prefix) —
  * a total order, spec-pinned against an exhaustive-enumeration
  * reference.
  *
  * Coverage: every single-character piece stays in the vocabulary
  * forever (count floored to 1 in the score), so every word always has
  * at least one segmentation — SentencePiece's required-character rule.
  * Characters the model has NEVER seen (an encode corpus ⊄ train
  * corpus) take the [[Unigram.UnkUlogp]] char-fallback — SentencePiece's
  * `byte_fallback` in the character domain — so ENCODING is total on
  * any input: an unseen character becomes its own piece at a fixed
  * floor score instead of failing the job. [[Unigram.train]]'s own
  * E-steps keep the loud coverage invariant (fallback off): a
  * single-char piece wrongly dropped by a future EM change fails
  * immediately instead of silently re-scoring its corpus occurrences at
  * the floor. [[Unigram.prune]]'s restricted E-step runs on the ENCODE
  * posture (fallback on) because its corpus is caller-supplied and may
  * legitimately hold characters outside the model alphabet — see its
  * scaladoc.
  */
object Unigram {

  /** Fixed score of an unknown-character fallback piece, in integer
    * micro-log-prob: −100 in log space, far below any real piece (a
    * trained score floors at −1e6·ln T ≈ −27.6e6 even at T = 10¹²), so
    * the fallback never outbids a trained piece and, being a fixed
    * constant, replays exactly in SQL (`CASE WHEN l = 1 THEN -1e8`). */
  val UnkUlogp: Long = -100000000L

  /** Trained model: `(piece, cnt, ulogp)` — the piece inventory, its
    * final Viterbi usage count, and the integer micro-log-prob the final
    * scores assign it. Pure driver data (vocabulary-sized by the
    * caller's seed budget); [[encodeTokenCounts]] derives its own word
    * table from whatever corpus it encodes. */
  final case class Model(pieces: Seq[(String, Long, Long)],
      maxPieceLen: Int)

  /** Integer micro-log-prob scores from raw usage counts:
    * `floor(1e6 × (ln max(c,1) − ln Σ max(c,1)))`. */
  private[pipeline] def scores(counts: Seq[(String, Long)])
      : Map[String, Long] = {
    val t = counts.iterator.map { case (_, c) => math.max(c, 1L) }.sum
    val lnT = math.log(t.toDouble)
    counts.iterator.map { case (p, c) =>
      p -> math.floor(1e6 * (math.log(math.max(c, 1L).toDouble) - lnT))
        .toLong
    }.toMap
  }

  /** Codepoint array of a word — Viterbi and substring enumeration run
    * on CODEPOINTS (Spark's and DuckDB's string semantics), never UTF-16
    * units, so beyond-BMP corpora segment identically on every engine. */
  private def codepoints(w: String): Array[Int] = {
    val out = new Array[Int](w.codePointCount(0, w.length))
    var ci = 0; var i = 0
    while (ci < w.length) {
      val cp = w.codePointAt(ci)
      out(i) = cp; i += 1; ci += Character.charCount(cp)
    }
    out
  }

  /** The Viterbi DP core: `(dpT, dpL)` forward tables for `word` under
    * `sc`, with `exclude` (if non-null) treated as absent from the
    * vocabulary — the leave-one-out probe [[prune]]'s loss needs.
    *
    * `fallback` selects the coverage posture: the TRAIN/PRUNE side runs
    * with it off, so a coverage regression (a single-char piece wrongly
    * dropped by EM) still fails LOUD instead of silently skewing counts
    * at the floor score; the ENCODE side runs with it on, making
    * segmentation total on any input. */
  private def viterbiDp(word: String, sc: collection.Map[String, Long],
      maxPieceLen: Int, exclude: String, fallback: Boolean)
      : (Array[Long], Array[Int]) = {
    val cps = codepoints(word)
    val n = cps.length
    val dpT = new Array[Long](n + 1)
    val dpL = new Array[Int](n + 1)
    var i = 1
    while (i <= n) {
      var bestT = Long.MinValue
      var bestL = 0
      var l = 1
      while (l <= maxPieceLen && l <= i) {
        val piece = new String(cps, i - l, l)
        // with fallback, l == 1 always yields a candidate: the trained
        // score if the character is known, else the UnkUlogp
        // char-fallback — so bestL ≥ 1 at every position BY CONSTRUCTION
        // (`exclude` is only ever a multi-char piece, the prune
        // contract, so the fallback cannot mask an exclusion)
        val s0 = if (piece == exclude) None else sc.get(piece)
        val sv = if (s0.isDefined) s0
          else if (fallback && l == 1) Some(UnkUlogp) else None
        sv match {
          case Some(s) =>
            val t = dpT(i - l) + s
            // maximize (total, piece length): equal totals fall to the
            // longer last piece — the documented tie-break
            if (t > bestT || (t == bestT && l > bestL)) {
              bestT = t; bestL = l
            }
          case None => ()
        }
        l += 1
      }
      require(bestL > 0,
        s"word '$word' not coverable at position $i — a single-character " +
          "piece left the vocabulary (coverage invariant broken)")
      dpT(i) = bestT
      dpL(i) = bestL
      i += 1
    }
    (dpT, dpL)
  }

  /** The best segmentation of one word under `sc`: maximal total score,
    * ties to the longer LAST piece (then recursively on the prefix).
    * Integer DP, O(len × maxPieceLen). With `fallback` (the encode
    * posture) segmentation is total on any input: characters absent
    * from `sc` segment as single-char pieces at [[UnkUlogp]]; without
    * it (the train/prune posture) an uncovered character fails loud. */
  private[pipeline] def viterbi(word: String, sc: collection.Map[String, Long],
      maxPieceLen: Int, fallback: Boolean = false): Seq[String] = {
    val (_, dpL) = viterbiDp(word, sc, maxPieceLen, exclude = null, fallback)
    val cps = codepoints(word)
    var at = cps.length
    var acc = List.empty[String]
    while (at > 0) {
      val l = dpL(at)
      acc = new String(cps, at - l, l) :: acc
      at -= l
    }
    acc
  }

  /** Best-segmentation TOTAL of `word` with `exclude` removed from the
    * vocabulary — the alternative-encoding score [[prune]]'s loss
    * compares against. */
  private[pipeline] def viterbiTotalExcluding(word: String,
      sc: collection.Map[String, Long], maxPieceLen: Int,
      exclude: String): Long = {
    val (dpT, _) = viterbiDp(word, sc, maxPieceLen, exclude,
      fallback = false)
    dpT(word.codePointCount(0, word.length))
  }

  /** Distributed E-step: Viterbi-segment every distinct word against the
    * broadcast scores, emit (piece, word-count) pairs, and sum — the
    * counts the M-step renormalizes. Map-side over the word table + one
    * vocabulary-sized groupBy. */
  private[pipeline] def viterbiCounts(words: DataFrame,
      sc: Map[String, Long], maxPieceLen: Int,
      fallback: Boolean = false): DataFrame = {
    val spark = words.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(sc)
    words.select(col("word"), col("cnt")).as[(String, Long)]
      .flatMap { case (w, c) =>
        viterbi(w, bc.value, maxPieceLen, fallback).map(p => (p, c))
      }
      .toDF("piece", "cnt")
      .groupBy(col("piece")).agg(sum(col("cnt")).as("c"))
  }

  /** Seed piece counts: every substring of every word up to
    * `maxPieceLen`, position-counted and frequency-weighted (the bounded
    * analogue of SentencePiece's suffix-array seed) — all single
    * characters, plus the top `seedSize` multi-character substrings by
    * (count DESC, piece ASC in UTF-8 byte order, Spark's own string
    * comparison). */
  private[pipeline] def seedCounts(words: DataFrame, maxPieceLen: Int,
      seedSize: Int): Seq[(String, Long)] = {
    // pinned: the substring explode + groupBy (the heaviest pre-EM step)
    // is read TWICE — the singles collect and the top-K multis collect
    val sub = words
      .select(col("cnt"),
        explode(sequence(lit(1), length(col("word")))).as("i"),
        col("word"))
      .select(col("cnt"), col("i"),
        explode(sequence(lit(1),
          least(lit(maxPieceLen), length(col("word")) - col("i") + 1)))
          .as("l"),
        col("word"))
      .select(col("word").substr(col("i"), col("l")).as("piece"),
        col("cnt"))
      .groupBy(col("piece")).agg(sum(col("cnt")).as("c"))
      .localCheckpoint(true)
    val singles = sub.filter(length(col("piece")) === 1)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val multis = sub.filter(length(col("piece")) > 1)
      .orderBy(col("c").desc, col("piece"))
      .limit(seedSize)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    dropCheckpoint(sub)
    (singles ++ multis).toSeq
  }

  /** Free a localCheckpoint's RDD blocks now (Dataset.unpersist is
    * CacheManager-level and misses RDD-level persistence — the
    * established plan-walk idiom). */
  private def dropCheckpoint(df: DataFrame): Unit =
    try df.queryExecution.analyzed.foreach {
      case r: org.apache.spark.sql.execution.LogicalRDD =>
        r.rdd.unpersist(blocking = false): Unit
      case _ => ()
    } catch { case _: Throwable => () }

  /** Train `iters` hard-EM rounds over the corpus. Each round: scores
    * from the current counts → distributed Viterbi recount → prune
    * multi-character pieces the segmentation stopped using (single
    * characters persist with their raw, possibly zero, count). */
  def train(docs: DataFrame, iters: Int = 3, seedSize: Int = 512,
      maxPieceLen: Int = 6, textCol: String = "text"): Model = {
    require(iters >= 1, "need at least one EM round")
    val words = Bpe.wordCounts(docs, textCol).localCheckpoint(true)
    var counts = seedCounts(words, maxPieceLen, seedSize)
    var it = 0
    while (it < iters) {
      val sc = scores(counts)
      val recount = viterbiCounts(words, sc, maxPieceLen)
        .collect().map(r => (r.getString(0), r.getLong(1))).toMap
      counts = counts.flatMap { case (p, _) =>
        val c = recount.getOrElse(p, 0L)
        if (c > 0L || p.codePointCount(0, p.length) == 1) Some((p, c))
        else None
      }
      it += 1
    }
    val sc = scores(counts)
    // the word table's checkpoint blocks die with the train — the model
    // is pure driver data (pieces + scores), nothing downstream reads
    // the frame
    dropCheckpoint(words)
    Model(counts.map { case (p, c) => (p, c, sc(p)) }, maxPieceLen)
  }

  /** The trained vocabulary as a DataFrame `(piece, cnt, ulogp)` — the
    * t21 gate shape. */
  def vocabTable(spark: SparkSession, model: Model): DataFrame = {
    import spark.implicits._
    model.pieces.toDF("piece", "cnt", "ulogp")
  }

  /** One SentencePiece SHRINK step (Kudo 2018 §3.2's pruning, the half
    * of the algorithm [[train]] alone doesn't run): for every
    * multi-character piece, the LOSS of removing it is its usage count ×
    * (its own score − the best alternative segmentation of its own
    * string with itself excluded) — a piece whose string re-encodes
    * almost as well without it is cheap to drop. Keep the `targetMulti`
    * highest-loss multi pieces (ties to the UTF-8-lesser piece) plus
    * every single character (coverage), then ONE E-step re-estimates
    * counts under the restricted vocabulary and zero-usage multis drop
    * as in [[train]]. Repeating train→prune until the target size is
    * the full SentencePiece loop.
    *
    * All arithmetic stays in the integer micro-log-prob domain, so the
    * loss ranking and the re-estimated counts replay exactly in SQL.
    * The leave-one-out pass runs on the DRIVER over [[Model.pieces]] —
    * the vocabulary is driver-sized by construction (the caller's seed
    * budget; SentencePiece holds the same object in memory) and each
    * probe is one O(len × maxPieceLen) integer DP.
    *
    * The corpus is CALLER-SUPPLIED (usually, but not necessarily, the
    * train corpus), so the restricted E-step runs with the char
    * fallback ON: a character the model never trained on segments at
    * [[UnkUlogp]] instead of aborting the job, and — not being in the
    * restricted inventory — contributes nothing to the re-estimated
    * model. [[train]]'s own E-steps stay fallback-off (its corpus IS
    * the alphabet source, so an uncovered character there means the EM
    * loop itself broke the coverage rule and must fail loud). */
  def prune(docs: DataFrame, model: Model, targetMulti: Int,
      textCol: String = "text"): Model = {
    require(targetMulti >= 1, "need a positive multi-piece budget")
    val sc = model.pieces.map { case (p, _, lp) => (p, lp) }.toMap
    val maxLen = model.maxPieceLen
    val (singles, multis) = model.pieces
      .partition { case (p, _, _) => p.codePointCount(0, p.length) == 1 }
    val kept = multis.map { case (p, cnt, lp) =>
      val alt = viterbiTotalExcluding(p, sc, maxLen, exclude = p)
      (p, cnt, cnt * (lp - alt))
    }.sortWith { case ((p1, _, l1), (p2, _, l2)) =>
      if (l1 != l2) l1 > l2
      else org.apache.spark.unsafe.types.UTF8String.fromString(p1)
        .compareTo(
          org.apache.spark.unsafe.types.UTF8String.fromString(p2)) < 0
    }.take(targetMulti)
    val restricted = singles.map { case (p, c, _) => (p, c) } ++
      kept.map { case (p, c, _) => (p, c) }
    val sc2 = scores(restricted)
    val words = Bpe.wordCounts(docs, textCol).localCheckpoint(true)
    val recount = viterbiCounts(words, sc2, maxLen, fallback = true)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    dropCheckpoint(words)
    val counts = restricted.flatMap { case (p, _) =>
      val c = recount.getOrElse(p, 0L)
      if (c > 0L || p.codePointCount(0, p.length) == 1) Some((p, c))
      else None
    }
    val sc3 = scores(counts)
    Model(counts.map { case (p, c) => (p, c, sc3(p)) }, maxLen)
  }

  /** Persist a trained model as parquet — the build-once / encode-many
    * lifecycle, mirroring [[Bpe.writeModel]]: the piece table (piece,
    * cnt, ulogp — kilobytes, broadcastable forever) plus a one-row meta
    * table carrying maxPieceLen, WHICH IS PART OF THE MODEL (an encode
    * under a different window would probe pieces the DP can never
    * match). */
  def writeModel(spark: SparkSession, model: Model, dir: String): Unit = {
    import spark.implicits._
    vocabTable(spark, model).write.mode("overwrite")
      .parquet(s"$dir/pieces")
    Seq(model.maxPieceLen).toDF("max_piece_len")
      .write.mode("overwrite").parquet(s"$dir/meta")
  }

  def readModel(spark: SparkSession, dir: String): Model = {
    val maxLen = spark.read.parquet(s"$dir/meta")
      .head().getAs[Int]("max_piece_len")
    // piece order is not semantic (scores ride per row); sort for a
    // deterministic in-memory layout anyway
    val pieces = spark.read.parquet(s"$dir/pieces")
      .orderBy(col("piece")).collect()
      .map(r => (r.getAs[String]("piece"), r.getAs[Long]("cnt"),
        r.getAs[Long]("ulogp")))
      .toSeq
    Model(pieces, maxLen)
  }

  /** Per-document unigram-LM token counts — the corpus-scale encode
    * path, exactly [[Bpe.encodeTokenCounts]]'s dictionary-join idiom:
    * Viterbi runs once per DISTINCT word (map-side, vocabulary-sized),
    * and the corpus pays one explode + one equi-join on the word key.
    * The dictionary derives from the ENCODE corpus itself, so it covers
    * every word by construction — and since the Viterbi is total (the
    * [[UnkUlogp]] char-fallback), so is encoding, even when the encode
    * corpus holds characters the model never trained on. The dictionary
    * side broadcasts only under the [[graft.util.LimitProbe]] guard: at
    * web scale the distinct-word table is 10⁸–10⁹ rows and a forced
    * broadcast hint is a driver OOM — past the guard the join runs
    * shuffled (the d16/d18 posture).
    *
    * The distinct-word frame is localCheckpoint-pinned so the corpus is
    * scanned ONCE: the guard probe and the Viterbi dictionary both read
    * the checkpointed blocks (vocabulary-sized — the right trade against
    * a second full corpus pass; the ContextCleaner frees the blocks once
    * the returned frame is unreferenced). */
  def encodeTokenCounts(docs: DataFrame, model: Model,
      idCol: String = "doc_id", textCol: String = "text",
      dictBroadcastLimit: Long = Bpe.DictBroadcastLimit): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val sc = model.pieces.map { case (p, _, lp) => (p, lp) }.toMap
    val bc = spark.sparkContext.broadcast(sc)
    val maxLen = model.maxPieceLen
    val words = Bpe.wordCounts(docs, textCol).select(col("word"))
      .localCheckpoint(true)
    val small = graft.util.LimitProbe.atMost(words, dictBroadcastLimit)
    val dict0 = words.as[String]
      .map(w => (w, viterbi(w, bc.value, maxLen, fallback = true)
        .length.toLong))
      .toDF("word", "n_pieces")
    val dict = if (small) broadcast(dict0) else dict0
    val toks = docs.filter(col(textCol).isNotNull)
      .select(col(idCol),
        explode(TextAnalysis.tokens(col(textCol))).as("word"))
      .filter(col("word") =!= "")
    toks.join(dict, "word")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_words"),
        sum(col("n_pieces")).as("n_um_tokens"))
  }
}
