package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** BYTE-level byte-pair encoding — the GPT-2 / tiktoken tokenizer family
  * (Radford et al. 2019, "Language Models are Unsupervised Multitask
  * Learners", §2.2): BPE trained not over a word's characters but over
  * its UTF-8 BYTES. The base alphabet is at most 256 symbols, so encode
  * is structurally TOTAL — any word in any script decomposes into byte
  * symbols with zero UNK/OOV machinery; a corpus that suddenly grows a
  * novel script degrades gracefully to byte-granular tokens instead of
  * routing through fallback kernels. This is the property production GPT
  * pipelines rely on and the one the char-level trio ([[Bpe]],
  * [[Wordpiece]], [[Unigram]]) structurally cannot offer.
  *
  * Representation: a byte is the symbol `"%02X"` — its UPPERCASE
  * two-hex-digit string — and a merged symbol is the concatenation of
  * its bytes' hex pairs. That makes the whole family a pure REUSE of the
  * char-level machinery: the initial symbolization is one codegen'd
  * expression (`hex(encode(word,'UTF-8'))` split into pairs — no UDF),
  * and training, batching, the argmax total order, the guarded encode
  * dictionary and the greedy OOV kernel are the SAME code paths
  * ([[Bpe.trainWords]], [[Bpe.greedyMergeLoop]],
  * [[Bpe.encodeTokenCountsWith]]). Hex symbols are ASCII, so the
  * (freq DESC, lhs, rhs) tie-break's UTF-8 byte order is plain
  * lexicographic hex order — identical in Spark and DuckDB, which
  * replays the symbolization verbatim as
  * `regexp_extract_all(hex(encode(word)), '..')`.
  *
  * Scale posture inherits [[Bpe]]'s wholesale: one corpus-sized shuffle
  * for the distinct-word table, vocabulary-sized batched merge rounds,
  * LimitProbe-guarded encode dictionary, OOV tail through the broadcast
  * rank map. Byte sequences are ~1–4× longer than codepoint sequences
  * (UTF-8 width), a constant factor on the vocabulary-sized side only.
  *
  * Reference scope: the reference backend has no tokenizers
  * (`/root/reference/api` is a Flask/Cypher surface) — this family is
  * part of the LLM-data-pipeline extension surface.
  */
object ByteBpe {

  /** Hex-pair symbolization of a word's UTF-8 bytes — uppercase, two
    * digits per byte, as one codegen'd expression chain. */
  def byteSyms(word: Column): Column =
    regexp_extract_all(hex(encode(word, "UTF-8")), lit(".."), lit(0))

  /** Distinct-word counts carrying the byte initial symbolization — the
    * [[Bpe.wordCounts]] shuffle plus the map-side hex split. */
  def wordCounts(docs: DataFrame, textCol: String = "text"): DataFrame =
    Bpe.wordCounts(docs, textCol)
      .withColumn("syms", byteSyms(col("word")))

  /** Train `numMerges` byte-level merges — [[Bpe.trainWords]] over the
    * byte symbolization; everything after the initial split (batched
    * argmax rounds, broadcast merge maps, checkpoint cadence) is the
    * char-level trainer verbatim. */
  def train(docs: DataFrame, numMerges: Int,
      textCol: String = "text", maxBatch: Int = 64): Bpe.Model =
    Bpe.trainWords(wordCounts(docs, textCol), numMerges, maxBatch)

  /** Driver-side byte symbolization of one word (the OOV kernel's entry
    * seam) — `%02X` per UTF-8 byte, mirroring [[byteSyms]] exactly. */
  def byteSymsLocal(word: String): Array[String] = {
    val bytes = word.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val out = new Array[String](bytes.length)
    var i = 0
    while (i < bytes.length) {
      out(i) = f"${bytes(i) & 0xff}%02X"
      i += 1
    }
    out
  }

  /** The greedy merge-priority encoder over byte symbols — TOTAL on any
    * input (worst case every byte is its own token; there is no UNK in
    * this family, by construction). [[Bpe.greedyMergeLoop]] with the
    * byte symbolization. */
  def encodeWordGreedy(word: String,
      ranks: collection.Map[(String, String), Int]): Array[String] = {
    val buf = scala.collection.mutable.ArrayBuffer.empty[String]
    byteSymsLocal(word).foreach(buf += _)
    Bpe.greedyMergeLoop(buf, ranks)
  }

  /** Per-document byte-BPE token counts — the [[Bpe.encodeTokenCounts]]
    * join shape (guarded dictionary, lazy OOV leg) with the byte greedy
    * kernel; output column `n_bytebpe_tokens`. Total on ANY corpus —
    * novel scripts cost byte-granular tokens, never a failure. */
  def encodeTokenCounts(docs: DataFrame, model: Bpe.Model,
      idCol: String = "doc_id", textCol: String = "text",
      dictBroadcastLimit: Long = Bpe.DictBroadcastLimit): DataFrame =
    Bpe.encodeTokenCountsWith(docs, model, idCol, textCol,
      dictBroadcastLimit, encodeWordGreedy, "n_bytebpe_tokens")

  /** Per-document byte-BPE token STREAMS (hex-symbol sequences in
    * document order) — [[Bpe.tokenStreams]]'s shape with the byte
    * kernel. */
  def tokenStreams(docs: DataFrame, model: Bpe.Model,
      idCol: String = "doc_id", textCol: String = "text",
      dictBroadcastLimit: Long = Bpe.DictBroadcastLimit): DataFrame =
    Bpe.tokenStreamsWith(docs, model, idCol, textCol, dictBroadcastLimit,
      encodeWordGreedy)

  /** Byte-BPE token STREAMS over [[Gpt2.pretokenize]] pieces instead of
    * lowercased whitespace words — the GPT-2-exact segmentation, under
    * which [[decodeStream]] is the IDENTITY (pieces preserve case and
    * whitespace and concatenate back to the input; byte symbols are
    * lossless per piece).
    *
    * Shape differs from [[tokenStreams]] deliberately: there the
    * trained dictionary covers almost every occurrence, so the greedy
    * kernel rides the left-outer join's rare unmatched tail. GPT-2
    * pieces preserve case and leading spaces, so the lowercased-word
    * dictionary rarely hits — the kernel IS the common case, and it
    * must run once per DISTINCT piece, never per occurrence (measured
    * 13.2 s → per-distinct at sf0.1; per-occurrence greedy on a
    * Zipfian corpus is the anti-pattern every batch encode path here
    * avoids): one distinct-piece aggregation, the trained-vocab
    * dictionary as a fast path over it, the kernel on the misses, and
    * the encoded piece table joined back under the broadcast guard
    * (corpus-derived — never an unconditional hint). */
  def pretokStreams(docs: DataFrame, model: Bpe.Model,
      idCol: String = "doc_id", textCol: String = "text",
      dictBroadcastLimit: Long = Bpe.DictBroadcastLimit): DataFrame =
    encodePieces(
      Gpt2.pretokenized(docs.filter(col(textCol).isNotNull),
          idCol, textCol, "_pieces")
        // pinned (lazy): the split regex is the family's per-row pole
        // and TWO subplans read the pieces (the distinct-piece leg and
        // the position join) — without the pin each would re-run it
        // over the corpus
        .localCheckpoint(false),
      model, idCol, "_pieces", dictBroadcastLimit)

  /** Encode an ALREADY-pretokenized `(id, array<string> pieces)` frame —
    * the seam [[pretokStreams]] rides and the one a caller who computed
    * the piece split itself (t46 pins ONE split frame for both its
    * piece stats and the encode) shares. The kernel runs once per
    * DISTINCT piece, never per occurrence: GPT-2 pieces preserve case
    * and leading spaces, so the lowercased trained dictionary rarely
    * hits and the greedy kernel is the COMMON case — per-occurrence
    * evaluation on a Zipfian corpus is the anti-pattern every batch
    * encode path here avoids. The encoded piece table is pinned
    * (eager, distinct-piece-sized) because the broadcast guard's limit
    * probe and the broadcast build would otherwise each re-run the
    * distinct + kernel subplan; it joins back under the guard
    * (corpus-derived — never an unconditional broadcast hint). */
  def encodePieces(docs: DataFrame, model: Bpe.Model,
      idCol: String = "doc_id", piecesCol: String = "pieces",
      dictBroadcastLimit: Long = Bpe.DictBroadcastLimit): DataFrame = {
    val spark = docs.sparkSession
    val dict = Bpe.guardedDict(
      model.vocab.select(col("word"), col("syms")), dictBroadcastLimit)
    val bc = spark.sparkContext.broadcast(Bpe.rankMap(model.merges))
    val oovSyms = udf((w: String) => encodeWordGreedy(w, bc.value).toSeq)
    val pos = docs.select(col(idCol), posexplode(col(piecesCol)))
    val encoded = Bpe.guardedDict(
      pos.select(col("col").as("piece")).distinct()
        .join(dict, col("piece") === col("word"), "left_outer")
        .select(col("piece"),
          when(col("syms").isNotNull, col("syms"))
            .otherwise(oovSyms(col("piece"))).as("psyms"))
        .localCheckpoint(true),
      dictBroadcastLimit)
    Bpe.flattenOrdered(
      pos.join(encoded, col("col") === col("piece"))
        .select(col(idCol), col("pos"), col("psyms").as("syms")),
      idCol, "syms")
  }

  /** EXACT detokenization of a byte-BPE token stream — byte-level BPE's
    * defining property (char-level BPE cannot promise it: an OOV
    * character has no symbol; here every symbol IS hex-encoded bytes):
    * concatenate the stream's hex symbols, unhex, decode UTF-8. One
    * codegen'd expression, the algebraic inverse of [[byteSyms]] ∘
    * merges — `decodeStream(tokenStreams(x)) == x`'s pretokenized
    * normal form (whitespace pretokenization drops separators, so the
    * reconstruction is the in-order word concatenation), and
    * `decodeStream(pretokStreams(x)) == x` EXACTLY (the GPT-2
    * pretokenizer preserves separators — the t46 identity gate). */
  def decodeStream(stream: Column): Column =
    decode(unhex(concat_ws("", stream)), "UTF-8")

  /** Model IO — the [[Bpe.writeModel]]/[[Bpe.readModel]] parquet pair
    * applies unchanged (merges and vocab are plain string tables either
    * way); thin aliases so call sites read family-correctly. */
  def writeModel(spark: SparkSession, model: Bpe.Model, dir: String): Unit =
    Bpe.writeModel(spark, model, dir)

  def readModel(spark: SparkSession, dir: String): Bpe.Model =
    Bpe.readModel(spark, dir)
}
