package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer: distributed pair-count training + corpus
  * encoding (Sennrich, Haddow & Birch, ACL 2016 — the subword vocabulary
  * every modern LLM data pipeline tokenizes with; GPT-2's BPE is the same
  * algorithm over bytes).
  *
  * Training is the classic word-level formulation, re-expressed in the
  * shape that survives 100 TB:
  *
  *   1. ONE full-corpus shuffle builds the distinct-word table
  *      `(word, cnt)` — at web scale that's ~10⁷ rows regardless of corpus
  *      size, so every later step is vocabulary-sized, not corpus-sized.
  *   2. Each merge round runs on the word table only: adjacent-pair counts
  *      via a guarded index explode + one map-side-partial groupBy, a
  *      deterministic argmax (freq DESC, lhs ASC, rhs ASC — total order, so
  *      the learned vocab is engine-exact), and a map-side merge
  *      application. The chosen pair travels as a BROADCAST single-row
  *      frame, not a literal, so all rounds share one compiled plan shape
  *      (the repo's changing-literal codegen lesson), and each round is
  *      localCheckpoint-truncated so lineage stays O(1).
  *   3. The argmax `.limit(1).collect()` moves ONE row per round to the
  *      driver — the same bounded-collect posture as
  *      [[Similarity]]'s trainSample.
  *
  * Pair counts follow the reference convention: every adjacent POSITION
  * counts (a word `aaaa` holds three `(a,a)` pairs), weighted by word
  * frequency. Merge application is one greedy left-to-right pass replacing
  * non-overlapping occurrences (`aaaa` --(a,a)--> `[aa,aa]`, `aaa` -->
  * `[aa,a]`); newly created symbols never re-merge with the same pair in
  * the same round — exactly the reference implementations' semantics, and
  * exactly reproducible in SQL as repeated first-occurrence replacement
  * (the t16 oracle's recursive CTE), which is equivalent because a merge
  * `(l,r)→lr` can never create a NEW `(l,r)` occurrence (`lr` is strictly
  * longer than both `l` and `r`).
  *
  * Encoding at corpus scale is NOT per-token fold math: applying the
  * learned merges in rank order to a word is deterministic per distinct
  * word, so the trained word table IS the encoding dictionary — encoding
  * a corpus is one explode + one (broadcastable) equi-join on the word
  * key ([[encodeTokenCounts]]). The per-word fold ([[encodeWord]]) exists
  * for out-of-vocabulary words and as the spec's independent oracle.
  */
object Bpe {

  /** One learned merge: `lhs + rhs → lhs ++ rhs`, with the pair frequency
    * at the time it was chosen. */
  final case class Merge(rank: Int, lhs: String, rhs: String, freq: Long)

  /** Trained tokenizer: the ordered merge list plus the encoded vocabulary
    * `(word, cnt, syms)` — `syms` is the word's final BPE symbol sequence,
    * i.e. the result of applying `merges` in rank order to its characters. */
  final case class Model(merges: Seq[Merge], vocab: DataFrame)

  /** Distinct-word counts of the corpus — the one corpus-sized shuffle in
    * BPE training (map-side partial counts make it cheap even at 100 TB). */
  def wordCounts(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.filter(col(textCol).isNotNull)
      .select(explode(TextAnalysis.tokens(col(textCol))).as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))

  /** Adjacent symbol pairs of every vocab word, position-counted and
    * frequency-weighted. The index sequence is guarded (`size >= 2`)
    * because Spark's `sequence(1, 0)` runs DESCENDING — the repo's
    * established n-gram pitfall. */
  private def pairCounts(words: DataFrame): DataFrame =
    words
      .select(col("cnt"), col("syms"),
        explode(when(size(col("syms")) >= 2,
            sequence(lit(1), size(col("syms")) - 1))
          .otherwise(array().cast("array<int>"))).as("i"))
      .select(element_at(col("syms"), col("i")).as("lhs"),
        element_at(col("syms"), col("i") + 1).as("rhs"), col("cnt"))
      .groupBy(col("lhs"), col("rhs")).agg(sum(col("cnt")).as("freq"))

  /** One greedy left-to-right merge pass over a symbol array. Nested
    * `when` (lazy CaseWhen branches) keeps the `element_at` off empty
    * accumulators under ANSI evaluation. */
  def applyMergeFold(syms: Column, l: Column, r: Column): Column =
    aggregate(syms, array().cast("array<string>"), (acc, x) =>
      when(size(acc) === 0, concat(acc, array(x)))
        .otherwise(
          when(element_at(acc, -1) === l && x === r,
            concat(slice(acc, lit(1), size(acc) - 1), array(concat(l, r))))
            .otherwise(concat(acc, array(x)))))

  /** Train `numMerges` merges on the corpus. Stops early (fewer merges)
    * only if the vocabulary runs out of adjacent pairs — callers that pair
    * the result with the unrolled SQL oracle must pick `numMerges` below
    * that bound (the oracle's per-round CTEs assume a non-empty argmax). */
  def train(docs: DataFrame, numMerges: Int,
      textCol: String = "text"): Model = {
    val spark = docs.sparkSession
    require(numMerges >= 1, "need at least one merge")
    // chars: split("", -1) appends one trailing empty string — drop it
    var words = wordCounts(docs, textCol)
      .withColumn("syms", filter(split(col("word"), ""), c => c =!= ""))
      .localCheckpoint(true)
    val merges = Seq.newBuilder[Merge]
    var rank = 1
    var exhausted = false
    while (rank <= numMerges && !exhausted) {
      val best = pairCounts(words)
        .orderBy(col("freq").desc, col("lhs"), col("rhs"))
        .limit(1).collect() // exactly one row per round crosses the driver
      if (best.isEmpty) exhausted = true
      else {
        val (l, r, c) =
          (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        merges += Merge(rank, l, r, c)
        // broadcast single-row pair (constant plan shape across rounds);
        // checkpoint truncates the per-round lineage
        val pair = spark.createDataFrame(Seq((l, r))).toDF("_ml", "_mr")
        words = words.crossJoin(broadcast(pair))
          .select(col("word"), col("cnt"),
            applyMergeFold(col("syms"), col("_ml"), col("_mr")).as("syms"))
          .localCheckpoint(true)
        rank += 1
      }
    }
    Model(merges.result(), words)
  }

  /** The learned merge table as a DataFrame (rank BIGINT, lhs, rhs,
    * freq BIGINT) — the t16 gate shape. */
  def mergeTable(spark: SparkSession, model: Model): DataFrame = {
    import spark.implicits._
    model.merges.map(m => (m.rank.toLong, m.lhs, m.rhs, m.freq))
      .toDF("rank", "lhs", "rhs", "freq")
  }

  /** Per-document BPE token counts by vocabulary join — the corpus-scale
    * encode path: one explode, one equi-join against the (broadcastable)
    * trained word table, one per-doc aggregation. Words absent from the
    * vocabulary are dropped (train corpus ⊇ encode corpus holds for the
    * gate; OOV encoding goes through [[encodeWord]]). */
  def encodeTokenCounts(docs: DataFrame, model: Model,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val dict = model.vocab
      .select(col("word"), size(col("syms")).cast("long").as("n_sub"))
    val toks = docs.filter(col(textCol).isNotNull)
      .select(col(idCol), explode(TextAnalysis.tokens(col(textCol))).as("word"))
      .filter(col("word") =!= "")
    toks.join(broadcast(dict), "word")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_words"), sum(col("n_sub")).as("n_bpe_tokens"))
  }

  /** Persist a trained tokenizer as two parquet tables — the merge list
    * (rank, lhs, rhs, freq: KBs, broadcastable forever) and the encoded
    * vocabulary (word, cnt, syms: the corpus-scale encode dictionary) —
    * the build-once / encode-many lifecycle, mirroring
    * [[Similarity.writePqIndex]]: train on one corpus snapshot, encode
    * every later batch from any session against the frozen vocab (OOV
    * words route through [[encodeWord]] with the re-read merges). */
  def writeModel(spark: SparkSession, model: Model, dir: String): Unit = {
    mergeTable(spark, model).write.mode("overwrite")
      .parquet(s"$dir/merges")
    model.vocab.write.mode("overwrite").parquet(s"$dir/vocab")
  }

  def readModel(spark: SparkSession, dir: String): Model = {
    val merges = spark.read.parquet(s"$dir/merges")
      .orderBy(col("rank")).collect()
      .map(r => Merge(r.getAs[Long]("rank").toInt, r.getAs[String]("lhs"),
        r.getAs[String]("rhs"), r.getAs[Long]("freq")))
      .toSeq
    Model(merges, spark.read.parquet(s"$dir/vocab"))
  }

  /** Encode ONE word column by applying the merge list in rank order —
    * the out-of-vocabulary path and the spec's independent oracle for the
    * join path. A chain of `numMerges` interpreted folds per row: bounded
    * by merge count × word length, fine for OOV tails, wrong for a whole
    * corpus (use [[encodeTokenCounts]]). */
  def encodeWord(word: Column, merges: Seq[Merge]): Column =
    merges.foldLeft(filter(split(word, ""), c => c =!= "")) { (syms, m) =>
      applyMergeFold(syms, lit(m.lhs), lit(m.rhs))
    }
}
