package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Deduplication operators for training-data pipelines: exact, n-gram
  * Jaccard, MinHash+LSH, SimHash, embedding-cosine near-dup.
  *
  * Scale design:
  *  - exact dedup = hash-groupBy on the normalized key (one shuffle, partial
  *    aggregation map-side);
  *  - LSH families (MinHash bands, SimHash bands, hyperplane buckets) turn
  *    the quadratic all-pairs problem into equi-joins on bucket keys — the
  *    only shapes that survive 100 TB. Brute-force variants exist as
  *    correctness oracles and for bounded candidate sets.
  */
object Dedup {

  /** Normalized text key for exact dedup: lowercase, collapse whitespace. */
  def normText(text: Column): Column =
    regexp_replace(lower(trim(text)), "\\s+", " ")

  /** Exact dedup: keep the smallest id per normalized text. */
  def exactDedup(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    docs.withColumn("_key", normText(col(textCol)))
      .groupBy(col("_key"))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_dups"))
      .drop("_key")

  /** Character n-gram shingle set (1-based positions — mirrors SQL
    * substring semantics so DuckDB oracles agree). */
  def ngrams(text: Column, n: Int): Column =
    array_distinct(transform(
      sequence(lit(1), greatest(length(text) - (n - 1), lit(1))),
      i => substring_index_safe(text, i, n)))

  private def substring_index_safe(text: Column, i: Column, n: Int): Column =
    text.substr(i, lit(n))

  /** Exact Jaccard similarity of two shingle-set columns: |∩| / |∪| as an
    * exact integer ratio (bit-identical across engines). */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") /
      size(array_distinct(concat(a, b))).cast("double")

  /** All-pairs n-gram Jaccard above `threshold` — the brute-force baseline
    * (quadratic: restrict the input or use [[minhashCandidates]] at scale). */
  def jaccardPairs(docs: DataFrame, n: Int, threshold: Double,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val g = docs.select(col(idCol).as("id"),
      ngrams(lower(col(textCol)), n).as("grams"))
    val a = g.select(col("id").as("id_a"), col("grams").as("grams_a"))
    val b = g.select(col("id").as("id_b"), col("grams").as("grams_b"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("jac", jaccard(col("grams_a"), col("grams_b")))
      .filter(col("jac") >= threshold)
      .select(col("id_a"), col("id_b"), col("jac"))
  }

  /** MinHash signature: `numHashes` min-values over the shingle set, each
    * with a distinct seeded xxhash64. Stored as an array column. */
  def minhashSignature(grams: Column, numHashes: Int): Column =
    array((0 until numHashes).map { seed =>
      array_min(transform(grams, g => xxhash64(lit(seed), g)))
    }: _*)

  /** MinHash + LSH banding: candidate pairs that agree on at least one band
    * of `rowsPerBand` consecutive signature entries. The band bucket join is
    * the scale path: shuffle on (band, bucketHash) only.
    *
    * Returns candidates verified with exact Jaccard >= threshold. */
  def minhashDedup(docs: DataFrame, n: Int, numHashes: Int, rowsPerBand: Int,
      threshold: Double, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(numHashes % rowsPerBand == 0, "bands must tile the signature")
    val numBands = numHashes / rowsPerBand
    val g = docs.select(col(idCol).as("id"),
        ngrams(lower(col(textCol)), n).as("grams"))
      .withColumn("sig", minhashSignature(col("grams"), numHashes))
      .cache()
    val banded = g.select(col("id"),
      posexplode(array((0 until numBands).map { b =>
        xxhash64(lit(b) +: (0 until rowsPerBand)
          .map(r => element_at(col("sig"), b * rowsPerBand + r + 1)): _*)
      }: _*)).as(Seq("band", "bucket")))
    val l = banded.select(col("band"), col("bucket"), col("id").as("id_a"))
    val r = banded.select(col("band"), col("bucket"), col("id").as("id_b"))
    // dedup candidate ids FIRST (cheap long-pair shuffle), then re-join the
    // shingle sets once per surviving pair for exact verification — never
    // drag the gram arrays through the band join or the distinct.
    val candidates = l.join(r, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .distinct() // a pair may collide in many bands
    candidates
      .join(g.select(col("id").as("id_a"), col("grams").as("grams_a")), "id_a")
      .join(g.select(col("id").as("id_b"), col("grams").as("grams_b")), "id_b")
      .withColumn("jac", jaccard(col("grams_a"), col("grams_b")))
      .filter(col("jac") >= threshold)
      .select(col("id_a"), col("id_b"), col("jac"))
  }

  /** 64-bit SimHash over whitespace tokens: per-bit majority vote of the
    * token hashes. One explode + one groupBy — fully distributed. */
  def simhash(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val toks = docs.select(col(idCol).as("id"),
        explode(array_distinct(TextAnalysis.tokens(col(textCol)))).as("tok"))
      .withColumn("h", xxhash64(col("tok")))
    val voteExprs = (0 until 64).map { b =>
      sum(when(col("h").bitwiseAND(lit(1L << b)) =!= 0L, 1)
        .otherwise(-1)).as(s"b$b")
    }
    val votes = toks.groupBy(col("id")).agg(voteExprs.head, voteExprs.tail: _*)
    val bits = (0 until 64).map { b =>
      when(col(s"b$b") > 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ bitwiseOR _)
    votes.select(col("id"), bits.as("simhash"))
  }

  /** SimHash near-dup pairs: band the 64-bit hash into 4×16-bit blocks
    * (pigeonhole: any pair with hamming distance ≤ 3 shares ≥ 1 block),
    * join per block, verify with bit_count(xor) ≤ maxHamming. */
  def simhashPairs(docs: DataFrame, maxHamming: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(maxHamming <= 3, "4-band pigeonhole covers hamming<=3")
    val sh = simhash(docs, idCol, textCol)
    val banded = sh.select(col("id"), col("simhash"),
      posexplode(array((0 until 4).map { b =>
        col("simhash").cast("long") // shift below
          .bitwiseAND(lit(0xFFFFL << (16 * b))).as(s"blk$b")
      }: _*)).as(Seq("band", "block")))
    val l = banded.select(col("band"), col("block"), col("id").as("id_a"),
      col("simhash").as("sh_a"))
    val r = banded.select(col("band"), col("block"), col("id").as("id_b"),
      col("simhash").as("sh_b"))
    l.join(r, Seq("band", "block"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("sh_a"), col("sh_b")).distinct()
      .withColumn("hamming", bit_count(col("sh_a").bitwiseXOR(col("sh_b"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }

  /** Embedding cosine near-dup: brute-force pairs with cosine >= threshold.
    *
    * Implementation: broadcast the corpus (id, vec) and scan it once per
    * row in a tight JVM loop — each task emits its rows' qualifying pairs.
    * This replaces an all-pairs crossJoin of interpreted `aggregate` folds
    * (O(n²) array-lambda evaluations) with O(n²/p) fused multiply-adds per
    * task; at 2k vectors this is ~100× faster. The arithmetic keeps the
    * exact sequential op order of the SQL oracle
    * (dot / (sqrt(Σa²)·sqrt(Σb²)), HALF_UP rounding), so results stay
    * bit-identical. Beyond broadcastable corpus sizes, use
    * [[Similarity.hyperplaneBuckets]] to shard candidates first. */
  def embeddingNearDupPairs(emb: DataFrame, threshold: Double,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val v = emb.select(col(idCol).cast("long").as("id"),
      col(vecCol).cast("array<double>").as("vec"))
    val all = v.as[(Long, Seq[Double])].collect()
      .sortBy(_._1).map { case (i, xs) => (i, xs.toArray) }
    val bc = spark.sparkContext.broadcast(all)
    v.as[(Long, Seq[Double])].mapPartitions { it =>
      val corpus = bc.value
      it.flatMap { case (ida, va0) =>
        val va = va0.toArray
        corpus.iterator.filter(_._1 > ida).flatMap { case (idb, vb) =>
          var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
          while (i < va.length) {
            dot += va(i) * vb(i); na += va(i) * va(i); nb += vb(i) * vb(i)
            i += 1
          }
          val cos = dot / (math.sqrt(na) * math.sqrt(nb))
          val rounded = BigDecimal(cos) // Spark round(): HALF_UP
            .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
          if (rounded >= threshold) Some((ida, idb, rounded)) else None
        }
      }
    }.toDF("id_a", "id_b", "cos")
  }
}
