package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sequence packing — the final stage of LLM training-data prep: documents
  * are concatenated in a deterministic global order and chopped into
  * fixed-length training sequences (concat-and-chop; a doc can span a
  * sequence boundary).
  *
  * The core is a GLOBAL PREFIX SUM of token counts. The naive
  * `SUM(n) OVER (ORDER BY id)` window has no partition key, so Spark would
  * run it on ONE task; instead this is the classic two-pass distributed
  * scan (the same shape the mutation engine uses for ID assignment):
  * range-partition + sort by id (pinned), per-partition sums to the driver
  * (one tiny job), then a per-partition running offset — every token
  * offset is a pure function of the data, identical on any cluster.
  */
object Packing {

  /** (id, n, tok_start) per row: tok_start = Σ n over all rows with
    * smaller id. Input rows with the same id are disallowed (offsets
    * would depend on partitioning) — ENFORCED: duplicate ids are adjacent
    * after the range-partition + sort (equal keys share a partition), so
    * the per-partition sum pass detects them for free and fails loudly
    * instead of publishing partition-dependent offsets. */
  def tokenOffsets(df: DataFrame, idCol: String, nCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val sorted = df
      .select(col(idCol).cast("long").as("id"), col(nCol).cast("long").as("n"))
      .repartitionByRange(col("id")).sortWithinPartitions(col("id"))
      .localCheckpoint(true)
    val ds = sorted.as[(Long, Long)]
    val partStats = ds.mapPartitions { it =>
      var sum = 0L; var prev = 0L; var first = true; var dup = false
      it.foreach { case (id, n) =>
        if (!first && id == prev) dup = true
        prev = id; first = false; sum += n
      }
      Iterator.single((sum, dup))
    }.collect()
    require(!partStats.exists(_._2),
      s"tokenOffsets: duplicate values in id column '$idCol' — " +
        "offsets would be partition-dependent; deduplicate first")
    val offsets = partStats.map(_._1).scanLeft(0L)(_ + _)
    val rdd = ds.rdd.mapPartitionsWithIndex { (pi, it) =>
      var run = offsets(pi)
      it.map { case (id, n) => val s = run; run += n; (id, n, s) }
    }
    spark.createDataFrame(rdd).toDF("id", "n", "tok_start")
  }

  /** Token-budget corpus selection ("fill the training budget with the
    * best documents"): rank docs by (score DESC, id), keep every doc whose
    * RUNNING token total including itself stays within `budget` — the
    * greedy truncation a curation pipeline applies before export. The
    * running total includes skipped-over rows by construction (the prefix
    * is monotone, so the kept set is exactly the top-ranked prefix that
    * fits). Same two-pass distributed scan as [[tokenOffsets]] — range-
    * partition + sort on the rank key, per-partition sums to the driver,
    * running offsets — never a single-task global window; the result is a
    * pure function of the data on any cluster shape (the (score, id) sort
    * key is unique because ids are). Returns (id, n, score, cum, kept). */
  def budgetFill(df: DataFrame, idCol: String, nCol: String,
      scoreCol: String, budget: Long): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val sorted = df
      .select(col(scoreCol).cast("double").as("q"),
        col(idCol).cast("long").as("id"), col(nCol).cast("long").as("n"))
      .repartitionByRange(col("q").desc, col("id"))
      .sortWithinPartitions(col("q").desc, col("id"))
      .localCheckpoint(true)
    val ds = sorted.as[(Double, Long, Long)]
    val partSums = ds
      .mapPartitions(it => Iterator.single(it.map(_._3).sum)).collect()
    val offsets = partSums.scanLeft(0L)(_ + _)
    val rdd = ds.rdd.mapPartitionsWithIndex { (pi, it) =>
      var run = offsets(pi)
      it.map { case (q, id, n) => run += n; (id, n, q, run) }
    }
    spark.createDataFrame(rdd).toDF("id", "n", "score", "cum")
      .withColumn("kept", col("cum") <= budget)
  }

  /** GLOBAL rank in (n DESC, id) order — the same two-pass distributed
    * scan as [[tokenOffsets]], counting ROWS instead of tokens: a naive
    * `ROW_NUMBER() OVER (ORDER BY …)` has no partition key and runs on
    * one task. Returns (id, n, rank), rank 0-based, a pure function of
    * the data on any cluster shape (the (n desc, id) key is unique
    * because ids are). */
  def globalRankDesc(df: DataFrame, idCol: String,
      nCol: String): DataFrame =
    rankScan(
      df.select(col(nCol).cast("long").as("n"),
          col(idCol).cast("long").as("id"))
        .repartitionByRange(col("n").desc, col("id"))
        .sortWithinPartitions(col("n").desc, col("id")),
      keep = Seq("id", "n"))

  /** The ONE copy of the two-pass distributed ROW-RANK scan (shared by
    * [[globalRankDesc]] and [[epochShuffle]]): input must already be
    * range-partitioned + sorted on its total key; emits the `keep`
    * columns plus a 0-based global `rank` — per-partition counts to the
    * driver (one tiny job), then running offsets. Never a single-task
    * window. Sort-only key columns (e.g. epochShuffle's 32-char md5)
    * are dropped INSIDE the row map, not by a projection above it — the
    * output rows never materialize them. */
  private def rankScan(sorted: DataFrame, keep: Seq[String]): DataFrame = {
    val spark = sorted.sparkSession
    val pinned = sorted.localCheckpoint(true)
    val partCounts = pinned.rdd
      .mapPartitions(it => Iterator.single(it.size.toLong)).collect()
    val offsets = partCounts.scanLeft(0L)(_ + _)
    val keepIx = keep.map(pinned.schema.fieldIndex)
    val schema = org.apache.spark.sql.types.StructType(
      keepIx.map(pinned.schema(_)) :+
        org.apache.spark.sql.types.StructField("rank",
          org.apache.spark.sql.types.LongType, nullable = false))
    val rdd = pinned.rdd.mapPartitionsWithIndex { (pi, it) =>
      var r = offsets(pi)
      it.map { row =>
        val out = org.apache.spark.sql.Row.fromSeq(
          keepIx.map(row.get) :+ r)
        r += 1
        out
      }
    }
    spark.createDataFrame(rdd, schema)
  }

  /** PER-GROUP rank in (id ASC) order — the grouped variant of
    * [[globalRankDesc]]'s two-pass distributed scan. A
    * `ROW_NUMBER() OVER (PARTITION BY group ORDER BY id)` puts each whole
    * group on ONE task; with a handful of groups (languages, sources)
    * over a corpus that is a single-core sort of the corpus's biggest
    * slice. Here the data range-partitions on (group, id) — a group
    * spans many partitions — per-partition per-group counts come to the
    * driver (bounded: partitions × groups — built for LOW-cardinality
    * group keys like languages or sources; a millions-of-groups rank,
    * e.g. per-domain, wants the plain partitioned window instead, where
    * the group count itself supplies the parallelism), and a second pass
    * assigns running ranks from the per-(partition, group) offsets. Rank
    * is
    * 1-based, a pure function of the data on any cluster shape (the
    * (group, id) key is unique because ids are). Returns (g, id, rk). */
  def groupRankAsc(df: DataFrame, groupCol: String,
      idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val sorted = df
      .select(col(groupCol).cast("string").as("g"),
        col(idCol).cast("long").as("id"))
      .repartitionByRange(col("g"), col("id"))
      .sortWithinPartitions(col("g"), col("id"))
      .localCheckpoint(true)
    val ds = sorted.as[(String, Long)]
    val partCounts: Array[Seq[(String, Long)]] = ds
      .mapPartitions { it =>
        val m = scala.collection.mutable.LinkedHashMap.empty[String, Long]
        it.foreach { case (g, _) => m.update(g, m.getOrElse(g, 0L) + 1L) }
        Iterator.single(m.toSeq)
      }.collect()
    val offsets: Array[Map[String, Long]] = partCounts
      .scanLeft(Map.empty[String, Long]) { (acc, cs) =>
        cs.foldLeft(acc) { case (a, (g, c)) =>
          a.updated(g, a.getOrElse(g, 0L) + c)
        }
      }.dropRight(1)
    val rdd = ds.rdd.mapPartitionsWithIndex { (pi, it) =>
      val run = scala.collection.mutable.HashMap.empty[String, Long]
      offsets(pi).foreach { case (g, c) => run.update(g, c) }
      it.map { case (g, id) =>
        val r = run.getOrElse(g, 0L) + 1L
        run.update(g, r)
        (g, id, r)
      }
    }
    spark.createDataFrame(rdd).toDF("g", "id", "rk")
  }

  /** Per-sequence packing stats for context length L: which docs land in
    * which fixed-length sequence (a doc spanning a boundary counts in
    * every sequence it touches). Exact integers — oracle-friendly. */
  def packStats(docs: DataFrame, contextLen: Int, idCol: String = "doc_id",
      nTokCol: String = "n_tokens"): DataFrame = {
    val offs = tokenOffsets(docs, idCol, nTokCol).filter(col("n") > 0)
    offs.select(col("id"),
        explode(sequence(expr(s"tok_start div $contextLen"),
          expr(s"(tok_start + n - 1) div $contextLen"))).as("seq_id"))
      .groupBy(col("seq_id")).agg(count(lit(1)).as("n_docs"))
  }

  /** Concat-and-chop over the ACTUAL token ids ([[packStats]] stops at
    * per-sequence doc counts): documents' id streams concatenate in
    * ascending doc-id order and chop into `seqLen`-token training
    * sequences — the materialization step between a tokenizer's streams
    * and the binary shards a trainer memory-maps (sequence `k` =
    * global token positions `[k·seqLen, (k+1)·seqLen)`; a document can
    * span a boundary; the final sequence may be partial — the trainer's
    * drop-last decision belongs to the caller, so it is emitted).
    *
    * Scale: the global order arrives via [[tokenOffsets]]' two-pass
    * distributed prefix sum over token COUNTS (never a single-task
    * window), offsets join back doc-count-sized, global positions are
    * map-side arithmetic on one posexplode, and the one shuffle groups
    * by `seq_id` with per-group state bounded at `seqLen` ids. The
    * input is lazily checkpointed — the offset pass and the pack pass
    * would otherwise each recompute the upstream tokenization.
    *
    * `eodId`: GPT-family END-OF-DOCUMENT insertion — when set, every
    * document's stream is followed by one `eodId` token (the
    * `<|endoftext|>` separator production packing interleaves between
    * documents, Radford et al. 2019 §2), so each doc contributes n+1
    * tokens to the global stream; pure map-side arithmetic absorbed
    * BEFORE the offset pass, so offsets, chop and spans all account
    * for the separator by construction. The separator id is the
    * caller's (conventionally vocabSize — the appended special token);
    * a zero-token document still contributes its separator. */
  def packTokenIds(docs: DataFrame, seqLen: Int, idCol: String = "doc_id",
      idsCol: String = "ids", eodId: Option[Long] = None): DataFrame = {
    require(seqLen >= 1, "need a positive sequence length")
    val pinned = docs
      .select(col(idCol).cast("long").as("id"),
        withEod(col(idsCol), eodId).as("_ids"))
      .localCheckpoint(false)
    val offs = tokenOffsets(
      pinned.select(col("id"), size(col("_ids")).cast("long").as("n")),
      "id", "n")
    packIdsFromOffsets(pinned, offs, seqLen)
  }

  /** One `eodId` token appended to a doc's id stream ([[packTokenIds]]'
    * separator contract) — the ONE copy the batch packers and the
    * streaming twin ([[graft.streaming.EventStreams.packStream]])
    * share. */
  private[graft] def withEod(ids: Column, eodId: Option[Long]): Column =
    eodId.map(e => concat(ids, array(lit(e)))).getOrElse(ids)

  private def packIdsFromOffsets(pinned: DataFrame, offs: DataFrame,
      seqLen: Int): DataFrame =
    pinned.join(offs.select(col("id"), col("tok_start")), "id")
      .select(col("tok_start"), posexplode(col("_ids")).as(Seq("p", "tok")))
      .select((col("tok_start") + col("p")).as("gpos"), col("tok"))
      .withColumn("seq_id", expr(s"gpos div $seqLen"))
      .groupBy(col("seq_id"))
      .agg(sort_array(collect_list(struct(col("gpos"), col("tok"))))
        .as("arr"))
      .select(col("seq_id"),
        transform(col("arr"), x => x.getField("tok")).as("ids"))

  /** [[packTokenIds]] PLUS the document-boundary metadata a training
    * loader needs to reset attention masks and position ids across
    * document boundaries: per sequence, `segs` —
    * array<struct<doc_id, start, len>> of the source-document spans
    * inside that sequence, ascending by `start` and tiling the sequence
    * exactly (a doc that spans a chop boundary contributes one clipped
    * span per sequence it touches). Without these spans a packed
    * artifact trains with cross-document attention bleed — this is the
    * difference between "shaped like training data" and training data.
    *
    * Scale: the spans come from the [[tokenOffsets]] frame alone —
    * doc-count-sized arithmetic (one explode per touched sequence, one
    * seq_id shuffle whose groups are bounded by docs-per-sequence) —
    * the token stream is never re-exploded for metadata; the offsets
    * frame is pinned once and feeds both the id pack and the spans.
    *
    * `eodId` as in [[packTokenIds]]: each document's span then covers
    * its n+1 tokens INCLUDING its trailing separator (the GPT loader
    * convention — attention resets after `<|endoftext|>`, so the
    * separator belongs to the document it closes), and the spans still
    * tile every sequence exactly. */
  def packTokenIdsWithBoundaries(docs: DataFrame, seqLen: Int,
      idCol: String = "doc_id", idsCol: String = "ids",
      eodId: Option[Long] = None): DataFrame = {
    require(seqLen >= 1, "need a positive sequence length")
    val pinned = docs
      .select(col(idCol).cast("long").as("id"),
        withEod(col(idsCol), eodId).as("_ids"))
      .localCheckpoint(false)
    val offs = tokenOffsets(
      pinned.select(col("id"), size(col("_ids")).cast("long").as("n")),
      "id", "n")
      .localCheckpoint(false) // feeds BOTH the id pack and the spans
    val L = lit(seqLen.toLong)
    val segs = offs.filter(col("n") > 0)
      .select(col("id"), col("tok_start"), col("n"),
        explode(sequence(expr(s"tok_start div $seqLen"),
          expr(s"(tok_start + n - 1) div $seqLen"))).as("seq_id"))
      .select(col("seq_id"), struct(
          greatest(col("tok_start") - col("seq_id") * L, lit(0L))
            .cast("int").as("start"),
          col("id").as("doc_id"),
          (least(col("tok_start") + col("n"), (col("seq_id") + 1) * L)
            - greatest(col("tok_start"), col("seq_id") * L))
            .cast("int").as("len")).as("sg"))
      .groupBy(col("seq_id"))
      .agg(sort_array(collect_list(col("sg"))).as("arr"))
      .select(col("seq_id"), transform(col("arr"),
        x => struct(x.getField("doc_id").as("doc_id"),
          x.getField("start").as("start"),
          x.getField("len").as("len"))).as("segs"))
    packIdsFromOffsets(pinned, offs, seqLen).join(segs, "seq_id")
  }

  /** The "fewer truncations" pre-pass (Ding et al. 2024's best-fit
    * packing setup): only documents LONGER than the bin capacity are
    * ever split — into capacity-sized pieces — everything else stays
    * whole. Returns (id, chunk, len), chunk 0-based; pure map-side
    * explode, no shuffle. */
  def chopToCapacity(docs: DataFrame, capacity: Int,
      idCol: String = "doc_id", nCol: String = "n_tokens"): DataFrame = {
    require(capacity >= 1, "need a positive bin capacity")
    docs.select(col(idCol).cast("long").as("id"),
        col(nCol).cast("long").as("n"))
      .filter(col("n") > 0)
      .select(col("id"), col("n"),
        explode(sequence(lit(0L), expr(s"(n - 1) div $capacity")))
          .as("chunk"))
      .select(col("id"), col("chunk"),
        least(col("n") - col("chunk") * capacity, lit(capacity.toLong))
          .as("len"))
  }

  /** Truncation-minimizing document packing: whole documents (pieces)
    * into fixed-capacity bins, docs never split — the complement of
    * [[packTokenIds]]'s concat-and-chop (zero waste, ~1 split per
    * sequence boundary) on the other end of the waste/split trade-off
    * (zero splits, some per-bin waste).
    *
    * The algorithm is NEXT-FIT-DECREASING, and deliberately so: its bin
    * choice for the r-th piece of a length run is a CLOSED FORM of
    * (run, r) given the length histogram — first-fit-decreasing's
    * backfill of earlier bins' leftover gaps needs sequential state
    * over the whole bin list, which neither distributes nor replays as
    * a deterministic function of the ranked prefix. NFD trades a
    * bounded amount of extra waste for that determinism (it is the
    * distributed-replayable member of the decreasing family).
    *
    * Scale: the only driver-side object is the LENGTH HISTOGRAM —
    * bounded by `capacity` distinct values regardless of corpus size
    * (the vocab-collect precedent); the per-length plan broadcasts;
    * ranks within each length run come from [[groupRankAsc]]'s two-pass
    * distributed scan (≤ `capacity` groups — exactly its documented
    * low-cardinality design point); assignment is one broadcast join +
    * integer arithmetic. Requires unique (id, chunk) keys and piece
    * lengths in [1, capacity] ([[chopToCapacity]] guarantees both).
    * Returns (id, chunk, len, bin), bins 0-based and dense. */
  def binPackPieces(pieces: DataFrame, capacity: Int): DataFrame = {
    require(capacity >= 1, "need a positive bin capacity")
    val spark = pieces.sparkSession
    import spark.implicits._
    val p = pieces.select(col("id").cast("long").as("id"),
        col("chunk").cast("long").as("chunk"),
        col("len").cast("long").as("len"))
      .localCheckpoint(false) // feeds histogram, rank AND the join back
    val bounds = p.agg(max(col("chunk")).as("mc"), max(col("id")).as("mi"),
      min(col("len")).as("ml"), max(col("len")).as("xl"),
      min(col("chunk")).as("nc"), min(col("id")).as("ni")).head()
    if (!bounds.isNullAt(0)) {
      require(bounds.getLong(2) >= 1L && bounds.getLong(3) <= capacity,
        s"piece lengths must lie in [1, $capacity] — chop oversized " +
          "docs first (chopToCapacity)")
      // BOTH bounds on both fields: a negative chunk would alias the
      // previous id's top chunk in the composite key (0*2^20+1048575
      // == 1*2^20-1) and silently fan out the rank join
      require(bounds.getLong(4) >= 0L && bounds.getLong(0) < (1L << 20) &&
          bounds.getLong(5) >= 0L &&
          bounds.getLong(1) <= (Long.MaxValue >> 21),
        "composite (id, chunk) rank key needs 0 <= chunk < 2^20 and " +
          "0 <= id < 2^43")
    }
    // the length histogram: ≤ `capacity` rows by the bound above
    val hist = p.groupBy(col("len")).agg(count(lit(1)).as("k"))
      .as[(Long, Long)].collect().sortBy(-_._1)
    // the NFD plan, one row per length run: pieces ranked r (1-based,
    // by (id, chunk) within the run) land in first_bin while r <=
    // in_first (the open bin's remainder), then fill fresh bins
    // per_bin at a time — the exact recursion the SQL oracle replays
    var curBin = 0L
    var rem = capacity.toLong
    val plan = hist.map { case (l, k) =>
      val f = math.min(k, rem / l)
      val rest = k - f
      val perBin = capacity.toLong / l
      val row = (l, curBin, f, curBin + 1L, perBin)
      if (rest > 0) {
        val nBins = (rest + perBin - 1) / perBin
        curBin += nBins
        rem = capacity.toLong - (rest - (nBins - 1) * perBin) * l
      } else rem -= f * l
      row
    }
    val planDf = broadcast(spark.createDataset(plan.toSeq)
      .toDF("len", "first_bin", "in_first", "next_bin", "per_bin"))
    val withPid = p.withColumn("pid",
      col("id") * lit(1L << 20) + col("chunk"))
    val ranked = groupRankAsc(
        withPid.select(col("len").as("g"), col("pid")), "g", "pid")
      .select(col("id").as("pid"), col("rk"))
    withPid.join(ranked, "pid")
      .join(planDf, "len")
      .select(col("id"), col("chunk"), col("len"),
        when(col("rk") <= col("in_first"), col("first_bin"))
          .otherwise(expr("next_bin + (rk - in_first - 1) div per_bin"))
          .as("bin"))
  }

  /** [[chopToCapacity]] + [[binPackPieces]]: the full
    * truncation-minimizing packer over (id, token count) rows. */
  def binPackDocs(docs: DataFrame, capacity: Int,
      idCol: String = "doc_id", nCol: String = "n_tokens"): DataFrame =
    binPackPieces(chopToCapacity(docs, capacity, idCol, nCol), capacity)

  /** Deterministic seeded EPOCH SHUFFLE — the Megatron `shuffle_idx`
    * artifact: a loader-consumable permutation of the training
    * sequences, reproducible from (data, seed) alone so every data-
    * parallel rank materializes the identical epoch order. Returns
    * (pos, id): `pos` is the sample's 0-based position in the shuffled
    * epoch.
    *
    * The permutation key is md5(seed:id) — ASCII hex, where Spark's
    * UTF-8 binary string order, any engine's byte order and plain
    * lexicographic order all agree (ties, were a collision ever to
    * happen, break on id). Rank is the shared [[rankScan]] two-pass
    * distributed scan on ascending (key, id) — never a single-task
    * window; same seed → same bytes on any cluster shape. */
  def epochShuffle(df: DataFrame, seed: Long,
      idCol: String = "id"): DataFrame =
    rankScan(
      df.select(
          md5(concat(lit(seed.toString), lit(":"),
            col(idCol).cast("long").cast("string"))).as("h"),
          col(idCol).cast("long").as("id"))
        .repartitionByRange(col("h"), col("id"))
        .sortWithinPartitions(col("h"), col("id")),
      keep = Seq("id"))
      .select(col("rank").as("pos"), col("id"))

  /** The Megatron `sample_idx` artifact — the heaviest precomputable
    * loader table (the strided map the public Megatron-LM
    * `gpt_dataset.py` `_build_sample_idx` builds on first touch): for
    * every training sample k, WHERE in the multi-epoch concatenated
    * token stream it starts — `(sample, doc_index, doc_id, doc_offset)`
    * with `doc_index` the document's 0-based position in the multi-epoch
    * order (the `doc_idx` coordinate a loader indexes with) and
    * `doc_offset` the token offset inside that document. Megatron's read
    * convention: sample k spans tokens `[k·seqLen, k·seqLen + seqLen]`
    * (seqLen+1 tokens — inputs plus the shifted labels), so consecutive
    * samples overlap by exactly one token and each sample ADVANCES
    * seqLen — sample k's start is the closed form `k·seqLen`, which is
    * what makes this distributable at all. Rows run 0..num_samples
    * INCLUSIVE, `num_samples = (epochs·totalTokens − 1) div seqLen` —
    * the last row is Megatron's end sentinel, built by the same rule.
    *
    * Document order: `epochs` concatenated epochs, each epoch's docs
    * permuted by the seeded md5 rank `md5(seed:epoch:id)` (ties on id —
    * the [[epochShuffle]] key convention, Megatron's per-epoch
    * document shuffle re-expressed as a pure function of (data, seed)).
    * Zero-token documents are excluded before ordering (they contribute
    * nothing to the stream; Megatron asserts sizes > 0 the same way).
    *
    * Scale: one combined two-pass distributed scan over the epoch-doc
    * frame (per-partition (count, tokenSum) to the driver, then running
    * (doc_index, tok_start) — the [[tokenOffsets]]/[[rankScan]] shape,
    * fused so the rank and the prefix sum share one sort); each doc
    * then EMITS the samples that start inside it via one bounded
    * `sequence` explode — never a per-sample loop, never a single-task
    * window. Output size is samples+1 rows — the artifact itself. */
  def sampleIdx(docs: DataFrame, seqLen: Int, epochs: Int, seed: Long,
      idCol: String = "doc_id", nCol: String = "n_tokens"): DataFrame = {
    require(seqLen >= 1, "need a positive sequence length")
    val L = seqLen.toLong
    epochDocScan(docs, epochs, seed, idCol, nCol)
      // the samples starting inside this doc: k·L in [tok_start,
      // tok_start + n) — a doc fully inside one sample emits none
      .select(col("id"), col("doc_index"), col("tok_start"),
        expr(s"(tok_start + ${L - 1}) div $L").as("k0"),
        expr(s"(tok_start + n - 1) div $L").as("k1"))
      .filter(col("k0") <= col("k1"))
      .select(explode(sequence(col("k0"), col("k1"))).as("sample"),
        col("doc_index"), col("id").as("doc_id"),
        col("tok_start"))
      .select(col("sample"), col("doc_index"), col("doc_id"),
        (col("sample") * L - col("tok_start")).as("doc_offset"))
  }

  /** The Megatron `doc_idx` artifact — the multi-epoch shuffled
    * DOCUMENT ORDER itself, (doc_index, doc_id, n_tokens, tok_start):
    * the table [[sampleIdx]]'s doc_index coordinates index into, and
    * the third loader `.npy` alongside sample_idx and shuffle_idx
    * (Megatron persists `{prefix}_doc_idx.npy` the same way). Same
    * order contract as [[sampleIdx]] — epochs concatenated, each
    * epoch's docs permuted by md5(seed:epoch:id), zero-token docs
    * excluded. */
  def epochDocOrder(docs: DataFrame, epochs: Int, seed: Long,
      idCol: String = "doc_id", nCol: String = "n_tokens"): DataFrame =
    epochDocScan(docs, epochs, seed, idCol, nCol)
      .select(col("doc_index"), col("id").as("doc_id"), col("n"),
        col("tok_start"))

  /** The ONE copy of the fused multi-epoch scan [[sampleIdx]] and
    * [[epochDocOrder]] share: (epoch, md5 rank, id) sort, then ONE
    * two-pass distributed scan emitting both the global doc_index
    * (row rank) and tok_start (token prefix sum) — the [[rankScan]]/
    * [[tokenOffsets]] machinery fused so the rank and the sum pay one
    * sort. Returns (id, n, doc_index, tok_start). */
  private def epochDocScan(docs: DataFrame, epochs: Int, seed: Long,
      idCol: String, nCol: String): DataFrame = {
    require(epochs >= 1, "need a positive epoch count")
    val spark = docs.sparkSession
    val pinned = docs
      .select(col(idCol).cast("long").as("id"),
        col(nCol).cast("long").as("n"))
      .filter(col("n") > 0)
      .crossJoin(spark.range(epochs.toLong).toDF("epoch"))
      .select(col("epoch"),
        md5(concat_ws(":", lit(seed.toString),
          col("epoch").cast("string"), col("id").cast("string"))).as("h"),
        col("id"), col("n"))
      .repartitionByRange(col("epoch"), col("h"), col("id"))
      .sortWithinPartitions(col("epoch"), col("h"), col("id"))
      .localCheckpoint(true)
    val stats = pinned.rdd.mapPartitions { it =>
      var c = 0L; var s = 0L
      it.foreach { r => c += 1L; s += r.getLong(3) }
      Iterator.single((c, s))
    }.collect()
    val cOff = stats.map(_._1).scanLeft(0L)(_ + _)
    val sOff = stats.map(_._2).scanLeft(0L)(_ + _)
    val rdd = pinned.rdd.mapPartitionsWithIndex { (pi, it) =>
      var di = cOff(pi); var ts = sOff(pi)
      it.map { r =>
        val n = r.getLong(3)
        val out = (r.getLong(2), n, di, ts)
        di += 1L; ts += n
        out
      }
    }
    spark.createDataFrame(rdd).toDF("id", "n", "doc_index", "tok_start")
  }
}
