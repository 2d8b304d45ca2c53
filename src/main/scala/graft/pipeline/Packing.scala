package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
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
      nCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val sorted = df
      .select(col(nCol).cast("long").as("n"), col(idCol).cast("long").as("id"))
      .repartitionByRange(col("n").desc, col("id"))
      .sortWithinPartitions(col("n").desc, col("id"))
      .localCheckpoint(true)
    val ds = sorted.as[(Long, Long)]
    val partCounts = ds
      .mapPartitions(it => Iterator.single(it.size.toLong)).collect()
    val offsets = partCounts.scanLeft(0L)(_ + _)
    val rdd = ds.rdd.mapPartitionsWithIndex { (pi, it) =>
      var r = offsets(pi)
      it.map { case (n, id) => val my = r; r += 1; (id, n, my) }
    }
    spark.createDataFrame(rdd).toDF("id", "n", "rank")
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
    * would otherwise each recompute the upstream tokenization. */
  def packTokenIds(docs: DataFrame, seqLen: Int, idCol: String = "doc_id",
      idsCol: String = "ids"): DataFrame = {
    require(seqLen >= 1, "need a positive sequence length")
    val pinned = docs
      .select(col(idCol).cast("long").as("id"), col(idsCol).as("_ids"))
      .localCheckpoint(false)
    val offs = tokenOffsets(
      pinned.select(col("id"), size(col("_ids")).cast("long").as("n")),
      "id", "n")
    packIdsFromOffsets(pinned, offs, seqLen)
  }

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
    * frame is pinned once and feeds both the id pack and the spans. */
  def packTokenIdsWithBoundaries(docs: DataFrame, seqLen: Int,
      idCol: String = "doc_id", idsCol: String = "ids"): DataFrame = {
    require(seqLen >= 1, "need a positive sequence length")
    val pinned = docs
      .select(col(idCol).cast("long").as("id"), col(idsCol).as("_ids"))
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
}
