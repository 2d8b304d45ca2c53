package graft.streaming

import graft.SparkSpec
import graft.util.Tables
import org.apache.spark.sql.functions._

class StreamingSpec extends SparkSpec {

  test("streaming hourly agg (watermark + memory sink) matches batch mode") {
    val q = EventStreams.runHourlyAggStream(spark, sfTiny, "hourly_smoke")
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.sql(
      "SELECT * FROM hourly_smoke ORDER BY hour_start, event_type").collect()
    val batch = EventStreams.hourlyAgg(Tables.eventsWithTs(spark, sfTiny))
      .orderBy(col("hour_start"), col("event_type")).collect()
    assert(streamed.length === batch.length)
    assert(streamed.map(_.toSeq).toSeq === batch.map(_.toSeq).toSeq)
  }

  test("streaming dedup (dropDuplicatesWithinWatermark) matches batch") {
    val q = EventStreams.runDedupStream(spark, sfTiny, "dedup_smoke")
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.sql(
      "SELECT * FROM dedup_smoke ORDER BY user_id").collect()
    val batch = EventStreams.dedupCounts(Tables.eventsWithTs(spark, sfTiny))
      .orderBy(col("user_id")).collect()
    assert(streamed.length === batch.length)
    assert(streamed.map(_.toSeq).toSeq === batch.map(_.toSeq).toSeq)
  }

  test("streaming hourly distinct users (chained dedup->agg) matches batch") {
    val q = EventStreams.runHourlyUsersStream(spark, sfTiny, "husers_smoke")
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.sql(
      "SELECT * FROM husers_smoke ORDER BY hour_start").collect()
    val batch = EventStreams
      .hourlyActiveUsers(Tables.eventsWithTs(spark, sfTiny))
      .orderBy(col("hour_start")).collect()
    assert(streamed.nonEmpty)
    assert(streamed.length === batch.length)
    assert(streamed.map(_.toSeq).toSeq === batch.map(_.toSeq).toSeq)
  }

  test("stream-stream attribution join matches the batch interval join") {
    val q = EventStreams.runAttributionStream(spark, sfTiny, "attr_smoke")
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.sql(
      "SELECT * FROM attr_smoke ORDER BY purchase_id, view_id").collect()
    val batch = EventStreams
      .attributionPairs(Tables.eventsWithTs(spark, sfTiny))
      .orderBy(col("purchase_id"), col("view_id")).collect()
    assert(streamed.length === batch.length)
    assert(streamed.map(_.toSeq).toSeq === batch.map(_.toSeq).toSeq)
  }

  test("streaming sliding-window agg matches batch; 2 windows per event") {
    val q = EventStreams.runSlidingAggStream(spark, sfTiny, "sliding_smoke")
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.sql(
      "SELECT * FROM sliding_smoke ORDER BY win_start, event_type").collect()
    val batch = EventStreams.slidingAgg(Tables.eventsWithTs(spark, sfTiny))
      .orderBy(col("win_start"), col("event_type")).collect()
    assert(streamed.length === batch.length)
    assert(streamed.map(_.toSeq).toSeq === batch.map(_.toSeq).toSeq)
    // window = 2x slide: total windowed events = 2x raw events
    val nRaw = Tables.events(spark, sfTiny).count()
    assert(batch.map(_.getLong(2)).sum === 2 * nRaw)
  }

  test("stream-static nation enrichment matches batch; dim side broadcast") {
    val q = EventStreams.runNationEnrichmentStream(spark, sfTiny, "enrich_smoke")
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.sql(
      "SELECT * FROM enrich_smoke ORDER BY nation").collect()
    val batch = EventStreams.nationEnrichment(Tables.events(spark, sfTiny),
        Tables.customer(spark, sfTiny), Tables.nation(spark, sfTiny))
      .orderBy(col("nation")).collect()
    assert(streamed.length === batch.length)
    assert(streamed.map(_.toSeq).toSeq === batch.map(_.toSeq).toSeq)
    assert(streamed.nonEmpty)
    // the static dim must ride a broadcast join — no shuffle of the stream
    val plan = EventStreams.nationEnrichment(Tables.events(spark, sfTiny),
        Tables.customer(spark, sfTiny), Tables.nation(spark, sfTiny))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
  }

  test("streaming CEP funnel (flatMapGroupsWithState) matches batch") {
    val q = EventStreams.runFunnelStream(spark, sfTiny, "funnel_smoke")
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.sql(
      "SELECT * FROM funnel_smoke ORDER BY user_id").collect()
    val batch = EventStreams
      .funnelConversions(Tables.eventsWithTs(spark, sfTiny))
      .orderBy(col("user_id")).collect()
    assert(batch.nonEmpty) // the pattern must actually fire on the data
    assert(streamed.length === batch.length)
    assert(streamed.map(_.toSeq).toSeq === batch.map(_.toSeq).toSeq)
    // the state machine on a BATCH frame (no timeout registration there)
    // agrees with the window formulation too
    val viaState = EventStreams
      .funnelStream(Tables.eventsWithTs(spark, sfTiny), withTimeout = false)
      .orderBy(col("user_id")).collect()
    assert(viaState.map(_.toSeq).toSeq === batch.map(_.toSeq).toSeq)
  }

  test("funnel survives a group arriving far behind the watermark") {
    // Contract pinned here: flatMapGroupsWithState with EventTimeTimeout
    // filters watermark-late rows BEFORE the state function, so a user
    // whose events are all >1h behind the watermark is silently dropped
    // (no emit) and the query keeps running. The clamp in funnelStream's
    // setTimeoutTimestamp additionally guards the configuration where
    // late-filtering uses the PREVIOUS batch's watermark (multi-stateful-
    // operator mode): a row admitted under the old watermark while the
    // current one jumped >1h ahead would otherwise register a timeout
    // at-or-before the watermark — an IllegalArgumentException that kills
    // the query.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, java.sql.Timestamp, Long, String)]
    def ts(h: Long) = new java.sql.Timestamp(h * 3600 * 1000L)
    val q = EventStreams.funnelStream(
        in.toDF.toDF("user_id", "ts_utc", "event_id", "event_type")
          .withWatermark("ts_utc", "2 hours"))
      .writeStream.outputMode("append").format("memory")
      .queryName("funnel_late").start()
    try {
      // batch 1: user 1 converts at hour 1000 → watermark advances to ~998h
      in.addData((1L, ts(1000), 1L, "view"), (1L, ts(1000), 2L, "view"),
        (1L, ts(1000), 3L, "view"), (1L, ts(1001), 4L, "purchase"))
      q.processAllAvailable()
      // batch 2: user 2's events are ~997h behind the watermark — dropped
      // as late data; the query must NOT die
      in.addData((2L, ts(1), 10L, "view"), (2L, ts(1), 11L, "view"),
        (2L, ts(1), 12L, "view"), (2L, ts(2), 13L, "purchase"))
      q.processAllAvailable()
      // batch 3: a fresh on-time user still converts after the late batch
      in.addData((3L, ts(1002), 20L, "view"), (3L, ts(1002), 21L, "view"),
        (3L, ts(1002), 22L, "view"), (3L, ts(1003), 23L, "purchase"))
      q.processAllAvailable()
      assert(q.exception.isEmpty)
    } finally q.stop()
    val rows = spark.sql(
      "SELECT user_id, purchase_id FROM funnel_late ORDER BY user_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(rows === Seq((1L, 4L), (3L, 23L)))
  }

  test("streaming content dedup keeps exactly the batch keep-first set") {
    val q = EventStreams.runContentDedupStream(spark, sfTiny, "cdedup_smoke")
    try q.processAllAvailable() finally q.stop()
    // single-file source => arrival order == doc_id order, so first-arrival
    // survivors must equal the batch min-doc_id survivors
    val streamed = spark.sql(
      "SELECT doc_id FROM cdedup_smoke ORDER BY doc_id").collect()
      .map(_.getLong(0)).toSeq
    val batch = EventStreams.contentKeepFirst(Tables.documents(spark, sfTiny))
      .orderBy(col("keep_id")).collect().map(_.getLong(0)).toSeq
    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }

  test("streaming tokenize-at-ingest equals the batch dictionary join " +
    "(real readStream run)") {
    val batchDocs = Tables.documents(spark, sfTiny)
    val model = graft.queries.PipelineQueries.bpeShared(spark, sfTiny)
    val docs = spark.readStream
      .schema(batchDocs.schema)
      .option("pathGlobFilter", "documents.parquet")
      .parquet(sfTiny)
    val q = EventStreams.tokenizeStream(docs, model.merges)
      .writeStream.outputMode("append").format("memory")
      .queryName("tok_ingest_smoke").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.sql(
        "SELECT doc_id, n_words, n_bpe_tokens FROM tok_ingest_smoke")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // the per-row merge-fold path must equal the batch vocabulary join
    // exactly — same counts, same doc set
    val batch = graft.pipeline.Bpe.encodeTokenCounts(batchDocs, model)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamed == batch,
      s"stream/batch tokenize diverge: only-stream=${streamed -- batch}, " +
        s"only-batch=${batch -- streamed}")
    assert(streamed.nonEmpty)
  }

  test("streaming byte-BPE tokenize equals the batch guarded-join path " +
    "(real readStream run, multi-byte scripts live)") {
    val batchDocs = Tables.documents(spark, sfTiny)
    val model = graft.queries.PipelineQueries.byteBpeShared(spark, sfTiny)
    val docs = spark.readStream
      .schema(batchDocs.schema)
      .option("pathGlobFilter", "documents.parquet")
      .parquet(sfTiny)
    val q = EventStreams.byteTokenizeStream(docs, model.merges)
      .writeStream.outputMode("append").format("memory")
      .queryName("bb_ingest_smoke").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.sql(
        "SELECT doc_id, n_words, n_bytebpe_tokens FROM bb_ingest_smoke")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val batch = graft.pipeline.ByteBpe.encodeTokenCounts(batchDocs, model)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamed == batch,
      s"stream/batch byte tokenize diverge: " +
        s"only-stream=${streamed -- batch}, only-batch=${batch -- streamed}")
    assert(streamed.nonEmpty)
  }

  test("streaming WordPiece tokenize equals the batch guarded-join path " +
    "(real readStream run, UNK leg live)") {
    val batchDocs = Tables.documents(spark, sfTiny)
    // the no-q model: every q-carrying word in the full corpus exercises
    // the [UNK] whole-word rule through the STREAM
    val model = graft.queries.PipelineQueries.wordpieceShared(spark, sfTiny)
    val docs = spark.readStream
      .schema(batchDocs.schema)
      .option("pathGlobFilter", "documents.parquet")
      .parquet(sfTiny)
    val q = EventStreams.wordpieceTokenizeStream(docs, model.vocab)
      .writeStream.outputMode("append").format("memory")
      .queryName("wp_ingest_smoke").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.sql(
        "SELECT doc_id, n_words, n_wp_tokens, n_unk_words " +
          "FROM wp_ingest_smoke")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    val batch = graft.pipeline.Wordpiece.encodeTokenCounts(batchDocs, model)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(streamed == batch,
      s"stream/batch wordpiece diverge: only-stream=${streamed -- batch}, " +
        s"only-batch=${batch -- streamed}")
    assert(streamed.exists(_._4 > 0), "no UNK word reached the stream — " +
      "the no-q model should leave q-words unmatchable")
  }

  test("tokenizeStream's plan is constant in merge count: a 32k-merge " +
    "production model analyzes and runs (the fold chain could not)") {
    import spark.implicits._
    // 32k synthetic merges that never apply — the point is PLAN size:
    // the rank map rides one broadcast, the plan holds one UDF call
    val merges = (1 to 32768).map(i =>
      graft.pipeline.Bpe.Merge(i, s"x$i", s"y$i", 1L))
    val docs = Seq((1L, "ab cd"), (2L, "e")).toDF("doc_id", "text")
    val out = EventStreams.tokenizeStream(docs, merges)
    val got = out.as[(Long, Long, Long)].collect().toSet
    // no merge applies: every word stays character-split
    assert(got == Set((1L, 2L, 4L), (2L, 1L, 1L)))
    // and a real model at the same plan shape still merges
    val m2 = Seq(graft.pipeline.Bpe.Merge(1, "a", "b", 9L))
    assert(EventStreams.tokenizeStream(docs, m2)
      .as[(Long, Long, Long)].collect().toSet ==
      Set((1L, 2L, 3L), (2L, 1L, 1L)))
  }

  test("streaming count-min sketch: the grid IS the state — a " +
    "multi-batch stream's final grid equals batch over the union") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val q = graft.pipeline.Sketches.cmsBuild(in.toDF.toDF("doc_id", "text"))
      .writeStream.outputMode("complete").format("memory")
      .queryName("cms_stream").start()
    try {
      in.addData((1L, "alpha beta alpha"), (2L, "beta gamma"))
      q.processAllAvailable()
      // counts must ACCUMULATE across micro-batches, not reset
      in.addData((3L, "alpha delta epsilon zeta"))
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.sql("SELECT j, bucket, cnt FROM cms_stream")
      .as[(Int, Long, Long)].collect().toSet
    val batch = graft.pipeline.Sketches.cmsBuild(
        Seq((1L, "alpha beta alpha"), (2L, "beta gamma"),
          (3L, "alpha delta epsilon zeta")).toDF("doc_id", "text"))
      .as[(Int, Long, Long)].collect().toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("pack-at-ingest: the tail carries across micro-batches and the " +
    "multi-batch stream equals batch over the union") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // two sources; doc lengths chosen so a sequence boundary falls
    // MID-batch and the tail of batch 1 completes only in batch 3
    def doc(src: String, id: Long, n: Int): (String, Long, Seq[Long]) =
      (src, id, (0 until n).map(j => id * 100 + j))
    val all = Seq(doc("a", 1, 3), doc("a", 2, 4), doc("b", 3, 5),
      doc("a", 4, 6), doc("b", 5, 2), doc("a", 6, 5), doc("b", 7, 9))
    val in = MemoryStream[(String, Long, Seq[Long])]
    val q = EventStreams.packStream(
        in.toDF.toDF("source", "doc_id", "ids"), seqLen = 5)
      .writeStream.outputMode("append").format("memory")
      .queryName("pack_stream").start()
    try {
      Seq(all.take(2), all.slice(2, 5), all.drop(5)).foreach { chunk =>
        in.addData(chunk: _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    val streamed = spark.sql(
        "SELECT source, seq_idx, ids FROM pack_stream")
      .as[(String, Long, Seq[Long])].collect().toSet
    val batch = EventStreams.packStream(
        all.toDF("source", "doc_id", "ids"), seqLen = 5)
      .as[(String, Long, Seq[Long])].collect().toSet
    assert(streamed == batch,
      "chunked arrival must equal the single-batch chop")
    // reference: per-source concat in doc_id order, full 5-blocks only
    val exp = all.groupBy(_._1).flatMap { case (src, ds) =>
      val toks = ds.sortBy(_._2).flatMap(_._3)
      toks.grouped(5).zipWithIndex.collect {
        case (g, i) if g.size == 5 => (src, i.toLong, g)
      }
    }.toSet
    assert(streamed == exp)
    // the sub-seqLen tails (a: 18 tokens -> 3 seqs + 3-tail; b: 16
    // tokens -> 3 seqs + 1-tail) stay in state, unemitted
    assert(streamed.count(_._1 == "a") == 3)
    assert(streamed.count(_._1 == "b") == 3)
  }

  test("pack-at-ingest drain: the eos sentinel flushes tails (raw or " +
    "EOD-padded) and the chunked stream equals the batch leg") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def doc(src: String, id: Long, n: Int)
        : (String, Long, Seq[Long], Boolean) =
      (src, id, (0 until n).map(j => id * 100 + j), false)
    val data = Seq(doc("a", 1, 3), doc("a", 2, 4), doc("b", 3, 5),
      doc("a", 4, 6), doc("b", 5, 2), doc("a", 6, 5), doc("b", 7, 9))
    val sentinels = Seq(("a", 99L, Seq.empty[Long], true),
      ("b", 99L, Seq.empty[Long], true))
    val all = data ++ sentinels
    def run(df: org.apache.spark.sql.DataFrame) =
      EventStreams.packStream(df, seqLen = 5, eosCol = Some("eos"))
    // chunked arrival, sentinels in the LAST micro-batch
    val in = MemoryStream[(String, Long, Seq[Long], Boolean)]
    val q = run(in.toDF.toDF("source", "doc_id", "ids", "eos"))
      .writeStream.outputMode("append").format("memory")
      .queryName("pack_drain").start()
    try {
      Seq(data.take(4), data.drop(4), sentinels).foreach { chunk =>
        in.addData(chunk: _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    val streamed = spark.sql("SELECT source, seq_idx, ids FROM pack_drain")
      .as[(String, Long, Seq[Long])].collect().toSet
    val batch = run(all.toDF("source", "doc_id", "ids", "eos"))
      .as[(String, Long, Seq[Long])].collect().toSet
    assert(streamed == batch, "chunked drain must equal batch drain")
    // reference: per-source chop INCLUDING the partial tail
    val exp = data.groupBy(_._1).flatMap { case (src, ds) =>
      val toks = ds.sortBy(_._2).flatMap(_._3)
      toks.grouped(5).zipWithIndex.map { case (g, i) => (src, i.toLong, g) }
    }.toSet
    assert(streamed == exp)
    // a has 18 tokens -> 3 full + a 3-token tail; b 16 -> 3 full + 1-tail
    assert(streamed.count(_._1 == "a") == 4)
    assert(streamed.exists(s => s._1 == "b" && s._3.size == 1))
    // EOD-padded drain: every sequence is exactly seqLen, pad slots are
    // the separator, and stripping separators recovers the raw tokens
    val EOD = 7777L
    val padded = EventStreams.packStream(
        all.toDF("source", "doc_id", "ids", "eos"), seqLen = 5,
        eodId = Some(EOD), eosCol = Some("eos"))
      .as[(String, Long, Seq[Long])].collect()
    assert(padded.forall(_._3.size == 5), "drained tails must be padded")
    val rawBack = padded.groupBy(_._1).map { case (src, seqs) =>
      src -> seqs.sortBy(_._2).flatMap(_._3).filter(_ != EOD).toSeq
    }
    data.groupBy(_._1).foreach { case (src, ds) =>
      assert(rawBack(src) == ds.sortBy(_._2).flatMap(_._3),
        s"eod strip did not recover source $src")
    }
  }

  test("drain tombstone: data after a source's sentinel fails loudly " +
    "in batch (same invocation) AND across micro-batches (the " +
    "tombstone-state decode path)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def hasSentinelMsg(t: Throwable): Boolean =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(10)
        .exists(e => Option(e.getMessage)
          .exists(_.contains("end-of-stream sentinel")))
    // batch: a row sorting after the sentinel violates the contract
    val bad = Seq(("a", 1L, Seq(1L, 2L), false),
      ("a", 2L, Seq.empty[Long], true),
      ("a", 3L, Seq(3L), false))
    val be = intercept[Throwable] {
      EventStreams.packStream(bad.toDF("source", "doc_id", "ids", "eos"),
        seqLen = 5, eosCol = Some("eos")).collect()
    }
    assert(hasSentinelMsg(be), s"batch late-data error lost its name: $be")
    // stream: drain in batch 1, late data in batch 2 — the decode of
    // the PERSISTED tombstone (negative nextSeq) must reject it
    val in = MemoryStream[(String, Long, Seq[Long], Boolean)]
    val q = EventStreams.packStream(
        in.toDF.toDF("source", "doc_id", "ids", "eos"),
        seqLen = 5, eosCol = Some("eos"))
      .writeStream.outputMode("append").format("memory")
      .queryName("pack_tombstone").start()
    try {
      in.addData(("a", 1L, Seq(1L, 2L, 3L, 4L, 5L, 6L), false),
        ("a", 2L, Seq.empty[Long], true))
      q.processAllAvailable()
      // the drain emitted the full sequence AND the 1-token tail
      assert(spark.sql("SELECT COUNT(*) FROM pack_tombstone")
        .head().getLong(0) == 2L)
      in.addData(("a", 9L, Seq(7L), false))
      val se = intercept[Throwable] { q.processAllAvailable() }
      assert(hasSentinelMsg(se),
        s"stream late-data error lost its name: $se")
    } finally q.stop()
  }

  test("content dedup stream is deterministic under adversarial arrival order") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val q = EventStreams.contentDedupStream(in.toDF.toDF("doc_id", "text"))
      .writeStream.outputMode("append").format("memory")
      .queryName("cdedup_order").start()
    try {
      // duplicates arrive HIGHEST doc_id first within the batch: a
      // fetch-order dropDuplicates would keep 30; the contract is min
      in.addData((30L, "same text"), (20L, "same text"),
        (10L, "same text"), (5L, "other"))
      q.processAllAvailable()
      // a later batch re-sending the content emits nothing, even with a
      // smaller doc_id — earliest BATCH wins, min doc_id within it
      in.addData((1L, "same text"), (2L, "third"))
      q.processAllAvailable()
    } finally q.stop()
    val kept = spark.sql("SELECT doc_id FROM cdedup_order ORDER BY doc_id")
      .collect().map(_.getLong(0)).toSeq
    assert(kept === Seq(2L, 5L, 10L))
  }

  test("content dedup is exactly-once across a stop and restart (file sink)") {
    // st06 fidelity beyond the memory sink: a REAL file sink with a
    // checkpointLocation, stopped after one drain and restarted with new
    // input. The flatMapGroupsWithState seen-set lives in the checkpoint's
    // state store, so (a) a fingerprint kept before the stop must NOT
    // re-emit after the restart even when a smaller doc_id arrives, and
    // (b) the sink holds each survivor exactly once — the exactly-once
    // contract of checkpointed sinks across query incarnations.
    import spark.implicits._
    import org.apache.spark.sql.types.{LongType, StringType, StructType}
    val base = java.nio.file.Files.createTempDirectory("graft_restart").toFile
    val src = new java.io.File(base, "src"); src.mkdirs()
    val sink = new java.io.File(base, "sink").getAbsolutePath
    val ckpt = new java.io.File(base, "ckpt").getAbsolutePath
    def writeFile(name: String, rows: Seq[(Long, String)]): Unit =
      java.nio.file.Files.write(new java.io.File(src, name).toPath,
        rows.map { case (id, t) => s"""{"doc_id":$id,"text":"$t"}""" }
          .mkString("\n").getBytes("UTF-8"))
    val schema = new StructType()
      .add("doc_id", LongType).add("text", StringType)
    def drainOnce(): Unit = {
      val docs = spark.readStream.schema(schema).json(src.getAbsolutePath)
      val q = EventStreams.contentDedupStream(docs)
        .writeStream.outputMode("append").format("parquet")
        .option("path", sink).option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      try q.awaitTermination() finally q.stop()
    }
    writeFile("a.json", Seq((10L, "alpha"), (11L, "alpha"), (12L, "beta")))
    drainOnce() // keeps 10 (first alpha) and 12
    writeFile("b.json", Seq((1L, "alpha"), (13L, "gamma")))
    drainOnce() // restart: alpha's state survives -> only 13 is new
    val got = spark.read.parquet(sink).as[Long].collect().sorted.toSeq
    assert(got === Seq(10L, 12L, 13L))
  }

  test("funnel state machine survives TWO restarts with state expiry between") {
    // st09 fidelity across query incarnations: the flatMapGroupsWithState
    // funnel runs as THREE AvailableNow drains of one checkpoint (two real
    // stop/restart boundaries) with the 1 h event-time state expiry firing
    // between them. Contracts proven:
    //   (a) cross-restart state: u1's view count from drain 1 survives the
    //       restart, so the drain-2 purchase converts with 2+1 prior views;
    //   (b) expiry: u2 banks 3 views in drain 1, goes idle past the 1 h
    //       timeout, and their drain-3 purchase must NOT convert (state
    //       removed) — while BATCH over the same events does convert u2,
    //       the documented stream-vs-batch deviation expiry introduces;
    //   (c) exactly-once: the file sink holds each conversion once across
    //       all three incarnations.
    // maxFilesPerTrigger=1 pins one file per micro-batch so drain 3's
    // sentinel batch processes u2's pending timeout BEFORE the purchase
    // arrives, independent of whether a drain ends with a no-data batch.
    import org.apache.spark.sql.types.{LongType, StringType, StructType}
    val base = java.nio.file.Files.createTempDirectory("graft_funnel3").toFile
    val src = new java.io.File(base, "src"); src.mkdirs()
    val sink = new java.io.File(base, "sink").getAbsolutePath
    val ckpt = new java.io.File(base, "ckpt").getAbsolutePath
    var nextFile = 0
    def writeFile(rows: Seq[(Long, Long, String, String)]): Unit = {
      // zero-padded names + mtime spacing: the file source orders by
      // modification time, and the state-expiry narrative needs drain 3's
      // sentinel file strictly before the purchase file
      java.nio.file.Files.write(
        new java.io.File(src, f"ev$nextFile%03d.json").toPath,
        rows.map { case (u, e, t, ts) =>
          s"""{"user_id":$u,"event_id":$e,"event_type":"$t","ts":"$ts"}"""
        }.mkString("\n").getBytes("UTF-8"))
      nextFile += 1
      Thread.sleep(50)
    }
    val schema = new StructType().add("user_id", LongType)
      .add("event_id", LongType).add("event_type", StringType)
      .add("ts", StringType)
    def drainOnce(): Unit = {
      val events = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).json(src.getAbsolutePath)
        .withColumn("ts_utc", to_timestamp(col("ts")))
        .withWatermark("ts_utc", "2 hours")
      val q = EventStreams.funnelStream(events)
        .writeStream.outputMode("append").format("parquet")
        .option("path", sink).option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      try q.awaitTermination() finally q.stop()
    }
    val d = "2026-01-01T"
    // drain 1: u1 banks 2 views, u2 banks 3; sentinel pushes wm to 01:00
    writeFile(Seq(
      (1L, 10L, "view", s"${d}00:00:00"), (1L, 11L, "view", s"${d}00:10:00"),
      (2L, 20L, "view", s"${d}00:00:00"), (2L, 21L, "view", s"${d}00:05:00"),
      (2L, 22L, "view", s"${d}00:10:00"),
      (99L, 90L, "view", s"${d}03:00:00")))
    drainOnce()
    // drain 2 (restart 1): u1's third view + converting purchase (state
    // carried over); u3 banks 3 views at 03:3x (timeout 04:40); sentinel
    // pushes wm to 04:00 — past u2's 01:10 timeout
    writeFile(Seq(
      (1L, 12L, "view", s"${d}01:30:00"),
      (1L, 13L, "purchase", s"${d}01:40:00"),
      (3L, 30L, "view", s"${d}03:30:00"), (3L, 31L, "view", s"${d}03:35:00"),
      (3L, 32L, "view", s"${d}03:40:00"),
      (99L, 91L, "view", s"${d}06:00:00")))
    drainOnce()
    // drain 3 (restart 2): first a sentinel-only batch at wm 04:00 — u2's
    // expired state is removed here — THEN the purchases: u2's must not
    // convert (views lost to expiry), u3's must (timeout 04:40 > wm 04:30)
    writeFile(Seq((99L, 92L, "view", s"${d}06:30:00")))
    writeFile(Seq(
      (2L, 23L, "purchase", s"${d}04:30:00"),
      (3L, 33L, "purchase", s"${d}04:30:00")))
    drainOnce()
    val got = spark.read.parquet(sink)
      .select("user_id", "purchase_id", "n_prior_views")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1).toSeq
    assert(got === Seq((1L, 13L, 3L), (3L, 33L, 3L)),
      "exactly-once cross-restart conversions with u2 expired")
    // batch over the SAME events converts u2 too (no expiry in batch) —
    // streaming equals batch exactly on every user whose activity gaps
    // stay inside the expiry horizon
    val batch = EventStreams.funnelConversions(
        spark.read.schema(schema).json(src.getAbsolutePath)
          .withColumn("ts_utc", to_timestamp(col("ts"))))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1).toSeq
    assert(batch === Seq((1L, 13L, 3L), (2L, 23L, 3L), (3L, 33L, 3L)))
    assert(batch.filterNot(_._1 == 2L) === got)
  }

  test("session counts: every user's sessions <= events, >= 1") {
    import spark.implicits._
    val rows = EventStreams.userSessions(Tables.eventsWithTs(spark, sfTiny))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (s, e) = (r.getAs[Long]("n_sessions"), r.getAs[Long]("n_events"))
      assert(s >= 1 && s <= e)
    }
  }
}
