package graft.streaming

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** st11 — streaming near-dup detection: the flatMapGroupsWithState band
  * index must emit exactly the batch MinHash+LSH pair set, on real data,
  * on crafted duplicates, and across a checkpointed stop/restart whose
  * duplicate pairs straddle the restart boundary. */
class StreamingNearDupSpec extends SparkSpec {
  import spark.implicits._

  private def batchPairs(docs: org.apache.spark.sql.DataFrame) =
    graft.pipeline.Dedup.minhashDedupWords(docs, 5, 128, 2, 0.8)
      .as[(Long, Long, Double)].collect().toSet

  test("stream == batch on the documents table (single drain)") {
    val q = EventStreams.runNearDupStream(spark, sfTiny, "st11_mem")
    try q.awaitTermination() finally q.stop()
    val streamed = spark.table("st11_mem")
      .as[(Long, Long, Double)].collect().toSet // distinct via toSet
    val batch = batchPairs(graft.util.Tables.documents(spark, sfTiny))
    assert(streamed == batch,
      s"stream/batch pair sets diverge: only-stream=" +
        s"${streamed -- batch}, only-batch=${batch -- streamed}")
    assert(streamed.nonEmpty, "fixture produced no near-dup pairs")
  }

  test("LEAN two-stage stream == batch on the documents table, and the " +
    "band stage's state is member-ids-only (lean), not gram sets") {
    val q = EventStreams.runNearDupLeanStream(spark, sfTiny, "st13_mem")
    try q.awaitTermination() finally q.stop()
    val streamed = spark.table("st13_mem")
      .as[(Long, Long, Double)].collect().toSet // consumer-side distinct
    val batch = batchPairs(graft.util.Tables.documents(spark, sfTiny))
    assert(streamed == batch,
      s"lean stream/batch pair sets diverge: only-stream=" +
        s"${streamed -- batch}, only-batch=${batch -- streamed}")
    assert(streamed.nonEmpty, "fixture produced no near-dup pairs")
    // state shape: the flatMapGroupsWithState (band index) holds exactly
    // one row per non-empty (band, bucket) group — the lean claim; the
    // verify data lives in the two join operators instead
    val docs = graft.util.Tables.documents(spark, sfTiny)
    val expectedGroups = graft.pipeline.Dedup
      .wordBandRows(docs, 5, 128, 2)
      .select(col("band"), col("bucket")).distinct().count()
    val ops = q.lastProgress.stateOperators
    val fmgws = ops.filter(_.operatorName.contains("flatMapGroupsWithState"))
    assert(fmgws.map(_.numRowsTotal).sum == expectedGroups,
      s"band-index state rows != (band,bucket) group count: " +
        s"${fmgws.map(_.numRowsTotal).toSeq} vs $expectedGroups")
    // and the join operators are present (the verify hops)
    assert(ops.count(_.operatorName.contains("symmetricHashJoin")) == 2,
      s"expected two stream-stream verify joins, got: " +
        s"${ops.map(_.operatorName).toSeq}")
  }

  test("lean per-doc gram sets stay in lockstep with the band rows' " +
    "ghash derivation") {
    val docs = graft.util.Tables.documents(spark, sfTiny)
    val a = graft.pipeline.Dedup.wordGramHashes(docs, 5)
      .as[(Long, Seq[Long])].collect().toMap
    val b = graft.pipeline.Dedup.wordBandRows(docs, 5, 128, 2)
      .select(col("id"), col("ghash")).distinct()
      .as[(Long, Seq[Long])].collect().toMap
    assert(a == b, "wordGramHashes drifted from wordBandRows' ghash")
  }

  test("LEAN stream survives a checkpointed restart: all three state " +
    "stores (band ids, candidate dedup, verify joins) recover and " +
    "cross-restart pairs emit exactly once") {
    import org.apache.spark.sql.types.{LongType, StringType, StructType}
    val base = java.nio.file.Files.createTempDirectory("graft_st13").toFile
    val src = new java.io.File(base, "src"); src.mkdirs()
    val sink = new java.io.File(base, "sink").getAbsolutePath
    val ckpt = new java.io.File(base, "ckpt").getAbsolutePath
    def text(tag: String): String =
      (0 until 50).map(j => s"$tag$j").mkString(" ")
    val tA = text("alpha"); val tB = text("beta")
    def writeFile(name: String, rows: Seq[(Long, String)]): Unit =
      java.nio.file.Files.write(new java.io.File(src, name).toPath,
        rows.map { case (id, t) => s"""{"doc_id":$id,"text":"$t"}""" }
          .mkString("\n").getBytes("UTF-8"))
    val schema = new StructType()
      .add("doc_id", LongType).add("text", StringType)
    def drainOnce(): Unit = {
      val docs = spark.readStream.schema(schema).json(src.getAbsolutePath)
      val q = EventStreams.nearDupPairsStreamLean(docs)
        .writeStream.outputMode("append").format("parquet")
        .option("path", sink).option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      try q.awaitTermination() finally q.stop()
    }
    // drain 1: in-batch pair (1,2); 3 is the future cross-restart partner
    writeFile("a.json", Seq(
      (1L, tA), (2L, s"$tA x1"), (3L, tB), (4L, text("gamma"))))
    drainOnce()
    // drain 2 (restart): (3,5) straddles the boundary — candidate
    // generation needs the recovered band ids AND the verify joins need
    // doc 3's gram row, which arrived only before the restart (the join
    // state must have buffered it); (6,7) is in-batch after restart; doc
    // 1 is REPLAYED verbatim (topic replay) — its extra gram row must
    // not re-emit pair (1,2): the gram-side dedup caps it
    writeFile("b.json", Seq(
      (1L, tA),
      (5L, s"$tB x2"),
      (6L, text("delta")), (7L, s"${text("delta")} x3"),
      (8L, text("epsi"))))
    drainOnce()
    val streamed = spark.read.parquet(sink)
      .as[(Long, Long, Double)].collect()
    val batch = batchPairs(spark.read.schema(schema)
      .json(src.getAbsolutePath))
    assert(streamed.toSet == batch,
      s"lean cross-restart pair set diverges: only-stream=" +
        s"${streamed.toSet -- batch}, only-batch=${batch -- streamed.toSet}")
    assert(batch.map(p => (p._1, p._2)) == Set((1L, 2L), (3L, 5L), (6L, 7L)),
      s"fixture's planted pair set is off: $batch")
    // the candidate dedup makes emission exactly-once per PAIR (not per
    // bucket): no duplicates even before the consumer-side distinct
    assert(streamed.length == streamed.toSet.size,
      s"lean stream emitted duplicate pair tuples: ${streamed.toSeq}")
    assert(streamed.exists(p => p._1 == 3L && p._2 == 5L),
      "cross-restart near-dup pair lost — lean state did not survive")
  }

  test("band-index state survives a checkpointed restart: cross-restart " +
    "pairs emit exactly once") {
    import org.apache.spark.sql.types.{LongType, StringType, StructType}
    val base = java.nio.file.Files.createTempDirectory("graft_st11").toFile
    val src = new java.io.File(base, "src"); src.mkdirs()
    val sink = new java.io.File(base, "sink").getAbsolutePath
    val ckpt = new java.io.File(base, "ckpt").getAbsolutePath
    // ≥5-token texts; a near-dup = the same text plus one appended token
    // (46 of 47 grams shared → jac 46/47 ≈ 0.979); unique docs draw from
    // doc-tagged vocabularies so no background pair clears 0.8
    def text(tag: String): String =
      (0 until 50).map(j => s"$tag$j").mkString(" ")
    def nearDup(t: String, extra: String): String = s"$t $extra"
    val tA = text("alpha"); val tB = text("beta"); val tC = text("gamma")
    def writeFile(name: String, rows: Seq[(Long, String)]): Unit =
      java.nio.file.Files.write(new java.io.File(src, name).toPath,
        rows.map { case (id, t) => s"""{"doc_id":$id,"text":"$t"}""" }
          .mkString("\n").getBytes("UTF-8"))
    val schema = new StructType()
      .add("doc_id", LongType).add("text", StringType)
    def drainOnce(): Unit = {
      val docs = spark.readStream.schema(schema).json(src.getAbsolutePath)
      val q = EventStreams.nearDupPairsStream(docs)
        .writeStream.outputMode("append").format("parquet")
        .option("path", sink).option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      try q.awaitTermination() finally q.stop()
    }
    // drain 1: an in-batch near-dup pair (1,2) and the future cross-
    // restart partner 3
    writeFile("a.json", Seq(
      (1L, tA), (2L, nearDup(tA, "x1")), (3L, tB), (4L, tC)))
    drainOnce()
    // drain 2 (restart): 5 pairs with 3 ACROSS the restart boundary —
    // only the checkpointed band index can see it; 6~7 pair in-batch;
    // 8 unique
    writeFile("b.json", Seq(
      (5L, nearDup(tB, "x2")),
      (6L, text("delta")), (7L, nearDup(text("delta"), "x3")),
      (8L, text("epsi"))))
    drainOnce()
    val streamed = spark.read.parquet(sink)
      .as[(Long, Long, Double)].collect()
    val distinctPairs = streamed.toSet
    // exactly-once per (pair, bucket) → after distinct, once per pair;
    // the batch twin over the UNION of both files is the contract
    val all = spark.read.schema(schema).json(src.getAbsolutePath)
    val batch = batchPairs(all)
    assert(distinctPairs == batch,
      s"cross-restart pair set diverges: only-stream=" +
        s"${distinctPairs -- batch}, only-batch=${batch -- distinctPairs}")
    assert(batch.map(p => (p._1, p._2)) == Set((1L, 2L), (3L, 5L), (6L, 7L)),
      s"fixture's planted pair set is off: $batch")
    // the cross-restart pair (3,5) proves the state store carried file-a's
    // band members through the stop/restart
    assert(distinctPairs.exists(p => p._1 == 3L && p._2 == 5L),
      "cross-restart near-dup pair lost — band index state did not survive")
  }

  test("horizon-bounded TWO-QUERY lean topology: candidates sink feeds " +
    "the verify query, every state store expires, in-horizon pairs emit") {
    import org.apache.spark.sql.types.{LongType, StringType, StructType,
      TimestampType}
    val base = java.nio.file.Files.createTempDirectory("graft_st13_ttl")
      .toFile
    val src = new java.io.File(base, "src"); src.mkdirs()
    val candDir = new java.io.File(base, "cand"); candDir.mkdirs()
    val candCkpt = new java.io.File(base, "cand_ckpt").getAbsolutePath
    val sink = new java.io.File(base, "sink").getAbsolutePath
    val verCkpt = new java.io.File(base, "ver_ckpt").getAbsolutePath
    def text(tag: String): String =
      (0 until 50).map(j => s"$tag$j").mkString(" ")
    val tA = text("alpha"); val tB = text("beta")
    def writeFile(name: String, rows: Seq[(Long, String, String)]): Unit =
      java.nio.file.Files.write(new java.io.File(src, name).toPath,
        rows.map { case (id, ts, t) =>
          s"""{"doc_id":$id,"ts":"$ts","text":"$t"}"""
        }.mkString("\n").getBytes("UTF-8"))
    val schema = new StructType()
      .add("doc_id", LongType).add("ts", TimestampType)
      .add("text", StringType)
    val candSchema = new StructType()
      .add("id_a", LongType).add("id_b", LongType)
      .add("evt", TimestampType)
    // query 1: band candidates src -> candDir; query 2: candDir + src ->
    // verified pairs. Each drain runs both queries in order (the sink
    // IS the handoff — the topology's whole point).
    def drainOnce(): (Long, Seq[(String, Long)]) = {
      val docs1 = spark.readStream.schema(schema).json(src.getAbsolutePath)
      val q1 = EventStreams
        .nearDupCandidatesStream(docs1, horizon = "1 hour")
        .writeStream.outputMode("append").format("parquet")
        .option("path", candDir.getAbsolutePath)
        .option("checkpointLocation", candCkpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      try q1.awaitTermination() finally q1.stop()
      val cands = spark.readStream.schema(candSchema)
        .parquet(candDir.getAbsolutePath)
      val docs2 = spark.readStream.schema(schema).json(src.getAbsolutePath)
      val q2 = EventStreams
        .nearDupVerifyStream(cands, docs2, horizon = "1 hour")
        .writeStream.outputMode("append").format("parquet")
        .option("path", sink).option("checkpointLocation", verCkpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      try q2.awaitTermination() finally q2.stop()
      (q1.lastProgress.stateOperators.map(_.numRowsTotal).sum,
        q2.lastProgress.stateOperators
          .map(o => (o.operatorName, o.numRowsTotal)).toSeq)
    }
    // the st11 horizon scenario: (1,2) in horizon; 4 advances the
    // watermark past 1/2; 3 duplicates the EXPIRED alpha (no pair);
    // 5 duplicates beta in horizon (pairs with 4)
    writeFile("a.json", Seq(
      (1L, "2026-01-01T10:00:00Z", tA),
      (2L, "2026-01-01T10:30:00Z", s"$tA x1")))
    drainOnce()
    writeFile("b.json", Seq((4L, "2026-01-01T13:00:00Z", tB)))
    val (band2, _) = drainOnce()
    // band state after drain 2 = doc 4's groups only — and each row is a
    // MEMBER-ID entry, the lean claim, carried into the horizon shape
    def groupsOf(rows: (Long, String, String)*): Long =
      graft.pipeline.Dedup.wordBandRows(
          rows.map { case (id, _, t) => (id, t) }.toDF("doc_id", "text"),
          5, 128, 2)
        .select("band", "bucket").distinct().count()
    assert(band2 == groupsOf((4L, "", tB)),
      s"band state after drain 2 = $band2, want doc 4's groups only")
    writeFile("c.json", Seq(
      (3L, "2026-01-01T12:30:00Z", s"$tA x2"),
      (5L, "2026-01-01T13:10:00Z", s"$tB x3")))
    val (band3, ver3) = drainOnce()
    assert(band3 == groupsOf((3L, "", s"$tA x2"), (4L, "", tB),
        (5L, "", s"$tB x3")),
      s"band state after drain 3 = $band3, want live docs 3/4/5 only")
    // the verify query's state is horizon-bounded STORE BY STORE after
    // drain 3 (watermark 12:10): the candidate dedup holds only the live
    // candidate (4,5)@13:10 — (1,2)@10:30 expired — the two gram-side
    // dedups hold the three live docs' (3/4/5) id keys each, and each
    // join store holds at most those gram rows plus the one live
    // candidate; the expired docs' (1, 2) entries have left every store
    val dedupRows = ver3.filter(_._1.contains("dedupe")).map(_._2)
    assert(dedupRows.sorted == Seq(1L, 3L, 3L),
      s"dedup stores after drain 3 hold $dedupRows, want the one live " +
        s"candidate + the two live-doc gram keys (ops: $ver3)")
    val joinRows = ver3.filter(_._1.contains("symmetricHashJoin")).map(_._2)
    assert(joinRows.length == 2, s"expected two join stores, got $ver3")
    // fully evicted = 3 live gram rows + 1 live candidate; interval-join
    // eviction can lag one batch on one side (measured: 5 then 4), so
    // allow +1 — still strictly below the no-expiry 13 (2×5 grams + 3
    // candidates), which is what a leak would approach
    joinRows.foreach(r => assert(r > 0 && r <= 3 + 1 + 1,
      s"a join store holds $r rows after drain 3 — expired gram rows " +
        s"did not leave (ops: $ver3)"))
    assert(joinRows.sum + dedupRows.sum < 13 + 2 * 5,
      s"verify-query total state ${joinRows.sum + dedupRows.sum} is " +
        s"not below the no-expiry bound (ops: $ver3)")
    val pairs = spark.read.parquet(sink)
      .as[(Long, Long, Double)].collect()
    assert(pairs.map(p => (p._1, p._2)).toSet == Set((1L, 2L), (4L, 5L)),
      s"two-query horizon semantics off — got ${pairs.toSeq}")
    // exactly-once per pair through the dedup (no per-bucket duplicates)
    assert(pairs.length == pairs.toSet.size,
      s"verify query emitted duplicates: ${pairs.toSeq}")
  }

  test("horizon-bounded band index expires old members across restarts; " +
    "in-horizon pairs still emit") {
    import org.apache.spark.sql.types.{LongType, StringType, StructType,
      TimestampType}
    val base = java.nio.file.Files.createTempDirectory("graft_st11_ttl")
      .toFile
    val src = new java.io.File(base, "src"); src.mkdirs()
    val sink = new java.io.File(base, "sink").getAbsolutePath
    val ckpt = new java.io.File(base, "ckpt").getAbsolutePath
    def text(tag: String): String =
      (0 until 50).map(j => s"$tag$j").mkString(" ")
    def nearDup(t: String, extra: String): String = s"$t $extra"
    val tA = text("alpha"); val tB = text("beta")
    def writeFile(name: String, rows: Seq[(Long, String, String)]): Unit =
      java.nio.file.Files.write(new java.io.File(src, name).toPath,
        rows.map { case (id, ts, t) =>
          s"""{"doc_id":$id,"ts":"$ts","text":"$t"}"""
        }.mkString("\n").getBytes("UTF-8"))
    val schema = new StructType()
      .add("doc_id", LongType).add("ts", TimestampType)
      .add("text", StringType)
    // returns the state store's TOTAL row count after the drain (one row
    // per live (band, bucket) group) — the store-level witness that the
    // horizon's timeout actually deletes expired members, not merely
    // hides them from the pair output
    def drainOnce(): Long = {
      val docs = spark.readStream.schema(schema).json(src.getAbsolutePath)
      val q = EventStreams
        .nearDupPairsStream(docs, tsCol = Some("ts"), horizon = "1 hour")
        .writeStream.outputMode("append").format("parquet")
        .option("path", sink).option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      try q.awaitTermination() finally q.stop()
      q.lastProgress.stateOperators.map(_.numRowsTotal).sum
    }
    // the banding is deterministic, so the EXPECTED live-group count for
    // any doc set is the batch banding expression's distinct (band,
    // bucket) count over exactly those docs
    def expectedGroups(rows: (Long, String, String)*): Long =
      graft.pipeline.Dedup.wordBandRows(
          rows.map { case (id, _, t) => (id, t) }.toDF("doc_id", "text"),
          5, 128, 2)
        .select("band", "bucket").distinct().count()
    // drain 1: an in-horizon near-dup pair (1,2), 30 min apart
    val a = Seq(
      (1L, "2026-01-01T10:00:00Z", tA),
      (2L, "2026-01-01T10:30:00Z", nearDup(tA, "x1")))
    writeFile("a.json", a)
    drainOnce()
    // drain 2 (restart): a unique doc at 13:00 advances the watermark to
    // 12:00 — docs 1 and 2 fall behind the horizon
    val b = Seq((4L, "2026-01-01T13:00:00Z", tB))
    writeFile("b.json", b)
    val rows2 = drainOnce()
    // docs 1/2 leave the STORE within drain 2 already: AvailableNow runs
    // a trailing no-data batch under the advanced watermark (12:00), so
    // every alpha group's timeout (armed at 10:30:00.001) fires before
    // the drain returns — the store ends the drain holding doc 4's
    // groups only (measured 64 = doc 4's band count, vs 130 for the
    // no-expiry union of docs 1/2/4)
    assert(rows2 == expectedGroups(b: _*),
      s"state rows after drain 2 = $rows2, expected doc 4's groups only " +
        s"= ${expectedGroups(b: _*)} — expired members did not leave " +
        "the state store")
    assert(rows2 < expectedGroups(a ++ b: _*),
      "state did not shrink below the no-expiry union after drain 2")
    // drain 3 (restart): 3 duplicates the EXPIRED alpha text (must NOT
    // pair — members 1/2 were pruned); 5 duplicates beta within the
    // horizon (must pair with 4)
    val c = Seq(
      (3L, "2026-01-01T12:30:00Z", nearDup(tA, "x2")),
      (5L, "2026-01-01T13:10:00Z", nearDup(tB, "x3")))
    writeFile("c.json", c)
    val rows3 = drainOnce()
    // after drain 3 the store holds exactly the LIVE docs' groups (3, 4,
    // 5 — all within the 12:10 end-watermark's horizon), strictly fewer
    // than the no-expiry union of all five docs would hold
    assert(rows3 == expectedGroups((b ++ c): _*),
      s"state rows after drain 3 = $rows3, expected live groups of docs " +
        s"3/4/5 = ${expectedGroups((b ++ c): _*)} — expired members did " +
        "not leave the state store")
    assert(rows3 < expectedGroups((a ++ b ++ c): _*),
      "state did not shrink below the no-expiry union")
    val pairs = spark.read.parquet(sink)
      .as[(Long, Long, Double)].collect().toSet.map(
        (p: (Long, Long, Double)) => (p._1, p._2))
    assert(pairs == Set((1L, 2L), (4L, 5L)),
      s"horizon semantics off — got $pairs: expected the in-horizon " +
        "pairs (1,2) and (4,5) only, with the expired alpha members " +
        "never pairing against doc 3")
  }
}
