package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}

import graft.util.Tables

/** Structured Streaming surface over the events table (builder north star;
  * the reference itself is batch-only — SURVEY.md §1.6 note).
  *
  * Each transform is defined once against a DataFrame and used in BOTH
  * modes: batch (for the DuckDB-oracled driver gate) and streaming
  * (readStream + watermark, exercised in the spec via the memory sink) —
  * the Structured Streaming unification is exactly this reuse.
  *
  * Scale: windowed aggregation state is bounded by the watermark; the
  * groupBy(window, type) shuffle keys are low-cardinality; session windows
  * shuffle on user_id.
  */
object EventStreams {

  /** Hourly tumbling-window counts/sums per event type. */
  def hourlyAgg(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts_utc"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        // round before the long cast: value*100 in doubles sits below the
        // exact cent (185.22*100 = 18521.999…); round() matches the oracle
        sum(round(col("value") * 100).cast("long")).as("value_cents"))
      .select(unix_timestamp(col("w.start")).as("hour_start"),
        col("event_type"), col("n_events"), col("value_cents"))

  /** SLIDING-window counts/sums per event type: 1-hour windows every 30
    * minutes (each event lands in exactly 2 windows — Spark's window()
    * replicates rows per overlapping window, map-side, before the same
    * low-cardinality (window, type) aggregation as [[hourlyAgg]]; windows
    * align to the epoch grid, which is what the SQL oracle replays). */
  def slidingAgg(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts_utc"), "1 hour", "30 minutes").as("w"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(round(col("value") * 100).cast("long")).as("value_cents"))
      .select(unix_timestamp(col("w.start")).as("win_start"),
        col("event_type"), col("n_events"), col("value_cents"))

  /** Run [[slidingAgg]] as a streaming query (watermark + memory sink). */
  def runSlidingAggStream(spark: SparkSession, sfDir: String,
      queryName: String): StreamingQuery =
    slidingAgg(eventStream(spark, sfDir, "2 hours"))
      .writeStream
      .outputMode(OutputMode.Complete())
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()

  /** Hourly DISTINCT active users — the windowed COUNT(DISTINCT) every
    * engagement dashboard needs, shaped for BOTH engines: an exact
    * per-(window, user) dedup first (streaming: a stateful dedup whose
    * state the watermark expires), then a plain windowed count. A direct
    * `countDistinct` is not allowed in streaming aggregations — the
    * dedup→count decomposition is the standard exact form, and in batch
    * Catalyst executes it as the same expand/partial-agg it would plan
    * for COUNT(DISTINCT). State: one entry per (hour, user) inside the
    * watermark horizon, not per event. */
  def hourlyActiveUsers(events: DataFrame): DataFrame =
    events
      .select(window(col("ts_utc"), "1 hour").as("w"), col("user_id"))
      .dropDuplicates("w", "user_id")
      .groupBy(col("w"))
      .agg(count(lit(1)).as("n_users"))
      .select(unix_timestamp(col("w.start")).as("hour_start"), col("n_users"))

  /** Run [[hourlyActiveUsers]] as a streaming query (watermarked chained
    * stateful operators: dedup then windowed agg; memory sink). */
  def runHourlyUsersStream(spark: SparkSession, sfDir: String,
      queryName: String): StreamingQuery =
    hourlyActiveUsers(eventStream(spark, sfDir, "2 hours"))
      .writeStream
      .outputMode(OutputMode.Complete())
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()

  /** Session counts per user: 30-minute inactivity gap sessionization via
    * session_window (works identically in batch and streaming). */
  def userSessions(events: DataFrame): DataFrame =
    events
      .groupBy(session_window(col("ts_utc"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_sessions"), sum(col("n_events")).as("n_events"))

  /** Exact event dedup on the natural key (user, type, ts), rolled up to
    * per-user unique-event counts. In streaming the dedup state is bounded
    * by the watermark (`dropDuplicatesWithinWatermark`); in batch it is a
    * plain distinct — the canonical at-least-once-source cleanup stage of
    * a training-data ingest pipeline. */
  def dedupCounts(events: DataFrame, withinWatermark: Boolean = false): DataFrame = {
    // key on the RAW ts column (exact equality — long nanos or µs
    // timestamp, whichever the parquet carries — same as the SQL oracle's
    // DISTINCT); the watermark column ts_utc only drives state expiry in
    // the streaming variant
    val distinctEvents =
      if (withinWatermark)
        events.dropDuplicatesWithinWatermark("user_id", "event_type", "ts")
      else events.dropDuplicates("user_id", "event_type", "ts")
    distinctEvents.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_unique_events"))
  }

  /** Event-time attribution join: each purchase matched to the views by
    * the same user in the preceding hour — the canonical stream-stream
    * interval join. Equi-key user_id + time-range predicate: a hash/merge
    * join in batch, watermark-bounded state in streaming (the range bound
    * is exactly what lets Structured Streaming expire join state). Returns
    * (purchase_id, view_id) pairs; aggregate with [[attributionCounts]]. */
  def attributionPairs(events: DataFrame): DataFrame = {
    val views = events.filter(col("event_type") === "view")
      .select(col("user_id"), col("event_id").as("view_id"),
        col("ts_utc").as("view_ts"))
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("ts_utc").as("purchase_ts"))
    purchases.join(views, Seq("user_id"))
      .filter(col("view_ts") <= col("purchase_ts") &&
        col("purchase_ts") <= col("view_ts") + expr("INTERVAL 1 HOUR"))
      .select(col("purchase_id"), col("view_id"))
  }

  /** Per-purchase attribution rollup over [[attributionPairs]]. */
  def attributionCounts(pairs: DataFrame): DataFrame =
    pairs.groupBy(col("purchase_id"))
      .agg(count(lit(1)).as("n_views"), min(col("view_id")).as("first_view_id"))

  /** Run [[attributionPairs]] as a genuine stream-stream join: both sides
    * read from the stream with watermarks; the interval condition bounds
    * the join state. Append-mode memory sink. */
  def runAttributionStream(spark: SparkSession, sfDir: String,
      queryName: String): StreamingQuery = {
    // each join side gets its OWN watermark (re-watermarking one shared
    // stream is disallowed), so read the raw stream and watermark per side
    val s = rawEventStream(spark, sfDir)
    val views = s.filter(col("event_type") === "view")
      .select(col("user_id"), col("event_id").as("view_id"),
        col("ts_utc").as("view_ts"))
      .withWatermark("view_ts", "2 hours")
    val purchases = s.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("ts_utc").as("purchase_ts"))
      .withWatermark("purchase_ts", "2 hours")
    purchases.join(views,
        purchases("user_id") === views("user_id") &&
        col("view_ts") <= col("purchase_ts") &&
        col("purchase_ts") <= col("view_ts") + expr("INTERVAL 1 HOUR"))
      .select(col("purchase_id"), col("view_id"))
      .writeStream
      .outputMode(OutputMode.Append())
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** Sequential-pattern (CEP) funnel: for each user, the FIRST purchase
    * preceded by at least 3 views, in event-time order (total order
    * tie-broken by event_id). Batch leg: one window shuffle on user —
    * prior-view count over the preceding frame, then first qualifying
    * purchase per user. This is the operator family (MATCH_RECOGNIZE /
    * funnel analysis) that in STREAMING genuinely needs custom state
    * ([[funnelStream]]): no built-in streaming window/join expresses
    * "count since the start of the key, emit once on the first match". */
  def funnelConversions(events: DataFrame, minViews: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_utc"), col("event_id"))
    val prior = events
      .filter(col("event_type").isin("view", "purchase"))
      .withColumn("prior_views",
        count(when(col("event_type") === "view", 1))
          .over(w.rowsBetween(Window.unboundedPreceding, -1)))
    val qualifying = prior
      .filter(col("event_type") === "purchase" &&
        col("prior_views") >= minViews)
    qualifying
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("prior_views").as("n_prior_views"))
  }

  /** Streaming leg of [[funnelConversions]]: `flatMapGroupsWithState`
    * keyed on user with a two-field state (views seen, already emitted) —
    * the state machine consumes each user's events in (event-time,
    * event_id) order within the batch and emits exactly once, on the first
    * purchase whose prior-view count clears the threshold. State is
    * expired via EVENT-TIME timeout 1 h past the watermark: at 100 TB the
    * store holds two longs per user seen within the horizon, not the
    * events. For a single AvailableNow batch this equals the batch leg
    * exactly (the spec's contract). */
  def funnelStream(events: DataFrame, minViews: Int = 3,
      withTimeout: Boolean = true): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    // withTimeout=false is the BATCH twin (batch execution has no
    // watermark, so event-time timeouts cannot be registered there); the
    // streaming path always runs with the timeout so the store stays
    // bounded. The per-(user,batch) sort is bounded by one user's events
    // in one micro-batch — the state machine needs in-order consumption.
    val timeoutConf = if (withTimeout) GroupStateTimeout.EventTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    events
      .filter(col("event_type").isin("view", "purchase"))
      .select(col("user_id"), col("ts_utc"),
        unix_micros(col("ts_utc")).as("ts_us"), col("event_id"),
        (col("event_type") === "view").as("is_view"))
      .as[(Long, java.sql.Timestamp, Long, Long, Boolean)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Boolean), (Long, Long, Long)](
          OutputMode.Append(), timeoutConf) {
        (user, rows, state) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            var (views, done) = state.getOption.getOrElse((0L, false))
            val out = Seq.newBuilder[(Long, Long, Long)]
            var maxTs = Long.MinValue
            rows.toSeq.sortBy(r => (r._3, r._4)).foreach { r =>
              maxTs = math.max(maxTs, r._3)
              if (r._5) views += 1
              else if (!done && views >= minViews) {
                out += ((user, r._4, views)); done = true
              }
            }
            state.update((views, done))
            // bound the store: drop the user 1h of event time after their
            // last activity clears the watermark. flatMapGroupsWithState
            // does NOT drop watermark-late rows, so a group whose newest
            // event is already >1h behind the current watermark would set a
            // timeout at-or-before the watermark — an IllegalArgumentException
            // that kills the query. Clamp past the watermark instead.
            if (withTimeout)
              state.setTimeoutTimestamp(
                math.max(maxTs / 1000L, state.getCurrentWatermarkMs() + 1L),
                "1 hour")
            out.result().iterator
          }
      }
      .toDF("user_id", "purchase_id", "n_prior_views")
  }

  /** Run [[funnelStream]] over the events parquet as a real streaming
    * query (watermarked event time, append-mode memory sink). */
  def runFunnelStream(spark: SparkSession, sfDir: String,
      queryName: String): StreamingQuery =
    funnelStream(eventStream(spark, sfDir, "2 hours"))
      .writeStream
      .outputMode(OutputMode.Append())
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()

  /** Stream-STATIC enrichment: events joined to the customer→nation
    * dimension (user_id keys directly into c_custkey in the testdata),
    * rolled up to event counts and cent-exact revenue per nation — the
    * canonical "enrich the clickstream with a dimension table" stage.
    *
    * The dimension is broadcast explicitly: in streaming, a stream-static
    * equi-join re-probes the static side every micro-batch, and a broadcast
    * hash join makes that probe map-side — no shuffle of the stream, no
    * state store (the static side is not stateful the way stream-stream
    * joins are). At 100 TB the events side never moves; only the tiny
    * dim table ships. Works identically in batch (the st07 oracle leg). */
  def nationEnrichment(events: DataFrame, customer: DataFrame,
      nation: DataFrame): DataFrame = {
    val dim = customer.select(col("c_custkey").cast("long").as("user_id"),
        col("c_nationkey").as("nk"))
      .join(nation.select(col("n_nationkey").as("nk"), col("n_name")), Seq("nk"))
      .select(col("user_id"), col("n_name").as("nation"))
    events.join(broadcast(dim), Seq("user_id"))
      .groupBy(col("nation"))
      .agg(count(lit(1)).as("n_events"),
        // same cents-exact rounding convention as hourlyAgg
        sum(round(col("value") * 100).cast("long")).as("value_cents"))
  }

  /** Run [[nationEnrichment]] with a genuinely streaming events side:
    * readStream + the static dim, complete-mode aggregation into a memory
    * sink. */
  def runNationEnrichmentStream(spark: SparkSession, sfDir: String,
      queryName: String): StreamingQuery =
    nationEnrichment(rawEventStream(spark, sfDir),
        Tables.customer(spark, sfDir), Tables.nation(spark, sfDir))
      .writeStream
      .outputMode(OutputMode.Complete())
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()

  /** Content keep-first dedup over a documents table: one row per distinct
    * normalized content (64-bit [[graft.pipeline.TextAnalysis.fingerprint]]
    * key — 8-byte group keys instead of full texts at shuffle time; the
    * fingerprint collides exactly when the normalized text collides,
    * spec-asserted), keeping the MINIMUM doc_id and the copy count. The
    * canonical "dedup the crawl before training" stage as one map-side-
    * partial aggregation. */
  def contentKeepFirst(docs: DataFrame): DataFrame =
    docs.withColumn("fp",
        graft.pipeline.TextAnalysis.fingerprint(col("text")))
      .groupBy(col("fp"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
      .select(col("keep_id"), col("n_copies"))

  /** Parsed document stream off a WARC segment drop directory through
    * the native connector's micro-batch source
    * ([[graft.sources.warc.WarcMicroBatchStream]] — each trigger picks up
    * newly dropped segment files, one partition per file): keeps
    * `response` records (pushed into the reader, so warcinfo/request
    * payloads are skipped, never copied) and maps them to the (doc_id,
    * text) shape the ingest-dedup stages consume. doc_id follows the
    * corpus URI convention `…/doc/<id>` the fixture writers emit; a real
    * crawl feed would key on WARC-Record-ID instead. */
  def warcCorpusDocStream(spark: SparkSession, dir: String): DataFrame =
    warcCorpusDocs(spark.readStream.format("warc").load(dir))

  /** The response→(doc_id, text) projection [[warcCorpusDocStream]] and
    * the batch gates share (one place for the corpus URI convention). */
  def warcCorpusDocs(warcRows: DataFrame): DataFrame =
    warcRows.filter(col("record_type") === "response")
      .select(
        regexp_extract(col("target_uri"), "doc/(\\d+)$", 1).cast("long")
          .as("doc_id"),
        col("payload").cast("string").as("text"))

  /** Streaming leg of [[contentKeepFirst]]: earliest BATCH wins, ties
    * within a batch broken by min doc_id — `flatMapGroupsWithState` keyed
    * on the content fingerprint (one boolean of state per distinct document
    * ever seen). A plain `dropDuplicates` would keep whichever duplicate
    * the shuffle fetched first when one micro-batch spans several input
    * splits — nondeterministic at scale; taking the batch-min restores a
    * deterministic contract, and for a single AvailableNow batch it equals
    * [[contentKeepFirst]]'s min-doc_id survivors exactly. Production note:
    * swap NoTimeout for a processing-time timeout when a document can only
    * recur within a bounded ingest window, to bound the state store. */
  def contentDedupStream(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(
        graft.pipeline.TextAnalysis.fingerprint(col("text")).as("fp"),
        col("doc_id"))
      .as[(Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Boolean, Long](
          OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_, rows, state) =>
          if (state.exists) Iterator.empty
          else { state.update(true); Iterator.single(rows.map(_._2).min) }
      }
      .toDF("doc_id")
  }

  /** PACK AT INGEST (st19): per-SOURCE concat-and-chop of arriving
    * token-id streams into fixed-length training sequences, the partial
    * tail carried in state until later arrivals complete it — the
    * streaming twin of [[graft.pipeline.Packing.packTokenIds]]
    * restricted to a per-source sequence space (an arrival stream has
    * no global corpus order to chop against; production pack-at-ingest
    * keys sequences by source/shard stream for exactly that reason).
    *
    * Emits FULL sequences only: the sub-seqLen tail stays in state
    * awaiting the next micro-batch — so a single-batch (or batch-mode)
    * run withholds each source's final partial, and the oracle excludes
    * it the same way (HAVING count = seqLen). State per source is
    * (next sequence index, tail ids), bounded at seqLen ids regardless
    * of stream length. Within a micro-batch a group's rows consume in
    * ascending doc_id order — the deterministic arrival-order contract
    * the batch twin replays — which REQUIRES materializing the group's
    * micro-batch rows to sort them: per-task memory is one source's
    * slice of ONE MICRO-BATCH (bounded by the stream's admission unit),
    * plus the compacting chop buffer (one document + tail). That bound
    * is the streaming deployment's; running this transform in BATCH
    * mode (as the st19 gate does for oracle parity) concentrates each
    * source's whole corpus into one task — batch-scale packing belongs
    * to [[graft.pipeline.Packing.packTokenIds]]'s two-pass scan, not
    * this operator.
    *
    * `eodId`: the batch packers' separator contract
    * ([[graft.pipeline.Packing.packTokenIds]]) — every arriving
    * document's ids are followed by one `eodId` token before chopping.
    *
    * `eosCol`: END-OF-STREAM DRAIN — a finite ingest run ends, and
    * without a drain each source's final sub-seqLen tail stays in state
    * forever (the continuous-stream contract above). When set, a TRUE
    * row in that boolean column is the source's end-of-stream SENTINEL
    * (the classic end-of-partition marker a finite producer appends;
    * give it the source's largest doc_id so the in-batch sort plays it
    * last, and carry no ids on it): on the sentinel the remaining tail
    * is emitted — EOD-PADDED to a full seqLen when `eodId` is set (the
    * GPT convention: pad slots are `<|endoftext|>`), as the raw partial
    * (length < seqLen marks it) otherwise — and the source's state is
    * replaced by a DRAINED TOMBSTONE (nextSeq sign-flipped — one tuple
    * per source, bounded forever). Deterministic in both streaming and
    * batch execution (the drain fires exactly where the sentinel sits
    * in doc_id order), so the chunked-arrival stream and the batch
    * gate replay stay pinned equal. Data arriving AFTER a source's
    * sentinel — same batch or any later one — FAILS LOUDLY: the
    * sentinel means the producer said done, and silently restarting
    * the sequence numbering would emit duplicate (source, seq_idx)
    * keys and break the batch==stream pin. */
  def packStream(docs: DataFrame, seqLen: Int,
      srcCol: String = "source", idCol: String = "doc_id",
      idsCol: String = "ids", eodId: Option[Long] = None,
      eosCol: Option[String] = None): DataFrame = {
    require(seqLen >= 1, "need a positive sequence length")
    val spark = docs.sparkSession
    import spark.implicits._
    val eos = eosCol.map(c => col(c).cast("boolean")).getOrElse(lit(false))
    docs.select(col(srcCol).cast("string").as("_src"),
        col(idCol).cast("long").as("_id"),
        graft.pipeline.Packing.withEod(col(idsCol), eodId).as("_ids"),
        eos.as("_eos"))
      .as[(String, Long, Seq[Long], Boolean)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Seq[Long]), (String, Long, Seq[Long])](
          OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (src, rows, state) =>
          var (nextSeq, carry) =
            state.getOption.getOrElse((0L, Seq.empty[Long]))
          // the drained tombstone: nextSeq stored as -(n+1) after the
          // sentinel, so late data is a loud contract violation, never
          // a silent seq_idx restart
          var drained = nextSeq < 0L
          if (drained) nextSeq = -nextSeq - 1L
          val buf = new scala.collection.mutable.ArrayBuffer[Long](
            seqLen * 2)
          buf ++= carry
          val out = Seq.newBuilder[(String, Long, Seq[Long])]
          rows.toSeq.sortBy(_._2).foreach { r =>
            require(!drained,
              s"packStream: data for source '$src' arrived after its " +
                "end-of-stream sentinel — the sentinel must carry the " +
                "source's largest doc_id and nothing may follow it")
            if (r._4) {
              // sentinel: flush the tail (EOD-padded to a full sequence
              // when the separator contract is on) and forget the source.
              // The sentinel's own ids are ignored — it marks, it does
              // not carry. NOTE the eod-append above also skips nothing:
              // a sentinel with the appended separator would leak one
              // token, so strip it by construction (empty ids + eod = 1
              // token) — handled by not consuming r._3 at all.
              if (buf.nonEmpty) {
                val tail = eodId match {
                  case Some(e) =>
                    (buf ++ Seq.fill(seqLen - buf.length)(e)).toSeq
                  case None => buf.toSeq
                }
                out += ((src, nextSeq, tail))
                nextSeq += 1
                buf.clear()
              }
              drained = true
            } else {
              buf ++= r._3
              var off = 0
              while (buf.length - off >= seqLen) {
                out += ((src, nextSeq, buf.slice(off, off + seqLen).toSeq))
                off += seqLen
                nextSeq += 1
              }
              if (off > 0) buf.remove(0, off) // compact: tail < seqLen stays
            }
          }
          if (drained) state.update((-nextSeq - 1L, Seq.empty[Long]))
          else state.update((nextSeq, buf.toSeq))
          out.result().iterator
      }
      .toDF("source", "seq_idx", "ids")
  }

  /** TOKENIZE AT INGEST (st12): per arriving document, the whitespace
    * word count and the BPE token count under a trained model's merge
    * list — completely STATELESS map-side work, so it runs identically
    * as a streaming or batch plan with no watermark, state store, or
    * output-mode concern. A stream has no distinct-word table to join
    * (the batch path's dictionary trick needs the whole corpus), so each
    * row pays per-word work — via [[graft.pipeline.Bpe
    * .encodeWordGreedy]], the merge-PRIORITY greedy encoder: the rank
    * map rides in one broadcast, per-word cost is O(len²) map probes
    * independent of merge count, and the PLAN is constant-size (the
    * rank-order fold it replaced compiled a merges-deep expression
    * chain — a 32k-merge production vocabulary would not survive
    * Catalyst analysis; rehearsed through the wide-vocab model in
    * tools.ScaleRehearsal). At 100 TB the BATCH path re-tokenizes
    * corpora; this is the shape for the arrival firehose, where per-row
    * cost is the only cost.
    *
    * OOV CONTRACT — full BPE semantics: a word absent from the training
    * vocabulary still encodes (its characters plus whatever merges
    * apply — exactly what production BPE does to novel arrivals), and
    * `n_words` counts every whitespace word. [[graft.pipeline.Bpe
    * .encodeTokenCounts]] implements the SAME total contract batch-side
    * (one left-outer dictionary join whose unmatched rows fall through
    * to the same greedy kernel), so batch == stream on any corpus —
    * spec-pinned on both in-vocab and planted-OOV corpora. */
  def tokenizeStream(docs: DataFrame,
      merges: Seq[graft.pipeline.Bpe.Merge],
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    tokenizeStreamWith(docs, merges,
      graft.pipeline.Bpe.encodeWordGreedy, "n_bpe_tokens", idCol, textCol)

  /** BYTE-level tokenize-at-ingest — [[tokenizeStream]]'s twin for the
    * GPT-2 family: the same stateless per-row shape with the byte
    * greedy kernel ([[graft.pipeline.ByteBpe.encodeWordGreedy]]), which
    * is TOTAL on any script with no UNK machinery — the arrival stream
    * that suddenly grows a novel script degrades to byte-granular
    * tokens instead of routing through fallbacks. */
  def byteTokenizeStream(docs: DataFrame,
      merges: Seq[graft.pipeline.Bpe.Merge],
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    tokenizeStreamWith(docs, merges,
      graft.pipeline.ByteBpe.encodeWordGreedy, "n_bytebpe_tokens",
      idCol, textCol)

  /** The kernel-agnostic tokenize-at-ingest body the char and byte BPE
    * twins share (the Bpe.encodeTokenCountsWith factoring, stream
    * side). */
  private def tokenizeStreamWith(docs: DataFrame,
      merges: Seq[graft.pipeline.Bpe.Merge],
      kernel: (String, collection.Map[(String, String), Int]) => Array[String],
      outCol: String, idCol: String, textCol: String): DataFrame = {
    val spark = docs.sparkSession
    val bc = spark.sparkContext
      .broadcast(graft.pipeline.Bpe.rankMap(merges))
    val nTokens = udf { (ws: Seq[String]) =>
      val ranks = bc.value
      var t = 0L
      ws.foreach(w => t += kernel(w, ranks).length)
      t
    }
    docs.filter(col(textCol).isNotNull)
      .select(col(idCol),
        filter(graft.pipeline.TextAnalysis.tokens(col(textCol)),
          w => w =!= "").as("ws"))
      .filter(size(col("ws")) > 0)
      .select(col(idCol), size(col("ws")).cast("long").as("n_words"),
        nTokens(col("ws")).as(outCol))
  }

  /** WordPiece tokenize-at-ingest — the [[tokenizeStream]] twin for the
    * third tokenizer family: stateless per-row greedy longest-match
    * ([[graft.pipeline.Wordpiece.encodeWord]]) under ONE broadcast
    * vocabulary set (driver-sized by construction: alphabet + one token
    * per merge), because an arrival stream has no distinct-word table to
    * join. Emits the batch rollup columns — `n_words`, `n_wp_tokens`
    * (`[UNK]` words contribute one token), `n_unk_words` — so batch ==
    * stream holds row-for-row against [[graft.pipeline.Wordpiece
    * .encodeTokenCounts]] on any corpus (the encode kernel is the SAME
    * function on both paths; spec-pinned through a real readStream run
    * including planted OOV). */
  def wordpieceTokenizeStream(docs: DataFrame, vocab: Set[String],
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    val bc = spark.sparkContext.broadcast(vocab)
    val counts = udf { (ws: Seq[String]) =>
      val v = bc.value
      var t = 0L
      var unk = 0L
      ws.foreach { w =>
        val (n, u) = graft.pipeline.Wordpiece.encodeWord(w, v)
        t += n
        if (u) unk += 1L
      }
      (t, unk)
    }
    docs.filter(col(textCol).isNotNull)
      .select(col(idCol),
        filter(graft.pipeline.TextAnalysis.tokens(col(textCol)),
          w => w =!= "").as("ws"))
      .filter(size(col("ws")) > 0)
      .select(col(idCol), size(col("ws")).cast("long").as("n_words"),
        counts(col("ws")).as("c"))
      .select(col(idCol), col("n_words"),
        col("c._1").as("n_wp_tokens"), col("c._2").as("n_unk_words"))
  }

  /** Streaming NEAR-dup detection at ingest (the st11 operator — the
    * streaming twin of the d04/d15 MinHash+LSH family): every arriving
    * document's 64 band buckets are routed to a `flatMapGroupsWithState`
    * BAND INDEX keyed on (band, bucket); the per-bucket state holds the
    * members seen so far (id + xxhash64'd gram set), each arrival is
    * exact-Jaccard-verified against them in-state, and verified pairs
    * (id_a, id_b, jac) stream out the moment the duplicate arrives — the
    * drop-at-ingest signal, with no corpus self-join ever.
    *
    * Equality contract (spec-pinned, including across restarts): the
    * emitted DISTINCT pair set equals [[graft.pipeline.Dedup
    * .minhashDedupWords]] over the union of everything ingested — same
    * banding expression, same candidates, same verification formula
    * (hashed-gram Jaccard == string-gram Jaccard up to 2⁻⁶⁴ collisions),
    * and the pair set is arrival-order-independent because every bucket
    * member pairs with every later arrival. A pair sharing several
    * buckets emits one identical tuple per bucket — sinks dedup with
    * `distinct` (exactly the batch operator's candidate dropDuplicates,
    * moved to the consumer because cross-group dedup would be a second
    * stateful stage).
    *
    * Scale/state: one entry per (band, document) inside the index, and
    * each entry carries the document's WHOLE hashed gram set — a
    * numBands-fold (64× here) duplication of per-doc verify data in the
    * state store and its checkpoint stream. That is the price of exact
    * in-state verification in ONE stateful stage; the 100 TB shape is
    * IMPLEMENTED as [[nearDupPairsStreamLean]] (horizonless: member-ID
    * band state + candidate dedup + two gram joins) and, with the
    * horizon, as the [[nearDupCandidatesStream]] →
    * [[nearDupVerifyStream]] two-query topology — trading a stage (and
    * a sink handoff) for 2× verify data instead of 64×.
    *
    * State bound: pass `tsCol` to expire band-index members at the
    * dedup horizon, exactly like [[funnelStream]]'s event-time timeout —
    * the stream watermarks on `tsCol` with delay `horizon`, members
    * whose event time the watermark has passed are pruned on every
    * visit AND on group timeout, and a fully-expired bucket removes its
    * state. The trade is explicit: duplicates arriving more than
    * `horizon` of event time after their original are no longer
    * reported (the boilerplate-recurrence horizon assumption); within
    * the horizon the pair set still equals the batch operator's.
    * Without `tsCol` (the bounded gate corpus) nothing expires.
    *
    * State-format note: the per-member state tuple gained an event-time
    * slot when the horizon landed — a checkpoint written by the earlier
    * two-field build cannot be restored by this one; restart horizonless
    * queries from a fresh checkpoint after upgrading. */
  def nearDupPairsStream(docs: DataFrame, w: Int = 5, numHashes: Int = 128,
      rowsPerBand: Int = 2, threshold: Double = 0.8,
      tsCol: Option[String] = None, horizon: String = "1 hour"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // the horizon machinery needs a WATERMARK, which only a streaming
    // plan carries — a batch replay with tsCol set must run untimed (and
    // reading getCurrentWatermarkMs in batch mode throws), so every
    // horizon-path decision keys off this one flag
    val useHorizon = tsCol.isDefined && docs.isStreaming
    val src = tsCol match {
      // a null event time has no place on the horizon path: it would
      // enter the state with timestamp 0L, be silently pruned at the
      // first nonzero watermark, and its future near-dups would be
      // missed with no signal — exclude such rows UP FRONT, as a stated
      // contract instead of a state-store accident (callers wanting
      // null-ts rows deduped must supply a real timestamp or run
      // horizonless)
      case Some(tc) if useHorizon =>
        docs.filter(col(tc).isNotNull).withWatermark(tc, horizon)
      case _ => docs
    }
    val timeoutConf =
      if (useHorizon) GroupStateTimeout.EventTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    graft.pipeline.Dedup.wordBandRows(src, w, numHashes, rowsPerBand,
        tsCol = tsCol)
      .select(col("band"), col("bucket"), col("id"), col("ghash"),
        col("ts_evt"))
      .as[(Int, Long, Long, Seq[Long], java.sql.Timestamp)]
      .groupByKey(r => (r._1, r._2))
      .flatMapGroupsWithState[Seq[(Long, Long, Array[Long])],
          (Long, Long, Double)](
          OutputMode.Append(), timeoutConf) {
        (_, rows, state) =>
          // a member is live while the watermark has not passed its event
          // time; with withWatermark(horizon) that means it expires once
          // events more than `horizon` newer have been seen. The expiry
          // machinery (live prune, watermark-clamped timeout arming,
          // group GC on empty) is the shared band-index state machine —
          // see liveMembers/armHorizonTimeout/onGroupTimeout above.
          val wmMs = if (useHorizon) state.getCurrentWatermarkMs()
            else Long.MinValue
          type M = (Long, Long, Array[Long])
          if (state.hasTimedOut) {
            onGroupTimeout[M](state, wmMs, _._2, useHorizon)
            Iterator.empty
          } else {
            var members = liveMembers(
              state.getOption.getOrElse(Seq.empty[M]), wmMs,
              (m: M) => m._2)
            val out = Seq.newBuilder[(Long, Long, Double)]
            // in-batch id order: within one micro-batch the earlier id is
            // the "corpus" side, exactly as a row-at-a-time ingest would
            // see
            rows.toSeq.sortBy(_._3).foreach { r =>
              val g = r._4.toArray
              val gs = g.toSet
              members.foreach { case (mid, _, mg) =>
                if (mid != r._3) {
                  var inter = 0
                  mg.foreach(h => if (gs.contains(h)) inter += 1)
                  // same inclusion-exclusion dataflow as Dedup.jaccard
                  val jac = inter.toDouble /
                    (mg.length.toDouble + g.length.toDouble - inter.toDouble)
                  if (jac >= threshold)
                    out += ((math.min(mid, r._3), math.max(mid, r._3), jac))
                }
              }
              members = members :+
                ((r._3, if (r._5 == null) 0L else r._5.getTime, g))
            }
            state.update(members)
            armHorizonTimeout[M](state, members, wmMs, _._2, useHorizon)
            out.result().iterator
          }
      }
      .toDF("id_a", "id_b", "jac")
  }

  /** Streaming near-dup detection in the LEAN two-stage shape — the
    * 100 TB variant of [[nearDupPairsStream]], whose one-stage band
    * index carries every document's whole hashed gram set once PER BAND
    * (a numBands-fold — 64× here — duplication of verify data in the
    * state store and its checkpoint stream; its own scaladoc names this
    * trade). Here the stages split exactly as that doc prescribes:
    *
    *   1. BAND INDEX (`flatMapGroupsWithState` keyed on (band, bucket)):
    *      state is the member ID LIST ONLY — no gram sets anywhere near
    *      it — and each arrival emits candidate `(id_a, id_b)` pairs
    *      against the existing members. Per-doc state cost drops from
    *      numBands × gramset to numBands × 8 bytes.
    *   2. CANDIDATE DEDUP (streaming `dropDuplicates` on the id pair):
    *      a pair colliding in many buckets emits once per bucket from
    *      the band stage — up to numBands identical tuples for a true
    *      duplicate — and each copy surviving to the verify joins would
    *      buffer its own gram-set attachment in join state (on dup-heavy
    *      data that inverts the lean win). The id-pair-sized dedup state
    *      caps the verify joins at ONE row per candidate pair.
    *   3. VERIFY (two built-in stream-stream equi-joins): the per-doc
    *      distinct hashed gram sets ([[graft.pipeline.Dedup
    *      .wordGramHashes]] — a STATELESS map over the arrivals, one row
    *      per doc) join onto the deduped candidate pairs on each side,
    *      and the exact Jaccard (`|a∩b| / (|a|+|b|−|a∩b|)`, the batch
    *      operator's arithmetic in the same operation order) filters at
    *      the threshold. Each join buffers the gram table once — 2×
    *      total verify data, vs 64× — and the candidate side it buffers
    *      is one id-pair row per pair.
    *
    * Emission contract: each verified pair emits EXACTLY ONCE — the
    * candidate dedup caps the pair rows and a doc-id dedup on the gram
    * sides caps replayed arrivals (topic replays of a doc attach one
    * gram row, first version wins within the stream) — subsuming the
    * one-stage operator's consumer-side `distinct` posture. The pair
    * SET equals [[graft.pipeline.Dedup.minhashDedupWords]] over
    * everything ingested (spec-pinned through a real readStream run,
    * including a replayed arrival).
    *
    * State bound: this variant runs horizonless (the bounded-corpus gate
    * shape). The production bound is the standard one for stream-stream
    * joins — watermark both sides and add a time-interval predicate to
    * the join condition — plus the band stage's event-time timeout,
    * exactly [[nearDupPairsStream]]'s horizon machinery; the lean shape
    * changes which operator holds the data, not how it expires. */
  def nearDupPairsStreamLean(docs: DataFrame, w: Int = 5,
      numHashes: Int = 128, rowsPerBand: Int = 2,
      threshold: Double = 0.8): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val cands = graft.pipeline.Dedup
      .wordBandRows(docs, w, numHashes, rowsPerBand)
      .select(col("band"), col("bucket"), col("id"))
      .as[(Int, Long, Long)]
      .groupByKey(r => (r._1, r._2))
      .flatMapGroupsWithState[Seq[Long], (Long, Long)](
          OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_, rows, state) =>
          // in-batch id order: the earlier id is the "corpus" side,
          // exactly as the one-stage operator processes arrivals
          var members = state.getOption.getOrElse(Seq.empty)
          val out = Seq.newBuilder[(Long, Long)]
          rows.toSeq.sortBy(_._3).foreach { r =>
            members.foreach { m =>
              if (m != r._3)
                out += ((math.min(m, r._3), math.max(m, r._3)))
            }
            if (!members.contains(r._3)) members = members :+ r._3
          }
          state.update(members)
          out.result().iterator
      }
      .toDF("id_a", "id_b")
      // one row per candidate pair reaches the verify joins (stage 2 of
      // the scaladoc); horizonless like the rest of this variant — the
      // production bound is the same watermark that bounds the joins
      .dropDuplicates("id_a", "id_b")
    verifyStage(cands, docs, w, threshold, tsCol = None, horizon = "")
  }

  /** The lean topology's shared VERIFY stage: attach each candidate
    * side's per-doc hashed gram set and exact-Jaccard filter at
    * `threshold` — [[graft.pipeline.Dedup.jaccard]] over the HASHED
    * sets, same expression tree and value as the batch verify's
    * string-gram Jaccard up to the 2⁻⁶⁴ collision bound (the st11
    * convention). With `tsCol` the gram sides are watermarked and the
    * joins carry the time-interval predicate
    * (evt − horizon ≤ gram ts ≤ evt) — the horizon-bounded form; ONE
    * copy of the join+Jaccard dataflow, so the
    * exact-verify-equals-batch property cannot drift between the
    * horizonless and horizon variants. */
  private def verifyStage(cands: DataFrame, docs: DataFrame, w: Int,
      threshold: Double, tsCol: Option[String],
      horizon: String): DataFrame = {
    val g = graft.pipeline.Dedup.wordGramHashes(
      tsCol.map(tc => docs.filter(col(tc).isNotNull)).getOrElse(docs),
      w, tsCol = tsCol)
    def side(sfx: String): DataFrame = {
      val cols = Seq(col("id").as(s"gid_$sfx")) ++
        tsCol.map(_ => col("ts_evt").as(s"gevt_$sfx")).toSeq :+
        col("ghash").as(s"gh_$sfx")
      val base = g.select(cols: _*)
      val wm =
        if (tsCol.isDefined) base.withWatermark(s"gevt_$sfx", horizon)
        else base
      // ONE gram row per doc (per horizon, on the horizon path): a
      // re-ingested arrival (topic replay) would otherwise attach twice
      // and double-emit the verified pair, breaking the exactly-once
      // contract; the dedup state is doc-id-sized. Batch replays dedup
      // plainly (dropDuplicatesWithinWatermark is streaming-only).
      if (tsCol.isDefined && wm.isStreaming)
        wm.dropDuplicatesWithinWatermark(s"gid_$sfx")
      else wm.dropDuplicates(s"gid_$sfx")
    }
    def cond(sfx: String) = {
      val eq = col(s"id_$sfx") === col(s"gid_$sfx")
      if (tsCol.isDefined) {
        val win = expr(s"INTERVAL $horizon")
        eq && col(s"gevt_$sfx") >= col("evt") - win &&
          col(s"gevt_$sfx") <= col("evt")
      } else eq
    }
    cands
      .join(side("a"), cond("a"))
      .join(side("b"), cond("b"))
      .select(col("id_a"), col("id_b"),
        graft.pipeline.Dedup.jaccard(col("gh_a"), col("gh_b")).as("jac"))
      .filter(col("jac") >= threshold)
  }

  /** The horizon-expiry state machine shared by every band-index
    * `flatMapGroupsWithState` (the one-stage st11 operator and the lean
    * topology's candidate stage), parameterized on how a member exposes
    * its event-time millis. A member is live while the watermark has
    * not passed its event time; the group's timeout is armed just past
    * its newest member, CLAMPED past the watermark (the funnelStream
    * late-group lesson — an unclamped arm on an already-passed
    * timestamp would never fire); a fully-expired group removes its
    * state on timeout. ONE copy of the clamp/prune logic, so a future
    * expiry fix cannot silently miss a variant. */
  private def liveMembers[T](ms: Seq[T], wmMs: Long,
      tsOf: T => Long): Seq[T] =
    ms.filter(tsOf(_) >= wmMs)

  private def armHorizonTimeout[T](state: GroupState[Seq[T]], ms: Seq[T],
      wmMs: Long, tsOf: T => Long, useHorizon: Boolean): Unit =
    if (useHorizon && ms.nonEmpty)
      state.setTimeoutTimestamp(
        math.max(ms.map(tsOf).max + 1L, wmMs + 1L))

  /** The `hasTimedOut` branch: prune expired members, drop the group's
    * state entirely once empty, re-arm otherwise. */
  private def onGroupTimeout[T](state: GroupState[Seq[T]], wmMs: Long,
      tsOf: T => Long, useHorizon: Boolean): Unit = {
    val kept = liveMembers(state.getOption.getOrElse(Seq.empty), wmMs, tsOf)
    if (kept.isEmpty) state.remove()
    else {
      state.update(kept)
      armHorizonTimeout(state, kept, wmMs, tsOf, useHorizon)
    }
  }

  /** Millisecond value of an interval string, parsed by SPARK'S OWN
    * interval grammar (the same parser `withWatermark` and `INTERVAL`
    * expressions use) — the band stage needs the horizon as plain
    * event-time arithmetic, and the two queries of the lean topology
    * must agree on what a legal horizon is by construction. Calendar
    * months have no fixed millisecond value and are rejected. */
  private def intervalMs(s: String): Long = {
    val iv = org.apache.spark.sql.catalyst.util.IntervalUtils
      .stringToInterval(
        org.apache.spark.unsafe.types.UTF8String.fromString(s))
    require(iv.months == 0,
      s"calendar-month horizons are not supported: '$s'")
    iv.days * 86400000L + iv.microseconds / 1000L
  }

  /** HORIZON-BOUNDED lean near-dup, query 1 of 2 — the band-index
    * CANDIDATE stream: member-ID-only state per (band, bucket) with the
    * same event-time expiry as [[nearDupPairsStream]]'s horizon path,
    * emitting `(id_a, id_b, evt)` candidates where `evt` is the pair's
    * LATER event time and both members sit within `horizon` of each
    * other IN EVENT TIME (an explicit emission bound, strictly cleaner
    * than the watermark-lag rule alone: it guarantees every emitted
    * candidate's gram rows fall inside the verify query's join window,
    * so the split can never silently drop a band-emitted pair).
    *
    * WHY TWO QUERIES: chaining event-time stateful operators after
    * `flatMapGroupsWithState` in one query trips Spark's global-
    * watermark correctness check — the band stage can emit rows older
    * than the advancing watermark, which downstream stateful operators
    * would silently discard as late (measured; the checker names exactly
    * this). The sound production topology is the classic one: this
    * query writes candidates to a sink (a topic, a table), and
    * [[nearDupVerifyStream]] runs as its OWN query with its own
    * watermark lineage over that sink plus the document stream. Both
    * queries' state is bounded: band members expire at the horizon
    * here, dedup/join state expires at the horizon there. */
  def nearDupCandidatesStream(docs: DataFrame, w: Int = 5,
      numHashes: Int = 128, rowsPerBand: Int = 2, tsCol: String = "ts",
      horizon: String = "1 hour"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val horizonMs = intervalMs(horizon)
    val useHorizon = docs.isStreaming
    val src =
      if (useHorizon)
        docs.filter(col(tsCol).isNotNull).withWatermark(tsCol, horizon)
      else docs.filter(col(tsCol).isNotNull)
    val timeoutConf =
      if (useHorizon) GroupStateTimeout.EventTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    graft.pipeline.Dedup
      .wordBandRows(src, w, numHashes, rowsPerBand, tsCol = Some(tsCol))
      .select(col("band"), col("bucket"), col("id"), col("ts_evt"))
      .as[(Int, Long, Long, java.sql.Timestamp)]
      .groupByKey(r => (r._1, r._2))
      .flatMapGroupsWithState[Seq[(Long, Long)],
          (Long, Long, java.sql.Timestamp)](
          OutputMode.Append(), timeoutConf) {
        (_, rows, state) =>
          val wmMs = if (useHorizon) state.getCurrentWatermarkMs()
            else Long.MinValue
          if (state.hasTimedOut) {
            onGroupTimeout[(Long, Long)](state, wmMs, _._2, useHorizon)
            Iterator.empty
          } else {
            var members = liveMembers(
              state.getOption.getOrElse(Seq.empty[(Long, Long)]),
              wmMs, (m: (Long, Long)) => m._2)
            val out = Seq.newBuilder[(Long, Long, java.sql.Timestamp)]
            rows.toSeq.sortBy(_._3).foreach { r =>
              val tMs = r._4.getTime
              members.foreach { case (mid, mts) =>
                if (mid != r._3 && math.abs(tMs - mts) <= horizonMs)
                  out += ((math.min(mid, r._3), math.max(mid, r._3),
                    new java.sql.Timestamp(math.max(mts, tMs))))
              }
              // a re-ingested doc (topic replay) REFRESHES its member's
              // event time, so its horizon extends from the latest
              // sighting — the one-stage operator gets this by appending
              // a fresh timestamped entry; one max-ts entry is the lean
              // equivalent
              members =
                if (members.exists(_._1 == r._3))
                  members.map { case m @ (mid, mts) =>
                    if (mid == r._3) (mid, math.max(mts, tMs)) else m
                  }
                else members :+ ((r._3, tMs))
            }
            state.update(members)
            armHorizonTimeout[(Long, Long)](state, members, wmMs, _._2,
              useHorizon)
            out.result().iterator
          }
      }
      .toDF("id_a", "id_b", "evt")
  }

  /** HORIZON-BOUNDED lean near-dup, query 2 of 2 — the VERIFY stream
    * over [[nearDupCandidatesStream]]'s sink plus the document stream:
    * watermark + `dropDuplicatesWithinWatermark` cap the verify work at
    * one row per candidate pair, then two TIME-INTERVAL stream-stream
    * joins (`evt − horizon ≤ gram.ts ≤ evt` — the bound query 1's
    * emission rule guarantees satisfiable) attach the per-doc gram sets
    * and the exact Jaccard filters at the threshold. Every state store
    * here expires at the horizon: the dedup by its watermark, each join
    * by the interval condition — the fully BOUNDED version of
    * [[nearDupPairsStreamLean]]'s horizonless shape.
    *
    * Emission contract: ONCE PER HORIZON, not exactly-once — the
    * watermark dedup only suppresses re-emissions INSIDE its window, so
    * a pair that re-collides after its first emission ages out (e.g. a
    * doc replay refreshing band-member timestamps) emits again. That is
    * the price of bounded state; consumers needing global uniqueness
    * keep a downstream `dropDuplicates` posture (the st14 gate's batch
    * leg does exactly that). The horizonless
    * [[nearDupPairsStreamLean]] IS exactly-once, at unbounded pair-set
    * state. */
  def nearDupVerifyStream(cands: DataFrame, docs: DataFrame, w: Int = 5,
      threshold: Double = 0.8, tsCol: String = "ts",
      horizon: String = "1 hour"): DataFrame = {
    // batch/stream unification (the module's posture): the watermark
    // dedup exists only in streaming — a batch replay dedups plainly
    // (dropDuplicatesWithinWatermark throws on batch frames), and
    // verifyStage's withWatermark is a documented no-op in batch
    val c =
      if (cands.isStreaming)
        cands.withWatermark("evt", horizon)
          .dropDuplicatesWithinWatermark("id_a", "id_b")
      else cands.dropDuplicates("id_a", "id_b")
    verifyStage(c, docs, w, threshold, tsCol = Some(tsCol),
      horizon = horizon)
  }

  /** Run [[nearDupPairsStreamLean]] over the documents parquet as a real
    * streaming query (append-mode memory sink). */
  def runNearDupLeanStream(spark: SparkSession, sfDir: String,
      queryName: String): StreamingQuery = {
    val batchDf = Tables.documents(spark, sfDir)
    val docs = spark.readStream
      .schema(batchDf.schema)
      .option("pathGlobFilter", "documents.parquet")
      .parquet(sfDir)
    nearDupPairsStreamLean(docs)
      .writeStream
      .outputMode(OutputMode.Append())
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** Run [[nearDupPairsStream]] over the documents parquet as a real
    * streaming query (append-mode memory sink). */
  def runNearDupStream(spark: SparkSession, sfDir: String,
      queryName: String): StreamingQuery = {
    val batchDf = Tables.documents(spark, sfDir)
    val docs = spark.readStream
      .schema(batchDf.schema)
      .option("pathGlobFilter", "documents.parquet")
      .parquet(sfDir)
    nearDupPairsStream(docs)
      .writeStream
      .outputMode(OutputMode.Append())
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** Run [[contentDedupStream]] over the documents parquet as a real
    * streaming query draining to a memory sink (append mode: each kept
    * doc_id is emitted exactly once, on first sight). */
  def runContentDedupStream(spark: SparkSession, sfDir: String,
      queryName: String): StreamingQuery = {
    val batchDf = Tables.documents(spark, sfDir)
    val docs = spark.readStream
      .schema(batchDf.schema)
      .option("pathGlobFilter", "documents.parquet")
      .parquet(sfDir)
    contentDedupStream(docs)
      .writeStream
      .outputMode(OutputMode.Append())
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
  }

  private[graft] def rawEventStream(spark: SparkSession,
      sfDir: String): DataFrame = {
    val batchDf = Tables.events(spark, sfDir)
    spark.readStream
      .schema(batchDf.schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(sfDir)
      // same type-adaptive nanos-long / timestamp[us] handling as the
      // batch leg (Tables.eventsWithTs) — the driver has shipped both
      .withColumn("ts_utc", Tables.tsUtcExpr(batchDf.schema))
  }

  private[graft] def eventStream(spark: SparkSession, sfDir: String,
      watermark: String): DataFrame =
    rawEventStream(spark, sfDir).withWatermark("ts_utc", watermark)

  /** Run [[dedupCounts]] as a streaming query: watermark-bounded dedup
    * state feeding a complete-mode aggregation into a memory sink. */
  def runDedupStream(spark: SparkSession, sfDir: String,
      queryName: String): StreamingQuery =
    dedupCounts(eventStream(spark, sfDir, "2 hours"), withinWatermark = true)
      .writeStream
      .outputMode(OutputMode.Complete())
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()

  /** Run [[hourlyAgg]] as a real streaming query over the parquet dir with
    * a watermark, draining to a memory sink (local smoke path). */
  def runHourlyAggStream(spark: SparkSession, sfDir: String,
      queryName: String): StreamingQuery = {
    // events.parquet is a single file; readStream needs a directory →
    // stream the sf dir with a glob filter selecting just the events file.
    hourlyAgg(eventStream(spark, sfDir, "2 hours"))
      .writeStream
      .outputMode(OutputMode.Complete())
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
  }
}
