package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Iterative path/traversal utilities (SURVEY.md §2.3 J6/J7, §4.1).
  *
  * Catalyst has no recursion, so variable-length traversals are a driver
  * loop where each round is one Catalyst-planned distributed join
  * (`MATCH p=(src)-[:CALLS*]->(dest)`, `/root/reference/api/graph.py:547-591`).
  * The loop is the control boundary; all data work stays on executors.
  *
  * Scale: the frontier is a DataFrame — each expansion is a shuffle join of
  * frontier×edges on the join key. We `localCheckpoint` the frontier every
  * round to cut lineage (otherwise plans grow exponentially), and cap
  * unbounded traversals (the reference's unbounded all-paths is an
  * exponential-worst-case anti-goal, BASELINE.md).
  */
object Paths {

  val DefaultMaxHops = 15

  /** Frontier-row bound above which [[expandPaths]] stops force-broadcasting
    * the frontier and falls back to a stats-driven shuffle join. Simple-path
    * sets grow exponentially on wide fan-out graphs, and an oversized forced
    * broadcast is a hard Spark failure (8 GB cap), not a slow query — the
    * same limit-probe idiom as `Dedup.connectedComponents`. ~10⁶ paths of
    * ≤16 longs is a few hundred MB serialized: comfortably broadcastable,
    * far below the cap. */
  val DefaultFrontierBroadcastLimit = 1000000L

  /** Edge-table row bound under which [[expandPaths]] broadcasts the TYPED
    * edge set once per batch and STREAMS the frontier through the chained
    * hop joins (round 17). The round-16 shape broadcast the frontier at
    * every sub-hop, and each sub-hop's broadcast build re-executed the
    * batch's join prefix as its own job (the documented d²/2 recompute),
    * while the batch inherited the edge scan's partitioning — 4 levels ×
    * 32 partitions of near-empty tasks per pin (g04 profile: 44 stages,
    * none over 220 ms, 128-task checkpoints of a handful of path rows).
    * With e as the ONE build side the whole batch is frontier-partitioned
    * narrow work and the only build job is an edge hash shared across the
    * batch's sub-hops by exchange reuse (~10 MB at the bound). A
    * corpus-scale edge set fails the LimitProbe and keeps the round-16
    * shapes — the hint is never unconditional. */
  val EdgeBroadcastLimit = 500000L

  /** Transitive closure: all node IDs reachable from `roots` (inclusive)
    * over `edges` — the `DEFINES*` cascade used by delete_files
    * (`api/graph.py:408-426`). BFS on node-set, not paths: visited-set
    * semantics, terminates on any graph. */
  def reachableFrom(edges: DataFrame, roots: DataFrame): DataFrame = {
    val e = edges.select(col("src"), col("dst")).cache()
    // `visited` stays a lazy union of PINNED frontier levels: each level is
    // localCheckpoint'ed once, so the growing union needs no re-pin per
    // round (one materialization job per level instead of two).
    var visited = roots.select(col("id")).distinct().localCheckpoint(true)
    var frontier = visited
    var done = false
    while (!done) {
      val next = e.join(frontier.withColumnRenamed("id", "src"), Seq("src"), "left_semi")
        .select(col("dst").as("id")).distinct()
        .join(visited, Seq("id"), "left_anti")
        .localCheckpoint(true)
      if (next.isEmpty) done = true
      else {
        visited = visited.union(next)
        frontier = next
      }
    }
    e.unpersist()
    visited
  }

  /** J6 `find_paths` (`api/graph.py:547-591`): all simple paths
    * srcId → dstId over edges of `edgeType`, as `path: Array[Long]` (node
    * IDs, length hops+1). Cycle-safe via `!array_contains(path, next)`;
    * bounded by `maxHops` (documented deviation from the reference's
    * unbounded `[:CALLS*]` — SURVEY §7.4 risk 3). */
  def findPaths(g: PropertyGraph, srcId: Long, dstId: Long,
      edgeType: String = "CALLS",
      maxHops: Int = DefaultMaxHops,
      frontierBroadcastLimit: Long = DefaultFrontierBroadcastLimit): DataFrame = {
    val spark = g.nodes.sparkSession
    expandPaths(spark, g.edges.filter(col("type") === edgeType),
      srcId, Some(dstId), maxHops, frontierBroadcastLimit)
      .filter(element_at(col("path"), -1) === lit(dstId))
  }

  /** J9 bounded variable-length reachability
    * (`tests/endpoints/test_find_paths.py:60-62`: `[:CALLS*3..5]`):
    * all simple paths from srcId with minHops ≤ hops ≤ maxHops. */
  def boundedPaths(g: PropertyGraph, srcId: Long, edgeType: String,
      minHops: Int, maxHops: Int,
      frontierBroadcastLimit: Long = DefaultFrontierBroadcastLimit): DataFrame = {
    val spark = g.nodes.sparkSession
    expandPaths(spark, g.edges.filter(col("type") === edgeType),
      srcId, None, maxHops, frontierBroadcastLimit)
      .filter(col("hops").between(minHops, maxHops))
  }

  /** Hops expanded per driver round-trip in [[expandPaths]]. A long chain's
    * cost is ROUND LATENCY, not data (each hop's frontier is tiny): at one
    * materialization per hop, a 130-hop NEXT chain pays 130 sequential
    * job round-trips (~80 ms each). Chaining `HopsPerJob` joins inside one
    * Catalyst plan before materializing divides the round count by that
    * factor; the at-most `HopsPerJob − 1` extra empty joins after the chain
    * ends are map-side no-ops on an empty frontier. */
  val HopsPerJob = 4
  // Depth 4 is MEASURED, not arbitrary: every level of a batch must be a
  // result row, so the batch is a union of levels 1..d and union branches
  // recompute their join prefix (no cross-branch subexpression reuse in
  // Catalyst) — executed joins grow as d²/2 per batch. On g04's 41-hop
  // chain walk at sf0.1: d=4 → 2.2 s steady-state, d=8 → 4.6 s (fewer
  // round-trips lose to the quadratic recompute).

  /** Core expansion: grow simple paths from `srcId`; paths that reach
    * `target` stop expanding (they are results). Returns all intermediate
    * and terminal paths with their hop counts. */
  private def expandPaths(spark: SparkSession, typedEdges: DataFrame,
      srcId: Long, target: Option[Long], maxHops: Int,
      frontierBroadcastLimit: Long = DefaultFrontierBroadcastLimit): DataFrame = {
    import spark.implicits._
    // null endpoints can never contribute a result row: a null src never
    // matches the hop join, and a (src, null) match is dropped by the
    // cycle filter's null propagation — pruning them up front is
    // result-identical and keeps the local path below free of boxing
    // surprises
    val e0 = typedEdges.select(col("src"), col("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .distinct().cache()
    // one bounded probe decides the batch JOIN SHAPE for the whole walk:
    // a small edge set becomes the build side (see [[EdgeBroadcastLimit]])
    val eSmall = graft.util.LimitProbe.atMost(e0, EdgeBroadcastLimit)
    val e =
      if (eSmall) {
        // pin a narrow copy: each batch's (exchange-reuse-shared) edge
        // broadcast build becomes a 2-task local-block read instead of a
        // 32-task cache scan (~180 ms of pure scheduling per batch,
        // measured on g04). NOT a driver-side LocalRelation — embedding
        // 10⁵ rows in every batch's logical plan moved the cost into
        // Catalyst itself (measured: g04 wall 25 s at 1 s of stages).
        val pinned = e0.coalesce(2).localCheckpoint(true)
        e0.unpersist()
        pinned
      } else e0
    val width = spark.sessionState.conf.numShufflePartitions
    // `acc` stays a lazy union of PINNED per-batch levels (one checkpoint
    // job per HopsPerJob hops — a 130-hop chain walk is ~33 round-trips)
    var acc = Seq((Array(srcId), 0)).toDF("path", "hops").localCheckpoint(true)
    var frontier = acc
    // exact frontier size, refreshed each batch from the pinned level (a
    // count() on an eager localCheckpoint costs the same driver round-trip
    // the old isEmpty() did) — it decides broadcast vs shuffle for free
    var frontierRows = 1L
    var hop = 0
    while (hop < maxHops && frontierRows > 0) {
      // one Catalyst plan covering up to HopsPerJob hops: each sub-hop
      // applies the same target-stop filter and cycle guard as before, and
      // every sub-hop's level is kept (the union below), so the result is
      // row-identical to one-hop-per-job expansion. The broadcast decision
      // is made once per batch from the measured batch-entry size, with
      // 16× headroom for within-batch fan-out growth.
      val useBroadcast = frontierRows <= frontierBroadcastLimit / 16
      // under the edge-broadcast shape the batch runs at the FRONTIER's
      // partitioning; a frontier past the broadcast guard is large, so
      // spread it once per batch (the seed starts 1-partition and
      // broadcast joins preserve partition count — without this a wide
      // fan-out walk would funnel millions of paths through one task)
      var level =
        if (eSmall && !useBroadcast) frontier.repartition(width) else frontier
      var levels = Seq.empty[DataFrame]
      var h = hop
      while (h < maxHops && (h - hop) < HopsPerJob) {
        h += 1
        val expandable = target match {
          case Some(t) => level.filter(element_at(col("path"), -1) =!= lit(t))
          case None => level
        }
        level = expandHop(expandable, e, useBroadcast, eSmall)
        levels = levels :+ level
      }
      val batch = levels.reduce(_ union _).localCheckpoint(true)
      val batchEndHop = h
      // continue from the deepest level; earlier levels are final results.
      // size(path)-1 == hops, so comparing against the carried column keeps
      // this filter literal-free too — but the simple literal compare is a
      // tiny plan; the expensive per-batch codegen was in expandHop (fixed
      // by the data-derived hops column there).
      frontier = batch.filter(col("hops") === lit(batchEndHop))
      frontierRows = frontier.count()
      acc = acc.union(batch)
      hop = batchEndHop
    }
    e.unpersist()
    acc
  }

  /** One hop of simple-path expansion: join the frontier's last node to the
    * edge table, drop cycles, append the new node.
    *
    * The hop counter is DATA-DERIVED (`hops + 1` from the carried column),
    * never a per-call literal: a literal embeds the hop number as a
    * constant in the generated code, so every batch of a long walk
    * compiles a brand-new plan (measured: the 41-hop g04 walk spent ~9 s
    * of its 12.5 s in-suite time re-doing Janino compiles — one per batch
    * — because the changing literals defeat the codegen source cache).
    * With the derived column every batch shares one plan shape per
    * sub-hop depth: compile once in batch 1, reuse for the rest of the
    * walk regardless of codegen-cache pressure from other queries.
    *
    * `useBroadcast` = frontier is measured-small: force a broadcast hash
    * join so the edge table streams instead of re-shuffling on the computed
    * `_last` key every hop (measured ~5 s/hop → sub-second on a 150k-edge
    * chain walk). When the frontier outgrows [[DefaultFrontierBroadcastLimit]]
    * (wide fan-out graphs — simple-path sets grow exponentially) the hint is
    * dropped and Catalyst picks a shuffle join from stats; a forced >8 GB
    * broadcast would be a hard failure. Package-private so
    * PlanInvariantsSpec can assert both shapes. */
  private[graft] def expandHop(expandable: DataFrame, e: DataFrame,
      useBroadcast: Boolean, edgeBroadcast: Boolean = false): DataFrame = {
    val keyed = expandable.withColumn("_last", element_at(col("path"), -1))
    // edgeBroadcast (round 17, [[EdgeBroadcastLimit]]-guarded): the edge
    // set is the build side, the frontier streams — no per-sub-hop
    // frontier broadcast builds, and the batch keeps the frontier's
    // partitioning instead of the edge scan's
    val joined =
      if (edgeBroadcast) keyed.join(broadcast(e), col("_last") === col("src"))
      else {
        val hinted = if (useBroadcast) broadcast(keyed) else keyed
        hinted.join(e, col("_last") === col("src"))
      }
    joined
      .filter(!array_contains(col("path"), col("dst")))
      .select(concat(col("path"), array(col("dst"))).as("path"),
        (col("hops") + 1).as("hops"))
  }

  /** T4 `relationships(path)` (`api/prompts.py:15`; encode_path
    * `api/entities/entity_encoder.py:11-14`): materialize the edge sequence
    * of each path row — (src, dst, type, line, text) structs in hop order.
    * One posexplode + one equi-join on (src, dst) + one grouped
    * `sort_array(collect_list)` — distributed, no driver assembly. */
  def pathRelationships(g: PropertyGraph, paths: DataFrame,
      edgeType: String): DataFrame = {
    val hops = paths.select(col("path"), col("hops"),
        posexplode(slice(col("path"), lit(1), size(col("path")) - 1))
          .as(Seq("pos", "src")))
      .withColumn("dst", element_at(col("path"), col("pos") + 2))
    val e = g.edges.filter(col("type") === lit(edgeType))
      .select(col("src"), col("dst"), col("type"), col("line"), col("text"))
    hops.join(e, Seq("src", "dst"))
      .groupBy(col("path"), col("hops"))
      .agg(sort_array(collect_list(struct(col("pos"), col("src"), col("dst"),
        col("type"), col("line"), col("text")))).as("rels"))
  }

  /** J7 `get_parent_transitions` / `get_child_transitions`
    * (`api/git_utils/git_graph.py:144-177`): walk the linear PARENT/CHILD
    * commit chain from `fromId` to `toId` and return the op-log entries
    * stored on its edges, in traversal order —
    * `UNWIND relationships(path) … WHERE e.queries IS NOT NULL`.
    * Returns (step, queries, params) ordered by step. */
  def chainTransitions(g: PropertyGraph, fromId: Long, toId: Long,
      relType: String, maxHops: Int = 10000): DataFrame = {
    val spark = g.nodes.sparkSession
    import spark.implicits._
    // First-parent history is a linear chain (SURVEY J7), and a repo's
    // commit-edge SKELETON (src, dst) fits in driver memory by construction
    // — so fetch it in one job and walk locally (the per-hop
    // `limit(1).collect()` alternative is one Spark job per commit). The
    // op-log payloads do NOT come along: every edge carries a full commit's
    // serialized mutation batches, so collecting them for the whole history
    // would scale the driver with repo age instead of path length. A second
    // job fetches queries/params for only the walked hops.
    val skeleton = g.edges.filter(col("type") === relType)
      .select(col("src"), col("dst")).collect()
    val nextOf = skeleton.iterator
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val hopOf = scala.collection.mutable.LinkedHashMap.empty[(Long, Long), Int]
    var cur = fromId
    var hop = 0
    var dead = false
    while (cur != toId && hop < maxHops && !dead) {
      nextOf.get(cur) match {
        case None => dead = true // no path
        case Some(nxt) =>
          hopOf((cur, nxt)) = hop
          cur = nxt
          hop += 1
      }
    }
    if (cur != toId)
      return spark.emptyDataset[(Int, Seq[String], Seq[String])]
        .toDF("step", "queries", "params")
    if (hopOf.isEmpty)
      return spark.emptyDataset[(Int, Seq[String], Seq[String])]
        .toDF("step", "queries", "params")
    val walked = hopOf.toSeq.map { case ((s, d), h) => (s, d, h) }
      .toDF("src", "dst", "step")
    val steps = g.edges.filter(col("type") === relType)
      .join(broadcast(walked), Seq("src", "dst"))
      .filter(col("queries").isNotNull)
      .select(col("step").cast("int").as("step"), col("queries"), col("params"))
      .collect()
      .sortBy(_.getAs[Int]("step"))
      .map(r => (r.getAs[Int]("step"),
        Option(r.getAs[scala.collection.Seq[String]]("queries"))
          .map(_.toSeq).orNull,
        Option(r.getAs[scala.collection.Seq[String]]("params"))
          .map(_.toSeq).orNull))
    steps.toSeq.toDF("step", "queries", "params")
  }
}
