package graft.graph

import org.apache.hadoop.fs.{FileSystem, FileUtil, Path}
import org.apache.spark.sql.{SaveMode, SparkSession}

/** Parquet warehouse: one directory per repo graph (SURVEY.md §1.6).
  *
  * Mirrors the reference's catalog surface (`/root/reference/api/graph.py`):
  *  - C1 `graph_exists` (`api/graph.py:12-18`)      -> [[exists]]
  *  - C2 `get_repos` (`api/graph.py:20-32`)         -> [[listRepos]]
  *  - C6 `clone` (`api/graph.py:64-83`)             -> [[cloneGraph]]
  *  - C7 `delete` (`api/graph.py:86-90`)            -> [[delete]]
  * plus the `{name}_info` Redis hash (`api/info.py:9-45`) as a tiny JSON
  * file per repo ([[setInfo]]/[[getInfo]]).
  *
  * Writes are staged to a temp dir then atomically renamed into place
  * (read-modify-write discipline, SURVEY §4.2): readers of the old snapshot
  * keep a consistent view; the single-writer assumption matches the
  * reference (Flask dev server, no cross-query transactions).
  *
  * Scale: per-repo directories shard naturally; at 100 TB a repo's
  * `nodes`/`edges` are partitioned parquet dirs and the same swap protocol
  * applies per partition.
  */
final class GraphStore(spark: SparkSession, val warehouse: String) {

  private def fs: FileSystem =
    new Path(warehouse).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def repoDir(name: String) = new Path(warehouse, name)
  private def nodesDir(name: String) = new Path(repoDir(name), "nodes")
  private def edgesDir(name: String) = new Path(repoDir(name), "edges")
  private def infoFile(name: String) = new Path(repoDir(name), "info.json")

  /** C1: does the graph exist? (`api/graph.py:12-18`) */
  def exists(name: String): Boolean = fs.exists(nodesDir(name))

  /** C2: list repos, filtering auxiliary `_git`/`_schema`/`_tmp` graphs
    * (`api/graph.py:20-32`). */
  def listRepos(): Seq[String] = {
    if (!fs.exists(new Path(warehouse))) return Seq.empty
    fs.listStatus(new Path(warehouse)).toIndexedSeq
      .filter(_.isDirectory)
      .map(_.getPath.getName)
      .filterNot(n => n.endsWith("_git") || n.endsWith("_schema") || n.endsWith("_tmp"))
      .sorted
  }

  /** Load a snapshot. `next_id` is restored from the info file when the
    * graph was saved by this engine: ID assignment must be a pure function
    * of the mutation history, NOT of the current `max(id)` — after a
    * delete removed the top IDs, a max-scan would re-issue them, and a
    * replayed op-log whose captured edges reference the originals would
    * silently mis-wire (op-log capture/replay divergence). */
  def load(name: String): PropertyGraph =
    if (!exists(name)) GraphSchema.empty(spark)
    else PropertyGraph(
      spark.read.schema(GraphSchema.nodeSchema).parquet(nodesDir(name).toString),
      spark.read.schema(GraphSchema.edgeSchema).parquet(edgesDir(name).toString),
      nextIdHint = getInfo(name).get("next_id").map(_.toLong))

  /** Persist a snapshot with stage-then-swap (atomic per table).
    *
    * Physical layout (SURVEY §4): edges are hive-partitioned by `type` —
    * every traversal filters on edge type (J1–J8, the DEFINES* cascade), so
    * the scan prunes whole directories instead of reading and filtering —
    * and sorted by `src` within files for parquet min/max row-group
    * pruning on source-id probes. The `repartition(type)` keeps one file
    * per type here; at warehouse scale it becomes
    * `repartition(N, type, src)` for N files per type with disjoint src
    * ranges, same layout contract. */
  def save(name: String, g: PropertyGraph): Unit = {
    import org.apache.spark.sql.functions.col
    val stage = new Path(repoDir(name), s".stage-${java.util.UUID.randomUUID()}")
    val stagedNodes = new Path(stage, "nodes")
    val stagedEdges = new Path(stage, "edges")
    // Materialize BEFORE dropping the old dirs: the new snapshot's plan may
    // read the old files (read-modify-write).
    GraphSchema.conform(g.nodes, GraphSchema.nodeSchema)
      .write.mode(SaveMode.Overwrite).parquet(stagedNodes.toString)
    GraphSchema.conform(g.edges, GraphSchema.edgeSchema)
      .repartition(col("type"))
      // the writer REQUIRES an ordering prefixed by the partition columns;
      // sorting by (type, src) satisfies it, so no extra writer-inserted
      // sort can destroy the src order that row-group pruning relies on
      .sortWithinPartitions(col("type"), col("src"))
      .write.partitionBy("type")
      .mode(SaveMode.Overwrite).parquet(stagedEdges.toString)
    // checked aside-swap per table (the util.StageSwap posture): Hadoop
    // FileSystems report most rename failures by returning FALSE — the
    // old delete-then-unchecked-rename would silently lose the graph on
    // one. The asides live INSIDE the stage dir, so the final cleanup
    // sweeps them; a kill between the two table swaps still leaves a
    // mixed snapshot (the documented atomic-PER-TABLE contract), but
    // never a missing or truncated one.
    def swapIn(staged: Path, target: Path, aside: Path): Unit = {
      if (fs.exists(target))
        require(fs.rename(target, aside), s"could not set aside $target")
      require(fs.rename(staged, target),
        s"could not promote $staged into $target " +
          s"(previous table retained at $aside)")
    }
    swapIn(stagedNodes, nodesDir(name), new Path(stage, "old-nodes"))
    swapIn(stagedEdges, edgesDir(name), new Path(stage, "old-edges"))
    fs.delete(stage, true)
    // sweep stage dirs leaked by EARLIER crashed saves only now, after
    // the new snapshot is live: a crashed save's stage dir may hold the
    // graph's ONLY copy (its old-table asides, when the crash hit inside
    // the two-rename swap) — sweeping before promotion would destroy the
    // recovery copy and a subsequent failure would lose the graph. After
    // a successful swap the live tables supersede every aside, so the
    // sweep (scoped to this repo's dir, safe under the documented
    // single-writer-per-graph contract) reclaims them without a window.
    fs.listStatus(repoDir(name)).iterator
      .filter(_.getPath.getName.startsWith(".stage-"))
      .foreach(s => fs.delete(s.getPath, true))
    // persist the ID high-water mark (see load) — monotone across deletes
    g.nextIdHint.foreach(h => setInfo(name, Map("next_id" -> h.toString)))
  }

  /** C6: copy a whole graph under a new name (`api/graph.py:64-83`). */
  def cloneGraph(from: String, to: String): Unit = {
    require(exists(from), s"no such graph: $from")
    fs.delete(repoDir(to), true)
    FileUtil.copy(fs, repoDir(from), fs, repoDir(to), false,
      spark.sparkContext.hadoopConfiguration)
  }

  /** C7: drop a graph (`api/graph.py:86-90`). */
  def delete(name: String): Unit = fs.delete(repoDir(name), true)

  /** `{name}_info` hash: `commit` / `repo_url` (`api/info.py:32-88`). */
  def setInfo(name: String, kv: Map[String, String]): Unit = {
    val merged = getInfo(name) ++ kv
    val json = OpLog.mapper.writeValueAsString(merged)
    fs.mkdirs(repoDir(name))
    val out = fs.create(infoFile(name), true)
    try out.write(json.getBytes("UTF-8")) finally out.close()
  }

  def getInfo(name: String): Map[String, String] = {
    if (!fs.exists(infoFile(name))) return Map.empty
    val in = fs.open(infoFile(name))
    try {
      val bytes = new java.io.ByteArrayOutputStream()
      org.apache.hadoop.io.IOUtils.copyBytes(in, bytes, 4096, false)
      OpLog.readStringMap(bytes.toString("UTF-8"))
    } finally in.close()
  }
}
