package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}

import scala.collection.mutable.ArrayBuffer

/** Stateful facade over one repo graph — the Spark-native equivalent of the
  * reference's `Graph` class (`/root/reference/api/graph.py`).
  *
  * Holds the current snapshot, applies mutations through
  * [[Mutations.applyOp]], and implements the backlog protocol (C8,
  * `api/graph.py:92-171`): when enabled, any op whose [[ChangeSummary]]
  * reports a change is recorded (serialized via [[OpLog]]) — this feeds the
  * git time-travel machinery (SURVEY §2.6 F5/F6).
  *
  * Mutations checkpoint the snapshot every few ops to keep plan lineage
  * bounded (read-modify-write chains otherwise nest plans indefinitely).
  */
final class CodeGraph(val spark: SparkSession, val name: String,
    store: Option[GraphStore] = None) {

  private var current: PropertyGraph =
    store.filter(_.exists(name)).map(_.load(name)).getOrElse(GraphSchema.empty(spark))
  private var opsSinceCheckpoint = 0

  // ---- backlog (C8) --------------------------------------------------
  private var backlogEnabled = false
  private val backlog = ArrayBuffer.empty[String]

  def enableBacklog(): Unit = { backlogEnabled = true }
  def disableBacklog(): Unit = { backlogEnabled = false }
  def clearBacklog(): Unit = backlog.clear()
  def getBacklog: Seq[String] = backlog.toSeq

  def graph: PropertyGraph = current

  /** Apply one op, log it if it changed anything (change detection mirrors
    * `api/graph.py:152-169`), and return the affected rows. */
  def mutate(op: GraphOp): MutationResult = {
    val res = Mutations.applyOp(current, op)
    current = res.graph
    opsSinceCheckpoint += 1
    if (opsSinceCheckpoint >= 4) { // bound lineage growth
      current = current.checkpointed()
      opsSinceCheckpoint = 0
    }
    if (backlogEnabled && res.summary.changed) backlog += OpLog.encode(op)
    res
  }

  /** M11 `rerun_query` (`api/graph.py:540-545`): replay serialized ops. */
  def rerun(opJson: String): MutationResult = mutate(OpLog.decode(opJson))

  /** Batch mutation entry points (ingest path — one job per batch, not one
    * round-trip per entity; SURVEY §3.1 Spark trace). Batches are applied
    * directly (not through the op-log — the reference only backlogs its
    * fixed per-entity query set during history replay). */
  def addEntities(batch: DataFrame): MutationResult =
    track(Mutations.addEntities(current, batch))
  def addFiles(batch: DataFrame): MutationResult =
    track(Mutations.addFiles(current, batch))
  def connectEntities(batch: DataFrame): MutationResult =
    track(Mutations.connectEntities(current, batch))
  def addCalls(batch: DataFrame): MutationResult =
    track(Mutations.addCalls(current, batch))

  /** Force-materialize the current snapshot (cuts lineage; call after a
    * bulk build phase so later actions don't replay ID assignment). */
  def checkpointNow(): Unit = {
    current = current.checkpointed()
    opsSinceCheckpoint = 0
  }

  private def track(res: MutationResult): MutationResult = {
    current = res.graph
    opsSinceCheckpoint += 1
    // every-op checkpointing measured 6x SLOWER on bulk builds (the eager
    // materialization defeats plan reuse across the mutation's own joins);
    // interval-4 plus an explicit checkpointNow() after build phases wins.
    if (opsSinceCheckpoint >= 4) {
      current = current.checkpointed(); opsSinceCheckpoint = 0
    }
    res
  }

  def save(): Unit = store.foreach(_.save(name, current))
}
