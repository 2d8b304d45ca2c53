package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.graph.{CodeGraph, GraphOp}
import graft.ingest.Ingestor

/** Streaming incremental ingest — a capability the reference lacks: it
  * re-analyzes in batch per request/commit (`api/index.py:330-417`), while
  * here a stream of changed source files keeps the graph current.
  *
  * Each micro-batch applies the history-walk update semantics
  * (`/root/reference/api/git_utils/git_utils.py:150-170`: delete changed
  * files, then re-analyze them) through the SAME batch mutation engine —
  * op-log capture, deterministic IDs, and cross-file resolution against
  * the full graph all hold for streamed updates exactly as for batch ones.
  *
  * Scale: the per-batch work is the two-pass batch ingest (parallel
  * extraction + join-based resolution); only the batch's distinct file
  * KEYS are collected to the driver for the delete op-log entry. The
  * single-writer discipline matches the engine's storage contract —
  * `foreachBatch` runs micro-batches sequentially.
  */
object StreamingIngest {

  /** Apply one batch of (path, source) rows: delete stale versions of the
    * named files (cascading through DEFINES, dropping dangling edges),
    * then ingest the new contents.
    *
    * Delete keys use the same LOGICAL path the ingestor stores file nodes
    * under (jsonl-delivered files strip the `.jsonl` transport suffix) —
    * keying on the raw streamed path would no-op the delete and leave the
    * previous version's entities in the graph.
    *
    * If a path appears more than once in a batch (two edits inside one
    * trigger interval), only ONE deterministic row per path is applied:
    * micro-batch rows carry no order, so "latest" is undefined without a
    * version column — the row with the greatest source text wins. Callers
    * that need true last-wins should aggregate versions upstream. */
  def applyBatch(g: CodeGraph, batch: DataFrame): Unit = {
    import org.apache.spark.sql.functions.{col, max_by}
    val onePerPath = batch
      .groupBy(col("path"))
      .agg(max_by(col("source"), col("source")).as("source"))
    val keys = onePerPath.select("path").collect()
      .map(r => r.getString(0))
      .map { p =>
        val logical =
          if (graft.ingest.JsonlFrontend.extensions
              .contains(Ingestor.splitPath(p)._3))
            graft.ingest.JsonlFrontend.logicalPath(p)
          else p
        val (dir, base, ext) = Ingestor.splitPath(logical)
        GraphOp.FileKey(dir, base, ext)
      }.toSeq
    if (keys.nonEmpty) {
      g.mutate(GraphOp.DeleteFiles(keys))
      Ingestor.ingest(g, onePerPath)
    }
  }

  /** Start the stream: `files` is a streaming DataFrame of
    * (path: string, source: string). */
  def start(g: CodeGraph, files: DataFrame,
      checkpointDir: String): StreamingQuery =
    files.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("update")
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        applyBatch(g, batch.toDF())
      }
      .start()
}
