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
    * then ingest the new contents. */
  def applyBatch(g: CodeGraph, batch: DataFrame): Unit = {
    val keys = batch.select("path").distinct().collect()
      .map(r => r.getString(0))
      .map { p =>
        val (dir, base, ext) = Ingestor.splitPath(p)
        GraphOp.FileKey(dir, base, ext)
      }.toSeq
    if (keys.nonEmpty) {
      g.mutate(GraphOp.DeleteFiles(keys))
      Ingestor.ingest(g, batch)
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
