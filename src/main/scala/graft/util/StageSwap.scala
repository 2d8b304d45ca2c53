package graft.util

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame

/** Crash-safe in-place rewrite of a persisted parquet table whose NEW
  * contents are computed FROM its old files (index deletes, compactions):
  * write the frame to a stage sibling first — fully materializing the
  * plan while the old files still exist — then swap directories. The
  * [[graft.graph.GraphStore.save]] idiom, extracted: unlike the
  * localCheckpoint-pin + `mode("overwrite")` alternative it neither
  * materializes the whole surviving table in executor block storage nor
  * leaves a truncated table behind when the writer dies mid-overwrite:
  * a kill before the swap leaves the old table untouched, a kill inside
  * the two-rename swap leaves it recoverable in the `.swap-<table>-old-<uuid>`
  * aside dir, and every rename result is CHECKED (Hadoop FileSystems report
  * most failures by returning false, not throwing).
  *
  * SINGLE WRITER PER TABLE, by contract: the orphan sweep reclaims every
  * `.swap-<table>-*` sibling — including a CONCURRENT rewrite's in-flight
  * stage and its crash-recovery aside for the same table — so two
  * simultaneous rewrites of one table can destroy each other's staged
  * data. This matches the engine-wide posture ([[graft.graph.GraphStore]]
  * documents the same assumption, inherited from the reference's
  * single-writer Flask server); coordinate externally (a lock file, a
  * scheduler) before ever pointing two writers at one table. */
object StageSwap {

  def rewrite(df: DataFrame, dir: String): Unit = {
    val target = new Path(dir)
    val fs = target.getFileSystem(
      df.sparkSession.sparkContext.hadoopConfiguration)
    val stage = stageFor(fs, target)
    df.write.mode("overwrite").parquet(stage.toString)
    promote(fs, stage, target)
  }

  /** Sweep this target's orphans from earlier crashed/failed swaps
    * (each is a full artifact copy, and every rewrite mints a fresh
    * uuid — the prefix scopes the sweep to THIS target, never a
    * sibling's in-flight rewrite under the same parent) and mint a
    * fresh stage directory. The caller materializes the ENTIRE new
    * artifact under the returned path — one parquet table
    * ([[rewrite]]) or a multi-file directory (the contamination
    * index's grams + bloom.bin + meta, whose consistency spans files
    * and therefore needs the whole-dir swap's single visibility
    * point) — then calls [[promote]]. */
  /** The ONE copy of the swap-sibling prefix — the sweep, the stage
    * name and the aside name must agree or crashed promotes leak
    * artifact copies the sweep never reclaims. */
  private def prefix(target: Path): String = s".swap-${target.getName}-"

  def stageFor(fs: org.apache.hadoop.fs.FileSystem,
      target: Path): Path = {
    val pre = prefix(target)
    val siblings = try fs.listStatus(target.getParent) catch {
      case _: java.io.FileNotFoundException => Array.empty[
        org.apache.hadoop.fs.FileStatus]
    }
    siblings.iterator
      .filter(_.getPath.getName.startsWith(pre))
      .foreach(s => fs.delete(s.getPath, true))
    new Path(target.getParent,
      s"${pre}stage-${java.util.UUID.randomUUID()}")
  }

  /** Swap a fully-materialized stage into place via a retained aside
    * dir, checking EVERY rename result — Hadoop FileSystems report
    * most failures by returning false, and a silent false after the
    * old artifact was dropped would lose it. A crash between the two
    * renames leaves the data recoverable in the aside dir (and the
    * next rewrite's sweep reclaims it); a crash anywhere else leaves
    * the live artifact intact. */
  def promote(fs: org.apache.hadoop.fs.FileSystem, stage: Path,
      target: Path): Unit = {
    val tag = java.util.UUID.randomUUID()
    val old = new Path(target.getParent,
      s"${prefix(target)}old-$tag")
    if (fs.exists(target))
      require(fs.rename(target, old), s"could not set aside $target")
    require(fs.rename(stage, target),
      s"could not promote staged rewrite into $target " +
        s"(previous artifact retained at $old)")
    fs.delete(old, true)
    ()
  }
}
