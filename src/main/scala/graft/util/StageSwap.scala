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
    // sweep THIS table's orphans from earlier crashed/failed swaps (each
    // is a full table copy, and every rewrite mints a fresh uuid) — the
    // prefix scopes the sweep to this target, never a sibling table's
    // in-flight rewrite under the same parent
    val prefix = s".swap-${target.getName}-"
    val siblings = try fs.listStatus(target.getParent) catch {
      case _: java.io.FileNotFoundException => Array.empty[
        org.apache.hadoop.fs.FileStatus]
    }
    siblings.iterator
      .filter(_.getPath.getName.startsWith(prefix))
      .foreach(s => fs.delete(s.getPath, true))
    val tag = java.util.UUID.randomUUID()
    val stage = new Path(target.getParent, s"${prefix}stage-$tag")
    df.write.mode("overwrite").parquet(stage.toString)
    // swap via a retained aside dir, and check EVERY rename result —
    // Hadoop FileSystems report most failures by returning false, and a
    // silent false after the old table was dropped would lose the index.
    // A crash between the two renames leaves the data recoverable in
    // the aside dir (and the next rewrite's sweep reclaims it); a crash
    // anywhere else leaves the live table intact.
    val old = new Path(target.getParent, s"${prefix}old-$tag")
    if (fs.exists(target))
      require(fs.rename(target, old), s"could not set aside $target")
    require(fs.rename(stage, target),
      s"could not promote staged rewrite into $target " +
        s"(previous table retained at $old)")
    fs.delete(old, true)
    ()
  }
}
