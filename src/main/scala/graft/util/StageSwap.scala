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
  * leaves a truncated table behind when the writer dies mid-overwrite
  * (a kill before the swap leaves the old table untouched; the stage
  * dir is junk to sweep, not corruption). */
object StageSwap {

  def rewrite(df: DataFrame, dir: String): Unit = {
    val target = new Path(dir)
    val fs = target.getFileSystem(
      df.sparkSession.sparkContext.hadoopConfiguration)
    val stage = new Path(target.getParent,
      s".stage-${java.util.UUID.randomUUID()}")
    df.write.mode("overwrite").parquet(stage.toString)
    fs.delete(target, true)
    fs.rename(stage, target)
    ()
  }
}
