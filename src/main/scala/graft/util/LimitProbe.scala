package graft.util

import org.apache.spark.sql.Dataset

/** O(limit) smallness test behind every "broadcast / collect only if small
  * enough" guard in the engine.
  *
  * `count()` scans the whole input — on a 100 TB corpus the guard itself
  * would be the bottleneck. `limit(n+1).count()` stops after n+1 rows, so
  * the answer costs O(limit) regardless of input size. A non-positive
  * limit always answers false (callers use that to force the scale path).
  */
object LimitProbe {
  def atMost(df: Dataset[_], limit: Long): Boolean = {
    if (limit <= 0) return false
    val probe = math.min(limit, Int.MaxValue - 1L).toInt
    df.limit(probe + 1).count() <= probe
  }

  /** The counted form: `min(count, limit + 1)` in one O(limit) job — for
    * callers that need BOTH an emptiness test and a smallness guard on
    * the same frame (kCorePeel's per-round fixpoint + broadcast checks),
    * which as two probes cost two scheduling barriers per round. */
  def countAtMost(df: Dataset[_], limit: Long): Long = {
    val probe = math.min(math.max(limit, 0L), Int.MaxValue - 2L).toInt
    df.limit(probe + 1).count()
  }
}
