package graft.util

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LeafNode, LogicalPlan, Project}

/** Guarded input-parallelism spread for CPU-bound per-row kernels.
  *
  * A narrow file scan (one row group → one partition) serializes an
  * expensive per-row kernel (n-grams, minhash, cosine loops) on a single
  * core while the rest of the cluster idles. [[apply]] repartitions such an
  * input to the cluster's default parallelism — and deliberately does
  * NOTHING otherwise:
  *
  *  - only scan-shaped plans (a leaf, optionally under Project/Filter) are
  *    probed: those are the only shapes that can be narrow, and their
  *    partition count is computable without running jobs. Anything deeper
  *    (a join, window, aggregate upstream) already carries shuffle
  *    parallelism, and probing it via `df.rdd` under AQE would eagerly
  *    execute its query stages — work a separate action could not reuse;
  *  - a scan that already has at least `defaultParallelism` splits is left
  *    alone, so at real scale (many files / row groups) this is a no-op
  *    and no extra shuffle is introduced.
  */
object Spread {
  private def scanShaped(p: LogicalPlan): Boolean = p match {
    case _: LeafNode => true
    case Project(_, child) => scanShaped(child)
    case Filter(_, child) => scanShaped(child)
    case _ => false
  }

  def apply(df: DataFrame): DataFrame = {
    val cores = df.sparkSession.sparkContext.defaultParallelism
    if (scanShaped(df.queryExecution.optimizedPlan) &&
        df.rdd.getNumPartitions < cores)
      df.repartition(cores)
    else df
  }
}
