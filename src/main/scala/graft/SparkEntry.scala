package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

import graft.queries.{CoverageQueries, GraphParityQueries, MultimodalQueries,
  PipelineQueries, RelationalQueries, StreamQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates every operator module's named queries; `oracleSql`
  * carries the DuckDB-equivalent SQL for the hash-compare correctness gate.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RelationalQueries.q01Pricing(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.queries ++ GraphParityQueries.queries ++
      PipelineQueries.queries ++ StreamQueries.queries ++
      MultimodalQueries.queries ++ CoverageQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    RelationalQueries.oracle ++ GraphParityQueries.oracle ++
      PipelineQueries.oracle ++ StreamQueries.oracle ++
      MultimodalQueries.oracle ++ CoverageQueries.oracle
}
