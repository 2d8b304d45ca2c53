package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Sharded training-data SINK: deterministic shard assignment + a
  * hive-partitioned JSONL/parquet layout with bounded file sizes — the
  * export step that hands a curated corpus to a training job.
  *
  * Shard id is a pure function of the stable doc id (multiplicative hash
  * mod the 1000003 prime, THEN mod the shard count — the q14/q15 hash
  * family; going through the prime first keeps stride-correlated id
  * spaces, e.g. round-robin-by-source synthetic ids, from collapsing onto
  * a few shards when the shard count shares a factor with the stride).
  * Exact int64 arithmetic → any engine, any partitioning, any rerun
  * reproduces the identical assignment, so resumed or re-run exports never
  * shuffle documents between shards.
  *
  * Scale: assignment is map-side; the write pays ONE shuffle
  * (`repartition(shard)`) so each output shard is written by one task
  * stream, `maxRecordsPerFile` re-rolls files at a bounded size (the
  * training loader's unit of parallelism), and `partitionBy("shard")`
  * lays out `shard=N/` dirs that downstream readers partition-prune. */
object ShardWriter {
  val HashPrime = 1000003L
  val HashMult = 2654435761L

  /** Deterministic shard of an integer id column: int32 in [0, nShards). */
  def shardExpr(id: Column, nShards: Int): Column =
    pmod(pmod(id * lit(HashMult), lit(HashPrime)), lit(nShards)).cast("int")

  def assignShards(df: DataFrame, nShards: Int,
      idCol: String = "doc_id"): DataFrame =
    df.withColumn("shard", shardExpr(col(idCol), nShards))

  /** Write `df` (shard column added here) as hive-partitioned JSONL:
    * `outDir/shard=N/part-*.json`, ≤ maxRecordsPerFile rows per file. */
  def writeJsonl(df: DataFrame, outDir: String, nShards: Int,
      idCol: String = "doc_id", maxRecordsPerFile: Long = 100000L): Unit =
    assignShards(df, nShards, idCol)
      .repartition(col("shard"))
      // sort by (shard, id): the dynamic-partition write REQUIRES ordering
      // by the partition column — a sort on id alone would be discarded
      // (the planner inserts its own Sort on shard above it) and the
      // promised stable per-file id order would not survive the write
      .sortWithinPartitions(col("shard"), col(idCol))
      .write.mode(SaveMode.Overwrite)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy("shard")
      .json(outDir)

  /** Same layout, parquet files (the columnar hand-off). */
  def writeParquet(df: DataFrame, outDir: String, nShards: Int,
      idCol: String = "doc_id", maxRecordsPerFile: Long = 100000L): Unit =
    assignShards(df, nShards, idCol)
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col(idCol)) // see writeJsonl
      .write.mode(SaveMode.Overwrite)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy("shard")
      .parquet(outDir)

  /** Read a JSONL shard layout back with an EXPLICIT schema (never infer —
    * inference is a second full scan; the shard partition column comes from
    * the directory names). */
  def readJsonl(spark: SparkSession, outDir: String,
      schema: StructType): DataFrame =
    spark.read.schema(schema).json(outDir)
}
