package graft.pipeline

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.SparkSpec
import graft.util.Tables

/** Sharded corpus sink: deterministic assignment, lossless JSONL/parquet
  * round trip, hive shard layout, bounded file sizes. */
class ShardWriterSpec extends SparkSpec {

  private val docSchema = StructType.fromDDL(
    "doc_id LONG, text STRING, lang STRING, source STRING, " +
      "n_chars LONG, shard INT")

  test("shard assignment is deterministic and in range") {
    val docs = Tables.documents(spark, sfTiny)
    val a = ShardWriter.assignShards(docs, 8)
      .select("doc_id", "shard").collect().map(r => r.getLong(0) -> r.getInt(1))
    val b = ShardWriter.assignShards(docs, 8)
      .select("doc_id", "shard").collect().map(r => r.getLong(0) -> r.getInt(1))
    assert(a.toMap === b.toMap)
    assert(a.forall { case (_, s) => s >= 0 && s < 8 })
    // the prime-first hash spreads stride-correlated ids: all 8 shards hit
    assert(a.map(_._2).distinct.length === 8)
  }

  test("JSONL round trip is lossless and lays out shard dirs") {
    val out = Files.createTempDirectory("shards_json").toAbsolutePath.toString
    val docs = Tables.documents(spark, sfTiny)
    ShardWriter.writeJsonl(docs, out, nShards = 8)
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory)
      .map(_.getName).toSet
    assert(dirs === (0 until 8).map(i => s"shard=$i").toSet)
    val back = ShardWriter.readJsonl(spark, out, docSchema)
    assert(back.count() === docs.count())
    val orig = docs.select("doc_id", "text", "lang", "source", "n_chars")
      .collect().map(_.toSeq).toSet
    val rt = back.select("doc_id", "text", "lang", "source", "n_chars")
      .collect().map(_.toSeq).toSet
    assert(rt === orig)
    // read-back shard equals the recomputed assignment for every doc
    val mismatch = back
      .withColumn("expect", ShardWriter.shardExpr(col("doc_id"), 8))
      .filter(col("shard") =!= col("expect")).count()
    assert(mismatch === 0L)
  }

  test("maxRecordsPerFile bounds shard file sizes") {
    val out = Files.createTempDirectory("shards_cap").toAbsolutePath.toString
    ShardWriter.writeJsonl(Tables.documents(spark, sfTiny), out,
      nShards = 4, maxRecordsPerFile = 50L)
    val shard0 = new java.io.File(out, "shard=0").listFiles()
      .filter(f => f.isFile && f.getName.startsWith("part-"))
    // 500 docs / 4 shards ≈ 125 rows → at least 3 files of ≤ 50
    assert(shard0.length >= 3)
    val counts = spark.read.schema(docSchema).json(out + "/shard=0")
    assert(counts.count() > 100L)
  }

  test("parquet layout round-trips and partition-prunes on shard") {
    val out = Files.createTempDirectory("shards_parq").toAbsolutePath.toString
    val docs = Tables.documents(spark, sfTiny)
    ShardWriter.writeParquet(docs, out, nShards = 8)
    val back = spark.read.parquet(out)
    assert(back.count() === docs.count())
    val pruned = back.filter(col("shard") === 3)
    val scan = pruned.queryExecution.executedPlan.toString
    // partition filter must reach the scan, not a post-scan Filter
    assert(scan.contains("PartitionFilters") &&
      scan.contains("shard"), scan.take(2000))
    assert(pruned.count() ===
      ShardWriter.assignShards(docs, 8).filter(col("shard") === 3).count())
  }
}
