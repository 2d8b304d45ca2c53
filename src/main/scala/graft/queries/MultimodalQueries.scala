package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.pipeline.Multimodal
import graft.util.Tables

/** Driver-gate entries for the multimodal plumbing. The decode itself is a
  * deterministic stub ([[Multimodal.FakeCodec]]); the oracle checks the
  * Spark-side plumbing that IS real: schema derivation, modality routing,
  * per-partition batch transform fan-out, frame explosion arithmetic. */
object MultimodalQueries {

  /** mm01 — feature extraction fan-out: every asset yields one fixed-width
    * feature row through the mapPartitions batch path. */
  def mm01Features(spark: SparkSession, d: String): DataFrame = {
    val assets = Multimodal.syntheticAssets(Tables.documents(spark, d))
      .repartition(8) // parallel decode task sizing
    Multimodal.extractFeatures(assets)
      .select(col("asset_id"), col("modality"),
        size(col("features")).cast("long").as("n_features"))
      .orderBy(col("asset_id"))
  }

  /** mm02 — video frame sampling: stride-4 frame explosion counts. */
  def mm02FrameSample(spark: SparkSession, d: String): DataFrame = {
    val assets = Multimodal.syntheticAssets(Tables.documents(spark, d))
    Multimodal.sampleFrames(assets, 4)
      .groupBy(col("asset_id"))
      .agg(count(lit(1)).as("n_sampled"),
        sum(length(col("frame_bytes")).cast("long")).as("n_bytes"))
      .orderBy(col("asset_id"))
  }

  /** mm03 — training-sample assembly: join text, embedding, and media
    * payload into one packed record per doc, shard deterministically
    * (doc_id mod 8 — reproducible on any engine, unlike a hash-mod), and
    * report integer-exact per-shard sizes. This is the "build training
    * shards" stage of a multimodal pipeline: three equi-joins + one
    * grouped aggregation, no driver-side assembly. */
  def mm03SampleAssembly(spark: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(spark, d)
    val emb = Tables.embeddings(spark, d)
      .select(col("vec_id").as("doc_id"), col("embedding"))
    val assets = Multimodal.syntheticAssets(docs)
      .select(col("asset_id").as("doc_id"), col("modality"), col("data"))
    val samples = docs.join(emb, "doc_id").join(assets, "doc_id")
      .select(pmod(col("doc_id"), lit(8)).cast("int").as("shard"),
        struct(col("text"), col("embedding"), col("modality"), col("data"))
          .as("sample"))
    samples.groupBy(col("shard"))
      .agg(count(lit(1)).as("n_samples"),
        sum(length(col("sample.text")).cast("long")).as("text_bytes"),
        sum(size(col("sample.embedding")).cast("long")).as("emb_dims"),
        sum(length(col("sample.data")).cast("long")).as("payload_bytes"))
      .orderBy(col("shard"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm01_features" -> (mm01Features _),
    "mm02_frame_sample" -> (mm02FrameSample _),
    "mm03_sample_assembly" -> (mm03SampleAssembly _))

  val oracle: Map[String, String] = Map(
    "mm01_features" ->
      """SELECT doc_id AS asset_id,
        |  CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image'
        |       WHEN 1 THEN 'audio' ELSE 'video' END AS modality,
        |  CAST(18 AS BIGINT) AS n_features
        |FROM documents ORDER BY asset_id""".stripMargin,
    "mm02_frame_sample" ->
      """WITH v AS (
        |  SELECT doc_id AS asset_id, length(text) AS len,
        |    greatest(length(text) // 64, 1) AS n_frames
        |  FROM documents WHERE doc_id % 3 = 2)
        |SELECT asset_id,
        |  CAST((n_frames - 1) // 4 + 1 AS BIGINT) AS n_sampled,
        |  -- every sampled frame index f <= n_frames-1 has a full 64-byte
        |  -- slice (len >= 64*n_frames), except docs shorter than one frame
        |  CAST(CASE WHEN len < 64 THEN len
        |            ELSE 64 * ((n_frames - 1) // 4 + 1) END AS BIGINT)
        |    AS n_bytes
        |FROM v ORDER BY asset_id""".stripMargin,
    "mm03_sample_assembly" ->
      // the synthetic payload is the UTF-8 text bytes (ASCII corpus:
      // char length == byte length, as mm02's oracle already relies on)
      """SELECT CAST(doc_id % 8 AS INT) AS shard,
        |  COUNT(*) AS n_samples,
        |  SUM(length(text))::BIGINT AS text_bytes,
        |  SUM(len(embedding))::BIGINT AS emb_dims,
        |  SUM(length(text))::BIGINT AS payload_bytes
        |FROM documents JOIN embeddings ON doc_id = vec_id
        |GROUP BY 1 ORDER BY 1""".stripMargin)
}
