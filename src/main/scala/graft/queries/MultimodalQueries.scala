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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm01_features" -> (mm01Features _),
    "mm02_frame_sample" -> (mm02FrameSample _))

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
        |FROM v ORDER BY asset_id""".stripMargin)
}
