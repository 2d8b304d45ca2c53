package graft.pipeline

import graft.SparkSpec
import graft.util.Tables
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  test("synthetic assets carry binary payloads with typed metadata") {
    val assets = Multimodal.syntheticAssets(Tables.documents(spark, sfTiny))
    val r = assets.select(col("asset_id"), length(col("data")).as("len"),
      col("meta.width"), col("meta.n_frames")).collect()
    assert(r.length === 500)
    assert(r.forall(_.getAs[Int]("len") > 0))
    assert(r.forall(_.getAs[Int]("width") === 16))
  }

  test("feature extraction yields an 18-dim vector per asset, histogram sums to 1") {
    val assets = Multimodal.syntheticAssets(Tables.documents(spark, sfTiny))
    val feats = Multimodal.extractFeatures(assets).collect()
    assert(feats.length === 500)
    feats.foreach { r =>
      val f = r.getAs[scala.collection.Seq[Double]]("features")
      assert(f.length === 18)
      assert(math.abs(f.take(16).sum - 1.0) < 1e-9, "histogram normalized")
    }
  }

  test("resize rewrites image dimensions and payload size, leaves audio/video") {
    val assets = Multimodal.syntheticAssets(Tables.documents(spark, sfTiny))
    val resized = Multimodal.resizeImages(assets, 8, 8)
    val images = resized.filter(col("modality") === "image")
      .select(length(col("data")), col("meta.width"), col("meta.height")).collect()
    assert(images.forall(r => r.getInt(0) === 64 && r.getInt(1) === 8 && r.getInt(2) === 8))
    val audio = resized.filter(col("modality") === "audio")
      .join(assets.filter(col("modality") === "audio")
          .select(col("asset_id"), length(col("data")).as("orig_len")),
        "asset_id")
      .filter(length(col("data")) =!= col("orig_len"))
    assert(audio.isEmpty, "non-images untouched")
  }

  test("frame sampling respects stride and frame size") {
    val assets = Multimodal.syntheticAssets(Tables.documents(spark, sfTiny))
    val frames = Multimodal.sampleFrames(assets, 4).collect()
    assert(frames.nonEmpty)
    assert(frames.forall(_.getAs[Long]("frame_idx") % 4 === 0))
  }
}
