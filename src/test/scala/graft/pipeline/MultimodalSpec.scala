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

  test("ImageIoCodec: gray PNG encode/decode round-trips pixels exactly") {
    val w = 7; val h = 5
    val px = Array.tabulate(w * h)(i => (i * 37 + 11) % 256)
    val png = Multimodal.ImageIoCodec.encodeGrayPng(px, w, h)
    // a REAL PNG byte stream: 8-byte signature
    assert((png(0) & 0xFF) === 0x89 && png(1) === 'P'.toByte &&
      png(2) === 'N'.toByte && png(3) === 'G'.toByte)
    assert(Multimodal.ImageIoCodec.looksLikeImage(png))
    val (dw, dh, out) = Multimodal.ImageIoCodec.decodeGray(png)
    assert(dw === w && dh === h)
    assert(out.toSeq === px.toSeq)
  }

  test("ImageIoCodec: color PNG decodes through integer Rec.601 luma") {
    import java.awt.image.BufferedImage
    val img = new BufferedImage(2, 1, BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0xFF0000) // pure red
    img.setRGB(1, 0, 0x00FF00) // pure green
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val (_, _, px) = Multimodal.ImageIoCodec.decodeGray(bos.toByteArray)
    assert(px.toSeq === Seq((299 * 255 + 500) / 1000, (587 * 255 + 500) / 1000))
  }

  test("extractFeatures routes real PNG payloads through javax.imageio") {
    import spark.implicits._
    val w = 16; val h = 16
    val mkPx = (id: Long) => Array.tabulate(w * h)(i => ((id * 31 + i * 7) % 256).toInt)
    val rows = (0L until 4L).map { id =>
      (id, "image", Multimodal.ImageIoCodec.encodeGrayPng(mkPx(id), w, h),
        (w, h, 1, 0, 1))
    }
    val assets = rows.toDF("asset_id", "modality", "data", "m")
      .select(col("asset_id"), col("modality"), col("data"),
        struct(col("m._1").as("width"), col("m._2").as("height"),
          col("m._3").as("channels"), col("m._4").as("sample_rate"),
          col("m._5").as("n_frames")).as("meta"))
    val feats = Multimodal.extractFeatures(assets).collect()
      .map(r => r.getAs[Long]("asset_id") ->
        r.getAs[scala.collection.Seq[Double]]("features")).toMap
    (0L until 4L).foreach { id =>
      val expected = Multimodal.FakeCodec.features(mkPx(id).map(_ / 255.0))
      assert(feats(id).toSeq === expected.toSeq, s"asset $id")
    }
  }

  test("WavCodec: PCM16 WAV encode/decode round-trips samples exactly") {
    val samples = Array(0, 1, -1, 32767, -32768, 12345, -12345, 255, -256)
    val wav = Multimodal.WavCodec.encodePcm16Wav(samples, 8000)
    assert(Multimodal.WavCodec.looksLikeWav(wav), "output is a RIFF/WAVE")
    assert(!Multimodal.WavCodec.looksLikeWav("RIFFLE text".getBytes), "sniff")
    val (sr, got) = Multimodal.WavCodec.decodePcm16(wav)
    assert(sr === 8000)
    assert(got.toSeq === samples.toSeq)
  }

  test("extractFeatures routes real WAV payloads through javax.sound") {
    import spark.implicits._
    val mkSamples = (id: Long) =>
      Array.tabulate(300)(i => (((id * 37 + i * 113) % 4001) - 2000).toInt)
    val rows = (0L until 3L).map { id =>
      (id, "audio", Multimodal.WavCodec.encodePcm16Wav(mkSamples(id), 16000),
        (16, 16, 1, 16000, 1))
    }
    val assets = rows.toDF("asset_id", "modality", "data", "m")
      .select(col("asset_id"), col("modality"), col("data"),
        struct(col("m._1").as("width"), col("m._2").as("height"),
          col("m._3").as("channels"), col("m._4").as("sample_rate"),
          col("m._5").as("n_frames")).as("meta"))
    val feats = Multimodal.extractFeatures(assets).collect()
      .map(r => r.getAs[Long]("asset_id") ->
        r.getAs[scala.collection.Seq[Double]]("features")).toMap
    (0L until 3L).foreach { id =>
      val expected = Multimodal.FakeCodec.features(
        mkSamples(id).map(s => (s + 32768) / 65536.0))
      assert(feats(id).toSeq === expected.toSeq, s"asset $id")
    }
  }

  test("resizeImages re-encodes real PNGs at the target dimensions") {
    import spark.implicits._
    val w = 16; val h = 16
    val px = Array.tabulate(w * h)(i => (i * 3) % 256)
    val assets = Seq((1L, "image", Multimodal.ImageIoCodec.encodeGrayPng(px, w, h),
        (w, h, 1, 0, 1)))
      .toDF("asset_id", "modality", "data", "m")
      .select(col("asset_id"), col("modality"), col("data"),
        struct(col("m._1").as("width"), col("m._2").as("height"),
          col("m._3").as("channels"), col("m._4").as("sample_rate"),
          col("m._5").as("n_frames")).as("meta"))
    val out = Multimodal.resizeImages(assets, 4, 4).collect()(0)
    val data = out.getAs[Array[Byte]]("data")
    assert(Multimodal.ImageIoCodec.looksLikeImage(data), "output is a real PNG")
    val (dw, dh, dpx) = Multimodal.ImageIoCodec.decodeGray(data)
    assert(dw === 4 && dh === 4)
    val expected = for (y <- 0 until 4; x <- 0 until 4)
      yield px((y * h / 4) * w + (x * w / 4))
    assert(dpx.toSeq === expected)
  }
}
