package graft.pipeline

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing for training-data pipelines (builder north
  * star): image/audio/video as opaque `binary` columns with typed metadata,
  * decode / feature-extract / resize / frame-sample as per-partition batch
  * transforms.
  *
  * IMAGE decode is REAL: [[ImageIoCodec]] decodes PNG/JPEG/BMP payloads
  * with `javax.imageio` (ships with the JDK — no external codec needed)
  * and re-encodes lossless grayscale PNG. Payloads are sniffed by magic
  * bytes; anything that is not a recognizable image container (audio,
  * video, the synthetic text-byte fixtures) falls back to [[FakeCodec]],
  * the deterministic stand-in for the codecs that genuinely are not in
  * this container (ffmpeg-class audio/video). Everything around the
  * codecs is container-agnostic: the asset schema, binary handling,
  * partitioning for parallel decode, the mapPartitions batch shape (the
  * Scala equivalent of a Pandas UDF over `mapInPandas`: one iterator of
  * rows per partition, vectorizable per-batch work, no per-row driver
  * involvement).
  *
  * Scale: decode is embarrassingly parallel; `repartition(n)` sizes decode
  * tasks; feature vectors stay columnar (`array<double>`) and feed the
  * [[Similarity]] operators directly.
  */
object Multimodal {

  val assetSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false), // image|audio|video
    StructField("data", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("channels", IntegerType),
      StructField("sample_rate", IntegerType),
      StructField("n_frames", IntegerType))))))

  /** REAL image codec over `javax.imageio` (in the JDK, works offline):
    * grayscale PNG encode + PNG/JPEG/BMP decode to 8-bit gray pixels.
    * PNG is lossless, so encode→decode round-trips pixels exactly — the
    * property the mm04 gate checks end-to-end against a DuckDB replay of
    * the synthesized bitmaps. */
  object ImageIoCodec {
    import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
    import java.awt.image.BufferedImage

    /** Magic-byte sniff for containers javax.imageio handles. Only
      * signatures whose lead byte cannot open ASCII/UTF-8 text are
      * sniffed in the generic pipeline (PNG 0x89…, JPEG 0xFFD8FF), so a
      * text payload can never be misrouted; BMP ("BM", valid ASCII) is
      * honored only when longer than any plausible text preamble check —
      * callers with real BMPs use the codec API directly. */
    def looksLikeImage(data: Array[Byte]): Boolean =
      data != null && data.length >= 8 &&
        (((data(0) & 0xFF) == 0x89 && data(1) == 'P' && data(2) == 'N' &&
            data(3) == 'G') ||
          ((data(0) & 0xFF) == 0xFF && (data(1) & 0xFF) == 0xD8 &&
            (data(2) & 0xFF) == 0xFF))

    /** Encode 8-bit gray pixels (row-major, 0–255) as a lossless PNG. */
    def encodeGrayPng(pixels: Array[Int], w: Int, h: Int): Array[Byte] = {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
      img.getRaster.setSamples(0, 0, w, h, 0, pixels)
      val bos = new ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }

    /** Decode any imageio-supported container (PNG/JPEG/BMP/GIF) to
      * (width, height, 8-bit gray pixels). Single-band rasters read
      * directly; color images fold through integer Rec.601 luma. */
    def decodeGray(bytes: Array[Byte]): (Int, Int, Array[Int]) = {
      val img = javax.imageio.ImageIO.read(new ByteArrayInputStream(bytes))
      require(img != null, "imageio could not decode payload")
      val w = img.getWidth; val h = img.getHeight
      val out = new Array[Int](w * h)
      if (img.getRaster.getNumBands == 1) {
        img.getRaster.getSamples(0, 0, w, h, 0, out)
      } else {
        var y = 0; var idx = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            val r = (rgb >> 16) & 0xFF; val g = (rgb >> 8) & 0xFF
            val b = rgb & 0xFF
            out(idx) = (299 * r + 587 * g + 114 * b + 500) / 1000
            idx += 1; x += 1
          }
          y += 1
        }
      }
      (w, h, out)
    }

    /** Real nearest-neighbor resize: decode, subsample, re-encode PNG. */
    def resizePng(bytes: Array[Byte], w2: Int, h2: Int): Array[Byte] = {
      val (w, h, px) = decodeGray(bytes)
      val out = new Array[Int](w2 * h2)
      var y = 0
      while (y < h2) {
        var x = 0
        while (x < w2) {
          out(y * w2 + x) = px((y * h / h2) * w + (x * w / w2))
          x += 1
        }
        y += 1
      }
      encodeGrayPng(out, w2, h2)
    }
  }

  /** REAL audio codec over `javax.sound.sampled` (in the JDK, works
    * offline): 16-bit mono PCM WAV encode + decode. WAV PCM is lossless,
    * so encode→decode round-trips samples exactly — the property the
    * mm05 gate checks end-to-end against a DuckDB replay of the
    * synthesized waveforms. */
  object WavCodec {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat,
      AudioInputStream, AudioSystem}

    /** RIFF/WAVE container sniff. */
    def looksLikeWav(data: Array[Byte]): Boolean =
      data != null && data.length >= 12 &&
        data(0) == 'R' && data(1) == 'I' && data(2) == 'F' &&
        data(3) == 'F' && data(8) == 'W' && data(9) == 'A' &&
        data(10) == 'V' && data(11) == 'E'

    /** Encode signed 16-bit mono samples as a PCM WAV container. */
    def encodePcm16Wav(samples: Array[Int], sampleRate: Int): Array[Byte] = {
      val bytes = new Array[Byte](samples.length * 2)
      var i = 0
      while (i < samples.length) {
        val s = samples(i)
        bytes(2 * i) = (s & 0xFF).toByte
        bytes(2 * i + 1) = ((s >> 8) & 0xFF).toByte
        i += 1
      }
      val fmt = new AudioFormat(sampleRate.toFloat, 16, 1, true, false)
      val ais = new AudioInputStream(
        new java.io.ByteArrayInputStream(bytes), fmt, samples.length.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }

    /** Decode a 16-bit mono PCM WAV to (sampleRate, samples). */
    def decodePcm16(bytes: Array[Byte]): (Int, Array[Int]) = {
      val ais = AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val fmt = ais.getFormat
      require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1,
        s"expected 16-bit mono PCM, got $fmt")
      val data = ais.readAllBytes()
      val n = data.length / 2
      val out = new Array[Int](n)
      var i = 0
      while (i < n) {
        // WAV PCM16 is little-endian: signed high byte, unsigned low
        out(i) = (data(2 * i + 1).toInt << 8) | (data(2 * i) & 0xFF)
        i += 1
      }
      (fmt.getSampleRate.toInt, out)
    }
  }

  /** Deterministic fake media codec — STUB standing in for the
    * video codecs (ffmpeg-class) that are not in this container; image
    * payloads take the real [[ImageIoCodec]] path, WAV audio the real
    * [[WavCodec]] path. Real systems swap this object out; signatures
    * stay. */
  object FakeCodec {
    /** "Decode" = interpret bytes as grayscale pixels row-major. */
    def decode(data: Array[Byte], width: Int, height: Int): Array[Double] = {
      val n = math.min(data.length, width * height)
      val px = new Array[Double](width * height)
      var i = 0
      while (i < n) { px(i) = (data(i) & 0xFF) / 255.0; i += 1 }
      px
    }

    /** Feature extraction stub: 16-bin intensity histogram + mean/var. */
    def features(pixels: Array[Double]): Array[Double] = {
      val hist = new Array[Double](16)
      var sum = 0.0; var sumSq = 0.0
      pixels.foreach { p =>
        val b = math.min((p * 16).toInt, 15)
        hist(b) += 1.0; sum += p; sumSq += p * p
      }
      val n = math.max(pixels.length, 1)
      val mean = sum / n
      hist.map(_ / n) ++ Array(mean, sumSq / n - mean * mean)
    }

    /** Resize stub: nearest-neighbor subsample of the fake pixel grid. */
    def resize(data: Array[Byte], w: Int, h: Int, w2: Int, h2: Int): Array[Byte] = {
      val out = new Array[Byte](w2 * h2)
      var y = 0
      while (y < h2) {
        var x = 0
        while (x < w2) {
          val sx = x * w / w2; val sy = y * h / h2
          val idx = sy * w + sx
          out(y * w2 + x) = if (idx < data.length) data(idx) else 0
          x += 1
        }
        y += 1
      }
      out
    }
  }

  /** Build a deterministic synthetic asset table from the documents table
    * (text bytes stand in for media payloads) — lets the plumbing be
    * exercised on the driver's fixtures without real media. */
  def syntheticAssets(docs: DataFrame): DataFrame = {
    val withMod = docs.select(
      col("doc_id").as("asset_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("modality"),
      encode(col("text"), "UTF-8").as("data"),
      struct(
        lit(16).as("width"),
        greatest((length(col("text")) / 16).cast("int"), lit(1)).as("height"),
        lit(1).as("channels"),
        lit(16000).as("sample_rate"),
        greatest((length(col("text")) / 64).cast("int"), lit(1)).as("n_frames"))
        .as("meta"))
    withMod
  }

  /** Per-partition batched feature extraction (mapInPandas-equivalent):
    * binary in → fixed-width `array<double>` feature column out. */
  def extractFeatures(assets: DataFrame): DataFrame = {
    val spark = assets.sparkSession
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("modality", StringType),
      StructField("features", ArrayType(DoubleType))))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    assets.select(col("asset_id"), col("modality"), col("data"),
        col("meta.width"), col("meta.height"))
      .mapPartitions { rows =>
        rows.map { r =>
          val data = r.getAs[Array[Byte]]("data")
          val w = r.getAs[Int]("width"); val h = r.getAs[Int]("height")
          // real image containers decode through javax.imageio, real WAV
          // audio through javax.sound (samples normalized to [0,1), the
          // intensity domain the downstream featurizer expects); other
          // payloads (video/synthetic) take the deterministic stub. The
          // WAV route re-sniffs under try: "RIFF" is valid ASCII, so a
          // pathological text payload falls back instead of failing.
          val pixels =
            if (ImageIoCodec.looksLikeImage(data)) {
              // try-guarded like the WAV route: ONE corrupt payload with
              // valid magic must degrade to the stub, not kill the job —
              // at corpus scale a poison asset is a certainty
              try {
                val (_, _, px) = ImageIoCodec.decodeGray(data)
                px.map(_ / 255.0)
              } catch {
                case _: Exception => FakeCodec.decode(data, w, h)
              }
            } else if (WavCodec.looksLikeWav(data)) {
              try WavCodec.decodePcm16(data)._2
                .map(s => (s + 32768) / 65536.0)
              catch { case _: Exception => FakeCodec.decode(data, w, h) }
            } else FakeCodec.decode(data, w, h)
          val feats = FakeCodec.features(pixels)
          Row(r.getAs[Long]("asset_id"), r.getAs[String]("modality"),
            feats.toSeq)
        }
      }(enc)
  }

  /** Resize pass: rewrites data + meta, preserving everything else. */
  def resizeImages(assets: DataFrame, w2: Int, h2: Int): DataFrame = {
    val spark = assets.sparkSession
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(assetSchema)
    assets.select(col("asset_id"), col("modality"), col("data"), col("meta"))
      .mapPartitions { rows =>
        rows.map { r =>
          val meta = r.getStruct(3)
          if (r.getString(1) != "image") Row(r.getLong(0), r.getString(1),
            r.getAs[Array[Byte]](2), meta)
          else {
            val data = r.getAs[Array[Byte]](2)
            val resized =
              if (ImageIoCodec.looksLikeImage(data))
                try ImageIoCodec.resizePng(data, w2, h2)
                catch { case _: Exception =>
                  FakeCodec.resize(data, meta.getInt(0), meta.getInt(1),
                    w2, h2)
                }
              else FakeCodec.resize(data, meta.getInt(0), meta.getInt(1),
                w2, h2)
            Row(r.getLong(0), r.getString(1), resized,
              Row(w2, h2, meta.getInt(2), meta.getInt(3), meta.getInt(4)))
          }
        }
      }(enc)
  }

  /** Frame sampling for video assets: every `stride`-th frame index becomes
    * a row (id, frame_idx, frame_bytes). Pure columnar explode — the
    * per-frame byte slicing uses `substring` on the binary column. */
  def sampleFrames(assets: DataFrame, stride: Int): DataFrame = {
    val frameSize = lit(64)
    assets.filter(col("modality") === "video")
      .select(col("asset_id"), col("data"),
        explode(sequence(lit(0), col("meta.n_frames") - 1, lit(stride)))
          .as("frame_idx0"))
      .withColumn("frame_idx", col("frame_idx0").cast("long"))
      .select(col("asset_id"), col("frame_idx"),
        col("data").substr((col("frame_idx") * frameSize + 1).cast("int"),
          frameSize).as("frame_bytes"))
  }
}
