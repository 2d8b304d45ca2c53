package graft.pipeline

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing for training-data pipelines (builder north
  * star): image/audio/video as opaque `binary` columns with typed metadata,
  * decode / feature-extract / resize / frame-sample as per-partition batch
  * transforms.
  *
  * The actual media decode is STUBBED with a deterministic fake (the
  * image/audio codec libraries are not in this container) — see
  * [[FakeCodec]]. Everything around it is real and tested: the asset
  * schema, binary handling, partitioning for parallel decode, the
  * mapPartitions batch shape (the Scala equivalent of a Pandas UDF over
  * `mapInPandas`: one iterator of rows per partition, vectorizable
  * per-batch work, no per-row driver involvement).
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

  /** Deterministic fake media codec — STUB standing in for libjpeg/ffmpeg
    * etc. Real systems swap this object out; signatures stay. */
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
          val feats = FakeCodec.features(FakeCodec.decode(data, w, h))
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
            val resized = FakeCodec.resize(r.getAs[Array[Byte]](2),
              meta.getInt(0), meta.getInt(1), w2, h2)
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
