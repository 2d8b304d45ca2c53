package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.pipeline.Multimodal
import graft.util.Tables

/** Driver-gate entries for the multimodal pipeline. mm01–mm03 run the
  * synthetic-payload plumbing (schema derivation, modality routing,
  * per-partition batch transform fan-out, frame explosion arithmetic)
  * through the deterministic [[Multimodal.FakeCodec]]; mm04 exercises the
  * REAL `javax.imageio` codec ([[Multimodal.ImageIoCodec]]) end-to-end —
  * PNG encode + decode on executors against an arithmetic DuckDB replay. */
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

  /** mm04 — REAL image decode through `javax.imageio` (no stub in this
    * path): each doc_id < 64 synthesizes a deterministic 16×16 grayscale
    * bitmap (pixel i = (doc_id·31 + i·7) mod 256), encodes it to an
    * actual PNG byte array, DECODES those bytes back with ImageIO on the
    * executors, and reports integer-exact stats of the decoded pixels
    * (dims, sum, sum of squares, 4-bin histogram). PNG is lossless, so
    * the oracle replays the same stats from the arithmetic formula alone
    * — any encoder/decoder defect, channel mixup, or dimension swap
    * breaks the hash. The codec runs inside mapPartitions: the same
    * embarrassingly-parallel, no-driver-involvement shape a 100 TB image
    * corpus needs. */
  def mm04ImageioDecode(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, d).select(col("doc_id")).filter(col("doc_id") < 64)
      .as[Long]
      .mapPartitions { ids =>
        ids.map { id =>
          val w = 16; val h = 16
          val pixels = Array.tabulate(w * h)(i =>
            (((id * 31 + i.toLong * 7) % 256) + 256).toInt % 256)
          val png = Multimodal.ImageIoCodec.encodeGrayPng(pixels, w, h)
          val (dw, dh, px) = Multimodal.ImageIoCodec.decodeGray(png)
          var s = 0L; var s2 = 0L; val hist = new Array[Long](4)
          px.foreach { p => s += p; s2 += p.toLong * p; hist(p / 64) += 1 }
          (id, dw, dh, s, s2, hist(0), hist(1), hist(2), hist(3))
        }
      }
      .toDF("asset_id", "width", "height", "px_sum", "px_sumsq",
        "h0", "h1", "h2", "h3")
      .orderBy(col("asset_id"))
  }

  /** mm05 — REAL audio decode through `javax.sound.sampled` (no stub in
    * this path): each doc_id < 64 synthesizes a deterministic 200-sample
    * 16-bit waveform (sample i = (id·37 + i·113) mod 4001 − 2000, pure
    * integers), encodes it to an actual PCM WAV container, DECODES those
    * bytes back with AudioSystem on the executors, and reports
    * integer-exact stats of the decoded samples. WAV PCM is lossless, so
    * the oracle replays the stats from the arithmetic formula alone —
    * any header, endianness, or sign-extension defect breaks the hash.
    * Same mapPartitions shape as mm04: embarrassingly parallel, no
    * driver involvement. */
  def mm05WavDecode(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, d).select(col("doc_id")).filter(col("doc_id") < 64)
      .as[Long]
      .mapPartitions { ids =>
        ids.map { id =>
          val n = 200
          val samples = Array.tabulate(n)(i =>
            ((id * 37 + i.toLong * 113) % 4001).toInt - 2000)
          val wav = Multimodal.WavCodec.encodePcm16Wav(samples, 8000)
          val (sr, got) = Multimodal.WavCodec.decodePcm16(wav)
          var sum = 0L; var mn = Long.MaxValue; var mx = Long.MinValue
          var neg = 0L; var abs = 0L
          got.foreach { s =>
            sum += s; mn = math.min(mn, s); mx = math.max(mx, s)
            if (s < 0) neg += 1
            abs += math.abs(s)
          }
          (id, sr, got.length.toLong, sum, mn, mx, neg, abs)
        }
      }
      .toDF("asset_id", "sample_rate", "n_samples", "s_sum", "s_min",
        "s_max", "n_neg", "abs_sum")
      .orderBy(col("asset_id"))
  }

  /** mm06 — WebDataset tar-shard ROUND TRIP
    * ([[graft.pipeline.Webdataset]], the POSIX-tar packaging multimodal
    * training loaders stream): every document becomes a two-part sample
    * (`key.json` metadata + `key.txt` payload bytes), written as 8
    * hash-placed tar shards and read back through the incremental tar
    * reader. Per document: part count, payload byte length, payload md5 —
    * the q36 byte-identity idiom, so a framing, placement, ordering, or
    * truncation defect anywhere in the tar path breaks the hash. */
  def mm06Webdataset(spark: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(spark, d).filter(col("text").isNotNull)
    val samples = docs.select(col("doc_id"),
      map(lit("txt"), encode(col("text"), "UTF-8"),
        lit("json"),
        encode(to_json(struct(col("lang"), col("source"))), "UTF-8"))
        .as("files"))
    val dir = java.nio.file.Files.createTempDirectory("wds_mm06").toString
    graft.pipeline.Webdataset.writeTarShards(samples, dir, nShards = 8)
    val back = graft.pipeline.Webdataset.readTarShards(spark, dir)
    back.groupBy(col("key"))
      .agg(count(lit(1)).as("n_parts"),
        max(when(col("ext") === "txt", col("content"))).as("txt"))
      .select(col("key").cast("long").as("doc_id"), col("n_parts"),
        length(col("txt")).cast("long").as("n_bytes"),
        md5(col("txt")).as("text_md5"))
      .orderBy(col("doc_id"))
  }

  /** mm07 — the MULTIMODAL CRAWL CAPSTONE (the LAION shape, q38's
    * multimodal leg): one `.warc.gz` archive holds HTTP-wrapped html
    * pages AND their images as raw-png `resource` records; ONE plan
    * reads the connector, splits the page leg (HTTP body → t34
    * extraction → caption), routes the image leg by record type, joins
    * caption+image per doc, packs two-part WebDataset samples into 4
    * hash-placed tar shards, reads them back, and DECODES the png parts
    * on executors. Per sample: shard, part count, caption md5 and the
    * decoded pixel stats — so a defect anywhere in connector framing,
    * HTTP split, extraction, tar round trip or image decode breaks the
    * hash. Oracle: the q39/t34 replay for captions, the pixel FORMULA
    * for stats (PNG is lossless), the ShardWriter hash for placement. */
  def mm07CrawlWebdataset(spark: SparkSession, d: String): DataFrame = {
    val T = graft.pipeline.TextAnalysis
    val dir = PipelineQueries.mm07Fixture(spark, d)
    val rows = spark.read.format("warc").load(dir)
    val caps = graft.streaming.EventStreams.warcCorpusDocs(rows)
      .select(col("doc_id"),
        T.htmlToText(T.httpBody(col("text"))).as("caption"))
    val imgs = rows.filter(col("record_type") === "resource")
      .select(regexp_extract(col("target_uri"), "img/(\\d+)$", 1)
        .cast("long").as("doc_id"), col("payload"))
    val samples = caps.join(imgs, "doc_id")
      .select(col("doc_id"),
        map(lit("png"), col("payload"),
          lit("txt"), encode(col("caption"), "UTF-8")).as("files"))
    val out = graft.util.Scratch.dir("graft_wds_crawl")
    graft.pipeline.Webdataset.writeTarShards(samples, out, nShards = 4)
    val back = graft.pipeline.Webdataset.readTarShards(spark, out)
    val stats = udf((b: Array[Byte]) => {
      // a null here means the sample came back without its png part —
      // fail diagnosably instead of an opaque NPE inside the decoder
      require(b != null, "mm07 sample is missing its png part " +
        "(tar writer defect or a hand-built archive)")
      val (w, h, px) = Multimodal.ImageIoCodec.decodeGray(b)
      var s = 0L; px.foreach(s += _)
      (w.toLong, h.toLong, s)
    })
    back.groupBy(col("shard_file"), col("key"))
      .agg(count(lit(1)).as("n_parts"),
        max(when(col("ext") === "txt", col("content"))).as("txt"),
        max(when(col("ext") === "png", col("content"))).as("png"))
      .select(col("key").cast("long").as("doc_id"),
        regexp_extract(col("shard_file"), "shard-(\\d+)", 1).cast("long")
          .as("shard"),
        col("n_parts"), md5(col("txt")).as("caption_md5"),
        stats(col("png")).as("st"))
      .select(col("doc_id"), col("shard"), col("n_parts"),
        col("caption_md5"), col("st._1").as("width"),
        col("st._2").as("height"), col("st._3").as("px_sum"))
      .orderBy(col("doc_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm05_wav_decode" -> (mm05WavDecode _),
    "mm07_crawl_webdataset" -> (mm07CrawlWebdataset _),
    "mm01_features" -> (mm01Features _),
    "mm02_frame_sample" -> (mm02FrameSample _),
    "mm03_sample_assembly" -> (mm03SampleAssembly _),
    "mm04_imageio_decode" -> (mm04ImageioDecode _),
    "mm06_webdataset" -> (mm06Webdataset _))

  val oracle: Map[String, String] = Map(
    "mm07_crawl_webdataset" -> PipelineQueries.mm07OracleSql,
    "mm06_webdataset" ->
      // the tar round trip must reproduce, per document, exactly the
      // bytes the writer framed — plus both sample parts surviving
      """SELECT doc_id, 2::BIGINT AS n_parts,
        |  strlen(text)::BIGINT AS n_bytes, md5(text) AS text_md5
        |FROM documents WHERE text IS NOT NULL
        |ORDER BY doc_id""".stripMargin,
    "mm05_wav_decode" ->
      // replay of the synthesized waveforms from the arithmetic formula:
      // the Spark side must reproduce these exact integers THROUGH a real
      // PCM WAV encode + javax.sound decode round trip
      """WITH s AS (
        |  SELECT doc_id AS asset_id,
        |    ((doc_id * 37 + g.i * 113) % 4001) - 2000 AS v
        |  FROM documents, generate_series(0, 199) AS g(i)
        |  WHERE doc_id < 64)
        |SELECT asset_id, CAST(8000 AS INT) AS sample_rate,
        |  COUNT(*)::BIGINT AS n_samples,
        |  SUM(v)::BIGINT AS s_sum, MIN(v)::BIGINT AS s_min,
        |  MAX(v)::BIGINT AS s_max,
        |  (COUNT(*) FILTER (WHERE v < 0))::BIGINT AS n_neg,
        |  SUM(ABS(v))::BIGINT AS abs_sum
        |FROM s GROUP BY asset_id ORDER BY asset_id""".stripMargin,
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
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "mm04_imageio_decode" ->
      // replay of the synthesized bitmaps from the arithmetic formula:
      // the Spark side must reproduce these exact integers THROUGH a real
      // PNG encode + javax.imageio decode round trip
      """WITH px AS (
        |  SELECT doc_id AS asset_id, (doc_id * 31 + g.i * 7) % 256 AS p
        |  FROM documents, generate_series(0, 255) AS g(i)
        |  WHERE doc_id < 64)
        |SELECT asset_id, CAST(16 AS INT) AS width, CAST(16 AS INT) AS height,
        |  SUM(p)::BIGINT AS px_sum, SUM(p * p)::BIGINT AS px_sumsq,
        |  (COUNT(*) FILTER (WHERE p // 64 = 0))::BIGINT AS h0,
        |  (COUNT(*) FILTER (WHERE p // 64 = 1))::BIGINT AS h1,
        |  (COUNT(*) FILTER (WHERE p // 64 = 2))::BIGINT AS h2,
        |  (COUNT(*) FILTER (WHERE p // 64 = 3))::BIGINT AS h3
        |FROM px GROUP BY asset_id ORDER BY asset_id""".stripMargin)
}
