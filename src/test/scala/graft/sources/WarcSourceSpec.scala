package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.warc.Warc

/** DataSource V2 WARC connector: length-driven record framing (a payload
  * holding the literal `WARC/1.0` bytes must not resplit), losslessness vs
  * the pure parser, one partition per segment file, column pruning and
  * record_type/target_uri filter pushdown reaching the scan. */
class WarcSourceSpec extends SparkSpec {
  import spark.implicits._

  // segment 1: a warcinfo header record, a response whose PAYLOAD embeds
  // a fake record header (the delimiter-scan trap — only Content-Length
  // framing survives it), and an empty-payload response
  private val seg1: Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    bos.write(Warc.renderRecord("warcinfo", "<urn:uuid:info>", "",
      "2026-01-01T00:00:00Z", "software: graft".getBytes("UTF-8")))
    bos.write(Warc.renderRecord("response", "<urn:uuid:r1>",
      "http://x/1", "2026-01-01T00:00:01Z",
      "before\r\nWARC/1.0\r\nWARC-Type: fake\r\nafter".getBytes("UTF-8")))
    bos.write(Warc.renderRecord("response", "<urn:uuid:r2>",
      "http://x/2", "2026-01-01T00:00:02Z", Array.empty[Byte]))
    bos.toByteArray
  }
  // segment 2: one response with a beyond-BMP payload (byte length !=
  // codepoint count) and lowercase header names (case-insensitive spec)
  private val seg2: Array[Byte] = {
    val canonical = Warc.renderRecord("response", "<urn:uuid:r3>",
      "http://x/3", "2026-01-01T00:00:03Z", "p𝕏q".getBytes("UTF-8"))
    new String(canonical, "ISO-8859-1")
      .replace("WARC-Type:", "warc-type:")
      .replace("Content-Length:", "content-length:")
      .getBytes("ISO-8859-1") // byte-preserving round trip for the payload
  }

  private lazy val dir = {
    val d = Files.createTempDirectory("warc_src_spec")
    Files.write(d.resolve("seg1.warc"), seg1)
    Files.write(d.resolve("seg2.warc"), seg2)
    d.toAbsolutePath.toString
  }

  private def read() = spark.read.format("warc").load(dir)

  test("reads every record with Content-Length framing — an embedded " +
    "fake record header in a payload does not resplit") {
    val rows = read().orderBy("record_id").collect()
    assert(rows.length === 4)
    val r1 = rows.find(_.getAs[String]("record_id") == "<urn:uuid:r1>").get
    assert(new String(r1.getAs[Array[Byte]]("payload"), "UTF-8") ===
      "before\r\nWARC/1.0\r\nWARC-Type: fake\r\nafter")
    val r2 = rows.find(_.getAs[String]("record_id") == "<urn:uuid:r2>").get
    assert(r2.getAs[Long]("content_length") === 0L)
    assert(r2.getAs[Array[Byte]]("payload").length === 0)
    // lowercase headers parse (case-insensitive per ISO 28500), and the
    // byte length is UTF-8 octets, not codepoints
    val r3 = rows.find(_.getAs[String]("record_id") == "<urn:uuid:r3>").get
    assert(r3.getAs[String]("record_type") === "response")
    assert(r3.getAs[Long]("content_length") ===
      "p𝕏q".getBytes("UTF-8").length.toLong)
    assert(new String(r3.getAs[Array[Byte]]("payload"), "UTF-8") === "p𝕏q")
    val info = rows.find(_.getAs[String]("record_type") == "warcinfo").get
    assert(info.getAs[String]("target_uri") === "")
  }

  test("round-trips the pure parser: connector rows == Warc.parse on " +
    "each segment's bytes") {
    val parsed = (Warc.parse(seg1) ++ Warc.parse(seg2))
      .map(r => (r.recordId, r.recordType, r.targetUri, r.contentLength,
        r.payload.toSeq)).toSet
    val viaConnector = read().collect()
      .map(r => (r.getAs[String]("record_id"), r.getAs[String]("record_type"),
        r.getAs[String]("target_uri"), r.getAs[Long]("content_length"),
        r.getAs[Array[Byte]]("payload").toSeq)).toSet
    assert(viaConnector === parsed)
  }

  test("plans one partition per segment file") {
    assert(read().rdd.getNumPartitions === 2)
  }

  test("column pruning reaches the scan's readSchema — payload bytes " +
    "never cross the scan boundary for a metadata query") {
    val df = read().select("target_uri", "content_length")
    val scans = df.queryExecution.optimizedPlan.collect {
      case s: DataSourceV2ScanRelation => s.scan
    }
    assert(scans.nonEmpty)
    assert(scans.head.readSchema().fieldNames.toSet ===
      Set("target_uri", "content_length"))
  }

  test("record_type= / target_uri= equality filters are pushed into " +
    "the reader") {
    val df = read().filter(col("record_type") === "response")
    val scans = df.queryExecution.optimizedPlan.collect {
      case s: DataSourceV2ScanRelation => s.scan
    }
    assert(scans.head.description()
      .contains("""EqualTo(record_type,response)"""))
    assert(df.count() === 3L)
    assert(read().filter(col("target_uri") === "http://x/2").count() === 1L)
  }

  test("folded continuation lines (ISO 28500) extend the previous " +
    "header's value; hidden and _-prefixed files are skipped") {
    val d = Files.createTempDirectory("warc_fold_spec")
    val canonical = Warc.renderRecord("response", "<urn:uuid:f1>",
      "http://x/folded", "2026-01-01T00:00:04Z", "pay".getBytes("UTF-8"))
    val folded = new String(canonical, "ISO-8859-1")
      .replace("WARC-Target-URI: http://x/folded\r\n",
        "WARC-Target-URI: http://x/\r\n\tfolded\r\n")
      .getBytes("ISO-8859-1")
    Files.write(d.resolve("seg.warc"), folded)
    // hidden-file convention: neither may be parsed (both are garbage)
    Files.write(d.resolve(".seg.warc.swp"), "not a warc".getBytes("UTF-8"))
    Files.write(d.resolve("_SUCCESS"), Array.empty[Byte])
    val rows = spark.read.format("warc").load(d.toAbsolutePath.toString)
      .collect()
    assert(rows.length === 1)
    assert(rows.head.getAs[String]("target_uri") === "http://x/ folded")
    assert(new String(rows.head.getAs[Array[Byte]]("payload"), "UTF-8")
      === "pay")
  }

  test(".warc.gz record-level gzip members read identically to the " +
    "uncompressed stream") {
    val d = Files.createTempDirectory("warc_gz_spec")
    // one member per record of seg1 — the Common Crawl packaging
    val bos = new java.io.ByteArrayOutputStream()
    Warc.parse(seg1).foreach { r =>
      bos.write(Warc.gzipMember(Warc.renderRecord(
        r.recordType, r.recordId, r.targetUri, r.warcDate, r.payload)))
    }
    Files.write(d.resolve("seg1.warc.gz"), bos.toByteArray)
    val viaGz = spark.read.format("warc")
      .load(d.toAbsolutePath.toString).collect()
      .map(r => (r.getAs[String]("record_id"), r.getAs[Long]("content_length"),
        r.getAs[Array[Byte]]("payload").toSeq)).toSet
    val want = Warc.parse(seg1)
      .map(r => (r.recordId, r.contentLength, r.payload.toSeq)).toSet
    assert(viaGz === want)
  }

  test("a metadata-only query and a filtered-out record materialize ZERO " +
    "payload bytes — the reader skips the extent") {
    val before = Warc.payloadBytesCopied.get()
    // pruned payload: no copies at all
    val n = read().select("record_id", "content_length").count()
    assert(n === 4L)
    assert(Warc.payloadBytesCopied.get() === before)
    // pushed filter drops warcinfo BEFORE its payload is read: only the
    // three response payloads are copied
    val responses = read().filter(col("record_type") === "response")
      .select("payload").collect()
    val copied = Warc.payloadBytesCopied.get() - before
    val expected = Warc.parse(seg1).++(Warc.parse(seg2))
      .filter(_.recordType == "response").map(_.contentLength).sum
    assert(copied === expected)
    assert(responses.length === 3)
  }

  test("q36's connector read reproduces the rendered corpus exactly on " +
    "sf0.001") {
    val got = graft.queries.PipelineQueries.q36WarcIngest(spark, sfTiny)
      .as[(Long, Long, String)].collect().toSeq
    val want = graft.util.Tables.documents(spark, sfTiny)
      .filter($"text".isNotNull)
      .select($"doc_id",
        octet_length($"text").cast("long").as("n"),
        md5($"text").as("m"))
      .orderBy($"doc_id")
      .as[(Long, Long, String)].collect().toSeq
    assert(got === want)
  }

  test("q38's ingest front half (scan → http/html extract → gopher) " +
    "keeps the response filter pushed and payload-only pruning — " +
    "composition does not defeat pushdown") {
    // the gate's own final frame hides the scan behind the packing
    // prefix-sum's materialization, so assert on the composed front
    // half — the part where extra projections could defeat pushdown
    val T = graft.pipeline.TextAnalysis
    val docs = graft.streaming.EventStreams
      .warcCorpusDocs(read())
      .select(col("doc_id"),
        T.htmlToText(T.httpBody(col("text"))).as("text"))
    val kept = T.gopherRules(docs).filter(col("r_pass_all"))
    val scans = kept.queryExecution.optimizedPlan.collect {
      case s: DataSourceV2ScanRelation
          if s.scan.description().startsWith("WarcScan") => s.scan
    }
    assert(scans.nonEmpty, "no warc scan in the composed plan")
    assert(scans.forall(_.description()
      .contains("EqualTo(record_type,response)")),
      s"pushdown lost in composition: ${scans.map(_.description())}")
    // pruning: only the projected columns (plus record_type, which
    // Spark keeps alongside its pushed filter) cross the scan — never
    // the full 7-column schema
    assert(scans.head.readSchema().fieldNames.toSet.subsetOf(
      Set("record_type", "target_uri", "payload")),
      s"pruning lost: ${scans.head.readSchema().fieldNames.toSeq}")
  }

  test("q37's gzip-member read == q36's uncompressed read on sf0.001") {
    val gz = graft.queries.PipelineQueries.q37WarcGzip(spark, sfTiny)
      .as[(Long, Long, String)].collect().toSeq
    val plain = graft.queries.PipelineQueries.q36WarcIngest(spark, sfTiny)
      .as[(Long, Long, String)].collect().toSeq
    assert(gz === plain)
  }
}
