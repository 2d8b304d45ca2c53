package graft.sources.warc

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.{EqualTo, Filter}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Pure WARC record machinery (ISO 28500, the WARC/1.x web-crawl
  * interchange format every pretraining corpus ingest starts from —
  * Common Crawl ships it): a length-driven parser over raw record bytes
  * and the matching renderer the gate/spec fixtures build files with.
  *
  * Subset: uncompressed .warc member streams (record-level gzip is the
  * documented extension point — each gzip member is one record, so a
  * splitter would wrap the SAME byte parser per member); headers are
  * case-insensitive per the spec; payload extent comes from
  * Content-Length ALONE, never from scanning for delimiters — a payload
  * containing the literal bytes `WARC/1.0` must not resplit (spec-pinned).
  */
object Warc {

  final case class WarcRecord(recordType: String, recordId: String,
      targetUri: String, warcDate: String, contentLength: Long,
      payload: Array[Byte])

  private val Utf8 = java.nio.charset.StandardCharsets.UTF_8

  /** Parse one file's bytes into records. Header lines are CRLF per the
    * spec (bare LF tolerated); unknown headers are legal and skipped;
    * blank lines between records (the two record-terminating CRLFs) are
    * consumed structurally. */
  def parse(bytes: Array[Byte]): Seq[WarcRecord] = {
    val out = Seq.newBuilder[WarcRecord]
    var i = 0
    def readLine(): String = {
      val start = i
      while (i < bytes.length && bytes(i) != '\n') i += 1
      val end = if (i > start && bytes(i - 1) == '\r') i - 1 else i
      val s = new String(bytes, start, end - start, Utf8)
      if (i < bytes.length) i += 1 // consume the \n
      s
    }
    var done = false
    while (!done) {
      // consume inter-record blank lines; stop cleanly at EOF
      var line = ""
      var sawContent = false
      while (!sawContent && i < bytes.length) {
        line = readLine()
        sawContent = line.nonEmpty
      }
      if (!sawContent) done = true
      else {
        require(line.startsWith("WARC/"),
          s"not a WARC record version line: '$line'")
        var rt = ""; var rid = ""; var uri = ""; var date = ""
        var len = -1L
        var h = readLine()
        while (h.nonEmpty) {
          val idx = h.indexOf(':')
          require(idx > 0, s"malformed WARC header line: '$h'")
          h.substring(0, idx).trim.toLowerCase match {
            case "warc-type" => rt = h.substring(idx + 1).trim
            case "warc-record-id" => rid = h.substring(idx + 1).trim
            case "warc-target-uri" => uri = h.substring(idx + 1).trim
            case "warc-date" => date = h.substring(idx + 1).trim
            case "content-length" => len = h.substring(idx + 1).trim.toLong
            case _ => () // unknown headers are legal per the spec
          }
          h = readLine()
        }
        require(len >= 0, "WARC record missing Content-Length")
        require(i + len <= bytes.length,
          s"truncated WARC payload: need $len bytes at offset $i of " +
            s"${bytes.length}")
        val payload =
          java.util.Arrays.copyOfRange(bytes, i, i + len.toInt)
        i += len.toInt
        out += WarcRecord(rt, rid, uri, date, len, payload)
      }
    }
    out.result()
  }

  /** Render one record in canonical CRLF form — the fixture writer the
    * gate and spec share, so the parser is exercised against exactly the
    * bytes a conforming writer emits. */
  def renderRecord(recordType: String, recordId: String, targetUri: String,
      warcDate: String, payload: Array[Byte]): Array[Byte] = {
    val header = new StringBuilder()
      .append("WARC/1.0\r\n")
      .append(s"WARC-Type: $recordType\r\n")
      .append(s"WARC-Record-ID: $recordId\r\n")
      .append(s"WARC-Date: $warcDate\r\n")
    if (targetUri.nonEmpty) header.append(s"WARC-Target-URI: $targetUri\r\n")
    header.append(s"Content-Length: ${payload.length}\r\n\r\n")
    val hb = header.toString.getBytes(Utf8)
    val outBytes = new Array[Byte](hb.length + payload.length + 4)
    System.arraycopy(hb, 0, outBytes, 0, hb.length)
    System.arraycopy(payload, 0, outBytes, hb.length, payload.length)
    outBytes(hb.length + payload.length) = '\r'
    outBytes(hb.length + payload.length + 1) = '\n'
    outBytes(hb.length + payload.length + 2) = '\r'
    outBytes(hb.length + payload.length + 3) = '\n'
    outBytes
  }
}

/** DataSource V2 connector for WARC files:
  * `spark.read.format("warc").load(dir)` — one row per WARC record, the
  * web-crawl ingest surface as a native Spark source (the
  * [[graft.sources.lcov.LcovDataSource]] posture, record-format swapped).
  *
  * Spark-first shape, mirroring the lcov connector:
  *  - planning: one [[InputPartition]] per .warc file — a crawl drop of
  *    thousands of segment files parses with full cluster parallelism and
  *    the driver only LISTS the directory;
  *  - column pruning ([[SupportsPushDownRequiredColumns]]): a query
  *    reading only (target_uri, content_length) never materializes the
  *    payload bytes across the scan boundary;
  *  - filter pushdown ([[SupportsPushDownFilters]]): `record_type = x` /
  *    `target_uri = y` equality filters drop records inside the reader
  *    (real WARC interleaves warcinfo/request/response/metadata records —
  *    the standard corpus read keeps `response` only).
  *
  * Size posture: one partition per FILE — Common Crawl caps segment files
  * around 1 GB for exactly this reason; if a file exceeded the partition
  * budget, record-level gzip members (the standard packaging) are the
  * split boundary, documented on [[Warc]]. */
class WarcDataSource extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {

  override def shortName(): String = "warc"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    WarcDataSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val roots: Seq[String] = properties.asScala.get("path") match {
      case Some(p) => Seq(p)
      case None => properties.asScala.get("paths") match {
        case Some(json) =>
          import org.json4s.jackson.JsonMethods
          import org.json4s.{JArray, JString}
          JsonMethods.parse(json) match {
            case JArray(vs) => vs.collect { case JString(s) => s }
            case _ => throw new IllegalArgumentException(
              s"warc source: unparseable 'paths' option: $json")
          }
        case None => Seq.empty
      }
    }
    if (roots.isEmpty) throw new IllegalArgumentException(
      "warc source requires a path: spark.read.format(\"warc\").load(dir)")
    new WarcTable(roots)
  }
}

object WarcDataSource {
  val schema: StructType = new StructType()
    .add("warc_source", StringType) // .warc file path
    .add("record_type", StringType) // WARC-Type
    .add("record_id", StringType) // WARC-Record-ID
    .add("target_uri", StringType) // WARC-Target-URI ("" when absent)
    .add("warc_date", StringType) // WARC-Date, verbatim
    .add("content_length", LongType)
    .add("payload", BinaryType)
}

class WarcTable(paths: Seq[String]) extends Table with SupportsRead {
  override def name(): String = s"warc(${paths.mkString(",")})"
  override def schema(): StructType = WarcDataSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new WarcScanBuilder(paths)
}

class WarcScanBuilder(paths: Seq[String]) extends ScanBuilder
    with SupportsPushDownRequiredColumns with SupportsPushDownFilters {
  private var required: StructType = WarcDataSource.schema
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = StructType(WarcDataSource.schema.fields
      .filter(f => requiredSchema.fieldNames.contains(f.name)))

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, residual) = filters.partition {
      case EqualTo(a, _: String) => a == "record_type" || a == "target_uri"
      case _ => false
    }
    pushed = accepted
    residual
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = new WarcScan(paths, required, pushed)
}

class WarcScan(paths: Seq[String], required: StructType,
    pushed: Array[Filter]) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"WarcScan paths=${paths.mkString(",")}, " +
      s"PushedFilters=${pushed.mkString("[", ",", "]")}, " +
      s"ReadSchema=${required.simpleString}"

  override def planInputPartitions(): Array[InputPartition] = {
    val conf = SparkSession.active.sessionState.newHadoopConf()
    val files: Seq[FileStatus] = paths.flatMap { path =>
      val root = new Path(path)
      val fs = root.getFileSystem(conf)
      val status = fs.getFileStatus(root)
      if (status.isDirectory)
        fs.listStatus(root).toSeq.filter(_.isFile)
          .filterNot(_.getPath.getName.startsWith("_"))
      else Seq(status)
    }
    files.sortBy(_.getPath.toString)
      .map(f => WarcInputPartition(f.getPath.toString): InputPartition)
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    // the session Hadoop conf ships to executors (the lcov lesson: a bare
    // new Configuration() drops spark.hadoop.* cloud credentials/tuning)
    new WarcReaderFactory(required, pushed,
      new org.apache.spark.util.SerializableConfiguration(
        SparkSession.active.sessionState.newHadoopConf()))
}

case class WarcInputPartition(file: String) extends InputPartition

class WarcReaderFactory(required: StructType, pushed: Array[Filter],
    conf: org.apache.spark.util.SerializableConfiguration)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new WarcPartitionReader(p.asInstanceOf[WarcInputPartition].file,
      required, pushed, conf)
}

/** Reads ONE .warc file, parses with [[Warc.parse]], applies the pushed
  * equality filters, projects the pruned columns. */
class WarcPartitionReader(file: String, required: StructType,
    pushed: Array[Filter],
    conf: org.apache.spark.util.SerializableConfiguration)
    extends PartitionReader[InternalRow] {

  private val records: Iterator[Warc.WarcRecord] = {
    val p = new Path(file)
    val fs = p.getFileSystem(conf.value)
    val in = fs.open(p)
    val bytes = try {
      val bos = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](64 * 1024)
      var n = in.read(buf)
      while (n >= 0) { bos.write(buf, 0, n); n = in.read(buf) }
      bos.toByteArray
    } finally in.close()
    Warc.parse(bytes).iterator.filter(keep)
  }

  private def keep(r: Warc.WarcRecord): Boolean = pushed.forall {
    case EqualTo("record_type", v: String) => r.recordType == v
    case EqualTo("target_uri", v: String) => r.targetUri == v
    case _ => true
  }

  private var current: Warc.WarcRecord = _

  override def next(): Boolean =
    if (records.hasNext) { current = records.next(); true } else false

  override def get(): InternalRow = {
    val r = current
    val values = required.fields.map(_.name).map {
      case "warc_source" => UTF8String.fromString(file)
      case "record_type" => UTF8String.fromString(r.recordType)
      case "record_id" => UTF8String.fromString(r.recordId)
      case "target_uri" => UTF8String.fromString(r.targetUri)
      case "warc_date" => UTF8String.fromString(r.warcDate)
      case "content_length" => r.contentLength
      case "payload" => r.payload
      case other => throw new IllegalStateException(s"unknown column $other")
    }
    new GenericInternalRow(values.toArray[Any])
  }

  override def close(): Unit = ()
}
