package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.sources.warc.Warc

/** Streaming WARC ingest: the connector's micro-batch source over a
  * segment drop directory, feeding the keep-first content dedup. Asserts
  * the three streaming contracts: stream == batch on the initial drop,
  * newly dropped segments are picked up incrementally (offset =
  * processed-file set), and dedup state + offsets survive a checkpoint
  * restart — a duplicate arriving in a LATER segment after a restart is
  * still suppressed. */
class WarcStreamSpec extends SparkSpec {
  import spark.implicits._

  private def writeSegment(dir: String, name: String,
      docs: Seq[(Long, String)]): Unit = {
    val bos = new java.io.ByteArrayOutputStream()
    docs.foreach { case (id, text) =>
      bos.write(Warc.gzipMember(Warc.renderRecord("response",
        s"<urn:uuid:graft-$id>", s"http://corpus/doc/$id",
        "2026-01-01T00:00:00Z", text.getBytes("UTF-8"))))
    }
    Files.write(Paths.get(dir, name), bos.toByteArray)
  }

  test("stream == batch on a drop; new segments and state survive a " +
    "checkpoint restart") {
    val dir = Files.createTempDirectory("warc_stream").toString
    val ckpt = Files.createTempDirectory("warc_stream_ckpt").toString
    val out = Files.createTempDirectory("warc_stream_out").toString
    // segment 1: docs 1..3, where 3 duplicates 1's content
    writeSegment(dir, "seg-001.warc.gz",
      Seq(1L -> "alpha beta", 2L -> "gamma", 3L -> "alpha  BETA"))

    def runOnce(): Unit = {
      val q = EventStreams
        .contentDedupStream(EventStreams.warcCorpusDocStream(spark, dir))
        .writeStream
        .option("checkpointLocation", ckpt)
        .format("parquet")
        .option("path", out)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }

    runOnce()
    val after1 = spark.read.parquet(out).as[Long].collect().toSet
    val batch1 = EventStreams.contentKeepFirst(
        Seq(1L -> "alpha beta", 2L -> "gamma", 3L -> "alpha  BETA")
          .toDF("doc_id", "text"))
      .select($"keep_id").as[Long].collect().toSet
    assert(after1 === batch1)
    assert(after1 === Set(1L, 2L))

    // segment 2 drops AFTER the first run: one new doc and one duplicate
    // of segment 1's content — the restart must resume from the
    // checkpointed offset (only seg-002 is read) and the dedup state must
    // suppress the cross-segment duplicate
    writeSegment(dir, "seg-002.warc.gz",
      Seq(4L -> "delta", 5L -> "GAMMA"))
    runOnce()
    val after2 = spark.read.parquet(out).as[Long].collect().toSeq
    assert(after2.size === 3, s"expected exactly one new keeper, got " +
      s"${after2.sorted}") // 5 suppressed (dup of 2), seg-001 not re-read
    assert(after2.toSet === Set(1L, 2L, 4L))
  }

  test("offset COMPACTS on segment rotation: a processed file deleted " +
    "from the drop directory leaves the checkpointed offset, new " +
    "segments still arrive exactly once") {
    val dir = Files.createTempDirectory("warc_rot").toString
    val ckpt = Files.createTempDirectory("warc_rot_ckpt").toString
    val out = Files.createTempDirectory("warc_rot_out").toString
    writeSegment(dir, "seg-001.warc.gz", Seq(1L -> "alpha", 2L -> "beta"))

    def runOnce(): Unit = {
      val q = EventStreams
        .contentDedupStream(EventStreams.warcCorpusDocStream(spark, dir))
        .writeStream
        .option("checkpointLocation", ckpt)
        .format("parquet").option("path", out)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    runOnce()
    assert(spark.read.parquet(out).as[Long].collect().toSet === Set(1L, 2L))

    // rotate: the processed segment leaves the directory while the
    // stream is DOWN; a new segment arrives
    Files.delete(Paths.get(dir, "seg-001.warc.gz"))
    writeSegment(dir, "seg-002.warc.gz", Seq(3L -> "gamma"))
    runOnce()
    assert(spark.read.parquet(out).as[Long].collect().toSet ===
      Set(1L, 2L, 3L), "rotation must not re-deliver or drop")

    // the compaction assertion: the NEWEST committed offset is the
    // current listing — the rotated-out segment's name is GONE from the
    // checkpoint, so the offset is bounded by the live directory size,
    // not by the all-time processed-file count
    val offsetsDir = new java.io.File(ckpt, "offsets")
    val newest = offsetsDir.listFiles()
      .filter(_.getName.forall(_.isDigit))
      .maxBy(_.getName.toLong)
    val body = new String(Files.readAllBytes(newest.toPath), "UTF-8")
    assert(body.contains("seg-002.warc.gz"),
      "newest offset must carry the live segment")
    assert(!body.contains("seg-001.warc.gz"),
      "newest offset must have compacted the rotated-out segment")
  }

  test("st15's batch leg through the connector equals contentKeepFirst " +
    "on the raw table (sf0.001)") {
    val viaWarc = graft.queries.StreamQueries
      .st15WarcIngestDedup(spark, sfTiny)
      .as[(Long, Long)].collect().toSeq
    val direct = EventStreams.contentKeepFirst(
        graft.util.Tables.documents(spark, sfTiny)
          .filter($"text".isNotNull)) // mirror the fixture's filter
      .orderBy($"keep_id").as[(Long, Long)].collect().toSeq
    assert(viaWarc === direct)
  }
}
