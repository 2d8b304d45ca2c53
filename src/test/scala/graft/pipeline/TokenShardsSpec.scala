package graft.pipeline

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Megatron-style token-shard binary sink: byte-exact round trips at
  * both token widths, deterministic placement and bytes, the idx seek
  * table's arithmetic, and the failure contracts (negative ids,
  * out-of-width tokens, missing _SUCCESS). */
class TokenShardsSpec extends SparkSpec {
  import spark.implicits._

  private def sampleDf(n: Int, maxTok: Long) =
    (0 until n).map { i =>
      val len = 1 + (i * 7) % 13
      (i.toLong, (0 until len).map(j =>
        (i.toLong * 31 + j * 17) % maxTok).toSeq)
    }.toDF("doc_id", "ids")

  test("round trip is id-exact at width 2 and width 4") {
    Seq((1000L, 2), (100000L, 4)).foreach { case (vocab, width) =>
      assert(TokenShards.tokenWidth(vocab) == width)
      val dir = java.nio.file.Files
        .createTempDirectory(s"ts_w$width").toString
      val df = sampleDf(60, math.min(vocab, 65536L))
      TokenShards.write(df, dir, nShards = 4, vocabSize = vocab)
      val back = TokenShards.read(spark, dir)
        .select($"doc_id", $"ids").as[(Long, Seq[Long])]
        .collect().toMap
      val exp = df.as[(Long, Seq[Long])].collect().toMap
      assert(back == exp, s"round-trip drift at width $width")
    }
  }

  test("placement follows shardExpr; in-shard layout ascends by id; " +
    "pointers partition the bin file exactly") {
    val dir = java.nio.file.Files.createTempDirectory("ts_place").toString
    val df = sampleDf(80, 500L)
    TokenShards.write(df, dir, nShards = 4, vocabSize = 500L)
    val rows = TokenShards.read(spark, dir)
      .select($"shard_file", $"doc_id", size($"ids").as("n"))
      .as[(String, Long, Int)].collect()
    rows.foreach { case (f, id, _) =>
      val shard = f.stripPrefix("shard-").stripSuffix(".bin").toInt
      val exp = ((id * ShardWriter.HashMult % ShardWriter.HashPrime)
        % 4).toInt
      assert(shard == exp, s"doc $id landed in shard $shard, want $exp")
    }
    // parse each idx by hand: ascending ids, contiguous pointers, and
    // the bin length equals the last pointer + last doc's bytes
    val root = new java.io.File(dir)
    root.listFiles().filter(_.getName.endsWith(".idx")).foreach { f =>
      val raw = java.nio.file.Files.readAllBytes(f.toPath)
      val buf = ByteBuffer.wrap(raw).order(ByteOrder.LITTLE_ENDIAN)
      val magic = new Array[Byte](8); buf.get(magic)
      assert(new String(magic, "US-ASCII") == "GRAFTIDX")
      assert(buf.getInt == TokenShards.Version)
      val width = buf.getInt
      assert(width == 2)
      val docs = buf.getLong
      var prevId = -1L
      var expPtr = 0L
      (0L until docs).foreach { _ =>
        val id = buf.getLong
        val ptr = buf.getLong
        val n = buf.getInt
        assert(id > prevId, "ids must ascend within a shard")
        assert(ptr == expPtr, "pointers must be contiguous")
        prevId = id
        expPtr = ptr + n.toLong * width
      }
      val bin = new java.io.File(root,
        f.getName.stripSuffix(".idx") + ".bin")
      assert(bin.length() == expPtr, "bin length must equal the pointer sum")
    }
  }

  test("bytes are reproducible across reruns") {
    val d1 = java.nio.file.Files.createTempDirectory("ts_r1").toString
    val d2 = java.nio.file.Files.createTempDirectory("ts_r2").toString
    TokenShards.write(sampleDf(50, 999L), d1, 3, vocabSize = 999L)
    TokenShards.write(sampleDf(50, 999L).repartition(7), d2, 3,
      vocabSize = 999L)
    def digest(dir: String): Map[String, String] = {
      val md = java.security.MessageDigest.getInstance("MD5")
      new java.io.File(dir).listFiles()
        .filter(f => f.getName.endsWith(".bin") || f.getName.endsWith(".idx"))
        .map { f =>
          f.getName -> md.clone().asInstanceOf[java.security.MessageDigest]
            .digest(java.nio.file.Files.readAllBytes(f.toPath))
            .map("%02x".format(_)).mkString
        }.toMap
    }
    assert(digest(d1) == digest(d2), "shard bytes must be run-independent")
  }

  test("failure contracts: negative id, out-of-width token, missing " +
    "_SUCCESS") {
    val dir = java.nio.file.Files.createTempDirectory("ts_fail").toString
    // task-side check -> surfaces as the job failure
    intercept[org.apache.spark.SparkException] {
      TokenShards.write(Seq((-1L, Seq(1L))).toDF("doc_id", "ids"), dir, 2,
        vocabSize = 100L)
    }
    intercept[org.apache.spark.SparkException] {
      TokenShards.write(Seq((1L, Seq(70000L))).toDF("doc_id", "ids"), dir, 2,
        vocabSize = 100L) // width 2 but id over 65535
    }
    // duplicate ids: the (shard, id) sort key would tie and the bytes
    // become shuffle-order-dependent — rejected in-task
    val dup = intercept[org.apache.spark.SparkException] {
      TokenShards.write(
        Seq((7L, Seq(1L)), (7L, Seq(2L))).toDF("doc_id", "ids"),
        java.nio.file.Files.createTempDirectory("ts_dup").toString, 2,
        vocabSize = 100L)
    }
    assert(dup.getMessage.contains("duplicate"))
    val ok = java.nio.file.Files.createTempDirectory("ts_ok").toString
    TokenShards.write(sampleDf(10, 50L), ok, 2, vocabSize = 50L)
    java.nio.file.Files.delete(java.nio.file.Paths.get(ok, "_SUCCESS"))
    intercept[IllegalArgumentException] {
      TokenShards.read(spark, ok).count()
    }
  }
}
