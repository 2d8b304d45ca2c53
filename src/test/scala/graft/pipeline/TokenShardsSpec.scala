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

  test("Megatron strict mode writes the public MMIDIDX layout " +
    "byte-for-byte") {
    val dir = java.nio.file.Files.createTempDirectory("ts_mm").toString
    val df = sampleDf(40, 900L)
    TokenShards.write(df, dir, nShards = 2, vocabSize = 900L,
      format = TokenShards.Megatron)
    val exp = df.as[(Long, Seq[Long])].collect().toMap
    val root = new java.io.File(dir)
    val idxFiles = root.listFiles().filter(_.getName.endsWith(".idx"))
      .sortBy(_.getName)
    assert(idxFiles.nonEmpty)
    idxFiles.foreach { f =>
      val raw = java.nio.file.Files.readAllBytes(f.toPath)
      val buf = ByteBuffer.wrap(raw).order(ByteOrder.LITTLE_ENDIAN)
      // header: 9-byte magic, int64 version 1, dtype-code byte,
      // int64 sequence count, int64 doc-index count
      val magic = new Array[Byte](9); buf.get(magic)
      assert(magic.sameElements(
        "MMIDIDX".getBytes("US-ASCII") ++ Array[Byte](0, 0)))
      assert(buf.getLong == 1L, "MMIDIDX version must be int64 1")
      assert(buf.get() == 8.toByte, "vocab 900 -> uint16 -> dtype code 8")
      val n = buf.getLong
      assert(buf.getLong == n + 1, "doc_idx length must be n+1")
      assert(raw.length == 34 + 4 * n + 8 * n + 8 * (n + 1),
        "exact MMIDIDX extent: header + sizes + pointers + doc_idx")
      // sizes (int32), then pointers (int64) = cumsum(sizes)*itemsize,
      // then doc_idx = 0..n
      val sizes = (0L until n).map(_ => buf.getInt)
      var expPtr = 0L
      sizes.foreach { s =>
        assert(buf.getLong == expPtr, "pointers must be the byte cumsum")
        expPtr += s.toLong * 2
      }
      (0L to n).foreach(d => assert(buf.getLong == d, "doc_idx = 0..n"))
      val bin = new java.io.File(root,
        f.getName.stripSuffix(".idx") + ".bin")
      assert(bin.length() == expPtr)
    }
    // reads return POSITIONAL ids (the layout stores none): positions
    // within each shard ascend 0..k and the id streams match the input
    // docs in ascending doc-id order per shard
    val back = TokenShards.read(spark, dir)
      .select($"shard_file", $"doc_id", $"ids")
      .as[(String, Long, Seq[Long])].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    val expByShard = exp.toSeq.sortBy(_._1).groupBy { case (id, _) =>
      f"shard-${(id * ShardWriter.HashMult % ShardWriter.HashPrime) % 2}%06d.bin"
    }
    back.foreach { case (f, rows) =>
      assert(rows.map(_._2).toSeq == rows.indices.map(_.toLong).toSeq)
      assert(rows.map(_._3).toSeq == expByShard(f).map(_._2).toSeq,
        s"positional streams must match ascending-id input order in $f")
    }
  }

  test("reader consumes an EXTERNALLY hand-built MMIDIDX pair (interop " +
    "independent of our writer)") {
    // bytes laid out exactly as Megatron-LM's indexed_dataset writer
    // would emit them for two docs of uint16 ids [5,6,7] and [9]
    val dir = java.nio.file.Files.createTempDirectory("ts_ext").toString
    val bin = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
    Seq(5, 6, 7, 9).foreach(t => bin.putShort(t.toShort))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "shard-000000.bin"), bin.array())
    val idx = ByteBuffer.allocate(9 + 8 + 1 + 16 + 8 + 16 + 24)
      .order(ByteOrder.LITTLE_ENDIAN)
    idx.put("MMIDIDX".getBytes("US-ASCII")).put(0.toByte).put(0.toByte)
    idx.putLong(1L)       // version
    idx.put(8.toByte)     // dtype code: uint16
    idx.putLong(2L)       // sequence count
    idx.putLong(3L)       // doc_idx count
    idx.putInt(3).putInt(1)        // sizes
    idx.putLong(0L).putLong(6L)    // pointers (bytes)
    idx.putLong(0L).putLong(1L).putLong(2L) // doc_idx
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "shard-000000.idx"), idx.array())
    val got = TokenShards.read(spark, dir, requireSuccess = false)
      .select($"doc_id", $"ids").as[(Long, Seq[Long])]
      .collect().sortBy(_._1)
    assert(got.toSeq == Seq((0L, Seq(5L, 6L, 7L)), (1L, Seq(9L))))
  }

  test("boundary sidecar round-trips spans and pins the GRAFTDOC layout") {
    val dir = java.nio.file.Files.createTempDirectory("ts_doc").toString
    // three sequences with hand-built spans (tiling, like the packer's)
    val rows = Seq(
      (0L, Seq(1L, 2L, 3L, 4L), Seq((10L, 0, 2), (11L, 2, 2))),
      (1L, Seq(5L, 6L), Seq((11L, 0, 1), (12L, 1, 1))),
      (2L, Seq(7L, 8L, 9L), Seq((13L, 0, 3))))
    val df = rows.toDF("doc_id", "ids", "segs")
      .select($"doc_id", $"ids", expr(
        "transform(segs, s -> struct(s._1 as doc_id, " +
          "s._2 as start, s._3 as len))").as("segs"))
    TokenShards.write(df, dir, nShards = 2, vocabSize = 100L,
      segsCol = Some("segs"))
    val back = TokenShards.read(spark, dir, boundaries = true)
      .select($"doc_id", $"ids",
        expr("transform(segs, s -> struct(s.doc_id, s.start, s.len))"))
      .as[(Long, Seq[Long], Seq[(Long, Int, Int)])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    rows.foreach { case (id, ids, segs) =>
      assert(back(id) == ((ids, segs)), s"sidecar drift for sequence $id")
    }
    // byte-layout pin: magic, version, count, pointer region, records
    new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".doc")).foreach { f =>
        val raw = java.nio.file.Files.readAllBytes(f.toPath)
        val buf = ByteBuffer.wrap(raw).order(ByteOrder.LITTLE_ENDIAN)
        val magic = new Array[Byte](8); buf.get(magic)
        assert(new String(magic, "US-ASCII") == "GRAFTDOC")
        assert(buf.getInt == TokenShards.DocVersion)
        val n = buf.getLong
        val ptrs = (0L until n).map(_ => buf.getLong)
        var off = 0L
        (0L until n).foreach { k =>
          assert(ptrs(k.toInt) == off, "doc pointers must be contiguous")
          val nSegs = buf.getInt
          (0 until nSegs).foreach { _ =>
            buf.getLong; buf.getInt; buf.getInt
          }
          off += 4L + 16L * nSegs
        }
        assert(raw.length == 20 + 8 * n + off, "exact GRAFTDOC extent")
      }
    // malformed spans fail the job loudly
    intercept[org.apache.spark.SparkException] {
      val bad = Seq((0L, Seq(1L, 2L), Seq((9L, 1, 5)))) // out of bounds
        .toDF("doc_id", "ids", "segs")
        .select($"doc_id", $"ids", expr(
          "transform(segs, s -> struct(s._1 as doc_id, " +
            "s._2 as start, s._3 as len))").as("segs"))
      TokenShards.write(bad,
        java.nio.file.Files.createTempDirectory("ts_badseg").toString,
        1, vocabSize = 100L, segsCol = Some("segs"))
    }
  }

  test("split reads cover each shard exactly once at any splitsPerShard") {
    val dir = java.nio.file.Files.createTempDirectory("ts_split").toString
    val df = sampleDf(70, 400L)
    TokenShards.write(df, dir, nShards = 2, vocabSize = 400L)
    val exp = df.as[(Long, Seq[Long])].collect().toMap
    Seq(1, 3, 8, 100).foreach { k =>
      val back = TokenShards.read(spark, dir, splitsPerShard = k)
        .select($"doc_id", $"ids").as[(Long, Seq[Long])]
        .collect()
      assert(back.length == exp.size, s"row count drift at $k splits")
      assert(back.toMap == exp, s"split-read drift at $k splits")
    }
    // boundary sidecar THROUGH the split reader: the pointer-slice path
    // (interior splits read one extra pointer; the last split uses the
    // file-length sentinel) must reproduce every span
    val bdir = java.nio.file.Files.createTempDirectory("ts_split_b")
      .toString
    val bdf = df.select($"doc_id", $"ids",
      expr("array(struct(doc_id as doc_id, 0 as start, " +
        "size(ids) as len))").as("segs"))
    TokenShards.write(bdf, bdir, nShards = 2, vocabSize = 400L,
      segsCol = Some("segs"))
    Seq(1, 3, 100).foreach { k =>
      val back = TokenShards.read(spark, bdir, splitsPerShard = k,
          boundaries = true)
        .select($"doc_id", size($"ids"),
          expr("transform(segs, s -> struct(s.doc_id, s.start, s.len))"))
        .as[(Long, Int, Seq[(Long, Int, Int)])].collect()
      assert(back.length == exp.size)
      back.foreach { case (id, n, segs) =>
        assert(segs == Seq((id, 0, n)),
          s"sidecar drift at $k splits for doc $id")
      }
    }
  }

  test("reader validates counts and pointers against the bin extent") {
    val dir = java.nio.file.Files.createTempDirectory("ts_corrupt").toString
    TokenShards.write(sampleDf(10, 50L), dir, 1, vocabSize = 50L)
    val idx = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".idx")).head
    val raw = java.nio.file.Files.readAllBytes(idx.toPath)
    // corrupt the first record's token count to a huge value
    val buf = ByteBuffer.wrap(raw).order(ByteOrder.LITTLE_ENDIAN)
    buf.putInt(24 + 16, Int.MaxValue)
    java.nio.file.Files.write(idx.toPath, raw)
    val e = intercept[org.apache.spark.SparkException] {
      TokenShards.read(spark, dir).count()
    }
    assert(e.getMessage.contains("corrupt") ||
      Option(e.getCause).exists(_.getMessage.contains("corrupt")))
  }

  test("prepare refuses to wipe a directory that is not shard output") {
    val dir = java.nio.file.Files.createTempDirectory("ts_guard")
    java.nio.file.Files.write(dir.resolve("precious.txt"),
      "not shard output".getBytes("UTF-8"))
    intercept[IllegalArgumentException] {
      TokenShards.write(sampleDf(5, 50L), dir.toString, 1, vocabSize = 50L)
    }
    assert(java.nio.file.Files.exists(dir.resolve("precious.txt")),
      "the guard must leave the foreign directory untouched")
    // a prior shard output IS overwritable
    val ok = java.nio.file.Files.createTempDirectory("ts_guard_ok").toString
    TokenShards.write(sampleDf(5, 50L), ok, 1, vocabSize = 50L)
    TokenShards.write(sampleDf(7, 50L), ok, 1, vocabSize = 50L)
    assert(TokenShards.read(spark, ok).count() == 7)
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
