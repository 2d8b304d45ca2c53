package graft.pipeline

import org.apache.commons.compress.archivers.tar.TarArchiveInputStream
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** WebDataset tar shards: byte-exact round trip (binary payloads,
  * compound extensions), hash placement, in-shard sample grouping and
  * ordering, and reproducible tar bytes. */
class WebdatasetSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("wds_spec").toString

  private def sampleDf(n: Int) = {
    val rows = (0 until n).map { i =>
      val id = i.toLong * 7 + 1
      (id, Map(
        "txt" -> s"text of $id".getBytes("UTF-8"),
        // raw binary incl. NUL and high bytes — must survive untouched
        "bin" -> Array.tabulate[Byte](64)(j => ((id + j * 37) % 256).toByte),
        // compound extension: everything past the FIRST dot
        "seg.json" -> s"""{"id":$id}""".getBytes("UTF-8")))
    }
    rows.toDF("doc_id", "files")
  }

  test("round trip is byte-exact across binary payloads and compound " +
    "extensions") {
    val dir = tmp()
    val df = sampleDf(40)
    Webdataset.writeTarShards(df, dir, nShards = 4)
    val back = Webdataset.readTarShards(spark, dir)
      .select($"key".cast("long"), $"ext", $"content")
      .as[(Long, String, Array[Byte])].collect()
      .groupBy(_._1).view
      .mapValues(_.map(r => r._2 -> r._3).toMap).toMap
    val exp = df.as[(Long, Map[String, Array[Byte]])].collect().toMap
    assert(back.keySet == exp.keySet)
    exp.foreach { case (id, files) =>
      assert(back(id).keySet == files.keySet, s"part set drift on $id")
      files.foreach { case (ext, bytes) =>
        assert(java.util.Arrays.equals(back(id)(ext), bytes),
          s"byte drift on $id.$ext")
      }
    }
  }

  test("placement follows the stable shard hash; in-shard layout groups " +
    "samples and ascends by id") {
    val dir = tmp()
    Webdataset.writeTarShards(sampleDf(40), dir, nShards = 4)
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".tar")).sortBy(_.getName)
    assert(files.nonEmpty)
    val expShard = sampleDf(40).select($"doc_id",
        ShardWriter.shardExpr($"doc_id", 4))
      .as[(Long, Int)].collect().toMap
    files.foreach { f =>
      val shard = f.getName.stripPrefix("shard-").stripSuffix(".tar").toInt
      val in = new TarArchiveInputStream(new java.io.FileInputStream(f))
      val names = Iterator.continually(in.getNextEntry)
        .takeWhile(_ != null).map(_.getName).toVector
      in.close()
      val keys = names.map(_.takeWhile(_ != '.').toLong)
      // every entry belongs to this shard
      keys.foreach(k => assert(expShard(k) == shard, s"$k misplaced"))
      // samples are contiguous (a key never reappears after a gap) and
      // ascend by id
      assert(keys.distinct == keys.distinct.sorted)
      val firstSeen = scala.collection.mutable.LinkedHashSet.empty[Long]
      var prev = -1L
      keys.foreach { k =>
        if (k != prev && firstSeen.contains(k))
          fail(s"sample $k split by a gap in shard $shard")
        firstSeen += k; prev = k
      }
    }
  }

  test("externally-written tars: base_plus_ext keys keep directory " +
    "prefixes, strip './', and compound extensions survive") {
    import org.apache.commons.compress.archivers.tar.{TarArchiveEntry,
      TarArchiveOutputStream}
    val dir = tmp()
    val out = new TarArchiveOutputStream(
      new java.io.FileOutputStream(new java.io.File(dir, "wild.tar")))
    Seq("train/0001.jpg", "val/0001.jpg", "./0002.txt",
      "dir.v2/0003.seg.json").foreach { name =>
      val bytes = name.getBytes("UTF-8")
      val e = new TarArchiveEntry(name)
      e.setSize(bytes.length.toLong)
      out.putArchiveEntry(e); out.write(bytes); out.closeArchiveEntry()
    }
    out.finish(); out.close()
    val got = Webdataset.readTarShards(spark, dir, requireSuccess = false)
      .select($"key", $"ext").as[(String, String)].collect().toSet
    // class-per-directory samples must NOT collide on the basename; a
    // dotted directory must not truncate the key
    assert(got === Set(("train/0001", "jpg"), ("val/0001", "jpg"),
      ("0002", "txt"), ("dir.v2/0003", "seg.json")))
  }

  test("tar bytes are reproducible across reruns") {
    val d1 = tmp(); val d2 = tmp()
    Webdataset.writeTarShards(sampleDf(25), d1, nShards = 3)
    Webdataset.writeTarShards(sampleDf(25), d2, nShards = 3)
    def digest(dir: String): Map[String, String] =
      new java.io.File(dir).listFiles().filter(_.getName.endsWith(".tar"))
        .map { f =>
          val bytes = java.nio.file.Files.readAllBytes(f.toPath)
          f.getName -> java.security.MessageDigest.getInstance("MD5")
            .digest(bytes).map("%02x".format(_)).mkString
        }.toMap
    assert(digest(d1) == digest(d2))
  }
}
