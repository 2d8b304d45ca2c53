package graft.pipeline

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.SerializableConfiguration

/** Fixed-width token-id binary shards — the Megatron-LM
  * `indexed_dataset` shape (NVIDIA/Megatron-LM `indexed_dataset.py`,
  * public): the artifact a training loader actually memory-maps. Each
  * shard is a PAIR:
  *
  *   - `shard-NNNNNN.bin` — every document's token ids concatenated in
  *     ascending doc-id order, each id as a little-endian fixed-width
  *     integer (2 bytes when the vocabulary fits uint16, else 4 — the
  *     Megatron dtype rule), zero framing: the training loader slices
  *     directly by offset.
  *   - `shard-NNNNNN.idx` — the seek table: an 8-byte magic
  *     (`GRAFTIDX`), int32 version, int32 token width, int64 document
  *     count, then one (doc_id int64, byte pointer int64, token count
  *     int32) record per document. All integers little-endian. The
  *     pointer gives O(1) document seek into `.bin`; the index is
  *     ~20 bytes/doc — about 1–2% of a typical `.bin` — so holding one
  *     shard's index in memory while streaming its data is the intended
  *     read posture (exactly how Megatron mmaps `.idx`).
  *
  * Documented deviation from Megatron's exact bytes: the header magic
  * and the per-doc `doc_id` column (Megatron keys by position; a
  * distributed pipeline needs the stable id to survive the round trip).
  * The body layout — LE fixed-width ids, pointer/length seek records —
  * is the same shape.
  *
  * Scale discipline (the [[Webdataset]] contract): placement is
  * [[ShardWriter.shardExpr]]'s stable hash (reruns reproduce identical
  * membership), one shuffle then per-task streaming writes, one
  * document's ids resident at a time on the `.bin` path, each attempt
  * streams to `_tmp/` and publishes both files by atomic rename on the
  * shard boundary, and the driver stamps `_SUCCESS` only after the job
  * returns. Bytes are run-independent: same input, same bytes.
  */
object TokenShards {

  val Magic: Array[Byte] = "GRAFTIDX".getBytes("US-ASCII")
  val Version = 1

  /** The Megatron dtype rule: uint16 ids while the vocabulary fits,
    * int32 past it. */
  def tokenWidth(vocabSize: Long): Int =
    if (vocabSize <= 65536L) 2 else 4

  private def le(n: Int): ByteBuffer =
    ByteBuffer.allocate(n).order(ByteOrder.LITTLE_ENDIAN)

  /** Write `df` (`idCol`: int64 sample id, `tokensCol`: array<long> of
    * token ids) as `nShards` bin/idx pairs under `outDir`. Fails the job
    * on a negative id ([[Webdataset]]'s key contract) or an id outside
    * the chosen width — silent truncation would corrupt every token
    * after it. */
  def write(df: DataFrame, outDir: String, nShards: Int, vocabSize: Long,
      idCol: String = "doc_id", tokensCol: String = "ids"): Unit = {
    require(nShards >= 1, "need a positive shard count")
    val width = tokenWidth(vocabSize)
    val maxId = if (width == 2) 65535L else Int.MaxValue.toLong
    val spark = df.sparkSession
    val conf = new SerializableConfiguration(
      spark.sessionState.newHadoopConf())
    val root = new Path(outDir)
    val fs = root.getFileSystem(conf.value)
    ShardFiles.prepare(fs, root)
    ShardWriter.assignShards(df.select(col(idCol), col(tokensCol)), nShards,
        idCol)
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col(idCol))
      .foreachPartition { (it: Iterator[Row]) =>
        val attempt = Option(org.apache.spark.TaskContext.get())
          .map(_.taskAttemptId()).getOrElse(0L)
        val pfs = new Path(outDir).getFileSystem(conf.value)
        var cur = -1
        var prevId = -1L
        var bin: org.apache.hadoop.fs.FSDataOutputStream = null
        var binTmp: Path = null
        var pointer = 0L
        // idx records accumulate in memory per shard (~20 B/doc, one to
        // two percent of the .bin bytes — the documented read posture
        // holds on the write side too)
        var idx: java.io.ByteArrayOutputStream = null
        var docs = 0L
        def publish(): Unit = if (bin != null) {
          bin.close(); bin = null
          val idxTmp = ShardFiles.attemptTmp(outDir,
            f"shard-$cur%06d.idx", attempt)
          val out = pfs.create(idxTmp, true)
          out.write(Magic)
          out.write(le(16).putInt(Version).putInt(width)
            .putLong(docs).array())
          idx.writeTo(out)
          out.close()
          // publish .bin first, .idx second: readers key off .idx files,
          // so a half-published pair is invisible (and _SUCCESS gates
          // completeness anyway)
          ShardFiles.publish(pfs, binTmp,
            new Path(outDir, f"shard-$cur%06d.bin"))
          ShardFiles.publish(pfs, idxTmp,
            new Path(outDir, f"shard-$cur%06d.idx"))
          binTmp = null; idx = null
        }
        def abort(): Unit = {
          if (bin != null) {
            try bin.close() catch { case _: Throwable => () }
            bin = null
          }
          if (binTmp != null) {
            try pfs.delete(binTmp, false) catch { case _: Throwable => () }
            binTmp = null
          }
        }
        try {
          it.foreach { r =>
            val id = r.getLong(0)
            val ids = r.getSeq[Long](1)
            val shard = r.getInt(2)
            if (shard != cur) {
              publish()
              cur = shard
              prevId = -1L
              binTmp = ShardFiles.attemptTmp(outDir,
                f"shard-$cur%06d.bin", attempt)
              bin = pfs.create(binTmp, true)
              idx = new java.io.ByteArrayOutputStream()
              pointer = 0L
              docs = 0L
            }
            // the shared id contract (see [[ShardFiles]]): a violation
            // fails THIS task before its current shard publishes;
            // job-level completeness stays the _SUCCESS marker's job
            ShardFiles.checkAscendingId(id, prevId, "token shards")
            prevId = id
            // one document's encoded ids are buffered whole (the read
            // side mirrors this) — bound it LOUDLY instead of letting
            // Int arithmetic wrap negative at ~2 GiB
            require(ids.length <= Int.MaxValue / width,
              s"document $id holds ${ids.length} tokens — over the " +
                s"2 GiB single-document buffer bound at width $width")
            val buf = le(ids.length * width)
            ids.foreach { t =>
              require(t >= 0L && t <= maxId,
                s"token id $t outside the $width-byte width (doc $id)")
              if (width == 2) buf.putShort(t.toShort) else buf.putInt(t.toInt)
            }
            bin.write(buf.array())
            idx.write(le(20).putLong(id).putLong(pointer)
              .putInt(ids.length).array())
            pointer += ids.length.toLong * width
            docs += 1
          }
          publish()
        } catch { case t: Throwable => abort(); throw t }
      }
    ShardFiles.finish(fs, root)
  }

  /** Read a shard directory back as (shard_file, doc_id, ids) — one
    * partition per shard pair; the index is read whole (its documented
    * ~1% size), the data file streams sequentially with ONE document's
    * ids resident at a time. `requireSuccess` as in
    * [[Webdataset.readTarShards]]. */
  def read(spark: SparkSession, dir: String,
      requireSuccess: Boolean = true): DataFrame = {
    import spark.implicits._
    val conf = new SerializableConfiguration(
      spark.sessionState.newHadoopConf())
    val root = new Path(dir)
    val fs = root.getFileSystem(conf.value)
    ShardFiles.checkSuccess(fs, root, requireSuccess,
      "externally-written shard pairs")
    val paths = ShardFiles.listShards(fs, root, ".idx")
    val ds =
      if (paths.isEmpty) spark.emptyDataset[String]
      else spark.createDataset(paths).repartition(paths.length)
    ds.mapPartitions { it =>
      it.flatMap { p =>
        val idxPath = new Path(p)
        val hfs = idxPath.getFileSystem(conf.value)
        val idxLen = hfs.getFileStatus(idxPath).getLen
        require(idxLen >= 24 && idxLen <= Int.MaxValue,
          s"malformed token-shard index: $p")
        val raw = new Array[Byte](idxLen.toInt)
        val in = hfs.open(idxPath)
        try in.readFully(0L, raw) finally in.close()
        val buf = ByteBuffer.wrap(raw).order(ByteOrder.LITTLE_ENDIAN)
        val magic = new Array[Byte](Magic.length)
        buf.get(magic)
        require(java.util.Arrays.equals(magic, Magic),
          s"bad token-shard magic in $p")
        require(buf.getInt == Version, s"unsupported version in $p")
        val width = buf.getInt
        require(width == 2 || width == 4, s"bad token width $width in $p")
        val docs = buf.getLong
        require(docs >= 0 && raw.length.toLong == 24L + docs * 20L,
          s"index length disagrees with document count in $p")
        val binPath = new Path(idxPath.getParent,
          idxPath.getName.stripSuffix(".idx") + ".bin")
        val bin = hfs.open(binPath)
        Option(org.apache.spark.TaskContext.get()).foreach(
          _.addTaskCompletionListener[Unit](_ =>
            try bin.close() catch { case _: Throwable => () }))
        val name = binPath.getName
        (0L until docs).iterator.map { _ =>
          val id = buf.getLong
          val ptr = buf.getLong
          val n = buf.getInt
          val bytes = new Array[Byte](n * width)
          bin.readFully(ptr, bytes)
          val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
          val ids = new Array[Long](n)
          var i = 0
          while (i < n) {
            ids(i) =
              if (width == 2) (bb.getShort.toLong & 0xffffL)
              else bb.getInt.toLong
            i += 1
          }
          (name, id, ids.toSeq)
        } ++ { bin.close(); Iterator.empty }
      }
    }.toDF("shard_file", "doc_id", "ids")
  }
}
