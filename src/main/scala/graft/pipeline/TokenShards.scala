package graft.pipeline

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.hadoop.fs.{FSDataOutputStream, FileSystem, Path}
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
  *   - `shard-NNNNNN.idx` — the seek table, in one of TWO formats
  *     (the [[Format]] flag):
  *
  *     [[Graft]] (default): an 8-byte magic (`GRAFTIDX`), int32
  *     version, int32 token width, int64 document count, then one
  *     (doc_id int64, byte pointer int64, token count int32) record per
  *     document. All integers little-endian. The pointer gives O(1)
  *     document seek into `.bin`; the index is ~20 bytes/doc — about
  *     1–2% of a typical `.bin` — so holding one shard's index in
  *     memory while streaming its data is the intended read posture
  *     (exactly how Megatron mmaps `.idx`). The deviation from
  *     Megatron's exact bytes — this magic and the per-doc `doc_id`
  *     column — exists because a distributed pipeline needs the stable
  *     id to survive the round trip (Megatron keys by position).
  *
  *     [[Megatron]] (strict interop): byte-for-byte the public
  *     Megatron-LM `indexed_dataset.py` MMap index — 9-byte magic
  *     `MMIDIDX\0\0`, int64 version 1, one dtype-code byte (the
  *     fairseq/Megatron dtype table: 8 = uint16, 4 = int32), int64
  *     sequence count, int64 document-index count, then the int32
  *     `sizes` array, the int64 byte-`pointers` array, and the int64
  *     `doc_idx` array (here `0..n` — each written row is one
  *     document). A real Megatron/GPT-NeoX loader mmaps this output
  *     unmodified; sample identity is POSITIONAL (ascending input-id
  *     rank within the shard), so reads of this format return that
  *     position as `doc_id`.
  *
  *   - `shard-NNNNNN.doc` (optional, [[Graft]] only) — the
  *     DOCUMENT-BOUNDARY sidecar for packed sequences: per idx record,
  *     in idx order, the spans of the source documents inside that
  *     sequence — what a training loader needs to reset attention masks
  *     and position ids across document boundaries instead of attending
  *     through them. Layout: 8-byte magic `GRAFTDOC`, int32 version,
  *     int64 record count, then an int64 pointer per record (offset
  *     into the records region — O(1) seek, split-read friendly), then
  *     per record: int32 segment count, then per segment (doc_id int64,
  *     start int32, len int32), `start`/`len` in tokens within the
  *     sequence. All little-endian.
  *
  * Scale discipline (the [[Webdataset]] contract): placement is
  * [[ShardWriter.shardExpr]]'s stable hash (reruns reproduce identical
  * membership), one shuffle then per-task streaming writes, one
  * document's ids resident at a time on the `.bin` path, each attempt
  * streams to `_tmp/` and publishes all of a shard's files by atomic
  * rename on the shard boundary, and the driver stamps `_SUCCESS` only
  * after the job returns. Bytes are run-independent: same input, same
  * bytes. Index metadata (seek records, sizes, pointers, boundary
  * records) STREAMS to sibling `_tmp` files and is stitched behind the
  * final header at publish — per-doc write memory is O(1) in
  * docs-per-shard, so a shard of very short documents cannot grow an
  * in-memory index without bound.
  */
object TokenShards {

  val Magic: Array[Byte] = "GRAFTIDX".getBytes("US-ASCII")
  val Version = 1
  /** The public Megatron-LM index header (`indexed_dataset.py`). */
  val MegatronMagic: Array[Byte] =
    "MMIDIDX".getBytes("US-ASCII") ++ Array[Byte](0, 0)
  val DocMagic: Array[Byte] = "GRAFTDOC".getBytes("US-ASCII")
  val DocVersion = 1

  /** Index layout selector — see the object doc. */
  sealed trait Format extends Serializable
  case object Graft extends Format
  case object Megatron extends Format

  /** The Megatron dtype rule: uint16 ids while the vocabulary fits,
    * int32 past it. */
  def tokenWidth(vocabSize: Long): Int =
    if (vocabSize <= 65536L) 2 else 4

  /** The fairseq/Megatron dtype-code table entry for a token width. */
  def megatronDtypeCode(width: Int): Byte =
    if (width == 2) 8.toByte else 4.toByte

  private def le(n: Int): ByteBuffer =
    ByteBuffer.allocate(n).order(ByteOrder.LITTLE_ENDIAN)

  /** Stream-copy `src` into `out` (64 KiB buffer) and delete `src` —
    * the publish-time stitch of a streamed metadata channel behind its
    * header. */
  private def copyInto(fs: FileSystem, src: Path,
      out: FSDataOutputStream): Unit = {
    val in = fs.open(src)
    try {
      val buf = new Array[Byte](65536)
      var n = in.read(buf)
      while (n >= 0) {
        if (n > 0) out.write(buf, 0, n)
        n = in.read(buf)
      }
    } finally in.close()
    fs.delete(src, false)
  }

  /** Write `df` (`idCol`: int64 sample id, `tokensCol`: array<long> of
    * token ids, optionally `segsCol`: array<struct<doc_id:long,
    * start:int, len:int>> boundary spans) as `nShards` shard file sets
    * under `outDir`. Fails the job on a negative id ([[Webdataset]]'s
    * key contract), an id outside the chosen width — silent truncation
    * would corrupt every token after it — or a malformed boundary span
    * (out of the sequence's bounds, or overlapping its predecessor). */
  def write(df: DataFrame, outDir: String, nShards: Int, vocabSize: Long,
      idCol: String = "doc_id", tokensCol: String = "ids",
      format: Format = Graft, segsCol: Option[String] = None): Unit = {
    require(nShards >= 1, "need a positive shard count")
    require(segsCol.isEmpty || format == Graft,
      "boundary sidecars are a GRAFTIDX extension — the strict Megatron " +
        "layout has no per-sequence document-span channel")
    val width = tokenWidth(vocabSize)
    val maxId = if (width == 2) 65535L else Int.MaxValue.toLong
    val megatron = format == Megatron
    val withSegs = segsCol.isDefined
    val spark = df.sparkSession
    val conf = new SerializableConfiguration(
      spark.sessionState.newHadoopConf())
    val root = new Path(outDir)
    val fs = root.getFileSystem(conf.value)
    ShardFiles.prepare(fs, root)
    val cols = Seq(col(idCol), col(tokensCol)) ++ segsCol.map(col)
    ShardWriter.assignShards(df.select(cols: _*), nShards, idCol)
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col(idCol))
      .foreachPartition { (it: Iterator[Row]) =>
        val attempt = Option(org.apache.spark.TaskContext.get())
          .map(_.taskAttemptId()).getOrElse(0L)
        val pfs = new Path(outDir).getFileSystem(conf.value)
        val shardIx = if (withSegs) 3 else 2
        var cur = -1
        var prevId = -1L
        var bin: FSDataOutputStream = null
        var binTmp: Path = null
        // metadata channels STREAM to their own temp files (O(1) memory
        // in docs-per-shard) and are stitched behind the header at
        // publish: Graft = idx seek records; Megatron = sizes + pointers
        // arrays; the boundary sidecar = record pointers + records
        var metaA: FSDataOutputStream = null; var metaATmp: Path = null
        var metaB: FSDataOutputStream = null; var metaBTmp: Path = null
        var docPtrs: FSDataOutputStream = null; var docPtrsTmp: Path = null
        var docRecs: FSDataOutputStream = null; var docRecsTmp: Path = null
        // the publish-time header-stitch channels are tracked too: an
        // IOException inside copyInto or a header write must not strand
        // an open descriptor + attempt-temp idx/doc file until the next
        // prepare wipe (task retries in a long-lived executor accumulate)
        var idxOut: FSDataOutputStream = null; var idxTmpT: Path = null
        var docOut: FSDataOutputStream = null; var docTmpT: Path = null
        var pointer = 0L
        var docs = 0L
        var docBytes = 0L
        def openChannel(name: String): (FSDataOutputStream, Path) = {
          val tmp = ShardFiles.attemptTmp(outDir, name, attempt)
          (pfs.create(tmp, true), tmp)
        }
        def publish(): Unit = if (bin != null) {
          bin.close(); bin = null
          metaA.close(); metaA = null
          if (metaB != null) { metaB.close(); metaB = null }
          val idxTmp = ShardFiles.attemptTmp(outDir,
            f"shard-$cur%06d.idx", attempt)
          val out = pfs.create(idxTmp, true)
          idxOut = out; idxTmpT = idxTmp
          if (megatron) {
            out.write(MegatronMagic)
            out.write(le(9).putLong(1L)
              .put(megatronDtypeCode(width)).array())
            out.write(le(16).putLong(docs).putLong(docs + 1L).array())
            copyInto(pfs, metaATmp, out) // sizes (int32 each)
            copyInto(pfs, metaBTmp, out) // pointers (int64 each)
            // doc_idx: one document per written row -> 0..docs, streamed
            var d = 0L
            val chunk = le(8 * 1024)
            while (d <= docs) {
              chunk.clear()
              while (d <= docs && chunk.remaining() >= 8) {
                chunk.putLong(d); d += 1L
              }
              out.write(chunk.array(), 0, chunk.position())
            }
          } else {
            out.write(Magic)
            out.write(le(16).putInt(Version).putInt(width)
              .putLong(docs).array())
            copyInto(pfs, metaATmp, out) // (doc_id, pointer, count) records
          }
          out.close(); idxOut = null
          metaATmp = null; metaBTmp = null
          // publish .bin first, the sidecar second, .idx LAST: readers
          // key off .idx files, so a half-published set is invisible
          // (and _SUCCESS gates completeness anyway)
          ShardFiles.publish(pfs, binTmp,
            new Path(outDir, f"shard-$cur%06d.bin"))
          binTmp = null
          if (withSegs) {
            docPtrs.close(); docPtrs = null
            docRecs.close(); docRecs = null
            val docTmp = ShardFiles.attemptTmp(outDir,
              f"shard-$cur%06d.doc", attempt)
            val dout = pfs.create(docTmp, true)
            docOut = dout; docTmpT = docTmp
            dout.write(DocMagic)
            dout.write(le(12).putInt(DocVersion).putLong(docs).array())
            copyInto(pfs, docPtrsTmp, dout)
            copyInto(pfs, docRecsTmp, dout)
            dout.close(); docOut = null
            docPtrsTmp = null; docRecsTmp = null
            ShardFiles.publish(pfs, docTmp,
              new Path(outDir, f"shard-$cur%06d.doc"))
            docTmpT = null
          }
          ShardFiles.publish(pfs, idxTmp,
            new Path(outDir, f"shard-$cur%06d.idx"))
          idxTmpT = null
        }
        def abort(): Unit = {
          Seq(bin, metaA, metaB, docPtrs, docRecs, idxOut, docOut)
            .foreach { s =>
              if (s != null) try s.close() catch { case _: Throwable => () }
            }
          bin = null; metaA = null; metaB = null
          docPtrs = null; docRecs = null; idxOut = null; docOut = null
          Seq(binTmp, metaATmp, metaBTmp, docPtrsTmp, docRecsTmp,
              idxTmpT, docTmpT)
            .foreach { p =>
              if (p != null)
                try pfs.delete(p, false) catch { case _: Throwable => () }
            }
          binTmp = null; metaATmp = null; metaBTmp = null
          docPtrsTmp = null; docRecsTmp = null; idxTmpT = null
          docTmpT = null
        }
        try {
          it.foreach { r =>
            val id = r.getLong(0)
            val ids = r.getSeq[Long](1)
            val shard = r.getInt(shardIx)
            if (shard != cur) {
              publish()
              cur = shard
              prevId = -1L
              val (b, bt) = openChannel(f"shard-$cur%06d.bin")
              bin = b; binTmp = bt
              val (a, at) = openChannel(f"shard-$cur%06d.meta-a")
              metaA = a; metaATmp = at
              if (megatron) {
                val (m, mt) = openChannel(f"shard-$cur%06d.meta-b")
                metaB = m; metaBTmp = mt
              }
              if (withSegs) {
                val (p, pt) = openChannel(f"shard-$cur%06d.doc-ptrs")
                docPtrs = p; docPtrsTmp = pt
                val (d, dt) = openChannel(f"shard-$cur%06d.doc-recs")
                docRecs = d; docRecsTmp = dt
              }
              pointer = 0L
              docs = 0L
              docBytes = 0L
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
            if (megatron) {
              metaA.write(le(4).putInt(ids.length).array())
              metaB.write(le(8).putLong(pointer).array())
            } else {
              metaA.write(le(20).putLong(id).putLong(pointer)
                .putInt(ids.length).array())
            }
            if (withSegs) {
              val segs = r.getSeq[Row](2)
              docPtrs.write(le(8).putLong(docBytes).array())
              val sbuf = le(4 + 16 * segs.length).putInt(segs.length)
              var prevEnd = 0
              segs.foreach { s =>
                val did = s.getLong(0)
                val st = s.getInt(1)
                val ln = s.getInt(2)
                require(st >= prevEnd && ln > 0 && st + ln <= ids.length,
                  s"malformed boundary span (doc $did, start $st, len " +
                    s"$ln) in sequence $id of ${ids.length} tokens — " +
                    "spans must be in-bounds, non-empty and ascending")
                prevEnd = st + ln
                sbuf.putLong(did).putInt(st).putInt(ln)
              }
              docRecs.write(sbuf.array())
              docBytes += 4L + 16L * segs.length
            }
            pointer += ids.length.toLong * width
            docs += 1
          }
          publish()
        } catch { case t: Throwable => abort(); throw t }
      }
    ShardFiles.finish(fs, root)
  }

  /** Read a shard directory back as (shard_file, doc_id, ids) — plus a
    * `segs` boundary column when `boundaries` is set (requires the
    * `.doc` sidecars). Format is auto-detected per file from the index
    * magic; for [[Megatron]]-format shards `doc_id` is the sample's
    * POSITION within its shard (the layout stores no ids). Each shard's
    * record range splits across `splitsPerShard` tasks via the seek
    * table — read parallelism is independent of the shard count, so a
    * few huge shards still fan out across a cluster. Within a split the
    * index slice is read whole (its documented ~1% size) and the data
    * file is read by positioned I/O with ONE document's ids resident at
    * a time. Every idx-declared count and pointer is validated against
    * the `.bin` extent before allocation — corrupt or externally-
    * written files fail loudly, mirroring the writer's guards.
    * `requireSuccess` as in [[Webdataset.readTarShards]]. */
  def read(spark: SparkSession, dir: String,
      requireSuccess: Boolean = true, splitsPerShard: Int = 1,
      boundaries: Boolean = false): DataFrame = {
    import spark.implicits._
    require(splitsPerShard >= 1, "need a positive splits-per-shard")
    val conf = new SerializableConfiguration(
      spark.sessionState.newHadoopConf())
    val root = new Path(dir)
    val fs = root.getFileSystem(conf.value)
    ShardFiles.checkSuccess(fs, root, requireSuccess,
      "externally-written shard pairs")
    val paths = ShardFiles.listShards(fs, root, ".idx")
    val splits = for (p <- paths; s <- 0 until splitsPerShard)
      yield (p, s)
    val ds =
      if (splits.isEmpty) spark.emptyDataset[(String, Int)]
      else spark.createDataset(splits).repartition(splits.length)
    val raw = ds.mapPartitions { it =>
      it.flatMap { case (p, splitIx) =>
        readSplit(conf, p, splitIx, splitsPerShard, boundaries)
      }
    }.toDF("shard_file", "doc_id", "ids", "segs_raw")
    if (boundaries)
      raw.withColumn("segs", col("segs_raw")
          .cast("array<struct<doc_id:bigint,start:int,len:int>>"))
        .drop("segs_raw")
    else raw.drop("segs_raw")
  }

  /** One split's record range `[lo, hi)` over one shard — index slice
    * and (when asked) boundary-sidecar slice via positioned reads, then
    * a streaming pass over the `.bin` range. */
  private def readSplit(conf: SerializableConfiguration, p: String,
      splitIx: Int, nSplits: Int, boundaries: Boolean)
      : Iterator[(String, Long, Seq[Long], Seq[(Long, Int, Int)])] = {
    val idxPath = new Path(p)
    val hfs = idxPath.getFileSystem(conf.value)
    val idxLen = hfs.getFileStatus(idxPath).getLen
    // 24 = the GRAFTIDX header (the smaller of the two formats;
    // Megatron's minimum is 34) — a shorter file is truncated and must
    // die HERE with the diagnosable message, not as a raw EOFException
    // from a header read. No upper cap: a legitimate externally-written
    // Megatron .idx over 2 GiB (~90M+ sequences) is fine — all offset
    // arithmetic below is Long and only the per-SPLIT slice (bounded by
    // splitsPerShard, guarded per allocation) is ever resident
    require(idxLen >= 24, s"malformed token-shard index: $p")
    val in = hfs.open(idxPath)
    // register the close listener BEFORE any require/stat can throw —
    // Spark retries failed read tasks, and each retry of a
    // missing-bin/bad-magic failure would otherwise leak a descriptor
    // in the long-lived executor JVM
    Option(org.apache.spark.TaskContext.get()).foreach(
      _.addTaskCompletionListener[Unit](_ =>
        try in.close() catch { case _: Throwable => () }))
    val head = new Array[Byte](MegatronMagic.length)
    try in.readFully(0L, head)
    catch {
      case e: java.io.IOException =>
        throw new IllegalArgumentException(
          s"unreadable token-shard index: $p", e)
    }
    val megatron =
      java.util.Arrays.equals(head, MegatronMagic)
    val graft = java.util.Arrays.equals(head.take(Magic.length), Magic)
    require(megatron || graft,
      s"bad token-shard magic in $p — neither GRAFTIDX nor MMIDIDX")
    // the 24-byte floor above covers only the GRAFTIDX header; a
    // Megatron index needs its own minimum or a 24-33-byte truncation
    // dies as a raw EOFException inside the header read
    require(!megatron || idxLen >= MegatronMagic.length + 25,
      s"malformed token-shard index: $p")
    require(!(boundaries && megatron),
      s"boundary read requested but $p is a Megatron-format index " +
        "(no .doc sidecar channel)")
    val binPath = new Path(idxPath.getParent,
      idxPath.getName.stripSuffix(".idx") + ".bin")
    val binLen = hfs.getFileStatus(binPath).getLen
    val bin = hfs.open(binPath)
    Option(org.apache.spark.TaskContext.get()).foreach(
      _.addTaskCompletionListener[Unit](_ =>
        try bin.close() catch { case _: Throwable => () }))
    val name = binPath.getName

    def readAt(off: Long, n: Int): ByteBuffer = {
      val raw = new Array[Byte](n)
      in.readFully(off, raw)
      ByteBuffer.wrap(raw).order(ByteOrder.LITTLE_ENDIAN)
    }
    // the split's index slice is read whole — bound THAT allocation (the
    // thing splitsPerShard controls), not the total index size: a >2 GiB
    // slice means the caller needs more splits, and the message says so
    def sliceLen(lo: Long, hi: Long, recBytes: Long): Int = {
      val n = hi - lo
      require(n >= 0 && n * recBytes <= Int.MaxValue.toLong,
        s"split [$lo, $hi) of $p needs a ${n * recBytes}-byte index " +
          "slice — raise splitsPerShard to bound per-task memory")
      n.toInt
    }
    // validated against the .bin extent BEFORE allocation — the writer
    // guards these, so a violation means corruption or a foreign file
    def checkRecord(what: String, n: Long, ptr: Long, width: Int): Unit =
      require(n >= 0L && n <= (Int.MaxValue / width).toLong &&
          ptr >= 0L && ptr + n * width <= binLen,
        s"corrupt $what in $p: count $n at pointer $ptr does not fit " +
          s"the ${binLen}-byte data file at width $width")
    def readIds(ptr: Long, n: Int, width: Int): Seq[Long] = {
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
      ids.toSeq
    }

    if (megatron) {
      val h = readAt(MegatronMagic.length.toLong, 25)
      require(h.getLong == 1L, s"unsupported Megatron index version in $p")
      val code = h.get
      val width = if (code == 8.toByte) 2 else if (code == 4.toByte) 4
        else throw new IllegalArgumentException(
          s"unsupported Megatron dtype code $code in $p")
      val seqs = h.getLong
      val docIdx = h.getLong
      val base = MegatronMagic.length.toLong + 25L
      require(seqs >= 0 && docIdx >= 0 &&
          idxLen == base + 4L * seqs + 8L * seqs + 8L * docIdx,
        s"index length disagrees with sequence count in $p")
      val lo = seqs * splitIx / nSplits
      val hi = seqs * (splitIx + 1) / nSplits
      val n = sliceLen(lo, hi, 8L)
      if (n == 0) Iterator.empty
      else {
        val sizes = readAt(base + 4L * lo, 4 * n)
        val ptrs = readAt(base + 4L * seqs + 8L * lo, 8 * n)
        (0 until n).iterator.map { k =>
          val sz = sizes.getInt.toLong
          val ptr = ptrs.getLong
          checkRecord("Megatron size record", sz, ptr, width)
          (name, lo + k, readIds(ptr, sz.toInt, width),
            Seq.empty[(Long, Int, Int)])
        }
      }
    } else {
      val h = readAt(Magic.length.toLong, 16)
      require(h.getInt == Version, s"unsupported version in $p")
      val width = h.getInt
      require(width == 2 || width == 4, s"bad token width $width in $p")
      val docs = h.getLong
      require(docs >= 0 && idxLen == 24L + docs * 20L,
        s"index length disagrees with document count in $p")
      val lo = docs * splitIx / nSplits
      val hi = docs * (splitIx + 1) / nSplits
      val n = sliceLen(lo, hi, 20L)
      if (n == 0) Iterator.empty
      else {
        val recs = readAt(24L + lo * 20L, 20 * n)
        val docSlices: Option[(java.io.DataInput, Long => ByteBuffer)] =
          if (!boundaries) None
          else {
            val docPath = new Path(idxPath.getParent,
              idxPath.getName.stripSuffix(".idx") + ".doc")
            require(hfs.exists(docPath),
              s"boundary read requested but $docPath is missing")
            val docLen = hfs.getFileStatus(docPath).getLen
            val din = hfs.open(docPath)
            Option(org.apache.spark.TaskContext.get()).foreach(
              _.addTaskCompletionListener[Unit](_ =>
                try din.close() catch { case _: Throwable => () }))
            val dh = new Array[Byte](20)
            din.readFully(0L, dh)
            val dbuf = ByteBuffer.wrap(dh).order(ByteOrder.LITTLE_ENDIAN)
            val dm = new Array[Byte](DocMagic.length); dbuf.get(dm)
            require(java.util.Arrays.equals(dm, DocMagic),
              s"bad boundary-sidecar magic in $docPath")
            require(dbuf.getInt == DocVersion,
              s"unsupported boundary-sidecar version in $docPath")
            require(dbuf.getLong == docs,
              s"boundary sidecar record count disagrees with $p")
            val recBase = 20L + 8L * docs
            // pointer slice for [lo, hi) plus the end sentinel (file
            // length when the range runs to the last record)
            val ptrsRaw = new Array[Byte](8 * n)
            din.readFully(20L + 8L * lo, ptrsRaw)
            val ptrs = ByteBuffer.wrap(ptrsRaw)
              .order(ByteOrder.LITTLE_ENDIAN)
            val offs = Array.tabulate(n)(_ => ptrs.getLong)
            val endOff =
              if (hi == docs) docLen - recBase
              else {
                val eb = new Array[Byte](8)
                din.readFully(20L + 8L * hi, eb)
                ByteBuffer.wrap(eb).order(ByteOrder.LITTLE_ENDIAN).getLong
              }
            val reader: Long => ByteBuffer = { k =>
              val i = (k - lo).toInt
              val from = offs(i)
              val to = if (i + 1 < n) offs(i + 1) else endOff
              require(from >= 0 && to >= from + 4 &&
                  to - from <= Int.MaxValue.toLong &&
                  recBase + to <= docLen,
                s"corrupt boundary record $k in $docPath")
              val raw = new Array[Byte]((to - from).toInt)
              din.readFully(recBase + from, raw)
              ByteBuffer.wrap(raw).order(ByteOrder.LITTLE_ENDIAN)
            }
            Some((din, reader))
          }
        (0 until n).iterator.map { k =>
          val id = recs.getLong
          val ptr = recs.getLong
          val cnt = recs.getInt.toLong
          checkRecord("seek record", cnt, ptr, width)
          val segs = docSlices match {
            case None => Seq.empty[(Long, Int, Int)]
            case Some((_, rd)) =>
              val b = rd(lo + k)
              val nSegs = b.getInt
              require(nSegs >= 0 && b.remaining() == 16 * nSegs,
                s"corrupt boundary record for doc $id in $p")
              Seq.tabulate(nSegs)(_ => (b.getLong, b.getInt, b.getInt))
          }
          (name, id, readIds(ptr, cnt.toInt, width), segs)
        }
      }
    }
  }
}
