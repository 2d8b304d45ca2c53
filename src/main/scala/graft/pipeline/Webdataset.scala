package graft.pipeline

import org.apache.commons.compress.archivers.tar.{TarArchiveEntry,
  TarArchiveInputStream, TarArchiveOutputStream}
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.SerializableConfiguration

/** WebDataset-style tar shards — the POSIX-tar training-data packaging
  * (github.com/webdataset/webdataset) every large multimodal loader
  * streams: one tar per shard, one SAMPLE per basename key, the sample's
  * parts as consecutive entries `key.ext` (`000000000042.txt`,
  * `000000000042.json`, `000000000042.jpg`, …). The whole point of the
  * format is sequential IO — a training worker reads its shard front to
  * back with zero seeks — so the writer's job is deterministic placement
  * and ordering, and the reader's job is to stay INCREMENTAL (one entry
  * resident at a time, the WARC-reader discipline).
  *
  * Placement is [[ShardWriter.shardExpr]]'s stable hash of the sample id:
  * any rerun reproduces the identical shard membership, and within a
  * shard samples are laid out in ascending id order with their parts
  * adjacent (the grouping WebDataset loaders require). Tar bytes are
  * reproducible — entry mtimes pinned to 0, extensions written in sorted
  * order, POSIX long-name mode.
  *
  * Scale: one shuffle (`repartition` by shard), then each task streams
  * its shards' tars straight to the Hadoop filesystem — no local staging,
  * no whole-shard buffering, one sample resident per write step. Shards
  * are the loader's unit of parallelism; pick `nShards` so a shard lands
  * in the hundreds of MBs (the WebDataset deployment guidance).
  */
object Webdataset {

  /** Default zero-padded sample key — wide enough for any NON-NEGATIVE
    * int64 id to sort lexicographically in id order (a negative id would
    * render as `-0…42` and break both the zero padding and the
    * lexicographic-equals-id claim; [[writeTarShards]] rejects them). */
  val KeyFormat = "%020d"

  /** Completeness marker written by the driver AFTER every shard has
    * published — the standard Hadoop-output convention. A directory of
    * valid-looking `shard-*.tar` files without it is a partial output
    * from a failed job (per-shard publish is atomic, job-level
    * completeness is not — [[ShardFiles]] spells the whole contract),
    * and [[readTarShards]] refuses it by default. */
  val SuccessMarker: String = ShardFiles.SuccessMarker

  /** Write one tar per shard under `outDir` (`shard-NNNNNN.tar`).
    * `filesCol` maps extension → raw bytes for each sample; `idCol` is
    * the stable sample id that drives shard placement and the key. A
    * task may own several shards (hash placement), so tars roll on the
    * shard boundary inside the sorted partition stream; two tasks never
    * share a shard VALUE — but two ATTEMPTS of one task can overlap
    * (speculation, zombie retries), so each attempt streams into
    * `_tmp/shard-N.attempt-A.tar` and publishes by atomic rename on the
    * shard boundary: the first attempt to rename wins whole-file, a
    * loser just deletes its temp — a final path never holds interleaved
    * bytes. The driver clears `_tmp` when the job returns (the `_`
    * prefix keeps in-flight temps invisible to readers either way). */
  def writeTarShards(df: DataFrame, outDir: String, nShards: Int,
      idCol: String = "doc_id", filesCol: String = "files"): Unit = {
    require(nShards >= 1, "need a positive shard count")
    val spark = df.sparkSession
    val conf = new SerializableConfiguration(
      spark.sessionState.newHadoopConf())
    val root = new Path(outDir)
    val fs = root.getFileSystem(conf.value)
    ShardFiles.prepare(fs, root) // overwrite semantics
    ShardWriter.assignShards(df.select(col(idCol), col(filesCol)), nShards,
        idCol)
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col(idCol))
      .foreachPartition { (it: Iterator[Row]) =>
        val attempt = Option(org.apache.spark.TaskContext.get())
          .map(_.taskAttemptId()).getOrElse(0L)
        var cur = -1
        var prevId = -1L
        var tar: TarArchiveOutputStream = null
        var tmp: Path = null
        val pfs = new Path(outDir).getFileSystem(conf.value)
        def publish(): Unit = if (tar != null) {
          tar.finish(); tar.close(); tar = null
          ShardFiles.publish(pfs, tmp,
            new Path(outDir, f"shard-$cur%06d.tar"))
          tmp = null
        }
        def abort(): Unit = {
          // tmp can outlive tar (publish nulls tar before the rename) —
          // clean whichever is still live
          if (tar != null) {
            try tar.close() catch { case _: Throwable => () }
            tar = null
          }
          if (tmp != null) {
            try pfs.delete(tmp, false) catch { case _: Throwable => () }
            tmp = null
          }
        }
        try {
          it.foreach { r =>
            val id = r.getLong(0)
            val files = r.getMap[String, Array[Byte]](1)
            val shard = r.getInt(2)
            if (shard != cur) {
              publish()
              cur = shard
              prevId = -1L
              tmp = ShardFiles.attemptTmp(outDir,
                f"shard-$cur%06d.tar", attempt)
              tar = new TarArchiveOutputStream(pfs.create(tmp, true))
              tar.setLongFileMode(TarArchiveOutputStream.LONGFILE_POSIX)
            }
            // the shared id contract (see [[ShardFiles]] — negatives
            // additionally break [[KeyFormat]]'s zero-padded ordering):
            // a violation fails THIS task before its current shard
            // publishes; completeness stays the _SUCCESS marker's job
            ShardFiles.checkAscendingId(id, prevId, "tar shards")
            prevId = id
            val key = KeyFormat.format(id)
            // sorted extensions: reproducible bytes AND the stable
            // part order loaders group on
            files.toSeq.sortBy(_._1).foreach { case (ext, bytes) =>
              val e = new TarArchiveEntry(s"$key.$ext")
              e.setSize(bytes.length.toLong)
              e.setModTime(0L) // pinned — with ownership, below: the
              e.setUserName("") // tar bytes must be RUN-independent,
              e.setGroupName("") // and TarArchiveEntry otherwise embeds
              e.setUserId(0) // the OS user.name in the ustar header
              e.setGroupId(0)
              tar.putArchiveEntry(e)
              tar.write(bytes)
              tar.closeArchiveEntry()
            }
          }
          publish()
        } catch { case t: Throwable => abort(); throw t }
      }
    // temp sweep + the job-level completeness marker (written only
    // after foreachPartition returns — see [[ShardFiles]])
    ShardFiles.finish(fs, root)
  }

  /** Read a shard directory back as one row per PART:
    * (shard_file, key, ext, content). One input partition per tar; the
    * tar streams incrementally off the filesystem (one entry's bytes
    * resident at a time — never the shard). Key/extension follow the
    * WebDataset `base_plus_ext` rule: split at the first dot AFTER the
    * last '/', directory prefix kept in the KEY (class-per-directory
    * tars keep `train/0001` distinct from `val/0001`; `key.seg.json`
    * parts keep their compound extension); a leading `./` is stripped.
    * `requireSuccess` (default on) demands the [[SuccessMarker]] so a
    * partial output from a died writer job cannot be read as complete —
    * pass false only for tars produced by other tools. */
  def readTarShards(spark: SparkSession, dir: String,
      requireSuccess: Boolean = true): DataFrame = {
    import spark.implicits._
    val conf = new SerializableConfiguration(
      spark.sessionState.newHadoopConf())
    val root = new Path(dir)
    val fs = root.getFileSystem(conf.value)
    ShardFiles.checkSuccess(fs, root, requireSuccess,
      "externally-written tars")
    val paths = ShardFiles.listShards(fs, root, ".tar")
    val ds =
      if (paths.isEmpty) spark.emptyDataset[String]
      else spark.createDataset(paths)
        .repartition(paths.length) // one tar per task
    ds.mapPartitions { it =>
      it.flatMap { p =>
        val path = new Path(p)
        val in = new TarArchiveInputStream(
          path.getFileSystem(conf.value).open(path))
        // the stream must die with the TASK, not only with natural
        // exhaustion — a truncated-entry require, a LIMIT, or a task
        // kill abandons the iterator mid-archive and would otherwise
        // leak the file handle until the executor runs out
        Option(org.apache.spark.TaskContext.get()).foreach(
          _.addTaskCompletionListener[Unit](_ =>
            try in.close() catch { case _: Throwable => () }))
        new Iterator[(String, String, String, Array[Byte])] {
          private var entry: TarArchiveEntry = advance()
          private def advance(): TarArchiveEntry = {
            var e = in.getNextEntry
            while (e != null && !e.isFile) e = in.getNextEntry
            if (e == null) in.close()
            e
          }
          def hasNext: Boolean = entry != null
          def next(): (String, String, String, Array[Byte]) = {
            val name = entry.getName
            val sz = entry.getSize
            require(sz <= Int.MaxValue, s"tar entry over 2 GiB: $name")
            val buf = new Array[Byte](sz.toInt)
            var off = 0
            while (off < buf.length) {
              val n = in.read(buf, off, buf.length - off)
              require(n >= 0, s"truncated tar entry: $name")
              off += n
            }
            // the WebDataset base_plus_ext rule: split at the FIRST dot
            // AFTER the last '/', keeping the directory prefix IN the
            // key — a dot inside the directory part must not truncate
            // the key, and class-per-directory tars ('train/0001.jpg'
            // vs 'val/0001.jpg') must not collide on '0001'. A leading
            // './' alone is stripped (the tar-writer artifact, not a
            // distinguishing directory).
            val norm = if (name.startsWith("./")) name.substring(2) else name
            val dot = norm.indexOf('.', norm.lastIndexOf('/') + 1)
            val (key, ext) =
              if (dot < 0) (norm, "") else (norm.substring(0, dot),
                norm.substring(dot + 1))
            entry = advance()
            (path.getName, key, ext, buf)
          }
        }
      }
    }.toDF("shard_file", "key", "ext", "content")
  }
}
