package graft.pipeline

import org.apache.hadoop.fs.{FileSystem, Path}

/** The ONE copy of the binary-sink publish contract shared by
  * [[Webdataset]] and [[TokenShards]] (factored after round 14's ADVICE
  * fixes had to be hand-applied to both sinks — exactly the drift class
  * the repo's one-copy discipline exists to prevent):
  *
  *   - each task ATTEMPT streams into `_tmp/<name>.attempt-<A>` (where
  *     `<name>` carries its extension, e.g. `shard-000003.idx`)
  *     and publishes by atomic rename on the shard boundary; the first
  *     attempt to rename wins whole-file, a loser deletes its temp —
  *     but ONLY after proving a winner exists (a false rename for any
  *     other reason — quota, lease, object-store semantics — must fail
  *     the task, not silently drop the shard);
  *   - per-shard publish is atomic, JOB-level completeness is not:
  *     shards published by earlier tasks keep their final names if a
  *     later task fails — the driver-side `_SUCCESS` marker (stamped
  *     only after the write job returns) is what distinguishes a
  *     complete directory from a died job's residue, and readers demand
  *     it by default;
  *   - `_`/`.`-prefixed names are invisible to readers (the Spark
  *     FileIndex hidden-file convention), which keeps in-flight temps
  *     unreadable even before the `_tmp` sweep.
  */
private[pipeline] object ShardFiles {

  val SuccessMarker = "_SUCCESS"

  /** Wipe-and-recreate the output root — the ShardWriter overwrite
    * posture, GUARDED: a non-empty root is only wiped when EVERY entry
    * looks like prior shard output (`_SUCCESS`, `_tmp`, `shard-*`). A
    * mistyped outDir pointing the sink at an unrelated populated
    * directory fails loudly instead of destroying it — and "contains a
    * `_SUCCESS`" alone is NOT enough, since virtually every
    * Spark/Hadoop job output carries one (a bare-marker rule would
    * still wipe the most likely class of foreign directory, e.g. a
    * parquet dataset). */
  def prepare(fs: FileSystem, root: Path): Unit = {
    if (fs.exists(root)) {
      val entries = fs.listStatus(root)
      require(entries.forall { s =>
          val n = s.getPath.getName
          n == SuccessMarker || n == "_tmp" || n.startsWith("shard-")
        },
        s"$root is non-empty and does not look like a prior shard " +
          "output (entries beyond _SUCCESS/_tmp/shard-*) — refusing " +
          "the overwrite wipe; point the sink at a fresh directory or " +
          "a prior shard output")
      fs.delete(root, true)
    }
    fs.mkdirs(root)
  }

  def attemptTmp(outDir: String, name: String, attempt: Long): Path =
    new Path(outDir, s"_tmp/$name.attempt-$attempt")

  /** The id contract both sinks enforce IN the write task (a driver
    * pre-pass would cost the valid-input common case a full extra
    * corpus scan): non-negative (zero-padded keys / the idx invariant)
    * and strictly ascending within a shard — duplicate ids tie the
    * (shard, id) sort key, and Spark's sort is not stable over
    * shuffle-fetch order, so the output bytes would differ run to run.
    * Equal ids land adjacent after the sort, so the check is free.
    * `prevId` is the previous id in THIS shard (-1 at a shard open). */
  def checkAscendingId(id: Long, prevId: Long, what: String): Unit = {
    require(id >= 0L, s"$what requires non-negative sample ids: $id")
    require(id > prevId,
      s"duplicate sample id $id — $what bytes would be " +
        "partition-order-dependent; deduplicate first")
  }

  /** Publish one finished temp file to its final name: atomic rename,
    * first attempt wins; a losing rename is benign ONLY when a winner
    * already exists. */
  def publish(fs: FileSystem, tmp: Path, dest: Path): Unit =
    if (!fs.rename(tmp, dest)) {
      require(fs.exists(dest),
        s"shard publish failed and no winner exists: $tmp -> $dest")
      fs.delete(tmp, false)
    }

  /** Driver-side epilogue after the write job returns: sweep the temp
    * dir, stamp completeness. */
  def finish(fs: FileSystem, root: Path): Unit = {
    fs.delete(new Path(root, "_tmp"), true)
    fs.create(new Path(root, SuccessMarker), true).close()
  }

  /** Reader-side completeness gate. */
  def checkSuccess(fs: FileSystem, root: Path, required: Boolean,
      what: String): Unit =
    require(!required || fs.exists(new Path(root, SuccessMarker)),
      s"$root has no $SuccessMarker marker — the writer job did not " +
        s"complete (pass requireSuccess=false for $what)")

  /** List the readable shard files with `suffix`, hidden names
    * excluded, sorted for deterministic partition order. */
  def listShards(fs: FileSystem, root: Path, suffix: String): Seq[String] =
    fs.listStatus(root).map(_.getPath)
      .filter(p => p.getName.endsWith(suffix) &&
        !p.getName.startsWith(".") && !p.getName.startsWith("_"))
      .map(_.toString).sorted.toSeq
}
