package graft.pipeline

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.util.SerializableConfiguration

/** Single-file numpy `.npy` emission — the hand-off format for the
  * Megatron loader artifacts that are NOT the token shards themselves:
  * `shuffle_idx` ([[Packing.epochShuffle]], a 1-D integer permutation)
  * and `sample_idx` ([[Packing.sampleIdx]], an (N, 2) integer table).
  * The public format v1.0 (numpy `lib/format.py`): 6-byte magic
  * `\x93NUMPY`, version bytes 1.0, a little-endian uint16 header
  * length, then the header dict (`descr`/`fortran_order`/`shape`)
  * space-padded so data starts 64-byte-aligned, then the C-order array
  * bytes. A stock `np.load` (mmap_mode included) reads the output
  * unmodified.
  *
  * The artifact is ONE file by contract (that is what the loader
  * mmaps), so the write streams: rows range-partition + sort on
  * `orderCol` (each task streams its run to a `_tmp` sibling part —
  * O(1) memory in rows), and the driver stitches header + parts in
  * partition order and promotes by atomic rename — the
  * [[TokenShards]] metadata-stitch discipline. Same input, same bytes.
  * `orderCol` values must be distinct (both artifacts' order columns
  * are dense 0-based positions by construction); ties would make the
  * byte order partition-dependent.
  */
object Npy {

  val Magic: Array[Byte] =
    Array[Byte](0x93.toByte) ++ "NUMPY".getBytes("US-ASCII")

  private val Descrs = Map[String, Int]("<i4" -> 4, "<i8" -> 8, "<u4" -> 4)

  /** The v1.0 header for `shape` rows of `descr`, data 64-byte-aligned
    * (numpy's own alignment since 1.9; readers use only HEADER_LEN). */
  def header(descr: String, shape: Seq[Long]): Array[Byte] = {
    val shapeStr =
      if (shape.length == 1) s"(${shape.head},)"
      else shape.mkString("(", ", ", ")")
    val dict =
      s"{'descr': '$descr', 'fortran_order': False, 'shape': $shapeStr, }"
    val unpadded = Magic.length + 4 + dict.length + 1
    val pad = (64 - unpadded % 64) % 64
    val hlen = dict.length + pad + 1
    require(hlen <= 65535, "npy v1.0 header over 64 KiB")
    val out = ByteBuffer.allocate(Magic.length + 4 + hlen)
      .order(ByteOrder.LITTLE_ENDIAN)
    out.put(Magic).put(1.toByte).put(0.toByte).putShort(hlen.toShort)
    out.put(dict.getBytes("US-ASCII"))
    (0 until pad).foreach(_ => out.put(' '.toByte))
    out.put('\n'.toByte)
    out.array()
  }

  /** Read a graft-written `.npy` back as `(row, c0 .. c{m-1})` long
    * columns — the consumer-side mirror [[write]]'s gate/spec round
    * trips pin against. The file is read WHOLE on the driver: these
    * artifacts are index-sized by design (a permutation / an (N,2)
    * coordinate table — the loader mmaps them the same way), never
    * corpus-sized. Supports exactly the descrs [[write]] emits. */
  def read(spark: org.apache.spark.sql.SparkSession,
      path: String): DataFrame = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val len = fs.getFileStatus(p).getLen
    // the driver materializes the whole array as Rows (boxed — ~10× the
    // file bytes in heap), so the bound is on what a DRIVER comfortably
    // holds, far below what the raw-bytes Int cap would admit; a bigger
    // artifact is the training loader's mmap territory, not this
    // verification mirror's
    require(len >= 10 && len <= 64L * 1024 * 1024,
      s"npy artifact $path is $len bytes — read() is the driver-side " +
        "verification mirror, bounded at 64 MiB; mmap bigger artifacts " +
        "in the consumer")
    val raw = new Array[Byte](len.toInt)
    val in = fs.open(p)
    try in.readFully(0L, raw) finally in.close()
    require(raw.take(6).sameElements(Magic) &&
        raw(6) == 1.toByte && raw(7) == 0.toByte,
      s"bad npy magic/version in $path")
    val hlen = (raw(8) & 0xff) | ((raw(9) & 0xff) << 8)
    require(10L + hlen <= len,
      s"truncated npy header in $path (HEADER_LEN $hlen, file $len)")
    val header = new String(raw.slice(10, 10 + hlen), "US-ASCII")
    val descr = "'descr': '([^']+)'".r.findFirstMatchIn(header)
      .map(_.group(1)).getOrElse(
        throw new IllegalArgumentException(s"no descr in $path header"))
    val width = Descrs.getOrElse(descr,
      throw new IllegalArgumentException(
        s"unsupported npy descr '$descr' in $path"))
    require(!header.contains("'fortran_order': True"),
      s"fortran-order npy not supported: $path")
    val shape = "'shape': \\(([0-9, ]*)\\)".r.findFirstMatchIn(header)
      .map(_.group(1).split(",").map(_.trim).filter(_.nonEmpty)
        .map(_.toLong))
      .getOrElse(throw new IllegalArgumentException(
        s"no shape in $path header"))
    require(shape.length == 1 || shape.length == 2,
      s"only 1-D/2-D npy supported: $path")
    val n = shape(0)
    val m = if (shape.length == 2) shape(1).toInt else 1
    val bb = ByteBuffer.wrap(raw, 10 + hlen, raw.length - 10 - hlen)
      .order(ByteOrder.LITTLE_ENDIAN)
    require(bb.remaining().toLong == n * m * width,
      s"npy payload length disagrees with shape in $path")
    val rows = (0L until n).map { r =>
      org.apache.spark.sql.Row.fromSeq(r +: (0 until m).map { _ =>
        descr match {
          case "<i8" => bb.getLong
          case "<u4" => bb.getInt.toLong & 0xFFFFFFFFL
          case _ => bb.getInt.toLong
        }
      })
    }
    val schema = org.apache.spark.sql.types.StructType(
      org.apache.spark.sql.types.StructField("row",
        org.apache.spark.sql.types.LongType, nullable = false) +:
        (0 until m).map(j => org.apache.spark.sql.types.StructField(
          s"c$j", org.apache.spark.sql.types.LongType, nullable = false)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toSeq), schema)
  }

  /** Write `valueCols` of `df` in ascending `orderCol` order as `path`
    * (shape `(N,)` for one value column, `(N, m)` for m — C order, so
    * row k's values are adjacent, exactly how Megatron indexes
    * `sample_idx[k]`). `descr` ∈ `<i4` / `<u4` / `<i8`; every value is
    * range-checked against it — silent wraparound would corrupt the
    * permutation it encodes. */
  def write(df: DataFrame, path: String, orderCol: String,
      valueCols: Seq[String], descr: String): Unit = {
    val width = Descrs.getOrElse(descr,
      throw new IllegalArgumentException(
        s"unsupported npy descr '$descr' (expected <i4|<u4|<i8)"))
    require(valueCols.nonEmpty, "need at least one value column")
    val (lo, hi) = descr match {
      case "<i4" => (Int.MinValue.toLong, Int.MaxValue.toLong)
      case "<u4" => (0L, 0xFFFFFFFFL)
      case _ => (Long.MinValue, Long.MaxValue)
    }
    val m = valueCols.length
    val spark = df.sparkSession
    val conf = new SerializableConfiguration(
      spark.sessionState.newHadoopConf())
    val target = new Path(path)
    val fs = target.getFileSystem(conf.value)
    val tmpRoot = new Path(path + ".npy-tmp")
    fs.delete(tmpRoot, true)
    fs.mkdirs(tmpRoot)
    val cols = col(orderCol).cast("long").as("_o") +:
      valueCols.map(c => col(c).cast("long").as(s"_v_$c"))
    val sorted = df.select(cols: _*)
      .repartitionByRange(col("_o")).sortWithinPartitions(col("_o"))
    val tmpStr = tmpRoot.toString
    // one pass: each task streams its sorted run to a part file and
    // reports (partition, attempt, rows, firstOrder, lastOrder) — the
    // driver gets exactly one row per partition (the successful
    // attempt), stitches in partition order, and cross-checks the
    // order runs are disjoint ascending (a duplicate orderCol would
    // otherwise silently shuffle bytes)
    val parts = sorted.rdd.mapPartitionsWithIndex { (pi, it) =>
      val attempt = Option(org.apache.spark.TaskContext.get())
        .map(_.taskAttemptId()).getOrElse(0L)
      val p = new Path(tmpStr, f"part-$pi%05d-$attempt")
      val pfs = p.getFileSystem(conf.value)
      val out = pfs.create(p, true)
      var rows = 0L
      var first = Long.MaxValue
      var last = Long.MinValue
      var prev = Long.MinValue
      val chunk = ByteBuffer.allocate(8192 * width)
        .order(ByteOrder.LITTLE_ENDIAN)
      try {
        it.foreach { r =>
          // a null order or value would otherwise die as a bare NPE in
          // getLong — the operator's fail-LOUDLY contract covers the
          // most common bad input too
          var c0 = 0
          while (c0 <= m) {
            require(!r.isNullAt(c0),
              s"npy input contains a NULL in column $c0 (0 = order, " +
                "1.. = values) — artifacts cannot encode nulls")
            c0 += 1
          }
          val o = r.getLong(0)
          require(o > prev || rows == 0L,
            s"npy orderCol not strictly ascending at $o — " +
              "order values must be distinct")
          prev = o
          if (rows == 0L) first = o
          last = o
          var j = 1
          while (j <= m) {
            val v = r.getLong(j)
            require(v >= lo && v <= hi,
              s"value $v outside npy dtype $descr")
            if (chunk.remaining() < width) {
              out.write(chunk.array(), 0, chunk.position()); chunk.clear()
            }
            if (width == 8) chunk.putLong(v) else chunk.putInt(v.toInt)
            j += 1
          }
          rows += 1L
        }
        if (chunk.position() > 0)
          out.write(chunk.array(), 0, chunk.position())
      } finally out.close()
      Iterator.single((pi, attempt, rows, first, last))
    }.collect().sortBy(_._1)
    val n = parts.map(_._3).sum
    // range runs must be disjoint ascending across partitions (the
    // range partitioner guarantees it; a violation means orderCol ties)
    parts.filter(_._3 > 0).map(p => (p._4, p._5))
      .toSeq.sliding(2).foreach {
        case Seq((_, aLast), (bFirst, _)) =>
          require(bFirst > aLast,
            "npy orderCol ranges overlap across partitions — " +
              "order values must be distinct")
        case _ => ()
      }
    val shape = if (m == 1) Seq(n) else Seq(n, m.toLong)
    val finalTmp = new Path(tmpStr, "stitched")
    val out = fs.create(finalTmp, true)
    try {
      out.write(header(descr, shape))
      parts.filter(_._3 > 0).foreach { case (pi, attempt, _, _, _) =>
        val src = new Path(tmpStr, f"part-$pi%05d-$attempt")
        val in = fs.open(src)
        try {
          val buf = new Array[Byte](65536)
          var k = in.read(buf)
          while (k >= 0) {
            if (k > 0) out.write(buf, 0, k)
            k = in.read(buf)
          }
        } finally in.close()
      }
    } finally out.close()
    fs.delete(target, false)
    require(fs.rename(finalTmp, target),
      s"could not promote stitched npy into $target")
    fs.delete(tmpRoot, true)
    ()
  }
}
