package graft.coverage

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.graph.{CodeGraph, GraphOp}
import graft.ingest.Ingestor

/** Code-coverage pipeline (SURVEY §2.6 F1–F3) — lcov tracefile → file
  * percentages → per-function interval coverage → graph writeback, after
  * `/root/reference/api/code_coverage/lcov/lcov.py:5-213`.
  *
  * The record parser ([[parseRecord]]) is a pure function, so tracefiles
  * parse distributed: a DataFrame of (source, content) chunks explodes into
  * records on executors ([[parseTracefiles]]). The per-function interval
  * matching re-expresses the reference's sequential consume-the-lines loop
  * (`lcov.py:181-208`) as a window + range join ([[functionCoverage]]) —
  * same semantics, no driver loop, scales to any number of files.
  */
object Lcov {

  /** One `SF:` record of a tracefile: per-line execution counts and
    * function markers (`lcov.py:49-122`; BRDA branches parsed and kept). */
  final case class LcovRecord(
      test: String,
      file: String,
      linesFound: Long,
      linesHit: Long,
      daLines: Seq[(Long, Long)], // (line, hit)
      functions: Seq[(Long, String, Long)], // (line, name, hit)
      branches: Seq[(Long, Long, Long, Long)]) // (line, block, branch, taken)

  /** F1: parse one tracefile's content — split on `end_of_record`, one
    * record per `TN:`/`SF:` chunk (`lcov.py:5-47`). */
  def parse(content: String): Seq[LcovRecord] = {
    require(content.contains("end_of_record"),
      "lcov file is missing \"end_of_record\" line(s)")
    content.split("end_of_record").toSeq
      .filter(_.exists(!_.isWhitespace)).flatMap(parseRecord)
  }

  /** Parse one record chunk (`lcov.py:19-122`). Returns None when the chunk
    * has no `TN:` marker. */
  def parseRecord(chunk: String): Option[LcovRecord] = {
    val lines = chunk.split('\n').dropWhile(!_.startsWith("TN:"))
    if (lines.isEmpty) return None
    var test = ""
    var file = ""
    var lf = 0L
    var lh = 0L
    val da = Seq.newBuilder[(Long, Long)]
    val fns = scala.collection.mutable.ArrayBuffer.empty[(Long, String, Long)]
    val brs = Seq.newBuilder[(Long, Long, Long, Long)]
    lines.filter(_.trim.nonEmpty).foreach { raw =>
      val l = raw.trim
      val sep = l.indexOf(':')
      if (sep > 0) {
        val (method, content) = (l.substring(0, sep), l.substring(sep + 1).trim)
        method match {
          case "TN" => test = content
          case "SF" => file = content
          case "LF" => lf = content.toLong
          case "LH" => lh = content.toLong
          case "DA" if !content.contains("null") =>
            val p = content.split(',')
            da += ((p(0).toLong, p(1).toLong))
          case "FN" =>
            val Array(line, name) = content.split(",", 2)
            fns += ((line.toLong, name, 0L))
          case "FNDA" =>
            val Array(hit, name) = content.split(",", 2)
            if (hit.nonEmpty && hit != "-") {
              val i = fns.indexWhere(_._2 == name)
              if (i >= 0) fns(i) = fns(i).copy(_3 = hit.toLong)
            }
          case "BRDA" =>
            val p = content.split(",", 4)
            brs += ((p(0).toLong, p(1).toLong, p(2).toLong,
              if (p(3) == "-") 0L else p(3).toLong))
          case _ => () // FNF/FNH/BRF/BRH stats lines and unknown markers
        }
      }
    }
    Some(LcovRecord(test, file, lf, lh, da.result(), fns.toSeq, brs.result()))
  }

  /** Distributed parse: (source, content) → one row per record, with the
    * file path split into the graph's (path, name, ext) key and the file
    * percentage `LH / LF` (`lcov.py:143-156`). `stripPrefix` mirrors the
    * reference's CI-workdir prefix removal (`lcov.py:135`). */
  def parseTracefiles(tracefiles: DataFrame, stripPrefix: String = "",
      sourceCol: String = "source", contentCol: String = "content"): DataFrame = {
    val spark = tracefiles.sparkSession
    import spark.implicits._
    tracefiles.select(col(sourceCol).as("lcov_source"), col(contentCol))
      .as[(String, String)]
      .flatMap { case (src, content) =>
        parse(content).map { r =>
          val rel = if (r.file.startsWith(stripPrefix))
            r.file.substring(stripPrefix.length) else r.file
          val (path, name, ext) = Ingestor.splitPath(rel)
          (src, r.test, path, name, ext, r.linesFound, r.linesHit,
            r.daLines.map(d => (d._1, d._2)))
        }
      }
      .toDF("lcov_source", "test", "path", "name", "ext", "lines_found",
        "lines_hit", "da")
      .withColumn("pct", // null (not NaN) for LF:0 records — see applyLcov
        when(col("lines_found") > 0,
          col("lines_hit").cast("double") / col("lines_found").cast("double")))
  }

  /** Coverage DELTA between two parsed tracefile frames (the CI
    * regression-detection op every coverage pipeline runs: "which lines
    * lost coverage since the last run?"). Inputs are two
    * [[parseTracefiles]] outputs; per-line DA arrays explode and
    * full-outer-join on (file name, line), then classify per file:
    * gained (was 0/absent, now hit), lost (was hit, now 0/absent — but
    * still instrumented), still_hit, added/removed (line newly
    * instrumented / no longer instrumented).
    *
    * Scale: one explode per side + ONE full-outer equi-join on
    * (name, line) + a grouped rollup — all partition-friendly; nothing
    * driver-side. Returns one row per file, totally ordered. */
  def coverageDelta(a: DataFrame, b: DataFrame): DataFrame = {
    def lines(df: DataFrame, tag: String): DataFrame =
      df.select(col("name"), explode(col("da")).as("d"))
        .select(col("name"), col("d._1").as("line"), col("d._2").as(tag))
    lines(a, "hit_a").join(lines(b, "hit_b"), Seq("name", "line"),
        "full_outer")
      .groupBy(col("name"))
      .agg(
        // disjoint categories: gained/lost require the line instrumented
        // in BOTH runs (null comparisons are false); added/removed cover
        // the one-sided lines
        sum(when(col("hit_a") === 0 && col("hit_b") > 0, 1L).otherwise(0L))
          .as("n_gained"),
        sum(when(col("hit_a") > 0 && col("hit_b") === 0, 1L).otherwise(0L))
          .as("n_lost"),
        sum(when(col("hit_a") > 0 && col("hit_b") > 0, 1L).otherwise(0L))
          .as("n_still_hit"),
        sum(when(col("hit_a").isNull, 1L).otherwise(0L)).as("n_added"),
        sum(when(col("hit_b").isNull, 1L).otherwise(0L)).as("n_removed"))
      .orderBy(col("name"))
  }

  /** F3: per-function interval coverage — the reference's sorted
    * consume-the-lines loop (`lcov.py:174-208`) as a distributed plan.
    *
    * Consumption semantics: functions are processed in (src_start, id)
    * order and each consumes every DA line `<= src_end`, so a later
    * function only sees lines AFTER every earlier function's end. That is
    * exactly `effStart = greatest(src_start, 1 + max(src_end) over
    * preceding rows)` — a window over the per-file function list — followed
    * by a range join counting DA lines in [effStart, src_end]. Coverage =
    * count / max(1, src_end - src_start) (`lcov.py:205`; note: instrumented
    * lines in range, hit or not — faithful to the reference).
    *
    * `functions`: (file, fid, src_start, src_end); `daLines`: (file, line).
    * Returns (file, fid, src_start, src_end, coverage). Scale: one window
    * shuffle on file + one equi-join on file; both partition-friendly. */
  def functionCoverage(functions: DataFrame, daLines: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("file"))
      .orderBy(col("src_start"), col("fid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val fns = functions.withColumn("eff_start",
      greatest(col("src_start"), coalesce(max(col("src_end")).over(w) + 1,
        col("src_start"))))
    val counted = fns.join(daLines,
        fns("file") === daLines("file") &&
          daLines("line") >= fns("eff_start") &&
          daLines("line") <= fns("src_end"), "left")
      .groupBy(fns("file"), col("fid"), col("src_start"), col("src_end"))
      .agg(count(daLines("line")).as("in_range"))
    counted.withColumn("coverage",
        col("in_range").cast("double") /
          greatest(lit(1L), col("src_end") - col("src_start")).cast("double"))
      .select(col("file"), col("fid"), col("src_start"), col("src_end"),
        col("coverage"))
  }

  /** F1+F2+F3 writeback (`process_lcov`, `lcov.py:127-213`) — BATCHED:
    * one M6 cascade rewrite for every file percentage in the tracefile,
    * then ONE [[functionCoverage]] pass over all partially-covered files
    * (it is already file-partitioned) and one M5 metadata batch. A CI drop
    * with thousands of SF records is 2 mutations, not thousands of
    * sequential per-record Spark jobs. Duplicate file keys keep the last
    * record (the reference's sequential SETs — last wins). */
  def applyLcov(g: CodeGraph, content: String, stripPrefix: String = ""): Unit = {
    val spark = g.spark
    import spark.implicits._
    // LF:0 records (e.g. header-only sources with FN markers but no DA)
    // would divide 0/0 → NaN; the reference crashes here
    // (ZeroDivisionError, `lcov.py:145`) — we skip the record instead of
    // persisting NaN coverage.
    val recs = parse(content).filter(_.linesFound > 0).map { r =>
      val rel = if (r.file.startsWith(stripPrefix))
        r.file.substring(stripPrefix.length) else r.file
      val (path, name, ext) = Ingestor.splitPath(rel)
      (rel, path, name, ext,
        r.linesHit.toDouble / r.linesFound.toDouble, r.daLines)
    }
    if (recs.isEmpty) return

    // one M6 batch: every file percentage (+ the ==1.0 function cascade).
    // Raw rows go through — the last-wins duplicate-key contract is OWNED
    // by setFilesCoverage; the local dedup below exists only because the
    // M5 leg needs each surviving record's daLines.
    g.mutate(GraphOp.SetFilesCoverage(recs.map(r =>
      GraphOp.FileCoverageRow(r._2, r._3, r._4, r._5))))
    val last = recs.groupBy(r => (r._2, r._3, r._4)).map(_._2.last).toSeq

    // one interval pass + one M5 batch for the partially-covered files
    val partial = last.filter(_._5 != 1.0)
    if (partial.nonEmpty) {
      val keys = partial.map(r => (r._1, r._2, r._3, r._4))
        .toDF("file", "_kpath", "_kname", "_kext")
      val fileIds = g.graph.nodes
        .filter(array_contains(col("labels"), "File"))
        .join(broadcast(keys), col("path") <=> col("_kpath") &&
          col("name") <=> col("_kname") && col("ext") <=> col("_kext"))
        .select(col("id").as("src"), col("file"))
      val funcs = g.graph.edges.filter(col("type") === "DEFINES")
        .join(fileIds, Seq("src"))
        .join(g.graph.nodes.filter(array_contains(col("labels"), "Function"))
          .select(col("id").as("dst"), col("src_start"), col("src_end")),
          Seq("dst"))
        .select(col("dst").as("fid"), col("file"),
          col("src_start"), col("src_end"))
      val da = partial.flatMap(r => r._6.map(d => (r._1, d._1)))
        .toDF("file", "line")
      val cov = functionCoverage(funcs, da)
        .select(col("fid"), col("coverage")).collect()
      if (cov.nonEmpty)
        g.mutate(GraphOp.SetNodesMetadata(
          cov.map(_.getAs[Long]("fid")).toSeq,
          cov.map(r2 => Map("coverage_precentage" ->
            r2.getAs[Double]("coverage").toString)).toSeq))
    }
  }
}
