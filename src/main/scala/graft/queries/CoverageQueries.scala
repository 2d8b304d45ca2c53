package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.coverage.Lcov
import graft.util.Tables

/** Coverage-pipeline driver-gate queries (SURVEY §2.6 F1–F3).
  *
  * c01 round-trips a GENERATED lcov tracefile through the distributed
  * parser ([[Lcov.parseTracefiles]]); the DuckDB oracle recomputes the same
  * stats straight from the `documents` parquet — the parse must be lossless
  * for the hashes to agree. c02 gates the window+range-join interval
  * matcher ([[Lcov.functionCoverage]]) against a pure-SQL restatement of
  * the reference's consume-the-lines loop semantics.
  */
object CoverageQueries {

  /** Deterministic per-source tracefile built from `documents`: one record
    * per source, one `DA:` per doc (line = doc_id, hit = n_chars % mod),
    * LF = docs, LH = docs with hit>0. `onlyMod7 = true` drops doc_id % 7
    * == 0 lines — the "second run instruments fewer lines" flavor c04's
    * delta needs. */
  private def tracefiles(spark: SparkSession, d: String, mod: Int = 3,
      onlyMod7: Boolean = false): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, d)
      .filter(if (onlyMod7) $"doc_id" % 7 =!= 0 else lit(true))
      .select($"source", $"doc_id", ($"n_chars" % mod).cast("long").as("hit"))
      .groupBy($"source")
      .agg(
        count(lit(1)).as("lf"),
        sum(when($"hit" > 0, 1L).otherwise(0L)).as("lh"),
        array_join(sort_array(collect_list(
          concat(lit("DA:"), $"doc_id", lit(","), $"hit"))), "\n").as("da_block"))
      .select($"source",
        concat(lit("TN:"), $"source", lit("\n"),
          lit("SF:src/"), $"source", lit(".py\n"),
          $"da_block", lit("\n"),
          lit("LF:"), $"lf", lit("\n"),
          lit("LH:"), $"lh", lit("\nend_of_record\n")).as("content"))
  }

  /** c01 — F1/F2: distributed lcov parse + file hit percentage. */
  def c01LcovFileCoverage(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    Lcov.parseTracefiles(tracefiles(spark, d), stripPrefix = "src/")
      .select($"name", $"lines_found", $"lines_hit",
        round($"pct", 4).as("pct"))
      .orderBy($"name")
  }

  /** c02 — F3: per-function interval coverage with the reference's
    * line-consumption semantics (watermark window + range join) over
    * synthetic intervals from `supplier` and DA lines from `part`. */
  def c02FunctionCoverage(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val fns = Tables.supplier(spark, d).select(
      concat(lit("f"), $"s_nationkey").as("file"),
      $"s_suppkey".cast("long").as("fid"),
      (($"s_suppkey" * 7) % 400).cast("long").as("src_start"),
      (($"s_suppkey" * 7) % 400 + $"s_suppkey" % 37).cast("long").as("src_end"))
    val da = Tables.part(spark, d).select(
      concat(lit("f"), $"p_partkey" % 25).as("file"),
      (($"p_size" * 17 + $"p_partkey") % 450).cast("long").as("line"))
    Lcov.functionCoverage(fns, da)
      .select($"file", $"fid", round($"coverage", 4).as("coverage"))
      .orderBy($"file", $"fid")
  }

  /** c03 — F1 through the native DataSource V2 connector
    * ([[graft.sources.lcov.LcovDataSource]]): the same generated
    * tracefiles land on disk as real .info files, are read back with
    * `spark.read.format("lcov")` (one partition per file, record rows
    * built in the reader), and aggregate to the c01 shape — the oracle is
    * c01's, so the hash gate proves the CONNECTOR is lossless end to end.
    *
    * The driver-side write is bounded by the number of distinct sources
    * (20 at every SF — a fixture materialization, not a data path; the
    * connector itself never reads content on the driver). */
  def c03LcovConnector(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val dir = new java.io.File(System.getProperty("java.io.tmpdir"),
      "graft_lcov_" + Integer.toHexString(d.hashCode))
    // recreate from empty each run: stale tracefiles from an earlier run
    // with a different source set (or a hashCode collision between data
    // dirs) would be scanned by the connector and corrupt the gated result
    if (dir.isDirectory)
      dir.listFiles().foreach(f => if (f.isFile) f.delete())
    dir.mkdirs()
    tracefiles(spark, d).collect().foreach { row =>
      java.nio.file.Files.write(
        dir.toPath.resolve(row.getString(0) + ".info"),
        row.getString(1).getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }
    spark.read.format("lcov").load(dir.getAbsolutePath)
      .select(regexp_replace($"file", "^src/", "").as("name"),
        $"lines_found", $"lines_hit",
        round(when($"lines_found" > 0,
          $"lines_hit".cast("double") / $"lines_found".cast("double")), 4)
          .as("pct"))
      .orderBy($"name")
  }

  /** c04 — coverage DELTA between two runs ([[Lcov.coverageDelta]]): run A
    * hits n_chars % 3, run B hits n_chars % 5 over a SMALLER instrumented
    * set (doc_id % 7 == 0 lines dropped), both round-tripped through real
    * tracefile text and the distributed parser. The oracle replays the
    * full-outer line join and the gained/lost/still/added/removed
    * classification straight from `documents` — any parse or join defect
    * shifts a count and breaks the hash. This is the CI
    * coverage-regression op (which files lost coverage since last run?). */
  def c04CoverageDelta(spark: SparkSession, d: String): DataFrame = {
    val a = Lcov.parseTracefiles(tracefiles(spark, d), stripPrefix = "src/")
    val b = Lcov.parseTracefiles(tracefiles(spark, d, mod = 5,
      onlyMod7 = true), stripPrefix = "src/")
    Lcov.coverageDelta(a, b)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "c01_lcov_file_coverage" -> (c01LcovFileCoverage _),
    "c02_function_coverage" -> (c02FunctionCoverage _),
    "c03_lcov_connector" -> (c03LcovConnector _),
    "c04_coverage_delta" -> (c04CoverageDelta _))

  val oracle: Map[String, String] = Map(
    "c01_lcov_file_coverage" ->
      """SELECT source || '.py' AS name,
        |  COUNT(*) AS lines_found,
        |  CAST(SUM(CASE WHEN n_chars % 3 > 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS lines_hit,
        |  ROUND(CAST(SUM(CASE WHEN n_chars % 3 > 0 THEN 1 ELSE 0 END) AS DOUBLE)
        |        / COUNT(*), 4) AS pct
        |FROM documents GROUP BY source ORDER BY name""".stripMargin,
    "c03_lcov_connector" ->
      // identical to c01's oracle: the connector must reproduce the
      // pre-loaded parse exactly
      """SELECT source || '.py' AS name,
        |  COUNT(*) AS lines_found,
        |  CAST(SUM(CASE WHEN n_chars % 3 > 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS lines_hit,
        |  ROUND(CAST(SUM(CASE WHEN n_chars % 3 > 0 THEN 1 ELSE 0 END) AS DOUBLE)
        |        / COUNT(*), 4) AS pct
        |FROM documents GROUP BY source ORDER BY name""".stripMargin,
    "c04_coverage_delta" ->
      """WITH a AS (
        |  SELECT source || '.py' AS name, doc_id AS line,
        |    CAST(n_chars % 3 AS BIGINT) AS hit_a FROM documents),
        |b AS (
        |  SELECT source || '.py' AS name, doc_id AS line,
        |    CAST(n_chars % 5 AS BIGINT) AS hit_b FROM documents
        |  WHERE doc_id % 7 <> 0),
        |j AS (
        |  SELECT COALESCE(a.name, b.name) AS name, hit_a, hit_b
        |  FROM a FULL OUTER JOIN b ON a.name = b.name AND a.line = b.line)
        |SELECT name,
        |  CAST(SUM(CASE WHEN hit_a = 0 AND hit_b > 0
        |           THEN 1 ELSE 0 END) AS BIGINT) AS n_gained,
        |  CAST(SUM(CASE WHEN hit_a > 0 AND hit_b = 0
        |           THEN 1 ELSE 0 END) AS BIGINT) AS n_lost,
        |  CAST(SUM(CASE WHEN hit_a > 0 AND hit_b > 0
        |           THEN 1 ELSE 0 END) AS BIGINT) AS n_still_hit,
        |  CAST(SUM(CASE WHEN hit_a IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_added,
        |  CAST(SUM(CASE WHEN hit_b IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_removed
        |FROM j GROUP BY name ORDER BY name""".stripMargin,
    "c02_function_coverage" ->
      """WITH fns AS (
        |  SELECT 'f' || CAST(s_nationkey AS VARCHAR) AS file,
        |         CAST(s_suppkey AS BIGINT) AS fid,
        |         CAST((s_suppkey * 7) % 400 AS BIGINT) AS src_start,
        |         CAST((s_suppkey * 7) % 400 + s_suppkey % 37 AS BIGINT) AS src_end
        |  FROM supplier),
        |eff AS (
        |  SELECT *, GREATEST(src_start, COALESCE(MAX(src_end) OVER (
        |      PARTITION BY file ORDER BY src_start, fid
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) + 1,
        |    src_start)) AS eff_start
        |  FROM fns),
        |da AS (
        |  SELECT 'f' || CAST(p_partkey % 25 AS VARCHAR) AS file,
        |         CAST((p_size * 17 + p_partkey) % 450 AS BIGINT) AS line
        |  FROM part),
        |cnt AS (
        |  SELECT e.file, e.fid, e.src_start, e.src_end,
        |         COUNT(d.line) AS in_range
        |  FROM eff e LEFT JOIN da d
        |    ON d.file = e.file AND d.line BETWEEN e.eff_start AND e.src_end
        |  GROUP BY 1, 2, 3, 4)
        |SELECT file, fid,
        |  ROUND(CAST(in_range AS DOUBLE)
        |        / GREATEST(1, src_end - src_start), 4) AS coverage
        |FROM cnt ORDER BY file, fid""".stripMargin)
}
