package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality audit — the constraint-validation pass a
  * production pipeline runs before a table feeds training (the Deequ /
  * "unit tests for data" shape, Schelter et al., VLDB 2018): each check
  * compiles to a violation COUNT over the frame, and the audit returns
  * one row per check so the result is alert-able and hash-oracleable.
  *
  * Scale: every row-local check (not-null, range, regex, custom
  * predicate) fuses into ONE aggregation pass over a single scan — no
  * per-check jobs; uniqueness adds one groupBy on the key; referential
  * integrity adds one anti-join per dimension (broadcast when the dim is
  * small). Nothing collects rows to the driver; the result is
  * |checks| rows.
  */
object DataQuality {

  sealed trait Check { def name: String }

  /** Column must be non-null (and non-NaN for numerics if `strict`). */
  final case class NotNull(colName: String) extends Check {
    def name = s"not_null($colName)"
  }

  /** Column must fall in [lo, hi] (violations: outside or null). */
  final case class InRange(colName: String, lo: Double, hi: Double)
      extends Check {
    def name = s"in_range($colName,$lo,$hi)"
  }

  /** Arbitrary row predicate that must hold (violations: rows where the
    * predicate is false or null). The SQL expression string keeps the
    * check serializable and oracle-replayable. */
  final case class Satisfies(label: String, predicateSql: String)
      extends Check {
    def name = s"satisfies($label)"
  }

  /** The column tuple must be unique (violations: rows in excess of one
    * per key — i.e. Σ max(cnt − 1, 0)). */
  final case class Unique(cols: Seq[String]) extends Check {
    def name = s"unique(${cols.mkString(",")})"
  }

  /** Every non-null value of `colName` must exist in `dim`'s `dimCol`
    * (violations: rows whose key has no match — the FK audit). */
  final case class RefIntegrity(colName: String, dim: DataFrame,
      dimCol: String, dimLabel: String) extends Check {
    def name = s"ref_integrity($colName->$dimLabel.$dimCol)"
  }

  /** Run all checks; returns (check, n_violations, n_rows) with one row
    * per check, ordered by check name. `n_rows` is the audited row count
    * (same for every row — lets the consumer compute violation rates
    * without a second query). */
  def audit(df: DataFrame, checks: Seq[Check]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    require(checks.nonEmpty, "audit needs at least one check")

    // all row-local checks in ONE aggregation pass
    val rowLocal: Seq[(String, Column)] = checks.collect {
      case c @ NotNull(col0) =>
        c.name -> sum(when(col(col0).isNull, 1L).otherwise(0L))
      case c @ InRange(col0, lo, hi) =>
        c.name -> sum(when(col(col0).isNull ||
          col(col0) < lo || col(col0) > hi, 1L).otherwise(0L))
      case c @ Satisfies(_, pred) =>
        c.name -> sum(when(coalesce(expr(pred), lit(false)), 0L)
          .otherwise(1L))
    }
    val aggCols = rowLocal.map { case (n, c) => c.as(n) } :+
      count(lit(1)).as("__n")
    val localRow = df.agg(aggCols.head, aggCols.tail: _*).head()
    val nRows = localRow.getAs[Long]("__n")
    val localResults = rowLocal.map { case (n, _) =>
      (n, localRow.getAs[Long](n)) }

    // uniqueness: one groupBy per key tuple, violations = Σ (cnt − 1)
    val uniqueResults = checks.collect { case c @ Unique(cols0) =>
      val excess = df.groupBy(cols0.map(col): _*)
        .agg(count(lit(1)).as("cnt"))
        .agg(coalesce(sum(col("cnt") - 1L), lit(0L)).as("v"))
        .head().getAs[Long]("v")
      (c.name, excess)
    }

    // referential integrity: anti-join per dimension (broadcast-friendly)
    val refResults = checks.collect {
      case c @ RefIntegrity(col0, dim, dimCol, _) =>
        val missing = df.filter(col(col0).isNotNull)
          .join(dim.select(col(dimCol).as(col0)).distinct(),
            Seq(col0), "left_anti")
          .count()
        (c.name, missing)
    }

    (localResults ++ uniqueResults ++ refResults)
      .toDF("check", "n_violations")
      .withColumn("n_rows", lit(nRows))
      .orderBy(col("check"))
  }
}
