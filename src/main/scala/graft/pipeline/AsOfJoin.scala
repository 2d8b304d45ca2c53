package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for every left row, the latest right row with the same key
  * and timestamp at-or-before the left timestamp — the feature-store /
  * market-data join (Spark has no built-in; pandas calls it merge_asof).
  *
  * Implementation is the scale-right shape: tag both sides, ONE union, ONE
  * shuffle on the key, and a running `last(payload, ignoreNulls)` window
  * ordered by (ts, right-before-left, tiebreak) — never a range join (the
  * naive `l.ts >= r.ts` join explodes to all-pairs-per-key before picking
  * the max; this is linear in rows after one sort). State per key is one
  * row — the same trick Structured Streaming uses for stream compaction.
  *
  * Ties: a right row AT the left timestamp wins (<= semantics); equal
  * right timestamps resolve by ascending `tieBreak`, so the LAST one under
  * that order is taken — deterministic on any engine.
  */
object AsOfJoin {

  def asOf(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, payload: Seq[String],
      tieBreak: String): DataFrame = {
    val l = left
      .withColumn("_asof_ts", col(leftTs))
      .withColumn("_asof_isr", lit(0))
    val r = right
      .select((keys.map(col) :+ col(rightTs).as("_asof_ts")) ++
        (payload :+ tieBreak).distinct.map(c => col(c).as(s"_asof_$c")): _*)
      .withColumn("_asof_isr", lit(1))
    val unioned = l.unionByName(r, allowMissingColumns = true)
    // right rows sort BEFORE the left rows they should serve (same ts →
    // right first via _asof_isr desc), equal right ts resolve by tieBreak
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_asof_ts").asc, col("_asof_isr").desc,
        col(s"_asof_$tieBreak").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = payload.foldLeft(unioned) { (df, c) =>
      df.withColumn(s"_carry_$c", last(col(s"_asof_$c"), ignoreNulls = true).over(w))
    }
    val out = carried.filter(col("_asof_isr") === 0)
    val renamed = payload.foldLeft(out) { (df, c) =>
      df.withColumn(s"asof_$c", col(s"_carry_$c"))
    }
    renamed.drop(
      (Seq("_asof_ts", "_asof_isr") ++
        (payload :+ tieBreak).distinct.map(c => s"_asof_$c") ++
        payload.map(c => s"_carry_$c")): _*)
  }
}
