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
  * The carried payload is ONE struct per right row, not per-column carries:
  * independent per-column `last(_, ignoreNulls)` would let an older row's
  * value shine through a newer row's null field and stitch together a
  * combined row that never existed. The struct is non-null exactly for
  * right rows, so null payload FIELDS ride along faithfully.
  *
  * Right rows with a null timestamp are dropped: an unknown-time row must
  * match nothing (under a naive sort, NULLS FIRST would make it
  * earlier-than-everything and serve as the match for every left row).
  *
  * Ties: a right row AT the left timestamp wins (<= semantics); equal
  * right timestamps resolve by ascending `tieBreak`, so the LAST one under
  * that order is taken — deterministic on any engine.
  */
object AsOfJoin {

  /** `maxLookback`: optional staleness bound as a SQL interval literal
    * (e.g. "1 HOUR") — a carried match OLDER than leftTs − maxLookback is
    * nulled out (feature-store freshness semantics: a price from last
    * week must not serve today's trade). The bound is applied to the
    * matched row's own timestamp, carried INSIDE the payload struct, so
    * match and bound can never disagree about which row was taken. The
    * timestamp columns must be timestamp-typed when a bound is given
    * (interval arithmetic); the unbounded form works on any ordered type.
    * Still one union + one shuffle: the bound is a map-side post-filter,
    * never a range join. */
  def asOf(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, payload: Seq[String],
      tieBreak: String, maxLookback: Option[String] = None): DataFrame = {
    val l = left
      .withColumn("_asof_ts", col(leftTs))
      .withColumn("_asof_isr", lit(0))
    val r = right
      .filter(col(rightTs).isNotNull)
      .select(keys.map(col) :+ col(rightTs).as("_asof_ts") :+
        struct((payload.map(col) :+
          col(rightTs).as("_asof_rts")): _*).as("_asof_payload") :+
        col(tieBreak).as("_asof_tie"): _*)
      .withColumn("_asof_isr", lit(1))
    val unioned = l.unionByName(r, allowMissingColumns = true)
    // right rows sort BEFORE the left rows they should serve (same ts →
    // right first via _asof_isr desc), equal right ts resolve by tieBreak
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_asof_ts").asc, col("_asof_isr").desc,
        col("_asof_tie").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned.withColumn("_carry",
      last(col("_asof_payload"), ignoreNulls = true).over(w))
    val out = carried.filter(col("_asof_isr") === 0)
    val fresh = maxLookback match {
      case Some(iv) => col("_carry").getField("_asof_rts") >=
        col(leftTs) - expr(s"INTERVAL $iv")
      case None => lit(true)
    }
    val renamed = payload.foldLeft(out) { (df, c) =>
      df.withColumn(s"asof_$c", when(fresh, col("_carry").getField(c)))
    }
    renamed.drop("_asof_ts", "_asof_isr", "_asof_payload", "_asof_tie",
      "_carry")
  }
}
