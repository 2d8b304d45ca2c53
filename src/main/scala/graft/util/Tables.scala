package graft.util

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated testdata tables (TESTDATA.md).
  *
  * All queries take a `sfDir` (e.g. /root/testdata/sf0.01) and read the
  * Parquet files directly, so Catalyst's parquet scan gets filter pushdown
  * and column pruning for free. At 100 TB these would be the same calls
  * against a partitioned warehouse path.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(spark: SparkSession, d: String): DataFrame = load(spark, d, "region")
  def nation(spark: SparkSession, d: String): DataFrame = load(spark, d, "nation")
  def customer(spark: SparkSession, d: String): DataFrame = load(spark, d, "customer")
  def supplier(spark: SparkSession, d: String): DataFrame = load(spark, d, "supplier")
  def part(spark: SparkSession, d: String): DataFrame = load(spark, d, "part")
  def orders(spark: SparkSession, d: String): DataFrame = load(spark, d, "orders")
  def lineitem(spark: SparkSession, d: String): DataFrame = load(spark, d, "lineitem")
  /** NOTE: the driver has generated `ts` as TIMESTAMP(NANOS) (arrives as
    * nanos-since-epoch LongType under spark.sql.legacy.parquet.nanosAsLong)
    * in some rounds and as timestamp[us] (arrives as TIMESTAMP_NTZ) in
    * others — do NOT assume either. Use [[eventsWithTs]] / [[tsUtcExpr]]
    * when a real timestamp column is needed. */
  def events(spark: SparkSession, d: String): DataFrame = load(spark, d, "events")

  /** Type-adaptive `ts` → TIMESTAMP (µs) expression for a loaded events
    * frame: nanos-long files divide down to µs; timestamp/NTZ files cast
    * (identity on the stored µs value — every graft session runs UTC, so
    * the NTZ→TZ reinterpretation matches DuckDB's naive-as-UTC `epoch()`). */
  def tsUtcExpr(schema: org.apache.spark.sql.types.StructType)
      : org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{col, timestamp_micros}
    schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        timestamp_micros((col("ts") / 1000L).cast("long"))
      case _ => col("ts").cast("timestamp")
    }
  }

  /** events + `ts_utc` TIMESTAMP column (µs precision) for time windowing. */
  def eventsWithTs(spark: SparkSession, d: String): DataFrame = {
    val df = events(spark, d)
    df.withColumn("ts_utc", tsUtcExpr(df.schema))
  }
  def documents(spark: SparkSession, d: String): DataFrame = load(spark, d, "documents")
  def embeddings(spark: SparkSession, d: String): DataFrame = load(spark, d, "embeddings")

  /** Register every table as a temp view (for spark.sql surfaces). */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
