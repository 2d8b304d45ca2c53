package graft.util

import org.apache.spark.sql.SparkSession

/** The one local-session builder every entrypoint (Bench, Verify, dev
  * tools) shares — session-level fixes (tmpfs local dir for the
  * burst-throttled virtio disk, nanos-as-long for the events parquet,
  * matching shuffle partitions) live HERE once, not copy-pasted per main. */
object Sessions {
  def local(cores: Int, utc: Boolean = false): SparkSession = {
    val b = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.local.dir", LocalTmp.sparkLocalDir("graft-spark"))
      // events.parquet has shipped as TIMESTAMP(NANOS) in some driver
      // rounds: read those as nanos-since-epoch long (no-op for the
      // timestamp[us] flavor; Tables.tsUtcExpr adapts to whichever loads)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
    val spark = (if (utc) b.config("spark.sql.session.timeZone", "UTC") else b)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
