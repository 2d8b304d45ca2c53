package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared session for all suites — one local SparkSession per JVM. */
object TestSpark {
  lazy val spark: SparkSession = {
    // tmpfs local dir — see Bench.scala (virtio disk burst-throttling)
    val localDir = graft.util.LocalTmp.sparkLocalDir("graft-spark-test")
    val s = SparkSession.builder()
      .master("local[8]")
      .appName("graft-test")
      .config("spark.local.dir", localDir)
      .config("spark.sql.shuffle.partitions", "8")
      // events.parquet uses TIMESTAMP(NANOS): read as nanos-since-epoch long
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val sfTiny = "/root/testdata/sf0.001"
  val sfSmall = "/root/testdata/sf0.01"
}

abstract class SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
  def sfTiny: String = TestSpark.sfTiny
  def sfSmall: String = TestSpark.sfSmall
}
