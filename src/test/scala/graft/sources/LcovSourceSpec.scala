package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.Files

import org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.coverage.Lcov

/** DataSource V2 lcov connector: losslessness vs the pure parser, one
  * partition per file, column pruning and test/file filter pushdown
  * reaching the scan. */
class LcovSourceSpec extends SparkSpec {

  private val trace1 =
    """TN:unit
      |SF:src/a.py
      |FN:3,f
      |FNDA:2,f
      |DA:3,2
      |DA:4,0
      |BRDA:4,0,1,2
      |LF:2
      |LH:1
      |end_of_record
      |TN:integration
      |SF:src/b.py
      |DA:1,5
      |LF:1
      |LH:1
      |end_of_record
      |""".stripMargin
  private val trace2 =
    """TN:unit
      |SF:src/c.py
      |DA:7,0
      |LF:1
      |LH:0
      |end_of_record
      |""".stripMargin

  private lazy val dir = {
    val d = Files.createTempDirectory("lcov_src_spec")
    Files.write(d.resolve("one.info"), trace1.getBytes(StandardCharsets.UTF_8))
    Files.write(d.resolve("two.info"), trace2.getBytes(StandardCharsets.UTF_8))
    d.toAbsolutePath.toString
  }

  private def read() = spark.read.format("lcov").load(dir)

  test("reads every record with the pure parser's values") {
    val rows = read().orderBy("file").collect()
    assert(rows.map(_.getAs[String]("file")).toSeq ===
      Seq("src/a.py", "src/b.py", "src/c.py"))
    val a = rows(0)
    assert(a.getAs[String]("test") === "unit")
    assert(a.getAs[Long]("lines_found") === 2L)
    assert(a.getAs[Long]("lines_hit") === 1L)
    val da = a.getAs[collection.Seq[org.apache.spark.sql.Row]]("da")
    assert(da.map(r => (r.getLong(0), r.getLong(1))).toSeq ===
      Seq((3L, 2L), (4L, 0L)))
    val fns = a.getAs[collection.Seq[org.apache.spark.sql.Row]]("functions")
    assert(fns.map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq ===
      Seq((3L, "f", 2L)))
    val brs = a.getAs[collection.Seq[org.apache.spark.sql.Row]]("branches")
    assert(brs.map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
      === Seq((4L, 0L, 1L, 2L)))
    // losslessness vs the pure parser over the same content
    assert(Lcov.parse(trace1).size + Lcov.parse(trace2).size === rows.length)
  }

  test("plans one partition per tracefile") {
    assert(read().rdd.getNumPartitions === 2)
  }

  test("column pruning reaches the scan's readSchema") {
    val df = read().select("file", "lines_hit")
    val scans = df.queryExecution.optimizedPlan.collect {
      case s: DataSourceV2ScanRelation => s.scan
    }
    assert(scans.nonEmpty)
    assert(scans.head.readSchema().fieldNames.toSet === Set("file", "lines_hit"))
  }

  test("test= equality filter is pushed into the reader") {
    val df = read().filter(col("test") === "unit")
    val scans = df.queryExecution.optimizedPlan.collect {
      case s: DataSourceV2ScanRelation => s.scan
    }
    assert(scans.head.description().contains("""EqualTo(test,unit)"""))
    assert(df.count() === 2L)
    assert(read().filter(col("file") === "src/b.py").count() === 1L)
  }

  test("c03 aggregate equals the pre-loaded c01 parse on sf0.001") {
    val viaConnector = graft.queries.CoverageQueries
      .c03LcovConnector(spark, sfTiny).collect().toSeq
    val viaPreload = graft.queries.CoverageQueries
      .c01LcovFileCoverage(spark, sfTiny).collect().toSeq
    assert(viaConnector === viaPreload)
  }
}
