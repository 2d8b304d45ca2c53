package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RelationalQueriesSpec extends SparkSpec {

  test("every query runs at sf0.001 and has a matching oracle entry") {
    assert(RelationalQueries.oracle.keySet == RelationalQueries.queries.keySet)
    RelationalQueries.queries.foreach { case (name, fn) =>
      val df = fn(spark, sfTiny)
      assert(df.columns.nonEmpty, s"$name has no columns")
      df.count() // must execute without throwing
    }
  }

  test("q13 sketches stay within error bounds of the exact answers") {
    import graft.util.Tables
    val li = Tables.lineitem(spark, sfTiny)
    // tighter bounds than the gate flags: sketch vs exact, recomputed here
    val r = li.agg(
      approx_count_distinct(col("l_partkey")).as("apx_parts"),
      approx_count_distinct(col("l_suppkey")).as("apx_supps"),
      expr("approx_percentile(l_extendedprice, 0.5, 1000)").as("apx_median"),
      countDistinct(col("l_partkey")).as("parts"),
      countDistinct(col("l_suppkey")).as("supps"),
      expr("percentile(l_extendedprice, 0.5)").as("median")).head()
    def relErr(a: Double, e: Double): Double = math.abs(a - e) / e
    // approx_count_distinct default rsd = 5%; allow 3 sigma
    assert(relErr(r.getAs[Long]("apx_parts").toDouble,
      r.getAs[Long]("parts").toDouble) < 0.15)
    assert(relErr(r.getAs[Long]("apx_supps").toDouble,
      r.getAs[Long]("supps").toDouble) < 0.15)
    assert(relErr(r.getAs[Double]("apx_median"),
      r.getAs[Double]("median")) < 0.05)
    // and the gate row itself: exact counts + all four in-bounds flags
    val gate = RelationalQueries.q13SketchStats(spark, sfTiny).head()
    assert(gate.getAs[Long]("n_parts") === r.getAs[Long]("parts"))
    assert(gate.getAs[Long]("n_suppliers") === r.getAs[Long]("supps"))
    Seq("parts_ok", "suppliers_ok", "median_ok", "p99_ok")
      .foreach(f => assert(gate.getAs[Long](f) === 1L, f))
  }

  test("q01 groups to the 6 flag/status combinations") {
    val rows = RelationalQueries.q01Pricing(spark, sfTiny).collect()
    assert(rows.length === 6)
    val totalCount = rows.map(_.getAs[Long]("count_order")).sum
    assert(totalCount > 0)
  }

  test("q02 is sorted descending by totalprice") {
    val prices = RelationalQueries.q02FilterTopk(spark, sfTiny)
      .collect().map(_.getAs[Double]("o_totalprice"))
    assert(prices.sameElements(prices.sorted(Ordering[Double].reverse)))
  }

  test("q04 anti-join excludes exactly the customers with pending orders") {
    import spark.implicits._
    val d = sfTiny
    val withPending = graft.util.Tables.orders(spark, d)
      .filter($"o_orderstatus" === "P").select($"o_custkey").distinct().count()
    val total = graft.util.Tables.customer(spark, d).count()
    val got = RelationalQueries.q04NoOrders(spark, d).count()
    assert(got === total - withPending)
  }

  test("q09 rank never exceeds 2 and restarts per customer") {
    val rows = RelationalQueries.q09TopOrdersPerCustomer(spark, sfTiny).collect()
    assert(rows.forall(_.getAs[Long]("rk") <= 2))
    val perCust = rows.groupBy(_.getAs[Long]("o_custkey"))
    assert(perCust.values.forall(_.length <= 2))
  }

  test("q11 distinct equals duckdb-style group by") {
    val a = RelationalQueries.q11Distinct(spark, sfTiny).count()
    val b = graft.util.Tables.lineitem(spark, sfTiny)
      .groupBy("l_returnflag", "l_linestatus").count().count()
    assert(a === b)
  }
}
