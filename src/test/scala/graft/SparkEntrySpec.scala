package graft

/** Driver-contract invariants: every oracle entry must name a registered
  * query (a typo would silently drop a correctness row), query names must
  * be unique across modules, and the flagship entry must return rows. */
class SparkEntrySpec extends SparkSpec {

  test("oracle keys are a subset of registered queries") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("module query maps do not shadow each other") {
    val maps = Seq(
      graft.queries.RelationalQueries.queries,
      graft.queries.GraphParityQueries.queries,
      graft.queries.PipelineQueries.queries,
      graft.queries.StreamQueries.queries,
      graft.queries.MultimodalQueries.queries,
      graft.queries.CoverageQueries.queries)
    val total = maps.map(_.size).sum
    assert(SparkEntry.queries.size == total,
      "duplicate query name across modules (map union dropped an entry)")
  }

  test("flagship entry returns rows at sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
