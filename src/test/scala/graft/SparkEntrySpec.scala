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

  // Full-registry tripwire (round-4 postmortem): when the driver
  // regenerated testdata with a different events `ts` dtype, st01–st04
  // stopped analyzing and SILENTLY VANISHED from CORRECTNESS (the driver
  // omits queries whose Verify write errors) — the correctness file
  // shrank instead of failing. This sweep EXECUTES every registered query
  // at sf0.001 and reports every breakage by name, so a testdata change
  // can never again hide a broken query.
  test("every registered query executes at sf0.001") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try { fn(spark, sfTiny).count(); None }
        catch { case e: Throwable =>
          Some(s"$name: ${e.getClass.getSimpleName}: " +
            Option(e.getMessage).getOrElse("").linesIterator.take(3)
              .mkString(" | ").take(300))
        }
    }
    assert(failures.isEmpty,
      s"${failures.size} registered queries failed to execute:\n" +
        failures.mkString("\n"))
  }
}
