package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every catalog entry must at least ANALYZE against the current
  * fixtures: a schema drift in the driver-generated testdata (e.g. the
  * events ts column switching TIMESTAMP(NANOS) → TIMESTAMP_NTZ between
  * rounds, which silently dropped q_events_sessions from a correctness
  * round) should fail here, in CI, not in the driver's Verify run.
  * Analysis + optimization only — no job is ever submitted, so the whole
  * catalog costs seconds. */
class CatalogAnalysisSpec extends AnyFunSuite {

  test("all catalog entries analyze and optimize against the fixtures") {
    val s = SparkTestSession.withTables()
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try {
          fn(s, SparkTestSession.fixtureDir).queryExecution.optimizedPlan
          graft.llm.PipelineCaches.clear()
          None
        } catch {
          case e: Throwable =>
            graft.llm.PipelineCaches.clear()
            Some(s"$name: ${e.getClass.getSimpleName} ${e.getMessage.linesIterator.nextOption.getOrElse("")}")
        }
    }
    assert(failures.isEmpty,
      s"${failures.size} catalog entries fail analysis:\n${failures.mkString("\n")}")
  }

  test("every oracled entry exists in the query catalog, and sort keys too") {
    val qs = SparkEntry.queries.keySet
    val orphanOracles = SparkEntry.oracleSql.keySet.diff(qs)
    val orphanSorts = SparkEntry.verifySort.keySet.diff(qs)
    assert(orphanOracles.isEmpty, s"oracles without queries: $orphanOracles")
    assert(orphanSorts.isEmpty, s"verifySort without queries: $orphanSorts")
  }
}
