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

  test("every catalog entry has a recorded floor in BASELINE_QUERIES.json " +
    "(the driver regression gate must see every entry)") {
    // the round-12 straggler pattern: entries landing without floors are
    // invisible to the per-query regression gate. This keeps the two
    // keysets moving in the same commit.
    val text = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("BASELINE_QUERIES.json")), "UTF-8")
    val floorKeys = """"(q_[a-z0-9_]+)"""".r
      .findAllMatchIn(text).map(_.group(1)).toSet
    val qs = SparkEntry.queries.keySet
    val unfloored = qs.diff(floorKeys)
    val stale = floorKeys.diff(qs)
    assert(unfloored.isEmpty,
      s"catalog entries without a floor (run graft.tools.QProbe and " +
        s"record min warm time): $unfloored")
    assert(stale.isEmpty, s"floors without catalog entries: $stale")
  }
}
