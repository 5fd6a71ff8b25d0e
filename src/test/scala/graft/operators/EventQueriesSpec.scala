package graft.operators

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkTestSession, Tables}

/** Catalog-entry-level event hardening: the q_events_priority NULLS LAST
  * pin must hold through the REAL catalog closure even when the events
  * fixture carries a null timestamp — the fixture never does, so without
  * this test a regression in the pin would be invisible until a user's
  * data hit it. */
class EventQueriesSpec extends AnyFunSuite {

  test("q_events_priority drains a planted null-ts event last in its priority") {
    val s = SparkTestSession.withTables()
    val src = SparkTestSession.fixtureDir
    val dir = Files.createTempDirectory("graft-nullts").toString
    // the catalog closure registers every fixture table from its dir
    Tables.names.filter(_ != "events").foreach { n =>
      Files.copy(Paths.get(s"$src/$n.parquet"), Paths.get(s"$dir/$n.parquet"),
        StandardCopyOption.REPLACE_EXISTING)
    }
    val orig = s.read.parquet(s"$src/events.parquet")
    val planted = orig.limit(1).select(
      lit(-1L).cast(orig.schema("event_id").dataType).as("event_id"),
      lit(null).cast(orig.schema("ts").dataType).as("ts"),
      lit(1L).cast(orig.schema("user_id").dataType).as("user_id"),
      lit("error").as("event_type"),
      lit(0.0).as("value"),
      lit(null).cast(orig.schema("props").dataType).as("props"))
    orig.unionByName(planted.select(orig.columns.map(col).toIndexedSeq: _*))
      .coalesce(1).write.parquet(s"$dir/events.parquet")
    try {
      val out = EventQueries.queries("q_events_priority")(s, dir)
        .filter(col("priority") === 1)
        .orderBy("deliver_pos")
        .select("event_id").collect().map(_.getLong(0))
      assert(out.contains(-1L), "the planted error event must be delivered")
      assert(out.last == -1L,
        s"null-ts must drain LAST within priority 1, got order ${out.toSeq}")
      assert(out.length > 1, "fixture must contain timestamped error events")
    } finally {
      // restore the shared session's views for the suites that follow
      Tables.register(s, src)
    }
  }
}
