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

  test("stream-stream interval join: a tight watermark expires view " +
    "state and drops the late match a generous one keeps") {
    val s = SparkTestSession.spark
    import s.implicits._
    import org.apache.spark.sql.streaming.Trigger
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(offsetMin: Long) =
      new java.sql.Timestamp(t0.getTime + offsetMin * 60000L)

    def writeBatches(rows: Seq[Seq[(Long, java.sql.Timestamp, Long)]])
        : java.io.File = {
      val dir = Files.createTempDirectory("ssj").toFile
      rows.zipWithIndex.foreach { case (batch, i) =>
        val before = dir.listFiles().map(_.getName).toSet
        batch.toDF("event_id", "ts", "user_id").coalesce(1)
          .write.mode("append").parquet(dir.toString)
        val stamp = System.currentTimeMillis() - (rows.size - 1 - i) * 10000L
        dir.listFiles()
          .filter(f => f.getName.startsWith("part-") && !before(f.getName))
          .foreach(f => assert(f.setLastModified(stamp)))
      }
      dir
    }

    def run(delay: String): Seq[(Long, Long)] = {
      // batch 1: one view (user 1) + one unrelated purchase;
      // batches 2-3: BOTH sources advance event time 30 days (two
      // batches, because the watermark a batch OBSERVES lags the batch
      // that produced it — the same lag-one model the late-watermark
      // entries pin);
      // batch 4: user 1's purchase 60 min after the view — arriving
      // long after the advance
      val adv = 30L * 24 * 60
      val vDir = writeBatches(Seq(
        Seq((1L, ts(0), 1L)),
        Seq((2L, ts(adv), -1L)),
        Seq((3L, ts(adv + 1), -1L)),
        Seq((4L, ts(adv + 2), -1L))))
      val pDir = writeBatches(Seq(
        Seq((100L, ts(0), 999L)),
        Seq((101L, ts(adv), -2L)),
        Seq((103L, ts(adv + 1), -2L)),
        Seq((102L, ts(60), 1L))))
      val schema = "event_id BIGINT, ts TIMESTAMP, user_id BIGINT"
      val v = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(vDir.toString)
        .withWatermark("ts", delay)
        .select(col("event_id").as("view_id"), col("ts").as("view_ts"),
          col("user_id"))
      val p = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(pDir.toString)
        .withWatermark("ts", delay)
        .select(col("event_id").as("purchase_id"),
          col("ts").as("purchase_ts"), col("user_id").as("p_user"))
      val sink = "ssj_" + java.util.UUID.randomUUID().toString.replace("-", "")
      val ckpt = Files.createTempDirectory("ssj_ck").toString
      val q = v.join(p, col("user_id") === col("p_user") &&
          col("purchase_ts") >= col("view_ts") &&
          col("purchase_ts") <= col("view_ts") + expr("INTERVAL 2 HOURS"))
        .select("view_id", "purchase_id")
        .writeStream.format("memory").queryName(sink)
        .outputMode("append").option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      assert(q.awaitTermination(180000))
      val out = s.table(sink).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
      s.catalog.dropTempView(sink)
      out
    }

    // generous: nothing expires, the cross-batch match lands
    assert(run("365 days") == Seq((1L, 102L)),
      "generous watermark must keep the view buffered for its match")
    // tight: the 30-day advance pushes the watermark far past the
    // view's join horizon (view_ts + 2h + 1h delay), its state is
    // evicted, and the late purchase finds nothing — bounded state
    // traded for completeness, exactly the documented semantics
    assert(run("1 hour").isEmpty,
      "tight watermark must expire the view before the late purchase")
  }

  test("q_event_transitions: hand-computed Markov cells over planted " +
    "user journeys") {
    val s = SparkTestSession.withTables()
    import s.implicits._
    import java.sql.Timestamp
    def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    // user 1: A -> B -> A -> C; user 2: B -> A
    Seq(
      (1L, ts(1), 10L, "A"), (1L, ts(2), 11L, "B"),
      (1L, ts(3), 12L, "A"), (1L, ts(4), 13L, "C"),
      (2L, ts(1), 20L, "B"), (2L, ts(2), 21L, "A"))
      .toDF("user_id", "ts", "event_id", "event_type")
      .createOrReplaceTempView("events")
    val out = graft.SparkEntry.queries("q_event_transitions")(
        s, SparkTestSession.fixtureDir)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    // NOTE: the entry re-registers fixture tables, but temp views win
    // name resolution over the registered fixtures
    assert(out == Map(
      ("A", "B") -> ((1L, 0.5)), ("A", "C") -> ((1L, 0.5)),
      ("B", "A") -> ((2L, 1.0))))
    // restore the REAL fixture view for the shared session: register()
    // is no-op-guarded by spark.graft.registeredDir, so a plain drop
    // would leave every later events consumer viewless
    s.conf.unset("spark.graft.registeredDir")
    Tables.register(s, SparkTestSession.fixtureDir)
  }
}
