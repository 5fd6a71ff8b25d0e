package graft.scale

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Bucketed point-in-interval join: result equality with the naive
  * nested-loop predicate, boundary inclusivity, bucket-crossing
  * intervals, and degenerate-input handling. */
class RangeJoinSpec extends AnyFunSuite {

  private def spark = SparkTestSession.withTables()

  test("bucketed range join equals the nested-loop predicate on fixtures") {
    val s = spark
    val points = s.table("events").select("event_id", "ts")
    val win = s.table("events").filter(col("event_id") % 223 === 0)
      .select(col("event_id").as("window_id"), col("ts").as("lo"),
        (col("ts") + expr("INTERVAL 36 HOURS")).as("hi"))
    val got = RangeJoin.pointInInterval(points, "ts", win, "lo", "hi",
        bucketWidthSec = 24 * 3600)
      .select("event_id", "window_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val naive = points.join(win,
        col("ts") >= col("lo") && col("ts") <= col("hi"))
      .select("event_id", "window_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == naive)
    assert(got.nonEmpty, "fixture produced no matches — test is vacuous")
  }

  test("boundaries are inclusive and bucket-crossing intervals match once") {
    val s = spark
    import s.implicits._
    def t(str: String) = Timestamp.valueOf(str)
    val points = Seq(
      (1L, t("2024-01-01 00:00:00")), // exactly lo
      (2L, t("2024-01-15 00:00:00")), // exactly hi
      (3L, t("2024-01-07 12:00:00")), // mid, next weekly bucket
      (4L, t("2024-02-01 00:00:00"))  // outside
    ).toDF("event_id", "ts")
    val win = Seq((10L, t("2024-01-01 00:00:00"), t("2024-01-15 00:00:00")))
      .toDF("o_orderkey", "lo", "hi")
    val got = RangeJoin.pointInInterval(points, "ts", win, "lo", "hi")
      .select("event_id").collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 2L, 3L))
    // exactly one output row per matching point (no bucket-overlap dupes)
    assert(RangeJoin.pointInInterval(points, "ts", win, "lo", "hi")
      .groupBy("event_id").count().filter(col("count") > 1).count() == 0)
  }

  test("NULL bounds, inverted intervals, and NULL points match nothing") {
    val s = spark
    import s.implicits._
    def t(str: String) = Timestamp.valueOf(str)
    val points = Seq((1L, t("2024-01-05 00:00:00")))
      .toDF("event_id", "ts")
      .unionAll(Seq(2L).toDF("event_id")
        .withColumn("ts", lit(null).cast("timestamp")))
    val win = Seq(
      (10L, t("2024-01-01 00:00:00"), t("2024-01-10 00:00:00")), // valid
      (11L, t("2024-01-10 00:00:00"), t("2024-01-01 00:00:00"))  // inverted
    ).toDF("o_orderkey", "lo", "hi")
      .unionAll(Seq(12L).toDF("o_orderkey")
        .withColumn("lo", lit(null).cast("timestamp"))
        .withColumn("hi", lit(t("2024-01-10 00:00:00"))))
    val got = RangeJoin.pointInInterval(points, "ts", win, "lo", "hi")
      .select("event_id", "o_orderkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 10L)))
  }

  test("KEYED range join equals the nested-loop equality+range " +
    "predicate — matches confined per key, NULL key components match " +
    "nothing (r17)") {
    val s = spark
    import s.implicits._
    def t(str: String) = Timestamp.valueOf(str)
    val points = Seq(
      (1L, Some("a"), t("2024-01-02 00:00:00")), // in window 10 (key a)
      (2L, Some("b"), t("2024-01-02 00:00:00")), // right time, WRONG key
      (3L, Some("a"), t("2024-02-01 00:00:00")), // right key, wrong time
      (4L, Option.empty[String], t("2024-01-02 00:00:00")) // NULL key
    ).toDF("event_id", "k", "ts")
    val win = Seq(
      (10L, Some("a"), t("2024-01-01 00:00:00"), t("2024-01-05 00:00:00")),
      (11L, Option.empty[String], t("2024-01-01 00:00:00"),
        t("2024-01-05 00:00:00"))
    ).toDF("window_id", "wk", "lo", "hi")
    val got = RangeJoin.pointInInterval(points, "ts", win, "lo", "hi",
        bucketWidthSec = 24 * 3600, keys = Seq(("k", "wk")))
      .select("event_id", "window_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val naive = points.join(win, col("k") === col("wk") &&
        col("ts") >= col("lo") && col("ts") <= col("hi"))
      .select("event_id", "window_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == naive && got == Set((1L, 10L)),
      s"keyed join must confine matches per key and drop NULLs: $got")
    // fixture-scale identity on the events table (per-type windows)
    val e = s.table("events").select("event_id", "event_type", "ts")
    val w2 = s.table("events").filter(col("event_id") % 223 === 0)
      .select(col("event_id").as("window_id"),
        col("event_type").as("wtype"), col("ts").as("lo"),
        (col("ts") + expr("INTERVAL 36 HOURS")).as("hi"))
    val keyed = RangeJoin.pointInInterval(e, "ts", w2, "lo", "hi",
        bucketWidthSec = 24 * 3600, keys = Seq(("event_type", "wtype")))
      .select("event_id", "window_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val plain = e.join(w2, col("event_type") === col("wtype") &&
        col("ts") >= col("lo") && col("ts") <= col("hi"))
      .select("event_id", "window_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(keyed == plain && keyed.nonEmpty)
    // missing key columns fail loudly
    val err = intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(points, "ts", win, "lo", "hi",
        keys = Seq(("nope", "wk")))
    }
    assert(err.getMessage.contains("equality key"))
  }

  test("span guard stays LOUD when the bucket difference overflows Long " +
    "(r16 advice: lo near -2^62, hi near +2^62 — the wrapped negative " +
    "must not slip past the cap into a sequence() blow-up)") {
    val s = spark
    import s.implicits._
    val points = Seq((1L, 0.0)).toDF("event_id", "p")
    // buckets lob = -4.8e18 and hib = +4.8e18 are both representable
    // Longs, but hib - lob = 9.6e18 > Long.MaxValue wraps to -8.85e18,
    // which the pre-fix `hib - lob < cap` check accepted
    val win = Seq((10L, -4.8e18, 4.8e18)).toDF("window_id", "lo", "hi")
    val err = intercept[Exception] {
      RangeJoin.pointInIntervalNum(points, "p", win, "lo", "hi",
        bucketWidth = 1.0).count()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(err).exists(_.contains("covers >=")),
      s"expected the loud span-cap error, got: $err")
  }
}
