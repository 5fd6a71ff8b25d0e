package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.functions.GraftExtensions

/** The conf-gated bucketed range-join rewrite: a plain
  * point-in-interval predicate join — a nested loop to Catalyst —
  * becomes the bucketed equi-join + exact re-filter, result-identical. */
class RangeJoinRewriteSpec extends AnyFunSuite {

  private def spark = SparkTestSession.withTables()

  private def sides(s: SparkSession): (DataFrame, DataFrame) = {
    val e = s.table("events").select("event_id", "ts")
    val win = s.table("events").filter(col("event_id") % 97 === 0)
      .select(col("event_id").as("window_id"), col("ts").as("lo"),
        (col("ts") + expr("INTERVAL 12 HOURS")).as("hi"))
    (e, win)
  }

  private def pairs(df: DataFrame): Set[(Long, Long)] =
    df.select("event_id", "window_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  private def withRewrite[T](s: SparkSession)(body: => T): T = {
    GraftExtensions.register(s)
    s.conf.set("spark.graft.rangeJoin.rewrite", "true")
    s.conf.set("spark.graft.rangeJoin.bucketSec", "21600")
    try body
    finally {
      s.conf.set("spark.graft.rangeJoin.rewrite", "false")
      s.conf.set("spark.graft.rangeJoin.bucketSec", "86400")
    }
  }

  test("inclusive range join: nested loop gone, result identical") {
    val s = spark
    val (e, w) = sides(s)
    def q = e.join(w, col("ts") >= col("lo") && col("ts") <= col("hi"))
    val plain = pairs(q)
    assert(q.queryExecution.executedPlan.toString
      .contains("BroadcastNestedLoopJoin"))
    withRewrite(s) {
      val p = q.queryExecution.executedPlan.toString
      assert(!p.contains("BroadcastNestedLoopJoin") &&
        !p.contains("CartesianProduct"), s"nested loop survived:\n$p")
      assert(pairs(q) == plain)
    }
  }

  test("strict bounds and extra conjuncts re-filter exactly") {
    val s = spark
    val (e, w) = sides(s)
    def q = e.join(w, col("ts") > col("lo") && col("ts") < col("hi") &&
      col("event_id") % 2 === 0)
    val plain = pairs(q)
    withRewrite(s) {
      val p = q.queryExecution.executedPlan.toString
      assert(!p.contains("BroadcastNestedLoopJoin"), p)
      assert(pairs(q) == plain)
    }
  }

  test("flipped sides (points on the right) also rewrite and restore " +
    "column order") {
    val s = spark
    val (e, w) = sides(s)
    def q = w.join(e, col("ts") >= col("lo") && col("ts") <= col("hi"))
      .select("window_id", "event_id", "lo")
    val plain = q.collect().map(_.toSeq).toSet
    withRewrite(s) {
      assert(!q.queryExecution.executedPlan.toString
        .contains("BroadcastNestedLoopJoin"))
      assert(q.collect().map(_.toSeq).toSet == plain)
    }
  }

  test("joins with an equi-connector or disabled conf are untouched") {
    val s = spark
    GraftExtensions.register(s)
    val (e, w) = sides(s)
    s.conf.set("spark.graft.rangeJoin.rewrite", "false")
    assert(e.join(w, col("ts") >= col("lo") && col("ts") <= col("hi"))
      .queryExecution.executedPlan.toString
      .contains("BroadcastNestedLoopJoin"))
    withRewrite(s) {
      // an equality connecting the sides -> planner equi-joins; no rewrite
      val eq = e.join(w, col("event_id") === col("window_id") &&
        col("ts") >= col("lo") && col("ts") <= col("hi"))
      val p = eq.queryExecution.executedPlan.toString
      assert(!p.contains("__graft_range"), p)
      assert(eq.count() > 0)
    }
  }

  /** Typed fixture for the keyed opt-in: per-type windows, so the
    * equality is low-cardinality (the shape the keyed lift targets). */
  private def typedSides(s: SparkSession): (DataFrame, DataFrame) = {
    val e = s.table("events").select("event_id", "event_type", "ts")
    val win = s.table("events").filter(col("event_id") % 97 === 0)
      .select(col("event_id").as("window_id"),
        col("event_type").as("wtype"), col("ts").as("lo"),
        (col("ts") + expr("INTERVAL 12 HOURS")).as("hi"))
    (e, win)
  }

  test("keyedRewrite lifts a cross-side attribute equality into the " +
    "bucketed join's keys — fires, stays result-identical, and keeps " +
    "declining without the opt-in (r17)") {
    val s = spark
    val (e, w) = typedSides(s)
    def q = e.join(w, col("event_type") === col("wtype") &&
        col("ts") >= col("lo") && col("ts") <= col("hi"))
      .select("event_id", "event_type", "window_id")
    val plain = q.collect().map(_.toSeq).toSet
    withRewrite(s) {
      // without the keyed opt-in: the established equi-decline holds
      assert(!q.queryExecution.executedPlan.toString
        .contains("__graft_range"),
        "equality+range must still decline without keyedRewrite")
      s.conf.set("spark.graft.rangeJoin.keyedRewrite", "true")
      try {
        val p = q.queryExecution.executedPlan.toString
        assert(p.contains("__graft_range"),
          s"keyed lift did not fire:\n$p")
        assert(!p.contains("BroadcastNestedLoopJoin") &&
          !p.contains("CartesianProduct"), p)
        assert(q.collect().map(_.toSeq).toSet == plain,
          "keyed lift identity broke")
        assert(q.count() == plain.size,
          "keyed lift must emit each row exactly once")
      } finally s.conf.unset("spark.graft.rangeJoin.keyedRewrite")
    }
  }

  test("keyedRewrite declines non-liftable equality connectors: a " +
    "computed equality and a null-safe <=> both keep the plain plan " +
    "(the lift is proven for attribute pairs only)") {
    val s = spark
    val (e, w) = typedSides(s)
    withRewrite(s) {
      s.conf.set("spark.graft.rangeJoin.keyedRewrite", "true")
      try {
        // computed (non-attribute) equality
        val comp = e.join(w,
          concat(col("event_type"), lit("")) === col("wtype") &&
            col("ts") >= col("lo") && col("ts") <= col("hi"))
        assert(!comp.queryExecution.executedPlan.toString
          .contains("__graft_range"),
          "a computed equality must decline the keyed lift")
        // null-safe equality: <=> keeps NULL=NULL pairs the bucketed
        // join's key equality would drop — must decline
        val nsafe = e.join(w, col("event_type") <=> col("wtype") &&
          col("ts") >= col("lo") && col("ts") <= col("hi"))
        assert(!nsafe.queryExecution.executedPlan.toString
          .contains("__graft_range"),
          "a null-safe equality must decline the keyed lift")
      } finally s.conf.unset("spark.graft.rangeJoin.keyedRewrite")
    }
  }

  test("SQL BETWEEN form triggers the same rewrite (the analyzer " +
    "expands BETWEEN into the >=/<= conjuncts the rule matches)") {
    val s = spark
    val (e, w) = sides(s)
    e.createOrReplaceTempView("rj_events")
    w.createOrReplaceTempView("rj_windows")
    def q = s.sql(
      """SELECT event_id, window_id FROM rj_events e JOIN rj_windows w
        |ON e.ts BETWEEN w.lo AND w.hi""".stripMargin)
    val plain = pairs(q)
    withRewrite(s) {
      val p = q.queryExecution.executedPlan.toString
      assert(!p.contains("BroadcastNestedLoopJoin") &&
        !p.contains("CartesianProduct"),
        s"SQL BETWEEN must rewrite too:\n$p")
      assert(pairs(q) == plain)
    }
  }

  /** Numeric score bands: values spanning negatives and fractions, a
    * fractional bucket width, bounds straddling zero. */
  private def numSides(s: SparkSession): (DataFrame, DataFrame) = {
    val e = s.table("events").select(col("event_id"),
      (col("value") - 50.0).as("score"))
    val win = s.table("events").filter(col("event_id") % 97 === 0)
      .select(col("event_id").as("window_id"),
        (col("value") - 51.25).as("lo"), (col("value") - 48.75).as("hi"))
    (e, win)
  }

  private def withNumRewrite[T](s: SparkSession, width: String = "2.5")
      (body: => T): T = {
    GraftExtensions.register(s)
    s.conf.set("spark.graft.rangeJoin.rewrite", "true")
    s.conf.set("spark.graft.rangeJoin.numBucketWidth", width)
    try body
    finally {
      s.conf.set("spark.graft.rangeJoin.rewrite", "false")
      s.conf.unset("spark.graft.rangeJoin.numBucketWidth")
    }
  }

  test("the numeric family DECLINES when no explicit width is set (a " +
    "session-wide numeric default is a single-bucket trap) and when an " +
    "interval would cover >= 1M buckets it fails LOUDLY, not as an " +
    "executor array blow-up") {
    val s = spark
    GraftExtensions.register(s)
    val (e, w) = numSides(s)
    s.conf.set("spark.graft.rangeJoin.rewrite", "true")
    s.conf.unset("spark.graft.rangeJoin.numBucketWidth")
    try {
      val q = e.join(w,
        col("score") >= col("lo") && col("score") <= col("hi"))
      assert(!q.queryExecution.optimizedPlan.toString
        .contains("__graft_range"),
        "numeric rewrite must decline without an explicit width")
    } finally s.conf.set("spark.graft.rangeJoin.rewrite", "false")
    // span cap: an open upper bound encoded as a sentinel throws with
    // the interval's bounds instead of exploding sequence()
    import s.implicits._
    val pts = Seq((1L, 5.0)).toDF("event_id", "score")
    val open = Seq((1L, 0.0, Double.MaxValue)).toDF("window_id", "lo", "hi")
    val err = intercept[Exception] {
      graft.scale.RangeJoin.pointInIntervalNum(
        pts, "score", open, "lo", "hi", bucketWidth = 2.5).count()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(err).exists(_.contains("covers >=")),
      s"expected the loud span-cap error, got: $err")
  }

  test("NUMERIC range join (negative values, fractional width): nested " +
    "loop gone, result identical") {
    val s = spark
    val (e, w) = numSides(s)
    def q = e.join(w,
      col("score") >= col("lo") && col("score") <= col("hi"))
    val plain = pairs(q)
    assert(q.queryExecution.executedPlan.toString
      .contains("BroadcastNestedLoopJoin"))
    withNumRewrite(s) {
      val p = q.queryExecution.executedPlan.toString
      assert(!p.contains("BroadcastNestedLoopJoin") &&
        !p.contains("CartesianProduct"), s"nested loop survived:\n$p")
      assert(pairs(q) == plain)
    }
    // sanity: the fixture genuinely exercises negative bounds
    assert(w.filter(col("lo") < 0).count() > 0)
  }

  test("NUMERIC (integer family) strict bounds + extra conjunct " +
    "re-filter exactly") {
    val s = spark
    // long points vs long bounds — cast-free comparisons, one family
    val e = s.table("events").select(col("event_id"),
      pmod(col("user_id"), lit(1000L)).as("score"))
    val w = s.table("events").filter(col("event_id") % 97 === 0)
      .select(col("event_id").as("window_id"),
        (pmod(col("user_id"), lit(1000L)) - lit(25L)).as("lo"),
        (pmod(col("user_id"), lit(1000L)) + lit(25L)).as("hi"))
    def q = e.join(w, col("score") > col("lo") && col("score") < col("hi")
      && col("event_id") % 2 === 0)
    val plain = pairs(q)
    withNumRewrite(s, width = "40") {
      val p = q.queryExecution.executedPlan.toString
      assert(!p.contains("BroadcastNestedLoopJoin"), p)
      assert(pairs(q) == plain)
    }
  }

  test("an unsupported type family (DATE triple) is DECLINED — the " +
    "nested loop stays; a truly mixed triple never reaches the rule " +
    "cast-free (the analyzer's implicit casts already break the " +
    "attribute pattern), which is exactly the documented decline") {
    val s = spark
    val e = s.table("events").select(col("event_id"),
      col("ts").cast("date").as("d"))
    val w = s.table("events").filter(col("event_id") % 97 === 0)
      .select(col("event_id").as("window_id"),
        col("ts").cast("date").as("lo"),
        date_add(col("ts").cast("date"), 2).as("hi"))
    withNumRewrite(s) {
      s.conf.set("spark.graft.rangeJoin.bucketSec", "21600")
      try {
        val q = e.join(w, col("d") >= col("lo") && col("d") <= col("hi"))
        val p = q.queryExecution.optimizedPlan.toString
        assert(!p.contains("__graft_range"),
          s"unsupported family must decline:\n$p")
        // cross-width numerics (bigint point, double bounds): the
        // analyzer wraps the point in a cast, the attribute pattern
        // cannot match, the plan stays untouched — same decline
        val mixed = s.table("events")
          .select(col("event_id"),
            pmod(col("user_id"), lit(100L)).as("score"))
          .join(s.table("events").filter(col("event_id") % 97 === 0)
              .select(col("event_id").as("window_id"),
                (col("value") / 10.0 - 2.5).as("lo"),
                (col("value") / 10.0 + 2.5).as("hi")),
            col("score") >= col("lo") && col("score") <= col("hi"))
        assert(!mixed.queryExecution.optimizedPlan.toString
          .contains("__graft_range"))
      } finally s.conf.set("spark.graft.rangeJoin.bucketSec", "86400")
    }
  }

  test("NULL bounds and NULL points match nothing, same as the nested " +
    "loop") {
    val s = spark
    val (e, w0) = sides(s)
    val w = w0.withColumn("lo",
      when(col("window_id") % 2 === 0, col("lo")))
    def q = e.join(w, col("ts") >= col("lo") && col("ts") <= col("hi"))
    val plain = pairs(q)
    withRewrite(s) {
      assert(pairs(q) == plain)
      assert(plain.forall(_._2 % 2 == 0))
    }
  }
}
