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

  /** Count the Spark jobs launched while `body` runs — used to pin
    * which plannings pay a diagnosis and which are cached/job-free.
    * The listener bus is async, so quiesce (no new events for 500 ms)
    * before reading. */
  private def jobsDuring(s: SparkSession)(body: => Unit): Int = {
    val counter = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        counter.incrementAndGet(); ()
      }
    }
    s.sparkContext.addSparkListener(listener)
    try {
      body
      var last = counter.get
      var stableSince = System.currentTimeMillis()
      val deadline = System.currentTimeMillis() + 15000
      while (System.currentTimeMillis() - stableSince < 500 &&
          System.currentTimeMillis() < deadline) {
        Thread.sleep(25)
        if (counter.get != last) {
          last = counter.get
          stableSince = System.currentTimeMillis()
        }
      }
      counter.get
    } finally s.sparkContext.removeSparkListener(listener)
  }

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

  test("numWidthAuto: the numeric family fires WITHOUT an explicit " +
    "width — the measured median-span width — and stays " +
    "result-identical; an explicit width still wins (r17)") {
    val s = spark
    val (e, w) = numSides(s)
    def q = e.join(w,
      col("score") >= col("lo") && col("score") <= col("hi"))
    val plain = pairs(q)
    GraftExtensions.register(s)
    s.conf.set("spark.graft.rangeJoin.rewrite", "true")
    s.conf.unset("spark.graft.rangeJoin.numBucketWidth")
    s.conf.set("spark.graft.rangeJoin.numWidthAuto", "true")
    try {
      val p = q.queryExecution.executedPlan.toString
      assert(p.contains("__graft_range"),
        s"auto width did not fire:\n$p")
      assert(!p.contains("BroadcastNestedLoopJoin") &&
        !p.contains("CartesianProduct"), p)
      assert(pairs(q) == plain, "auto-width identity broke")
      // explicit width set: still fires (explicit wins, same identity)
      s.conf.set("spark.graft.rangeJoin.numBucketWidth", "2.5")
      assert(q.queryExecution.executedPlan.toString
        .contains("__graft_range"))
      assert(pairs(q) == plain)
    } finally {
      s.conf.set("spark.graft.rangeJoin.rewrite", "false")
      s.conf.unset("spark.graft.rangeJoin.numWidthAuto")
      s.conf.unset("spark.graft.rangeJoin.numBucketWidth")
    }
  }

  test("numWidthAuto DECLINES the unsound-width distributions: all " +
    "point intervals (median span 0), an unbounded sentinel interval " +
    "(non-finite max), and a >=1e5x tail span (median width would " +
    "manufacture the bucket-cap error the nested loop never raises)") {
    val s = spark
    import s.implicits._
    GraftExtensions.register(s)
    val pts = Seq((1L, 5.0), (2L, -3.0)).toDF("pid", "p")
    def q(iv: DataFrame) =
      pts.join(iv, col("p") >= col("ilo") && col("p") <= col("ihi"))
    s.conf.set("spark.graft.rangeJoin.rewrite", "true")
    s.conf.set("spark.graft.rangeJoin.numWidthAuto", "true")
    try {
      // all spans zero: no width is measurable
      val zero = Seq((1L, 5.0, 5.0), (2L, -3.0, -3.0))
        .toDF("wid", "ilo", "ihi")
      assert(!q(zero).queryExecution.optimizedPlan.toString
        .contains("__graft_range"),
        "zero-span intervals must decline auto width")
      // an unbounded sentinel interval: max span is infinite — only
      // the nested loop is sound, and it still returns the right rows
      val open = Seq((1L, 4.0, 6.0), (2L, 0.0, Double.PositiveInfinity))
        .toDF("wid", "ilo", "ihi")
      assert(!q(open).queryExecution.optimizedPlan.toString
        .contains("__graft_range"),
        "an infinite-span interval must decline auto width")
      assert(q(open).count() == 2) // 5∈[4,6], 5∈[0,inf), and nothing else
      // tail span >= 1e5x the median: no single sound width
      val tail = Seq((1L, 0.0, 1.0), (2L, 0.5, 1.5),
          (3L, 0.0, 2.0e5)).toDF("wid", "ilo", "ihi")
      assert(!q(tail).queryExecution.optimizedPlan.toString
        .contains("__graft_range"),
        "a 1e5x tail span must decline auto width")
    } finally {
      s.conf.set("spark.graft.rangeJoin.rewrite", "false")
      s.conf.unset("spark.graft.rangeJoin.numWidthAuto")
    }
  }

  test("keyedAuto: the keyed lift fires from MEASURED per-key piles " +
    "(planner-hash-group price >= keyedTargetRows), declines when no " +
    "key's pile reaches the target, and stays result-identical (r17)") {
    val s = spark
    val (e, w) = typedSides(s)
    def q = e.join(w, col("event_type") === col("wtype") &&
        col("ts") >= col("lo") && col("ts") <= col("hi"))
      .select("event_id", "event_type", "window_id")
    val plain = q.collect().map(_.toSeq).toSet
    withRewrite(s) {
      s.conf.set("spark.graft.rangeJoin.keyedAuto", "true")
      // sf0.001 fixture: ~200 points x ~2 windows per type — price
      // ~400 per key; 200 trips, 100000 cannot
      s.conf.set("spark.graft.rangeJoin.keyedTargetRows", "200")
      try {
        val p = q.queryExecution.executedPlan.toString
        assert(p.contains("__graft_range"),
          s"measured keyed lift did not fire:\n$p")
        assert(!p.contains("BroadcastNestedLoopJoin") &&
          !p.contains("CartesianProduct"), p)
        assert(q.collect().map(_.toSeq).toSet == plain,
          "measured keyed lift identity broke")
        // no key's price reaches the target: the planner's hash join
        // is the measured-right plan and stays
        s.conf.set("spark.graft.rangeJoin.keyedTargetRows", "100000")
        assert(!q.queryExecution.executedPlan.toString
          .contains("__graft_range"),
          "an untripped keyed diagnosis must keep the planner's plan")
      } finally {
        s.conf.unset("spark.graft.rangeJoin.keyedAuto")
        s.conf.unset("spark.graft.rangeJoin.keyedTargetRows")
      }
    }
  }

  test("measured decisions run their plan-time jobs ONCE per shape " +
    "(cached); rediagnose=true bypasses the cache READ; the sampled " +
    "diagnosis (deterministic full-row hash) reaches the same " +
    "decisions on the planted fixture") {
    val s = spark
    // count Spark jobs launched while materializing the OPTIMIZED plan
    // only (the diagnosis collects are the only plan-time job source;
    // the bucketed assembly itself runs none)
    def planJobs(body: => Unit): Int = jobsDuring(s)(body)
    val (e0, w0) = typedSides(s)
    // numeric keyed shape so ONE query exercises BOTH diagnoses (NTZ
    // timestamps cast to double through TIMESTAMP, as RangeJoin does)
    val e = e0.withColumn("score",
        col("ts").cast("timestamp").cast("double"))
      .drop("ts")
    val w = w0.withColumn("nlo",
        col("lo").cast("timestamp").cast("double"))
      .withColumn("nhi", col("hi").cast("timestamp").cast("double"))
      .drop("lo", "hi")
    def q = e.join(w, col("event_type") === col("wtype") &&
      col("score") >= col("nlo") && col("score") <= col("nhi"))
    GraftExtensions.register(s)
    s.conf.set("spark.graft.rangeJoin.rewrite", "true")
    s.conf.unset("spark.graft.rangeJoin.numBucketWidth")
    s.conf.set("spark.graft.rangeJoin.numWidthAuto", "true")
    s.conf.set("spark.graft.rangeJoin.keyedAuto", "true")
    // 777: a target no other test uses, so this test's cache keys are
    // disjoint in the session-shared rule instance
    s.conf.set("spark.graft.rangeJoin.keyedTargetRows", "777")
    try {
      def plan() = q.queryExecution.executedPlan
      assert(plan().toString.contains("__graft_range"),
        "the fixture must trip both measured gates")
      val first = planJobs { plan() }
      // first==0 would mean the diagnoses were cached by the assert
      // above — which is the point; re-check against a fresh target
      s.conf.set("spark.graft.rangeJoin.keyedTargetRows", "778")
      val fresh = planJobs { plan() }
      assert(fresh >= 1,
        s"a fresh conf must re-run the keyed diagnosis, ran $fresh")
      val second = planJobs { plan() }
      assert(second == 0,
        s"cached decisions must plan job-free, ran $second")
      s.conf.set("spark.graft.rangeJoin.rediagnose", "true")
      try {
        val third = planJobs { plan() }
        assert(third >= 1,
          "rediagnose=true must bypass the cache read and re-diagnose")
      } finally s.conf.unset("spark.graft.rangeJoin.rediagnose")
      val fourth = planJobs { plan() }
      assert(fourth == 0,
        s"the re-cached decision must be honored again, ran $fourth")
      // sampled diagnosis: fires on the planted fixture too. The
      // keyed ROUTING decision prices on the plan's point estimates
      // (ceil(c/rate) — not the 3-sigma salt-factor lower bounds;
      // over-lifting a borderline key costs only bucket replication,
      // see keyedPileProven's scaladoc), but a sparse side can still
      // be under-sampled, so the target sits well under the
      // fixture's estimated price: 100 against a ~200-point-per-type
      // pile is provable at rate 0.5 under any sampling outcome
      s.conf.set("spark.graft.rangeJoin.keyedTargetRows", "100")
      s.conf.set("spark.graft.rangeJoin.sampleRate", "0.5")
      try {
        val p = plan().toString
        assert(p.contains("__graft_range"),
          s"sampled diagnosis missed the planted piles:\n$p")
      } finally s.conf.unset("spark.graft.rangeJoin.sampleRate")
      val _ = first // silence: first's value is timing-dependent
    } finally {
      s.conf.set("spark.graft.rangeJoin.rewrite", "false")
      s.conf.unset("spark.graft.rangeJoin.numWidthAuto")
      s.conf.unset("spark.graft.rangeJoin.keyedAuto")
      s.conf.unset("spark.graft.rangeJoin.keyedTargetRows")
    }
  }

  test("bucketSecAuto: the TS family's width is MEASURED when " +
    "bucketSec is UNSET (a diagnosis job runs at plan time; identity " +
    "holds), while an explicitly-set bucketSec — even the default " +
    "value — wins job-free (r17)") {
    val s = spark
    GraftExtensions.register(s)
    val (e, w) = sides(s)
    def q = e.join(w, col("ts") >= col("lo") && col("ts") <= col("hi"))
    val plain = pairs(q)
    s.conf.set("spark.graft.rangeJoin.rewrite", "true")
    s.conf.unset("spark.graft.rangeJoin.bucketSec")
    s.conf.set("spark.graft.rangeJoin.bucketSecAuto", "true")
    try {
      val jobs = jobsDuring(s) { q.queryExecution.executedPlan }
      assert(jobs >= 1,
        s"the first TS-width planning must run the diagnosis, ran $jobs")
      val p = q.queryExecution.executedPlan.toString
      assert(p.contains("__graft_range") &&
        !p.contains("BroadcastNestedLoopJoin"), p)
      assert(pairs(q) == plain, "measured TS width identity broke")
      // cached: re-planning the same shape is job-free
      assert(jobsDuring(s) { q.queryExecution.executedPlan } == 0,
        "the cached TS width must plan job-free")
      // explicit bucketSec (the default value, set explicitly) wins
      // without jobs even on a FRESH shape
      s.conf.set("spark.graft.rangeJoin.bucketSec", "86400")
      val w2 = s.table("events").filter(col("event_id") % 89 === 0)
        .select(col("event_id").as("window_id"), col("ts").as("lo"),
          (col("ts") + expr("INTERVAL 12 HOURS")).as("hi"))
      def q2 = e.join(w2,
        col("ts") >= col("lo") && col("ts") <= col("hi"))
      val jobs2 = jobsDuring(s) { q2.queryExecution.executedPlan }
      assert(jobs2 == 0,
        s"an explicit bucketSec must never run diagnosis jobs, ran $jobs2")
      assert(q2.queryExecution.executedPlan.toString
        .contains("__graft_range"))
    } finally {
      s.conf.set("spark.graft.rangeJoin.rewrite", "false")
      s.conf.unset("spark.graft.rangeJoin.bucketSecAuto")
      s.conf.set("spark.graft.rangeJoin.bucketSec", "86400")
    }
  }

  test("review-pass pins (r17): duplicate lifted equalities diagnose " +
    "without crashing, lo==hi (one bound attribute) declines cleanly, " +
    "an unsampled tail span still declines via the EXACT max, an " +
    "explicit width=0 kill-switch beats numWidthAuto job-free, and a " +
    "declined numeric band FALLS THROUGH to a TS triple instead of " +
    "vetoing the join") {
    val s = spark
    import s.implicits._
    GraftExtensions.register(s)
    s.conf.set("spark.graft.rangeJoin.rewrite", "true")
    s.conf.set("spark.graft.rangeJoin.numWidthAuto", "true")
    s.conf.set("spark.graft.rangeJoin.keyedAuto", "true")
    s.conf.set("spark.graft.rangeJoin.keyedTargetRows", "2")
    try {
      // (1) one points attribute backing TWO lifted equalities:
      // e.etype = w.t1 AND e.etype = w.t2 — the diagnosis must not
      // die on the rename (it once left _dk_1 unresolved)
      val e = Seq((1L, "a", 5.0), (2L, "a", 7.0), (3L, "b", 9.0))
        .toDF("eid", "etype", "v")
      val w = Seq((10L, "a", "a", 4.0, 8.0), (11L, "b", "b", 8.5, 9.5))
        .toDF("wid", "t1", "t2", "wlo", "whi")
      def dup = e.join(w, col("etype") === col("t1") &&
        col("etype") === col("t2") &&
        col("v") >= col("wlo") && col("v") <= col("whi"))
      s.conf.set("spark.graft.rangeJoin.rewrite", "false")
      val plain = dup.collect().map(_.toSeq).toSet
      s.conf.set("spark.graft.rangeJoin.rewrite", "true")
      assert(dup.collect().map(_.toSeq).toSet == plain,
        "duplicate-equality keyed diagnosis must keep identity")
      // (2) lo and hi the SAME attribute — every span 0, decline
      // without the impossible two-names-one-column rename
      val pts = Seq((1L, 5.0), (2L, 3.0)).toDF("pid", "p")
      val bi = Seq((9L, 5.0)).toDF("bid", "b")
      val same = pts.join(bi,
        col("p") >= col("b") && col("p") <= col("b"))
      assert(!same.queryExecution.optimizedPlan.toString
        .contains("__graft_range"), "lo==hi must decline, not crash")
      assert(same.count() == 1)
      // (3) a >=1e5x tail interval must decline under SAMPLING too:
      // the max span is computed exactly over all valid rows, so the
      // decline cannot depend on whether the tail row was sampled
      s.conf.set("spark.graft.rangeJoin.sampleRate", "0.5")
      val tailIv = ((1 to 50).map(i => (i.toLong, i * 10.0,
        i * 10.0 + 1.0)) :+ (99L, 0.0, 2.0e5))
        .toDF("wid", "ilo", "ihi")
      val tailQ = pts.join(tailIv,
        col("p") >= col("ilo") && col("p") <= col("ihi"))
      assert(!tailQ.queryExecution.optimizedPlan.toString
        .contains("__graft_range"),
        "the exact max must catch the tail at any sample rate")
      s.conf.unset("spark.graft.rangeJoin.sampleRate")
      // (4) explicit numBucketWidth=0 is the documented kill-switch:
      // the family declines, and auto must not override it (and runs
      // no diagnosis jobs)
      s.conf.set("spark.graft.rangeJoin.numBucketWidth", "0")
      val band = Seq((7L, 4.0, 6.0)).toDF("wid2", "blo", "bhi")
      def killed = pts.join(band,
        col("p") >= col("blo") && col("p") <= col("bhi"))
      val jobs = jobsDuring(s) {
        assert(!killed.queryExecution.optimizedPlan.toString
          .contains("__graft_range"),
          "width=0 must disable the numeric family even under auto")
      }
      assert(jobs == 0,
        s"the kill-switch must not run diagnosis jobs, ran $jobs")
      s.conf.unset("spark.graft.rangeJoin.numBucketWidth")
      // (5) a numeric band whose measurement declines (all spans 0,
      // distinct lo/hi attributes) must fall through to the TS triple
      // in the same condition, which rewrites with the default bucket
      val e2 = Seq((1L, 5.0, java.sql.Timestamp.valueOf(
          "2024-01-01 12:00:00"))).toDF("eid2", "v2", "ts2")
      val w2 = Seq((20L, 5.0, 5.0,
          java.sql.Timestamp.valueOf("2024-01-01 00:00:00"),
          java.sql.Timestamp.valueOf("2024-01-02 00:00:00")))
        .toDF("wid3", "zlo", "zhi", "tlo", "thi")
      val mixed = e2.join(w2,
        col("v2") >= col("zlo") && col("v2") <= col("zhi") &&
          col("ts2") >= col("tlo") && col("ts2") <= col("thi"))
      val p = mixed.queryExecution.optimizedPlan.toString
      assert(p.contains("__graft_range"),
        s"the TS triple must fire after the numeric decline:\n$p")
      assert(mixed.count() == 1)
    } finally {
      s.conf.set("spark.graft.rangeJoin.rewrite", "false")
      s.conf.unset("spark.graft.rangeJoin.numWidthAuto")
      s.conf.unset("spark.graft.rangeJoin.keyedAuto")
      s.conf.unset("spark.graft.rangeJoin.keyedTargetRows")
      s.conf.unset("spark.graft.rangeJoin.numBucketWidth")
      s.conf.unset("spark.graft.rangeJoin.sampleRate")
    }
  }

  test("keyed routing prices UNCAPPED (r17 second review pass): a " +
    "SINGLE-point key over a large intervals side — which the salting " +
    "planners cap to salt 1 because splitting one row is pointless — " +
    "must still lift, because the per-key cartesian lives on the " +
    "intervals side and the (key, bucket) shuffle splits it anyway") {
    val s = spark
    import s.implicits._
    GraftExtensions.register(s)
    // one point for the hot key; 300 intervals all containing it —
    // price greatest(1*300, 1) = 300, old salt = least(3, nL=1) = 1
    val pts = Seq(("h", 5.0), ("cold", 50.0)).toDF("ptype", "p")
    val ivs = (1 to 300).map(i => (i.toLong, "h", 4.0, 6.0))
      .toDF("wid", "wtype", "ilo", "ihi")
    def q = pts.join(ivs, col("ptype") === col("wtype") &&
      col("p") >= col("ilo") && col("p") <= col("ihi"))
    val plain = q.collect().map(_.toSeq).toSet
    assert(plain.size == 300)
    s.conf.set("spark.graft.rangeJoin.rewrite", "true")
    s.conf.set("spark.graft.rangeJoin.keyedAuto", "true")
    s.conf.set("spark.graft.rangeJoin.keyedTargetRows", "100")
    s.conf.set("spark.graft.rangeJoin.numBucketWidth", "2.5")
    try {
      val p = q.queryExecution.executedPlan.toString
      assert(p.contains("__graft_range"),
        s"a 1-point x 300-interval key must route keyed (salt-cap " +
          s"pricing would have declined it):\n$p")
      assert(q.collect().map(_.toSeq).toSet == plain)
    } finally {
      s.conf.set("spark.graft.rangeJoin.rewrite", "false")
      s.conf.unset("spark.graft.rangeJoin.keyedAuto")
      s.conf.unset("spark.graft.rangeJoin.keyedTargetRows")
      s.conf.unset("spark.graft.rangeJoin.numBucketWidth")
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
