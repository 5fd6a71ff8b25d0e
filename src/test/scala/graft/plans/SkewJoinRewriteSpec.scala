package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.functions.GraftExtensions

/** The conf-gated automatic skew-join rewrite: an inner equi-join whose
  * key counts trip the salting threshold is swapped for the salted
  * decomposition at plan time — result-identical, no cartesian, and
  * inert for joins that don't need (or can't use) the treatment. */
class SkewJoinRewriteSpec extends AnyFunSuite {

  private def spark = SparkTestSession.withTables()

  /** Left side with a planted hot key 0 (half the rows) over 50 cold
    * keys; right side one row per key. */
  private def sides(s: SparkSession): (DataFrame, DataFrame) = {
    val left = s.range(0, 2000).select(
      col("id").as("lid"),
      when(col("id") % 2 === 0, 0L).otherwise(col("id") % 50 + 1).as("k"),
      (col("id") * 2).as("lv"))
    val right = s.range(0, 51).select(
      col("id").as("k"), (col("id") + 100).as("rv"))
    (left, right)
  }

  private def rows(df: DataFrame): Set[(Long, Long, Long, Long)] =
    df.select("lid", "k", "lv", "rv").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet

  private def withRewrite[T](s: SparkSession, targetRows: Long = 100L)
      (body: => T): T = {
    GraftExtensions.register(s)
    val prevBcast = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
    s.conf.set("spark.graft.skewJoin.rewrite", "true")
    s.conf.set("spark.graft.skewJoin.targetRows", targetRows.toString)
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try body
    finally {
      s.conf.set("spark.graft.skewJoin.rewrite", "false")
      s.conf.set("spark.graft.skewJoin.targetRows", "5000000")
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBcast)
    }
  }

  test("hot-key join is rewritten to the salted shape and stays " +
    "result-identical to the plain join") {
    val s = spark
    val (l, r) = sides(s)
    val plain = rows(l.join(r, Seq("k")))
    withRewrite(s) {
      val j = l.join(r, Seq("k"))
      val p = j.queryExecution.executedPlan.toString
      assert(p.contains("__graft_skew"), s"rewrite did not fire:\n$p")
      assert(!p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoopJoin"),
        s"rewrite must not degenerate:\n$p")
      assert(p.contains("Union"), s"cold + hot paths must union:\n$p")
      assert(rows(j) == plain)
    }
  }

  test("explicit-condition form (both key attributes in the output) is " +
    "also rewritten and restores the right key attribute") {
    val s = spark
    val (l, r0) = sides(s)
    val r = r0.withColumnRenamed("k", "rk")
    def q = l.join(r, col("k") === col("rk"))
      .select("lid", "k", "rk", "lv", "rv")
    val plain = q.collect().map(_.toSeq).toSet
    withRewrite(s) {
      val p = q.queryExecution.executedPlan.toString
      assert(p.contains("__graft_skew"), s"rewrite did not fire:\n$p")
      val got = q.collect().map(_.toSeq).toSet
      assert(got == plain)
      // the restored right key equals the left key on every row
      assert(q.filter(col("k") =!= col("rk")).count() == 0)
    }
  }

  test("no hot keys -> join left untouched") {
    val s = spark
    val (_, r) = sides(s)
    val flat = s.range(0, 500).select(
      col("id").as("lid"), (col("id") % 50).as("k"), col("id").as("lv"))
    withRewrite(s, targetRows = 1000L) {
      val p = flat.join(r, Seq("k")).queryExecution.executedPlan.toString
      assert(!p.contains("__graft_skew"),
        s"a flat join must not be salted:\n$p")
    }
  }

  test("disabled conf leaves everything alone") {
    val s = spark
    GraftExtensions.register(s)
    s.conf.set("spark.graft.skewJoin.rewrite", "false")
    val (l, r) = sides(s)
    val p = l.join(r, Seq("k")).queryExecution.executedPlan.toString
    assert(!p.contains("__graft_skew"))
  }

  test("a broadcastable side vetoes the rewrite (no shuffle on the key " +
    "means no skew to treat)") {
    val s = spark
    GraftExtensions.register(s)
    val (l, r) = sides(s)
    s.conf.set("spark.graft.skewJoin.rewrite", "true")
    s.conf.set("spark.graft.skewJoin.targetRows", "100")
    // default autoBroadcastJoinThreshold (10MB) — the tiny right side
    // broadcasts, so the rule must decline
    try {
      val p = l.join(r, Seq("k")).queryExecution.executedPlan.toString
      assert(!p.contains("__graft_skew"),
        s"rule must decline a broadcastable join:\n$p")
      assert(p.contains("BroadcastHashJoin"), p)
    } finally {
      s.conf.set("spark.graft.skewJoin.rewrite", "false")
      s.conf.set("spark.graft.skewJoin.targetRows", "5000000")
    }
  }

  test("a multi-equality join whose composite TUPLE does not skew is " +
    "left alone (tuple counts, not single-column counts, decide)") {
    val s = spark
    val (l, r0) = sides(s)
    val r = r0.withColumnRenamed("k", "rk").withColumn("rv2", col("rv"))
    withRewrite(s) {
      // k alone is hot, but every (k, lv) tuple is unique — the
      // composite diagnosis must find nothing to salt
      val multi = l.join(r,
        col("k") === col("rk") && col("lv") === col("rv2"))
      assert(!multi.queryExecution.executedPlan.toString
        .contains("__graft_skew"))
      // non-equality conjuncts still decline outright
      val theta = l.join(r,
        col("k") === col("rk") && col("lv") > col("rv2"))
      assert(!theta.queryExecution.executedPlan.toString
        .contains("__graft_skew"))
    }
  }

  /** Composite-key fixture: hot TUPLE (0, 7) planted on half the left
    * rows; right side one row per (key, day) tuple, missing day 3. */
  private def multiSides(s: SparkSession): (DataFrame, DataFrame) = {
    val left = s.range(0, 2000).select(
      col("id").as("lid"),
      when(col("id") % 2 === 0, 0L).otherwise(col("id") % 50 + 1).as("k"),
      when(col("id") % 2 === 0, 7L).otherwise(col("id") % 5).as("day"),
      (col("id") * 2).as("lv"))
    // one row per (k, day) tuple, day 3 missing — built without a
    // crossJoin so the fixture's own plan stays BNLJ-free (the tests
    // assert no BroadcastNestedLoopJoin anywhere in the plan string)
    val right = s.range(0, 51 * 8).select(
      expr("id div 8").as("k"), (col("id") % 8).as("day"))
      .filter(col("day") =!= 3)
      .withColumn("rv", col("k") * 100 + col("day"))
    (left, right)
  }

  test("COMPOSITE-key (multi-equality) join rewrites when the tuple " +
    "skews and stays result-identical, partial-NULL key components " +
    "riding the cold path (r16 verdict task 3)") {
    val s = spark
    val (l0, r) = multiSides(s)
    // plant NULLs into one key component: AND-equality matches nothing
    val l = l0.select(col("lid"), col("k"),
      when(col("lid") % 13 === 0, lit(null).cast("bigint"))
        .otherwise(col("day")).as("day"), col("lv"))
    def inner = l.join(r, Seq("k", "day"))
      .select("lid", "k", "day", "lv", "rv")
    def outer = l.join(r, Seq("k", "day"), "left")
      .select("lid", "k", "day", "lv", "rv")
    def anti = l.join(r, Seq("k", "day"), "left_anti")
    val plainInner = inner.collect().map(_.toSeq).toSet
    val plainOuter = outer.collect().map(_.toSeq).toSet
    val plainAnti = anti.collect().map(_.toSeq).toSet
    assert(plainOuter.exists(_(4) == null),
      "fixture must exercise null-fills (day 3 missing on the right)")
    withRewrite(s) {
      for ((q, plain, label) <- Seq(
          (inner, plainInner, "inner"), (outer, plainOuter, "outer"),
          (anti, plainAnti, "anti"))) {
        val p = q.queryExecution.executedPlan.toString
        assert(p.contains("__graft_skew"),
          s"composite $label rewrite did not fire:\n$p")
        assert(!p.contains("CartesianProduct") &&
          !p.contains("BroadcastNestedLoopJoin"), p)
        assert(q.collect().map(_.toSeq).toSet == plain,
          s"composite $label identity broke")
      }
      // NULL-component rows: vanish under inner, null-fill under outer,
      // stay under anti — the plain AND-equality semantics
      assert(inner.filter(col("day").isNull).count() == 0)
      assert(outer.filter(col("day").isNull && col("rv").isNotNull)
        .count() == 0)
      assert(anti.filter(col("day").isNull).count() ==
        l.filter(col("day").isNull).count())
    }
  }

  test("FULL OUTER rewrites BY COMPOSITION (left-outer leg ∪ flipped " +
    "anti leg) and stays result-identical: null-fills on both sides, " +
    "right-only keys, and NULL keys on both sides all survive " +
    "(r16 verdict task 2)") {
    val s = spark
    val (l0, r0) = outerSides(s)
    // widen the right to 0..80 by 4s: keys 52..80 are RIGHT-ONLY and
    // must come back null-filled on the left through the anti leg
    val r1 = s.range(0, 81).filter(col("id") % 4 === 0).select(
      col("id").as("rk"), (col("id") + 100).as("rv"))
    // NULL keys on BOTH sides: each must survive null-filled once
    val l = l0.select(col("lid"),
      when(col("lid") % 7 === 0, lit(null).cast("bigint"))
        .otherwise(col("k")).as("k"), col("lv"))
    val r = r1.select(
      when(col("rk") === 80L, lit(null).cast("bigint"))
        .otherwise(col("rk")).as("rk"), col("rv"))
    def q = l.join(r, col("k") === col("rk"), "full")
      .select("lid", "k", "rk", "lv", "rv")
    val plain = q.collect().map(_.toSeq).toSet
    assert(plain.exists(t => t(0) == null) &&
      plain.exists(t => t(4) == null),
      "fixture must exercise null-fills on BOTH sides")
    withRewrite(s) {
      val p = q.queryExecution.executedPlan.toString
      assert(p.contains("__graft_skew"),
        s"full-outer composition did not fire:\n$p")
      assert(!p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoopJoin"), p)
      assert(q.collect().map(_.toSeq).toSet == plain,
        "full-outer composition identity broke")
      // Set comparison is blind to duplicate emission — the exact
      // failure mode (once-per-replica null-fills) the composition
      // exists to avoid; the count pins the multiset
      assert(q.count() == plain.size,
        "composition must emit each row exactly once")
      // right-only keys ride the anti leg, null-filled on the left
      assert(q.filter(col("rk") > 50L && col("lid").isNotNull)
        .count() == 0)
      assert(q.filter(col("rk") > 50L).count() ==
        r.filter(col("rk") > 50L).count())
      // NULL keys: every left NULL-key row and every right NULL-key row
      // appears exactly once, unmatched
      assert(q.filter(col("k").isNull && col("lid").isNotNull).count() ==
        l.filter(col("k").isNull).count())
      assert(q.filter(col("rk").isNull && col("rv").isNotNull).count() ==
        r.filter(col("rk").isNull).count())
    }
  }

  test("FULL OUTER with only ONE tripped leg still composes and stays " +
    "identical (the untripped leg runs plain inside the union)") {
    val s = spark
    // hot pile on the LEFT only; the right is flat, so the anti leg's
    // diagnosis finds nothing — it must run as the plain anti
    val (l, r0) = outerSides(s)
    val r = r0 // one row per key, no right pile
    def q = l.join(r, col("k") === col("rk"), "full")
      .select("lid", "k", "rk", "lv", "rv")
    val plain = q.collect().map(_.toSeq).toSet
    withRewrite(s) {
      val p = q.queryExecution.executedPlan.toString
      assert(p.contains("__graft_skew"), s"composition did not fire:\n$p")
      assert(q.collect().map(_.toSeq).toSet == plain)
      assert(q.count() == plain.size,
        "composition must emit each row exactly once")
    }
  }

  /** Right side MISSING some keys: left keys are the even 0..50 (odd id
    * → odd id%50 → even id%50+1), the right holds only multiples of 4,
    * so keys ≡ 2 (mod 4) null-fill — while hot key 0 still salts. */
  private def outerSides(s: SparkSession): (DataFrame, DataFrame) = {
    val left = s.range(0, 2000).select(
      col("id").as("lid"),
      when(col("id") % 2 === 0, 0L).otherwise(col("id") % 50 + 1).as("k"),
      (col("id") * 2).as("lv"))
    val right = s.range(0, 51).filter(col("id") % 4 === 0).select(
      col("id").as("rk"), (col("id") + 100).as("rv"))
    (left, right)
  }

  test("LEFT OUTER hot-key join is rewritten, stays result-identical, " +
    "and null-fills the right side (key included) on unmatched rows") {
    val s = spark
    val (l, r) = outerSides(s)
    def q = l.join(r, col("k") === col("rk"), "left")
      .select("lid", "k", "rk", "lv", "rv")
    val plain = q.collect().map(_.toSeq).toSet
    assert(plain.exists(_(2) == null),
      "fixture must exercise null-fills in the plain join")
    withRewrite(s) {
      val p = q.queryExecution.executedPlan.toString
      assert(p.contains("__graft_skew"),
        s"left-outer rewrite did not fire:\n$p")
      assert(!p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoopJoin"), p)
      val got = q.collect().map(_.toSeq).toSet
      assert(got == plain)
      // keys ≡ 2 (mod 4) are missing on the right: the restored rk
      // must be genuinely NULL there, never the resurrected left key
      assert(q.filter(col("k") % 4 === 2 && col("rk").isNotNull)
        .count() == 0)
      assert(q.filter(col("rk").isNull).count() > 0)
    }
  }

  test("LEFT OUTER with NULL left keys: null-filled exactly once, like " +
    "the plain left join") {
    val s = spark
    val (l0, r) = outerSides(s)
    val l = l0.select(col("lid"),
      when(col("lid") % 7 === 0, lit(null).cast("bigint"))
        .otherwise(col("k")).as("k"), col("lv"))
    def q = l.join(r, col("k") === col("rk"), "left")
    val plain = q.collect().map(_.toSeq).toSet
    withRewrite(s) {
      val p = q.queryExecution.executedPlan.toString
      assert(p.contains("__graft_skew"), s"rewrite did not fire:\n$p")
      assert(q.collect().map(_.toSeq).toSet == plain)
    }
  }

  test("RIGHT OUTER rewrites via the side flip (the preserved side is " +
    "the salted side) and stays result-identical") {
    val s = spark
    val (preserved, other) = outerSides(s)
    // preserved (hot) side on the RIGHT of a right-outer join
    def q = other.join(preserved, col("k") === col("rk"), "right")
      .select("lid", "k", "rk", "lv", "rv")
    val plain = q.collect().map(_.toSeq).toSet
    withRewrite(s) {
      val p = q.queryExecution.executedPlan.toString
      assert(p.contains("__graft_skew"),
        s"right-outer rewrite did not fire:\n$p")
      val got = q.collect().map(_.toSeq).toSet
      assert(got == plain)
      assert(q.filter(col("rk").isNull).count() > 0,
        "unmatched preserved rows must survive with a null-filled left")
    }
  }

  test("LEFT SEMI and LEFT ANTI rewrite and stay result-identical: the " +
    "replication puts a hot key's right rows in every salt bucket, so " +
    "each left row's existence test equals the plain join's") {
    val s = spark
    val (l, r) = outerSides(s)
    def semi = l.join(r, col("k") === col("rk"), "left_semi")
      .select("lid", "k", "lv")
    def anti = l.join(r, col("k") === col("rk"), "left_anti")
      .select("lid", "k", "lv")
    val plainSemi = semi.collect().map(_.toSeq).toSet
    val plainAnti = anti.collect().map(_.toSeq).toSet
    assert(plainSemi.nonEmpty && plainAnti.nonEmpty,
      "fixture must exercise both matched and unmatched keys")
    withRewrite(s) {
      val ps = semi.queryExecution.executedPlan.toString
      assert(ps.contains("__graft_skew"),
        s"semi rewrite did not fire:\n$ps")
      assert(semi.collect().map(_.toSeq).toSet == plainSemi)
      val pa = anti.queryExecution.executedPlan.toString
      assert(pa.contains("__graft_skew"),
        s"anti rewrite did not fire:\n$pa")
      assert(anti.collect().map(_.toSeq).toSet == plainAnti)
    }
  }

  test("LEFT ANTI with NULL left keys KEEPS them (a NULL key matches " +
    "nothing), semi drops them — the plain joins' semantics") {
    val s = spark
    val (l0, r) = outerSides(s)
    val l = l0.select(col("lid"),
      when(col("lid") % 7 === 0, lit(null).cast("bigint"))
        .otherwise(col("k")).as("k"), col("lv"))
    def semi = l.join(r, col("k") === col("rk"), "left_semi")
    def anti = l.join(r, col("k") === col("rk"), "left_anti")
    val plainSemi = semi.collect().map(_.toSeq).toSet
    val plainAnti = anti.collect().map(_.toSeq).toSet
    withRewrite(s) {
      // the rewrite must actually fire here, or the equalities below
      // pass vacuously against plain joins
      assert(semi.queryExecution.executedPlan.toString
        .contains("__graft_skew"))
      assert(anti.queryExecution.executedPlan.toString
        .contains("__graft_skew"))
      assert(semi.collect().map(_.toSeq).toSet == plainSemi)
      assert(anti.collect().map(_.toSeq).toSet == plainAnti)
      assert(anti.filter(col("k").isNull).count() ==
        l.filter(col("k").isNull).count())
    }
  }

  test("preserved-side pricing: a hot probe key MISSING from the right " +
    "(out_rows 0 — the not-in-the-blocklist shape) still salts for " +
    "outer/anti, and the results stay identical") {
    val s = spark
    val (l, r0) = outerSides(s)
    // drop the hot key 0 from the right entirely: inner pricing would
    // compute out_rows = n_left x 0 = 0 and never treat it
    val r = r0.filter(col("rk") =!= 0L)
    def outer = l.join(r, col("k") === col("rk"), "left")
      .select("lid", "k", "rk", "lv", "rv")
    def anti = l.join(r, col("k") === col("rk"), "left_anti")
    val plainOuter = outer.collect().map(_.toSeq).toSet
    val plainAnti = anti.collect().map(_.toSeq).toSet
    withRewrite(s) {
      val po = outer.queryExecution.executedPlan.toString
      assert(po.contains("__graft_skew"),
        s"hot-but-unmatched key must salt under preserved pricing:\n$po")
      assert(outer.collect().map(_.toSeq).toSet == plainOuter)
      val pa = anti.queryExecution.executedPlan.toString
      assert(pa.contains("__graft_skew"), pa)
      assert(anti.collect().map(_.toSeq).toSet == plainAnti)
      // every hot-key row survives the anti (its key is not blocked)
      assert(anti.filter(col("k") === 0L).count() ==
        l.filter(col("k") === 0L).count())
    }
  }

  test("outer broadcast veto is build-side-aware: a small PRESERVED " +
    "side does not veto (Spark cannot broadcast it), a small " +
    "non-preserved side does") {
    val s = spark
    GraftExtensions.register(s)
    val (l, r) = outerSides(s)
    s.conf.set("spark.graft.skewJoin.rewrite", "true")
    s.conf.set("spark.graft.skewJoin.targetRows", "100")
    // default broadcast threshold: the small right side builds, decline
    try {
      val p = l.join(r, col("k") === col("rk"), "left")
        .queryExecution.executedPlan.toString
      assert(!p.contains("__graft_skew"),
        s"small non-preserved side must veto the left-outer rewrite:\n$p")
      assert(p.contains("BroadcastHashJoin"), p)
    } finally {
      s.conf.set("spark.graft.skewJoin.rewrite", "false")
      s.conf.set("spark.graft.skewJoin.targetRows", "5000000")
    }
  }

  test("same-named payload columns on both sides survive the internal " +
    "renaming") {
    val s = spark
    val l = s.range(0, 1000).select(
      col("id").as("lid"),
      when(col("id") % 2 === 0, 0L).otherwise(col("id") % 20 + 1).as("k"),
      col("id").as("v"))
    val r = s.range(0, 21).select(col("id").as("k"), (col("id") * 10).as("v"))
    def q = l.join(r, Seq("k")).select(col("lid"), col("k"),
      l("v").as("lv"), r("v").as("rv"))
    val plain = q.collect().map(_.toSeq).toSet
    withRewrite(s) {
      val p = q.queryExecution.executedPlan.toString
      assert(p.contains("__graft_skew"), s"rewrite did not fire:\n$p")
      assert(q.collect().map(_.toSeq).toSet == plain)
    }
  }

  test("SQL join syntax is rewritten identically to the DataFrame form") {
    val s = spark
    val (l, r) = sides(s)
    l.createOrReplaceTempView("sj_left")
    r.createOrReplaceTempView("sj_right")
    def q = s.sql(
      """SELECT l.lid, l.k, l.lv, r.rv
        |FROM sj_left l JOIN sj_right r ON l.k = r.k""".stripMargin)
    val plain = q.collect().map(_.toSeq).toSet
    withRewrite(s) {
      val p = q.queryExecution.executedPlan.toString
      assert(p.contains("__graft_skew"), s"SQL join must rewrite too:\n$p")
      assert(q.collect().map(_.toSeq).toSet == plain)
    }
  }

  test("sampleRate < 1: the deterministic hash-sampled diagnosis still " +
    "finds the planted hot key, the rewrite fires, and the result " +
    "stays identical (r16 verdict task 1 — identity is untouched by " +
    "the diagnosis mode)") {
    val s = spark
    val (l, r) = sides(s)
    val plain = rows(l.join(r, Seq("k")))
    val plainOuter = l.join(r, Seq("k"), "left").collect()
      .map(_.toSeq).toSet
    withRewrite(s) {
      s.conf.set("spark.graft.skewJoin.sampleRate", "0.05")
      try {
        val j = l.join(r, Seq("k"))
        val p = j.queryExecution.executedPlan.toString
        assert(p.contains("__graft_skew"),
          s"sampled diagnosis missed the planted hot key:\n$p")
        assert(rows(j) == plain, "identity must hold under sampling")
        val o = l.join(r, Seq("k"), "left")
        assert(o.queryExecution.executedPlan.toString
          .contains("__graft_skew"))
        assert(o.collect().map(_.toSeq).toSet == plainOuter)
      } finally s.conf.unset("spark.graft.skewJoin.sampleRate")
    }
  }

  test("the diagnosis runs ONCE per join shape (cached); " +
    "rediagnose=true bypasses the cache READ and re-runs it") {
    val s = spark
    val counter = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        counter.incrementAndGet(); ()
      }
    }
    // count the Spark jobs launched while materializing the OPTIMIZED
    // plan only (never executing the query): the diagnosis collect is
    // the only job source at plan time. The listener bus is async, so
    // quiesce (no new events for 500ms) before reading the counter.
    def planJobs(body: => Unit): Int = {
      val before = counter.get
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
      counter.get - before
    }
    val (l, r) = sides(s)
    s.sparkContext.addSparkListener(listener)
    try {
      // targetRows 101 keeps this test's cache keys disjoint from every
      // other test in the (session-shared) rule instance's cache
      withRewrite(s, targetRows = 101L) {
        // a cache HIT still pays exactly one trivial job: the salted
        // subtree's ≤topN-row local plan collect (1-partition driver
        // RDD — no table is scanned). The DIAGNOSIS is the multi-job
        // count-table pass; distinguish the two by the job count.
        def plan() = l.join(r, Seq("k")).queryExecution.executedPlan
        val first = planJobs { plan() }
        assert(first > 1, s"the first optimization must run the " +
          s"diagnosis (count-table jobs), ran $first")
        val second = planJobs { plan() }
        assert(second <= 1,
          s"the cached decision must skip the diagnosis, ran $second jobs")
        s.conf.set("spark.graft.skewJoin.rediagnose", "true")
        try {
          val third = planJobs { plan() }
          assert(third > 1,
            "rediagnose=true must bypass the cache read and re-diagnose")
        } finally s.conf.unset("spark.graft.skewJoin.rediagnose")
        // the rediagnose run re-cached: back to diagnosis-free plans
        val fourth = planJobs { plan() }
        assert(fourth <= 1,
          s"the re-cached decision must be honored again, ran $fourth jobs")
      }
    } finally s.sparkContext.removeSparkListener(listener)
  }

  test("NULL join keys vanish in both paths (inner-join semantics)") {
    val s = spark
    val (l0, r) = sides(s)
    val l = l0.select(col("lid"),
      when(col("lid") % 7 === 0, lit(null).cast("bigint"))
        .otherwise(col("k")).as("k"), col("lv"))
    val plain = rows(l.join(r, Seq("k")))
    withRewrite(s) {
      assert(rows(l.join(r, Seq("k"))) == plain)
    }
  }
}
