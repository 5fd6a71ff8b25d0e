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

  test("multi-equality and FULL OUTER joins are left alone (full outer: " +
    "the replicated side would null-fill once per salt replica)") {
    val s = spark
    val (l, r0) = sides(s)
    val r = r0.withColumnRenamed("k", "rk").withColumn("rv2", col("rv"))
    withRewrite(s) {
      val multi = l.join(r,
        col("k") === col("rk") && col("lv") === col("rv2"))
      assert(!multi.queryExecution.executedPlan.toString
        .contains("__graft_skew"))
      val fouter = l.join(r, col("k") === col("rk"), "full")
      assert(!fouter.queryExecution.executedPlan.toString
        .contains("__graft_skew"),
        "full outer has no sound salted decomposition — must decline")
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
