package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.functions.GraftExtensions
import graft.llm.Similarity

/** The opt-in cosine-threshold join rewrite: all-pairs plan becomes a
  * banded LSH candidate join + exact rescore. Checks plan shape (the
  * cartesian is gone), soundness (output ⊆ exact output, original
  * predicate holds), and recall on planted identical vectors (always 1.0 —
  * identical signatures share every band). */
class CosineJoinRewriteSpec extends AnyFunSuite {

  private def spark = SparkTestSession.withTables()

  private def sides(s: org.apache.spark.sql.SparkSession)
      : (DataFrame, DataFrame) = {
    val base = s.table("embeddings").filter(col("vec_id") < 60)
      .select(col("vec_id"), col("embedding"))
    // planted exact copies: cosine(copy, original) = 1.0
    val withCopies = base.unionAll(base.filter(col("vec_id") < 5)
      .select((col("vec_id") + 1000L).as("vec_id"), col("embedding")))
    (withCopies.select(col("vec_id").as("id_a"), col("embedding").as("emb_a")),
      base.select(col("vec_id").as("id_b"), col("embedding").as("emb_b")))
  }

  private def thresholdJoin(l: DataFrame, r: DataFrame): DataFrame =
    l.crossJoin(r).filter(
      Similarity.cosine(col("emb_a"), col("emb_b")) >= lit(0.95) &&
        col("id_a") =!= col("id_b"))

  private def pairs(df: DataFrame): Set[(Long, Long)] =
    df.select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("rewrite removes the cartesian, keeps exactness of emitted pairs") {
    val s = spark
    GraftExtensions.register(s)
    val (l, r) = sides(s)

    s.conf.set("spark.graft.cosineJoin.rewrite", "false")
    val exactDf = thresholdJoin(l, r)
    val exactPlan = exactDf.queryExecution.executedPlan.toString
    assert(exactPlan.contains("CartesianProduct")
      || exactPlan.contains("BroadcastNestedLoopJoin"))
    val exact = pairs(exactDf)

    s.conf.set("spark.graft.cosineJoin.rewrite", "true")
    try {
      val approxDf = thresholdJoin(l, r)
      val plan = approxDf.queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct")
        && !plan.contains("BroadcastNestedLoopJoin"),
        s"cartesian survived the rewrite:\n$plan")
      val approx = pairs(approxDf)
      // sound: every emitted pair truly passes the original predicate
      assert(approx.subsetOf(exact))
      // complete on planted identical vectors: all bands agree
      (0L until 5L).foreach { id =>
        assert(approx.contains((id + 1000L, id)),
          s"planted copy pair ($id) missed")
      }
    } finally s.conf.set("spark.graft.cosineJoin.rewrite", "false")
  }

  test("extra conjuncts are preserved by the rescore filter") {
    val s = spark
    GraftExtensions.register(s)
    val (l, r) = sides(s)
    s.conf.set("spark.graft.cosineJoin.rewrite", "true")
    try {
      val out = l.crossJoin(r).filter(
        Similarity.cosine(col("emb_a"), col("emb_b")) >= lit(0.95) &&
          col("id_a") >= 1000L && col("id_b") % 2 === 0)
      val got = pairs(out)
      assert(got.nonEmpty)
      assert(got.forall { case (a, b) => a >= 1000L && b % 2 == 0 })
    } finally s.conf.set("spark.graft.cosineJoin.rewrite", "false")
  }

  test("non-positive thresholds and unrelated joins are left alone") {
    val s = spark
    GraftExtensions.register(s)
    s.conf.set("spark.graft.cosineJoin.rewrite", "true")
    try {
      val (l, r) = sides(s)
      // threshold <= 0 would need near-total recall — not rewritten
      val neg = l.crossJoin(r).filter(
        Similarity.cosine(col("emb_a"), col("emb_b")) >= lit(-0.5))
      val negPlan = neg.queryExecution.executedPlan.toString
      assert(negPlan.contains("CartesianProduct")
        || negPlan.contains("BroadcastNestedLoopJoin"))
      // ordinary equi-joins don't change
      val orders = s.table("orders").limit(100)
      val cust = s.table("customer")
      val j = orders.join(cust, col("o_custkey") === col("c_custkey"))
      assert(j.count() > 0)
    } finally s.conf.set("spark.graft.cosineJoin.rewrite", "false")
  }

  test("joins already connected by an equality are never rewritten") {
    val s = spark
    GraftExtensions.register(s)
    val (l, r) = sides(s)
    s.conf.set("spark.graft.cosineJoin.rewrite", "true")
    try {
      // id_a === id_b + 1000 is an equi-connector: the planner runs this
      // without a cartesian, and an LSH rewrite could only LOSE rows
      val j = l.join(r, col("id_a") === col("id_b") + 1000L &&
        Similarity.cosine(col("emb_a"), col("emb_b")) >= lit(0.95))
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("__graft_band"), plan)
      // the 5 planted copies (id + 1000, identical embedding) all survive
      assert(j.count() == 5)
    } finally s.conf.set("spark.graft.cosineJoin.rewrite", "false")
  }

  test("invalid planes/bands config skips the rewrite instead of degenerating") {
    val s = spark
    GraftExtensions.register(s)
    val (l, r) = sides(s)
    s.conf.set("spark.graft.cosineJoin.rewrite", "true")
    s.conf.set("spark.graft.cosineJoin.planes", "3") // < bands (4)
    try {
      val plan = thresholdJoin(l, r).queryExecution.executedPlan.toString
      assert(!plan.contains("__graft_band"), plan)
    } finally {
      s.conf.set("spark.graft.cosineJoin.rewrite", "false")
      s.conf.set("spark.graft.cosineJoin.planes", "16")
    }
  }

  test("NULL embeddings are dropped, not raised on") {
    val s = spark
    GraftExtensions.register(s)
    val (l, r) = sides(s)
    val withNull = l.unionAll(l.limit(1).select(col("id_a") + 5000L,
      org.apache.spark.sql.functions.lit(null)
        .cast("array<float>").as("emb_a")))
    s.conf.set("spark.graft.cosineJoin.rewrite", "true")
    try {
      // the original plan filters NULL-cosine rows; the rewrite must too
      val out = pairs(thresholdJoin(withNull, r))
      assert((0L until 5L).forall(id => out.contains((id + 1000L, id))))
      assert(out.forall(_._1 < 5000L))
    } finally s.conf.set("spark.graft.cosineJoin.rewrite", "false")
  }

  test("rounded-cosine and cosine-distance forms also trigger the rewrite") {
    val s = spark
    GraftExtensions.register(s)
    val (l, r) = sides(s)
    s.conf.set("spark.graft.cosineJoin.rewrite", "true")
    try {
      // round(cosine, 6) >= t — the form our own ranking code emits
      val rounded = l.crossJoin(r).filter(
        round(Similarity.cosine(col("emb_a"), col("emb_b")), 6) >= lit(0.95))
      val pRounded = rounded.queryExecution.executedPlan.toString
      assert(!pRounded.contains("CartesianProduct")
        && !pRounded.contains("BroadcastNestedLoopJoin"), pRounded)
      assert((0L until 5L).forall(id => pairs(rounded).contains((id + 1000L, id))))
      // 1 - cosine <= d (cosine distance)
      val dist = l.crossJoin(r).filter(
        (lit(1.0) - Similarity.cosine(col("emb_a"), col("emb_b"))) <= lit(0.05))
      val pDist = dist.queryExecution.executedPlan.toString
      assert(!pDist.contains("CartesianProduct")
        && !pDist.contains("BroadcastNestedLoopJoin"), pDist)
      assert((0L until 5L).forall(id => pairs(dist).contains((id + 1000L, id))))
      // distance bound >= 1 means similarity bound <= 0: NOT rewritten
      val loose = l.crossJoin(r).filter(
        (lit(1.0) - Similarity.cosine(col("emb_a"), col("emb_b"))) <= lit(1.5))
      val pLoose = loose.queryExecution.executedPlan.toString
      assert(pLoose.contains("CartesianProduct")
        || pLoose.contains("BroadcastNestedLoopJoin"), pLoose)
    } finally s.conf.set("spark.graft.cosineJoin.rewrite", "false")
  }

  test("SQL cosine_sim form triggers the same rewrite") {
    val s = spark
    GraftExtensions.register(s)
    val (l, r) = sides(s)
    l.createOrReplaceTempView("emb_l")
    r.createOrReplaceTempView("emb_r")
    s.conf.set("spark.graft.cosineJoin.rewrite", "true")
    try {
      val df = s.sql(
        """SELECT id_a, id_b FROM emb_l CROSS JOIN emb_r
          |WHERE cosine_sim(emb_a, emb_b) >= 0.95 AND id_a >= 1000""".stripMargin)
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct")
        && !plan.contains("BroadcastNestedLoopJoin"), plan)
      val got = df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert((0L until 5L).forall(id => got.contains((id + 1000L, id))))
    } finally s.conf.set("spark.graft.cosineJoin.rewrite", "false")
  }
}
