package graft.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Relevance scoring (TF-IDF / BM25) and corpus sampling operators:
  * semantic invariants plus equivalence of the scale-shaped
  * implementations against naive single-window formulations. */
class RelevanceSamplingSpec extends AnyFunSuite {

  private def spark = SparkTestSession.withTables()

  // --- Relevance ---------------------------------------------------------

  test("tfidf: corpus-wide terms score zero, rare terms dominate") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "common rare1 common common"),
      (2L, "common unique2 common"),
      (3L, "common common common")).toDF("doc_id", "text")
    val top = Relevance.tfidfTopTerms(docs, topN = 2).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(3), r.getInt(4)))
    // 'common' appears in every doc => idf = ln(1) = 0
    assert(top.filter(_._2 == "common").forall(_._3 == 0.0))
    // each doc's rank-1 term is its distinctive one (docs 1, 2)
    assert(top.find(t => t._1 == 1L && t._4 == 1).get._2 == "rare1")
    assert(top.find(t => t._1 == 2L && t._4 == 1).get._2 == "unique2")
  }

  test("tfidf: rank is dense per doc and bounded by topN") {
    val s = spark
    val top = Relevance.tfidfTopTerms(
      s.table("documents").limit(50), topN = 3)
    val byDoc = top.groupBy("doc_id")
      .agg(count(lit(1)).as("n"), max("rank").as("mx"), min("rank").as("mn"))
      .collect()
    assert(byDoc.nonEmpty)
    assert(byDoc.forall(r => r.getLong(1) <= 3 && r.getInt(3) == 1 &&
      r.getInt(2) == r.getLong(1)))
  }

  test("bm25: a doc saturated with the query term outranks a diluted one") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "spark spark spark spark"),
      (2L, "spark pad pad pad pad pad pad pad pad pad pad pad pad pad pad"),
      (3L, "pad pad pad")).toDF("doc_id", "text")
    val r = Relevance.bm25TopDocs(docs, Seq("spark"), topN = 10).collect()
    assert(r.map(_.getLong(0)).toSeq == Seq(1L, 2L)) // doc 3 never matches
    assert(r(0).getDouble(1) > r(1).getDouble(1))
  }

  test("bm25: matched-doc set equals docs containing any query term") {
    val s = spark
    val docs = s.table("documents").limit(100)
    val terms = Seq("spark", "vector")
    val scored = Relevance.bm25TopDocs(docs, terms, topN = 1000)
    val expected = docs
      .filter(terms.map(t => col("text").contains(t)).reduce(_ || _))
    // containment check is a superset test ('sparky' would contain 'spark'
    // but not tokenize to it), so assert scored ⊆ contains and both nonempty
    val scoredIds = scored.select("doc_id").collect().map(_.getLong(0)).toSet
    val containIds = expected.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(scoredIds.nonEmpty)
    assert(scoredIds.subsetOf(containIds))
  }

  test("pmi: always-together pair scores ln(N/n), independent pair " +
    "scores ~0, floor excludes rare pairs") {
    val s = spark
    import s.implicits._
    // a+b always co-occur (2 of 4 docs); c appears everywhere (so any
    // pair with c has pmi ln(N*n_xc/(n_x*N)) ... c-with-a: n=2,
    // n_a=2, n_c=4, N=4 -> ln(2*4/(2*4)) = 0; rare r appears once
    val docs = Seq(
      (1L, "a b c"), (2L, "a b c"), (3L, "c d r"), (4L, "c d")).toDF(
      "doc_id", "text")
    val out = Relevance.pmiPairs(docs, topN = 10, minPairDocs = 2,
      maxVocab = 100).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2),
        r.getDouble(5))).toSeq
    val byPair = out.map(t => t._1 -> t._3).toMap
    // (a,b): n_pair=2, n_a=2, n_b=2, N=4 -> ln(2*4/4) = ln 2
    assert(math.abs(byPair(("a", "b")) - math.log(2.0)) < 1e-6)
    // (a,c): ln(2*4/(2*4)) = 0
    assert(byPair(("a", "c")) == 0.0)
    // the floor drops every pair containing the single-doc term r
    assert(!out.exists(t => t._1._1 == "r" || t._1._2 == "r"))
    // ordering: pmi descending with (term_a, term_b) tie-break
    val pmis = out.map(_._3)
    assert(pmis == pmis.sorted.reverse)
  }

  test("pmi: the vocabulary cap bounds pair generation and keeps the " +
    "highest-DF terms") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "big big x1"), (2L, "big small x2"), (3L, "big small x3"),
      (4L, "big small x4"), (5L, "big small x5")).toDF("doc_id", "text")
    // cap 2 keeps {big, small} (DF 5 and 4); every xN pair is excluded
    val out = Relevance.pmiPairs(docs, topN = 10, minPairDocs = 2,
      maxVocab = 2).collect()
    assert(out.map(r => (r.getString(0), r.getString(1))).toSeq ==
      Seq(("big", "small")))
  }

  // --- Sampling ----------------------------------------------------------

  test("corpusShuffle: positions are an exact permutation and match the " +
    "naive global-window order") {
    val s = spark
    val docs = s.table("documents").select("doc_id", "text")
    val shuffled = Sampling.corpusShuffle(docs, nShards = 8, parallelism = 5)
    val rows = shuffled.collect()
    val n = rows.length
    assert(rows.map(_.getLong(1)).sorted.toSeq == (1L to n).toSeq,
      "positions must be exactly 1..n")
    // equivalence with the naive single-window formulation
    val naive = docs
      .select(col("doc_id"), md5(col("doc_id").cast("string")).as("_k"))
      .withColumn("position", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy("_k", "doc_id")))
      .select("doc_id", "position").collect()
      .map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    assert(rows.forall(r => naive(r.getLong(0)) == r.getLong(1)))
    // shard is round-robin on position
    assert(rows.forall(r => r.getLong(2) == (r.getLong(1) - 1) % 8))
  }

  test("hashSample: deterministic, join-consistent, near-target rate") {
    val s = spark
    val docs = s.table("documents").select("doc_id", "source")
    val s1 = Sampling.hashSample(docs, 20).collect().map(_.getLong(0)).toSet
    val s2 = Sampling.hashSample(docs, 20).collect().map(_.getLong(0)).toSet
    assert(s1 == s2, "same input must sample identically")
    val total = docs.count()
    assert(s1.size > total * 0.1 && s1.size < total * 0.3,
      s"20% sample wildly off: ${s1.size}/$total")
    // monotone: a 10% sample is a subset of the 20% sample (same buckets)
    val s10 = Sampling.hashSample(docs, 10).collect().map(_.getLong(0)).toSet
    assert(s10.subsetOf(s1))
  }

  test("stratifiedHashSample: per-domain rates hold and samples nest") {
    val s = spark
    val docs = s.table("documents").select("doc_id", "source")
    val rate = expr("10 + (CAST(replace(source, 'src', '') AS INT) % 3) * 30")
    val got = Sampling.stratifiedHashSample(docs, rate)
    // every kept row respects its own rate
    assert(got.filter(col("bucket") >= col("keep_rate")).count() == 0)
    // a domain sampled at 70% keeps more than one at 10% (rates bind)
    val bySrc = got.groupBy("keep_rate").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(bySrc(70) > bySrc(10))
    // nesting: the flat 10% sample is a subset of every stratified keep
    // with rate >= 10 (same shared bucket)
    val flat10 = Sampling.hashSample(docs, 10).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val strat = got.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(flat10.subsetOf(strat))
  }

  test("domainMix: replication count matches the factor expression") {
    val s = spark
    val docs = s.table("documents").select("doc_id", "source")
    val mixed = Sampling.domainMix(
      docs, expr("1 + (CAST(replace(source, 'src', '') AS INT) % 3)"))
    val perDoc = mixed.groupBy("doc_id", "n_copies")
      .agg(count(lit(1)).as("n"), max("copy_idx").as("mx")).collect()
    assert(perDoc.nonEmpty)
    assert(perDoc.forall(r => r.getLong(2) == r.getInt(1).toLong &&
      r.getInt(3) == r.getInt(1)))
    // factors actually vary across sources (1..3)
    val factors = perDoc.map(_.getInt(1)).toSet
    assert(factors == Set(1, 2, 3))
  }

  test("quantileFilter: histogram method equals window percent_rank exactly") {
    val s = spark
    val docs = s.table("documents").select("doc_id", "n_chars")
    val got = Sampling.quantileFilter(docs, "n_chars", 0.25)
      .select("doc_id", "percent_rank").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val w = org.apache.spark.sql.expressions.Window.orderBy("n_chars")
    val naive = docs
      .withColumn("pr", round(percent_rank().over(w), 6))
      .filter(col("pr") >= 0.25)
      .select("doc_id", "pr").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got == naive)
    // roughly the top three quarters survive
    val total = docs.count()
    assert(got.size > total * 0.6 && got.size < total * 0.9)
  }

  test("quantileFilter: single-value column keeps everything at rank 0") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, 7), (2L, 7), (3L, 7)).toDF("doc_id", "v")
    val kept = Sampling.quantileFilter(docs, "v", 0.0).collect()
    assert(kept.length == 3)
  }

  test("domainMix: factor 0 or negative drops the doc, never duplicates it") {
    val s = spark
    import s.implicits._
    // sequence(1, 0) in Spark counts DOWN to [1, 0] — a zeroed-out domain
    // must produce no rows, not two
    val docs = Seq((1L, "keep2"), (2L, "drop0"), (3L, "dropneg"))
      .toDF("doc_id", "source")
    val mixed = Sampling.domainMix(docs,
      expr("CASE source WHEN 'keep2' THEN 2 WHEN 'drop0' THEN 0 ELSE -1 END"))
      .select("doc_id", "copy_idx").collect()
      .map(r => (r.getLong(0), r.getInt(1)))
    assert(mixed.toSet == Set((1L, 1), (1L, 2)))
  }

  test("percentRank preserves NULL-valued rows with a NULL rank") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, Some(10)), (2L, Some(20)), (3L, None), (4L, Some(30)))
      .toDF("doc_id", "v")
    val ranked = Sampling.percentRank(docs, "v")
      .select("doc_id", "percent_rank").collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    assert(ranked.size == 4, "every input row must survive")
    assert(ranked(3L).isEmpty, "NULL value must rank as NULL")
    // non-null ranks computed over the 3 comparable rows: 0, 0.5, 1
    assert(ranked(1L).contains(0.0) && ranked(2L).contains(0.5) &&
      ranked(4L).contains(1.0))
    // quantileFilter drops the NULL row (no rank to compare)
    assert(Sampling.quantileFilter(docs, "v", 0.0).count() == 3)
  }

  test("percentRank refuses a continuous column above the distinct cap") {
    val s = spark
    // 500 distinct doubles: would previously build a 500-row
    // single-partition prefix-sum window without complaint; at corpus
    // scale that silently becomes a row-count-sized window
    val docs = s.range(500).select(col("id").as("doc_id"),
      (col("id").cast("double") / 3.0).as("score"))
    val e = intercept[IllegalArgumentException](
      Sampling.percentRank(docs, "score", maxDistinctValues = 100)
        .count())
    assert(e.getMessage.contains("distinct values exceed"))
    // discretized, the same column ranks fine under the same cap
    val ok = Sampling.percentRank(
      docs.withColumn("score", round(col("score"), -1)), "score",
      maxDistinctValues = 100)
    assert(ok.count() == 500)
  }

  test("percentRankContinuous matches percentRank on a tie-free column " +
    "and handles cardinality the guard refuses") {
    val s = spark
    // 500 distinct doubles — above a cap of 100, so percentRank refuses it;
    // percentRankContinuous must rank it exactly (tie-free ⇒ the two
    // definitions coincide)
    val docs = s.range(500).select(col("id").as("doc_id"),
      (col("id").cast("double") / 3.0).as("score"))
    val cont = Sampling.percentRankContinuous(docs, "score", parallelism = 7)
      .select("doc_id", "percent_rank").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val exact = Sampling.percentRank(docs, "score")
      .select("doc_id", "percent_rank").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(cont.size == 500)
    cont.foreach { case (id, r) =>
      assert(math.abs(r - exact(id)) < 1e-6, s"doc $id: $r vs ${exact(id)}") }
    // NULL values survive with a NULL rank, mirroring percentRank
    import s.implicits._
    val withNull = Seq((1L, Some(10.0)), (2L, None), (3L, Some(30.0)))
      .toDF("doc_id", "score")
    val ranked = Sampling.percentRankContinuous(withNull, "score")
      .select("doc_id", "percent_rank").collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(ranked.size == 3 && ranked(2L).isEmpty)
    assert(ranked(1L).contains(0.0) && ranked(3L).contains(1.0))
  }

  test("domainCap keeps exactly the cap smallest ids per domain and " +
    "whole small domains") {
    val s = spark
    import s.implicits._
    // big: 100 docs, small: 3 docs, cap 5
    val docs = ((0L until 100L).map(i => (i, "big")) ++
      (200L until 203L).map(i => (i, "small"))).toDF("doc_id", "source")
    val out = Sampling.domainCap(docs, "source", cap = 5).collect()
      .map(r => (r.getString(1), r.getLong(0), r.getInt(2)))
    val big = out.filter(_._1 == "big").sortBy(_._3)
    assert(big.map(_._2).toSeq == (0L until 5L).toSeq,
      s"cap keeps the 5 smallest ids: ${big.toSeq}")
    assert(big.map(_._3).toSeq == (1 to 5).toSeq)
    val small = out.filter(_._1 == "small")
    assert(small.map(_._2).sorted.toSeq == (200L until 203L).toSeq,
      "a domain under the cap keeps every doc")
  }

  test("hashSample survives id columns with reserved/odd names") {
    val s = spark
    // an expr()-interpolated column name would re-parse 'order' (reserved)
    // or break on the space; Column functions resolve both
    val docs = s.table("documents").select(
      col("doc_id").as("order"), col("doc_id").as("weird name"))
    val viaReserved = Sampling.hashSample(docs, 20, idCol = "order")
      .collect().map(_.getLong(0)).toSet
    val viaSpace = Sampling.hashSample(docs, 20, idCol = "weird name")
      .collect().map(_.getLong(0)).toSet
    val baseline = Sampling.hashSample(
      s.table("documents").select("doc_id"), 20)
      .collect().map(_.getLong(0)).toSet
    assert(viaReserved == baseline && viaSpace == baseline)
  }

  test("hybridRrf: fused score is the reciprocal-rank formula and " +
    "two-arm docs outrank every single-arm doc") {
    val s = spark
    val fused = Relevance.hybridRrf(
      s.table("documents"), s.table("embeddings"),
      Seq("spark", "vector", "stream"), queryVecId = 0L,
      armK = 20, kRrf = 60, topN = 40).collect()
    assert(fused.nonEmpty && fused.length <= 40)
    def rr(r: org.apache.spark.sql.Row, i: Int): Double =
      if (r.isNullAt(i)) 0.0 else 1.0 / (60 + r.getInt(i))
    fused.foreach { r =>
      val want = BigDecimal(rr(r, 1) + rr(r, 2))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getDouble(3) - want) < 1e-12,
        s"rrf formula mismatch on $r")
    }
    // with armK=20 and kRrf=60, worst two-arm score 2/80 = 0.025 beats
    // best one-arm score 1/61 ≈ 0.0164 — so fusion strictly prefers
    // agreement, and the rank order must reflect it
    val both = fused.filter(r => !r.isNullAt(1) && !r.isNullAt(2))
    val single = fused.filter(r => r.isNullAt(1) || r.isNullAt(2))
    if (both.nonEmpty && single.nonEmpty)
      assert(both.map(_.getInt(4)).max < single.map(_.getInt(4)).min)
    // ranks are dense from 1
    assert(fused.map(_.getInt(4)).sorted.toSeq == (1 to fused.length))
  }

  test("weightedSample: A-ES draw is deterministic, excludes nonpositive " +
    "weights, and prefers heavy rows") {
    val s = spark
    import s.implicits._
    // even ids weigh 1, odd ids weigh 10000, a few rows unsampleable
    val docs = (0L until 1000L)
      .map(i => (i, "d", if (i >= 990) 0L else if (i % 2 == 1) 10000L else 1L))
      .toDF("doc_id", "source", "n_chars")
    val got = Sampling.weightedSample(docs, k = 100).collect()
    assert(got.length == 100)
    assert(got.forall(_.getLong(2) > 0), "weight-0 rows can never be drawn")
    val odd = got.count(_.getLong(0) % 2 == 1)
    assert(odd >= 90, s"10000:1 weights should dominate the sample: $odd/100")
    // the priority column is exactly the documented formula
    got.take(10).foreach { r =>
      val id = r.getLong(0)
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 8)
      val u = (java.lang.Long.parseLong(hex, 16) + 0.5) / 4294967296.0
      val want = BigDecimal(-math.log(u) / r.getLong(2))
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getDouble(3) == want, s"priority formula mismatch on $r")
    }
    // rerun-stable
    val again = Sampling.weightedSample(docs, k = 100).collect()
    assert(got.map(_.toString).sameElements(again.map(_.toString)))
    // sel_rank follows ascending priority
    assert(got.sortBy(_.getInt(4)).map(_.getDouble(3)).toSeq ==
      got.map(_.getDouble(3)).sorted.toSeq)
  }

  test("temperatureShares: alpha=1 is the natural mix, alpha=0 uniform, " +
    "alpha<1 flattens toward the rare domain") {
    val s = spark
    import s.implicits._
    // 80 / 15 / 5 split
    val docs = ((1 to 80).map(i => (i.toLong, "common")) ++
      (81 to 95).map(i => (i.toLong, "mid")) ++
      (96 to 100).map(i => (i.toLong, "rare"))).toDF("doc_id", "domain")
    def shares(alpha: Double): Map[String, (Double, Double)] =
      Sampling.temperatureShares(docs, "domain", alpha).collect()
        .map(r => r.getString(0) -> (r.getDouble(3), r.getDouble(4))).toMap
    val nat = shares(1.0)
    assert(nat("common")._1 == 0.8 && nat("rare")._1 == 0.05)
    assert(nat.values.forall { case (_, f) => math.abs(f - 1.0) < 1e-5 },
      s"alpha=1 must be the identity mix: $nat")
    val uni = shares(0.0)
    assert(uni.values.forall { case (ts, _) =>
      math.abs(ts - 1.0 / 3) < 1e-5 }, s"alpha=0 must be uniform: $uni")
    val t = shares(0.3)
    // flattening: rare upweighted, common downweighted, shares sum to 1
    assert(t("rare")._2 > 1.0 && t("common")._2 < 1.0)
    assert(math.abs(t.values.map(_._1).sum - 1.0) < 1e-4)
    // monotonicity preserved: common still the largest share
    assert(t("common")._1 > t("mid")._1 && t("mid")._1 > t("rare")._1)
  }

  test("tokenBudget: targets sum to ~budget, alpha=1 equalizes rates, " +
    "alpha<1 oversamples the rare domain into the epoch regime") {
    val s = spark
    import s.implicits._
    // token mass 8000 / 1500 / 500
    val docs = ((1 to 80).map(i => (i.toLong, "common", 100)) ++
      (81 to 95).map(i => (i.toLong, "mid", 100)) ++
      (96 to 100).map(i => (i.toLong, "rare", 100))).toDF(
      "doc_id", "domain", "n_tok")
    def plan(alpha: Double): Map[String, (Long, Double, Long)] =
      Sampling.tokenBudget(docs, "domain", "n_tok", budget = 5000L, alpha)
        .collect()
        .map(r => r.getString(0) ->
          ((r.getLong(5), r.getDouble(6), r.getLong(7)))).toMap
    val nat = plan(1.0)
    // alpha=1: every domain samples at budget/total = 0.5, one epoch
    assert(nat.values.forall { case (_, rate, ep) =>
      math.abs(rate - 0.5) < 1e-4 && ep == 1L })
    assert(math.abs(nat.values.map(_._1).sum - 5000L) <= 2,
      s"targets must sum to ~budget: $nat")
    val t = plan(0.3)
    assert(math.abs(t.values.map(_._1).sum - 5000L) <= 2)
    // flattening: the rare domain's rate exceeds the common domain's,
    // and crosses 1.0 into the repeat regime (500 tokens, >1897 target)
    assert(t("rare")._2 > 1.0 && t("rare")._3 >= 2L,
      s"rare domain must repeat: $t")
    assert(t("rare")._2 > t("common")._2)
    // epochs is always ceil(rate)
    t.values.foreach { case (_, rate, ep) =>
      assert(ep == math.ceil(rate - 1e-9).toLong ||
        ep == math.ceil(rate).toLong)
    }
  }

  test("winsorize: hand-computed type-1 cuts, tail clipping flags, " +
    "NULL rows preserved") {
    val s = spark
    import s.implicits._
    // values 1..10 plus outlier 100 (n=11): ceil(.1*11)=2 -> qlo=2,
    // ceil(.9*11)=10 -> qhi=10
    val docs = ((1 to 10).map(i => (i.toLong, Some(i.toLong))) :+
      ((11L, Some(100L))) :+ ((12L, None: Option[Long])))
      .toDF("doc_id", "v")
    val out = Sampling.winsorize(docs, "v", pLo = 0.1, pHi = 0.9)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[Long]("winsorized") == 2L &&
      out(1L).getAs[Boolean]("clipped_lo") &&
      !out(1L).getAs[Boolean]("clipped_hi"))
    assert(out(11L).getAs[Long]("winsorized") == 10L &&
      out(11L).getAs[Boolean]("clipped_hi"))
    (2 to 10).foreach { i =>
      val r = out(i.toLong)
      assert(r.getAs[Long]("winsorized") == i.toLong &&
        !r.getAs[Boolean]("clipped_lo") && !r.getAs[Boolean]("clipped_hi"))
    }
    assert(out(12L).isNullAt(2) && out(12L).isNullAt(3) &&
      out(12L).isNullAt(4))
    val e = intercept[IllegalArgumentException] {
      Sampling.winsorize(docs, "v", pLo = 0.9, pHi = 0.1)
    }
    assert(e.getMessage.contains("pLo"))
  }

  test("temporalSplit: the cut lands on the 80% minute, the gap purges, " +
    "NULL timestamps get a NULL split") {
    val s = spark
    import s.implicits._
    def ts(m: Int, sec: Int = 30): java.sql.Timestamp =
      java.sql.Timestamp.valueOf(f"2024-01-01 00:$m%02d:$sec%02d")
    // one event per minute 00..09: cum*100 >= 10*80 first at minute 07
    val rows = (0 to 9).map(m => (m.toLong, Some(ts(m)))) :+
      ((99L, None: Option[java.sql.Timestamp]))
    val out = Sampling.temporalSplit(rows.toDF("event_id", "ts"), "ts",
      trainPct = 80, gapMinutes = 1)
      .collect().map(r => r.getLong(0) -> Option(r.getString(2))).toMap
    (0 to 7).foreach(m => assert(out(m.toLong).contains("train"), s"min $m"))
    assert(out(8L).contains("purged"))
    assert(out(9L).contains("test"))
    assert(out(99L).isEmpty)
  }

  test("groupedQuantiles: hand-computed per-group type-1 cuts; ties and " +
    "NULL-only groups handled") {
    val s = spark
    import s.implicits._
    val docs = ((1 to 10).map(i => ("g1", Some(i.toLong))) ++
      Seq(("g2", Some(5L)), ("g2", Some(5L)), ("g2", Some(5L)),
        ("g2", Some(100L)), ("g3", None: Option[Long])))
      .toDF("grp", "v")
    val out = Sampling.groupedQuantiles(docs, "grp", "v",
      ps = Seq(0.1, 0.5, 0.9)).collect()
      .map(r => r.getString(0) -> r).toMap
    // g1 = 1..10: ceil(1)=1 -> 1, ceil(5)=5 -> 5, ceil(9)=9 -> 9
    assert(out("g1").getAs[Long]("n_rows") == 10L)
    assert(out("g1").getAs[Long]("p10") == 1L &&
      out("g1").getAs[Long]("p50") == 5L &&
      out("g1").getAs[Long]("p90") == 9L)
    // g2 = [5,5,5,100]: the tie bucket absorbs p10/p50, the outlier p90
    assert(out("g2").getAs[Long]("p10") == 5L &&
      out("g2").getAs[Long]("p50") == 5L &&
      out("g2").getAs[Long]("p90") == 100L)
    // the all-NULL group has no ranked rows and vanishes
    assert(!out.contains("g3"))
  }

  test("unimaxAlloc: hand-computed waterfill — saturated caps, the level " +
    "on the remainder, all-saturated and all-unsaturated extremes") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, "a", 100), (2L, "b", 200), (3L, "c", 1000),
      (4L, "d", 0)).toDF("doc_id", "domain", "n_tok")
    def plan(budget: Long): Map[String, (Double, Boolean, Double)] =
      Sampling.unimaxAlloc(docs, "domain", "n_tok", budget, epochCap = 2.0)
        .collect()
        .map(r => r.getString(0) ->
          ((r.getDouble(3), r.getBoolean(4), r.getDouble(5)))).toMap
    // caps 200/400/2000/0, budget 1500: a and b (and empty d) saturate,
    // c takes the remainder 1500-600 = 900
    val mid = plan(1500L)
    assert(mid("a") == ((200.0, true, 200.0)))
    assert(mid("b") == ((400.0, true, 400.0)))
    assert(mid("c") == ((2000.0, false, 900.0)))
    assert(mid("d") == ((0.0, true, 0.0)))
    // allocations exhaust the budget exactly in the mixed regime
    assert(mid.values.map(_._3).sum == 1500.0)
    // a zero-mass domain reports NULL epochs, never 0/0
    val rows = Sampling.unimaxAlloc(docs, "domain", "n_tok", 1500L, 2.0)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(rows("d").isNullAt(6))
    assert(rows("a").getDouble(6) == 2.0 && rows("c").getDouble(6) == 0.9)
    // budget above total capacity: everyone saturates at epochCap
    val big = plan(10000L)
    assert(big.values.forall(_._2))
    assert(big.values.map(_._3).sum == 2600.0)
    // budget below the smallest positive cap x domains: a pure even split
    // (the zero-mass domain still "saturates" at 0)
    val small = plan(300L)
    assert(!small("a")._2 && small("a")._3 == 100.0)
    assert(small("b")._3 == 100.0 && small("c")._3 == 100.0)
  }

  test("ksDrift: hand-computed sup gap, identical halves stay under the " +
    "critical value, empty side refuses") {
    val s = spark
    import s.implicits._
    // a = {1,2,3,4}, b = {3,4,5,6}: cum gaps peak at |3*4 - 1*4| = 8
    // from v=2 through v=4; smallest winner is v=2; D = 8/16 = 0.5
    val a = Seq(1L, 2L, 3L, 4L).toDF("v")
    val b = Seq(3L, 4L, 5L, 6L).toDF("v")
    val card = Sampling.ksDrift(a, b, "v").collect()(0)
    assert(card.getAs[Long]("n_a") == 4L && card.getAs[Long]("n_b") == 4L)
    assert(card.getAs[Long]("n_values") == 6L)
    assert(card.getAs[Long]("ks_at") == 2L)
    assert(card.getAs[Double]("ks_stat") == 0.5)
    // crit = round(1.358 * sqrt(8/16), 6) = 0.960251 — not drifted
    assert(card.getAs[Double]("crit_05") == 0.960251)
    assert(!card.getAs[Boolean]("drifted"))
    // identical sides: D = 0, never drifted
    val same = Sampling.ksDrift(a, a, "v").collect()(0)
    assert(same.getAs[Double]("ks_stat") == 0.0)
    assert(!same.getAs[Boolean]("drifted"))
    // a support-disjoint shift: the CDFs separate completely, D = 1
    val d = s.table("documents")
    val planted = Sampling.ksDrift(
      d.filter(col("doc_id") % 2 === 0).select("n_chars"),
      d.filter(col("doc_id") % 2 === 1)
        .select((col("n_chars") + 100000L).as("n_chars")),
      "n_chars").collect()(0)
    assert(planted.getAs[Double]("ks_stat") == 1.0)
    assert(planted.getAs[Boolean]("drifted"))
    // an empty side has no CDF — loud contract error
    val err = intercept[IllegalArgumentException] {
      Sampling.ksDrift(a.filter(col("v") > 100L), b, "v").collect()
    }
    assert(err.getMessage.contains("both sides"))
    graft.llm.PipelineCaches.clear()
  }

  test("stratAlloc: hand-computed Hamilton quotas 4/2/1 for 7 of " +
    "5/3/2, selection exactly fills each quota") {
    val s = spark
    import s.implicits._
    val d = ((1L to 5L).map(i => (i, "A")) ++
      (11L to 13L).map(i => (i, "B")) ++
      (21L to 22L).map(i => (i, "C"))).toDF("doc_id", "grp")
    val out = Sampling.stratAlloc(d, "grp", targetN = 7L)
    val rows = out.collect()
    assert(rows.length == 10, "rows preserved")
    val quotas = rows.map(r => r.getString(1) -> r.getLong(2)).toMap
    // products: A 5*7=35 -> fl 3 rem 5; B 21 -> 2 rem 1; C 14 -> 1
    // rem 4; deficit 1 -> the largest remainder (A) tops up
    assert(quotas == Map("A" -> 4L, "B" -> 2L, "C" -> 1L))
    val selected = rows.filter(_.getBoolean(3))
      .groupBy(_.getString(1)).view.mapValues(_.length).toMap
    assert(selected == Map("A" -> 4, "B" -> 2, "C" -> 1))
    // exactness on the fixture corpus at a deliberately awkward N
    val real = Sampling.stratAlloc(
      s.table("documents").select("doc_id", "source"), "source", 137L)
    assert(real.filter(col("selected")).count() == 137L,
      "exact-N is the contract")
    val err = intercept[IllegalArgumentException](
      Sampling.stratAlloc(d, "grp", targetN = 11L).collect())
    assert(err.getMessage.contains("exceeds"))
  }

  test("stratAlloc: a NULL stratum is a first-class group — rows " +
    "preserved, quota allocated, exact-N still holds (advice fix: the " +
    "quota join must be null-safe or NULL-group rows silently vanish)") {
    val s = spark
    import s.implicits._
    val d = ((1L to 6L).map(i => (i, Some("A"))) ++
      (11L to 13L).map(i => (i, Option.empty[String]))).toDF("doc_id", "grp")
    val out = Sampling.stratAlloc(d, "grp", targetN = 6L).collect()
    assert(out.length == 9, "every row returns, including NULL stratum")
    val nullRows = out.filter(_.isNullAt(1))
    assert(nullRows.length == 3, "NULL-stratum rows preserved")
    // 6 of 9: A 6*6=36 -> fl 4 rem 0; NULL 18 -> fl 2 rem 0; no deficit
    assert(nullRows.forall(_.getLong(2) == 2L))
    assert(out.count(_.getBoolean(3)) == 6, "exact-N across NULL strata")
    assert(nullRows.count(_.getBoolean(3)) == 2)
  }
}
