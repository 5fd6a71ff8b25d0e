package graft.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** LLM-pipeline operators: planted near-duplicate recall for MinHash/LSH,
  * SimHash Hamming behavior, ANN recall vs the brute-force baseline, and
  * the multimodal plumbing. */
class LlmSpec extends AnyFunSuite {

  private def spark = SparkTestSession.withTables()

  test("exact dedup flags planted duplicates only") {
    val s = spark
    val d = s.table("documents").select("doc_id", "text")
    val dupes = d.filter(col("doc_id") < 5)
      .select((col("doc_id") + 1000L).as("doc_id"), col("text"))
    val result = TextOps.exactDedup(d.unionAll(dupes))
    val flagged = result.filter(col("is_dup")).collect()
    assert(flagged.length == 5)
    assert(flagged.forall(r => r.getLong(0) >= 1000))
    // each dup's group leader is the original doc
    assert(flagged.forall(r => r.getLong(1) == r.getLong(0) - 1000))
  }

  test("embedding-cosine near-dup finds every planted scaled copy") {
    val s = spark
    val e = s.table("embeddings").select("vec_id", "embedding")
      .filter(col("vec_id") < 100)
    // positive scaling preserves every hyperplane sign, so planted copies
    // share the full LSH signature and can never be missed by the buckets
    val scaled = e.select((col("vec_id") + 1000L).as("vec_id"),
      expr("transform(embedding, x -> CAST(x * CAST(2.0 AS FLOAT) AS FLOAT))")
        .as("embedding"))
    val pairs = Similarity.cosineNearDup(
      e.unionAll(scaled), threshold = 0.9, planes = 24, bands = 3).collect()
    val planted = pairs.filter(r => r.getLong(1) == r.getLong(0) + 1000L)
    assert(planted.length == 100, s"found ${planted.length}/100 planted pairs")
    assert(planted.forall(_.getDouble(2) >= 0.999999))
    // nothing else in the corpus is near-dup at this threshold
    assert(pairs.length == 100, s"unexpected extra pairs: ${pairs.length - 100}")
  }

  test("autoCellCount pins occupancy as the corpus grows") {
    assert(Similarity.autoCellCount(0) == 1)
    assert(Similarity.autoCellCount(256) == 1)
    assert(Similarity.autoCellCount(257) == 2)
    assert(Similarity.autoCellCount(1000000) == 3907)
    // 10x the corpus => ~10x the cells, occupancy (and within-cell pair
    // work per vector) constant
    val k1 = Similarity.autoCellCount(100000)
    val k10 = Similarity.autoCellCount(1000000)
    assert(math.abs(k10.toDouble / k1 - 10.0) < 0.1)
    intercept[IllegalArgumentException] {
      Similarity.autoCellCount(100, targetOccupancy = 0)
    }
  }

  test("semantic dedup flags planted scaled copies, shares cells, and " +
    "honors the cell-size cap") {
    val s = spark
    val seeds = (1 to 16).map(_ * 5L)
    val e = s.table("embeddings").select("vec_id", "embedding")
      .filter(col("vec_id") < 200)
    val scaled = e.select((col("vec_id") + 1000L).as("vec_id"),
      expr("transform(embedding, x -> CAST(x * CAST(2.0 AS FLOAT) AS FLOAT))")
        .as("embedding"))
    val out = Similarity.semanticDedup(e.unionAll(scaled), seeds,
      threshold = 0.95).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getBoolean(2),
        r.getBoolean(3)))).toMap
    // every copy (larger id) is the flagged member; its source is kept
    (0L until 200L).foreach { id =>
      val (cell, dup, over) = out(id)
      val (cellC, dupC, _) = out(id + 1000L)
      assert(cell == cellC, s"copy of $id must share its source's cell")
      assert(dupC, s"planted copy of $id must be flagged")
      assert(!over)
      // sources are dup-free: random gaussians have no organic 0.95 pair
      assert(!dup, s"source $id should be kept")
    }
    // a cap below the planted cell sizes excludes those cells from pair
    // generation: members are audited, not paired
    val capped = Similarity.semanticDedup(e.unionAll(scaled), seeds,
      threshold = 0.95, maxCellSize = 1).collect()
    assert(capped.forall(r => !r.getBoolean(2)), "no pairs under cap 1")
    assert(capped.exists(r => r.getBoolean(3)), "oversized cells audited")
  }

  test("coverageCard: hand-built 4/2/1/1 occupancy yields the exact " +
    "Shannon entropy and shares") {
    val s = spark
    import s.implicits._
    // 4 orthogonal axis seeds (ids 0-3); members repeat an axis scaled,
    // cosine assignment is exact: occupancy 4/2/1/1 over 8 vectors
    def axis(i: Int, scale: Float): Array[Float] = {
      val a = Array.fill(4)(0.0f); a(i) = scale; a
    }
    val rows = Seq(
      0L -> axis(0, 1f), 1L -> axis(1, 1f), 2L -> axis(2, 1f),
      3L -> axis(3, 1f),
      10L -> axis(0, 2f), 11L -> axis(0, 3f), 12L -> axis(0, 4f),
      13L -> axis(1, 2f))
    val embs = rows.toDF("vec_id", "embedding")
    val card = Similarity.coverageCard(embs, Seq(0L, 1L, 2L, 3L))
      .collect()(0)
    assert(card.getLong(0) == 8L)       // n_vecs
    assert(card.getInt(1) == 4)         // k_cells
    assert(card.getLong(2) == 4L)       // occupied_cells
    val expected = // -(.5 ln .5 + .25 ln .25 + 2 * .125 ln .125)
      -(0.5 * math.log(0.5) + 0.25 * math.log(0.25) +
        2 * 0.125 * math.log(0.125))
    assert(math.abs(card.getDouble(3) - expected) < 1e-6,
      s"entropy ${card.getDouble(3)} != $expected")
    assert(math.abs(card.getDouble(4) - expected / math.log(4.0)) < 1e-6)
    assert(card.getDouble(5) == 0.5)    // max_share
  }

  test("embStats: hand-computed per-dim moments, dead-dim share 0, " +
    "all-constant corpus yields NULL shares") {
    val s = spark
    import s.implicits._
    // [1,3],[3,5]: both dims mean±var (2,1) and (4,1) — equal shares
    val even = Seq(1L -> Seq(1.0f, 3.0f), 2L -> Seq(3.0f, 5.0f))
      .toDF("vec_id", "embedding")
    val e = Similarity.embStats(even).collect()
      .map(r => r.getInt(0) -> r).toMap
    assert(e(0).getAs[Long]("n_vecs") == 2L)
    assert(e(0).getAs[Double]("mean") == 2.0)
    assert(e(0).getAs[Double]("variance") == 1.0)
    assert(e(0).getAs[Double]("var_share") == 0.5)
    assert(e(1).getAs[Double]("mean") == 4.0)
    assert(e(1).getAs[Double]("variance") == 1.0)
    assert(e(1).getAs[Double]("var_share") == 0.5)
    // a dead (constant) dim: zero variance, zero share; the live dim
    // hoards share 1 — the collapse signal the card exists to surface
    val dead = Seq(1L -> Seq(2.0f, 0.0f), 2L -> Seq(2.0f, 4.0f))
      .toDF("vec_id", "embedding")
    val d = Similarity.embStats(dead).collect()
      .map(r => r.getInt(0) -> r).toMap
    assert(d(0).getAs[Double]("variance") == 0.0)
    assert(d(0).getAs[Double]("var_share") == 0.0)
    assert(d(1).getAs[Double]("variance") == 4.0)
    assert(d(1).getAs[Double]("var_share") == 1.0)
    // every dim constant: total variance 0 — shares are NULL, not 0/0
    val const = Seq(1L -> Seq(1.0f, 1.0f), 2L -> Seq(1.0f, 1.0f))
      .toDF("vec_id", "embedding")
    val c = Similarity.embStats(const).collect()
    assert(c.forall(_.isNullAt(4)))
  }

  test("embDrift: hand-computed Welch z, the planted-shift TRUE, the " +
    "equal-constant NULL-z FALSE, and zero-variance shift = drifted " +
    "with NULL z") {
    val s = spark
    import s.implicits._
    val a = Seq(0L -> Seq(1.0f, 1.0f), 2L -> Seq(1.0f, 3.0f))
      .toDF("vec_id", "embedding")
    val b = Seq(1L -> Seq(1.0f, 5.0f), 3L -> Seq(1.0f, 5.0f))
      .toDF("vec_id", "embedding")
    val r = Similarity.embDrift(a, b).collect()
      .map(x => x.getInt(0) -> x).toMap
    // dim 0: both sides constant 1 — no evidence, defined non-drift
    assert(r(0).getAs[Double]("delta") == 0.0)
    assert(r(0).isNullAt(r(0).fieldIndex("z")))
    assert(!r(0).getAs[Boolean]("drifted"))
    // dim 1: mean_a 2 (var 1), mean_b 5 (var 0) — z = -3/sqrt(1/2)
    assert(r(1).getAs[Double]("mean_a") == 2.0)
    assert(r(1).getAs[Double]("var_a") == 1.0)
    assert(r(1).getAs[Double]("delta") == -3.0)
    assert(r(1).getAs[Double]("z") == -4.242641)
    assert(r(1).getAs[Boolean]("drifted"))
    // zero pooled variance WITH a shift: infinite evidence — drifted
    // true, z a defined NULL (never a fake number)
    val c = Seq(1L -> Seq(2.0f), 3L -> Seq(2.0f)).toDF("vec_id", "embedding")
    val a1 = Seq(0L -> Seq(1.0f), 2L -> Seq(1.0f)).toDF("vec_id", "embedding")
    val zv = Similarity.embDrift(a1, c).collect()(0)
    assert(zv.isNullAt(zv.fieldIndex("z")))
    assert(zv.getAs[Boolean]("drifted"))
  }

  test("embTopPc: axis-aligned variance pins the loading exactly; a " +
    "correlated pair loads the diagonal; all-constant is a NULL card") {
    val s = spark
    import s.implicits._
    // variance only on dim 0: cov = [[1,0],[0,0]] — loading is e0,
    // share 1 (every rounding step is exact on these integers)
    val axis = Seq(1L -> Seq(1.0f, 0.0f), 2L -> Seq(-1.0f, 0.0f))
      .toDF("vec_id", "embedding")
    val a = Similarity.embTopPc(axis, iters = 12).collect()
      .map(r => r.getInt(0) -> r).toMap
    assert(a(0).getAs[Long]("n_vecs") == 2L)
    assert(a(0).getAs[Double]("loading") == 1.0)
    assert(a(1).getAs[Double]("loading") == 0.0)
    assert(a(0).getAs[Double]("top_pc_share") == 1.0)
    // perfectly correlated dims: cov = [[1,1],[1,1]] — the diagonal
    // direction, both loadings 1/sqrt(2), share still 1
    val diag = Seq(1L -> Seq(1.0f, 1.0f), 2L -> Seq(-1.0f, -1.0f))
      .toDF("vec_id", "embedding")
    val d = Similarity.embTopPc(diag, iters = 12).collect()
      .map(r => r.getInt(0) -> r).toMap
    assert(d(0).getAs[Double]("loading") == 0.707107)
    assert(d(1).getAs[Double]("loading") == 0.707107)
    assert(d(0).getAs[Double]("top_pc_share") == 1.0)
    // all-constant corpus: zero covariance everywhere — defined NULLs
    val const2 = Seq(1L -> Seq(2.0f, 2.0f), 2L -> Seq(2.0f, 2.0f))
      .toDF("vec_id", "embedding")
    val c2 = Similarity.embTopPc(const2, iters = 12).collect()
    assert(c2.length == 2 && c2.forall(_.isNullAt(2)) &&
      c2.forall(_.isNullAt(3)))
    // fixture corpus: unit-L2 loadings, share in (0, 1], deterministic
    val fx = Similarity.embTopPc(
      s.table("embeddings").select("vec_id", "embedding"), iters = 12)
    val rows = fx.collect()
    val ss = rows.map(r => math.pow(r.getAs[Double]("loading"), 2)).sum
    assert(math.abs(ss - 1.0) < 1e-4, s"loadings not unit-L2: $ss")
    val share = rows.head.getAs[Double]("top_pc_share")
    assert(share > 0 && share <= 1.0)
    // sign convention: the largest-|loading| dim points positive
    val domLoad = rows.map(_.getAs[Double]("loading")).maxBy(math.abs)
    assert(domLoad > 0, s"dominant loading must be positive: $domLoad")
    val again = Similarity.embTopPc(
      s.table("embeddings").select("vec_id", "embedding"), iters = 12)
      .collect()
    assert(rows.map(_.toString).sorted.sameElements(
      again.map(_.toString).sorted))
  }

  test("embTopPc: NULL elements and mixed widths refuse loudly, never " +
    "silently skew the covariance") {
    val s = spark
    import s.implicits._
    // a NULL element: the mean pass sees the row, the gram pass would
    // drop it — the card must refuse, naming the dim
    val withNull = Seq(
      1L -> Seq[java.lang.Float](1.0f, 2.0f),
      2L -> Seq[java.lang.Float](1.0f, null)).toDF("vec_id", "embedding")
    val e1 = intercept[IllegalArgumentException] {
      Similarity.embTopPc(withNull).collect()
    }
    assert(e1.getMessage.contains("NULL embedding element"))
    assert(e1.getMessage.contains("dim 1"))
    // mixed widths: per-dim row counts disagree — refuse loudly
    val mixed = Seq(1L -> Seq(1.0f, 2.0f), 2L -> Seq(1.0f, 2.0f, 3.0f))
      .toDF("vec_id", "embedding")
    val e2 = intercept[IllegalArgumentException] {
      Similarity.embTopPc(mixed).collect()
    }
    assert(e2.getMessage.contains("mixed embedding widths"))
    // width over GramTerms' 1024 budget: gram pass yields nothing —
    // the card names the budget instead of claiming "no embeddings"
    val wide = Seq(
      1L -> Array.fill(1025)(1.0f).toSeq,
      2L -> Array.tabulate(1025)(_.toFloat).toSeq)
      .toDF("vec_id", "embedding")
    val e3 = intercept[IllegalArgumentException] {
      Similarity.embTopPc(wide).collect()
    }
    assert(e3.getMessage.contains("1024-dim per-row budget"))
  }

  test("clusterPurity: label-aligned cells score purity 1 / NMI 1, " +
    "label-independent cells score NMI 0, one label is NULL NMI") {
    val s = spark
    import s.implicits._
    def embsOf(rows: (Long, Seq[Float], Int)*) =
      rows.toDF("vec_id", "embedding", "label")
    // cells (seeds 1, 2) perfectly track labels: 2x2 diagonal
    val perfect = embsOf(
      (1L, Seq(10.0f, 0.0f), 0), (2L, Seq(0.0f, 10.0f), 1),
      (3L, Seq(5.0f, 0.0f), 0), (4L, Seq(0.0f, 5.0f), 1))
    val p = Similarity.clusterPurity(perfect, Seq(1L, 2L), "label")
      .collect()(0)
    assert(p.getAs[Long]("n_vecs") == 4L)
    assert(p.getAs[Long]("n_cells") == 2L && p.getAs[Long]("n_labels") == 2L)
    assert(p.getAs[Double]("purity") == 1.0)
    assert(p.getAs[Double]("nmi") == 1.0)
    // labels independent of cells: MI 0 -> NMI 0 (purity 1/2)
    val indep = embsOf(
      (1L, Seq(10.0f, 0.0f), 0), (2L, Seq(0.0f, 10.0f), 0),
      (3L, Seq(5.0f, 0.0f), 1), (4L, Seq(0.0f, 5.0f), 1))
    val i = Similarity.clusterPurity(indep, Seq(1L, 2L), "label")
      .collect()(0)
    assert(i.getAs[Double]("purity") == 0.5)
    assert(i.getAs[Double]("nmi") == 0.0)
    // a single label has zero entropy: NMI is NULL, not 0/0
    val mono = embsOf(
      (1L, Seq(10.0f, 0.0f), 7), (2L, Seq(0.0f, 10.0f), 7))
    val m = Similarity.clusterPurity(mono, Seq(1L, 2L), "label")
      .collect()(0)
    assert(m.getAs[Double]("purity") == 1.0)
    assert(m.isNullAt(m.fieldIndex("nmi")))
    graft.llm.PipelineCaches.clear()
  }

  test("vocabOverlap: identical corpora give zero KL and Jaccard 1; " +
    "hand-computed symmetric shift; disjoint vocabularies share nothing") {
    val s = spark
    import s.implicits._
    val a = Seq((1L, "x x y")).toDF("doc_id", "text")
    val same = TextOps.vocabOverlap(a, a).collect()(0)
    assert(same.getAs[Long]("shared_types") == 2L)
    assert(same.getAs[Double]("jaccard_vocab") == 1.0)
    assert(same.getAs[Double]("kl_ab") == 0.0 &&
      same.getAs[Double]("kl_ba") == 0.0)
    // b mirrors the counts (x:1, y:2): pa = (.625, .375), pb reversed,
    // KL = 0.25 * ln(5/3) in both directions
    val b = Seq((1L, "x y y")).toDF("doc_id", "text")
    val m = TextOps.vocabOverlap(a, b).collect()(0)
    val expected = 0.25 * math.log(5.0 / 3.0)
    assert(math.abs(m.getAs[Double]("kl_ab") - expected) < 1e-6)
    assert(m.getAs[Double]("kl_ab") == m.getAs[Double]("kl_ba"))
    assert(m.getAs[Long]("n_tokens_a") == 3L &&
      m.getAs[Long]("n_tokens_b") == 3L)
    // disjoint vocabularies: zero shared types, both KLs positive
    val c = Seq((1L, "p q r")).toDF("doc_id", "text")
    val d = TextOps.vocabOverlap(a, c).collect()(0)
    assert(d.getAs[Long]("shared_types") == 0L)
    assert(d.getAs[Double]("jaccard_vocab") == 0.0)
    assert(d.getAs[Double]("kl_ab") > 0 && d.getAs[Double]("kl_ba") > 0)
  }

  test("lshPlan: exact hand-computed S-curve areas on a 2-point grid, " +
    "the balanced factorization wins") {
    val s = spark
    // n=4, t=0.5, grid {0.25, 0.75}: P_b,r(s) = 1-(1-s^r)^b
    //   (1,4): fp = .25^4/2 = .001953125, fn = (1-.31640625)/2 = .341796875
    //   (2,2): fp = .12109375/2,          fn = .19140625/2
    //   (4,1): the mirror of (1,4) — total ties at .34375, (2,2) wins
    val out = Dedup.lshPlan(s, nSig = 4, threshold = 0.5, gridSteps = 2)
      .collect().map(r => r.getInt(0) -> r).toMap
    assert(out.size == 3)
    assert(out(1).getAs[Double]("fp_area") == 0.001953)
    assert(out(1).getAs[Double]("fn_area") == 0.341797)
    assert(out(2).getAs[Double]("fp_area") == 0.060547)
    assert(out(2).getAs[Double]("fn_area") == 0.095703)
    assert(out(4).getAs[Double]("fp_area") == 0.341797)
    assert(out(4).getAs[Double]("fn_area") == 0.001953)
    assert(out(2).getAs[Boolean]("is_best"))
    assert(!out(1).getAs[Boolean]("is_best") &&
      !out(4).getAs[Boolean]("is_best"))
    assert(out(2).getAs[Double]("est_threshold") == 0.707107)
    assert(out(2).getAs[Double]("total_err") == 0.15625)
  }

  test("kmeansStep: the centroid update pulls a boundary vector across " +
    "— hand-computed move, stable members, exact refined cosines") {
    val s = spark
    import s.implicits._
    // seeds: cell0 = [1,0], cell1 = [0,1]. The heavy outlier [5,-5]
    // drags cell0's refined centroid to [6.8,-4.4], so the boundary
    // vector [0.8,0.6] (init cos 0.8 vs 0.6 → cell0) re-scores
    // 0.346 vs 0.6 and MOVES to cell1; everyone else stays put.
    val embs = Seq(
      0L -> Seq(1.0f, 0.0f), 1L -> Seq(0.0f, 1.0f),
      10L -> Seq(0.8f, 0.6f), 11L -> Seq(0.0f, 5.0f),
      12L -> Seq(5.0f, -5.0f)).toDF("vec_id", "embedding")
    val out = Similarity.kmeansStep(embs, Seq(0L, 1L)).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out.values.count(_.getAs[Boolean]("moved")) == 1)
    val mover = out(10L)
    assert(mover.getAs[Int]("cell_init") == 0)
    assert(mover.getAs[Int]("cell") == 1)
    // refined cell1 centroid is the sum [0,6]; cos([0.8,0.6],[0,6]) = 0.6
    assert(mover.getAs[Double]("cos_refined") == 0.6)
    // cell1's stable members sit exactly on the refined centroid ray
    assert(out(1L).getAs[Double]("cos_refined") == 1.0)
    assert(out(11L).getAs[Double]("cos_refined") == 1.0)
    assert(out(0L).getAs[Int]("cell") == 0 && out(12L).getAs[Int]("cell") == 0)
  }

  test("an all-zero embedding survives dedup and is no one's duplicate") {
    val s = spark
    // bad upstream featurization happens at corpus scale: the zero
    // vector's cosine is 0/0 against everything — plain ANSI division
    // would kill the job, and a leaked NaN would compare >= threshold
    // TRUE (Spark NaN-is-largest) and silently flag every cellmate.
    // cosineOrNull drops those pairs instead.
    val seeds = (1 to 8).map(_ * 5L)
    val e = s.table("embeddings").select("vec_id", "embedding")
      .filter(col("vec_id") < 100)
    val zero = e.limit(1).select(lit(9999L).as("vec_id"),
      expr("transform(embedding, x -> CAST(0.0 AS FLOAT))").as("embedding"))
    val out = Similarity.semanticDedup(e.unionAll(zero), seeds,
      threshold = 0.95).collect()
      .map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(out.contains(9999L), "the zero vector stays in the corpus")
    assert(!out(9999L), "the zero vector is not flagged")
    assert(out.count(_._2) == 0,
      "the zero vector must not flag any cellmate as its dup")
    // and the pairwise near-dup rescore path survives it too
    val pairs = Similarity.cosineNearDup(
      e.unionAll(zero), threshold = 0.9, planes = 24, bands = 3).collect()
    assert(!pairs.exists(r => r.getLong(0) == 9999L || r.getLong(1) == 9999L))
  }

  test("a NaN-carrying embedding is no one's duplicate either") {
    val s = spark
    // the non-finite twin of the zero-vector hazard: a NaN element makes
    // every cosine NaN, which compares >= threshold TRUE under Spark's
    // NaN-is-largest ordering — cosineOrNull must null it out the same
    // way it nulls zero norms, or one corrupt row flags its whole cell
    val seeds = (1 to 8).map(_ * 5L)
    val e = s.table("embeddings").select("vec_id", "embedding")
      .filter(col("vec_id") < 100)
    val nan = e.limit(1).select(lit(9999L).as("vec_id"),
      expr("transform(embedding, x -> CAST('NaN' AS FLOAT))").as("embedding"))
    val out = Similarity.semanticDedup(e.unionAll(nan), seeds,
      threshold = 0.95).collect()
      .map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(out.contains(9999L), "the NaN vector stays in the corpus")
    assert(out.count(_._2) == 0,
      "the NaN vector must not flag itself or any cellmate as a dup")
  }

  test("cross-corpus cosine pairs find planted benchmark leakage exactly") {
    val s = spark
    val e = s.table("embeddings").select("vec_id", "embedding")
      .filter(col("vec_id") < 100)
    val bench = e.filter(col("vec_id") % 10 === 0)
    // train = the non-benchmark vectors plus scaled benchmark copies —
    // positive scaling is sign-identical, so LSH recall is 1 on leakage
    val train = e.filter(col("vec_id") % 10 =!= 0).unionAll(
      bench.select((col("vec_id") + 2000L).as("vec_id"),
        expr("transform(embedding, x -> CAST(x * CAST(0.5 AS FLOAT) AS FLOAT))")
          .as("embedding")))
    val pairs = Similarity.crossCosinePairs(train, bench, threshold = 0.9,
      planes = 24, bands = 3).collect()
    assert(pairs.length == 10, s"expected the 10 planted pairs, got ${pairs.length}")
    assert(pairs.forall(r => r.getLong(0) == r.getLong(1) + 2000L))
    assert(pairs.forall(_.getDouble(2) >= 0.999999))
  }

  test("cross-corpus bucket cap suppresses a degenerate benchmark bucket") {
    val s = spark
    import s.implicits._
    val dim = 4
    // 20 identical train vectors + the same vector in bench: a 20x1
    // bucket; cap 5 excludes it while a distinct planted pair survives
    val boiler = Seq.fill(20)(Array(1f, 2f, 3f, 4f))
    val train = (boiler.zipWithIndex.map { case (v, i) => (i.toLong, v.toSeq) }
      :+ (100L, Seq(4f, 3f, 2f, 1f))).toDF("vec_id", "embedding")
    val bench = Seq(
      (0L, Seq(1f, 2f, 3f, 4f)), (1L, Seq(4f, 3f, 2f, 1f)))
      .toDF("vec_id", "embedding")
    val capped = Similarity.crossCosinePairs(train, bench,
      threshold = 0.999, maxBucketSize = 5).collect()
    assert(capped.forall(r => r.getLong(0) == 100L && r.getLong(1) == 1L),
      s"over-cap boilerplate bucket must be excluded: ${capped.mkString(",")}")
    assert(capped.length == 1)
  }

  test("auto band width holds occupancy: floor at 8 bits, +1 bit per doubling") {
    // below 2^8·occupancy the floor applies; beyond it, width tracks
    // log2(n/occupancy) so expected bucket occupancy stays ~constant
    assert(Similarity.autoBandWidth(0) == 8)
    assert(Similarity.autoBandWidth(16384, targetOccupancy = 64) == 8)
    assert(Similarity.autoBandWidth(16385, targetOccupancy = 64) == 9)
    assert(Similarity.autoBandWidth(80000, targetOccupancy = 64) == 11)
    assert(Similarity.autoBandWidth(160000, targetOccupancy = 64) == 12)
    assert(Similarity.autoBandWidth(1L << 40, targetOccupancy = 64) == 34)
    intercept[IllegalArgumentException](
      Similarity.autoBandWidth(100, targetOccupancy = 0))
  }

  test("cosineNearDupAuto finds the same planted pairs as the fixed width") {
    val s = spark
    val e = s.table("embeddings").select("vec_id", "embedding")
      .filter(col("vec_id") < 100)
    // positively-scaled copies are sign-identical, so recall is 1 at ANY
    // band width — the auto variant must find exactly the fixed variant's
    // planted pairs on the same corpus
    val scaled = e.select((col("vec_id") + 1000L).as("vec_id"),
      expr("transform(embedding, x -> CAST(x * CAST(2.0 AS FLOAT) AS FLOAT))")
        .as("embedding"))
    val auto = Similarity.cosineNearDupAuto(
      e.unionAll(scaled), threshold = 0.9).collect()
    assert(auto.length == 100, s"auto width found ${auto.length}/100 pairs")
    assert(auto.forall(r => r.getLong(1) == r.getLong(0) + 1000L))
    assert(auto.forall(_.getDouble(2) >= 0.999999))
  }

  test("minhash candidates find trimmed near-duplicates, not random pairs") {
    val s = spark
    val d = s.table("documents").select("doc_id", "text").filter(col("doc_id") < 50)
    val mutated = d.select((col("doc_id") + 1000L).as("doc_id"),
      expr("substring(text, 1, greatest(length(text) - 12, 1))").as("text"))
    val pairs = Dedup.minhashCandidates(
      d.unionAll(mutated), k = 3, numHashes = 8, bands = 4,
      minEstJaccard = 0.5).collect()
    assert(pairs.nonEmpty, "no candidate pairs found")
    // every candidate should be a planted (doc, doc+1000) pair
    val planted = pairs.count(r => r.getLong(1) == r.getLong(0) + 1000)
    assert(planted.toDouble / pairs.length >= 0.9,
      s"too many non-planted pairs: ${pairs.length - planted}/${pairs.length}")
    // recall: most of the 50 planted pairs surface (trimming 12 chars keeps
    // nearly all shingles identical)
    assert(planted >= 35, s"recall too low: $planted/50")
  }

  test("bucket cap suppresses a planted boilerplate bucket, keeps real pairs") {
    val s = spark
    import s.implicits._
    // 30 identical boilerplate docs (one giant bucket in EVERY band: 435
    // pairs) + 5 real docs with trimmed near-dup copies (buckets of 2)
    val real = s.table("documents").select("doc_id", "text")
      .filter(col("doc_id") < 5)
    val copies = real.select((col("doc_id") + 1000L).as("doc_id"),
      expr("substring(text, 1, greatest(length(text) - 12, 1))").as("text"))
    val boiler = (0 until 30)
      .map(i => (2000L + i, "lorem ipsum boilerplate footer text repeated"))
      .toDF("doc_id", "text")
    val corpus = real.unionAll(copies).unionAll(boiler)

    val capped = Dedup.minhashCandidates(corpus, minEstJaccard = 0.5,
        maxBucketSize = 10).collect()
    graft.llm.PipelineCaches.clear()
    assert(!capped.exists(r => r.getLong(0) >= 2000L),
      "over-cap boilerplate bucket must not generate candidate pairs")
    assert(capped.count(r => r.getLong(1) == r.getLong(0) + 1000) >= 3,
      "healthy small buckets must keep producing their pairs")

    // the audit names the excluded buckets and their sizes
    val audit = Dedup.oversizedBuckets(corpus, maxBucketSize = 10).collect()
    assert(audit.nonEmpty && audit.forall(_.getLong(2) == 30L),
      s"audit should report the 30-doc bucket per band: ${audit.mkString(",")}")

    // default cap = no behavioral change: boilerplate pairs come back
    val uncapped = Dedup.minhashCandidates(corpus, minEstJaccard = 0.5)
    assert(uncapped.filter(col("doc_a") >= 2000L).count() == 30L * 29 / 2)
    graft.llm.PipelineCaches.clear()
  }

  test("incremental candidates equal full recompute restricted to the batch") {
    val s = spark
    val d = s.table("documents").select("doc_id", "text")
      .filter(col("doc_id") < 120)
    val old = d.filter(col("doc_id") % 5 =!= 4)
    val fresh = d.filter(col("doc_id") % 5 === 4)
      .unionAll(d.filter(col("doc_id") % 10 === 0).select(
        (col("doc_id") + 100000L).as("doc_id"),
        expr("substring(text, 1, greatest(length(text) - 12, 1))").as("text")))
    val freshIds = fresh.select("doc_id").collect().map(_.getLong(0)).toSet

    val idx = Dedup.signatureIndex(old)
    val inc = Dedup.incrementalCandidates(idx, fresh)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val full = Dedup.minhashCandidates(old.unionAll(fresh))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      .filter(p => freshIds(p._1) || freshIds(p._2))
    assert(inc == full,
      s"incremental ${inc.size} pairs vs restricted-full ${full.size}")
    // the planted cross-batch dups (old doc, its trimmed copy) all surface
    val planted = inc.count(p => p._2 == p._1 + 100000L)
    assert(planted >= 10, s"only $planted/12 planted cross-batch dups found")
    graft.llm.PipelineCaches.clear()
  }

  test("retired docs stop producing candidates without an index rebuild") {
    val s = spark
    val d = s.table("documents").select("doc_id", "text")
      .filter(col("doc_id") < 60)
    val idx = Dedup.signatureIndex(d)
    // batch = trimmed copies of docs 0 and 10: each pairs with its original
    val fresh = d.filter(col("doc_id") === 0 || col("doc_id") === 10)
      .select((col("doc_id") + 100000L).as("doc_id"),
        expr("substring(text, 1, greatest(length(text) - 12, 1))").as("text"))
    val before = Dedup.incrementalCandidates(idx, fresh)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(before.contains((0L, 100000L)) && before.contains((10L, 100010L)))
    // retire doc 0 — its pair vanishes, doc 10's stays, nothing re-hashed
    val pruned = Dedup.retireFromIndex(idx, Seq(0L))
    val after = Dedup.incrementalCandidates(pruned, fresh)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!after.exists(p => p._1 == 0L || p._2 == 0L),
      s"retired doc still produces candidates: $after")
    assert(after.contains((10L, 100010L)))
    // DataFrame-shaped retire agrees
    import s.implicits._
    val viaDf = Dedup.retireFromIndex(idx, Seq(0L).toDF("doc_id"))
    assert(viaDf.filter(col("doc_id") === 0L).count() == 0)
    assert(viaDf.count() == pruned.count())
    graft.llm.PipelineCaches.clear()
  }

  test("compactIndexStore rewrites the persisted store minus retired docs") {
    val s = spark
    val dir = java.nio.file.Files
      .createTempDirectory("graft-sigidx").toString + "/index"
    val d = s.table("documents").select("doc_id", "text")
      .filter(col("doc_id") < 30)
    Dedup.signatureIndex(d).write.parquet(dir)
    val total = s.read.parquet(dir).count()
    val kept = Dedup.compactIndexStore(s, dir, Seq(1L, 2L))
    assert(kept == total - 2 * 4, "two docs × four band rows removed")
    val reread = s.read.parquet(dir)
    assert(reread.filter(col("doc_id").isin(1L, 2L)).count() == 0)
    assert(reread.count() == kept)
  }

  test("simhash pigeonhole pairs equal the brute-force hamming scan") {
    val s = spark
    val d = s.table("documents").select("doc_id", "text")
      .filter(col("doc_id") < 80)
    // identical copies (hamming 0) + trimmed copies (small, often > 0)
    val corpus = d
      .unionAll(d.select((col("doc_id") + 1000L).as("doc_id"), col("text")))
      .unionAll(d.select((col("doc_id") + 2000L).as("doc_id"),
        expr("substring(text, 1, greatest(length(text) - 12, 1))")
          .as("text")))
    val got = Dedup.simhashNearDup(corpus, maxHamming = 3, blocks = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // brute force: every pair, exact hamming — the pigeonhole guarantee
    // says the block join loses NOTHING at hamming <= blocks - 1
    val sigs = Dedup.simhash(corpus)
    val a = sigs.select(col("doc_id").as("doc_a"),
      col("simhash_bits").as("sa"))
    val b = sigs.select(col("doc_id").as("doc_b"),
      col("simhash_bits").as("sb"))
    val brute = a.crossJoin(b).filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        Dedup.hamming(col("sa"), col("sb")).as("h"))
      .filter(col("h") <= 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == brute,
      s"pigeonhole diverges from brute force by ${(got diff brute) ++ (brute diff got)}")
    // every planted identical copy surfaces at hamming 0
    assert((0L until 80L).forall(i => got.contains((i, i + 1000L, 0))))
    // the guarantee precondition is enforced
    intercept[IllegalArgumentException](
      Dedup.simhashNearDup(d, maxHamming = 4, blocks = 4))
    graft.llm.PipelineCaches.clear()
  }

  test("containment rescore catches subset duplication Jaccard misses") {
    val s = spark
    val d = s.table("documents").filter(col("doc_id") < 50)
    val excerpt = d.select((col("doc_id") + 100000L).as("doc_id"),
      expr("array_join(slice(split(text, ' '), 1, 15), ' ')").as("text"))
    val corpus = d.select("doc_id", "text").unionAll(excerpt)
    val cands = d.select((col("doc_id") + 100000L).as("doc_a"),
      col("doc_id").as("doc_b"))
    val nWords = d.select(col("doc_id"), size(split(col("text"), " ")))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val r = Dedup.containmentRescore(corpus, cands, k = 3).collect()
      .map(x => (x.getLong(0), x.getDouble(2), x.getDouble(3), x.getDouble(4)))
    assert(r.length == 50)
    r.foreach { case (a, ca, cb, j) =>
      // the excerpt's shingles are a subset of its source's
      assert(ca == 1.0, s"excerpt $a must be wholly contained, got $ca")
      assert(j <= cb + 1e-12 && cb <= ca + 1e-12)
      // for genuinely longer sources the symmetric scores stay well
      // below a dup threshold — the case a Jaccard-only rule waves
      // through (a ≤15-word doc's excerpt IS the doc; skip those)
      if (nWords(a - 100000L) >= 30)
        assert(j < 0.7 && cb < 0.7, s"excerpt $a: j=$j cb=$cb")
    }
    assert(nWords.values.count(_ >= 30) >= 20,
      "fixture must exercise the long-source case broadly")
  }

  test("cluster-balanced sample caps each cell and equals the window rank") {
    val s = spark
    val e = s.table("embeddings")
    val seeds = (1 to 16).map(_ * 5L)
    val got = Similarity.clusterBalancedSample(e, seeds, cap = 20)
    val perCell = got.groupBy("cell").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(perCell.values.forall(_ <= 20))
    // algorithm-independent reference: per-cell row_number over the same
    // assignment
    val centers = e.filter(col("vec_id").isin(seeds: _*))
      .orderBy("vec_id").collect()
      .map(_.getSeq[Float](1).map(_.toDouble).toArray)
    val ref = e.select(col("vec_id"),
      graft.functions.CellExpressions
        .maxCosineCell(col("embedding"), centers).as("cell"))
      .withColumn("cell_rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("cell")
          .orderBy("vec_id")))
      .filter(col("cell_rank") <= 20)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).sorted
    val gotRows = got.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).sorted
    assert(gotRows.toSeq == ref.toSeq)
  }

  test("jaccard rescore gives 1.0 for identical docs") {
    val s = spark
    val d = s.table("documents").select("doc_id", "text").filter(col("doc_id") < 10)
    val copy = d.select((col("doc_id") + 1000L).as("doc_id"), col("text"))
    val all = d.unionAll(copy)
    val cands = Dedup.minhashCandidates(all, minEstJaccard = 0.9)
    val rescored = Dedup.jaccardRescore(all, cands)
    val exact = rescored.filter(col("doc_b") === col("doc_a") + 1000)
    assert(exact.count() >= 8)
    assert(exact.filter(col("jaccard") =!= 1.0).count() == 0)
  }

  test("simhash: identical docs collide, distinct docs differ") {
    val s = spark
    val d = s.table("documents").select("doc_id", "text").filter(col("doc_id") < 20)
    val sigs = Dedup.simhash(d).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(sigs.values.forall(_.length == 64))
    // distinct word-soup docs should not all share a signature
    assert(sigs.values.toSet.size > 1)
    // hamming of a doc against itself is 0 via the column helper
    val two = Dedup.simhash(d.unionAll(
      d.filter(col("doc_id") === 0).select((col("doc_id") + 100L).as("doc_id"), col("text"))))
    val h = two.as("x").join(two.as("y"),
        col("x.doc_id") === 0 && col("y.doc_id") === 100)
      .select(Dedup.hamming(col("x.simhash_bits"), col("y.simhash_bits")))
      .collect()(0).getInt(0)
    assert(h == 0)
    // a NULL-text doc must keep its row (not silently vanish from dedup)
    import s.implicits._
    val withNull = d.unionAll(
      Seq((9999L, null.asInstanceOf[String])).toDF("doc_id", "text"))
    val nullSig = Dedup.simhash(withNull)
      .filter(col("doc_id") === 9999L).collect()
    assert(nullSig.length == 1 && nullSig(0).getString(1).length == 64)
    // same guarantee for the shingle-based family: NULL-text docs keep a
    // minhash signature row instead of nulling out of the candidate set
    val nullMinhash = Dedup.minhashSignatures(withNull)
      .filter(col("doc_id") === 9999L).collect()
    assert(nullMinhash.length == 1 && !nullMinhash(0).isNullAt(1))
  }

  test("brute-force ANN: k rows per query, valid scores, deterministic") {
    val s = spark
    val e = s.table("embeddings")
    val top = Similarity.bruteForceTopK(e, Seq(0L, 1L, 2L), k = 5)
    val rows = top.collect()
    assert(rows.length == 15)
    assert(rows.forall(r => math.abs(r.getDouble(2)) <= 1.000001))
    val again = Similarity.bruteForceTopK(e, Seq(0L, 1L, 2L), k = 5).collect()
    assert(rows.map(_.toString).sorted.sameElements(again.map(_.toString).sorted))
  }

  test("int8Distortion: exactly-representable vectors reconstruct with " +
    "zero error; half-rounding costs a positive err; zero vec is NULL " +
    "cosine") {
    val s = spark
    import s.implicits._
    // [127, 0]: scale 1, qvec exact -> err 0, cos 1
    // [64, 127]: scale 1, exact -> err 0, cos 1
    // [1, 0.5]: scale 1/127, q = [127, 64] (63.5 rounds up) -> err > 0
    // [0, 0]: scale 1, qvec zeros -> err 0, NULL cosine
    val exact = Seq(1L -> Seq(127.0f, 0.0f), 2L -> Seq(64.0f, 127.0f))
      .toDF("vec_id", "embedding")
    val re = Similarity.int8Distortion(exact).collect()(0)
    assert(re.getAs[Long]("n_vecs") == 2L)
    assert(re.getAs[Double]("mse") == 0.0)
    assert(re.getAs[Double]("mean_cos") == 1.0)
    val mixed = exact.unionAll(Seq(
      3L -> Seq(1.0f, 0.5f), 4L -> Seq(0.0f, 0.0f))
      .toDF("vec_id", "embedding"))
    val rm = Similarity.int8Distortion(mixed).collect()(0)
    assert(rm.getAs[Long]("n_vecs") == 4L)
    assert(rm.getAs[Double]("mse") > 0.0 && rm.getAs[Double]("mse") < 1e-4)
    // cosine mean over the 3 non-null rows, all ~1
    assert(rm.getAs[Double]("mean_cos") > 0.999 &&
      rm.getAs[Double]("mean_cos") <= 1.0)
  }

  test("int8 quantized top-k closely tracks the exact float-dot ranking") {
    val s = spark
    val e = s.table("embeddings").select("vec_id", "embedding")
    val queryIds = Seq(0L, 1L, 2L, 3L, 4L)
    val got = Similarity.int8TopK(e, queryIds, k = 10).collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getLong(1)).toSet).toMap

    // exact float-dot ground truth (same ranking family: inner product)
    val queries = e.filter(col("vec_id").isInCollection(queryIds))
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    val exact = e.crossJoin(broadcast(queries))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        Similarity.dot(col("embedding"), col("q_emb")).as("d"))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("query_id")
          .orderBy(col("d").desc, col("vec_id").asc)))
      .filter(col("rank") <= 10).collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getLong(1)).toSet).toMap

    val recalls = queryIds.map(q => got(q).intersect(exact(q)).size / 10.0)
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.8, s"int8 recall vs exact dot too low: $recalls")
    // quantization bounds: every element within [-127, 127]
    val qz = Similarity.quantizeInt8(e)
    assert(qz.filter(
      expr("exists(qvec, v -> v > 127 OR v < -127)")).count() == 0)
  }

  test("LSH ANN recalls a reasonable fraction of the exact top-k") {
    val s = spark
    val e = s.table("embeddings")
    val qids = Seq(0L, 1L, 2L, 3L, 4L)
    val exact = Similarity.bruteForceTopK(e, qids, k = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.lshTopK(e, qids, k = 10, planes = 12, bands = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    // random synthetic embeddings are the worst case for LSH (all pairs
    // near-orthogonal); planted-duplicate recall is pinned separately in
    // the cosineNearDup test
    assert(recall >= 0.3, s"LSH recall $recall too low")
  }

  test("random-projection ANN: exact rescore, solid recall vs brute force") {
    val s = spark
    val e = s.table("embeddings")
    val qids = Seq(0L, 1L, 2L, 3L, 4L)
    val exact = Similarity.bruteForceTopK(e, qids, k = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val rp = Similarity.rpTopK(e, qids, k = 10, outDim = 16, rerank = 30)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // the rescore stage is FULL precision: every surviving pair's score
    // must equal the brute-force cosine for that pair bit for bit
    rp.foreach { case (pair, score) =>
      exact.get(pair).foreach(ex => assert(ex == score,
        s"rescored $pair diverges: rp=$score exact=$ex"))
    }
    val recall = rp.keySet.intersect(exact.keySet).size.toDouble / exact.size
    // random 64-dim fixtures are the JL worst case (all near-orthogonal);
    // a 16-dim sketch with 3x rerank still recovers well above chance
    assert(recall >= 0.3, s"RP recall $recall too low")
    // a planted exact duplicate survives ANY projection: its projected
    // cosine is exactly 1, so it tops the coarse list and rescores to 1
    val dup = e.filter(col("vec_id") === 0L)
      .select(lit(9999L).as("vec_id"), col("embedding"), col("label"))
    val withDup = Similarity.rpTopK(e.unionAll(dup), Seq(0L), k = 1,
      outDim = 16, rerank = 30).collect()
    assert(withDup.head.getLong(1) == 9999L &&
      withDup.head.getDouble(2) == 1.0)
  }

  test("RP index round-trips through parquet and serves the identical " +
    "search") {
    val s = spark
    val e = s.table("embeddings")
    val qids = Seq(0L, 1L, 2L)
    val dir = java.nio.file.Files.createTempDirectory("rpidx").toString
    try {
      Similarity.saveRpIndex(e, dir, outDim = 16)
      val (sketches, outDim, dim) = Similarity.loadRpIndex(s, dir)
      assert(outDim == 16 && dim == 64)
      val fromStore = Similarity.searchRp(sketches, e, qids, k = 10,
        rerank = 30).collect().map(_.toString).sorted
      val inline = Similarity.rpTopK(e, qids, k = 10, outDim = 16,
        rerank = 30).collect().map(_.toString).sorted
      assert(fromStore.sameElements(inline),
        "persisted sketches must rank exactly like the inline projection")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("RP serving default keeps id-colliding corpus vectors; empty " +
    "corpus yields zero rows, not a crash") {
    val s = spark
    val e = s.table("embeddings")
    val proj = Similarity.rpSketches(e, 16, 64)
    // external query whose stream-assigned id happens to equal the TRUE
    // nearest neighbor's vec_id — the exclusion filter would silently
    // drop the right answer
    val qv = e.filter(col("vec_id") === 7L)
      .select(lit(7L).as("query_id"), col("embedding").as("q_emb"))
    val top = Similarity.searchRpQueries(proj, e, qv, 16, 64, k = 5)
      .orderBy("rank").collect()
    assert(top.head.getLong(1) == 7L && top.head.getDouble(2) == 1.0,
      "the id-colliding corpus vector must stay eligible by default")
    // the opt-in exclusion reproduces corpus-requery semantics
    val excl = Similarity.searchRpQueries(proj, e, qv, 16, 64, k = 5,
      excludeSelfId = true).collect().map(_.getLong(1))
    assert(!excl.contains(7L))
    // embeddingDim's empty-corpus contract: zero rows, right schema
    val empty = e.filter(lit(false))
    assert(Similarity.rpTopK(empty, Seq(0L), k = 5).count() == 0)
  }

  test("cosine near-dup finds planted duplicate embeddings") {
    val s = spark
    val e = s.table("embeddings").filter(col("vec_id") < 50)
    val copy = e.select((col("vec_id") + 1000L).as("vec_id"),
      col("embedding"), col("label"))
    val pairs = Similarity.cosineNearDup(e.unionAll(copy), threshold = 0.999)
      .collect()
    val planted = pairs.count(r => r.getLong(1) == r.getLong(0) + 1000)
    assert(planted >= 40, s"found only $planted/50 planted identical pairs")
  }

  test("embedding bucket cap excludes a planted degenerate bucket") {
    val s = spark
    val e = s.table("embeddings").filter(col("vec_id") < 20)
    // 30 copies of vector 0: a 31-member bucket in every band (465 pairs)
    val zero = e.filter(col("vec_id") === 0L)
    val degenerate = (1 to 30).map(i =>
      zero.select((col("vec_id") + 5000L + i * 10L).as("vec_id"),
        col("embedding"), col("label"))).reduce(_ unionAll _)
    // one healthy planted pair outside the degenerate cluster
    val copy7 = e.filter(col("vec_id") === 7L)
      .select((col("vec_id") + 1000L).as("vec_id"), col("embedding"), col("label"))
    val all = e.unionAll(degenerate).unionAll(copy7)
    val capped = Similarity.cosineNearDup(all, threshold = 0.999,
      maxBucketSize = 10).collect()
    assert(!capped.exists(r => r.getLong(0) >= 5000L && r.getLong(1) >= 5000L),
      "pairs inside the over-cap degenerate bucket must be excluded")
    assert(capped.exists(r => r.getLong(0) == 7L && r.getLong(1) == 1007L),
      "healthy two-member buckets must keep their pairs")
  }

  test("bpe-ish token count splits punctuation, rolling hash is order-sensitive") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, "hello, world!"),
      (2L, "hello world"),
      (3L, "world hello")).toDF("doc_id", "text")
    val counted = df.select(col("doc_id"),
      TextOps.bpeishTokenCount(col("text")).as("bpe"),
      TextOps.tokenCount(col("text")).as("ws"),
      TextOps.rollingHash(col("text")).as("rh")).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getLong(3))).toMap
    assert(counted(1)._1 == 4) // hello , world !
    assert(counted(1)._2 == 2) // whitespace only
    // same tokens, different order → different rolling hash
    assert(counted(2)._3 != counted(3)._3)
    // deterministic
    val again = df.select(TextOps.rollingHash(col("text"))).collect().map(_.getLong(0))
    assert(again.toSet == counted.values.map(_._3).toSet)
  }

  test("multimodal stub: plumbing is real, features deterministic") {
    val s = spark
    val joined = Multimodal.joined(s.table("documents"), s.table("embeddings"))
    assert(joined.schema("media").dataType.typeName == "struct")
    val feats = Multimodal.extractFeaturesStub(joined)
    val r = feats.join(s.table("documents"), Seq("doc_id"))
      .filter(col("byte_len") =!= col("n_chars")).count()
    assert(r == 0, "ascii fixture text: byte_len must equal n_chars")
    val f = feats.select("features").head().getSeq[Float](0)
    assert(f.length == 4)
    assert(f.forall(x => x >= 0f && x <= 1f))
  }

  test("image-header decode reads PNG and JPEG dimensions from raw bytes") {
    def pngBytes(w: Int, h: Int): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(24)
      b.put(Array(0x89, 'P'.toInt, 'N'.toInt, 'G'.toInt, 0x0d, 0x0a, 0x1a,
        0x0a).map(_.toByte))
      b.putInt(13).put("IHDR".getBytes("US-ASCII")).putInt(w).putInt(h)
      b.array()
    }
    def jpegBytes(w: Int, h: Int): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(24)
      b.put(Array(0xff, 0xd8).map(_.toByte))                 // SOI
      b.put(Array(0xff, 0xe0).map(_.toByte)).putShort(4)     // APP0 len 4
      b.putShort(0)
      b.put(Array(0xff, 0xc0).map(_.toByte)).putShort(17)    // SOF0
      b.put(8.toByte).putShort(h.toShort).putShort(w.toShort)
      b.put(Array(3, 1, 0).map(_.toByte))
      b.array()
    }
    assert(Multimodal.imageDims(pngBytes(640, 480)).contains(("png", 640, 480)))
    assert(Multimodal.imageDims(jpegBytes(1920, 1080))
      .contains(("jpeg", 1920, 1080)))
    assert(Multimodal.imageDims("plain text".getBytes("UTF-8")).isEmpty)
    assert(Multimodal.imageDims(Array.emptyByteArray).isEmpty)
    assert(Multimodal.imageDims(pngBytes(1, 1).take(10)).isEmpty, "truncated")

    // through the partition pass: image payloads decode, text stays NULL
    val s = spark
    import s.implicits._
    val payloads = Seq(
      (1L, pngBytes(320, 200)), (2L, jpegBytes(64, 32)),
      (3L, "not an image".getBytes("UTF-8")))
      .toDF("doc_id", "payload")
      .select(col("doc_id"),
        struct(lit("image").as("modality"),
          length(col("payload")).as("byte_len"),
          col("payload").as("payload")).as("media"))
    val out = Multimodal.imageHeaders(payloads).orderBy("doc_id").collect()
    assert(out.map(r => (r.getLong(0),
      Option(r.getString(2)), Option(r.get(3)), Option(r.get(4)))).toSeq ==
      Seq((1L, Some("png"), Some(320), Some(200)),
        (2L, Some("jpeg"), Some(64), Some(32)),
        (3L, None, None, None)))
  }

  test("imageDims never throws on arbitrary or adversarial bytes") {
    val rng = new scala.util.Random(42)
    (0 until 500).foreach { _ =>
      val b = Array.fill(rng.nextInt(64))(rng.nextInt(256).toByte)
      Multimodal.imageDims(b) // any outcome, no exception
    }
    // adversarial shapes: bare magic, marker padding, truncated segments
    assert(Multimodal.imageDims(Array(0x89, 'P'.toInt, 'N'.toInt, 'G'.toInt,
      0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)).isEmpty)
    assert(Multimodal.imageDims(Array.fill(32)(0xff.toByte)).isEmpty)
    assert(Multimodal.imageDims(
      Array(0xff, 0xd8).map(_.toByte) ++ Array.fill(30)(0xff.toByte)).isEmpty)
    assert(Multimodal.imageDims(
      Array(0xff, 0xd8, 0xff, 0xe0, 0x00, 0x00).map(_.toByte)).isEmpty,
      "zero-length segment must not loop or throw")
  }

  test("multimodal resize and frame-sample stubs keep the batch contracts") {
    val s = spark
    val joined = Multimodal.joined(s.table("documents"), s.table("embeddings"))

    val thumbs = Multimodal.resizeStub(joined, maxDim = 8)
    assert(thumbs.count() == joined.count()) // 1-to-1
    val t = thumbs.head()
    assert(t.getAs[Array[Byte]]("thumb").length <= 64)
    assert(t.getInt(1) >= t.getAs[Array[Byte]]("thumb").length)

    val frames = Multimodal.frameSampleStub(joined, every = 4)
    // 1-to-N: every doc with >= 1 byte yields its frame 0
    assert(frames.filter(col("frame_idx") === 0).count() == joined.count())
    // sampled indices are multiples of the stride
    assert(frames.filter(col("frame_idx") % 4 =!= 0).count() == 0)
    // frame count per doc matches ceil(bytes/64/4) for the fixture docs
    val perDoc = frames.groupBy("doc_id").count()
      .join(joined.select(col("doc_id"), col("media.byte_len").as("bl")),
        Seq("doc_id"))
    val bad = perDoc.filter(
      col("count") =!= ceil(ceil(col("bl") / 64.0) / 4.0).cast("long"))
    assert(bad.count() == 0)
  }

  test("abttTransform: an axis-aligned corpus collapses to zero " +
    "residuals with proj = the centered coordinate") {
    val s = spark
    import s.implicits._
    // variance only on dim 0: mean (3, 0), top PC = +x, so removal
    // eliminates everything — proj is the centered x, residual 0
    val embs = Seq(
      (1L, Seq(1f, 0f)), (2L, Seq(3f, 0f)), (3L, Seq(5f, 0f)))
      .toDF("vec_id", "embedding")
    val out = Similarity.abttTransform(embs).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(out == Map(
      1L -> ((-2.0, 0.0)), 2L -> ((0.0, 0.0)), 3L -> ((2.0, 0.0))),
      s"axis corpus must collapse exactly: $out")
    val e = intercept[IllegalArgumentException](
      Similarity.abttTransform(Seq((1L, Seq(2f, 2f)), (2L, Seq(2f, 2f)))
        .toDF("vec_id", "embedding")))
    assert(e.getMessage.contains("degenerate"))
    graft.llm.PipelineCaches.clear()
  }

  test("annRecallCard: perfect/swapped/missing method lists give " +
    "hand-exact recall and MRR") {
    val s = spark
    import s.implicits._
    val brute = Seq((0L, 10L, 1), (0L, 11L, 2))
      .toDF("query_id", "vec_id", "rank")
    val perfect = Seq((0L, 10L, 1), (0L, 11L, 2))
      .toDF("query_id", "vec_id", "rank")
    val swapped = Seq((0L, 11L, 1), (0L, 10L, 2))
      .toDF("query_id", "vec_id", "rank")
    val missTop = Seq((0L, 11L, 1), (0L, 99L, 2))
      .toDF("query_id", "vec_id", "rank")
    val out = Similarity.annRecallCard(brute,
        Seq("a_perfect" -> perfect, "b_swapped" -> swapped,
          "c_misstop" -> missTop), nQueries = 1, k = 2)
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2))).toMap
    assert(out("a_perfect") == ((1.0, 1.0)))
    assert(out("b_swapped") == ((1.0, 0.5)),
      "full recall but the true top-1 sits at rank 2")
    assert(out("c_misstop") == ((0.5, 0.0)),
      "half the set found, the true top-1 absent -> 0 MRR")
    graft.llm.PipelineCaches.clear()
    val e = intercept[IllegalArgumentException](
      Similarity.annRecallCard(brute, Seq.empty, 1, 2))
    assert(e.getMessage.contains("at least one method"))
    graft.llm.PipelineCaches.clear()
  }

  test("embNormCard: planted NULL/NaN/zero vectors are counted apart " +
    "and the finite-norm stats are hand-exact") {
    val s = spark
    import s.implicits._
    val embs = Seq(
      (1L, Seq(3f, 4f)), (2L, Seq(0f, 0f)), (3L, null: Seq[Float]),
      (4L, Seq(Float.NaN, 1f)), (5L, Seq(1f, 0f)), (6L, Seq(0f, 1f)))
      .toDF("vec_id", "embedding")
    val c = Similarity.embNormCard(embs).collect()(0)
    assert(c.getAs[Long]("n_vecs") == 6L)
    assert(c.getAs[Long]("n_null") == 1L)
    assert(c.getAs[Long]("n_nonfinite") == 1L)
    assert(c.getAs[Long]("n_zero") == 1L)
    // finite norms {5, 0, 1, 1}: mean 1.75; sorted [0,1,1,5] type-1
    // p10 = 0, p50 = 1, p90 = 5
    assert(c.getAs[Double]("mean_norm") == 1.75)
    assert(c.getAs[Double]("p10") == 0.0)
    assert(c.getAs[Double]("p50") == 1.0)
    assert(c.getAs[Double]("p90") == 5.0)
    graft.llm.PipelineCaches.clear()
    val e = intercept[IllegalArgumentException](
      Similarity.embNormCard(embs, maxDistinctNorms = 1L))
    assert(e.getMessage.contains("maxDistinctNorms"))
    graft.llm.PipelineCaches.clear()
  }

  test("mmrRerank: hand-computed greedy trajectory — a perfect near-dup " +
    "is demoted below the diverse candidate, ties break on vec_id") {
    val s = spark
    import s.implicits._
    // integer 3-D vectors (exact float32, perfect-square norms): query
    // (1,0,0); all three candidates tie at rel .8 — id2 is PARALLEL to
    // id1 (sim 1.0), id3 is diverse (sim .64 to both)
    val embs = Seq(
      (0L, Seq(1f, 0f, 0f)), (1L, Seq(4f, 0f, 3f)),
      (2L, Seq(8f, 0f, 6f)), (3L, Seq(4f, 3f, 0f)))
      .toDF("vec_id", "embedding")
    val out = Similarity.mmrRerank(embs, queryId = 0L, k = 3, pool = 3)
      .collect().map(r => (r.getInt(0), r.getLong(1),
        r.getDouble(2), r.getDouble(3)))
    // pure relevance (rel desc, vec_id asc) would order 1, 2, 3 — MMR
    // demotes the exact near-dup id2 BELOW the equally-relevant diverse
    // id3; the rank-1 three-way rel tie resolves to the smallest vec_id
    assert(out.toSeq == Seq(
      (1, 1L, 0.8, 0.56),     // 0.7*0.8, redundancy term over empty set
      (2, 3L, 0.8, 0.368),    // 0.56 - 0.3*0.64
      (3, 2L, 0.8, 0.26)),    // 0.56 - 0.3*1.0
      s"greedy trajectory mismatch: ${out.toSeq}")
    graft.llm.PipelineCaches.clear()
    val e1 = intercept[IllegalArgumentException](
      Similarity.mmrRerank(embs, queryId = 99L))
    assert(e1.getMessage.contains("not found"))
    val e2 = intercept[IllegalArgumentException](
      Similarity.mmrRerank(embs, queryId = 0L, k = 6, pool = 4))
    assert(e2.getMessage.contains("pool"))
    graft.llm.PipelineCaches.clear()
  }
}
