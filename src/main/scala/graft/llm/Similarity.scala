package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.CrossEngine.normZero

/** Similarity search over an embedding column (`Array[Float]`) — the ANN
  * operators a training-data pipeline needs (SURVEY §2.8).
  *
  * Baseline: brute-force cosine top-k for a small query set — queries are
  * broadcast (tiny side), candidates stream through one projection, ranking
  * is a bounded-heap partial aggregate (graft.plans.TopK). At 100 TB the
  * scale path is the hyperplane-LSH variant: bucket join on signature, so
  * each embedding only meets its bucket.
  *
  * Dot products fold element-wise in index order with double accumulation
  * (`aggregate(zip_with(...))`) — deterministic and reproducible by the
  * DuckDB oracle; scores are rounded before ranking so last-ulp differences
  * between engines cannot flip the top-k.
  */
object Similarity {

  /** element-order double fold of a ⋅ b — a native codegen Expression
    * (graft.functions.VecDot); result-identical to the composable
    * `aggregate(zip_with(...))` form but ~10× faster (no intermediate
    * array, no interpreted lambdas). */
  def dot(a: Column, b: Column): Column = graft.functions.VecDot.vecDot(a, b)

  /** Deterministic top-k per query — (cos_sim desc, vec_id asc) via the
    * bounded-heap partial aggregate (graft.plans.TopK), so with thousands
    * of concurrent queries the shuffle carries k rows per query per
    * partition, never every scored candidate. Result-identical to a
    * row_number window (the DuckDB oracles still hash-match). */
  private def rankTopK(scored: DataFrame, k: Int): DataFrame =
    graft.plans.TopK.topKPerKey(scored, Seq("query_id"),
      Seq(col("cos_sim"), negate(col("vec_id"))), k)
      .select("query_id", "vec_id", "cos_sim", "rank")

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** [[cosine]], NULL when either vector has zero norm — the DEDUP
    * rescore semantics: an all-zero embedding (bad upstream
    * featurization) is no one's duplicate. Plain `cosine` would make the
    * 0/0 division THROW under ANSI and kill the corpus-scale job; worse,
    * a NaN that leaked into `>= threshold` would compare TRUE under
    * Spark's NaN-is-largest ordering and silently flag every cellmate as
    * a dup. NULL comparisons drop the pair instead, which is also what
    * DuckDB's NULL-on-zero-division replays. The ANN scoring paths keep
    * strict [[cosine]]: there a zero vector fails loudly rather than
    * silently ranking.
    *
    * Non-finite inputs get the same NULL treatment: an embedding
    * carrying NaN/Infinity yields a NaN similarity, and `NaN >=
    * threshold` is TRUE under Spark's NaN-is-largest ordering — the
    * identical flag-every-cellmate failure mode as the zero-norm case,
    * one step later. `nanvl` nulls those with ONE evaluation of the
    * division (no duplicated dot products for subexpression elimination
    * to rescue), and the guard tests the multiplied DENOMINATOR rather
    * than the two norms so a denormal-underflow 0 (the only route to a
    * ±Infinity ratio — Cauchy–Schwarz caps |dot| ≤ |a|·|b| otherwise)
    * is caught by the same branch as a true zero norm. */
  def cosineOrNull(a: Column, b: Column): Column = {
    val den = sqrt(dot(a, a)) * sqrt(dot(b, b))
    when(den === 0, lit(null).cast("double"))
      .otherwise(nanvl(dot(a, b) / den, lit(null).cast("double")))
  }

  /** Per-group centroid cosine — the embedding-space quality/outlier
    * signal (a doc far from its own domain's centroid is mislabeled,
    * noise, or genuinely novel; SemDeDup's cluster-distance cousin).
    * Because cosine is scale-invariant, the centroid never needs the
    * division by n: the group SUM vector points the same direction, so
    * the per-dim sums — accumulated as 12-dp DECIMAL after a 12-dp
    * pre-round of each float (the temperatureShares convention: the
    * pre-round makes the decimal cast exact, the DECIMAL sum makes it
    * partition-order independent) — ARE the centroid, exactly
    * DuckDB-replayable with no decimal-division semantics in sight.
    *
    * Scale shape: one posexplode pass partial-aggregated to
    * (groups × dims) rows, rebuilt into per-group arrays (bounded), then
    * broadcast back onto the embedding relation — the corpus is read
    * twice (sum pass + attach), shuffles carry only the bounded sums.
    * Zero-norm vectors or centroids score NULL ([[cosineOrNull]]). */
  def centroidCosine(embs: DataFrame, groupCol: String): DataFrame = {
    val dims = embs.select(col(groupCol).as("_g"),
      posexplode(col("embedding")).as(Seq("_pos", "_x")))
    val sums = dims.groupBy("_g", "_pos")
      .agg(sum(round(col("_x").cast("double"), 12)
        .cast(org.apache.spark.sql.types.DecimalType(28, 12))).as("_s"))
    val cents = sums.groupBy("_g")
      .agg(transform(array_sort(collect_list(struct(col("_pos"), col("_s")))),
        s => s.getField("_s").cast("double")).as("_cent"))
    embs.join(broadcast(cents), col(groupCol) === col("_g"))
      .select(col("vec_id"), col(groupCol),
        round(cosineOrNull(col("embedding"), col("_cent")), 6)
          .as("centroid_cos"))
  }

  /** Brute-force cosine top-k: for each query vector (by vec_id), the k
    * nearest other vectors. Rank on the rounded score with vec_id
    * tie-break (deterministic across engines). */
  def bruteForceTopK(
      embeddings: DataFrame, queryIds: Seq[Long], k: Int = 10): DataFrame = {
    val queries = embeddings
      .filter(col("vec_id").isInCollection(queryIds))
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    val scored = embeddings
      .crossJoin(broadcast(queries))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        normZero(round(cosine(col("q_emb"), col("embedding")), 6)).as("cos_sim"))
    rankTopK(scored, k)
  }

  /** ANN recall/MRR governance card — the measured-quality row shipped
    * beside every approximate index ([[lshRecallAudit]] is dedup's;
    * this is retrieval's): per method, recall@k against the brute-force
    * ground truth and the mean reciprocal rank of each query's TRUE
    * top-1 inside the method's list (absent → 0 contribution). The
    * number that decides whether an index's speed is worth its misses.
    *
    * Reciprocal ranks are 12-dp-decimal rounded then exactly summed
    * (order-independent), one division per statistic at the end — the
    * catalog's decimal discipline, so the oracle composes the per-method
    * replay oracles and hash-matches.
    *
    * Scale shape: each method pipeline keeps its own envelope; the card
    * itself joins (queries×k)-bounded rank relations — the brute table
    * persists once and serves every method comparison. */
  def annRecallCard(brute: DataFrame, methods: Seq[(String, DataFrame)],
      nQueries: Int, k: Int): DataFrame = {
    require(nQueries > 0, s"nQueries must be positive, got $nQueries")
    require(k > 0, s"k must be positive, got $k")
    require(methods.nonEmpty, "need at least one method to audit")
    val b = PipelineCaches.track(brute
      .select("query_id", "vec_id", "rank")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    // recall denominator = the ACTUAL ground-truth row count, not the
    // assumed nQueries*k: a corpus smaller than k+1 (or a filtered query
    // set) yields fewer brute rows per query, and dividing by the
    // assumption would understate recall with no way to ever reach 1.0
    // (round-14 advice fix). The count is one bounded action on the
    // already-persisted (queries×k)-max relation; at fixture scale it
    // equals nQueries*k, so established oracle hashes are unchanged.
    val gtRows = b.count()
    require(gtRows > 0, "annRecallCard: empty ground-truth relation")
    methods.map { case (name, m) =>
      val mm = m.select(col("query_id"), col("vec_id"),
        col("rank").as("_mrank"))
      b.join(mm, Seq("query_id", "vec_id"))
        .agg(
          count(lit(1)).as("_match"),
          coalesce(sum(when(col("rank") === 1,
              round(lit(1.0) / col("_mrank"), 12)
                .cast("decimal(16,12)"))),
            lit(0).cast("decimal(16,12)")).as("_rrsum"))
        .select(lit(name).as("method"),
          round(col("_match").cast("double") /
            lit(gtRows.toDouble), 6).as("recall_at_k"),
          round(col("_rrsum").cast("double") /
            lit(nQueries.toDouble), 6).as("mrr"))
    }.reduce(_.unionByName(_)).orderBy("method")
  }

  /** Embedding L2-norm distribution card — the featurization-health
    * read no similarity operator should run without: NULL embeddings,
    * non-finite norms (a NaN/Inf element anywhere surfaces here), exact
    * zero vectors (dead encoders — silently "similar" to nothing under
    * [[cosineOrNull]] and loudly fatal under [[cosine]]), plus the
    * mean and type-1 p10/p50/p90 of the finite norms.
    *
    * ONE corpus pass: everything reads a single (6-dp-norm, count)
    * histogram — counts are CASE sums over it, the mean is an exact
    * DECIMAL weighted sum, and the quantiles are the established
    * cumulative-histogram mins ([[Sampling.groupedQuantiles]]'s trick
    * on one group, with the same cardinality guard: distinct 6-dp norms
    * are data-dependent, so the guard refuses loudly rather than
    * letting the histogram grow corpus-sized — discretize coarser at
    * 100 TB). */
  def embNormCard(embs: DataFrame,
      maxDistinctNorms: Long = 1000000L): DataFrame = {
    val hist = PipelineCaches.track(embs
      .select(when(col("embedding").isNull, lit(null).cast("double"))
        .otherwise(round(norm(col("embedding")), 6)).as("_nrm"))
      .groupBy("_nrm").agg(count(lit(1)).as("_c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val distinct = hist.count()
    require(distinct <= maxDistinctNorms,
      s"embNormCard: $distinct distinct 6-dp norms exceed " +
        s"maxDistinctNorms=$maxDistinctNorms; discretize the norms " +
        "coarser or raise the cap explicitly.")
    val bad = isnan(col("_nrm")) || col("_nrm") === Double.PositiveInfinity
    val clean = col("_nrm").isNotNull && !bad
    val counts = hist.agg(
      sum("_c").cast("bigint").as("n_vecs"),
      coalesce(sum(when(col("_nrm").isNull, col("_c"))), lit(0L))
        .cast("bigint").as("n_null"),
      coalesce(sum(when(col("_nrm").isNotNull && bad, col("_c"))),
        lit(0L)).cast("bigint").as("n_nonfinite"),
      coalesce(sum(when(col("_nrm") === 0.0, col("_c"))), lit(0L))
        .cast("bigint").as("n_zero"),
      round(sum(when(clean, col("_nrm").cast("decimal(18,6)") * col("_c")))
          .cast("double") /
        sum(when(clean, col("_c"))), 6).as("mean_norm"))
    val wCum = Window.partitionBy(lit(0)).orderBy("_nrm")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wTot = Window.partitionBy(lit(0))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val q = hist.filter(clean)
      .withColumn("_cum", sum("_c").over(wCum))
      .withColumn("_n", sum("_c").over(wTot))
      .agg(
        min(when(col("_cum") >= ceil(lit(0.1) * col("_n")), col("_nrm")))
          .as("p10"),
        min(when(col("_cum") >= ceil(lit(0.5) * col("_n")), col("_nrm")))
          .as("p50"),
        min(when(col("_cum") >= ceil(lit(0.9) * col("_n")), col("_nrm")))
          .as("p90"))
    counts.crossJoin(broadcast(q))
  }

  /** MMR diversified re-rank (Carbonell & Goldstein 1998, "The Use of
    * MMR ... in Retrieval and Summarization") — the RAG-tier answer to
    * near-duplicate retrieval hits: greedily pick `k` of the `pool`
    * most-relevant candidates, each next pick maximizing
    * λ·rel(d) − (1−λ)·max_{s∈S} sim(d, s) (ties → smaller vec_id).
    * First pick's redundancy term is max over ∅, defined 0.
    *
    * Determinism is the catalog's decimal discipline: rel and pairwise
    * sims are 6-dp-rounded cosines (the proven [[cosine]]/oracle pair),
    * λ is an exact decimal, so every MMR score is an exact 7-dp decimal
    * and the greedy argmax ordering is engine-independent — the oracle
    * replays all k picks as a generated CTE chain.
    *
    * Scale shape: relevance scoring is the [[bruteForceTopK]] envelope
    * (broadcast one query, one corpus projection, TakeOrdered pool
    * rows); everything after is pool-bounded — the pool×pool sim matrix
    * (distributed, then collected: pool² ≤ 256 rows, the centroid-table
    * convention) and a driver-local greedy over ≤ pool decimals. At
    * 100 TB swap the candidate generator for [[lshTopK]]/[[searchIvf]];
    * the MMR stage is scale-free. */
  /** [[mmrRerank]]'s corpus-scale half, split out so the plan audit can
    * pin its shape: broadcast one query row, one scored corpus
    * projection, TakeOrdered `pool` rows. */
  private[graft] def mmrCandidates(embeddings: DataFrame, queryId: Long,
      pool: Int): DataFrame = {
    val qv = embeddings.filter(col("vec_id") === queryId)
      .select(col("embedding").as("_q"))
    embeddings.filter(col("vec_id") =!= queryId)
      .crossJoin(broadcast(qv))
      .select(col("vec_id"),
        normZero(round(cosine(col("_q"), col("embedding")), 6)).as("rel"),
        col("embedding"))
      .orderBy(col("rel").desc, col("vec_id").asc).limit(pool)
  }

  def mmrRerank(embeddings: DataFrame, queryId: Long = 0L, k: Int = 5,
      pool: Int = 16, lambda: BigDecimal = BigDecimal("0.7")): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(pool >= k, s"pool must be >= k, got pool=$pool k=$k")
    require(lambda > 0 && lambda <= 1,
      s"lambda must be in (0, 1], got $lambda")
    val spark = embeddings.sparkSession
    val qv = embeddings.filter(col("vec_id") === queryId)
      .select(col("embedding").as("_q"))
    require(!qv.isEmpty, s"mmrRerank: query vec_id $queryId not found")
    val cands = PipelineCaches.track(
      mmrCandidates(embeddings, queryId, pool)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    // bounded collects: pool (vec_id, rel) rows + the pool^2 sim matrix
    val rel: Seq[(Long, BigDecimal)] = cands.select("vec_id", "rel")
      .collect().map(r => r.getLong(0) -> BigDecimal(r.getDouble(1))).toSeq
    val a = cands.select(col("vec_id").as("_va"), col("embedding").as("_ea"))
    val b = cands.select(col("vec_id").as("_vb"), col("embedding").as("_eb"))
    val sim: Map[(Long, Long), BigDecimal] = a.crossJoin(broadcast(b))
      .filter(col("_va") =!= col("_vb"))
      .select(col("_va"), col("_vb"),
        normZero(round(cosine(col("_ea"), col("_eb")), 6)).as("_s"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> BigDecimal(r.getDouble(2)))
      .toMap
    val oneMinus = BigDecimal(1) - lambda
    val picked = scala.collection.mutable.ListBuffer.empty[(Int, Long,
      BigDecimal, BigDecimal)]
    val remaining = scala.collection.mutable.LinkedHashMap(rel: _*)
    var rank = 1
    while (rank <= k && remaining.nonEmpty) {
      val scoredRem = remaining.toSeq.map { case (v, r) =>
        val ms =
          if (picked.isEmpty) BigDecimal(0)
          else picked.map(p => sim((v, p._2))).max
        (v, r, lambda * r - oneMinus * ms)
      }
      val (v, r, s) = scoredRem.minBy { case (v, _, s) => (-s, v) }
      picked += ((rank, v, r, s))
      remaining.remove(v)
      rank += 1
    }
    import spark.implicits._
    picked.toSeq
      .map(p => (p._1, p._2, p._3.doubleValue, p._4.doubleValue))
      .toDF("rank", "vec_id", "rel", "mmr_score")
  }

  /** Two-stage ANN via signed random projection (Johnson–Lindenstrauss):
    * project every embedding to `outDim` dims with the ±1 MD5-parity
    * matrix ([[graft.functions.SignedProjection]] — one zero-shuffle
    * native pass), take the `rerank` nearest per query by PROJECTED
    * cosine, then rescore only those candidates at full precision. The
    * coarse pass touches outDim doubles per vector instead of dim (4×
    * less memory traffic at 64→16), and the exact pass touches only
    * `rerank` rows per query — the standard coarse-filter/exact-rescore
    * shape, with a deterministic projection so the whole pipeline
    * replays in the DuckDB oracle.
    *
    * Scale shape: the projection is a per-row native expression (no
    * shuffle); the coarse top-`rerank` runs through the bounded-heap
    * [[graft.plans.TopK]] carrying only (query_id, vec_id, score); the
    * rescore joins candidates back to the embedding store by vec_id —
    * `rerank·|queries|` rows, broadcast-joinable. Recall vs the exact
    * top-k is pinned in `SimilaritySpec`. */
  def rpTopK(
      embeddings: DataFrame, queryIds: Seq[Long], k: Int = 10,
      outDim: Int = 16, rerank: Int = 30): DataFrame = {
    val dim = embeddingDim(embeddings)
    val proj = rpSketches(embeddings, outDim, dim)
    searchRp(proj, embeddings, queryIds, k, rerank)
  }

  /** The storable sketch table: (vec_id, _rp) — outDim doubles per
    * vector, the coarse half of a persisted [[saveRpIndex]] store. The
    * ±1 matrix is derived from MD5-parity constants, so the "index"
    * carries no model artifact beyond its two dimensions. dim 0 (an
    * empty corpus, [[embeddingDim]]'s documented signal) yields an
    * empty sketch table with the right schema — zero rows downstream,
    * never an expression-construction crash. */
  def rpSketches(embeddings: DataFrame, outDim: Int, dim: Int): DataFrame =
    if (dim == 0)
      // NULL (not an empty-array literal): the zero-row branch still
      // constant-folds projected expressions, and cosine over a folded
      // empty array is an ANSI 0/0 at PLAN time; cosine(NULL) folds to
      // NULL instead
      embeddings.filter(lit(false)).select(col("vec_id"),
        lit(null).cast("array<double>").as("_rp"))
    else embeddings
      .filter(col("embedding").isNotNull)
      .select(col("vec_id"),
        graft.functions.MatchExpressions
          .signedProjection(col("embedding"), outDim, dim).as("_rp"))

  /** Search a sketch table (inline-built or [[loadRpIndex]]-loaded):
    * coarse top-`rerank` per query by projected cosine, exact rescore
    * against the full-precision store by id. */
  def searchRp(
      proj: DataFrame, embeddings: DataFrame, queryIds: Seq[Long],
      k: Int = 10, rerank: Int = 30): DataFrame = {
    require(rerank >= k, s"rerank ($rerank) must be >= k ($k)")
    val queries = proj.filter(col("vec_id").isInCollection(queryIds))
      .select(col("vec_id").as("query_id"), col("_rp").as("_q_rp"))
    val coarse = proj.crossJoin(broadcast(queries))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        normZero(round(cosine(col("_q_rp"), col("_rp")), 6)).as("rp_sim"))
    val cand = graft.plans.TopK.topKPerKey(coarse, Seq("query_id"),
      Seq(col("rp_sim"), negate(col("vec_id"))), rerank)
      .select("query_id", "vec_id")
    val qEmb = embeddings.filter(col("vec_id").isInCollection(queryIds))
      .select(col("vec_id").as("query_id"), col("embedding").as("_q_emb"))
    val rescored = cand
      .join(broadcast(qEmb), Seq("query_id"))
      .join(embeddings.select(col("vec_id"), col("embedding")), Seq("vec_id"))
      .select(col("query_id"), col("vec_id"),
        normZero(round(cosine(col("_q_emb"), col("embedding")), 6))
          .as("cos_sim"))
    rankTopK(rescored, k)
  }

  /** Persist the RP sketch store: the sketch table plus a one-row meta
    * table (outDim, dim). No codebook artifact exists — the projection
    * matrix regenerates from its MD5-parity definition on load, so the
    * store is valid on any cluster that shares the code. Composes with
    * [[graft.scale.StoreMaint.replaceStore]] like the PQ store. */
  def saveRpIndex(
      embeddings: DataFrame, path: String, outDim: Int = 16): Unit = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val dim = embeddingDim(embeddings)
    rpSketches(embeddings, outDim, dim)
      .write.mode("overwrite").parquet(s"$path/sketches")
    Seq((outDim, dim)).toDF("out_dim", "dim")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
  }

  /** Reload: meta is a one-row collect; sketches stay a distributed
    * scan. Returns (sketches, outDim, dim). */
  def loadRpIndex(spark: org.apache.spark.sql.SparkSession, path: String)
      : (DataFrame, Int, Int) = {
    val meta = spark.read.parquet(s"$path/meta").collect().head
    (spark.read.parquet(s"$path/sketches"), meta.getInt(0), meta.getInt(1))
  }

  /** APPEND a new shard to a persisted [[saveRpIndex]] store without
    * touching the existing corpus (r14 verdict task 3 — production index
    * upkeep is append + retire, not full rebuild): only the shard pays
    * projection cost, written as an append to the sketch table. Search
    * over the appended store is EXACTLY search over a full rebuild —
    * the ±1 matrix is a pure function of the store's (outDim, dim) meta,
    * so there is no model artifact that could drift between the original
    * build and the append (the oracle entry re-proves the equality every
    * round). Ids must be disjoint from the stored ones (the
    * [[graft.llm.Dedup.incrementalCandidates]] contract). A shard whose
    * embedding width disagrees with the store's meta fails loudly here —
    * silently mis-projected sketches would corrupt every later search. */
  def appendToRpIndex(spark: org.apache.spark.sql.SparkSession,
      path: String, newShard: DataFrame): Unit = {
    val meta = spark.read.parquet(s"$path/meta").collect().head
    val (outDim, dim) = (meta.getInt(0), meta.getInt(1))
    val shardDim = embeddingDim(newShard)
    require(shardDim == 0 || shardDim == dim,
      s"appendToRpIndex: shard embedding dim $shardDim != store dim $dim")
    rpSketches(newShard, outDim, dim)
      .write.mode("append").parquet(s"$path/sketches")
  }

  /** Retire vectors from a loaded RP sketch table without re-projecting
    * anything — the id set anti-joins away in one pass (broadcast: retire
    * batches are small relative to any corpus). The
    * [[graft.llm.Dedup.retireFromIndex]] contract for the ANN tier. */
  def retireFromRpIndex(sketches: DataFrame, retiredIds: DataFrame)
      : DataFrame =
    sketches.join(broadcast(retiredIds.select(col("vec_id"))),
      Seq("vec_id"), "left_anti")

  /** [[retireFromRpIndex]] for a driver-held id batch. */
  def retireFromRpIndex(sketches: DataFrame, retiredIds: Seq[Long])
      : DataFrame =
    sketches.filter(!col("vec_id").isInCollection(retiredIds))

  /** In-place maintenance of a parquet-persisted RP store: drop retired
    * vectors and rewrite the sketch table once — also compacting the
    * small files appends accumulate (the
    * [[graft.llm.Dedup.compactIndexStore]] discipline; swap safety via
    * [[graft.scale.StoreMaint.replaceStore]]). Returns retained rows. */
  def compactRpIndexStore(spark: org.apache.spark.sql.SparkSession,
      path: String, retiredIds: Seq[Long]): Long =
    graft.scale.StoreMaint.replaceStore(spark, s"$path/sketches",
      retireFromRpIndex(spark.read.parquet(s"$path/sketches"), retiredIds))

  /** [[searchRp]] for EXTERNAL query vectors (the serving path): queries
    * arrive as (query_id, q_emb) rows rather than corpus ids — each is
    * projected with the same matrix, coarse-matched against the sketch
    * store, and exactly rescored against the full-precision store.
    *
    * `excludeSelfId` is OFF by default, deliberately: stream-assigned
    * query ids and store vec_ids are INDEPENDENT namespaces (both
    * usually small sequential longs), so an id-equality filter would
    * silently drop an unrelated corpus vector that merely shares the
    * number — possibly the true nearest neighbor. Set it true ONLY when
    * query_id is known to reference the same vector as the store row
    * (re-querying the corpus by id), where it reproduces [[rpTopK]]'s
    * self-exclusion. */
  def searchRpQueries(
      proj: DataFrame, store: DataFrame, queryVecs: DataFrame,
      outDim: Int, dim: Int, k: Int = 10, rerank: Int = 30,
      excludeSelfId: Boolean = false): DataFrame = {
    require(rerank >= k, s"rerank ($rerank) must be >= k ($k)")
    if (dim == 0)
      return queryVecs.filter(lit(false)).select(
        col("query_id"), col("query_id").as("vec_id"),
        lit(0.0).as("cos_sim"), lit(0).cast("int").as("rank"))
    val q = queryVecs.select(col("query_id"),
      graft.functions.MatchExpressions
        .signedProjection(col("q_emb"), outDim, dim).as("_q_rp"),
      col("q_emb"))
    val fanned = proj.crossJoin(broadcast(q.select("query_id", "_q_rp")))
    val coarse = (if (excludeSelfId)
        fanned.filter(col("vec_id") =!= col("query_id"))
      else fanned)
      .select(col("query_id"), col("vec_id"),
        normZero(round(cosine(col("_q_rp"), col("_rp")), 6)).as("rp_sim"))
    val cand = graft.plans.TopK.topKPerKey(coarse, Seq("query_id"),
      Seq(col("rp_sim"), negate(col("vec_id"))), rerank)
      .select("query_id", "vec_id")
    val rescored = cand
      .join(broadcast(q.select("query_id", "q_emb")), Seq("query_id"))
      .join(store.select(col("vec_id"), col("embedding")), Seq("vec_id"))
      .select(col("query_id"), col("vec_id"),
        normZero(round(cosine(col("q_emb"), col("embedding")), 6))
          .as("cos_sim"))
    rankTopK(rescored, k)
  }

  /** Per-vector symmetric int8 quantization: scale = max|x|/127, element
    * q = round(x/scale) ∈ [−127, 127] — the standard first compression
    * step for an embedding store (4× smaller than float32, ~16× smaller
    * than the float64 Spark would otherwise shuffle). Pure projection, no
    * shuffle; all-zero vectors quantize to zeros under scale 1. */
  def quantizeInt8(embeddings: DataFrame, embCol: String = "embedding")
      : DataFrame = {
    val absMax = array_max(transform(col(embCol), x => abs(x)))
    embeddings
      .withColumn("scale",
        when(absMax === 0, lit(1.0)).otherwise(absMax.cast("double") / lit(127.0)))
      .withColumn("qvec",
        transform(col(embCol),
          x => round(x.cast("double") / col("scale")).cast("int")))
  }

  /** Int8 reconstruction-DISTORTION card — [[Pq.pqDistortion]]'s twin
    * for the symmetric-int8 store ([[quantizeInt8]]): ONE row with the
    * mean squared error |x − scale·q|² and mean cosine(x, q) over the
    * corpus (scale cancels in the cosine). The 4×-compression quality
    * row; read next to the PQ card when choosing the store format.
    *
    * Exactly oracle-replayable: the integer self-dot is exact
    * (order-independent), |x|² and x·q fold in element order (VecDot),
    * err combines as ((xx − (2·scale)·xq) + (scale·scale)·qq) — the
    * associativity the oracle spells out; per-row terms 12-dp DECIMAL
    * sums. Zero vectors err 0 with a NULL cosine (excluded from the
    * cosine mean only).
    *
    * Scale shape: one corpus projection (quantize + three folds), then
    * a 1-row aggregate; no joins, no shuffle beyond the final agg. */
  def int8Distortion(embeddings: DataFrame): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(28, 12)
    val terms = quantizeInt8(embeddings.filter(col("embedding").isNotNull))
      .select(col("scale"),
        graft.functions.VecDot.vecDot(col("embedding"), col("embedding"))
          .as("_xx"),
        graft.functions.VecDot.vecDot(col("embedding"),
          col("qvec").cast("array<double>")).as("_xq"),
        graft.functions.MatchExpressions.intVecDot(col("qvec"), col("qvec"))
          .cast("double").as("_qq"))
    val perRow = terms.select(
      round(col("_xx") - lit(2.0) * col("scale") * col("_xq") +
        col("scale") * col("scale") * col("_qq"), 12).cast(dec).as("_err"),
      when(col("_xx") * col("_qq") === 0, lit(null).cast(dec))
        .otherwise(round(col("_xq") / sqrt(col("_xx") * col("_qq")), 12)
          .cast(dec)).as("_cos"))
    perRow.agg(
      count(lit(1)).cast("bigint").as("n_vecs"),
      round(sum("_err").cast("double") /
        count(lit(1)).cast("double"), 6).as("mse"),
      round(sum("_cos").cast("double") /
        count(col("_cos")).cast("double"), 6).as("mean_cos"))
  }

  /** Exact integer dot of two int8 vectors (element-order fold; ≤ 127²
    * per element never overflows the long accumulator). Native codegen
    * expression ([[graft.functions.IntVecDot]]) — result-identical to the
    * `aggregate(zip_with(...))` fold, without the interpreted lambdas or
    * the intermediate array. */
  def int8Dot(qa: Column, qb: Column): Column =
    graft.functions.MatchExpressions.intVecDot(qa, qb)

  /** Brute-force top-k in int8 space: score = intDot · scale_a · scale_q
    * (the dequantized approximate inner product). The integer dot is
    * exact and order-independent; only the two per-vector scales touch
    * floating point, so the score is engine-reproducible and the memory
    * traffic per vector is a quarter of the float32 baseline. Recall vs
    * the exact float top-k is test-pinned. */
  def int8TopK(
      embeddings: DataFrame, queryIds: Seq[Long], k: Int = 10): DataFrame = {
    val q = quantizeInt8(embeddings)
    // the query side re-references the quantization projection — persist
    // the (tiny, |queryIds|-row) branch so it evaluates once rather than
    // per consumer of the broadcast (same repeated-branch fix as
    // cosineNearDup's banding path)
    val queries = PipelineCaches.track(
      q.filter(col("vec_id").isInCollection(queryIds))
        .select(col("vec_id").as("query_id"),
          col("qvec").as("q_qvec"), col("scale").as("q_scale"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val scored = q.crossJoin(broadcast(queries))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        normZero(round(int8Dot(col("qvec"), col("q_qvec")).cast("double") *
          col("scale") * col("q_scale"), 6)).as("score"))
    graft.plans.TopK.topKPerKey(scored, Seq("query_id"),
      Seq(col("score"), negate(col("vec_id"))), k)
      .select("query_id", "vec_id", "score", "rank")
  }

  /** Deterministic pseudo-random hyperplane sign for (dim d, plane p): ±1
    * from the parity of the first md5 byte of "d#p" — no RNG state,
    * reproducible on any cluster. Computed driver-side once (the signs are
    * constants) and shipped as array literals, NOT re-hashed per row. */
  private[graft] def planeSign(d: Int, p: Int): Double = {
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$d#$p".getBytes("UTF-8"))
    if ((digest(0) & 1) == 1) 1.0 else -1.0
  }

  /** Embedding dimension discovered from the first row — schema metadata a
    * real vector store would carry; a one-row LocalLimit job, never a full
    * scan. An empty corpus yields dim 0 (every downstream pipeline then
    * produces zero rows rather than crashing). The per-row guard in
    * lshSignature fails loudly on any row whose width disagrees (silent
    * truncation would misbucket vectors). */
  def embeddingDim(embeddings: DataFrame): Int =
    embeddings.filter(col("embedding").isNotNull)
      .select(size(col("embedding"))).limit(1).collect()
      .headOption.map(_.getInt(0)).getOrElse(0)

  /** Hyperplane-LSH signature: bit p = sign(emb ⋅ plane_p), one native
    * single-pass expression ([[graft.functions.LshSignature]] — the
    * per-plane VecDot chain inlined `planes` separate loops into one
    * generated method, past the JIT's size budget; the fused form is
    * ~10x faster at 48 planes). Row-identical to
    * [[lshSignatureComposed]], pinned in `MatchExpressionsSpec`. */
  def lshSignature(emb: Column, planes: Int, dim: Int): Column =
    graft.functions.MatchExpressions.lshSignature(emb, planes, dim)

  /** The composable Column-algebra form the native expression fused —
    * kept as the parity reference for the fuzz spec (and as executable
    * documentation of the semantics, guard and null edges included). */
  private[graft] def lshSignatureComposed(
      emb: Column, planes: Int, dim: Int): Column = {
    val guard = when(size(emb) === dim, lit(""))
      .otherwise(raise_error(concat(
        lit(s"lshSignature built for $dim-dim embeddings, got "),
        size(emb).cast("string"))))
    val bits = guard +: (0 until planes).map { p =>
      val planeVec = typedLit((0 until dim).map(d => planeSign(d, p)))
      val proj = dot(emb, planeVec)
      when(proj >= 0, lit("1")).otherwise(lit("0"))
    }
    concat(bits: _*)
  }

  /** Bucketed ANN: candidates share the LSH signature prefix bucket; exact
    * cosine rescoring within buckets only. Multi-probe via `bands` distinct
    * prefixes raises recall. This is the join-on-bucket scale path — no
    * cross join anywhere. */
  def lshTopK(
      embeddings: DataFrame, queryIds: Seq[Long], k: Int = 10,
      planes: Int = 12, bands: Int = 3): DataFrame = {
    require(planes % bands == 0, "planes must divide into bands")
    val width = planes / bands
    val sigs = embeddings.withColumn("sig",
      lshSignature(col("embedding"), planes, embeddingDim(embeddings)))
    val banded = sigs.select(col("vec_id"), col("embedding"),
      posexplode(array((0 until bands).map(b =>
        substring(col("sig"), b * width + 1, width)): _*))
        .as(Seq("band_idx", "band_key")))

    val queries = banded
      .filter(col("vec_id").isInCollection(queryIds))
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
        col("band_idx"), col("band_key"))
    val candidates = banded.join(queries, Seq("band_idx", "band_key"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        col("q_emb"), col("embedding")).distinct()

    val scored = candidates.select(col("query_id"), col("vec_id"),
      normZero(round(cosine(col("q_emb"), col("embedding")), 6)).as("cos_sim"))
    rankTopK(scored, k)
  }

  /** A built IVF (inverted-file) index: the cell-assigned corpus plus the
    * driver-side centroids. Build once, [[searchIvf]] many — the
    * vector-store model where quantizer training and corpus assignment
    * amortize over every query batch. The assignment cache is OWNED by the
    * index, not by [[PipelineCaches]] — a long-lived index must survive
    * unrelated pipelines reclaiming their scratch caches; call [[release]]
    * when done with it. */
  final case class IvfIndex(
      assigned: DataFrame, centers: Array[Array[Double]]) {
    def release(): Unit = assigned.unpersist(blocking = false)
  }

  /** Train the coarse quantizer and assign every corpus vector to a cell.
    * A coarse quantizer needs rough cells, not convergence: fit on a
    * seeded sample (IVF practice — at corpus scale you train the quantizer
    * on a sliver, then assign everything), random init (one pass; kmeans||
    * costs several), few iterations.
    *
    * @param persist cache the assignment (the build-once/search-many
    *                mode); pass false when the index serves a single
    *                batch and the cache write would be pure overhead */
  def buildIvfIndex(
      embeddings: DataFrame, nLists: Int = 16, seed: Long = 42L,
      quantizerSample: Double = 0.25, persist: Boolean = true): IvfIndex = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val withVec = embeddings.withColumn("_v", array_to_vector(col("embedding")))
    val trainVecs = withVec.sample(withReplacement = false,
      fraction = math.min(1.0, quantizerSample), seed = seed).cache()
    val km = new KMeans().setK(nLists).setSeed(seed).setMaxIter(5)
      .setInitMode("random")
      .setFeaturesCol("_v").setPredictionCol("_list")
    val model = km.fit(trainVecs)
    trainVecs.unpersist()
    val raw = model.transform(withVec)
      .select(col("vec_id"), col("embedding"), col("_list"))
    val assigned =
      if (persist) raw
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else raw
    IvfIndex(assigned, model.clusterCenters.map(_.toArray))
  }

  /** Deterministic coarse quantizer: the cells are the embeddings of
    * `seedIds` (sorted; cell i = i-th smallest seed id). Sampled-seed
    * quantizers are standard IVF practice at corpus scale — you train the
    * quantizer on a sliver anyway — and pinning the sample ids makes build
    * AND search replayable by the DuckDB oracle, closing the one entry the
    * k-means fit kept un-oracled. Only the nLists seed rows are collected
    * (centroids are index metadata, like `clusterCenters`); assignment is
    * the same distributed [[probeCellsCol]] projection the search side
    * uses, so both engines pick cells by identical rounded distances. */
  def buildIvfIndexSeeded(
      embeddings: DataFrame, seedIds: Seq[Long],
      persist: Boolean = true): IvfIndex = {
    val seeds = seedIds.distinct.sorted
    val byId = embeddings.filter(col("vec_id").isInCollection(seeds))
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
      .toMap
    val missing = seeds.filterNot(byId.contains)
    require(missing.isEmpty, s"seed vec_ids absent from corpus: $missing")
    val centers = seeds.map(byId).toArray
    val raw = embeddings.select(col("vec_id"), col("embedding"),
      element_at(probeCellsCol(col("embedding"), centers, 1), 1).as("_list"))
    val assigned =
      if (persist) raw
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else raw
    IvfIndex(assigned, centers)
  }

  /** The `nProbe` nearest cells of `emb` as an int array. The centroids
    * ship INSIDE the expression as a codegen reference object
    * ([[graft.functions.NearestCells]] — they are driver-side constants of
    * the index, nLists × dim doubles), so cell assignment is a pure
    * projection that runs on the executors: no driver collect, no extra
    * job, queries stay distributed end to end even when the query set is
    * corpus-sized, and the expression tree stays ONE node however large
    * nLists grows (the per-centroid struct-sort form paid a plan
    * analyze/codegen cost linear in nLists — the PQ entries' measured
    * 1-2 s first-plan floor).
    *
    * Distances use dist² = |e|² − 2·e⋅c + |c|², every fold in element
    * order — the same association DuckDB's list_sum uses — rounded to
    * 6 dp so a last-ulp engine difference can never flip a nearest-cell
    * choice (remaining ties break on the cell index). Equivalence to the
    * composable struct-sort form is pinned by `CellExpressionsSpec`. */
  private[graft] def probeCellsCol(
      emb: Column, centers: Array[Array[Double]], nProbe: Int): Column =
    graft.functions.CellExpressions.nearestCells(emb, centers, nProbe)

  /** Probe the index: each query visits its nProbe nearest cells, exact
    * cosine rescores only inside those cells (|corpus| × nProbe / nLists
    * candidates). Probe-cell assignment is a distributed Column expression
    * over broadcast centroid literals ([[probeCellsCol]]) — the queries
    * DataFrame is never collected, so a corpus-sized query set ("for every
    * doc, its neighbors") streams through the executors like any other
    * frame. The query plan is evaluated once: q_emb and the exploded probe
    * list come out of a single projection.
    *
    * @param excludeQueryIds drop corpus vectors whose vec_id equals the
    *                        query's id — right when queries ARE corpus rows
    *                        (self-search, the default); pass false for
    *                        external query vectors, where an id collision
    *                        is meaningless and exclusion would silently
    *                        hide true neighbors
    * @param broadcastQueries hint the probed query side into a broadcast
    *                        join (right for a query batch, the common
    *                        case); pass false for a corpus-sized query set
    *                        so the cell join shuffles both sides on _list
    *                        instead of materializing the queries on every
    *                        executor */
  def searchIvf(
      index: IvfIndex, queries: DataFrame, k: Int = 10, nProbe: Int = 4,
      excludeQueryIds: Boolean = true,
      broadcastQueries: Boolean = true): DataFrame = {
    val probed = queries.select(
      col("vec_id").as("query_id"), col("embedding").as("q_emb"),
      explode(probeCellsCol(col("embedding"), index.centers, nProbe))
        .as("_list"))
    val probeSide = if (broadcastQueries) broadcast(probed) else probed
    val joined = index.assigned.join(probeSide, Seq("_list"))
    val candidates =
      if (excludeQueryIds) joined.filter(col("vec_id") =!= col("query_id"))
      else joined
    val scored = candidates.select(col("query_id"), col("vec_id"),
      normZero(round(cosine(col("q_emb"), col("embedding")), 6)).as("cos_sim"))
    rankTopK(scored, k)
  }

  def ivfTopK(
      embeddings: DataFrame, queryIds: Seq[Long], k: Int = 10,
      nLists: Int = 16, nProbe: Int = 4, seed: Long = 42L,
      quantizerSample: Double = 0.25): DataFrame = {
    val index =
      buildIvfIndex(embeddings, nLists, seed, quantizerSample, persist = false)
    searchIvf(index,
      embeddings.filter(col("vec_id").isInCollection(queryIds)), k, nProbe)
  }

  /** Persist a built index: the cell-assigned corpus as a parquet table
    * (the big side — at corpus scale, write it bucketed on `_list` via
    * graft.scale.Bucketing so [[searchIvf]]'s cell join needs no
    * exchange) plus the nLists × dim centroid metadata beside it. */
  def saveIvfIndex(index: IvfIndex, path: String): Unit = {
    val spark = index.assigned.sparkSession
    import spark.implicits._
    index.assigned.write.mode("overwrite").parquet(s"$path/assigned")
    index.centers.zipWithIndex.toSeq
      .map { case (c, i) => (i, c.toSeq) }
      .toDF("list", "center")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/centers")
  }

  /** Reload a persisted index: centroids are metadata (nLists rows
    * collected once); the assignment stays a distributed scan. */
  def loadIvfIndex(
      spark: org.apache.spark.sql.SparkSession, path: String,
      persist: Boolean = true): IvfIndex = {
    val centers = spark.read.parquet(s"$path/centers").orderBy("list")
      .collect().map(_.getSeq[Double](1).toArray)
    val raw = spark.read.parquet(s"$path/assigned")
    IvfIndex(
      if (persist) raw
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else raw,
      centers)
  }

  /** APPEND a new shard to a persisted [[saveIvfIndex]] store (the
    * [[appendToRpIndex]] contract): the centers are FROZEN store
    * metadata, so the shard is assigned with the stored constants and
    * appended — append == rebuild for the seeded quantizer; only the
    * shard pays assignment cost. Width-mismatched shards fail loudly
    * before any write; ids must be disjoint from the stored ones. */
  def appendToIvfIndex(spark: org.apache.spark.sql.SparkSession,
      path: String, newShard: DataFrame): Unit = {
    // reuse the loader's layout parsing (assigned-table read is lazy,
    // never executed here) so append and load can never disagree
    val centers = loadIvfIndex(spark, path, persist = false).centers
    val dim = centers.head.length
    val shardDim = embeddingDim(newShard)
    require(shardDim == 0 || shardDim == dim,
      s"appendToIvfIndex: shard embedding dim $shardDim != store dim $dim")
    newShard.select(col("vec_id"), col("embedding"),
        element_at(probeCellsCol(col("embedding"), centers, 1), 1)
          .as("_list"))
      .write.mode("append").parquet(s"$path/assigned")
  }

  /** Retire vectors from a loaded IVF assignment — one broadcast
    * anti-join pass ([[graft.llm.Dedup.retireFromIndex]] contract). */
  def retireFromIvfIndex(assigned: DataFrame, retiredIds: Seq[Long])
      : DataFrame =
    assigned.filter(!col("vec_id").isInCollection(retiredIds))

  /** In-place maintenance of a persisted IVF store: drop retired ids
    * and rewrite the assignment once (compacting append small-files),
    * swap safety via [[graft.scale.StoreMaint.replaceStore]]. */
  def compactIvfIndexStore(spark: org.apache.spark.sql.SparkSession,
      path: String, retiredIds: Seq[Long]): Long =
    graft.scale.StoreMaint.replaceStore(spark, s"$path/assigned",
      retireFromIvfIndex(
        spark.read.parquet(s"$path/assigned"), retiredIds))

  /** One-shot IVF search on the deterministic seeded quantizer — the
    * fully-oracled variant behind `q_ann_ivf_topk`. */
  def ivfTopKSeeded(
      embeddings: DataFrame, seedIds: Seq[Long], queryIds: Seq[Long],
      k: Int = 10, nProbe: Int = 4): DataFrame = {
    val index = buildIvfIndexSeeded(embeddings, seedIds, persist = false)
    searchIvf(index,
      embeddings.filter(col("vec_id").isInCollection(queryIds)), k, nProbe)
  }

  /** Embedding-cosine near-duplicate pairs above a threshold, via LSH
    * buckets (the embedding twin of Dedup.minhashCandidates).
    *
    * The band join carries only (band, vec_id) — ids, not vectors — and the
    * candidate pair set is made DISTINCT before the embeddings join back,
    * so each surviving pair pays for exactly one cosine. Band width
    * (planes/bands) controls bucket count: 8 sign bits ≈ 256 buckets per
    * band, which keeps collision chains short on near-orthogonal corpora.
    *
    * `maxBucketSize` is the same skew guard as
    * [[Dedup.minhashCandidates]]: an m-member bucket (zero vectors,
    * repeated embeddings, a degenerate hyperplane cut) emits m² pairs, so
    * whole over-cap buckets are excluded from candidate generation — their
    * members are byte-identical cases for exact dedup. Default ∞. */
  def cosineNearDup(
      embeddings: DataFrame, threshold: Double = 0.95,
      planes: Int = 24, bands: Int = 3,
      maxBucketSize: Int = Int.MaxValue): DataFrame = {
    require(planes % bands == 0, "planes must divide into bands")
    cosineNearDupImpl(embeddings, threshold, planes, bands, maxBucketSize)
  }

  /** Bucket-key width (sign bits per band) that holds expected LSH bucket
    * occupancy ~constant as the corpus grows: `ceil(log2(n / occupancy))`,
    * floored at 8 (the fixed-width default).
    *
    * Why it must grow: with a FIXED width w there are only 2^w buckets per
    * band, so on a near-orthogonal corpus (bits ~uniform) expected bucket
    * occupancy is n/2^w and within-bucket candidate pairs are Θ(n²/2^w) —
    * quadratic in the corpus once n passes 2^w · occupancy. Measured on
    * this repo's ScaleProbe before the fix: 8k vectors rescored in ~3s,
    * 80k in ~77s with the default 8-bit key (≈256 buckets saturated).
    * Growing w with log2(n) pins occupancy, making candidate work
    * Θ(n · occupancy) — linear. */
  def autoBandWidth(n: Long, targetOccupancy: Int = 64): Int = {
    require(targetOccupancy > 0, "targetOccupancy must be positive")
    val w = math.ceil(math.log(math.max(n, 1L).toDouble / targetOccupancy)
      / math.log(2.0)).toInt
    math.max(8, w)
  }

  /** [[cosineNearDup]] with the band width chosen from the corpus size
    * ([[autoBandWidth]]) — the variant to reach for when n is not known to
    * be small.
    *
    * Recall tradeoff, stated precisely: sign-IDENTICAL duplicate families
    * (exact copies, positively-scaled copies — the planted-dup contract of
    * `q_dedup_embcos`) share every hyperplane side, so they collide at ANY
    * width: their recall is 1 regardless of n. Only marginal near-dups
    * (cosine barely above the threshold) lose per-band collision
    * probability p^w as w grows; compensate with more `bands` (recall =
    * 1−(1−p^w)^bands), which adds linear work, not quadratic. Costs one
    * extra `count()` pass to size the corpus. */
  def cosineNearDupAuto(
      embeddings: DataFrame, threshold: Double = 0.95,
      bands: Int = 3, targetOccupancy: Int = 64,
      maxBucketSize: Int = Int.MaxValue): DataFrame = {
    val width = autoBandWidth(embeddings.count(), targetOccupancy)
    cosineNearDupImpl(embeddings, threshold, width * bands, bands,
      maxBucketSize)
  }

  /** Cross-corpus cosine pairs above a threshold — embedding-space
    * decontamination: n-gram overlap ([[Curation.decontaminate]]) misses
    * paraphrased benchmark leakage, so the standard second pass matches
    * train embeddings against benchmark embeddings in cosine space.
    *
    * Same banded-LSH shape as [[cosineNearDup]] but the bucket join is
    * BETWEEN the two frames (never a self-join, never all-pairs): both
    * sides are signed by the same deterministic hyperplanes, the join
    * carries only (band, id), candidate pairs are DISTINCT-ed before the
    * one cosine each pays, and `maxBucketSize` excludes over-cap buckets
    * per side (an m×k bucket emits m·k candidates). At 100 TB the
    * benchmark side is MB-scale, so its banded rows broadcast and the
    * train corpus never shuffles — AQE picks that up from size estimates.
    *
    * Sign-identical leakage (verbatim or positively-scaled copies) shares
    * every hyperplane side and is found at ANY band width; only marginal
    * paraphrases (cosine barely above the threshold) trade recall for
    * bands, exactly [[cosineNearDupAuto]]'s tradeoff. */
  def crossCosinePairs(
      left: DataFrame, right: DataFrame, threshold: Double = 0.9,
      planes: Int = 24, bands: Int = 3,
      maxBucketSize: Int = Int.MaxValue): DataFrame = {
    require(planes % bands == 0, "planes must divide into bands")
    val width = planes / bands
    val dim = embeddingDim(left)
    val rightDim = embeddingDim(right)
    require(dim == rightDim,
      s"embedding dimensions must match: left=$dim right=$rightDim — " +
        "cross-corpus decontamination needs both frames embedded by the " +
        "same model")
    def banded(df: DataFrame, idAs: String): DataFrame = {
      val b = df
        .withColumn("sig", lshSignature(col("embedding"), planes, dim))
        .select(col("vec_id").as(idAs),
          posexplode(array((0 until bands).map(i =>
            substring(col("sig"), i * width + 1, width)): _*))
            .as(Seq("band_idx", "band_key")))
      if (maxBucketSize == Int.MaxValue) b
      else b.join(
        broadcast(b.groupBy("band_idx", "band_key")
          .agg(count(lit(1)).as("_n")).filter(col("_n") > maxBucketSize)
          .select("band_idx", "band_key")),
        Seq("band_idx", "band_key"), "left_anti")
    }
    val pairs = banded(left, "left_id")
      .join(banded(right, "right_id"), Seq("band_idx", "band_key"))
      .select("left_id", "right_id")
      .distinct()
    val el = left.select(col("vec_id").as("left_id"),
      col("embedding").as("emb_l"))
    val er = right.select(col("vec_id").as("right_id"),
      col("embedding").as("emb_r"))
    pairs.join(el, Seq("left_id")).join(er, Seq("right_id"))
      .select(col("left_id"), col("right_id"),
        normZero(round(cosineOrNull(col("emb_l"), col("emb_r")), 6)).as("cos_sim"))
      .filter(col("cos_sim") >= threshold)
  }

  private def cosineNearDupImpl(
      embeddings: DataFrame, threshold: Double,
      planes: Int, bands: Int, maxBucketSize: Int): DataFrame = {
    val width = planes / bands
    val sigs = embeddings.withColumn("sig",
      lshSignature(col("embedding"), planes, embeddingDim(embeddings)))
    // persisted AND materialized up front, same rationale as
    // Dedup.minhashCandidates: both self-join sides (and, with the guard,
    // the over-cap key scan) read these rows — without materialization the
    // signature projection (the expensive part) executes once per branch
    val allBanded = PipelineCaches.track(
      sigs.select(col("vec_id"),
        posexplode(array((0 until bands).map(b =>
          substring(col("sig"), b * width + 1, width)): _*))
          .as(Seq("band_idx", "band_key")))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    allBanded.count()
    val banded =
      if (maxBucketSize == Int.MaxValue) allBanded
      else allBanded.join(
        broadcast(allBanded.groupBy("band_idx", "band_key")
          .agg(count(lit(1)).as("_n")).filter(col("_n") > maxBucketSize)
          .select("band_idx", "band_key")),
        Seq("band_idx", "band_key"), "left_anti")
    val l = banded.select(col("band_idx"), col("band_key"),
      col("vec_id").as("vec_a"))
    val r = banded.select(col("band_idx"), col("band_key"),
      col("vec_id").as("vec_b"))
    val pairs = l.join(r, Seq("band_idx", "band_key"))
      .filter(col("vec_a") < col("vec_b"))
      .select("vec_a", "vec_b")
      .distinct()
    val ea = embeddings.select(col("vec_id").as("vec_a"),
      col("embedding").as("emb_a"))
    val eb = embeddings.select(col("vec_id").as("vec_b"),
      col("embedding").as("emb_b"))
    pairs.join(ea, Seq("vec_a")).join(eb, Seq("vec_b"))
      .select(col("vec_a"), col("vec_b"),
        normZero(round(cosineOrNull(col("emb_a"), col("emb_b")), 6)).as("cos_sim"))
      .filter(col("cos_sim") >= threshold)
  }

  /** The MAX-COSINE cell of `emb` among broadcast centroid literals —
    * the spherical (cosine-k-means) twin of [[probeCellsCol]]. Cosine is
    * exactly invariant under positive scaling of `emb` (both dot and norm
    * scale by the same factor), so a scaled duplicate lands in the SAME
    * cell bitwise — the property semantic dedup needs that L2 assignment
    * lacks. Rounded to 6 dp, ties on the cell index. */
  private[graft] def cosCellCol(
      emb: Column, centers: Array[Array[Double]]): Column =
    graft.functions.CellExpressions.maxCosineCell(emb, centers)

  /** SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    * deduplication by clustering embeddings and thresholding pairwise
    * cosine WITHIN each cluster — pairs across clusters are never
    * scored, which is what makes the operator linear-ish instead of
    * all-pairs. Cells come from the seeded deterministic quantizer
    * (centroids = embeddings of pinned `cellSeedIds`, assignment by
    * [[cosCellCol]]), so the whole pipeline replays in the DuckDB
    * oracle.
    *
    * Keep rule: within a cell, a vector is a semantic duplicate iff it
    * has a SMALLER-id in-cell neighbor with rounded cosine ≥ threshold
    * (the deterministic min-id-leader convention of the dedup family;
    * the paper keeps one random member per group). This is a dominance
    * rule, not a transitive closure — feed the pair set to
    * [[Curation.dupGroups]] when full groups are needed.
    *
    * 100 TB shape: assignment is a projection; the pair join is an
    * equi-join on the cell id, quadratic only within a cell, and
    * `maxCellSize` excludes whole pathological cells from pair
    * generation (their members are flagged in the `cell_oversized`
    * audit column instead of silently exploding the join — re-run those
    * cells with more seeds or exact dedup). The cell-size relation is
    * nLists rows, always broadcast. */
  /** Cell count that holds expected within-cell pair work ~linear as the
    * corpus grows: `ceil(n / occupancy)` — the spherical-cell twin of
    * [[autoBandWidth]]'s occupancy discipline. With a FIXED cell count k,
    * occupancy is n/k and within-cell pairs are Θ(n²/k) — quadratic once
    * n outgrows k·occupancy (measured on this repo's sf0.1→sf1 tiling:
    * 16 fixed cells took 10× vectors to 3.8× wall, the only super-√
    * entry). Growing k with n (SemDeDup used 50k clusters for LAION)
    * pins occupancy, making pair work Θ(n · occupancy). Feed the result
    * to your seed-sampling policy (e.g. every (n/k)-th id). */
  def autoCellCount(n: Long, targetOccupancy: Int = 256): Int = {
    require(targetOccupancy > 0, "targetOccupancy must be positive")
    math.max(1, math.ceil(
      math.max(n, 1L).toDouble / targetOccupancy).toInt)
  }

  /** Production seed policy for [[semanticDedup]] (the path the
    * `semantic_dedup` DSL kernel takes): the [[autoCellCount]] smallest
    * `vec_id`s of the corpus itself. Deterministic given the corpus — k
    * is a pure function of n and the seeds are an ORDER BY / LIMIT — so
    * the whole auto-k pipeline replays in a static DuckDB oracle
    * (`q_dedup_semantic_auto`). Bounded driver collect: k longs, the
    * same index-metadata envelope as IVF centroids / PQ codebooks. */
  def autoCellSeeds(
      embeddings: DataFrame, targetOccupancy: Int = 256): Seq[Long] = {
    val k = autoCellCount(embeddings.count(), targetOccupancy)
    embeddings.select(col("vec_id")).orderBy(col("vec_id")).limit(k)
      .collect().map(_.getLong(0)).toSeq
  }

  /** Centroids = embeddings of the pinned seed ids, in sorted-seed
    * order (cell i = i-th smallest seed). Bounded driver collect —
    * k vectors of index metadata. Cast → array<double> before collecting
    * so a caller whose embedding column is array<double> works instead
    * of throwing an opaque Float ClassCastException; float sources
    * convert exactly. */
  private def seedCenters(
      embeddings: DataFrame, cellSeedIds: Seq[Long]): Array[Array[Double]] = {
    val seeds = cellSeedIds.distinct.sorted
    val byId = embeddings.filter(col("vec_id").isInCollection(seeds))
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
      .toMap
    val missing = seeds.filterNot(byId.contains)
    require(missing.isEmpty, s"seed vec_ids absent from corpus: $missing")
    seeds.map(byId).toArray
  }

  /** Cluster-balanced (diversity) sampling: assign every vector to its
    * max-cosine seeded cell and keep the `cap` smallest ids per cell —
    * the embedding-space twin of [[Sampling.domainCap]], and the
    * standard down-sampling that follows SemDeDup in a curation stack
    * (cap each semantic neighborhood instead of letting one dense topic
    * dominate the training mix). Assignment is a per-row projection;
    * the cap is the bounded-heap TopK, so the shuffle carries ≤
    * cap·partitions rows per cell no matter how dense a topic is. Fully
    * deterministic (seeded cells, id ordering) ⇒ hash-oracled. */
  def clusterBalancedSample(
      embeddings: DataFrame, cellSeedIds: Seq[Long], cap: Int): DataFrame = {
    require(cap > 0, s"cap must be positive, got $cap")
    val centers = seedCenters(embeddings, cellSeedIds)
    val assigned = embeddings.select(col("vec_id"),
      cosCellCol(col("embedding"), centers).as("cell"))
    graft.plans.TopK.topKPerKey(assigned, Seq("cell"),
      Seq(negate(col("vec_id"))), cap)
      .select(col("vec_id"), col("cell"), col("rank").as("cell_rank"))
  }

  /** Embedding-coverage card — the diversity sheet of a corpus release:
    * assign every vector to its seeded max-cosine cell (the
    * [[semanticDedup]] quantizer) and report the occupancy distribution
    * in ONE row — occupied cells, Shannon entropy of the cell shares
    * (nats), normalized entropy (entropy / ln k; 1.0 = perfectly even
    * semantic coverage), and the biggest cell's share (topical
    * concentration). Read next to [[Curation.corpusReport]]: low
    * normalized entropy means the corpus crowds a few semantic
    * neighborhoods and the mix needs rebalancing
    * ([[clusterBalancedSample]] is the corrective twin).
    *
    * Scale shape: assignment is a zero-shuffle projection against the
    * broadcast centroid reference object; the card is one cell-keyed
    * aggregation (≤ k rows) plus a 1-row rollup. Entropy terms round to
    * 12 dp and sum as DECIMAL (partition-order-proof, the
    * temperatureShares convention), so the card hash-replays in DuckDB. */
  def coverageCard(
      embeddings: DataFrame, cellSeedIds: Seq[Long]): DataFrame = {
    val k = cellSeedIds.size
    val centers = seedCenters(embeddings, cellSeedIds)
    val assigned = embeddings.select(col("vec_id"),
      cosCellCol(col("embedding"), centers).as("cell"))
    val cells = assigned.groupBy("cell").agg(count(lit(1)).as("_nc"))
    // the total rides a whole-relation window over the k-row cell table
    // (Sampling.allRows) — a broadcast-agg total would plan the embedding
    // scan + assignment TWICE, and this is the one operator whose scan
    // reads the full payload column
    val terms = cells
      .withColumn("_n", sum("_nc").over(Sampling.allRows))
      .withColumn("_share",
        col("_nc").cast("double") / col("_n").cast("double"))
      .withColumn("_term",
        round(-col("_share") * log(col("_share")), 12)
          .cast(org.apache.spark.sql.types.DecimalType(28, 12)))
    val entropy = round(sum(col("_term")).cast("double"), 6)
    terms.agg(
      max(col("_n")).cast("bigint").as("n_vecs"),
      lit(k).as("k_cells"),
      count(lit(1)).cast("bigint").as("occupied_cells"),
      entropy.as("entropy"),
      (if (k > 1) round(sum(col("_term")).cast("double") /
          lit(math.log(k.toDouble)), 6)
        else lit(null).cast("double")).as("norm_entropy"),
      round(max(col("_share")), 6).as("max_share"))
  }

  /** Per-dimension embedding-space health card: mean, population
    * variance, and variance share for every dimension — the standard
    * diagnostic for embedding collapse (dead dims show ~zero variance)
    * and anisotropy (a few dims hoarding the variance share means the
    * effective dimensionality is far below the nominal one; Ethayarajh
    * 2019's contextual-anisotropy signal at the cheapest possible
    * granularity).
    *
    * Cross-engine determinism: both moments accumulate as 12-dp DECIMAL
    * sums of 12-dp pre-rounded doubles (the [[centroidCosine]]
    * convention — the pre-round makes the decimal cast exact, the
    * DECIMAL sum makes it partition-order independent), and the
    * variance-share normalizer sums the 6-dp variances as
    * DECIMAL(18,6), so no double ever folds in partition order.
    *
    * Scale shape: ONE posexplode pass partial-aggregated to dim-count
    * rows (map-side combine does the heavy lifting — the shuffle
    * carries dims × partitions rows, never the corpus); everything
    * after runs on the dim-sized table. NULL embeddings are excluded
    * up front. */
  def embStats(embeddings: DataFrame): DataFrame = {
    val dims = embeddings.filter(col("embedding").isNotNull)
      .select(posexplode(col("embedding")).as(Seq("pos", "_x")))
      .withColumn("_xd", col("_x").cast("double"))
    val dec = org.apache.spark.sql.types.DecimalType(28, 12)
    val m = dims.groupBy("pos").agg(
      count(lit(1)).as("_n"),
      sum(round(col("_xd"), 12).cast(dec)).as("_sx"),
      sum(round(col("_xd") * col("_xd"), 12).cast(dec)).as("_sx2"))
    val nD = col("_n").cast("double")
    val sx = col("_sx").cast("double")
    val sx2 = col("_sx2").cast("double")
    val scored = m.select(
      col("pos"), col("_n").cast("bigint").as("n_vecs"),
      round(sx / nD, 6).as("mean"),
      round((sx2 - sx * sx / nD) / nD, 6).as("variance"))
    scored
      .withColumn("_vd", col("variance")
        .cast(org.apache.spark.sql.types.DecimalType(18, 6)))
      .withColumn("_tot", sum("_vd").over(Sampling.allRows))
      .select(col("pos"), col("n_vecs"), col("mean"), col("variance"),
        when(col("_tot").cast("double") === 0, lit(null).cast("double"))
          .otherwise(round(col("_vd").cast("double") /
            col("_tot").cast("double"), 6)).as("var_share"))
  }

  /** Per-dimension embedding DRIFT card between two corpora — the
    * monitoring row an embedding pipeline checks when the encoder, the
    * preprocessing, or the data mix changes: for every dim, both means,
    * the shift, and Welch's two-sample z = (mean_a − mean_b) /
    * sqrt(var_a/n_a + var_b/n_b), with `drifted` at the two-sided 5%
    * normal critical value (1.959964, the [[Sampling.ksDrift]]
    * convention — n is corpus-scale here, so normal vs t is immaterial
    * and the constant keeps the oracle exact). A dim with zero variance
    * on both sides and equal means is NULL-z (no evidence), but a mean
    * shift with zero pooled variance is infinite evidence — flagged
    * drifted with NULL z rather than a fake number.
    *
    * Exactly oracle-replayable: the [[embStats]] moment convention
    * (12-dp rounds, DECIMAL sums) on a side-tagged union, then one
    * double expression of the six aggregates rounded to 6 dp.
    *
    * Scale shape: ONE union scan of both corpora → a (pos, side)
    * map-side-combined aggregation — state is 2·dims rows, never
    * corpus rows. */
  def embDrift(a: DataFrame, b: DataFrame): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(28, 12)
    def side(df: DataFrame, tag: Int) =
      df.filter(col("embedding").isNotNull)
        .select(posexplode(col("embedding")).as(Seq("pos", "_x")))
        .withColumn("_s", lit(tag))
        .withColumn("_xd", col("_x").cast("double"))
    val m = side(a, 0).unionAll(side(b, 1))
      .groupBy("pos", "_s").agg(
        count(lit(1)).as("_n"),
        sum(round(col("_xd"), 12).cast(dec)).as("_sx"),
        sum(round(col("_xd") * col("_xd"), 12).cast(dec)).as("_sx2"))
    def pick(c: String, s: Int) = max(when(col("_s") === s, col(c)))
    val wide = m.groupBy("pos").agg(
      pick("_n", 0).as("_na"), pick("_sx", 0).as("_sxa"),
      pick("_sx2", 0).as("_sx2a"),
      pick("_n", 1).as("_nb"), pick("_sx", 1).as("_sxb"),
      pick("_sx2", 1).as("_sx2b"))
    def meanOf(sx: Column, n: Column) =
      round(sx.cast("double") / n.cast("double"), 6)
    def varOf(sx: Column, sx2: Column, n: Column) = {
      val nD = n.cast("double")
      round((sx2.cast("double") - sx.cast("double") * sx.cast("double")
        / nD) / nD, 6)
    }
    val se2 = col("var_a") / col("_na").cast("double") +
      col("var_b") / col("_nb").cast("double")
    wide
      .withColumn("mean_a", meanOf(col("_sxa"), col("_na")))
      .withColumn("mean_b", meanOf(col("_sxb"), col("_nb")))
      .withColumn("var_a", varOf(col("_sxa"), col("_sx2a"), col("_na")))
      .withColumn("var_b", varOf(col("_sxb"), col("_sx2b"), col("_nb")))
      .withColumn("delta", round(col("mean_a") - col("mean_b"), 6))
      .withColumn("z",
        when(se2 === 0, lit(null).cast("double"))
          .otherwise(round(col("delta") / sqrt(se2), 6)))
      .withColumn("drifted",
        when(se2 === 0, col("delta") =!= 0.0)
          .otherwise(abs(col("z")) > lit(1.959964)))
      .select(col("pos"), col("_na").cast("bigint").as("n_a"),
        col("_nb").cast("bigint").as("n_b"),
        col("mean_a"), col("mean_b"), col("var_a"), col("var_b"),
        col("delta"), col("z"), col("drifted"))
  }

  /** Top principal component of the embedding covariance via
    * deterministic power iteration — the "All-but-the-top" anisotropy
    * diagnostic (Mu & Viswanath 2018): embedding spaces concentrate
    * mass on one dominant direction, and removing it improves
    * similarity quality; this card surfaces that direction (per-dim
    * `loading`, unit L2) and its dominance (`top_pc_share`, the
    * Rayleigh share of total variance). A share near 1 means the space
    * has collapsed onto a line (cosine loses discrimination); a share
    * near 1/dims means isotropy.
    *
    * Every step is engine-exact so the DuckDB oracle hash-replays it:
    * the covariance is built from 12-dp-rounded DECIMAL-summed moments
    * (the [[embStats]] convention) and normalized by its max |entry|
    * so all iteration arithmetic stays in [-1, 1] where 12-dp rounding
    * is loss-free in doubles; each of the `iters` fixed iterations is
    * round12(A·v) DECIMAL-summed then max-abs renormalized; the sign
    * convention pins the largest-|loading| dim (lowest pos on ties)
    * positive. Output is DEFINED as the `iters`-step iterate — the
    * deterministic-spec convention used by [[kmeansStep]].
    *
    * Scale shape: ONE corpus pass builds all dims² second moments in
    * the same projection (nested transform HOFs, map-side combined to
    * dims² rows — no self-join, no shuffle growth with corpus size).
    * The only collect is the dims²-row covariance (bounded metadata,
    * the PQ-codebook convention); iterations run driver-local on that
    * dims×dims table in exact decimal arithmetic. */
  def embTopPc(embeddings: DataFrame, iters: Int = 12,
      maxVectors: Long = 1000000L): DataFrame = {
    require(iters >= 1, s"power iterations must be >= 1, got $iters")
    val spark = embeddings.sparkSession
    import spark.implicits._
    val e = embeddings.filter(col("embedding").isNotNull)
    // one pass: all (i, j) product sums in the same projection — the
    // pair arrays are built per row, exploded, and map-side combined
    // down to dims² keys. Moments accumulate as EXACT scaled integers
    // (round(p·1e12) summed as BIGINT — no per-row decimal allocation
    // on the dims²-per-row hot path); the (double)sum / 1e12
    // reconstruction is the SAME two IEEE ops the oracle executes, so
    // the engines agree bit-for-bit. The scaled sums need
    // n·max|x|²·1e12 < 2^63, hence the maxVectors guard (shard the
    // card or renormalize embeddings beyond it).
    val pairs = e.select(size(col("embedding")).as("_d"),
        posexplode(graft.functions.GramTerms.gramTerms(col("embedding")))
          .as(Seq("_pos", "_p")))
    val sij = pairs.groupBy(
        (col("_pos") / col("_d")).cast("int").as("i"),
        (col("_pos") % col("_d")).cast("int").as("j"))
      .agg(count(lit(1)).as("_n"), sum("_p").as("_s"))
    // mean pass: per-dim scaled sums PLUS the row counts that define n.
    // _cAll counts every exploded element, _cNn only non-NULL ones —
    // a gap means a NULL element; differing per-pos counts mean mixed
    // widths. Both violate the card's uniform-width contract and fail
    // loudly here instead of silently skewing the covariance (the
    // gram pass drops such rows wholesale via GramTerms' NULL result).
    val meanRows = e
      .select(posexplode(col("embedding")).as(Seq("pos", "_x")))
      .groupBy("pos").agg(
        count(lit(1)).as("_cAll"), count(col("_x")).as("_cNn"),
        sum(round(col("_x").cast("double") * lit(1e12)).cast("long"))
          .as("_sx"))
      .collect()
    require(meanRows.nonEmpty, "embTopPc: no non-null embeddings")
    meanRows.foreach { r =>
      require(r.getLong(1) == r.getLong(2),
        s"embTopPc: ${r.getLong(1) - r.getLong(2)} NULL embedding " +
          s"element(s) at dim ${r.getInt(0)} — the covariance card " +
          "requires fully populated vectors; filter or impute first.")
    }
    val widthCounts = meanRows.map(_.getLong(1)).distinct
    require(widthCounts.length == 1,
      "embTopPc: mixed embedding widths detected (per-dim row counts " +
        s"${widthCounts.sorted.mkString(", ")} disagree) — the " +
        "covariance card requires one uniform width.")
    // n is DEFINED by the mean pass; the gram pass must agree exactly
    val n = widthCounts.head
    val sums = meanRows.map(r => r.getInt(0) -> r.getLong(3)).toMap
    val rows = sij.collect()
    require(rows.nonEmpty && rows.forall(_.getLong(2) == n),
      s"embTopPc: the covariance pass saw ${
        if (rows.isEmpty) 0L else rows.map(_.getLong(2)).min} of $n " +
        "vectors — rows wider than GramTerms' 1024-dim per-row budget " +
        "are dropped from the gram pass; shard or truncate embeddings " +
        "to <= 1024 dims before calling this card.")
    val dims = sums.keys.max + 1
    require(n <= maxVectors,
      s"embTopPc: $n vectors exceed maxVectors=$maxVectors — the exact " +
        "scaled-integer moment sums would risk BIGINT overflow; shard " +
        "the card (it is distribution-level) or raise the cap for " +
        "unit-normalized embeddings.")
    import java.math.{BigDecimal => JBD, RoundingMode}
    def r12(x: Double): JBD =
      JBD.valueOf(x).setScale(12, RoundingMode.HALF_UP)
    def r6(x: Double): Double =
      JBD.valueOf(x).setScale(6, RoundingMode.HALF_UP).doubleValue()
    // covariance: round12(S_ij/n - m_i*m_j) with m = round6(sx/n) —
    // magnitudes stay O(max|x|^2), so the 12-dp round is loss-free
    val m = (0 until dims).map { i =>
      JBD.valueOf(sums(i).toDouble / 1e12 / n)
        .setScale(6, RoundingMode.HALF_UP).doubleValue()
    }
    val cov = Array.ofDim[JBD](dims, dims)
    rows.foreach { r =>
      val (i, j) = (r.getInt(0), r.getInt(1))
      cov(i)(j) = r12(r.getLong(3).toDouble / 1e12 / n - m(i) * m(j))
    }
    val maxC = cov.flatten.map(_.abs).max
    if (maxC.signum == 0) {
      // degenerate: no variance anywhere — a defined NULL card
      return spark.range(dims).select(col("id").cast("int").as("pos"),
        lit(n).as("n_vecs"), lit(null).cast("double").as("loading"),
        lit(null).cast("double").as("top_pc_share"))
    }
    val a = cov.map(_.map(c => r12(c.doubleValue() / maxC.doubleValue())))
    var v = Array.fill(dims)(r12(1.0))
    var t = 0
    while (t < iters) {
      // w = A·v with 12-dp-rounded terms, exact decimal accumulation
      val w = (0 until dims).map { i =>
        (0 until dims).foldLeft(JBD.ZERO) { (acc, j) =>
          acc.add(r12(a(i)(j).doubleValue() * v(j).doubleValue()))
        }
      }.toArray
      val mu = w.map(_.abs).max
      if (mu.signum == 0) { t = iters } // stuck at zero: keep prior v
      else {
        v = w.map(x => r12(x.doubleValue() / mu.doubleValue()))
        t += 1
      }
    }
    // sign: the largest-|v| dim (lowest pos on ties) points positive
    val vAbs = v.map(_.abs)
    val pStar = vAbs.zipWithIndex.maxBy { case (av, i) =>
      (av, -i): (JBD, Int) }(Ordering.Tuple2(Ordering.ordered[JBD],
      Ordering.Int))._2
    if (v(pStar).signum < 0) v = v.map(_.negate)
    // unit-L2 loadings + Rayleigh variance share (scale of A cancels)
    val vv = v.foldLeft(JBD.ZERO)((acc, x) =>
      acc.add(r12(x.doubleValue() * x.doubleValue())))
    val nrm = math.sqrt(vv.doubleValue())
    val vAv = (0 until dims).foldLeft(JBD.ZERO) { (acc, i) =>
      (0 until dims).foldLeft(acc) { (acc2, j) =>
        acc2.add(r12(v(i).doubleValue() * a(i)(j).doubleValue() *
          v(j).doubleValue()))
      }
    }
    val trA = (0 until dims).foldLeft(JBD.ZERO)((acc, i) =>
      acc.add(a(i)(i)))
    val share =
      if (trA.signum == 0) Double.NaN
      else r6((vAv.doubleValue() / vv.doubleValue()) / trA.doubleValue())
    (0 until dims).map(i => (i, n, r6(v(i).doubleValue() / nrm), share))
      .toDF("pos", "n_vecs", "loading", "top_pc_share")
  }

  /** All-but-the-top APPLIED (Mu & Viswanath 2018) — [[embTopPc]] is
    * the diagnosis, this is the treatment: mean-center every embedding
    * and remove its top-principal-component projection,
    * x' = (x−μ) − ((x−μ)·u)·u — the standard post-processing that
    * strips the anisotropic common direction and measurably improves
    * cosine similarity tasks. Emits per vector the removed component
    * `proj` and the 6-dp `resid_norm` of the transformed vector — the
    * pair that pins the entire element-wise arithmetic chain without
    * hashing float-array strings.
    *
    * μ and u are the card's own 6-dp decimals (dims-bounded driver
    * constants — broadcast as literal arrays), so the transform itself
    * is a ZERO-SHUFFLE projection: zip_with centering, one index-order
    * VecDot fold per vector for proj (rounded 6 before reuse — the
    * cross-engine pin), one more for the residual norm. At 100 TB this
    * is exactly the shape wanted: two bounded driver solves, then one
    * scan-through transform. */
  def abttTransform(embeddings: DataFrame, iters: Int = 12,
      maxVectors: Long = 1000000L): DataFrame = {
    import graft.functions.CrossEngine.normZero
    val card = embTopPc(embeddings, iters, maxVectors).collect()
    require(card.nonEmpty && !card.exists(_.isNullAt(2)),
      "abttTransform: degenerate zero-variance corpus — no top " +
        "component to remove")
    val u = card.sortBy(_.getInt(0)).map(_.getDouble(2))
    // the means, by the card's own spec: round6((Σ round(x·1e12))/1e12/n)
    // — one extra bounded agg rather than re-plumbing the card internals
    val e = embeddings.filter(col("embedding").isNotNull)
    val meanRows = e
      .select(posexplode(col("embedding")).as(Seq("pos", "_x")))
      .groupBy("pos").agg(count(lit(1)).as("_c"),
        sum(round(col("_x").cast("double") * lit(1e12)).cast("long"))
          .as("_sx"))
      .collect().sortBy(_.getInt(0))
    val n = meanRows.head.getLong(1)
    val m = meanRows.map { r =>
      java.math.BigDecimal.valueOf(r.getLong(2).toDouble / 1e12 / n)
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    }
    val uArr = array(u.map(lit): _*)
    val mArr = array(m.map(lit): _*)
    val centered = zip_with(col("embedding"), mArr,
      (x, mu) => x.cast("double") - mu)
    val withC = e.select(col("vec_id"), centered.as("_ce"))
      .withColumn("_proj",
        normZero(round(dot(col("_ce"), uArr), 6)))
    val out = zip_with(col("_ce"), uArr,
      (c, uu) => c - col("_proj") * uu)
    withC.select(col("vec_id"), col("_proj").as("proj"),
      normZero(round(sqrt(dot(out, out)), 6)).as("resid_norm"))
  }

  /** Clustering-quality card against a ground-truth label column —
    * purity and NMI of the seeded max-cosine cell assignment (the
    * semantic-dedup/IVF quantizer) vs `labelCol`: ONE row with vector /
    * occupied-cell / label counts, purity = Σ_cell max_label n / N, and
    * NMI = MI / sqrt(H_cell·H_label) (Strehl & Ghosh 2002). The
    * embedding-space answer to "do my cells mean anything?" — purity
    * near 1/n_labels says the quantizer ignores semantics, near 1 says
    * cells track labels.
    *
    * Exactly oracle-replayable: the contingency table is integer
    * counts; every entropy/MI term is a double of exact-integer ratios
    * rounded to 12 dp and DECIMAL-summed (the KL-term convention);
    * purity is one integer ratio. N and the integer cross-products
    * need N < 3·10⁹ (BIGINT), the ksDrift guard. Degenerate one-cell or
    * one-label corpora have zero entropy — NMI is NULL, not 0/0.
    *
    * Scale shape: assignment is a zero-shuffle projection against the
    * broadcast centers; ONE map-side-combined (cell, label) aggregation
    * bounds everything downstream by cells × labels, never corpus
    * rows. */
  def clusterPurity(embeddings: DataFrame, cellSeedIds: Seq[Long],
      labelCol: String = "label"): DataFrame = {
    val centers = seedCenters(
      embeddings.select("vec_id", "embedding"), cellSeedIds)
    val cont = PipelineCaches.track(embeddings
      .filter(col("embedding").isNotNull && col(labelCol).isNotNull)
      .select(cosCellCol(col("embedding"), centers).as("_c"),
        col(labelCol).as("_l"))
      .groupBy("_c", "_l").agg(count(lit(1)).as("_n"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val dec = org.apache.spark.sql.types.DecimalType(28, 12)
    val wAll = Sampling.allRows
    val wCell = Window.partitionBy("_c")
    val wLab = Window.partitionBy("_l")
    // NB: the corpus-total column must not be spelled "_N" — Spark
    // resolves column names case-insensitively by default, so
    // withColumn("_N", ...) would silently REPLACE the per-pair "_n"
    val terms = cont
      .withColumn("_tot", sum("_n").over(wAll))
      .withColumn("_nc", sum("_n").over(wCell))
      .withColumn("_nl", sum("_n").over(wLab))
    val nD = col("_tot").cast("double")
    val agg = terms.agg(
      max("_tot").cast("bigint").as("n_vecs"),
      countDistinct("_c").cast("bigint").as("n_cells"),
      countDistinct("_l").cast("bigint").as("n_labels"),
      // MI: (n/N)·ln(n·N / (nc·nl)) per cell — integer products, one
      // double division, 12-dp-rounded DECIMAL-summed terms
      sum(round((col("_n").cast("double") / nD) *
        log((col("_n") * col("_tot")).cast("double") /
          (col("_nc") * col("_nl")).cast("double")), 12).cast(dec))
        .as("_mi"),
      // cell/label entropies from the same pass: each (c, l) row
      // contributes its n/N share of its marginal's ln(N/marginal)
      sum(round((col("_n").cast("double") / nD) *
        log(nD / col("_nc").cast("double")), 12).cast(dec)).as("_hc"),
      sum(round((col("_n").cast("double") / nD) *
        log(nD / col("_nl").cast("double")), 12).cast(dec)).as("_hl"))
    val purity = cont
      .groupBy("_c").agg(max("_n").as("_mx"))
      .agg(sum("_mx").cast("bigint").as("_pn"))
    agg.crossJoin(broadcast(purity))
      .select(col("n_vecs"), col("n_cells"), col("n_labels"),
        round(col("_pn").cast("double") / col("n_vecs").cast("double"), 6)
          .as("purity"),
        when(col("_hc").cast("double") * col("_hl").cast("double") <= 0,
          lit(null).cast("double"))
          .otherwise(round(col("_mi").cast("double") /
            sqrt(col("_hc").cast("double") * col("_hl").cast("double")),
            6)).as("nmi"))
  }

  /** One Lloyd refinement step of spherical k-means over the seeded
    * quantizer: assign every vector to its max-cosine seed cell, update
    * each cell's centroid, and reassign — reporting where each vector
    * started (`cell_init`), where it landed (`cell`), whether it
    * `moved`, and its cosine to the refined centroid (`cos_refined`,
    * the per-row fit signal whose corpus mean is the spherical
    * inertia). Clustering quality improves monotonically in this
    * metric (MacQueen 1967 / Dhillon & Modha 2001 spherical form);
    * chain the step to iterate, stop when `moved` drains.
    *
    * Because cosine is scale-invariant the updated centroid never needs
    * the division by cell size: the cell's per-dim 12-dp DECIMAL sum
    * vector ([[centroidCosine]]'s convention) IS the refined centroid,
    * exactly DuckDB-replayable. Cells left empty by the first
    * assignment keep their seed centroid (the standard Lloyd empty-cell
    * convention), so `k` never silently shrinks.
    *
    * Scale shape: both assignments are zero-shuffle projections against
    * broadcast centroid reference objects; the update is ONE posexplode
    * pass partial-aggregated to (cells × dims) rows. The only collect is
    * the k×dim refined-centroid table — bounded metadata, the IVF-seed
    * convention. The first assignment is persisted for its two
    * consumers (sum pass + reassign) so the corpus scans twice, never
    * three times. */
  def kmeansStep(embeddings: DataFrame, cellSeedIds: Seq[Long]): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val centers0 = seedCenters(embeddings, cellSeedIds)
    val k = centers0.length
    val assigned = PipelineCaches.track(
      embeddings.filter(col("embedding").isNotNull)
        .select(col("vec_id"), col("embedding"),
          cosCellCol(col("embedding"), centers0).as("cell_init"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val dec = org.apache.spark.sql.types.DecimalType(28, 12)
    val sumVecs = assigned
      .select(col("cell_init").as("_c"),
        posexplode(col("embedding")).as(Seq("_pos", "_x")))
      .groupBy("_c", "_pos")
      .agg(sum(round(col("_x").cast("double"), 12).cast(dec)).as("_s"))
      .groupBy("_c")
      .agg(transform(array_sort(collect_list(struct(col("_pos"), col("_s")))),
        s => s.getField("_s").cast("double")).as("_cent"))
      .collect() // bounded: ≤ k rows of dim doubles each
      .map(r => r.getInt(0) -> r.getSeq[Double](1).toArray).toMap
    val centers1 = (0 until k).map(i => sumVecs.getOrElse(i, centers0(i)))
      .toArray
    val centsDf = centers1.zipWithIndex
      .map { case (c, i) => (i, c.toSeq) }.toSeq.toDF("_cell", "_cent")
    assigned
      .select(col("vec_id"), col("embedding"), col("cell_init"),
        cosCellCol(col("embedding"), centers1).as("cell"))
      .join(broadcast(centsDf), col("cell") === col("_cell"))
      .select(col("vec_id"), col("cell_init"), col("cell"),
        (col("cell") =!= col("cell_init")).as("moved"),
        normZero(round(cosineOrNull(col("embedding"), col("_cent")), 6))
          .as("cos_refined"))
  }

  def semanticDedup(
      embeddings: DataFrame, cellSeedIds: Seq[Long],
      threshold: Double = 0.95,
      maxCellSize: Int = Int.MaxValue): DataFrame = {
    val centers = seedCenters(embeddings, cellSeedIds)
    // cell assignment costs Θ(k·d) per row (one cosine per centroid) and
    // is referenced by FOUR consumers (the size relation, both pair
    // sides, and the output join) — materialize it once or the
    // occupancy-pinned large-k regime pays assignment 4×, which measured
    // SLOWER than the quadratic small-k it replaces (sf1 probe: 51 s vs
    // 35 s at k=313 before this persist)
    val assigned = PipelineCaches.track(
      embeddings.select(col("vec_id"), col("embedding"),
        cosCellCol(col("embedding"), centers).as("cell"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val sizes = assigned.groupBy("cell").agg(count(lit(1)).as("_n"))
    val within = assigned.join(
      broadcast(sizes.filter(col("_n") <= maxCellSize).select("cell")),
      Seq("cell"))
    val a = within.select(col("cell"), col("vec_id").as("id_a"),
      col("embedding").as("emb_a"))
    val b = within.select(col("cell"), col("vec_id").as("id_b"),
      col("embedding").as("emb_b"))
    val dup = a.join(b, Seq("cell"))
      .filter(col("id_a") < col("id_b"))
      .filter(round(cosineOrNull(col("emb_a"), col("emb_b")), 6) >= threshold)
      .select(col("id_b").as("vec_id")).distinct()
      .withColumn("is_semdup", lit(true))
    assigned.select(col("vec_id"), col("cell"))
      .join(broadcast(sizes.filter(col("_n") > maxCellSize)
        .select(col("cell"), lit(true).as("cell_oversized"))),
        Seq("cell"), "left")
      .join(dup, Seq("vec_id"), "left")
      .select(col("vec_id"), col("cell"),
        coalesce(col("is_semdup"), lit(false)).as("is_semdup"),
        coalesce(col("cell_oversized"), lit(false)).as("cell_oversized"))
  }
}
