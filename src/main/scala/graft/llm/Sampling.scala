package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus sampling and ordering operators a training-data pipeline runs
  * between curation and tokenization (SURVEY §2.8 extension): deterministic
  * global shuffle, stable hash sampling, domain-mixture resampling, and
  * quantile-threshold filtering.
  *
  * Everything is keyed on md5 of stable ids — rerun-stable, join-consistent
  * (the same doc samples identically in every derived table), and exactly
  * reproducible by the DuckDB oracle. No rand()/seed state anywhere.
  */
object Sampling {

  private def md5Key(id: Column): Column = md5(id.cast("string"))

  /** Whole-relation window for attaching global totals to an already-tiny
    * aggregate (domain/bucket-cardinality rows). A `crossJoin(broadcast(
    * rel.agg(...)))` here would put the SAME corpus-derived lineage on
    * both sides of the join — Spark plans each side independently, so the
    * corpus gets scanned once per reuse (measured: 4 full scans on the
    * token-budget card). A window total stays inside the one linear plan:
    * one corpus pass, then a single-partition shuffle of the tiny
    * aggregate only. Constant partition key (not `partitionBy()`) so the
    * planner doesn't emit the moving-all-data warning for what is a
    * deliberate bounded-relation collapse. */
  private[llm] val allRows = Window.partitionBy(lit(0))

  /** Deterministic global shuffle: every doc gets a position in a
    * pseudo-random total order (md5 of doc_id, ties impossible beyond the
    * id itself) plus a round-robin shard assignment — the "shuffle the
    * corpus once per epoch" step before sequence packing.
    *
    * Scale shape: this is NOT a single global window. Rows are
    * range-partitioned on the shuffle key, ranked within each range
    * partition, and offset by broadcast per-partition counts — the
    * standard distributed sort-rank. The composition is independent of
    * where the range boundaries fall, so the output is deterministic even
    * though the partitioner samples. Each window frame holds one range
    * partition (~corpus/parallelism), never the whole corpus. */
  def corpusShuffle(docs: DataFrame, nShards: Int = 8, parallelism: Int = 32)
      : DataFrame = {
    // The pid column is consumed by TWO jobs (the offsets aggregate and
    // the rank join). spark_partition_id() re-evaluates per execution,
    // and AQE may coalesce the range shuffle differently under different
    // downstream plans — so the (row → pid) assignment is materialized
    // ONCE and both consumers read the same persisted rows. Footprint is
    // (id, 32-char key, int) per row; PipelineCaches reclaims it.
    val keyed = PipelineCaches.track(
      docs.select(col("doc_id"), md5Key(col("doc_id")).as("_k"))
        .repartitionByRange(parallelism, col("_k"), col("doc_id"))
        .withColumn("_pid", spark_partition_id())
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    keyed.count()
    // per-partition row counts → exclusive prefix offsets (parallelism
    // rows: driver-scale, broadcast back)
    val offsets = keyed.groupBy("_pid").agg(count(lit(1)).as("_c"))
      .withColumn("_offset",
        coalesce(sum("_c").over(
          Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select("_pid", "_offset")
    val intra = Window.partitionBy("_pid").orderBy(col("_k"), col("doc_id"))
    keyed.withColumn("_r", row_number().over(intra))
      .join(broadcast(offsets), Seq("_pid"))
      .select(col("doc_id"),
        (col("_offset") + col("_r")).as("position"),
        ((col("_offset") + col("_r") - 1) % nShards).as("shard"))
  }

  /** md5 bucket 0–99 built with Column functions (same derivation as
    * ComputeRegistry's hash_bucket kernel) — NOT SQL-string interpolation,
    * so an idCol containing spaces/quotes/reserved words resolves like any
    * other column reference instead of breaking (or re-parsing as) an
    * expression. */
  private def md5Bucket(idCol: String): Column = md5Bucket(col(idCol))

  /** The shared stable sampling bucket (0–99): first 8 hex chars of
    * md5(id as string), base-16 → long, mod 100. Everything split- or
    * sample-shaped in the library keys off THIS bucket so samples nest
    * and joins stay consistent ([[hashSample]] docs). */
  private[llm] def md5Bucket(id: Column): Column =
    conv(substring(md5(id.cast("string")), 1, 8), 16, 10)
      .cast("long") % 100

  /** Stable hash sample: keep a doc iff its md5 bucket (0–99) falls below
    * `pct`. Unlike rand()-based sampling this is rerun-stable and
    * join-consistent across tables/runs — the property that matters when
    * a 100 TB corpus and its derived features must sample identically.
    * Pure projection + filter: no shuffle at any scale. */
  /** EXACT-N stratified sampler via largest-remainder (Hamilton)
    * apportionment — [[stratifiedHashSample]] keeps a RATE (sample size
    * binomially distributed); evaluation sets and fixed-budget
    * annotation batches need an exact target: exactly `targetN` rows
    * total, allocated proportionally across strata with the floor
    * quotas topped up by largest fractional remainder (tie → stratum
    * asc), selection within a stratum by md5(doc_id) rank (tie →
    * doc_id) — fully deterministic, no RNG state. The quota arithmetic
    * is ALL-INTEGER: floor = (targetN·c) div total, remainder =
    * (targetN·c) mod total — no float shares anywhere.
    *
    * Returns every row with its stratum quota and a `selected` flag
    * (rows preserved — callers filter). Scale note: exact-N inherently
    * ranks within strata (a per-stratum window); the rate-based
    * [[hashSample]] family is the zero-shuffle path when a binomial
    * sample size is acceptable. Quotas never exceed stratum sizes:
    * floor < c when targetN < total, so +1 still fits. */
  def stratAlloc(docs: DataFrame, groupCol: String, targetN: Long,
      idCol: String = "doc_id", knownCount: Option[Long] = None)
      : DataFrame = {
    require(targetN >= 0, s"targetN must be >= 0, got $targetN")
    // knownCount lets a caller that already counted the relation (the
    // strat_alloc kernel derives targetN from the same count) skip the
    // guard's extra action (round-15 advice fix)
    require(targetN <= knownCount.getOrElse(docs.count()),
      s"stratAlloc: targetN=$targetN exceeds the corpus size")
    val counts = docs.groupBy(col(groupCol).as("_g"))
      .agg(count(lit(1)).as("_c"))
    // all-integer apportionment (long div/mod — exact while c·targetN
    // fits 63 bits; pre-scale the target at truly absurd products); all
    // windows ride the stratum-count table (bounded by strata).
    // NULLS LAST on the remainder tie-break: the NULL stratum is
    // first-class (null-safe quota join below), and Spark's asc is
    // nulls-first where DuckDB's is nulls-last — without the explicit
    // ordering a remainder tie involving the NULL stratum would land
    // the +1 quota on different strata in the two engines (the
    // joinSkewCard convention, round-15 advice fix)
    val wAll = Window.partitionBy(lit(0))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val wRem = Window.partitionBy(lit(0))
      .orderBy(col("_rem").desc, col("_g").asc_nulls_last)
    val quotas = counts
      .withColumn("_tot", sum("_c").over(wAll))
      .withColumn("_fl", expr(s"(_c * ${targetN}L) div _tot"))
      .withColumn("_rem", expr(s"(_c * ${targetN}L) % _tot"))
      .withColumn("_deficit", lit(targetN) - sum("_fl").over(wAll))
      .withColumn("_rrank", row_number().over(wRem))
      .select(col("_g"),
        (col("_fl") + when(col("_rrank") <= col("_deficit"), 1L)
          .otherwise(0L)).cast("bigint").as("quota"))
    val wSel = Window.partitionBy("_g")
      .orderBy(md5(col(idCol).cast("string")).asc, col(idCol).asc)
    // NULL-SAFE quota attach: groupBy keeps a NULL stratum as its own
    // group, so the join back must match it too (<=>) — an equi-join
    // would silently drop every NULL-stratum row and the operator could
    // return fewer than targetN selected rows (round-14 advice fix)
    docs.withColumn("_g", col(groupCol))
      .withColumn("_srank", row_number().over(wSel))
      .join(broadcast(quotas.withColumnRenamed("_g", "_gq")),
        col("_g") <=> col("_gq"))
      .select(col(idCol), col("_g").as(groupCol), col("quota"),
        (col("_srank") <= col("quota")).as("selected"))
  }

  def hashSample(docs: DataFrame, pct: Int, idCol: String = "doc_id")
      : DataFrame = {
    require(pct >= 0 && pct <= 100, s"pct must be in [0,100], got $pct")
    docs.withColumn("bucket", md5Bucket(idCol)).filter(col("bucket") < pct)
  }

  /** Stratified hash sample: per-row keep-rate (0–100, e.g. a per-domain
    * target-rate lookup) against the same md5 bucket as [[hashSample]] —
    * the downweighting half of mixture matching ([[domainMix]] upweights).
    * Because all rates read one shared bucket, a doc kept at rate r stays
    * in every sample with rate ≥ r (nested samples), and the operator
    * stays a zero-shuffle projection + filter. */
  def stratifiedHashSample(
      docs: DataFrame, rate: Column, idCol: String = "doc_id"): DataFrame =
    docs.withColumn("bucket", md5Bucket(idCol))
      .withColumn("keep_rate", rate.cast("int"))
      .filter(col("bucket") < col("keep_rate"))

  /** Domain-mixture resampling: replicate each doc `factor` times (factor
    * from a per-row Column, e.g. a target-weight lookup on the source
    * domain) with a copy index — the integer-upsampling half of matching
    * a target domain mixture; downweighting composes with [[hashSample]].
    * Factor ≤ 0 (or NULL) DROPS the doc — a zeroed-out domain must vanish,
    * and Spark's `sequence(1, 0)` would otherwise count DOWN to [1, 0] and
    * silently duplicate it instead.
    *
    * Plan shape: the factor is a per-row expression and the replication
    * is a generator (explode of a sequence) — map-side only, no shuffle.
    * Output carries (n_copies, copy_idx) so downstream epoch logic can
    * distinguish replicas. */
  def domainMix(docs: DataFrame, factor: Column): DataFrame =
    docs.withColumn("n_copies", factor.cast("int"))
      .withColumn("copy_idx", explode(
        when(col("n_copies") >= 1, expr("sequence(1, n_copies)"))
          .otherwise(expr("array()"))))

  /** Temperature-scaled domain mixture (the multilingual-training
    * standard, Lample & Conneau 2019 §3.1 / XLM-R): resampling shares
    * p_i ∝ (n_i/N)^alpha renormalized — alpha < 1 flattens the natural
    * distribution (upweights rare domains), alpha = 1 keeps it, 0 is
    * uniform. Returns the per-domain mix table (domain, n_docs,
    * natural_share, temp_share, factor) where factor = temp_share /
    * natural_share is the up/down-sampling multiplier [[domainMix]]
    * materializes. NULL domains form their own first-class mixture
    * group (both engines' GROUP BY puts NULLs in one group) — consumers
    * joining the table back per-row must join null-safely (`<=>`), as
    * the `temperature_mix` DSL kernel does.
    *
    * Scale shape: ONE aggregation keyed by domain; everything after
    * runs on the domain-sized table (broadcast one-row totals, the
    * TF-IDF N pattern — no driver collect). Cross-engine determinism:
    * the pow weights are rounded to 12 dp (6 dp would zero any domain
    * with natural_share^alpha < 5e-7 — a 4-doc domain in a 10M-doc
    * corpus at alpha=1 — and a zero weight means factor 0, i.e. the
    * domain silently DROPPED from the mix; at 12 dp the underflow
    * point sits past any realistic corpus) and summed as DECIMAL
    * before normalizing, so neither libm's last pow ulp nor
    * partial-sum order can flip an oracle hash. */
  def temperatureShares(
      docs: DataFrame, domainCol: String, alpha: Double): DataFrame = {
    require(alpha >= 0, s"temperature alpha must be >= 0, got $alpha")
    val counts = docs.groupBy(col(domainCol).as("domain"))
      .agg(count(lit(1)).as("n_docs"))
    // totals as whole-relation windows over the domain-sized table (see
    // allRows): the corpus aggregation runs ONCE; broadcast-agg totals
    // here would re-scan the corpus per total
    val w = counts
      .withColumn("_n", sum("n_docs").over(allRows))
      .withColumn("_nat", col("n_docs").cast("double") / col("_n"))
      .withColumn("_w",
        round(pow(col("_nat"), lit(alpha)), 12)
          .cast(org.apache.spark.sql.types.DecimalType(28, 12)))
    w.withColumn("_z", sum("_w").over(allRows))
      .select(col("domain"), col("n_docs"),
        round(col("_nat"), 6).as("natural_share"),
        round(col("_w").cast("double") / col("_z").cast("double"), 6)
          .as("temp_share"),
        round((col("_w").cast("double") / col("_z").cast("double")) /
          col("_nat"), 6).as("factor"))
  }

  /** Per-domain token-budget allocation — the epoch-planning card of a
    * training-mix design: given a total token `budget` and temperature
    * `alpha`, each domain's temperature share of the budget (XLM-style
    * p^alpha flattening of the TOKEN distribution) becomes its target
    * token count; `sampling_rate` = target/available, and rates above 1
    * mean the domain repeats — `epochs` = ceil(rate), the
    * data-constrained repeat regime (Muennighoff et al. 2023).
    *
    * Scale shape: ONE domain-keyed aggregation (map-side combined) over
    * the corpus; everything downstream runs on the domain-sized table
    * with 1-row broadcast totals. Temperature weights sum as 12-dp
    * DECIMAL so the normalizer is partition-order independent (the
    * [[temperatureShares]] convention). */
  def tokenBudget(docs: DataFrame, domainCol: String, tokenCol: String,
      budget: Long, alpha: Double): DataFrame = {
    require(budget > 0, s"token budget must be positive, got $budget")
    tokenBudgetCore(docs, domainCol, tokenCol, lit(budget.toDouble), alpha)
  }

  /** [[tokenBudget]] with the budget = the relation's OWN total token
    * mass (the mass-preserving rebalance — rates average 1, the flattening
    * only REDISTRIBUTES): the total is read off the domain aggregate the
    * plan already computes, so there is no second corpus pass and no
    * driver collect — the `token_budget` DSL kernel's parameter-free
    * form. */
  def tokenBudgetSelf(docs: DataFrame, domainCol: String, tokenCol: String,
      alpha: Double): DataFrame =
    tokenBudgetCore(docs, domainCol, tokenCol, col("_n").cast("double"),
      alpha)

  private def tokenBudgetCore(docs: DataFrame, domainCol: String,
      tokenCol: String, budgetCol: Column, alpha: Double): DataFrame = {
    require(alpha >= 0, s"temperature alpha must be >= 0, got $alpha")
    val counts = docs.groupBy(col(domainCol).as("domain"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col(tokenCol)).cast("long").as("n_tokens"))
    // totals as whole-relation windows over the domain-sized table (see
    // allRows — broadcast-agg totals would re-scan the corpus per total,
    // measured 4 full scans on this very card). The zero/NULL-mass
    // contract error still rides INSIDE the pass (raise_error at
    // execution, before the share divisions), never a separate guard job
    val tot = sum("n_tokens").over(allRows)
    val w = counts
      .withColumn("_n",
        when(tot.isNull || tot <= 0,
          raise_error(lit("token_budget: relation has no token mass " +
            "(token column sums to NULL or 0)")).cast("bigint"))
          .otherwise(tot))
      .withColumn("_nat",
        col("n_tokens").cast("double") / col("_n").cast("double"))
      .withColumn("_w",
        round(pow(col("_nat"), lit(alpha)), 12)
          .cast(org.apache.spark.sql.types.DecimalType(28, 12)))
    w.withColumn("_z", sum("_w").over(allRows))
      .withColumn("_q", col("_w").cast("double") / col("_z").cast("double"))
      .withColumn("target_tokens",
        round(col("_q") * budgetCol).cast("bigint"))
      .select(col("domain"), col("n_docs"), col("n_tokens"),
        round(col("_nat"), 6).as("natural_share"),
        round(col("_q"), 6).as("temp_share"),
        col("target_tokens"),
        round(col("target_tokens").cast("double") /
          col("n_tokens").cast("double"), 6).as("sampling_rate"),
        ceil(col("target_tokens").cast("double") /
          col("n_tokens").cast("double")).cast("bigint").as("epochs"))
  }

  /** UniMax token allocation (Chung et al. 2023): spread a total token
    * `budget` as UNIFORMLY as possible across domains, capping every
    * domain at `epochCap` epochs of its own mass — the principled
    * alternative to temperature mixing that never over-repeats a small
    * domain. Closed form: ascending by capacity, a domain saturates iff
    * its capacity fits the would-be equal share of what's left
    * (`cap_i · remaining_domains ≤ budget − prefix_caps`); saturation is
    * prefix-monotone in that order, so the unsaturated tail splits the
    * post-saturation remainder evenly (the waterfill level). Boundary
    * domains (capacity exactly at level) allocate identically under
    * either label, so the closed form is label-stable.
    *
    * Cross-engine determinism: capacities are 6-dp-rounded
    * DECIMAL(28,6), prefix/saturated sums stay DECIMAL, and the
    * saturation comparison is all-DECIMAL — no double ever decides a
    * boundary. Only the reported level/epochs divide as doubles, after
    * rounding.
    *
    * Scale shape: ONE domain-keyed aggregation (map-side combined) over
    * the corpus; the ordered windows run on the domain-sized table
    * (the [[allRows]] convention — domains are a handful of rows at any
    * corpus size). */
  def unimaxAlloc(docs: DataFrame, domainCol: String, tokenCol: String,
      budget: Long, epochCap: Double): DataFrame = {
    require(budget > 0, s"token budget must be positive, got $budget")
    require(epochCap > 0, s"epoch cap must be positive, got $epochCap")
    val dec6 = org.apache.spark.sql.types.DecimalType(28, 6)
    val zero6 = lit(0).cast(dec6)
    val counts = docs.groupBy(col(domainCol).as("domain"))
      .agg(count(lit(1)).as("n_docs"),
        coalesce(sum(col(tokenCol)), lit(0L)).cast("long").as("n_tokens"))
    val byCap = Window.partitionBy(lit(0)).orderBy(col("_cap"), col("domain"))
    val ranked = counts
      .withColumn("_cap",
        round(lit(epochCap) * col("n_tokens").cast("double"), 6).cast(dec6))
      .withColumn("_i", row_number().over(byCap))
      .withColumn("_sprev", coalesce(
        sum("_cap").over(byCap.rowsBetween(Window.unboundedPreceding, -1)),
        zero6))
      .withColumn("_n", count(lit(1)).over(allRows))
      .withColumn("saturated",
        col("_cap") * (col("_n") - col("_i") + 1) <= lit(budget) - col("_sprev"))
    val level = (lit(budget).cast("double") -
      sum(when(col("saturated"), col("_cap")).otherwise(zero6)).over(allRows)
        .cast("double")) /
      sum(when(col("saturated"), 0L).otherwise(1L)).over(allRows).cast("double")
    ranked
      .withColumn("allocated",
        when(col("saturated"), col("_cap").cast("double"))
          .otherwise(round(level, 6)))
      .select(col("domain"), col("n_docs"), col("n_tokens"),
        col("_cap").cast("double").as("capacity"), col("saturated"),
        col("allocated"),
        when(col("n_tokens") > 0,
          round(col("allocated") / col("n_tokens").cast("double"), 6))
          .as("epochs"))
  }

  /** Attach the `valueCol` percent_rank (value-ties share a rank, SQL
    * semantics) to every row as a `percent_rank` column. Rows with NULL
    * values are preserved with a NULL rank — they are not comparable, and
    * dropping them (the inner-join formulation) silently shrinks a table
    * whose scored column has gaps.
    *
    * Scale shape: a naive `percent_rank() OVER (ORDER BY v)` is a
    * single-partition global sort — the round-1 scale-killer pattern.
    * This computes the identical result from the VALUE HISTOGRAM instead:
    * aggregate counts per distinct value (one shuffle keyed by value),
    * prefix-sum the distinct-value table, and broadcast-join the
    * per-value rank back. percent_rank = (rank − 1)/(N − 1) with rank =
    * 1 + count of strictly-smaller rows — exactly the window definition,
    * at histogram cost.
    *
    * The histogram is DISTINCT-VALUE-sized: bounded for integral or
    * discretized columns (lengths, counts, rounded scores), but for a
    * continuous double column it approaches row count and the prefix-sum
    * window/broadcast stop being cheap. Discretize first (e.g.
    * `round(score, 3)` — ranks shift by at most the bucket width) before
    * ranking a continuous score at corpus scale. The `maxDistinctValues`
    * guard ENFORCES this: the histogram is counted (it is persisted and
    * reused by the rank pass, so the count is not an extra scan) and a
    * cardinality above the cap raises instead of silently building a
    * row-count-sized single-partition window. */
  def percentRank(docs: DataFrame, valueCol: String,
      maxDistinctValues: Long = 1000000L): DataFrame = {
    val nonNull = docs.filter(col(valueCol).isNotNull)
    val hist = PipelineCaches.track(
      nonNull.groupBy(valueCol).agg(count(lit(1)).as("_c"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val distinct = hist.count()
    require(distinct <= maxDistinctValues,
      s"percentRank('$valueCol'): $distinct distinct values exceed " +
        s"maxDistinctValues=$maxDistinctValues; the rank histogram would " +
        "approach row count and its prefix-sum window becomes a " +
        "single-partition bottleneck at scale. Discretize the column " +
        "first (e.g. round(score, 3)), use percentRankContinuous (exact " +
        "range-partitioned rank, any cardinality), or raise the cap " +
        "explicitly.")
    val wPrev = Window.orderBy(valueCol).rowsBetween(Window.unboundedPreceding, -1)
    val wAll = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val ranked = hist
      .withColumn("_smaller", coalesce(sum("_c").over(wPrev), lit(0L)))
      .withColumn("_n", sum("_c").over(wAll))
      .withColumn("percent_rank",
        when(col("_n") > 1,
          round(col("_smaller").cast("double") /
            (col("_n") - 1).cast("double"), 6))
          .otherwise(lit(0.0)))
      .select(col(valueCol), col("percent_rank"))
    docs.join(broadcast(ranked), Seq(valueCol), "left")
  }

  /** Robust outlier scoring via median/MAD — the quality-filter
    * primitive for heavy-tailed corpus statistics (doc lengths, scores)
    * where mean/σ z-scores are themselves dragged by the outliers they
    * should flag. robust_z = |x − median| / (1.4826·MAD) (the
    * normal-consistency constant); `is_outlier` = robust_z > k
    * (k=3.5, Iglewicz–Hoaglin's modified-z cutoff). Both the median and
    * the MAD are TYPE-1 histogram quantiles (smallest value with
    * 2·cum ≥ n — an integer compare, engine-exact), computed over the
    * SAME persisted value histogram: the deviation histogram is a tiny
    * re-aggregation of the cached one, never a second corpus pass, so
    * the whole operator costs one corpus aggregation plus the
    * row-preserving attach. Cardinality-guarded like [[percentRank]].
    *
    * Degenerate spread (MAD = 0, i.e. more than half the values
    * identical): robust_z is NULL (the scale is undefined) and
    * `is_outlier` = value ≠ median — under zero spread ANY deviation
    * from the majority value is anomalous. NULL values: NULL score,
    * NULL flag, row preserved. */
  def madOutliers(docs: DataFrame, valueCol: String, k: Double = 3.5,
      maxDistinctValues: Long = 1000000L): DataFrame = {
    require(k > 0, s"outlier cutoff k must be positive, got $k")
    val hist = PipelineCaches.track(
      docs.filter(col(valueCol).isNotNull)
        .groupBy(valueCol).agg(count(lit(1)).as("_c"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val distinct = hist.count()
    require(distinct <= maxDistinctValues,
      s"madOutliers('$valueCol'): $distinct distinct values exceed " +
        s"maxDistinctValues=$maxDistinctValues; discretize the column " +
        "first (e.g. round(score, 3)) or raise the cap explicitly.")
    def histMedian(h: DataFrame, vCol: String, as: String): DataFrame = {
      val wCum = Window.orderBy(vCol)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wTot = Window
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      h.withColumn("_cum", sum("_c").over(wCum))
        .withColumn("_n", sum("_c").over(wTot))
        .agg(min(when(col("_cum") * 2 >= col("_n"), col(vCol))).as(as))
    }
    val med = histMedian(hist, valueCol, "_med")
    val devHist = hist.crossJoin(broadcast(med))
      .select(abs(col(valueCol) - col("_med")).as("_dev"), col("_c"))
      .groupBy("_dev").agg(sum("_c").as("_c"))
    val mad = histMedian(devHist, "_dev", "_mad")
    val z = round(
      abs(col(valueCol).cast("double") - col("_med").cast("double")) /
        (lit(1.4826) * col("_mad").cast("double")), 6)
    docs.crossJoin(broadcast(med)).crossJoin(broadcast(mad))
      .withColumn("robust_z",
        when(col(valueCol).isNull || col("_mad") === 0,
          lit(null).cast("double")).otherwise(z))
      .withColumn("is_outlier",
        when(col(valueCol).isNull, lit(null).cast("boolean"))
          .when(col("_mad") === 0,
            col(valueCol).cast("double") =!= col("_med").cast("double"))
          .otherwise(col("robust_z") > k))
      .drop("_med", "_mad")
  }

  /** Winsorize: clip `valueCol` at its [pLo, pHi] type-1 quantiles — the
    * robust tail-taming a quality-score or length column gets before any
    * mean/variance-based downstream use (a single 2 GB document must not
    * set the scale of a z-score). The clipped value attaches as
    * `winsorized` with `clipped_lo`/`clipped_hi` audit flags; NULL
    * values stay NULL on all three.
    *
    * Both quantiles are type-1 (smallest value whose cumulative count
    * reaches ceil(p·N)) read from ONE persisted value histogram — the
    * [[madOutliers]] machinery pointed at two cut points, integer
    * comparisons throughout, so the oracle replays exactly. The
    * histogram is distinct-value-sized and cardinality-guarded like
    * [[percentRank]]: discretize a continuous column first. */
  def winsorize(docs: DataFrame, valueCol: String, pLo: Double = 0.01,
      pHi: Double = 0.99, maxDistinctValues: Long = 1000000L): DataFrame = {
    require(pLo >= 0 && pHi <= 1 && pLo < pHi,
      s"winsorize needs 0 <= pLo < pHi <= 1, got ($pLo, $pHi)")
    val hist = PipelineCaches.track(
      docs.filter(col(valueCol).isNotNull)
        .groupBy(valueCol).agg(count(lit(1)).as("_c"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val distinct = hist.count()
    require(distinct <= maxDistinctValues,
      s"winsorize('$valueCol'): $distinct distinct values exceed " +
        s"maxDistinctValues=$maxDistinctValues; discretize the column " +
        "first (e.g. round(score, 3)) or raise the cap explicitly.")
    val wCum = Window.orderBy(valueCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wTot = Window
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val qs = hist.withColumn("_cum", sum("_c").over(wCum))
      .withColumn("_n", sum("_c").over(wTot))
      .agg(
        min(when(col("_cum") >= ceil(lit(pLo) * col("_n")), col(valueCol)))
          .as("_qlo"),
        min(when(col("_cum") >= ceil(lit(pHi) * col("_n")), col(valueCol)))
          .as("_qhi"))
    docs.crossJoin(broadcast(qs))
      .withColumn("winsorized",
        when(col(valueCol).isNull, col(valueCol))
          .otherwise(least(greatest(col(valueCol), col("_qlo")),
            col("_qhi"))))
      .withColumn("clipped_lo",
        when(col(valueCol).isNull, lit(null).cast("boolean"))
          .otherwise(col(valueCol) < col("_qlo")))
      .withColumn("clipped_hi",
        when(col(valueCol).isNull, lit(null).cast("boolean"))
          .otherwise(col(valueCol) > col("_qhi")))
      .drop("_qlo", "_qhi")
  }

  /** Two-sample Kolmogorov–Smirnov drift card between two corpora's
    * value distributions — the snapshot-over-snapshot regression check
    * (did this crawl's length/quality/score distribution shift?). One
    * row: side sizes, the KS statistic D = max |F_a − F_b|, the value
    * where the gap peaks (`ks_at`, smallest on ties), the α=0.05
    * critical value c(α)·sqrt((n_a+n_b)/(n_a·n_b)) with c(0.05)=1.358
    * (Smirnov's asymptotic form), and the `drifted` verdict.
    *
    * Exactly oracle-replayable: both empirical CDFs ride ONE
    * side-tagged value histogram (a single union scan, map-side
    * combined), and the sup gap is compared as the INTEGER
    * |cum_a·n_b − cum_b·n_a| — no float CDF division until the final
    * 6-dp rounding of the one winning ratio. NULL values are excluded
    * (they have no rank). The histogram is cardinality-guarded like
    * [[winsorize]]; discretize continuous columns first. Side sizes
    * are required < 3·10⁹ so the integer cross-products stay in BIGINT
    * (shard the card beyond that). */
  def ksDrift(a: DataFrame, b: DataFrame, valueCol: String,
      maxDistinctValues: Long = 1000000L): DataFrame = {
    val tagged = a.select(col(valueCol).as("_v"), lit(0).as("_side"))
      .unionAll(b.select(col(valueCol).as("_v"), lit(1).as("_side")))
      .filter(col("_v").isNotNull)
    val hist = PipelineCaches.track(tagged.groupBy("_v")
      .agg(sum(when(col("_side") === 0, 1L).otherwise(0L)).as("_ca"),
        sum(when(col("_side") === 1, 1L).otherwise(0L)).as("_cb"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val distinct = hist.count()
    require(distinct <= maxDistinctValues,
      s"ksDrift('$valueCol'): $distinct distinct values exceed " +
        s"maxDistinctValues=$maxDistinctValues; discretize the column " +
        "first or raise the cap explicitly.")
    val Array(na, nb) = hist.agg(sum("_ca"), sum("_cb")).collect()(0)
      .toSeq.map(v => Option(v).fold(0L)(_.asInstanceOf[Long])).toArray
    require(na > 0 && nb > 0,
      s"ksDrift('$valueCol'): both sides need non-NULL rows " +
        s"(got n_a=$na, n_b=$nb)")
    require(na < 3000000000L && nb < 3000000000L,
      s"ksDrift('$valueCol'): side sizes must stay < 3e9 so the " +
        s"integer D comparisons fit in BIGINT (got $na, $nb); " +
        "shard the card per stratum instead.")
    val wCum = Window.orderBy("_v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val scored = PipelineCaches.track(hist
      .withColumn("_dnum", abs(sum("_ca").over(wCum) * lit(nb) -
        sum("_cb").over(wCum) * lit(na)))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val dm = scored.agg(max("_dnum").as("_dm"))
    val denom = na.toDouble * nb.toDouble
    val crit = 1.358 * math.sqrt((na + nb).toDouble / denom)
    scored.crossJoin(broadcast(dm)).filter(col("_dnum") === col("_dm"))
      .agg(min("_v").as("ks_at"), max("_dnum").as("_dnum"))
      .select(lit(na).as("n_a"), lit(nb).as("n_b"),
        lit(distinct).as("n_values"), col("ks_at"),
        round(col("_dnum").cast("double") / lit(denom), 6).as("ks_stat"),
        round(lit(crit), 6).as("crit_05"))
      .withColumn("drifted", col("ks_stat") > col("crit_05"))
  }

  /** Per-group type-1 quantiles of a value column — the grouped
    * length-distribution card (p10/p50/p90 of document length per
    * language is the standard corpus data-sheet row; a language whose
    * median length collapses after a filter change is the regression
    * signal this surfaces). One output row per group with the row count
    * and one column per requested quantile (`p10`, `p50`, ...).
    *
    * Same machinery as [[winsorize]] pointed at groups: ONE
    * (group, value)-keyed histogram aggregation over the corpus
    * (cardinality-guarded — discretize continuous columns first), then
    * group-partitioned cumulative windows on the histogram; every
    * quantile is the smallest value whose within-group cumulative count
    * reaches ceil(p·N_g) — integer comparisons after an engine-identical
    * ceil, exactly oracle-replayable. NULL values are excluded (they
    * have no rank); groups that are all-NULL vanish with them. */
  def groupedQuantiles(docs: DataFrame, groupCol: String, valueCol: String,
      ps: Seq[Double] = Seq(0.1, 0.5, 0.9),
      maxDistinctValues: Long = 1000000L): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p > 0 && p <= 1),
      s"quantiles must be in (0, 1], got $ps")
    val hist = PipelineCaches.track(
      docs.filter(col(valueCol).isNotNull)
        .groupBy(groupCol, valueCol).agg(count(lit(1)).as("_c"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val distinct = hist.count()
    require(distinct <= maxDistinctValues,
      s"groupedQuantiles('$groupCol', '$valueCol'): $distinct histogram " +
        s"rows exceed maxDistinctValues=$maxDistinctValues; discretize " +
        "the column first or raise the cap explicitly.")
    val wCum = Window.partitionBy(groupCol).orderBy(valueCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wTot = Window.partitionBy(groupCol)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val cums = hist
      .withColumn("_cum", sum("_c").over(wCum))
      .withColumn("_n", sum("_c").over(wTot))
    val qCols = ps.map { p =>
      val label = "p" + math.round(p * 100).toInt
      min(when(col("_cum") >= ceil(lit(p) * col("_n")), col(valueCol)))
        .as(label)
    }
    cums.groupBy(groupCol)
      .agg(max("_n").cast("bigint").as("n_rows"), qCols: _*)
  }

  /** Temporal train/test split with a purge gap: rows up to the
    * `trainPct` time quantile are `train`, the next `gapMinutes` are
    * `purged` (the leakage buffer standard in forecasting/backtest
    * evaluation — de Prado's purged split: anything whose label window
    * could straddle the boundary is excluded from both sides), the rest
    * `test`. The time-ordered sibling of [[Curation.leakageSafeSplit]]:
    * that one keys on CONTENT groups, this one on TIME.
    *
    * The cutoff is the type-1 quantile of the MINUTE-bucketed timestamp
    * histogram (smallest minute whose cumulative row count reaches
    * trainPct% — an all-integer comparison, exactly oracle-replayable).
    * Minute bucketing keeps the histogram bounded by the time RANGE,
    * not the row count — a 100 TB event stream still spans bounded
    * minutes — at the documented cost that the cut lands on a minute
    * boundary. NULL timestamps get a NULL split (rows preserved).
    *
    * Scale shape: one map-side-combined minute aggregation over the
    * corpus; the quantile windows run on the minute-sized histogram;
    * the 1-row cutoff broadcasts back. */
  def temporalSplit(rows: DataFrame, tsCol: String, trainPct: Int = 80,
      gapMinutes: Int = 60): DataFrame = {
    require(trainPct > 0 && trainPct < 100,
      s"trainPct must be in (0, 100), got $trainPct")
    require(gapMinutes >= 0, s"gapMinutes must be >= 0, got $gapMinutes")
    val wCum = Window.orderBy("_m")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wTot = Window
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val cut = rows.filter(col(tsCol).isNotNull)
      .select(date_trunc("minute", col(tsCol)).as("_m"))
      .groupBy("_m").agg(count(lit(1)).as("_c"))
      .withColumn("_cum", sum("_c").over(wCum))
      .withColumn("_n", sum("_c").over(wTot))
      .agg(min(when(col("_cum") * 100 >= col("_n") * trainPct, col("_m")))
        .as("_cut"))
    rows.crossJoin(broadcast(cut))
      .withColumn("split",
        when(col(tsCol).isNull, lit(null).cast("string"))
          .when(date_trunc("minute", col(tsCol)) <= col("_cut"),
            lit("train"))
          .when(date_trunc("minute", col(tsCol)) <=
            col("_cut") + expr(s"INTERVAL $gapMinutes MINUTES"),
            lit("purged"))
          .otherwise(lit("test")))
      .drop("_cut")
  }

  /** Quantile-threshold filter: keep rows whose `valueCol` percent_rank is
    * ≥ `minPercentRank`. NULL-valued rows have no rank and are dropped —
    * see [[percentRank]] (which preserves them) for the attach-only form
    * and the histogram-cardinality caveat. */
  def quantileFilter(
      docs: DataFrame, valueCol: String, minPercentRank: Double,
      maxDistinctValues: Long = 1000000L): DataFrame =
    percentRank(docs, valueCol, maxDistinctValues)
      .filter(col("percent_rank") >= minPercentRank)

  /** percent_rank for CONTINUOUS value columns — the case [[percentRank]]'s
    * cardinality guard refuses (a near-row-count histogram). This is the
    * corpusShuffle machinery pointed at the value: range-partition on
    * (value, doc_id), row_number within each range partition, offset by
    * the broadcast per-partition counts — an exact global position with
    * NO single global window at any cardinality.
    *
    * Semantics difference, stated precisely: ties are broken by doc_id
    * (position-based percentile, (pos − 1)/(N − 1)), where the SQL
    * percent_rank gives tied values the same rank. On a genuinely
    * continuous column ties are measure-zero and the two agree; for
    * heavy-tie columns use [[percentRank]], whose histogram handles ties
    * exactly and whose cost is bounded by the cardinality this variant
    * exists to escape. NULL values get a NULL rank (rows preserved). */
  def percentRankContinuous(
      docs: DataFrame, valueCol: String, parallelism: Int = 32): DataFrame = {
    require(docs.columns.contains("doc_id"),
      s"percentRankContinuous requires a 'doc_id' key column; relation " +
        s"has [${docs.columns.mkString(", ")}]")
    val keyed = PipelineCaches.track(
      docs.filter(col(valueCol).isNotNull)
        .select(col("doc_id"), col(valueCol))
        .repartitionByRange(parallelism, col(valueCol), col("doc_id"))
        .withColumn("_pid", spark_partition_id())
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val n = keyed.count() // also materializes the (row → pid) assignment
    val offsets = keyed.groupBy("_pid").agg(count(lit(1)).as("_c"))
      .withColumn("_offset",
        coalesce(sum("_c").over(
          Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select("_pid", "_offset")
    val intra = Window.partitionBy("_pid").orderBy(col(valueCol), col("doc_id"))
    val ranked = keyed.withColumn("_r", row_number().over(intra))
      .join(broadcast(offsets), Seq("_pid"))
      .select(col("doc_id"),
        (if (n > 1)
          round((col("_offset") + col("_r") - 1).cast("double") / (n - 1), 6)
        else lit(0.0)).as("percent_rank"))
    docs.join(ranked, Seq("doc_id"), "left")
  }

  /** Per-domain document cap — crawl-dominance control: keep at most
    * `cap` docs per domain, deterministically the `cap` SMALLEST doc_ids
    * (the keep-the-earliest convention of the dedup family). The
    * standard defense against one host flooding a mixture the way
    * [[domainMix]]'s rates can't express ("no single source may exceed N
    * documents", e.g. per-site caps in C4/RefinedWeb-style cleaning).
    *
    * Scale shape: the bounded-heap partial aggregate
    * ([[graft.plans.TopK]]), NOT a per-domain row_number window — the
    * shuffle carries at most `cap` rows per domain per input partition,
    * so a domain with 10M pages costs the same shuffle as one with
    * `cap`. Output = the kept rows (doc_id, domain, cap_rank 1..cap). */
  def domainCap(
      docs: DataFrame, domainCol: String, cap: Int): DataFrame = {
    require(docs.columns.contains("doc_id"),
      s"domainCap requires a 'doc_id' key column; relation has " +
        s"[${docs.columns.mkString(", ")}]")
    // TopK keeps the k LARGEST under its ordering; negate the id so the
    // heap retains the cap smallest doc_ids per domain
    graft.plans.TopK.topKPerKey(
      docs.select(col("doc_id"), col(domainCol)),
      Seq(domainCol), Seq(negate(col("doc_id"))), cap)
      .select(col("doc_id"), col(domainCol), col("rank").as("cap_rank"))
  }

  /** Weighted sampling WITHOUT replacement (Efraimidis–Spirakis A-ES,
    * exponential-jumps form): each row draws priority = −ln(u)/w — an
    * Exponential(w) variate — and the k SMALLEST priorities win, which
    * is distribution-identical to sequential weighted draws without
    * replacement. The workhorse for "sample 1M docs proportional to
    * quality score" where [[stratifiedHashSample]]'s per-stratum rates
    * are too coarse.
    *
    * u comes from the same md5 derivation as [[hashSample]]'s bucket
    * ((first-8-hex-digits + 0.5) / 2³², never 0 or 1) — rerun-stable,
    * join-consistent, no RNG state, and replayable by the DuckDB oracle.
    * Priorities are rounded to 9 dp before ranking (they live in
    * (0, 22.2/min-weight] — 9 dp keeps ~5 significant digits at weight
    * 10⁴) and ties break on the id.
    *
    * Scale shape: the draw is a zero-shuffle projection; the global
    * smallest-k is sort+limit — Spark plans TakeOrderedAndProject, the
    * per-partition bounded heap + single ≤ k·partitions merge, never a
    * global sort. Rows with NULL or non-positive weight cannot be
    * sampled (weight 0 = "never pick") and are filtered, documented
    * here. */
  def weightedSample(
      docs: DataFrame, k: Int, weightCol: String = "n_chars",
      idCol: String = "doc_id"): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val u = (conv(substring(md5(col(idCol).cast("string")), 1, 8), 16, 10)
      .cast("double") + lit(0.5)) / lit(4294967296.0)
    val sampled = docs
      .filter(col(weightCol).isNotNull && col(weightCol) > 0)
      .withColumn("priority",
        round(-log(u) / col(weightCol).cast("double"), 9))
      .orderBy(col("priority").asc, col(idCol).asc)
      .limit(k)
    val w = Window.orderBy(col("priority").asc, col(idCol).asc)
    sampled.withColumn("sel_rank", row_number().over(w).cast("int"))
  }
}
