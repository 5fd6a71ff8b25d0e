package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.llm.Sampling

/** Driver-gate entries for corpus sampling/ordering (SURVEY §2.8
  * extension): deterministic global shuffle, stable hash sampling,
  * domain-mixture resampling, and quantile-threshold filtering. All keyed
  * on md5 of stable ids — no rand() anywhere — so every entry is fully
  * DuckDB-oracled.
  */
object SamplingQueries {

  private def docs(s: SparkSession, dir: String): DataFrame = {
    Tables.register(s, dir); s.table("documents")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // EXACT-N stratified sampler: largest-remainder (Hamilton)
    // apportionment of 137 rows across sources — all-integer quotas
    // (div/mod, no float shares), md5-rank selection within stratum;
    // 137 is deliberately coprime to the stratum structure so the
    // remainder top-up path is exercised, not idle
    "q_strat_alloc" -> { (s, dir) =>
      Sampling.stratAlloc(
        docs(s, dir).select("doc_id", "source"),
        "source", targetN = 137L)
    },

    // distributed sort-rank permutation (range partition + offset compose,
    // never a single global window) + round-robin shard assignment
    "q_corpus_shuffle" -> { (s, dir) =>
      Sampling.corpusShuffle(docs(s, dir), nShards = 8)
    },

    // stable 10% sample on the md5 bucket of doc_id
    "q_hash_sample" -> { (s, dir) =>
      Sampling.hashSample(docs(s, dir).select("doc_id", "source"), pct = 10)
    },

    // stratified sample: per-domain keep-rates (10/40/70% by source id
    // mod 3) over the shared md5 bucket — the downweighting half of
    // mixture matching, zero-shuffle
    "q_stratified_sample" -> { (s, dir) =>
      Sampling.stratifiedHashSample(
        docs(s, dir).select("doc_id", "source"),
        expr("10 + (CAST(replace(source, 'src', '') AS INT) % 3) * 30"))
    },

    // target mixture: sources upweighted 1–3× by a deterministic
    // per-domain factor (a stand-in for a real target-weight table)
    "q_domain_mix" -> { (s, dir) =>
      Sampling.domainMix(
        docs(s, dir).select("doc_id", "source"),
        expr("1 + (CAST(replace(source, 'src', '') AS INT) % 3)"))
    },

    // temperature-scaled mixture (XLM-style p^alpha flattening) over a
    // deterministically SKEWED derived domain (the fixture's sources
    // are uniform, which would make flattening a no-op): alpha=0.3
    // upweights the rare domain, downweights the common one; the mix
    // table is domain-sized and the pow weights are 12-dp-rounded /
    // decimal-summed so both engines hash identically
    "q_temperature_mix" -> { (s, dir) =>
      Sampling.temperatureShares(
        docs(s, dir).select(col("doc_id"),
          expr("CASE WHEN doc_id % 7 = 0 THEN 'rare' " +
            "WHEN doc_id % 3 = 0 THEN 'mid' ELSE 'common' END")
            .as("domain")),
        "domain", alpha = 0.3)
    },

    // per-domain token-budget allocation (epoch planning): the
    // q_temperature_mix skewed domains, but shares computed over TOKEN
    // mass; a 100k budget at alpha=0.3 gives the rare domain a
    // sampling rate > its natural share (epochs = ceil(rate) shows the
    // repeat regime)
    "q_token_budget" -> { (s, dir) =>
      Sampling.tokenBudget(
        docs(s, dir).select(col("doc_id"),
          expr("CASE WHEN doc_id % 7 = 0 THEN 'rare' " +
            "WHEN doc_id % 3 = 0 THEN 'mid' ELSE 'common' END")
            .as("domain"),
          size(split(coalesce(col("text"), lit("")), " ")).as("n_tok")),
        "domain", "n_tok", budget = 100000L, alpha = 0.3)
    },

    // UniMax epoch-capped waterfill over the per-language char mass:
    // at sf0.01 the 1.2-epoch caps of the four small languages fit the
    // 150k budget (saturated) and en takes the waterfill remainder — a
    // mixed split on real masses, no planted skew needed
    "q_unimax_alloc" -> { (s, dir) =>
      Sampling.unimaxAlloc(
        docs(s, dir).select(col("lang").as("domain"), col("n_chars")),
        "domain", "n_chars", budget = 150000L, epochCap = 1.2)
    },

    // robust median/MAD outlier scores on n_chars (Iglewicz–Hoaglin
    // modified z, k=3.5): both medians are type-1 histogram quantiles
    // over ONE persisted value histogram
    "q_mad_outliers" -> { (s, dir) =>
      Sampling.madOutliers(
        docs(s, dir).select("doc_id", "n_chars"), "n_chars", k = 3.5)
    },

    // keep docs at or above the 25th percentile of n_chars — computed
    // from the value histogram, not a global row sort
    "q_quantile_filter" -> { (s, dir) =>
      Sampling.quantileFilter(
        docs(s, dir).select("doc_id", "n_chars"), "n_chars", 0.25)
        .select("doc_id", "n_chars", "percent_rank")
    },

    // winsorize n_chars at its [5%, 95%] type-1 histogram quantiles:
    // tails clip to the cut values, audit flags ride
    "q_winsorize" -> { (s, dir) =>
      Sampling.winsorize(
        docs(s, dir).select("doc_id", "n_chars"), "n_chars",
        pLo = 0.05, pHi = 0.95)
    },

    // per-language p10/p50/p90 length card — grouped type-1 quantiles
    // off one (lang, n_chars) histogram
    "q_len_quantiles" -> { (s, dir) =>
      Sampling.groupedQuantiles(
        docs(s, dir).select("lang", "n_chars"), "lang", "n_chars",
        ps = Seq(0.1, 0.5, 0.9))
    },

    // two-sample KS drift card with PLANTED drift: the odd-doc half's
    // n_chars shift by +50, so the sup-CDF gap and the drifted verdict
    // are real, not a same-distribution null result
    "q_ks_drift" -> { (s, dir) =>
      val d = docs(s, dir)
      Sampling.ksDrift(
        d.filter(col("doc_id") % 2 === 0).select("n_chars"),
        d.filter(col("doc_id") % 2 === 1)
          .select((col("n_chars") + 50L).as("n_chars")),
        "n_chars")
    },

    // exact percent_rank on a CONTINUOUS (near-unique) score — the
    // cardinality regime the histogram-based percentRank refuses. The
    // doc_id-injected score is tie-free, so the position-based definition
    // coincides with SQL percent_rank and the entry is exactly oracled.
    "q_percent_rank_cont" -> { (s, dir) =>
      val scored = docs(s, dir).select(col("doc_id"),
        (col("n_chars") + col("doc_id") * lit(1e-9)).as("score"))
      Sampling.percentRankContinuous(scored, "score")
        .select("doc_id", "score", "percent_rank")
    },

    // per-domain document cap (crawl-dominance control): keep the 10
    // smallest doc_ids per source via the bounded-heap aggregate — at
    // sf0.01 every source holds 25 docs, so the cap genuinely drops rows
    "q_domain_cap" -> { (s, dir) =>
      Sampling.domainCap(docs(s, dir), "source", cap = 10)
    },

    // Efraimidis–Spirakis weighted sample without replacement: 50 docs
    // proportional to n_chars, md5-derived uniforms — rerun-stable and
    // fully oracle-replayable; the selection is a TakeOrdered, no global
    // sort
    "q_weighted_sample" -> { (s, dir) =>
      Sampling.weightedSample(
        docs(s, dir).select("doc_id", "source", "n_chars"), k = 50)
    },

    // the capstone composition: exact-dedup keep → n_chars quantile filter
    // (≥ p25 of the deduped corpus) → stratified per-domain sample →
    // deterministic shuffle positions over the survivors. Four operators
    // chained and still exactly oracled — the composability the curation
    // tier exists for
    "q_corpus_pipeline" -> { (s, dir) =>
      val d = docs(s, dir)
      val kept = graft.llm.TextOps.exactDedup(d)
        .filter(!col("is_dup")).select("doc_id")
        .join(d.select("doc_id", "source", "n_chars"), Seq("doc_id"))
      val filtered = Sampling.quantileFilter(kept, "n_chars", 0.25)
        .select("doc_id", "source", "n_chars")
      val sampled = Sampling.stratifiedHashSample(filtered,
        expr("10 + (CAST(replace(source, 'src', '') AS INT) % 3) * 30"))
        .select("doc_id", "source", "n_chars")
      sampled.join(
        Sampling.corpusShuffle(sampled.select("doc_id"), nShards = 8),
        Seq("doc_id"))
    })

  def oracles: Map[String, String] = Map(
    // replays the integer div/mod quotas, the largest-remainder top-up
    // rank, and the per-stratum md5 selection rank
    "q_strat_alloc" ->
      """WITH c AS (
        |  SELECT source AS g, CAST(count(*) AS BIGINT) AS c
        |  FROM documents GROUP BY 1),
        |q0 AS (
        |  SELECT g, c, sum(c) OVER () AS tot,
        |    (c * 137) // sum(c) OVER () AS fl,
        |    (c * 137) % sum(c) OVER () AS rem
        |  FROM c),
        |q AS (
        |  SELECT g,
        |    CAST(fl + CASE WHEN row_number()
        |        OVER (ORDER BY rem DESC, g ASC)
        |        <= 137 - sum(fl) OVER () THEN 1 ELSE 0 END
        |      AS BIGINT) AS quota
        |  FROM q0),
        |r AS (
        |  SELECT doc_id, source AS g,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)) ASC, doc_id ASC)
        |      AS srank
        |  FROM documents)
        |SELECT r.doc_id, r.g AS source, q.quota,
        |  r.srank <= q.quota AS selected
        |FROM r JOIN q USING (g)""".stripMargin,

    "q_corpus_pipeline" ->
      """WITH dd AS (
        |  SELECT doc_id, source, n_chars,
        |    doc_id <> MIN(doc_id) OVER (PARTITION BY md5(lower(text))) AS is_dup
        |  FROM documents),
        |kept AS (SELECT doc_id, source, n_chars FROM dd WHERE NOT is_dup),
        |pr AS (
        |  SELECT doc_id, source, n_chars,
        |    round(percent_rank() OVER (ORDER BY n_chars), 6) AS percent_rank
        |  FROM kept),
        |filt AS (SELECT doc_id, source, n_chars FROM pr WHERE percent_rank >= 0.25),
        |samp AS (
        |  SELECT doc_id, source, n_chars FROM (
        |    SELECT doc_id, source, n_chars,
        |      CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT)
        |        % 100 AS bucket,
        |      10 + (CAST(replace(source, 'src', '') AS INTEGER) % 3) * 30
        |        AS keep_rate
        |    FROM filt)
        |  WHERE bucket < keep_rate),
        |pos AS (
        |  SELECT doc_id,
        |    row_number() OVER (
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
        |  FROM samp)
        |SELECT k.doc_id, k.source, k.n_chars,
        |  CAST(p.rn AS BIGINT) AS position,
        |  CAST((p.rn - 1) % 8 AS BIGINT) AS shard
        |FROM samp k JOIN pos p USING (doc_id)""".stripMargin,
    // algorithm-independent oracle: a plain global window row_number —
    // proving the distributed rank composition equals the naive total order
    "q_corpus_shuffle" ->
      """WITH r AS (
        |  SELECT doc_id,
        |    row_number() OVER (
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
        |  FROM documents)
        |SELECT doc_id, CAST(rn AS BIGINT) AS position,
        |  CAST((rn - 1) % 8 AS BIGINT) AS shard
        |FROM r""".stripMargin,

    "q_hash_sample" ->
      """SELECT doc_id, source, bucket FROM (
        |  SELECT doc_id, source,
        |    CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT)
        |      % 100 AS bucket
        |  FROM documents)
        |WHERE bucket < 10""".stripMargin,

    "q_stratified_sample" ->
      """SELECT doc_id, source, bucket, keep_rate FROM (
        |  SELECT doc_id, source,
        |    CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT)
        |      % 100 AS bucket,
        |    CAST(10 + (CAST(replace(source, 'src', '') AS INTEGER) % 3) * 30
        |      AS INTEGER) AS keep_rate
        |  FROM documents)
        |WHERE bucket < keep_rate""".stripMargin,

    // Replays the share math exactly: pow weights rounded to 12 dp
    // (6 dp would zero ultra-rare domains — see temperatureShares) and
    // summed as DECIMAL (partial-sum-order-proof), then double division
    // for the normalized shares — identical arithmetic on both engines.
    "q_temperature_mix" ->
      """WITH d AS (
        |  SELECT CASE WHEN doc_id % 7 = 0 THEN 'rare'
        |    WHEN doc_id % 3 = 0 THEN 'mid' ELSE 'common' END AS domain
        |  FROM documents),
        |c AS (
        |  SELECT domain, CAST(count(*) AS BIGINT) AS n_docs
        |  FROM d GROUP BY domain),
        |t AS (SELECT sum(n_docs) AS n FROM c),
        |w AS (
        |  SELECT domain, n_docs,
        |    CAST(n_docs AS DOUBLE) / n AS nat,
        |    CAST(round(pow(CAST(n_docs AS DOUBLE) / n, 0.3), 12)
        |      AS DECIMAL(28, 12)) AS w
        |  FROM c CROSS JOIN t),
        |z AS (SELECT sum(w) AS z FROM w)
        |SELECT domain, n_docs,
        |  round(nat, 6) AS natural_share,
        |  round(CAST(w AS DOUBLE) / CAST(z AS DOUBLE), 6) AS temp_share,
        |  round((CAST(w AS DOUBLE) / CAST(z AS DOUBLE)) / nat, 6) AS factor
        |FROM w CROSS JOIN z
        |ORDER BY domain""".stripMargin,

    // Same share math as q_temperature_mix (12-dp pow weights,
    // DECIMAL-summed normalizer) over token mass; target_tokens via
    // double round (half-away-from-zero on both engines for positive
    // values), epochs via ceil of the UNROUNDED rate
    "q_token_budget" ->
      """WITH d AS (
        |  SELECT CASE WHEN doc_id % 7 = 0 THEN 'rare'
        |    WHEN doc_id % 3 = 0 THEN 'mid' ELSE 'common' END AS domain,
        |    len(string_split(coalesce(text, ''), ' ')) AS n_tok
        |  FROM documents),
        |c AS (
        |  SELECT domain, CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(n_tok) AS BIGINT) AS n_tokens
        |  FROM d GROUP BY domain),
        |t AS (SELECT CAST(sum(n_tokens) AS DOUBLE) AS n FROM c),
        |w AS (
        |  SELECT domain, n_docs, n_tokens,
        |    CAST(n_tokens AS DOUBLE) / n AS nat,
        |    CAST(round(pow(CAST(n_tokens AS DOUBLE) / n, 0.3), 12)
        |      AS DECIMAL(28, 12)) AS w
        |  FROM c CROSS JOIN t),
        |z AS (SELECT sum(w) AS z FROM w),
        |q AS (
        |  SELECT domain, n_docs, n_tokens, nat,
        |    CAST(w AS DOUBLE) / CAST(z AS DOUBLE) AS q,
        |    CAST(round(CAST(w AS DOUBLE) / CAST(z AS DOUBLE) * 100000.0)
        |      AS BIGINT) AS target_tokens
        |  FROM w CROSS JOIN z)
        |SELECT domain, n_docs, n_tokens,
        |  round(nat, 6) AS natural_share,
        |  round(q, 6) AS temp_share,
        |  target_tokens,
        |  round(CAST(target_tokens AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6)
        |    AS sampling_rate,
        |  CAST(ceil(CAST(target_tokens AS DOUBLE) / CAST(n_tokens AS DOUBLE))
        |    AS BIGINT) AS epochs
        |FROM q ORDER BY domain""".stripMargin,

    // every quantile replays off the same group-partitioned cumulative
    // histogram; ceil of the double product is engine-identical
    "q_len_quantiles" ->
      """WITH h AS (
        |  SELECT lang, n_chars AS v, count(*) AS c FROM documents
        |  WHERE n_chars IS NOT NULL GROUP BY 1, 2),
        |w AS (
        |  SELECT lang, v, c,
        |    sum(c) OVER (PARTITION BY lang ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    sum(c) OVER (PARTITION BY lang) AS n
        |  FROM h)
        |SELECT lang, CAST(max(n) AS BIGINT) AS n_rows,
        |  min(CASE WHEN cum >= ceil(0.1 * n) THEN v END) AS p10,
        |  min(CASE WHEN cum >= ceil(0.5 * n) THEN v END) AS p50,
        |  min(CASE WHEN cum >= ceil(0.9 * n) THEN v END) AS p90
        |FROM w GROUP BY lang""".stripMargin,

    // the sup-CDF gap compares as the INTEGER |cum_a*n_b - cum_b*n_a|;
    // floats appear only in the final 6-dp ratio/critical-value rounds
    "q_ks_drift" ->
      """WITH t AS (
        |  SELECT n_chars AS v, 0 AS side FROM documents
        |  WHERE doc_id % 2 = 0 AND n_chars IS NOT NULL
        |  UNION ALL
        |  SELECT n_chars + 50 AS v, 1 AS side FROM documents
        |  WHERE doc_id % 2 = 1 AND n_chars IS NOT NULL),
        |h AS (
        |  SELECT v,
        |    CAST(sum(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ca,
        |    CAST(sum(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS BIGINT) AS cb
        |  FROM t GROUP BY 1),
        |n AS (
        |  SELECT CAST(sum(ca) AS BIGINT) AS na, CAST(sum(cb) AS BIGINT) AS nb,
        |    CAST(count(*) AS BIGINT) AS nv
        |  FROM h),
        |w AS (
        |  SELECT v,
        |    abs(CAST(sum(ca) OVER (ORDER BY v
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |        * (SELECT nb FROM n) AS BIGINT)
        |      - CAST(sum(cb) OVER (ORDER BY v
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |        * (SELECT na FROM n) AS BIGINT)) AS dnum
        |  FROM h),
        |d AS (SELECT max(dnum) AS dm FROM w)
        |SELECT n.na AS n_a, n.nb AS n_b, n.nv AS n_values,
        |  (SELECT min(v) FROM w, d WHERE w.dnum = d.dm) AS ks_at,
        |  round(CAST(d.dm AS DOUBLE)
        |    / (CAST(n.na AS DOUBLE) * CAST(n.nb AS DOUBLE)), 6) AS ks_stat,
        |  round(1.358 * sqrt(CAST(n.na + n.nb AS DOUBLE)
        |    / (CAST(n.na AS DOUBLE) * CAST(n.nb AS DOUBLE))), 6) AS crit_05,
        |  round(CAST(d.dm AS DOUBLE)
        |      / (CAST(n.na AS DOUBLE) * CAST(n.nb AS DOUBLE)), 6)
        |    > round(1.358 * sqrt(CAST(n.na + n.nb AS DOUBLE)
        |      / (CAST(n.na AS DOUBLE) * CAST(n.nb AS DOUBLE))), 6) AS drifted
        |FROM n CROSS JOIN d""".stripMargin,

    // both cut points replay off the same cumulative histogram; ceil of
    // the double product is engine-identical (same IEEE inputs and ops)
    "q_winsorize" ->
      """WITH h AS (
        |  SELECT n_chars AS v, count(*) AS c FROM documents
        |  WHERE n_chars IS NOT NULL GROUP BY 1),
        |w AS (
        |  SELECT v, c,
        |    sum(c) OVER (ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    sum(c) OVER () AS n
        |  FROM h),
        |q AS (
        |  SELECT
        |    min(CASE WHEN cum >= ceil(0.05 * n) THEN v END) AS qlo,
        |    min(CASE WHEN cum >= ceil(0.95 * n) THEN v END) AS qhi
        |  FROM w)
        |SELECT doc_id, n_chars,
        |  CASE WHEN n_chars IS NULL THEN NULL
        |    ELSE least(greatest(n_chars, qlo), qhi) END AS winsorized,
        |  CASE WHEN n_chars IS NULL THEN NULL
        |    ELSE n_chars < qlo END AS clipped_lo,
        |  CASE WHEN n_chars IS NULL THEN NULL
        |    ELSE n_chars > qhi END AS clipped_hi
        |FROM documents CROSS JOIN q""".stripMargin,

    // the waterfill replays all-DECIMAL: 6-dp capacities, exact prefix
    // sums, and the prefix-monotone saturation test; only the reported
    // level/epochs divide as doubles after the decision is made
    "q_unimax_alloc" ->
      """WITH counts AS (
        |  SELECT lang AS domain, count(*) AS n_docs,
        |    CAST(coalesce(sum(n_chars), 0) AS BIGINT) AS n_tokens
        |  FROM documents GROUP BY lang),
        |b AS (
        |  SELECT domain, n_docs, n_tokens,
        |    CAST(round(1.2 * CAST(n_tokens AS DOUBLE), 6) AS DECIMAL(28,6))
        |      AS cap
        |  FROM counts),
        |r AS (
        |  SELECT *, row_number() OVER (ORDER BY cap, domain) AS i,
        |    coalesce(sum(cap) OVER (ORDER BY cap, domain
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        |      CAST(0 AS DECIMAL(28,6))) AS sprev,
        |    count(*) OVER () AS n
        |  FROM b),
        |t AS (
        |  SELECT *, cap * (n - i + 1) <= 150000 - sprev AS saturated
        |  FROM r),
        |f AS (
        |  SELECT *,
        |    sum(CASE WHEN saturated THEN cap
        |        ELSE CAST(0 AS DECIMAL(28,6)) END) OVER () AS ssat,
        |    sum(CASE WHEN saturated THEN 0 ELSE 1 END) OVER () AS nunsat
        |  FROM t),
        |a AS (
        |  SELECT domain, n_docs, n_tokens, CAST(cap AS DOUBLE) AS capacity,
        |    saturated,
        |    CASE WHEN saturated THEN CAST(cap AS DOUBLE)
        |      ELSE round((CAST(150000 AS DOUBLE) - CAST(ssat AS DOUBLE))
        |        / CAST(nunsat AS DOUBLE), 6) END AS allocated
        |  FROM f)
        |SELECT domain, n_docs, n_tokens, capacity, saturated, allocated,
        |  CASE WHEN n_tokens > 0
        |    THEN round(allocated / CAST(n_tokens AS DOUBLE), 6) END AS epochs
        |FROM a""".stripMargin,

    "q_domain_mix" ->
      """SELECT doc_id, source, n_copies,
        |  CAST(unnest(range(1, n_copies + 1)) AS INTEGER) AS copy_idx
        |FROM (
        |  SELECT doc_id, source,
        |    CAST(1 + (CAST(replace(source, 'src', '') AS INTEGER) % 3) AS INTEGER)
        |      AS n_copies
        |  FROM documents)""".stripMargin,

    // algorithm-independent oracle: plain window percent_rank — on a
    // tie-free column the range-partitioned position rank must equal it
    "q_percent_rank_cont" ->
      """SELECT doc_id, n_chars + doc_id * 1e-9 AS score,
        |  round(percent_rank() OVER (ORDER BY n_chars + doc_id * 1e-9), 6)
        |    AS percent_rank
        |FROM documents""".stripMargin,

    // algorithm-independent oracle: the window percent_rank definition the
    // histogram method must reproduce exactly
    // both medians replayed as type-1 histogram quantiles (2*cum >= n,
    // integer compare), then the modified-z formula over the constants
    "q_mad_outliers" ->
      """WITH h AS (
        |  SELECT n_chars AS v, count(*) AS c FROM documents
        |  WHERE n_chars IS NOT NULL GROUP BY v),
        |c1 AS (
        |  SELECT v, c,
        |    sum(c) OVER (ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    sum(c) OVER () AS n
        |  FROM h),
        |m AS (SELECT min(CASE WHEN cum * 2 >= n THEN v END) AS med FROM c1),
        |dh AS (
        |  SELECT abs(v - m.med) AS dev, sum(c) AS c
        |  FROM h, m GROUP BY 1),
        |c2 AS (
        |  SELECT dev, c,
        |    sum(c) OVER (ORDER BY dev
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    sum(c) OVER () AS n
        |  FROM dh),
        |mm AS (SELECT min(CASE WHEN cum * 2 >= n THEN dev END) AS mad
        |  FROM c2)
        |SELECT d.doc_id, d.n_chars,
        |  CASE WHEN d.n_chars IS NULL OR mm.mad = 0 THEN NULL
        |    ELSE round(abs(CAST(d.n_chars AS DOUBLE) - CAST(m.med AS DOUBLE))
        |      / (1.4826 * CAST(mm.mad AS DOUBLE)), 6) END AS robust_z,
        |  CASE WHEN d.n_chars IS NULL THEN NULL
        |    WHEN mm.mad = 0 THEN CAST(d.n_chars AS DOUBLE) <> CAST(m.med AS DOUBLE)
        |    ELSE round(abs(CAST(d.n_chars AS DOUBLE) - CAST(m.med AS DOUBLE))
        |      / (1.4826 * CAST(mm.mad AS DOUBLE)), 6) > 3.5 END AS is_outlier
        |FROM documents d, m, mm""".stripMargin,

    "q_quantile_filter" ->
      """WITH r AS (
        |  SELECT doc_id, n_chars,
        |    round(percent_rank() OVER (ORDER BY n_chars), 6) AS percent_rank
        |  FROM documents)
        |SELECT doc_id, n_chars, percent_rank
        |FROM r WHERE percent_rank >= 0.25""".stripMargin,

    // replays the A-ES draw exactly: u = (first-8-md5-hex + 0.5)/2^32,
    // priority = round(-ln(u)/weight, 9), k smallest win, id tie-break
    "q_weighted_sample" ->
      """WITH drawn AS (
        |  SELECT doc_id, source, n_chars,
        |    round(-ln((CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)
        |        AS BIGINT) + 0.5) / 4294967296.0)
        |      / CAST(n_chars AS DOUBLE), 9) AS priority
        |  FROM documents
        |  WHERE n_chars IS NOT NULL AND n_chars > 0),
        |topk AS (
        |  SELECT * FROM drawn ORDER BY priority ASC, doc_id ASC LIMIT 50)
        |SELECT doc_id, source, n_chars, priority,
        |  CAST(row_number() OVER (ORDER BY priority ASC, doc_id ASC) AS INT)
        |    AS sel_rank
        |FROM topk""".stripMargin,

    // algorithm-independent oracle: the per-domain row_number window the
    // bounded heap must reproduce exactly
    "q_domain_cap" ->
      """SELECT doc_id, source, cap_rank FROM (
        |  SELECT doc_id, source,
        |    CAST(row_number() OVER (PARTITION BY source ORDER BY doc_id)
        |      AS INT) AS cap_rank
        |  FROM documents)
        |WHERE cap_rank <= 10""".stripMargin)

  def verifySort: Map[String, Seq[String]] = Map(
    "q_strat_alloc" -> Seq("doc_id"),
    "q_corpus_shuffle" -> Seq("doc_id"),
    "q_hash_sample" -> Seq("doc_id"),
    "q_stratified_sample" -> Seq("doc_id"),
    "q_domain_mix" -> Seq("doc_id", "copy_idx"),
    "q_temperature_mix" -> Seq("domain"),
    "q_token_budget" -> Seq("domain"),
    "q_unimax_alloc" -> Seq("domain"),
    "q_winsorize" -> Seq("doc_id"),
    "q_len_quantiles" -> Seq("lang"),
    "q_mad_outliers" -> Seq("doc_id"),
    "q_percent_rank_cont" -> Seq("doc_id"),
    "q_quantile_filter" -> Seq("doc_id"),
    "q_domain_cap" -> Seq("doc_id"),
    "q_weighted_sample" -> Seq("doc_id"),
    "q_corpus_pipeline" -> Seq("doc_id"))
}
