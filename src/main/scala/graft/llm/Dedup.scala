package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Near-duplicate detection: MinHash + banded LSH and SimHash
  * (SURVEY §2.8; VERDICT "bucketed MinHash … never all-pairs").
  *
  * MinHash here is hash-function-based (min over md5(shingle || seed)), not
  * permutation-based — deterministic, engine-portable, and entirely Column
  * algebra. Candidate generation is a self-join on (band_index, band_hash):
  * a shuffle keyed by band hash, so cost is O(candidates), never O(n²).
  *
  * At 100 TB: signatures are a projection (one pass); the band join
  * shuffles only (doc_id, band_hash) pairs — bytes per doc, not the text;
  * skewed bands (boilerplate dups) are bounded by band count and can be
  * salted if a single band bucket exceeds executor memory.
  */
object Dedup {

  /** k-word shingle array from a materialized `_w` token-array column
    * (split the text exactly once per row; never re-split per element).
    * Documents with fewer than k tokens get their whole text as the single
    * shingle. */
  private def withShingleCol(docs: DataFrame, k: Int): DataFrame =
    // coalesce keeps NULL-text docs in every shingle-based method (a null
    // input would null the signature and silently drop the doc from
    // candidates), mirroring the simhash path. Shingling is the fused
    // native expression (graft.functions.Kgrams, parity-pinned against
    // the kgramSql HOF chain), not the interpreted transform.
    docs.withColumn("_t", coalesce(col("text"), lit("")))
      .withColumn("_shingles",
        graft.functions.Kgrams.kgrams(col("_t"), k, keepShortWhole = true))

  /** k-word shingles → `numHashes` md5-based minhash signatures (the
    * oracle-checkable form: DuckDB reproduces md5 exactly). Shingles are
    * materialized once, and the hash family is derived by slicing each
    * 32-hex-char md5 into four 8-char (32-bit) members — ceil(n/4) md5
    * calls per shingle instead of n, the dominant cost of the pipeline.
    * 32-bit members are ample for minhash agreement counting (chance
    * agreement ~2^-32); md5's avalanche makes the slices independent. */
  def minhashSignatures(
      docs: DataFrame, k: Int = 3, numHashes: Int = 8): DataFrame = {
    // ONE native fused expression (graft.functions.MinhashSigs) instead of
    // the transform/array_min HOF chain: the HOFs all evaluate in
    // interpreted CodegenFallback and materialize the shingle and digest
    // arrays per row — measured as the dominant cost of the minhash tier.
    // Exact-parity with the HOF form (same split, CASE-short-doc, md5,
    // slicing, min order) is pinned in MatchExpressionsSpec and by the
    // DuckDB oracle hash gate.
    val sigsCol = graft.functions.MinhashSigs.minhashSigs(
      coalesce(col("text"), lit("")), k, numHashes)
    docs.withColumn("_sigs", sigsCol)
      .select(col("doc_id") +:
        (0 until numHashes).map(j =>
          element_at(col("_sigs"), j + 1).as(s"sig_$j")): _*)
  }

  /** One-row corpus-overlap card: union-MinHash Jaccard estimate between
    * two corpora's k-shingle sets — "how much n-gram content do these
    * datasets share" (Broder resemblance at CORPUS granularity), the
    * cross-snapshot / train-vs-benchmark overlap probe that needs no
    * join, no pair generation, and no shared partitioning at all. The
    * union sketch of a corpus is the component-wise min over its docs'
    * minhash signatures (min of per-doc mins = min over the shingle
    * UNION — the sketch composes), so each corpus costs exactly ONE
    * `numHashes`-wide partial-aggregated pass; the estimate is the
    * fraction of agreeing components, with ±1/numHashes resolution.
    * md5 family ([[minhashSignatures]]) — DuckDB-replayable, so the
    * card is oracle-hashed, not just sanity-checked.
    *
    * Scale shape: two independent corpus scans reducing to one row each
    * (map-side combine carries numHashes strings per partition); the
    * final crossJoin is 1-row × 1-row over DIFFERENT lineages. This is
    * the cheap first question to ask before paying for
    * [[Curation.decontaminate]]'s exact gram join. */
  def corpusOverlapSketch(
      a: DataFrame, b: DataFrame, k: Int = 3, numHashes: Int = 8)
      : DataFrame = {
    def sketch(docs: DataFrame, side: String, nName: String): DataFrame =
      minhashSignatures(docs, k, numHashes).agg(
        count(lit(1)).cast("bigint").as(nName),
        (0 until numHashes)
          .map(j => min(col(s"sig_$j")).as(s"${side}_$j")): _*)
    val agree = (0 until numHashes)
      .map(j => when(col(s"a_$j") === col(s"b_$j"), 1L).otherwise(0L))
      .reduce(_ + _)
    sketch(a, "a", "n_docs_a").crossJoin(sketch(b, "b", "n_docs_b"))
      .select(col("n_docs_a"), col("n_docs_b"),
        lit(numHashes).as("n_hashes"),
        agree.cast("bigint").as("n_agree"),
        round(agree.cast("double") / numHashes, 6).as("est_jaccard"))
  }

  /** Fast minhash signatures for the candidate-generation path: ONE
    * xxhash64 per shingle, then `numHashes` affine rehashes
    * (a_j·h + b_j, wrapping 64-bit arithmetic — deterministic). ~8× fewer
    * hash computations than the md5 form; not DuckDB-reproducible, which
    * is fine since candidates are recall-tested, not oracle-hashed. */
  private def fastSignatures(
      docs: DataFrame, k: Int, numHashes: Int): DataFrame = {
    // ONE fused native pass (graft.functions.FastMinhashSigs) calling the
    // same XXH64 primitives the xxhash64 builtin generates — signature
    // values are bit-identical to the transform/array_min chain it
    // replaced (pinned in MatchExpressionsSpec), without the interpreted
    // lambdas or the per-row shingle/hash arrays
    val sigsCol = graft.functions.FastMinhashSigs.fastMinhashSigs(
      coalesce(col("text"), lit("")), k, numHashes)
    docs.withColumn("_sigs", sigsCol)
      .select(col("doc_id") +:
        (0 until numHashes).map(j =>
          element_at(col("_sigs"), j + 1).as(s"sig_$j")): _*)
  }

  /** Exploded (doc_id, sig, band_idx, band_hash) bucket rows — the shuffle
    * key of everything banded is the band hash, so only same-bucket docs
    * ever meet. Shared by candidate generation and the skew audit. */
  private def bandedBuckets(
      docs: DataFrame, k: Int, numHashes: Int, bands: Int,
      oracleHashes: Boolean): DataFrame = {
    require(numHashes % bands == 0, "numHashes must divide into bands")
    val rows = numHashes / bands
    val sigs =
      if (oracleHashes) minhashSignatures(docs, k, numHashes)
      else fastSignatures(docs, k, numHashes)
    val bandCols = (0 until bands).map { b =>
      val parts = (b * rows until (b + 1) * rows).map(j => col(s"sig_$j"))
      xxhash64(concat_ws("|", parts: _*)).as(s"band_$b")
    }
    sigs.select((col("doc_id") +:
        (0 until numHashes).map(j => col(s"sig_$j"))) ++ bandCols: _*)
      .select(
        col("doc_id"),
        array((0 until numHashes).map(j => col(s"sig_$j")): _*).as("sig"),
        posexplode(array((0 until bands).map(b => col(s"band_$b")): _*))
          .as(Seq("band_idx", "band_hash")))
  }

  /** The persistable signature index: one row per (doc, band) with the
    * full signature array and the band hash — exactly the table a 100 TB
    * corpus stores once (ideally bucketed on band_hash, see
    * graft.scale.Bucketing) so incremental batches can probe it without
    * re-hashing a single historical document. Feed it to
    * [[incrementalCandidates]]. */
  def signatureIndex(
      docs: DataFrame, k: Int = 3, numHashes: Int = 8, bands: Int = 4,
      oracleHashes: Boolean = false): DataFrame =
    bandedBuckets(docs, k, numHashes, bands, oracleHashes)

  /** Retire documents from a persisted [[signatureIndex]] without
    * re-hashing anything: the retired ids anti-join away in one pass over
    * the index. With the id set DataFrame-shaped it is broadcast (retire
    * batches are small relative to any corpus); with a
    * (band_idx, band_hash)-bucketed store the rewrite touches no
    * exchange. The retired docs stop producing candidates immediately —
    * a long-lived incremental pipeline needs deletion to honor takedowns
    * without a full corpus re-hash. */
  def retireFromIndex(index: DataFrame, retiredIds: DataFrame): DataFrame =
    index.join(broadcast(retiredIds.select(col("doc_id"))),
      Seq("doc_id"), "left_anti")

  /** [[retireFromIndex]] for a driver-held id batch. */
  def retireFromIndex(index: DataFrame, retiredIds: Seq[Long]): DataFrame =
    index.filter(!col("doc_id").isInCollection(retiredIds))

  /** In-place maintenance of a parquet-persisted index store: drop the
    * retired docs and rewrite the store once (also compacting the small
    * files incremental appends accumulate). The swap discipline —
    * replacement verified readable before the live store is touched,
    * backups never pre-deleted, restore on a failed swap-in — lives in
    * [[graft.scale.StoreMaint.replaceStore]] and is shared with the
    * event log's [[graft.dml.events.EventBus.compact]]. Returns the
    * retained row count. */
  def compactIndexStore(
      spark: org.apache.spark.sql.SparkSession, path: String,
      retiredIds: Seq[Long]): Long =
    graft.scale.StoreMaint.replaceStore(spark, path,
      retireFromIndex(spark.read.parquet(path), retiredIds))

  /** Incremental near-dup detection: candidate pairs between a NEW batch
    * and an existing corpus, plus pairs inside the batch — without
    * re-hashing the corpus. `index` is the persisted [[signatureIndex]] of
    * the historical docs; only `newDocs` pays shingle/signature cost.
    *
    * The index side is pruned FIRST by a broadcast semi-join on the
    * batch's band keys (≤ bands × |batch| keys — tiny relative to any
    * corpus): historical rows in buckets the batch never touches are
    * dropped at the scan, so the candidate join shuffles O(matching
    * buckets), not O(index). Output matches [[minhashCandidates]] over
    * (corpus ∪ batch) restricted to pairs touching the batch — pinned by
    * an equivalence test.
    *
    * Ids must be disjoint between index and batch (same contract as any
    * union-based dedup). */
  def incrementalCandidates(
      index: DataFrame, newDocs: DataFrame, k: Int = 3, numHashes: Int = 8,
      bands: Int = 4, minEstJaccard: Double = 0.5,
      oracleHashes: Boolean = false): DataFrame = {
    // materialized up front: referenced by the key set, the join's left
    // side, AND the union'd right side (same rationale as minhashCandidates)
    val newBuckets = PipelineCaches.track(
      bandedBuckets(newDocs, k, numHashes, bands, oracleHashes)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    newBuckets.count()
    candidatesFromBuckets(index, newBuckets, minEstJaccard)
  }

  /** [[incrementalCandidates]] core for callers that already hold the
    * batch's materialized [[signatureIndex]] rows (the streaming path
    * computes them once and both probes and appends them). `newBuckets`
    * MUST be materialized (persisted or checkpointed) — it is referenced
    * several times below.
    *
    * Shape: TWO band-key joins — batch × pruned-index and batch × batch —
    * rather than one join against (index ∪ batch). A union erases the
    * right side's partitioning, so the single-join form re-shuffles the
    * index; keeping the index side pure lets a (band_idx, band_hash)-
    * bucketed index table (graft.scale.Bucketing) join with ZERO exchange
    * on the index — only the batch shuffles, at any index size. */
  private[graft] def candidatesFromBuckets(
      index: DataFrame, newBuckets: DataFrame, minEstJaccard: Double)
      : DataFrame = {
    val batchKeys = newBuckets.select("band_idx", "band_hash").distinct()
    val prunedIndex = index
      .join(broadcast(batchKeys), Seq("band_idx", "band_hash"), "left_semi")

    def sided(df: DataFrame, side: String): DataFrame = df.select(
      col("band_idx"), col("band_hash"),
      col("doc_id").as(s"id_$side"), col("sig").as(s"sig_$side"))
    val matches =
      graft.functions.MatchExpressions.arrayEqCount(col("sig_l"), col("sig_r"))
    def pairs(r: DataFrame): DataFrame =
      sided(newBuckets, "l").join(r, Seq("band_idx", "band_hash"))
        .filter(col("id_l") =!= col("id_r"))
        .select(
          least(col("id_l"), col("id_r")).as("doc_a"),
          greatest(col("id_l"), col("id_r")).as("doc_b"),
          (matches.cast("double") / size(col("sig_l"))).as("est_jaccard"))
    pairs(sided(prunedIndex, "r"))
      .unionAll(pairs(sided(newBuckets, "r")))
      .distinct()
      .filter(col("est_jaccard") >= minEstJaccard)
  }

  /** Skew audit for [[minhashCandidates]]'s `maxBucketSize` guard: the
    * band buckets a given cap would exclude, with their member counts —
    * run it to size the cap, or after a capped run to quantify what was
    * skipped (pair-wise: sum of n_docs·(n_docs−1)/2). One aggregation over
    * the bucket projection; never touches the text. */
  def oversizedBuckets(
      docs: DataFrame, maxBucketSize: Int, k: Int = 3, numHashes: Int = 8,
      bands: Int = 4, oracleHashes: Boolean = false): DataFrame =
    bandedBuckets(docs, k, numHashes, bands, oracleHashes)
      .groupBy("band_idx", "band_hash")
      .agg(count(lit(1)).as("n_docs"))
      .filter(col("n_docs") > maxBucketSize)

  /** Banded LSH candidate pairs: signatures split into `bands` bands of
    * rows; docs sharing any band hash become candidates; pairs are scored
    * by signature agreement (estimated Jaccard).
    *
    * `oracleHashes = true` swaps the xxhash64 fast family for the md5 one
    * (minhashSignatures) — same algorithm, DuckDB-reproducible output, so
    * the full banded pipeline can be hash-checked against the oracle.
    * Production runs keep the default fast family (~8× fewer hashes).
    *
    * `maxBucketSize` is the 100 TB skew guard: a boilerplate band bucket
    * (templated pages, empty docs) with m members emits m² candidate
    * pairs — one 10M-doc bucket is 10¹⁴ pairs and a dead executor.
    * Buckets above the cap are excluded from candidate GENERATION (pairs
    * that also share a healthy bucket still surface through it); their
    * members are boilerplate-identical at that band and belong to exact
    * dedup, which handles them at O(n). Capping beats salting here:
    * salting a band splits its bucket arbitrarily and silently loses
    * pairs with no bound on which, while the cap's exclusions are
    * well-defined (whole pathological buckets) and auditable via
    * [[oversizedBuckets]]. Default ∞ keeps small-corpus behavior exact. */
  def minhashCandidates(
      docs: DataFrame, k: Int = 3, numHashes: Int = 8, bands: Int = 4,
      minEstJaccard: Double = 0.5, oracleHashes: Boolean = false,
      maxBucketSize: Int = Int.MaxValue): DataFrame = {
    // The bucket rows are persisted AND materialized up front because BOTH
    // sides of the self-join scan them: lazily-cached branches race to
    // populate and the whole shingle→signature pipeline (the expensive
    // part) executes twice. Footprint is doc_id + signatures — bytes per
    // doc, cacheable even at corpus scale (MEMORY_AND_DISK spills, never
    // OOMs).
    val buckets = PipelineCaches.track(
      bandedBuckets(docs, k, numHashes, bands, oracleHashes)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    buckets.count()

    // skew guard: drop whole over-cap buckets before the self-join. The
    // over-cap KEY set is tiny by construction (≤ rows/cap keys), so it
    // broadcasts; the anti-join reads the cached buckets, never the text.
    val eligible =
      if (maxBucketSize == Int.MaxValue) buckets
      else buckets.join(
        broadcast(buckets.groupBy("band_idx", "band_hash")
          .agg(count(lit(1)).as("_n")).filter(col("_n") > maxBucketSize)
          .select("band_idx", "band_hash")),
        Seq("band_idx", "band_hash"), "left_anti")

    val l = eligible.select(
      col("band_idx"), col("band_hash"),
      col("doc_id").as("doc_a"), col("sig").as("sig_a"))
    val r = eligible.select(
      col("band_idx"), col("band_hash"),
      col("doc_id").as("doc_b"), col("sig").as("sig_b"))

    val matches =
      graft.functions.MatchExpressions.arrayEqCount(col("sig_a"), col("sig_b"))
    l.join(r, Seq("band_idx", "band_hash"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        (matches.cast("double") / size(col("sig_a"))).as("est_jaccard"))
      .distinct()
      .filter(col("est_jaccard") >= minEstJaccard)
  }

  /** Shared scaffold of the exact rescorers: candidate pairs annotated
    * with (n_inter, n_a, n_b) — distinct-shingle intersection and the
    * two set sizes. The exploded shingle set feeds three consumers, but
    * no cache is needed: they sit behind the same shuffle and
    * ReuseExchange serves all three from one execution (measured — a
    * persist+materialize here changed nothing). Candidate columns pass
    * through, so callers keep extras like est_jaccard. */
  private def pairShingleCounts(
      docs: DataFrame, candidates: DataFrame, k: Int): DataFrame =
    pairShingleCountsFrom(
      withShingleCol(docs, k).select(col("doc_id"),
        expr("explode(array_distinct(_shingles))").as("shingle")),
      candidates)

  /** [[pairShingleCounts]] over an ALREADY-BUILT distinct
    * (doc_id, shingle) relation — the exact joins persist exactly this
    * table for candidate generation, and re-deriving it inside the
    * rescore was a full second corpus shingle pass (measured round 15:
    * the whole exact-join family pays it).
    *
    * `sizes` lets a caller that already computed the per-doc shingle
    * counts (the exact joins build them for the prefix bound) feed them
    * in instead of paying two more aggs over `sh` (r17 optimization
    * round, guide §2.4 — shared work computed once). Must be exactly
    * sh.groupBy(doc_id).count — identity, not a tuning knob. */
  private[graft] def pairShingleCountsFrom(
      sh: DataFrame, candidates: DataFrame,
      sizes: Option[DataFrame] = None): DataFrame = {
    val counts = sizes.getOrElse(
      sh.groupBy("doc_id").count().withColumnRenamed("count", "n_sh"))
    val inter = candidates
      .join(sh.withColumnRenamed("doc_id", "doc_a"), Seq("doc_a"))
      .join(sh.withColumnRenamed("doc_id", "doc_b")
        .withColumnRenamed("shingle", "shingle_b"), Seq("doc_b"))
      .filter(col("shingle") === col("shingle_b"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("n_inter"))
    candidates
      .join(inter, Seq("doc_a", "doc_b"), "left")
      .na.fill(0, Seq("n_inter"))
      .join(counts.withColumnRenamed("doc_id", "doc_a")
        .withColumnRenamed("n_sh", "n_a"), Seq("doc_a"))
      .join(counts.withColumnRenamed("doc_id", "doc_b")
        .withColumnRenamed("n_sh", "n_b"), Seq("doc_b"))
  }

  /** Exact n-gram Jaccard for a candidate pair set (rescoring step after
    * LSH pruning): |A∩B| / |A∪B| over distinct k-shingles. */
  def jaccardRescore(
      docs: DataFrame, candidates: DataFrame, k: Int = 3): DataFrame =
    pairShingleCounts(docs, candidates, k)
      .withColumn("jaccard",
        col("n_inter").cast("double") /
          (col("n_a") + col("n_b") - col("n_inter")))
      .select("doc_a", "doc_b", "est_jaccard", "jaccard")

  /** Exact shingle CONTAINMENT for a candidate pair set — the asymmetric
    * companion to [[jaccardRescore]]: containment_a = |A∩B| / |A| (how
    * much of doc_a lives inside doc_b), and symmetrically containment_b.
    * Jaccard misses subset duplication by construction — a short doc
    * quoted whole inside a long one scores |A|/|B| ≈ 0 Jaccard but
    * containment_a = 1 — and "wholly-contained document" is its own
    * standard dedup rule (Broder 1997's resemblance vs containment
    * split). Same joins and scale shape as the Jaccard rescore; all
    * three scores come out of one pass. Counts are exact ints so the
    * double divisions replay bit-identically in the oracle. */
  def containmentRescore(
      docs: DataFrame, candidates: DataFrame, k: Int = 3): DataFrame =
    containmentProjection(pairShingleCounts(docs, candidates, k))

  /** [[containmentRescore]] over a prebuilt distinct (doc_id, shingle)
    * relation — lets the exact joins feed their PERSISTED shingle table
    * into the rescore instead of paying a second corpus shingle pass.
    * Optional `sizes` forwards a caller's precomputed per-doc counts
    * (see [[pairShingleCountsFrom]]). */
  private[graft] def containmentRescoreFrom(
      sh: DataFrame, candidates: DataFrame,
      sizes: Option[DataFrame] = None): DataFrame =
    containmentProjection(pairShingleCountsFrom(sh, candidates, sizes))

  private def containmentProjection(pc: DataFrame): DataFrame =
    pc.select(col("doc_a"), col("doc_b"),
      (col("n_inter").cast("double") / col("n_a")).as("containment_a"),
      (col("n_inter").cast("double") / col("n_b")).as("containment_b"),
      (col("n_inter").cast("double") /
        (col("n_a") + col("n_b") - col("n_inter"))).as("jaccard"))

  /** Candidate-pair Jaccard HISTOGRAM — the LSH threshold-tuning card
    * that closes the loop [[lshPlan]] opens: generate the banded
    * candidate pairs, rescore each with EXACT shingle Jaccard, and
    * bucket into 0.05-wide bins (one row per occupied bin with pair
    * count and share). A mass of candidates below the intended
    * threshold means the band/row split is over-recalling (wasted
    * rescore work); an empty shoulder above it means near-dups are
    * escaping candidate generation. Bin 20 holds exact duplicates
    * (jaccard = 1 only — floor(1·20)).
    *
    * Exactly oracle-replayable: the Jaccard is a double of exact
    * shingle-set integers, the bin is floor(j·20) on that double (both
    * engines execute the same IEEE multiply), the share total windows
    * the ≤21-row card. Scale shape: candidate generation is the banded
    * self-join with skew caps ([[minhashCandidates]]), never all
    * pairs; everything after the rescore is bin-bounded. */
  def pairJaccardHist(docs: DataFrame, k: Int = 3, numHashes: Int = 8,
      bands: Int = 4, oracleHashes: Boolean = false): DataFrame = {
    // persisted + materialized (r17 optimization round): the rescore
    // consumes the candidate set twice, and each lazy reference re-ran
    // the band self-join + distinct (the buckets cache inside
    // minhashCandidates bounds that recompute but does not remove it).
    // Pair-bounded, so the cache is small by construction.
    val cands = PipelineCaches.track(
      minhashCandidates(docs, k, numHashes, bands,
        minEstJaccard = 0.0, oracleHashes = oracleHashes)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    cands.count()
    val scored = jaccardRescore(docs, cands, k)
    scored
      .groupBy(floor(col("jaccard") * 20).cast("int").as("bin"))
      .agg(count(lit(1)).as("_n"))
      .select(col("bin"),
        round(col("bin").cast("double") * 0.05, 2).as("bin_lo"),
        col("_n").cast("bigint").as("n_pairs"),
        round(col("_n").cast("double") /
          sum("_n").over(Sampling.allRows).cast("double"), 6).as("share"))
  }

  /** EXACT set-similarity self-join via PREFIX FILTERING (Chaudhuri et
    * al. 2006's prefix lemma / Bayardo et al. 2007 "Scaling Up All
    * Pairs"): EVERY pair (doc_a < doc_b) whose distinct-k-shingle
    * Jaccard ≥ `threshold` — complete by construction, unlike the
    * probabilistic MinHash band join, and without all-pairs work. The
    * tool for when recall 1.0 is a REQUIREMENT (benchmark
    * decontamination sign-off, legal dedup attestations).
    *
    * How: a qualifying pair shares o ≥ ceil(t·|x|) shingles with BOTH
    * endpoints' sizes, so under one global shingle order
    * (document-frequency ascending — rare first — then shingle) each
    * doc only needs to index its first |x| − ceil(t·|x|) + 1 shingles:
    * two qualifying docs MUST collide on an indexed prefix shingle
    * (pigeonhole). Candidates = the prefix equi-self-join + the
    * size-compatibility filter t·|x| ≤ |y| (both directions), then the
    * exact rescore keeps jaccard ≥ t. The α = ceil(t·sz) bounds are
    * computed as ceil(t·sz − 1e-9): the epsilon can only LOWER α
    * (longer prefix, more candidates) when float noise lands t·sz a
    * hair above an integer — conservative, so exactness never hinges
    * on float rounding. The oracle proves completeness, not a replay:
    * DuckDB computes the UNPRUNED all-pairs join and the hash gate
    * asserts set equality.
    *
    * Scale shape: the df table is a shingle-keyed partial agg; the
    * rank is a per-doc window; candidate generation is an equi-join on
    * prefix shingles whose buckets the rare-first order keeps small
    * (the AllPairs observation), with the size filter pruning inside a
    * bucket; the rescore is candidate-bounded. No stage is
    * corpus-quadratic unless the output itself is. */
  def jaccardJoinExact(docs: DataFrame, threshold: Double, k: Int = 3)
      : DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"threshold must be in (0, 1], got $threshold")
    val sh = PipelineCaches.track(withShingleCol(docs, k)
      .select(col("doc_id"),
        expr("explode(array_distinct(_shingles))").as("shingle"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("_sz"))
    val dfreq = sh.groupBy("shingle").agg(count(lit(1)).as("_df"))
    def alphaCeil(sz: Column): Column =
      ceil(sz.cast("double") * lit(threshold) - lit(1e-9))
    // persisted + materialized (r17 optimization round): BOTH sides of
    // the candidate self-join scan the prefix relation, and each lazy
    // reference re-ran the df agg + two joins + the per-doc window
    // (plan-verified: the Window subtree appeared 4x in the entry's
    // physical plan — twice per cands evaluation, and cands itself was
    // consumed twice by the rescore). Prefix rows are the ~(1−t) head
    // of each doc's shingle list — strictly smaller than the already-
    // persisted sh relation, so the cache is the cheap side of the
    // trade at any scale (guide §2.4: remove recomputed subtrees).
    val prefix = PipelineCaches.track(sh.join(dfreq, Seq("shingle"))
      .join(sizes, Seq("doc_id"))
      .withColumn("_r", row_number().over(Window.partitionBy("doc_id")
        .orderBy(col("_df").asc, col("shingle").asc)))
      .filter(col("_r") <= col("_sz") - alphaCeil(col("_sz")) + 1)
      .select("shingle", "doc_id", "_sz")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    prefix.count()
    // persisted + materialized: the rescore consumes the candidate set
    // twice (the intersection join and the final pair left-join), and
    // each lazy reference re-ran the whole self-join + distinct.
    // Pair-bounded by construction — small by the same argument as
    // paragraphProbeCore's cands cache (the round-15/16 lesson).
    val cands = PipelineCaches.track(prefix
      .select(col("shingle"), col("doc_id").as("doc_a"),
        col("_sz").as("_sza"))
      .join(prefix.select(col("shingle"), col("doc_id").as("doc_b"),
        col("_sz").as("_szb")), Seq("shingle"))
      .filter(col("doc_a") < col("doc_b"))
      .filter(col("_szb") >= alphaCeil(col("_sza")) &&
        col("_sza") >= alphaCeil(col("_szb")))
      .select("doc_a", "doc_b").distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    cands.count()
    containmentRescoreFrom(sh, cands,
        sizes = Some(sizes.select(col("doc_id"), col("_sz").as("n_sh"))))
      .filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "jaccard")
  }

  /** EXACT set-CONTAINMENT self-join — [[jaccardJoinExact]]'s
    * asymmetric twin, recall 1.0 by construction: every ORDERED pair
    * (doc_a, doc_b), a ≠ b, with |Sa ∩ Sb| / |Sa| ≥ threshold — doc_a
    * at least threshold-contained in doc_b. Jaccard dedup provably
    * misses subset duplication (a half-doc excerpt scores ~0.5 Jaccard
    * but containment 1 — Broder 1997's resemblance/containment split);
    * this join is the ground truth an excerpt-dedup release sheet
    * quotes, exactly as the Jaccard exact join grounds the LSH audit.
    *
    * Prefix-filter completeness (the AllPairs argument, one-sided): in
    * the global (df asc, shingle asc) order, if B misses ALL of A's
    * first |A| − ceil(t·|A|) + 1 shingles then |A∩B| ≤ ceil(t·|A|) − 1
    * < t·|A| — so joining A-prefixes against the FULL shingle index
    * loses nothing. Containment admits only one size prune (|B| ≥
    * ceil(t·|A|) — a host smaller than the required intersection is
    * impossible); unlike the symmetric join the HOST side cannot be
    * prefixed, so this join prices by the df mass of prefix shingles —
    * rare-first ordering keeps that the rare tail. The conservative
    * ceil(x − 1e-9) only LENGTHENS prefixes under float noise (more
    * candidates, never fewer — the completeness direction).
    *
    * Scale shape: one shingle explode (persisted, three consumers),
    * df/size aggs, the prefix row_number over per-doc shingle lists,
    * one shingle-keyed equi-join, and the exact rescore on the
    * candidate-bounded pairs. Plan-pinned no-cartesian. Run on an
    * audit sample at 100 TB — like the exact Jaccard join, it prices
    * by 1 − t. */
  def containmentJoinExact(docs: DataFrame, threshold: Double,
      k: Int = 3): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"threshold must be in (0, 1], got $threshold")
    val sh = PipelineCaches.track(withShingleCol(docs, k)
      .select(col("doc_id"),
        expr("explode(array_distinct(_shingles))").as("shingle"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("_sz"))
    val dfreq = sh.groupBy("shingle").agg(count(lit(1)).as("_df"))
    def alphaCeil(sz: Column): Column =
      ceil(sz.cast("double") * lit(threshold) - lit(1e-9))
    val prefix = sh.join(dfreq, Seq("shingle"))
      .join(sizes, Seq("doc_id"))
      .withColumn("_r", row_number().over(Window.partitionBy("doc_id")
        .orderBy(col("_df").asc, col("shingle").asc)))
      .filter(col("_r") <= col("_sz") - alphaCeil(col("_sz")) + 1)
      .select(col("shingle"), col("doc_id").as("doc_a"),
        col("_sz").as("_sza"))
    // persisted + materialized (r17 optimization round): the rescore
    // consumes the candidate set twice and each lazy reference re-ran
    // the prefix pipeline + the index join + distinct (plan-verified
    // duplicate subtrees, same fix as jaccardJoinExact). prefix itself
    // is consumed once here, so it stays lazy.
    val cands = PipelineCaches.track(prefix
      .join(sh.select(col("shingle"), col("doc_id").as("doc_b")),
        Seq("shingle"))
      .filter(col("doc_a") =!= col("doc_b"))
      .join(sizes.select(col("doc_id").as("doc_b"),
        col("_sz").as("_szb")), Seq("doc_b"))
      .filter(col("_szb") >= alphaCeil(col("_sza")))
      .select("doc_a", "doc_b").distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    cands.count()
    containmentRescoreFrom(sh, cands,
        sizes = Some(sizes.select(col("doc_id"), col("_sz").as("n_sh"))))
      .filter(col("containment_a") >= threshold)
      .select("doc_a", "doc_b", "containment_a")
  }

  /** LSH threshold-SENSITIVITY curve — [[pairJaccardHist]] read the way
    * a dedup operator tunes it: for every 0.05 Jaccard bin, how many
    * candidate pairs sit AT OR ABOVE it (`n_pairs_ge` and its share).
    * Pick the dedup threshold where the curve knees: everything below
    * is rescore work the banding wasted, everything above is dup mass
    * the threshold would keep. Windows run over the ≤21-row bin card —
    * never the pair stream. */
  /** MinHash ESTIMATOR-error card — the third leg of the sketch-audit
    * family (HLL and CMS ship theirs; this audits the signature
    * estimate itself): over every banded candidate pair, compare the
    * signature's est_jaccard (a k/numHashes rational) against the exact
    * shingle Jaccard and report mean/max absolute error plus the share
    * of pairs within one estimator notch (1/numHashes). A mean error
    * far above the binomial expectation means the hash family or band
    * layout is biased, not just noisy.
    *
    * Error terms are 12-dp rounded then DECIMAL-summed
    * (order-independent); the card is a 1-row agg over the
    * candidate-bounded pair relation. */
  def minhashEstQuality(docs: DataFrame, k: Int = 3, numHashes: Int = 8,
      bands: Int = 4, oracleHashes: Boolean = false): DataFrame = {
    // persisted + materialized (r17 optimization round): this entry
    // references the candidate set THREE times (both rescore sides +
    // the est_jaccard join-back), and each lazy reference re-ran the
    // band self-join + distinct. Pair-bounded cache.
    val cands = PipelineCaches.track(
      minhashCandidates(docs, k, numHashes, bands,
        minEstJaccard = 0.0, oracleHashes = oracleHashes)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    cands.count()
    val err = containmentRescore(docs,
        cands.select("doc_a", "doc_b"), k)
      .join(cands, Seq("doc_a", "doc_b"))
      .select(round(abs(col("est_jaccard") - col("jaccard")), 12)
        .as("_e"))
    val notch = 1.0 / numHashes
    err.agg(
      count(lit(1)).cast("bigint").as("n_pairs"),
      round(sum(col("_e").cast("decimal(28,12)")).cast("double") /
        count(lit(1)), 6).as("mean_abs_err"),
      round(max("_e"), 6).as("max_abs_err"),
      round(sum(when(col("_e") <= notch, 1L).otherwise(0L))
        .cast("double") / count(lit(1)), 6).as("share_within_notch"))
  }

  /** Measured LSH recall/precision audit — the governance row the exact
    * join unlocks: run [[jaccardJoinExact]] (ground truth, recall 1.0
    * by construction) and the banded [[minhashCandidates]] (the
    * production path) over the SAME corpus and report how many true
    * ≥-threshold pairs the bands actually caught. [[lshPlan]] predicts
    * the S-curve from (bands, rows); this card MEASURES it on real
    * data — the number a dedup run's release sheet should quote.
    *
    * One full-outer merge of the two pair relations feeds a single
    * 1-row aggregate (no per-side count jobs, no one-row cross joins);
    * every statistic is an integer or a guarded integer ratio.
    *
    * Scale shape: both inputs are pair-bounded relations with
    * non-quadratic generation (prefix filter / banded buckets); the
    * merge is an equi-join on the pair key. Run it on an AUDIT SAMPLE
    * at 100 TB — the exact join prices by 1−t, which is the point of
    * sampling the audit rather than skipping it. */
  def lshRecallAudit(docs: DataFrame, threshold: Double = 0.8,
      k: Int = 3, numHashes: Int = 8, bands: Int = 4,
      oracleHashes: Boolean = false): DataFrame = {
    val truth = jaccardJoinExact(docs, threshold, k)
      .select("doc_a", "doc_b").withColumn("_t", lit(1L))
    val cand = minhashCandidates(docs, k, numHashes, bands,
        minEstJaccard = 0.0, oracleHashes = oracleHashes)
      .select("doc_a", "doc_b").withColumn("_c", lit(1L))
    truth.join(cand, Seq("doc_a", "doc_b"), "full")
      .agg(
        coalesce(sum("_t"), lit(0L)).cast("bigint").as("n_truth"),
        coalesce(sum("_c"), lit(0L)).cast("bigint").as("n_candidates"),
        sum(when(col("_t").isNotNull && col("_c").isNotNull, 1L)
          .otherwise(0L)).cast("bigint").as("n_hit"))
      .select(lit(threshold).as("threshold"),
        col("n_truth"), col("n_candidates"), col("n_hit"),
        when(col("n_truth") === 0, lit(null).cast("double"))
          .otherwise(round(col("n_hit").cast("double") /
            col("n_truth").cast("double"), 6)).as("recall"),
        when(col("n_candidates") === 0, lit(null).cast("double"))
          .otherwise(round(col("n_hit").cast("double") /
            col("n_candidates").cast("double"), 6))
          .as("candidate_precision"))
  }

  /** Containment-dedup TREATMENT — the drop rule the exact join
    * grounds (diagnosis [[containmentJoinExact]] → audit
    * [[containmentRecallAudit]] → THIS): drop every doc that is
    * ≥ threshold contained in a doc that survives, under the
    * deterministic Broder-style rule
    *   drop a  ⇔  ∃ b: C(a,b) ≥ t ∧ (C(b,a) < t ∨ b < a)
    * — a strictly-contained doc (an excerpt) always drops in favor of
    * its host; mutually-contained docs (near-identical) keep the
    * LOWEST doc_id (the keep-one convention of the whole dedup tier).
    * The rule needs no iteration: a mutual-containment CHAIN keeps
    * exactly its minimum (every other member sees a lower mutual
    * partner), and a strict containment a⊂b never needs b to survive —
    * b can only itself drop toward an even larger host or a lower
    * mutual twin, and transitivity of ≥t containment does NOT hold in
    * general, so the safe (and standard) contract is "dropped by
    * SOME witness pair", which this one-pass rule implements exactly.
    *
    * Returns every doc with (is_dropped, n_hosts — the number of
    * witness pairs). Rows preserved; pair work is the exact join's
    * envelope plus one pair-keyed merge and a doc-keyed agg. */
  def dropContained(docs: DataFrame, threshold: Double = 0.8,
      k: Int = 3): DataFrame = {
    val pairs = PipelineCaches.track(
      containmentJoinExact(docs, threshold, k)
        .select(col("doc_a"), col("doc_b"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    // materialize before the self-join below references it twice —
    // two lazily-cached branches race to populate and the exact join
    // executes twice (r17 optimization round; the minhashCandidates
    // buckets comment documents the same race)
    pairs.count()
    // orient: does the reverse pair exist (mutual containment)?
    val rev = pairs.select(col("doc_a").as("doc_b"),
      col("doc_b").as("doc_a")).withColumn("_mutual", lit(1))
    val witnesses = pairs.join(rev, Seq("doc_a", "doc_b"), "left")
      .filter(col("_mutual").isNull || col("doc_b") < col("doc_a"))
    val dropped = witnesses.groupBy(col("doc_a").as("doc_id"))
      .agg(count(lit(1)).cast("bigint").as("n_hosts"))
    docs.select("doc_id").join(dropped, Seq("doc_id"), "left")
      .select(col("doc_id"),
        col("n_hosts").isNotNull.as("is_dropped"),
        coalesce(col("n_hosts"), lit(0L)).as("n_hosts"))
  }

  /** The persistable CONTAINMENT index: one row per (doc, distinct
    * md5 k-shingle) with the doc's shingle-set size denormalized onto
    * every row — the [[signatureIndex]] analog for the excerpt/host
    * question, and the state table of
    * [[graft.streaming.StreamingPipeline.ContainmentIndex]]. At corpus
    * scale store it bucketed on `sh` (graft.scale.Bucketing) so
    * incremental probes join with zero exchange on the index side;
    * retire via [[retireFromIndex]] (the id anti-join is schema-
    * agnostic) and compact via [[graft.scale.StoreMaint.replaceStore]].
    * Constant-width keys — prose never enters the index. */
  def shingleIndex(docs: DataFrame, k: Int = 3): DataFrame =
    // n_sh via a doc-keyed window, NOT a self-join: the self-join form
    // referenced the unpersisted shingle relation twice and computed
    // the full explode+md5 pipeline per reference (round-15 review
    // fix) — the window pays one doc_id shuffle over the same rows
    withShingleCol(docs, k)
      .select(col("doc_id"),
        expr("explode(array_distinct(_shingles))").as("_g"))
      .select(col("doc_id"), md5(col("_g")).as("sh"))
      .withColumn("n_sh",
        count(lit(1)).over(Window.partitionBy("doc_id")))

  /** Incremental EXACT containment detection: every ORDERED pair
    * (doc_a, doc_b, containment_a ≥ threshold) TOUCHING the new batch —
    * batch docs probed both as EXCERPT and as HOST against the
    * persisted [[shingleIndex]] of the historical corpus, plus in-batch
    * pairs — without re-shingling a single historical document. EXACT,
    * not banded: a qualifying pair shares ≥ 1 shingle and one probe
    * side is always the (small) batch, so one shingle-keyed join
    * against the batch-key-pruned index computes every batch-touching
    * intersection completely (the broadcast semi-join prune is the
    * [[incrementalCandidates]] discipline — a sh-bucketed index store
    * joins with zero exchange). Output matches
    * [[containmentJoinExact]] over (corpus ∪ batch) restricted to
    * pairs touching the batch — the oracle proves it every round. Ids
    * must be disjoint between index and batch — ENFORCED by a bounded
    * limit-1 probe inside the shared primitive (round-15 advice), so
    * an overlapping id fails loudly instead of double-counting. */
  def incrementalContainmentPairs(index: DataFrame, newDocs: DataFrame,
      threshold: Double = 0.8, k: Int = 3): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"threshold must be in (0, 1], got $threshold")
    val nb = PipelineCaches.track(shingleIndex(newDocs, k)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    nb.count()
    containmentPairsFromShingles(index, nb, threshold)
  }

  /** [[incrementalContainmentPairs]] core for callers already holding
    * the batch's MATERIALIZED [[shingleIndex]] rows (the streaming
    * path computes them once and both probes and appends them). */
  private[graft] def containmentPairsFromShingles(index: DataFrame,
      nb: DataFrame, threshold: Double): DataFrame = {
    // loud disjointness guard (round-15 advice): an id on both sides
    // would silently emit duplicate/spurious pairs (the id_x =!= id_y
    // filter treats its two copies as distinct docs). One bounded job:
    // the batch's id set broadcasts, the index scan prunes to it,
    // limit 1 stops at the first offender — the fail-loudly contract
    // the rest of this file's require()s follow.
    val overlap = index
      .join(broadcast(nb.select("doc_id").distinct()),
        Seq("doc_id"), "left_semi")
      .select("doc_id").limit(1).collect()
    require(overlap.isEmpty,
      s"batch doc ids must be disjoint from the index; found " +
        s"overlapping doc_id ${overlap.head.get(0)}")
    val batchKeys = nb.select("sh").distinct()
    val pruned = index.join(broadcast(batchKeys), Seq("sh"), "left_semi")
    def sided(df: DataFrame, side: String) = df.select(col("sh"),
      col("doc_id").as(s"id_$side"), col("n_sh").as(s"n_$side"))
    def inters(x: DataFrame) = sided(x, "x")
      .join(sided(nb, "y"), Seq("sh"))
      .filter(col("id_x") =!= col("id_y"))
      .groupBy("id_x", "id_y", "n_x", "n_y")
      .agg(count(lit(1)).as("_i"))
    // index×batch pairs appear once; in-batch pairs restricted to
    // id_x < id_y so each unordered pair is scored once — BOTH
    // orientations are then emitted from the one scored row.
    // Persisted + materialized (r17 optimization round): the two
    // orientation projections below each referenced the lazy pair
    // relation, re-running both intersection joins per reference.
    // One row per batch-touching co-shingle pair — batch-bounded.
    val pairs = PipelineCaches.track(inters(pruned)
      .unionAll(inters(nb).filter(col("id_x") < col("id_y")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    pairs.count()
    pairs.select(col("id_x").as("doc_a"), col("id_y").as("doc_b"),
        (col("_i").cast("double") / col("n_x")).as("containment_a"))
      .unionAll(pairs.select(col("id_y").as("doc_a"),
        col("id_x").as("doc_b"),
        (col("_i").cast("double") / col("n_y")).as("containment_a")))
      .filter(col("containment_a") >= threshold)
  }

  /** Containment-recall governance audit — [[lshRecallAudit]]'s twin
    * for the ASYMMETRIC threshold the exact containment join grounds:
    * how many true containment-≥t ordered pairs does the banded
    * Jaccard-MinHash candidate generator actually surface? This number
    * is EXPECTED to be low — Jaccard-based LSH is blind to
    * low-Jaccard/high-containment pairs BY CONSTRUCTION (a half-doc
    * excerpt sits near J 0.5, far below the band S-curve's knee at
    * 0.8) — and that measured gap is precisely the governance row
    * justifying [[containmentJoinExact]] (or a dedicated containment
    * index) in an excerpt-dedup pipeline: "the dedup run's candidate
    * generator missed X% of whole-excerpt duplication" is a release-
    * sheet sentence, not a guess.
    *
    * Truth = the exact ordered containment pairs; a truth pair counts
    * as HIT when its unordered pair appears among the banded
    * candidates. Same merge-and-one-agg shape as the Jaccard audit;
    * run on an audit sample at 100 TB (the exact side prices by the
    * prefix df mass). */
  def containmentRecallAudit(docs: DataFrame, threshold: Double = 0.8,
      k: Int = 3, numHashes: Int = 8, bands: Int = 4,
      oracleHashes: Boolean = false): DataFrame = {
    val truth = containmentJoinExact(docs, threshold, k)
      .select("doc_a", "doc_b").withColumn("_t", lit(1L))
    // candidates are unordered (doc_a < doc_b); orient each truth pair
    // onto that key
    val cand = minhashCandidates(docs, k, numHashes, bands,
        minEstJaccard = 0.0, oracleHashes = oracleHashes)
      .select(col("doc_a").as("_lo"), col("doc_b").as("_hi"))
      .withColumn("_c", lit(1L))
    truth
      .withColumn("_lo", least(col("doc_a"), col("doc_b")))
      .withColumn("_hi", greatest(col("doc_a"), col("doc_b")))
      .join(cand, Seq("_lo", "_hi"), "left")
      .agg(
        count(lit(1)).cast("bigint").as("n_truth"),
        coalesce(sum("_c"), lit(0L)).cast("bigint").as("n_hit"))
      .select(lit(threshold).as("threshold"),
        col("n_truth"), col("n_hit"),
        when(col("n_truth") === 0, lit(null).cast("double"))
          .otherwise(round(col("n_hit").cast("double") /
            col("n_truth").cast("double"), 6)).as("recall"))
  }

  def lshSensitivity(docs: DataFrame, k: Int = 3, numHashes: Int = 8,
      bands: Int = 4, oracleHashes: Boolean = false): DataFrame = {
    val hist = pairJaccardHist(docs, k, numHashes, bands, oracleHashes)
    val wDesc = Window.partitionBy(lit(0)).orderBy(col("bin").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    hist.select(col("bin"), col("bin_lo"), col("n_pairs"),
      sum("n_pairs").over(wDesc).cast("bigint").as("n_pairs_ge"),
      round(sum("n_pairs").over(wDesc).cast("double") /
        sum("n_pairs").over(Sampling.allRows).cast("double"), 6)
        .as("share_ge"))
  }

  /** 64-bit SimHash from token md5s: bit b of each token's hash votes ±1;
    * the sign of the per-bit vote sum is bit b of the signature (stored as
    * a 64-char bitstring — overflow-free and join-friendly). Near-dups have
    * small Hamming distance. md5 + hex→int is reproduced exactly by the
    * DuckDB oracle (CAST('0x'||hex AS BIGINT)). */
  def simhash(docs: DataFrame): DataFrame =
    // ONE native zero-shuffle projection (graft.functions.SimhashBits):
    // the signature is a per-row function of the text, so the previous
    // explode → md5 → 64-column vote aggregation paid a corpus-wide
    // shuffle (64 longs per doc) that never needed to exist. Parity with
    // the aggregate form (same split/empty-token, md5-word, vote, and
    // bit-order semantics) is pinned in MatchExpressionsSpec and by the
    // DuckDB oracle hash gate. coalesce keeps NULL-text docs in the
    // output, mirroring the old explode-keeping behavior.
    docs.select(col("doc_id"),
      graft.functions.SimhashBits.simhashBits(
        coalesce(col("text"), lit(""))).as("simhash_bits"))

  /** Hamming distance between two simhash bitstrings. Native codegen
    * expression ([[graft.functions.StringHamming]]) — result-identical to
    * the split + zip_with + filter chain, without the two per-row char
    * arrays and interpreted lambdas. */
  def hamming(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column =
    graft.functions.MatchExpressions.stringHamming(a, b)

  /** SimHash near-duplicate PAIRS at hamming distance ≤ `maxHamming`, via
    * the pigeonhole multi-index (the classic web-dedup trick): split the
    * 64-bit signature into `blocks` equal substrings — two signatures
    * within `blocks − 1` differing bits must agree on AT LEAST one whole
    * block — bucket-join on (block_idx, block_bits), then exact hamming
    * rescore of the distinct candidate pairs. Requires
    * `maxHamming < blocks` or the guarantee (and recall) breaks.
    *
    * Scale shape: the only join is the block equi-join (the SimHash twin
    * of the MinHash band join) carrying (block, doc_id, 64-char sig);
    * never an all-pairs comparison. `maxBucketSize` is the same skew
    * guard as [[minhashCandidates]] — a degenerate block (e.g. all-zero
    * high bits across a template-heavy corpus) would emit m² pairs, so
    * over-cap buckets are excluded wholesale. */
  def simhashNearDup(
      docs: DataFrame, maxHamming: Int = 3, blocks: Int = 4,
      maxBucketSize: Int = Int.MaxValue): DataFrame = {
    require(blocks > 0 && 64 % blocks == 0, "blocks must divide 64")
    require(maxHamming >= 0 && maxHamming < blocks,
      s"pigeonhole needs maxHamming < blocks (got $maxHamming ≥ $blocks)")
    val width = 64 / blocks
    // both self-join sides read the signatures — materialize once (same
    // rationale as minhashCandidates / cosineNearDup)
    val sigs = PipelineCaches.track(
      simhash(docs)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    sigs.count()
    val blocked = sigs.select(col("doc_id"), col("simhash_bits"),
      posexplode(array((0 until blocks).map(b =>
        substring(col("simhash_bits"), b * width + 1, width)): _*))
        .as(Seq("block_idx", "block_bits")))
    val banded =
      if (maxBucketSize == Int.MaxValue) blocked
      else blocked.join(
        broadcast(blocked.groupBy("block_idx", "block_bits")
          .agg(count(lit(1)).as("_n")).filter(col("_n") > maxBucketSize)
          .select("block_idx", "block_bits")),
        Seq("block_idx", "block_bits"), "left_anti")
    val l = banded.select(col("block_idx"), col("block_bits"),
      col("doc_id").as("doc_a"), col("simhash_bits").as("sig_a"))
    val r = banded.select(col("block_idx"), col("block_bits"),
      col("doc_id").as("doc_b"), col("simhash_bits").as("sig_b"))
    l.join(r, Seq("block_idx", "block_bits"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b", "sig_a", "sig_b").distinct()
      .select(col("doc_a"), col("doc_b"),
        hamming(col("sig_a"), col("sig_b")).as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  /** MinHash-LSH parameter planner — the (bands, rows) design card for a
    * dedup run: for every factorization b·r = `nSig`, the S-curve
    * P(match | s) = 1 − (1 − s^r)^b integrated on a midpoint grid gives
    * the false-positive area below `threshold` and the false-negative
    * area above it (Leskovec et al., MMDS §3.4); `is_best` marks the
    * minimum-total-error row. Run this BEFORE a corpus-sized LSH job:
    * banding is baked into every signature, so a mis-planned (b, r)
    * costs a full re-shingle at 100 TB.
    *
    * Cross-engine determinism: both `pow` results round to 12 dp (the
    * temperatureShares convention — last-ulp libm drift can't survive),
    * grid terms sum as DECIMAL, and the grid uses midpoints so no
    * sample ever sits exactly on the threshold. The relation is
    * divisors × grid rows — driver-trivial, expressed as a plan so the
    * card composes with the rest of the catalog. */
  def lshPlan(spark: org.apache.spark.sql.SparkSession, nSig: Int,
      threshold: Double, gridSteps: Int = 100): DataFrame = {
    require(nSig > 0, s"signature length must be positive, got $nSig")
    require(threshold > 0 && threshold < 1,
      s"threshold must be in (0, 1), got $threshold")
    require(gridSteps > 0, s"gridSteps must be positive, got $gridSteps")
    import spark.implicits._
    val dec = org.apache.spark.sql.types.DecimalType(28, 12)
    val zero = lit(0).cast(dec)
    val combos = (1 to nSig).filter(nSig % _ == 0)
      .map(b => (b, nSig / b)).toDF("bands", "rows_per_band")
    val grid = spark.range(1, gridSteps + 1L)
      .select(((col("id").cast("double") - 0.5) / gridSteps).as("_s"))
    val terms = combos.crossJoin(grid)
      .withColumn("_sr",
        round(pow(col("_s"), col("rows_per_band").cast("double")), 12))
      .withColumn("_p", lit(1.0) -
        round(pow(lit(1.0) - col("_sr"), col("bands").cast("double")), 12))
      .withColumn("_fp", when(col("_s") < threshold,
        round(col("_p"), 12).cast(dec)).otherwise(zero))
      .withColumn("_fn", when(col("_s") >= threshold,
        round(lit(1.0) - col("_p"), 12).cast(dec)).otherwise(zero))
    val areas = terms.groupBy("bands", "rows_per_band")
      .agg(
        round(sum("_fp").cast("double") * (1.0 / gridSteps), 6).as("fp_area"),
        round(sum("_fn").cast("double") * (1.0 / gridSteps), 6).as("fn_area"))
      .withColumn("est_threshold",
        round(pow(lit(1.0) / col("bands").cast("double"),
          lit(1.0) / col("rows_per_band").cast("double")), 6))
      .withColumn("total_err", round(col("fp_area") + col("fn_area"), 6))
    areas.withColumn("is_best",
      row_number().over(org.apache.spark.sql.expressions.Window
        .partitionBy(lit(0)).orderBy(col("total_err"), col("bands"))) === 1)
      .select("bands", "rows_per_band", "est_threshold", "fp_area",
        "fn_area", "total_err", "is_best")
  }
}
