// Measures the DSL KERNEL LAYER itself, not just the catalog twins it
// wraps: each probe drives a full `COMPUTE ... USING <kernel>` statement
// through StatementRunner (parser -> table inference -> ComputeRegistry
// dispatch -> pipeline-cache tracking), forces the result with a noop
// write, and times it against the equivalent SparkEntry catalog entry in
// the same JVM. The delta is the dispatch overhead (session-state
// resolution, cache reclaim, the join-back of the kernel column) that
// the per-entry bench never sees. Gate: no kernel > 1.3x its twin
// (BASELINE.md records the medians).
// Run: sbt "runMain graft.tools.KernelProbe [samples]"
package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.dml.{ComputeSpec, DmlParser}
import graft.dml.events.EventBus
import graft.dml.runtime.{ComputeRegistry, ModelRegistry, StatementRunner}

object KernelProbe {

  /** (kernel label, COMPUTE statement, catalog twin entry). The twin is
    * the closest catalog operator — same core computation, minus the DSL
    * dispatch; bpe_tokenize's twin trains at the same 8-merge budget the
    * kernel hard-codes. */
  private val probes: Seq[(String, String, String)] = Seq(
    ("minhash_dedup",
      "COMPUTE d FROM table(text) INTO column(dup_group) USING minhash_dedup",
      "q_dedup_groups"),
    ("keep_best_dedup",
      "COMPUTE k FROM table(text) INTO column(is_kept) USING keep_best_dedup",
      "q_dedup_keep_best"),
    ("semantic_dedup",
      "COMPUTE s FROM table(embedding) INTO column(is_semdup) " +
        "USING semantic_dedup",
      "q_dedup_semantic_auto"),
    ("bpe_tokenize",
      "COMPUTE b FROM table(text) INTO column(syms_out) USING bpe_tokenize",
      "q_bpe_tokenize"),
    ("dsir_weights",
      "COMPUTE w FROM table(text, is_en) INTO column(log_w) " +
        "USING dsir_weights",
      "q_dsir_weights"),
    ("ce_delta",
      "COMPUTE c FROM table(text, is_en) INTO column(ced) USING ce_delta",
      "q_ce_delta"),
    ("bloom_decontaminate",
      "COMPUTE b FROM table(text, is_bench) INTO column(contam) " +
        "USING bloom_decontaminate",
      "q_decontaminate_bloom"),
    ("corpus_report",
      "COMPUTE r FROM table(text) INTO column(n_docs) USING corpus_report",
      "q_corpus_report"),
    ("readability",
      "COMPUTE f FROM table(text) INTO column(flesch_k) USING readability",
      "q_readability"),
    ("pmi_pairs",
      "COMPUTE p FROM table(text) INTO column(pmi_k) USING pmi_pairs",
      "q_pmi_pairs"),
    ("token_budget",
      "COMPUTE t FROM table(dom, n_tok) INTO column(tgt) " +
        "USING token_budget",
      "q_token_budget"),
    ("embedding_coverage",
      "COMPUTE e FROM table(embedding) INTO column(norm_h) " +
        "USING embedding_coverage",
      "q_embedding_coverage"),
    ("leakage_split",
      "COMPUTE l FROM table(text) INTO column(split_k) " +
        "USING leakage_split",
      "q_leakage_split"),
    ("pack_plan",
      "COMPUTE p FROM table(text) INTO column(waste) USING pack_plan",
      "q_pack_plan"),
    ("corpus_overlap",
      "COMPUTE o FROM table(text, is_bench) INTO column(est_j) " +
        "USING corpus_overlap",
      "q_corpus_overlap"),
    ("mad_outlier",
      "COMPUTE m FROM table(n_chars) INTO column(rz) USING mad_outlier",
      "q_mad_outliers"),
    ("centroid_cos",
      "COMPUTE c FROM table(label, embedding) INTO column(ccos) " +
        "USING centroid_cos",
      "q_centroid_cos"),
    ("char_entropy",
      "COMPUTE c FROM table(text) INTO column(ent) USING char_entropy",
      "q_char_entropy"),
    ("vocab_card",
      "COMPUTE v FROM table(text) INTO column(slope) USING vocab_card",
      "q_vocab_card"),
    // the catalog twin scores the union+trimmed 120%-corpus; the kernel
    // scores the plain relation — the twin is the CLOSER-shaped bound
    ("boilerplate_frac",
      "COMPUTE b FROM table(text) INTO column(bfrac) " +
        "USING boilerplate_frac",
      "q_boilerplate_frac"),
    // the twin scores the marker-planted 200%-corpus; the kernel scores
    // the plain relation — the twin is the closer-shaped bound
    ("c4_filter",
      "COMPUTE c FROM table(text) INTO column(ok) USING c4_filter",
      "q_c4_filter"),
    ("emb_stats",
      "COMPUTE e FROM table(embedding) INTO column(share) USING emb_stats",
      "q_emb_stats"),
    // the kernel steps the auto-k quantizer (~n/256 cells) vs the twin's
    // fixed 16 IVF seeds — same corpus passes, more centroids
    ("kmeans_assign",
      "COMPUTE k FROM table(embedding) INTO column(cl) USING kmeans_assign",
      "q_kmeans_assign"),
    ("unimax_alloc",
      "COMPUTE u FROM table(lang, n_chars) INTO column(alloc) " +
        "USING unimax_alloc",
      "q_unimax_alloc"),
    ("lsh_plan",
      "COMPUTE l FROM table(text) INTO column(best) USING lsh_plan",
      "q_lsh_plan"),
    ("winsorize",
      "COMPUTE w FROM table(n_chars) INTO column(nc_w) USING winsorize",
      "q_winsorize"),
    ("temporal_split",
      "COMPUTE t FROM table(ts) INTO column(part) USING temporal_split",
      "q_temporal_split"),
    ("vocab_overlap",
      "COMPUTE v FROM table(text, is_bench) INTO column(kl) " +
        "USING vocab_overlap",
      "q_vocab_overlap"),
    ("distinct_ngrams",
      "COMPUTE d FROM table(text) INTO column(ratio) " +
        "USING distinct_ngrams",
      "q_distinct_ngrams"),
    // the kernel runs the card over the raw table; the catalog twin
    // plants extra copies first, so the twin does strictly more work
    ("dup_size_card",
      "COMPUTE d FROM table(text) INTO column(frac) USING dup_size_card",
      "q_dup_size_card"),
    ("grouped_quantiles",
      "COMPUTE g FROM table(lang, n_chars) INTO column(med) " +
        "USING grouped_quantiles",
      "q_len_quantiles"),
    ("emb_top_pc",
      "COMPUTE p FROM table(embedding) INTO column(share) " +
        "USING emb_top_pc",
      "q_emb_top_pc"),
    // the kernel splits by the doc_id-parity flag on the RAW values;
    // the catalog twin also shifts the odd side by +50 — same work
    ("ks_drift",
      "COMPUTE k FROM table(n_chars, is_bench) INTO column(ks) " +
        "USING ks_drift",
      "q_ks_drift"),
    ("domain_hhi",
      "COMPUTE h FROM table(source) INTO column(hhi_idx) " +
        "USING domain_hhi",
      "q_domain_hhi"),
    // round-13: the kernel runs the card over the RAW table while the
    // catalog twin plants trim-mutant copies first (strictly more work
    // on the twin side — the dup_size_card asymmetry)
    ("pair_jaccard_hist",
      "COMPUTE p FROM table(text) INTO column(pair_share) " +
        "USING pair_jaccard_hist",
      "q_pair_jaccard_hist"),
    // kernel seeds = corpus-adaptive semantic cells; twin = the fixed
    // 16 IVF seeds — same assignment/contingency machinery
    ("cluster_purity",
      "COMPUTE c FROM table(embedding, label) INTO column(pur) " +
        "USING cluster_purity",
      "q_cluster_purity"),
    // kernel test side = the is_bench tenth; twin plants copies +
    // rotations (a larger test side — twin does more work)
    ("ngram_novelty",
      "COMPUTE n FROM table(text, is_bench) INTO column(nov) " +
        "USING ngram_novelty",
      "q_ngram_novelty"),
    ("corpus_release",
      "COMPUTE r FROM table(text) INTO column(ratio) " +
        "USING corpus_release",
      "q_corpus_release"),
    ("pack_plan_bpe",
      "COMPUTE p FROM table(text) INTO column(waste) " +
        "USING pack_plan_bpe",
      "q_pack_plan_bpe"),
    ("bpe_fertility",
      "COMPUTE f FROM table(text, lang) INTO column(fert) " +
        "USING bpe_fertility",
      "q_bpe_fertility"),
    // kernel joins the raw table at t=0.8; the twin also plants trim
    // mutants (more qualifying pairs — twin does more work)
    ("jaccard_join_exact",
      "COMPUTE j FROM table(text) INTO column(jac) " +
        "USING jaccard_join_exact",
      "q_jaccard_join_exact"),
    ("int8_distortion",
      "COMPUTE q FROM table(embedding) INTO column(rec_mse) " +
        "USING int8_distortion",
      "q_int8_distortion"),
    ("lsh_recall_audit",
      "COMPUTE a FROM table(text) INTO column(lsh_recall) " +
        "USING lsh_recall_audit",
      "q_lsh_recall_audit"),
    ("contamination_span",
      "COMPUTE c FROM table(text, is_bench) INTO column(span) " +
        "USING contamination_span",
      "q_contamination_span"),
    ("script_shares",
      "COMPUTE c FROM table(text) INTO column(dmg) USING script_shares",
      "q_script_shares"),
    ("gram_entropy",
      "COMPUTE g FROM table(text) INTO column(hc) USING gram_entropy",
      "q_gram_entropy"),
    ("filter_sweep",
      "COMPUTE f FROM table(text) INTO column(tok_share) " +
        "USING filter_sweep",
      "q_filter_sweep"),
    ("strat_alloc",
      "COMPUTE a FROM table(source) INTO column(keep) " +
        "USING strat_alloc",
      "q_strat_alloc"),
    ("langid_confusion",
      "COMPUTE l FROM table(text, lang) INTO column(cell_share) " +
        "USING langid_confusion",
      "q_langid_confusion"),
    ("dedup_savings",
      "COMPUTE d FROM table(text) INTO column(sfrac) " +
        "USING dedup_savings",
      "q_dedup_savings"),
    ("corpus_diff",
      "COMPUTE d FROM table(text, is_bench) INTO column(tdelta) " +
        "USING corpus_diff",
      "q_corpus_diff"),
    ("domain_tail",
      "COMPUTE d FROM table(text, source) INTO column(dp90) " +
        "USING domain_tail",
      "q_domain_tail"),
    ("salting_plan",
      "COMPUTE p FROM table(user_id) INTO column(salt_f) " +
        "USING salting_plan",
      "q_salting_plan"),
    ("join_skew",
      "COMPUTE j FROM table(user_id) INTO column(share) " +
        "USING join_skew",
      "q_join_skew_card"),
    ("emb_norm_card",
      "COMPUTE e FROM table(embedding) INTO column(mnorm) " +
        "USING emb_norm_card",
      "q_emb_norm_card"),
    ("mmr_rerank",
      "COMPUTE m FROM table(embedding) INTO column(mmr) " +
        "USING mmr_rerank",
      "q_mmr_rerank"),
    ("length_buckets",
      "COMPUTE l FROM table(text) INTO column(wfrac) " +
        "USING length_buckets",
      "q_length_buckets"),
    ("cms_topk",
      "COMPUTE c FROM table(text) INTO column(est) USING cms_topk",
      "q_cms_topk"),
    ("hll_card",
      "COMPUTE h FROM table(text, source) INTO column(est) " +
        "USING hll_card",
      "q_hll_card"),
    ("classifier_auc",
      "COMPUTE a FROM table(text, is_en) INTO column(auc) " +
        "USING classifier_auc",
      "q_classifier_auc"),
    ("classifier_calibration",
      "COMPUTE c FROM table(text, is_en) INTO column(ece) " +
        "USING classifier_calibration",
      "q_classifier_calibration"),
    ("logistic_quality",
      "COMPUTE q FROM table(text, is_en) INTO column(lq_score) " +
        "USING logistic_quality",
      "q_quality_classifier"),
    // kernel seeds from the 16 smallest doc_ids; the twin uses the 16
    // pinned pq seed ids — same encode + fold work
    ("pq_distortion",
      "COMPUTE q FROM table(embedding) INTO column(rec_mse) " +
        "USING pq_distortion",
      "q_pq_distortion"),
    // the kernel splits the raw table by id parity; the twin also
    // plants the +0.5 dim-3 shift on the odd side — same moment work
    ("emb_drift",
      "COMPUTE d FROM table(embedding, is_b) INTO column(zed) " +
        "USING emb_drift",
      "q_emb_drift"))

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val samples = if (args.nonEmpty) args(0).toInt else 3
    // trailing args select specific kernels by label
    val selected =
      if (args.length > 1) probes.filter(p => args.drop(1).contains(p._1))
      else probes
    graft.Tables.register(spark, dir)
    // semantic_dedup needs a doc_id-KEYED embedding relation; the fixture
    // embeddings table is vec_id-keyed, so register the keyed view the
    // runner's temp-view inference (fixtures first, then views) resolves
    import org.apache.spark.sql.functions.col
    spark.table("embeddings")
      .select(col("vec_id").as("doc_id"), col("embedding"))
      .createOrReplaceTempView("emb_docs")
    // the two-corpus kernels take their target/benchmark side as an
    // in-relation flag column; mirror the catalog twins' constructions
    // (q_dsir_weights/q_ce_delta: lang = en; q_decontaminate_bloom:
    // doc_id % 10 = 0)
    spark.table("documents")
      .withColumn("is_en", col("lang") === "en")
      .withColumn("is_bench", col("doc_id") % 10 === 0)
      .createOrReplaceTempView("flagged_docs")
    // token_budget needs a (domain, token_count) relation; mirror the
    // q_token_budget catalog construction (doc_id-mod domains, whitespace
    // token counts)
    import org.apache.spark.sql.functions.{coalesce, expr, lit, size, split}
    spark.table("documents")
      .withColumn("dom", expr("CASE WHEN doc_id % 7 = 0 THEN 'rare' " +
        "WHEN doc_id % 3 = 0 THEN 'mid' ELSE 'common' END"))
      .withColumn("n_tok", size(split(coalesce(col("text"), lit("")), " ")))
      .createOrReplaceTempView("budget_docs")
    // centroid_cos needs a (label, embedding) relation keyed by doc_id
    spark.table("embeddings")
      .select(col("vec_id").as("doc_id"), col("label"), col("embedding"))
      .createOrReplaceTempView("emb_label_docs")
    // emb_drift / cluster_purity need flagged/labelled embedding views
    spark.table("embeddings")
      .select(col("vec_id").as("doc_id"), col("embedding"), col("label"),
        (col("vec_id") % 2 === 1).as("is_b"))
      .createOrReplaceTempView("drift_embs")
    val base = java.nio.file.Files
      .createTempDirectory("graft_kernel_probe").toString
    val runner = new StatementRunner(spark,
      new ModelRegistry(spark, s"$base/registry"),
      new EventBus(spark, s"$base/events"))

    def force(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    def timed(body: => Unit): Double = {
      spark.catalog.clearCache()
      graft.llm.PipelineCaches.clear()
      val t0 = System.nanoTime()
      body
      (System.nanoTime() - t0) / 1e9
    }

    def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)

    var worst = 0.0
    for ((label, dml, twin) <- selected) {
      val spec = DmlParser.parse(dml).asInstanceOf[ComputeSpec]
      val twinFn = graft.SparkEntry.queries(twin)
      // INTERLEAVE kernel/twin samples: running all kernel samples first
      // made the kernel side absorb the whole JIT/codegen warmup and the
      // twin ride warm — measured up to +0.3s of pure warmup skew on
      // sub-second entries, which a ratio gate misreads as dispatch cost
      val kTimes = scala.collection.mutable.ArrayBuffer.empty[Double]
      val tTimes = scala.collection.mutable.ArrayBuffer.empty[Double]
      (1 to samples).foreach { _ =>
        kTimes += timed {
          force(runner.run(spec).data.getOrElse(
            sys.error(s"kernel $label returned no relation")))
          ComputeRegistry.reclaimScheduled(spec.name)
        }
        tTimes += timed(force(twinFn(spark, dir)))
      }
      val (km, tm) = (median(kTimes.toSeq), median(tTimes.toSeq))
      val ratio = km / tm
      worst = math.max(worst, ratio)
      println(f"[kernelprobe] $label%-18s kernel ${km}%.3fs " +
        f"(${kTimes.map(t => f"$t%.2f").mkString(" ")})  " +
        f"twin $twin%-22s ${tm}%.3fs " +
        f"(${tTimes.map(t => f"$t%.2f").mkString(" ")})  " +
        f"ratio $ratio%.2fx delta ${km - tm}%.3fs")
    }
    println(f"[kernelprobe] worst kernel/twin ratio $worst%.2fx " +
      s"(gate: ratio <= 1.30x OR delta <= 0.25s — sub-second twins " +
      s"saturate a pure ratio gate on constant dispatch/setup cost)")
    spark.stop()
  }
}
