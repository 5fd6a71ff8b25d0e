// Plan-quality audit: prints formatted physical plans for the queries whose
// shape matters at 100 TB. Run: sbt "runMain graft.tools.ExplainPlans"
package graft.tools

import org.apache.spark.sql.SparkSession

object ExplainPlans {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val interesting = Seq(
      "q_scan_project", "q_filter_pushdown", "q_multi_join_region",
      "q_train_source_join", "q_dedup_exact", "q_dedup_minhash_pairs",
      "q_ann_cosine_topk", "q_ann_lsh_topk", "q_events_windowed",
      "q_topk_pergroup", "q_events_asof", "q_events_sessions",
      "q_dedup_embcos", "q_ts_rolling",
      "q_decontaminate", "q_quality_repetition", "q_pii_scrub",
      "q_seq_pack", "q_top_ngrams",
      "q_tfidf_topterms", "q_bm25_search", "q_corpus_shuffle",
      "q_hash_sample", "q_stratified_sample", "q_domain_mix",
      "q_quantile_filter", "q_dedup_incremental", "q_ann_int8_topk",
      "q_events_range_join",
      // round-12 additions
      "q_readability", "q_pmi_pairs", "q_token_budget",
      "q_embedding_coverage", "q_pack_plan", "q_corpus_overlap",
      "q_mad_outliers", "q_centroid_cos",
      "q_char_entropy", "q_vocab_card", "q_boilerplate_frac",
      "q_c4_filter", "q_emb_stats", "q_kmeans_assign", "q_unimax_alloc",
      "q_lsh_plan", "q_winsorize", "q_temporal_split", "q_vocab_overlap",
      "q_distinct_ngrams", "q_dup_size_card", "q_len_quantiles",
      "q_ks_drift", "q_domain_hhi",
      // round-13 additions
      "q_pair_jaccard_hist", "q_cluster_purity", "q_ngram_novelty",
      "q_corpus_release", "q_pack_plan_bpe", "q_bpe_fertility",
      "q_emb_drift", "q_pq_distortion", "q_int8_distortion",
      "q_lsh_sensitivity", "q_quality_classifier", "q_hll_card",
      "q_contamination_span", "q_lsh_recall_audit", "q_cms_topk",
      "q_length_buckets", "q_classifier_calibration", "q_emb_norm_card",
      "q_join_skew_card", "q_classifier_auc", "q_domain_tail",
      "q_corpus_diff", "q_langid_confusion", "q_ann_recall_card",
      "q_strat_alloc", "q_filter_sweep", "q_gram_entropy",
      "q_salting_plan", "q_dedup_savings", "q_script_shares")
    // q_emb_top_pc is deliberately absent like q_dedup_groups: building
    // it RUNS the moment aggregations and the driver-local iterations,
    // so its "plan" is a LocalTableScan of the finished card — the
    // corpus-pass shape is pinned in PlanAuditSpec on the moment
    // aggregation instead.
    // q_mmr_rerank is deliberately absent for the same reason: entry
    // construction runs candidate generation + the driver-local greedy,
    // so its "plan" is the k-row local result — the corpus-pass shape
    // (broadcast query, TakeOrdered pool) is pinned in PlanAuditSpec on
    // Similarity.mmrCandidates instead.
    // q_dedup_groups is deliberately absent: building its DataFrame RUNS
    // the propagation rounds (eager per-round materialization), so its
    // "plan" is an InMemoryTableScan of the final round — nothing to audit.
    // Same for the round-10 eager entries: the streaming replays
    // (q_events_late_watermark, q_stream_dedup_rearm) drain their stream
    // on construction, and q_cosine_join_rewrite materializes under its
    // conf gate — their shapes are pinned in PlanAuditSpec / in-entry
    // requires instead.
    // trailing args (after the sf dir) select specific entries instead
    val selected = if (args.length > 1) args.drop(1).toSeq else interesting
    selected.foreach { name =>
      println(s"\n========== $name ==========")
      graft.SparkEntry.queries(name)(spark, dir).explain("formatted")
      // entries that persist intermediates (band buckets) must not pin
      // them for the rest of the audit
      graft.llm.PipelineCaches.clear()
    }
    spark.stop()
  }
}
