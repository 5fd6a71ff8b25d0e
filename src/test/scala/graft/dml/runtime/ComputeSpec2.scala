package graft.dml.runtime

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.dml.{ComputeSpec, DmlParser}

/** ml_register_compute runtime: one-shot kernels, custom registration, and
  * the EVERY-k-TICKS Structured Streaming scheduler. */
class ComputeSpec2 extends AnyFunSuite {

  private def spark = SparkTestSession.withTables()

  private def parse(text: String): ComputeSpec =
    DmlParser.parse(text).asInstanceOf[ComputeSpec]

  test("one-shot vector_add over lineitem") {
    val s = spark
    val spec = parse(
      "COMPUTE qsum FROM table(l_quantity, l_tax) INTO column(qsum) USING vector_add")
    val out = ComputeRegistry.runOnce(s, spec, "lineitem")
    assert(out.columns.contains("qsum"))
    val row = out.select(sum(abs(col("qsum") - (col("l_quantity") + col("l_tax")))))
      .collect()(0)
    assert(row.getDouble(0) == 0.0)
  }

  test("output column defaults to the job name") {
    val s = spark
    val spec = parse("COMPUTE risk FROM table(value) USING sigmoid")
    val out = ComputeRegistry.runOnce(s, spec, "events")
    assert(out.columns.contains("risk"))
  }

  test("custom kernel registration") {
    val s = spark
    ComputeRegistry.register("double_it", cols => cols.head * 2)
    val spec = parse(
      "COMPUTE d FROM table(l_quantity) INTO column(dq) USING double_it")
    val out = ComputeRegistry.runOnce(s, spec, "lineitem")
    val bad = out.filter(col("dq") =!= col("l_quantity") * 2).count()
    assert(bad == 0)
  }

  test("unknown kernel raises") {
    val s = spark
    val spec = parse("COMPUTE x FROM table(value) USING warp_drive")
    val e = intercept[IllegalArgumentException] {
      ComputeRegistry.runOnce(s, spec, "events")
    }
    assert(e.getMessage.contains("unknown kernel"))
  }

  test("missing inputs raises") {
    val s = spark
    val spec = parse("COMPUTE x USING vector_add")
    val e = intercept[IllegalArgumentException] {
      ComputeRegistry.runOnce(s, spec, "events")
    }
    assert(e.getMessage.contains("no input columns"))
  }

  test("EVERY k TICKS schedules a streaming query that refreshes the view") {
    val s = spark
    val spec = parse(
      "COMPUTE ticker FROM table(value) INTO column(scored) " +
        "EVERY 2 TICKS USING sigmoid")
    val q = ComputeRegistry.schedule(s, spec, "events", tickMs = 100L)
    try {
      // wait for at least one micro-batch to run the kernel
      val deadline = System.currentTimeMillis() + 15000
      var ok = false
      while (!ok && System.currentTimeMillis() < deadline) {
        Thread.sleep(200)
        ok = s.catalog.tableExists("ticker_out")
      }
      assert(ok, "tick scheduler never materialized ticker_out")
      assert(s.table("ticker_out").columns.contains("scored"))
      assert(q.isActive)
    } finally q.stop()
  }

  test("EVERY k TICKS works with a table kernel and reclaims its caches") {
    val s = spark
    val spec = parse(
      "COMPUTE stream_dedup FROM table(text) INTO column(dup_group) " +
        "EVERY 2 TICKS USING minhash_dedup")
    val q = ComputeRegistry.schedule(s, spec, "documents", tickMs = 100L)
    try {
      val deadline = System.currentTimeMillis() + 30000
      var ok = false
      while (!ok && System.currentTimeMillis() < deadline) {
        Thread.sleep(200)
        ok = s.catalog.tableExists("stream_dedup_out")
      }
      assert(ok, "tick scheduler never materialized stream_dedup_out")
      assert(s.table("stream_dedup_out").columns.contains("dup_group"))
    } finally {
      q.stop()
      // batches track into per-query scopes now; release the final one
      ComputeRegistry.reclaimScheduled("stream_dedup")
      graft.llm.PipelineCaches.clear()
    }
  }

  test("minhash_dedup table kernel groups planted copies via the DSL") {
    val s = spark
    val d = s.table("documents").select("doc_id", "text")
    d.unionAll(d.filter(col("doc_id") < 5)
        .select((col("doc_id") + 100000L).as("doc_id"), col("text")))
      .createOrReplaceTempView("docs_with_copies")
    val spec = parse(
      "COMPUTE dedup FROM table(text) INTO column(dup_group) USING minhash_dedup")
    val out = ComputeRegistry.runOnce(s, spec, "docs_with_copies")
    assert(out.columns.contains("dup_group"))
    val g = out.select("doc_id", "dup_group").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0L until 5L).foreach(id => assert(g(id + 100000L) == g(id)))
  }

  test("exact_dedup and simhash table kernels append their columns") {
    val s = spark
    val exact = ComputeRegistry.runOnce(s,
      parse("COMPUTE e FROM table(text) INTO column(is_dup) USING exact_dedup"),
      "documents")
    assert(exact.columns.contains("is_dup"))
    assert(exact.filter(col("is_dup")).count() == 0) // corpus has no exact dups
    val sh = ComputeRegistry.runOnce(s,
      parse("COMPUTE s FROM table(text) INTO column(sig) USING simhash"),
      "documents")
    assert(sh.select(length(col("sig"))).distinct().collect()
      .map(_.getInt(0)).toSeq == Seq(64))
  }

  test("span_dedup table kernel attaches cleaned text via the DSL") {
    val s = spark
    import s.implicits._
    Seq(
      (1L, "x y z x y z a b c"),
      (2L, "x y z q r s"),
      (3L, "solo words only here!")).toDF("doc_id", "text")
      .createOrReplaceTempView("span_docs")
    val out = ComputeRegistry.runOnce(s,
      parse("COMPUTE clean FROM table(text) INTO column(clean_text) " +
        "USING span_dedup"),
      "span_docs")
    assert(out.count() == 3) // row set preserved
    val m = out.select("doc_id", "clean_text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(m(1L) == "x y z x y z a b c") // keeper keeps everything
    assert(m(2L) == "q r s")             // shared segment removed
  }

  test("chunk_docs table kernel expands each doc into sliding windows") {
    val s = spark
    val out = ComputeRegistry.runOnce(s,
      parse("COMPUTE ch FROM table(text) INTO column(chunk) USING chunk_docs"),
      "documents")
    val nDocs = s.table("documents").count()
    assert(out.count() > nDocs) // relation-expanding: > one row per doc
    assert(out.columns.toSeq ==
      Seq("doc_id", "chunk_idx", "chunk_start", "n_tokens", "chunk"))
    // chunk 0 of every doc starts at token 0
    assert(out.filter(col("chunk_idx") === 0).count() == nDocs)
  }

  test("gopher_filter and lm_perplexity table kernels attach quality " +
    "verdicts via the DSL") {
    val s = spark
    val keep = ComputeRegistry.runOnce(s,
      parse("COMPUTE g FROM table(text) INTO column(keep) " +
        "USING gopher_filter"),
      "documents")
    assert(keep.columns.contains("keep"))
    assert(keep.count() == s.table("documents").count())
    val ppl = ComputeRegistry.runOnce(s,
      parse("COMPUTE p FROM table(text) INTO column(ppl) " +
        "USING lm_perplexity"),
      "documents")
    assert(ppl.count() == s.table("documents").count())
    // the fixture corpus has multi-token docs: perplexities exist and are
    // positive where defined
    val vals = ppl.select("ppl").na.drop().collect().map(_.getDouble(0))
    assert(vals.nonEmpty && vals.forall(_ > 0))
  }

  test("domain_cap table kernel shrinks each source to its 10 smallest " +
    "doc_ids") {
    val s = spark
    val out = ComputeRegistry.runOnce(s,
      parse("COMPUTE dc FROM table(source) INTO column(cap_rank) " +
        "USING domain_cap"),
      "documents")
    val perSource = out.groupBy("source")
      .agg(count(lit(1)).as("n"), max("doc_id").as("mx"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(perSource.forall(_._1 == 10), "exactly 10 docs kept per source")
    // keeps the smallest ids: every kept id is below the source's
    // 11th-smallest in the raw table
    val truth = s.table("documents")
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("source")
          .orderBy("doc_id")))
      .filter(col("rn") <= 10)
      .agg(sum("doc_id")).collect().head.getLong(0)
    assert(out.agg(sum("doc_id")).collect().head.getLong(0) == truth)
  }

  test("semantic_dedup table kernel flags planted embedding copies") {
    val s = spark
    import s.implicits._
    val e = s.table("embeddings").select("vec_id", "embedding")
      .filter(col("vec_id") < 100)
    e.unionAll(e.filter(col("vec_id") < 5)
        .select((col("vec_id") + 100000L).as("vec_id"),
          col("embedding")))
      .withColumnRenamed("vec_id", "doc_id")
      .createOrReplaceTempView("emb_with_copies")
    val out = ComputeRegistry.runOnce(s,
      parse("COMPUTE sd FROM table(embedding) INTO column(is_semdup) " +
        "USING semantic_dedup"),
      "emb_with_copies")
    val flagged = out.filter(col("is_semdup")).collect().map(_.getLong(0))
    assert(flagged.sorted.toSeq ==
      (0L until 5L).map(_ + 100000L).sorted.toSeq,
      s"exactly the planted copies must be flagged: ${flagged.toSeq}")
  }

  test("semantic_dedup kernel scales its cell count with the corpus") {
    val s = spark
    // seed count = autoCellCount(n), not a constant: 500 fixture vectors
    // → 2 cells; a 10× corpus must pick ~10× the cells (occupancy pinned)
    val embs = s.table("embeddings").select("vec_id", "embedding")
    val seeds = ComputeRegistry.semanticSeeds(embs)
    assert(seeds.length ==
      graft.llm.Similarity.autoCellCount(embs.count()))
    assert(seeds.length > 1, "500 vectors must not collapse to one cell")
    // and the seeds are the deterministic smallest ids
    assert(seeds == seeds.sorted && seeds.head ==
      embs.agg(min("vec_id")).collect().head.getLong(0))
    val k80k = graft.llm.Similarity.autoCellCount(80000)
    assert(k80k == 313, s"80k vectors → k≈n/256, got $k80k")
  }

  test("table kernels demand a doc_id key with a clear error") {
    val s = spark
    val spec = parse(
      "COMPUTE x FROM table(o_comment) INTO column(sig) USING simhash")
    val e = intercept[IllegalArgumentException] {
      ComputeRegistry.runOnce(s, spec, "orders")
    }
    assert(e.getMessage.contains("doc_id"))
  }

  test("pii_scrub column kernel redacts through the DSL") {
    val s = spark
    import s.implicits._
    Seq((1L, "mail a@b.co phone 555-010-9988"))
      .toDF("doc_id", "text").createOrReplaceTempView("pii_docs")
    val out = ComputeRegistry.runOnce(s,
      parse("COMPUTE p FROM table(text) INTO column(clean) USING pii_scrub"),
      "pii_docs")
    assert(out.select("clean").collect()(0).getString(0)
      == "mail <EMAIL> phone <PHONE>")
  }

  test("text-analysis column kernels surface TextOps through the DSL") {
    val s = spark
    val out = ComputeRegistry.runOnce(s,
      parse("COMPUTE q FROM table(text) INTO column(quality) USING quality_score"),
      "documents")
    val stats = out.agg(min("quality"), max("quality")).collect()(0)
    assert(stats.getDouble(0) >= 0.0 && stats.getDouble(1) <= 1.0)
    val tc = ComputeRegistry.runOnce(s,
      parse("COMPUTE t FROM table(text) INTO column(n_tokens) USING token_count"),
      "documents")
    assert(tc.filter(col("n_tokens") <= 0).count() == 0)
  }

  test("relevance and sampling kernels surface through the DSL") {
    val s = spark
    // rank-1 TF-IDF term attaches per doc
    val tt = ComputeRegistry.runOnce(s,
      parse("COMPUTE tt FROM table(text) INTO column(top_term) USING tfidf_top_term"),
      "documents")
    assert(tt.count() == s.table("documents").count())
    assert(tt.filter(col("top_term").isNull).count() == 0)
    // shuffle positions are an exact permutation
    val sh = ComputeRegistry.runOnce(s,
      parse("COMPUTE sh FROM table(doc_id) INTO column(pos) USING corpus_shuffle"),
      "documents")
    val n = sh.count()
    assert(sh.agg(min("pos"), max("pos"), countDistinct("pos")).collect()(0)
      .toSeq == Seq(1L, n, n))
    // percent_rank lands in [0,1] and is monotone in the value
    val pr = ComputeRegistry.runOnce(s,
      parse("COMPUTE pr FROM table(n_chars) INTO column(pr) USING percent_rank"),
      "documents")
    assert(pr.filter(col("pr") < 0 || col("pr") > 1).count() == 0)
    assert(pr.groupBy("n_chars").agg(countDistinct("pr").as("k"))
      .filter(col("k") =!= 1).count() == 0, "ties must share a rank")
    // hash_bucket column kernel: buckets in [0,100), stable across calls
    val hb = ComputeRegistry.runOnce(s,
      parse("COMPUTE hb FROM table(doc_id) INTO column(bucket) USING hash_bucket"),
      "documents")
    assert(hb.filter(col("bucket") < 0 || col("bucket") >= 100).count() == 0)
  }

  test("ccnet_bucket, weighted_sample and rp_project kernels reach the " +
    "new pipeline operators from the DSL") {
    val s = spark
    // ccnet: every multi-token doc gets a bucket, all three appear
    val cb = ComputeRegistry.runOnce(s,
      parse("COMPUTE cb FROM table(text, lang) INTO column(bucket) " +
        "USING ccnet_bucket"),
      "documents")
    assert(cb.count() == s.table("documents").count())
    val buckets = cb.select("bucket").na.drop().distinct()
      .collect().map(_.getString(0)).toSet
    assert(buckets == Set("head", "middle", "tail"))
    // weighted sample: exactly 50 winners, rank column attached
    val ws = ComputeRegistry.runOnce(s,
      parse("COMPUTE ws FROM table(n_chars) INTO column(sel_rank) " +
        "USING weighted_sample"),
      "documents")
    assert(ws.count() == 50)
    assert(ws.select("sel_rank").collect().map(_.getInt(0)).sorted.toSeq ==
      (1 to 50))
    // bpe_token_count: fewer subword tokens than chars+markers, more
    // than words — the learned merges genuinely compress
    val bt = ComputeRegistry.runOnce(s,
      parse("COMPUTE bt FROM table(text) INTO column(n_bpe) " +
        "USING bpe_token_count"),
      "documents")
    assert(bt.count() == s.table("documents").count())
    val sums = bt.agg(sum(col("n_bpe")),
      sum(size(split(col("text"), " "))),
      sum(length(col("text")))).collect().head
    assert(sums.getLong(0) > sums.getLong(1),
      "subword tokens must outnumber whole words")
    assert(sums.getLong(0) < sums.getLong(2),
      "8 merges must compress below character count")
    // rp_project: 16-dim sketch per embedding, no row change
    s.table("embeddings").withColumnRenamed("vec_id", "doc_id")
      .createOrReplaceTempView("emb_docs")
    val rp = ComputeRegistry.runOnce(s,
      parse("COMPUTE rp FROM table(embedding) INTO column(sketch) " +
        "USING rp_project"),
      "emb_docs")
    assert(rp.count() == s.table("embeddings").count())
    assert(rp.select(size(col("sketch"))).distinct().collect()
      .map(_.getInt(0)).toSeq == Seq(16))
  }

  test("bpe_token_count clamps the merge budget to what the relation " +
    "sustains instead of raising") {
    val s = spark
    import s.implicits._
    // two single-char words: one merge ("a_" after 'a'+'_') per word at
    // most — nowhere near the kernel's 8-round budget
    Seq((1L, "a b a"), (2L, "b a b")).toDF("doc_id", "text")
      .createOrReplaceTempView("tiny_docs")
    val out = ComputeRegistry.runOnce(s,
      parse("COMPUTE bt FROM table(text) INTO column(n_bpe) " +
        "USING bpe_token_count"),
      "tiny_docs")
    assert(out.count() == 2)
    // fully merged: every word collapses to one symbol -> 3 tokens/doc
    assert(out.select("n_bpe").collect().map(_.getLong(0)).toSeq ==
      Seq(3L, 3L))
  }

  test("hybrid_rrf, containment and cluster_balanced_sample kernels " +
    "reach the round-10 operators from the DSL") {
    val s = spark
    // a relation carrying BOTH text and embedding (fixture contract:
    // embedding vec_id = doc_id)
    s.table("documents").join(
      s.table("embeddings"),
      col("doc_id") === col("vec_id"))
      .drop("vec_id").createOrReplaceTempView("doc_embs")
    val nDocs = s.table("doc_embs").count()
    // hybrid_rrf: every input row preserved, fused ranks are a prefix
    // permutation (1..n_retrieved, n_retrieved <= 20), rest NULL
    val hr = ComputeRegistry.runOnce(s,
      parse("COMPUTE hr FROM table(text, embedding) INTO column(rrf_rank) " +
        "USING hybrid_rrf"),
      "doc_embs")
    assert(hr.count() == nDocs)
    val ranks = hr.select("rrf_rank").na.drop().collect()
      .map(_.getInt(0)).sorted.toSeq
    assert(ranks.nonEmpty && ranks.last <= 20)
    assert(ranks == (1 to ranks.length))
    // containment: every input row preserved; scores live in [0, 1]
    val ct = ComputeRegistry.runOnce(s,
      parse("COMPUTE ct FROM table(text) INTO column(containment) " +
        "USING containment"),
      "doc_embs")
    assert(ct.count() == nDocs)
    assert(ct.filter(col("containment") < 0 || col("containment") > 1)
      .count() == 0)
    // cluster_balanced_sample: relation-shrinking, <= 10 rows per cell,
    // within-cell ranks are 1..k
    val cbs = ComputeRegistry.runOnce(s,
      parse("COMPUTE cbs FROM table(embedding) INTO column(cell_rank) " +
        "USING cluster_balanced_sample"),
      "doc_embs")
    assert(cbs.count() <= nDocs && cbs.count() > 0)
    // ranks 1..cap only; the per-cell cap itself is pinned by the
    // operator's own oracle entry (q_cluster_balanced_sample)
    assert(cbs.filter(col("cell_rank") < 1 || col("cell_rank") > 10)
      .count() == 0)
    // temperature_mix: every row preserved, factor attached per domain;
    // within a domain the factor is constant and positive
    val tm = ComputeRegistry.runOnce(s,
      parse("COMPUTE tm FROM table(source) INTO column(mix_factor) " +
        "USING temperature_mix"),
      "doc_embs")
    assert(tm.count() == nDocs)
    assert(tm.filter(col("mix_factor") <= 0).count() == 0)
    assert(tm.filter(col("mix_factor").isNull).count() == 0)
    assert(tm.groupBy("source").agg(countDistinct("mix_factor").as("k"))
      .filter(col("k") =!= 1).count() == 0)
    // NULL domains are a first-class mixture group, not silently-NULL
    // factors (the null-safe join contract)
    s.table("doc_embs")
      .withColumn("source",
        when(col("doc_id") % 5 === 0, lit(null)).otherwise(col("source")))
      .createOrReplaceTempView("doc_embs_nulls")
    val tmN = ComputeRegistry.runOnce(s,
      parse("COMPUTE tm FROM table(source) INTO column(mix_factor) " +
        "USING temperature_mix"),
      "doc_embs_nulls")
    assert(tmN.filter(col("source").isNull).count() > 0)
    assert(tmN.filter(col("mix_factor").isNull).count() == 0,
      "NULL-domain rows must carry the NULL group's factor")
    // lang_mixture: every row preserved with a non-NULL boolean flag
    // (the monolingual fixture never mixes)
    val lm = ComputeRegistry.runOnce(s,
      parse("COMPUTE lm FROM table(text) INTO column(mixed) " +
        "USING lang_mixture"),
      "doc_embs")
    assert(lm.count() == nDocs)
    assert(lm.filter(col("mixed").isNull).count() == 0)
    assert(lm.filter(col("mixed")).count() == 0,
      "the monolingual fixture must never flag mixture")
    // keep_best_dedup: every row preserved with a NON-NULL boolean keep
    // flag, at least one doc kept (per-group survival — every group
    // keeps exactly one member — is pinned on visible groups in
    // CurationSpec's keepBestPerGroup case)
    val kb = ComputeRegistry.runOnce(s,
      parse("COMPUTE kb FROM table(text) INTO column(keep) " +
        "USING keep_best_dedup"),
      "doc_embs")
    assert(kb.count() == nDocs)
    assert(kb.filter(col("keep").isNull).count() == 0)
    val nKept = kb.filter(col("keep")).count()
    assert(nKept > 0 && nKept <= nDocs)
    // bpe_tokenize: relation-expanding — one row per distinct trainable
    // word; every word's symbols re-concatenate to word + "_"
    val bt = ComputeRegistry.runOnce(s,
      parse("COMPUTE bt FROM table(text) INTO column(syms) " +
        "USING bpe_tokenize"),
      "doc_embs")
    assert(bt.count() > 0)
    assert(bt.filter(
      regexp_replace(col("syms"), "  ", "") =!= concat(col("word"), lit("_")))
      .count() == 0, "symbolization must conserve character mass")
  }

  test("dsir_weights / ce_delta / bloom_decontaminate / corpus_report " +
    "kernels reach the round-12 curation operators from the DSL") {
    val s = spark
    // flag one source's docs as the in-relation target/benchmark side
    s.table("documents")
      .withColumn("is_wiki", col("source") === "src1")
      .createOrReplaceTempView("flagged_docs")
    val nDocs = s.table("flagged_docs").count()
    val nWiki = s.table("flagged_docs").filter(col("is_wiki")).count()
    assert(nWiki > 0 && nWiki < nDocs, "fixture must have both sides")
    // dsir_weights: rows preserved; weights exist wherever tokens do;
    // target docs average HIGHER target-likeness than the rest
    val dw = ComputeRegistry.runOnce(s,
      parse("COMPUTE dw FROM table(text, is_wiki) INTO column(log_w) " +
        "USING dsir_weights"),
      "flagged_docs")
    assert(dw.count() == nDocs)
    assert(dw.filter(col("log_w").isNull && length(col("text")) > 0)
      .count() == 0)
    val meanTgt = dw.filter(col("is_wiki"))
      .agg(avg("log_w")).collect()(0).getDouble(0)
    val meanRest = dw.filter(!col("is_wiki"))
      .agg(avg("log_w")).collect()(0).getDouble(0)
    assert(meanTgt > meanRest,
      s"target docs must score more target-like ($meanTgt vs $meanRest)")
    // ce_delta: rows preserved; target docs average LOWER (more
    // target-like) cross-entropy difference
    val cd = ComputeRegistry.runOnce(s,
      parse("COMPUTE cd FROM table(text, is_wiki) INTO column(ced) " +
        "USING ce_delta"),
      "flagged_docs")
    assert(cd.count() == nDocs)
    val ceTgt = cd.filter(col("is_wiki"))
      .agg(avg("ced")).collect()(0).getDouble(0)
    val ceRest = cd.filter(!col("is_wiki"))
      .agg(avg("ced")).collect()(0).getDouble(0)
    assert(ceTgt < ceRest,
      s"target docs must read more target-like ($ceTgt vs $ceRest)")
    // bloom_decontaminate: rows preserved, non-NULL boolean; benchmark
    // rows with >= 5 tokens flag themselves (their grams are in the
    // fingerprint by construction — the guaranteed-recall direction)
    val bd = ComputeRegistry.runOnce(s,
      parse("COMPUTE bd FROM table(text, is_wiki) INTO column(contam) " +
        "USING bloom_decontaminate"),
      "flagged_docs")
    assert(bd.count() == nDocs)
    assert(bd.filter(col("contam").isNull).count() == 0)
    assert(bd.filter(col("is_wiki") && !col("contam") &&
      size(split(trim(col("text")), "\\s+")) >= 5).count() == 0,
      "a benchmark doc with a full gram can never miss its own fingerprint")
    // corpus_report: relation-replacing ROLLUP card — grand-total row
    // (NULL, NULL) counts every doc
    val cr = ComputeRegistry.runOnce(s,
      parse("COMPUTE cr FROM table(text) INTO column(n_docs) " +
        "USING corpus_report"),
      "flagged_docs")
    val total = cr.filter(col("lang").isNull && col("source").isNull)
    assert(total.count() == 1)
    assert(total.collect()(0).getAs[Long]("n_docs") == nDocs)
    // contract errors: an all-false flag column refuses loud
    s.table("documents").withColumn("no_tgt", lit(false))
      .createOrReplaceTempView("no_target_docs")
    val err = intercept[IllegalArgumentException] {
      ComputeRegistry.runOnce(s,
        parse("COMPUTE dw FROM table(text, no_tgt) INTO column(w) " +
          "USING dsir_weights"),
        "no_target_docs")
    }
    assert(err.getMessage.contains("no target rows"))
  }

  test("lsh_recall_audit kernel: planted identical pair gives recall 1 " +
    "from the DSL; reserved card names refuse") {
    val s = spark
    import s.implicits._
    Seq((1L, "a b c d e f"), (2L, "a b c d e f"),
      (3L, "q w e r t y u i o p"))
      .toDF("doc_id", "text").createOrReplaceTempView("audit_docs")
    val card = ComputeRegistry.runOnce(s,
      parse("COMPUTE a FROM table(text) INTO column(lsh_recall) " +
        "USING lsh_recall_audit"),
      "audit_docs").collect()(0)
    assert(card.getAs[Long]("n_truth") == 1L &&
      card.getAs[Double]("lsh_recall") == 1.0)
    graft.llm.PipelineCaches.clear()
    val err = intercept[IllegalArgumentException] {
      ComputeRegistry.runOnce(s,
        parse("COMPUTE a FROM table(text) INTO column(n_hit) " +
          "USING lsh_recall_audit"),
        "audit_docs")
    }
    assert(err.getMessage.contains("reserves"))
  }

  test("contamination_span kernel: a verbatim planted copy spans its " +
    "whole doc from the DSL; train rows stay NULL") {
    val s = spark
    import s.implicits._
    Seq(
      (1L, "a b c d e f g h i j", false),  // train
      (2L, "a b c d e f g h i j", true),   // verbatim copy -> span 10
      (3L, "q w e r t y u i", true))       // disjoint -> 0
      .toDF("doc_id", "text", "is_test")
      .createOrReplaceTempView("span_docs")
    val out = ComputeRegistry.runOnce(s,
      parse("COMPUTE c FROM table(text, is_test) INTO column(span) " +
        "USING contamination_span"),
      "span_docs")
      .collect().map(r => r.getLong(0) -> Option(r.getAs[Any]("span"))).toMap
    assert(out(1L).isEmpty, "train rows keep NULL span")
    assert(out(2L).contains(10L))
    assert(out(3L).contains(0L))
    graft.llm.PipelineCaches.clear()
  }

  test("emb_norm_card kernel emits the norm-health card from the DSL") {
    val s = spark
    s.table("embeddings")
      .select(col("vec_id").as("doc_id"), col("embedding"))
      .createOrReplaceTempView("emb_docs_norm")
    val twin = graft.llm.Similarity.embNormCard(s.table("embeddings"))
      .collect()(0)
    graft.llm.PipelineCaches.clear()
    val card = ComputeRegistry.runOnce(s,
      parse("COMPUTE e FROM table(embedding) INTO column(mnorm) " +
        "USING emb_norm_card"),
      "emb_docs_norm").collect()(0)
    assert(card.getAs[Long]("n_vecs") == twin.getAs[Long]("n_vecs"))
    assert(card.getAs[Double]("mnorm") == twin.getAs[Double]("mean_norm"))
    assert(card.getAs[Double]("p50") == twin.getAs[Double]("p50"))
    graft.llm.PipelineCaches.clear()
  }

  test("mmr_rerank kernel emits the 5-pick greedy card from the DSL and " +
    "matches the catalog twin") {
    val s = spark
    s.table("embeddings")
      .select(col("vec_id").as("doc_id"), col("embedding"))
      .createOrReplaceTempView("emb_docs_mmr")
    val twin = graft.llm.Similarity
      .mmrRerank(s.table("embeddings"), queryId = 0L, k = 5, pool = 16)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(3)))
    graft.llm.PipelineCaches.clear()
    val k = ComputeRegistry.runOnce(s,
      parse("COMPUTE m FROM table(embedding) INTO column(mmr) " +
        "USING mmr_rerank"),
      "emb_docs_mmr")
    val got = k.orderBy("rank").collect()
      .map(r => (r.getAs[Int]("rank"), r.getAs[Long]("vec_id"),
        r.getAs[Double]("mmr")))
    assert(got.toSeq == twin.toSeq,
      "kernel greedy card must equal the catalog twin")
    assert(got.length == 5 && got.map(_._3).sliding(2)
      .forall(p => p(0) >= p(1) || p.length < 2),
      "mmr scores are non-increasing down the greedy ranks")
    graft.llm.PipelineCaches.clear()
  }

  test("salting_plan kernel emits integer salt factors from the DSL") {
    val s = spark
    val twin = graft.plans.JoinSkew.saltingPlan(
        s.table("events"), s.table("events"), "user_id", 50000L)
      .collect().map(r => r.getLong(0) -> r.getLong(4)).toMap
    val k = ComputeRegistry.runOnce(s,
      parse("COMPUTE p FROM table(user_id) INTO column(salt_f) " +
        "USING salting_plan"),
      "events")
      .collect().map(r => r.getAs[Long]("key") ->
        r.getAs[Long]("salt_f")).toMap
    assert(k == twin)
  }

  test("join_skew kernel emits the self-join skew card from the DSL") {
    val s = spark
    val twin = graft.plans.JoinSkew.joinSkewCard(
        s.table("events"), s.table("events"), "user_id")
      .collect().map(r => Option(r.get(0)) ->
        r.getAs[Long]("out_rows")).toMap
    val k = ComputeRegistry.runOnce(s,
      parse("COMPUTE j FROM table(user_id) INTO column(share) " +
        "USING join_skew"),
      "events")
      .collect().map(r => Option(r.get(0)) ->
        r.getAs[Long]("out_rows")).toMap
    assert(k == twin)
    val err = intercept[IllegalArgumentException] {
      ComputeRegistry.runOnce(s,
        parse("COMPUTE j FROM table(user_id) INTO column(out_rows) " +
          "USING join_skew"),
        "events")
    }
    assert(err.getMessage.contains("reserves"))
  }

  test("length_buckets kernel reaches the batching plan from the DSL") {
    val s = spark
    val twin = graft.llm.TextOps.lengthBucketPlan(s.table("documents"))
      .collect().map(r => Option(r.get(0)) -> r.getLong(3)).toMap
    val k = ComputeRegistry.runOnce(s,
      parse("COMPUTE l FROM table(text) INTO column(wfrac) " +
        "USING length_buckets"),
      "documents")
      .collect().map(r => Option(r.get(0)) ->
        r.getAs[Long]("padded_tokens")).toMap
    assert(k == twin)
    val err = intercept[IllegalArgumentException] {
      ComputeRegistry.runOnce(s,
        parse("COMPUTE l FROM table(text) INTO column(n_docs) " +
          "USING length_buckets"),
        "documents")
    }
    assert(err.getMessage.contains("reserves"))
  }

  test("cms_topk kernel reaches the sketch card from the DSL and " +
    "matches the catalog twin") {
    val s = spark
    val twin = graft.llm.TextOps.cmsTopK(s.table("documents"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val k = ComputeRegistry.runOnce(s,
      parse("COMPUTE c FROM table(text) INTO column(est) USING cms_topk"),
      "documents")
      .orderBy(col("n_exact").desc, col("token").asc).collect()
      .map(r => (r.getAs[String]("token"), r.getAs[Long]("n_exact"),
        r.getAs[Long]("est")))
    assert(k.toSeq == twin.toSeq)
    val err = intercept[IllegalArgumentException] {
      ComputeRegistry.runOnce(s,
        parse("COMPUTE c FROM table(text) INTO column(overcount) " +
          "USING cms_topk"),
        "documents")
    }
    assert(err.getMessage.contains("reserves"))
  }

  test("hll_card kernel sketches per-group distinct tokens from the DSL " +
    "and matches the catalog twin") {
    val s = spark
    val twin = graft.llm.TextOps.hllCard(s.table("documents"))
      .collect().map(r => r.getString(0) -> r.getAs[Double]("hll_est")).toMap
    val k = ComputeRegistry.runOnce(s,
      parse("COMPUTE h FROM table(text, source) INTO column(est) " +
        "USING hll_card"),
      "documents")
    val got = k.collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Double]("est")).toMap
    assert(got == twin, "kernel estimates must equal the catalog twin")
    val err = intercept[IllegalArgumentException] {
      ComputeRegistry.runOnce(s,
        parse("COMPUTE h FROM table(text, source) INTO column(rel_err) " +
          "USING hll_card"),
        "documents")
    }
    assert(err.getMessage.contains("reserves"))
  }

  test("script_shares kernel attaches the damage signal from the DSL") {
    val s = spark
    val nDocs = s.table("documents").count()
    val k = ComputeRegistry.runOnce(s,
      parse("COMPUTE c FROM table(text) INTO column(dmg) " +
        "USING script_shares"),
      "documents")
    assert(k.count() == nDocs, "rows preserved")
    assert(k.filter(col("dmg").isNull).count() == 0,
      "fixture docs are non-empty, every row scores")
  }

  test("gram_entropy kernel matches the catalog twin from the DSL") {
    val s = spark
    val twin = graft.llm.TextOps.gramEntropy(s.table("documents"))
      .collect()(0)
    val k = ComputeRegistry.runOnce(s,
      parse("COMPUTE g FROM table(text) INTO column(hc) " +
        "USING gram_entropy"),
      "documents").collect()(0)
    assert(k.getAs[Double]("hc") == twin.getAs[Double]("h_cond"))
    assert(k.getAs[Double]("h_unigram") == twin.getAs[Double]("h_unigram"))
  }

  test("filter_sweep kernel matches the catalog twin from the DSL") {
    val s = spark
    val twin = graft.llm.TextOps.filterSweep(s.table("documents"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val k = ComputeRegistry.runOnce(s,
      parse("COMPUTE f FROM table(text) INTO column(tok_share) " +
        "USING filter_sweep"),
      "documents")
      .collect().map(r => r.getAs[Long]("threshold") ->
        r.getAs[Long]("n_docs_ge")).toMap
    assert(k == twin)
  }

  test("strat_alloc kernel selects exactly 100 rows from the DSL") {
    val s = spark
    val k = ComputeRegistry.runOnce(s,
      parse("COMPUTE a FROM table(source) INTO column(keep) " +
        "USING strat_alloc"),
      "documents")
    assert(k.count() == s.table("documents").count(), "rows preserved")
    assert(k.filter(col("keep")).count() == 100L, "exact-N contract")
  }

  test("langid_confusion kernel matches the catalog twin from the DSL") {
    val s = spark
    val twin = graft.llm.TextOps.langidConfusion(s.table("documents"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    val k = ComputeRegistry.runOnce(s,
      parse("COMPUTE l FROM table(text, lang) INTO column(cell_share) " +
        "USING langid_confusion"),
      "documents")
      .collect().map(r => (r.getAs[String]("lang"),
        r.getAs[String]("lang_guess")) -> r.getAs[Long]("n")).toMap
    assert(k == twin)
  }

  test("dedup_savings kernel matches the catalog twin from the DSL") {
    val s = spark
    val twin = graft.llm.Curation.dedupSavings(s.table("documents"))
      .collect()(0)
    val k = ComputeRegistry.runOnce(s,
      parse("COMPUTE d FROM table(text) INTO column(sfrac) " +
        "USING dedup_savings"),
      "documents").collect()(0)
    assert(k.getAs[Long]("tokens_saved") ==
      twin.getAs[Long]("tokens_saved"))
    assert(k.getAs[Double]("sfrac") == twin.getAs[Double]("saved_frac"))
  }

  test("corpus_diff kernel: flagged rows are the new snapshot; planted " +
    "statuses come through the DSL") {
    val s = spark
    import s.implicits._
    Seq(
      (1L, "a b", false), (2L, "c", false), (3L, "d d d", false),
      (12L, "c", true), (13L, "x", true), (14L, "e e", true))
      .toDF("doc_id", "text", "is_new")
      .createOrReplaceTempView("diff_docs")
    val out = ComputeRegistry.runOnce(s,
      parse("COMPUTE d FROM table(text, is_new) INTO column(tdelta) " +
        "USING corpus_diff"),
      "diff_docs")
      .collect().map(r => r.getString(0) -> r.getAs[Long]("tdelta")).toMap
    // disjoint doc_ids: everything old is removed, everything new added
    assert(out == Map("removed" -> -6L, "added" -> 4L))
  }

  test("domain_tail kernel reaches the coverage card from the DSL") {
    val s = spark
    val twin = graft.llm.Curation.domainTailCard(s.table("documents"))
      .collect()(0)
    val card = ComputeRegistry.runOnce(s,
      parse("COMPUTE d FROM table(text, source) INTO column(dp90) " +
        "USING domain_tail"),
      "documents").collect()(0)
    assert(card.getAs[Long]("n_domains") == twin.getAs[Long]("n_domains"))
    assert(card.getAs[Long]("dp90") == twin.getAs[Long]("domains_p90"))
    assert(card.getAs[Double]("share_p99") ==
      twin.getAs[Double]("share_p99"))
  }

  test("classifier_auc kernel: perfect planted separation ranks 1.0 " +
    "from the DSL") {
    val s = spark
    import s.implicits._
    Seq(
      (1L, "clean prose reads well here", true),
      (2L, "clean tidy prose again", true),
      (3L, "well formed clean text", true),
      (4L, "spam junk casino junk", false),
      (5L, "casino spam spam offer", false),
      (6L, "junk offer casino spam", false))
      .toDF("doc_id", "text", "is_curated")
      .createOrReplaceTempView("auc_docs")
    val card = ComputeRegistry.runOnce(s,
      parse("COMPUTE a FROM table(text, is_curated) INTO column(auc) " +
        "USING classifier_auc"),
      "auc_docs").collect()(0)
    assert(card.getAs[Long]("n_pos") == 3L &&
      card.getAs[Long]("n_neg") == 3L)
    assert(card.getAs[Double]("auc") == 1.0)
    graft.llm.PipelineCaches.clear()
  }

  test("classifier_calibration kernel emits the reliability card from " +
    "the DSL with one ECE total row") {
    val s = spark
    import s.implicits._
    Seq(
      (1L, "clean prose reads well here", true),
      (2L, "clean tidy prose again", true),
      (3L, "well formed clean text", true),
      (4L, "spam junk casino junk", false),
      (5L, "casino spam spam offer", false),
      (6L, "junk offer casino spam", false))
      .toDF("doc_id", "text", "is_curated")
      .createOrReplaceTempView("calib_docs")
    val rows = ComputeRegistry.runOnce(s,
      parse("COMPUTE c FROM table(text, is_curated) INTO column(ece) " +
        "USING classifier_calibration"),
      "calib_docs").collect()
    assert(rows.count(_.isNullAt(0)) == 1, "one NULL-bin total")
    val total = rows.find(_.isNullAt(0)).get
    assert(total.getAs[Long]("n") == 6L &&
      total.getAs[Long]("n_pos") == 3L)
    assert(total.getAs[Double]("ece") >= 0.0 &&
      total.getAs[Double]("ece") <= 1.0)
    graft.llm.PipelineCaches.clear()
  }

  test("logistic_quality kernel trains the discriminative classifier " +
    "from the DSL: rows preserved, planted signal separates") {
    val s = spark
    import s.implicits._
    // planted vocabulary signal (the fixture corpus's sources share one
    // word distribution, so source labels carry no unigram signal)
    Seq(
      (1L, "clean prose reads well here", true),
      (2L, "clean tidy prose again", true),
      (3L, "well formed clean text", true),
      (4L, "spam junk casino junk", false),
      (5L, "casino spam spam offer", false),
      (6L, "junk offer casino spam", false))
      .toDF("doc_id", "text", "is_curated")
      .createOrReplaceTempView("lq_docs")
    val lq = ComputeRegistry.runOnce(s,
      parse("COMPUTE lq FROM table(text, is_curated) INTO column(lq_score) " +
        "USING logistic_quality"),
      "lq_docs")
    assert(lq.count() == 6)
    assert(lq.filter(col("lq_score").isNull).count() == 0,
      "every doc has >= 1 feature row (the intercept), so every doc scores")
    val minPos = lq.filter(col("is_curated"))
      .agg(min("lq_score")).collect()(0).getDouble(0)
    val maxNeg = lq.filter(!col("is_curated"))
      .agg(max("lq_score")).collect()(0).getDouble(0)
    assert(minPos > 0 && maxNeg < 0,
      s"planted classes must separate through the DSL path " +
        s"($minPos vs $maxNeg)")
    graft.llm.PipelineCaches.clear()
  }

  test("readability / pmi_pairs / token_budget / embedding_coverage " +
    "kernels reach the round-12 analysis operators from the DSL") {
    val s = spark
    // readability: pure column kernel — matches the operator's flesch
    // on every doc (same projection, no join)
    val rd = ComputeRegistry.runOnce(s,
      parse("COMPUTE rd FROM table(text) INTO column(flesch_k) " +
        "USING readability"),
      "documents")
    val twin = graft.llm.TextOps.readability(
      s.table("documents").select("doc_id", "text"))
      .select(col("doc_id"), col("flesch"))
    assert(rd.select("doc_id", "flesch_k")
      .join(twin, Seq("doc_id"))
      .filter(!(col("flesch_k") <=> col("flesch"))).count() == 0)
    // pmi_pairs: relation-replacing card, <= 20 rows, ordered by pmi
    // desc, and the reserved-name guard refuses loud
    val pp = ComputeRegistry.runOnce(s,
      parse("COMPUTE pp FROM table(text) INTO column(pmi_k) " +
        "USING pmi_pairs"),
      "documents").collect()
    assert(pp.length > 0 && pp.length <= 20)
    val pmis = pp.map(_.getAs[Double]("pmi_k")).toSeq
    assert(pmis == pmis.sorted.reverse)
    val ppErr = intercept[IllegalArgumentException] {
      ComputeRegistry.runOnce(s,
        parse("COMPUTE pp FROM table(text) INTO column(term_a) " +
          "USING pmi_pairs"),
        "documents")
    }
    assert(ppErr.getMessage.contains("reserves"))
    // token_budget: mass-preserving plan — targets sum to ~the
    // relation's own token mass, rare domain lands in the repeat regime
    s.table("documents")
      .withColumn("dom", when(col("doc_id") % 7 === 0, "rare")
        .otherwise("common"))
      .withColumn("n_tok",
        size(split(coalesce(col("text"), lit("")), " ")))
      .createOrReplaceTempView("dom_docs")
    val tb = ComputeRegistry.runOnce(s,
      parse("COMPUTE tb FROM table(dom, n_tok) INTO column(tgt) " +
        "USING token_budget"),
      "dom_docs")
    val mass = s.table("dom_docs").agg(sum("n_tok")).collect()(0).getLong(0)
    val plan = tb.collect().map(r =>
      r.getAs[String]("domain") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Long]("tgt"),
          r.getAs[Double]("sampling_rate")))).toMap
    assert(math.abs(plan.values.map(_._2).sum - mass) <= 2,
      s"mass-preserving: targets must sum to ~$mass, got $plan")
    // alpha=0.3 flattening: the rare domain oversamples, common under
    assert(plan("rare")._3 > 1.0 && plan("common")._3 < 1.0, s"$plan")
    // embedding_coverage: one-row card over the keyed embeddings; the
    // entropy is positive and normalized entropy lands in (0, 1]
    s.table("embeddings")
      .select(col("vec_id").as("doc_id"), col("embedding"))
      .createOrReplaceTempView("emb_docs_cov")
    val cov = ComputeRegistry.runOnce(s,
      parse("COMPUTE ec FROM table(embedding) INTO column(norm_h) " +
        "USING embedding_coverage"),
      "emb_docs_cov").collect()
    assert(cov.length == 1)
    val card = cov(0)
    assert(card.getAs[Long]("n_vecs") ==
      s.table("embeddings").count())
    assert(card.getAs[Double]("entropy") > 0.0)
    val nh = card.getAs[Double]("norm_h")
    assert(nh > 0.0 && nh <= 1.0, s"norm entropy out of range: $nh")
    // token_budget contract error: zero token mass refuses loud at
    // execution (the raise_error guard rides inside the one pass — no
    // separate guard job)
    s.table("documents").withColumn("z", lit(0))
      .createOrReplaceTempView("zero_tok_docs")
    val tbErr = intercept[Exception] {
      ComputeRegistry.runOnce(s,
        parse("COMPUTE tb FROM table(source, z) INTO column(t) " +
          "USING token_budget"),
        "zero_tok_docs").collect()
    }
    assert(tbErr.getMessage.contains("no token mass"),
      s"unexpected error: ${tbErr.getMessage}")
  }

  test("leakage_split / pack_plan / corpus_overlap kernels reach the " +
    "round-12 planning operators from the DSL") {
    val s = spark
    // leakage_split: whole dup groups share a split; rows preserved
    val ls = ComputeRegistry.runOnce(s,
      parse("COMPUTE ls FROM table(text) INTO column(split_k) " +
        "USING leakage_split"),
      "documents")
    assert(ls.count() == s.table("documents").count())
    assert(ls.groupBy("dup_group")
      .agg(countDistinct(col("split_k")).as("n")).filter(col("n") > 1)
      .count() == 0, "a dup group must never straddle splits")
    assert(ls.select("split_k").distinct().collect()
      .map(_.getString(0)).toSet.subsetOf(Set("train", "val", "test")))
    // pack_plan: one-row card matching the operator at the same seqLen
    val pp = ComputeRegistry.runOnce(s,
      parse("COMPUTE pp FROM table(text) INTO column(waste) " +
        "USING pack_plan"),
      "documents").collect()
    assert(pp.length == 1)
    val twin = graft.llm.TextOps.packPlan(
      s.table("documents").select("doc_id", "text"), seqLen = 64)
      .collect()(0)
    assert(pp(0).getAs[Long]("packed_seqs") ==
      twin.getAs[Long]("packed_seqs"))
    assert(pp(0).getAs[Double]("waste") ==
      twin.getAs[Double]("pad_waste_pct"))
    // corpus_overlap: flagged split of the same corpus -> the flagged
    // rows are a SUBSET, so the sketch can only agree where the a-side
    // minimum survives; the card is one row with a [0,1] estimate
    s.table("documents")
      .withColumn("is_b", col("doc_id") % 2 === 0)
      .createOrReplaceTempView("overlap_docs")
    val ov = ComputeRegistry.runOnce(s,
      parse("COMPUTE ov FROM table(text, is_b) INTO column(est_j) " +
        "USING corpus_overlap"),
      "overlap_docs").collect()
    assert(ov.length == 1)
    val est = ov(0).getAs[Double]("est_j")
    assert(est >= 0.0 && est <= 1.0)
    assert(ov(0).getAs[Long]("n_docs_a") + ov(0).getAs[Long]("n_docs_b") ==
      s.table("documents").count())
    // contract error: no b-side rows refuses loud
    s.table("documents").withColumn("never", lit(false))
      .createOrReplaceTempView("never_b_docs")
    val ovErr = intercept[IllegalArgumentException] {
      ComputeRegistry.runOnce(s,
        parse("COMPUTE ov FROM table(text, never) INTO column(e) " +
          "USING corpus_overlap"),
        "never_b_docs")
    }
    assert(ovErr.getMessage.contains("no b-side rows"))
  }

  test("mad_outlier / centroid_cos kernels reach the round-12 quality " +
    "operators from the DSL") {
    val s = spark
    // mad_outlier: matches the operator on every row; rows preserved
    val mo = ComputeRegistry.runOnce(s,
      parse("COMPUTE mo FROM table(n_chars) INTO column(rz) " +
        "USING mad_outlier"),
      "documents")
    assert(mo.count() == s.table("documents").count())
    val twin = graft.llm.Sampling.madOutliers(
      s.table("documents").select("doc_id", "n_chars"), "n_chars")
      .select(col("doc_id"), col("robust_z"))
    assert(mo.select("doc_id", "rz").join(twin, Seq("doc_id"))
      .filter(!(col("rz") <=> col("robust_z"))).count() == 0)
    val moErr = intercept[IllegalArgumentException] {
      ComputeRegistry.runOnce(s,
        parse("COMPUTE mo FROM table(n_chars) INTO column(is_outlier) " +
          "USING mad_outlier"),
        "documents")
    }
    assert(moErr.getMessage.contains("reserves"))
    // centroid_cos: keyed embedding relation; every score in [-1, 1]
    s.table("embeddings")
      .select(col("vec_id").as("doc_id"), col("label"), col("embedding"))
      .createOrReplaceTempView("emb_lbl_docs")
    val cc = ComputeRegistry.runOnce(s,
      parse("COMPUTE cc FROM table(label, embedding) INTO column(ccos) " +
        "USING centroid_cos"),
      "emb_lbl_docs")
    assert(cc.count() == s.table("embeddings").count())
    val ccTwin = graft.llm.Similarity.centroidCosine(
      s.table("embeddings").select("vec_id", "label", "embedding"),
      "label")
      .select(col("vec_id").as("doc_id"), col("centroid_cos"))
    assert(cc.select("doc_id", "ccos").join(ccTwin, Seq("doc_id"))
      .filter(!(col("ccos") <=> col("centroid_cos"))).count() == 0)
  }

  test("char_entropy / vocab_card / boilerplate_frac kernels reach the " +
    "round-12 text tier from the DSL") {
    val s = spark
    // char_entropy: pure column kernel, matches the operator per row
    val ce = ComputeRegistry.runOnce(s,
      parse("COMPUTE ce FROM table(text) INTO column(ent) " +
        "USING char_entropy"),
      "documents")
    assert(ce.count() == s.table("documents").count())
    val ceTwin = graft.llm.TextOps.charStats(s.table("documents"))
      .select(col("doc_id"), col("char_entropy"))
    assert(ce.select("doc_id", "ent").join(ceTwin, Seq("doc_id"))
      .filter(!(col("ent") <=> col("char_entropy"))).count() == 0)
    // vocab_card: relation-replacing one-row card; reserved names refuse
    val vc = ComputeRegistry.runOnce(s,
      parse("COMPUTE vc FROM table(text) INTO column(slope) " +
        "USING vocab_card"),
      "documents")
    assert(vc.count() == 1)
    assert(vc.columns.contains("slope") && vc.columns.contains("ttr"))
    val vcErr = intercept[IllegalArgumentException] {
      ComputeRegistry.runOnce(s,
        parse("COMPUTE vc FROM table(text) INTO column(ttr) " +
          "USING vocab_card"),
        "documents")
    }
    assert(vcErr.getMessage.contains("reserves"))
    // boilerplate_frac: rows preserved, matches the operator
    val bf = ComputeRegistry.runOnce(s,
      parse("COMPUTE bf FROM table(text) INTO column(bfrac) " +
        "USING boilerplate_frac"),
      "documents")
    assert(bf.count() == s.table("documents").count())
    val bfTwin = graft.llm.Curation.boilerplateFrac(
        s.table("documents").select("doc_id", "text"))
      .select(col("doc_id"), col("boilerplate_frac"))
    assert(bf.select("doc_id", "bfrac").join(bfTwin, Seq("doc_id"))
      .filter(!(col("bfrac") <=> col("boilerplate_frac"))).count() == 0)
  }

  test("c4_filter / emb_stats / kmeans_assign / unimax_alloc / lsh_plan " +
    "kernels reach the round-12 additions from the DSL") {
    val s = spark
    // c4_filter: rows preserved, verdict matches the operator
    val c4 = ComputeRegistry.runOnce(s,
      parse("COMPUTE c4 FROM table(text) INTO column(ok) USING c4_filter"),
      "documents")
    assert(c4.count() == s.table("documents").count())
    val c4Twin = graft.llm.Curation.c4Rules(
        s.table("documents").select("doc_id", "text"))
      .select(col("doc_id"), col("keep"))
    assert(c4.select("doc_id", "ok").join(c4Twin, Seq("doc_id"))
      .filter(!(col("ok") <=> col("keep"))).count() == 0)
    // emb_stats: relation-replacing per-dim card (64 dims)
    s.table("embeddings")
      .select(col("vec_id").as("doc_id"), col("embedding"))
      .createOrReplaceTempView("emb_docs_r12")
    val es = ComputeRegistry.runOnce(s,
      parse("COMPUTE es FROM table(embedding) INTO column(share) " +
        "USING emb_stats"),
      "emb_docs_r12")
    assert(es.count() == 64)
    assert(es.columns.contains("share") && es.columns.contains("variance"))
    val esErr = intercept[IllegalArgumentException] {
      ComputeRegistry.runOnce(s,
        parse("COMPUTE es FROM table(embedding) INTO column(variance) " +
          "USING emb_stats"),
        "emb_docs_r12")
    }
    assert(esErr.getMessage.contains("reserves"))
    // kmeans_assign: rows preserved; matches the auto-k operator step
    val km = ComputeRegistry.runOnce(s,
      parse("COMPUTE km FROM table(embedding) INTO column(cl) " +
        "USING kmeans_assign"),
      "emb_docs_r12")
    assert(km.count() == s.table("embeddings").count())
    val embs = s.table("embeddings")
      .select(col("vec_id"), col("embedding"))
    val kmTwin = graft.llm.Similarity.kmeansStep(embs,
        graft.llm.Similarity.autoCellSeeds(embs))
      .select(col("vec_id").as("doc_id"), col("cell"))
    assert(km.select("doc_id", "cl").join(kmTwin, Seq("doc_id"))
      .filter(!(col("cl") <=> col("cell"))).count() == 0)
    // unimax_alloc: one row per domain; allocations never exceed capacity
    val ua = ComputeRegistry.runOnce(s,
      parse("COMPUTE ua FROM table(lang, n_chars) INTO column(alloc) " +
        "USING unimax_alloc"),
      "documents")
    assert(ua.count() ==
      s.table("documents").select("lang").distinct().count())
    assert(ua.filter(col("alloc") > col("capacity") + 1e-6).count() == 0)
    // lsh_plan: the 8 factorizations of 128, exactly one winner
    val lp = ComputeRegistry.runOnce(s,
      parse("COMPUTE lp FROM table(text) INTO column(best) USING lsh_plan"),
      "documents")
    assert(lp.count() == 8)
    assert(lp.filter(col("best")).count() == 1)
  }

  test("winsorize / temporal_split / vocab_overlap kernels reach the " +
    "round-12 split/overlap operators from the DSL") {
    val s = spark
    // winsorize: rows preserved, clipped values match the operator
    val wz = ComputeRegistry.runOnce(s,
      parse("COMPUTE w FROM table(n_chars) INTO column(nc_w) " +
        "USING winsorize"),
      "documents")
    assert(wz.count() == s.table("documents").count())
    val wzTwin = graft.llm.Sampling.winsorize(
        s.table("documents").select("doc_id", "n_chars"), "n_chars",
        pLo = 0.05, pHi = 0.95)
      .select(col("doc_id"), col("winsorized"))
    assert(wz.select("doc_id", "nc_w").join(wzTwin, Seq("doc_id"))
      .filter(!(col("nc_w") <=> col("winsorized"))).count() == 0)
    val wzErr = intercept[IllegalArgumentException] {
      ComputeRegistry.runOnce(s,
        parse("COMPUTE w FROM table(n_chars) INTO column(clipped_lo) " +
          "USING winsorize"),
        "documents")
    }
    assert(wzErr.getMessage.contains("reserves"))
    // temporal_split: rows preserved, exactly the three labels, train
    // share within a minute bucket of 80%
    s.table("events").select(col("event_id").as("doc_id"), col("ts"))
      .createOrReplaceTempView("ts_docs_r12")
    val tsp = ComputeRegistry.runOnce(s,
      parse("COMPUTE t FROM table(ts) INTO column(part) " +
        "USING temporal_split"),
      "ts_docs_r12")
    val n = s.table("events").count()
    assert(tsp.count() == n)
    val trainN = tsp.filter(col("part") === "train").count()
    assert(trainN >= (n * 0.8).toLong && trainN <= (n * 0.81).toLong + 1,
      s"train share off: $trainN of $n")
    assert(tsp.filter(col("part") === "test").count() > 0)
    // vocab_overlap: one-row card over the flag-split halves; rot13'd
    // odd half shares the even half's vocabulary only partially
    s.table("documents")
      .withColumn("is_b", col("doc_id") % 2 === 1)
      .createOrReplaceTempView("vo_docs_r12")
    val vo = ComputeRegistry.runOnce(s,
      parse("COMPUTE v FROM table(text, is_b) INTO column(kl) " +
        "USING vocab_overlap"),
      "vo_docs_r12")
    assert(vo.count() == 1)
    val r = vo.collect()(0)
    assert(r.getAs[Long]("shared_types") > 0)
    assert(r.getAs[Double]("kl") >= 0.0)
    assert(vo.columns.contains("jaccard_vocab"))
  }

  test("distinct_ngrams / dup_size_card / grouped_quantiles kernels reach " +
    "the round-12 card operators from the DSL") {
    val s = spark
    // distinct_ngrams: one row per n in {1,2,3}, ratios in (0, 1]
    val dn = ComputeRegistry.runOnce(s,
      parse("COMPUTE d FROM table(text) INTO column(ratio) " +
        "USING distinct_ngrams"),
      "documents")
    assert(dn.count() == 3)
    assert(dn.filter(col("ratio") <= 0 || col("ratio") > 1).count() == 0)
    assert(dn.columns.sorted.toSeq ==
      Seq("distinct_ngrams", "k", "ratio", "total_ngrams"))
    val dnErr = intercept[IllegalArgumentException] {
      ComputeRegistry.runOnce(s,
        parse("COMPUTE d FROM table(text) INTO column(k) " +
          "USING distinct_ngrams"),
        "documents")
    }
    assert(dnErr.getMessage.contains("reserves"))
    // dup_size_card: shares sum to 1, doc counts sum to the corpus
    val dc = ComputeRegistry.runOnce(s,
      parse("COMPUTE d FROM table(text) INTO column(frac) " +
        "USING dup_size_card"),
      "documents")
    val total = dc.agg(sum("n_docs")).collect()(0).getLong(0)
    assert(total == s.table("documents").count())
    val shareSum = dc.agg(sum("frac")).collect()(0).getDouble(0)
    assert(math.abs(shareSum - 1.0) < 1e-4, s"shares sum to $shareSum")
    // grouped_quantiles: one row per lang; p10 <= median <= p90 and the
    // median matches the operator twin
    val gq = ComputeRegistry.runOnce(s,
      parse("COMPUTE g FROM table(lang, n_chars) INTO column(med) " +
        "USING grouped_quantiles"),
      "documents")
    val langs = s.table("documents").select("lang").distinct().count()
    assert(gq.count() == langs)
    assert(gq.filter(col("p10") > col("med") ||
      col("med") > col("p90")).count() == 0)
    val gqTwin = graft.llm.Sampling.groupedQuantiles(
        s.table("documents").select("lang", "n_chars"), "lang", "n_chars",
        ps = Seq(0.5))
      .select(col("lang"), col("p50"))
    assert(gq.select("lang", "med").join(gqTwin, Seq("lang"))
      .filter(!(col("med") <=> col("p50"))).count() == 0)
  }

  test("emb_top_pc / ks_drift / domain_hhi kernels reach the round-12 " +
    "statistics cards from the DSL") {
    val s = spark
    // emb_top_pc: one row per dim, unit-L2 loadings, share in (0, 1]
    s.table("embeddings")
      .select(col("vec_id").as("doc_id"), col("embedding"))
      .createOrReplaceTempView("emb_docs_r12c")
    val pc = ComputeRegistry.runOnce(s,
      parse("COMPUTE p FROM table(embedding) INTO column(share) " +
        "USING emb_top_pc"),
      "emb_docs_r12c")
    val pcRows = pc.collect()
    assert(pcRows.length == 64)
    val ss = pcRows.map(r =>
      math.pow(r.getAs[Double]("loading"), 2)).sum
    assert(math.abs(ss - 1.0) < 1e-4)
    val share = pcRows.head.getAs[Double]("share")
    assert(share > 0 && share <= 1.0)
    val pcErr = intercept[IllegalArgumentException] {
      ComputeRegistry.runOnce(s,
        parse("COMPUTE p FROM table(embedding) INTO column(loading) " +
          "USING emb_top_pc"),
        "emb_docs_r12c")
    }
    assert(pcErr.getMessage.contains("reserves"))
    // ks_drift: identical halves (same distribution both sides of the
    // flag at fixture scale) produce a small-D one-row card
    s.table("documents")
      .withColumn("is_b", col("doc_id") % 2 === 1)
      .createOrReplaceTempView("ks_docs_r12c")
    val ks = ComputeRegistry.runOnce(s,
      parse("COMPUTE k FROM table(n_chars, is_b) INTO column(ks) " +
        "USING ks_drift"),
      "ks_docs_r12c")
    assert(ks.count() == 1)
    val kr = ks.collect()(0)
    assert(kr.getAs[Long]("n_a") > 0 && kr.getAs[Long]("n_b") > 0)
    assert(kr.getAs[Double]("ks") >= 0.0 && kr.getAs[Double]("ks") <= 1.0)
    assert(ks.columns.contains("crit_05") && ks.columns.contains("drifted"))
    // domain_hhi: one-row card matching the operator twin exactly
    val hh = ComputeRegistry.runOnce(s,
      parse("COMPUTE h FROM table(source) INTO column(hhi_idx) " +
        "USING domain_hhi"),
      "documents")
    assert(hh.count() == 1)
    val hr = hh.collect()(0)
    val twin = graft.llm.Curation.concentrationCard(
      s.table("documents"), "source").collect()(0)
    assert(hr.getAs[Double]("hhi_idx") == twin.getAs[Double]("hhi"))
    assert(hr.getAs[Double]("gini") == twin.getAs[Double]("gini"))
    assert(hr.getAs[Long]("n_domains") == twin.getAs[Long]("n_domains"))
  }

  test("pair_jaccard_hist / cluster_purity / ngram_novelty kernels reach " +
    "the straggler cards from the DSL") {
    val s = spark
    // pair_jaccard_hist: bin-bounded card, shares sum to 1, exact dups
    // (doc unioned with itself under a new id) land in bin 20
    s.table("documents").select(col("doc_id"), col("text"))
      .unionAll(s.table("documents")
        .select((col("doc_id") + 100000L).as("doc_id"), col("text")))
      .createOrReplaceTempView("pjh_docs_r13")
    val pj = ComputeRegistry.runOnce(s,
      parse("COMPUTE p FROM table(text) INTO column(pair_share) " +
        "USING pair_jaccard_hist"),
      "pjh_docs_r13")
    val pjRows = pj.collect()
    assert(pjRows.nonEmpty && pjRows.length <= 21)
    assert(pjRows.exists(_.getAs[Int]("bin") == 20))
    val shareSum = pjRows.map(_.getAs[Double]("pair_share")).sum
    assert(math.abs(shareSum - 1.0) < 1e-3, s"shares sum to $shareSum")
    val pjErr = intercept[IllegalArgumentException] {
      ComputeRegistry.runOnce(s,
        parse("COMPUTE p FROM table(text) INTO column(n_pairs) " +
          "USING pair_jaccard_hist"),
        "pjh_docs_r13")
    }
    assert(pjErr.getMessage.contains("reserves"))
    // cluster_purity: one-row card, purity in (0, 1], counts positive
    s.table("embeddings")
      .select(col("vec_id").as("doc_id"), col("embedding"), col("label"))
      .createOrReplaceTempView("cp_embs_r13")
    val cp = ComputeRegistry.runOnce(s,
      parse("COMPUTE c FROM table(embedding, label) INTO column(pur) " +
        "USING cluster_purity"),
      "cp_embs_r13")
    assert(cp.count() == 1)
    val cr = cp.collect()(0)
    assert(cr.getAs[Long]("n_vecs") > 0 && cr.getAs[Long]("n_cells") > 0)
    val pur = cr.getAs[Double]("pur")
    assert(pur > 0.0 && pur <= 1.0)
    assert(cp.columns.contains("nmi"))
    // ngram_novelty: verbatim copies score 0, rotated text scores 1,
    // train rows carry NULL (rows preserved)
    val base = s.table("documents").select(col("doc_id"), col("text"))
    base.withColumn("is_test", lit(false))
      .unionAll(base.filter(col("doc_id") % 5 === 0)
        .select((col("doc_id") + 100000L).as("doc_id"), col("text"))
        .withColumn("is_test", lit(true)))
      .unionAll(base.filter(col("doc_id") % 5 === 1)
        .select((col("doc_id") + 200000L).as("doc_id"),
          translate(col("text"), "abcdefghijklmnopqrstuvwxyz",
            "nopqrstuvwxyzabcdefghijklm").as("text"))
        .withColumn("is_test", lit(true)))
      .createOrReplaceTempView("nn_docs_r13")
    val nn = ComputeRegistry.runOnce(s,
      parse("COMPUTE n FROM table(text, is_test) INTO column(nov) " +
        "USING ngram_novelty"),
      "nn_docs_r13")
    assert(nn.count() == s.sql(
      "SELECT count(*) FROM nn_docs_r13").collect()(0).getLong(0))
    val copies = nn.filter(col("doc_id") >= 100000L && col("doc_id") < 200000L)
      .select("nov").collect().map(_.getAs[Double]("nov"))
    assert(copies.nonEmpty && copies.forall(_ == 0.0),
      s"verbatim copies must have novelty 0: ${copies.take(3).mkString(",")}")
    val rotated = nn.filter(col("doc_id") >= 200000L)
      .select("nov").collect().map(_.getAs[Double]("nov"))
    assert(rotated.nonEmpty && rotated.forall(_ > 0.9))
    assert(nn.filter(col("doc_id") < 100000L).select("nov")
      .collect().forall(_.isNullAt(0)))
  }

  test("corpus_release kernel ships the five-card release sheet from " +
    "the DSL, matching the operator twin") {
    val s = spark
    val sheet = ComputeRegistry.runOnce(s,
      parse("COMPUTE r FROM table(text) INTO column(ratio) " +
        "USING corpus_release"),
      "documents")
    val rows = sheet.collect()
    graft.llm.PipelineCaches.clear()
    assert(rows.map(_.getString(0)).toSet == Set("split", "pack",
      "report", "dup_size", "concentration"))
    assert(sheet.columns.contains("ratio"))
    val twin = graft.llm.Curation.releaseSheet(s.table("documents"))
      .collect()
    graft.llm.PipelineCaches.clear()
    assert(rows.map(_.toString).sorted.sameElements(
      twin.map(_.toString).sorted))
    val err = intercept[IllegalArgumentException] {
      ComputeRegistry.runOnce(s,
        parse("COMPUTE r FROM table(text) INTO column(section) " +
          "USING corpus_release"),
        "documents")
    }
    assert(err.getMessage.contains("reserves"))
  }

  test("emb_drift kernel splits by the flag column and ships the per-dim " +
    "Welch card from the DSL") {
    val s = spark
    s.table("embeddings")
      .select(col("vec_id").as("doc_id"), col("embedding"),
        (col("vec_id") % 2 === 1).as("is_b"))
      .createOrReplaceTempView("drift_embs_r13")
    val dr = ComputeRegistry.runOnce(s,
      parse("COMPUTE d FROM table(embedding, is_b) INTO column(zed) " +
        "USING emb_drift"),
      "drift_embs_r13")
    val rows = dr.collect()
    assert(rows.length == 64)
    assert(rows.forall(r => r.getAs[Long]("n_a") > 0 &&
      r.getAs[Long]("n_b") > 0))
    assert(dr.columns.contains("zed") && dr.columns.contains("drifted"))
    val err = intercept[IllegalArgumentException] {
      ComputeRegistry.runOnce(s,
        parse("COMPUTE d FROM table(embedding, is_b) INTO column(delta) " +
          "USING emb_drift"),
        "drift_embs_r13")
    }
    assert(err.getMessage.contains("reserves"))
  }

  test("jaccard_join_exact kernel ships the complete pair relation from " +
    "the DSL — planted copies found, threshold respected") {
    val s = spark
    s.table("documents").select(col("doc_id"), col("text"))
      .unionAll(s.table("documents").filter(col("doc_id") < 10)
        .select((col("doc_id") + 100000L).as("doc_id"), col("text")))
      .createOrReplaceTempView("jje_docs_r13")
    val j = ComputeRegistry.runOnce(s,
      parse("COMPUTE j FROM table(text) INTO column(jac) " +
        "USING jaccard_join_exact"),
      "jje_docs_r13")
    val rows = j.collect()
    graft.llm.PipelineCaches.clear()
    // the 10 planted verbatim copies are Jaccard-1 pairs
    val planted = rows.filter(r =>
      r.getAs[Long]("doc_b") == r.getAs[Long]("doc_a") + 100000L)
    assert(planted.length == 10)
    assert(planted.forall(_.getAs[Double]("jac") == 1.0))
    assert(rows.forall(_.getAs[Double]("jac") >= 0.8))
    val err = intercept[IllegalArgumentException] {
      ComputeRegistry.runOnce(s,
        parse("COMPUTE j FROM table(text) INTO column(doc_a) " +
          "USING jaccard_join_exact"),
        "jje_docs_r13")
    }
    assert(err.getMessage.contains("reserves"))
  }

  test("int8_distortion kernel ships the dequantization card from the " +
    "DSL, matching the operator twin") {
    val s = spark
    s.table("embeddings")
      .select(col("vec_id").as("doc_id"), col("embedding"))
      .createOrReplaceTempView("i8d_embs_r13")
    val d = ComputeRegistry.runOnce(s,
      parse("COMPUTE q FROM table(embedding) INTO column(rec_mse) " +
        "USING int8_distortion"),
      "i8d_embs_r13")
    assert(d.count() == 1)
    val r = d.collect()(0)
    val twin = graft.llm.Similarity.int8Distortion(
      s.table("embeddings").select("vec_id", "embedding")).collect()(0)
    assert(r.getAs[Double]("rec_mse") == twin.getAs[Double]("mse"))
    assert(r.getAs[Double]("mean_cos") == twin.getAs[Double]("mean_cos"))
    val err = intercept[IllegalArgumentException] {
      ComputeRegistry.runOnce(s,
        parse("COMPUTE q FROM table(embedding) INTO column(mean_cos) " +
          "USING int8_distortion"),
        "i8d_embs_r13")
    }
    assert(err.getMessage.contains("reserves"))
  }

  test("pq_distortion kernel ships the reconstruction card from the DSL, " +
    "matching the 16-smallest-seed operator twin") {
    val s = spark
    s.table("embeddings")
      .select(col("vec_id").as("doc_id"), col("embedding"))
      .createOrReplaceTempView("pqd_embs_r13")
    val d = ComputeRegistry.runOnce(s,
      parse("COMPUTE q FROM table(embedding) INTO column(rec_mse) " +
        "USING pq_distortion"),
      "pqd_embs_r13")
    assert(d.count() == 1)
    val r = d.collect()(0)
    val embs = s.table("embeddings").select("vec_id", "embedding")
    val seeds = embs.select("vec_id").orderBy("vec_id").limit(16)
      .collect().map(_.getLong(0)).toSeq
    val twin = graft.llm.Pq.pqDistortion(embs, seeds, m = 8).collect()(0)
    assert(r.getAs[Double]("rec_mse") == twin.getAs[Double]("mse"))
    assert(r.getAs[Double]("mean_cos") == twin.getAs[Double]("mean_cos"))
    assert(r.getAs[Long]("n_vecs") == twin.getAs[Long]("n_vecs"))
    val err = intercept[IllegalArgumentException] {
      ComputeRegistry.runOnce(s,
        parse("COMPUTE q FROM table(embedding) INTO column(mean_cos) " +
          "USING pq_distortion"),
        "pqd_embs_r13")
    }
    assert(err.getMessage.contains("reserves"))
  }

  test("bpe_fertility kernel ships the per-lang fertility card from the " +
    "DSL, matching the operator twin") {
    val s = spark
    val f = ComputeRegistry.runOnce(s,
      parse("COMPUTE f FROM table(text, lang) INTO column(fert) " +
        "USING bpe_fertility"),
      "documents")
    val rows = f.collect().map(r => r.getString(0) -> r).toMap
    val d = s.table("documents").select("lang", "text")
    val twin = graft.llm.Bpe.fertilityCard(d,
        graft.llm.Bpe.trainLocal(s, d, nMerges = 8))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(rows.keySet == twin.keySet && rows.nonEmpty)
    rows.foreach { case (lang, r) =>
      assert(r.getAs[Double]("fert") ==
        twin(lang).getAs[Double]("fertility"), s"lang $lang")
      assert(r.getAs[Long]("n_bpe_tokens") ==
        twin(lang).getAs[Long]("n_bpe_tokens"), s"lang $lang")
    }
    val err = intercept[IllegalArgumentException] {
      ComputeRegistry.runOnce(s,
        parse("COMPUTE f FROM table(text, lang) INTO column(oov_rate) " +
          "USING bpe_fertility"),
        "documents")
    }
    assert(err.getMessage.contains("reserves"))
  }

  test("pack_plan_bpe kernel plans by trained subword tokens from the " +
    "DSL, matching the operator twin") {
    val s = spark
    val pp = ComputeRegistry.runOnce(s,
      parse("COMPUTE p FROM table(text) INTO column(waste) " +
        "USING pack_plan_bpe"),
      "documents").collect()
    assert(pp.length == 1)
    val d = s.table("documents").select("doc_id", "text")
    val twin = graft.llm.TextOps.packPlanBpe(d,
      graft.llm.Bpe.trainLocal(s, d, nMerges = 8), seqLen = 64)
      .collect()(0)
    assert(pp(0).getAs[Long]("packed_seqs") ==
      twin.getAs[Long]("packed_seqs"))
    assert(pp(0).getAs[Long]("total_tokens") ==
      twin.getAs[Long]("total_tokens"))
    assert(pp(0).getAs[Double]("waste") ==
      twin.getAs[Double]("pad_waste_pct"))
    // BPE budget differs from the whitespace budget (it counts
    // subwords): the two cards must not silently coincide
    val ws = graft.llm.TextOps.packPlan(d, seqLen = 64).collect()(0)
    assert(twin.getAs[Long]("total_tokens") !=
      ws.getAs[Long]("total_tokens"))
  }

  test("containment_join_exact kernel: a planted whole-doc excerpt is " +
    "caught in the contained->host direction from the DSL; reserved " +
    "names refuse") {
    val s = spark
    import s.implicits._
    Seq((1L, "a b c d e f g h i j"), (2L, "a b c d e f"),
      (3L, "q w e r t y u i o p"))
      .toDF("doc_id", "text").createOrReplaceTempView("contain_docs")
    val pairs = ComputeRegistry.runOnce(s,
      parse("COMPUTE c FROM table(text) INTO column(containment) " +
        "USING containment_join_exact"),
      "contain_docs").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(pairs.contains((2L, 1L)) && pairs((2L, 1L)) == 1.0,
      "the excerpt is fully contained in its host")
    assert(!pairs.contains((1L, 2L)),
      "the host is NOT 0.8-contained in its excerpt")
    graft.llm.PipelineCaches.clear()
    val err = intercept[IllegalArgumentException](ComputeRegistry.runOnce(s,
      parse("COMPUTE c FROM table(text) INTO column(doc_a) " +
        "USING containment_join_exact"), "contain_docs"))
    assert(err.getMessage.contains("reserves"))
  }

  test("round-14 containment/span kernels reach the DSL: " +
    "containment_recall_audit, drop_contained, shared_spans, " +
    "remove_shared_spans — planted semantics + reserved names") {
    val s = spark
    import s.implicits._
    val a = "w1 w2 w3 w4 w5 w6 w7 w8"
    Seq((1L, a), (2L, s"zq zr $a"), (3L, "q w e r t y u i o p"))
      .toDF("doc_id", "text").createOrReplaceTempView("r14k_docs")
    // drop_contained: the shifted copy CONTAINS the original -> the
    // original (mutually... no: strict) — original fully contained in
    // copy, copy NOT contained in original (2 extra words of 10 ->
    // C(copy, orig) = 6/8 = 0.75 < 0.8 by shingles) -> doc 1 drops
    val dc = ComputeRegistry.runOnce(s,
      parse("COMPUTE d FROM table(text) INTO column(dropped) " +
        "USING drop_contained"),
      "r14k_docs").collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Boolean]("dropped")).toMap
    assert(dc(1L), "the contained original drops toward its superset")
    assert(!dc(3L), "unrelated docs survive")
    assert(dc.size == 3, "relation-preserving")
    graft.llm.PipelineCaches.clear()
    // shared_spans: the candidate pair (1,2) spans the whole of doc 1
    val ss = ComputeRegistry.runOnce(s,
      parse("COMPUTE x FROM table(text) INTO column(frac) " +
        "USING shared_spans"),
      "r14k_docs").collect()
    assert(ss.exists(r => r.getAs[Long]("doc_a") == 1L &&
      r.getAs[Long]("doc_b") == 2L && r.getAs[Double]("frac") == 1.0))
    graft.llm.PipelineCaches.clear()
    // remove_shared_spans: the higher doc of the pair loses the span
    val rs = ComputeRegistry.runOnce(s,
      parse("COMPUTE x FROM table(text) INTO column(cleaned) " +
        "USING remove_shared_spans"),
      "r14k_docs").collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[String]("cleaned")).toMap
    assert(rs(2L) == "zq zr" && rs(1L) == a)
    graft.llm.PipelineCaches.clear()
    // recall audit card shape
    val ra = ComputeRegistry.runOnce(s,
      parse("COMPUTE x FROM table(text) INTO column(rec) " +
        "USING containment_recall_audit"),
      "r14k_docs").collect()(0)
    assert(ra.getAs[Long]("n_truth") >= 1L)
    graft.llm.PipelineCaches.clear()
    for ((kern, bad) <- Seq(
        ("containment_recall_audit", "n_truth"),
        ("drop_contained", "n_hosts"),
        ("shared_spans", "longest_span"),
        ("remove_shared_spans", "n_removed"))) {
      val err = intercept[IllegalArgumentException](
        ComputeRegistry.runOnce(s,
          parse(s"COMPUTE x FROM table(text) INTO column($bad) " +
            s"USING $kern"), "r14k_docs"))
      assert(err.getMessage.contains("reserves"), kern)
    }
  }

  test("lsh_sensitivity / minhash_est_quality kernels reach the DSL " +
    "(r13 verdict task 6) and match their library twins; reserved " +
    "names refuse") {
    val s = spark
    import s.implicits._
    Seq((1L, "a b c d e f g h"), (2L, "a b c d e f g h"),
      (3L, "a b c d e f x y"), (4L, "q w e r t y u i"))
      .toDF("doc_id", "text").createOrReplaceTempView("sens_docs")
    val sens = ComputeRegistry.runOnce(s,
      parse("COMPUTE a FROM table(text) INTO column(surv) " +
        "USING lsh_sensitivity"),
      "sens_docs").collect()
    val twin = graft.llm.Dedup.lshSensitivity(
      s.table("sens_docs"), k = 3, numHashes = 8, bands = 4).collect()
    assert(sens.map(_.getAs[Long]("n_pairs")).sorted.toSeq ==
      twin.map(_.getAs[Long]("n_pairs")).sorted.toSeq)
    graft.llm.PipelineCaches.clear()
    val q = ComputeRegistry.runOnce(s,
      parse("COMPUTE a FROM table(text) INTO column(mean_err) " +
        "USING minhash_est_quality"),
      "sens_docs").collect()(0)
    // the identical pair (1,2) is a candidate with exact jaccard 1 and
    // est 1 -> zero error contributes to the mean
    assert(q.getAs[Long]("n_pairs") >= 1L)
    assert(q.getAs[Double]("mean_err") >= 0.0)
    graft.llm.PipelineCaches.clear()
    val e1 = intercept[IllegalArgumentException](ComputeRegistry.runOnce(s,
      parse("COMPUTE a FROM table(text) INTO column(n_pairs_ge) " +
        "USING lsh_sensitivity"), "sens_docs"))
    assert(e1.getMessage.contains("reserves"))
    val e2 = intercept[IllegalArgumentException](ComputeRegistry.runOnce(s,
      parse("COMPUTE a FROM table(text) INTO column(max_abs_err) " +
        "USING minhash_est_quality"), "sens_docs"))
    assert(e2.getMessage.contains("reserves"))
  }

  test("abtt_transform / ann_recall_card kernels reach the DSL " +
    "(r13 verdict task 6): rows preserved with proj riding, the card " +
    "reports all three methods; reserved names refuse") {
    val s = spark
    val embs = s.table("embeddings").limit(64)
      .select(col("vec_id").as("doc_id"), col("embedding"))
    embs.createOrReplaceTempView("abtt_embs")
    val at = ComputeRegistry.runOnce(s,
      parse("COMPUTE a FROM table(embedding) INTO column(resid) " +
        "USING abtt_transform"),
      "abtt_embs")
    assert(at.count() == 64L, "relation-preserving")
    assert(at.columns.contains("proj") && at.columns.contains("resid"))
    val twin = graft.llm.Similarity.abttTransform(
      s.table("abtt_embs").select(col("doc_id").as("vec_id"),
        col("embedding")), iters = 12)
      .orderBy("vec_id").collect()
    val got = at.orderBy("doc_id").collect()
    assert(got.map(_.getAs[Double]("resid")).toSeq ==
      twin.map(_.getAs[Double]("resid_norm")).toSeq,
      "kernel must equal the library transform")
    graft.llm.PipelineCaches.clear()
    val card = ComputeRegistry.runOnce(s,
      parse("COMPUTE a FROM table(embedding) INTO column(recall10) " +
        "USING ann_recall_card"),
      "abtt_embs").collect()
    assert(card.map(_.getAs[String]("method")).sorted.toSeq ==
      Seq("ivf", "lsh", "rp"))
    assert(card.forall(r => r.getAs[Double]("recall10") >= 0.0 &&
      r.getAs[Double]("recall10") <= 1.0))
    graft.llm.PipelineCaches.clear()
    val e1 = intercept[IllegalArgumentException](ComputeRegistry.runOnce(s,
      parse("COMPUTE a FROM table(embedding) INTO column(proj) " +
        "USING abtt_transform"), "abtt_embs"))
    assert(e1.getMessage.contains("reserves"))
    val e2 = intercept[IllegalArgumentException](ComputeRegistry.runOnce(s,
      parse("COMPUTE a FROM table(embedding) INTO column(mrr) " +
        "USING ann_recall_card"), "abtt_embs"))
    assert(e2.getMessage.contains("reserves"))
  }
}
