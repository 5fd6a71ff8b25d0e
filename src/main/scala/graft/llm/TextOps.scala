package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators for LLM training-data pipelines over a
  * `documents(doc_id, text, lang, source, n_chars)` relation.
  *
  * Everything here is Column algebra (whole-stage codegen, no UDFs) built
  * from engine-portable primitives (split/replace/md5/array HOFs) so the
  * DuckDB oracle reproduces results bit-for-bit.
  *
  * Scale: all operators are per-row projections or hash-partitioned
  * aggregations/windows keyed by a hash — no global sorts, no driver-side
  * loops; they run unchanged on a 100 TB corpus.
  */
object TextOps {

  /** The one word-k-gram SQL generator every shingle consumer shares
    * (Dedup signatures, Curation gram keys, topNgrams). Operates on a
    * materialized `_w` token-array column; `shortDoc` is the branch for
    * docs under k tokens — `"array(_t)"` (whole text as the single gram,
    * the dedup/decontamination convention, needs a `_t` column) or
    * `"array()"` (no grams, the counting convention). Kept in one place so
    * the tokenization can never silently diverge between operators and
    * their DuckDB oracles. */
  /** The composable k-gram SQL the native [[graft.functions.Kgrams]]
    * expression replaced (kept as the parity reference: `shortDoc` is
    * `array(_t)` for keep-whole-text or `array()` to drop short docs;
    * `MatchExpressionsSpec` pins row-for-row equivalence). */
  private[llm] def kgramSql(k: Int, shortDoc: String): String =
    s"""CASE WHEN size(_w) < $k THEN $shortDoc
       |ELSE transform(sequence(1, size(_w) - ${k - 1}),
       |  i -> concat_ws(' ', ${(0 until k).map(j => s"element_at(_w, i + $j)").mkString(", ")}))
       |END""".stripMargin

  /** whitespace tokens (documents are space-separated) */
  def tokens(text: Column): Column = split(text, " ")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** average token length computed from char count minus separators —
    * integer-exact, oracle-portable */
  def avgTokenLen(text: Column): Column =
    (length(text) - (tokenCount(text) - 1)).cast("double") / tokenCount(text)

  /** document fingerprint: md5 (identical hex in Spark and DuckDB) */
  def fingerprint(text: Column): Column = md5(text)

  /** BPE-ish token count: word pieces + standalone punctuation, the
    * pre-tokenization shape BPE vocabularies segment on. Portable regex
    * (ASCII classes only, same semantics in Java regex and RE2). */
  def bpeishTokenCount(text: Column): Column =
    // array_remove is a plain codegen'd collection function where the
    // filter(t != "") lambda evaluated interpreted; split never yields
    // nulls, so removing every "" is exactly the non-empty count
    size(array_remove(
      split(regexp_replace(text, "([^A-Za-z0-9\\s])", " $1 "), "\\s+"),
      ""))

  /** Polynomial rolling hash over tokens (base 131, Mersenne-ish modulus):
    * an order-sensitive fingerprint — reordered tokens hash differently
    * while md5 of the joined text would too, but this form extends to
    * windowed/rolling fingerprints. Values stay < 2^38, ANSI-safe. */
  def rollingHash(text: Column): Column =
    aggregate(
      tokens(text),
      lit(0L),
      (acc, t) => pmod(
        acc * 131L + pmod(xxhash64(t), lit(2147483647L)),
        lit(2147483647L)))

  private val stopwords = graft.functions.TokenStats.Stopwords

  private[llm] def stopwordHitsW(w: Column): Column =
    // native set-membership count (graft.functions.TokenSetCount) — the
    // filter(isin) chain ran its lambda interpreted per token
    graft.functions.TokenSetCount.tokenSetCount(w, stopwords)

  /** fraction of tokens that are stopwords, over a materialized token array
    * (split the text once per row, not once per metric) */
  def stopwordRatioW(w: Column): Column =
    stopwordHitsW(w).cast("double") / size(w)

  /** fraction of tokens that are stopwords */
  def stopwordRatio(text: Column): Column = stopwordRatioW(tokens(text))

  /** Composite quality score in [0,1]: length credit × stopword sanity.
    * Deterministic IEEE arithmetic only, no rounding — the oracle runs the
    * identical expression tree, so results are bitwise equal. */
  def qualityScoreW(w: Column): Column = {
    val lenCredit = least(size(w).cast("double") / lit(50.0), lit(1.0))
    val sw = stopwordRatioW(w)
    // ideal stopword band ~[0.1, 0.6]: linear falloff outside
    val swCredit = least(
      greatest(lit(1.0) - abs(sw - lit(0.35)) * 2, lit(0.0)), lit(1.0))
    lenCredit * swCredit
  }

  def qualityScore(text: Column): Column = qualityScoreW(tokens(text))

  /** n-gram language-ID heuristic: score stopword-profile hits per language
    * and pick the argmax; 'und' when nothing matches. Profiles are the kind
    * of tiny per-language lists a real langid uses — the synthetic corpus
    * shares one vocabulary, so this demonstrates the operator shape. */
  def langGuessW(w: Column): Column = {
    val profiles = Seq(
      "en" -> Seq("the", "and", "of"),
      "fr" -> Seq("le", "la", "et"),
      "de" -> Seq("der", "und", "das"),
      "es" -> Seq("el", "los", "que"))
    val scored = profiles.map { case (lang, words) =>
      (lang, graft.functions.TokenSetCount.tokenSetCount(w, words))
    }
    val best = scored.tail.foldLeft((lit(scored.head._1), scored.head._2)) {
      case ((bl, bs), (lang, s)) =>
        (when(s > bs, lit(lang)).otherwise(bl), greatest(s, bs))
    }
    when(best._2 > 0, best._1).otherwise(lit("und"))
  }

  def langGuess(text: Column): Column = langGuessW(tokens(text))

  /** Flesch reading-ease readability (Flesch 1948; the curation-stack
    * readability signal, e.g. FineWeb-Edu's difficulty axis): syllables
    * estimated as vowel-group runs per word with a floor of 1 (the
    * standard dictionary-free estimator — "nth"-style words still carry
    * a syllable). The corpus has no sentence markers, so the whole
    * document is ONE sentence (words/sentence = n_words); that term's
    * weight is a constant of the convention and the relative ORDER of
    * scores — what a percentile quality cut consumes — is what the
    * operator delivers. Zero-shuffle per-row projection; round(6) + the
    * portable `[aeiouy]+` regex keep the DuckDB oracle bit-exact. */
  def readability(docs: DataFrame): DataFrame = {
    val w = tokens(coalesce(col("text"), lit("")))
    docs.select(col("doc_id"),
      size(w).cast("bigint").as("n_words"),
      syllables(w).cast("bigint").as("n_syllables"),
      fleschW(w).as("flesch"))
  }

  /** Vowel-group syllable estimate over a token array (floor 1/word). */
  private def syllables(w: Column): Column = aggregate(
    transform(w, x =>
      greatest(size(regexp_extract_all(x, lit("[aeiouy]+"), lit(0))),
        lit(1))),
    lit(0L), (acc, x) => acc + x)

  private def fleschW(w: Column): Column = {
    val n = size(w)
    round(lit(206.835) - lit(1.015) * n.cast("double") -
      lit(84.6) * (syllables(w).cast("double") / n.cast("double")), 6)
  }

  /** The Flesch score as a pure Column over a text column — the
    * `readability` DSL kernel's zero-join, zero-shuffle projection form
    * of [[readability]]. */
  def flesch(text: Column): Column =
    fleschW(tokens(coalesce(text, lit(""))))

  /** Mixed-language detection — the CCNet-stack "language consistency"
    * check (a doc whose segments disagree on language is dropped or
    * routed for splitting, the way per-doc language ID alone cannot
    * detect): fixed NON-overlapping `window`-word segments through
    * [[chunkDocs]], each language-guessed by [[langGuess]]'s n-gram
    * heuristic, rolled up per doc to segment count, distinct guessed
    * languages, the majority language (ties to the alphabetically-first
    * language — `min_by` over (−count, lang), a unique key ⇒
    * partition-order-independent ⇒ hash-oracled) and its share, plus an
    * `is_mixed` flag. `is_mixed` counts only KNOWN languages: an 'und'
    * segment (no profile hits) carries no language signal, and a doc
    * whose segments guess {en, und} is low-signal, not mixed — without
    * this rule most short-segment corpora would flag wholesale.
    *
    * Scale shape: chunking + per-segment guess is the zero-shuffle
    * projection chain; the rollup is two partial aggregations keyed by
    * (doc_id, lang) then doc_id — aggregation state is docs × ≤5
    * languages, never segment-sized. */
  def langMixture(docs: DataFrame, window: Int = 16): DataFrame = {
    // the [[chunkDocs]] windowing (same chunk-count formula the oracle
    // replays, at stride = window), but guessing straight off the
    // token-ARRAY slice — chunkDocs' chunk_text would be array_joined
    // only for langGuess to immediately re-split it, a per-segment
    // join+regex round-trip on the hot path for nothing
    val segs = docs
      .withColumn("_w", split(coalesce(col("text"), lit("")), " "))
      .withColumn("_n", size(col("_w")).cast("bigint"))
      .withColumn("_nc",
        when(col("_n") <= window, lit(1L))
          .otherwise(ceil((col("_n") - window) / lit(window.toDouble))
            .cast("bigint") + 1L))
      .select(col("doc_id"),
        explode(sequence(lit(0L), col("_nc") - 1)).as("_ci"), col("_w"))
      .select(col("doc_id"), langGuessW(
        slice(col("_w"), (col("_ci") * window + 1).cast("int"),
          lit(window))).as("seg_lang"))
    val perLang = segs.groupBy("doc_id", "seg_lang")
      .agg(count(lit(1)).as("_n"))
    perLang.groupBy("doc_id")
      .agg(sum("_n").as("n_segments"),
        count(lit(1)).as("n_langs"),
        sum(when(col("seg_lang") =!= "und", 1L).otherwise(0L))
          .as("_n_known"),
        min_by(col("seg_lang"),
          struct(col("_n") * lit(-1L), col("seg_lang")))
          .as("majority_lang"),
        max("_n").as("_max"))
      .select(col("doc_id"), col("n_segments"), col("n_langs"),
        col("majority_lang"),
        round(col("_max").cast("double") / col("n_segments"), 6)
          .as("majority_frac"),
        (col("_n_known") > 1).as("is_mixed"))
  }

  /** Per-document stats projection. The token array is materialized once per
    * row (`_w`), so token_count / avg_token_len / stopword_ratio / quality
    * share one split instead of re-splitting per metric. */
  def stats(docs: DataFrame): DataFrame =
    docs.withColumn("_w", tokens(col("text")))
      .select(
        col("doc_id"),
        size(col("_w")).cast("bigint").as("token_count"),
        bpeishTokenCount(col("text")).cast("bigint").as("bpe_tokens"),
        length(col("text")).cast("bigint").as("n_chars"),
        ((length(col("text")) - (size(col("_w")) - 1)).cast("double") /
          size(col("_w"))).as("avg_token_len"),
        stopwordRatioW(col("_w")).as("stopword_ratio"),
        qualityScoreW(col("_w")).as("quality"),
        fingerprint(col("text")).as("fingerprint"))

  /** Exact dedup: group identical (normalized) texts by hash; each doc gets
    * its group's keeper (min doc_id) and a dup flag. The window is
    * hash-partitioned by the fingerprint — shuffle on a high-cardinality
    * key, no skew, no global sort (SURVEY §2.8: "exact dedup").
    */
  def exactDedup(docs: DataFrame, normalize: Boolean = true): DataFrame = {
    val t = if (normalize) lower(col("text")) else col("text")
    val w = Window.partitionBy(md5(t))
    docs.select(
      col("doc_id"),
      min(col("doc_id")).over(w).as("dup_group"),
      (col("doc_id") =!= min(col("doc_id")).over(w)).as("is_dup"))
  }

  /** GPT-style sequence packing, shard-local: docs are concatenated in
    * doc_id order WITHIN each shard and cut into fixed `seqLen`-token
    * training sequences (documents may span a cut). Shard = doc_id mod
    * nShards, so the running offset is a window partitioned by shard —
    * parallel per shard, NO global sort (a corpus-wide running sum would be
    * a single-ordered-partition scan at 100 TB). Fully deterministic and
    * replayable: each doc's span is (shard, start_offset, first/last
    * chunk). */
  def seqPack(docs: DataFrame, seqLen: Int = 64, nShards: Int = 8)
      : DataFrame = {
    val w = Window.partitionBy("shard").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .select(col("doc_id"), (col("doc_id") % nShards).as("shard"),
        tokenCount(coalesce(col("text"), lit(""))).cast("bigint")
          .as("n_tokens"))
      .withColumn("start_offset", sum("n_tokens").over(w) - col("n_tokens"))
      .select(col("doc_id"), col("shard"), col("n_tokens"),
        col("start_offset"),
        // floor, not a double->long cast: Spark truncates that cast while
        // DuckDB rounds it, and the oracle must replay bit-for-bit
        floor(col("start_offset") / seqLen).as("first_chunk"),
        floor((col("start_offset") + col("n_tokens") - 1) / seqLen)
          .as("last_chunk"))
  }

  /** One-row context-length packing planner: the card an epoch planner
    * reads before choosing a sequence length — token-count quantiles,
    * how many docs overflow `seqLen` (and how many tokens truncation
    * would cut), the concatenation-packing sequence count
    * (ceil(effective/seqLen), the GPT-style [[seqPack]] lower bound),
    * and the padding waste of the naive one-doc-per-sequence layout at
    * the same length.
    *
    * Quantiles are histogram-exact (type-1: the smallest count with
    * cumulative frequency ≥ ceil(q·n)) — token counts are small
    * integers, so the histogram is value-bounded regardless of corpus
    * rows, the [[graft.llm.Sampling.percentRank]] argument. Scale
    * shape: ONE corpus pass (the histogram aggregation), then windows
    * and one final aggregate over the histogram only.
    */
  def packPlan(docs: DataFrame, seqLen: Int): DataFrame =
    packPlanOf(docs.select(tokenCount(coalesce(col("text"), lit("")))
      .cast("bigint").as("_n")), seqLen)

  /** [[packPlan]] budgeted by REAL tokenizer tokens instead of
    * whitespace words — context-length planning against the tokenizer
    * that will actually consume the corpus. Per-doc counts come from
    * [[Bpe.encodeAgg]]'s broadcast-vocab apply (`n_bpe_tokens`), so the
    * corpus never shuffles by word; wordless docs (empty/NULL text) are
    * zero-filled INTO THE HISTOGRAM from a 1-row corpus count — the
    * card never pays [[Bpe.encode]]'s row-preserving corpus join-back
    * (semantically identical: the per-doc count multiset is the same).
    * Train-or-load the model once ([[Bpe.trainLocal]] /
    * [[Bpe.loadBpeModel]]) and reuse it across cards. OOV words
    * contribute no subword tokens (the encode convention). */
  def packPlanBpe(docs: DataFrame, model: Bpe.BpeModel, seqLen: Int)
      : DataFrame = {
    val hist = Bpe.encodeAgg(docs, model)
      .select(col("_nbpe").cast("bigint").as("_n"))
      .groupBy("_n").agg(count(lit(1)).as("_c"))
    // wordless docs never reach the word explode: merge their 0-token
    // bucket from two 1-row aggregates (all-OOV docs already sit at
    // _n = 0 in the histogram, hence the re-group)
    val zeroFill = docs.agg(count(lit(1)).as("_t"))
      .crossJoin(broadcast(hist.agg(coalesce(sum("_c"), lit(0L)).as("_s"))))
      .select(lit(0L).as("_n"), (col("_t") - col("_s")).as("_c"))
      .filter(col("_c") > 0)
    packPlanHist(
      hist.unionAll(zeroFill).groupBy("_n").agg(sum("_c").as("_c")),
      seqLen)
  }

  /** The shared packing-card arithmetic over an already-computed
    * one-column (`_n` BIGINT) token-count relation. */
  private[llm] def packPlanOf(counts: DataFrame, seqLen: Int): DataFrame =
    packPlanHist(counts.groupBy("_n").agg(count(lit(1)).as("_c")), seqLen)

  /** The packing card over a pre-built (`_n`, `_c`) token-count
    * HISTOGRAM (value-bounded at any corpus size). */
  private[llm] def packPlanHist(histogram: DataFrame, seqLen: Int)
      : DataFrame = {
    require(seqLen > 0, s"seqLen must be positive, got $seqLen")
    val hist = histogram
    val wAll = Window
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val wCum = Window.orderBy("_n")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // the histogram is value-bounded, so the single-partition windows
    // collapse a tiny relation (the Sampling.allRows rationale)
    val cum = hist
      .withColumn("_cum", sum("_c").over(wCum))
      .withColumn("_docs", sum("_c").over(wAll))
    // INTEGER-EXACT everywhere the two engines must agree bit-for-bit:
    // cm >= ceil(pct·n/100) over integers is 100·cm >= pct·n (no float
    // ceil whose product can land 1 ulp past an exact boundary), the
    // packing count is a ceil-div, and the waste fraction goes through
    // a half-up integer ppm (a 6-dp double round here measured a
    // half-case ulp split between Spark and DuckDB)
    def quantile(pct: Int): Column =
      min(when(col("_cum") * 100 >= col("_docs") * pct, col("_n")))
    val base = cum.agg(
      sum("_c").cast("bigint").as("n_docs"),
      sum(col("_n") * col("_c")).cast("bigint").as("total_tokens"),
      quantile(50).cast("bigint").as("p50_tokens"),
      quantile(90).cast("bigint").as("p90_tokens"),
      quantile(99).cast("bigint").as("p99_tokens"),
      lit(seqLen).as("seq_len"),
      coalesce(sum(when(col("_n") > seqLen, col("_c"))), lit(0L))
        .cast("bigint").as("n_overlong"),
      coalesce(sum(greatest(col("_n") - seqLen, lit(0L)) * col("_c")),
        lit(0L)).cast("bigint").as("overflow_tokens"),
      sum(least(col("_n"), lit(seqLen.toLong)) * col("_c"))
        .cast("bigint").as("_eff"))
    base.select(col("n_docs"), col("total_tokens"), col("p50_tokens"),
      col("p90_tokens"), col("p99_tokens"), col("seq_len"),
      col("n_overlong"), col("overflow_tokens"),
      expr(s"(_eff + ${seqLen - 1}) div $seqLen").cast("bigint")
        .as("packed_seqs"),
      (expr(s"((n_docs * $seqLen - _eff) * 2000000 + n_docs * $seqLen) " +
        s"div (2 * n_docs * $seqLen)").cast("double") / 1000000.0)
        .as("pad_waste_pct"))
  }

  /** RAG-style sliding-window chunker: each document becomes overlapping
    * `chunkSize`-token chunks every `stride` tokens (overlap =
    * chunkSize − stride), the standard preprocessing for embedding /
    * retrieval pipelines (cf. reference/DSL.md text-source training — the
    * unit fed to an embedding model is the chunk, not the document).
    *
    * Chunk count per doc = 1 if n ≤ chunkSize else
    * ceil((n − chunkSize)/stride) + 1 — the textbook formula: the last
    * window may be short but every token is covered and no window starts
    * past the end. Plan shape: split once, explode a `sequence` of chunk
    * indices, slice the materialized token array — a pure narrow
    * projection, ZERO shuffles at any corpus size (pinned in
    * `PlanAuditSpec`); output bytes ≈ input × (chunkSize/stride). */
  def chunkDocs(docs: DataFrame, chunkSize: Int = 32, stride: Int = 24)
      : DataFrame = {
    require(chunkSize > 0 && stride > 0 && stride <= chunkSize,
      s"need 0 < stride <= chunkSize, got stride=$stride chunkSize=$chunkSize")
    docs
      .withColumn("_w", split(coalesce(col("text"), lit("")), " "))
      .withColumn("_n", size(col("_w")).cast("bigint"))
      // ceil over an explicit double divide: Spark and DuckDB land on the
      // same doubles, so the chunk count replays exactly in the oracle
      .withColumn("_nc",
        when(col("_n") <= chunkSize, lit(1L))
          .otherwise(ceil((col("_n") - chunkSize) / lit(stride.toDouble))
            .cast("bigint") + 1L))
      .select(col("doc_id"),
        explode(sequence(lit(0L), col("_nc") - 1)).as("chunk_idx"),
        col("_w"))
      .select(col("doc_id"), col("chunk_idx"),
        (col("chunk_idx") * stride).as("chunk_start"),
        size(slice(col("_w"), (col("chunk_idx") * stride + 1).cast("int"),
          lit(chunkSize))).cast("bigint").as("n_tokens"),
        array_join(slice(col("_w"),
          (col("chunk_idx") * stride + 1).cast("int"), lit(chunkSize)), " ")
          .as("chunk_text"))
  }

  /** Frequency vocabulary fit — the tokenizer-training step of a data
    * pipeline: the `vocabSize` most frequent tokens, ids 1..V assigned in
    * (count desc, token asc) order (deterministic ties). The corpus-wide
    * count is a partial-aggregated groupBy; the top-V cut is sort+limit
    * (TakeOrderedAndProject — each partition ships only its own top V);
    * the single-partition rank window then runs over the ALREADY-BOUNDED
    * V-row table, never the corpus (id 0 is reserved for OOV). */
  def buildVocab(docs: DataFrame, vocabSize: Int = 1000): DataFrame = {
    require(vocabSize > 0, s"vocabSize must be positive, got $vocabSize")
    docs
      .select(explode(split(coalesce(col("text"), lit("")), " ")).as("token"))
      .groupBy("token").agg(count(lit(1)).as("n_occurrences"))
      .orderBy(col("n_occurrences").desc, col("token").asc)
      .limit(vocabSize)
      .withColumn("token_id", row_number().over(
          Window.orderBy(col("n_occurrences").desc, col("token").asc))
        .cast("bigint"))
  }

  /** Tokenizer apply: every doc's tokens mapped to vocab ids in order
    * (OOV → 0), plus token/OOV counts. The vocabulary is broadcast (V is
    * bounded by construction), so the only shuffle is the per-doc
    * reassembly keyed by doc_id; ids are emitted as a space-joined string
    * — the densest engine-portable form of the id sequence. */
  def encodeDocs(docs: DataFrame, vocab: DataFrame): DataFrame = {
    docs
      .withColumn("_w", split(coalesce(col("text"), lit("")), " "))
      .select(col("doc_id"), posexplode(col("_w")).as(Seq("pos", "token")))
      .join(broadcast(vocab.select(col("token"), col("token_id"))),
        Seq("token"), "left")
      .withColumn("_id", coalesce(col("token_id"), lit(0L)))
      .groupBy("doc_id")
      .agg(count(lit(1)).cast("bigint").as("n_tokens"),
        sum(when(col("token_id").isNull, 1L).otherwise(0L)).as("n_oov"),
        expr("array_join(transform(array_sort(collect_list(" +
          "struct(pos, _id))), x -> cast(x._id as string)), ' ')")
          .as("ids_str"))
  }

  /** Corpus-wide most-frequent word k-grams: explode → partial-aggregated
    * count → sort+limit (TakeOrderedAndProject — each partition ships only
    * its own top n). Ties break on the gram text for determinism. */
  def topNgrams(docs: DataFrame, k: Int = 3, n: Int = 20): DataFrame = {
    docs
      .select(explode(graft.functions.Kgrams.kgrams(
        coalesce(col("text"), lit("")), k, keepShortWhole = false)).as("gram"))
      .groupBy("gram").agg(count(lit(1)).as("n_occurrences"))
      .orderBy(col("n_occurrences").desc, col("gram").asc)
      .limit(n)
  }

  /** Distinct-n diversity card (Li et al. 2016's distinct-1/2/3, the
    * standard templated-/generated-text detector at corpus granularity):
    * one row per n with total and distinct word n-gram counts and their
    * ratio — natural corpora keep distinct-2/3 high, boilerplate and
    * model-generated spam collapse them.
    *
    * ONE corpus pass for every n: the per-n gram arrays are built in the
    * same projection, tagged with n, and flattened before a single
    * (n, gram)-keyed map-side-combined count — no per-n rescan. The
    * rollup then runs on the (n × distinct-gram)-bounded table. Short
    * docs contribute no grams for an n they can't fill (the counting
    * convention, [[topNgrams]]). */
  def distinctNgramCard(docs: DataFrame, ks: Seq[Int] = Seq(1, 2, 3))
      : DataFrame = {
    require(ks.nonEmpty && ks.forall(_ >= 1),
      s"n-gram orders must be >= 1, got $ks")
    val t = coalesce(col("text"), lit(""))
    val tagged = ks.map(k =>
      transform(graft.functions.Kgrams.kgrams(t, k, keepShortWhole = false),
        g => struct(lit(k).as("k"), g.as("g"))))
    docs.select(explode(flatten(array(tagged: _*))).as("_kg"))
      .select(col("_kg.k").as("k"), col("_kg.g").as("_g"))
      .groupBy("k", "_g").agg(count(lit(1)).as("_c"))
      .groupBy("k").agg(
        sum("_c").cast("bigint").as("total_ngrams"),
        count(lit(1)).cast("bigint").as("distinct_ngrams"))
      .select(col("k"), col("total_ngrams"), col("distinct_ngrams"),
        round(col("distinct_ngrams").cast("double") /
          col("total_ngrams").cast("double"), 6).as("distinct_ratio"))
  }

  /** Per-group HyperLogLog distinct-token card (Flajolet et al. 2007) —
    * THE bounded-state distinct counter at 100 TB, here built
    * DETERMINISTICALLY from md5 bits so an independent engine replays
    * the registers themselves: register j = the hash's first
    * `regHexChars` hex chars, rank = leading-zero count of the next 32
    * bits + 1 (integer-exact via the binary-string length — no float
    * log2 anywhere in register construction). The estimator applies the
    * paper's small-range (linear counting) and large-range (32-bit
    * collision) corrections.
    *
    * The card reports the EXACT distinct count alongside as the audit
    * column: `n_exact` pays the (group, token)-keyed distinct shuffle —
    * vocabulary-scale state, fixture-tier honesty about sketch error.
    * The production path at 100 TB is the register branch alone: a
    * map-side-combined (group, register) max with state ≤ groups × m —
    * no shuffle ever carries tokens, and sketches merge across shards /
    * days / corpora by register-wise max (the property count(distinct)
    * can never have).
    *
    * Register-sum determinism: every 2^-rank term and every partial sum
    * is an exact dyadic rational well inside double's 53 bits (rank ≤
    * 33, m ≤ 65536), so the register sum is order-independent and
    * engine-exact; only the final ln-based corrections are float, and
    * they live behind round(6). */
  def hllCard(docs: DataFrame, groupCol: String = "source",
      regHexChars: Int = 2): DataFrame = {
    require(regHexChars >= 1 && regHexChars <= 4,
      s"regHexChars must be in [1, 4] (16..65536 registers), " +
        s"got $regHexChars")
    val m = math.pow(16, regHexChars).toInt
    val tok = docs.select(col(groupCol).as("grp"),
      explode(tokens(coalesce(col("text"), lit("")))).as("_w"))
    val regs = tok.select(col("grp"), md5(col("_w")).as("_h"))
      .select(col("grp"),
        conv(substring(col("_h"), 1, regHexChars), 16, 10).cast("long")
          .as("_j"),
        conv(substring(col("_h"), regHexChars + 1, 8), 16, 10).cast("long")
          .as("_wnd"))
      .withColumn("_rho", when(col("_wnd") === 0, lit(33))
        .otherwise(lit(33) - length(bin(col("_wnd")))))
      .groupBy("grp", "_j").agg(max("_rho").as("_mj"))
    val exact = tok.groupBy("grp")
      .agg(countDistinct("_w").cast("bigint").as("n_exact"))
    hllEstimator(regs, m).join(broadcast(exact), Seq("grp"))
      .select(col("grp").as(groupCol), col("n_exact"),
        col("v_empty"), col("hll_est"),
        round((col("hll_est") - col("n_exact")) /
          col("n_exact").cast("double"), 6).as("rel_err"))
  }

  /** The estimator tail of [[hllCard]] over a finished register table
    * (grp, _j, _mj) — split out because register tables ARRIVE from
    * more than one place: the batch pass, and drained STREAMING state
    * (registers merge by max across micro-batches exactly as they do
    * across shards; `q_stream_hll` pins that the two agree under the
    * hash gate). */
  private[graft] def hllEstimator(regs: DataFrame, m: Int): DataFrame = {
    val alphaM2: Column = (m match {
      case 16 => lit(0.673)
      case _  => lit(0.7213) / (lit(1.0) + lit(1.079) / lit(m))
    }) * lit(m) * lit(m)
    val two32 = 4294967296.0
    regs.groupBy("grp").agg(
        count(lit(1)).as("_used"),
        sum(pow(lit(2.0), -col("_mj"))).as("_s"))
      .withColumn("_v", lit(m) - col("_used"))
      .withColumn("_e", alphaM2 / (col("_s") + col("_v")))
      .withColumn("hll_est", round(
        when(col("_e") <= lit(2.5 * m) && col("_v") > 0,
          lit(m) * log(lit(m.toDouble) / col("_v")))
          .when(col("_e") > lit(two32 / 30.0),
            lit(-two32) * log(lit(1.0) - col("_e") / lit(two32)))
          .otherwise(col("_e")), 6))
      .select(col("grp"), col("_v").cast("bigint").as("v_empty"),
        col("hll_est"))
  }

  /** Per-doc character-class composition — the cheap encoding-damage /
    * wrong-content signal beside [[charStats]]' entropy: shares of
    * lowercase letters, digits, spaces, and everything else. Base64
    * spills read digit-heavy, binary spills read other-heavy, and a
    * prose corpus holds a tight (letter, space) band. Counts via
    * length-difference after class removal — integer-exact, zero
    * shuffle, trivially oracle-portable (no regex-engine count
    * semantics involved). */
  def scriptShares(docs: DataFrame): DataFrame = {
    val t = coalesce(col("text"), lit(""))
    val n = length(t)
    def removed(pattern: String): Column =
      n - length(regexp_replace(t, pattern, ""))
    val letters = removed("[a-z]")
    val digits = removed("[0-9]")
    val spaces = removed(" ")
    docs.select(col("doc_id"), n.cast("bigint").as("n_chars"),
      when(n === 0, lit(null).cast("double"))
        .otherwise(round(letters.cast("double") / n, 6))
        .as("letter_frac"),
      when(n === 0, lit(null).cast("double"))
        .otherwise(round(digits.cast("double") / n, 6)).as("digit_frac"),
      when(n === 0, lit(null).cast("double"))
        .otherwise(round(spaces.cast("double") / n, 6)).as("space_frac"),
      when(n === 0, lit(null).cast("double"))
        .otherwise(round((n - letters - digits - spaces).cast("double")
          / n, 6)).as("other_frac"))
  }

  /** Corpus n-gram entropy card — the model-free predictability read
    * beside [[Curation.lmPerplexity]]'s fitted one: unigram entropy
    * H(W), bigram entropy H(W1,W2), and the conditional entropy
    * H(W2|W1) = H(W1,W2) − H(W1) — how many nats the previous token
    * buys. Natural text sits well below independence
    * (H(W2|W1) ≪ H(W)); templated/generated spam collapses the gap
    * from one side, shuffled or encrypted text from the other.
    *
    * Entropy terms follow the [[charStats]] DECIMAL discipline:
    * round(−p·ln p, 12) summed exactly (order-independent), final
    * round(6). Two count tables (vocabulary- and distinct-bigram-
    * bounded — the same envelope the bigram LM fit pays); every window
    * rides them, never the corpus. */
  def gramEntropy(docs: DataFrame): DataFrame = {
    val w = tokens(coalesce(col("text"), lit("")))
    val uni = docs.select(explode(w).as("_w"))
      .groupBy("_w").agg(count(lit(1)).as("_c"))
    val bi = docs.select(explode(graft.functions.Kgrams.kgrams(
        coalesce(col("text"), lit("")), 2, keepShortWhole = false))
        .as("_g"))
      .groupBy("_g").agg(count(lit(1)).as("_c"))
    def entropy(counts: DataFrame, nName: String, dName: String,
        hName: String): DataFrame = {
      val wAll = Window.partitionBy(lit(0)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
      counts.withColumn("_n", sum("_c").over(wAll))
        .agg(
          max("_n").cast("bigint").as(nName),
          count(lit(1)).cast("bigint").as(dName),
          round(sum(round(-(col("_c").cast("double") / col("_n")) *
              log(col("_c").cast("double") / col("_n")), 12)
            .cast("decimal(28,12)")).cast("double"), 6).as(hName))
    }
    entropy(uni, "n_tokens", "distinct_unigrams", "h_unigram")
      .crossJoin(broadcast(
        entropy(bi, "n_bigrams", "distinct_bigrams", "h_bigram")))
      .withColumn("h_cond",
        round(col("h_bigram") - col("h_unigram"), 6))
  }

  /** Quality-filter threshold sweep — the curve a curation engineer
    * reads BEFORE fixing a cutoff ([[Dedup.lshSensitivity]]'s sibling
    * for score filters): for every 10-point Flesch bucket, the docs and
    * tokens that SURVIVE a "score ≥ bucket floor" filter and their
    * corpus shares — pick the threshold at the knee, knowing exactly
    * what it costs in tokens, not just docs (the two diverge whenever
    * quality correlates with length).
    *
    * One zero-shuffle score projection → a ~25-bucket map-side agg; the
    * cumulative-from-the-top windows ride the bucket card only. */
  def filterSweep(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = tokens(coalesce(col("text"), lit("")))
    val binned = docs
      .select(floor(fleschW(w) / 10).cast("long").as("_b"),
        size(w).cast("long").as("_t"))
      .groupBy("_b").agg(
        count(lit(1)).as("_n"), sum("_t").as("_tk"))
    val wGe = Window.partitionBy(lit(0)).orderBy(col("_b").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(lit(0))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    binned
      .withColumn("_nGe", sum("_n").over(wGe))
      .withColumn("_tGe", sum("_tk").over(wGe))
      .withColumn("_nAll", sum("_n").over(wAll))
      .withColumn("_tAll", sum("_tk").over(wAll))
      .select((col("_b") * 10).cast("bigint").as("threshold"),
        col("_nGe").cast("bigint").as("n_docs_ge"),
        col("_tGe").cast("bigint").as("n_tokens_ge"),
        round(col("_nGe").cast("double") / col("_nAll"), 6)
          .as("doc_share"),
        round(col("_tGe").cast("double") / col("_tAll"), 6)
          .as("token_share"))
  }

  /** Language-ID confusion matrix — the audit of [[langGuess]] against
    * the labeled `lang` column: one row per (label, guess) cell with
    * count and within-label share (the per-language recall lives on the
    * diagonal). The card that says WHERE the heuristic fails — e.g.
    * "12% of 'de' docs guess 'und'" — before anyone trusts a per-lang
    * mixture built on it.
    *
    * One zero-shuffle guess projection → a map-side (label, guess) agg
    * bounded by langs²; the share window rides that table only. */
  def langidConfusion(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    docs.select(col("lang"),
        langGuess(coalesce(col("text"), lit(""))).as("lang_guess"))
      .groupBy("lang", "lang_guess")
      .agg(count(lit(1)).cast("bigint").as("n"))
      .withColumn("share", round(col("n").cast("double") /
        sum("n").over(Window.partitionBy("lang")
          .rowsBetween(Window.unboundedPreceding,
            Window.unboundedFollowing)).cast("double"), 6))
  }

  /** Length-bucketed batching plan — the padded-batch waste card
    * ([[seqPack]] plans concatenation packing; THIS plans the
    * pad-to-batch-max training reality): assign every doc to its
    * next-power-of-two token-length bucket and report, per bucket, the
    * padding waste if batches are drawn within the bucket (every doc
    * pads to the bucket ceiling), plus a NULL-bucket TOTAL row costing
    * the naive alternative — every doc padded to the corpus max. The
    * gap between the bucket-sum and the total row is the % of compute
    * length-bucketed batching saves; all-integer except the waste
    * ratios.
    *
    * The bucket ceiling is integer-exact: shiftleft(1, bits(n−1)) via
    * the binary-string length (the [[hllCard]] device — no float log2).
    * One corpus projection → a map-side agg with ~log2(max_len) groups;
    * nothing downstream exceeds the bucket-count card. */
  def lengthBucketPlan(docs: DataFrame): DataFrame = {
    val n = tokenCount(coalesce(col("text"), lit(""))).cast("long")
    // 2^bits is a dyadic double well under 53 bits -> the long cast is
    // exact (the functions-API shiftleft only takes a literal shift)
    val ceilPow2 = when(n <= 1, lit(1L))
      .otherwise(pow(lit(2.0), length(bin(n - 1)).cast("double"))
        .cast("long"))
    val base = docs.select(ceilPow2.as("bucket_max"), n.as("_n"))
    val perBucket = base.groupBy("bucket_max").agg(
      count(lit(1)).cast("bigint").as("n_docs"),
      sum("_n").cast("bigint").as("n_tokens"))
    val total = base.agg(
      count(lit(1)).cast("bigint").as("n_docs"),
      sum("_n").cast("bigint").as("n_tokens"),
      max("_n").as("_max"))
      .select(lit(null).cast("bigint").as("bucket_max"),
        col("n_docs"), col("n_tokens"),
        (col("n_docs") * col("_max")).cast("bigint").as("padded_tokens"))
    perBucket
      .select(col("bucket_max"), col("n_docs"), col("n_tokens"),
        (col("n_docs") * col("bucket_max")).cast("bigint")
          .as("padded_tokens"))
      .unionByName(total)
      .select(col("bucket_max"), col("n_docs"), col("n_tokens"),
        col("padded_tokens"),
        (col("padded_tokens") - col("n_tokens")).cast("bigint")
          .as("waste_tokens"),
        round((col("padded_tokens") - col("n_tokens")).cast("double") /
          col("padded_tokens").cast("double"), 6).as("waste_frac"))
  }

  /** Count-Min sketch heavy-hitter card (Cormode & Muthukrishnan 2005)
    * — [[hllCard]]'s frequency twin, completing the bounded-state sketch
    * tier: a depth×width counter grid (md5-salted buckets, integer
    * increments) estimates any token's frequency as the MIN over its
    * depth counters, with the classic ONE-SIDED guarantee est ≥ exact
    * (collisions only ever inflate). The card reports the exact top-N
    * tokens with their sketch estimates and overcounts — all-integer
    * end to end, so the oracle replays the sketch bit-for-bit.
    *
    * Scale shape: the sketch build is a map-side-combined (row, bucket)
    * agg with state = depth×width regardless of corpus size, and
    * sketches merge by cell-wise ADD across shards/days (the mergeable
    * property exact counts lack at stream boundaries). The exact top-N
    * is the audit side (token-keyed agg + TakeOrdered); production at
    * 100 TB keeps the sketch and drops the audit columns. */
  private[graft] def cmsBucket(r: Int, tok: Column, width: Int): Column =
    conv(substring(md5(concat(lit(s"$r:"), tok)), 1, 8), 16, 10)
      .cast("long") % width

  def cmsTopK(docs: DataFrame, depth: Int = 4, width: Int = 256,
      topN: Int = 20): DataFrame = {
    require(depth >= 1 && depth <= 8, s"depth must be in [1, 8], got $depth")
    require(width > 0, s"width must be positive, got $width")
    require(topN >= 1, s"topN must be >= 1, got $topN")
    val tok = docs.select(
      explode(tokens(coalesce(col("text"), lit("")))).as("_w"))
    val sketch = tok.select(explode(array((0 until depth).map(r =>
        struct(lit(r).as("_r"), cmsBucket(r, col("_w"), width).as("_b")))
        : _*)).as("_rb"))
      .groupBy(col("_rb._r").as("_r"), col("_rb._b").as("_b"))
      .agg(count(lit(1)).as("_cnt"))
    val top = tok.groupBy("_w")
      .agg(count(lit(1)).cast("bigint").as("n_exact"))
      .orderBy(col("n_exact").desc, col("_w").asc).limit(topN)
    cmsEstimate(sketch, top, depth, width)
  }

  /** The probe/estimate tail of [[cmsTopK]] over a finished cell grid
    * (_r, _b, _cnt) — split out because grids ARRIVE from more than one
    * place: the batch pass, and drained STREAMING state (cells merge by
    * SUM across micro-batches exactly as across shards; `q_stream_cms`
    * pins the agreement under the hash gate). */
  private[graft] def cmsEstimate(sketch: DataFrame, top: DataFrame,
      depth: Int, width: Int): DataFrame = {
    val probes = top.select(col("_w"), col("n_exact"),
      explode(array((0 until depth).map(r =>
        struct(lit(r).as("_r"), cmsBucket(r, col("_w"), width).as("_b")))
        : _*)).as("_rb"))
      .select(col("_w"), col("n_exact"),
        col("_rb._r").as("_r"), col("_rb._b").as("_b"))
    probes.join(broadcast(sketch), Seq("_r", "_b"))
      .groupBy("_w", "n_exact")
      .agg(min("_cnt").cast("bigint").as("cms_est"))
      .select(col("_w").as("token"), col("n_exact"), col("cms_est"),
        (col("cms_est") - col("n_exact")).cast("bigint").as("overcount"))
      .orderBy(col("n_exact").desc, col("token").asc)
  }

  /** Character-level gibberish/encoding-damage card: codepoint count,
    * distinct codepoints, dominant-codepoint share, and Shannon entropy of
    * each document's character distribution. Natural text per script sits
    * in a narrow entropy band; base64/binary spills sit high, run damage
    * ("aaaa…") sits low — the standard char-level quality filter that no
    * token statistic expresses.
    *
    * ONE zero-shuffle projection over the fused
    * [[graft.functions.CharStats]] pass (the composable form would explode
    * the corpus to (doc, char) rows and shuffle character counts at corpus
    * scale for a per-row function of the text). Entropy replays exactly in
    * DuckDB via the catalog's DECIMAL-summed-terms convention. */
  def charStats(docs: DataFrame): DataFrame =
    docs
      .withColumn("_s", graft.functions.CharStats.charStats(
        coalesce(col("text"), lit(""))))
      .select(col("doc_id"),
        col("_s.n_chars").as("n_chars"),
        col("_s.n_distinct_chars").as("n_distinct_chars"),
        col("_s.top_char_frac").as("top_char_frac"),
        col("_s.char_entropy").as("char_entropy"))

  /** Corpus vocabulary-growth card (one row): token/type totals,
    * type-token ratio, hapax legomena share (Heaps'-law tail mass — the
    * "how much of this corpus is words seen once" signal that predicts
    * tokenizer OOV pressure), head coverage of the top-10 words, and the
    * Zipf log-log slope fitted by OLS over the top-`zipfK` ranks (natural
    * corpora fit ≈ −1; machine-generated or templated corpora deviate —
    * a one-number corpus-health check).
    *
    * Scale shape: ONE corpus explode → map-side-combined word count (the
    * only corpus-sized work); the count table is vocabulary-bounded and
    * persisted for its two consumers (totals aggregate; top-K rank). The
    * rank cut is sort+limit (TakeOrderedAndProject — each partition ships
    * its own top K), and the OLS runs over the K-row table only, with
    * every sum a 12-dp DECIMAL (order-independent, so the slope replays
    * exactly in DuckDB: slope = (K·Σxy − Σx·Σy)/(K·Σx² − (Σx)²) over
    * x = ln rank, y = ln count). */
  def vocabCard(docs: DataFrame, zipfK: Int = 100): DataFrame = {
    require(zipfK >= 2, s"zipfK must be at least 2, got $zipfK")
    val dec = org.apache.spark.sql.types.DecimalType(28, 12)
    val counts = PipelineCaches.track(docs
      .select(explode(split(coalesce(col("text"), lit("")), " ")).as("token"))
      .groupBy("token").agg(count(lit(1)).as("c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val totals = counts.agg(
      sum(col("c")).cast("bigint").as("n_tokens"),
      count(lit(1)).cast("bigint").as("n_types"),
      sum(when(col("c") === 1L, 1L).otherwise(0L)).cast("bigint")
        .as("hapax_types"))
    val ranked = counts
      .orderBy(col("c").desc, col("token").asc)
      .limit(zipfK)
      .withColumn("r", row_number().over(
          Window.orderBy(col("c").desc, col("token").asc))
        .cast("bigint"))
    val z = ranked
      .withColumn("_lx", log(col("r").cast("double")))
      .withColumn("_ly", log(col("c").cast("double")))
      .agg(
        count(lit(1)).cast("bigint").as("zipf_k"),
        sum(round(col("_lx"), 12).cast(dec)).cast("double").as("_sx"),
        sum(round(col("_ly"), 12).cast(dec)).cast("double").as("_sy"),
        sum(round(col("_lx") * col("_ly"), 12).cast(dec)).cast("double")
          .as("_sxy"),
        sum(round(col("_lx") * col("_lx"), 12).cast(dec)).cast("double")
          .as("_sxx"),
        sum(when(col("r") <= 10L, col("c")).otherwise(0L)).cast("bigint")
          .as("_top10"))
    totals.crossJoin(z).select(
      col("n_tokens"), col("n_types"),
      round(col("n_types").cast("double") /
        col("n_tokens").cast("double"), 6).as("ttr"),
      col("hapax_types"),
      round(col("hapax_types").cast("double") /
        col("n_types").cast("double"), 6).as("hapax_share"),
      round(col("_top10").cast("double") /
        col("n_tokens").cast("double"), 6).as("top10_coverage"),
      col("zipf_k"),
      round((col("zipf_k").cast("double") * col("_sxy") -
          col("_sx") * col("_sy")) /
        (col("zipf_k").cast("double") * col("_sxx") -
          col("_sx") * col("_sx")), 6).as("zipf_slope"))
  }

  /** Vocabulary-overlap card between two corpora — ONE row: type counts,
    * shared/union types, vocabulary Jaccard, and BOTH directed
    * add-α-smoothed unigram KL divergences over the union vocabulary
    * (the distribution-shift signal between a train mix and an eval
    * domain, or between two crawl snapshots; the exact-vocabulary
    * complement of [[Dedup.corpusOverlapSketch]]'s MinHash estimate).
    * P_x(w) = (c_x(w) + α) / (N_x + α·V) with V = union vocabulary —
    * smoothed over the SAME support, so both KLs are finite and sum
    * their full mass.
    *
    * Cross-engine determinism: KL terms p·ln(p/q) round to 12 dp and
    * sum as DECIMAL (the entropy-card convention). Scale shape: one
    * map-side-combined word count per corpus (vocab-bounded), a
    * vocab-sized full outer join, totals as whole-relation windows on
    * that table, then the 1-row rollup — the corpora are each read
    * once and never shuffled by row. */
  def vocabOverlap(a: DataFrame, b: DataFrame,
      alpha: Double = 0.5): DataFrame = {
    require(alpha > 0, s"smoothing alpha must be positive, got $alpha")
    val dec = org.apache.spark.sql.types.DecimalType(28, 12)
    def wc(d: DataFrame, as: String): DataFrame = d
      .select(explode(split(coalesce(col("text"), lit("")), " ")).as("token"))
      .groupBy("token").agg(count(lit(1)).as(as))
    // the union-vocab table is persisted for its two consumers (the
    // totals and the term sums): an allRows window here would funnel the
    // whole VOCABULARY through one partition — fine for domain-sized
    // tables, wrong for the billion-type vocabulary a web-scale corpus
    // carries. Totals are a 1-row broadcast instead.
    val joined = PipelineCaches.track(
      wc(a, "_ca").join(wc(b, "_cb"), Seq("token"), "full_outer")
        .select(col("token"),
          coalesce(col("_ca"), lit(0L)).as("_ca"),
          coalesce(col("_cb"), lit(0L)).as("_cb"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val totals = joined.agg(
      count(lit(1)).as("_v"),
      sum("_ca").as("_na"),
      sum("_cb").as("_nb"))
    val w = joined.crossJoin(broadcast(totals))
    val pa = (col("_ca").cast("double") + alpha) /
      (col("_na").cast("double") + lit(alpha) * col("_v").cast("double"))
    val pb = (col("_cb").cast("double") + alpha) /
      (col("_nb").cast("double") + lit(alpha) * col("_v").cast("double"))
    w.withColumn("_tab", round(pa * log(pa / pb), 12).cast(dec))
      .withColumn("_tba", round(pb * log(pb / pa), 12).cast(dec))
      .agg(
        sum(when(col("_ca") > 0, 1L).otherwise(0L)).cast("bigint")
          .as("n_types_a"),
        sum(when(col("_cb") > 0, 1L).otherwise(0L)).cast("bigint")
          .as("n_types_b"),
        sum(when(col("_ca") > 0 && col("_cb") > 0, 1L).otherwise(0L))
          .cast("bigint").as("shared_types"),
        max(col("_v")).cast("bigint").as("union_types"),
        max(col("_na")).cast("bigint").as("n_tokens_a"),
        max(col("_nb")).cast("bigint").as("n_tokens_b"),
        sum(col("_tab")).cast("double").as("_klab"),
        sum(col("_tba")).cast("double").as("_klba"))
      .select(col("n_types_a"), col("n_types_b"), col("shared_types"),
        col("union_types"),
        round(col("shared_types").cast("double") /
          col("union_types").cast("double"), 6).as("jaccard_vocab"),
        col("n_tokens_a"), col("n_tokens_b"),
        round(col("_klab"), 6).as("kl_ab"),
        round(col("_klba"), 6).as("kl_ba"))
  }
}
