package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Unigram-LM (SentencePiece-style) tokenizer trainer — the OTHER
  * production tokenizer family beside [[Bpe]] (Kudo 2018, "Subword
  * Regularization"; r14 verdict task 5): a vocabulary of subword pieces
  * with log-probabilities, fit by hard EM over a seeded initial
  * vocabulary — each round Viterbi-segments every distinct word under
  * the current probabilities, recounts piece usage, and re-estimates
  * add-one-smoothed probabilities.
  *
  * Everything replays in DuckDB (the `q_unigram_lm` oracle unrolls the
  * FULL trajectory — seeding, every DP position of every EM round, both
  * re-estimations — as generated CTEs, the [[Bpe]] merge-loop / the
  * logisticQuality gradient-step discipline):
  *
  *   - scores are DECIMAL(18,6) sums of 6-dp-rounded log probs — exact,
  *     order-independent, engine-identical;
  *   - the per-position Viterbi argmax breaks ties on (score DESC,
  *     segmentation-string DESC) — a total order both engines share;
  *   - probabilities are round(ln((cnt+1)/(T+V)), 6) over exact integer
  *     counts (add-one smoothing keeps every piece alive, so the
  *     vocabulary SET is fixed by seeding and no -∞ ever appears).
  *
  * Scale shape: the corpus is touched ONCE (word-frequency aggregation,
  * persisted); seeding is a substring explode bounded by word length ×
  * maxPieceLen over the DISTINCT-word relation; each EM round is one
  * broadcast join (vocabulary-bounded piece table) + the per-word
  * Viterbi fold (a local O(len × maxPieceLen) HOF, no shuffle) + one
  * piece-keyed partial aggregation collecting ≤ |V| rows of driver
  * metadata — the [[Curation.logisticQuality]] bounded-state loop.
  * Seeding selects via a distributed TakeOrderedAndProject (the
  * substring-count relation is data-dependent — no global window
  * anywhere in training); the only `partitionBy(lit(0))` window left
  * is the release card's rank over the vocabulary-bounded final table.
  */
object Unigram {

  /** pieces: (piece, n_uses, logp DECIMAL(18,6)) — final-round usage
    * counts and smoothed log probs (bounded, broadcasts everywhere);
    * vocab: (word, freq, seg, n_tokens) — every training word's Viterbi
    * segmentation under the FINAL probabilities (the apply table
    * [[Bpe.fertilityCard]]'s vocab join consumes). */
  case class UnigramModel(
      pieces: DataFrame, vocab: DataFrame, maxPieceLen: Int)

  /** (word, freq) over the trainable alphabet — the [[Bpe]] convention
    * (same split, same `^[a-z0-9]+$` filter, identical in the oracle). */
  private[graft] def wordFreq(docs: DataFrame): DataFrame =
    docs.select(explode(split(coalesce(col("text"), lit("")), " "))
        .as("word"))
      .filter(col("word").rlike("^[a-z0-9]+$"))
      .groupBy("word").agg(count(lit(1)).cast("bigint").as("freq"))

  /** All (piece, cnt) substrings of length ≤ maxPieceLen, freq-weighted
    * (every occurrence position counts — the ESA-seeding equivalent). */
  private def substringCounts(words: DataFrame, maxPieceLen: Int)
      : DataFrame =
    words
      .withColumn("_i", explode(sequence(lit(0), length(col("word")) - 1)))
      .withColumn("_l", explode(sequence(lit(1),
        least(lit(maxPieceLen), length(col("word")) - col("_i")))))
      .select(col("word").substr(col("_i") + 1, col("_l")).as("piece"),
        col("freq"))
      .groupBy("piece").agg(sum("freq").cast("bigint").as("cnt"))

  /** Seed vocabulary: the top `seedSize` substrings by
    * (cnt DESC, piece ASC) ∪ every single character. The selection is
    * `orderBy(...).limit(seedSize)` — a distributed
    * TakeOrderedAndProject over the DATA-dependent substring-count
    * relation (per-partition heaps + one bounded merge), never a
    * single-partition `row_number` window: at 100 TB the distinct
    * ≤`maxPieceLen`-char piece space is tens of millions of rows and a
    * global window would funnel all of them through one task.
    * PlanAuditSpec pins the TakeOrderedAndProject shape. */
  private[graft] def seedSelect(words: DataFrame, maxPieceLen: Int,
      seedSize: Int): DataFrame = {
    val sub = substringCounts(words, maxPieceLen)
    sub.orderBy(col("cnt").desc, col("piece").asc).limit(seedSize)
      .select("piece", "cnt")
      .unionByName(sub.filter(length(col("piece")) === 1)
        .select("piece", "cnt"))
      .distinct()
  }

  /** Viterbi-best segmentation of each (word, freq) row under a
    * (piece, logp) vocabulary: per word, a LOCAL dynamic program over
    * positions — state(j) = best (score, seg) covering the first j
    * chars, candidates extend state(j−l) by the length-l piece ending
    * at j when the vocabulary holds it. One broadcast join attaches the
    * word's piece hits as a bounded (position-key → logp) map; the fold
    * itself is a pure projection (no shuffle, candidates ≤ maxPieceLen
    * per position). Ties break on (score, seg) struct order — max
    * score, then lexicographically-largest segmentation — the exact
    * total order the oracle's `ORDER BY s DESC, seg DESC` replays.
    * Words whose characters fall outside the vocabulary keep a NULL
    * seg (possible only when applying to NEW text — training seeds
    * every corpus character). */
  private[graft] def viterbiSegment(words: DataFrame, vocab: DataFrame,
      maxPieceLen: Int): DataFrame = {
    val k = maxPieceLen + 1
    val cand = words.select(col("word"))
      .withColumn("_i", explode(sequence(lit(0), length(col("word")) - 1)))
      .withColumn("_l", explode(sequence(lit(1),
        least(lit(maxPieceLen), length(col("word")) - col("_i")))))
      .select(col("word"), col("_i"), col("_l"),
        col("word").substr(col("_i") + 1, col("_l")).as("piece"))
    val lpmap = cand
      .join(broadcast(vocab.select("piece", "logp")), Seq("piece"))
      .groupBy("word")
      .agg(map_from_entries(collect_list(struct(
        (col("_i") * k + col("_l")).as("key"),
        col("logp").as("value")))).as("_lp"))
    val zero = lit(new java.math.BigDecimal("0.000000"))
      .cast("decimal(18,6)")
    val best = aggregate(
      sequence(lit(1), length(col("word"))),
      array(struct(zero.as("s"), lit("").as("seg"))),
      (state, j) => {
        val cands = filter(
          transform(sequence(lit(1), least(lit(maxPieceLen), j)), l => {
            val prev = element_at(state, j - l + 1)
            val lp = element_at(col("_lp"), (j - l) * k + l)
            val piece = col("word").substr(j - l + 1, l)
            when(prev.isNotNull && lp.isNotNull,
              struct(
                (prev.getField("s") + lp).cast("decimal(18,6)").as("s"),
                when(prev.getField("seg") === "", piece)
                  .otherwise(concat(prev.getField("seg"), lit(" "), piece))
                  .as("seg")))
          }),
          c => c.isNotNull)
        concat(state, array(array_max(cands)))
      },
      state => element_at(state, length(col("word")) + 1))
    words.join(lpmap, Seq("word"), "left")
      .withColumn("_b", best)
      .select(col("word"), col("freq"), col("_b.seg").as("seg"),
        when(col("_b.seg").isNull, lit(null).cast("bigint"))
          .otherwise(size(split(col("_b.seg"), " ")).cast("bigint"))
          .as("n_tokens"))
  }

  /** Train: seed the vocabulary (top `seedSize` substrings by count,
    * rare-ties broken on piece ASC, plus EVERY single character so all
    * corpus words stay segmentable), then `iters` hard-EM rounds. Only
    * vocabulary-bounded (piece, count) rows ever reach the driver.
    *
    * `vocabSize > 0` makes the trainer Kudo's actual algorithm —
    * EM alternating with vocabulary PRUNING: after each round's
    * re-count, the lowest-usage pieces (the hard-EM proxy for
    * lowest-likelihood-loss — logp is monotone in count under add-one
    * smoothing) are dropped down to `max(vocabSize, ¾·|V|)` per round
    * (Kudo's gradual shrink, integer arithmetic so the oracle replays
    * it), with every single-character piece retained unconditionally so
    * the corpus stays segmentable. Smoothing re-normalizes over the
    * SURVIVING vocabulary (T and V both shrink). `vocabSize = 0`
    * (default) keeps the full seed vocabulary — the pre-prune card
    * shape.
    *
    * Seed selection is a distributed `TakeOrderedAndProject`
    * (orderBy + limit under the total order (cnt DESC, piece ASC)) —
    * never a single-partition window: the ≤`maxPieceLen`-char substring
    * space is DATA-dependent (a multilingual 100 TB corpus holds tens
    * of millions of distinct short pieces), unlike the bounded-
    * cardinality tables the global-window convention is reserved for. */
  /** Strict less-than over UTF-8 bytes (unsigned, lexicographic) — the
    * exact string order Spark's UTF8String and DuckDB's binary collation
    * share; Scala's natural String order compares UTF-16 code units and
    * ranks surrogate pairs (supplementary-plane chars) differently. */
  private[llm] def utf8Less(a: String, b: String): Boolean = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val n = math.min(x.length, y.length)
    var i = 0
    while (i < n) {
      val c = (x(i) & 0xff) - (y(i) & 0xff)
      if (c != 0) return c < 0
      i += 1
    }
    x.length < y.length
  }

  def train(spark: SparkSession, docs: DataFrame, maxPieceLen: Int = 4,
      seedSize: Int = 60, iters: Int = 2, vocabSize: Int = 0)
      : UnigramModel = {
    require(maxPieceLen >= 1 && seedSize >= 1 && iters >= 1,
      s"need maxPieceLen/seedSize/iters >= 1, got " +
        s"$maxPieceLen/$seedSize/$iters")
    require(vocabSize >= 0, s"vocabSize must be >= 0, got $vocabSize")
    import spark.implicits._
    val words = PipelineCaches.track(wordFreq(docs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    require(words.count() > 0, "unigram train: no trainable words")
    var counts: Map[String, Long] = seedSelect(words, maxPieceLen, seedSize)
      .collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    def logpOf(c: Map[String, Long]): Map[String, BigDecimal] = {
      // V is the CURRENT vocabulary size — pruning shrinks it per round
      val t = c.values.sum
      val v = c.size
      c.map { case (p, n) =>
        // the exact double expression the oracle rounds: both engines
        // divide the same exact integers and ln the same double
        p -> BigDecimal(math.log((n + 1).toDouble / (t + v).toDouble))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP)
      }
    }
    var lp = logpOf(counts)
    // re-literalized per round via plain strings → DECIMAL(18,6): each
    // round's lineage starts from a literal piece table (the
    // logisticQuality weight-table convention)
    def vocabDf: DataFrame = lp.toSeq.sortBy(_._1)
      .map { case (p, d) => (p, d.underlying.toPlainString) }
      .toDF("piece", "_ls")
      .select(col("piece"), col("_ls").cast("decimal(18,6)").as("logp"))
    for (_ <- 1 to iters) {
      val used = viterbiSegment(words, vocabDf, maxPieceLen)
        .filter(col("seg").isNotNull)
        .select(explode(split(col("seg"), " ")).as("piece"), col("freq"))
        .groupBy("piece").agg(sum("freq").cast("bigint").as("cnt"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      counts = counts.keysIterator.map(p => p -> used.getOrElse(p, 0L)).toMap
      if (vocabSize > 0 && counts.size > vocabSize) {
        // prune to max(vocabSize, ¾·|V|) by (cnt DESC, piece ASC) rank;
        // single chars survive regardless (segmentability invariant).
        // Integer ¾ (|V|·3 div 4) so DuckDB's (nv * 3) // 4 replays it.
        val target = math.max(vocabSize, counts.size * 3 / 4)
        // tie-break by UTF-8 bytes, not Scala's UTF-16 code units: Spark
        // (UTF8String) and DuckDB both order strings by UTF-8 binary, and
        // for equal-count pieces containing supplementary-plane chars
        // (emoji, rare CJK) the two orders diverge — a UTF-16 sort here
        // would keep a different piece set than the oracle's prune CTE
        // and seedSelect's distributed order (r16 advice fix)
        // single-char immortality counts CODE POINTS, not UTF-16 units
        // (a supplementary-plane char is one piece of length 2 in
        // UTF-16), matching the oracle's len(piece) = 1 — same
        // currently-unreachable-but-hardened class as the UTF-8
        // tie-break above
        val keep = counts.toSeq.sortWith { case ((pa, na), (pb, nb)) =>
            if (na != nb) na > nb else utf8Less(pa, pb) }
          .iterator.zipWithIndex.collect {
            case ((p, _), i)
                if p.codePointCount(0, p.length) == 1 || i < target => p
          }.toSet
        counts = counts.filter { case (p, _) => keep(p) }
      }
      lp = logpOf(counts)
    }
    val pieces = counts.toSeq.sortBy(_._1)
      .map { case (p, n) => (p, n, lp(p).underlying.toPlainString) }
      .toDF("piece", "n_uses", "_ls")
      .select(col("piece"), col("n_uses").cast("bigint").as("n_uses"),
        col("_ls").cast("decimal(18,6)").as("logp"))
    UnigramModel(pieces,
      viterbiSegment(words, vocabDf, maxPieceLen), maxPieceLen)
  }

  /** The oracled release card: the FINAL (post-prune) piece table with
    * usage counts, log probs, the (count DESC, piece ASC) rank, and the
    * top-`vocabSize` core flag (pieces above `vocabSize` are the
    * unconditionally-retained single chars). Training runs EM+prune
    * with this `vocabSize` ([[train]]). */
  def unigramLmCard(spark: SparkSession, docs: DataFrame,
      maxPieceLen: Int = 4, seedSize: Int = 60, iters: Int = 2,
      vocabSize: Int = 40): DataFrame = {
    val model = train(spark, docs, maxPieceLen, seedSize, iters, vocabSize)
    model.pieces
      .withColumn("rank", row_number().over(Window.partitionBy(lit(0))
        .orderBy(col("n_uses").desc, col("piece").asc)).cast("int"))
      .select(col("piece"), col("n_uses"),
        round(col("logp").cast("double"), 6).as("logp"),
        col("rank"), (col("rank") <= vocabSize).as("keep"))
  }

  /** Apply a trained model to the corpus: per-doc word / OOV / piece
    * counts — [[Bpe.encode]]'s contract for the unigram family. The
    * Viterbi-segmented vocab is vocabulary-sized and BROADCAST; the
    * corpus side explodes to (doc_id, word) and aggregates straight
    * back to doc_id, so nothing corpus-sized ever shuffles by word.
    * Words outside the trainable alphabet (or unseen at training time,
    * which a fixed vocabulary cannot segment) count toward `n_words`
    * but contribute no pieces, reported as `n_oov_words`; empty/NULL
    * docs are preserved with zero counts. */
  def encode(docs: DataFrame, model: UnigramModel): DataFrame = {
    val agg = docs.select(col("doc_id"),
        explode(split(coalesce(col("text"), lit("")), " ")).as("word"))
      .filter(col("word") =!= "")
      .join(broadcast(model.vocab
        .filter(col("seg").isNotNull).select("word", "n_tokens")),
        Seq("word"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("_nw"),
        sum(when(col("n_tokens").isNull, 1L).otherwise(0L)).as("_noov"),
        coalesce(sum("n_tokens"), lit(0L)).as("_np"))
    docs.select("doc_id").join(agg, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("_nw"), lit(0L)).cast("bigint").as("n_words"),
        coalesce(col("_noov"), lit(0L)).cast("bigint").as("n_oov_words"),
        coalesce(col("_np"), lit(0L)).cast("bigint").as("n_pieces"))
  }

  /** Persist a trained model: pieces + the word segmentation table +
    * one-row meta — the [[Bpe.saveBpeModel]] trained-artifact layout;
    * live refresh via [[graft.scale.StoreMaint.replaceStore]]. */
  def saveUnigramModel(model: UnigramModel, path: String): Unit = {
    model.pieces.coalesce(1).write.mode("overwrite")
      .parquet(s"$path/pieces")
    model.vocab.coalesce(1).write.mode("overwrite")
      .parquet(s"$path/vocab")
    val spark = model.pieces.sparkSession
    spark.range(1).select(lit(model.maxPieceLen).as("max_piece_len"))
      .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
  }

  /** Reload a persisted model (metadata one-row collect; tables stay
    * distributed scans). */
  def loadUnigramModel(spark: SparkSession, path: String): UnigramModel = {
    val meta = spark.read.parquet(s"$path/meta").collect().head
    UnigramModel(spark.read.parquet(s"$path/pieces"),
      spark.read.parquet(s"$path/vocab"),
      meta.getAs[Int]("max_piece_len"))
  }
}
