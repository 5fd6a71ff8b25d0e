package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.CrossEngine.normZero

/** Product quantization (PQ) for the embedding store — the compression
  * tier below int8 (reference `DISTRIBUTED.md` vector tier; Jégou et al.
  * 2011, "Product Quantization for Nearest Neighbor Search").
  *
  * The d-dim embedding splits into `m` subspaces of d/m dims; each
  * subspace has its own `ksub`-entry codebook and a vector is stored as
  * m small ints (codes) — 64 float32 dims become 8 bytes at m=8, a 32×
  * compression. Search is asymmetric (ADC): the QUERY keeps full
  * precision and each candidate is scored by the inner product of the
  * query's subvectors with the candidate's selected codewords, so the
  * corpus side of the join carries codes, never vectors.
  *
  * Codebooks here are SEEDED — entry c of every subspace is the
  * subvector of the c-th smallest pinned seed row — the same
  * deterministic-quantizer discipline as
  * [[Similarity.buildIvfIndexSeeded]]: sampled codebooks are standard PQ
  * practice at corpus scale (you train on a sliver regardless), and
  * pinning the sample makes encode AND search replayable by the DuckDB
  * oracle. Only the ksub seed rows are ever collected; encoding is a
  * pure distributed projection ([[Similarity.probeCellsCol]] per
  * subspace, 6-dp-rounded distances, ties on code index).
  *
  * 100 TB shape: codes are a projection (zero shuffle) persisted next to
  * the corpus; brute ADC streams the code table through one broadcast
  * join (m ints per row where the float path moves d floats); IVF-PQ
  * restricts ADC to the probed cells via the same `_list` equi-join as
  * [[Similarity.searchIvf]] — the shuffle carries (vec_id, _list, codes),
  * a fixed handful of bytes per candidate regardless of dimension.
  *
  * Codegen note: encode and ADC are single native expressions
  * ([[graft.functions.PqEncode]] / [[graft.functions.PqAdc]]) whose
  * codebooks travel as codegen REFERENCE OBJECTS, not literal source —
  * the earlier m × ksub-literal composable tree cost a ~1-2 s one-time
  * Catalyst analyze/codegen floor per plan and broke whole-stage fusion
  * past the generated-method limits. PQ's scale win is memory/shuffle
  * width, not FLOPs: ADC evaluates the same d multiplies as a full dot,
  * from 32× less data.
  */
object Pq {

  /** codebooks(j)(c) = subvector j of the c-th smallest seed id; shape
    * m × ksub × (dim/m). Collects exactly the seed rows. */
  def seededCodebooks(
      embeddings: DataFrame, seedIds: Seq[Long], m: Int)
      : Array[Array[Array[Double]]] = {
    require(m > 0, s"m must be positive, got $m")
    val seeds = seedIds.distinct.sorted
    val byId = embeddings.filter(col("vec_id").isInCollection(seeds))
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
      .toMap
    val missing = seeds.filterNot(byId.contains)
    require(missing.isEmpty, s"seed vec_ids absent from corpus: $missing")
    val dim = byId(seeds.head).length
    require(dim % m == 0, s"m=$m must divide the embedding dim $dim")
    val dsub = dim / m
    Array.tabulate(m) { j =>
      seeds.map(id => byId(id).slice(j * dsub, (j + 1) * dsub)).toArray
    }
  }

  /** Codebooks straight from already-collected seed rows (vec_id asc =
    * codeword order, the [[seededCodebooks]] convention) — lets a caller
    * that DISCOVERS its seeds (e.g. the `pq_distortion` DSL kernel's
    * 16-smallest-ids TakeOrdered) build codebooks from that one job's
    * rows instead of paying a second seed-fetch scan. */
  def codebooksFromRows(rows: Seq[(Long, Array[Double])], m: Int)
      : Array[Array[Array[Double]]] = {
    require(m > 0, s"m must be positive, got $m")
    require(rows.nonEmpty, "codebooksFromRows: no seed rows")
    val ordered = rows.sortBy(_._1).map(_._2)
    val dim = ordered.head.length
    require(ordered.forall(_.length == dim),
      "codebooksFromRows: seed embeddings disagree on width")
    require(dim % m == 0, s"m=$m must divide the embedding dim $dim")
    val dsub = dim / m
    Array.tabulate(m) { j =>
      ordered.map(v => v.slice(j * dsub, (j + 1) * dsub)).toArray
    }
  }

  /** [[pqDistortion]] against pre-built codebooks — the entry point for
    * callers that already hold them (seed-discovering kernels, a loaded
    * [[loadPqIndex]] store). */
  def pqDistortionWith(embeddings: DataFrame,
      cb: Array[Array[Array[Double]]]): DataFrame =
    pqDistortionCard(embeddings, cb)

  /** m-code encoding of `emb` as an array<int> Column — per subspace, the
    * nearest codeword by the same rounded-L2 rule the IVF coarse
    * quantizer uses. The codebooks ship as a codegen reference object
    * inside ONE [[graft.functions.PqEncode]] node (no driver collect, no
    * extra job, and no m×ksub literal tree — the source of the 1-2 s
    * first-plan codegen floor this entry used to pay). */
  private[graft] def encodeCol(
      emb: Column, codebooks: Array[Array[Array[Double]]]): Column =
    graft.functions.CellExpressions.pqEncode(emb, codebooks)

  /** ADC approximate inner product of full-precision `qEmb` against the
    * codes of a candidate: Σ_j  q_sub_j ⋅ codebook_j[code_j], folded in
    * subspace order and rounded to 6 dp (the oracle replays the same
    * fold via an ordered list_sum). One [[graft.functions.PqAdc]] node;
    * round + negative-zero normalization applied here so the
    * cross-engine convention sits at the same place it always did. */
  private[graft] def adcCol(
      qEmb: Column, codes: Column,
      codebooks: Array[Array[Array[Double]]]): Column =
    normZero(round(
      graft.functions.CellExpressions.pqAdc(qEmb, codes, codebooks), 6))

  /** The encoded corpus: (vec_id, codes) — the table you persist. Pure
    * projection; at corpus scale write it bucketed however downstream
    * joins need, the codes column is m ints. */
  def encode(
      embeddings: DataFrame, codebooks: Array[Array[Array[Double]]])
      : DataFrame =
    embeddings.select(col("vec_id"),
      encodeCol(col("embedding"), codebooks).as("codes"))

  /** ADC top-k against an already-encoded (vec_id, codes) table — the
    * entry point a persisted [[savePqIndex]] store serves directly: no
    * embedding column is ever read on the corpus side. `queries` needs
    * (vec_id, embedding); self-matches are excluded by id. */
  def searchPqCodes(
      codes: DataFrame, codebooks: Array[Array[Array[Double]]],
      queries: DataFrame, k: Int = 10): DataFrame = {
    val q = queries.select(col("vec_id").as("query_id"),
      col("embedding").as("q_emb"))
    val scored = codes
      .crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        adcCol(col("q_emb"), col("codes"), codebooks).as("score"))
    graft.plans.TopK.topKPerKey(scored, Seq("query_id"),
      Seq(col("score"), negate(col("vec_id"))), k)
      .select("query_id", "vec_id", "score", "rank")
  }

  /** Brute-force ADC top-k from raw embeddings: encode inline, then
    * [[searchPqCodes]]. */
  def searchPq(
      embeddings: DataFrame, codebooks: Array[Array[Array[Double]]],
      queries: DataFrame, k: Int = 10): DataFrame =
    searchPqCodes(encode(embeddings, codebooks), codebooks, queries, k)

  /** One-shot seeded-codebook PQ search — the fully-oracled entry. */
  def pqTopKSeeded(
      embeddings: DataFrame, seedIds: Seq[Long], queryIds: Seq[Long],
      k: Int = 10, m: Int = 8): DataFrame = {
    val cb = seededCodebooks(embeddings, seedIds, m)
    searchPq(embeddings, cb,
      embeddings.filter(col("vec_id").isInCollection(queryIds)), k)
  }

  /** PQ reconstruction-DISTORTION card — the governance row an ANN
    * store ships next to its index (faiss's index-factory evaluation
    * loop measures exactly this before choosing m): ONE row with the
    * mean squared reconstruction error |x − r|² and the mean
    * cosine(x, r) of every vector against its decoded codes, where
    * r = concat_j codebook_j[code_j]. mean_cos near 1 says the code
    * budget preserves direction (cosine ANN is safe); a fat mse tail
    * says raise m or ksub.
    *
    * Exactly oracle-replayable: |x|² and x·r fold in element/subspace
    * order (VecDot / PqAdc — the proven ANN conventions), |r|² folds
    * per-codeword squared norms (driver-computed in element order, an
    * m×ksub literal — bounded codebook metadata) in subspace order;
    * per-row terms are 12-dp-rounded DECIMAL sums, card ratios 6-dp.
    * Zero-norm rows keep a NULL cosine and are excluded from its mean.
    *
    * Scale shape: one corpus pass — encode + three per-row folds in
    * the same projection, then a 1-row aggregate; no joins. */
  def pqDistortion(embeddings: DataFrame, seedIds: Seq[Long], m: Int = 8)
      : DataFrame =
    pqDistortionCard(embeddings, seededCodebooks(embeddings, seedIds, m))

  private def pqDistortionCard(embeddings: DataFrame,
      cb: Array[Array[Array[Double]]]): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(28, 12)
    val nsq = array(cb.map(sub => array(
      sub.map(v => lit(v.foldLeft(0.0)((a, x) => a + x * x))): _*)): _*)
    val terms = embeddings.filter(col("embedding").isNotNull)
      .select(col("embedding"),
        encodeCol(col("embedding"), cb).as("_codes"))
      .select(
        graft.functions.VecDot.vecDot(col("embedding"), col("embedding"))
          .as("_xx"),
        graft.functions.CellExpressions
          .pqAdc(col("embedding"), col("_codes"), cb).as("_xr"),
        aggregate(
          transform(col("_codes"), (c, j) =>
            element_at(element_at(nsq, j + lit(1)), c + lit(1))),
          lit(0.0), (a, v) => a + v).as("_rr"))
    val perRow = terms.select(
      round(col("_xx") - lit(2.0) * col("_xr") + col("_rr"), 12)
        .cast(dec).as("_err"),
      when(col("_xx") * col("_rr") === 0, lit(null).cast(dec))
        .otherwise(round(col("_xr") / sqrt(col("_xx") * col("_rr")), 12)
          .cast(dec)).as("_cos"))
    perRow.agg(
      count(lit(1)).cast("bigint").as("n_vecs"),
      lit(cb.length).cast("int").as("n_sub"),
      lit(cb.head.length).cast("int").as("ksub"),
      round(sum("_err").cast("double") /
        count(lit(1)).cast("double"), 6).as("mse"),
      round(sum("_cos").cast("double") /
        count(col("_cos")).cast("double"), 6).as("mean_cos"))
  }

  /** Persist an encoded corpus + its codebooks: codes as a parquet table
    * (m ints per row — the compressed store; at corpus scale write it
    * bucketed on whatever key downstream joins use), codebooks as
    * (j, c, codeword) metadata rows beside it. Mirrors
    * [[Similarity.saveIvfIndex]]; maintenance (retire/compact) composes
    * via [[graft.scale.StoreMaint.replaceStore]] exactly like the
    * signature store. */
  def savePqIndex(
      codes: DataFrame, codebooks: Array[Array[Array[Double]]],
      path: String): Unit = {
    val spark = codes.sparkSession
    import spark.implicits._
    codes.write.mode("overwrite").parquet(s"$path/codes")
    codebooks.zipWithIndex.flatMap { case (book, j) =>
      book.zipWithIndex.map { case (cw, c) => (j, c, cw.toSeq) }
    }.toSeq.toDF("j", "c", "codeword")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/codebooks")
  }

  /** Reload: codebooks are metadata (m × ksub rows collected once); the
    * code table stays a distributed scan. */
  def loadPqIndex(
      spark: org.apache.spark.sql.SparkSession, path: String)
      : (DataFrame, Array[Array[Array[Double]]]) = {
    val rows = spark.read.parquet(s"$path/codebooks")
      .orderBy("j", "c").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2).toArray))
    val codebooks = rows.groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (_, cws) => cws.sortBy(_._2).map(_._3) }.toArray
    (spark.read.parquet(s"$path/codes"), codebooks)
  }

  /** IVF-PQ: coarse seeded cells restrict WHICH candidates are scored
    * (the `_list` equi-join of [[Similarity.searchIvf]]); PQ codes are
    * WHAT the candidates carry. The corpus-side join input is
    * (vec_id, _list, codes) — no embedding column crosses the shuffle,
    * which is the entire point at 100 TB. */
  def ivfPqTopKSeeded(
      embeddings: DataFrame, cellSeedIds: Seq[Long], pqSeedIds: Seq[Long],
      queryIds: Seq[Long], k: Int = 10, nProbe: Int = 4, m: Int = 8)
      : DataFrame = {
    val cells = Similarity.buildIvfIndexSeeded(
      embeddings, cellSeedIds, persist = false)
    val cb = seededCodebooks(embeddings, pqSeedIds, m)
    val corpus = cells.assigned.select(col("vec_id"), col("_list"),
      encodeCol(col("embedding"), cb).as("codes"))
    searchIvfPqCodes(corpus, cells.centers, cb,
      embeddings.filter(col("vec_id").isInCollection(queryIds)),
      k, nProbe)
  }

  /** ADC top-k against an already-encoded IVF-PQ corpus table
    * (vec_id, _list, codes) — the entry point a persisted
    * [[saveIvfPqIndex]] store serves directly. `queries` needs
    * (vec_id, embedding); self-matches excluded by id. */
  def searchIvfPqCodes(
      corpus: DataFrame, centers: Array[Array[Double]],
      codebooks: Array[Array[Array[Double]]], queries: DataFrame,
      k: Int = 10, nProbe: Int = 4): DataFrame = {
    val probed = queries
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
        explode(Similarity.probeCellsCol(
          col("embedding"), centers, nProbe)).as("_list"))
    val scored = corpus.join(broadcast(probed), Seq("_list"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        adcCol(col("q_emb"), col("codes"), codebooks).as("score"))
    graft.plans.TopK.topKPerKey(scored, Seq("query_id"),
      Seq(col("score"), negate(col("vec_id"))), k)
      .select("query_id", "vec_id", "score", "rank")
  }

  /** One-pass IVF-PQ encoding: cell assignment (nearest center, the
    * [[Similarity.buildIvfIndexSeeded]] rule) + PQ codes in one
    * projection — the (vec_id, _list, codes) corpus table of the store.
    * Zero shuffle; no embedding survives into the output. */
  def encodeIvfPq(embeddings: DataFrame, centers: Array[Array[Double]],
      codebooks: Array[Array[Array[Double]]]): DataFrame =
    embeddings.select(col("vec_id"),
      element_at(Similarity.probeCellsCol(
        col("embedding"), centers, 1), 1).as("_list"),
      encodeCol(col("embedding"), codebooks).as("codes"))

  /** Persist a full IVF-PQ store: the encoded corpus (at scale, write
    * bucketed on `_list` so [[searchIvfPqCodes]]'s cell join needs no
    * exchange) plus centers and codebooks metadata beside it. */
  def saveIvfPqIndex(embeddings: DataFrame,
      centers: Array[Array[Double]],
      codebooks: Array[Array[Array[Double]]], path: String): Unit = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    encodeIvfPq(embeddings, centers, codebooks)
      .write.mode("overwrite").parquet(s"$path/assigned")
    centers.zipWithIndex.toSeq.map { case (c, i) => (i, c.toSeq) }
      .toDF("list", "center")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/centers")
    codebooks.zipWithIndex.flatMap { case (book, j) =>
      book.zipWithIndex.map { case (cw, c) => (j, c, cw.toSeq) }
    }.toSeq.toDF("j", "c", "codeword")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/codebooks")
  }

  /** Reload an IVF-PQ store: (assigned codes, centers, codebooks) —
    * metadata collected once, the code table a distributed scan. */
  def loadIvfPqIndex(spark: org.apache.spark.sql.SparkSession,
      path: String)
      : (DataFrame, Array[Array[Double]], Array[Array[Array[Double]]]) = {
    val centers = spark.read.parquet(s"$path/centers").orderBy("list")
      .collect().map(_.getSeq[Double](1).toArray)
    val rows = spark.read.parquet(s"$path/codebooks")
      .orderBy("j", "c").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2).toArray))
    val codebooks = rows.groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (_, cws) => cws.sortBy(_._2).map(_._3) }.toArray
    (spark.read.parquet(s"$path/assigned"), centers, codebooks)
  }

  /** APPEND a new shard to a persisted [[saveIvfPqIndex]] store (r14
    * verdict task 3): only the shard pays assignment + encoding cost —
    * the quantizers are FROZEN store metadata (seeded centers and
    * codebooks), which is precisely why append == rebuild: both paths
    * assign and encode with identical constants, so the appended store's
    * search results match a from-scratch rebuild row for row (the oracle
    * entry re-proves it). Ids must be disjoint from the stored ones. A
    * shard whose embedding width disagrees with the codebooks fails
    * loudly before anything is written. */
  def appendToIvfPqIndex(spark: org.apache.spark.sql.SparkSession,
      path: String, newShard: DataFrame): Unit = {
    // ONE store-layout parser: reuse the loader (the assigned-table
    // read inside it is lazy metadata, never executed here) so append
    // and load can never disagree on the layout
    val (_, centers, codebooks) = loadIvfPqIndex(spark, path)
    val dim = codebooks.map(_.head.length).sum
    val shardDim = Similarity.embeddingDim(newShard)
    require(shardDim == 0 || shardDim == dim,
      s"appendToIvfPqIndex: shard embedding dim $shardDim != store dim $dim")
    encodeIvfPq(newShard, centers, codebooks)
      .write.mode("append").parquet(s"$path/assigned")
  }

  /** Retire vectors from a loaded IVF-PQ code table — one broadcast
    * anti-join pass, the [[graft.llm.Dedup.retireFromIndex]] contract. */
  def retireFromIvfPqIndex(assigned: DataFrame, retiredIds: DataFrame)
      : DataFrame =
    assigned.join(broadcast(retiredIds.select(col("vec_id"))),
      Seq("vec_id"), "left_anti")

  /** [[retireFromIvfPqIndex]] for a driver-held id batch. */
  def retireFromIvfPqIndex(assigned: DataFrame, retiredIds: Seq[Long])
      : DataFrame =
    assigned.filter(!col("vec_id").isInCollection(retiredIds))

  /** In-place maintenance of a persisted IVF-PQ store: drop retired ids
    * and rewrite the code table once (compacting append small-files),
    * swap safety via [[graft.scale.StoreMaint.replaceStore]]. Returns
    * retained rows. */
  def compactIvfPqIndexStore(spark: org.apache.spark.sql.SparkSession,
      path: String, retiredIds: Seq[Long]): Long =
    graft.scale.StoreMaint.replaceStore(spark, s"$path/assigned",
      retireFromIvfPqIndex(
        spark.read.parquet(s"$path/assigned"), retiredIds))
}
