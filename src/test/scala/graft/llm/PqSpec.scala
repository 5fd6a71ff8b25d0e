package graft.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Product quantization: code assignment identities, ADC exactness on
  * codeword candidates, and recall of the PQ / IVF-PQ search paths
  * against the exact full-precision inner-product ranking. */
class PqSpec extends AnyFunSuite {

  private def spark = SparkTestSession.withTables()
  private val pqSeeds: Seq[Long] = (1 to 16).map(_ * 7L)
  private val ivfSeeds: Seq[Long] = (1 to 16).map(_ * 5L)
  private val queryIds: Seq[Long] = Seq(0L, 1L, 2L, 3L, 4L)

  /** exact full-precision inner-product top-k per query, the recall
    * reference (ADC approximates the inner product, not cosine) */
  private def exactDotTopK(k: Int): Map[Long, Set[Long]] = {
    val s = spark
    val e = s.table("embeddings").select("vec_id", "embedding")
    val q = e.filter(col("vec_id").isInCollection(queryIds))
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    e.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        round(Similarity.dot(col("q_emb"), col("embedding")), 6).as("d"))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("query_id")
          .orderBy(col("d").desc, col("vec_id").asc)))
      .filter(col("rank") <= k)
      .collect().groupBy(_.getLong(0))
      .map { case (qid, rows) => qid -> rows.map(_.getLong(1)).toSet }
  }

  test("pqDistortion: hand-computed mse and mean cosine on a 2-d, " +
    "2-codeword corpus; seeds reconstruct exactly") {
    val s = spark
    import s.implicits._
    // codebook (m=1, dsub=2): c0 = [1,0] (seed 10), c1 = [0,1] (seed 11)
    val corpus = Seq(
      10L -> Seq(1.0f, 0.0f), 11L -> Seq(0.0f, 1.0f), // the seeds
      0L -> Seq(1.0f, 0.0f),  // exact codeword: err 0, cos 1
      1L -> Seq(2.0f, 0.0f),  // code 0: err 4-4+1 = 1, cos 2/sqrt(4) = 1
      2L -> Seq(0.0f, 3.0f),  // code 1: err 9-6+1 = 4, cos 1
      3L -> Seq(1.0f, 1.0f))  // dist tie -> code 0; err 1, cos 1/sqrt(2)
      .toDF("vec_id", "embedding")
    val r = Pq.pqDistortion(corpus, Seq(10L, 11L), m = 1).collect()(0)
    assert(r.getAs[Long]("n_vecs") == 6L)
    assert(r.getAs[Int]("n_sub") == 1 && r.getAs[Int]("ksub") == 2)
    // (0 + 0 + 0 + 1 + 4 + 1) / 6
    assert(r.getAs[Double]("mse") == 1.0)
    // (5 + round12(1/sqrt(2))) / 6 = 0.951184 at 6 dp
    assert(r.getAs[Double]("mean_cos") == 0.951184)
    // a zero vector keeps a NULL cosine but still counts in mse
    val withZero = corpus.unionAll(
      Seq(4L -> Seq(0.0f, 0.0f)).toDF("vec_id", "embedding"))
    val z = Pq.pqDistortion(withZero, Seq(10L, 11L), m = 1).collect()(0)
    assert(z.getAs[Long]("n_vecs") == 7L)
    // zero vec -> code 0 ([1,0]): err = 0 - 0 + 1 = 1 -> mse 7/7 = 1
    assert(z.getAs[Double]("mse") == 1.0)
    assert(z.getAs[Double]("mean_cos") == 0.951184) // mean over 6 non-null
  }

  test("a seed vector encodes to its own codeword in every subspace") {
    val s = spark
    val e = s.table("embeddings").select("vec_id", "embedding")
    val cb = Pq.seededCodebooks(e, pqSeeds, m = 8)
    val codes = Pq.encode(e, cb)
      .filter(col("vec_id").isin(7L, 14L, 112L))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    // seed ranks: sorted seeds (7, 14, ..., 112) → 7 is codeword 0,
    // 14 is codeword 1, 112 is codeword 15; a seed's distance to its own
    // subvector is exactly 0 in every subspace
    assert(codes(7L).forall(_ == 0), s"seed 7 codes: ${codes(7L)}")
    assert(codes(14L).forall(_ == 1), s"seed 14 codes: ${codes(14L)}")
    assert(codes(112L).forall(_ == 15), s"seed 112 codes: ${codes(112L)}")
  }

  test("ADC against a codeword candidate reproduces the exact dot") {
    val s = spark
    val e = s.table("embeddings").select("vec_id", "embedding")
    val cb = Pq.seededCodebooks(e, pqSeeds, m = 8)
    // candidates that ARE codewords lose nothing to quantization: ADC
    // must equal the full-precision dot up to fold association
    val out = Pq.searchPq(e.filter(col("vec_id").isInCollection(pqSeeds)),
      cb, e.filter(col("vec_id") === 0L), k = 16)
      .collect().map(r => r.getLong(1) -> r.getDouble(2)).toMap
    val q = e.filter(col("vec_id") === 0L)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    val exact = e.filter(col("vec_id").isInCollection(pqSeeds))
      .crossJoin(broadcast(q))
      .select(col("vec_id"),
        Similarity.dot(col("q_emb"), col("embedding")).as("d"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out.size == 16)
    out.foreach { case (id, score) =>
      assert(math.abs(score - exact(id)) < 1e-4,
        s"vec $id: adc $score vs exact ${exact(id)}")
    }
  }

  test("PQ index round-trips through parquet: codes and codebooks " +
    "reload identically") {
    val s = spark
    val e = s.table("embeddings").select("vec_id", "embedding")
    val cb = Pq.seededCodebooks(e, pqSeeds, m = 8)
    val codes = Pq.encode(e, cb)
    val dir = java.nio.file.Files.createTempDirectory("pqidx").toString
    try {
      Pq.savePqIndex(codes, cb, dir)
      val (codes2, cb2) = Pq.loadPqIndex(s, dir)
      assert(cb2.length == cb.length &&
        cb2.zip(cb).forall { case (a, b) =>
          a.zip(b).forall { case (x, y) => x.sameElements(y) } })
      val orig = codes.collect()
        .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
      val loaded = codes2.collect()
        .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
      assert(loaded == orig)
      // the persisted store serves searches without touching embeddings:
      // same ranking as the encode-inline path
      val fromStore = Pq.searchPqCodes(codes2, cb2,
        e.filter(col("vec_id") === 0L), k = 10).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      val inline = Pq.searchPq(e, cb, e.filter(col("vec_id") === 0L), k = 10)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      assert(fromStore.sortBy(_._4).toSeq == inline.sortBy(_._4).toSeq)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("PQ and IVF-PQ recall the exact inner-product top-10") {
    val exact = exactDotTopK(10)
    val s = spark
    val e = s.table("embeddings").select("vec_id", "embedding")
    def recallOf(df: org.apache.spark.sql.DataFrame): Double = {
      val got = df.collect().groupBy(_.getLong(0))
        .map { case (q, rows) => q -> rows.map(_.getLong(1)).toSet }
      queryIds.map(q => (exact(q) intersect got.getOrElse(q, Set.empty))
        .size.toDouble / exact(q).size).sum / queryIds.size
    }
    // The random-gaussian fixture is PQ's worst case (no cluster
    // structure for the codebooks to exploit), so absolute recall is
    // modest; what must hold is the resolution knob — finer subspaces
    // monotonically recover the exact ranking (measured: m=8 → 0.22,
    // m=16 → 0.28, m=32 → 0.60 on this corpus).
    val pqRecall = recallOf(Pq.pqTopKSeeded(e, pqSeeds, queryIds, 10, 8))
    val fineRecall = recallOf(Pq.pqTopKSeeded(e, pqSeeds, queryIds, 10, 32))
    val ivfpqRecall = recallOf(
      Pq.ivfPqTopKSeeded(e, ivfSeeds, pqSeeds, queryIds, 10, 4, 8))
    info(s"pq m=8 recall@10 = $pqRecall, m=32 = $fineRecall, " +
      s"ivfpq recall@10 = $ivfpqRecall")
    assert(pqRecall >= 0.15, s"PQ m=8 recall too low: $pqRecall")
    assert(fineRecall >= 0.5, s"PQ m=32 recall too low: $fineRecall")
    assert(fineRecall > pqRecall,
      s"finer subspaces must improve recall: m=32 $fineRecall vs m=8 $pqRecall")
    assert(ivfpqRecall >= 0.15, s"IVF-PQ recall too low: $ivfpqRecall")
    // the cell filter can only REMOVE candidates relative to brute ADC
    assert(ivfpqRecall <= pqRecall + 1e-9)
  }
}
