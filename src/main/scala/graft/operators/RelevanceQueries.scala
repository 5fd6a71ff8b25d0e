package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables
import graft.llm.Relevance

/** Driver-gate entries for term-relevance scoring (SURVEY §2.8 text-analysis
  * tier): per-document TF-IDF top terms and Okapi BM25 ranked retrieval.
  * Both fully DuckDB-oracled — scores are rounded to 6 dp before any rank
  * or sum, and BM25 contributions sum as DECIMAL(18,6) so the result is
  * independent of partition order in both engines.
  */
object RelevanceQueries {

  private def docs(s: SparkSession, dir: String): DataFrame = {
    Tables.register(s, dir); s.table("documents")
  }

  private def embs(s: SparkSession, dir: String): DataFrame = {
    Tables.register(s, dir); s.table("embeddings")
  }

  /** Shared tokenizer CTE (whitespace split, empty tokens dropped). */
  private val toksCte =
    """toks AS (
      |  SELECT doc_id, t AS term FROM (
      |    SELECT doc_id, unnest(string_split(coalesce(text, ''), ' ')) AS t
      |    FROM documents)
      |  WHERE t <> '')""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_tfidf_topterms" -> { (s, dir) =>
      Relevance.tfidfTopTerms(docs(s, dir), topN = 3)
    },

    "q_bm25_search" -> { (s, dir) =>
      Relevance.bm25TopDocs(
        docs(s, dir), Seq("spark", "vector", "stream"), topN = 20)
    },

    // hybrid retrieval: reciprocal-rank fusion of the BM25 lexical arm
    // (same terms as q_bm25_search) and the embedding-cosine semantic arm
    // (query = vec 0, the fixture's doc_id = vec_id contract) — both arms
    // and the fusion replay exactly in DuckDB
    "q_hybrid_rrf" -> { (s, dir) =>
      Relevance.hybridRrf(docs(s, dir), embs(s, dir),
        Seq("spark", "vector", "stream"), queryVecId = 0L,
        armK = 20, kRrf = 60, topN = 20)
        .orderBy("rank")
    },

    // word-association card: top-20 term pairs by document-level PMI,
    // joint-count floor 5, vocabulary capped (top-1000 by DF) BEFORE
    // pair generation so pair work is bounded at any corpus size
    "q_pmi_pairs" -> { (s, dir) =>
      Relevance.pmiPairs(docs(s, dir), topN = 20, minPairDocs = 5,
        maxVocab = 1000)
    })

  def oracles: Map[String, String] = Map(
    "q_tfidf_topterms" ->
      s"""WITH $toksCte,
         |tf AS (
         |  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
         |  FROM toks GROUP BY doc_id, term),
         |df AS (
         |  SELECT term, count(*) AS n_docs_with_term FROM tf GROUP BY term),
         |n AS (SELECT count(*) AS n_docs FROM documents),
         |scored AS (
         |  SELECT tf.doc_id, tf.term, tf.tf,
         |    round(CAST(tf.tf AS DOUBLE) *
         |      ln(CAST(n.n_docs AS DOUBLE) / CAST(df.n_docs_with_term AS DOUBLE)),
         |      6) AS score
         |  FROM tf JOIN df USING (term) CROSS JOIN n),
         |r AS (
         |  SELECT doc_id, term, tf, score,
         |    row_number() OVER (PARTITION BY doc_id
         |      ORDER BY score DESC, term ASC) AS rank
         |  FROM scored)
         |SELECT doc_id, term, tf, score, CAST(rank AS INTEGER) AS rank
         |FROM r WHERE rank <= 3""".stripMargin,

    // k1 = 1.2, b = 0.75; expression association mirrors the Scala Column
    // algebra exactly so both engines execute the same IEEE operation order
    "q_bm25_search" ->
      s"""WITH $toksCte,
         |dl AS (
         |  SELECT doc_id, CAST(count(*) AS BIGINT) AS dl
         |  FROM toks GROUP BY doc_id),
         |n AS (SELECT count(*) AS n_docs FROM documents),
         |s AS (
         |  SELECT CAST(sum(dl) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl
         |  FROM dl),
         |tf AS (
         |  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM toks
         |  WHERE term IN ('spark', 'vector', 'stream')
         |  GROUP BY doc_id, term),
         |df AS (SELECT term, count(*) AS term_df FROM tf GROUP BY term),
         |c AS (
         |  SELECT tf.doc_id,
         |    CAST(round(
         |      ln((CAST(n.n_docs AS DOUBLE) - CAST(df.term_df AS DOUBLE) + 0.5)
         |          / (CAST(df.term_df AS DOUBLE) + 0.5) + 1.0)
         |        * (CAST(tf.tf AS DOUBLE) * 2.2)
         |        / (CAST(tf.tf AS DOUBLE)
         |           + 1.2 * (0.25 + 0.75 * CAST(dl.dl AS DOUBLE) / s.avgdl)),
         |      6) AS DECIMAL(18,6)) AS contrib
         |  FROM tf JOIN df USING (term) JOIN dl USING (doc_id)
         |  CROSS JOIN n CROSS JOIN s)
         |SELECT doc_id, CAST(sum(contrib) AS DOUBLE) AS score,
         |  CAST(count(*) AS BIGINT) AS n_terms_matched
         |FROM c GROUP BY doc_id
         |ORDER BY score DESC, doc_id ASC
         |LIMIT 20""".stripMargin,

    // the BM25 arm is the q_bm25_search pipeline verbatim (top-20 with a
    // rank), the cosine arm is the q_ann_cosine_topk pipeline for query
    // vec 0; rrf adds the two reciprocals bm25-first and rounds to 6 dp
    // before the fused rank, exactly the Column algebra
    "q_hybrid_rrf" ->
      s"""WITH $toksCte,
         |dl AS (
         |  SELECT doc_id, CAST(count(*) AS BIGINT) AS dl
         |  FROM toks GROUP BY doc_id),
         |n AS (SELECT count(*) AS n_docs FROM documents),
         |s AS (
         |  SELECT CAST(sum(dl) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl
         |  FROM dl),
         |tf AS (
         |  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM toks
         |  WHERE term IN ('spark', 'vector', 'stream')
         |  GROUP BY doc_id, term),
         |df AS (SELECT term, count(*) AS term_df FROM tf GROUP BY term),
         |c AS (
         |  SELECT tf.doc_id,
         |    CAST(round(
         |      ln((CAST(n.n_docs AS DOUBLE) - CAST(df.term_df AS DOUBLE) + 0.5)
         |          / (CAST(df.term_df AS DOUBLE) + 0.5) + 1.0)
         |        * (CAST(tf.tf AS DOUBLE) * 2.2)
         |        / (CAST(tf.tf AS DOUBLE)
         |           + 1.2 * (0.25 + 0.75 * CAST(dl.dl AS DOUBLE) / s.avgdl)),
         |      6) AS DECIMAL(18,6)) AS contrib
         |  FROM tf JOIN df USING (term) JOIN dl USING (doc_id)
         |  CROSS JOIN n CROSS JOIN s),
         |bmtop AS (
         |  SELECT doc_id, CAST(sum(contrib) AS DOUBLE) AS score
         |  FROM c GROUP BY doc_id
         |  ORDER BY score DESC, doc_id ASC
         |  LIMIT 20),
         |bm AS (
         |  SELECT doc_id,
         |    CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS INT)
         |      AS bm25_rank
         |  FROM bmtop),
         |q AS (
         |  SELECT vec_id AS query_id, embedding AS q_emb
         |  FROM embeddings WHERE vec_id = 0),
         |cs AS (
         |  SELECT e.vec_id,
         |    round(
         |      list_sum(list_transform(range(1, len(q.q_emb) + 1),
         |        i -> CAST(q.q_emb[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)))
         |      / (sqrt(list_sum(list_transform(range(1, len(q.q_emb) + 1),
         |           i -> CAST(q.q_emb[i] AS DOUBLE) * CAST(q.q_emb[i] AS DOUBLE))))
         |       * sqrt(list_sum(list_transform(range(1, len(e.embedding) + 1),
         |           i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)))))
         |    , 6) AS cos_sim
         |  FROM embeddings e, q WHERE e.vec_id <> q.query_id),
         |cosr AS (
         |  SELECT vec_id AS doc_id,
         |    CAST(row_number() OVER (ORDER BY cos_sim DESC, vec_id ASC) AS INT)
         |      AS cos_rank
         |  FROM cs ORDER BY cos_rank LIMIT 20),
         |f AS (
         |  SELECT coalesce(bm.doc_id, cosr.doc_id) AS doc_id,
         |    bm.bm25_rank, cosr.cos_rank,
         |    round(
         |      coalesce(1.0 / (60 + bm.bm25_rank), 0.0) +
         |      coalesce(1.0 / (60 + cosr.cos_rank), 0.0), 6) AS rrf_score
         |  FROM bm FULL OUTER JOIN cosr ON bm.doc_id = cosr.doc_id),
         |r AS (
         |  SELECT doc_id, bm25_rank, cos_rank, rrf_score,
         |    CAST(row_number() OVER (ORDER BY rrf_score DESC, doc_id ASC)
         |      AS INT) AS rank
         |  FROM f)
         |SELECT doc_id, bm25_rank, cos_rank, rrf_score, rank
         |FROM r WHERE rank <= 20 ORDER BY rank""".stripMargin,

    // doc-level co-occurrence PMI: distinct (doc, term), DF-capped
    // vocabulary, a<b pairs, ln(n_pair*N/(n_a*n_b)) with the same
    // double-arithmetic order as the Column algebra
    "q_pmi_pairs" ->
      s"""WITH $toksCte,
         |dw AS (SELECT DISTINCT doc_id, term FROM toks),
         |vocab AS (
         |  SELECT term, count(*) AS n_term FROM dw GROUP BY term
         |  ORDER BY n_term DESC, term ASC LIMIT 1000),
         |nd AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents),
         |pairs AS (
         |  SELECT a.term AS term_a, b.term AS term_b, count(*) AS n_pair
         |  FROM dw a JOIN dw b ON a.doc_id = b.doc_id AND a.term < b.term
         |  WHERE a.term IN (SELECT term FROM vocab)
         |    AND b.term IN (SELECT term FROM vocab)
         |  GROUP BY 1, 2 HAVING count(*) >= 5)
         |SELECT term_a, term_b, CAST(n_pair AS BIGINT) AS n_pair,
         |  CAST(va.n_term AS BIGINT) AS n_a,
         |  CAST(vb.n_term AS BIGINT) AS n_b,
         |  round(ln(CAST(n_pair AS DOUBLE) * CAST(n_docs AS DOUBLE)
         |    / (CAST(va.n_term AS DOUBLE) * CAST(vb.n_term AS DOUBLE))), 6)
         |    AS pmi
         |FROM pairs
         |JOIN vocab va ON term_a = va.term
         |JOIN vocab vb ON term_b = vb.term
         |CROSS JOIN nd
         |ORDER BY pmi DESC, term_a ASC, term_b ASC
         |LIMIT 20""".stripMargin)

  def verifySort: Map[String, Seq[String]] = Map(
    "q_tfidf_topterms" -> Seq("doc_id", "rank"))
}
