package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** VecDot: result parity with the composable aggregate/zip_with fold
  * (same left-to-right double accumulation), null/length semantics, and
  * both execution paths (codegen on real data, interpreted eval). */
class VecDotSpec extends AnyFunSuite {

  private def spark = SparkTestSession.withTables()

  private def hofDot = (a: String, b: String) =>
    expr(s"aggregate(zip_with($a, $b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0D, (acc, v) -> acc + v)")

  test("bitwise-identical to the aggregate/zip_with fold on real embeddings") {
    val s = spark
    val e = s.table("embeddings").limit(200)
      .select(col("vec_id"), col("embedding").as("a"))
    val probes = s.table("embeddings").limit(3)
      .select(col("embedding").as("b"))
    val pairs = e.crossJoin(probes)
    val diff = pairs.select(
      VecDot.vecDot(col("a"), col("b")).as("native"),
      hofDot("a", "b").as("hof"))
      .filter(col("native") =!= col("hof"))
    assert(diff.count() == 0)
  }

  test("float and double element types both work, including mixed") {
    val s = spark
    import s.implicits._
    val df = Seq((Array(1.0f, 2.0f, 3.0f), Array(4.0, 5.0, 6.0)))
      .toDF("f", "d")
    val r = df.select(
      VecDot.vecDot(col("f"), col("d")),
      VecDot.vecDot(col("d"), col("f")),
      VecDot.vecDot(col("f"), col("f")),
      VecDot.vecDot(col("d"), col("d"))).head()
    assert(r.getDouble(0) == 32.0 && r.getDouble(1) == 32.0)
    assert(r.getDouble(2) == 14.0 && r.getDouble(3) == 77.0)
  }

  test("length mismatch and null elements yield NULL, like zip_with") {
    val s = spark
    import s.implicits._
    val df = Seq((Array(1.0, 2.0), Array(1.0, 2.0, 3.0))).toDF("a", "b")
    assert(df.select(VecDot.vecDot(col("a"), col("b"))).head().isNullAt(0))
    // null element: array(1.0, NULL) ⋅ array(1.0, 1.0) → NULL
    val r = s.range(1).select(graft.functions.VecDot.vecDot(
      array(lit(1.0), lit(null).cast("double")),
      array(lit(1.0), lit(1.0))))
    assert(r.head().isNullAt(0))
  }

  test("vec_dot is callable from plain SQL once registered") {
    val s = spark
    GraftExtensions.register(s)
    val r = s.sql(
      "SELECT vec_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d").head()
    assert(r.getDouble(0) == 11.0)
    // SQL path agrees with the Column API over real embeddings
    val viaSql = s.sql(
      """SELECT vec_id, vec_dot(embedding, embedding) AS sq
        |FROM embeddings ORDER BY vec_id LIMIT 20""".stripMargin)
      .collect().map(_.getDouble(1))
    val viaCol = s.table("embeddings").orderBy("vec_id").limit(20)
      .select(VecDot.vecDot(col("embedding"), col("embedding")))
      .collect().map(_.getDouble(0))
    assert(viaSql.toSeq == viaCol.toSeq)
    // arity is validated at resolution
    val err = intercept[Exception](
      s.sql("SELECT vec_dot(array(1.0D))").head())
    assert(err.getMessage.contains("vec_dot expects 2 arguments"))
    // cosine_sim composes to the same values as the Column-API cosine
    val viaSqlCos = s.sql(
      """SELECT vec_id, cosine_sim(embedding, embedding) AS c
        |FROM embeddings ORDER BY vec_id LIMIT 10""".stripMargin)
      .collect().map(_.getDouble(1))
    assert(viaSqlCos.forall(c => math.abs(c - 1.0) < 1e-9))
    val pair = s.sql(
      "SELECT cosine_sim(array(1.0D, 0.0D), array(0.0D, 1.0D)) AS c").head()
    assert(pair.getDouble(0) == 0.0)
  }

  test("the SparkSessionExtensions wiring injects without error") {
    new GraftExtensions()(new org.apache.spark.sql.SparkSessionExtensions())
  }

  test("signed_projection is callable from SQL and matches the Column API") {
    val s = spark
    GraftExtensions.register(s)
    val viaSql = s.sql(
      """SELECT vec_id, signed_projection(embedding, 8, 64) AS p
        |FROM embeddings ORDER BY vec_id LIMIT 10""".stripMargin)
      .collect().map(_.getSeq[Double](1).toSeq)
    val viaCol = s.table("embeddings").orderBy("vec_id").limit(10)
      .select(MatchExpressions.signedProjection(col("embedding"), 8, 64))
      .collect().map(_.getSeq[Double](0).toSeq)
    assert(viaSql.toSeq == viaCol.toSeq)
    // dims must be literals — the sign matrix is a plan-time constant
    val err = intercept[Exception](s.sql(
      "SELECT signed_projection(embedding, vec_id, 64) FROM embeddings")
      .head())
    assert(err.getMessage.contains("must be an integer literal"))
  }

  test("text-analysis functions are callable from plain SQL") {
    val s = spark
    GraftExtensions.register(s)
    // SQL path agrees with the Column API — same expression tree
    val viaSql = s.sql(
      """SELECT doc_id, quality_score(text) AS q, lang_guess(text) AS l,
        |  token_count(text) AS n, doc_fingerprint(text) AS f
        |FROM documents ORDER BY doc_id LIMIT 20""".stripMargin).collect()
    val viaCol = s.table("documents").orderBy("doc_id").limit(20)
      .select(col("doc_id"), graft.llm.TextOps.qualityScore(col("text")),
        graft.llm.TextOps.langGuess(col("text")),
        graft.llm.TextOps.tokenCount(col("text")),
        graft.llm.TextOps.fingerprint(col("text"))).collect()
    assert(viaSql.map(_.toSeq).toSeq == viaCol.map(_.toSeq).toSeq)
    val scrub = s.sql(
      "SELECT pii_scrub('mail a@b.co phone 555-010-9988') AS c").head()
    assert(scrub.getString(0) == "mail <EMAIL> phone <PHONE>")
    val err = intercept[Exception](
      s.sql("SELECT quality_score('a', 'b')").head())
    assert(err.getMessage.contains("quality_score expects 1 arguments"))
  }

  test("interpreted eval path matches codegen") {
    // a non-deterministic wrapper forces the interpreted path; compare both
    val s = spark
    val e = s.table("embeddings").limit(50)
    val both = e.select(
      VecDot.vecDot(col("embedding"), col("embedding")).as("sq"))
      .collect().map(_.getDouble(0))
    val interp = e.select(col("embedding")).collect().map { r =>
      val arr = r.getSeq[Float](0)
      arr.foldLeft(0.0)((acc, x) => acc + x.toDouble * x.toDouble)
    }
    assert(both.toSeq == interp.toSeq)
  }
}
