package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.llm.{Pq, Similarity}

/** The reference-object cell/PQ expressions must be RESULT-IDENTICAL to
  * the composable struct-sort / literal-tree forms they replaced — the
  * DuckDB oracles replay the composable semantics, so any divergence is a
  * silent correctness break. Each test rebuilds the original composable
  * Column here and compares row-for-row on the fixture embeddings. */
class CellExpressionsSpec extends AnyFunSuite {

  private def spark = SparkTestSession.withTables()

  private def centers(s: org.apache.spark.sql.SparkSession, ids: Seq[Long])
      : Array[Array[Double]] =
    s.table("embeddings").filter(col("vec_id").isInCollection(ids))
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect()
      .sortBy(_.getLong(0))
      .map(_.getSeq[Double](1).toArray)

  // the pre-round-9 composable probeCellsCol, verbatim
  private def probeComposable(
      emb: Column, ctrs: Array[Array[Double]], nProbe: Int): Column = {
    val ee = VecDot.vecDot(emb, emb)
    val cells = ctrs.zipWithIndex.map { case (c, i) =>
      val cc = c.map(x => x * x).sum
      val dist = CrossEngine.normZero(
        round(ee - lit(2.0) * VecDot.vecDot(emb, typedLit(c.toSeq)) + lit(cc), 6))
      struct(dist.as("dist"), lit(i).as("list"))
    }
    transform(slice(array_sort(array(cells.toIndexedSeq: _*)), 1, nProbe),
      s => s.getField("list"))
  }

  // the pre-round-9 composable cosCellCol, verbatim
  private def cosCellComposable(
      emb: Column, ctrs: Array[Array[Double]]): Column = {
    def dot(a: Column, b: Column) = VecDot.vecDot(a, b)
    def cosine(a: Column, b: Column) =
      dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
    val cells = ctrs.zipWithIndex.map { case (c, i) =>
      val sim = CrossEngine.normZero(round(cosine(emb, typedLit(c.toSeq)), 6))
      struct(negate(sim).as("negsim"), lit(i).as("list"))
    }
    element_at(transform(slice(array_sort(array(cells.toIndexedSeq: _*)),
      1, 1), s => s.getField("list")), 1)
  }

  // the pre-round-9 composable encode/ADC, verbatim
  private def encodeComposable(
      emb: Column, cb: Array[Array[Array[Double]]]): Column = {
    val m = cb.length
    val dsub = cb.head.head.length
    array((0 until m).map { j =>
      element_at(probeComposable(slice(emb, j * dsub + 1, dsub), cb(j), 1), 1)
    }: _*)
  }

  private def adcComposable(
      qEmb: Column, codes: Column, cb: Array[Array[Array[Double]]]): Column = {
    val m = cb.length
    val dsub = cb.head.head.length
    val parts = (0 until m).map { j =>
      val cbLit = typedLit(cb(j).map(_.toSeq).toSeq)
      VecDot.vecDot(
        slice(qEmb, j * dsub + 1, dsub),
        element_at(cbLit, element_at(codes, j + 1) + 1))
    }
    CrossEngine.normZero(round(parts.reduceLeft(_ + _), 6))
  }

  private def assertNoDiff(
      df: org.apache.spark.sql.DataFrame, a: Column, b: Column): Unit = {
    val bad = df.select(a.as("a"), b.as("b"))
      .filter(not(col("a") <=> col("b")))
    assert(bad.isEmpty, s"diverging rows: ${bad.take(5).mkString("; ")}")
  }

  test("NearestCells matches the composable struct-sort probe (nProbe 1 and 4)") {
    val s = spark
    val ctrs = centers(s, (1 to 16).map(_ * 5L))
    val e = s.table("embeddings")
    for (nProbe <- Seq(1, 4, 16, 20)) // 20 > k exercises the clamp
      assertNoDiff(e,
        CellExpressions.nearestCells(col("embedding"), ctrs, nProbe),
        probeComposable(col("embedding"), ctrs, nProbe))
  }

  test("MaxCosineCell matches the composable spherical assignment") {
    val s = spark
    val ctrs = centers(s, (1 to 7).map(_ * 3L))
    assertNoDiff(s.table("embeddings"),
      CellExpressions.maxCosineCell(col("embedding"), ctrs),
      cosCellComposable(col("embedding"), ctrs))
    // deliberate divergence, documented on the expression: an ALL-ZERO
    // embedding (cosine 0/0) made the composable form THROW under ANSI
    // division; the native form survives (round6 passes the NaN through,
    // no sim ever beats -Inf... so the first cell wins) and the vector
    // can never be flagged a semantic dup downstream
    val zeroCell = s.table("embeddings").limit(1)
      .select(expr("transform(embedding, x -> CAST(0.0 AS FLOAT))")
        .as("embedding"))
      .select(CellExpressions.maxCosineCell(col("embedding"), ctrs))
      .collect()(0)
    assert(!zeroCell.isNullAt(0) && zeroCell.getInt(0) == 0)
  }

  test("PqEncode and PqAdc match the composable literal-tree forms") {
    val s = spark
    val cb = Pq.seededCodebooks(
      s.table("embeddings").select("vec_id", "embedding"),
      (1 to 16).map(_ * 7L), m = 8)
    val e = s.table("embeddings")
    assertNoDiff(e,
      CellExpressions.pqEncode(col("embedding"), cb),
      encodeComposable(col("embedding"), cb))
    val coded = e.withColumn("codes",
      CellExpressions.pqEncode(col("embedding"), cb))
    assertNoDiff(coded,
      CrossEngine.normZero(round(
        CellExpressions.pqAdc(col("embedding"), col("codes"), cb), 6)),
      adcComposable(col("embedding"), col("codes"), cb))
  }

  test("round6 is exactly Spark's round(_, 6) on doubles") {
    val s = spark
    import s.implicits._
    // negative-tiny (the -0.0 hazard), HALF_UP boundaries, exact binary
    // vs toString canonicalization cases, and fixture-scale magnitudes
    val xs = Seq(-1e-16, -0.0000005, 0.0000005, -0.0, 0.1234565,
      -0.1234565, 0.1234575, 2.675, -2.675, 1.0 / 3.0, -123.45678949999,
      6.9999995, Double.MinPositiveValue, -Double.MinPositiveValue,
      // an all-zero embedding's 0/0 cosine: round must pass NaN/±Inf
      // through (BigDecimal.valueOf would throw), like Spark's round
      Double.NaN, Double.PositiveInfinity, Double.NegativeInfinity)
    val sparkRound = xs.toDF("x").select(round(col("x"), 6)).as[Double]
      .collect()
    xs.zip(sparkRound).foreach { case (x, expected) =>
      val got = CellMath.round6(x)
      assert(java.lang.Double.compare(got, expected) == 0,
        s"round6($x) = $got but Spark round = $expected")
    }
  }

  test("null elements and length mismatches yield NULL, not garbage") {
    val s = spark
    import s.implicits._
    val ctrs = Array(Array(1.0, 0.0), Array(0.0, 1.0))
    val cb = Array(Array(Array(1.0, 0.0), Array(0.0, 1.0)))
    val rows = Seq(
      (1L, Seq[java.lang.Double](1.0, 2.0)),           // clean
      (2L, Seq[java.lang.Double](1.0, null)),          // null element
      (3L, Seq[java.lang.Double](1.0, 2.0, 3.0)))      // wrong length
      .toDF("id", "emb")
    val out = rows.select(col("id"),
      CellExpressions.nearestCells(col("emb"), ctrs, 1).as("nc"),
      CellExpressions.maxCosineCell(col("emb"), ctrs).as("mc"),
      CellExpressions.pqEncode(col("emb"), cb).as("pe"))
      .collect().sortBy(_.getLong(0))
    assert(!out(0).isNullAt(1) && !out(0).isNullAt(2) && !out(0).isNullAt(3))
    for (i <- 1 to 2; j <- 1 to 3)
      assert(out(i).isNullAt(j), s"row ${i + 1} col $j must be NULL")
    // ADC: out-of-range code → NULL
    val adc = Seq((Seq(1.0, 2.0), Seq(5)))
      .toDF("q", "codes")
      .select(CellExpressions.pqAdc(col("q"), col("codes"), cb))
      .collect()
    assert(adc(0).isNullAt(0))
  }

  test("ragged centers/codebooks fail at construction, not in the executor") {
    val ragged = Array(Array(1.0, 0.0), Array(0.0))
    for (mk <- Seq[Array[Array[Double]] => Any](
        c => CellExpressions.nearestCells(col("emb"), c, 1),
        c => CellExpressions.maxCosineCell(col("emb"), c))) {
      val e = intercept[IllegalArgumentException](mk(ragged))
      assert(e.getMessage.contains("rectangular"), e.getMessage)
    }
    // ragged ksub (subspace 1 has one codeword fewer)
    val raggedK = Array(
      Array(Array(1.0, 0.0), Array(0.0, 1.0)),
      Array(Array(1.0, 0.0)))
    // ragged dsub (one codeword is short)
    val raggedD = Array(Array(Array(1.0, 0.0), Array(0.0)))
    for (cb2 <- Seq(raggedK, raggedD)) {
      val e1 = intercept[IllegalArgumentException](
        CellExpressions.pqEncode(col("emb"), cb2))
      assert(e1.getMessage.contains("rectangular"), e1.getMessage)
      val e2 = intercept[IllegalArgumentException](
        CellExpressions.pqAdc(col("q"), col("codes"), cb2))
      assert(e2.getMessage.contains("rectangular"), e2.getMessage)
    }
  }
}
