package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** GramTerms: result parity with the composable nested-transform form
  * (Spark's decimal HALF_UP round — the two roundings must coincide at
  * integer scale), row-major layout, and null semantics. */
class GramExpressionsSpec extends AnyFunSuite {

  private def spark = SparkTestSession.withTables()

  private def hofTerms(c: String) =
    expr(s"flatten(transform($c, x -> transform($c, " +
      s"y -> CAST(round(CAST(x AS DOUBLE) * CAST(y AS DOUBLE) * 1e12) " +
      s"AS BIGINT))))")

  test("bitwise-identical to the round/cast transform form on real " +
    "embeddings (negative products included)") {
    val s = spark
    val e = s.table("embeddings")
      .select(col("vec_id"), col("embedding"))
    val diff = e.select(
        GramTerms.gramTerms(col("embedding")).as("native"),
        hofTerms("embedding").as("hof"))
      .filter(!(col("native") <=> col("hof")))
    assert(diff.count() == 0)
  }

  test("row-major layout and exact half-away-from-zero rounding") {
    val s = spark
    import s.implicits._
    val df = Seq(Tuple1(Seq(2.0f, -3.0f))).toDF("v")
    val out = df.select(GramTerms.gramTerms(col("v"))).collect()(0)
      .getSeq[Long](0)
    // [2*2, 2*-3, -3*2, -3*-3] * 1e12
    assert(out == Seq(4000000000000L, -6000000000000L, -6000000000000L,
      9000000000000L))
    // .5 boundaries round away from zero in BOTH directions
    val half = Seq(Tuple1(Seq(math.sqrt(2.5e-12).toFloat)))
      .toDF("v")
    val h = half.select(GramTerms.gramTerms(col("v"))).collect()(0)
      .getSeq[Long](0)
    val x = math.sqrt(2.5e-12).toFloat.toDouble
    val exact = x * x * 1e12
    val expected = {
      val a = math.abs(exact); val f = math.floor(a)
      val r = f.toLong + (if (a - f >= 0.5) 1L else 0L)
      if (exact < 0) -r else r
    }
    assert(h == Seq(expected))
  }

  test("null array, null element, and oversized rows yield NULL") {
    val s = spark
    import s.implicits._
    val df = Seq(
      Tuple1(null.asInstanceOf[Seq[java.lang.Float]]),
      Tuple1(Seq[java.lang.Float](1.0f, null))).toDF("v")
    val out = df.select(GramTerms.gramTerms(col("v")).as("g")).collect()
    assert(out.forall(_.isNullAt(0)))
    val big = s.range(1).select(
      GramTerms.gramTerms(
        array((0 until 1025).map(i => lit(i.toFloat)): _*)).as("g"))
    assert(big.collect()(0).isNullAt(0))
  }
}
