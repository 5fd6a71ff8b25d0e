package graft.plans

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Property: for arbitrary (key, value) data with unique ids, the
  * bounded-heap TopK equals the row_number-window top-k — both directions,
  * any k. Ties on value are broken by the unique id, so the comparison is
  * exact. */
class TopKPropertySpec extends AnyFunSuite {

  private val rows: Gen[List[(String, Int)]] = Gen.listOfN(60,
    Gen.zip(Gen.oneOf("a", "b", "c", "d"), Gen.choose(-50, 50)))

  test("property_topk_matches_window_rank") {
    val s = SparkTestSession.spark
    import s.implicits._
    val prop = Prop.forAll(rows, Gen.choose(1, 8), Gen.oneOf(true, false)) {
      (data, k, desc) =>
        val df = data.zipWithIndex
          .map { case ((key, v), id) => (key, v, id.toLong) }
          .toDF("k", "v", "id")
        val ord = if (desc) Seq(col("v"), negate(col("id")))
          else Seq(col("v"), col("id"))
        val fast = TopK.topKPerKey(df, Seq("k"), ord, k, descending = desc)
          .select("k", "v", "id", "rank").collect()
          .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getInt(3)))
          .toSet
        val w = Window.partitionBy("k").orderBy(
          if (desc) col("v").desc else col("v").asc,
          if (desc) col("id").asc else col("id").asc)
        val slow = df.withColumn("rank", row_number().over(w))
          .filter(col("rank") <= k).collect()
          .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getInt(3)))
          .toSet
        fast == slow
    }
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(12), prop)
    assert(result.passed, result.status.toString)
  }
}
