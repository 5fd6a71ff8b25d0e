package graft.plans

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** TopK per key: result-identical to the window row_number plan, but
  * planned as a bounded partial aggregate (no Window, no full shuffle). */
class TopKSpec extends AnyFunSuite {

  private def spark = SparkTestSession.withTables()

  private def joined = {
    val s = spark
    s.table("orders")
      .join(s.table("customer"), col("o_custkey") === col("c_custkey"))
      .select("c_mktsegment", "o_orderkey", "o_totalprice")
  }

  test("matches the window row_number top-k exactly") {
    val topk = TopK.topKPerKey(joined, Seq("c_mktsegment"),
      Seq(col("o_totalprice"), negate(col("o_orderkey"))), k = 3)
      .select("c_mktsegment", "o_orderkey", "o_totalprice", "rank")

    val w = Window.partitionBy("c_mktsegment")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    val window = joined
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)

    val a = topk.orderBy("c_mktsegment", "rank").collect().toSeq
    val b = window.orderBy("c_mktsegment", "rank").collect().toSeq
    assert(a == b)
  }

  test("ascending order (smallest-k) works via descending=false") {
    val bottom = TopK.topKPerKey(joined, Seq("c_mktsegment"),
      Seq(col("o_totalprice"), col("o_orderkey")), k = 2, descending = false)
    val w = Window.partitionBy("c_mktsegment")
      .orderBy(col("o_totalprice").asc, col("o_orderkey").asc)
    val window = joined.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 2)
    assert(bottom.orderBy("c_mktsegment", "rank").collect().toSeq ==
      window.orderBy("c_mktsegment", "rank").collect().toSeq)
  }

  test("plans as a partial collect_top_k aggregate, not a Window") {
    val plan = TopK.topKPerKey(joined, Seq("c_mktsegment"),
      Seq(col("o_totalprice"), negate(col("o_orderkey"))), k = 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"expected no Window operator:\n$plan")
    // two-phase aggregate: a partial collect_top_k on the map side bounds
    // what the shuffle carries to k rows per key per partition
    assert(plan.contains("partial_collect_top_k") ||
      plan.toLowerCase.contains("partial_collecttopk"),
      s"expected a partial bounded aggregate:\n$plan")
  }

  test("groups smaller than k return all their rows") {
    val s = spark
    import s.implicits._
    val tiny = Seq(("a", 1), ("a", 2), ("b", 5)).toDF("k", "v")
    val out = TopK.topKPerKey(tiny, Seq("k"), Seq(col("v")), k = 10)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2))).toSet
    assert(out == Set(("a", 2, 1), ("a", 1, 2), ("b", 5, 1)))
  }
}
