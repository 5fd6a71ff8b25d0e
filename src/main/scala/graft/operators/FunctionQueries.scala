package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** §2.5 stdlib coverage entries the relational catalog didn't exercise yet:
  * the array family (array_agg/unnest via collect_list + explode) and
  * base64/unbase64 round-trips (DISTRIBUTED.md:213,335). Arrays are sorted
  * before explode so row sets are deterministic; exploded output is scalar
  * (portable across the parquet/DuckDB compare boundary).
  */
object FunctionQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // array_agg + unnest + array length, per order (bounded groups)
    "q_array_unnest" -> { (s, dir) =>
      Tables.register(s, dir)
      s.table("lineitem")
        .groupBy("l_orderkey")
        .agg(sort_array(collect_list(col("l_linenumber"))).as("arr"))
        .select(col("l_orderkey"),
          explode(col("arr")).as("ln"),
          size(col("arr")).as("n_items"))
    },

    // base64 encode/decode round-trip over strings (exact, deterministic)
    "q_base64_roundtrip" -> { (s, dir) =>
      Tables.register(s, dir)
      s.table("orders")
        .select(col("o_orderkey"),
          base64(col("o_orderpriority").cast("binary")).as("b64"),
          unbase64(base64(col("o_orderpriority").cast("binary")))
            .cast("string").as("decoded"))
    },

    // R10 extension: window functions — top-3 orders per market segment
    // (rank inside hash-partitioned windows; deterministic tie-break)
    "q_window_rank" -> { (s, dir) =>
      Tables.register(s, dir)
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("c_mktsegment")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      s.table("orders")
        .join(s.table("customer"), col("o_custkey") === col("c_custkey"))
        .select(col("c_mktsegment"), col("o_orderkey"), col("o_totalprice"))
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 3)
        .orderBy("c_mktsegment", "rnk")
    },

    // R10 extension: set operations (UNION / INTERSECT / EXCEPT + DISTINCT)
    "q_set_ops" -> { (s, dir) =>
      Tables.register(s, dir)
      s.sql("""SELECT 'except' AS op, COUNT(*) AS n FROM
              |  (SELECT c_custkey FROM customer EXCEPT SELECT o_custkey FROM orders)
              |UNION ALL
              |SELECT 'intersect' AS op, COUNT(*) AS n FROM
              |  (SELECT o_custkey FROM orders INTERSECT SELECT c_custkey FROM customer)
              |UNION ALL
              |SELECT 'union_distinct' AS op, COUNT(*) AS n FROM
              |  (SELECT o_custkey FROM orders UNION SELECT c_custkey FROM customer)
              |ORDER BY op""".stripMargin)
    })

  def oracles: Map[String, String] = Map(
    "q_array_unnest" ->
      """WITH g AS (
        |  SELECT l_orderkey, list_sort(list(l_linenumber)) AS arr
        |  FROM lineitem GROUP BY l_orderkey)
        |SELECT l_orderkey, unnest(arr) AS ln, CAST(len(arr) AS INT) AS n_items
        |FROM g ORDER BY l_orderkey, ln""".stripMargin,

    "q_base64_roundtrip" ->
      """SELECT o_orderkey,
        |  to_base64(encode(o_orderpriority)) AS b64,
        |  o_orderpriority AS decoded
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q_window_rank" ->
      """WITH j AS (
        |  SELECT c_mktsegment, o_orderkey, o_totalprice,
        |    CAST(row_number() OVER (PARTITION BY c_mktsegment
        |      ORDER BY o_totalprice DESC, o_orderkey ASC) AS INT) AS rnk
        |  FROM orders JOIN customer ON o_custkey = c_custkey)
        |SELECT * FROM j WHERE rnk <= 3 ORDER BY c_mktsegment, rnk""".stripMargin,

    "q_set_ops" ->
      """SELECT 'except' AS op, COUNT(*) AS n FROM
        |  (SELECT c_custkey FROM customer EXCEPT SELECT o_custkey FROM orders)
        |UNION ALL
        |SELECT 'intersect' AS op, COUNT(*) AS n FROM
        |  (SELECT o_custkey FROM orders INTERSECT SELECT c_custkey FROM customer)
        |UNION ALL
        |SELECT 'union_distinct' AS op, COUNT(*) AS n FROM
        |  (SELECT o_custkey FROM orders UNION SELECT c_custkey FROM customer)
        |ORDER BY op""".stripMargin)

  def verifySort: Map[String, Seq[String]] = Map(
    "q_array_unnest" -> Seq("l_orderkey", "ln"),
    "q_base64_roundtrip" -> Seq("o_orderkey"))
}
