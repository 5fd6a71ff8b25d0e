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
        |FROM orders ORDER BY o_orderkey""".stripMargin)

  def verifySort: Map[String, Seq[String]] = Map(
    "q_array_unnest" -> Seq("l_orderkey", "ln"),
    "q_base64_roundtrip" -> Seq("o_orderkey"))
}
