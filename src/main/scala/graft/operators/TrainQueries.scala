package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables
import graft.dml.{DmlParser, TrainCompiler, TrainSpec}

/** Driver-gate entries that exercise the full DSL path — parse the TRAIN
  * statement, compile its source clause + feature expressions, and execute
  * the resulting training SELECT (parser.py:747-776 semantics: features in
  * order, target appended last). Model fits can't be DuckDB-oracled, but
  * their input queries can (SURVEY §5) — these pin them.
  *
  * Plans: the source clause goes through spark.sql, so filters push into the
  * parquet scan and joins get size-based strategy selection — identical to
  * hand-written DataFrame code at any scale.
  */
object TrainQueries {

  private def trainingDf(s: SparkSession, dir: String, dsl: String): DataFrame = {
    Tables.register(s, dir)
    val spec = DmlParser.parse(dsl).asInstanceOf[TrainSpec]
    TrainCompiler.trainingDataFrame(s, spec)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Identifier source, identifier features: pure projection pushdown.
    "q_train_select_basic" -> { (s, dir) =>
      trainingDf(s, dir,
        "TRAIN MODEL flag_model USING logistic_regression FROM lineitem " +
          "PREDICT l_returnflag " +
          "WITH FEATURES(l_quantity, l_extendedprice, l_discount)")
    },

    // Join + WHERE source fragment (R2/R3 through the injection guard) and
    // an arithmetic DERIVED feature compiled to a Column (F3/F7).
    "q_train_source_join" -> { (s, dir) =>
      trainingDf(s, dir,
        "TRAIN MODEL seg_model USING decision_tree FROM " +
          "orders JOIN customer ON orders.o_custkey = customer.c_custkey " +
          "WHERE o_totalprice > 150000 " +
          "PREDICT c_mktsegment " +
          "WITH FEATURES(o_totalprice, c_acctbal, " +
          "DERIVED(o_totalprice / (c_acctbal + 1000)))")
    },

    // Parenthesized subquery with mandatory alias (R8) + expression feature.
    "q_train_subquery" -> { (s, dir) =>
      trainingDf(s, dir,
        "TRAIN MODEL big_orders USING logistic_regression FROM " +
          "(SELECT * FROM orders WHERE o_totalprice > 1000) big " +
          "PREDICT o_orderstatus " +
          "WITH FEATURES(o_totalprice, o_totalprice * 2)")
    })

  def oracles: Map[String, String] = Map(
    "q_train_select_basic" ->
      """SELECT l_quantity, l_extendedprice, l_discount, l_returnflag
        |FROM lineitem""".stripMargin,

    "q_train_source_join" ->
      """SELECT o_totalprice, c_acctbal,
        |       o_totalprice / (c_acctbal + 1000) AS f3, c_mktsegment
        |FROM orders JOIN customer ON orders.o_custkey = customer.c_custkey
        |WHERE o_totalprice > 150000""".stripMargin,

    "q_train_subquery" ->
      """SELECT o_totalprice, o_totalprice * 2 AS f2, o_orderstatus
        |FROM (SELECT * FROM orders WHERE o_totalprice > 1000) big""".stripMargin)

  /** Training SELECTs carry no ORDER BY (they feed model fits, not users);
    * Verify sorts the dump for the row-order-sensitive driver hash. */
  def verifySort: Map[String, Seq[String]] = Map(
    "q_train_select_basic" ->
      Seq("l_quantity", "l_extendedprice", "l_discount", "l_returnflag"),
    "q_train_source_join" ->
      Seq("o_totalprice", "c_acctbal", "f3", "c_mktsegment"),
    "q_train_subquery" -> Seq("o_totalprice", "f2", "o_orderstatus"))
}
