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
    },

    // Qualified dotted refs through an aliased source (F2; the reference's
    // t.amount shape, test_parser.py:568-580) + nested function calls
    // (F7) + date function mapping (DAYS_BETWEEN→datediff). Functions kept
    // IEEE-exact (sqrt/abs): ln differs by a last ulp between the JVM and
    // glibc, so log() parity is pinned in unit tests, not the hash oracle.
    "q_train_functions" -> { (s, dir) =>
      trainingDf(s, dir,
        "TRAIN MODEL fn_model USING linear_regression FROM lineitem t " +
          "WHERE t.l_quantity > 10 " +
          "PREDICT l_extendedprice " +
          "WITH FEATURES(t.l_quantity, sqrt(abs(t.l_extendedprice + 1)), " +
          "DAYS_BETWEEN(t.l_shipdate, t.l_shipdate))")
    },

    // time-series TRAIN variant (reference DSL.md:296-313): WITH TIME
    // COLUMN + SEASONAL/TREND markers compile to calendar components and a
    // trend index of the time column. The trend rank runs over DISTINCT
    // timestamps and broadcast-joins back — never a row-count-sized
    // window. The prophet fit + FORECAST path is test-pinned
    // (TimeSeriesDslSpec); the compiled training frame is oracled here.
    "q_ts_forecast_input" -> { (s, dir) =>
      trainingDf(s, dir,
        "TRAIN MODEL sales_forecast " +
          "USING prophet(seasonality=['yearly', 'weekly']) " +
          "FROM orders PREDICT o_totalprice " +
          "WITH TIME COLUMN o_orderdate " +
          "AND FEATURES(SEASONAL weekday, SEASONAL month, TREND linear) " +
          "FORECAST 30 days AHEAD " +
          "WITH CONFIDENCE INTERVALS 0.8, 0.95")
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
        |FROM (SELECT * FROM orders WHERE o_totalprice > 1000) big""".stripMargin,

    "q_train_functions" ->
      """SELECT t.l_quantity AS f1, sqrt(abs(t.l_extendedprice + 1)) AS f2,
        |  CAST(0 AS INT) AS f3, l_extendedprice
        |FROM lineitem t WHERE t.l_quantity > 10""".stripMargin,

    // Spark dayofweek is 1=Sunday..7; DuckDB's is 0=Sunday..6, hence +1.
    // t_index = dense rank of the timestamp (ties share a step index).
    // The Fourier pairs repeat the engine's fold order exactly —
    // phase * (2*pi()/period), round(,6) — so both engines land on the
    // same doubles (the VecDot cross-engine convention). The trailing
    // `+ 0` normalizes IEEE -0.0 (DuckDB's libm round yields -0.0 at
    // exact cycle multiples; Spark's BigDecimal round has no -0.0 —
    // TimeSeries.normZero is the engine-side twin).
    // prophet's seasonality=['yearly','weekly'] param BINDS (round 10):
    // 'weekly' dedupes against the SEASONAL weekday marker (same 7-cycle),
    // 'yearly' adds a dayofyear phase with the 365.25 leap-absorbing
    // period — so the oracle carries the season_yearly trio too.
    "q_ts_forecast_input" ->
      """SELECT CAST(dayofweek(o_orderdate) + 1 AS DOUBLE) AS season_weekday,
        |  round(sin(CAST(dayofweek(o_orderdate) + 1 AS DOUBLE) * (2*pi()/7)), 6)
        |    + 0 AS season_weekday_sin,
        |  round(cos(CAST(dayofweek(o_orderdate) + 1 AS DOUBLE) * (2*pi()/7)), 6)
        |    + 0 AS season_weekday_cos,
        |  CAST(month(o_orderdate) AS DOUBLE) AS season_month,
        |  round(sin(CAST(month(o_orderdate) AS DOUBLE) * (2*pi()/12)), 6)
        |    + 0 AS season_month_sin,
        |  round(cos(CAST(month(o_orderdate) AS DOUBLE) * (2*pi()/12)), 6)
        |    + 0 AS season_month_cos,
        |  CAST(dayofyear(o_orderdate) AS DOUBLE) AS season_yearly,
        |  round(sin(CAST(dayofyear(o_orderdate) AS DOUBLE) * (2*pi()/365.25)), 6)
        |    + 0 AS season_yearly_sin,
        |  round(cos(CAST(dayofyear(o_orderdate) AS DOUBLE) * (2*pi()/365.25)), 6)
        |    + 0 AS season_yearly_cos,
        |  CAST(dense_rank() OVER (ORDER BY o_orderdate) AS DOUBLE) AS t_index,
        |  o_totalprice
        |FROM orders""".stripMargin)

  /** Training SELECTs carry no ORDER BY (they feed model fits, not users);
    * Verify sorts the dump for the row-order-sensitive driver hash. */
  def verifySort: Map[String, Seq[String]] = Map(
    "q_train_select_basic" ->
      Seq("l_quantity", "l_extendedprice", "l_discount", "l_returnflag"),
    "q_train_source_join" ->
      Seq("o_totalprice", "c_acctbal", "f3", "c_mktsegment"),
    "q_train_subquery" -> Seq("o_totalprice", "f2", "o_orderstatus"),
    "q_train_functions" -> Seq("f1", "f2", "f3", "l_extendedprice"),
    "q_ts_forecast_input" ->
      Seq("t_index", "season_weekday", "season_month", "o_totalprice"))
}
