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

    // §2.5 array family beyond agg/unnest: array_append, array_intersect,
    // array_replace (mapped to transform, per SURVEY §2.5 — Spark has no
    // array_replace builtin). Arrays are folded to scalars so the compare
    // boundary never ships list columns.
    "q_array_ops" -> { (s, dir) =>
      Tables.register(s, dir)
      s.table("lineitem")
        .groupBy("l_orderkey")
        .agg(sort_array(collect_list(col("l_linenumber"))).as("arr"))
        .select(col("l_orderkey"),
          aggregate(array_append(col("arr"), lit(99)), lit(0L),
            (acc, x) => acc + x).as("append_sum"),
          size(array_intersect(col("arr"),
            array(lit(1), lit(2), lit(3)))).as("n_low"),
          aggregate(transform(col("arr"),
              x => when(x === 1, 100).otherwise(x)), lit(0L),
            (acc, x) => acc + x).as("replaced_sum"))
    },

    // Cross-engine rounding convention pin (functions/CrossEngine.scala):
    // every shape that can round to zero FROM BELOW — Fourier sin/cos at
    // exact cycle multiples (the round-7 q_ts_forecast_input red row:
    // phase 7 → sin(2π) ≈ -2.4e-16), tiny-negative z-scores, tiny-negative
    // dot products — goes through `normZero(round(_, 6))` here and
    // `round(_, 6) + 0` in the oracle. Spark's BigDecimal round has no
    // -0.0; DuckDB's libm round returns -0.0; unnormalized they
    // hash-diverge. This entry keeps the convention pinned through the
    // REAL DuckDB harness on every round, instead of depending on
    // fixtures never landing on a tiny negative.
    "q_crossengine_zero" -> { (s, dir) =>
      Tables.register(s, dir)
      import graft.functions.CrossEngine.normZero
      s.table("lineitem")
        .select(((col("l_orderkey") % 7) + 1).cast("double").as("phase"))
        .distinct()
        .select(col("phase"),
          normZero(round(sin(col("phase") * lit(2 * math.Pi / 7)), 6))
            .as("sin6"),
          normZero(round(cos(col("phase") * lit(2 * math.Pi / 7)), 6))
            .as("cos6"),
          normZero(round((col("phase") - lit(7.0)) * lit(1e-17), 6))
            .as("ztiny"),
          normZero(round(col("phase") * lit(-1e-18) * lit(0.1), 6))
            .as("dtiny"))
        .orderBy("phase")
    },

    // §2.5 gen_random_uuid → uuid(): values are random by construction, so
    // the oracle pins the deterministic derived facts — row count, distinct
    // count (collision-free at fixture scale), and RFC-4122 shape.
    // uuid generation + regex validation is pure CPU: at scale the scan's
    // many splits parallelize it for free, but a SMALL corpus can be one
    // parquet file = one input split = one core. Fan out ONLY in that
    // case: an unconditional repartition() re-shuffles (and, per
    // sortBeforeRepartition, locally sorts) the full row set even when
    // the scan already parallelizes — measured 0.8s -> 4.4s at sf1.
    "q_uuid_shape" -> { (s, dir) =>
      Tables.register(s, dir)
      val t = s.table("orders")
      // inputFiles is pure catalog metadata (no plan compiled, no job);
      // a many-file corpus already scans in parallel, and an oversized
      // single file still splits on row-group boundaries downstream
      val base = t.select(lit(1).as("_one"))
      val fanned = if (t.inputFiles.length < 8) base.repartition() else base
      fanned
        .select(expr("uuid()").as("u"))
        .agg(count(lit(1)).as("n_rows"),
          countDistinct(col("u")).as("n_distinct"),
          sum(when(col("u").rlike(
            "^[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}$"),
            1L).otherwise(0L)).as("n_wellformed"))
    },

    // Time series (§1.1 WITH TIME COLUMN): lag feature, decimal-exact
    // rolling mean, trend index — per-entity windows, hash-partitioned by
    // customer, sorted within partitions only (no global sort).
    // rolling z-score anomaly flags per user over the trailing-20 window
    // (~67 events/user at sf0.01, so windows genuinely roll): DECIMAL-
    // summed moments keep the whole pipeline partition-order-independent
    // and exactly DuckDB-replayable
    "q_ts_anomaly" -> { (s, dir) =>
      Tables.register(s, dir)
      graft.dml.runtime.TimeSeries.anomalyFlags(
        s.table("events").select("event_id", "user_id", "ts", "value"),
        "user_id", "ts", "value", n = 20, z = 2.5, tiebreak = "event_id")
        .select("event_id", "user_id", "value", "zscore", "is_anomaly")
    },

    "q_ts_rolling" -> { (s, dir) =>
      Tables.register(s, dir)
      import graft.dml.runtime.TimeSeries
      val base = s.table("orders")
        .select("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
      val lagged = TimeSeries.lagFeatures(base, "o_custkey", "o_orderdate",
        "o_totalprice", Seq(1), tiebreak = "o_orderkey")
      val ma = TimeSeries.rollingMean(lagged, "o_custkey", "o_orderdate",
        "o_totalprice", n = 3, tiebreak = "o_orderkey")
      TimeSeries.timeIndex(ma, "o_custkey", "o_orderdate", "o_orderkey")
        .select("o_custkey", "o_orderkey", "o_totalprice_lag_1",
          "o_totalprice_ma_3", "t_index")
    },

    // multi-dimensional aggregation: ROLLUP over (returnflag, linestatus)
    // with GROUPING flags — subtotals and grand total in one partial-agg
    // pass (no extra scans)
    "q_rollup_pricing" -> { (s, dir) =>
      Tables.register(s, dir)
      s.table("lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double")
            .as("sum_qty"),
          grouping(col("l_returnflag")).cast("int").as("g_flag"),
          grouping(col("l_linestatus")).cast("int").as("g_status"))
    },

    // pivot: order revenue by market segment × priority (fixed pivot values
    // so the schema is static; compiles to one conditional-agg pass)
    "q_pivot_priority" -> { (s, dir) =>
      Tables.register(s, dir)
      s.table("orders")
        .join(s.table("customer"), col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .pivot("o_orderpriority", Seq("1-URGENT", "2-HIGH", "3-MEDIUM"))
        .agg(sum(col("o_totalprice").cast("decimal(18,2)")).cast("double"))
        .orderBy("c_mktsegment")
    },

    // Scale-path per-key top-k: bounded-heap partial aggregate instead of
    // a full-shuffle window (graft.plans.TopK) — same answer as
    // q_window_rank's row_number plan, shuffle carries ≤ k rows per key
    // per partition
    "q_topk_pergroup" -> { (s, dir) =>
      Tables.register(s, dir)
      val joined = s.table("orders")
        .join(s.table("customer"), col("o_custkey") === col("c_custkey"))
        .select("c_mktsegment", "o_orderkey", "o_totalprice")
      graft.plans.TopK.topKPerKey(joined, Seq("c_mktsegment"),
        Seq(col("o_totalprice"), negate(col("o_orderkey"))), k = 3)
        .orderBy("c_mktsegment", "rank")
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

    "q_array_ops" ->
      """WITH g AS (
        |  SELECT l_orderkey, list_sort(list(l_linenumber)) AS arr
        |  FROM lineitem GROUP BY l_orderkey)
        |SELECT l_orderkey,
        |  CAST(list_sum(list_append(arr, 99)) AS BIGINT) AS append_sum,
        |  CAST(len(list_intersect(arr, [1, 2, 3])) AS INT) AS n_low,
        |  CAST(list_sum(list_transform(arr,
        |    x -> CASE WHEN x = 1 THEN 100 ELSE x END)) AS BIGINT)
        |    AS replaced_sum
        |FROM g ORDER BY l_orderkey""".stripMargin,

    "q_crossengine_zero" ->
      """WITH p AS (
        |  SELECT DISTINCT CAST(l_orderkey % 7 + 1 AS DOUBLE) AS phase
        |  FROM lineitem)
        |SELECT phase,
        |  round(sin(phase * (2 * pi() / 7)), 6) + 0 AS sin6,
        |  round(cos(phase * (2 * pi() / 7)), 6) + 0 AS cos6,
        |  round((phase - 7.0) * 1e-17, 6) + 0 AS ztiny,
        |  round(phase * (-1e-18) * 0.1, 6) + 0 AS dtiny
        |FROM p ORDER BY phase""".stripMargin,

    "q_uuid_shape" ->
      """WITH u AS (
        |  SELECT CAST(gen_random_uuid() AS VARCHAR) AS u FROM orders)
        |SELECT COUNT(*) AS n_rows,
        |  COUNT(DISTINCT u) AS n_distinct,
        |  CAST(SUM(CASE WHEN regexp_matches(u,
        |    '^[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}$')
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_wellformed
        |FROM u""".stripMargin,

    "q_ts_anomaly" ->
      """WITH w AS (
        |  SELECT event_id, user_id, value,
        |    COUNT(*) OVER f AS cnt,
        |    CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER f AS DOUBLE)
        |      / COUNT(*) OVER f AS m,
        |    CAST(SUM(CAST(value * value AS DECIMAL(28,6))) OVER f AS DOUBLE)
        |      / COUNT(*) OVER f AS m2
        |  FROM events
        |  WINDOW f AS (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)),
        |z AS (
        |  SELECT event_id, user_id, value,
        |    CASE WHEN cnt > 1 AND sqrt(greatest(m2 - m * m, 0)) > 0
        |      THEN round((value - m) / sqrt(greatest(m2 - m * m, 0)), 6) + 0
        |    END AS zscore
        |  FROM w)
        |SELECT event_id, user_id, value, zscore,
        |  coalesce(abs(zscore) > 2.5, false) AS is_anomaly
        |FROM z""".stripMargin,

    "q_ts_rolling" ->
      """SELECT o_custkey, o_orderkey,
        |  lag(o_totalprice, 1) OVER w AS o_totalprice_lag_1,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER f AS DOUBLE)
        |    / COUNT(*) OVER f AS o_totalprice_ma_3,
        |  CAST(row_number() OVER w AS DOUBLE) AS t_index
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey),
        |  f AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q_rollup_pricing" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
        |  CAST(GROUPING(l_linestatus) AS INT) AS g_status
        |FROM lineitem
        |GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY g_flag, g_status, l_returnflag, l_linestatus""".stripMargin,

    "q_pivot_priority" ->
      """SELECT c_mktsegment,
        |  CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT'
        |    THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE)
        |    AS "1-URGENT",
        |  CAST(SUM(CASE WHEN o_orderpriority = '2-HIGH'
        |    THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE)
        |    AS "2-HIGH",
        |  CAST(SUM(CASE WHEN o_orderpriority = '3-MEDIUM'
        |    THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE)
        |    AS "3-MEDIUM"
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "q_topk_pergroup" ->
      """WITH j AS (
        |  SELECT c_mktsegment, o_orderkey, o_totalprice,
        |    CAST(row_number() OVER (PARTITION BY c_mktsegment
        |      ORDER BY o_totalprice DESC, o_orderkey ASC) AS INT) AS rank
        |  FROM orders JOIN customer ON o_custkey = c_custkey)
        |SELECT * FROM j WHERE rank <= 3 ORDER BY c_mktsegment, rank""".stripMargin,

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
    "q_array_ops" -> Seq("l_orderkey"),
    "q_rollup_pricing" ->
      Seq("g_flag", "g_status", "l_returnflag", "l_linestatus"),
    "q_ts_rolling" -> Seq("o_custkey", "o_orderkey"),
    "q_ts_anomaly" -> Seq("event_id"),
    "q_base64_roundtrip" -> Seq("o_orderkey"))
}
