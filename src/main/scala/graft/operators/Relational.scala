package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** Relational operator catalog — covers the reference DSL's supported
  * relational algebra (SURVEY.md §2.3 R1-R8: scan, inner/theta join, filter,
  * group-by, having, order-by, limit, subquery) plus the scalar/date/JSON
  * functions its docs use (§2.5), each as a `(SparkSession, sfDir) =>
  * DataFrame` with a DuckDB oracle.
  *
  * Determinism contract with the oracle: every floating-point aggregate is
  * computed in exact DECIMAL(18,2) arithmetic and cast to double at the end,
  * so Spark's partial-aggregation order can never change the result hash.
  * Row-level doubles only use IEEE-exact ops (+ - * / sqrt). Every query
  * carries a total ORDER BY on a unique key.
  *
  * Scale notes: aggregations are partial+final hash aggregates (map-side
  * combine free via Catalyst); the dimension sides of joins (customer,
  * nation, region) are explicitly broadcast; sort+limit compiles to
  * TakeOrderedAndProject (no global sort at 100 TB).
  */
object Relational {

  private val D = DecimalType(18, 2)
  private def dec(c: Column): Column = c.cast(D)

  /** revenue term l_extendedprice * (1 - l_discount), exact decimal */
  private def revenue: Column =
    dec(col("l_extendedprice")) * (lit(1).cast(D) - dec(col("l_discount")))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // R1: projection-only scan — ReadSchema must show just these 4 columns.
    // No ORDER BY here: a full-table global sort nobody asked for is a
    // cluster-wide range partition at 100 TB. Determinism ordering for the
    // oracle hash is applied at the Verify boundary (verifySort).
    "q_scan_project" -> { (s, dir) =>
      Tables.register(s, dir)
      s.table("lineitem")
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
    },

    // R3: filter with parquet predicate pushdown (timestamp + double preds).
    "q_filter_pushdown" -> { (s, dir) =>
      Tables.register(s, dir)
      s.table("lineitem")
        .filter(col("l_shipdate") < lit("1997-01-01").cast("timestamp")
          && col("l_discount") > 0.05)
        .select("l_orderkey", "l_linenumber", "l_extendedprice", "l_discount")
      // row output: determinism sort lives at the Verify boundary
    },

    // R4: TPC-H Q1-style grouped aggregation, decimal-exact sums/avgs.
    "q_agg_pricing" -> { (s, dir) =>
      Tables.register(s, dir)
      s.table("lineitem")
        .filter(col("l_shipdate") <= lit("2000-12-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
          sum(dec(col("l_extendedprice"))).cast("double").as("sum_base_price"),
          sum(revenue).cast("double").as("sum_disc_price"),
          (sum(dec(col("l_quantity"))).cast("double") / count(lit(1)))
            .as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    },

    // R2: equi-join. No forced broadcast on customer: it scales with the
    // fact tables (sf100 ≈ 15M rows), so the join strategy is left to
    // size-based planning / AQE; only bounded dims (nation, region) get
    // explicit broadcast hints elsewhere.
    "q_join_segment" -> { (s, dir) =>
      Tables.register(s, dir)
      s.table("orders")
        .join(s.table("customer"),
          col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(
          count(lit(1)).as("n_orders"),
          sum(dec(col("o_totalprice"))).cast("double").as("revenue"))
        .orderBy("c_mktsegment")
    },

    // R2 chain: lineitem⋈orders⋈customer⋈nation⋈region (TPC-H Q5 shape);
    // all dimension sides broadcast, one shuffle for the final group-by.
    "q_multi_join_region" -> { (s, dir) =>
      Tables.register(s, dir)
      s.table("lineitem")
        .join(s.table("orders"), col("l_orderkey") === col("o_orderkey"))
        .join(s.table("customer"),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(s.table("nation")),
          col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(s.table("region")),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(sum(revenue).cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy("r_name", "n_name")
    },

    // R2 theta: non-equi self-join (BroadcastNestedLoop on a 5-row table).
    "q_theta_join_pairs" -> { (s, dir) =>
      Tables.register(s, dir)
      val r1 = s.table("region")
        .select(col("r_regionkey").as("a_key"), col("r_name").as("a_name"))
      val r2 = s.table("region")
        .select(col("r_regionkey").as("b_key"), col("r_name").as("b_name"))
      r1.join(broadcast(r2), col("a_key") < col("b_key"))
        .select("a_name", "b_name")
        .orderBy("a_name", "b_name")
    },

    // R2/R4 over the part/supplier dimensions (TPC-H Q2-ish shape). NO
    // explicit broadcast hints: part/supplier grow with the scale factor
    // (20M/1M rows at sf100 — too big to ship to every executor), so the
    // planner/AQE picks broadcast only while they actually fit. Explicit
    // hints stay reserved for fixed-cardinality dims (nation/region).
    "q_parts_supplied" -> { (s, dir) =>
      Tables.register(s, dir)
      s.table("lineitem")
        .join(s.table("part"), col("l_partkey") === col("p_partkey"))
        .join(s.table("supplier"), col("l_suppkey") === col("s_suppkey"))
        .groupBy("p_brand", "s_name")
        .agg(count(lit(1)).as("n_items"),
          sum(revenue).cast("double").as("revenue"))
        .orderBy("p_brand", "s_name")
    },

    // R5: HAVING — filter above the aggregate.
    "q_having_nations" -> { (s, dir) =>
      Tables.register(s, dir)
      s.table("customer")
        .groupBy("c_nationkey")
        .agg(count(lit(1)).as("n_cust"),
          sum(dec(col("c_acctbal"))).cast("double").as("total_bal"))
        .filter(col("n_cust") > 3)
        .orderBy("c_nationkey")
    },

    // R6+R7: ORDER BY + LIMIT → TakeOrderedAndProject (top-K, no global sort).
    "q_topk_orders" -> { (s, dir) =>
      Tables.register(s, dir)
      s.table("orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(10)
    },

    // R8: parenthesized subquery with mandatory alias — via the same
    // spark.sql path the DSL source-clause compiler uses.
    "q_subquery_alias" -> { (s, dir) =>
      Tables.register(s, dir)
      s.sql("""SELECT sub.o_custkey AS custkey, COUNT(*) AS n,
              |       CAST(SUM(CAST(sub.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spend
              |FROM (SELECT o_custkey, o_totalprice FROM orders
              |      WHERE o_totalprice > 1000) sub
              |GROUP BY sub.o_custkey
              |ORDER BY custkey""".stripMargin)
    },

    // §2.4 feature-expression algebra: + - * / unary-minus sqrt as row-level
    // projections (IEEE-exact, oracle-safe).
    "q_expr_features" -> { (s, dir) =>
      Tables.register(s, dir)
      s.table("lineitem")
        .select(
          col("l_orderkey"), col("l_linenumber"),
          sqrt(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .as("f_sqrt_rev"),
          ((col("l_quantity") + col("l_tax")) * lit(2.0)).as("f_lin"),
          (-col("l_discount")).as("f_neg"))
      // full-table sort moved to the Verify boundary (verifySort)
    },

    // §2.5 date functions: year/month buckets + datediff.
    "q_date_buckets" -> { (s, dir) =>
      Tables.register(s, dir)
      s.table("orders")
        .select(
          year(col("o_orderdate")).cast("bigint").as("y"),
          month(col("o_orderdate")).cast("bigint").as("m"),
          datediff(lit("2002-01-01").cast("date"), col("o_orderdate"))
            .cast("bigint").as("age_days"))
        .groupBy("y", "m")
        .agg(count(lit(1)).as("n"), max(col("age_days")).as("max_age"))
        .orderBy("y", "m")
    },

    // §2.5 CASE WHEN + conditional aggregation (DISTRIBUTED.md:640 pattern).
    "q_case_conditional_agg" -> { (s, dir) =>
      Tables.register(s, dir)
      s.table("orders")
        .groupBy("o_orderstatus")
        .agg(
          sum(when(col("o_totalprice") > 1000, lit(1L)).otherwise(lit(0L)))
            .as("n_big"),
          (sum(when(col("o_orderpriority") === "1-URGENT",
            dec(col("o_totalprice"))).otherwise(lit(0).cast(D)))
            .cast("double") / count(lit(1))).as("urgent_avg_spend"),
          count(lit(1)).as("n"))
        .orderBy("o_orderstatus")
    },

    // §2.5 JSON payload access (payload->>'k') over the events stream table.
    "q_json_props" -> { (s, dir) =>
      Tables.register(s, dir)
      s.table("events")
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("bigint").as("k"))
        .groupBy("event_type")
        .agg(sum(col("k")).as("k_sum"), count(lit(1)).as("n"))
        .orderBy("event_type")
    },

    // §2.5 INTERVAL arithmetic + timestamp filter over events.
    "q_interval_window" -> { (s, dir) =>
      Tables.register(s, dir)
      s.table("events")
        .filter(col("ts") >= lit("2024-01-03 00:00:00").cast("timestamp")
          - expr("INTERVAL 24 HOURS"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(dec(col("value"))).cast("double").as("value_sum"))
        .orderBy("event_type")
    }
  )

  /** Deterministic row-ordering applied only at the Verify boundary (the
    * driver's hash compare is row-order sensitive). Queries listed here stay
    * unsorted in the catalog — their plans are the ones we'd run at 100 TB —
    * and Verify sorts the (fixture-scale) result before dumping it. */
  def verifySort: Map[String, Seq[String]] = Map(
    "q_scan_project" -> Seq("l_orderkey", "l_linenumber"),
    "q_expr_features" -> Seq("l_orderkey", "l_linenumber"),
    "q_filter_pushdown" -> Seq("l_orderkey", "l_linenumber"))

  def oracles: Map[String, String] = Map(
    "q_scan_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q_filter_pushdown" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice, l_discount
        |FROM lineitem
        |WHERE l_shipdate < TIMESTAMP '1997-01-01' AND l_discount > 0.05
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q_agg_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '2000-12-01'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q_join_segment" ->
      """SELECT c_mktsegment, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "q_multi_join_region" ->
      """SELECT r_name, n_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin,

    "q_theta_join_pairs" ->
      """SELECT r1.r_name AS a_name, r2.r_name AS b_name
        |FROM region r1 JOIN region r2 ON r1.r_regionkey < r2.r_regionkey
        |ORDER BY a_name, b_name""".stripMargin,

    "q_parts_supplied" ->
      """SELECT p_brand, s_name, COUNT(*) AS n_items,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY p_brand, s_name ORDER BY p_brand, s_name""".stripMargin,

    "q_having_nations" ->
      """SELECT c_nationkey, COUNT(*) AS n_cust,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
        |FROM customer GROUP BY c_nationkey
        |HAVING COUNT(*) > 3 ORDER BY c_nationkey""".stripMargin,

    "q_topk_orders" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""".stripMargin,

    "q_subquery_alias" ->
      """SELECT sub.o_custkey AS custkey, COUNT(*) AS n,
        |       CAST(SUM(CAST(sub.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spend
        |FROM (SELECT o_custkey, o_totalprice FROM orders
        |      WHERE o_totalprice > 1000) sub
        |GROUP BY sub.o_custkey
        |ORDER BY custkey""".stripMargin,

    "q_expr_features" ->
      """SELECT l_orderkey, l_linenumber,
        |  sqrt(l_extendedprice * (1.0 - l_discount)) AS f_sqrt_rev,
        |  (l_quantity + l_tax) * 2.0 AS f_lin,
        |  -l_discount AS f_neg
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q_date_buckets" ->
      """SELECT CAST(year(o_orderdate) AS BIGINT) AS y,
        |       CAST(month(o_orderdate) AS BIGINT) AS m,
        |       COUNT(*) AS n,
        |       MAX(CAST(datediff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS BIGINT)) AS max_age
        |FROM orders GROUP BY 1, 2 ORDER BY y, m""".stripMargin,

    "q_case_conditional_agg" ->
      """SELECT o_orderstatus,
        |  CAST(SUM(CASE WHEN o_totalprice > 1000 THEN 1 ELSE 0 END) AS BIGINT) AS n_big,
        |  CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN CAST(o_totalprice AS DECIMAL(18,2)) ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) / COUNT(*) AS urgent_avg_spend,
        |  COUNT(*) AS n
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "q_json_props" ->
      """SELECT event_type,
        |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum,
        |  COUNT(*) AS n
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_interval_window" ->
      """SELECT event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
        |FROM events
        |WHERE ts >= TIMESTAMP '2024-01-03 00:00:00' - INTERVAL 24 HOURS
        |GROUP BY event_type ORDER BY event_type""".stripMargin
  )
}
