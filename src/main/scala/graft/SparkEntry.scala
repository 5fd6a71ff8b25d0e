package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates the per-module operator catalogs; every entry with a
  * SQL-expressible semantics also appears in `oracleSql` (DuckDB ANSI SQL
  * over the same parquet tables) for the driver's hash-compare gate.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    queries("q_multi_join_region")(spark, dir)
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    operators.Relational.queries ++ operators.TrainQueries.queries ++
      operators.ComputeQueries.queries ++ operators.LlmQueries.queries ++
      operators.EventQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    operators.Relational.oracles ++ operators.TrainQueries.oracles ++
      operators.ComputeQueries.oracles ++ operators.LlmQueries.oracles ++
      operators.EventQueries.oracles

  /** Row-ordering applied by Verify (not Bench) before dumping results whose
    * catalog plan intentionally carries no global sort. */
  def verifySort: Map[String, Seq[String]] =
    operators.Relational.verifySort ++ operators.TrainQueries.verifySort ++
      operators.ComputeQueries.verifySort ++ operators.LlmQueries.verifySort ++
      operators.EventQueries.verifySort
}
