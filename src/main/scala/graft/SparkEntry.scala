package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates the per-module operator catalogs; every entry with a
  * SQL-expressible semantics also appears in `oracleSql` (DuckDB ANSI SQL
  * over the same parquet tables) for the driver's hash-compare gate.
  */
object SparkEntry {

  /** Flagship on /root/testdata/sf0.001 (driver smoke-checks rows>0): the
    * full DeclarativeML story — parse a TRAIN statement (join source,
    * derived feature, split), fit the MLlib pipeline, and return scored
    * rows (SURVEY §7.2 slice 0). */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    Tables.register(spark, dir)
    val spec = dml.DmlParser.parse(
      "TRAIN MODEL flagship USING decision_tree(max_depth=4) FROM " +
        "orders JOIN customer ON orders.o_custkey = customer.c_custkey " +
        "WHERE o_totalprice > 1000 " +
        "PREDICT c_mktsegment " +
        "WITH FEATURES(o_totalprice, c_acctbal, " +
        "DERIVED(o_totalprice / (c_acctbal + 1000))) " +
        "SPLIT DATA training=0.8, test=0.2 OPTIMIZE FOR accuracy")
      .asInstanceOf[dml.TrainSpec]
    val report = dml.runtime.Trainer.train(spark, spec)
    report.model
      .transform(dml.TrainCompiler.trainingDataFrame(spark, spec))
      .select("o_totalprice", "c_acctbal", "c_mktsegment", "prediction")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    operators.Relational.queries ++ operators.TrainQueries.queries ++
      operators.ComputeQueries.queries ++ operators.LlmQueries.queries ++
      operators.EventQueries.queries ++ operators.FunctionQueries.queries ++
      operators.CurationQueries.queries ++ operators.RelevanceQueries.queries ++
      operators.SamplingQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    operators.Relational.oracles ++ operators.TrainQueries.oracles ++
      operators.ComputeQueries.oracles ++ operators.LlmQueries.oracles ++
      operators.EventQueries.oracles ++ operators.FunctionQueries.oracles ++
      operators.CurationQueries.oracles ++ operators.RelevanceQueries.oracles ++
      operators.SamplingQueries.oracles

  /** Row-ordering applied by Verify (not Bench) before dumping results whose
    * catalog plan intentionally carries no global sort. */
  def verifySort: Map[String, Seq[String]] =
    operators.Relational.verifySort ++ operators.TrainQueries.verifySort ++
      operators.ComputeQueries.verifySort ++ operators.LlmQueries.verifySort ++
      operators.EventQueries.verifySort ++ operators.FunctionQueries.verifySort ++
      operators.CurationQueries.verifySort ++
      operators.RelevanceQueries.verifySort ++
      operators.SamplingQueries.verifySort
}
