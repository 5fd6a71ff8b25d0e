package graft.dml.runtime

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.dml.SourceValidator

/** CREATE FEATURE TRANSFORMER name AS SELECT … (SURVEY §2.1 S5,
  * reference/DSL.md:79-86): a named, reusable feature query registered as a
  * temp view, expanded by Catalyst at every use site (so pushdown and
  * pruning run through it like any inline subquery).
  */
object FeatureTransformers {

  /** Register the transformer; the SELECT passes the same forbidden-token
    * injection screen as FROM fragments (statement terminators, comments,
    * DDL/DML keywords). */
  def create(spark: SparkSession, name: String, select: String): Unit = {
    val t = select.trim
    if (!t.toUpperCase.startsWith("SELECT"))
      throw new IllegalArgumentException(
        s"feature transformer '$name' must be a SELECT query")
    SourceValidator.validateTransformerSelect(t)
    spark.sql(t).createOrReplaceTempView(name)
  }

  def apply(spark: SparkSession, name: String): DataFrame = spark.table(name)
}
