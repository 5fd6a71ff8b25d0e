package graft.dml.runtime

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Time-series support (reference DSL.md:296-313: WITH TIME COLUMN,
  * SEASONAL/TREND, FORECAST k AHEAD; feature helper
  * `time_series.lag(x, periods=[...])` DSL.md:88-95).
  *
  * Spark-native realization: lag/rolling features are window functions over
  * (entity, time) — hash-partitioned by entity, sorted within partition
  * only (no global sort). Forecasting maps to lag-feature regression
  * (the prophet stand-in, SURVEY §7.3).
  */
object TimeSeries {

  /** lag features for the given periods, partitioned by entity and ordered
    * by (time, tiebreak). */
  def lagFeatures(
      df: DataFrame, entityCol: String, timeCol: String, valueCol: String,
      periods: Seq[Int], tiebreak: String): DataFrame = {
    val w = Window.partitionBy(entityCol)
      .orderBy(col(timeCol).asc, col(tiebreak).asc)
    periods.foldLeft(df) { (acc, p) =>
      acc.withColumn(s"${valueCol}_lag_$p", lag(col(valueCol), p).over(w))
    }
  }

  /** rolling mean over the previous `n` rows (inclusive), decimal-exact so
    * the frame's accumulation order cannot change the result. */
  def rollingMean(
      df: DataFrame, entityCol: String, timeCol: String, valueCol: String,
      n: Int, tiebreak: String): DataFrame = {
    val w = Window.partitionBy(entityCol)
      .orderBy(col(timeCol).asc, col(tiebreak).asc)
      .rowsBetween(-(n - 1), 0)
    df.withColumn(s"${valueCol}_ma_$n",
      (sum(col(valueCol).cast(DecimalType(18, 2))).over(w).cast("double") /
        count(lit(1)).over(w)))
  }

  /** Trend feature: row index within the entity's timeline (the regression
    * "t" for lag-feature forecasting). */
  def timeIndex(
      df: DataFrame, entityCol: String, timeCol: String, tiebreak: String)
      : DataFrame = {
    val w = Window.partitionBy(entityCol)
      .orderBy(col(timeCol).asc, col(tiebreak).asc)
    df.withColumn("t_index", row_number().over(w).cast("double"))
  }
}
