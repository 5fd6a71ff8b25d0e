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

  /** Rolling z-score anomaly flags over each entity's trailing-n window —
    * the MONITOR-tier primitive for metric streams (drift detection's
    * per-point cousin): mean and variance from DECIMAL-summed window
    * aggregates (partition-order-independent, so the DuckDB oracle
    * replays them exactly; the same discipline as [[rollingMean]]),
    * z = (x − mean)/std rounded to 6 dp, flagged when |z| > `z`.
    * Windows with zero variance (or a single row) yield NULL z and an
    * unflagged row. One keyed window per entity — bounded frames, never
    * a global sort. */
  def anomalyFlags(
      df: DataFrame, entityCol: String, timeCol: String, valueCol: String,
      n: Int, z: Double = 3.0, tiebreak: String = "event_id"): DataFrame = {
    require(n > 1, s"window must span more than one row, got $n")
    // nulls LAST to match DuckDB's default ORDER BY (the deliveryOrder
    // convention): a null-ts event must fill the same window slots in
    // both engines or the oracle diverges
    val w = Window.partitionBy(entityCol)
      .orderBy(col(timeCol).asc_nulls_last, col(tiebreak).asc_nulls_last)
      .rowsBetween(-(n - 1), 0)
    val cnt = count(lit(1)).over(w)
    val mean = sum(col(valueCol).cast(DecimalType(18, 2))).over(w)
      .cast("double") / cnt
    val m2 = sum((col(valueCol) * col(valueCol)).cast(DecimalType(28, 6)))
      .over(w).cast("double") / cnt
    val variance = m2 - mean * mean
    val std = sqrt(greatest(variance, lit(0.0)))
    // normZero: a tiny-negative z (e.g. -1e-16) rounds to -0.0 in DuckDB
    // but +0.0 through Spark's BigDecimal round — normalize before hashing
    val zscore = when(cnt > 1 && std > 0,
      normZero(round((col(valueCol) - mean) / std, 6)))
    df.withColumn("zscore", zscore)
      .withColumn("is_anomaly", coalesce(abs(zscore) > z, lit(false)))
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

  /** SEASONAL <granularity> → the calendar component of the time column
    * (DSL.md:307: `SEASONAL weekday`). Pure per-row projection. */
  def seasonalColumn(time: Column, granularity: String): Column =
    granularity.toLowerCase match {
      case "weekday" | "weekly" | "dow" => dayofweek(time).cast("double")
      case "month" | "monthly"          => month(time).cast("double")
      case "year" | "yearly"            => dayofyear(time).cast("double")
      case "quarter" | "quarterly"      => quarter(time).cast("double")
      case "hour" | "hourly"            => hour(time).cast("double")
      case other => throw new IllegalArgumentException(
        s"unsupported SEASONAL granularity: $other")
    }

  /** IEEE negative-zero normalization for cross-engine rounded doubles:
    * DuckDB's libm `round(sin(k·2π/period), 6)` yields -0.0 at exact cycle
    * multiples while Spark's BigDecimal HALF_UP round yields +0.0 — the
    * two hash differently in the oracle dump. See
    * [[graft.functions.CrossEngine.normZero]] (the canonical definition)
    * for the full convention. */
  def normZero(x: Column): Column =
    graft.functions.CrossEngine.normZero(x)

  /** The cycle length of each granularity's calendar component — the
    * Fourier period (365.25 absorbs leap years the way Prophet's yearly
    * seasonality does). */
  private[dml] val fourierPeriod: Map[String, Double] = Map(
    "weekday" -> 7.0, "weekly" -> 7.0, "dow" -> 7.0,
    "month" -> 12.0, "monthly" -> 12.0,
    "year" -> 365.25, "yearly" -> 365.25,
    "quarter" -> 4.0, "quarterly" -> 4.0,
    "hour" -> 24.0, "hourly" -> 24.0)

  /** All columns one SEASONAL marker derives: the raw calendar component
    * plus its first-harmonic Fourier pair sin/cos(2π·phase/period) — the
    * basis that lets a LINEAR fit represent a phase-shifted sinusoidal
    * seasonal effect (the prophet stand-in's genuine decomposition;
    * Prophet itself fits exactly such Fourier terms, Taylor & Letham 2017
    * §3.2). The raw component stays: tree algorithms split on it
    * directly, and it is the DSL.md:307 surface. Rounded to 6 decimals so
    * the engine and a DuckDB oracle fold to identical doubles (the VecDot
    * convention). Pure per-row projection — no shuffle, codegen-friendly. */
  def seasonalColumns(time: Column, granularity: String)
      : Seq[(String, Column)] = {
    val phase = seasonalColumn(time, granularity)
    val c = 2 * math.Pi / fourierPeriod(granularity.toLowerCase)
    Seq(
      s"season_$granularity" -> phase,
      s"season_${granularity}_sin" -> normZero(round(sin(phase * c), 6)),
      s"season_${granularity}_cos" -> normZero(round(cos(phase * c), 6)))
  }

  /** Adds the clause-derived columns to a frame that carries the time
    * column: `season_<g>` per SEASONAL marker and, for `TREND linear`,
    * `t_index` = the time step's dense rank.
    *
    * Scale shape of the trend: the rank window runs over the DISTINCT
    * timestamps (a step-count-sized table — days/hours, not rows) and is
    * broadcast-joined back, so ties share an index (deterministic, the
    * dense_rank semantics) and no row-count-sized single-partition window
    * ever exists — the same histogram trick as Sampling.percentRank. */
  /** Changepoint j's position on the t_index axis: k hinge knots placed
    * evenly over the first 80% of the observed timeline — Prophet's
    * default changepoint_range=0.8 with uniformly-spaced candidate
    * changepoints (Taylor & Letham 2017 §3.1). Deterministic in the
    * distinct-step count, so an external oracle can replay it; the column
    * twin below must stay formula-identical (both clamp at 0 so the
    * S<=1 rounding edge cannot diverge between engines). */
  private[dml] def changepointPosition(
      distinctSteps: Long, k: Int, j: Int): Double =
    math.max(0L,
      math.round((math.floor(0.8 * distinctSteps) - 1) * j.toDouble / k))
      .toDouble

  /** [[changepointPosition]] as a Column over a distinct-step-count
    * column — the forecast path's form (no driver-side collect). */
  private[dml] def changepointPositionCol(
      steps: Column, k: Int, j: Int): Column =
    greatest(lit(0.0),
      round((floor(steps * 0.8) - lit(1.0)) * j / k, 0))

  /** The piecewise-linear trend basis for `changepoints=k`: hinge features
    * max(0, t_index − s_j) whose fitted coefficients are the trend's slope
    * deltas — exactly Prophet's changepoint parameterization (Taylor &
    * Letham 2017 eq. 4, a(t)·δ with a(t) the hinge indicator integrated
    * over t). Pure per-row projections off t_index: no extra shuffle.
    *
    * `cpScale` pre-multiplies every hinge — the standardization-aware
    * rendering of `changepoint_prior_scale=tau`
    * ([[graft.dml.TrainCompiler.changepointPriorScale]]): with
    * standardization off and a global L2 term lambda, a tau-scaled
    * hinge's coefficient carries an effective ridge of lambda/tau^2,
    * so ONLY the trend deltas stiffen as tau shrinks. 1.0 (no knob) is
    * the identity. */
  private def withChangepoints(
      df: DataFrame, distinctSteps: Long, k: Int,
      cpScale: Double): DataFrame =
    (1 to k).foldLeft(df) { (acc, j) =>
      val hinge = greatest(lit(0.0),
        col("t_index") - lit(changepointPosition(distinctSteps, k, j)))
      acc.withColumn(s"cp_$j",
        if (cpScale == 1.0) hinge else hinge * lit(cpScale))
    }

  /** Holiday indicator basis (prophet's `holidays=[dates]` binding,
    * Taylor & Letham 2017 §3.3): holiday_j = 1.0 on date j, else 0 —
    * pure per-row projections, shared by training and forecast. */
  private[dml] def withHolidays(
      df: DataFrame, time: Column, holidays: Seq[String]): DataFrame =
    holidays.zipWithIndex.foldLeft(df) { case (acc, (d, j)) =>
      acc.withColumn(s"holiday_${j + 1}",
        when(to_date(time) === lit(d).cast("date"), 1.0).otherwise(0.0))
    }

  def withClauseFeatures(
      df: DataFrame, ts: graft.dml.TimeSeriesClause,
      maxDistinctSteps: Long = 1000000L,
      changepoints: Option[Int] = None,
      holidays: Seq[String] = Nil,
      cpScale: Double = 1.0): DataFrame = {
    val t = col(ts.timeColumn)
    // NULL time values carry no position on the timeline and are dropped
    // UP FRONT — otherwise the trend's inner step join would silently
    // remove them only when TREND is present, training on different row
    // sets depending on the clause mix
    val timed = df.filter(t.isNotNull)
    val seasonal0 = ts.seasonal.foldLeft(timed) { (acc, g) =>
      seasonalColumns(t, g).foldLeft(acc) { case (a, (name, c)) =>
        a.withColumn(name, c)
      }
    }
    val seasonal = withHolidays(seasonal0, t, holidays)
    ts.trend match {
      case None =>
        require(changepoints.isEmpty,
          "prophet changepoints=k shape the linear trend: add TREND " +
            "linear to the FEATURES clause")
        seasonal
      case Some("linear") =>
        // the distinct-step table is materialized once and reused by the
        // count, the rank window, AND the broadcast join — the
        // cardinality guard costs no extra scan (percentRank's pattern).
        // Near-unique (continuous) timestamps would make this a
        // row-count-sized single-partition window + broadcast; refuse
        // and ask for discretization instead of silently building it.
        val steps = graft.llm.PipelineCaches.track(
          timed.select(t).distinct()
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
        val distinct = steps.count()
        require(distinct <= maxDistinctSteps,
          s"TREND linear over '${ts.timeColumn}': $distinct distinct time " +
            s"steps exceed maxDistinctSteps=$maxDistinctSteps; the step " +
            "rank table would approach row count and its window/broadcast " +
            "stop being step-sized. Discretize the time column first " +
            "(e.g. date_trunc('hour', ts)) or raise the cap explicitly.")
        val w = Window.orderBy(t)
        val ranked = steps
          .withColumn("t_index", row_number().over(w).cast("double"))
        val trended = seasonal.join(broadcast(ranked), Seq(ts.timeColumn))
        changepoints.fold(trended)(
          withChangepoints(trended, distinct, _, cpScale))
      case Some(other) => throw new IllegalArgumentException(
        s"unsupported TREND type: $other (only 'linear' is implemented)")
    }
  }

  /** Names the clause contributes to the training frame, in order —
    * season components, trend index, changepoint hinges, then holiday
    * indicators. */
  def clauseFeatureNames(
      ts: graft.dml.TimeSeriesClause,
      changepoints: Option[Int] = None,
      holidays: Seq[String] = Nil): Seq[String] =
    ts.seasonal.flatMap(g =>
      Seq(s"season_$g", s"season_${g}_sin", s"season_${g}_cos")) ++
      ts.trend.map(_ => "t_index") ++
      changepoints.toSeq.flatMap(k => (1 to k).map(j => s"cp_$j")) ++
      holidays.indices.map(j => s"holiday_${j + 1}")

  /** Inverse normal CDF (Acklam's rational approximation, max rel error
    * ~1.15e-9) — the z for a symmetric confidence band without any stats
    * dependency. */
  private[runtime] def normInv(p: Double): Double = {
    require(p > 0 && p < 1, "probability must be in (0, 1)")
    val a = Array(-3.969683028665376e+01, 2.209460984245205e+02,
      -2.759285104469687e+02, 1.383577518672690e+02,
      -3.066479806614716e+01, 2.506628277459239e+00)
    val b = Array(-5.447609879822406e+01, 1.615858368580409e+02,
      -1.556989798598866e+02, 6.680131188771972e+01, -1.328068155288572e+01)
    val c = Array(-7.784894002430293e-03, -3.223964580411365e-01,
      -2.400758277161838e+00, -2.549732539343734e+00,
      4.374664141464968e+00, 2.938163982698783e+00)
    val d = Array(7.784695709041462e-03, 3.224671290700398e-01,
      2.445134137142996e+00, 3.754408661907416e+00)
    val pl = 0.02425
    if (p < pl) {
      val q = math.sqrt(-2 * math.log(p))
      (((((c(0) * q + c(1)) * q + c(2)) * q + c(3)) * q + c(4)) * q + c(5)) /
        ((((d(0) * q + d(1)) * q + d(2)) * q + d(3)) * q + 1)
    } else if (p <= 1 - pl) {
      val q = p - 0.5; val r = q * q
      (((((a(0) * r + a(1)) * r + a(2)) * r + a(3)) * r + a(4)) * r + a(5)) * q /
        (((((b(0) * r + b(1)) * r + b(2)) * r + b(3)) * r + b(4)) * r + 1)
    } else {
      val q = math.sqrt(-2 * math.log(1 - p))
      -(((((c(0) * q + c(1)) * q + c(2)) * q + c(3)) * q + c(4)) * q + c(5)) /
        ((((d(0) * q + d(1)) * q + d(2)) * q + d(3)) * q + 1)
    }
  }

  /** FORECAST n <unit> AHEAD (DSL.md:310-312): builds the n future time
    * steps after the training frame's max time, derives the same clause
    * features (seasonal components; trend index continuing past the last
    * observed step), scores them with the fitted model, and attaches a
    * symmetric normal-approximation band per requested confidence level
    * (`lo_80`/`hi_80` for 0.8): prediction ± z·σ with σ the training
    * residual RMSE — the prophet stand-in's intervals.
    *
    * Only clause-derived features can be known for future rows, so the
    * spec's FEATURES list must be empty of source expressions (exogenous
    * regressors need caller-supplied future values — pass those through
    * [[withClauseFeatures]] + model.transform directly). */
  def forecast(
      spark: org.apache.spark.sql.SparkSession,
      spec: graft.dml.TrainSpec,
      report: Trainer.TrainReport): DataFrame = {
    // EVERYTHING below derives from report.spec — the TRAINED
    // resolution (bare-name holiday calendars rewritten to literal
    // dates by Trainer.train). The `spec` parameter is kept for call
    // shape but must describe the same statement; deriving half the
    // features from a caller-held unresolved spec and half from the
    // trained one would silently mix resolutions (the only param
    // resolution rewrites is `holidays`, but one source of truth
    // removes the divergence class entirely).
    val rs = report.spec
    // the EFFECTIVE clause: prophet's binding seasonality=[...] param
    // merged in, so future rows carry every Fourier column the fitted
    // assembler expects
    val ts = graft.dml.TrainCompiler.effectiveClause(rs)
      .getOrElse(throw new IllegalArgumentException(
        "forecast requires a TRAIN statement WITH TIME COLUMN"))
    require(rs.features.isEmpty,
      "FORECAST n AHEAD supports clause features only (SEASONAL/TREND); " +
        "exogenous regressors need future values supplied by the caller")
    val n = ts.horizon.getOrElse(throw new IllegalArgumentException(
      "the TRAIN statement has no FORECAST n AHEAD clause"))
    val unit = ts.horizonUnit.getOrElse("days").toLowerCase match {
      case "day" | "days"     => "day"
      case "hour" | "hours"   => "hour"
      case "week" | "weeks"   => "week"
      case "month" | "months" => "month"
      case other => throw new IllegalArgumentException(
        s"unsupported FORECAST unit: $other")
    }
    val src = spark.sql(
      s"SELECT * FROM ${graft.dml.TrainCompiler.sourceFragment(rs)}")
    // a DATE time column cannot carry sub-day steps: casting the
    // timestampadd result back to DATE would silently truncate every
    // future hour onto the same date (n duplicate forecast rows) —
    // reject instead
    val timeType = src.schema(ts.timeColumn).dataType
    if (timeType == org.apache.spark.sql.types.DateType && unit == "hour")
      throw new IllegalArgumentException(
        s"FORECAST n hours AHEAD needs a timestamp time column; " +
          s"'${ts.timeColumn}' is DATE — hourly future steps would " +
          "truncate to duplicate dates. Cast the column to timestamp " +
          "or forecast in days/weeks/months.")
    // timeline end + last trend index: a one-row aggregate cross-joined
    // into the n future rows (no driver-side timestamp formatting)
    val future = src.agg(
        max(col(ts.timeColumn)).as("_max_t"),
        countDistinct(col(ts.timeColumn)).as("_steps"))
      .crossJoin(spark.range(1, n + 1))
      .select((col("id") + col("_steps")).cast("double").as("t_index"),
        expr(s"timestampadd($unit, id, _max_t)")
          .cast(timeType).as(ts.timeColumn),
        col("_steps"))
    val seasonalFeats = ts.seasonal.foldLeft(future) { (acc, g) =>
      seasonalColumns(col(ts.timeColumn), g).foldLeft(acc) {
        case (a, (name, c)) => a.withColumn(name, c)
      }
    }
    // changepoint hinges continue past the training window frozen at
    // their last observed slope: every future t_index exceeds every knot
    // (knots live in the first 80% of history), so the hinge is linear
    // there — exactly Prophet's default non-Bayesian extrapolation
    // changepoint_prior_scale's tau pre-multiplies the future hinges the
    // same way it pre-multiplied the training basis — the fitted
    // coefficients bind against the SCALED columns, so the forecast frame
    // must scale identically or every trend delta would inflate by 1/tau
    val cpScale = graft.dml.TrainCompiler.changepointPriorScale(rs)
      .getOrElse(1.0)
    val hinged = graft.dml.TrainCompiler.changepointCount(rs)
      .fold(seasonalFeats) { k =>
        (1 to k).foldLeft(seasonalFeats) { (acc, j) =>
          val hinge = greatest(lit(0.0), col("t_index") -
            changepointPositionCol(col("_steps"), k, j))
          acc.withColumn(s"cp_$j",
            if (cpScale == 1.0) hinge else hinge * lit(cpScale))
        }
      }
    // holiday indicators on the future dates (a future row CAN land on a
    // bound holiday — the effect extrapolates, exactly Prophet's model).
    // Dates come from the TRAINED spec (report.spec — bare-name
    // calendars resolved once by Trainer.train), so a calendar view
    // redefined after training can never remap holiday_j onto a date
    // its fitted coefficient never saw
    val feats = withHolidays(hinged, col(ts.timeColumn),
      graft.dml.TrainCompiler.holidayDates(rs).getOrElse(Nil))
    // the fitted pipeline's label-cast stage references the target column;
    // future rows have no observed target, so feed a placeholder (the
    // prediction never reads it)
    val scored = report.model.transform(
      feats.withColumn(rs.target, lit(0.0)))
    // residual RMSE on the training frame — σ for the normal band.
    // Rebuilt from report.spec (the TRAINED resolution), like the
    // holiday indicators above: the caller's spec may still carry a
    // bare calendar name whose view was redefined — or dropped — after
    // training, and the σ frame must be the frame the model was fitted
    // on, not a re-resolution of live session state
    val trained = report.model.transform(
      graft.dml.TrainCompiler.trainingDataFrame(spark, rs))
    val sigma = trained.agg(
      sqrt(avg(pow(col("prediction") - col(rs.target), 2))))
      .collect()(0).getDouble(0)
    val out = ts.confidence.foldLeft(
      scored.select(col(ts.timeColumn), col("t_index"), col("prediction"))) {
      (acc, level) =>
        val z = normInv((1 + level) / 2)
        val tag = math.round(level * 100).toString
        acc.withColumn(s"lo_$tag", col("prediction") - z * sigma)
          .withColumn(s"hi_$tag", col("prediction") + z * sigma)
    }
    out
  }
}
