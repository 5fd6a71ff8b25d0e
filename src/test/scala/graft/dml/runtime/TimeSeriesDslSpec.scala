package graft.dml.runtime

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.dml.{DmlParser, TrainCompiler, TrainSpec}

/** Time-series DSL clauses (reference DSL.md:296-313): WITH TIME COLUMN,
  * SEASONAL/TREND feature markers, FORECAST n unit AHEAD, WITH CONFIDENCE
  * INTERVALS — parse, compile, fit, forecast. */
class TimeSeriesDslSpec extends AnyFunSuite {

  private def spark = SparkTestSession.withTables()

  private val headlineDml =
    "TRAIN MODEL sales_forecast " +
      "USING prophet(seasonality=['yearly', 'weekly']) " +
      "FROM orders PREDICT o_totalprice " +
      "WITH TIME COLUMN o_orderdate " +
      "AND FEATURES(SEASONAL weekday, SEASONAL month, TREND linear) " +
      "FORECAST 30 days AHEAD " +
      "WITH CONFIDENCE INTERVALS 0.8, 0.95"

  test("the DSL.md headline time-series statement parses completely") {
    val spec = DmlParser.parse(headlineDml).asInstanceOf[TrainSpec]
    val ts = spec.timeSeries.get
    assert(ts.timeColumn == "o_orderdate")
    assert(ts.seasonal == List("weekday", "month"))
    assert(ts.trend.contains("linear"))
    assert(ts.horizon.contains(30L) && ts.horizonUnit.contains("days"))
    assert(ts.confidence == List(0.8, 0.95))
    assert(spec.features.isEmpty, "markers must not leak into features")
    assert(spec.algorithm == "prophet")
  }

  test("ordinary features mix with markers; options still parse after") {
    val spec = DmlParser.parse(
      "TRAIN MODEL m USING prophet FROM orders PREDICT o_totalprice " +
        "WITH TIME COLUMN o_orderdate " +
        "AND FEATURES(o_shippriority, SEASONAL weekday, TREND linear) " +
        "SPLIT DATA training=0.8, test=0.2").asInstanceOf[TrainSpec]
    assert(spec.features == List("o_shippriority"))
    assert(spec.timeSeries.get.seasonal == List("weekday"))
    assert(spec.split.isDefined)
  }

  test("clause validation: horizon and confidence bounds") {
    val e1 = intercept[IllegalArgumentException](DmlParser.parse(
      "TRAIN MODEL m USING prophet FROM t PREDICT y " +
        "WITH TIME COLUMN ts AND FEATURES(TREND linear) " +
        "FORECAST 0 days AHEAD"))
    assert(e1.getMessage.contains("positive"))
    val e2 = intercept[IllegalArgumentException](DmlParser.parse(
      "TRAIN MODEL m USING prophet FROM t PREDICT y " +
        "WITH TIME COLUMN ts AND FEATURES(TREND linear) " +
        "FORECAST 7 days AHEAD WITH CONFIDENCE INTERVALS 1.5"))
    assert(e2.getMessage.contains("between 0 and 1"))
  }

  test("prophet params: every DSL.md knob binds — seasonality, calendar " +
    "holidays, and (since r12) changepoint_prior_scale") {
    // DSL.md:297-301 knobs on the stand-in: the reference's own example
    // must fit. `seasonality=[...]` BINDS as extra Fourier granularities;
    // the bare-name `holidays=us_holidays` BINDS by resolving a
    // registered calendar view of that name; `changepoint_prior_scale`
    // BINDS as a per-hinge ridge via standardization-aware rescaling —
    // ignoredParams must come back EMPTY: no inert knobs remain.
    val s = spark
    import s.implicits._
    Seq("1995-01-02", "1995-07-04", "1995-12-25")
      .toDF("ds").select(col("ds").cast("date").as("ds"))
      .createOrReplaceTempView("us_holidays")
    val spec = DmlParser.parse(
      "TRAIN MODEL m USING prophet(seasonality=['yearly', 'weekly'], " +
        "holidays=us_holidays, changepoints=2, " +
        "changepoint_prior_scale=0.05, max_iter=5) " +
        "FROM orders PREDICT o_totalprice " +
        "WITH TIME COLUMN o_orderdate AND FEATURES(TREND linear)")
      .asInstanceOf[TrainSpec]
    assert(spec.params.map(_._1) ==
      List("seasonality", "holidays", "changepoints",
        "changepoint_prior_scale", "max_iter"))
    // feature naming on a bare-name-calendar spec goes through the
    // explicit-session resolve first (r12: holidayDates no longer falls
    // back to the thread-local active session)
    assert(TrainCompiler.featureNames(
      TrainCompiler.withResolvedCalendar(spec, s)) ==
      Seq("season_yearly", "season_yearly_sin", "season_yearly_cos",
        "season_weekly", "season_weekly_sin", "season_weekly_cos",
        "t_index", "cp_1", "cp_2", "holiday_1", "holiday_2", "holiday_3"),
      "seasonality must contribute Fourier columns and the registered " +
        "calendar its per-date indicators")
    val report = Trainer.train(s, spec)
    assert(report.ignoredParams.isEmpty,
      "no prophet knob is inert any more — ignoredParams must be empty")
  }

  test("changepoint_prior_scale stiffens ONLY the trend deltas " +
    "(ridge-by-rescaling, standardization-aware)") {
    val s = spark
    import s.implicits._
    // noise-free tent series: slope +0.5 for 60 days, then -1.0. A loose
    // prior must let the hinges bend to fit it; a near-zero prior must
    // pin the deltas at ~0, collapsing the fit to the single global line.
    (0 until 100).map { i =>
      val day = java.time.LocalDate.of(2024, 1, 1).plusDays(i.toLong)
      val y = if (i < 60) 10.0 + 0.5 * i else 10.0 + 0.5 * 60 - 1.0 * (i - 60)
      (java.sql.Timestamp.valueOf(day.atStartOfDay), y)
    }.toDF("day", "y").createOrReplaceTempView("ts_prior")
    def fit(tau: String): Trainer.TrainReport = Trainer.train(s,
      DmlParser.parse(
        s"TRAIN MODEL m USING prophet(changepoints=5, " +
          s"changepoint_prior_scale=$tau) FROM ts_prior PREDICT y " +
          "WITH TIME COLUMN day AND FEATURES(TREND linear)")
        .asInstanceOf[TrainSpec])
    val loose = fit("10.0")
    val stiff = fit("0.0001")
    // behavior level: loose bends around the slope break, stiff cannot
    assert(loose.metrics("rmse") < 0.3 * stiff.metrics("rmse"),
      s"loose prior must fit the tent (rmse=${loose.metrics("rmse")}), " +
        s"stiff must stay near-linear (rmse=${stiff.metrics("rmse")})")
    // coefficient level: the EFFECTIVE slope delta of hinge j is
    // beta_j * tau (the basis is tau * hinge); near-zero tau must crush it
    def effectiveDeltas(r: Trainer.TrainReport, tau: Double): Double = {
      val lr = r.model.stages.collectFirst {
        case m: org.apache.spark.ml.regression.LinearRegressionModel => m
      }.get
      val names = TrainCompiler.featureNames(r.spec)
      names.zipWithIndex.collect {
        case (n, i) if n.startsWith("cp_") =>
          math.abs(lr.coefficients(i) * tau)
      }.sum
    }
    val looseBend = effectiveDeltas(loose, 10.0)
    val stiffBend = effectiveDeltas(stiff, 0.0001)
    assert(stiffBend < 0.05 * looseBend,
      s"lambda/tau^2 must shrink the deltas: stiff=$stiffBend " +
        s"loose=$looseBend")
    // an explicit nonzero changepoints fit WITHOUT the knob keeps the
    // legacy unpenalized path (no regParam injected): rmse stays tiny
    val plain = Trainer.train(s, DmlParser.parse(
      "TRAIN MODEL m USING prophet(changepoints=5) FROM ts_prior " +
        "PREDICT y WITH TIME COLUMN day AND FEATURES(TREND linear)")
      .asInstanceOf[TrainSpec])
    assert(plain.metrics("rmse") < 1.0)
  }

  test("changepoint_prior_scale forecast uses the SAME scaled basis the " +
    "coefficients were fitted on") {
    val s = spark
    import s.implicits._
    (0 until 100).map { i =>
      val day = java.time.LocalDate.of(2024, 1, 1).plusDays(i.toLong)
      val y = if (i < 60) 10.0 + 0.5 * i else 10.0 + 0.5 * 60 - 1.0 * (i - 60)
      (java.sql.Timestamp.valueOf(day.atStartOfDay), y)
    }.toDF("day", "y").createOrReplaceTempView("ts_prior_fc")
    val spec = DmlParser.parse(
      "TRAIN MODEL m USING prophet(changepoints=5, " +
        "changepoint_prior_scale=10.0) FROM ts_prior_fc PREDICT y " +
        "WITH TIME COLUMN day AND FEATURES(TREND linear) " +
        "FORECAST 10 days AHEAD").asInstanceOf[TrainSpec]
    val report = Trainer.train(s, spec)
    val fc = TimeSeries.forecast(s, spec, report).orderBy("t_index").collect()
    // a basis mismatch would multiply every hinge contribution by 1/tau
    // (here 10x) and wreck the extrapolated slope; the -1.0/day final
    // segment must continue
    val deltas = fc.sliding(2).map(p =>
      p(1).getAs[Double]("prediction") - p(0).getAs[Double]("prediction"))
    deltas.foreach(d => assert(math.abs(d - (-1.0)) < 0.2,
      s"future step slope $d should continue the last trend segment"))
  }

  test("changepoint_prior_scale misuse refuses loud") {
    val s = spark
    def train(dml: String) =
      Trainer.train(s, DmlParser.parse(dml).asInstanceOf[TrainSpec])
    // without changepoints there are no deltas to tune
    val e1 = intercept[IllegalArgumentException](train(
      "TRAIN MODEL m USING prophet(changepoint_prior_scale=0.05) " +
        "FROM orders PREDICT o_totalprice " +
        "WITH TIME COLUMN o_orderdate AND FEATURES(TREND linear)"))
    assert(e1.getMessage.contains("add changepoints=k"))
    // non-positive / non-numeric scales refuse at parse-out
    val e2 = intercept[IllegalArgumentException](train(
      "TRAIN MODEL m USING prophet(changepoints=2, " +
        "changepoint_prior_scale=0) FROM orders PREDICT o_totalprice " +
        "WITH TIME COLUMN o_orderdate AND FEATURES(TREND linear)"))
    assert(e2.getMessage.contains("positive finite"))
  }

  test("bare-name calendar resolves ONCE at train time; a redefined " +
    "view cannot remap the fitted holiday basis") {
    val s = spark
    import s.implicits._
    Seq("1995-03-01").toDF("ds").select(col("ds").cast("date").as("ds"))
      .createOrReplaceTempView("cal_once")
    val spec = DmlParser.parse(
      "TRAIN MODEL m_cal USING prophet(holidays=cal_once) " +
        "FROM orders PREDICT o_totalprice " +
        "WITH TIME COLUMN o_orderdate AND FEATURES(TREND linear) " +
        "FORECAST 3 days AHEAD").asInstanceOf[TrainSpec]
    val report = Trainer.train(s, spec)
    // the trained spec carries the resolved LITERAL list, not the name
    assert(TrainCompiler.holidayDates(report.spec) ==
      Some(List("1995-03-01")))
    // redefining the view afterwards changes nothing the model sees:
    // forecast binds from report.spec and still produces the fitted
    // single-holiday basis
    Seq("1990-01-01", "1991-01-01").toDF("ds")
      .select(col("ds").cast("date").as("ds"))
      .createOrReplaceTempView("cal_once")
    assert(TrainCompiler.holidayDates(report.spec) ==
      Some(List("1995-03-01")))
    // the strongest form: DROP the view entirely — forecast (both the
    // future-row holiday indicators AND the residual-σ training-frame
    // rebuild) must run purely from report.spec's captured dates
    s.catalog.dropTempView("cal_once")
    val fc = TimeSeries.forecast(s, spec, report)
    assert(fc.count() == 3)
  }

  test("bare-name holidays with no registered calendar fails loud") {
    val s = spark
    val spec = DmlParser.parse(
      "TRAIN MODEL m USING prophet(holidays=missing_calendar) " +
        "FROM orders PREDICT o_totalprice " +
        "WITH TIME COLUMN o_orderdate AND FEATURES(TREND linear)")
      .asInstanceOf[TrainSpec]
    val e = intercept[IllegalArgumentException] {
      Trainer.train(s, spec)
    }
    assert(e.getMessage.contains("missing_calendar") &&
      e.getMessage.contains("register"),
      s"must point at the missing registration: ${e.getMessage}")
  }

  test("holidayDates on an UNRESOLVED bare-name spec refuses loud — " +
    "it never falls back to the thread-local active session's catalog") {
    val s = spark
    import s.implicits._
    // even with the view REGISTERED in the active session, consulting
    // holidayDates before the resolve-once rewrite is a contract error:
    // under concurrent sessions the thread-local lookup could bind a
    // different catalog's view than the caller's
    Seq("1995-03-01").toDF("ds").select(col("ds").cast("date").as("ds"))
      .createOrReplaceTempView("cal_unresolved")
    val spec = DmlParser.parse(
      "TRAIN MODEL m USING prophet(holidays=cal_unresolved) " +
        "FROM orders PREDICT o_totalprice " +
        "WITH TIME COLUMN o_orderdate AND FEATURES(TREND linear)")
      .asInstanceOf[TrainSpec]
    val e = intercept[IllegalStateException] {
      TrainCompiler.holidayDates(spec)
    }
    assert(e.getMessage.contains("withResolvedCalendar"), e.getMessage)
    // the rewrite with an EXPLICIT session is the sanctioned path
    assert(TrainCompiler.holidayDates(
      TrainCompiler.withResolvedCalendar(spec, s)) ==
      Some(List("1995-03-01")))
  }

  test("seasonality param dedupes against SEASONAL markers by period") {
    // SEASONAL weekday and seasonality=['weekly'] are the same 7-cycle;
    // merging both would hand the solver a collinear duplicate basis
    val spec = DmlParser.parse(
      "TRAIN MODEL m USING prophet(seasonality=['weekly', 'monthly']) " +
        "FROM orders PREDICT o_totalprice " +
        "WITH TIME COLUMN o_orderdate AND FEATURES(SEASONAL weekday)")
      .asInstanceOf[TrainSpec]
    assert(TrainCompiler.effectiveClause(spec).get.seasonal ==
      List("weekday", "monthly"))
  }

  test("prophet growth validates: linear is the stand-in, others refuse") {
    val ok = DmlParser.parse(
      "TRAIN MODEL m USING prophet(growth=linear) FROM orders " +
        "PREDICT o_totalprice WITH TIME COLUMN o_orderdate " +
        "AND FEATURES(TREND linear)").asInstanceOf[TrainSpec]
    assert(Trainer.train(spark, ok).metrics.contains("rmse"))
    val bad = DmlParser.parse(
      "TRAIN MODEL m USING prophet(growth=logistic) FROM orders " +
        "PREDICT o_totalprice WITH TIME COLUMN o_orderdate " +
        "AND FEATURES(TREND linear)").asInstanceOf[TrainSpec]
    val e = intercept[IllegalArgumentException](Trainer.train(spark, bad))
    assert(e.getMessage.contains("growth='linear' only"))
  }

  test("changepoints=k requires a linear trend to shape") {
    val spec = DmlParser.parse(
      "TRAIN MODEL m USING prophet(changepoints=3) FROM orders " +
        "PREDICT o_totalprice WITH TIME COLUMN o_orderdate " +
        "AND FEATURES(SEASONAL weekday)").asInstanceOf[TrainSpec]
    val e = intercept[IllegalArgumentException](Trainer.train(spark, spec))
    assert(e.getMessage.contains("TREND linear"))
  }

  test("changepoint hinges let the stand-in fit a piecewise trend") {
    val s = spark
    import s.implicits._
    // noise-free tent series: slope +0.5 for 60 days, then -1.0 — a
    // single line cannot fit it, five hinge deltas nearly can
    (0 until 100).map { i =>
      val day = java.time.LocalDate.of(2024, 1, 1).plusDays(i.toLong)
      val y = if (i < 60) 10.0 + 0.5 * i else 10.0 + 0.5 * 60 - 1.0 * (i - 60)
      (java.sql.Timestamp.valueOf(day.atStartOfDay), y)
    }.toDF("day", "y").createOrReplaceTempView("ts_piecewise")
    def rmse(dml: String): Double =
      Trainer.train(s, DmlParser.parse(dml).asInstanceOf[TrainSpec])
        .metrics("rmse")
    val hinged = rmse(
      "TRAIN MODEL m_cp USING prophet(changepoints=5) FROM ts_piecewise " +
        "PREDICT y WITH TIME COLUMN day AND FEATURES(TREND linear)")
    val trendOnly = rmse(
      "TRAIN MODEL m_line USING prophet FROM ts_piecewise PREDICT y " +
        "WITH TIME COLUMN day AND FEATURES(TREND linear)")
    assert(hinged < 0.3 * trendOnly,
      s"hinge basis must capture the planted slope break: " +
        s"hinged rmse=$hinged vs trend-only rmse=$trendOnly")
    // the training frame carries exactly the declared hinge columns
    val spec = DmlParser.parse(
      "TRAIN MODEL m USING prophet(changepoints=5) FROM ts_piecewise " +
        "PREDICT y WITH TIME COLUMN day AND FEATURES(TREND linear)")
      .asInstanceOf[TrainSpec]
    assert(TrainCompiler.featureNames(spec) ==
      Seq("t_index", "cp_1", "cp_2", "cp_3", "cp_4", "cp_5"))
    // knots sit evenly over the first 80% of the 100-step history
    assert((1 to 5).map(TimeSeries.changepointPosition(100L, 5, _)) ==
      Seq(16.0, 32.0, 47.0, 63.0, 79.0))
  }

  test("holidays=[dates] binds as indicator features; bad dates refuse") {
    val s = spark
    import s.implicits._
    // noise-free flat series with two planted holiday spikes
    (0 until 60).map { i =>
      val day = java.time.LocalDate.of(2024, 1, 1).plusDays(i.toLong)
      val y = 10.0 + (if (i == 14 || i == 42) 25.0 else 0.0)
      (java.sql.Timestamp.valueOf(day.atStartOfDay), y)
    }.toDF("day", "y").createOrReplaceTempView("ts_holidays")
    def fit(dml: String) =
      Trainer.train(s, DmlParser.parse(dml).asInstanceOf[TrainSpec])
    val bound = fit(
      "TRAIN MODEL m_hol USING prophet(" +
        "holidays=['2024-01-15', '2024-02-12']) " +
        "FROM ts_holidays PREDICT y " +
        "WITH TIME COLUMN day AND FEATURES(TREND linear)")
    val plain = fit(
      "TRAIN MODEL m_plain USING prophet FROM ts_holidays PREDICT y " +
        "WITH TIME COLUMN day AND FEATURES(TREND linear)")
    assert(bound.ignoredParams.isEmpty,
      "list-form holidays bind; nothing is inert")
    assert(bound.metrics("rmse") < 0.2 * plain.metrics("rmse"),
      s"holiday indicators must absorb the planted spikes: " +
        s"bound=${bound.metrics("rmse")} plain=${plain.metrics("rmse")}")
    val spec = DmlParser.parse(
      "TRAIN MODEL m USING prophet(holidays=['2024-01-15']) " +
        "FROM ts_holidays PREDICT y " +
        "WITH TIME COLUMN day AND FEATURES(TREND linear)")
      .asInstanceOf[TrainSpec]
    assert(TrainCompiler.featureNames(spec) == Seq("t_index", "holiday_1"))
    val e = intercept[IllegalArgumentException](fit(
      "TRAIN MODEL m USING prophet(holidays=['not-a-date']) " +
        "FROM ts_holidays PREDICT y " +
        "WITH TIME COLUMN day AND FEATURES(TREND linear)"))
    assert(e.getMessage.contains("ISO dates"))
  }

  test("forecast extrapolates a changepointed trend at the final slope") {
    val s = spark
    import s.implicits._
    (0 until 100).map { i =>
      val day = java.time.LocalDate.of(2024, 1, 1).plusDays(i.toLong)
      val y = if (i < 60) 10.0 + 0.5 * i else 10.0 + 0.5 * 60 - 1.0 * (i - 60)
      (java.sql.Timestamp.valueOf(day.atStartOfDay), y)
    }.toDF("day", "y").createOrReplaceTempView("ts_piecewise_fc")
    val spec = DmlParser.parse(
      "TRAIN MODEL m USING prophet(changepoints=5) FROM ts_piecewise_fc " +
        "PREDICT y WITH TIME COLUMN day AND FEATURES(TREND linear) " +
        "FORECAST 10 days AHEAD").asInstanceOf[TrainSpec]
    val report = Trainer.train(s, spec)
    val fc = TimeSeries.forecast(s, spec, report)
      .orderBy("t_index").collect()
    assert(fc.length == 10)
    // the final observed slope is -1.0/day; consecutive forecast steps
    // must continue it (hinge extrapolation, not the global mean slope)
    val deltas = fc.sliding(2).map(p =>
      p(1).getAs[Double]("prediction") - p(0).getAs[Double]("prediction"))
    deltas.foreach(d => assert(math.abs(d - (-1.0)) < 0.15,
      s"future step slope $d should continue the last trend segment"))
  }

  test("base TRAIN grammar is untouched by the variant") {
    val spec = DmlParser.parse(
      "TRAIN MODEL m USING linear_regression FROM orders " +
        "PREDICT o_totalprice WITH FEATURES(o_shippriority)")
      .asInstanceOf[TrainSpec]
    assert(spec.timeSeries.isEmpty)
    assert(spec.features == List("o_shippriority"))
  }

  test("compiled frame derives seasonal components and a dense trend index") {
    val s = spark
    import s.implicits._
    Seq(
      ("2024-01-01", 10.0), ("2024-01-01", 12.0), // tie: same step index
      ("2024-01-02", 11.0), ("2024-01-05", 13.0))
      .toDF("day", "y")
      .select(col("day").cast("timestamp").as("day"), col("y"))
      .createOrReplaceTempView("ts_tiny")
    val spec = DmlParser.parse(
      "TRAIN MODEL m USING prophet FROM ts_tiny PREDICT y " +
        "WITH TIME COLUMN day AND FEATURES(SEASONAL weekday, TREND linear)")
      .asInstanceOf[TrainSpec]
    assert(TrainCompiler.featureNames(spec) ==
      Seq("season_weekday", "season_weekday_sin", "season_weekday_cos",
        "t_index"))
    val frame = TrainCompiler.trainingDataFrame(s, spec)
      .orderBy("t_index", "y")
    val rows = frame.collect().map(r =>
      (r.getAs[Double]("season_weekday"),
        r.getAs[Double]("season_weekday_sin"),
        r.getAs[Double]("t_index")))
    // 2024-01-01 is a Monday → Spark dayofweek = 2
    assert(rows.map(_._1).toSeq == Seq(2.0, 2.0, 3.0, 6.0))
    // first Fourier harmonic of the weekday phase, rounded to 6 decimals
    assert(rows.map(_._2).toSeq ==
      Seq(2.0, 2.0, 3.0, 6.0).map(p =>
        math.rint(math.sin(p * (2 * math.Pi / 7)) * 1e6) / 1e6))
    // dense step index: the two tied rows share t=1; gaps don't skip steps
    assert(rows.map(_._3).toSeq == Seq(1.0, 1.0, 2.0, 3.0))
  }

  test("Fourier seasonal terms let the linear stand-in beat a pure-trend fit") {
    val s = spark
    import s.implicits._
    // seeded periodic series: linear trend + weekly sinusoid, no noise —
    // trend+Fourier can fit it almost exactly, trend alone cannot
    (0 until 140).map { i =>
      val day = java.time.LocalDate.of(2024, 1, 1).plusDays(i.toLong)
      // Spark dayofweek phase: 1=Sunday..7
      val dow = (day.getDayOfWeek.getValue % 7) + 1
      (java.sql.Timestamp.valueOf(day.atStartOfDay),
        10.0 + 0.1 * i + 5.0 * math.sin(dow * (2 * math.Pi / 7)))
    }.toDF("day", "y").createOrReplaceTempView("ts_periodic")
    def rmse(dml: String): Double =
      Trainer.train(s, DmlParser.parse(dml).asInstanceOf[TrainSpec])
        .metrics("rmse")
    val seasonal = rmse(
      "TRAIN MODEL m_seasonal USING prophet FROM ts_periodic PREDICT y " +
        "WITH TIME COLUMN day AND FEATURES(SEASONAL weekday, TREND linear)")
    val trendOnly = rmse(
      "TRAIN MODEL m_trend USING prophet FROM ts_periodic PREDICT y " +
        "WITH TIME COLUMN day AND FEATURES(TREND linear)")
    assert(seasonal < 0.2 * trendOnly,
      s"seasonal decomposition must capture the planted sinusoid: " +
        s"seasonal rmse=$seasonal vs trend-only rmse=$trendOnly")
    assert(seasonal < 0.5, s"near-exact fit expected, got rmse=$seasonal")
  }

  test("prophet fit + FORECAST produces future rows with ordered bands") {
    val s = spark
    val spec = DmlParser.parse(headlineDml).asInstanceOf[TrainSpec]
    val report = Trainer.train(s, spec)
    assert(report.metrics.contains("rmse"))
    val fc = TimeSeries.forecast(s, spec, report)
    val rows = fc.orderBy("t_index").collect()
    assert(rows.length == 30)
    assert(fc.columns.toSeq ==
      Seq("o_orderdate", "t_index", "prediction",
        "lo_80", "hi_80", "lo_95", "hi_95"))
    // future timestamps strictly beyond the observed max (timestamp_ntz
    // surfaces as LocalDateTime)
    val maxObserved = s.table("orders").agg(max("o_orderdate"))
      .collect()(0).getAs[java.time.LocalDateTime](0)
    assert(rows.forall(
      _.getAs[java.time.LocalDateTime](0).isAfter(maxObserved)))
    // bands nest around the point forecast: 95% wider than 80%
    rows.foreach { r =>
      val (p, lo80, hi80, lo95, hi95) =
        (r.getDouble(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5), r.getDouble(6))
      assert(lo95 < lo80 && lo80 < p && p < hi80 && hi80 < hi95)
    }
    // trend continues the training timeline: first future step = steps + 1
    val steps = s.table("orders")
      .select(countDistinct("o_orderdate")).collect()(0).getLong(0)
    assert(rows.head.getDouble(1) == steps + 1.0)
  }

  test("forecast refuses sub-day horizons over a DATE time column") {
    val s = spark
    import s.implicits._
    (0 until 30).map { i =>
      (java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, 1)
        .plusDays(i.toLong)), i.toDouble)
    }.toDF("d", "y").createOrReplaceTempView("ts_dated")
    val spec = DmlParser.parse(
      "TRAIN MODEL m USING prophet FROM ts_dated PREDICT y " +
        "WITH TIME COLUMN d AND FEATURES(TREND linear) " +
        "FORECAST 5 hours AHEAD").asInstanceOf[TrainSpec]
    val report = Trainer.train(s, spec)
    val e = intercept[IllegalArgumentException](
      TimeSeries.forecast(s, spec, report))
    assert(e.getMessage.contains("DATE"))
    assert(e.getMessage.contains("truncate"))
  }

  test("TREND guards against near-unique timestamp cardinality") {
    val s = spark
    import s.implicits._
    val df = (0 until 10).map(i =>
      (java.sql.Timestamp.valueOf(s"2024-01-01 00:00:0$i"), i.toDouble))
      .toDF("t", "y")
    val clause = graft.dml.TimeSeriesClause("t", trend = Some("linear"))
    val e = intercept[IllegalArgumentException](
      TimeSeries.withClauseFeatures(df, clause, maxDistinctSteps = 5L))
    assert(e.getMessage.contains("Discretize"))
    // under the cap the same frame ranks fine
    assert(TimeSeries.withClauseFeatures(df, clause, maxDistinctSteps = 10L)
      .agg(max("t_index")).collect()(0).getDouble(0) == 10.0)
  }

  test("forecast refuses exogenous source features") {
    val s = spark
    val spec = DmlParser.parse(
      "TRAIN MODEL m USING prophet FROM orders PREDICT o_totalprice " +
        "WITH TIME COLUMN o_orderdate " +
        "AND FEATURES(o_custkey, TREND linear) FORECAST 5 days AHEAD")
      .asInstanceOf[TrainSpec]
    val report = Trainer.train(s, spec)
    val e = intercept[IllegalArgumentException](
      TimeSeries.forecast(s, spec, report))
    assert(e.getMessage.contains("clause features only"))
  }

  test("the time-series clause renders into the compiled ml_train_model SQL") {
    val spec = DmlParser.parse(headlineDml).asInstanceOf[TrainSpec]
    val sql = graft.dml.SqlCompiler.compileSql(spec)
    assert(sql.contains("time_column := 'o_orderdate'"))
    assert(sql.contains("seasonal := ARRAY['weekday', 'month']"))
    assert(sql.contains("trend := 'linear'"))
    assert(sql.contains("forecast_horizon := 30"))
    assert(sql.contains("forecast_unit := 'days'"))
    assert(sql.contains("confidence_intervals := ARRAY[0.8, 0.95]"))
    // the training SELECT carries the time column for clause derivation
    assert(sql.contains("\"o_orderdate\", \"o_totalprice\" FROM"))
  }

  test("normInv matches known quantiles") {
    assert(math.abs(TimeSeries.normInv(0.975) - 1.959964) < 1e-5)
    assert(math.abs(TimeSeries.normInv(0.9) - 1.281552) < 1e-5)
    assert(math.abs(TimeSeries.normInv(0.5)) < 1e-9)
    assert(math.abs(TimeSeries.normInv(0.025) + 1.959964) < 1e-5)
  }
}
