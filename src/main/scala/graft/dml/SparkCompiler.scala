package graft.dml

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import FeatureExpr._

/** FeatureExpr → Spark `Column` (the engine-side twin of the pg renderer in
  * SqlCompiler). All arithmetic stays in Column algebra so the whole feature
  * projection is codegen'd — no UDFs in the hot path.
  *
  * Function calls (F7, parser.py:95-96):
  *  - `DERIVED(x)` / `TRANSFORM(x)` are markers in the reference DSL
  *    (test_parser.py:198-212) — unwrapped to their single argument.
  *  - `scale(x)` (standardization) needs global statistics; at training time
  *    the Trainer handles it with a distributed StandardScaler stage. The
  *    Column fallback here computes the z-score with exact decimal sums via
  *    a scalar subquery-free two-aggregate window; it is fixture-scale only
  *    and the Trainer path is the 100 TB path.
  *  - everything else resolves through `call_function`, i.e. Spark's own
  *    function registry (builtins like log/sqrt/abs plus registered UDFs).
  * Kwarg (`name=expr`) args have no Catalyst named-argument analog for
  * arbitrary functions → IllegalArgumentException (SURVEY §2.4 F8).
  */
object FeatureCompiler {

  def compile(feature: String): Column =
    try toColumn(DmlParser.parseFeature(feature))
    catch {
      case e: IllegalArgumentException => throw e
      case _: Exception =>
        throw new IllegalArgumentException(s"Invalid feature expression: $feature")
    }

  /** DSL function spellings → Spark function names (SURVEY §2.5:
    * DAYS_BETWEEN → datediff, gen_random_uuid → uuid; log stays natural
    * log, which is Spark's `log`). */
  private val functionAliases = Map(
    "days_between" -> "datediff",
    "gen_random_uuid" -> "uuid")

  /** Zero-arg DSL identifiers that are functions, not columns
    * (DSL.md:81 uses bare CURRENT_DATE). */
  private val identFunctions = Map(
    "current_date" -> (() => current_date()),
    "now" -> (() => current_timestamp()))

  def toColumn(e: FeatureExpr): Column = e match {
    case FIdent(name :: Nil) if identFunctions.contains(name.toLowerCase) =>
      identFunctions(name.toLowerCase)()
    case FIdent(parts) => col(parts.mkString("."))
    case FNum(Value.VInt(i))   => lit(i)
    case FNum(Value.VFloat(f)) => lit(f)
    case FNum(v)  => lit(Value.pyStr(v))
    case FStr(s)  => lit(s)
    case FGroup(inner) => toColumn(inner)
    case FAdd(l, r) => toColumn(l) + toColumn(r)
    case FSub(l, r) => toColumn(l) - toColumn(r)
    case FMul(l, r) => toColumn(l) * toColumn(r)
    case FDiv(l, r) => toColumn(l) / toColumn(r)
    case FNeg(v)    => -toColumn(v)
    case FCall(FIdent(name :: Nil), args) if isMarker(name) =>
      args match {
        case FPos(inner) :: Nil => toColumn(inner)
        case _ =>
          throw new IllegalArgumentException(
            s"$name(...) expects exactly one positional argument")
      }
    case FCall(FIdent("scale" :: Nil), FPos(inner) :: Nil) =>
      // Standalone z-score semantics via an unpartitioned window — a
      // single-partition plan, acceptable only at fixture scale. The
      // Trainer never takes this path: it strips scale() and standardizes
      // with a distributed StandardScaler stage instead.
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy().rowsBetween(Long.MinValue, Long.MaxValue)
      val x = toColumn(inner)
      (x - avg(x).over(w)) / stddev_samp(x).over(w)
    case FCall(ident, args) =>
      val cols = args.map {
        case FPos(a) => toColumn(a)
        case FKw(n, _) =>
          throw new IllegalArgumentException(
            s"named argument '$n' is not supported in feature calls")
      }
      val name = FeatureExpr.canonical(ident)
      call_function(functionAliases.getOrElse(name.toLowerCase, name), cols: _*)
  }

  private def isMarker(name: String): Boolean =
    name == "DERIVED" || name == "TRANSFORM"

  /** Does the feature use scale()? The Trainer adds a StandardScaler stage
    * when any feature requests standardization. */
  def usesScale(e: FeatureExpr): Boolean = e match {
    case FCall(FIdent("scale" :: Nil), _) => true
    case FCall(_, args) => args.exists {
      case FPos(a)   => usesScale(a)
      case FKw(_, a) => usesScale(a)
    }
    case FAdd(l, r) => usesScale(l) || usesScale(r)
    case FSub(l, r) => usesScale(l) || usesScale(r)
    case FMul(l, r) => usesScale(l) || usesScale(r)
    case FDiv(l, r) => usesScale(l) || usesScale(r)
    case FNeg(v)    => usesScale(v)
    case FGroup(v)  => usesScale(v)
    case _          => false
  }

  /** Strip scale() wrappers (the Trainer standardizes via StandardScaler
    * instead, which is the distributed path). */
  def stripScale(e: FeatureExpr): FeatureExpr = e match {
    case FCall(FIdent("scale" :: Nil), FPos(inner) :: Nil) => stripScale(inner)
    case FCall(n, args) => FCall(n, args.map {
      case FPos(a)   => FPos(stripScale(a))
      case FKw(k, a) => FKw(k, stripScale(a))
    })
    case FAdd(l, r) => FAdd(stripScale(l), stripScale(r))
    case FSub(l, r) => FSub(stripScale(l), stripScale(r))
    case FMul(l, r) => FMul(stripScale(l), stripScale(r))
    case FDiv(l, r) => FDiv(stripScale(l), stripScale(r))
    case FNeg(v)    => FNeg(stripScale(v))
    case FGroup(v)  => FGroup(stripScale(v))
    case other      => other
  }
}

/** TrainSpec → the training DataFrame: the Spark twin of the reference's
  * `training_data` SELECT (parser.py:769-776). The source clause becomes a
  * Catalyst plan via spark.sql (predicate pushdown / column pruning / join
  * selection all free); features compile to Column projections.
  *
  * Column naming: identifier features keep their name; expression features
  * are aliased `f1..fn` by position (deterministic, oracle-friendly — the
  * reference leaves them to engine-default naming, which is not portable).
  * The target is appended last (parser.py:759).
  */
object TrainCompiler {

  /** The validated Spark-SQL FROM fragment for the spec's source clause. */
  def sourceFragment(spec: TrainSpec): String =
    if (spec.sourceIsIdentifier ||
        SourceValidator.looksLikeSingleIdentifier(spec.source)) {
      s"`${spec.source.replace("`", "``")}`"
    } else {
      SourceValidator.validate(spec.source)
      spec.source
    }

  def trainingDataFrame(spark: SparkSession, rawSpec: TrainSpec): DataFrame = {
    // resolve a bare-name calendar against the CALLER's session (never
    // the thread-local active one) before any holidayDates consultation
    val spec = withResolvedCalendar(rawSpec, spark)
    val src = spark.sql(s"SELECT * FROM ${sourceFragment(spec)}")
    spec.timeSeries match {
      case None =>
        src.select(featureColumns(spec) :+ src.col(spec.target): _*)
      case Some(_) => timeSeriesLayout(src, featureColumns(spec), spec)
    }
  }

  /** prophet's `changepoints=k` algorithm param (reference DSL.md:297-301
    * surface; SURVEY §7.3 stand-in): k > 0 requests k piecewise-linear
    * trend hinges. 0 is Prophet's "no changepoints" and binds to nothing;
    * anything else non-integral — or past the hinge-column sanity cap —
    * raises (an unbounded k would die deep in Catalyst building millions
    * of withColumns instead of with a clear message; and a Long k must
    * not silently wrap through toInt). */
  private val MaxChangepoints = 1000L
  def changepointCount(spec: TrainSpec): Option[Int] =
    if (!spec.algorithm.equalsIgnoreCase("prophet")) None
    else spec.params.collectFirst { case ("changepoints", v) => v }.flatMap {
      case Value.VInt(k) if k >= 0 && k <= MaxChangepoints =>
        Some(k.toInt).filter(_ > 0)
      case Value.VFloat(f) if f.isWhole && f >= 0 && f <= MaxChangepoints =>
        Some(f.toInt).filter(_ > 0)
      case other => throw new IllegalArgumentException(
        "prophet changepoints must be a non-negative integer " +
          s"<= $MaxChangepoints, got $other")
    }

  /** prophet's `changepoint_prior_scale=tau` (reference DSL.md:296-313;
    * Taylor & Letham 2017 §3.1's Laplace(0, tau) prior on the trend
    * deltas). The stand-in renders it as a RIDGE penalty applied ONLY to
    * the hinge basis, expressed standardization-aware: each hinge column
    * is pre-multiplied by tau ([[runtime.TimeSeries.withClauseFeatures]])
    * and the solver runs with feature standardization OFF and a small
    * global L2 term, so the effective per-hinge penalty is
    * lambda/tau^2 — smaller tau = stiffer trend, exactly the knob's
    * contract — while the unscaled season/trend columns see only the
    * negligible global lambda. The fitted model's output term for hinge
    * j is beta_j * tau * hinge_j(t); every consumer (train, forecast,
    * explain) builds the SAME scaled basis, so coefficients never need
    * re-mapping. */
  def changepointPriorScale(spec: TrainSpec): Option[Double] =
    if (!spec.algorithm.equalsIgnoreCase("prophet")) None
    else spec.params.collectFirst {
      case ("changepoint_prior_scale", v) => v
    }.map {
      case Value.VFloat(t) if t > 0 && java.lang.Double.isFinite(t) => t
      case Value.VInt(t) if t > 0 => t.toDouble
      case other => throw new IllegalArgumentException(
        "prophet changepoint_prior_scale must be a positive finite " +
          s"number, got $other")
    }

  /** prophet's `holidays` param, BINDING in both reference forms: a
    * literal list of ISO dates (`holidays=['2024-01-01', '2024-12-25']`)
    * becomes one indicator basis column per date — Prophet's holiday
    * model (Taylor & Letham 2017 §3.3, indicator features with
    * per-holiday effects) — and the bare-name calendar form
    * (`holidays=us_holidays`, reference DSL.md:300) resolves a
    * REGISTERED table/view of that name through the active session: its
    * `ds` column (prophet's calendar convention) or, failing that, its
    * first date/timestamp column supplies the dates. The calendar
    * collect is bounded by the same 366-indicator cap as the literal
    * form — never corpus-sized. An unregistered name fails loud with
    * registration instructions instead of silently no-opping. */
  def holidayDates(spec: TrainSpec): Option[List[String]] =
    if (!spec.algorithm.equalsIgnoreCase("prophet")) None
    else spec.params.collectFirst {
      case ("holidays", Value.VList(xs)) =>
        val dates = xs.map {
          case Value.VStr(d) =>
            try { java.time.LocalDate.parse(d); d }
            catch { case _: java.time.format.DateTimeParseException =>
              throw new IllegalArgumentException(
                s"prophet holidays entries must be ISO dates, got '$d'") }
          case other => throw new IllegalArgumentException(
            s"prophet holidays entries must be ISO date strings, got $other")
        }
        require(dates.size <= 366,
          s"prophet holidays: ${dates.size} dates exceed the 366 " +
            "indicator-column cap; join a calendar table instead")
        dates
      case ("holidays", Value.VStr(name)) =>
        // a bare name here means the spec skipped the train entry point's
        // resolve-once rewrite; resolving against the thread-local active
        // session would risk the WRONG catalog under concurrent sessions
        throw new IllegalStateException(
          s"prophet holidays=$name is an unresolved calendar name: pass " +
            "the spec through TrainCompiler.withResolvedCalendar(spec, " +
            "session) (Trainer.train does) before consulting holidayDates")
      case ("holidays", other) => throw new IllegalArgumentException(
        "prophet holidays must be a literal ISO-date list or the name " +
          s"of a registered calendar view, got $other")
    }

  /** Resolve a bare-name calendar EXACTLY ONCE: rewrite
    * `holidays=name` into the literal resolved date list. Call this at
    * the train entry point ([[graft.dml.runtime.Trainer.train]] does) —
    * [[holidayDates]] is consulted from several sites (frame build,
    * feature naming, training, forecast, explain), and re-resolving a
    * LIVE view at each would both pay a catalog lookup + collect per
    * call and, worse, let a view redefined after training silently remap
    * `holiday_j` onto a different date than the one its fitted
    * coefficient was trained on. After this rewrite the spec is a pure
    * value again and every consumer binds the same dates. */
  def withResolvedCalendar(spec: TrainSpec,
      session: SparkSession): TrainSpec =
    if (!spec.algorithm.equalsIgnoreCase("prophet")) spec
    else spec.copy(params = spec.params.map {
      case ("holidays", Value.VStr(name)) =>
        ("holidays",
          Value.VList(calendarDates(name, session).map(Value.VStr(_))))
      case p => p
    })

  /** Resolve the bare-name calendar form: the registered view's distinct
    * non-NULL dates, ascending (deterministic feature order). Looks the
    * view up in the GIVEN session's catalog — with concurrent sessions,
    * the thread-local active session may not be the caller's. */
  private def calendarDates(name: String,
      session: SparkSession): List[String] = {
    require(session.catalog.tableExists(name),
      s"prophet holidays=$name names a calendar table, but no table or " +
        s"view '$name' is registered: CREATE TEMP VIEW $name with a " +
        "date column 'ds' (or any date/timestamp column), or pass a " +
        "literal ISO-date list")
    val cal = session.table(name)
    val dsCol = cal.schema.fields.find(_.name.equalsIgnoreCase("ds"))
      .orElse(cal.schema.fields.find(f => f.dataType match {
        case org.apache.spark.sql.types.DateType |
             org.apache.spark.sql.types.TimestampType |
             org.apache.spark.sql.types.TimestampNTZType => true
        case _ => false
      }))
      .getOrElse(throw new IllegalArgumentException(
        s"calendar '$name' has no 'ds' column and no date/timestamp " +
          s"column (schema: ${cal.schema.simpleString})"))
    val dates = cal
      .select(col(dsCol.name).cast("date").cast("string").as("_d"))
      .filter(col("_d").isNotNull).distinct().orderBy("_d")
      .limit(367).collect().map(_.getString(0)).toList
    require(dates.nonEmpty,
      s"calendar '$name' is empty — no holiday dates to bind")
    require(dates.size <= 366,
      s"calendar '$name' carries more than the 366-indicator cap; " +
        "filter it to the modeled horizon first")
    dates
  }

  /** The clause the frame builder actually derives from: the statement's
    * WITH TIME COLUMN clause with prophet's BINDING `seasonality=[...]`
    * param merged in as extra Fourier granularities. Granularities are
    * deduped by Fourier period so `SEASONAL weekday` plus
    * `seasonality=['weekly']` (the same 7-cycle) cannot produce a
    * collinear duplicate basis. */
  def effectiveClause(spec: TrainSpec): Option[TimeSeriesClause] =
    spec.timeSeries.map { ts =>
      if (!spec.algorithm.equalsIgnoreCase("prophet")) ts
      else {
        def period(g: String): Double =
          runtime.TimeSeries.fourierPeriod.getOrElse(g.toLowerCase,
            throw new IllegalArgumentException(
              s"unsupported prophet seasonality granularity: $g"))
        val extra = spec.params
          .collectFirst { case ("seasonality", v) => v } match {
          case None => Nil
          case Some(Value.VList(xs)) => xs.map {
            case Value.VStr(g) => g
            case other => throw new IllegalArgumentException(
              "prophet seasonality entries must be granularity names, " +
                s"got $other")
          }
          case Some(Value.VStr(g)) => List(g)
          case Some(other) => throw new IllegalArgumentException(
            s"prophet seasonality must be a granularity list, got $other")
        }
        val merged = extra.foldLeft(
          (ts.seasonal, ts.seasonal.map(period).toSet)) {
          case ((acc, seen), g) =>
            val p = period(g)
            if (seen(p)) (acc, seen) else (acc :+ g, seen + p)
        }._1
        ts.copy(seasonal = merged)
      }
    }

  /** Shared time-series frame layout (used here and by the Trainer's
    * scale-stripped path — ONE implementation, so the compiled frame and
    * the trained frame cannot diverge): base features + the time column
    * (for clause derivation) + target, then the clause's derived
    * season/trend columns, reordered so clause features sit between the
    * base features and the target. */
  private[dml] def timeSeriesLayout(
      src: DataFrame, baseCols: Seq[Column], spec: TrainSpec): DataFrame = {
    val ts = effectiveClause(spec).get
    val baseNames = baseFeatureNames(spec)
    val extras = Seq(ts.timeColumn, spec.target).distinct
      .filterNot(baseNames.contains).map(src.col)
    runtime.TimeSeries
      .withClauseFeatures(src.select(baseCols ++ extras: _*), ts,
        changepoints = changepointCount(spec),
        holidays = holidayDates(spec).getOrElse(Nil),
        cpScale = changepointPriorScale(spec).getOrElse(1.0))
      .select(featureNames(spec).map(col) :+ col(spec.target): _*)
  }

  /** Feature Columns with deterministic aliases (target and clause-derived
    * time-series columns not included). */
  def featureColumns(spec: TrainSpec): Seq[Column] =
    spec.features.zipWithIndex.map { case (f, i) =>
      if (SqlCompiler.isSimpleIdentifier(f)) col(f)
      else FeatureCompiler.compile(f).as(s"f${i + 1}")
    }

  private def baseFeatureNames(spec: TrainSpec): Seq[String] =
    spec.features.zipWithIndex.map { case (f, i) =>
      if (SqlCompiler.isSimpleIdentifier(f)) f else s"f${i + 1}"
    }

  /** Output column names in order, target last — what trainingDataFrame
    * produces; used by the Trainer's assembler. Time-series clause
    * features (season_*, t_index) follow the base features. */
  def featureNames(spec: TrainSpec): Seq[String] =
    baseFeatureNames(spec) ++
      effectiveClause(spec).toSeq.flatMap(ts =>
        runtime.TimeSeries.clauseFeatureNames(ts, changepointCount(spec),
          holidayDates(spec).getOrElse(Nil)))
}
