package graft.dml

import java.util.regex.Pattern

import FeatureExpr._

/** PostgreSQL-dialect SQL rendering — the reference's emitted-SQL contract
  * (reference/dsl/parser.py:676-880). Quoting matches psycopg's sql module:
  * identifiers double-quoted with `"` doubling; string literals
  * single-quoted with `'` doubling, switching to ` E'...'` with doubled
  * backslashes when a backslash is present (observable in
  * test_parser.py:214-227).
  */
object PgSql {
  def ident(name: String): String = "\"" + name.replace("\"", "\"\"") + "\""

  def stringLiteral(s: String): String = {
    val esc = s.replace("\\", "\\\\").replace("'", "''")
    if (s.contains('\\')) " E'" + esc + "'" else "'" + esc + "'"
  }

  def literal(v: Value): String = v match {
    case Value.VStr(s) => stringLiteral(s)
    case other         => Value.pyStr(other)
  }
}

/** Injection guard for non-identifier FROM fragments — a line-for-line port
  * of _validate_source_clause (parser.py:633-673) with identical error
  * messages; the contract is pinned by test_parser.py:542-595. */
object SourceValidator {
  private val relationIdentifier =
    "[A-Za-z_][A-Za-z0-9_]*(?:\\.[A-Za-z_][A-Za-z0-9_]*)*|\"(?:[^\"]|\"\")+\""

  private val forbidden = Pattern.compile(
    "\\b(INSERT|UPDATE|DELETE|UPSERT|MERGE|CREATE|ALTER|DROP|TRUNCATE|GRANT|REVOKE|" +
      "BEGIN|COMMIT|ROLLBACK|SAVEPOINT|RELEASE|LOCK|CALL|DO|EXECUTE|PREPARE|" +
      "DEALLOCATE|COPY|VACUUM|ANALYZE|REFRESH|SET|SHOW|RESET|LISTEN|UNLISTEN|NOTIFY)\\b",
    Pattern.CASE_INSENSITIVE)

  private val subqueryPattern = Pattern.compile(
    "\\(\\s*SELECT\\b[\\s\\S]+\\)\\s*(?:AS\\s+)?[A-Za-z_][A-Za-z0-9_]*\\s*",
    Pattern.CASE_INSENSITIVE)

  private val relationPattern: Pattern = {
    val rel = s"(?:$relationIdentifier)"
    Pattern.compile(
      s"^$rel" +
        "(?:\\s+(?:AS\\s+)?[A-Za-z_][A-Za-z0-9_]*)?" +
        s"(?:\\s+(?:(?:INNER|LEFT|RIGHT|FULL|CROSS)\\s+)?JOIN\\s+$rel" +
        "(?:\\s+(?:AS\\s+)?[A-Za-z_][A-Za-z0-9_]*)?\\s+ON\\s+[\\w\\s\\.\\(\\)=<>!+\\-*/'\"%]+)*" +
        "(?:\\s+WHERE\\s+[\\w\\s\\.\\(\\)=<>!+\\-*/'\"%]+)?" +
        "(?:\\s+GROUP\\s+BY\\s+[\\w\\s\\.,\\(\\)]+)?" +
        "(?:\\s+HAVING\\s+[\\w\\s\\.\\(\\)=<>!+\\-*/'\"%]+)?" +
        "(?:\\s+ORDER\\s+BY\\s+[\\w\\s\\.,\\(\\)]+)?" +
        "(?:\\s+LIMIT\\s+\\d+)?" +
        "\\s*$",
      Pattern.CASE_INSENSITIVE)
  }

  def validate(clause: String): Unit = {
    if (clause.isEmpty)
      throw new IllegalArgumentException(
        "Training data source clause cannot be empty")
    if (clause.contains(";"))
      throw new IllegalArgumentException(
        "Training data source must not contain statement terminators")
    if (clause.contains("--") || clause.contains("/*") || clause.contains("*/"))
      throw new IllegalArgumentException(
        "Training data source must not contain SQL comments")
    if (forbidden.matcher(clause).find())
      throw new IllegalArgumentException(
        "Training data source contains disallowed SQL keywords")

    val text = clause.trim
    if (text.startsWith("(")) {
      if (!subqueryPattern.matcher(text).matches())
        throw new IllegalArgumentException(
          "Training data subqueries must be parenthesized SELECT statements with an alias")
    } else if (!relationPattern.matcher(text).matches())
      throw new IllegalArgumentException(
        "Training data source must be a relation/join expression or a parenthesized subquery")
  }

  /** The forbidden-keyword screen alone (for full SELECT texts, where the
    * relation-shape whitelist does not apply — e.g. feature transformers). */
  def validateKeywordsOnly(text: String): Unit =
    if (forbidden.matcher(text).find())
      throw new IllegalArgumentException(
        "Training data source contains disallowed SQL keywords")

  /** The terminator/comment screen for feature-transformer SELECTs — ONE
    * definition shared by the compile path (SqlCompiler) and the runtime
    * path (FeatureTransformers.create), so the two can never disagree on
    * what is valid. */
  def validateTransformerSelect(text: String): Unit = {
    if (text.contains(";") || text.contains("--") ||
        text.contains("/*") || text.contains("*/"))
      throw new IllegalArgumentException(
        "feature transformer must not contain statement terminators or comments")
    validateKeywordsOnly(text)
  }

  /** parser.py:619-630 — compile-time heuristic for a hand-built spec whose
    * sourceIsIdentifier flag is false but whose source is a lone token. */
  def looksLikeSingleIdentifier(clause: String): Boolean =
    clause.nonEmpty &&
      !clause.exists(_.isWhitespace) &&
      !clause.exists(c => ".()".contains(c)) &&
      !(clause.head == '"' && clause.last == '"')
}

/** AST → PostgreSQL SQL text, mirroring compile_sql (parser.py:747-880). */
object SqlCompiler {
  private val simpleIdentifier = Pattern.compile("[A-Za-z_][A-Za-z0-9_]*")

  def isSimpleIdentifier(s: String): Boolean = simpleIdentifier.matcher(s).matches()

  /** Feature string → compiled pg SQL (parser.py:739-744); invalid
    * expressions raise with the reference's message. */
  def compileFeature(feature: String): String =
    try renderFeature(DmlParser.parseFeature(feature))
    catch {
      case _: Exception =>
        throw new IllegalArgumentException(s"Invalid feature expression: $feature")
    }

  /** _FeatureSqlCompiler (parser.py:676-736): every binary op fully
    * parenthesized, identifiers quoted per path segment, calls quoted
    * (`"sqrt"(("amount" + 1))`), kwargs as `"name" => value`. */
  def renderFeature(e: FeatureExpr): String = e match {
    case FIdent(parts) => parts.map(PgSql.ident).mkString(".")
    case FNum(v)       => PgSql.literal(v)
    case FStr(s)       => PgSql.stringLiteral(s)
    case FGroup(inner) => s"(${renderFeature(inner)})"
    case FAdd(l, r)    => s"(${renderFeature(l)} + ${renderFeature(r)})"
    case FSub(l, r)    => s"(${renderFeature(l)} - ${renderFeature(r)})"
    case FMul(l, r)    => s"(${renderFeature(l)} * ${renderFeature(r)})"
    case FDiv(l, r)    => s"(${renderFeature(l)} / ${renderFeature(r)})"
    case FNeg(v)       => s"(-${renderFeature(v)})"
    case FCall(n, args) =>
      s"${renderFeature(n)}(${args.map(renderArg).mkString(", ")})"
  }

  private def renderArg(a: FeatureArg): String = a match {
    case FPos(e)   => renderFeature(e)
    case FKw(n, e) => s"${PgSql.ident(n)} => ${renderFeature(e)}"
  }

  /** The training SELECT: compiled features then the target appended last
    * (parser.py:752-776; order pinned by test_parser.py:668-672). */
  def trainingQuery(spec: TrainSpec): String = {
    // the time column rides along in the training SELECT — the runtime
    // derives SEASONAL/TREND features from it (the reference defines no
    // SQL target for these clauses, so this is the natural extension)
    val fields = spec.features.map { f =>
      if (isSimpleIdentifier(f)) PgSql.ident(f) else compileFeature(f)
    } ++ spec.timeSeries.map(ts => PgSql.ident(ts.timeColumn)) :+
      PgSql.ident(spec.target)
    val source =
      if (spec.sourceIsIdentifier) PgSql.ident(spec.source)
      else if (SourceValidator.looksLikeSingleIdentifier(spec.source))
        PgSql.ident(spec.source)
      else {
        SourceValidator.validate(spec.source)
        spec.source
      }
    s"SELECT ${fields.mkString(", ")} FROM $source"
  }

  def compileSql(stmt: Statement): String = stmt match {
    case spec: TrainSpec   => compileTrain(spec)
    case spec: ComputeSpec => compileCompute(spec)
    // Extended statements (design-doc surface). Where the reference names
    // a runtime function (ml_predict EXTENSIONS.md:289-291,
    // feature_importance DSL.md:221-226) the call compiles to it; the rest
    // compile to ml_*-style calls in the same named-argument convention.
    case s: PredictSpec =>
      val args = List(
        s"model_name := ${PgSql.stringLiteral(s.model)}",
        s"input_table := ${PgSql.stringLiteral(s.from)}",
        s"output_table := ${PgSql.stringLiteral(s.storeIn)}") ++
        s.batchSize.map(b => s"batch_size := $b")
      s"SELECT ml_predict(${args.mkString(", ")})"
    case s: DeploySpec =>
      val args = List(
        s"model_name := ${PgSql.stringLiteral(s.model)}",
        s"endpoint := ${PgSql.stringLiteral(s.endpoint)}") ++
        s.config.map(c =>
          s"configuration := ${PgSql.stringLiteral(PyJson.dumps(c))}") ++
        s.monitor.map(m => s"monitor := ${PgSql.stringLiteral(m)}") ++
        s.versionControl.map(v =>
          s"version_control := ${PgSql.stringLiteral(v)}")
      s"SELECT ml_deploy_model(${args.mkString(", ")})"
    case s: TrafficSplitSpec =>
      val args = List(
        s"models := ARRAY[${s.models.map(PgSql.stringLiteral).mkString(", ")}]",
        s"endpoint := ${PgSql.stringLiteral(s.endpoint)}",
        s"traffic_split := ARRAY[${s.splits.mkString(", ")}]") ++
        s.autoPromote.map(p => s"auto_promote := ${PgSql.stringLiteral(p)}") ++
        s.promoteAfter.map(n => s"promote_after := $n")
      s"SELECT ml_deploy_split(${args.mkString(", ")})"
    case s: PublishSpec =>
      s"SELECT ml_publish_event(event_type := ${PgSql.stringLiteral(s.eventType)}, " +
        s"payload := ${PgSql.stringLiteral(PyJson.dumps(s.payload))})"
    case s: SubscribeSpec =>
      val args = List(s"pattern := ${PgSql.stringLiteral(s.pattern)}") ++
        s.action.map(a => s"execute := ${PgSql.stringLiteral(a)}")
      s"SELECT ml_subscribe(${args.mkString(", ")})"
    case s: TransformerSpec =>
      SourceValidator.validateTransformerSelect(s.select)
      s"CREATE VIEW ${PgSql.ident(s.name)} AS ${s.select}"
    case s: EnsembleSpec =>
      val args = List(
        s"name := ${PgSql.stringLiteral(s.name)}",
        s"models := ARRAY[${s.models.map(m => PgSql.stringLiteral(m._1)).mkString(", ")}]",
        s"weights := ARRAY[${s.models.map(m => Value.pyStr(Value.VFloat(m._2))).mkString(", ")}]",
        s"method := ${PgSql.stringLiteral(s.method)}") ++
        s.validateOn.map(t => s"validate_on := ${PgSql.stringLiteral(t)}")
      s"SELECT ml_create_ensemble(${args.mkString(", ")})"
    case s: ExplainSpec =>
      val args = List(s"model := ${PgSql.stringLiteral(s.model)}") ++
        s.forClause.map(f => s"for_row := ${PgSql.stringLiteral(f)}") ++
        s.method.map(m => s"method := ${PgSql.stringLiteral(m)}") ++
        s.topK.map(k => s"top_k := $k")
      s"SELECT feature_importance(${args.mkString(", ")})"
    case s: MonitorSpec =>
      val args = List(
        s"model_name := ${PgSql.stringLiteral(s.model)}",
        s"monitor_for := ${PgSql.stringLiteral(s.monitorFor)}") ++
        (if (s.features.nonEmpty)
          List(s"features := ARRAY[${s.features.map(PgSql.stringLiteral).mkString(", ")}]")
        else Nil) ++
        s.also.map { case (t, ms) =>
          s"and_${t} := ARRAY[${ms.map(PgSql.stringLiteral).mkString(", ")}]"
        } ++
        s.frequency.map(f => s"check_frequency := ${PgSql.stringLiteral(f)}") ++
        s.alertWhen.map(a => s"alert_when := ${PgSql.stringLiteral(a)}")
      s"SELECT ml_monitor_model(${args.mkString(", ")})"
    case s: WhenSpec =>
      val args = List(s"trigger := ${PgSql.stringLiteral(s.trigger)}") ++
        s.condition.map(c => s"condition := ${PgSql.stringLiteral(c)}") ++
        List(s"action := ${PgSql.stringLiteral(s.action)}")
      s"SELECT ml_register_rule(${args.mkString(", ")})"
  }

  private def compileTrain(spec: TrainSpec): String = {
    val args = List.newBuilder[String]
    args += s"model_name := ${PgSql.stringLiteral(spec.name)}"
    args += s"algorithm := ${PgSql.stringLiteral(spec.algorithm)}"
    args += s"algorithm_params := ${PgSql.stringLiteral(PyJson.dumps(spec.params))}"
    args += s"training_data := ${PgSql.stringLiteral(trainingQuery(spec))}"
    args += s"target_column := ${PgSql.stringLiteral(spec.target)}"
    args += s"feature_columns := ARRAY[${spec.features.map(PgSql.stringLiteral).mkString(", ")}]"
    spec.timeSeries.foreach { ts =>
      args += s"time_column := ${PgSql.stringLiteral(ts.timeColumn)}"
      if (ts.seasonal.nonEmpty)
        args += s"seasonal := ARRAY[${ts.seasonal.map(PgSql.stringLiteral).mkString(", ")}]"
      ts.trend.foreach(t => args += s"trend := ${PgSql.stringLiteral(t)}")
      ts.horizon.foreach(h => args += s"forecast_horizon := $h")
      ts.horizonUnit.foreach(u =>
        args += s"forecast_unit := ${PgSql.stringLiteral(u)}")
      if (ts.confidence.nonEmpty)
        args += s"confidence_intervals := ARRAY[${ts.confidence.map(Value.pyFloatRepr).mkString(", ")}]"
    }
    spec.split.foreach { s =>
      val json = PyJson.dumps(s.ratios.map { case (k, r) => k -> Value.VFloat(r) })
      args += s"data_split := ${PgSql.stringLiteral(json)}"
    }
    spec.validate.foreach { v =>
      v.on.foreach(on => args += s"validate_on := ${PgSql.stringLiteral(on)}")
      v.method.foreach { m =>
        args += s"validate_method := ${PgSql.stringLiteral(m)}"
        v.params.filter(_.nonEmpty).foreach { ps =>
          args += s"validate_params := ${PgSql.stringLiteral(PyJson.dumps(ps))}"
        }
      }
    }
    spec.optimizeMetric.foreach(m =>
      args += s"optimize_metric := ${PgSql.stringLiteral(m)}")
    spec.stopCondition.foreach(c =>
      args += s"stop_condition := ${PgSql.stringLiteral(c)}")
    spec.balanceMethod.foreach(b =>
      args += s"balance_method := ${PgSql.stringLiteral(b)}")
    spec.checkpoint.foreach { c =>
      val payload = List("interval" -> Value.VInt(c.interval)) ++
        c.unit.map(u => "unit" -> Value.VStr(u))
      args += s"checkpoint_schedule := ${PgSql.stringLiteral(PyJson.dumps(payload))}"
    }
    s"SELECT ml_train_model(${args.result().mkString(", ")})"
  }

  private def compileCompute(spec: ComputeSpec): String = {
    val args = List.newBuilder[String]
    args += s"kernel_name := ${PgSql.stringLiteral(spec.kernel)}"
    args += s"name := ${PgSql.stringLiteral(spec.name)}"
    spec.inputs.filter(_.nonEmpty).foreach { is =>
      args += s"inputs := ARRAY[${is.map(PgSql.stringLiteral).mkString(", ")}]"
    }
    spec.output.foreach(o => args += s"output := ${PgSql.stringLiteral(o)}")
    spec.scheduleTicks.foreach(t => args += s"schedule_ticks := $t")
    spec.options.filter(_.nonEmpty).foreach { opts =>
      args += s"options := ${PgSql.stringLiteral(PyJson.dumps(opts))}"
    }
    s"SELECT ml_register_compute(${args.result().mkString(", ")})"
  }
}
