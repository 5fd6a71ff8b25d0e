package graft.dml

import Lexer._
import Value._
import FeatureExpr._

/** Recursive-descent parser for the DeclarativeML DSL.
  *
  * Grammar ported from reference/dsl/parser.py:13-136 (Lark LALR). Keywords
  * are matched contextually by token text, reproducing Lark's contextual
  * lexer: a NAME slot accepts any identifier (even `USING`), while inside the
  * FROM source clause only an uppercase `PREDICT` token terminates the
  * clause (parser.py:17-41; pinned by test_parser.py:156-180).
  *
  * Syntax errors throw ParseException (the LarkError analog); semantic
  * validation throws IllegalArgumentException with the reference's exact
  * messages (parser.py:418-499).
  */
object DmlParser {

  def parse(text: String): Statement = {
    val p = new P(text, Lexer.lex(text))
    val stmt = p.statement()
    p.expectEof()
    stmt
  }

  /** Parse a standalone feature expression string — the compile-time
    * re-parse path (parser.py:739-744 uses the second Lark grammar). */
  def parseFeature(text: String): FeatureExpr = {
    val p = new P(text, Lexer.lex(text))
    val e = p.featureExpr()
    p.expectEof()
    e
  }

  private val optionKeywords =
    Set("VALIDATE", "OPTIMIZE", "STOP", "SPLIT", "BALANCE", "SAVE")
  private val kernelOptKeywords = Set("BLOCK", "GRID", "SHARED")
  private val sourcePunct = Set(
    ".", ",", "(", ")", "*", "+", "-", "/", "%", "=", "!=", "<>", "<=", ">=",
    "<", ">", ":")
  private val compareOps = Seq(">=", "<=", ">", "<", "!=", "=")

  private final class P(input: String, toks: Vector[Token]) {
    private var pos = 0
    private def peek: Token = toks(pos)
    private def next(): Token = { val t = toks(pos); pos += 1; t }

    private def fail(expected: String): Nothing =
      throw new ParseException(
        s"unexpected token '${peek.text}' at offset ${peek.start}; expected $expected")

    private def isName(t: Token, text: String): Boolean =
      t.isInstanceOf[TName] && t.text == text

    private def atKeyword(text: String): Boolean = isName(peek, text)

    private def keyword(text: String): Unit =
      if (atKeyword(text)) pos += 1 else fail(s"'$text'")

    private def name(): String = peek match {
      case TName(t, _, _) => pos += 1; t
      case _              => fail("identifier")
    }

    private def sym(s: String): Unit = peek match {
      case TSym(t, _, _) if t == s => pos += 1
      case _                       => fail(s"'$s'")
    }

    private def atSym(s: String): Boolean =
      peek.isInstanceOf[TSym] && peek.text == s

    private def numberValue(): Value = peek match {
      case TNumber(t, _, _) =>
        pos += 1
        if (t.exists(c => c == '.' || c == 'e' || c == 'E')) VFloat(t.toDouble)
        else VInt(t.toLong)
      case _ => fail("number")
    }

    def expectEof(): Unit =
      if (!peek.isInstanceOf[TEof]) fail("end of statement")

    def statement(): Statement = peek match {
      case TName("TRAIN", _, _)     => trainStmt()
      case TName("COMPUTE", _, _)   => computeStmt()
      case TName("PREDICT", _, _)   => predictStmt()
      case TName("DEPLOY", _, _)    => deployStmt()
      case TName("PUBLISH", _, _)   => publishStmt()
      case TName("SUBSCRIBE", _, _) => subscribeStmt()
      case TName("CREATE", _, _)    => createStmt()
      case TName("EXPLAIN", _, _)   => explainStmt()
      case TName("MONITOR", _, _)   => monitorStmt()
      case TName("WHEN", _, _)      => whenStmt()
      case _                        => fail("a statement keyword")
    }

    // ----- TRAIN -----------------------------------------------------------

    private def trainStmt(): TrainSpec = {
      keyword("TRAIN"); keyword("MODEL")
      val modelName = name()
      keyword("USING")
      val (alg, params) = algorithm()
      keyword("FROM")
      val source = sourceClause()
      // PREDICT already consumed by sourceClause's terminator
      val target = name()
      keyword("WITH")
      // time-series variant (DSL.md:296-313): WITH TIME COLUMN c AND
      // FEATURES (…, SEASONAL g, TREND t) [FORECAST n unit AHEAD]
      // [WITH CONFIDENCE INTERVALS p, …]
      val (features, ts) =
        if (atKeyword("TIME")) {
          keyword("TIME"); keyword("COLUMN")
          val timeCol = name()
          keyword("AND"); keyword("FEATURES"); sym("(")
          val (feats, seasonal, trend) = tsFeatureList()
          sym(")")
          var clause = TimeSeriesClause(timeCol, seasonal, trend)
          if (atKeyword("FORECAST")) {
            keyword("FORECAST")
            val n = numberValue() match {
              case VInt(i) => i
              case _ => throw new IllegalArgumentException(
                "FORECAST horizon must be a positive integer")
            }
            val unit = name()
            keyword("AHEAD")
            clause = clause.copy(horizon = Some(n), horizonUnit = Some(unit))
          }
          if (atKeyword("WITH")) {
            keyword("WITH"); keyword("CONFIDENCE"); keyword("INTERVALS")
            val buf = List.newBuilder[Double]
            def level(): Unit = numberValue() match {
              case VFloat(f) => buf += f
              case VInt(i)   => buf += i.toDouble
              case other     => throw new IllegalArgumentException(
                s"confidence level must be numeric, got $other")
            }
            level()
            while (atSym(",")) { sym(","); level() }
            clause = clause.copy(confidence = buf.result())
          }
          (feats, Some(clause))
        } else {
          keyword("FEATURES"); sym("(")
          val feats = featureList()
          sym(")")
          (feats, None)
        }

      var spec = TrainSpec(
        name = modelName, algorithm = alg, params = params,
        source = source, target = target, features = features,
        sourceIsIdentifier = isIdentifierSourceClause(source),
        timeSeries = ts)
      while (peek.isInstanceOf[TName] && optionKeywords(peek.text)) {
        peek.text match {
          case "SPLIT"    => spec = spec.copy(split = Some(splitStmt()))
          case "VALIDATE" => spec = spec.copy(validate = Some(validateStmt()))
          case "OPTIMIZE" => spec = spec.copy(optimizeMetric = Some(optimizeStmt()))
          case "STOP"     => spec = spec.copy(stopCondition = Some(stopStmt()))
          case "BALANCE"  => spec = spec.copy(balanceMethod = Some(balanceStmt()))
          case "SAVE"     => spec = spec.copy(checkpoint = Some(checkpointStmt()))
        }
      }
      spec
    }

    /** FEATURES list of the time-series variant: ordinary feature
      * expressions plus SEASONAL <granularity> and TREND <type> markers
      * (DSL.md:303-308), which compile to derived columns of the time
      * column rather than source expressions. */
    private def tsFeatureList()
        : (List[String], List[String], Option[String]) = {
      val feats = List.newBuilder[String]
      val seasonal = List.newBuilder[String]
      var trend: Option[String] = None
      def item(): Unit =
        if (atKeyword("SEASONAL")) { keyword("SEASONAL"); seasonal += name() }
        else if (atKeyword("TREND")) { keyword("TREND"); trend = Some(name()) }
        else feats += FeatureExpr.canonical(featureExpr())
      item()
      while (atSym(",")) { sym(","); item() }
      (feats.result(), seasonal.result(), trend)
    }

    private def algorithm(): (String, List[(String, Value)]) = {
      val alg = name()
      if (atSym("(")) {
        sym("(")
        if (atSym(")")) { sym(")"); (alg, Nil) }
        else { val ps = paramList(); sym(")"); (alg, ps) }
      } else (alg, Nil)
    }

    private def paramList(): List[(String, Value)] = {
      val buf = List.newBuilder[(String, Value)]
      buf += param()
      while (atSym(",")) { sym(","); buf += param() }
      buf.result()
    }

    private def param(): (String, Value) = {
      val n = name(); sym("="); (n, value())
    }

    private def value(): Value = peek match {
      case _: TNumber      => numberValue()
      case TDString(raw, _, _) => pos += 1; VStr(PyJson.loadString(raw))
      // single-quoted strings appear in the design docs' dict literals
      // (DSL.md:60-64 CONFIGURATION) — accepted as plain strings
      case _: TSString     => VStr(sstring())
      case _: TName        => VStr(name()) // bare name treated as string
      case TSym("[", _, _) => listLiteral()
      case TSym("{", _, _) => dictLiteral()
      case _               => fail("value")
    }

    private def listLiteral(): Value = {
      sym("[")
      val buf = List.newBuilder[Value]
      if (!atSym("]")) {
        buf += value()
        while (atSym(",")) { sym(","); buf += value() }
      }
      sym("]")
      VList(buf.result())
    }

    private def dictLiteral(): Value = {
      sym("{")
      val buf = List.newBuilder[(String, Value)]
      def entry(): Unit = {
        val key = peek match {
          case TDString(raw, _, _) => pos += 1; PyJson.loadString(raw)
          case _: TSString         => sstring()
          case _: TName            => name()
          case _                   => fail("dict key")
        }
        sym(":")
        buf += (key -> value())
      }
      if (!atSym("}")) {
        entry()
        while (atSym(",")) { sym(","); entry() }
      }
      sym("}")
      VDict(buf.result())
    }

    /** Token soup between FROM and the terminating uppercase PREDICT
      * (parser.py:20-41); raw text slice recovered from token positions
      * like the reference's meta-position capture (parser.py:405-410).
      * Consumes the PREDICT terminator. */
    private def sourceClause(): String = {
      val startTok = peek
      var lastEnd = -1
      var atoms = 0
      var done = false
      while (!done) {
        peek match {
          case TName("PREDICT", _, _) if atoms > 0 => done = true; pos += 1
          case t @ (_: TName | _: TNumber | _: TDString | _: TSString) =>
            lastEnd = t.end; atoms += 1; pos += 1
          case t: TSym if sourcePunct(t.text) =>
            lastEnd = t.end; atoms += 1; pos += 1
          case _ => fail("source clause token or 'PREDICT'")
        }
      }
      input.substring(startTok.start, lastEnd).trim
    }

    private def featureList(): List[String] = {
      val buf = List.newBuilder[String]
      buf += FeatureExpr.canonical(featureExpr())
      while (atSym(",")) { sym(","); buf += FeatureExpr.canonical(featureExpr()) }
      buf.result()
    }

    // ----- options ---------------------------------------------------------

    private def splitStmt(): DataSplit = {
      keyword("SPLIT"); keyword("DATA")
      val buf = List.newBuilder[(String, Double)]
      def entry(): Unit = {
        val n = name(); sym("=")
        val r = numberValue() match {
          case VInt(i)   => i.toDouble
          case VFloat(f) => f
          case _         => fail("number")
        }
        buf += (n -> r)
      }
      entry()
      while (atSym(",")) { sym(","); entry() }
      DataSplit(buf.result())
    }

    private def validateStmt(): ValidationOption = {
      keyword("VALIDATE")
      if (atKeyword("USING")) {
        keyword("USING")
        val method = name()
        if (atSym("(")) {
          sym("(")
          val params = if (atSym(")")) Nil else paramList()
          sym(")")
          // Mirror parser.py:501-507: an empty/absent param list leaves one
          // item, which the reference treats as the ON form.
          if (params.isEmpty) ValidationOption(on = Some(method))
          else ValidationOption(method = Some(method), params = Some(params))
        } else ValidationOption(on = Some(method))
      } else if (atKeyword("ON")) {
        keyword("ON")
        ValidationOption(on = Some(name()))
      } else fail("'USING' or 'ON'")
    }

    private def optimizeStmt(): String = {
      keyword("OPTIMIZE"); keyword("FOR"); name()
    }

    private def balanceStmt(): String = {
      keyword("BALANCE"); keyword("CLASSES"); keyword("BY"); name()
    }

    private def checkpointStmt(): CheckpointOption = {
      keyword("SAVE"); keyword("CHECKPOINTS"); keyword("EVERY")
      val interval = numberValue() match {
        case VInt(i) => i
        case VFloat(f) if f.isWhole => f.toLong
        case _ =>
          throw new IllegalArgumentException(
            "checkpoint interval must be a positive integer")
      }
      if (interval <= 0)
        throw new IllegalArgumentException(
          "checkpoint interval must be a positive integer")
      // Optional unit NAME; a following option keyword is not a unit (Lark
      // resolves this by keyword priority).
      val unit =
        if (peek.isInstanceOf[TName] && !optionKeywords(peek.text)) Some(name())
        else None
      CheckpointOption(interval, unit)
    }

    /** STOP WHEN flattened back to a string, AND binding tighter than OR
      * (parser.py:123-127,512-529). */
    private def stopStmt(): String = {
      keyword("STOP"); keyword("WHEN")
      orExpr()
    }

    private def orExpr(): String = {
      var e = andExpr()
      while (atKeyword("OR")) { keyword("OR"); e = s"$e OR ${andExpr()}" }
      e
    }

    private def andExpr(): String = {
      var e = comparison()
      while (atKeyword("AND")) { keyword("AND"); e = s"$e AND ${comparison()}" }
      e
    }

    private def comparison(): String = {
      val left = name()
      val op = compareOps.find(atSym).getOrElse(fail("comparison operator"))
      sym(op)
      val right = value()
      s"$left $op ${Value.pyStr(right)}"
    }

    // ----- COMPUTE ---------------------------------------------------------

    private def computeStmt(): ComputeSpec = {
      keyword("COMPUTE")
      val jobName = name()
      var inputs: Option[List[String]] = None
      var output: Option[String] = None
      var ticks: Option[Long] = None

      if (atKeyword("FROM")) {
        keyword("FROM"); keyword("table"); sym("(")
        val buf = List.newBuilder[String]
        buf += name()
        while (atSym(",")) { sym(","); buf += name() }
        sym(")")
        inputs = Some(buf.result())
      }
      if (atKeyword("INTO")) {
        keyword("INTO"); keyword("column"); sym("(")
        output = Some(name())
        sym(")")
      }
      if (atKeyword("EVERY")) {
        keyword("EVERY")
        val v = numberValue() match {
          case VInt(i) => i
          case VFloat(f) if f.isWhole => f.toLong
          case _ =>
            throw new IllegalArgumentException(
              "schedule ticks must be a positive integer")
        }
        if (v <= 0)
          throw new IllegalArgumentException(
            "schedule ticks must be a positive integer")
        keyword("TICKS")
        ticks = Some(v)
      }
      keyword("USING")
      val kernel = name()

      var options = List.empty[(String, Value)]
      def putOpt(k: String, v: Value): Unit =
        options = options.filterNot(_._1 == k) :+ (k -> v)
      while (peek.isInstanceOf[TName] && kernelOptKeywords(peek.text)) {
        peek.text match {
          case "BLOCK" =>
            keyword("BLOCK")
            val v = numberValue() match {
              case VInt(i) => i
              case VFloat(f) if f.isWhole => f.toLong
              case _ =>
                throw new IllegalArgumentException(
                  "block size must be a positive integer")
            }
            if (v <= 0)
              throw new IllegalArgumentException(
                "block size must be a positive integer")
            putOpt("BLOCK", VInt(v))
          case "GRID" =>
            keyword("GRID")
            val v = name()
            if (v != "auto")
              throw new IllegalArgumentException("grid value must be one of: auto")
            putOpt("GRID", VStr(v))
          case "SHARED" =>
            keyword("SHARED")
            val num = numberValue()
            val unit =
              if (peek.isInstanceOf[TName] && !kernelOptKeywords(peek.text))
                name()
              else ""
            val sizeStr = Value.pyStr(num) + unit
            if (!sizeStr.matches("(0|[1-9][0-9]*)([KMG])?"))
              throw new IllegalArgumentException(
                "shared memory size must be a non-negative integer optionally suffixed with K, M, or G")
            putOpt("SHARED", VStr(sizeStr))
        }
      }
      ComputeSpec(jobName, kernel, inputs, output, ticks,
        if (options.isEmpty) None else Some(options))
    }

    // ----- extended statements (design-doc surface, Ast.scala notes) -------

    /** Single-quoted string content, '' doubling collapsed. */
    private def sstring(): String = peek match {
      case TSString(raw, _, _) =>
        pos += 1
        raw.substring(1, raw.length - 1).replace("''", "'")
      case _ => fail("single-quoted string")
    }

    /** Raw text slice until one of `stops` appears as a NAME token (not
      * consumed) or EOF — the capture style of the TRAIN source clause. */
    private def rawUntil(stops: Set[String], what: String): String = {
      val startTok = peek
      var lastEnd = -1
      while (!peek.isInstanceOf[TEof] &&
          !(peek.isInstanceOf[TName] && stops(peek.text))) {
        lastEnd = peek.end
        pos += 1
      }
      if (lastEnd < 0) fail(what)
      input.substring(startTok.start, lastEnd).trim
    }

    private def positiveInt(what: String): Long = {
      val v = numberValue() match {
        case VInt(i)                 => i
        case VFloat(f) if f.isWhole  => f.toLong
        case _ =>
          throw new IllegalArgumentException(
            s"$what must be a positive integer")
      }
      if (v <= 0)
        throw new IllegalArgumentException(s"$what must be a positive integer")
      v
    }

    /** PREDICT USING MODEL m FROM t STORE RESULTS IN r [WITH BATCH_SIZE k] */
    private def predictStmt(): PredictSpec = {
      keyword("PREDICT"); keyword("USING"); keyword("MODEL")
      val model = name()
      keyword("FROM")
      val from = name()
      keyword("STORE"); keyword("RESULTS"); keyword("IN")
      val store = name()
      val batch =
        if (atKeyword("WITH")) {
          keyword("WITH"); keyword("BATCH_SIZE")
          Some(positiveInt("BATCH_SIZE"))
        } else None
      PredictSpec(model, from, store, batch)
    }

    /** DEPLOY MODEL …, or DEPLOY MODELS (…) … TRAFFIC SPLIT (…). */
    private def deployStmt(): Statement = {
      keyword("DEPLOY")
      if (atKeyword("MODELS")) {
        keyword("MODELS"); sym("(")
        val models = List.newBuilder[String]
        models += name()
        while (atSym(",")) { sym(","); models += name() }
        sym(")")
        keyword("TO"); keyword("ENDPOINT")
        val endpoint = name()
        keyword("WITH"); keyword("TRAFFIC"); keyword("SPLIT"); sym("(")
        val splits = List.newBuilder[Long]
        def pct(): Unit = { splits += positiveInt("traffic percentage"); sym("%") }
        pct()
        while (atSym(",")) { sym(","); pct() }
        sym(")")
        var promote: Option[String] = None
        var after: Option[Long] = None
        if (atKeyword("AUTO")) {
          keyword("AUTO"); keyword("PROMOTE")
          promote = Some(name())
          if (atKeyword("AFTER")) {
            keyword("AFTER")
            after = Some(positiveInt("AFTER sample count"))
            if (atKeyword("samples") || atKeyword("SAMPLES")) pos += 1
          }
        }
        TrafficSplitSpec(models.result(), endpoint, splits.result(),
          promote, after)
      } else {
        keyword("MODEL")
        val model = name()
        keyword("TO"); keyword("ENDPOINT")
        val endpoint = name()
        var config: Option[List[(String, Value)]] = None
        var monitor: Option[String] = None
        var vc: Option[String] = None
        var more = true
        while (more) {
          if (atKeyword("WITH")) {
            keyword("WITH"); keyword("CONFIGURATION")
            config = dictLiteral() match {
              case VDict(entries) => Some(entries)
              case _              => fail("configuration dict")
            }
          } else if (atKeyword("MONITOR")) {
            keyword("MONITOR"); monitor = Some(name())
          } else if (atKeyword("VERSION")) {
            keyword("VERSION"); keyword("CONTROL"); vc = Some(name())
          } else more = false
        }
        DeploySpec(model, endpoint, config, monitor, vc)
      }
    }

    /** PUBLISH EVENT 'type' WITH PAYLOAD {…} */
    private def publishStmt(): PublishSpec = {
      keyword("PUBLISH"); keyword("EVENT")
      val tpe = sstring()
      keyword("WITH"); keyword("PAYLOAD")
      dictLiteral() match {
        case VDict(entries) => PublishSpec(tpe, entries)
        case _              => fail("payload dict")
      }
    }

    /** SUBSCRIBE TO 'pattern' [EXECUTE handler] */
    private def subscribeStmt(): SubscribeSpec = {
      keyword("SUBSCRIBE"); keyword("TO")
      val pattern = sstring()
      val action =
        if (atKeyword("EXECUTE")) { keyword("EXECUTE"); Some(name()) }
        else None
      SubscribeSpec(pattern, action)
    }

    /** CREATE FEATURE TRANSFORMER name AS SELECT …, or CREATE ENSEMBLE. */
    private def createStmt(): Statement = {
      keyword("CREATE")
      if (atKeyword("ENSEMBLE")) {
        keyword("ENSEMBLE")
        val ensName = name()
        keyword("AS"); keyword("COMBINE"); keyword("MODELS"); sym("(")
        val models = List.newBuilder[(String, Double)]
        def arm(): Unit = {
          val m = name()
          keyword("WEIGHT")
          val w = numberValue() match {
            case VInt(i)   => i.toDouble
            case VFloat(f) => f
            case _         => fail("weight")
          }
          models += (m -> w)
        }
        arm()
        while (atSym(",")) { sym(","); arm() }
        sym(")")
        keyword("USING")
        val method = name()
        val validateOn =
          if (atKeyword("VALIDATE")) {
            keyword("VALIDATE"); keyword("ON"); Some(name())
          } else None
        EnsembleSpec(ensName, models.result(), method, validateOn)
      } else {
        keyword("FEATURE"); keyword("TRANSFORMER")
        val tName = name()
        keyword("AS")
        val select = rawUntil(Set.empty, "SELECT query")
        if (!select.toUpperCase.startsWith("SELECT"))
          throw new IllegalArgumentException(
            s"feature transformer '$tName' must be a SELECT query")
        TransformerSpec(tName, select)
      }
    }

    /** EXPLAIN PREDICTION m [FOR raw] [USING method] [SHOW TOP k features] */
    private def explainStmt(): ExplainSpec = {
      keyword("EXPLAIN"); keyword("PREDICTION")
      val model = name()
      val forClause =
        if (atKeyword("FOR")) {
          keyword("FOR"); Some(rawUntil(Set("USING", "SHOW"), "FOR clause"))
        } else None
      val method =
        if (atKeyword("USING")) { keyword("USING"); Some(name()) } else None
      val topK =
        if (atKeyword("SHOW")) {
          keyword("SHOW"); keyword("TOP")
          val k = positiveInt("SHOW TOP k")
          if (atKeyword("features") || atKeyword("FEATURES")) pos += 1
          Some(k)
        } else None
      ExplainSpec(model, forClause, method, topK)
    }

    /** MONITOR MODEL m FOR type [ON FEATURES (…)] [CHECK FREQUENCY f]
      * [ALERT WHEN raw] */
    private def monitorStmt(): MonitorSpec = {
      keyword("MONITOR"); keyword("MODEL")
      val model = name()
      keyword("FOR")
      val tpe = name()
      var features = List.empty[String]
      if (atKeyword("ON")) {
        keyword("ON")
        if (atKeyword("features") || atKeyword("FEATURES")) pos += 1
        sym("(")
        val buf = List.newBuilder[String]
        buf += name()
        while (atSym(",")) { sym(","); buf += name() }
        sym(")")
        features = buf.result()
      }
      // AND type2 ON m1, m2 … — the headline example's chained monitor
      // (DSL.md:348: AND performance_degradation ON accuracy, f1_score);
      // the metric list has no parens in the doc form, so it ends at the
      // next clause keyword
      val also = List.newBuilder[(String, List[String])]
      while (atKeyword("AND")) {
        keyword("AND")
        val t2 = name()
        val metrics = List.newBuilder[String]
        if (atKeyword("ON")) {
          keyword("ON")
          metrics += name()
          while (atSym(",")) { sym(","); metrics += name() }
        }
        also += (t2 -> metrics.result())
      }
      val freq =
        if (atKeyword("CHECK")) {
          keyword("CHECK"); keyword("FREQUENCY"); Some(name())
        } else None
      val alert =
        if (atKeyword("ALERT")) {
          keyword("ALERT"); keyword("WHEN")
          Some(rawUntil(Set.empty, "alert condition"))
        } else None
      MonitorSpec(model, tpe, features, freq, alert, also.result())
    }

    /** WHEN EVENT 'type' [WHERE raw] THEN raw, or WHEN MODEL m raw THEN raw */
    private def whenStmt(): WhenSpec = {
      keyword("WHEN")
      if (atKeyword("EVENT")) {
        keyword("EVENT")
        val tpe = sstring()
        val cond =
          if (atKeyword("WHERE")) {
            keyword("WHERE"); Some(rawUntil(Set("THEN"), "WHERE condition"))
          } else None
        keyword("THEN")
        WhenSpec(s"event:$tpe", cond, rawUntil(Set.empty, "THEN action"))
      } else {
        keyword("MODEL")
        val model = name()
        val cond = rawUntil(Set("THEN"), "model condition")
        keyword("THEN")
        WhenSpec(s"model:$model", Some(cond), rawUntil(Set.empty, "THEN action"))
      }
    }

    // ----- feature expressions (shared with the standalone parser) ---------

    def featureExpr(): FeatureExpr = featureSum()

    private def featureSum(): FeatureExpr = {
      var e = featureTerm()
      var loop = true
      while (loop) {
        if (atSym("+")) { sym("+"); e = FAdd(e, featureTerm()) }
        else if (atSym("-")) { sym("-"); e = FSub(e, featureTerm()) }
        else peek match {
          // Contextual re-split: after an operand, a token lexed as a
          // signed number (`c_acctbal-1` / `a +2`) is really operator +
          // literal — Lark's contextual lexer only admits MINUS/PLUS here
          // (sign folding elsewhere, e.g. `BLOCK -2`, stays intact).
          case TNumber(t, _, _) if t.head == '-' || t.head == '+' =>
            pos += 1
            val lit = numberFromText(t.tail)
            val rhs = continueTerm(FNum(lit))
            e = if (t.head == '-') FSub(e, rhs) else FAdd(e, rhs)
          case _ => loop = false
        }
      }
      e
    }

    /** Parse trailing * / factors onto an already-consumed first factor
      * (used when a signed-number token is re-split as operator+literal). */
    private def continueTerm(first: FeatureExpr): FeatureExpr = {
      var e = first
      var loop = true
      while (loop) {
        if (atSym("*")) { sym("*"); e = FMul(e, featureFactor()) }
        else if (atSym("/")) { sym("/"); e = FDiv(e, featureFactor()) }
        else loop = false
      }
      e
    }

    private def numberFromText(t: String): Value =
      if (t.exists(c => c == '.' || c == 'e' || c == 'E')) VFloat(t.toDouble)
      else VInt(t.toLong)

    private def featureTerm(): FeatureExpr = {
      var e = featureFactor()
      var loop = true
      while (loop) {
        if (atSym("*")) { sym("*"); e = FMul(e, featureFactor()) }
        else if (atSym("/")) { sym("/"); e = FDiv(e, featureFactor()) }
        else loop = false
      }
      e
    }

    private def featureFactor(): FeatureExpr =
      if (atSym("-")) { sym("-"); FNeg(featureFactor()) }
      else featurePrimary()

    private def featurePrimary(): FeatureExpr = peek match {
      case _: TName =>
        val ident = featureIdentifier()
        if (atSym("(")) {
          sym("(")
          val args =
            if (atSym(")")) Nil
            else {
              val buf = List.newBuilder[FeatureArg]
              buf += featureCallArg()
              while (atSym(",")) { sym(","); buf += featureCallArg() }
              buf.result()
            }
          sym(")")
          FCall(ident, args)
        } else ident
      case _: TNumber => FNum(numberValue())
      case TDString(raw, _, _) => pos += 1; FStr(PyJson.loadString(raw))
      case TSym("(", _, _) =>
        sym("(")
        val inner = featureExpr()
        sym(")")
        FGroup(inner)
      case _ => fail("feature expression")
    }

    private def featureCallArg(): FeatureArg = {
      // kwarg lookahead: NAME '=' (no equality operator exists in the
      // feature grammar, so this is unambiguous — parser.py:97)
      (peek, toks.lift(pos + 1)) match {
        case (TName(n, _, _), Some(TSym("=", _, _))) =>
          pos += 2
          FKw(n, featureExpr())
        case _ => FPos(featureExpr())
      }
    }

    private def featureIdentifier(): FIdent = {
      val buf = List.newBuilder[String]
      buf += name()
      while (atSym(".") && toks.lift(pos + 1).exists(_.isInstanceOf[TName])) {
        sym(".")
        buf += name()
      }
      FIdent(buf.result())
    }
  }

  /** parser.py:201-220: a single unqualified, unquoted token — no
    * whitespace and none of . ( ) " \ ' anywhere. */
  def isIdentifierSourceClause(clause: String): Boolean =
    clause.nonEmpty &&
      !clause.exists(_.isWhitespace) &&
      !clause.exists(c => ".()\"\\'".contains(c))
}
