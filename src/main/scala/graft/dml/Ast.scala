package graft.dml

/** ASTs for the DeclarativeML DSL, mirroring the reference's dataclasses
  * (reference/dsl/parser.py:223-284) re-expressed as Scala case classes.
  *
  * Parameter values keep Python's int/float distinction (parser.py:295-297
  * splits on "." in the token) because it is observable in the compiled SQL
  * (json.dumps emits `1` vs `1.0`).
  */
sealed trait Value
object Value {
  final case class VInt(v: Long) extends Value
  final case class VFloat(v: Double) extends Value
  final case class VStr(v: String) extends Value
  final case class VList(items: List[Value]) extends Value
  /** Insertion-ordered, like a Python dict (parser.py:308-313). */
  final case class VDict(entries: List[(String, Value)]) extends Value

  /** Numeric doubles rendered the way Python repr()/json.dumps renders
    * them: fixed notation while the leading digit's power of ten is in
    * [-4, 16) ("0.5", "2.0", "0.0001"), otherwise scientific with a
    * lowercase 'e', an explicit sign, and a two-digit-minimum exponent
    * ("1e-06", "2.5e+20") — where Scala's Double.toString would emit
    * "1.0E-6" / "2.5E20" and break SQL/JSON byte-compatibility. */
  def pyFloatRepr(v: Double): String = {
    if (v.isNaN) return "nan"
    if (v.isInfinity) return if (v > 0) "inf" else "-inf"
    val neg = v < 0 || (v == 0.0 && 1.0 / v < 0)
    val a = math.abs(v)
    val body =
      if (a == 0.0) "0.0"
      else {
        // shortest round-trip digits + decimal exponent, via Java's repr
        val s = java.lang.Double.toString(a)
        val (mant, e) = s.indexOf('E') match {
          case -1 => (s, 0)
          case i  => (s.substring(0, i), s.substring(i + 1).toInt)
        }
        val dot = mant.indexOf('.')
        val raw = mant.substring(0, dot) + mant.substring(dot + 1)
        // exp10 = power of ten of the first *significant* digit
        var exp10 = dot - 1 + e
        var digits = raw.dropWhile(_ == '0')
        exp10 -= raw.length - digits.length
        digits = digits.reverse.dropWhile(_ == '0').reverse
        if (digits.isEmpty) digits = "0"
        if (exp10 >= -4 && exp10 < 16) {
          if (exp10 >= digits.length - 1)
            digits + "0" * (exp10 - digits.length + 1) + ".0"
          else if (exp10 >= 0)
            digits.substring(0, exp10 + 1) + "." + digits.substring(exp10 + 1)
          else
            "0." + "0" * (-exp10 - 1) + digits
        } else {
          val m =
            if (digits.length == 1) digits
            else digits.substring(0, 1) + "." + digits.substring(1)
          val sign = if (exp10 < 0) "-" else "+"
          f"${m}e$sign${math.abs(exp10)}%02d"
        }
      }
    if (neg) "-" + body else body
  }

  /** Python str() of a decoded value — used when flattening STOP WHEN
    * comparisons back to a string (parser.py:512-514). */
  def pyStr(v: Value): String = v match {
    case VInt(i)       => i.toString
    case VFloat(f)     => pyFloatRepr(f)
    case VStr(s)       => s
    case VList(items)  => items.map(pyRepr).mkString("[", ", ", "]")
    case VDict(es)     => es.map { case (k, v) => s"'$k': ${pyRepr(v)}" }.mkString("{", ", ", "}")
  }

  private def pyRepr(v: Value): String = v match {
    case VStr(s) => "'" + s + "'"
    case other   => pyStr(other)
  }
}

/** SPLIT DATA ratios; validation per parser.py:227-234 (each ratio in [0,1],
  * sum within 1e-6 of 1.0) with the reference's exact error messages. */
final case class DataSplit(ratios: List[(String, Double)]) {
  ratios.foreach { case (_, r) =>
    if (r < 0 || r > 1)
      throw new IllegalArgumentException("split ratios must be between 0 and 1")
  }
  private val total = ratios.map(_._2).sum
  if (math.abs(total - 1.0) > 1e-6)
    throw new IllegalArgumentException("data split ratios must sum to 1.0")
}

/** VALIDATE USING m(params) | VALIDATE ON t (parser.py:237-241). Note the
  * reference quirk: `VALIDATE USING m` with no parens produces on=m
  * (transformer branches on item count, parser.py:501-507); mirrored. */
final case class ValidationOption(
    method: Option[String] = None,
    params: Option[List[(String, Value)]] = None,
    on: Option[String] = None)

/** SAVE CHECKPOINTS EVERY k [unit]; positive-int check at construction per
  * parser.py:486-499. */
final case class CheckpointOption(interval: Long, unit: Option[String])

sealed trait Statement

/** WITH TIME COLUMN c AND FEATURES (…, SEASONAL g, TREND t) [FORECAST n
  * unit AHEAD] [WITH CONFIDENCE INTERVALS p, …] (reference DSL.md:296-313).
  * SEASONAL/TREND markers are pulled out of the FEATURES list; ordinary
  * feature expressions stay in TrainSpec.features. Validation follows the
  * TRAIN options' style (IllegalArgumentException at construction). */
final case class TimeSeriesClause(
    timeColumn: String,
    seasonal: List[String] = Nil,
    trend: Option[String] = None,
    horizon: Option[Long] = None,
    horizonUnit: Option[String] = None,
    confidence: List[Double] = Nil) {
  horizon.foreach(h =>
    require(h > 0, "FORECAST horizon must be a positive integer"))
  confidence.foreach(c =>
    require(c > 0 && c < 1, "confidence intervals must be between 0 and 1"))
}

/** TRAIN MODEL statement (parser.py:260-274). `features` are the canonical
  * flattened strings the reference stores (re-parsed at compile time). */
final case class TrainSpec(
    name: String,
    algorithm: String,
    params: List[(String, Value)],
    source: String,
    target: String,
    features: List[String],
    sourceIsIdentifier: Boolean = true,
    split: Option[DataSplit] = None,
    validate: Option[ValidationOption] = None,
    optimizeMetric: Option[String] = None,
    stopCondition: Option[String] = None,
    balanceMethod: Option[String] = None,
    checkpoint: Option[CheckpointOption] = None,
    timeSeries: Option[TimeSeriesClause] = None)
  extends Statement

/** COMPUTE statement (parser.py:277-284). Options keep insertion order
  * (BLOCK -> int, GRID -> string, SHARED -> string). */
final case class ComputeSpec(
    name: String,
    kernel: String,
    inputs: Option[List[String]] = None,
    output: Option[String] = None,
    scheduleTicks: Option[Long] = None,
    options: Option[List[(String, Value)]] = None)
  extends Statement

object ComputeSpec {
  /** Assemble a ComputeSpec from loosely-typed clause parts, mirroring
    * TreeToModel.compute_stmt (parser.py:570-605) including its error
    * messages — ports tests that drive the transformer directly. Parts are
    * ("inputs", List[String]) | ("output", String) | ("schedule", Long) |
    * kernel name String | (optionKey, Value). */
  def assemble(name: String, parts: Seq[Any]): ComputeSpec = {
    var inputs: Option[List[String]] = None
    var output: Option[String] = None
    var schedule: Option[Long] = None
    var kernel: Option[String] = None
    var options = List.empty[(String, Value)]
    parts.foreach {
      case ("inputs", is: List[_])  => inputs = Some(is.map(_.toString))
      case ("output", o: String)    => output = Some(o)
      case ("schedule", t: Long)    => schedule = Some(t)
      case ("schedule", t: Int)     => schedule = Some(t.toLong)
      case k: String if kernel.isEmpty => kernel = Some(k)
      case (key: String, v: Value)  => options = options :+ (key -> v)
      case other =>
        throw new IllegalArgumentException(
          s"Unexpected compute clause part: $other")
    }
    val k = kernel.getOrElse(
      throw new IllegalArgumentException("Kernel name missing"))
    ComputeSpec(name, k, inputs, output, schedule,
      if (options.isEmpty) None else Some(options))
  }
}

// ---- Extended statements -----------------------------------------------
//
// The reference only *specifies* these (design docs: DSL.md:57-72 deploy /
// predict, DSL.md:123-143 WHEN, DSL.md:318-351 ensembles / A-B / explain /
// monitor, AGENTS.md:40-52 pub/sub); its parser rejects them. graft parses
// the documented headline form of each so the whole runtime surface is
// driveable from DSL text. Validation errors follow the TRAIN options'
// style: IllegalArgumentException at construction.

/** PREDICT USING MODEL m FROM t STORE RESULTS IN r [WITH BATCH_SIZE k]
  * (DSL.md:68-72). */
final case class PredictSpec(
    model: String, from: String, storeIn: String,
    batchSize: Option[Long] = None) extends Statement {
  batchSize.foreach(b => require(b > 0, "BATCH_SIZE must be a positive integer"))
}

/** DEPLOY MODEL m TO ENDPOINT e [WITH CONFIGURATION {…}] [MONITOR m]
  * [VERSION CONTROL v] (DSL.md:57-66). */
final case class DeploySpec(
    model: String, endpoint: String,
    config: Option[List[(String, Value)]] = None,
    monitor: Option[String] = None,
    versionControl: Option[String] = None) extends Statement

/** DEPLOY MODELS (a, b) TO ENDPOINT e WITH TRAFFIC SPLIT (p%, q%)
  * [AUTO PROMOTE crit AFTER n samples] (DSL.md:329-334). */
final case class TrafficSplitSpec(
    models: List[String], endpoint: String, splits: List[Long],
    autoPromote: Option[String] = None,
    promoteAfter: Option[Long] = None) extends Statement {
  require(models.nonEmpty && models.size == splits.size,
    "each model needs a traffic percentage")
  require(splits.sum == 100, "traffic split must sum to 100")
}

/** PUBLISH EVENT 'type' WITH PAYLOAD {…} (AGENTS.md:40-44). */
final case class PublishSpec(
    eventType: String, payload: List[(String, Value)]) extends Statement

/** SUBSCRIBE TO 'pattern' [EXECUTE handler] (AGENTS.md:47-52). */
final case class SubscribeSpec(
    pattern: String, action: Option[String] = None) extends Statement

/** CREATE FEATURE TRANSFORMER name AS SELECT … (DSL.md:79-86). */
final case class TransformerSpec(name: String, select: String)
  extends Statement

/** CREATE ENSEMBLE name AS COMBINE MODELS (m WEIGHT w, …) USING method
  * [VALIDATE ON t] (DSL.md:318-327). */
final case class EnsembleSpec(
    name: String, models: List[(String, Double)], method: String,
    validateOn: Option[String] = None) extends Statement {
  require(models.nonEmpty, "ensemble needs at least one model")
  require(models.forall(_._2 > 0), "ensemble weights must be positive")
}

/** EXPLAIN PREDICTION m [FOR raw] [USING method] [SHOW TOP k features]
  * (DSL.md:339-344). */
final case class ExplainSpec(
    model: String, forClause: Option[String] = None,
    method: Option[String] = None, topK: Option[Long] = None)
  extends Statement {
  topK.foreach(k => require(k > 0, "SHOW TOP k must be a positive integer"))
}

/** MONITOR MODEL m FOR type [ON FEATURES (a, b)]
  * [AND type2 ON m1, m2 …] [CHECK FREQUENCY f] [ALERT WHEN raw]
  * (DSL.md:346-351 — the headline example chains a second monitor type
  * with AND: `AND performance_degradation ON accuracy, f1_score`). */
final case class MonitorSpec(
    model: String, monitorFor: String, features: List[String] = Nil,
    frequency: Option[String] = None, alertWhen: Option[String] = None,
    also: List[(String, List[String])] = Nil)
  extends Statement

/** WHEN EVENT 'type' [WHERE cond] THEN action, or WHEN MODEL m cond THEN
  * action (DSL.md:123-143). Conditions/actions are raw text slices, like
  * the TRAIN source clause — interpretation happens at run time. */
final case class WhenSpec(
    trigger: String, condition: Option[String], action: String)
  extends Statement {
  require(trigger.nonEmpty && action.nonEmpty,
    "WHEN needs a trigger and a THEN action")
}

/** Feature-expression AST (second grammar, parser.py:141-176). The statement
  * parser flattens these to canonical strings for TrainSpec.features; the
  * compiler re-parses the strings (parser.py:739-744). */
sealed trait FeatureExpr
object FeatureExpr {
  final case class FIdent(parts: List[String]) extends FeatureExpr
  final case class FNum(value: Value) extends FeatureExpr // VInt | VFloat
  final case class FStr(value: String) extends FeatureExpr
  final case class FNeg(e: FeatureExpr) extends FeatureExpr
  final case class FAdd(l: FeatureExpr, r: FeatureExpr) extends FeatureExpr
  final case class FSub(l: FeatureExpr, r: FeatureExpr) extends FeatureExpr
  final case class FMul(l: FeatureExpr, r: FeatureExpr) extends FeatureExpr
  final case class FDiv(l: FeatureExpr, r: FeatureExpr) extends FeatureExpr
  final case class FGroup(e: FeatureExpr) extends FeatureExpr
  final case class FCall(name: FIdent, args: List[FeatureArg]) extends FeatureExpr

  sealed trait FeatureArg
  final case class FPos(e: FeatureExpr) extends FeatureArg
  final case class FKw(name: String, e: FeatureExpr) extends FeatureArg

  /** Canonical string form — byte-for-byte the flattening TreeToModel does
    * in the main grammar (parser.py:336-397): `l + r`, `-v`, `(x)`,
    * `f(a, b)`, `n=v`, numbers via Python str, strings via json.dumps. */
  def canonical(e: FeatureExpr): String = e match {
    case FIdent(parts) => parts.mkString(".")
    case FNum(v)       => Value.pyStr(v)
    case FStr(s)       => PyJson.dumpString(s)
    case FNeg(v)       => s"-${canonical(v)}"
    case FAdd(l, r)    => s"${canonical(l)} + ${canonical(r)}"
    case FSub(l, r)    => s"${canonical(l)} - ${canonical(r)}"
    case FMul(l, r)    => s"${canonical(l)} * ${canonical(r)}"
    case FDiv(l, r)    => s"${canonical(l)} / ${canonical(r)}"
    case FGroup(inner) => s"(${canonical(inner)})"
    case FCall(n, Nil)  => s"${canonical(n)}()"
    case FCall(n, args) =>
      s"${canonical(n)}(${args.map(canonicalArg).mkString(", ")})"
  }

  private def canonicalArg(a: FeatureArg): String = a match {
    case FPos(e)     => canonical(e)
    case FKw(n, e)   => s"$n=${canonical(e)}"
  }
}
