package graft.dml.runtime

import org.apache.spark.ml.{Estimator, Model}
import org.apache.spark.ml.classification._
import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.param.{Param, Params}
import org.apache.spark.ml.regression._

import graft.dml.Value
import graft.dml.Value._

/** `USING alg(params)` → MLlib estimator (SURVEY §2.2 O1).
  *
  * The DSL's algorithm names and param spellings follow the reference's
  * documented examples (reference/DSL.md:29-51, README.md:38-52); the alias
  * table maps them onto MLlib Param names. Unknown algorithms and unknown
  * params raise IllegalArgumentException (the DSL's ValueError analog).
  */
object AlgorithmRegistry {

  sealed trait Task
  case object Classification extends Task
  case object Regression extends Task
  case object Clustering extends Task

  final case class Algorithm(
      name: String,
      task: Task,
      make: () => Estimator[_ <: Model[_]],
      /** name of the iteration Param when the estimator trains iteratively —
        * enables STOP WHEN chunked fitting and epoch checkpoints */
      iterParam: Option[String],
      /** text-pipeline algorithms take ONE text feature column and build
        * Tokenizer→HashingTF→IDF in front of the estimator (SURVEY §2.8:
        * LLM ops surfaced as DSL algorithms, e.g. tfidf_logreg) */
      textPipeline: Boolean = false,
      /** params a stand-in accepts without effect (documented reduced
        * fidelity): prophet's seasonality/holidays have no analog on the
        * lag-regression stand-in, but the reference's own example
        * (DSL.md:297-301) must fit rather than fail */
      noopParams: Set[String] = Set.empty)

  private def alg(name: String, task: Task, iter: Option[String],
      text: Boolean = false, noop: Set[String] = Set.empty)(
      make: => Estimator[_ <: Model[_]]): (String, Algorithm) =
    name -> Algorithm(name, task, () => make, iter, text, noop)

  /** Registry; names are case-insensitive at lookup. */
  val algorithms: Map[String, Algorithm] = Map(
    alg("logistic_regression", Classification, Some("maxIter"))(new LogisticRegression()),
    alg("decision_tree", Classification, None)(new DecisionTreeClassifier()),
    alg("decision_tree_regressor", Regression, None)(new DecisionTreeRegressor()),
    alg("random_forest", Classification, None)(new RandomForestClassifier()),
    alg("random_forest_regressor", Regression, None)(new RandomForestRegressor()),
    alg("gradient_boosting", Classification, Some("maxIter"))(new GBTClassifier()),
    alg("xgboost", Classification, Some("maxIter"))(new GBTClassifier()),
    alg("gradient_boosting_regressor", Regression, Some("maxIter"))(new GBTRegressor()),
    alg("linear_regression", Regression, Some("maxIter"))(new LinearRegression()),
    alg("naive_bayes", Classification, None)(new NaiveBayes()),
    alg("neural_network", Classification, Some("maxIter"))(new MultilayerPerceptronClassifier()),
    alg("kmeans", Clustering, Some("maxIter"))(new KMeans()),
    // prophet has no Spark analog; documented Fourier + piecewise-linear
    // regression stand-in (SURVEY §7.3). `seasonality=[...]`,
    // `changepoints=k`, and BOTH `holidays` forms BIND — the literal
    // ISO-date list and (since r11) the bare-name calendar form
    // (`holidays=us_holidays`, DSL.md:300), which resolves a registered
    // view of that name; an unregistered calendar fails loud. All are
    // consumed by the frame builder (TrainCompiler.effectiveClause /
    // changepointCount / holidayDates); `growth` validates (only
    // 'linear' — the stand-in's trend — is expressible).
    // `changepoint_prior_scale` BINDS too (since r12) as a per-column
    // ridge on the hinge basis via standardization-aware rescaling
    // (TrainCompiler.changepointPriorScale) — NOT the global regularizer,
    // which would shrink the seasonal terms alongside the deltas it
    // claims to tune.
    alg("prophet", Regression, Some("maxIter"))(new LinearRegression()),
    // text classifiers: Tokenizer→HashingTF→IDF in front of the estimator
    alg("tfidf_logreg", Classification, Some("maxIter"), text = true)(
      new LogisticRegression()),
    alg("tfidf_naive_bayes", Classification, None, text = true)(
      new NaiveBayes()))

  /** DSL param spelling → MLlib Param name (SURVEY §2.2 O1 alias table). */
  private val aliases: Map[String, String] = Map(
    "max_depth" -> "maxDepth",
    "learning_rate" -> "stepSize",
    "n_estimators" -> "numTrees", // RF; GBT resolves via maxIter fallback
    "regularization" -> "regParam",
    "reg_param" -> "regParam",
    "elastic_net" -> "elasticNetParam",
    "max_iter" -> "maxIter",
    "iterations" -> "maxIter",
    "epochs" -> "maxIter",
    "n_clusters" -> "k",
    "num_clusters" -> "k",
    "min_samples_split" -> "minInstancesPerNode",
    "subsample" -> "subsamplingRate",
    "tol" -> "tol",
    "seed" -> "seed",
    "layers" -> "layers",
    "smoothing" -> "smoothing")

  def resolve(name: String): Algorithm =
    algorithms.getOrElse(name.toLowerCase,
      throw new IllegalArgumentException(s"unknown algorithm: $name"))

  /** Apply DSL params to the estimator, coercing by the Param's value type.
    * Aliases resolve first; a DSL name that matches neither an alias nor an
    * MLlib param raises. */
  def applyParams(est: Params, params: List[(String, Value)]): Unit =
    params.foreach { case (rawName, value) =>
      val candidates = Seq(aliases.getOrElse(rawName, rawName), rawName) ++
        (if (rawName == "n_estimators") Seq("maxIter") else Nil)
      val pname = candidates.find(est.hasParam).getOrElse(
        throw new IllegalArgumentException(
          s"unknown parameter '$rawName' for ${est.getClass.getSimpleName}"))
      setParam(est, est.getParam(pname), value)
    }

  private def setParam(est: Params, p: Param[_], v: Value): Unit = {
    import org.apache.spark.ml.param._
    (p, v) match {
      case (ip: IntParam, VInt(i))        => est.set(ip, i.toInt)
      case (ip: IntParam, VFloat(f)) if f.isWhole => est.set(ip, f.toInt)
      case (dp: DoubleParam, VInt(i))     => est.set(dp, i.toDouble)
      case (dp: DoubleParam, VFloat(f))   => est.set(dp, f)
      case (lp: LongParam, VInt(i))       => est.set(lp, i)
      case (bp: BooleanParam, VStr(s))    => est.set(bp, s.toBoolean)
      case (ap: IntArrayParam, VList(xs)) =>
        est.set(ap, xs.map {
          case VInt(i) => i.toInt
          case VFloat(f) if f.isWhole => f.toInt
          case other => throw new IllegalArgumentException(
            s"expected int in array param ${p.name}, got $other")
        }.toArray)
      case (ap: DoubleArrayParam, VList(xs)) =>
        est.set(ap, xs.map {
          case VInt(i)   => i.toDouble
          case VFloat(f) => f
          case other => throw new IllegalArgumentException(
            s"expected number in array param ${p.name}, got $other")
        }.toArray)
      case (sp, VStr(s)) => est.set(sp.asInstanceOf[Param[Any]], s)
      case (sp, VInt(i)) => est.set(sp.asInstanceOf[Param[Any]], i)
      case (sp, VFloat(f)) => est.set(sp.asInstanceOf[Param[Any]], f)
      case _ =>
        throw new IllegalArgumentException(
          s"cannot apply value $v to param ${p.name}")
    }
  }
}
