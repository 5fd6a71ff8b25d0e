package graft.dml.events

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.dml.{TrainSpec, Value}
import graft.dml.runtime.{Evaluation, Trainer}

/** Autonomous agents (SURVEY §2.1 S7): hyperparameter search, drift
  * monitoring; plus ensembles (S8) and A/B traffic split (S9).
  *
  * The reference's HPO agent is a 50-trial Bayesian search
  * (reference/AGENTS.md:110-119); seeded random search stands in (SURVEY
  * §7.3) — trials are independent fits, embarrassingly parallel on a
  * cluster. Early stopping (patience) lives in the Trainer's STOP WHEN
  * loop.
  */
object Agents {

  final case class Trial(params: List[(String, Value)], metrics: Map[String, Double])

  /** CREATE AGENT … hyperparameter_optimization: seeded random search over
    * a param grid; returns trials sorted by the target metric (best
    * first). */
  def hyperparameterSearch(
      spark: SparkSession,
      spec: TrainSpec,
      space: Map[String, Seq[Value]],
      trials: Int = 8,
      metric: String = "accuracy",
      maximize: Boolean = true,
      seed: Long = 42L): Seq[Trial] = {
    val rng = new scala.util.Random(seed)
    val names = space.keys.toSeq.sorted
    val configs = (0 until trials).map { _ =>
      names.map(n => n -> space(n)(rng.nextInt(space(n).size))).toList
    }.distinct
    val results = configs.map { params =>
      val merged = spec.copy(params = spec.params.filterNot(p =>
        names.contains(p._1)) ++ params)
      Trial(params, Trainer.train(spark, merged, seed = seed).metrics)
    }
    rankTrials(results, metric, maximize)
  }

  /** Rank trials best-first on the target metric. A trial that didn't
    * produce the metric — or produced NaN — can never win (NaN sorts above
    * every real under Ordering[Double], so it must be mapped to the worst
    * sentinel explicitly). */
  def rankTrials(results: Seq[Trial], metric: String, maximize: Boolean): Seq[Trial] = {
    val worst = if (maximize) Double.NegativeInfinity else Double.PositiveInfinity
    results.sortBy { t =>
      val v = t.metrics.getOrElse(metric, worst)
      if (v.isNaN) worst else v
    }(if (maximize) Ordering[Double].reverse else Ordering[Double])
  }

  /** Convergence/early-stop agent (reference AGENTS.md:59-90, patience=3):
    * chunked training that stops after `patience` evaluations without
    * improvement on the target metric; returns the best report and the
    * total epochs spent. */
  def earlyStopTrain(
      spark: SparkSession,
      spec: TrainSpec,
      metric: String = "accuracy",
      patience: Int = 3,
      chunk: Int = 10,
      maxChunks: Int = 20,
      minDelta: Double = 1e-6,
      seed: Long = 42L): (Trainer.TrainReport, Int) = {
    val iterNames = Set("max_iter", "iterations", "epochs", "n_estimators")
    var best = Double.NegativeInfinity
    var bestReport: Trainer.TrainReport = null
    var wait = 0
    var epochs = 0
    var i = 0
    while (wait < patience && i < maxChunks) {
      i += 1
      epochs = chunk * i
      val chunked = spec.copy(
        params = spec.params.filterNot(p => iterNames(p._1)) :+
          ("max_iter" -> (Value.VInt(epochs): Value)),
        stopCondition = None)
      val report = Trainer.train(spark, chunked, seed = seed)
      val m = report.metrics.getOrElse(metric,
        throw new IllegalArgumentException(s"metric '$metric' not produced"))
      if (m > best + minDelta) { best = m; bestReport = report; wait = 0 }
      else wait += 1
    }
    (bestReport, epochs)
  }

  /** MONITOR MODEL FOR drift_detection (S11): per-feature standardized mean
    * shift between a reference window and a current window, computed with
    * decimal-exact sums (deterministic) in one aggregate pass per side. */
  def driftScores(
      reference: DataFrame, current: DataFrame,
      features: Seq[String]): Map[String, Double] = {
    def stats(df: DataFrame): Map[String, (Double, Double, Long)] = {
      val aggs = features.flatMap { f =>
        Seq(
          sum(col(f).cast("decimal(28,8)")).cast("double").as(s"${f}_sum"),
          sum((col(f) * col(f)).cast("decimal(28,8)")).cast("double").as(s"${f}_sq"),
          count(col(f)).as(s"${f}_n"))
      }
      val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
      features.map { f =>
        val s = row.getAs[Double](s"${f}_sum")
        val sq = row.getAs[Double](s"${f}_sq")
        val n = row.getAs[Long](s"${f}_n")
        f -> (s / n, math.sqrt(math.max(sq / n - (s / n) * (s / n), 1e-12)), n)
      }.toMap
    }
    val ref = stats(reference)
    val cur = stats(current)
    features.map { f =>
      val (m0, sd0, _) = ref(f)
      val (m1, _, _) = cur(f)
      f -> math.abs(m1 - m0) / sd0
    }.toMap
  }

  /** Population Stability Index between a reference and a current slice
    * of `valueCol`, per `groupCols` group — the standard production drift
    * metric ([[driftScores]]' mean/σ shift misses shape changes PSI
    * catches; PSI < 0.1 stable, 0.1–0.25 moderate, > 0.25 drifted).
    * Values bin by fixed `binWidth` clamped into [0, nBins-1] (negative
    * values land in bin 0, not a phantom negative bin); NULL values carry
    * no distribution information and are dropped rather than silently
    * miscounted in the top bin (Spark's `least` skips NULLs). Counts are
    * Laplace-smoothed ((c+1)/(n+nBins)) so empty bins never divide by
    * zero, and per-bin contributions are rounded then summed as
    * DECIMAL(18,6) — deterministic at any partitioning, DuckDB-replayable.
    *
    * A group present on only ONE side — a brand-new or vanished
    * event_type, i.e. maximal drift — yields psi = +∞ (with n_bins
    * counting the side that exists) instead of being dropped by an inner
    * totals join: a drift monitor must never omit the most-drifted group.
    *
    * Plan shape: one count aggregation per side keyed by (group, bin),
    * a full-outer bin join (bins absent from both sides contribute
    * exactly 0 and need no row), and tiny per-group totals left-joined
    * back — the shuffles carry bin counts, never events. */
  def psiDrift(
      reference: DataFrame, current: DataFrame, valueCol: String,
      groupCols: Seq[String], binWidth: Double, nBins: Int): DataFrame = {
    require(binWidth > 0 && nBins > 1, "binWidth > 0 and nBins > 1 required")
    val g = groupCols.map(col)
    def binned(df: DataFrame, side: String): (DataFrame, DataFrame) = {
      val b = df.filter(col(valueCol).isNotNull)
        .select((g :+
          least(greatest(floor(col(valueCol) / binWidth).cast("int"), lit(0)),
            lit(nBins - 1)).as("bin")): _*)
        .groupBy((g :+ col("bin")): _*)
        .agg(count(lit(1)).as(s"c_$side"))
      val t = b.groupBy(g: _*).agg(sum(s"c_$side").as(s"n_$side"))
      (b, t)
    }
    val (rb, rt) = binned(reference, "ref")
    val (cb, ct) = binned(current, "cur")
    val p = (col("c_ref") + 1).cast("double") /
      (col("n_ref") + nBins).cast("double")
    val q = (col("c_cur") + 1).cast("double") /
      (col("n_cur") + nBins).cast("double")
    rb.join(cb, groupCols :+ "bin", "full_outer")
      .na.fill(0L, Seq("c_ref", "c_cur"))
      .join(rt, groupCols.toSeq, "left").join(ct, groupCols.toSeq, "left")
      .withColumn("_contrib",
        when(col("n_ref").isNull || col("n_cur").isNull, lit(null))
          .otherwise(round((p - q) * log(p / q), 6).cast("decimal(18,6)")))
      .groupBy(g: _*)
      .agg(
        when(max(col("n_ref").isNull.cast("int")) === 1 ||
          max(col("n_cur").isNull.cast("int")) === 1,
          lit(Double.PositiveInfinity))
          .otherwise(sum("_contrib").cast("double")).as("psi"),
        count(lit(1)).as("n_bins"))
  }

  /** Drift agent: evaluates scores and publishes an alert event per
    * drifted feature (WHEN drift > threshold THEN PUBLISH, DSL.md:346-351). */
  def driftAgent(
      bus: EventBus,
      reference: DataFrame, current: DataFrame,
      features: Seq[String], threshold: Double = 0.5): Map[String, Double] = {
    val scores = driftScores(reference, current, features)
    scores.filter(_._2 > threshold).foreach { case (f, s) =>
      bus.publish("drift_alert", Map("feature" -> f, "score" -> s.toString))
    }
    scores
  }

  /** CREATE ENSEMBLE … COMBINE MODELS (m WEIGHT w, …) USING
    * weighted_average (S8): weighted sum of per-model prediction columns.
    * Each model transform is one pass; the combine is Column arithmetic. */
  def weightedEnsemble(
      models: Seq[(org.apache.spark.ml.PipelineModel, Double)],
      data: DataFrame): DataFrame = {
    require(models.nonEmpty, "ensemble needs at least one model")
    val total = models.map(_._2).sum
    var out = data
    models.zipWithIndex.foreach { case ((m, _), i) =>
      // drop EVERY column this model's stages added (indexer/tokenizer
      // intermediates included) except its renamed prediction, so the next
      // model's transform can't collide on stage output names
      val before = out.columns.toSet
      val transformed = m.transform(out)
      val added = transformed.columns.filter(c =>
        !before.contains(c) && c != "prediction")
      out = transformed
        .withColumnRenamed("prediction", s"pred_$i")
        .drop(added.toIndexedSeq: _*)
    }
    val combined = models.zipWithIndex
      .map { case ((_, w), i) => col(s"pred_$i") * (w / total) }
      .reduce(_ + _)
    out.withColumn("ensemble_prediction", combined)
  }

  /** DEPLOY MODELS (a, b) … TRAFFIC SPLIT a=pct, b=rest (S9): deterministic
    * hash routing on a key column — reproducible assignment, no RNG. */
  def trafficSplit(
      data: DataFrame, keyCol: String,
      arms: Seq[(String, Int)]): DataFrame = {
    require(arms.map(_._2).sum == 100, "traffic split must sum to 100")
    val bucket = pmod(xxhash64(col(keyCol)), lit(100))
    val (routed, _) = arms.foldLeft((lit(null).cast("string"), 0)) {
      case ((acc, offset), (arm, pct)) =>
        (when(bucket >= offset && bucket < offset + pct, lit(arm)).otherwise(acc),
          offset + pct)
    }
    data.withColumn("arm", routed)
  }

  /** AUTO PROMOTE (S9 tail): evaluate each arm's model on its routed
    * traffic slice and deploy the winner to the registry endpoint. Returns
    * (winning arm, per-arm metric map). */
  def autoPromote(
      registry: graft.dml.runtime.ModelRegistry,
      routed: DataFrame,
      arms: Map[String, (String, org.apache.spark.ml.PipelineModel)],
      endpoint: String,
      metric: String = "accuracy"): (String, Map[String, Double]) = {
    val scores = arms.map { case (arm, (_, model)) =>
      val slice = routed.filter(col("arm") === arm)
      arm -> graft.dml.runtime.Evaluation
        .evaluateModel(model, slice, Seq(metric))
        .getOrElse(metric, Double.NegativeInfinity)
    }
    val winner = scores.maxBy(_._2)._1
    registry.deploy(arms(winner)._1, endpoint)
    (winner, scores)
  }

  /** EXPLAIN PREDICTION (S10): global importances via the fitted model
    * (per-row SHAP is out of scope, SURVEY §7.3). */
  def explain(
      model: org.apache.spark.ml.PipelineModel,
      featureNames: Seq[String], topK: Int = 5): Seq[(String, Double)] =
    Evaluation.featureImportance(model, featureNames)
      .toSeq.sortBy(-_._2).take(topK)
}
