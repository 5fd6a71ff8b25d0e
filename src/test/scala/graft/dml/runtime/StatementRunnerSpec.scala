package graft.dml.runtime

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.dml._
import graft.dml.events.EventBus

/** The statement dispatcher end-to-end: every extended statement executed
  * against the fixture tables through DSL text alone. */
class StatementRunnerSpec extends AnyFunSuite {

  private def spark = SparkTestSession.withTables()

  private def freshRunner() = {
    val s = spark
    val base = Files.createTempDirectory("graft-runner").toString
    val registry = new ModelRegistry(s, s"$base/registry")
    val bus = new EventBus(s, s"$base/events")
    (new StatementRunner(s, registry, bus), registry, bus)
  }

  private val trainDml =
    "TRAIN MODEL runner_clf USING logistic_regression(max_iter=10) " +
      "FROM orders PREDICT o_orderstatus " +
      "WITH FEATURES(o_totalprice, o_custkey)"

  test("train → predict → deploy → explain, all from DSL text") {
    val (runner, registry, _) = freshRunner()
    val trained = runner.run(DmlParser.parse(trainDml))
    assert(trained.kind == "train" && trained.summary.contains("runner_clf"))

    val predicted = runner.run(DmlParser.parse(
      "PREDICT USING MODEL runner_clf FROM orders STORE RESULTS IN preds"))
    assert(predicted.data.get.columns.contains("prediction"))
    assert(spark.table("preds").count() == spark.table("orders").count())

    runner.run(DmlParser.parse(
      "DEPLOY MODEL runner_clf TO ENDPOINT scoring"))
    val dep = registry.deployments().filter(col("endpoint") === "scoring")
    assert(dep.count() == 1)

    val explained = runner.run(DmlParser.parse(
      "EXPLAIN PREDICTION runner_clf SHOW TOP 2 features"))
    val rows = explained.data.get.collect()
    assert(rows.length == 2)
    assert(rows.map(_.getString(0)).toSet
      .subsetOf(Set("o_totalprice", "o_custkey")))
  }

  test("COMPUTE table inference reaches user temp views, and a " +
    "contract violation surfaces the kernel's own message") {
    val (runner, _, _) = freshRunner()
    val s = spark
    // the fixture embeddings table is vec_id-keyed and CANNOT feed a
    // doc_id-keyed kernel; a user's keyed view must be found instead
    // (fixtures are tried first, fail their require lazily, then views)
    s.table("embeddings")
      .select(col("vec_id").as("doc_id"), col("embedding"))
      .createOrReplaceTempView("runner_emb_docs")
    try {
      val out = runner.run(DmlParser.parse(
        "COMPUTE sd FROM table(embedding) INTO column(is_semdup) " +
          "USING semantic_dedup"))
      assert(out.summary.contains("runner_emb_docs"),
        s"inference must pick the keyed view: ${out.summary}")
      assert(out.data.get.columns.contains("is_semdup"))
      // with the view gone, the fixture's own contract error must
      // surface verbatim — not a vague "nothing matched"
      s.catalog.dropTempView("runner_emb_docs")
      val e = intercept[IllegalArgumentException](runner.run(DmlParser.parse(
        "COMPUTE sd2 FROM table(embedding) INTO column(is_semdup) " +
          "USING semantic_dedup")))
      assert(e.getMessage.contains("doc_id"))
    } finally {
      try s.catalog.dropTempView("runner_emb_docs")
      catch { case _: Exception => () }
      graft.llm.PipelineCaches.clear()
    }
  }

  test("ensemble over two registered models validates on a table") {
    val (runner, _, _) = freshRunner()
    runner.run(DmlParser.parse(trainDml))
    runner.run(DmlParser.parse(
      "TRAIN MODEL runner_clf2 USING decision_tree(max_depth=3) " +
        "FROM orders PREDICT o_orderstatus " +
        "WITH FEATURES(o_totalprice, o_custkey)"))
    val r = runner.run(DmlParser.parse(
      "CREATE ENSEMBLE duo AS COMBINE MODELS " +
        "(runner_clf WEIGHT 0.6, runner_clf2 WEIGHT 0.4) " +
        "USING weighted_average VALIDATE ON orders"))
    assert(r.data.get.columns.contains("ensemble_prediction"))
    assert(r.data.get.count() == spark.table("orders").count())
  }

  test("publish / subscribe / WHEN-rule dispatch over the event log") {
    val (runner, _, bus) = freshRunner()
    runner.run(DmlParser.parse(
      "PUBLISH EVENT 'deploy.requested' WITH PAYLOAD {model: fraud, severity: 0.9}"))
    val sub = runner.run(DmlParser.parse("SUBSCRIBE TO 'deploy.%'"))
    assert(sub.data.get.count() == 1)

    runner.run(DmlParser.parse(
      "WHEN EVENT 'deploy.%' WHERE value >= 0.0 THEN promote_model"))
    val fired = runner.dispatch(bus.subscribe("%"))
    assert(fired.get("promote_model").contains(1L))
    // default action publishes a rule_fired event back to the bus
    assert(bus.subscribe("rule_fired").count() == 1)
  }

  test("WHEN MODEL rules evaluate against registry metrics") {
    val (runner, _, _) = freshRunner()
    runner.run(DmlParser.parse(trainDml))
    runner.run(DmlParser.parse(
      "WHEN MODEL runner_clf accuracy >= 0.0 THEN celebrate"))
    runner.run(DmlParser.parse(
      "WHEN MODEL runner_clf accuracy > 1.5 THEN impossible"))
    assert(runner.checkModelRules() == Seq("celebrate"))
  }

  test("WHEN MODEL ... THEN rollback re-deploys the previous version") {
    val (runner, registry, bus) = freshRunner()
    runner.run(DmlParser.parse(trainDml))               // v1
    runner.run(DmlParser.parse(trainDml))               // v2
    runner.run(DmlParser.parse(
      "DEPLOY MODEL runner_clf TO ENDPOINT scoring"))   // serves v2
    runner.run(DmlParser.parse(
      "WHEN MODEL runner_clf accuracy >= 0.0 THEN rollback"))
    assert(runner.checkModelRules() == Seq("rollback"))
    // latest deployment row now points at v1, history preserved
    val hist = registry.deployments()
      .orderBy(col("deployed_at_ms").desc, col("version").desc).collect()
    assert(hist.length == 2)
    assert(hist.head.getInt(2) == 1, "rollback must re-deploy v1")
    assert(bus.subscribe("model_rollback").count() == 1)
    // a second rollback undoes the rollback (kubectl-style toggle: the
    // previous distinct deployment is now v2)
    assert(registry.rollback("runner_clf") == 2)
    // a model with a single deployed version has nowhere to go
    runner.run(DmlParser.parse(
      "TRAIN MODEL solo_clf USING decision_tree(max_depth=2) " +
        "FROM orders PREDICT o_orderstatus WITH FEATURES(o_totalprice)"))
    runner.run(DmlParser.parse("DEPLOY MODEL solo_clf TO ENDPOINT scoring"))
    val e = intercept[IllegalArgumentException](registry.rollback("solo_clf"))
    assert(e.getMessage.contains("no previous version"))
  }

  test("EXPLAIN ... FOR works on a time-series model (clause features derived)") {
    val (runner, _, _) = freshRunner()
    runner.run(DmlParser.parse(
      "TRAIN MODEL ts_exp USING prophet FROM orders PREDICT o_totalprice " +
        "WITH TIME COLUMN o_orderdate " +
        "AND FEATURES(SEASONAL weekday, TREND linear)"))
    val key = spark.table("orders").select("o_orderkey")
      .orderBy(col("o_orderkey")).limit(1).collect()(0).getLong(0)
    val rows = runner.run(DmlParser.parse(
      s"EXPLAIN PREDICTION ts_exp FOR ORDER o_orderkey = $key SHOW TOP 2"))
      .data.get.collect()
    assert(rows.length == 2)
    // top-2 by |contribution| out of the clause's derived features
    // (raw weekday component + its Fourier pair + the trend index)
    assert(rows.map(_.getAs[String]("feature")).toSet.subsetOf(
      Set("season_weekday", "season_weekday_sin", "season_weekday_cos",
        "t_index")))
  }

  test("EXPLAIN ... FOR works on a random_forest classifier (DSL.md churn shape)") {
    val (runner, _, _) = freshRunner()
    // the DSL.md:339-344 worked example explains a churn CLASSIFIER —
    // random_forest + per-row EXPLAIN must work, not throw
    runner.run(DmlParser.parse(
      "TRAIN MODEL churn_rf USING random_forest(n_estimators=5, max_depth=4) " +
        "FROM orders PREDICT o_orderstatus " +
        "WITH FEATURES(o_totalprice, o_custkey)"))
    val key = spark.table("orders").select("o_orderkey")
      .orderBy(col("o_orderkey")).limit(1).collect()(0).getLong(0)
    val rows = runner.run(DmlParser.parse(
      s"EXPLAIN PREDICTION churn_rf FOR ORDER o_orderkey = $key SHOW TOP 2"))
      .data.get.collect()
    assert(rows.length == 2)
    assert(rows.map(_.getAs[String]("feature")).toSet ==
      Set("o_totalprice", "o_custkey"))
    assert(rows.map(_.getAs[Int]("rank")).toSet == Set(1, 2))
  }

  test("EXPLAIN ... USING kernel_shap runs the sampler end-to-end") {
    val (runner, _, _) = freshRunner()
    runner.run(DmlParser.parse(trainDml))
    val key = spark.table("orders").select("o_orderkey")
      .orderBy(col("o_orderkey")).limit(1).collect()(0).getLong(0)
    val rows = runner.run(DmlParser.parse(
      s"EXPLAIN PREDICTION runner_clf FOR ORDER o_orderkey = $key " +
        "USING kernel_shap SHOW TOP 2"))
      .data.get.collect()
    assert(rows.length == 2)
    assert(rows.map(_.getAs[String]("feature")).toSet ==
      Set("o_totalprice", "o_custkey"))
  }

  test("EXPLAIN ... FOR falls back to kernel_shap for uncovered model families") {
    val (runner, _, _) = freshRunner()
    // naive bayes has no exact/Saabas decomposition — the default path
    // must fall back to the model-agnostic sampler instead of throwing
    runner.run(DmlParser.parse(
      "TRAIN MODEL nb_m USING naive_bayes FROM orders " +
        "PREDICT o_orderstatus WITH FEATURES(o_totalprice, o_custkey)"))
    val key = spark.table("orders").select("o_orderkey")
      .orderBy(col("o_orderkey")).limit(1).collect()(0).getLong(0)
    val rows = runner.run(DmlParser.parse(
      s"EXPLAIN PREDICTION nb_m FOR ORDER o_orderkey = $key SHOW TOP 2"))
      .data.get.collect()
    assert(rows.length == 2)
    assert(rows.map(_.getAs[String]("feature")).toSet ==
      Set("o_totalprice", "o_custkey"))
  }

  test("performance_degradation monitor alerts on dropped metrics only") {
    val (runner, registry, bus) = freshRunner()
    runner.run(DmlParser.parse(trainDml)) // v1, real fit
    runner.run(DmlParser.parse(
      "MONITOR MODEL runner_clf FOR drift_detection ON features (o_totalprice) " +
        "AND performance_degradation ON accuracy, f1 CHECK FREQUENCY daily"))
    // craft v2/v3 with controlled metrics on the same fitted model:
    // accuracy drops, f1 improves
    val report = graft.dml.runtime.Trainer.train(spark,
      DmlParser.parse(trainDml).asInstanceOf[TrainSpec])
    registry.register(report.copy(
      metrics = Map("accuracy" -> 0.9, "f1" -> 0.5)))           // v2
    registry.register(report.copy(
      metrics = Map("accuracy" -> 0.7, "f1" -> 0.6)))           // v3
    val out = runner.runPerformanceCheck("runner_clf")
    assert(out("accuracy") == (0.9, 0.7) && out("f1") == (0.5, 0.6))
    val alerts = bus.subscribe("performance_alert").collect()
    assert(alerts.length == 1, s"exactly the dropped metric alerts: ${alerts.toSeq}")
    assert(alerts(0).getString(5).contains("\"metric\": \"accuracy\""))
    // no monitor registered → loud failure
    val e = intercept[IllegalArgumentException](
      runner.runPerformanceCheck("ghost"))
    assert(e.getMessage.contains("no performance_degradation monitor"))
  }

  test("EXPLAIN PREDICTION ... FOR returns per-row top-k contributions") {
    val (runner, _, _) = freshRunner()
    runner.run(DmlParser.parse(
      "TRAIN MODEL runner_reg USING linear_regression(max_iter=20) " +
        "FROM orders PREDICT o_totalprice " +
        "WITH FEATURES(o_custkey, o_orderkey)"))
    val key = spark.table("orders").select("o_orderkey")
      .orderBy(col("o_orderkey")).limit(1).collect()(0).getLong(0)
    val res = runner.run(DmlParser.parse(
      s"EXPLAIN PREDICTION runner_reg FOR ORDER o_orderkey = $key " +
        "USING shap_values SHOW TOP 2 features"))
    assert(res.kind == "explain")
    val rows = res.data.get.collect()
    assert(rows.length == 2, "one matched row × top-2 features")
    val byRank = rows.sortBy(_.getAs[Int]("rank"))
    assert(byRank.map(_.getAs[Int]("rank")).toSeq == Seq(1, 2))
    assert(byRank.map(_.getAs[String]("feature")).toSet ==
      Set("o_custkey", "o_orderkey"))
    // |contribution| is non-increasing in rank and the source row's id
    // column rides along
    assert(math.abs(byRank(0).getAs[Double]("contribution")) >=
      math.abs(byRank(1).getAs[Double]("contribution")))
    // the baseline is the POPULATION, not the single filtered row — a
    // self-baseline would make every linear contribution exactly zero
    assert(byRank.exists(r =>
      math.abs(r.getAs[Double]("contribution")) > 1e-9),
      "single-row FOR explain degenerated to a zero self-baseline")
    assert(rows.forall(_.getAs[Long]("o_orderkey") == key))
    // a model not trained through this runner cannot row-explain (an
    // unregistered one fails at load, a registered-but-foreign one at the
    // TrainSpec lookup)
    val e = intercept[IllegalArgumentException](runner.run(DmlParser.parse(
      "EXPLAIN PREDICTION ghost FOR ORDER o_orderkey = 1 SHOW TOP 2")))
    assert(e.getMessage.contains("no TrainSpec") ||
      e.getMessage.contains("model not found"))
    // a misspelled USING method errors instead of silently running a
    // different attribution than the one asked for
    val m = intercept[IllegalArgumentException](runner.run(DmlParser.parse(
      s"EXPLAIN PREDICTION runner_reg FOR ORDER o_orderkey = $key " +
        "USING kernal_shap SHOW TOP 2 features")))
    assert(m.getMessage.contains("unknown EXPLAIN method 'kernal_shap'"))
  }

  test("rollback scopes the version history to the resolved endpoint") {
    val (runner, registry, _) = freshRunner()
    runner.run(DmlParser.parse(trainDml))               // v1
    runner.run(DmlParser.parse(trainDml))               // v2
    registry.deploy("runner_clf", "ep_a", Some(1)); Thread.sleep(3)
    registry.deploy("runner_clf", "ep_a", Some(2)); Thread.sleep(3)
    registry.deploy("runner_clf", "ep_b", Some(1))
    // unscoped rollback resolves the LATEST endpoint (ep_b, serving v1):
    // its own history has nowhere to go — the old cross-endpoint scan
    // would have wrongly re-deployed ep_a's v2 onto ep_b
    val e = intercept[IllegalArgumentException](
      registry.rollback("runner_clf"))
    assert(e.getMessage.contains("no previous version"))
    // scoped to ep_a, the previous distinct version there is v1
    assert(registry.rollback("runner_clf", Some("ep_a")) == 1)
  }

  test("WHEN MODEL ... THEN retrain refits the stored spec as a new version") {
    val (runner, registry, bus) = freshRunner()
    runner.run(DmlParser.parse(trainDml))               // v1
    runner.run(DmlParser.parse(
      "WHEN MODEL runner_clf accuracy >= 0.0 THEN retrain"))
    assert(runner.checkModelRules() == Seq("retrain"))
    import org.apache.spark.sql.functions.{col, max}
    assert(registry.list().filter(col("name") === "runner_clf")
      .agg(max("version")).collect()(0).getInt(0) == 2)
    assert(bus.subscribe("model_retrained").count() == 1)
    // a model never trained through this runner cannot retrain
    runner.run(DmlParser.parse(
      "WHEN MODEL ghost_clf accuracy >= 0.0 THEN retrain"))
    val e = intercept[IllegalArgumentException](runner.checkModelRules())
    assert(e.getMessage.contains("model not found") ||
      e.getMessage.contains("no TrainSpec"))
  }

  test("traffic split records every arm; monitor fires drift alerts") {
    val (runner, registry, bus) = freshRunner()
    runner.run(DmlParser.parse(trainDml))
    runner.run(DmlParser.parse(
      "TRAIN MODEL runner_clf2 USING decision_tree(max_depth=3) " +
        "FROM orders PREDICT o_orderstatus " +
        "WITH FEATURES(o_totalprice, o_custkey)"))
    val ts = runner.run(DmlParser.parse(
      "DEPLOY MODELS (runner_clf, runner_clf2) TO ENDPOINT ab " +
        "WITH TRAFFIC SPLIT (70%, 30%)"))
    assert(ts.data.get.count() == 2)
    assert(registry.deployments().filter(col("endpoint") === "ab").count() == 2)

    runner.run(DmlParser.parse(
      "MONITOR MODEL runner_clf FOR drift_detection " +
        "ON features (o_totalprice) ALERT WHEN drift_score > 0.1"))
    val ref = spark.table("orders")
    val cur = ref.withColumn("o_totalprice", col("o_totalprice") * 10)
    val scores = runner.runMonitor("runner_clf", ref, cur)
    assert(scores("o_totalprice") > 0.1)
    assert(bus.subscribe("drift_alert").count() >= 1)
  }

  test("unknown model and unregistered monitor fail loudly") {
    val (runner, _, _) = freshRunner()
    val e1 = intercept[IllegalArgumentException] {
      runner.run(DmlParser.parse(
        "PREDICT USING MODEL ghost FROM orders STORE RESULTS IN out"))
    }
    assert(e1.getMessage.contains("model not found"))
    val e2 = intercept[IllegalArgumentException] {
      runner.runMonitor("ghost", spark.table("orders"), spark.table("orders"))
    }
    assert(e2.getMessage.contains("no monitor registered"))
    val e3 = intercept[IllegalArgumentException] {
      runner.run(DmlParser.parse(
        "EXPLAIN PREDICTION ghost SHOW TOP 2 features"))
    }
    assert(e3.getMessage.contains("model not found"))
  }

  test("traffic split surfaces the auto-promote policy") {
    val (runner, _, _) = freshRunner()
    runner.run(DmlParser.parse(trainDml))
    val r = runner.run(DmlParser.parse(
      "DEPLOY MODELS (runner_clf) TO ENDPOINT solo WITH TRAFFIC SPLIT (100%) " +
        "AUTO PROMOTE accuracy AFTER 500 samples"))
    val row = r.data.get.collect()(0)
    assert(row.getAs[String]("auto_promote") == "accuracy")
    assert(row.getAs[Long]("promote_after") == 500L)
  }

  test("two WHEN rules sharing an action are both counted") {
    val (runner, _, bus) = freshRunner()
    runner.run(DmlParser.parse(
      "PUBLISH EVENT 'a.x' WITH PAYLOAD {k: 1}"))
    runner.run(DmlParser.parse(
      "PUBLISH EVENT 'b.y' WITH PAYLOAD {k: 2}"))
    runner.run(DmlParser.parse("WHEN EVENT 'a.%' THEN notify"))
    runner.run(DmlParser.parse("WHEN EVENT 'b.%' THEN notify"))
    val fired = runner.dispatch(bus.subscribe("%"))
    assert(fired.values.sum == 2, s"expected both rules counted: $fired")
    assert(fired.size == 2)
  }

  test("non-exceedance ALERT WHEN conditions are rejected loudly") {
    val (runner, _, _) = freshRunner()
    runner.run(DmlParser.parse(trainDml))
    runner.run(DmlParser.parse(
      "MONITOR MODEL runner_clf FOR drift_detection " +
        "ON features (o_totalprice) ALERT WHEN accuracy < 0.8"))
    val e = intercept[IllegalArgumentException] {
      runner.runMonitor("runner_clf",
        spark.table("orders"), spark.table("orders"))
    }
    assert(e.getMessage.contains("ALERT WHEN"))
  }

  test("COMPUTE with a table kernel runs from DSL text alone") {
    val (runner, _, _) = freshRunner()
    // table resolution is by column match: `text` lives in documents
    try {
      val r = runner.run(DmlParser.parse(
        "COMPUTE dedup_pass FROM table(text) INTO column(dup_group) " +
          "USING minhash_dedup"))
      assert(r.kind == "compute" && r.summary.contains("documents"))
      val out = r.data.get
      assert(out.columns.contains("dup_group"))
      // fixture corpus has no exact dups: groups ⊆ own doc_id space and the
      // operator assigns every doc a group
      assert(out.count() == spark.table("documents").count())
    } finally graft.llm.PipelineCaches.clear()
  }

  test("feature transformer registers a queryable view") {
    val (runner, _, _) = freshRunner()
    val r = runner.run(DmlParser.parse(
      "CREATE FEATURE TRANSFORMER spend AS " +
        "SELECT o_custkey, SUM(o_totalprice) AS total FROM orders GROUP BY o_custkey"))
    assert(r.data.get.columns.toSeq == Seq("o_custkey", "total"))
    assert(spark.table("spend").count() > 0)
  }
}
