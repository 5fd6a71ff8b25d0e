package graft.dml

import org.scalatest.funsuite.AnyFunSuite

/** Parse + compile coverage for the extended (design-doc) statements:
  * DSL.md:57-72 deploy/predict, 123-143 WHEN, 318-351 ensemble / traffic
  * split / explain / monitor, AGENTS.md:40-52 pub/sub. */
class ExtendedStatementsSpec extends AnyFunSuite {

  test("PREDICT USING MODEL parses and compiles to ml_predict") {
    val s = DmlParser.parse(
      "PREDICT USING MODEL clv FROM new_customers " +
        "STORE RESULTS IN predictions WITH BATCH_SIZE 1000")
      .asInstanceOf[PredictSpec]
    assert(s == PredictSpec("clv", "new_customers", "predictions", Some(1000L)))
    assert(SqlCompiler.compileSql(s) ==
      "SELECT ml_predict(model_name := 'clv', input_table := 'new_customers', " +
        "output_table := 'predictions', batch_size := 1000)")
  }

  test("BATCH_SIZE must be positive") {
    val e = intercept[IllegalArgumentException] {
      DmlParser.parse(
        "PREDICT USING MODEL m FROM t STORE RESULTS IN r WITH BATCH_SIZE 0")
    }
    assert(e.getMessage.contains("BATCH_SIZE must be a positive integer"))
  }

  test("DEPLOY MODEL with configuration dict (single-quoted doc style)") {
    val s = DmlParser.parse(
      "DEPLOY MODEL clv TO ENDPOINT real_time_scoring " +
        "WITH CONFIGURATION {'max_latency': '50ms', 'scaling': 'auto'} " +
        "MONITOR drift_detection VERSION CONTROL enabled")
      .asInstanceOf[DeploySpec]
    assert(s.model == "clv" && s.endpoint == "real_time_scoring")
    assert(s.config.contains(List(
      "max_latency" -> Value.VStr("50ms"), "scaling" -> Value.VStr("auto"))))
    assert(s.monitor.contains("drift_detection"))
    assert(s.versionControl.contains("enabled"))
    assert(SqlCompiler.compileSql(s).startsWith(
      "SELECT ml_deploy_model(model_name := 'clv'"))
  }

  test("DEPLOY MODELS traffic split parses; must sum to 100") {
    val s = DmlParser.parse(
      "DEPLOY MODELS (model_a, model_b) TO ENDPOINT recs " +
        "WITH TRAFFIC SPLIT (50%, 50%) " +
        "AUTO PROMOTE best_performer AFTER 1000 samples")
      .asInstanceOf[TrafficSplitSpec]
    assert(s.models == List("model_a", "model_b") && s.splits == List(50L, 50L))
    assert(s.autoPromote.contains("best_performer") &&
      s.promoteAfter.contains(1000L))
    val e = intercept[IllegalArgumentException] {
      DmlParser.parse(
        "DEPLOY MODELS (a, b) TO ENDPOINT e WITH TRAFFIC SPLIT (60%, 50%)")
    }
    assert(e.getMessage.contains("traffic split must sum to 100"))
  }

  test("PUBLISH / SUBSCRIBE round-trip the AGENTS.md forms") {
    val p = DmlParser.parse(
      "PUBLISH EVENT 'model.trained' WITH PAYLOAD {model: fraud, accuracy: 0.97}")
      .asInstanceOf[PublishSpec]
    assert(p.eventType == "model.trained")
    assert(p.payload == List(
      "model" -> Value.VStr("fraud"), "accuracy" -> Value.VFloat(0.97)))
    val sub = DmlParser.parse(
      "SUBSCRIBE TO 'model.%' EXECUTE notify_team").asInstanceOf[SubscribeSpec]
    assert(sub == SubscribeSpec("model.%", Some("notify_team")))
    assert(SqlCompiler.compileSql(sub) ==
      "SELECT ml_subscribe(pattern := 'model.%', execute := 'notify_team')")
  }

  test("CREATE FEATURE TRANSFORMER captures the SELECT; rejects non-SELECT") {
    val t = DmlParser.parse(
      "CREATE FEATURE TRANSFORMER spenders AS " +
        "SELECT o_custkey, SUM(o_totalprice) AS spend FROM orders GROUP BY o_custkey")
      .asInstanceOf[TransformerSpec]
    assert(t.name == "spenders" && t.select.startsWith("SELECT o_custkey"))
    assert(SqlCompiler.compileSql(t).startsWith("CREATE VIEW \"spenders\" AS "))
    val e = intercept[IllegalArgumentException] {
      DmlParser.parse("CREATE FEATURE TRANSFORMER bad AS DELETE FROM orders")
    }
    assert(e.getMessage.contains("must be a SELECT query"))
  }

  test("CREATE ENSEMBLE parses weights and validates them") {
    val s = DmlParser.parse(
      "CREATE ENSEMBLE recs AS COMBINE MODELS " +
        "(collab WEIGHT 0.4, content WEIGHT 0.3, pop WEIGHT 0.3) " +
        "USING weighted_average VALIDATE ON holdout")
      .asInstanceOf[EnsembleSpec]
    assert(s.models == List("collab" -> 0.4, "content" -> 0.3, "pop" -> 0.3))
    assert(s.method == "weighted_average" && s.validateOn.contains("holdout"))
    val e = intercept[IllegalArgumentException] {
      DmlParser.parse(
        "CREATE ENSEMBLE bad AS COMBINE MODELS (m WEIGHT -1) USING weighted_average")
    }
    assert(e.getMessage.contains("weights must be positive"))
  }

  test("EXPLAIN PREDICTION with FOR/USING/SHOW TOP clauses") {
    val s = DmlParser.parse(
      "EXPLAIN PREDICTION fraud FOR TRANSACTION transaction_id = 12345 " +
        "USING shap_values SHOW TOP 5 features").asInstanceOf[ExplainSpec]
    assert(s.model == "fraud")
    assert(s.forClause.contains("TRANSACTION transaction_id = 12345"))
    assert(s.method.contains("shap_values") && s.topK.contains(5L))
    assert(SqlCompiler.compileSql(s) ==
      "SELECT feature_importance(model := 'fraud', " +
        "for_row := 'TRANSACTION transaction_id = 12345', " +
        "method := 'shap_values', top_k := 5)")
  }

  test("MONITOR MODEL with features, frequency, and alert") {
    val s = DmlParser.parse(
      "MONITOR MODEL churn FOR drift_detection ON features (age, tenure) " +
        "CHECK FREQUENCY daily ALERT WHEN drift_score > 0.3")
      .asInstanceOf[MonitorSpec]
    assert(s.model == "churn" && s.monitorFor == "drift_detection")
    assert(s.features == List("age", "tenure"))
    assert(s.frequency.contains("daily"))
    assert(s.alertWhen.contains("drift_score > 0.3"))
  }

  test("MONITOR MODEL parses the DSL.md headline with a chained AND type") {
    val s = DmlParser.parse(
      "MONITOR MODEL customer_churn " +
        "FOR drift_detection ON features (age, tenure, monthly_spend) " +
        "AND performance_degradation ON accuracy, f1_score " +
        "CHECK FREQUENCY daily").asInstanceOf[MonitorSpec]
    assert(s.monitorFor == "drift_detection")
    assert(s.features == List("age", "tenure", "monthly_spend"))
    assert(s.also ==
      List("performance_degradation" -> List("accuracy", "f1_score")))
    assert(s.frequency.contains("daily"))
  }

  test("WHEN EVENT and WHEN MODEL capture condition and action") {
    val e = DmlParser.parse(
      "WHEN EVENT 'data.drift_detected' " +
        "WHERE payload->>'model_name' = 'recs' THEN retrain_workflow")
      .asInstanceOf[WhenSpec]
    assert(e.trigger == "event:data.drift_detected")
    assert(e.condition.contains("payload->>'model_name' = 'recs'"))
    assert(e.action == "retrain_workflow")
    val m = DmlParser.parse(
      "WHEN MODEL fraud ACCURACY > 0.95 THEN DEPLOY TO production")
      .asInstanceOf[WhenSpec]
    assert(m.trigger == "model:fraud")
    assert(m.condition.contains("ACCURACY > 0.95"))
    assert(m.action == "DEPLOY TO production")
  }

  test("AFTER n SAMPLES accepts both keyword casings") {
    val s = DmlParser.parse(
      "DEPLOY MODELS (a, b) TO ENDPOINT e WITH TRAFFIC SPLIT (50%, 50%) " +
        "AUTO PROMOTE best AFTER 1000 SAMPLES").asInstanceOf[TrafficSplitSpec]
    assert(s.promoteAfter.contains(1000L))
  }

  test("transformer compile path rejects comments like the runtime path") {
    val t = DmlParser.parse(
      "CREATE FEATURE TRANSFORMER t AS SELECT a FROM orders WHERE a > 1 -- x")
      .asInstanceOf[TransformerSpec]
    val e = intercept[IllegalArgumentException](SqlCompiler.compileSql(t))
    assert(e.getMessage.contains("terminators or comments"))
  }

  test("json.dumps spells non-finite floats NaN/Infinity") {
    assert(PyJson.dumps(Value.VFloat(Double.NaN)) == "NaN")
    assert(PyJson.dumps(Value.VFloat(Double.PositiveInfinity)) == "Infinity")
    assert(PyJson.dumps(Value.VFloat(Double.NegativeInfinity)) == "-Infinity")
    // repr()-style contexts keep the lowercase spellings
    assert(Value.pyFloatRepr(Double.NaN) == "nan")
  }

  test("unknown statement keyword still raises ParseException") {
    assertThrows[ParseException] {
      DmlParser.parse("FROBNICATE MODEL x")
    }
  }
}
