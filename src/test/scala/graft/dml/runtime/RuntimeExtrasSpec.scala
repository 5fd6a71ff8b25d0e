package graft.dml.runtime

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.dml.{DmlParser, TrainSpec}
import graft.dml.events.EventBus

/** Feature transformers (S5), watermarked streaming metrics, the remaining
  * algorithm paths (neural_network layers, GBT binary), and the flagship
  * entry. */
class RuntimeExtrasSpec extends AnyFunSuite {

  private def spark = SparkTestSession.withTables()

  test("feature transformer registers a reusable view (S5)") {
    val s = spark
    FeatureTransformers.create(s, "customer_features",
      "SELECT c_custkey, c_acctbal / 1000 AS acctbal_k FROM customer")
    val df = FeatureTransformers(s, "customer_features")
    assert(df.columns.toSeq == Seq("c_custkey", "acctbal_k"))
    assert(df.count() == s.table("customer").count())
    // usable as a TRAIN source like any relation
    val spec = DmlParser.parse(
      "TRAIN MODEL ft_model USING linear_regression(max_iter=5) " +
        "FROM customer_features PREDICT acctbal_k WITH FEATURES(c_custkey)")
      .asInstanceOf[TrainSpec]
    assert(Trainer.train(s, spec).metrics.contains("rmse"))
  }

  test("feature transformer rejects non-SELECT and unsafe text") {
    val s = spark
    intercept[IllegalArgumentException] {
      FeatureTransformers.create(s, "bad", "DROP TABLE customer")
    }
    intercept[IllegalArgumentException] {
      FeatureTransformers.create(s, "bad", "SELECT 1; DROP TABLE customer")
    }
    intercept[IllegalArgumentException] {
      FeatureTransformers.create(s, "bad", "SELECT * FROM customer -- sneak")
    }
  }

  test("watermarked streaming windowed metrics over the event log") {
    val s = spark
    val dir = Files.createTempDirectory("graft-wm-events").toString
    val ckpt = Files.createTempDirectory("graft-wm-ckpt").toString
    // seed the log from the fixture events table
    s.table("events").write.mode("append").parquet(dir)
    val bus = new EventBus(s, dir)
    val q = bus.windowedMetricsStream("1 hour", "2 hours")
      .writeStream.format("memory").queryName("wm_metrics")
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    // append mode emits only windows closed by the watermark — all but the
    // final in-flight window of the fixture range
    val rows = s.table("wm_metrics")
    assert(rows.columns.toSeq ==
      Seq("window_start", "event_type", "n", "value_sum"))
    assert(rows.count() > 0)
  }

  test("neural_network builds layer spec from features and classes") {
    val spec = DmlParser.parse(
      "TRAIN MODEL nn USING neural_network(layers=[6], max_iter=15) " +
        "FROM lineitem PREDICT l_returnflag " +
        "WITH FEATURES(l_quantity, l_discount, l_tax)")
      .asInstanceOf[TrainSpec]
    val r = Trainer.train(spark, spec)
    assert(r.metrics.contains("accuracy"))
  }

  test("gradient boosting on a binary derived target") {
    val s = spark
    // binary target via a feature transformer (GBTClassifier is binary-only)
    FeatureTransformers.create(s, "li_binary",
      "SELECT l_quantity, l_discount, " +
        "CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS is_returned " +
        "FROM lineitem")
    val spec = DmlParser.parse(
      "TRAIN MODEL gbt USING gradient_boosting(n_estimators=5, max_depth=3) " +
        "FROM li_binary PREDICT is_returned " +
        "WITH FEATURES(l_quantity, l_discount)")
      .asInstanceOf[TrainSpec]
    val r = Trainer.train(s, spec)
    assert(r.metrics.contains("accuracy"))
    assert(r.metrics.contains("auc"))
  }

  test("string-typed features go through StringIndexer") {
    val spec = DmlParser.parse(
      "TRAIN MODEL strfeat USING decision_tree(max_depth=3) FROM lineitem " +
        "PREDICT l_linestatus WITH FEATURES(l_returnflag, l_quantity)")
      .asInstanceOf[TrainSpec]
    val r = Trainer.train(spark, spec)
    assert(r.metrics.contains("accuracy"))
    assert(r.model.stages.exists(
      _.isInstanceOf[org.apache.spark.ml.feature.StringIndexerModel]))
  }

  test("time-series lag features and forecast regression") {
    val s = spark
    val lagged = TimeSeries.lagFeatures(
      s.table("events"), "user_id", "ts", "value", Seq(1, 2), "event_id")
    assert(lagged.columns.contains("value_lag_1"))
    assert(lagged.columns.contains("value_lag_2"))
    // first event per user has null lag
    val firsts = TimeSeries.timeIndex(lagged, "user_id", "ts", "event_id")
      .filter(col("t_index") === 1.0)
    assert(firsts.filter(col("value_lag_1").isNotNull).count() == 0)
    // lag-feature regression (the prophet stand-in): train on lagged values
    lagged.na.drop().createOrReplaceTempView("events_lagged")
    val spec = DmlParser.parse(
      "TRAIN MODEL forecast USING prophet(max_iter=10) FROM events_lagged " +
        "PREDICT value WITH FEATURES(value_lag_1, value_lag_2)")
      .asInstanceOf[TrainSpec]
    val r = Trainer.train(s, spec)
    assert(r.metrics.contains("rmse"))
  }

  test("anomalyFlags flags a planted spike and stays silent on constant " +
    "series") {
    val s = spark
    import s.implicits._
    val base = (1L to 40L).map(i =>
      (i, 1L, new java.sql.Timestamp(i * 60000L),
        if (i == 30L) 500.0 else 10.0 + (i % 3))) ++
      (1L to 30L).map(i =>
        (100L + i, 2L, new java.sql.Timestamp(i * 60000L), 7.0))
    val df = base.toDF("event_id", "user_id", "ts", "value")
    val out = TimeSeries.anomalyFlags(df, "user_id", "ts", "value",
      n = 20, z = 2.5, tiebreak = "event_id").collect()
      .map(r => r.getLong(0) -> ((r.getBoolean(5), r.isNullAt(4)))).toMap
    assert(out(30L)._1, "the planted spike must be flagged")
    // the spike is the only anomaly in user 1's series
    assert((1L to 40L).count(id => out(id)._1) == 1)
    // constant series: zero variance => NULL z, nothing flagged
    (101L to 130L).foreach { id =>
      assert(out(id)._2 && !out(id)._1, s"constant series row $id")
    }
  }

  test("gen_random_uuid maps to uuid()") {
    val s = spark
    val ids = s.sql("SELECT uuid() AS id FROM range(10)").collect()
      .map(_.getString(0))
    assert(ids.distinct.length == 10)
    assert(ids.forall(_.matches(
      "[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}")))
  }

  test("tfidf_logreg trains a text pipeline on documents") {
    val spec = DmlParser.parse(
      "TRAIN MODEL lang_clf USING tfidf_logreg(max_iter=10) FROM documents " +
        "PREDICT lang WITH FEATURES(text)")
      .asInstanceOf[TrainSpec]
    val r = Trainer.train(spark, spec)
    assert(r.metrics.contains("accuracy"))
    val stageNames = r.model.stages.map(_.getClass.getSimpleName).toSeq
    assert(stageNames.contains("Tokenizer"))
    assert(stageNames.contains("IDFModel"))
  }

  test("early-stop agent halts on metric plateau") {
    val s = spark
    val spec = DmlParser.parse(
      "TRAIN MODEL es_model USING logistic_regression FROM lineitem " +
        "PREDICT l_returnflag WITH FEATURES(l_quantity, l_discount)")
      .asInstanceOf[TrainSpec]
    val (report, epochs) = graft.dml.events.Agents.earlyStopTrain(
      s, spec, metric = "accuracy", patience = 2, chunk = 5, maxChunks = 8)
    assert(report != null)
    // synthetic labels plateau immediately: patience must trigger before
    // the chunk budget is exhausted
    assert(epochs < 5 * 8, s"early stop never triggered (epochs=$epochs)")
    assert(report.metrics.contains("accuracy"))
  }

  test("IVF ANN recalls against the brute-force baseline") {
    val s = spark
    val e = s.table("embeddings")
    val qids = Seq(0L, 1L, 2L)
    val exact = graft.llm.Similarity.bruteForceTopK(e, qids, k = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = graft.llm.Similarity.ivfTopK(e, qids, k = 10,
      nLists = 8, nProbe = 4).collect()
    assert(ivf.nonEmpty)
    val approx = ivf.map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.2, s"IVF recall $recall too low")
  }

  test("IVF index builds once and serves several query batches identically") {
    val s = spark
    val e = s.table("embeddings")
    val index = graft.llm.Similarity.buildIvfIndex(e, nLists = 8)
    try {
      def q(ids: Seq[Long]) = e.filter(col("vec_id").isInCollection(ids))
      val viaIndex = graft.llm.Similarity.searchIvf(index, q(Seq(0L, 1L)),
        k = 10, nProbe = 4).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      // a second batch on the SAME index (no re-fit, no re-assign)
      val second = graft.llm.Similarity.searchIvf(index, q(Seq(2L)),
        k = 10, nProbe = 4).collect()
      assert(second.nonEmpty && second.forall(_.getLong(0) == 2L))
      // one-shot path = build + search composed, so results agree exactly
      val oneShot = graft.llm.Similarity.ivfTopK(e, Seq(0L, 1L), k = 10,
        nLists = 8, nProbe = 4).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(viaIndex == oneShot)
    } finally index.release()
  }

  test("searchIvf's shuffle-join path matches the broadcast path") {
    val s = spark
    val e = s.table("embeddings")
    val index = graft.llm.Similarity
      .buildIvfIndexSeeded(e, (1 to 8).map(_ * 5L))
    try {
      val q = e.filter(col("vec_id").isInCollection(Seq(0L, 1L, 2L)))
      def run(bc: Boolean) = graft.llm.Similarity
        .searchIvf(index, q, k = 10, nProbe = 4, broadcastQueries = bc)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .toSet
      // corpus-sized query sets take broadcastQueries = false — results
      // must be identical, only the join strategy differs
      assert(run(bc = true) == run(bc = false))
    } finally index.release()
  }

  test("a saved IVF index reloads and searches identically") {
    val s = spark
    val e = s.table("embeddings")
    val seeds = (1 to 8).map(_ * 5L)
    val index = graft.llm.Similarity.buildIvfIndexSeeded(e, seeds)
    val dir = java.nio.file.Files
      .createTempDirectory("graft-ivf").toString + "/index"
    try {
      graft.llm.Similarity.saveIvfIndex(index, dir)
      val reloaded = graft.llm.Similarity.loadIvfIndex(s, dir)
      try {
        def hits(ix: graft.llm.Similarity.IvfIndex) =
          graft.llm.Similarity.searchIvf(ix,
            e.filter(col("vec_id").isInCollection(Seq(0L, 1L))), k = 10)
            .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
            .toSet
        assert(reloaded.centers.map(_.toSeq).toSeq ==
          index.centers.map(_.toSeq).toSeq)
        assert(hits(reloaded) == hits(index))
      } finally reloaded.release()
    } finally index.release()
  }

  test("external query vectors search without id-collision exclusion") {
    val s = spark
    import s.implicits._
    val e = s.table("embeddings")
    val index = graft.llm.Similarity.buildIvfIndex(e, nLists = 8)
    try {
      // external queries numbered 0..1: ids collide with corpus vec_ids
      // but are UNRELATED vectors; corpus vectors 0 and 1 must remain
      // eligible results
      val ext = e.filter(col("vec_id").isInCollection(Seq(7L, 8L)))
        .select((col("vec_id") - 7L).as("vec_id"), col("embedding"))
      val hits = graft.llm.Similarity
        .searchIvf(index, ext, k = 10, nProbe = 8, excludeQueryIds = false)
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      // query q is corpus vector q+7: its own corpus row is the 1.0-cosine
      // top hit, and must NOT have been excluded by the id filter
      assert(hits.filter(_._1 == 0L).map(_._2).contains(7L))
      assert(hits.filter(_._1 == 1L).map(_._2).contains(8L))
    } finally index.release()
  }

  test("embedding classifier: array feature column becomes the vector") {
    val spec = DmlParser.parse(
      "TRAIN MODEL emb_clf USING logistic_regression(max_iter=15) " +
        "FROM embeddings PREDICT label WITH FEATURES(embedding)")
      .asInstanceOf[TrainSpec]
    val r = Trainer.train(spark, spec)
    assert(r.metrics.contains("accuracy"))
    // 10-class random embeddings: just assert a valid fitted pipeline
    assert(r.metrics("accuracy") >= 0.0 && r.metrics("accuracy") <= 1.0)
  }

  test("flagship entry returns scored rows") {
    val scored = graft.SparkEntry.entry(spark)
    assert(scored.count() > 0)
    assert(scored.columns.contains("prediction"))
    assert(scored.filter(col("prediction").isNull).count() == 0)
  }
}
