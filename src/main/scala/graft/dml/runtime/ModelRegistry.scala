package graft.dml.runtime

import java.nio.file.{Files, Paths}

import org.apache.spark.ml.PipelineModel
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.dml.{PyJson, Value}

/** Model registry — the `ml_model` composite of the reference
  * (reference/DSL.md:179-188: name, algorithm, version, features, target,
  * performance_metrics JSONB, training_config JSONB, created_at), persisted
  * as a parquet table beside the saved PipelineModels.
  *
  * Layout: `basePath/registry` (parquet, append-only) and
  * `basePath/models/<name>/v<version>` (PipelineModel.save).
  */
final class ModelRegistry(spark: SparkSession, basePath: String) {
  import spark.implicits._

  private val registryPath = s"$basePath/registry"
  private def modelPath(name: String, version: Int) =
    s"$basePath/models/$name/v$version"

  def list(): DataFrame =
    if (Files.exists(Paths.get(registryPath)))
      spark.read.parquet(registryPath)
    else
      Seq.empty[(String, String, Int, Seq[String], String, String, String, Long)]
        .toDF("name", "algorithm", "version", "features", "target",
          "metrics_json", "config_json", "created_at_ms")

  def nextVersion(name: String): Int = {
    val cur = list().filter($"name" === name)
      .agg(max($"version")).collect()(0)
    if (cur.isNullAt(0)) 1 else cur.getInt(0) + 1
  }

  /** Persist the fitted model and append its registry row; returns the
    * assigned version. */
  def register(report: Trainer.TrainReport): Int = {
    val spec = report.spec
    val version = nextVersion(spec.name)
    report.model.write.overwrite().save(modelPath(spec.name, version))
    val metricsJson = PyJson.dumps(
      report.metrics.toList.sortBy(_._1).map { case (k, v) => k -> Value.VFloat(v) })
    val configJson = PyJson.dumps(spec.params)
    val row = Seq((spec.name, spec.algorithm, version, spec.features,
      spec.target, metricsJson, configJson, System.currentTimeMillis()))
      .toDF("name", "algorithm", "version", "features", "target",
        "metrics_json", "config_json", "created_at_ms")
    row.write.mode("append").parquet(registryPath)
    version
  }

  def load(name: String, version: Option[Int] = None): PipelineModel = {
    val v = version.getOrElse {
      val cur = list().filter($"name" === name).agg(max($"version")).collect()(0)
      if (cur.isNullAt(0))
        throw new IllegalArgumentException(s"model not found: $name")
      cur.getInt(0)
    }
    PipelineModel.load(modelPath(name, v))
  }

  /** DEPLOY MODEL … (S3): mark a version as the serving endpoint — a
    * registry-status flip; serving itself is `model.transform` over a
    * stream (SURVEY §2.1 S3). */
  def deploy(name: String, endpoint: String, version: Option[Int] = None): Unit = {
    val v = version.getOrElse(nextVersion(name) - 1)
    if (v < 1) throw new IllegalArgumentException(s"model not found: $name")
    Seq((name, endpoint, v, System.currentTimeMillis()))
      .toDF("name", "endpoint", "version", "deployed_at_ms")
      .write.mode("append").parquet(s"$basePath/deployments")
  }

  /** `WHEN MODEL … THEN rollback` (S6 reactive block, reference
    * DSL.md:136-142): re-deploy the most recent PREVIOUS distinct version
    * on the model's endpoint. Append-only like [[deploy]], so the full
    * deployment history — including the rollback itself — stays
    * auditable. Returns the version rolled back to. */
  def rollback(name: String, endpoint: Option[String] = None): Int = {
    import spark.implicits._
    val deps = deployments().filter($"name" === name)
    val scoped = endpoint.fold(deps)(e => deps.filter($"endpoint" === e))
    val latest = scoped.orderBy($"deployed_at_ms".desc, $"version".desc)
      .select("endpoint").limit(1).collect()
    if (latest.isEmpty)
      throw new IllegalArgumentException(s"no deployments for model: $name")
    val ep = latest.head.getString(0)
    // scope the history to the RESOLVED endpoint before picking the
    // previous version: with endpoint=None on a model serving several
    // endpoints, "previous distinct version" must come from the endpoint
    // being rolled back, not from an interleaved cross-endpoint history
    val hist = deps.filter($"endpoint" === ep)
      .orderBy($"deployed_at_ms".desc, $"version".desc)
      .select("version").collect().map(_.getInt(0))
    val cur = hist.head
    // previous distinct deployment on this endpoint if one exists
    // (kubectl-style toggle on repeated rollback); else the registry's
    // prior version — versions are assigned sequentially, so v(cur−1)
    // exists whenever cur > 1
    val prev = hist.iterator.drop(1).find(_ != cur)
      .orElse(if (cur > 1) Some(cur - 1) else None)
      .getOrElse(throw new IllegalArgumentException(
        s"no previous version to roll back to for: $name"))
    deploy(name, ep, Some(prev))
    prev
  }

  def deployments(): DataFrame =
    if (Files.exists(Paths.get(s"$basePath/deployments")))
      spark.read.parquet(s"$basePath/deployments")
    else Seq.empty[(String, String, Int, Long)]
      .toDF("name", "endpoint", "version", "deployed_at_ms")

  /** PREDICT USING MODEL m FROM t STORE RESULTS IN r (S4). */
  def predict(name: String, fromTable: String, storeIn: String): DataFrame = {
    val out = load(name).transform(spark.table(fromTable))
    out.createOrReplaceTempView(storeIn)
    out
  }
}
