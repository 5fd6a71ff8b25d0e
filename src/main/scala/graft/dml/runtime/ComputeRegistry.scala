package graft.dml.runtime

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.dml.ComputeSpec

/** `ml_register_compute` runtime (SURVEY §2.6): named kernels applied as
  * Column expressions over a relation — one-shot via withColumn, or
  * tick-scheduled via Structured Streaming (reference parser.py:43-58,
  * EXTENSIONS.md:99-112).
  *
  * Kernels are `Seq[Column] => Column`, so every builtin stays inside
  * whole-stage codegen — no UDFs, no per-row JVM dispatch. CUDA launch
  * params (BLOCK/GRID/SHARED) have no Spark analog and are retained as
  * metadata only (SURVEY §2.1 S2).
  */
object ComputeRegistry {

  type Kernel = Seq[Column] => Column

  private val kernels = new ConcurrentHashMap[String, Kernel]()

  /** Deterministic, codegen-friendly builtins. */
  private val builtins: Map[String, Kernel] = Map(
    "vector_add" -> (cols => cols.reduce(_ + _)),
    "vector_sub" -> (cols => cols.reduce(_ - _)),
    "vector_mul" -> (cols => cols.reduce(_ * _)),
    "vector_avg" -> (cols => cols.reduce(_ + _) / lit(cols.size)),
    "relu" -> (cols => greatest(cols.head, lit(0))),
    "clip01" -> (cols => least(greatest(cols.head, lit(0)), lit(1))),
    "sigmoid" -> (cols => lit(1.0) / (lit(1.0) + exp(-cols.head))),
    "log1p_abs" -> (cols => log1p(abs(cols.head))),
    // reference's COMPUTE example kernel (README.md:70-73): a bounded
    // risk score over the input signals
    "immune_scan" -> (cols =>
      least(greatest(cols.reduce(_ + _) / lit(cols.size), lit(0)), lit(1))))

  builtins.foreach { case (k, v) => kernels.put(k, v) }

  def register(name: String, kernel: Kernel): Unit = kernels.put(name, kernel)

  def resolve(name: String): Kernel = {
    val k = kernels.get(name)
    if (k == null)
      throw new IllegalArgumentException(s"unknown kernel: $name")
    k
  }

  def known: Set[String] = {
    val it = kernels.keys()
    var s = Set.empty[String]
    while (it.hasMoreElements) s += it.nextElement()
    s
  }

  /** One-shot application: append `output` (default: job name) computed by
    * the kernel over the input columns. Pure projection — no shuffle. */
  def apply(df: DataFrame, spec: ComputeSpec): DataFrame = {
    val kernel = resolve(spec.kernel)
    val inputs = spec.inputs.getOrElse(
      throw new IllegalArgumentException(
        s"compute '${spec.name}' has no input columns (FROM table(...))"))
    df.withColumn(spec.output.getOrElse(spec.name), kernel(inputs.map(col)))
  }

  /** Run a registered compute against a temp view / table by name. */
  def runOnce(spark: SparkSession, spec: ComputeSpec, table: String): DataFrame =
    apply(spark.table(table), spec)

  /** `EVERY k TICKS` (SURVEY §2.7): a Structured Streaming query that
    * re-applies the kernel to the current snapshot of `table` every
    * k × tickMs, appending results to an in-memory sink named
    * `<name>_out`. The rate source is only the metronome; the kernel runs
    * over the (batch) relation inside foreachBatch, which is the
    * micro-batch pattern the reference's tick scheduler describes.
    */
  def schedule(
      spark: SparkSession,
      spec: ComputeSpec,
      table: String,
      tickMs: Long = 100L): StreamingQuery = {
    val ticks = spec.scheduleTicks.getOrElse(
      throw new IllegalArgumentException(
        s"compute '${spec.name}' has no EVERY k TICKS schedule"))
    val interval = ticks * tickMs
    spark.readStream.format("rate").option("rowsPerSecond", 1).load()
      .writeStream
      .trigger(Trigger.ProcessingTime(interval))
      .queryName(s"${spec.name}_ticker")
      .foreachBatch { (_: DataFrame, batchId: Long) =>
        val out = runOnce(spark, spec, table)
        out.createOrReplaceTempView(s"${spec.name}_out")
        ()
      }
      .start()
  }
}
