package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

import graft.Tables
import graft.dml.{ComputeSpec, DmlParser}
import graft.dml.runtime.ComputeRegistry

/** Driver-gate entries for the COMPUTE path: parse the statement, resolve
  * the kernel, apply it one-shot over a fixture table. Kernels here use only
  * IEEE-exact ops (+ - * / greatest/least) so DuckDB reproduces them
  * bit-for-bit. Plans are pure projections over the scan — no shuffle.
  */
object ComputeQueries {

  private def run(
      s: SparkSession, dir: String, dsl: String, table: String,
      project: Seq[String]): DataFrame = {
    Tables.register(s, dir)
    val spec = DmlParser.parse(dsl).asInstanceOf[ComputeSpec]
    ComputeRegistry.runOnce(s, spec, table).select(project.map(col): _*)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // vector_add over lineitem quantity+tax (the README.md:70 example shape)
    "q_compute_vector_add" -> { (s, dir) =>
      run(s, dir,
        "COMPUTE qty_plus_tax FROM table(l_quantity, l_tax) " +
          "INTO column(qsum) USING vector_add BLOCK 256 GRID auto",
        "lineitem",
        Seq("l_orderkey", "l_linenumber", "qsum"))
    },

    // custom-registered kernel: max(x - 0.05, 0) — branch-free, codegen'd
    "q_compute_relu" -> { (s, dir) =>
      ComputeRegistry.register("relu_shift",
        cols => org.apache.spark.sql.functions.greatest(
          cols.head - 0.05, org.apache.spark.sql.functions.lit(0.0)))
      run(s, dir,
        "COMPUTE disc_over FROM table(l_discount) INTO column(relu_disc) " +
          "USING relu_shift",
        "lineitem",
        Seq("l_orderkey", "l_linenumber", "relu_disc"))
    },

    // immune_scan (bounded mean) over events value + user_id parity signals
    "q_compute_immune_scan" -> { (s, dir) =>
      run(s, dir,
        "COMPUTE risk FROM table(value, value) INTO column(risk_score) " +
          "USING immune_scan SHARED 1K",
        "events",
        Seq("event_id", "risk_score"))
    })

  def oracles: Map[String, String] = Map(
    "q_compute_vector_add" ->
      """SELECT l_orderkey, l_linenumber, l_quantity + l_tax AS qsum
        |FROM lineitem""".stripMargin,

    "q_compute_relu" ->
      """SELECT l_orderkey, l_linenumber,
        |       greatest(l_discount - 0.05, 0.0) AS relu_disc
        |FROM lineitem""".stripMargin,

    "q_compute_immune_scan" ->
      """SELECT event_id,
        |       least(greatest((value + value) / 2, 0), 1) AS risk_score
        |FROM events""".stripMargin)

  def verifySort: Map[String, Seq[String]] = Map(
    "q_compute_vector_add" -> Seq("l_orderkey", "l_linenumber"),
    "q_compute_relu" -> Seq("l_orderkey", "l_linenumber"),
    "q_compute_immune_scan" -> Seq("event_id"))
}
