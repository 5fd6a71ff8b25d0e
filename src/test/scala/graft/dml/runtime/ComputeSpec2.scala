package graft.dml.runtime

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.dml.{ComputeSpec, DmlParser}

/** ml_register_compute runtime: one-shot kernels, custom registration, and
  * the EVERY-k-TICKS Structured Streaming scheduler. */
class ComputeSpec2 extends AnyFunSuite {

  private def spark = SparkTestSession.withTables()

  private def parse(text: String): ComputeSpec =
    DmlParser.parse(text).asInstanceOf[ComputeSpec]

  test("one-shot vector_add over lineitem") {
    val s = spark
    val spec = parse(
      "COMPUTE qsum FROM table(l_quantity, l_tax) INTO column(qsum) USING vector_add")
    val out = ComputeRegistry.runOnce(s, spec, "lineitem")
    assert(out.columns.contains("qsum"))
    val row = out.select(sum(abs(col("qsum") - (col("l_quantity") + col("l_tax")))))
      .collect()(0)
    assert(row.getDouble(0) == 0.0)
  }

  test("output column defaults to the job name") {
    val s = spark
    val spec = parse("COMPUTE risk FROM table(value) USING sigmoid")
    val out = ComputeRegistry.runOnce(s, spec, "events")
    assert(out.columns.contains("risk"))
  }

  test("custom kernel registration") {
    val s = spark
    ComputeRegistry.register("double_it", cols => cols.head * 2)
    val spec = parse(
      "COMPUTE d FROM table(l_quantity) INTO column(dq) USING double_it")
    val out = ComputeRegistry.runOnce(s, spec, "lineitem")
    val bad = out.filter(col("dq") =!= col("l_quantity") * 2).count()
    assert(bad == 0)
  }

  test("unknown kernel raises") {
    val s = spark
    val spec = parse("COMPUTE x FROM table(value) USING warp_drive")
    val e = intercept[IllegalArgumentException] {
      ComputeRegistry.runOnce(s, spec, "events")
    }
    assert(e.getMessage.contains("unknown kernel"))
  }

  test("missing inputs raises") {
    val s = spark
    val spec = parse("COMPUTE x USING vector_add")
    val e = intercept[IllegalArgumentException] {
      ComputeRegistry.runOnce(s, spec, "events")
    }
    assert(e.getMessage.contains("no input columns"))
  }

  test("EVERY k TICKS schedules a streaming query that refreshes the view") {
    val s = spark
    val spec = parse(
      "COMPUTE ticker FROM table(value) INTO column(scored) " +
        "EVERY 2 TICKS USING sigmoid")
    val q = ComputeRegistry.schedule(s, spec, "events", tickMs = 100L)
    try {
      // wait for at least one micro-batch to run the kernel
      val deadline = System.currentTimeMillis() + 15000
      var ok = false
      while (!ok && System.currentTimeMillis() < deadline) {
        Thread.sleep(200)
        ok = s.catalog.tableExists("ticker_out")
      }
      assert(ok, "tick scheduler never materialized ticker_out")
      assert(s.table("ticker_out").columns.contains("scored"))
      assert(q.isActive)
    } finally q.stop()
  }
}
