package graft.dml

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Spark-side feature compilation (§2.4 F1-F8 + §2.5 function mappings):
  * Column semantics pinned against scala.math ground truth. */
class FeatureCompilerSpec extends AnyFunSuite {

  private def spark = SparkTestSession.withTables()

  private def eval(feature: String): Any = {
    val s = spark
    s.table("lineitem").limit(1)
      .select(FeatureCompiler.compile(feature).as("v"))
      .head().get(0)
  }

  test("arithmetic precedence and grouping match scala semantics") {
    val s = spark
    val row = s.table("lineitem")
      .select(col("l_quantity"), col("l_tax"),
        FeatureCompiler.compile("l_quantity + l_tax * 2").as("a"),
        FeatureCompiler.compile("(l_quantity + l_tax) * 2").as("b"),
        FeatureCompiler.compile("-l_quantity").as("c"))
      .head()
    val (q, t) = (row.getDouble(0), row.getDouble(1))
    assert(row.getDouble(2) == q + t * 2)
    assert(row.getDouble(3) == (q + t) * 2)
    assert(row.getDouble(4) == -q)
  }

  test("log is natural log; sqrt/abs exact") {
    val s = spark
    val row = s.table("lineitem")
      .select(col("l_extendedprice"),
        FeatureCompiler.compile("log(l_extendedprice + 1)").as("ln"),
        FeatureCompiler.compile("sqrt(l_extendedprice)").as("sq"))
      .head()
    val x = row.getDouble(0)
    assert(row.getDouble(1) == math.log(x + 1))
    assert(row.getDouble(2) == math.sqrt(x))
  }

  test("DAYS_BETWEEN maps to datediff; CURRENT_DATE/NOW are functions") {
    val s = spark
    val row = s.table("lineitem")
      .select(
        FeatureCompiler.compile("DAYS_BETWEEN(l_shipdate, l_shipdate)").as("d0"),
        FeatureCompiler.compile("DAYS_BETWEEN(CURRENT_DATE, l_shipdate)").as("age"))
      .head()
    assert(row.getInt(0) == 0)
    assert(row.getInt(1) > 0) // fixture dates are all in the past
  }

  test("gen_random_uuid maps to uuid") {
    val v = eval("gen_random_uuid()")
    assert(v.toString.matches(
      "[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}"))
  }

  test("array family mappings (§2.5): append/replace/intersect") {
    val s = spark
    // array_append → array_union/concat; array_replace → transform+when;
    // array_intersect is a builtin
    val row = s.sql(
      """SELECT
        |  concat(array(1, 2), array(3)) AS appended,
        |  transform(array(1, 2, 1), x -> CASE WHEN x = 1 THEN 9 ELSE x END) AS replaced,
        |  array_intersect(array(1, 2, 3), array(2, 3, 4)) AS intersected
        |""".stripMargin).head()
    assert(row.getSeq[Int](0) == Seq(1, 2, 3))
    assert(row.getSeq[Int](1) == Seq(9, 2, 9))
    assert(row.getSeq[Int](2) == Seq(2, 3))
  }

  test("unknown function surfaces a resolution error") {
    val e = intercept[Exception] { eval("definitely_not_a_function(l_tax)") }
    assert(e.getMessage.toUpperCase.contains("UNRESOLVED_ROUTINE")
      || e.getMessage.contains("definitely_not_a_function"))
  }
}
