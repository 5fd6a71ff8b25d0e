package graft.dml

import java.util.regex.Pattern

import org.scalatest.funsuite.AnyFunSuite

import Value._

object CompileSqlSpec {
  /** Port of test_parser.py:13-22 — extract `name := value` from emitted SQL. */
  def extractNamedArg(sql: String, argName: String): String = {
    val p = Pattern.compile(
      "(?<![A-Za-z0-9_])" + Pattern.quote(argName) + "(?![A-Za-z0-9_])\\s*:=\\s*" +
        "(ARRAY\\[(?:.|\\n)*?\\]|'(?:''|[^'])*'|-?\\d+(?:\\.\\d+)?)\\s*(?:,|\\))")
    val m = p.matcher(sql)
    if (!m.find()) throw new AssertionError(s"Argument '$argName' not found in SQL: $sql")
    m.group(1)
  }

  /** Port of test_parser.py:25-28. */
  def decodeSqlStringLiteral(value: String): String = {
    assert(value.length >= 2 && value.head == '\'' && value.last == '\'',
      s"Expected SQL string literal, got: $value")
    value.substring(1, value.length - 1).replace("''", "'")
  }
}

/** Port of the compile-contract cases in test_parser.py (80-118, 229-278,
  * 517-749). */
class CompileSqlSpec extends AnyFunSuite {
  import CompileSqlSpec._

  private def spec(
      source: String = "source_table",
      target: String = "target_col",
      features: List[String] = List("a"),
      sourceIsIdentifier: Boolean = true): TrainSpec =
    TrainSpec(name = "m", algorithm = "alg", params = Nil, source = source,
      target = target, features = features,
      sourceIsIdentifier = sourceIsIdentifier)

  test("compile_sql_uses_identifier_mode_for_simple_source") {
    val sql = SqlCompiler.compileSql(spec(source = "transactions", target = "y"))
    assert(sql.contains("FROM \"transactions\""))
  }

  test("compile_sql_uses_fragment_mode_for_dotted_source") {
    val sql = SqlCompiler.compileSql(
      spec(source = "analytics.transactions", target = "y",
        sourceIsIdentifier = false))
    assert(sql.contains("FROM analytics.transactions"))
    assert(!sql.contains("FROM \"analytics.transactions\""))
  }

  test("compile_sql_uses_fragment_mode_for_quoted_source") {
    val sql = SqlCompiler.compileSql(
      spec(source = "\"Transactions\"", target = "y", sourceIsIdentifier = false))
    assert(sql.contains("FROM \"Transactions\""))
  }

  test("compile_sql_with_feature_expressions") {
    val sql = SqlCompiler.compileSql(spec(features = List(
      "amount",
      "DERIVED(amount * exchange_rate)",
      "TRANSFORM(scale(log(amount + 1)))")))
    assert(sql.contains("\"amount\""))
    assert(sql.contains("\"DERIVED\"((\"amount\" * \"exchange_rate\"))"))
    assert(sql.contains("\"TRANSFORM\"(\"scale\"(\"log\"((\"amount\" + 1))))"))
  }

  test("compile_sql_with_dotted_identifier") {
    val sql = SqlCompiler.compileSql(spec(features = List("amount", "customer.age")))
    val trainingQuery = decodeSqlStringLiteral(extractNamedArg(sql, "training_data"))
    assert(trainingQuery.contains("\"amount\""))
    assert(trainingQuery.contains("\"customer\".\"age\""))
  }

  test("compile_sql_with_operator_expression") {
    val sql = SqlCompiler.compileSql(spec(features = List("amount", "amount + tax")))
    val trainingQuery = decodeSqlStringLiteral(extractNamedArg(sql, "training_data"))
    assert(trainingQuery.contains("\"amount\""))
    assert(trainingQuery.contains("(\"amount\" + \"tax\")"))
    assert(!trainingQuery.contains("\"amount + tax\""))
  }

  test("training_query_appends_target_last") {
    val q = SqlCompiler.trainingQuery(
      spec(features = List("a", "b"), target = "y", source = "t"))
    assert(q == "SELECT \"a\", \"b\", \"y\" FROM \"t\"")
  }

  test("compile_sql_escapes_identifiers") {
    assertThrows[IllegalArgumentException] {
      SqlCompiler.compileSql(spec(
        source = "weird;table", target = "tar;get", features = List("fe;ature")))
    }
  }

  test("compile_sql_quotes_single_table_with_punctuation") {
    val sql = SqlCompiler.compileSql(spec(
      source = "user-events", target = "target", features = List("feature")))
    assert(sql.contains("FROM \"user-events\""))
  }

  test("compile_sql_blocks_unsafe_source_semicolon") {
    assertThrows[IllegalArgumentException] {
      SqlCompiler.compileSql(spec(
        source = "transactions; DROP TABLE users", target = "target",
        features = List("feature"), sourceIsIdentifier = false))
    }
  }

  test("compile_sql_blocks_unsafe_source_keywords") {
    assertThrows[IllegalArgumentException] {
      SqlCompiler.compileSql(spec(
        source = "transactions WHERE 1=1 COMMIT", target = "target",
        features = List("feature"), sourceIsIdentifier = false))
    }
  }

  test("compile_sql_allows_safe_join_source") {
    val sql = SqlCompiler.compileSql(spec(
      source = "transactions t JOIN merchants m ON t.merchant_id = m.id WHERE t.amount > 0",
      target = "target", features = List("t.amount", "m.category"),
      sourceIsIdentifier = false))
    assert(sql.contains("JOIN merchants m ON t.merchant_id = m.id"))
    assert(sql.contains("\"t\".\"amount\""))
  }

  test("compile_sql_allows_safe_parenthesized_subquery") {
    val sql = SqlCompiler.compileSql(spec(
      source = "(SELECT * FROM transactions WHERE amount > 10) tx",
      target = "target", features = List("amount * 2", "sqrt(amount + 1)"),
      sourceIsIdentifier = false))
    assert(sql.contains("FROM (SELECT * FROM transactions WHERE amount > 10) tx"))
    assert(sql.contains("(\"amount\" * 2)"))
    assert(sql.contains("\"sqrt\"((\"amount\" + 1))"))
  }

  test("source_comment_tokens_rejected") {
    for (src <- Seq("transactions -- hi", "transactions /* hi */ t")) {
      val e = intercept[IllegalArgumentException] {
        SqlCompiler.compileSql(spec(source = src, sourceIsIdentifier = false))
      }
      assert(e.getMessage.contains("must not contain SQL comments"))
    }
  }

  test("relation_pattern_accepts_full_clause_chain_and_rejects_set_ops") {
    // parser.py:657-670: scan + joins + WHERE/GROUP BY/HAVING/ORDER BY/LIMIT
    SqlCompiler.compileSql(spec(
      source = "transactions t JOIN merchants m ON t.mid = m.id " +
        "WHERE t.amount > 0 GROUP BY t.region HAVING count(x) > 1 " +
        "ORDER BY t.region LIMIT 5",
      sourceIsIdentifier = false))
    // R10: set operations are not in the whitelist
    val e = intercept[IllegalArgumentException] {
      SqlCompiler.compileSql(spec(
        source = "transactions UNION SELECT 1", sourceIsIdentifier = false))
    }
    assert(e.getMessage.contains(
      "must be a relation/join expression or a parenthesized subquery"))
  }

  test("parser_and_compiler_work_without_a_spark_session") {
    // analog of test_import_behavior: the front-end has no Spark
    // dependency at parse/compile time (usable in a driver-side tool)
    val m = DmlParser.parse(
      "TRAIN MODEL offline USING alg FROM t PREDICT y WITH FEATURES(a + 1)")
    val sql = SqlCompiler.compileSql(m)
    assert(sql.contains("ml_train_model"))
  }

  test("compile_sql_blocks_unsafe_feature_expression") {
    assertThrows[IllegalArgumentException] {
      SqlCompiler.compileSql(spec(features = List("amount", "amount; DROP TABLE users")))
    }
  }

  test("feature_kwarg_compiles_to_named_arg_sql") {
    // parser.py:723-725: kwarg renders as "name" => value
    val sql = SqlCompiler.compileFeature("time_series.lag(x, periods=7)")
    assert(sql == "\"time_series\".\"lag\"(\"x\", \"periods\" => 7)")
  }

  test("compile_sql_includes_checkpoint") {
    val sql = SqlCompiler.compileSql(spec(
      source = "data", target = "target", features = List("feature"))
      .copy(checkpoint = Some(CheckpointOption(5, Some("epochs")))))
    assert(sql.contains("checkpoint_schedule :="))
    val payload = decodeSqlStringLiteral(extractNamedArg(sql, "checkpoint_schedule"))
    assert(payload == """{"interval": 5, "unit": "epochs"}""")
  }

  test("compile_sql_includes_checkpoint_from_parsed_statement") {
    val m = DmlParser.parse(
      "TRAIN MODEL m USING alg() FROM data PREDICT target WITH FEATURES(feature) " +
        "SAVE CHECKPOINTS EVERY 10 epochs").asInstanceOf[TrainSpec]
    val sql = SqlCompiler.compileSql(m)
    val payload = decodeSqlStringLiteral(extractNamedArg(sql, "checkpoint_schedule"))
    assert(payload == """{"interval": 10, "unit": "epochs"}""")
  }

  test("compile_sql_train_structure_with_multiple_options") {
    val m = TrainSpec(
      name = "fraud_v2",
      algorithm = "xgboost",
      params = List("max_depth" -> VInt(6), "learning_rate" -> VFloat(0.1)),
      source = "transactions",
      target = "is_fraud",
      features = List("amount", "merchant_type"),
      split = Some(DataSplit(List(
        "training" -> 0.7, "validation" -> 0.2, "test" -> 0.1))),
      validate = Some(ValidationOption(
        method = Some("cv"), params = Some(List("folds" -> VInt(5))))),
      optimizeMetric = Some("f1_score"),
      checkpoint = Some(CheckpointOption(10, Some("epochs"))))
    val sql = SqlCompiler.compileSql(m)

    assert(sql.contains("ml_train_model"))
    assert(sql.contains("model_name :="))
    assert(sql.contains("training_data :="))

    assert(decodeSqlStringLiteral(extractNamedArg(sql, "model_name")) == "fraud_v2")
    assert(decodeSqlStringLiteral(extractNamedArg(sql, "algorithm")) == "xgboost")

    val trainingData = decodeSqlStringLiteral(extractNamedArg(sql, "training_data"))
    assert(trainingData.contains("FROM \"transactions\""))
    assert(trainingData.contains("\"amount\""))
    assert(trainingData.contains("\"merchant_type\""))
    assert(trainingData.contains("\"is_fraud\""))

    assert(decodeSqlStringLiteral(extractNamedArg(sql, "algorithm_params")) ==
      """{"max_depth": 6, "learning_rate": 0.1}""")
    assert(decodeSqlStringLiteral(extractNamedArg(sql, "data_split")) ==
      """{"training": 0.7, "validation": 0.2, "test": 0.1}""")
    assert(decodeSqlStringLiteral(extractNamedArg(sql, "validate_method")) == "cv")
    assert(decodeSqlStringLiteral(extractNamedArg(sql, "validate_params")) ==
      """{"folds": 5}""")
    assert(decodeSqlStringLiteral(extractNamedArg(sql, "optimize_metric")) == "f1_score")
    assert(decodeSqlStringLiteral(extractNamedArg(sql, "checkpoint_schedule")) ==
      """{"interval": 10, "unit": "epochs"}""")
  }

  test("compile_sql_compute_structure_with_schedule_and_options") {
    val s = ComputeSpec(
      name = "scan_peptides",
      kernel = "immune_scan",
      inputs = Some(List("signal_a", "signal_b")),
      output = Some("risk_score"),
      scheduleTicks = Some(1000L),
      options = Some(List(
        "BLOCK" -> VInt(256), "GRID" -> VStr("auto"), "SHARED" -> VStr("1K"))))
    val sql = SqlCompiler.compileSql(s)

    assert(sql.contains("ml_register_compute"))
    assert(sql.contains("schedule_ticks :="))
    assert(sql.contains("options :="))

    assert(decodeSqlStringLiteral(extractNamedArg(sql, "kernel_name")) == "immune_scan")
    assert(decodeSqlStringLiteral(extractNamedArg(sql, "name")) == "scan_peptides")
    assert(extractNamedArg(sql, "schedule_ticks") == "1000")
    assert(decodeSqlStringLiteral(extractNamedArg(sql, "options")) ==
      """{"BLOCK": 256, "GRID": "auto", "SHARED": "1K"}""")
  }

  test("compile_sql_escapes_compute_identifiers") {
    val s = ComputeSpec(
      name = "name;drop", kernel = "ker;nel",
      inputs = Some(List("in;put")), output = Some("out;put"))
    val sql = SqlCompiler.compileSql(s)
    assert(sql.contains("'name;drop'"))
    assert(sql.contains("'ker;nel'"))
    assert(sql.contains("'in;put'"))
    assert(sql.contains("'out;put'"))
  }
}
