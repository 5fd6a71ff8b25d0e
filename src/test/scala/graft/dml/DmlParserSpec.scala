package graft.dml

import org.scalatest.funsuite.AnyFunSuite

import Value._

/** Port of reference/tests/test_parser.py parse-level cases (31-515).
  * ParseException stands in for LarkError, IllegalArgumentException for
  * ValueError, with the reference's exact messages.
  */
class DmlParserSpec extends AnyFunSuite {

  private def parseTrain(text: String): TrainSpec =
    DmlParser.parse(text).asInstanceOf[TrainSpec]
  private def parseCompute(text: String): ComputeSpec =
    DmlParser.parse(text).asInstanceOf[ComputeSpec]

  test("parse_train_model") {
    val m = parseTrain(
      "TRAIN MODEL fraud_detector USING logistic_regression(" +
        "regularization=0.01) FROM transactions " +
        "PREDICT is_fraud WITH FEATURES(amount, merchant_type)")
    assert(m.name == "fraud_detector")
    assert(m.algorithm == "logistic_regression")
    assert(m.source == "transactions")
    assert(m.target == "is_fraud")
    assert(m.features == List("amount", "merchant_type"))
    assert(m.sourceIsIdentifier)
    assert(SqlCompiler.compileSql(m).contains("ml_train_model"))
  }

  test("parse_train_model_no_params") {
    val m = parseTrain(
      "TRAIN MODEL simple_model USING decision_tree FROM training_data " +
        "PREDICT outcome WITH FEATURES(a, b)")
    assert(m.name == "simple_model")
    assert(m.algorithm == "decision_tree")
    assert(m.params.isEmpty)
    assert(m.source == "training_data")
    assert(m.target == "outcome")
    assert(m.features == List("a", "b"))
    assert(m.sourceIsIdentifier)
  }

  test("parse_train_model_source_identifier_boundaries") {
    val cases = Seq(
      ("transactions", true),
      ("analytics.transactions", false),
      ("\"Transactions\"", false),
      ("transactions JOIN merchants ON transactions.id = merchants.id", false),
      ("(SELECT * FROM transactions) t", false))
    for ((source, expected) <- cases) {
      val m = parseTrain(
        s"TRAIN MODEL m USING alg FROM $source PREDICT y WITH FEATURES(a)")
      assert(m.source == source, s"source: $source")
      assert(m.sourceIsIdentifier == expected, s"identifier flag: $source")
    }
  }

  test("parse_train_model_join_source") {
    val m = parseTrain(
      "TRAIN MODEL joined USING alg FROM transactions JOIN merchants ON " +
        "transactions.merchant_id = merchants.id PREDICT y WITH FEATURES(a)")
    assert(m.source ==
      "transactions JOIN merchants ON transactions.merchant_id = merchants.id")
    assert(!m.sourceIsIdentifier)
    val sql = SqlCompiler.compileSql(m)
    assert(sql.contains("JOIN merchants"))
    assert(!sql.contains(
      "FROM \"transactions JOIN merchants ON transactions.merchant_id = merchants.id\""))
  }

  test("parse_train_model_filtered_source") {
    val m = parseTrain(
      "TRAIN MODEL filtered USING alg FROM (SELECT * FROM base WHERE active = TRUE) sub " +
        "PREDICT y WITH FEATURES(a)")
    assert(m.source == "(SELECT * FROM base WHERE active = TRUE) sub")
    assert(!m.sourceIsIdentifier)
    val sql = SqlCompiler.compileSql(m)
    assert(sql.contains("FROM (SELECT * FROM base WHERE active = TRUE) sub"))
  }

  test("parse_train_model_source_with_predict_in_string_literal") {
    val m = parseTrain(
      "TRAIN MODEL filtered USING alg FROM transactions t " +
        "WHERE t.note = 'PREDICT' PREDICT y WITH FEATURES(a)")
    assert(m.source == "transactions t WHERE t.note = 'PREDICT'")
    assert(m.target == "y")
    assert(!m.sourceIsIdentifier)
  }

  test("parse_train_model_source_with_predict_in_alias") {
    val m = parseTrain(
      "TRAIN MODEL filtered USING alg FROM (SELECT * FROM transactions) predict_alias " +
        "PREDICT y WITH FEATURES(a)")
    assert(m.source == "(SELECT * FROM transactions) predict_alias")
    assert(m.target == "y")
    assert(!m.sourceIsIdentifier)
  }

  test("parse_train_model_with_options") {
    val m = parseTrain(
      "TRAIN MODEL m USING alg() FROM data PREDICT y " +
        "WITH FEATURES(f1, f2) " +
        "SPLIT DATA training=0.7, validation=0.2, test=0.1 " +
        "VALIDATE USING cv(folds=5) OPTIMIZE FOR accuracy " +
        "STOP WHEN accuracy > 0.9")
    assert(m.split.isDefined)
    assert(math.abs(m.split.get.ratios.toMap.apply("training") - 0.7) < 1e-9)
    assert(m.validate.isDefined)
    assert(m.validate.get.method.contains("cv"))
    assert(m.optimizeMetric.contains("accuracy"))
    assert(m.stopCondition.contains("accuracy > 0.9"))
  }

  test("feature_list_with_expressions") {
    val m = parseTrain(
      "TRAIN MODEL m USING alg() FROM data PREDICT y WITH FEATURES(" +
        "amount, DERIVED(amount * exchange_rate), " +
        "TRANSFORM(scale(log(amount + 1))))")
    assert(m.features == List(
      "amount",
      "DERIVED(amount * exchange_rate)",
      "TRANSFORM(scale(log(amount + 1)))"))
  }

  test("feature_string_with_embedded_quotes") {
    // DSL text: FEATURES("text \"with\" quotes")
    val m = parseTrain(
      "TRAIN MODEL quoted USING alg FROM source " +
        "PREDICT target WITH FEATURES(\"text \\\"with\\\" quotes\")")
    assert(m.features == List("\"text \\\"with\\\" quotes\""))

    val sql = SqlCompiler.compileSql(m)
    val re = """feature_columns := ARRAY\[\s*(?:E)?'([^']*)'\]""".r
    val body = re.findFirstMatchIn(sql).getOrElse(fail(s"no match in $sql")).group(1)
    // psycopg doubles backslashes in E'' literals; undo to recover the value
    assert(body.replace("\\\\", "\\") == "\"text \\\"with\\\" quotes\"")
  }

  test("stop_condition_and_or_flattening") {
    val m = parseTrain(
      "TRAIN MODEL m USING alg() FROM t PREDICT y WITH FEATURES(a) " +
        "STOP WHEN accuracy > 0.9 AND loss < 0.1 OR epochs >= 100")
    assert(m.stopCondition.contains(
      "accuracy > 0.9 AND loss < 0.1 OR epochs >= 100"))
  }

  test("invalid_syntax_raises") {
    assertThrows[ParseException] {
      DmlParser.parse("TRAIN MODEL bad USING algo FROM tbl")
    }
  }

  test("missing_features_clause") {
    assertThrows[ParseException] {
      DmlParser.parse("TRAIN MODEL m USING a FROM t PREDICT y")
    }
  }

  test("empty_feature_list") {
    assertThrows[ParseException] {
      DmlParser.parse("TRAIN MODEL m USING a FROM t PREDICT y WITH FEATURES()")
    }
  }

  test("algorithm_param_types") {
    val m = parseTrain(
      "TRAIN MODEL m USING alg(num=1, rate=0.5, name=\"x\") FROM t " +
        "PREDICT y WITH FEATURES(a)")
    assert(m.params == List(
      "num" -> VInt(1), "rate" -> VFloat(0.5), "name" -> VStr("x")))
  }

  test("algorithm_param_string_escapes_are_decoded") {
    // DSL text: alg(name="a\\\"b", note="line1\\nline2")
    val m = parseTrain(
      "TRAIN MODEL m USING alg(name=\"a\\\\\\\"b\", note=\"line1\\\\nline2\") FROM t " +
        "PREDICT y WITH FEATURES(a)")
    assert(m.params == List(
      "name" -> VStr("a\\\"b"), "note" -> VStr("line1\\nline2")))
  }

  test("algorithm_param_nested_literal_string_escapes_are_decoded") {
    val m = parseTrain(
      "TRAIN MODEL m USING alg(" +
        "config={label: \"a\\\\\\\"b\", nested: [\"line1\\\\nline2\", {inner: \"x\\\\\\\"y\"}]}" +
        ") FROM t PREDICT y WITH FEATURES(a)")
    assert(m.params == List(
      "config" -> VDict(List(
        "label" -> VStr("a\\\"b"),
        "nested" -> VList(List(
          VStr("line1\\nline2"),
          VDict(List("inner" -> VStr("x\\\"y")))))))))
  }

  test("negative_param_values") {
    val m = parseTrain(
      "TRAIN MODEL m USING alg(alpha=-0.1, depth=-5) FROM t " +
        "PREDICT y WITH FEATURES(a)")
    assert(m.params == List("alpha" -> VFloat(-0.1), "depth" -> VInt(-5)))
  }

  test("algorithm_param_list_and_dict_literals") {
    val m = parseTrain(
      "TRAIN MODEL m USING alg(" +
        "layers=[64, 128, 256], " +
        "config={mode: fast, thresholds: [0.1, 0.2]}" +
        ") FROM t PREDICT y WITH FEATURES(a)")
    assert(m.params == List(
      "layers" -> VList(List(VInt(64), VInt(128), VInt(256))),
      "config" -> VDict(List(
        "mode" -> VStr("fast"),
        "thresholds" -> VList(List(VFloat(0.1), VFloat(0.2)))))))
    val sql = SqlCompiler.compileSql(m)
    val json = CompileSqlSpec.decodeSqlStringLiteral(
      CompileSqlSpec.extractNamedArg(sql, "algorithm_params"))
    assert(json ==
      """{"layers": [64, 128, 256], "config": {"mode": "fast", "thresholds": [0.1, 0.2]}}""")
  }

  test("balance_clause") {
    val m = parseTrain(
      "TRAIN MODEL m USING alg() FROM t PREDICT y WITH FEATURES(a) " +
        "BALANCE CLASSES BY oversampling")
    assert(m.balanceMethod.contains("oversampling"))
  }

  test("checkpoint_clause") {
    val m = parseTrain(
      "TRAIN MODEL m USING alg() FROM t PREDICT y WITH FEATURES(a) " +
        "SAVE CHECKPOINTS EVERY 10 epochs")
    assert(m.checkpoint.contains(CheckpointOption(10, Some("epochs"))))
  }

  test("checkpoint_clause_invalid_intervals") {
    for (interval <- Seq("0", "-1", "2.5")) {
      val e = intercept[IllegalArgumentException] {
        DmlParser.parse(
          "TRAIN MODEL m USING alg() FROM t PREDICT y WITH FEATURES(a) " +
            s"SAVE CHECKPOINTS EVERY $interval epochs")
      }
      assert(e.getMessage.contains("checkpoint interval must be a positive integer"))
    }
  }

  test("checkpoint_unit_does_not_swallow_next_option") {
    val m = parseTrain(
      "TRAIN MODEL m USING alg() FROM t PREDICT y WITH FEATURES(a) " +
        "SAVE CHECKPOINTS EVERY 10 VALIDATE ON holdout")
    assert(m.checkpoint.contains(CheckpointOption(10, None)))
    assert(m.validate.get.on.contains("holdout"))
  }

  test("parse_compute") {
    val s = parseCompute(
      "COMPUTE add_vectors FROM table(foo, bar) INTO column(baz) " +
        "USING vector_add BLOCK 256 GRID auto")
    assert(s.name == "add_vectors")
    assert(s.inputs.contains(List("foo", "bar")))
    assert(s.output.contains("baz"))
    assert(s.kernel == "vector_add")
    assert(s.options.get.toMap.apply("BLOCK") == VInt(256))
    assert(s.options.get.toMap.apply("GRID") == VStr("auto"))
  }

  test("parse_compute_every") {
    val s = parseCompute(
      "COMPUTE scan_peptides EVERY 1000 TICKS USING immune_scan SHARED 1K")
    assert(s.scheduleTicks.contains(1000L))
    assert(s.kernel == "immune_scan")
    assert(s.options.get.toMap.apply("SHARED") == VStr("1K"))
  }

  test("parse_compute_valid_block_and_shared_edges") {
    val s = parseCompute(
      "COMPUTE scan_peptides USING immune_scan BLOCK 1 SHARED 0 GRID auto")
    assert(s.options.get.toMap.apply("BLOCK") == VInt(1))
    assert(s.options.get.toMap.apply("SHARED") == VStr("0"))
    assert(s.options.get.toMap.apply("GRID") == VStr("auto"))
  }

  test("parse_compute_every_fractional_ticks") {
    assertThrows[IllegalArgumentException] {
      DmlParser.parse("COMPUTE scan_peptides EVERY 10.5 TICKS USING immune_scan")
    }
  }

  test("parse_compute_every_non_positive_ticks") {
    assertThrows[IllegalArgumentException] {
      DmlParser.parse("COMPUTE scan_peptides EVERY 0 TICKS USING immune_scan")
    }
  }

  test("parse_compute_invalid_clause") {
    assertThrows[ParseException] {
      DmlParser.parse("COMPUTE bad_job USING some_kernel EXTRA")
    }
  }

  test("parse_compute_invalid_block_values") {
    for (bad <- Seq("BLOCK 0", "BLOCK -2", "BLOCK 32.5")) {
      val e = intercept[IllegalArgumentException] {
        DmlParser.parse(s"COMPUTE bad_job USING some_kernel $bad")
      }
      assert(e.getMessage.contains("block size must be a positive integer"))
    }
  }

  test("parse_compute_invalid_shared_values") {
    for (bad <- Seq("SHARED -1", "SHARED 1.5K", "SHARED 2KB")) {
      val e = intercept[IllegalArgumentException] {
        DmlParser.parse(s"COMPUTE bad_job USING some_kernel $bad")
      }
      assert(e.getMessage.contains(
        "shared memory size must be a non-negative integer optionally suffixed with K, M, or G"))
    }
  }

  test("parse_compute_invalid_grid_values") {
    val e = intercept[IllegalArgumentException] {
      DmlParser.parse("COMPUTE bad_job USING some_kernel GRID manual")
    }
    assert(e.getMessage.contains("grid value must be one of: auto"))
  }

  test("compute_stmt_unexpected_part") {
    val e = intercept[IllegalArgumentException] {
      ComputeSpec.assemble("bad_job", Seq("kernel", 123))
    }
    assert(e.getMessage.contains("Unexpected compute clause part"))
  }

  test("data_split_sum_validation_passes") {
    val m = parseTrain(
      "TRAIN MODEL m USING alg() FROM t PREDICT y WITH FEATURES(a, b) " +
        "SPLIT DATA train=0.8, test=0.2")
    assert(m.split.isDefined)
    assert(math.abs(m.split.get.ratios.map(_._2).sum - 1.0) < 1e-9)
  }

  test("data_split_sum_validation_fails") {
    assertThrows[IllegalArgumentException] {
      DmlParser.parse(
        "TRAIN MODEL m USING alg() FROM t PREDICT y WITH FEATURES(a, b) " +
          "SPLIT DATA train=0.6, test=0.3")
    }
  }

  test("data_split_range_validation_fails") {
    val e = intercept[IllegalArgumentException] {
      DmlParser.parse(
        "TRAIN MODEL m USING alg() FROM t PREDICT y WITH FEATURES(a) " +
          "SPLIT DATA train=1.5, test=-0.5")
    }
    assert(e.getMessage.contains("split ratios must be between 0 and 1"))
  }

  test("compute_missing_kernel") {
    assertThrows[ParseException] {
      DmlParser.parse("COMPUTE add_vectors FROM table(foo) INTO column(bar)")
    }
  }

  test("feature_subtraction_of_literal_without_spaces") {
    // `a-1` / `a -1` / `a +2*b`: the signed-number token re-splits into
    // operator + literal, matching Lark's contextual lexer
    val m = parseTrain(
      "TRAIN MODEL m USING alg FROM t PREDICT y " +
        "WITH FEATURES(c_acctbal-1, c_acctbal -2.5, a +2 * b)")
    assert(m.features == List(
      "c_acctbal - 1", "c_acctbal - 2.5", "a + 2 * b"))
    // sign-folding still applies where a number is the only legal token
    val e = intercept[IllegalArgumentException] {
      DmlParser.parse("COMPUTE bad_job USING some_kernel BLOCK -2")
    }
    assert(e.getMessage.contains("block size must be a positive integer"))
  }

  test("keywords_are_contextual_not_reserved") {
    // Lark's contextual lexer lets NAME slots accept keyword spellings.
    val m = parseTrain(
      "TRAIN MODEL USING USING USING FROM data PREDICT y WITH FEATURES(a)")
    assert(m.name == "USING")
    assert(m.algorithm == "USING")
  }
}
