package graft.dml

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, PrintStream}
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** Port of reference/tests/test_cli.py:29-236 — the CLI contract: stdin and
  * file ingestion, compiled-SQL emission, error paths, and the full-SQL
  * structure checks, driven through Cli.run in-process. */
class CliSpec extends AnyFunSuite {
  import CompileSqlSpec.{decodeSqlStringLiteral, extractNamedArg}

  private def runCli(args: Array[String], stdin: String = "")
      : (Int, String, String) = {
    val out = new ByteArrayOutputStream()
    val err = new ByteArrayOutputStream()
    val oldOut = System.out
    val oldErr = System.err
    val rc =
      try {
        System.setOut(new PrintStream(out, true, "UTF-8"))
        System.setErr(new PrintStream(err, true, "UTF-8"))
        Console.withOut(out) { Console.withErr(err) {
          Cli.run(args, new ByteArrayInputStream(stdin.getBytes(UTF_8)))
        }}
      } finally { System.setOut(oldOut); System.setErr(oldErr) }
    (rc, out.toString("UTF-8"), err.toString("UTF-8"))
  }

  test("cli_stdin") {
    val (rc, out, _) = runCli(Array.empty,
      "TRAIN MODEL cli_model USING decision_tree FROM orders JOIN customers ON " +
        "orders.customer_id = customers.id PREDICT label WITH FEATURES(x, y)")
    assert(rc == 0)
    assert(out.contains("ml_train_model"))
  }

  test("cli_compute") {
    val (rc, out, _) = runCli(Array.empty,
      "COMPUTE add_vectors FROM table(a, b) INTO column(c) " +
        "USING vector_add BLOCK 128")
    assert(rc == 0)
    assert(out.contains("ml_register_compute"))
  }

  test("cli_file") {
    val tmp = Files.createTempFile("graft-cli", ".dsl")
    Files.writeString(tmp,
      "TRAIN MODEL file_model USING decision_tree FROM data " +
        "PREDICT label WITH FEATURES(x, y)")
    try {
      val (rc, out, _) = runCli(Array(tmp.toString))
      assert(rc == 0)
      assert(out.contains("ml_train_model"))
    } finally Files.delete(tmp)
  }

  test("cli_invalid_input") {
    val (rc, _, err) = runCli(Array.empty, "TRAIN MODEL")
    assert(rc != 0)
    assert(err.nonEmpty)
  }

  test("cli_missing_file") {
    val (rc, _, err) = runCli(Array("/tmp/does_not_exist_graft.dsl"))
    assert(rc != 0)
    assert(err.contains("Failed to read source file"))
  }

  test("cli_outputs_nested_params") {
    val (rc, out, _) = runCli(Array.empty,
      "TRAIN MODEL nested USING algo(" +
        "layers=[32, 16], config={mode: fast, thresholds: [0.1, 0.2]}" +
        ") FROM data PREDICT label WITH FEATURES(x)")
    assert(rc == 0)
    assert(out.contains("ml_train_model"))
    assert(decodeSqlStringLiteral(extractNamedArg(out, "algorithm_params")) ==
      """{"layers": [32, 16], "config": {"mode": "fast", "thresholds": [0.1, 0.2]}}""")
  }

  test("cli_train_with_split_validate_optimize_and_checkpoint") {
    val (rc, out, _) = runCli(Array.empty,
      "TRAIN MODEL full_model USING xgboost(max_depth=6) FROM transactions " +
        "PREDICT is_fraud WITH FEATURES(amount, merchant_type) " +
        "SPLIT DATA training=0.7, validation=0.2, test=0.1 " +
        "VALIDATE USING cv(folds=5) OPTIMIZE FOR f1_score " +
        "STOP WHEN accuracy > 0.9 " +
        "BALANCE CLASSES BY oversampling " +
        "SAVE CHECKPOINTS EVERY 10 epochs")
    assert(rc == 0)
    assert(decodeSqlStringLiteral(extractNamedArg(out, "model_name")) == "full_model")
    assert(decodeSqlStringLiteral(extractNamedArg(out, "data_split")) ==
      """{"training": 0.7, "validation": 0.2, "test": 0.1}""")
    assert(decodeSqlStringLiteral(extractNamedArg(out, "validate_method")) == "cv")
    assert(decodeSqlStringLiteral(extractNamedArg(out, "validate_params")) ==
      """{"folds": 5}""")
    assert(decodeSqlStringLiteral(extractNamedArg(out, "optimize_metric")) == "f1_score")
    assert(decodeSqlStringLiteral(extractNamedArg(out, "stop_condition")) ==
      "accuracy > 0.9")
    assert(decodeSqlStringLiteral(extractNamedArg(out, "balance_method")) ==
      "oversampling")
    assert(decodeSqlStringLiteral(extractNamedArg(out, "checkpoint_schedule")) ==
      """{"interval": 10, "unit": "epochs"}""")
    val training = decodeSqlStringLiteral(extractNamedArg(out, "training_data"))
    assert(training == "SELECT \"amount\", \"merchant_type\", \"is_fraud\" FROM \"transactions\"")
  }

  test("cli_compute_with_schedule_and_options_contract") {
    val (rc, out, _) = runCli(Array.empty,
      "COMPUTE scan_peptides FROM table(signal_a, signal_b) INTO column(risk_score) " +
        "EVERY 1000 TICKS USING immune_scan BLOCK 256 GRID auto SHARED 1K")
    assert(rc == 0)
    assert(decodeSqlStringLiteral(extractNamedArg(out, "kernel_name")) == "immune_scan")
    assert(decodeSqlStringLiteral(extractNamedArg(out, "name")) == "scan_peptides")
    assert(extractNamedArg(out, "schedule_ticks") == "1000")
    assert(decodeSqlStringLiteral(extractNamedArg(out, "options")) ==
      """{"BLOCK": 256, "GRID": "auto", "SHARED": "1K"}""")
  }

  test("cli_extended_statements_compile") {
    val cases = Seq(
      "PREDICT USING MODEL m FROM t STORE RESULTS IN r" -> "ml_predict",
      "DEPLOY MODEL m TO ENDPOINT e" -> "ml_deploy_model",
      "PUBLISH EVENT 'a.b' WITH PAYLOAD {k: 1}" -> "ml_publish_event",
      "SUBSCRIBE TO 'a.%'" -> "ml_subscribe",
      "CREATE ENSEMBLE x AS COMBINE MODELS (a WEIGHT 0.5, b WEIGHT 0.5) USING weighted_average" ->
        "ml_create_ensemble",
      "EXPLAIN PREDICTION m SHOW TOP 3 features" -> "feature_importance",
      "MONITOR MODEL m FOR drift_detection" -> "ml_monitor_model",
      "WHEN EVENT 'x' THEN act" -> "ml_register_rule")
    cases.foreach { case (dml, fn) =>
      val (rc, out, err) = runCli(Array.empty, dml)
      assert(rc == 0, s"$dml failed: $err")
      assert(out.contains(fn), s"$dml: expected $fn in: $out")
    }
  }

  test("cli_too_many_args") {
    val (rc, _, err) = runCli(Array("a.dsl", "b.dsl"))
    assert(rc == 2)
    assert(err.contains("usage:"))
  }
}
