package graft.dml

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** CLI entry point mirroring reference/dsl/cli.py:21-51: read a DSL
  * statement from a file argument or stdin, print the compiled SQL to
  * stdout; parse/compile errors go to stderr with exit code 1.
  *
  * Extension over the reference (which has no executor): `--run <sfDir>`
  * additionally compiles the statement against the fixture tables and
  * executes it on a local SparkSession — TRAIN builds + fits the model,
  * COMPUTE registers and applies the kernel — printing a result summary.
  */
object Cli {
  def main(args: Array[String]): Unit = sys.exit(run(args, System.in))

  /** Testable entry point: returns the exit code instead of exiting, so the
    * CLI contract tests (the test_cli.py port) can drive it in-process. */
  def run(args: Array[String], stdin: java.io.InputStream): Int = {
    val (runDir, rest) = args.toList match {
      case "--run" :: dir :: tail => (Some(dir), tail)
      case other                  => (None, other)
    }
    val text =
      try rest match {
        case path :: Nil => Files.readString(Paths.get(path))
        case Nil => new String(stdin.readAllBytes())
        case _ =>
          System.err.println("usage: graft.dml.Cli [--run sfDir] [file]")
          return 2
      }
      catch {
        case e: java.io.IOException =>
          // message wording mirrors cli.py:26-30
          System.err.println(s"Failed to read source file: ${e.getMessage}")
          return 1
      }

    // Parse and compile errors both exit 1 with a clean message, mirroring
    // cli.py:34-42 (compile-time failures include the injection guard).
    val (stmt, sql) =
      try {
        val s = DmlParser.parse(text.trim)
        (s, SqlCompiler.compileSql(s))
      } catch {
        case e @ (_: ParseException | _: IllegalArgumentException) =>
          System.err.println(s"error: ${e.getMessage}")
          return 1
      }

    println(sql)

    runDir.foreach { dir =>
      val spark = SparkSession.builder()
        .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
        .config("spark.sql.shuffle.partitions",
          sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      try {
        graft.Tables.register(spark, dir)
        stmt match {
          case t: TrainSpec =>
            val df = TrainCompiler.trainingDataFrame(spark, t)
            System.err.println(s"[run] training data: ${df.count()} rows, " +
              s"schema ${df.schema.map(_.name).mkString("[", ", ", "]")}")
            val report = runtime.Trainer.train(spark, t,
              checkpointDir = Some(s"/tmp/graft-checkpoints"))
            // register into the same scratch registry the extended
            // statements read, so TRAIN → PREDICT/DEPLOY/EXPLAIN works
            // across CLI invocations
            val version = new runtime.ModelRegistry(spark,
              "/tmp/graft-registry").register(report)
            val metrics = report.metrics.toSeq.sortBy(_._1)
              .map { case (k, v) => f"$k=$v%.4f" }.mkString(", ")
            System.err.println(s"[run] model '${t.name}' v$version " +
              s"(${t.algorithm}) fitted: $metrics" +
              (if (report.epochs > 0) s", epochs=${report.epochs}" else "") +
              (if (report.splitCounts.size > 1)
                 s", splits=${report.splitCounts}" else ""))
          case c: ComputeSpec =>
            // Resolve the fixture table containing the input columns and
            // apply the kernel one-shot (EVERY k TICKS jobs run the same
            // kernel on a Trigger.ProcessingTime schedule via
            // ComputeRegistry.schedule).
            val table = c.inputs.flatMap { ins =>
              graft.Tables.names.find { t =>
                val cols = spark.table(t).columns.toSet
                ins.forall(cols.contains)
              }
            }.getOrElse(throw new IllegalArgumentException(
              s"no fixture table has columns ${c.inputs}"))
            val out = runtime.ComputeRegistry.runOnce(spark, c, table)
            System.err.println(s"[run] compute '${c.name}' via kernel " +
              s"'${c.kernel}' over '$table': ${out.count()} rows, " +
              s"output column '${c.output.getOrElse(c.name)}'")
            out.show(5, truncate = false)
          case other =>
            // extended statements run through the statement dispatcher
            // against a scratch registry/event log
            val registry = new runtime.ModelRegistry(spark, "/tmp/graft-registry")
            val bus = new events.EventBus(spark, "/tmp/graft-events")
            val runner = new runtime.StatementRunner(spark, registry, bus)
            val result = runner.run(other)
            System.err.println(s"[run] ${result.kind}: ${result.summary}")
            result.data.foreach(_.show(5, truncate = false))
        }
      } finally spark.stop()
    }
    0
  }
}
