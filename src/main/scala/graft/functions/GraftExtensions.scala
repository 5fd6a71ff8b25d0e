package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session extension wiring for graft's native expressions, so a cluster
  * can enable them declaratively:
  *
  * {{{
  * spark.sql.extensions=graft.functions.GraftExtensions
  * }}}
  *
  * after which `vec_dot(a, b)` (and the cosine built on it) is callable
  * from plain SQL — the preferred escalation path when a semantics can't
  * be composed from builtins (SURVEY §7.3): a codegen'd Catalyst
  * Expression registered through `SparkSessionExtensions.injectFunction`,
  * not a UDF.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(ext.injectFunction)
}

object GraftExtensions {

  private def arity(name: String, n: Int, args: Seq[Expression]): Unit =
    require(args.size == n,
      s"$name expects $n arguments, got ${args.size}")

  /** (identifier, doc, builder) triples — the one list both injection
    * paths share. */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
      (args: Seq[Expression]) => {
        arity("vec_dot", 2, args); VecDot(args(0), args(1))
      }),
    // cosine_sim composes VecDot — one registry entry, no new class;
    // codegen's common-subexpression elimination shares the repeated
    // argument evaluations
    (FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[VecDot].getName, null, "cosine_sim",
        "cosine_sim(a, b) - cosine similarity of two numeric arrays " +
          "(vec_dot(a,b) / (|a| |b|))", ""),
      (args: Seq[Expression]) => {
        arity("cosine_sim", 2, args)
        import org.apache.spark.sql.catalyst.expressions.{Divide, Multiply, Sqrt}
        val (a, b) = (args(0), args(1))
        Divide(VecDot(a, b),
          Multiply(Sqrt(VecDot(a, a)), Sqrt(VecDot(b, b))))
      }))

  /** Imperative registration into an already-running session (tests,
    * notebooks) — same builders the extension injects at session build. */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (ident, info, builder) =>
      spark.sessionState.functionRegistry
        .registerFunction(ident, info, builder)
    }
}
