package graft.dml.runtime

import graft.dml.{Lexer, ParseException, Value}

/** `STOP WHEN` predicate mini-interpreter (SURVEY §2.2 O5).
  *
  * The parser flattens the condition to a string (reference parser.py:512-529
  * — "accuracy > 0.9 OR epochs > 100"); the Trainer re-parses it here and
  * evaluates it against the metric map each training chunk. Grammar is the
  * reference's condition_expr (parser.py:123-127): comparisons joined by
  * AND/OR with AND binding tighter.
  */
object StopCondition {
  sealed trait Cond {
    def eval(metrics: Map[String, Double]): Boolean = this match {
      case Cmp(m, op, v) =>
        metrics.get(m) match {
          case None => false // unknown metric can never satisfy the predicate
          case Some(x) => op match {
            case ">=" => x >= v
            case "<=" => x <= v
            case ">"  => x > v
            case "<"  => x < v
            case "!=" => x != v
            case "="  => x == v
          }
        }
      case And(l, r) => l.eval(metrics) && r.eval(metrics)
      case Or(l, r)  => l.eval(metrics) || r.eval(metrics)
    }

    /** Metric names referenced by the predicate. */
    def metricNames: Set[String] = this match {
      case Cmp(m, _, _) => Set(m)
      case And(l, r)    => l.metricNames ++ r.metricNames
      case Or(l, r)     => l.metricNames ++ r.metricNames
    }
  }
  final case class Cmp(metric: String, op: String, value: Double) extends Cond
  final case class And(l: Cond, r: Cond) extends Cond
  final case class Or(l: Cond, r: Cond) extends Cond

  private val ops = Seq(">=", "<=", ">", "<", "!=", "=")

  def parse(text: String): Cond = {
    val toks = Lexer.lex(text)
    var pos = 0
    def peek = toks(pos)
    def fail(what: String): Nothing =
      throw new ParseException(
        s"invalid stop condition '$text': expected $what at '${peek.text}'")

    def cmp(): Cond = {
      val m = peek match {
        case Lexer.TName(t, _, _) => pos += 1; t
        case _ => fail("metric name")
      }
      val op = ops.find(o => peek.isInstanceOf[Lexer.TSym] && peek.text == o)
        .getOrElse(fail("comparison operator"))
      pos += 1
      val v = peek match {
        case Lexer.TNumber(t, _, _) => pos += 1; t.toDouble
        case _ => fail("numeric literal")
      }
      Cmp(m, op, v)
    }
    def andExpr(): Cond = {
      var e = cmp()
      while (peek.isInstanceOf[Lexer.TName] && peek.text == "AND") {
        pos += 1; e = And(e, cmp())
      }
      e
    }
    def orExpr(): Cond = {
      var e = andExpr()
      while (peek.isInstanceOf[Lexer.TName] && peek.text == "OR") {
        pos += 1; e = Or(e, andExpr())
      }
      e
    }
    val c = orExpr()
    if (!peek.isInstanceOf[Lexer.TEof]) fail("end of condition")
    c
  }
}
