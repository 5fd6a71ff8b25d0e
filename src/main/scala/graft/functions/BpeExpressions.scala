package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** BPE APPLY as one native codegen projection: tokenize any word —
  * including words the training corpus never saw — against a trained
  * merge table ([[graft.llm.Bpe.BpeModel]]). The merge list ships as a
  * codegen REFERENCE OBJECT (merge-budget rows — the same bounded
  * index-metadata envelope as IVF centroids and PQ codebooks), so the
  * expression is one plan node at any budget and whole-stage fusion is
  * preserved.
  *
  * Algorithm: the standard rank-based apply (subword-nmt / HF
  * tokenizers): repeatedly find the adjacent symbol pair with the best
  * (earliest-trained) rank and merge every occurrence left-to-right,
  * until no adjacent pair is in the table. This is provably identical
  * to replaying the training rounds in order over the word — a merge
  * learned at round r references only symbols that exist before r, and
  * merging never deletes symbols, so later merges can never create a
  * NEW adjacency for an earlier pair; the DuckDB oracle exploits
  * exactly that to replay the apply as the training rounds' regex
  * chain, and `BpeSpec` pins the equivalence on the training corpus
  * (tokenize == the trained vocab symbolization, word for word).
  */
case class BpeTokens(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {

  override def prettyName: String = "bpe_tokens"
  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${t.sql}")
  }

  // lhs -> (rhs -> training round); lower round = earlier = higher
  // priority. Two-level so the per-adjacent-pair lookup on the hot path
  // allocates NOTHING (a tuple or concatenated-string key would box per
  // probe). BOXED Integer values: a Scala-Int-valued java.util.HashMap
  // unboxes a missing key's null to 0, which would hand every unknown
  // pair rank 0 and spin the apply loop forever on a pair that never
  // matches.
  private lazy val rank
      : java.util.HashMap[String, java.util.HashMap[String, Integer]] = {
    val m = new java.util.HashMap[String, java.util.HashMap[String, Integer]]()
    merges.zipWithIndex.foreach { case ((lhs, rhs), i) =>
      val inner = m.computeIfAbsent(lhs,
        _ => new java.util.HashMap[String, Integer]())
      if (!inner.containsKey(rhs)) inner.put(rhs, Integer.valueOf(i))
    }
    m
  }

  /** public: called from generated code. */
  def tokens(word: UTF8String): GenericArrayData = {
    val w = word.toString
    val syms = new java.util.ArrayList[String](w.length + 1)
    var i = 0
    while (i < w.length) { syms.add(String.valueOf(w.charAt(i))); i += 1 }
    syms.add("_") // end-of-word marker, the training-side symbolization
    var done = false
    while (!done && syms.size > 1) {
      // the best-ranked adjacent pair present in the word
      var best = Int.MaxValue
      var j = 0
      while (j < syms.size - 1) {
        val inner = rank.get(syms.get(j))
        if (inner != null) {
          val r: Integer = inner.get(syms.get(j + 1))
          if (r != null && r.intValue < best) best = r.intValue
        }
        j += 1
      }
      if (best == Int.MaxValue) done = true
      else {
        val (lhs, rhs) = merges(best)
        // merge every occurrence left-to-right non-overlapping
        var k = 0
        while (k < syms.size - 1) {
          if (syms.get(k) == lhs && syms.get(k + 1) == rhs) {
            syms.set(k, lhs + rhs)
            syms.remove(k + 1)
          }
          k += 1
        }
      }
    }
    val out = new Array[Any](syms.size)
    var t = 0
    while (t < syms.size) {
      out(t) = UTF8String.fromString(syms.get(t)); t += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(a: Any): Any =
    tokens(a.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeTokens", this,
      classOf[BpeTokens].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.tokens($a);")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : BpeTokens = copy(child = newChild)
}

object BpeExpressions {
  def bpeTokens(word: Column, merges: Seq[(String, String)]): Column =
    ColumnBridge.column(BpeTokens(ColumnBridge.expression(word), merges))
}
