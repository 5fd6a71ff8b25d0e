package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Seeded random-input equivalence for the fused text expressions: the
  * fixture corpora are well-behaved, so this generates hostile documents
  * — multi-byte UTF-8, repeated/leading/trailing separators, tokens that
  * collide with stopwords and profile words, empty and one-token docs —
  * and re-proves each native expression against the verbatim composable
  * chain it replaced. One DataFrame, one comparison job per expression. */
class TextExpressionsFuzzSpec extends AnyFunSuite {

  private def spark = SparkTestSession.withTables()

  private val alphabet: Vector[String] = Vector(
    "the", "a", "of", "and", "to", "in", "is", "le", "der", "el",
    "word", "données", "ありがとう", "Привет", "ß", "x", "", "!", "a-b",
    "0", "42", "#0", "#1", "naïve", "word,word")

  private def randomDocs(n: Int): Seq[(Long, String)] = {
    val rnd = new scala.util.Random(42)
    (1 to n).map { i =>
      val len = rnd.nextInt(30)
      val toks = Seq.fill(len)(alphabet(rnd.nextInt(alphabet.size)))
      // occasionally double separators / pad the edges
      val sep = if (rnd.nextInt(5) == 0) "  " else " "
      val body = toks.mkString(sep)
      val text = rnd.nextInt(6) match {
        case 0 => " " + body
        case 1 => body + " "
        case _ => body
      }
      (i.toLong, text)
    }
  }

  private def docs = {
    val s = spark
    import s.implicits._
    randomDocs(400).toDF("doc_id", "text")
      .withColumn("_t", coalesce(col("text"), lit("")))
      .withColumn("_w", split(col("_t"), " "))
  }

  private def assertNoDiff(
      df: org.apache.spark.sql.DataFrame,
      a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column)
      : Unit = {
    val bad = df.select(col("doc_id"), a.as("a"), b.as("b"))
      .filter(not(col("a") <=> col("b")))
    assert(bad.isEmpty, s"diverging rows: ${bad.take(5).mkString("; ")}")
  }

  test("MinhashSigs survives hostile unicode/whitespace inputs") {
    val k = 3
    val d = docs
      .withColumn("_shingles", expr(
        s"""CASE WHEN size(_w) < $k THEN array(_t)
           |ELSE transform(sequence(1, size(_w) - ${k - 1}),
           |  i -> concat_ws(' ', ${(0 until k)
                .map(j => s"element_at(_w, i + $j)").mkString(", ")}))
           |END""".stripMargin))
      .withColumn("_h0", expr("transform(_shingles, s -> md5(concat(s, '#0')))"))
      .withColumn("_h1", expr("transform(_shingles, s -> md5(concat(s, '#1')))"))
    val hof = array((0 until 8).map { j =>
      val (m, c) = (j / 4, j % 4)
      expr(s"array_min(transform(_h$m, h -> substring(h, ${1 + 8 * c}, 8)))")
    }: _*)
    assertNoDiff(d, hof, MinhashSigs.minhashSigs(col("_t"), k, 8))
  }

  test("Kgrams survives hostile unicode/whitespace inputs (both modes)") {
    val d = docs
    for ((shortDoc, keepWhole) <- Seq(("array(_t)", true), ("array()", false));
         k <- Seq(2, 4)) {
      val hof = expr(
        s"""CASE WHEN size(_w) < $k THEN $shortDoc
           |ELSE transform(sequence(1, size(_w) - ${k - 1}),
           |  i -> concat_ws(' ', ${(0 until k)
                .map(j => s"element_at(_w, i + $j)").mkString(", ")}))
           |END""".stripMargin)
      assertNoDiff(d, hof, Kgrams.kgrams(col("_t"), k, keepWhole))
    }
  }

  test("SimhashBits survives hostile unicode/whitespace inputs") {
    val s = spark
    val d = docs
    val tokens = d
      .select(col("doc_id"), explode(col("_w")).as("_tk"))
      .withColumn("_h", md5(col("_tk")))
      .withColumn("_w1", expr("CAST(conv(substring(_h, 1, 8), 16, 10) AS BIGINT)"))
      .withColumn("_w2", expr("CAST(conv(substring(_h, 9, 8), 16, 10) AS BIGINT)"))
    val voteCols = (0 until 64).map { b =>
      val (w, shift) = if (b < 32) ("_w1", b) else ("_w2", b - 32)
      sum(expr(s"CASE WHEN (($w div ${1L << shift}) % 2) = 1 THEN 1 ELSE -1 END"))
        .as(s"_v$b")
    }
    val bitString = concat((0 until 64).map(b =>
      when(col(s"_v$b") > 0, lit("1")).otherwise(lit("0"))): _*)
    val hof = tokens.groupBy("doc_id").agg(voteCols.head, voteCols.tail: _*)
      .select(col("doc_id"), bitString.as("a"))
    val native = d.select(col("doc_id"),
      SimhashBits.simhashBits(col("_t")).as("b"))
    val bad = hof.join(native, Seq("doc_id"))
      .filter(not(col("a") <=> col("b")))
    assert(bad.isEmpty, s"diverging docs: ${bad.take(5).mkString("; ")}")
  }

  test("TokenStats and TokenSetCount survive hostile inputs") {
    val d = docs
    val words = d.select(col("doc_id"), explode(col("_w")).as("_word"))
      .groupBy("doc_id", "_word").agg(count(lit(1)).as("_c"))
      .groupBy("doc_id").agg(
        sum("_c").as("n_words"), count(lit(1)).as("n_distinct"),
        sum(when(col("_c") === 1, 1L).otherwise(0L)).as("n_single"),
        max("_c").as("top_word"))
    val native = d.select(col("doc_id"),
      TokenStats.tokenStats(col("_t")).as("_s"))
    val bad = words.alias("t")
      .join(native.alias("n"), Seq("doc_id"))
      .filter(not(
        (col("t.n_words") <=> col("n._s.n_words")) &&
        (col("t.n_distinct") <=> col("n._s.n_distinct")) &&
        (col("t.n_single") <=> col("n._s.n_single")) &&
        (col("t.top_word") <=> col("n._s.top_word"))))
    assert(bad.isEmpty, s"diverging docs: ${bad.take(5).mkString("; ")}")
    assertNoDiff(d,
      size(filter(col("_w"),
        t => t.isin("the", "a", "of", "and", "to", "in", "is")))
        .cast("long"),
      TokenSetCount.tokenSetCount(col("_w"),
        Seq("the", "a", "of", "and", "to", "in", "is")))
  }
}
