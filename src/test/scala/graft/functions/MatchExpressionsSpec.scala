package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** The native match primitives must be RESULT-IDENTICAL to the HOF
  * chains they replaced — the DuckDB oracles replay the HOF semantics.
  * Each test rebuilds the original chain and compares on real operator
  * inputs (quantized embeddings, minhash signatures, simhash
  * bitstrings) plus crafted null/length edges. */
class MatchExpressionsSpec extends AnyFunSuite {

  private def spark = SparkTestSession.withTables()

  private def assertNoDiff(
      df: org.apache.spark.sql.DataFrame, a: Column, b: Column): Unit = {
    val bad = df.select(a.as("a"), b.as("b"))
      .filter(not(col("a") <=> col("b")))
    assert(bad.isEmpty, s"diverging rows: ${bad.take(5).mkString("; ")}")
  }

  test("IntVecDot matches aggregate(zip_with) on quantized embeddings") {
    val s = spark
    val q = graft.llm.Similarity.quantizeInt8(
      s.table("embeddings").select("vec_id", "embedding"))
    val pairs = q.select(col("qvec"))
      .crossJoin(broadcast(q.filter(col("vec_id") < 5)
        .select(col("qvec").as("q_qvec"))))
    assertNoDiff(pairs,
      MatchExpressions.intVecDot(col("qvec"), col("q_qvec")),
      aggregate(zip_with(col("qvec"), col("q_qvec"), (x, y) => x * y),
        lit(0L), (acc, v) => acc + v))
  }

  test("IntVecDot nulls on length mismatch and null elements, like zip_with") {
    val s = spark
    import s.implicits._
    val rows = Seq(
      (Seq[Integer](1, 2, 3), Seq[Integer](4, 5, 6)),
      (Seq[Integer](1, 2), Seq[Integer](4, 5, 6)),
      (Seq[Integer](1, null, 3), Seq[Integer](4, 5, 6)))
      .toDF("a", "b")
    assertNoDiff(rows,
      MatchExpressions.intVecDot(col("a"), col("b")),
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(0L), (acc, v) => acc + v))
    val got = rows.select(
      MatchExpressions.intVecDot(col("a"), col("b"))).collect()
    assert(got(0).getLong(0) == 32L)
    assert(got(1).isNullAt(0) && got(2).isNullAt(0))
  }

  test("IntVecDot widens before multiplying — no silent 32-bit wrap") {
    val s = spark
    import s.implicits._
    // 100000² = 10¹⁰ overflows int (the HOF form raises under ANSI);
    // the native form must return the exact long product, never the
    // wrapped 1410065408
    val rows = Seq((Seq(100000, 100000), Seq(100000, -100000)))
      .toDF("a", "b")
    val got = rows.select(
      MatchExpressions.intVecDot(col("a"), col("b"))).collect()
    assert(got(0).getLong(0) == 0L) // 10¹⁰ + (−10¹⁰), exact in long
    val rows2 = Seq((Seq(Int.MaxValue), Seq(2))).toDF("a", "b")
    val got2 = rows2.select(
      MatchExpressions.intVecDot(col("a"), col("b"))).collect()
    assert(got2(0).getLong(0) == 2L * Int.MaxValue)
  }

  test("ArrayEqCount matches size(filter(zip_with)) on minhash signatures") {
    val s = spark
    val sigs = graft.llm.Dedup.minhashSignatures(
      s.table("documents").select("doc_id", "text").limit(200))
      .select(array((0 until 8).map(j => col(s"sig_$j")): _*).as("sig"))
    val pairs = sigs.crossJoin(
      broadcast(sigs.limit(5).select(col("sig").as("sig_r"))))
    assertNoDiff(pairs,
      MatchExpressions.arrayEqCount(col("sig"), col("sig_r")),
      expr("size(filter(zip_with(sig, sig_r, (x, y) -> x = y), m -> m))"))
  }

  test("ArrayEqCount drops padded and null positions, like the filter") {
    val s = spark
    import s.implicits._
    val rows = Seq(
      (Seq("a", "b", "c"), Seq("a", "x", "c")),   // 2 equal
      (Seq("a", "b"), Seq("a", "b", "c")),        // pad position dropped
      (Seq("a", null, "c"), Seq("a", null, "c"))) // null = null → dropped
      .toDF("a", "b")
    assertNoDiff(rows,
      MatchExpressions.arrayEqCount(col("a"), col("b")),
      expr("size(filter(zip_with(a, b, (x, y) -> x = y), m -> m))"))
    val got = rows.select(
      MatchExpressions.arrayEqCount(col("a"), col("b"))).collect()
    assert(got.map(_.getInt(0)).toSeq == Seq(2, 2, 2))
  }

  test("MinhashSigs matches the transform/array_min HOF chain exactly") {
    val s = spark
    val k = 3
    // the pre-round-9 composable pipeline, verbatim
    val hof = s.table("documents").select("doc_id", "text").limit(300)
      // crafted whitespace edges: short docs, empty text, repeated and
      // trailing separators — every split/CASE branch
      .unionByName {
        import s.implicits._
        Seq((900001L, "one two"), (900002L, ""), (900003L, "a  b   c d"),
          (900004L, "trailing space "), (900005L, " lead"),
          (900006L, "exactly three words"))
          .toDF("doc_id", "text")
      }
      .withColumn("_t", coalesce(col("text"), lit("")))
      .withColumn("_w", split(col("_t"), " "))
      .withColumn("_shingles", expr(
        s"""CASE WHEN size(_w) < $k THEN array(_t)
           |ELSE transform(sequence(1, size(_w) - ${k - 1}),
           |  i -> concat_ws(' ', ${(0 until k)
                .map(j => s"element_at(_w, i + $j)").mkString(", ")}))
           |END""".stripMargin))
      .withColumn("_h0", expr("transform(_shingles, s -> md5(concat(s, '#0')))"))
      .withColumn("_h1", expr("transform(_shingles, s -> md5(concat(s, '#1')))"))
    val sigExprs = (0 until 8).map { j =>
      val (m, c) = (j / 4, j % 4)
      expr(s"array_min(transform(_h$m, h -> substring(h, ${1 + 8 * c}, 8)))")
    }
    val native = MinhashSigs.minhashSigs(
      coalesce(col("text"), lit("")), k, numHashes = 8)
    val bad = hof.select(
        array(sigExprs: _*).as("hof"), native.as("nat"))
      .filter(not(col("hof") <=> col("nat")))
    assert(bad.isEmpty, s"diverging rows: ${bad.take(5).mkString("; ")}")
  }

  test("Kgrams matches the composable kgramSql chain in both short-doc modes") {
    val s = spark
    val docs = s.table("documents").select("doc_id", "text").limit(300)
      .unionByName {
        import s.implicits._
        Seq((900001L, "one two"), (900002L, ""), (900003L, "a  b   c d"),
          (900004L, "trailing space "), (900005L, " lead"))
          .toDF("doc_id", "text")
      }
      .withColumn("_t", coalesce(col("text"), lit("")))
      .withColumn("_w", split(col("_t"), " "))
    for ((shortDoc, keepWhole) <- Seq(("array(_t)", true), ("array()", false));
         k <- Seq(2, 3)) {
      val hof = expr(
        s"""CASE WHEN size(_w) < $k THEN $shortDoc
           |ELSE transform(sequence(1, size(_w) - ${k - 1}),
           |  i -> concat_ws(' ', ${(0 until k)
                .map(j => s"element_at(_w, i + $j)").mkString(", ")}))
           |END""".stripMargin)
      val bad = docs.select(hof.as("hof"),
          Kgrams.kgrams(col("_t"), k, keepWhole).as("nat"))
        .filter(not(col("hof") <=> col("nat")))
      assert(bad.isEmpty,
        s"k=$k keepWhole=$keepWhole diverges: ${bad.take(5).mkString("; ")}")
    }
  }

  test("TokenStats matches the explode-aggregate and transform-count forms") {
    val s = spark
    val docs = s.table("documents").select("doc_id", "text").limit(300)
      .unionByName {
        import s.implicits._
        Seq((900001L, ""), (900002L, "one"), (900003L, "a a a b the to"),
          (900004L, "x  y "), (900005L, "the the the")).toDF("doc_id", "text")
      }
      .withColumn("_t", coalesce(col("text"), lit("")))
      .withColumn("_w", split(col("_t"), " "))
    // ground truth via the pre-round-9 constructions
    val words = docs.select(col("doc_id"), explode(col("_w")).as("_word"))
      .groupBy("doc_id", "_word").agg(count(lit(1)).as("_c"))
      .groupBy("doc_id").agg(
        sum("_c").as("n_words"), count(lit(1)).as("n_distinct"),
        sum(when(col("_c") === 1, 1L).otherwise(0L)).as("n_single"),
        max("_c").as("top_word"))
    val bigrams = docs.select(col("doc_id"), explode(expr(
        """CASE WHEN size(_w) < 2 THEN array()
          |ELSE transform(sequence(1, size(_w) - 1),
          |  i -> concat_ws(' ', element_at(_w, i), element_at(_w, i + 1)))
          |END""".stripMargin)).as("_bg"))
      .groupBy("doc_id", "_bg").agg(count(lit(1)).as("_c"))
      .groupBy("doc_id").agg(max("_c").as("top_bigram"),
        sum("_c").as("n_bigrams"))
    val stopTruth = docs.select(col("doc_id"),
      size(filter(col("_w"),
        t => t.isin("the", "a", "of", "and", "to", "in", "is")))
        .cast("long").as("n_stopwords"))
    val truth = words.join(bigrams, Seq("doc_id"), "left")
      .join(stopTruth, Seq("doc_id"))
      .na.fill(0, Seq("top_bigram", "n_bigrams"))
    val native = docs.select(col("doc_id"),
      TokenStats.tokenStats(col("_t")).as("_s"))
      .select(col("doc_id"), col("_s.n_words"), col("_s.n_distinct"),
        col("_s.n_single"), col("_s.top_word"), col("_s.n_stopwords"),
        col("_s.top_bigram"), col("_s.n_bigrams"))
    val cols = Seq("n_words", "n_distinct", "n_single", "top_word",
      "n_stopwords", "top_bigram", "n_bigrams")
    val bad = truth.alias("t").join(native.alias("n"), Seq("doc_id"))
      .filter(not(cols.map(c => col(s"t.$c") <=> col(s"n.$c"))
        .reduce(_ && _)))
    assert(bad.isEmpty, s"diverging docs: ${bad.take(5).mkString("; ")}")
  }

  test("FastMinhashSigs is bit-identical to the xxhash64 HOF chain") {
    val s = spark
    val k = 3
    val d = s.table("documents").select("doc_id", "text").limit(300)
      .unionByName {
        import s.implicits._
        Seq((900001L, ""), (900002L, "one two"), (900003L, "a  b   c d e"))
          .toDF("doc_id", "text")
      }
      .withColumn("_t", coalesce(col("text"), lit("")))
      .withColumn("_w", split(col("_t"), " "))
      .withColumn("_shingles", expr(
        s"""CASE WHEN size(_w) < $k THEN array(_t)
           |ELSE transform(sequence(1, size(_w) - ${k - 1}),
           |  i -> concat_ws(' ', ${(0 until k)
                .map(j => s"element_at(_w, i + $j)").mkString(", ")}))
           |END""".stripMargin))
      .withColumn("_hs", expr("transform(_shingles, s -> xxhash64(s))"))
    val hof = array((0 until 8).map(j =>
      expr(s"array_min(transform(_hs, h -> xxhash64(h, $j)))")): _*)
    val bad = d.select(hof.as("a"),
        FastMinhashSigs.fastMinhashSigs(col("_t"), k, 8).as("b"))
      .filter(not(col("a") <=> col("b")))
    assert(bad.isEmpty, s"diverging rows: ${bad.take(5).mkString("; ")}")
  }

  test("SimhashBits matches the explode + 64-column vote aggregation") {
    val s = spark
    val docs = s.table("documents").select("doc_id", "text").limit(300)
      .unionByName {
        import s.implicits._
        Seq((900001L, ""), (900002L, "one"), (900003L, "a  b "),
          (900004L, "repeat repeat repeat")).toDF("doc_id", "text")
      }
    // the pre-round-9 aggregate pipeline, verbatim
    val tokens = docs
      .select(col("doc_id"),
        explode(split(coalesce(col("text"), lit("")), " ")).as("_t"))
      .withColumn("_h", md5(col("_t")))
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
      .select(col("doc_id"), bitString.as("hof"))
    val native = docs.select(col("doc_id"),
      SimhashBits.simhashBits(coalesce(col("text"), lit(""))).as("nat"))
    val bad = hof.join(native, Seq("doc_id"))
      .filter(not(col("hof") <=> col("nat")))
    assert(bad.isEmpty, s"diverging docs: ${bad.take(5).mkString("; ")}")
    assert(native.count() == hof.count())
  }

  test("StringHamming matches the split+zip_with chain on simhash bits") {
    val s = spark
    val bits = graft.llm.Dedup.simhash(
      s.table("documents").select("doc_id", "text").limit(200))
      .select(col("simhash_bits").as("a"))
    val pairs = bits.crossJoin(
      broadcast(bits.limit(5).select(col("a").as("b"))))
    assertNoDiff(pairs,
      MatchExpressions.stringHamming(col("a"), col("b")),
      size(filter(zip_with(split(col("a"), ""), split(col("b"), ""),
        (x, y) => x =!= y), d => d)))
  }

  test("StringHamming counts over the common prefix only, like the padding") {
    val s = spark
    import s.implicits._
    val rows = Seq(("0101", "0110"), ("01", "0111"), ("1", "0"))
      .toDF("a", "b")
    assertNoDiff(rows,
      MatchExpressions.stringHamming(col("a"), col("b")),
      size(filter(zip_with(split(col("a"), ""), split(col("b"), ""),
        (x, y) => x =!= y), d => d)))
    // documented divergence: split("", "") is [""], so the HOF form
    // counts 1 against a non-empty peer; the native form says 0 — an
    // empty signature has no positions to differ. Signatures are
    // fixed-width in every caller, so the case is unreachable there.
    val empty = Seq(("", "01")).toDF("a", "b")
      .select(MatchExpressions.stringHamming(col("a"), col("b"))).collect()
    assert(empty(0).getInt(0) == 0)
  }

  test("LshSignature matches the composed per-plane chain bit for bit") {
    val s = spark
    // fixture embeddings plus positively-scaled copies (the dedup
    // corpus shape — scaling must not flip any hyperplane side)
    val e = s.table("embeddings").select("vec_id", "embedding")
    val u = e.unionAll(e.select(col("vec_id") + 100000L,
      expr("transform(embedding, x -> CAST(x * CAST(2.0 AS FLOAT) AS FLOAT))")
        .as("embedding")))
    for (planes <- Seq(12, 24, 48)) {
      assertNoDiff(u,
        MatchExpressions.lshSignature(col("embedding"), planes, 64),
        graft.llm.Similarity.lshSignatureComposed(
          col("embedding"), planes, 64))
    }
  }

  test("LshSignature edges: null array, null element, width mismatch") {
    val s = spark
    import s.implicits._
    val dim = 4
    val rows = Seq(
      (1L, Seq[java.lang.Float](1f, -2f, 3f, -4f)),
      (3L, Seq[java.lang.Float](1f, null, 3f, -4f)))
      .toDF("id", "emb")
    assertNoDiff(rows,
      MatchExpressions.lshSignature(col("emb"), 8, dim),
      graft.llm.Similarity.lshSignatureComposed(col("emb"), 8, dim))
    // a null ELEMENT yields the all-'0' signature in both forms
    val nullElem = rows.filter(col("id") === 3L)
      .select(MatchExpressions.lshSignature(col("emb"), 8, dim)).collect()
    assert(nullElem(0).getString(0) == "00000000")
    // documented divergence on a NULL ARRAY: the native form
    // null-propagates; the composed guard's size(NULL) sends raise_error
    // a NULL message and throws. Callers filter null embeddings first,
    // so only the native (saner) contract is reachable.
    val nullArr = Seq((2L, null.asInstanceOf[Seq[java.lang.Float]]))
      .toDF("id", "emb")
    assert(nullArr.select(
      MatchExpressions.lshSignature(col("emb"), 8, dim)).collect()(0).isNullAt(0))
    intercept[Exception](nullArr.select(
      graft.llm.Similarity.lshSignatureComposed(col("emb"), 8, dim)).collect())
    // width mismatch raises with the guard's message, like raise_error
    val e = intercept[Exception](
      rows.select(MatchExpressions.lshSignature(col("emb"), 8, 5)).collect())
    assert(e.getMessage.contains("built for 5-dim") ||
      Option(e.getCause).exists(_.getMessage.contains("built for 5-dim")))
  }

  /** The per-plane HOF reference: out_k = aggregate over the ±1-weighted
    * elements, ascending index — the exact loop SignedProjection fuses. */
  private def signedProjectionComposed(
      emb: Column, outDim: Int, dim: Int): Column =
    array((0 until outDim).map { k =>
      val signs = (0 until dim).map(d => graft.llm.Similarity.planeSign(d, k))
      aggregate(
        zip_with(emb.cast("array<double>"),
          typedLit(signs), (x, sgn) => x * sgn),
        lit(0.0), (acc, v) => acc + v)
    }: _*)

  test("SignedProjection matches the per-plane aggregate chain exactly") {
    val s = spark
    val e = s.table("embeddings").select("vec_id", "embedding")
    for (outDim <- Seq(4, 16)) {
      assertNoDiff(e,
        MatchExpressions.signedProjection(col("embedding"), outDim, 64),
        signedProjectionComposed(col("embedding"), outDim, 64))
    }
  }

  test("SignedProjection edges: null array, null element, width mismatch") {
    val s = spark
    import s.implicits._
    val rows = Seq(
      (1L, Seq[java.lang.Float](1f, -2f, 3f, -4f)),
      (2L, null.asInstanceOf[Seq[java.lang.Float]]),
      (3L, Seq[java.lang.Float](1f, null, 3f, -4f)))
      .toDF("id", "emb")
    val got = rows.select(col("id"),
      MatchExpressions.signedProjection(col("emb"), 8, 4).as("p"))
      .collect().map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(!got(1L)) // clean row projects
    assert(got(2L)) // NULL array null-propagates
    assert(got(3L)) // NULL element nulls the whole projection
    val e = intercept[Exception](
      rows.filter(col("id") === 1L).select(
        MatchExpressions.signedProjection(col("emb"), 8, 5)).collect())
    assert(e.getMessage.contains("built for 5-dim") ||
      Option(e.getCause).exists(_.getMessage.contains("built for 5-dim")))
  }
}
