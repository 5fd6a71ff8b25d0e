package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The ONE tokenize-and-shingle implementation every fused text
  * expression shares — the parity-critical core of the whole tier, kept
  * in a single place so the md5, fast-xxhash, and gram paths can never
  * drift apart.
  *
  * Byte-exact by construction: tokens come from the same
  * `UTF8String.split(" ", -1)` the `split` builtin calls, and windows
  * are RAW-BYTE `UTF8String.concat` joins with single spaces — no
  * java.lang.String round-trip, so invalid UTF-8 byte sequences (which
  * parquet and Spark pass through unvalidated, and web corpora contain)
  * shingle and hash exactly as the composable `concat_ws`/`md5` forms
  * processed them, instead of collapsing to U+FFFD. */
private[functions] object Shingle {
  val Space: UTF8String = UTF8String.fromString(" ")

  /** Stream each k-gram window to `f` without materializing the window
    * set — one reused parts buffer, one live shingle at a time (an
    * MB-scale document with k=5 would otherwise hold ~5× its size in
    * transient concatenations). A document with fewer than k tokens
    * yields its whole text as the single gram (`keepShortWhole`, the
    * `array(_t)` CASE branch) or nothing (the `array()` branch). */
  def foreachKgram(text: UTF8String, k: Int, keepShortWhole: Boolean)(
      f: UTF8String => Unit): Unit = {
    val words = text.split(Space, -1)
    if (words.length < k) {
      if (keepShortWhole) f(text)
    } else {
      val parts = new Array[UTF8String](2 * k - 1)
      var j = 1
      while (j < parts.length) { parts(j) = Space; j += 2 }
      var i = 0
      while (i <= words.length - k) {
        j = 0
        while (j < k) { parts(2 * j) = words(i + j); j += 1 }
        f(UTF8String.concat(parts: _*))
        i += 1
      }
    }
  }

  /** Materialized k-gram windows — for consumers that need the array
    * itself (the Kgrams expression's output). */
  def kgrams(text: UTF8String, k: Int, keepShortWhole: Boolean)
      : Array[UTF8String] = {
    val buf = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
    foreachKgram(text, k, keepShortWhole)(buf += _)
    buf.toArray
  }
}

/** The full md5-minhash signature pipeline — tokenize, k-gram shingle,
  * md5 per shingle per salt, slice each hex digest into four 32-bit
  * members, column-wise minimum — as ONE native expression returning the
  * `numHashes` signature strings.
  *
  * The composable form (`split` → `transform(sequence(...))` shingles →
  * `transform(_, md5(concat(...)))` per salt → `array_min(transform(_,
  * substring(...)))` per member) evaluates every higher-order function in
  * interpreted CodegenFallback and materializes three intermediate arrays
  * per row; its own scaladoc calls the hashing "the dominant cost of the
  * pipeline". This expression runs the same computation as a fused
  * compiled loop with no intermediates.
  *
  * Exact-parity contract with the composable form (the DuckDB oracles
  * replay it): tokenization uses the SAME `UTF8String.split(" ", -1)`
  * Spark's `split` builtin calls; a document with fewer than k tokens
  * contributes its whole text as the single shingle (the `CASE size < k`
  * branch); shingles join with single spaces as RAW-BYTE concatenations
  * ([[Shingle.kgrams]] — no java.lang.String round-trip, so invalid
  * UTF-8 bytes hash exactly as the builtin `md5` hashed them); digests
  * are lowercase-hex md5 of `shingle bytes ++ "#m"`; members are 8-char
  * substrings at 8c; the minimum is bytewise UTF8String order
  * (= lexicographic over lowercase hex). Equivalence is pinned
  * row-for-row in `MatchExpressionsSpec` and by the oracle hash gate. */
case class MinhashSigs(child: Expression, k: Int, numHashes: Int)
    extends UnaryExpression {

  require(k > 0, "shingle width k must be positive")
  require(numHashes > 0, "numHashes must be positive")

  override def prettyName: String = "minhash_sigs"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${t.sql}")
  }

  @transient private lazy val numMd5 = (numHashes + 3) / 4
  @transient private lazy val salts: Array[Array[Byte]] =
    Array.tabulate(numMd5)(m =>
      ("#" + m).getBytes(java.nio.charset.StandardCharsets.UTF_8))

  // one digest per thread: the expression instance travels through the
  // codegen references array and is shared across concurrent tasks
  @transient private lazy val digests =
    ThreadLocal.withInitial[MessageDigest](() =>
      MessageDigest.getInstance("MD5"))

  private def hex(bytes: Array[Byte]): String = {
    val out = new Array[Char](bytes.length * 2)
    val digits = "0123456789abcdef"
    var i = 0
    while (i < bytes.length) {
      out(2 * i) = digits((bytes(i) >> 4) & 0xf)
      out(2 * i + 1) = digits(bytes(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  /** public: called from generated code. */
  def sigs(text: UTF8String): ArrayData = {
    val md = digests.get()
    val mins = new Array[String](numHashes)
    // shingle-outer loop streams one window at a time (Shingle.foreachKgram
    // never materializes the window set); the min commutes, so the
    // (shingle, salt) iteration order is irrelevant to the result
    Shingle.foreachKgram(text, k, keepShortWhole = true) { shingle =>
      val bytes = shingle.getBytes
      var m = 0
      while (m < numMd5) {
        md.reset()
        md.update(bytes)
        md.update(salts(m))
        val h = hex(md.digest())
        var c = 0
        while (c < 4 && 4 * m + c < numHashes) {
          val j = 4 * m + c
          val member = h.substring(8 * c, 8 * c + 8)
          if (mins(j) == null || member.compareTo(mins(j)) < 0) mins(j) = member
          c += 1
        }
        m += 1
      }
    }
    new GenericArrayData(mins.map(UTF8String.fromString(_): Any))
  }

  override def nullSafeEval(a: Any): Any = sigs(a.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("minhashSigs", this,
      classOf[MinhashSigs].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.sigs($a);")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : MinhashSigs = copy(child = newChild)
}

object MinhashSigs {
  def minhashSigs(text: Column, k: Int, numHashes: Int): Column =
    ColumnBridge.column(MinhashSigs(
      ColumnBridge.expression(text), k, numHashes))
}

/** Word k-gram shingles of a text column as ONE native expression — the
  * fused form of the `CASE size(_w) < k … transform(sequence(...),
  * concat_ws(' ', element_at(...)))` HOF chain ([[graft.llm.TextOps]]
  * `kgramSql`), which evaluates interpreted and allocates the token and
  * window arrays per row.
  *
  * Parity contract (oracle-replayed): tokens come from the same
  * `UTF8String.split(" ", -1)` the `split` builtin uses; a document with
  * fewer than k tokens yields its WHOLE text as the single gram when
  * `keepShortWhole` (the `array(_t)` branch) or no grams otherwise (the
  * `array()` branch); windows join with single spaces. */
case class Kgrams(child: Expression, k: Int, keepShortWhole: Boolean)
    extends UnaryExpression {

  require(k > 0, "gram width k must be positive")

  override def prettyName: String = "kgrams"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${t.sql}")
  }

  /** public: called from generated code. */
  def grams(text: UTF8String): ArrayData =
    new GenericArrayData(
      Shingle.kgrams(text, k, keepShortWhole).asInstanceOf[Array[Any]])

  override def nullSafeEval(a: Any): Any = grams(a.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("kgrams", this, classOf[Kgrams].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.grams($a);")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : Kgrams = copy(child = newChild)
}

object Kgrams {
  def kgrams(text: Column, k: Int, keepShortWhole: Boolean): Column =
    ColumnBridge.column(Kgrams(
      ColumnBridge.expression(text), k, keepShortWhole))
}

/** The 64-bit SimHash signature of a document as ONE native expression
  * returning the 64-char '0'/'1' bitstring — a pure ZERO-SHUFFLE
  * projection, where the composable form exploded the token stream and
  * ran a 64-column vote aggregation (a corpus-wide shuffle carrying 64
  * longs per doc; fine at scale, but a shuffle that never needed to
  * exist — the signature is a per-row function of the text).
  *
  * Parity contract with the aggregate form (oracle-replayed): tokens are
  * `UTF8String.split(" ", -1)` of the text (the exploded `split`,
  * including empty tokens — an empty document contributes the single
  * token "" exactly like `explode(split('', ' '))`); each token's vote
  * words are the first/second 8 hex chars of its md5 parsed as unsigned
  * 32-bit values (`conv(_, 16, 10)`); bit b of word w votes +1 when
  * `(w div 2^b) % 2 = 1` else −1; output bit b is '1' iff the vote sum
  * is strictly positive. Bit order is b = 0..63 left to right. */
case class SimhashBits(child: Expression) extends UnaryExpression {

  override def prettyName: String = "simhash_bits"
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${t.sql}")
  }

  @transient private lazy val spacePattern = UTF8String.fromString(" ")
  @transient private lazy val digests =
    ThreadLocal.withInitial[MessageDigest](() =>
      MessageDigest.getInstance("MD5"))

  /** public: called from generated code. */
  def bits(text: UTF8String): UTF8String = {
    val tokens = text.split(spacePattern, -1)
    val votes = new Array[Int](64)
    val md = digests.get()
    var t = 0
    while (t < tokens.length) {
      md.reset()
      val d = md.digest(tokens(t).getBytes)
      // first/second 8 hex chars = bytes 0-3 / 4-7 as unsigned 32-bit
      var w1 = 0L
      var w2 = 0L
      var i = 0
      while (i < 4) {
        w1 = (w1 << 8) | (d(i) & 0xffL)
        w2 = (w2 << 8) | (d(i + 4) & 0xffL)
        i += 1
      }
      var b = 0
      while (b < 32) {
        votes(b) += (if (((w1 >>> b) & 1L) == 1L) 1 else -1)
        votes(b + 32) += (if (((w2 >>> b) & 1L) == 1L) 1 else -1)
        b += 1
      }
      t += 1
    }
    val out = new Array[Char](64)
    var b = 0
    while (b < 64) {
      out(b) = if (votes(b) > 0) '1' else '0'
      b += 1
    }
    UTF8String.fromString(new String(out))
  }

  override def nullSafeEval(a: Any): Any = bits(a.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("simhashBits", this,
      classOf[SimhashBits].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.bits($a);")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : SimhashBits = copy(child = newChild)
}

object SimhashBits {
  def simhashBits(text: Column): Column =
    ColumnBridge.column(SimhashBits(ColumnBridge.expression(text)))
}

/** Per-document token statistics — every per-row count the
  * repetition/quality tier needs, in ONE compiled pass over the token
  * stream: total tokens, distinct tokens, singleton tokens, the top
  * token's count, stopword hits, the top bigram's count, and the bigram
  * total. Replaces (a) two explode → partial-agg → join pipelines in
  * `repetitionMetrics` whose shuffles carried (doc_id, token) counts for
  * what is a per-row function of the text, and (b) the
  * `array_max(transform(array_distinct(_w), t -> size(filter(_w, …))))`
  * top-word chain in `gopherFilter` — interpreted AND O(distinct × n)
  * per row where a hash count is O(n).
  *
  * Parity contract (oracle-replayed): tokens are `UTF8String.split(" ",
  * -1)` of the text (an empty document is the single token "", exactly
  * like the exploded `split`); distinct/equality is exact bytewise
  * match; bigrams are adjacent tokens joined with one space (the k=2
  * gram); stopwords are the same 7-word list as
  * [[graft.llm.TextOps]]`.stopwordHitsW`; documents with fewer than two
  * tokens have zero bigrams (`n_bigrams = 0`). */
case class TokenStats(child: Expression) extends UnaryExpression {

  override def prettyName: String = "token_stats"
  override def dataType: DataType = StructType(Seq(
    StructField("n_words", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false),
    StructField("n_single", LongType, nullable = false),
    StructField("top_word", LongType, nullable = false),
    StructField("n_stopwords", LongType, nullable = false),
    StructField("top_bigram", LongType, nullable = false),
    StructField("n_bigrams", LongType, nullable = false)))
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${t.sql}")
  }

  @transient private lazy val spacePattern = UTF8String.fromString(" ")
  @transient private lazy val stopwordSet: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String]()
    graft.functions.TokenStats.Stopwords
      .foreach(t => s.add(UTF8String.fromString(t)))
    s
  }

  /** public: called from generated code. */
  def stats(text: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    // UTF8String keys throughout — byte-exact equality (invalid UTF-8
    // sequences stay distinct, as the explode-aggregate truth counted
    // them), no String decode per token
    val words = text.split(spacePattern, -1)
    val n = words.length
    val wordCounts = new java.util.HashMap[UTF8String, Long](n * 2)
    var nStop = 0L
    var i = 0
    while (i < n) {
      val w = words(i)
      wordCounts.merge(w, 1L, (a, b) => a + b)
      if (stopwordSet.contains(w)) nStop += 1
      i += 1
    }
    var nSingle = 0L
    var topWord = 0L
    val it = wordCounts.values().iterator()
    while (it.hasNext) {
      val c = it.next()
      if (c == 1L) nSingle += 1
      if (c > topWord) topWord = c
    }
    var topBigram = 0L
    var nBigrams = 0L
    if (n >= 2) {
      nBigrams = n - 1L
      val bigramCounts = new java.util.HashMap[UTF8String, Long](n * 2)
      i = 0
      while (i < n - 1) {
        val bg = UTF8String.concat(words(i), Shingle.Space, words(i + 1))
        val c = bigramCounts.merge(bg, 1L, (a, b) => a + b)
        if (c > topBigram) topBigram = c
        i += 1
      }
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](n.toLong, wordCounts.size.toLong, nSingle, topWord, nStop,
        topBigram, nBigrams))
  }

  override def nullSafeEval(a: Any): Any = stats(a.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("tokenStats", this,
      classOf[TokenStats].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.stats($a);")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : TokenStats = copy(child = newChild)
}

object TokenStats {
  /** the Gopher-rule stopword list — MUST stay identical to
    * [[graft.llm.TextOps]]'s. */
  private[graft] val Stopwords =
    Seq("the", "a", "of", "and", "to", "in", "is")

  def tokenStats(text: Column): Column =
    ColumnBridge.column(TokenStats(ColumnBridge.expression(text)))
}

/** Count of array elements contained in a fixed token set — the
  * `size(filter(w, t -> t.isin(...)))` chain (stopword hits, language
  * profiles) as one compiled loop instead of an interpreted lambda pass
  * per set. NULL elements never match (`isin` on NULL filters out);
  * NULL array yields NULL. */
case class TokenSetCount(child: Expression, tokens: Seq[String])
    extends UnaryExpression {

  require(tokens.nonEmpty, "token set must be non-empty")

  override def prettyName: String = "token_set_count"
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${t.sql}")
  }

  @transient private lazy val set: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String]()
    tokens.foreach(t => s.add(UTF8String.fromString(t)))
    s
  }

  /** public: called from generated code. */
  def countIn(arr: ArrayData): Long = {
    var c = 0L
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i) && set.contains(arr.getUTF8String(i))) c += 1
      i += 1
    }
    c
  }

  override def nullSafeEval(a: Any): Any = countIn(a.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("tokenSetCount", this,
      classOf[TokenSetCount].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.countIn($a);")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : TokenSetCount = copy(child = newChild)
}

object TokenSetCount {
  def tokenSetCount(arr: Column, tokens: Seq[String]): Column =
    ColumnBridge.column(TokenSetCount(
      ColumnBridge.expression(arr), tokens))
}

/** The xxhash64 ("fast") minhash signature family as ONE native
  * expression returning `numHashes` longs — the candidate-generation
  * path that skips md5. Parity with the composable
  * `array_min(transform(_hs, h -> xxhash64(h, j)))` chain is by
  * construction: it calls the SAME `XXH64` primitives Spark's `xxhash64`
  * builtin generates — `hashUTF8String(shingle, 42)` for the base hash,
  * then `hashInt(j, hashLong(base, 42))` per family member — and takes
  * the signed-long minimum, so every signature value is bit-identical to
  * the HOF form. Shingles are the keep-short-whole [[Kgrams]] windows. */
case class FastMinhashSigs(child: Expression, k: Int, numHashes: Int)
    extends UnaryExpression {

  require(k > 0, "shingle width k must be positive")
  require(numHashes > 0, "numHashes must be positive")

  override def prettyName: String = "fast_minhash_sigs"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${t.sql}")
  }

  /** public: called from generated code. */
  def sigs(text: UTF8String): ArrayData = {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    val mins = new Array[Long](numHashes)
    java.util.Arrays.fill(mins, Long.MaxValue)
    Shingle.foreachKgram(text, k, keepShortWhole = true) { shingle =>
      val base = XXH64.hashUTF8String(shingle, 42L)
      val rehashSeed = XXH64.hashLong(base, 42L)
      var j = 0
      while (j < numHashes) {
        val h = XXH64.hashInt(j, rehashSeed)
        if (h < mins(j)) mins(j) = h
        j += 1
      }
    }
    new GenericArrayData(mins)
  }

  override def nullSafeEval(a: Any): Any = sigs(a.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("fastMinhashSigs", this,
      classOf[FastMinhashSigs].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.sigs($a);")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : FastMinhashSigs = copy(child = newChild)
}

object FastMinhashSigs {
  def fastMinhashSigs(text: Column, k: Int, numHashes: Int): Column =
    ColumnBridge.column(FastMinhashSigs(
      ColumnBridge.expression(text), k, numHashes))
}

/** Per-document character statistics — the gibberish/encoding-damage
  * signal tier in ONE compiled pass over the codepoint stream: codepoint
  * count, distinct codepoints, the dominant codepoint's share, and the
  * Shannon entropy of the character distribution. Natural text sits in a
  * narrow entropy band per script; base64 blobs, binary spills, and
  * key-mash gibberish sit high, single-character run damage sits low —
  * a char-level quality filter no token statistic can express.
  *
  * The composable form would explode the corpus to (doc, char) rows and
  * shuffle character counts at corpus scale for what is a per-row
  * function of the text; this expression is a zero-shuffle projection.
  *
  * Parity contract (oracle-replayed): granularity is Unicode CODEPOINTS
  * — DuckDB's `string_split(t, '')` characters — not UTF-16 units or
  * bytes (invalid UTF-8 input takes the JVM replacement-char decode; the
  * oracle gate runs on valid-UTF-8 fixtures). The entropy is the exact
  * order-independent DECIMAL replay of the catalog convention
  * ([[graft.llm.Similarity]].coverageCard): per-character term
  * `round(-p·ln p, 12)` (Spark `round` = BigDecimal HALF_UP, then the
  * double→DECIMAL(28,12) cast), terms summed EXACTLY as decimals, the
  * sum cast to double and rounded to 6 — so JVM and DuckDB cannot drift
  * on float addition order. An empty document (0 codepoints) reports
  * zero counts, share 0.0, entropy 0.0. */
case class CharStats(child: Expression) extends UnaryExpression {

  override def prettyName: String = "char_stats"
  override def dataType: DataType = StructType(Seq(
    StructField("n_chars", LongType, nullable = false),
    StructField("n_distinct_chars", LongType, nullable = false),
    StructField("top_char_frac", DoubleType, nullable = false),
    StructField("char_entropy", DoubleType, nullable = false)))
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${t.sql}")
  }

  /** public: called from generated code. */
  def stats(text: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    import java.math.{BigDecimal => JBD, RoundingMode}
    val s = text.toString
    val counts = new java.util.HashMap[Integer, Long](64)
    var n = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      counts.merge(Integer.valueOf(cp), 1L, (a, b) => a + b)
      n += 1
      i += Character.charCount(cp)
    }
    var top = 0L
    var entropySum = JBD.ZERO
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c = it.next()
      if (c > top) top = c
      val p = c.toDouble / n.toDouble
      // Spark round(x, 12) then the double→DECIMAL(28,12) cast, exactly
      val rounded = JBD.valueOf(-p * math.log(p))
        .setScale(12, RoundingMode.HALF_UP).doubleValue
      entropySum = entropySum.add(
        JBD.valueOf(rounded).setScale(12, RoundingMode.HALF_UP))
    }
    val topFrac = if (n == 0L) 0.0
      else JBD.valueOf(top.toDouble / n.toDouble)
        .setScale(6, RoundingMode.HALF_UP).doubleValue
    val entropy = if (n == 0L) 0.0
      else JBD.valueOf(entropySum.doubleValue)
        .setScale(6, RoundingMode.HALF_UP).doubleValue
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](n, counts.size.toLong, topFrac, entropy))
  }

  override def nullSafeEval(a: Any): Any = stats(a.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("charStats", this,
      classOf[CharStats].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.stats($a);")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : CharStats = copy(child = newChild)
}

object CharStats {
  def charStats(text: Column): Column =
    ColumnBridge.column(CharStats(ColumnBridge.expression(text)))
}
