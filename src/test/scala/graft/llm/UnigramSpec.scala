package graft.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Hand pins for the unigram-LM tokenizer (the BpeSpec discipline):
  * seeding, Viterbi segmentation incl. tie-breaks, EM count updates,
  * OOV behavior on unseen text, the either-model fertility card, and
  * the store round trip. */
class UnigramSpec extends AnyFunSuite {

  private def spark = SparkTestSession.withTables()

  private def corpus(rows: (Long, String)*) = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "text")
  }

  test("wordFreq mirrors the BPE convention: split, alnum filter, freq") {
    val d = corpus((1L, "ab ab X cd-e"), (2L, "ab cd9"))
    val got = Unigram.wordFreq(d).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // "X" (uppercase) and "cd-e" (hyphen) are untrainable
    assert(got == Map("ab" -> 3L, "cd9" -> 1L))
  }

  test("viterbi segments by probability, not greedily — a strong whole " +
    "piece beats char-by-char, a weak one loses") {
    val s = spark
    import s.implicits._
    val words = Seq(("abc", 1L)).toDF("word", "freq")
    def vocab(abcLogp: String) = Seq(
      ("a", "-1.000000"), ("b", "-1.000000"), ("c", "-1.000000"),
      ("abc", abcLogp)).toDF("piece", "_ls")
      .select(col("piece"), col("_ls").cast("decimal(18,6)").as("logp"))
    // abc at -2.0 beats a+b+c at -3.0
    val strong = Unigram.viterbiSegment(words, vocab("-2.000000"), 4)
      .collect().head
    assert(strong.getString(2) == "abc" && strong.getLong(3) == 1L)
    // abc at -3.5 loses to a+b+c at -3.0
    val weak = Unigram.viterbiSegment(words, vocab("-3.500000"), 4)
      .collect().head
    assert(weak.getString(2) == "a b c" && weak.getLong(3) == 3L)
  }

  test("viterbi tie-break is (score, seg) max — deterministic and " +
    "engine-shared") {
    val s = spark
    import s.implicits._
    val words = Seq(("ab", 1L)).toDF("word", "freq")
    // "ab" (1 piece at -2.0) ties "a b" (2 pieces at -1.0 each):
    // lexicographically "ab" > "a b" (space < 'b'), so "ab" wins
    val vocab = Seq(("a", "-1.000000"), ("b", "-1.000000"),
      ("ab", "-2.000000")).toDF("piece", "_ls")
      .select(col("piece"), col("_ls").cast("decimal(18,6)").as("logp"))
    val got = Unigram.viterbiSegment(words, vocab, 4).collect().head
    assert(got.getString(2) == "ab")
  }

  test("a word with a character outside the vocabulary keeps NULL seg " +
    "(the OOV apply contract)") {
    val s = spark
    import s.implicits._
    val words = Seq(("axb", 1L)).toDF("word", "freq")
    val vocab = Seq(("a", "-1.000000"), ("b", "-1.000000"))
      .toDF("piece", "_ls")
      .select(col("piece"), col("_ls").cast("decimal(18,6)").as("logp"))
    val got = Unigram.viterbiSegment(words, vocab, 4).collect().head
    assert(got.isNullAt(2) && got.isNullAt(3))
  }

  test("train: every corpus character survives seeding, counts are " +
    "freq-weighted Viterbi usage, and probs live on the 6-dp lattice") {
    val s = spark
    // "aaab" x2, "ab" x1 — tiny corpus, seedSize 3 forces the
    // single-char union branch to matter
    val d = corpus((1L, "aaab aaab ab"))
    val m = Unigram.train(s, d, maxPieceLen = 3, seedSize = 3, iters = 2)
    val pieces = m.pieces.collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    // single chars a and b are present regardless of the top-3 cut
    assert(pieces.contains("a") && pieces.contains("b"))
    // usage counts: total piece uses equal total pieces across the
    // freq-weighted segmentations of the final-iteration round
    val vocabRows = m.vocab.collect()
    assert(vocabRows.forall(!_.isNullAt(2)),
      "every training word must segment (all chars seeded)")
    // logp scale 6 decimals
    val lp = m.pieces.select("logp").collect().map(_.getDecimal(0))
    assert(lp.forall(_.scale == 6))
  }

  test("EM+prune is Kudo's alternation: a piece that survives EM " +
    "(add-one smoothing keeps it alive) dies at prune, single chars " +
    "are immortal, and probs renormalize over the survivors") {
    val s = spark
    // words: aaab (freq 2), ab (freq 1); seed = all 6 substrings.
    // EM round 1 segments aaab -> "a aab", ab -> "ab", so counts are
    // a:2, aab:2, ab:1, aa:0, aaa:0, b:0. Prune target =
    // max(3, 6*3/4) = 4 -> keep ranks {a, aab, ab, aa}; aaa and b are
    // cut, b returns as an immortal single. aaa SURVIVED the EM step
    // (smoothing floors every piece above -inf) and died only at prune.
    val d = corpus((1L, "aaab aaab ab"))
    val unpruned = Unigram.train(s, d, maxPieceLen = 3, seedSize = 8,
      iters = 1)
    val pruned = Unigram.train(s, d, maxPieceLen = 3, seedSize = 8,
      iters = 1, vocabSize = 3)
    val upPieces = unpruned.pieces.collect().map(_.getString(0)).toSet
    assert(upPieces == Set("a", "aa", "aaa", "aab", "ab", "b"),
      s"no-prune path keeps the whole seed: $upPieces")
    val prPieces = pruned.pieces.collect()
      .map(r => r.getString(0) -> r.getDecimal(2)).toMap
    assert(prPieces.keySet == Set("a", "aa", "aab", "ab", "b"),
      s"prune drops aaa, keeps rank<=4 + immortal b: ${prPieces.keySet}")
    // renormalized over survivors: T = 2+2+1+0+0 = 5, V = 5 ->
    // logp(a) = round(ln((2+1)/(5+5)), 6) = -1.203973
    assert(prPieces("a").toPlainString == "-1.203973",
      s"smoothing must renormalize over the 5 survivors: ${prPieces("a")}")
    // the pruned model still segments every training word
    assert(pruned.vocab.collect().forall(!_.isNullAt(2)))
  }

  test("prune tie-break compares UTF-8 bytes, matching Spark's string " +
    "order where Scala's UTF-16 order diverges (r16 advice: today's " +
    "^[a-z0-9]+$ word filter keeps pieces ASCII, so this hardens the " +
    "driver sort against any future alphabet widening)") {
    val s = spark
    import s.implicits._
    val smiley = new String(Character.toChars(0x1F600)) // supplementary
    val pieces = Seq("a", "ab", "z", "\u00e9", "\uFFFD", smiley,
      smiley + "a", "")
    val utf8Sorted = pieces.sortWith(Unigram.utf8Less)
    // the orders genuinely diverge on this set: UTF-16 code units rank
    // the surrogate pair (0xD83D...) BELOW U+E000/U+FFFD, UTF-8 above
    assert(pieces.sorted != utf8Sorted,
      "fixture must exercise the divergence or the pin is vacuous")
    val sparkOrder = pieces.toDF("piece").orderBy("piece")
      .collect().map(_.getString(0)).toSeq
    assert(utf8Sorted == sparkOrder,
      s"driver sort must replay Spark's binary order: $utf8Sorted " +
        s"vs $sparkOrder")
  }

  test("multi-round prune shrinks by 3/4 toward vocabSize and stops " +
    "once at/below it") {
    val s = spark
    // fixture corpus: unpruned card is ~61 pieces at these params; two
    // rounds of ceil-free 3/4 shrink (61 -> max(40, 45) -> max(40, 33)
    // = 40) land exactly on vocabSize + the immortal-singles overflow
    val card = Unigram.unigramLmCard(s, s.table("documents"),
      maxPieceLen = 4, seedSize = 60, iters = 2, vocabSize = 40)
      .collect()
    assert(card.length >= 40 && card.length <= 45,
      s"final vocab = vocabSize + immortal singles, got ${card.length}")
    assert(card.count(_.getString(0).length == 1) > 0,
      "single chars survive every prune")
  }

  test("seed selection plans as a distributed TakeOrderedAndProject — " +
    "never a single-partition window over the data-dependent " +
    "substring-count relation") {
    val s = spark
    import s.implicits._
    val words = Seq(("aaab", 2L), ("ab", 1L)).toDF("word", "freq")
    val p = Unigram.seedSelect(words, 3, 8)
      .queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"),
      s"top-seedSize must ride per-partition heaps + bounded merge:\n$p")
    assert(!p.contains("Window"),
      s"no global window may touch the substring-count relation:\n$p")
  }

  test("unigramLmCard: rank is (n_uses desc, piece asc), keep flags the " +
    "top vocabSize, and single-char coverage holds on the fixture") {
    val s = spark
    val card = Unigram.unigramLmCard(s, s.table("documents"),
      maxPieceLen = 4, seedSize = 60, iters = 2, vocabSize = 40)
      .collect()
    val byRank = card.sortBy(_.getInt(3))
    assert(byRank.map(_.getInt(3)).toSeq == (1 to card.length))
    // rank order: n_uses non-increasing, piece asc within ties
    byRank.sliding(2).foreach { case Array(a, b) =>
      assert(a.getLong(1) > b.getLong(1) ||
        (a.getLong(1) == b.getLong(1) &&
          a.getString(0) < b.getString(0)))
    }
    assert(card.count(_.getBoolean(4)) == math.min(40, card.length))
    // multi-char pieces actually won usage (EM did something)
    assert(card.exists(r => r.getString(0).length > 1 && r.getLong(1) > 0))
  }

  test("fertilityCard accepts the unigram vocab: in-vocab words count " +
    "pieces, untrainable words count as OOV") {
    val s = spark
    import s.implicits._
    val d = Seq((1L, "en", "aaab ab X!"), (2L, "fr", "ab"))
      .toDF("doc_id", "lang", "text")
    val m = Unigram.train(s, d, maxPieceLen = 3, seedSize = 8, iters = 1)
    val card = Bpe.fertilityCard(d, m.vocab).collect()
      .map(r => r.getString(0) -> r).toMap
    // en: words aaab, ab, X! -> X! is OOV (untrainable)
    assert(card("en").getLong(1) == 3L && card("en").getLong(2) == 1L)
    assert(card("fr").getLong(1) == 1L && card("fr").getLong(2) == 0L)
    // fertility = pieces per in-vocab word, > 0
    assert(card("en").getDouble(4) > 0.0)
  }

  test("viterbi OPTIMALITY: on seeded random words and vocabularies, " +
    "the DP's best score equals the brute-force max over every " +
    "segmentation") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(424242L)
    val alphabet = "ab"
    // random vocab: all single chars (coverage) + random pieces <= 3
    val pieces = (Seq("a", "b") ++ (1 to 6).map { _ =>
      (1 to (1 + rnd.nextInt(3)))
        .map(_ => alphabet(rnd.nextInt(2))).mkString
    }).distinct
    val logp = pieces.map(p =>
      p -> BigDecimal(-(1 + rnd.nextInt(400)) / 100.0).setScale(6)).toMap
    val vocab = logp.toSeq
      .map { case (p, v) => (p, v.underlying.toPlainString) }
      .toDF("piece", "_ls")
      .select(col("piece"), col("_ls").cast("decimal(18,6)").as("logp"))
    val words = (1 to 30).map(_ => (1 to (1 + rnd.nextInt(6)))
      .map(_ => alphabet(rnd.nextInt(2))).mkString).distinct
      .map((_, 1L))

    // brute force: enumerate every segmentation into pieces <= 3 chars
    def bestScore(w: String): Option[BigDecimal] = {
      def segs(rest: String): Seq[Seq[String]] =
        if (rest.isEmpty) Seq(Seq.empty)
        else (1 to math.min(3, rest.length)).flatMap { l =>
          val p = rest.take(l)
          if (logp.contains(p)) segs(rest.drop(l)).map(p +: _) else Nil
        }
      val all = segs(w)
      if (all.isEmpty) None
      else Some(all.map(_.map(logp).sum).max)
    }

    val got = Unigram.viterbiSegment(words.toDF("word", "freq"),
        vocab, maxPieceLen = 3)
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(2)) None else Some(r.getString(2)))).toMap
    for (w <- words.map(_._1)) {
      (bestScore(w), got(w)) match {
        case (None, seg) => assert(seg.isEmpty, s"$w should be OOV")
        case (Some(best), Some(seg)) =>
          val segScore = seg.split(" ").toSeq.map(logp).sum
          assert(segScore == best,
            s"$w: DP picked $seg at $segScore, brute-force max is $best")
        case (some, none) => fail(s"$w: expected $some, got $none")
      }
    }
  }

  test("encode: per-doc word/OOV/piece counts, wordless docs preserved " +
    "with zeros, untrainable words count as OOV") {
    val s = spark
    import s.implicits._
    val d = Seq(
      (1L, "aaab ab"),        // both trainable
      (2L, "ab X! unseen-x"), // 1 trainable + 2 untrainable words
      (3L, ""),               // wordless
      (4L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val m = Unigram.train(s, d, maxPieceLen = 3, seedSize = 8, iters = 1)
    val got = Unigram.encode(d, m).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got.size == 4, "rows preserved")
    assert(got(1L)._1 == 2L && got(1L)._2 == 0L && got(1L)._3 >= 2L)
    assert(got(2L) == ((3L, 2L, got(2L)._3)) && got(2L)._3 >= 1L)
    assert(got(3L) == ((0L, 0L, 0L)) && got(4L) == ((0L, 0L, 0L)))
    // piece counts agree with the model's own segmentation table
    val vocabPieces = m.vocab.collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(got(1L)._3 == vocabPieces("aaab") + vocabPieces("ab"))
  }

  test("save/load round trip preserves pieces, vocab, and meta") {
    val s = spark
    val d = corpus((1L, "abc abd abc"))
    val m = Unigram.train(s, d, maxPieceLen = 3, seedSize = 6, iters = 1)
    val dir = java.nio.file.Files
      .createTempDirectory("graft-unigram").toString
    Unigram.saveUnigramModel(m, dir)
    val back = Unigram.loadUnigramModel(s, dir)
    assert(back.maxPieceLen == 3)
    assert(back.pieces.collect().map(_.getString(0)).sorted.toSeq ==
      m.pieces.collect().map(_.getString(0)).sorted.toSeq)
    assert(back.vocab.count() == m.vocab.count())
  }
}
