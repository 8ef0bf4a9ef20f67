package graft

import graft.ops.Unigram
import org.apache.spark.sql.functions._

/** Unigram-LM tokenizer training (ops/Unigram.scala) — the hard-EM
  * SentencePiece variant with exact-integer Viterbi scoring. The driver row
  * t153 is rows-only (a per-word DP resists SQL replay — the s36
  * precedent), so these specs carry the correctness bound: golden
  * fixtures for the seed, the DP (score, fewer-pieces and lexicographic
  * tie-breaks), a full golden training run, cross-run determinism, and
  * the coverage/OOV contracts. */
class UnigramSpec extends SparkSpec {
  import spark.implicits._

  private def powT(total: Long, n: Int): Array[BigInt] = {
    val a = new Array[BigInt](n + 2); a(0) = BigInt(1)
    for (k <- 1 to n + 1) a(k) = a(k - 1) * BigInt(total)
    a
  }

  test("seedVocab: golden substring counts, single chars always kept") {
    val docs = Seq("ab ab b").toDF("text")
    val got = Unigram.seedVocab(docs, "text", maxPieceLen = 2, seedSize = 100)
      .as[(String, Long)].collect().toMap
    // words: ab(2), b(1); substrings of ab: a, ab, b (each twice via c=2)
    assert(got == Map("a" -> 2L, "ab" -> 2L, "b" -> 3L))
    // a seedSize cut below the alphabet still keeps every single char
    val cut = Unigram.seedVocab(docs, "text", maxPieceLen = 2, seedSize = 1)
      .as[(String, Long)].collect().toMap
    assert(cut.keySet.contains("a") && cut.keySet.contains("b"))
  }

  test("viterbi: best segmentation exact, fewer-pieces tie-break, coverage None") {
    // [ab] = 2/4 beats [a,b] = 1/16
    assert(Unigram.viterbi("ab", Map("a" -> 1L, "b" -> 1L, "ab" -> 2L),
      powT(4L, 2), 2).contains(List("ab")))
    // EXACT score tie (1/10 both ways: c_ab·T = 1·10 = c_a·c_b = 2·5):
    // fewer pieces wins
    assert(Unigram.viterbi("ab", Map("a" -> 2L, "b" -> 5L, "ab" -> 1L, "z" -> 2L),
      powT(10L, 2), 2).contains(List("ab")))
    // a character missing from the vocab → no segmentation
    assert(Unigram.viterbi("ax", Map("a" -> 1L), powT(1L, 2), 2).isEmpty)
    // lexicographic tie-break at equal score and k: "aa" under equal-count
    // pieces "a"/"aa" has one 1-piece and one 2-piece option — construct a
    // 3-char word with two same-k same-product splits instead:
    // "aba": [ab,a] prod c_ab·c_a vs [a,ba] prod c_a·c_ba; equal counts →
    // equal product, k=2 both → first differing piece "a" < "ab" picks [a,ba]
    assert(Unigram.viterbi("aba",
      Map("a" -> 3L, "b" -> 1L, "ab" -> 2L, "ba" -> 2L),
      powT(8L, 3), 2).contains(List("a", "ba")))
  }

  test("train: golden run, ranks by (count desc, piece asc), chars floored") {
    val docs = Seq("abab abab ab").toDF("text")
    val got = Unigram.train(docs, "text", vocabSize = 5, maxPieceLen = 4,
        seedSize = 100, emIters = 2)
      .orderBy("rank").as[(Long, String, Long)].collect().toSeq
    // hard EM picks [abab] for the 2-count word and [ab] for the 1-count
    // word; unchosen multi pieces prune away; chars floor at 1
    assert(got == Seq((1L, "abab", 2L), (2L, "a", 1L), (3L, "ab", 1L), (4L, "b", 1L)))
  }

  test("train: supplementary-plane char keeps the count-1 floor (codepoint semantics, r16 advice)") {
    // U+1D11E (musical G clef): ONE codepoint, TWO Java chars. The seed
    // stage counts codepoints (Spark char_length/substring), so the clef
    // arrives as a 1-codepoint piece; train's retention set must classify
    // it as a single char — a String.length test would deny it the
    // count-1 floor, prune it, and every word containing it would then
    // silently vanish from EM (viterbi None), breaking coverage.
    val clef = new String(Character.toChars(0x1D11E))
    val docs = Seq(s"abab abab x$clef").toDF("text")
    val got = Unigram.train(docs, "text", vocabSize = 4, maxPieceLen = 2,
        seedSize = 100, emIters = 2)
      .as[(Long, String, Long)].collect().toSeq
    val pieces = got.map(_._2).toSet
    assert(pieces.contains(clef), s"clef pruned from vocab: $pieces")
    // the clef word stays encodable end-to-end
    val enc = Unigram.encode(Seq((1L, s"x$clef")).toDF("doc_id", "text"),
        "doc_id", "text", got.map(r => r._2 -> r._3).toMap, maxPieceLen = 2)
      .as[(Long, Seq[String], Long)].collect().head
    assert(enc._2.mkString == s"x$clef", s"encode lost the clef: ${enc._2}")
  }

  test("train: deterministic across runs; every corpus char kept; size bounded") {
    val docs = core.Tables.documents(spark, sf("sf0.001")).limit(60)
    def run() = Unigram.train(docs, "text", vocabSize = 64, maxPieceLen = 4,
      seedSize = 300, emIters = 2).orderBy("rank")
      .as[(Long, String, Long)].collect().toSeq
    val a = run(); val b = run()
    assert(a == b, "two training runs diverged")
    assert(a.nonEmpty && a.map(_._1) == (1L to a.length))
    // counts are non-increasing down the ranking
    assert(a.sliding(2).forall(p => p.head._3 >= p.last._3))
    // every single char of every trainable word is in the vocabulary
    val chars = docs.select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")).between(1, 48))
      .select(explode(expr(
        "transform(sequence(1, char_length(w)), i -> substring(w, i, 1))")).as("ch"))
      .distinct().as[String].collect().toSet
    assert(chars.subsetOf(a.map(_._2).toSet))
  }

  test("encode: Viterbi pieces in word order, OOV word surfaces whole") {
    val vocab = Map("a" -> 2L, "b" -> 2L, "ab" -> 3L, "abab" -> 2L)
    val docs = Seq((1L, "abab ab zq"), (2L, "")).toDF("doc_id", "text")
    val got = Unigram.encode(docs, "doc_id", "text", vocab, maxPieceLen = 4)
      .orderBy("id").as[(Long, Seq[String], Long)].collect().toSeq
    assert(got == Seq((1L, Seq("abab", "ab", "zq"), 3L), (2L, Seq.empty[String], 0L)))
    // round-trip: concatenating a word's pieces reproduces the word
    val trained = Unigram.train(
      core.Tables.documents(spark, sf("sf0.001")).limit(40), "text",
      vocabSize = 96, maxPieceLen = 4, seedSize = 300, emIters = 2)
      .as[(Long, String, Long)].collect().map(r => r._2 -> r._3).toMap
    val docs2 = core.Tables.documents(spark, sf("sf0.001")).limit(40)
    val enc = Unigram.encode(docs2, "doc_id", "text", trained, maxPieceLen = 4)
    val joined = enc.join(docs2.select(col("doc_id").as("id"), col("text")), "id")
    val bad = joined.filter(
      concat_ws("", col("pieces")) =!= regexp_replace(col("text"), " ", ""))
    assert(bad.count() == 0, "piece concatenation must reproduce the text")
  }
}
