package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-scale corpus pipelines (beyond the
  * reference surface — agnes has no string function library at all,
  * SURVEY.md §2.8). Everything is built from codegen'd
  * `org.apache.spark.sql.functions` / higher-order array expressions — no
  * Scala UDFs in the hot path, so whole-stage codegen stays intact and every
  * op scales linearly with a plain map-side pass (no shuffle).
  */
object TextFunctions {

  /** Whitespace tokens (single-space delimiter for oracle parity with
    * DuckDB's `string_split(text, ' ')`). */
  def tokens(text: Column): Column = split(text, " ")

  /** Word n-gram shingles as strings; rows with fewer than n tokens yield an
    * empty array. Native one-pass expression ([[WordShingles]]): shingles
    * are emitted as byte-range views of the source string in a single
    * whole-stage-codegen call — the composable `slice` + chained `zip_with`
    * form (kept below as the parity baseline) pays n-1 interpreted
    * higher-order passes with an intermediate array each. */
  def shingles(text: Column, n: Int): Column =
    ShingleExpression.wordShingles(text, n)

  /** The composable formulation of [[shingles]] — `slice` + `zip_with`
    * rather than `transform(sequence(...), element_at)` because lambda
    * bodies are not common-subexpression-eliminated (an element_at form
    * re-splits the text per shingle, O(len²) per row). Semantically
    * identical to the native expression; retained as the spec baseline. */
  def shinglesComposable(text: Column, n: Int): Column = {
    val t = tokens(text)
    val m = size(t) - (n - 1) // shingle count
    when(m <= 0, array().cast("array<string>"))
      .otherwise((1 until n).foldLeft(slice(t, lit(1), m)) { (acc, k) =>
        zip_with(acc, slice(t, lit(k + 1), m), (a, b) => concat(a, lit(" "), b))
      })
  }

  /** Token count via whitespace split. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish token count: alphanumeric runs + single punctuation marks.
    * Implemented with `regexp_count` (Spark ≥ 3.4, codegen'd). */
  def regexTokenCount(text: Column): Column =
    regexp_count(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"))

  /** Mean token length, 4-dp rounded; 0.0 for empty docs. */
  def avgTokenLen(text: Column): Column = {
    val t = tokens(text)
    round(coalesce(
      aggregate(t, lit(0L), (acc, x) => acc + length(x)).cast("double") / size(t),
      lit(0.0)), 4)
  }

  /** Fraction of tokens found in `stopwords`. */
  def stopwordRatio(text: Column, stopwords: Seq[String]): Column = {
    val t = tokens(text)
    round(size(filter(t, x => x.isInCollection(stopwords))).cast("double") / size(t), 4)
  }

  /** Fraction of characters that are ASCII letters or space. */
  def alphaRatio(text: Column): Column =
    round(length(regexp_replace(text, "[^A-Za-z ]", "")).cast("double") / length(text), 4)

  /** Composite quality score in [0,1]: rewards mid-length docs, penalizes
    * low alpha ratio and extreme stopword ratios — the usual cheap heuristics
    * a pretraining-data pipeline applies before expensive model scoring. */
  def qualityScore(text: Column, stopwords: Seq[String]): Column = {
    val nTok = tokenCount(text).cast("double")
    val lenScore = least(nTok / lit(50.0), lit(1.0))
    val alpha = alphaRatio(text)
    val stop = stopwordRatio(text, stopwords)
    val stopScore = lit(1.0) - abs(stop - lit(0.15)) // sweet spot ~15% stopwords
    round(greatest(lit(0.0), least(lit(1.0), (lenScore + alpha + stopScore) / lit(3.0))), 4)
  }

  /** Fraction of duplicated word n-grams: 1 − |distinct n-grams| / |n-grams|
    * (0.0 for docs shorter than n tokens) — the classic repetition signal a
    * pretraining quality filter thresholds (boilerplate and looping text
    * score high). Pure per-row array math, no shuffle. */
  def dupNgramFraction(text: Column, n: Int): Column = {
    val g = shingles(text, n)
    round(when(size(g) <= 0, lit(0.0)).otherwise(
      lit(1.0) - size(array_distinct(g)).cast("double") / size(g)), 4)
  }

  /** Fraction of tokens taken by the single most frequent token — high for
    * degenerate "word word word …" docs. Sort once, then one linear fold
    * counting the longest equal-token run: O(n log n) per row, safe for the
    * distinct-heavy documents (code, ID-laden text) where the naive
    * count-each-distinct formulation degenerates to O(n²). */
  def topTokenFraction(text: Column): Column = {
    val t = tokens(text)
    val sorted = array_sort(t)
    // acc = (best run, current run, previous token); `when(lit(true), x)`
    // forces the token slot nullable so it unifies with the null zero value
    val zero = struct(lit(0).as("best"), lit(0).as("cur"),
      lit(null).cast("string").as("prev"))
    val folded = aggregate(sorted, zero, (acc, x) => {
      val cur = when(x === acc.getField("prev"), acc.getField("cur") + 1)
        .otherwise(lit(1))
      struct(greatest(acc.getField("best"), cur).as("best"), cur.as("cur"),
        when(lit(true), x).as("prev"))
    })
    round(greatest(folded.getField("best"), folded.getField("cur"))
      .cast("double") / size(t), 4)
  }

  /** PII / URL scrubbing: replace e-mail addresses, URLs, and long digit
    * runs (phone/account-number-like) with typed placeholder tokens — the
    * cheap regex pass a pretraining pipeline applies before tokenization.
    * A chain of codegen'd `regexp_replace` calls (no UDF, no shuffle);
    * e-mails are replaced first so their host parts are not half-eaten by
    * the URL rule. Patterns are RE2-compatible, so any engine reproduces
    * the result (the DuckDB oracle does). */
  def scrub(text: Column): Column = {
    val email = regexp_replace(text,
      "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>")
    val url = regexp_replace(email, "https?://[^\\s]+", "<URL>")
    regexp_replace(url, "[0-9]{7,}", "<NUM>")
  }

  /** Canonical-form document fingerprint: md5 of the sorted distinct token
    * set. Identical content up to token order/multiplicity collides — the
    * cheap "bag of words" dedup key. Portable: DuckDB computes the same via
    * md5(array_to_string(list_sort(list_distinct(string_split(..))), ' ')). */
  def canonicalFingerprint(text: Column): Column =
    md5(concat_ws(" ", array_sort(array_distinct(tokens(text)))))

  /** Rolling hash over the token sequence (order-sensitive fingerprint):
    * Horner-style fold h = xxhash64(h, token) — overflow-free chained
    * hashing entirely in codegen'd expressions. */
  def rollingFingerprint(text: Column): Column =
    aggregate(tokens(text), lit(0L), (acc, tkn) => xxhash64(acc, tkn))

  /** Per-language marker-token profiles for the n-gram/stopword language-ID
    * heuristic. Tiny, broadcast-inlined into the expression tree. */
  val langMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "is"),
    "es" -> Seq("el", "la", "de", "y", "es"),
    "fr" -> Seq("le", "la", "de", "et", "est"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "zh" -> Seq("de", "le", "shi", "he", "zai"))

  /** Heuristic language ID: argmax of marker-token hits, deterministic
    * lexicographic tie-break, "und" (undetermined) when no marker hits. */
  def langId(text: Column, markers: Map[String, Seq[String]] = langMarkers): Column = {
    val t = tokens(text)
    val scored = markers.toSeq.sortBy(_._1).map { case (lang, ws) =>
      struct(size(filter(t, x => x.isInCollection(ws))).as("hits"), lit(lang).as("lang"))
    }
    // array_max on (hits, lang) structs: max hits, then max lang — to get the
    // lexicographically-SMALLEST lang on ties, compare on (hits, reversed rank).
    val ranked = markers.toSeq.sortBy(_._1).zipWithIndex.map { case ((lang, ws), i) =>
      struct(
        size(filter(t, x => x.isInCollection(ws))).as("hits"),
        lit(markers.size - i).as("rank"),
        lit(lang).as("lang"))
    }
    val best = array_max(array(ranked: _*))
    when(best.getField("hits") === 0, lit("und")).otherwise(best.getField("lang"))
  }
}
