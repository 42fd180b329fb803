package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-analysis scalar functions for training-data curation: token
  * counting, quality scoring, heuristic language ID. All pure `Column`
  * compositions of built-ins — codegen'd end to end, no UDFs — and every
  * formula is chosen to be expressible identically in the DuckDB oracle
  * (exact integer counts, double division, round at the edge).
  */
object TextAnalysis {

  /** Whitespace token count via separator counting: single-space-joined
    * corpora → exact; engine-independent (no split-semantics edge cases). */
  def tokenCountWs(text: Column): Column =
    when(length(text) === 0, 0)
      .otherwise(length(text) - length(regexp_replace(text, " ", "")) + 1)

  /** BPE-ish token count: alpha runs, digit runs, and single non-space
    * symbols each count as one token (the regex is RE2/Java-compatible). */
  val bpeishPattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"
  def tokenCountRe(text: Column): Column = regexp_count(text, lit(bpeishPattern))

  /** English-ish stopwords for density features (shared with the oracle). */
  val stopwords: Seq[String] = Seq(
    "the", "a", "an", "of", "and", "or", "to", "in", "is", "it")

  private def tokens(text: Column): Column = split(text, " ")

  def stopwordCount(text: Column): Column =
    size(filter(tokens(text), t => t.isin(stopwords: _*)))

  /** Quality signals (architecture: length + punctuation + stopword ratios;
    * the classic C4/Gopher-style cheap filters):
    *   avg token length, stopword ratio, non-alpha ratio. */
  def avgTokenLen(text: Column): Column =
    (length(regexp_replace(text, " ", "")).cast(DoubleType) /
      nullif(tokenCountWs(text), lit(0)))

  def stopwordRatio(text: Column): Column =
    stopwordCount(text).cast(DoubleType) / nullif(tokenCountWs(text), lit(0))

  def nonAlphaRatio(text: Column): Column =
    (length(text) - length(regexp_replace(text, "[^A-Za-z ]", ""))
      ).cast(DoubleType) / nullif(length(text), lit(0))

  /** Composite quality score in [0,1]: rewards mid-length docs with typical
    * stopword density and low symbol noise. Deterministic double math. */
  def qualityScore(text: Column): Column = {
    val lenScore = least(tokenCountWs(text).cast(DoubleType) / 50.0, lit(1.0))
    val stopScore = least(stopwordRatio(text) * 5.0, lit(1.0))
    val noisePenalty = greatest(lit(0.0), lit(1.0) - nonAlphaRatio(text) * 5.0)
    round((lenScore * 0.4 + stopScore * 0.3 + noisePenalty * 0.3), 6)
  }

  /** Word bigrams as an array column: the token array zipped with itself
    * shifted by one (`[]` for single-token docs). Stays a projection —
    * callers explode it only when a per-bigram aggregation truly needs
    * the shuffle (Gopher-style repetition metrics). */
  def bigrams(text: Column): Column = {
    val t = tokens(text)
    zip_with(slice(t, lit(1), size(t) - 1), slice(t, lit(2), size(t) - 1),
      (a, b) => concat(a, lit(" "), b))
  }

  /** Per-language marker words for the n-gram/stopword language heuristic.
    * Deterministic argmax with fixed precedence (en,es,fr,de,zh → unknown). */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "is"),
    "es" -> Seq("el", "la", "de", "que", "es"),
    "fr" -> Seq("le", "la", "de", "et", "est"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "zh" -> Seq("的", "是", "了", "在", "我"))

  def markerCount(text: Column, lang: String): Column = {
    val markers = langMarkers.toMap.apply(lang)
    size(filter(tokens(text), t => t.isin(markers: _*)))
  }

  /** Heuristic language ID: the language with the highest marker count
    * (ties broken by declaration order); no markers at all → 'unknown'. */
  def langId(text: Column): Column = {
    val counts = langMarkers.map { case (lang, _) => lang -> markerCount(text, lang) }
    val best = counts.map(_._2).reduce((a, b) => greatest(a, b))
    // foldRight builds CASE WHEN en ... WHEN es ... — earlier language wins
    // ties (same precedence order as the oracle's CASE chain).
    counts.foldRight(lit("unknown")) { case ((lang, c), acc) =>
      when(c === best && best > 0, lit(lang)).otherwise(acc)
    }
  }
}
