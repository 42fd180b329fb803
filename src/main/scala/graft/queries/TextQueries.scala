package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.functions.TextAnalysis

/** North-star text analysis over `documents`: token counting, quality
  * scoring, heuristic language ID — every formula mirrored exactly in the
  * DuckDB oracle (integer counts + double division + round at the edge).
  */
object TextQueries extends QueryFamily {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")

  /** SQL literal list of the stopwords — shared with the oracles of other
    * families that embed the q29 quality formula (e.g. q56). */
  private[queries] val stopListSql =
    TextAnalysis.stopwords.map(s => s"'$s'").mkString(", ")
  private def stopList = stopListSql

  private val q28 = QueryDef(
    "q28_token_stats",
    "Token counting: whitespace tokens (separator formula — engine-proof), " +
      "BPE-ish regex tokens (alpha runs / digit runs / single symbols), " +
      "character and stopword counts.",
    (s, dir) => docs(s, dir).select(
      col("doc_id"),
      length(col("text")).as("n_chars"),
      TextAnalysis.tokenCountWs(col("text")).as("n_tokens"),
      TextAnalysis.tokenCountRe(col("text")).cast("int").as("n_tokens_re"),
      TextAnalysis.stopwordCount(col("text")).as("n_stopwords"))
      .orderBy("doc_id"),
    Some(s"""
      SELECT doc_id,
             CAST(length(text) AS INTEGER) AS n_chars,
             CAST(CASE WHEN length(text) = 0 THEN 0
                  ELSE length(text) - length(replace(text, ' ', '')) + 1
                  END AS INTEGER) AS n_tokens,
             CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]'))
                  AS INTEGER) AS n_tokens_re,
             CAST(len(list_filter(string_split(text, ' '),
                  t -> t IN ($stopList))) AS INTEGER) AS n_stopwords
      FROM documents
      ORDER BY doc_id"""))

  private val q29 = QueryDef(
    "q29_quality_score",
    "Quality scoring (C4/Gopher-style cheap filters): avg token length, " +
      "stopword ratio, non-alpha ratio, and a composite [0,1] score.",
    (s, dir) => docs(s, dir).select(
      col("doc_id"),
      round(TextAnalysis.avgTokenLen(col("text")), 6).as("avg_token_len"),
      round(TextAnalysis.stopwordRatio(col("text")), 6).as("stopword_ratio"),
      round(TextAnalysis.nonAlphaRatio(col("text")), 6).as("non_alpha_ratio"),
      TextAnalysis.qualityScore(col("text")).as("quality"))
      .orderBy("doc_id"),
    Some(s"""
      WITH t AS (
        SELECT doc_id, text,
               CASE WHEN length(text) = 0 THEN 0
                    ELSE length(text) - length(replace(text, ' ', '')) + 1
                    END AS n_tok,
               length(replace(text, ' ', '')) AS n_nonspace,
               len(list_filter(string_split(text, ' '),
                   x -> x IN ($stopList))) AS n_stop,
               length(text) - length(regexp_replace(text, '[^A-Za-z ]', '', 'g'))
                 AS n_nonalpha
        FROM documents)
      SELECT doc_id,
             round(n_nonspace * 1.0 / nullif(n_tok, 0), 6) AS avg_token_len,
             round(n_stop * 1.0 / nullif(n_tok, 0), 6) AS stopword_ratio,
             round(n_nonalpha * 1.0 / nullif(length(text), 0), 6) AS non_alpha_ratio,
             round(least(n_tok / 50.0, 1.0) * 0.4
                 + least(n_stop * 1.0 / nullif(n_tok, 0) * 5.0, 1.0) * 0.3
                 + greatest(0.0, 1.0 - n_nonalpha * 1.0 / nullif(length(text), 0) * 5.0) * 0.3,
               6) AS quality
      FROM t
      ORDER BY doc_id"""))

  private def markerList(lang: String): String =
    TextAnalysis.langMarkers.toMap.apply(lang).map(m => s"'$m'").mkString(", ")

  private val q30 = QueryDef(
    "q30_lang_id",
    "Heuristic language ID (marker-word argmax, fixed precedence) per doc, " +
      "plus agreement with the labeled lang column, aggregated per label.",
    (s, dir) => docs(s, dir)
      .select(col("doc_id"), col("lang"),
        TextAnalysis.langId(col("text")).as("guess"))
      .groupBy("lang", "guess")
      .agg(count(lit(1)).as("n"))
      .orderBy("lang", "guess"),
    Some(s"""
      WITH g AS (
        SELECT doc_id, lang,
               len(list_filter(string_split(text,' '), t -> t IN (${markerList("en")}))) AS c_en,
               len(list_filter(string_split(text,' '), t -> t IN (${markerList("es")}))) AS c_es,
               len(list_filter(string_split(text,' '), t -> t IN (${markerList("fr")}))) AS c_fr,
               len(list_filter(string_split(text,' '), t -> t IN (${markerList("de")}))) AS c_de,
               len(list_filter(string_split(text,' '), t -> t IN (${markerList("zh")}))) AS c_zh
        FROM documents),
      p AS (
        SELECT doc_id, lang,
               greatest(c_en, c_es, c_fr, c_de, c_zh) AS best,
               CASE WHEN greatest(c_en, c_es, c_fr, c_de, c_zh) = 0 THEN 'unknown'
                    WHEN c_en = greatest(c_en, c_es, c_fr, c_de, c_zh) THEN 'en'
                    WHEN c_es = greatest(c_en, c_es, c_fr, c_de, c_zh) THEN 'es'
                    WHEN c_fr = greatest(c_en, c_es, c_fr, c_de, c_zh) THEN 'fr'
                    WHEN c_de = greatest(c_en, c_es, c_fr, c_de, c_zh) THEN 'de'
                    ELSE 'zh' END AS guess
        FROM g)
      SELECT lang, guess, count(*) AS n
      FROM p
      GROUP BY lang, guess
      ORDER BY lang, guess"""))

  override val defs: Seq[QueryDef] = Seq(q28, q29, q30)
}
