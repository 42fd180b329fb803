package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.Tables
import graft.functions.TextAnalysis
import graft.operators.Dedup

/** Dataset-selection queries — the steps that decide WHICH documents make
  * the training set: benchmark decontamination, per-language stratified
  * sampling, and quality-ordered token-budget selection. Every formula is
  * mirrored exactly in the DuckDB oracle (md5 for cross-engine determinism,
  * integer token counts, round-6 doubles at the edge).
  */
object SelectionQueries extends QueryFamily {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")

  /** The DuckDB twin of [[graft.operators.Dedup.shingles]] (n=3) as a CTE
    * body over `src` — same list-range construction as q22's oracle. */
  private def shingleSql(src: String): String =
    s"""SELECT DISTINCT doc_id,
       unnest(list_transform(range(1, greatest(len(a) - 1, 1)),
         i -> a[i] || ' ' || a[i+1] || ' ' || a[i+2])) AS shingle
       FROM (SELECT doc_id, string_split(text, ' ') AS a FROM $src)"""

  private val q54 = QueryDef(
    "q54_decontaminate",
    "Benchmark decontamination: flag training docs sharing >= 3 distinct " +
      "3-gram shingles with any benchmark doc (benchmark = doc_id % 50 = " +
      "0, a deterministic stand-in eval set). The bench shingle index " +
      "broadcasts — benchmarks are MBs against a 100 TB corpus — so the " +
      "training scan is map-local and only matched candidate pairs reach " +
      "the counting shuffle.",
    (s, dir) => {
      val d = docs(s, dir)
      Dedup.crossNgramOverlap(
          d.where(col("doc_id") % 50 =!= 0),
          d.where(col("doc_id") % 50 === 0),
          "doc_id", "text", n = 3, minShared = 3L)
        .orderBy("train_id", "bench_id")
    },
    Some(s"""
      WITH train_sh AS (
        ${shingleSql("(SELECT * FROM documents WHERE doc_id % 50 <> 0)")}),
      bench_sh AS (
        ${shingleSql("(SELECT * FROM documents WHERE doc_id % 50 = 0)")})
      SELECT t.doc_id AS train_id, b.doc_id AS bench_id,
             count(*) AS shared_ngrams
      FROM train_sh t JOIN bench_sh b ON t.shingle = b.shingle
      GROUP BY 1, 2
      HAVING count(*) >= 3
      ORDER BY train_id, bench_id"""))

  private val q55 = QueryDef(
    "q55_stratified_sample",
    "Per-language stratified sample: 50 docs per lang, chosen by md5-hash " +
      "order — deterministic across runs, engines, and cluster sizes " +
      "(md5 hex strings sort identically everywhere). The rank<=k filter " +
      "on the row_number window executes as a per-partition group limit " +
      "(WindowGroupLimit), so no language group is ever fully sorted.",
    (s, dir) => {
      val w = Window.partitionBy(col("lang"))
        .orderBy(md5(col("doc_id").cast(StringType)), col("doc_id"))
      docs(s, dir)
        .select(col("doc_id"), col("lang"))
        .withColumn("rk", row_number().over(w).cast(IntegerType))
        .where(col("rk") <= 50)
        .orderBy("lang", "rk")
    },
    Some("""
      SELECT doc_id, lang,
             CAST(row_number() OVER (PARTITION BY lang
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS INTEGER) AS rk
      FROM documents
      QUALIFY rk <= 50
      ORDER BY lang, rk"""))

  private val q56 = QueryDef(
    "q56_token_budget_select",
    "Quality-ordered token-budget selection: per language, take documents " +
      "in descending quality order (q29's composite score, doc_id " +
      "tie-break) while the running token total stays within a 5000-token " +
      "budget — greedy data selection under a compute budget, as one " +
      "declarative cumulative-sum window.",
    (s, dir) => {
      val scored = docs(s, dir).select(
        col("doc_id"), col("lang"),
        TextAnalysis.tokenCountWs(col("text")).as("n_tokens"),
        TextAnalysis.qualityScore(col("text")).as("quality"))
      val w = Window.partitionBy(col("lang"))
        .orderBy(col("quality").desc, col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      scored.withColumn("cum_tokens", sum(col("n_tokens")).over(w))
        .where(col("cum_tokens") <= 5000)
        .orderBy("lang", "cum_tokens", "doc_id")
    },
    Some(s"""
      WITH t AS (
        SELECT doc_id, lang, text,
               CASE WHEN length(text) = 0 THEN 0
                    ELSE length(text) - length(replace(text, ' ', '')) + 1
                    END AS n_tok,
               length(replace(text, ' ', '')) AS n_nonspace,
               len(list_filter(string_split(text, ' '),
                   x -> x IN (${TextQueries.stopListSql}))) AS n_stop,
               length(text) - length(regexp_replace(text, '[^A-Za-z ]', '', 'g'))
                 AS n_nonalpha
        FROM documents),
      scored AS (
        SELECT doc_id, lang,
               CAST(n_tok AS INTEGER) AS n_tokens,
               round(least(n_tok / 50.0, 1.0) * 0.4
                   + least(n_stop * 1.0 / nullif(n_tok, 0) * 5.0, 1.0) * 0.3
                   + greatest(0.0, 1.0 - n_nonalpha * 1.0 / nullif(length(text), 0) * 5.0) * 0.3,
                 6) AS quality
        FROM t),
      cum AS (
        SELECT doc_id, lang, n_tokens, quality,
               CAST(sum(n_tokens) OVER (PARTITION BY lang
                 ORDER BY quality DESC, doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS cum_tokens
        FROM scored)
      SELECT * FROM cum
      WHERE cum_tokens <= 5000
      ORDER BY lang, cum_tokens, doc_id"""))

  override val defs: Seq[QueryDef] = Seq(q54, q55, q56)
}
