package graft.queries

import org.apache.spark.sql.functions._

import graft.core.Tables

/** Exact order statistics + multi-grain aggregation — the analyst
  * completions of the KPI surface (SURVEY §2.3 Q11's family).
  */
object StatsQueries extends QueryFamily {

  private val q45 = QueryDef(
    "q45_percentiles",
    "Exact percentiles (sort-based, linearly interpolated — NOT the " +
      "approx sketch, which is q35): p25/p50/p95 of document length per " +
      "language. Spark `percentile` and DuckDB `quantile_cont` share the " +
      "(n-1)*p + linear-interpolation definition, so values match " +
      "bit-for-bit on integer inputs.",
    (s, dir) => Tables.load(s, dir, "documents")
      .groupBy("lang")
      .agg(
        round(expr("percentile(n_chars, 0.25)"), 6).as("p25"),
        round(expr("percentile(n_chars, 0.5)"), 6).as("p50"),
        round(expr("percentile(n_chars, 0.95)"), 6).as("p95"),
        count(lit(1)).as("n"))
      .orderBy("lang"),
    Some("""
      SELECT lang,
             round(quantile_cont(n_chars, 0.25), 6) AS p25,
             round(quantile_cont(n_chars, 0.5), 6) AS p50,
             round(quantile_cont(n_chars, 0.95), 6) AS p95,
             count(*) AS n
      FROM documents
      GROUP BY lang
      ORDER BY lang"""))

  private val q46 = QueryDef(
    "q46_grouping_sets",
    "Explicit GROUPING SETS — (lang, source), (lang), (source), () in ONE " +
      "pass (completes the multi-grain family: q12 rollup, q19 cube). " +
      "grouping_id() labels each grain; Spark expands to a single " +
      "Expand+Aggregate plan, one shuffle for all four grains.",
    (s, dir) => {
      val d = Tables.load(s, dir, "documents")
      d.createOrReplaceTempView("documents_gs")
      s.sql("""
        SELECT lang, source, CAST(grouping_id(lang, source) AS INT) AS gid,
               count(*) AS n, CAST(sum(n_chars) AS BIGINT) AS chars
        FROM documents_gs
        GROUP BY GROUPING SETS ((lang, source), (lang), (source), ())
        ORDER BY gid, lang NULLS LAST, source NULLS LAST""")
    },
    Some("""
      SELECT lang, source, CAST(grouping(lang) * 2 + grouping(source) AS INTEGER) AS gid,
             count(*) AS n, CAST(sum(n_chars) AS BIGINT) AS chars
      FROM documents
      GROUP BY GROUPING SETS ((lang, source), (lang), (source), ())
      ORDER BY gid, lang NULLS LAST, source NULLS LAST"""))

  override val defs: Seq[QueryDef] = Seq(q45, q46)
}
