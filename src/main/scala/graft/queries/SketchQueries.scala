package graft.queries

import org.apache.spark.sql.functions._

import graft.core.Tables

/** Approximate-analytics sketches: the cardinality/quantile tools that make
  * 100 TB interactive. HLL and KLL internals are engine-specific → rows-only
  * here; accuracy bounds are pinned against exact answers in SketchSpec.
  */
object SketchQueries extends QueryFamily {

  private val q35 = QueryDef(
    "q35_approx_sketches",
    "HyperLogLog++ distinct users and KLL-style approximate percentiles of " +
      "event values per event_type, next to exact distincts for reference. " +
      "One pass, map-side partial sketches — no distinct shuffle explosion.",
    (s, dir) => Tables.load(s, dir, "events")
      .groupBy("event_type")
      .agg(
        approx_count_distinct(col("user_id"), rsd = 0.01).as("approx_users"),
        countDistinct(col("user_id")).as("exact_users"),
        percentile_approx(col("value"), lit(0.5), lit(10000)).as("p50_value"),
        percentile_approx(col("value"), lit(0.99), lit(10000)).as("p99_value"))
      .orderBy("event_type"),
    None,
    omittedReason = Some("rows-only by design: HLL++/KLL sketch estimates " +
      "are engine-specific (DuckDB's approx_count_distinct/approx_quantile " +
      "use different sketches, so values legitimately differ); accuracy " +
      "bounds vs exact answers are pinned in SketchSpec"))

  /** The oracled exact twin of q35: the same per-type stats computed
    * exactly, so the row DOES hash-match DuckDB — the sketch query above
    * stays rows-only for its engine-specific estimates only. Exact
    * percentiles interpolate between the same two order statistics in
    * both engines (Spark `percentile` ≡ DuckDB `quantile_cont`);
    * round(6) absorbs the last-ulp interpolation difference. */
  private val q35a = QueryDef(
    "q35a_exact_distinct_quantiles",
    "Exact twin of the sketch query: exact distinct users and exact " +
      "linear-interpolated p50/p99 of event values per event_type. The " +
      "scale story is the sketch path (q35); this is its hash-matched " +
      "ground truth.",
    (s, dir) => Tables.load(s, dir, "events")
      .groupBy("event_type")
      .agg(
        countDistinct(col("user_id")).as("exact_users"),
        round(percentile(col("value"), lit(0.5)), 6).as("p50_value"),
        round(percentile(col("value"), lit(0.99)), 6).as("p99_value"))
      .orderBy("event_type"),
    Some("""
      SELECT event_type,
             count(DISTINCT user_id) AS exact_users,
             round(quantile_cont(value, 0.5), 6) AS p50_value,
             round(quantile_cont(value, 0.99), 6) AS p99_value
      FROM events
      GROUP BY event_type
      ORDER BY event_type"""))

  override val defs: Seq[QueryDef] = Seq(q35, q35a)
}
