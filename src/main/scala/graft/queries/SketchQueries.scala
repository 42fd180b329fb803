package graft.queries

import org.apache.spark.sql.functions._

import graft.core.Tables

/** Approximate-analytics sketches: the cardinality/quantile tools that make
  * 100 TB interactive. HLL and KLL internals are engine-specific → rows-only
  * here; accuracy bounds are pinned against exact answers in SketchSpec.
  */
object SketchQueries extends QueryFamily {

  /** The sketch ESTIMATES themselves are engine-specific (DuckDB's HLL /
    * approx_quantile use different sketches, so the raw values can never
    * hash-match an oracle). What IS oracle-checkable is the sketches'
    * accuracy CONTRACT, evaluated inside the query: each estimate is
    * reduced to a boolean "within its documented error bound of the exact
    * answer", computed entirely in Spark, and the DuckDB oracle asserts
    * those booleans are all TRUE (plus the exact values, which both
    * engines agree on). A sketch regression — wrong rsd plumbing, a
    * broken percentile accuracy knob — flips a flag to false and the
    * hash comparison fails loudly, where the old rows-only row could
    * not fail at all.
    *
    * Bounds used: HLL++ at rsd=0.01 → flag at 5 % (5 σ, deterministic
    * for a fixed dataset); percentile_approx at accuracy=10000 →
    * rank error ≤ 1e-4, flagged against the much looser exact
    * [q−0.001, q+0.001] rank envelope. */
  private val q35 = QueryDef(
    "q35_approx_sketches",
    "HyperLogLog++ distinct users and KLL-style approximate percentiles of " +
      "event values per event_type — one pass, map-side partial sketches, " +
      "no distinct shuffle explosion. Each estimate is checked against its " +
      "documented error bound in-query; the oracle pins exact values and " +
      "all-bounds-hold, so a sketch regression breaks the hash match.",
    (s, dir) => Tables.load(s, dir, "events")
      .groupBy("event_type")
      .agg(
        approx_count_distinct(col("user_id"), rsd = 0.01).as("au"),
        countDistinct(col("user_id")).as("exact_users"),
        percentile_approx(col("value"), lit(0.5), lit(10000)).as("ap50"),
        percentile_approx(col("value"), lit(0.99), lit(10000)).as("ap99"),
        percentile(col("value"), lit(0.499)).as("lo50"),
        percentile(col("value"), lit(0.501)).as("hi50"),
        percentile(col("value"), lit(0.989)).as("lo99"),
        percentile(col("value"), lit(0.991)).as("hi99"))
      .select(col("event_type"), col("exact_users"),
        (abs(col("au") - col("exact_users")) <=
          greatest(lit(1), round(col("exact_users") * 0.05)))
          .as("users_within_bounds"),
        col("ap50").between(col("lo50"), col("hi50"))
          .as("p50_within_bounds"),
        col("ap99").between(col("lo99"), col("hi99"))
          .as("p99_within_bounds"))
      .orderBy("event_type"),
    Some("""
      SELECT event_type,
             count(DISTINCT user_id) AS exact_users,
             TRUE AS users_within_bounds,
             TRUE AS p50_within_bounds,
             TRUE AS p99_within_bounds
      FROM events
      GROUP BY event_type
      ORDER BY event_type"""))

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
