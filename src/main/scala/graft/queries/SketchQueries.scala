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

  override val defs: Seq[QueryDef] = Seq(q35)
}
