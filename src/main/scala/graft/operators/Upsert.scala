package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Primary-key upsert + latest-per-key, the reference's core write semantics.
  *
  * Reference: `INSERT ... ON CONFLICT (pk) DO UPDATE SET <non-pk> = EXCLUDED.*`
  * (/root/reference/etl/core_io.py:93-113) — exactly one surviving row per key,
  * newest load wins; and the `institutions_latest` view (latest Directory row
  * per institution, /root/reference/architecture.md:53).
  *
  * Scale notes (100 TB):
  *   - Both operators are a single hash shuffle on the key — no driver-side
  *     work, no collect. AQE handles skewed keys.
  *   - `latestPerKey` uses `max_by(struct(*), ord)` (a partial-aggregable
  *     aggregate → map-side combine) instead of a window sort: a window needs
  *     a full sort of every partition; max_by reduces before the shuffle.
  *   - `upsertByKey` keeps row_number because precedence may tie-break across
  *     multiple columns and the subsequent write is partition-aligned anyway.
  */
object Upsert {

  /** Last-write-wins dedup by `keys`, ordering candidates by `precedence`
    * descending (highest precedence survives). Deterministic given a
    * deterministic total precedence order per key.
    */
  def upsertByKey(base: DataFrame, updates: DataFrame, keys: Seq[String],
                  precedence: Seq[Column]): DataFrame = {
    val all = base.unionByName(updates)
    dedupByKey(all, keys, precedence)
  }

  /** Keep exactly one row per `keys`, max by `precedence` (desc). */
  def dedupByKey(df: DataFrame, keys: Seq[String], precedence: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(precedence.map(_.desc): _*)
    df.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .drop("__rn")
  }

  /** Latest row per key ordered by `ord` columns (e.g. year, load timestamp).
    * Aggregation-based: `max_by` partial-aggregates map-side, so the shuffle
    * carries one row per key per input partition instead of every row. */
  def latestPerKey(df: DataFrame, keys: Seq[String], ord: Seq[Column]): DataFrame = {
    val payload = struct(df.columns.toIndexedSeq.map(col): _*)
    val ordKey = struct(ord: _*)
    df.groupBy(keys.map(col): _*)
      .agg(max_by(payload, ordKey).as("__row"))
      .select(col("__row.*"))
  }
}
