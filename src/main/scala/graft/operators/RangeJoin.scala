package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Banded range join: join rows to intervals ([lo, hi] containment) without
  * the cartesian/broadcast-nested-loop plan Spark produces for a raw
  * inequality join.
  *
  * Both sides are bucketed on floor(value / bandWidth); an interval spans
  * every bucket it overlaps (sequence-explode), so point and interval meet
  * on an equi-key and the exact containment check runs only within buckets.
  * Cost: |points| + |intervals| x avg_spanned_buckets shuffle rows — the
  * classic interval-bucketing trade: small bands = more replication,
  * large bands = more in-bucket filtering. A BNL join is |points| x
  * |intervals| and never survives scale.
  */
object RangeJoin {

  /** Join `points` (value in `valueCol`) to `intervals` ([loCol, hiCol],
    * inclusive) using equi-bucketing of width `bandWidth`. Inner join
    * semantics: one output row per (point, containing interval). */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      valueCol: String, loCol: String, hiCol: String,
                      bandWidth: Double): DataFrame = {
    val pB = points.withColumn("__band",
      floor(col(valueCol) / bandWidth).cast("long"))
    val iB = intervals.withColumn("__band",
      explode(sequence(
        floor(col(loCol) / bandWidth).cast("long"),
        floor(col(hiCol) / bandWidth).cast("long"))))
    pB.join(iB, Seq("__band"))
      .where(col(valueCol) >= col(loCol) && col(valueCol) <= col(hiCol))
      .drop("__band")
  }
}
