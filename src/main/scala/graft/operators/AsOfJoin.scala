package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (temporal) join: for every left row, the single most recent right
  * row with the same key and rightTime <= leftTime.
  *
  * Implementation is the union+window formulation, not a fan-out join:
  * tag both sides, union, sort each key partition by (time, side, tiebreak)
  * and carry the last non-null right payload forward with
  * `last(..., ignoreNulls=true)`. Cost is one hash shuffle + per-key sort —
  * O(n log n) with NO row multiplication, which is what makes it survive
  * keys with millions of right rows at 100 TB (a join-then-max_by plan
  * explodes by the per-key match count first). Right rows sort BEFORE left
  * rows at equal timestamps, so the bound is inclusive; ties among right
  * rows resolve by `tiebreak` ascending (last = largest wins).
  *
  * This is preference route (a) — composed built-ins (SURVEY §7). The next
  * escalation for heavily skewed keys would be a custom sort-merge
  * AsOfJoinExec SparkPlan; not needed at current scale.
  */
object AsOfJoin {

  /** @param left       left rows (all columns preserved)
    * @param right      right rows
    * @param key        equi-key column name present on both sides
    * @param leftTime   event-time column on left (numeric or timestamp)
    * @param rightTime  event-time column on right (same comparable type)
    * @param tiebreak   right-side column breaking equal-time ties (max wins)
    * @param payload    right-side columns to surface, null when no match
    */
  def latestAsOf(left: DataFrame, right: DataFrame, key: String,
                 leftTime: Column, rightTime: Column, tiebreak: Column,
                 payload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val payloadStruct = struct(payload.map(col): _*)

    val taggedRight = right.select(
      col(key).as("__k"), rightTime.as("__t"), lit(0).as("__side"),
      tiebreak.cast("long").as("__tb"), payloadStruct.as("__payload"),
      lit(null).cast(structTypeOf(left)).as("__left"))
    val taggedLeft = left.select(
      col(key).as("__k"), leftTime.as("__t"), lit(1).as("__side"),
      lit(Long.MaxValue).as("__tb"),
      lit(null).cast(taggedRightPayloadType(right, payload)).as("__payload"),
      struct(leftCols.map(col): _*).as("__left"))

    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t"), col("__side"), col("__tb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    taggedRight.unionByName(taggedLeft)
      .withColumn("__asof", last(col("__payload"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
      .select(leftCols.map(c => col(s"__left.$c").as(c)) ++
        payload.map(p => col(s"__asof.$p").as(s"asof_$p")): _*)
  }

  private def structTypeOf(df: DataFrame) =
    org.apache.spark.sql.types.StructType(df.schema.fields)

  private def taggedRightPayloadType(right: DataFrame, payload: Seq[String]) =
    org.apache.spark.sql.types.StructType(payload.map(p => right.schema(p)))
}
