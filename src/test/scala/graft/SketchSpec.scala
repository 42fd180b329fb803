package graft

import org.apache.spark.sql.functions._

import graft.core.Tables

/** Sketch accuracy bounds: HLL within its configured rsd of exact;
  * approximate percentiles inside the value range and ordered. */
class SketchSpec extends SparkSpec {

  test("approx_count_distinct(rsd=0.01) within 3% of exact on events") {
    val rows = Tables.load(spark, sf(), "events")
      .groupBy("event_type")
      .agg(approx_count_distinct(col("user_id"), rsd = 0.01).as("a"),
        countDistinct(col("user_id")).as("e"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val a = r.getLong(1).toDouble; val e = r.getLong(2).toDouble
      assert(math.abs(a - e) / e <= 0.03, s"${r.getString(0)}: $a vs $e")
    }
  }

  test("percentile_approx: p50 <= p99, both within min/max") {
    val r = Tables.load(spark, sf(), "events")
      .agg(min(col("value")).as("lo"), max(col("value")).as("hi"),
        percentile_approx(col("value"), lit(0.5), lit(10000)).as("p50"),
        percentile_approx(col("value"), lit(0.99), lit(10000)).as("p99"))
      .collect()(0)
    val (lo, hi, p50, p99) =
      (r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))
    assert(lo <= p50 && p50 <= p99 && p99 <= hi)
  }
}
