package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.Tables
import graft.operators.RangeJoin

/** Banded range join surface: orders priced into (overlapping) value tiers.
  * The oracle states the same join as a plain inequality join — correct in
  * DuckDB at any size, while the Spark side uses the banded equi-join that
  * survives scale (a raw inequality join plans BroadcastNestedLoop).
  */
object RangeJoinQueries extends QueryFamily {

  private val q37 = QueryDef(
    "q37_range_join",
    "Point-in-interval range join via interval bucketing (equi-join on " +
      "bands + exact containment filter): orders matched into overlapping " +
      "price tiers, aggregated per tier.",
    (s, dir) => {
      import s.implicits._
      val tiers = Seq(
        ("t1_low", 0.0, 50000.0),
        ("t2_mid", 25000.0, 150000.0),
        ("t3_high", 150000.0, 1000000.0)).toDF("tier", "lo", "hi")
      RangeJoin.pointInInterval(
          Tables.load(s, dir, "orders"), tiers,
          valueCol = "o_totalprice", loCol = "lo", hiCol = "hi",
          bandWidth = 10000.0)
        .groupBy("tier")
        .agg(count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast(DecimalType(20, 2))).cast(DoubleType)
            .as("sum_price"))
        .orderBy("tier")
    },
    Some("""
      WITH tiers(tier, lo, hi) AS (VALUES
        ('t1_low', 0.0, 50000.0),
        ('t2_mid', 25000.0, 150000.0),
        ('t3_high', 150000.0, 1000000.0))
      SELECT tier, count(*) AS n_orders,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(20,2))) AS DOUBLE)
               AS sum_price
      FROM orders JOIN tiers
        ON o_totalprice >= lo AND o_totalprice <= hi
      GROUP BY tier
      ORDER BY tier"""))

  override val defs: Seq[QueryDef] = Seq(q37)
}
