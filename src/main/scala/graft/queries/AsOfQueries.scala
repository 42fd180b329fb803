package graft.queries

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.AsOfJoin

/** Temporal as-of join: each event picks the most recent order of the same
  * key at-or-before its timestamp. Time compared at microsecond precision
  * on both engines (events are nanos on disk; DuckDB compares epoch_us) so
  * the inclusive bound can't flip on sub-microsecond digits.
  */
object AsOfQueries extends QueryFamily {

  private val q36 = QueryDef(
    "q36_asof_join",
    "As-of join via the union+window formulation (no fan-out join): latest " +
      "order with o_custkey = user_id and o_orderdate <= ts per event; " +
      "o_orderkey breaks equal-time ties deterministically.",
    (s, dir) => {
      val events = Tables.load(s, dir, "events")
        .select(col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("ts_us"))
      val orders = Tables.load(s, dir, "orders")
        .select(col("o_custkey").as("user_id"), col("o_orderkey"),
          col("o_totalprice"),
          // parquet stores TIMESTAMP_NTZ; session is UTC so the cast is an
          // identity re-tag that unix_micros accepts
          unix_micros(col("o_orderdate").cast("timestamp")).as("od_us"))
      AsOfJoin.latestAsOf(events, orders, key = "user_id",
          leftTime = col("ts_us"), rightTime = col("od_us"),
          tiebreak = col("o_orderkey"),
          payload = Seq("o_orderkey", "o_totalprice"))
        .select("event_id", "user_id", "asof_o_orderkey", "asof_o_totalprice")
        .orderBy("event_id")
    },
    Some("""
      SELECT event_id, user_id,
             asof_o_orderkey, asof_o_totalprice
      FROM (
        SELECT e.event_id, e.user_id,
               o.o_orderkey AS asof_o_orderkey,
               o.o_totalprice AS asof_o_totalprice,
               row_number() OVER (PARTITION BY e.event_id
                 ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
        FROM events e
        LEFT JOIN orders o
          ON o.o_custkey = e.user_id
         AND epoch_us(o.o_orderdate) <= epoch_us(e.ts))
      WHERE rn = 1
      ORDER BY event_id"""))

  override val defs: Seq[QueryDef] = Seq(q36)
}
