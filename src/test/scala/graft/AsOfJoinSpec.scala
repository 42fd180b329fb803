package graft

import org.apache.spark.sql.functions._

import graft.operators.AsOfJoin

/** As-of join semantics on a hand-built fixture: inclusive bound, tie
  * resolution, no-match nulls, and no row multiplication. */
class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private lazy val quotes = Seq(
    // key, time, quote_id, px
    ("A", 10L, 1L, 1.0),
    ("A", 20L, 2L, 2.0),
    ("A", 20L, 3L, 3.0), // tie at t=20 → quote 3 (max tiebreak) wins
    ("B", 50L, 4L, 4.0)
  ).toDF("k", "t", "quote_id", "px")

  private lazy val trades = Seq(
    ("A", 5L, 100L),  // before any quote → null
    ("A", 20L, 101L), // equal time → inclusive, tie → quote 3
    ("A", 25L, 102L), // → quote 3 (latest ≤ 25)
    ("B", 60L, 103L), // → quote 4
    ("C", 10L, 104L)  // key with no quotes → null
  ).toDF("k", "t", "trade_id")

  private lazy val joined = AsOfJoin.latestAsOf(
      trades, quotes, key = "k",
      leftTime = col("t"), rightTime = col("t"),
      tiebreak = col("quote_id"), payload = Seq("quote_id", "px"))
    .orderBy("trade_id")

  test("inclusive bound, ties by max tiebreak, nulls when no match") {
    val got = joined.select("trade_id", "asof_quote_id")
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
    assert(got.toSeq == Seq((100L, -1L), (101L, 3L), (102L, 3L),
      (103L, 4L), (104L, -1L)))
  }

  test("exactly one output row per left row (no fan-out)") {
    assert(joined.count() == 5)
    assert(joined.columns.toSeq ==
      Seq("k", "t", "trade_id", "asof_quote_id", "asof_px"))
  }
}
