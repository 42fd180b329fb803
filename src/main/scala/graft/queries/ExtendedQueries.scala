package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.Tables
import graft.ingest.Chunker

/** Capability extensions beyond the reference's literal surface (SURVEY §2.3
  * "not present anywhere in the reference" list): windows, rollup, semi/anti
  * joins, set ops — plus the reference ops that need wider machinery:
  * T8 explode, T11 page chunking, Q11/Q12 KPI + decode shapes over events.
  */
object ExtendedQueries extends QueryFamily {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  private val q11 = QueryDef(
    "q11_window_running",
    "Running windows: per-customer order sequence number and running spend " +
      "(frame ROWS UNBOUNDED PRECEDING..CURRENT). Exact DECIMAL running sum " +
      "surfaced as DOUBLE.",
    (s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      t(s, dir, "orders")
        .withColumn("order_seq", row_number().over(w))
        .withColumn("run_spend",
          sum(col("o_totalprice").cast(DecimalType(20, 4)))
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast(DoubleType))
        .select("o_custkey", "o_orderkey", "order_seq", "run_spend")
        .orderBy("o_custkey", "order_seq")
    },
    Some("""
      SELECT o_custkey, o_orderkey,
             CAST(row_number() OVER w AS INTEGER) AS order_seq,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(20,4))) OVER
               (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
               AS run_spend
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
      ORDER BY o_custkey, order_seq"""))

  private val q12 = QueryDef(
    "q12_rollup",
    "ROLLUP aggregation: customer counts and account balances by region and " +
      "nation with subtotal and grand-total rows (NULL keys coalesced to " +
      "'ALL' so both engines order identically).",
    (s, dir) => {
      val cust = t(s, dir, "customer")
      val nat = broadcast(t(s, dir, "nation"))
      val reg = broadcast(t(s, dir, "region"))
      cust
        .join(nat, col("c_nationkey") === col("n_nationkey"))
        .join(reg, col("n_regionkey") === col("r_regionkey"))
        .rollup(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_cust"),
          sum(col("c_acctbal").cast(DecimalType(20, 4))).cast(DoubleType)
            .as("sum_bal"))
        .select(coalesce(col("r_name"), lit("ALL")).as("region_name"),
          coalesce(col("n_name"), lit("ALL")).as("nation_name"),
          col("n_cust"), col("sum_bal"))
        .orderBy("region_name", "nation_name")
    },
    Some("""
      SELECT coalesce(r_name, 'ALL') AS region_name,
             coalesce(n_name, 'ALL') AS nation_name,
             count(*) AS n_cust,
             CAST(SUM(CAST(c_acctbal AS DECIMAL(20,4))) AS DOUBLE) AS sum_bal
      FROM customer
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY ROLLUP (r_name, n_name)
      ORDER BY region_name, nation_name"""))

  private val q13 = QueryDef(
    "q13_semi_anti",
    "Semi + anti joins: customers that have at least one order (EXISTS) but " +
      "no 'F'-status order (NOT EXISTS). Both sides stay broadcast-able and " +
      "null-safe — no row multiplication.",
    (s, dir) => {
      val cust = t(s, dir, "customer")
      val orders = t(s, dir, "orders")
      cust
        .join(orders, col("c_custkey") === col("o_custkey"), "left_semi")
        .join(orders.where(col("o_orderstatus") === "F"),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    },
    Some("""
      SELECT c_custkey, c_name
      FROM customer c
      WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c.c_custkey)
        AND NOT EXISTS (SELECT 1 FROM orders
                        WHERE o_custkey = c.c_custkey AND o_orderstatus = 'F')
      ORDER BY c_custkey"""))

  private val q14 = QueryDef(
    "q14_dim_decode",
    "Q12: code→label decode via a broadcast-literal map (ipeds_dim decode, " +
      "architecture.md:46-48) — event_type → business category, with an " +
      "'other' fallback, aggregated per category.",
    (s, dir) => {
      val decode = typedLit(Map(
        "click" -> "engagement", "view" -> "engagement",
        "purchase" -> "revenue", "signup" -> "growth", "error" -> "ops"))
      t(s, dir, "events")
        .select(coalesce(element_at(decode, col("event_type")), lit("other"))
          .as("category"))
        .groupBy("category")
        .agg(count(lit(1)).as("n"))
        .orderBy("category")
    },
    Some("""
      SELECT CASE event_type
               WHEN 'click' THEN 'engagement'
               WHEN 'view' THEN 'engagement'
               WHEN 'purchase' THEN 'revenue'
               WHEN 'signup' THEN 'growth'
               WHEN 'error' THEN 'ops'
               ELSE 'other' END AS category,
             count(*) AS n
      FROM events
      GROUP BY 1
      ORDER BY category"""))

  private val q15 = QueryDef(
    "q15_set_ops",
    "Set operations: customer keys with orders (INTERSECT) minus negative-" +
      "balance customers (EXCEPT), as key sets.",
    (s, dir) => {
      val orderKeys = t(s, dir, "orders").select(col("o_custkey").as("k"))
      val custKeys = t(s, dir, "customer").select(col("c_custkey").as("k"))
      val negBal = t(s, dir, "customer").where(col("c_acctbal") < 0)
        .select(col("c_custkey").as("k"))
      orderKeys.intersect(custKeys).except(negBal).orderBy("k")
    },
    Some("""
      SELECT k FROM (
        SELECT o_custkey AS k FROM orders
        INTERSECT
        SELECT c_custkey AS k FROM customer
        EXCEPT
        SELECT c_custkey AS k FROM customer WHERE c_acctbal < 0)
      ORDER BY k"""))

  private val q16 = QueryDef(
    "q16_explode_words",
    "T8: explode/flatten — documents tokenized and exploded one row per " +
      "token (the payload-array explode shape, core_io.py:74-90), top-50 " +
      "token frequencies.",
    (s, dir) => t(s, dir, "documents")
      .select(explode(split(col("text"), " ")).as("word"))
      .groupBy("word")
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("word"))
      .limit(50),
    Some("""
      SELECT word, count(*) AS n
      FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
      GROUP BY word
      ORDER BY n DESC, word
      LIMIT 50"""))

  private val q17 = QueryDef(
    "q17_page_chunking",
    "T11+Q5: page chunking — events split into 500-record pages (1-based " +
      "page_number, raw_io.py:159-178) with per-page record counts and key " +
      "ranges; jsonb_array_length ≡ the per-page count.",
    (s, dir) => Chunker
      .withPageNumber(t(s, dir, "events"), Seq(col("event_id")), 500)
      .groupBy("page_number")
      .agg(count(lit(1)).cast(IntegerType).as("record_count"),
        min(col("event_id")).as("first_id"), max(col("event_id")).as("last_id"))
      .orderBy("page_number"),
    Some("""
      SELECT CAST(floor((rn - 1) / 500) + 1 AS INTEGER) AS page_number,
             CAST(count(*) AS INTEGER) AS record_count,
             min(event_id) AS first_id, max(event_id) AS last_id
      FROM (SELECT event_id,
                   row_number() OVER (ORDER BY event_id) AS rn FROM events)
      GROUP BY 1
      ORDER BY page_number"""))

  private val q18 = QueryDef(
    "q18_kpi_daily",
    "Q11: ratio-of-sums KPI per day (yearly_kpis shape, architecture.md:56): " +
      "event volume, purchase conversion, error rate. Ratios divide exact " +
      "BIGINT counts — bit-identical doubles in both engines.",
    (s, dir) => t(s, dir, "events")
      .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .agg(
        count(lit(1)).as("n_events"),
        count(when(col("event_type") === "purchase", 1)).as("n_purchase"),
        count(when(col("event_type") === "click", 1)).as("n_click"),
        (count(when(col("event_type") === "purchase", 1)) /
          nullif(count(when(col("event_type") === "click", 1)), lit(0)))
          .as("conv_rate"),
        (count(when(col("event_type") === "error", 1)) / count(lit(1)))
          .as("error_rate"))
      .orderBy("day"),
    Some("""
      SELECT strftime(ts, '%Y-%m-%d') AS day,
             count(*) AS n_events,
             count(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
             count(*) FILTER (WHERE event_type = 'click') AS n_click,
             CAST(count(*) FILTER (WHERE event_type = 'purchase') AS DOUBLE) /
               nullif(count(*) FILTER (WHERE event_type = 'click'), 0)
               AS conv_rate,
             CAST(count(*) FILTER (WHERE event_type = 'error') AS DOUBLE) /
               count(*) AS error_rate
      FROM events
      GROUP BY 1
      ORDER BY day"""))

  override val defs: Seq[QueryDef] =
    Seq(q11, q12, q13, q14, q15, q16, q17, q18)
}
