package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.Tables
import graft.functions.Cleaning
import graft.operators.Upsert

/** The reference's query compatibility surface (SURVEY.md §2.3 Q1–Q13 and the
  * scalar transforms T1–T10), expressed over the driver testdata per the
  * FIXTURES.md §B mapping. Each entry has a DuckDB oracle.
  */
object CompatQueries extends QueryFamily {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // ---------------------------------------------------------------- Q1/Q2/Q3
  private val q01 = QueryDef(
    "q01_filter_sort",
    "Q1+Q2: equality/IN/BETWEEN/date filters with projection and total sort " +
      "(reference WHERE year IN/BETWEEN, core_io.py:68-72). Filters and the " +
      "2-column read both push to the parquet scan.",
    (s, dir) => t(s, dir, "lineitem")
      .where(col("l_quantity").between(10, 20)
        && col("l_returnflag").isin("A", "R")
        && col("l_shipdate") < lit("1997-01-01"))
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_returnflag"),
        date_format(col("l_shipdate"), "yyyy-MM-dd").as("ship_date"))
      // (l_orderkey, l_linenumber) is NOT unique in the synthetic data —
      // order by every output column for a total, engine-stable order.
      .orderBy("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag",
        "ship_date"),
    Some("""
      SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag,
             strftime(l_shipdate, '%Y-%m-%d') AS ship_date
      FROM lineitem
      WHERE l_quantity BETWEEN 10 AND 20
        AND l_returnflag IN ('A','R')
        AND l_shipdate < TIMESTAMP '1997-01-01'
      ORDER BY l_orderkey, l_linenumber, l_quantity, l_returnflag, ship_date"""))

  private val q02 = QueryDef(
    "q02_topk",
    "Q2+Q3: ORDER BY ... LIMIT (reference preview queries). Spark plans a " +
      "TakeOrderedAndProject: per-partition top-k, no full sort or shuffle.",
    (s, dir) => t(s, dir, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(100),
    Some("""
      SELECT o_orderkey, o_custkey, o_totalprice
      FROM orders
      ORDER BY o_totalprice DESC, o_orderkey ASC
      LIMIT 100"""))

  private val q03 = QueryDef(
    "q03_count",
    "Q4: COUNT(*) (reference env-check probe). Parquet row-group metadata " +
      "answers this without reading data pages (aggregate pushdown).",
    (s, dir) => t(s, dir, "lineitem").agg(count(lit(1)).as("n")),
    Some("SELECT count(*) AS n FROM lineitem"))

  // ------------------------------------------------------------------- Q11
  private val q04 = QueryDef(
    "q04_agg_pricing",
    "Q11: ratio-of-sums KPI aggregation (TPC-H Q1 shape, yearly_kpis view " +
      "architecture.md:56). Exact DECIMAL sums surfaced as DOUBLE so the " +
      "result is independent of partial-aggregation order.",
    (s, dir) => t(s, dir, "lineitem")
      .where(col("l_shipdate") <= lit("1998-09-02"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(col("l_quantity").cast(DecimalType(20, 4))).cast(DoubleType).as("sum_qty"),
        sum(col("l_extendedprice").cast(DecimalType(20, 4))).cast(DoubleType).as("sum_base_price"),
        // Cast FACTORS to decimal, not the double product: the data is
        // exact 2dp, so factor casts are unambiguous in every engine,
        // while double-product→decimal rounding differs at ~1e-8/row
        // between Spark (shortest-string) and DuckDB (binary) semantics.
        sum(col("l_extendedprice").cast(DecimalType(18, 2)) *
            (lit(1).cast(DecimalType(18, 2)) - col("l_discount").cast(DecimalType(18, 2))))
          .cast(DoubleType).as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus"),
    Some("""
      SELECT l_returnflag, l_linestatus,
             CAST(SUM(CAST(l_quantity AS DECIMAL(20,4))) AS DOUBLE) AS sum_qty,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(20,4))) AS DOUBLE) AS sum_base_price,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                      (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
                  AS DOUBLE) AS sum_disc_price,
             count(*) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus"""))

  // ---------------------------------------------------------------- Q9/Q10
  private val q05 = QueryDef(
    "q05_join_enrich",
    "Q9+Q10: enrichment join orders⋈customer⋈nation⋈region " +
      "(admissions_enriched / dim-lookup views, architecture.md:54-55). " +
      "nation+region are broadcast (dim-sized); customer join goes through " +
      "the shuffle-hash/broadcast choice AQE makes from runtime stats.",
    (s, dir) => {
      val orders = t(s, dir, "orders").where(col("o_orderstatus") === "F")
      val cust = t(s, dir, "customer")
      val nat = broadcast(t(s, dir, "nation"))
      val reg = broadcast(t(s, dir, "region"))
      orders
        .join(cust, col("o_custkey") === col("c_custkey"))
        .join(nat, col("c_nationkey") === col("n_nationkey"))
        .join(reg, col("n_regionkey") === col("r_regionkey"))
        .select("o_orderkey", "c_name", "n_name", "r_name", "o_totalprice")
        .orderBy("o_orderkey")
    },
    Some("""
      SELECT o_orderkey, c_name, n_name, r_name, o_totalprice
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation   ON c_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
      WHERE o_orderstatus = 'F'
      ORDER BY o_orderkey"""))

  // -------------------------------------------------------------------- Q8
  private val q06 = QueryDef(
    "q06_latest_per_key",
    "Q8: latest-per-key (institutions_latest view, architecture.md:53) — " +
      "latest order per customer via max_by aggregation (map-side combine; " +
      "no window sort).",
    (s, dir) => Upsert.latestPerKey(
        t(s, dir, "orders"),
        keys = Seq("o_custkey"),
        ord = Seq(col("o_orderdate"), col("o_orderkey")))
      .select(col("o_custkey"), col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"),
        col("o_totalprice"))
      .orderBy("o_custkey"),
    Some("""
      SELECT o_custkey, o_orderkey,
             strftime(o_orderdate, '%Y-%m-%d') AS order_date, o_totalprice
      FROM (SELECT *, row_number() OVER
              (PARTITION BY o_custkey
               ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
            FROM orders)
      WHERE rn = 1
      ORDER BY o_custkey"""))

  // -------------------------------------------------------------------- Q7
  private val q07 = QueryDef(
    "q07_upsert",
    "Q7: PK upsert last-write-wins (ON CONFLICT DO UPDATE, core_io.py:93-113)." +
      " A batch of updated rows (every 7th order, doubled price) overwrites " +
      "the base by key; exactly one surviving row per key.",
    (s, dir) => {
      val base = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_totalprice"), lit(1).as("v"))
      val upd = t(s, dir, "orders")
        .where(col("o_orderkey") % 7 === 0)
        .select(col("o_orderkey"), (col("o_totalprice") * 2).as("o_totalprice"),
          lit(2).as("v"))
      Upsert.upsertByKey(base, upd, keys = Seq("o_orderkey"),
          precedence = Seq(col("v")))
        .orderBy("o_orderkey")
    },
    Some("""
      WITH base AS (SELECT o_orderkey, o_totalprice, 1 AS v FROM orders),
           upd  AS (SELECT o_orderkey, o_totalprice*2 AS o_totalprice, 2 AS v
                    FROM orders WHERE o_orderkey % 7 = 0),
           allr AS (SELECT * FROM base UNION ALL SELECT * FROM upd)
      SELECT o_orderkey, o_totalprice, v
      FROM (SELECT *, row_number() OVER
              (PARTITION BY o_orderkey ORDER BY v DESC) AS rn FROM allr)
      WHERE rn = 1
      ORDER BY o_orderkey"""))

  // --------------------------------------------------------------- T8/T9/Q5
  private val q08 = QueryDef(
    "q08_json_extract",
    "T9+Q5: JSON field extraction + cast from a raw payload string " +
      "((elem->>'unitid')::int pattern, 10_load_endpoint.ipynb cell 4), " +
      "aggregated per event_type.",
    (s, dir) => t(s, dir, "events")
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast(IntegerType).as("k"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"), max(col("k")).as("max_k"))
      .orderBy("event_type"),
    Some("""
      SELECT event_type, count(*) AS n,
             CAST(SUM(k) AS BIGINT) AS sum_k,
             min(k) AS min_k, max(k) AS max_k
      FROM (SELECT event_type,
                   CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
            FROM events)
      GROUP BY event_type
      ORDER BY event_type"""))

  // ------------------------------------------------------------------- T10
  private val q09 = QueryDef(
    "q09_content_hash",
    "T10: canonical content digest per row (raw page hash, raw_io.py:57-70)." +
      " Canonical form = fixed field order + '|' separator; md5 hex. The " +
      "sorted-key JSON variant lives in graft.functions.Hashing (spec-tested).",
    (s, dir) => t(s, dir, "events")
      .select(col("event_id"),
        md5(concat_ws("|", col("event_id").cast(StringType),
          col("user_id").cast(StringType), col("event_type"))).as("row_hash"))
      .orderBy("event_id"),
    Some("""
      SELECT event_id,
             md5(concat_ws('|', CAST(event_id AS VARCHAR),
                 CAST(user_id AS VARCHAR), event_type)) AS row_hash
      FROM events
      ORDER BY event_id"""))

  // ---------------------------------------------------------------- T1–T5
  private val q10 = QueryDef(
    "q10_sentinel_clean",
    "T1-T5: IPEDS sentinel-null cleaning + safe int cast " +
      "(directory.py:30-119): -1/-2/-3, blanks → NULL; malformed int " +
      "('12.5') → NULL, not 12; plus the optional -3 suppression-flag " +
      "column (architecture.md:182). Sentinels and malformed values are " +
      "injected deterministically by doc_id.",
    (s, dir) => {
      val withDirty = t(s, dir, "documents").select(
        col("doc_id"),
        when(col("doc_id") % 5 === 0, lit("-1"))
          .when(col("doc_id") % 5 === 1, lit("  "))
          .otherwise(col("lang")).as("dirty_lang"),
        when(col("doc_id") % 7 === 0, lit("12.5"))
          .when(col("doc_id") % 7 === 1, lit("-3"))
          .otherwise(col("n_chars").cast(StringType)).as("dirty_chars"))
      withDirty.select(
          col("doc_id"),
          Cleaning.cleanStr(col("dirty_lang")).as("clean_lang"),
          Cleaning.safeInt(col("dirty_chars")).as("clean_chars"),
          Cleaning.suppressedFlag(col("dirty_chars")).as("chars_suppressed"))
        .orderBy("doc_id")
    },
    Some("""
      WITH dirty AS (
        SELECT doc_id,
               CASE WHEN doc_id % 5 = 0 THEN '-1'
                    WHEN doc_id % 5 = 1 THEN '  '
                    ELSE lang END AS dirty_lang,
               CASE WHEN doc_id % 7 = 0 THEN '12.5'
                    WHEN doc_id % 7 = 1 THEN '-3'
                    ELSE CAST(n_chars AS VARCHAR) END AS dirty_chars
        FROM documents)
      SELECT doc_id,
             CASE WHEN dirty_lang IS NULL OR trim(dirty_lang) = ''
                       OR trim(dirty_lang) IN ('-1','-2','-3') THEN NULL
                  ELSE trim(dirty_lang) END AS clean_lang,
             CASE WHEN dirty_chars IS NULL OR trim(dirty_chars) = ''
                       OR trim(dirty_chars) IN ('-1','-2','-3') THEN NULL
                  WHEN regexp_matches(trim(dirty_chars), '^[+-]?[0-9]+$')
                       THEN CAST(trim(dirty_chars) AS INTEGER)
                  ELSE NULL END AS clean_chars,
             coalesce(trim(dirty_chars) = '-3', false) AS chars_suppressed
      FROM dirty
      ORDER BY doc_id"""))

  override val defs: Seq[QueryDef] =
    Seq(q01, q02, q03, q04, q05, q06, q07, q08, q09, q10)
}
