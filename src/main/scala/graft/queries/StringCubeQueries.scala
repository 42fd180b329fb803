package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.Tables

/** String scalar functions (the reference's own LIKE filter lives at
  * db.py:124-129) and CUBE aggregation — rounding out the §2.3 Q1 family
  * and the grouping-analytics capability surface.
  */
object StringCubeQueries extends QueryFamily {

  private val q48 = QueryDef(
    "q48_string_funcs",
    "Q1/string surface: LIKE filters (schema_name LIKE 'ipeds_%' pattern, " +
      "db.py:124-129), substr/upper/replace/concat/length/regexp_extract " +
      "projections.",
    (s, dir) => Tables.load(s, dir, "part")
      .where(col("p_name").like("%widget%") && col("p_brand").like("Brand#1%"))
      .select(
        col("p_partkey"),
        upper(col("p_name")).as("name_u"),
        substring(col("p_name"), 1, 5).as("name5"),
        regexp_replace(col("p_name"), " ", "_").as("name_snake"),
        concat(col("p_brand"), lit("/"), col("p_type")).as("brand_type"),
        length(col("p_name")).cast(IntegerType).as("name_len"),
        regexp_extract(col("p_brand"), "#([0-9]+)", 1).as("brand_num"))
      .orderBy("p_partkey"),
    Some("""
      SELECT p_partkey,
             upper(p_name) AS name_u,
             substr(p_name, 1, 5) AS name5,
             replace(p_name, ' ', '_') AS name_snake,
             p_brand || '/' || p_type AS brand_type,
             CAST(length(p_name) AS INTEGER) AS name_len,
             regexp_extract(p_brand, '#([0-9]+)', 1) AS brand_num
      FROM part
      WHERE p_name LIKE '%widget%' AND p_brand LIKE 'Brand#1%'
      ORDER BY p_partkey"""))

  private val q19 = QueryDef(
    "q19_cube",
    "CUBE aggregation over (l_returnflag, l_linestatus): all four grouping " +
      "combinations with coalesced subtotal keys (completes the rollup/" +
      "grouping-sets family started by q12).",
    (s, dir) => Tables.load(s, dir, "lineitem")
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast(DecimalType(20, 4))).cast(DoubleType)
          .as("sum_qty"))
      .select(coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
        coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
        col("n"), col("sum_qty"))
      .orderBy("rf", "ls"),
    Some("""
      SELECT coalesce(l_returnflag, 'ALL') AS rf,
             coalesce(l_linestatus, 'ALL') AS ls,
             count(*) AS n,
             CAST(SUM(CAST(l_quantity AS DECIMAL(20,4))) AS DOUBLE) AS sum_qty
      FROM lineitem
      GROUP BY CUBE (l_returnflag, l_linestatus)
      ORDER BY rf, ls"""))

  override val defs: Seq[QueryDef] = Seq(q48, q19)
}
