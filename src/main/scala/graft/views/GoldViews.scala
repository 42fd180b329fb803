package graft.views

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Upsert

/** The gold (BI view) layer — the four named views the reference documents
  * (/root/reference/architecture.md:50-56 [doc-only]) plus the materialized
  * refresh contract (architecture.md:85-87), realized as recompute-and-
  * atomically-overwrite parquet tables.
  *
  * Q8 institutions_latest, Q9 admissions_enriched (shape), Q10
  * completions_by_cip (dim decode shape), Q11 yearly_kpis, Q12 code→label
  * decode, Q13 refresh.
  */
object GoldViews {

  /** Q8: latest Directory row per institution (architecture.md:53). */
  def institutionsLatest(directory: DataFrame): DataFrame =
    Upsert.latestPerKey(directory, Seq("unitid"), Seq(col("year")))

  /** Q9: fact ⋈ Directory on (unitid, year) adding name/state/sector
    * (admissions_enriched shape, architecture.md:54). Directory names are
    * dim-sized per year — broadcast. */
  def enriched(fact: DataFrame, directory: DataFrame): DataFrame = {
    val dim = directory.select("unitid", "year", "inst_name", "state_abbr", "sector")
    fact.join(broadcast(dim), Seq("unitid", "year"), "left")
  }

  /** Q12: code → label decode via a broadcast dimension table
    * (ipeds_dim shape, architecture.md:46-48). */
  def decode(df: DataFrame, dim: DataFrame, codeCol: String,
             labelCol: String = "label"): DataFrame =
    df.join(broadcast(dim.withColumnRenamed("code", codeCol)
        .withColumnRenamed("label", labelCol)),
      Seq(codeCol), "left")

  /** The reference's sector dimension, as data (IPEDS sector codes). */
  def sectorDim(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      (0, "Administrative Unit"),
      (1, "Public 4-year or above"),
      (2, "Private nonprofit 4-year or above"),
      (3, "Private for-profit 4-year or above"),
      (4, "Public 2-year"),
      (5, "Private nonprofit 2-year"),
      (6, "Private for-profit 2-year"),
      (7, "Public less-than-2-year"),
      (8, "Private nonprofit less-than-2-year"),
      (9, "Private for-profit less-than-2-year")).toDF("code", "label")
  }

  /** Region (OBE/BEA) dimension — the second documented `ipeds_dim` lookup
    * (architecture.md:46-48; `region` column registry.py-style). */
  def regionDim(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      (0, "US Service schools"),
      (1, "New England"),
      (2, "Mid East"),
      (3, "Great Lakes"),
      (4, "Plains"),
      (5, "Southeast"),
      (6, "Southwest"),
      (7, "Rocky Mountains"),
      (8, "Far West"),
      (9, "Outlying areas")).toDF("code", "label")
  }

  /** Urban-centric locale dimension (architecture.md:46-48; the
    * `urban_centric_locale` directory column). Codes are the NCES 12-way
    * classification. */
  def localeDim(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      (11, "City: Large"), (12, "City: Midsize"), (13, "City: Small"),
      (21, "Suburb: Large"), (22, "Suburb: Midsize"), (23, "Suburb: Small"),
      (31, "Town: Fringe"), (32, "Town: Distant"), (33, "Town: Remote"),
      (41, "Rural: Fringe"), (42, "Rural: Distant"), (43, "Rural: Remote"))
      .toDF("code", "label")
  }

  /** Q11: yearly KPI rollup over the directory (yearly_kpis shape,
    * architecture.md:56): institution counts and attribute rates per year. */
  def yearlyKpis(directory: DataFrame): DataFrame =
    directory.groupBy("year")
      .agg(
        count(lit(1)).as("n_institutions"),
        count(when(col("hbcu") === 1, 1)).as("n_hbcu"),
        count(when(col("degree_granting") === 1, 1)).as("n_degree_granting"),
        (count(when(col("degree_granting") === 1, 1)) /
          nullif(count(lit(1)), lit(0))).as("degree_granting_rate"),
        countDistinct(col("state_abbr")).as("n_states"))
      .orderBy("year")

  /** Q13: materialized view refresh — recompute and atomically replace the
    * gold table (file-commit protocol gives the REFRESH CONCURRENTLY
    * observable behavior: readers see old or new, never partial). */
  def refresh(view: DataFrame, goldRoot: String, name: String): String = {
    val target = s"$goldRoot/vw/$name"
    view.write.mode(SaveMode.Overwrite).parquet(target)
    target
  }
}
