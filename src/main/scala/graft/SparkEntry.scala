package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Query names are grouped by family:
  *   q0x  — reference compat surface (SURVEY §2.3 / §2.2 transforms)
  *   q1x  — windows / set ops / capability extensions
  *   q2x  — north-star: dedup + similarity + text analysis
  *   q3x  — pipeline round-trips / streaming batch-equivalents
  */
object SparkEntry {

  private def families: Seq[QueryFamily] =
    Seq(CompatQueries, ExtendedQueries, PipelineQueries, DedupQueries,
      SimilarityQueries, TextQueries, StreamMultimodalQueries,
      StringCubeQueries, SketchQueries, AsOfQueries, RangeJoinQueries,
      WinnowQueries, CurationQueries, StatsQueries, SelectionQueries,
      QualityQueries, RetrievalQueries, StoreQueries)

  private lazy val allDefs: Seq[QueryDef] = families.flatMap(_.defs)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    allDefs.find(_.name == "q05_join_enrich").get
      .build(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map(d => d.name -> d.build).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allDefs.flatMap(d => d.oracle.map(sql => d.name -> sql.trim)).toMap

  /** Data-dependent oracle generators (e.g. q39 injects centroids of a
    * deterministic model trained on the actual table at Verify time).
    * [[Verify]] merges the generated SQL into oracle_sql.json. */
  def oracleGen: Map[String, (SparkSession, String) => String] =
    allDefs.flatMap(d => d.oracleGen.map(g => d.name -> g)).toMap

  /** Declared rows-only queries: name → why the oracle omission is by
    * design and which spec covers correctness instead. */
  def oracleOmitted: Map[String, String] =
    allDefs.flatMap(d => d.omittedReason.map(r => d.name -> r)).toMap
}
