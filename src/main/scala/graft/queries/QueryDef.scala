package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable query: a Spark build function over an sf directory of
  * parquet tables, plus (when SQL-expressible) an equivalent DuckDB oracle
  * over the same tables. Column names and row ordering must match exactly —
  * the driver sorts columns by name and hash-compares values.
  *
  * Conventions for oracle parity (see SURVEY.md §5):
  *   - every query ends in a deterministic total ORDER BY;
  *   - double aggregates go through exact DECIMAL sums, surfaced as DOUBLE;
  *   - int-sum results are cast to BIGINT on the DuckDB side (DuckDB widens
  *     integer sums to HUGEINT, Spark to LONG);
  *   - timestamps used as keys are cast to DATE or via year()+CAST(... AS INT).
  */
final case class QueryDef(
    name: String,
    description: String,
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    /** Data-dependent oracle: generated at Verify time with session + sf
      * dir in hand (e.g. q39 injects centroids of a model trained on the
      * actual table — deterministic, but not writable as a static
      * string). [[graft.Verify]] merges these into oracle_sql.json
      * alongside static oracles (generated wins on name collision). */
    oracleGen: Option[(SparkSession, String) => String] = None,
    /** For queries with NO oracle (neither static nor generated): the
      * machine-readable reason the omission is by design, plus the spec
      * that covers correctness instead. [[graft.Verify]] emits these as
      * oracle_omitted.json so the driver can distinguish "rows-only by
      * design" from "broken". */
    omittedReason: Option[String] = None)

trait QueryFamily {
  def defs: Seq[QueryDef]
}
