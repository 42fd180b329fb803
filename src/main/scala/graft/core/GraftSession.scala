package graft.core

import org.apache.spark.sql.SparkSession

/** Session factory for the engine.
  *
  * Decisions recorded in SURVEY.md §7 M0:
  *   - `spark.sql.ansi.enabled=false`: the reference's casts never throw —
  *     malformed input becomes NULL (/root/reference/etl/mappers/directory.py:70-105).
  *     Spark 4 defaults ANSI on, which would raise instead; we pin it off and
  *     additionally use `try_cast`-style guards in [[graft.functions.Cleaning]].
  *   - UTC session timezone: raw ingestion stamps UTC timestamps
  *     (/root/reference/etl/raw_io.py:175) and the DuckDB oracle is TZ-naive.
  *   - shuffle.partitions sized for the local[32] harness; on a real cluster
  *     this would be set to ~2-3x total cores or left to AQE coalescing.
  *   - AQE on: runtime coalescing + skew-join splitting are the scale story
  *     for the 100 TB target (skewed keys get split without manual salting).
  */
object GraftSession {

  /** Apply engine defaults to an existing builder (lets callers choose master). */
  def tune(b: SparkSession.Builder): SparkSession.Builder = b
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.ansi.enabled", "false")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
    .config("spark.sql.adaptive.skewJoin.enabled", "true")
    .config("spark.sql.parquet.filterPushdown", "true")
    // events.parquet stores ts as TIMESTAMP(NANOS); Spark has no nanos type.
    // Read as long and convert in Tables.load (truncate to micros).
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.sql.parquet.aggregatePushdown", "true")
    .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
    .config("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
    // The engine's SQL front door: MergeStore tables as a DSv2 catalog
    // (SELECT with manifest skipping, INSERT INTO, UPDATE/DELETE/MERGE
    // all through spark.sql) — see graft.store.GraftCatalog.
    .config("spark.sql.catalog.graft", "graft.store.GraftCatalog")
    .config("spark.sql.extensions", "graft.store.GraftSqlExtensions")
    .config("spark.ui.enabled", "false")

  /** Local session for tests / CLI mains. */
  def local(cores: Int = Runtime.getRuntime.availableProcessors()): SparkSession = {
    val s = tune(
      SparkSession.builder()
        .master(s"local[$cores]")
        .appName("graft")
        .config("spark.sql.shuffle.partitions", cores.toString)
    ).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
