package graft.store

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** S8: lineage sinks — run-level `load_log` and row-level `source_trace`,
  * append-only parquet.
  *
  * Field spec from /root/reference/sql/15_meta.sql:27-36 (load_log) and
  * :43-50 (source_trace); intent documented at architecture.md:93-97. The
  * reference ships the DDL but never writes rows — our runner actually
  * populates both (closing the reference's gap, flagged in SURVEY §2.1 S8).
  * BIGSERIAL surrogate ids have no distributed analogue; load_id is a
  * timestamp-derived long, unique per run.
  */
object LineageLog {

  final case class LoadLogEntry(
      load_id: Long, endpoint: String, year_start: Int, year_end: Int,
      rows_inserted: Long, rows_updated: Long,
      started_at: Timestamp, finished_at: Timestamp, status: String)

  final case class SourceTraceEntry(
      load_id: Long, endpoint: String, year: Int,
      source_url: String, source_hash: String, ingested_at: Timestamp)

  def loadLogPath(root: String): String = s"$root/meta/load_log"
  def sourceTracePath(root: String): String = s"$root/meta/source_trace"

  def appendLoadLog(spark: SparkSession, root: String, e: LoadLogEntry): Unit = {
    import spark.implicits._
    Seq(e).toDF().write.mode(SaveMode.Append).parquet(loadLogPath(root))
  }

  def appendSourceTrace(spark: SparkSession, root: String,
                        entries: DataFrame): Unit =
    entries.write.mode(SaveMode.Append).parquet(sourceTracePath(root))

  def readLoadLog(spark: SparkSession, root: String): DataFrame =
    spark.read.parquet(loadLogPath(root))

  def readSourceTrace(spark: SparkSession, root: String): DataFrame =
    spark.read.parquet(sourceTracePath(root))
}
