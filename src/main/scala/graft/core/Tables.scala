package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver-generated testdata layout (TESTDATA.md):
  * one parquet file-or-dir per table under an sf directory.
  *
  * At 100 TB each of these would be a partitioned/bucketed table; the
  * single-file layout is only the test fixture. All queries go through
  * here so the storage layout can change in one place.
  */
object Tables {
  val All: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    if (name == "events") normalizeEventTs(df) else df
  }

  /** Normalize an event-time column to a session-TZ TIMESTAMP, whatever the
    * fixture's physical encoding. The driver has regenerated events.parquet
    * across rounds with different encodings — TIMESTAMP(NANOS) surfaced as
    * long nanos (via spark.sql.legacy.parquet.nanosAsLong), then
    * TIMESTAMP_NTZ micros — and input-format drift is a first-class concern
    * (reference: etl/mappers/directory.py:55-67 alias lists). This is the
    * ONE place that absorbs it, shared by batch [[load]] and the streaming
    * sources, so no consumer may assume a physical encoding.
    *
    *  - long          → legacy nanos-as-long: truncate to micros, re-tag
    *  - TIMESTAMP_NTZ → cast to TIMESTAMP (identity re-tag: session is UTC)
    *  - TIMESTAMP     → already canonical
    */
  def normalizeEventTs(df: DataFrame, colName: String = "ts"): DataFrame =
    df.schema(colName).dataType match {
      case LongType =>
        df.withColumn(colName,
          timestamp_micros((col(colName) / 1000).cast(LongType)))
      case TimestampNTZType =>
        df.withColumn(colName, col(colName).cast(TimestampType))
      case TimestampType => df
      case other => throw new IllegalArgumentException(
        s"$colName: unsupported physical time encoding $other " +
          "(expected long nanos, TIMESTAMP_NTZ, or TIMESTAMP)")
    }

  /** Register every table as a temp view so `spark.sql` text queries work. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    All.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
