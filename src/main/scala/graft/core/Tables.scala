package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

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
    // events.ts is parquet TIMESTAMP(NANOS), surfaced as long nanos via
    // spark.sql.legacy.parquet.nanosAsLong; convert to a true timestamp
    // (micros, truncating) so downstream time ops are type-correct.
    if (name == "events" && df.schema("ts").dataType == LongType)
      df.withColumn("ts", timestamp_micros((col("ts") / 1000).cast(LongType)))
    else df
  }

  /** Register every table as a temp view so `spark.sql` text queries work. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    All.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
