package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

import graft.functions.{Curation, TextAnalysis}

/** Curation AT INGEST: the q29 quality gate and the q62 acceptance coin
  * applied inside a streaming query, so rejected documents never land —
  * at 100 TB the cheapest byte is the one never written. Stateless
  * (pure projections + a stream-static broadcast join against the
  * slow-changing per-language rate dim), so no state store, no
  * watermark, and the SAME transform runs in batch — equivalence is
  * pinned in StreamingCurationSpec, the q33/ingest twin discipline.
  */
object StreamingCuration {

  /** documents.parquet physical schema (file sources need it declared). */
  val documentsFileSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** One transform for batch AND stream: quality score + md5 acceptance
    * coin, gated on both. `rates` is a static (lang, rate) dim — in a
    * stream it becomes a stream-static broadcast join, the standard shape
    * for slow-changing reference data (recomputed batch-side on whatever
    * cadence the corpus mix drifts; q62 derives it). */
  def curate(docs: DataFrame, rates: DataFrame, minQuality: Double): DataFrame =
    docs.select(col("doc_id"), col("lang"),
        TextAnalysis.qualityScore(col("text")).as("quality"),
        Curation.hashUniform(col("doc_id")).as("u"))
      .join(broadcast(rates), "lang")
      .where(col("quality") >= minQuality && col("u") < col("rate"))
      .select("doc_id", "lang", "quality", "u")

  /** Bounded replay of documents.parquet through a real streaming query
    * (file source → curate → memory sink, Trigger.AvailableNow). */
  def runAvailableNow(spark: SparkSession, sfDir: String, rates: DataFrame,
                      minQuality: Double): DataFrame = {
    val stream = spark.readStream
      .schema(documentsFileSchema)
      .option("pathGlobFilter", "documents.parquet")
      .parquet(sfDir)
    val name = s"curated_${System.nanoTime()}"
    val q = curate(stream, rates, minQuality)
      .writeStream
      .format("memory")
      .queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name)
  }
}
