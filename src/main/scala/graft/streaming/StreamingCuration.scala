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

  /** Decontamination AT INGEST — the q54/q71 hygiene step moved to where
    * it is cheapest: a doc that would leak benchmark text never lands.
    * Quarantines any incoming doc sharing >= `minShared` distinct n-grams
    * with the benchmark SUITE, probed against a Bloom summary built
    * batch-side ([[graft.operators.Dedup.benchBloom]], rebuilt whenever
    * the eval suite changes) and shipped to the stream as plan bytes.
    *
    * Stateless and batch-identical (same transform both modes, pinned in
    * StreamingCurationSpec), like the quality gate above. Semantics are
    * deliberately CONSERVATIVE vs the batch pairwise query: hits count
    * against the union of all benchmark shingles, and the Bloom filter
    * adds ≤ fpp false hits per shingle — so every doc the exact pairwise
    * check (q54) would flag is quarantined (shingle membership has no
    * false negatives; pairwise-shared ⊆ union-shared), plus a small
    * measurable over-quarantine. The right trade at ingest: keeping a
    * contaminated doc costs an invalid eval; re-admitting an
    * over-quarantined doc is a batch re-check of the quarantine bucket
    * (`crossNgramOverlap` on quarantined ids only). */
  def decontaminationGate(docs: DataFrame, bloomBytes: Array[Byte],
                          n: Int = 3, minShared: Int = 3): DataFrame = {
    val spark = docs.sparkSession
    graft.expressions.TextShingleExpressions.register(spark)
    graft.expressions.BloomExpressions.register(spark)
    // word_shingles materializes the distinct-shingle array ONCE as the
    // HOF's input; only the bloom probe runs per element.
    docs.withColumn("bench_hits",
        size(filter(call_function("word_shingles", col("text"), lit(n)),
          s => call_function("bloom_might_contain", lit(bloomBytes), s))))
      .where(col("bench_hits") < minShared)
  }

  /** Distilled-classifier gate AT INGEST — q84's frozen logistic model
    * applied where bytes are cheapest. The score is one literal-weights
    * codegen projection (no join, no state, no stats pass), so the gate
    * runs IDENTICALLY in a stream: train batch-side on whatever cadence
    * the corpus drifts ([[graft.operators.QualityClassifier]]), ship the
    * weights as plan literals. This is the production CCNet shape: the
    * expensive gate labels a sample offline, the distilled model meters
    * the firehose. */
  def classifierGate(docs: DataFrame,
                     model: graft.operators.QualityClassifier.Model,
                     minScore: Double): DataFrame =
    graft.operators.QualityClassifier.score(docs, "text", model)
      .where(col("score") >= minScore)

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
