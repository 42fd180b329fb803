package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-level unigram language-model scoring — the CCNet-style "how
  * typical of the corpus is this document" quality signal (reference
  * anchor: the same cheap-statistics discipline as the sentinel/missing
  * cleaning helpers in etl/mappers/directory.py:30-119, lifted to
  * corpus scope).
  *
  * p(token) = corpus count / corpus total; a document scores the average
  * (and minimum) natural-log probability of its tokens. Two passes over
  * one projected column:
  *
  *   1. vocabulary: groupBy(token) count — map-side combinable, and the
  *      result is bounded by word-type count (Heaps' law), NOT corpus
  *      size, so at 100 TB it still fits a broadcast;
  *   2. scoring: tokens equi-join the broadcast vocabulary (map-local, no
  *      shuffle of the corpus), then one groupBy(doc) aggregation.
  *
  * All math is double with round(6) at the edge — ln and the sum order
  * differ across engines only at ulp scale, which the rounding absorbs.
  */
object CorpusLm {

  /** @param broadcastVocab broadcast the aggregated vocabulary (default;
    *   word types, not tokens). Set false to force a shuffle join when a
    *   pathological vocabulary (e.g. unsplit binary junk) outgrows the
    *   driver — the plan stays equi-keyed either way. */
  def unigramLogProb(docs: DataFrame, idCol: String, textCol: String,
                     broadcastVocab: Boolean = true): DataFrame = {
    val toks = docs.select(col(idCol), explode(split(col(textCol), " ")).as("tok"))
    val vocab = toks.groupBy("tok").agg(count(lit(1)).as("cnt"))
    val total = vocab.agg(sum("cnt").cast("double").as("total"))
    val lm = vocab.crossJoin(total)
    toks.join(if (broadcastVocab) broadcast(lm) else lm, "tok")
      .withColumn("logp", log(col("cnt").cast("double") / col("total")))
      .groupBy(col(idCol))
      .agg(count(lit(1)).cast("int").as("n_tokens"),
        round(avg(col("logp")), 6).as("avg_logp"),
        round(min(col("logp")), 6).as("min_logp"))
  }
}
