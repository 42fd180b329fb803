package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** Data Selection via Importance Resampling — DSIR (Xie et al., NeurIPS
  * 2023): pick raw-corpus documents that LOOK LIKE a small target domain
  * by the likelihood ratio of two bag-of-ngrams language models,
  *
  *   log w(doc) = Σ_positions [ ln p_target(tok) − ln p_raw(tok) ],
  *
  * then sample ∝ w WITHOUT replacement via Gumbel top-k (Vieira's trick:
  * top-k by log w + Gumbel noise ≡ successive sampling without
  * replacement from softmax(log w)) — resampling, not ranking, is the
  * paper's point: plain top-k by w concentrates on a few extreme
  * documents, while resampling matches the target DISTRIBUTION.
  *
  * Spark shape (the [[CorpusLm]] discipline): both vocabularies are
  * Heaps-bounded groupBy aggregates — word TYPES, not tokens — so they
  * broadcast at any corpus size (`broadcastVocab = false` escape hatch
  * keeps the join equi-keyed when a pathological vocabulary outgrows the
  * driver); the corpus-side token join is map-local; one groupBy(doc)
  * shuffle produces the weights; the final selection is orderBy+limit =
  * TakeOrdered, never a corpus-wide single-partition window. The Gumbel
  * noise is the engine's deterministic md5 coin (q62's convention) shifted
  * to the interval midpoint so ln(u) is never ln(0) — stable across runs,
  * engines, partitionings, and cluster sizes.
  *
  * Laplace (+1) smoothing over the JOINT vocabulary keeps both models
  * positive on every raw token, so target-unseen tokens penalize
  * smoothly instead of zeroing the document (reference anchor: the same
  * defensive-statistics discipline as etl/mappers/directory.py:30-119,
  * lifted to corpus scope).
  */
object Dsir {

  /** Per-document importance weights: (idCol, n_tokens, logw).
    * `targetPred` marks the target-domain rows of `docs` itself (the
    * usual DSIR setup has a separate small target corpus; a predicate
    * covers both — pass a literal join/flag column for an external one).
    */
  def importanceWeights(docs: DataFrame, idCol: String, textCol: String,
                        targetPred: Column,
                        broadcastVocab: Boolean = true): DataFrame = {
    def maybeB(df: DataFrame): DataFrame =
      if (broadcastVocab) broadcast(df) else df
    val toks = docs
      .select(col(idCol), targetPred.as("__tgt"),
        explode(split(col(textCol), " ")).as("tok"))
    val raw = toks.groupBy("tok").agg(count(lit(1)).as("cr"),
      sum(when(col("__tgt"), 1L).otherwise(0L)).as("ct"))
    // 1-row model constants: |V| over the joint vocabulary, total token
    // mass of each side. Broadcast-crossed, never a shuffle.
    val consts = raw.agg(
      count(lit(1)).as("v"), sum("cr").as("nr"), sum("ct").as("nt"))
    val logRatio =
      log((col("ct") + 1).cast("double") / (col("nt") + col("v")).cast("double")) -
        log((col("cr") + 1).cast("double") / (col("nr") + col("v")).cast("double"))
    toks
      .join(maybeB(raw), "tok")
      .crossJoin(broadcast(consts))
      .groupBy(col(idCol))
      .agg(count(lit(1)).cast("int").as("n_tokens"),
        sum(logRatio).as("__logw"))
  }

  /** Deterministic uniform on (0,1): q62's md5 coin shifted to the
    * 1/65536-grid midpoint, so the Gumbel transform below never sees 0
    * (Spark's log(0) is null where DuckDB's is -inf — the midpoint
    * dodges the disagreement entirely). */
  private def hashUniformMid(key: Column): Column =
    (conv(substring(md5(key.cast(StringType)), 1, 4), 16, 10)
      .cast("double") + lit(0.5)) / lit(65536.0)

  /** Gumbel top-k resample: `k` documents drawn without replacement with
    * probability ∝ exp(logw / temperature). Returns (idCol, n_tokens,
    * logw, gkey) — the realized sample, ordered by the Gumbel key. */
  def resampleTopK(docs: DataFrame, idCol: String, textCol: String,
                   targetPred: Column, k: Int,
                   temperature: Double = 1.0,
                   broadcastVocab: Boolean = true): DataFrame = {
    val gumbel = -log(-log(hashUniformMid(col(idCol))))
    importanceWeights(docs, idCol, textCol, targetPred, broadcastVocab)
      .withColumn("gkey",
        round(col("__logw") / lit(temperature) + gumbel, 6))
      .withColumn("logw", round(col("__logw"), 6))
      .select(col(idCol), col("n_tokens"), col("logw"), col("gkey"))
      .orderBy(col("gkey").desc, col(idCol))
      .limit(k)
  }
}
