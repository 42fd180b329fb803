package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

import graft.functions.Curation

/** Deterministic epoch shuffle + shard assignment — the materialized
  * data-loader order. Training runs need every epoch to read the corpus
  * in a different pseudo-random order, sharded so each loader rank
  * streams one slice, and byte-identically REPRODUCIBLE (restarts,
  * reruns, and "what did step 1e6 train on?" forensics all replay it).
  *
  * Both the shard and the within-shard order derive from md5("epoch:id")
  * ([[Curation.epochCoin]]): stable across engines, runs, cluster sizes,
  * and input partitionings — re-partitioning the corpus can never change
  * the training order (the q41 split-stability property, extended to a
  * total order). A different epoch yields an independent permutation
  * without rewriting anything but the epoch literal.
  *
  * Scale shape: the only non-map work is ONE window partitioned by
  * shard (position + cumulative token offset share it). Each shard is a
  * full sort of corpus/shards docs — inherent to materializing a total
  * order per shard — so `shards` is chosen to bound the slice (e.g.
  * ~1 GB of ids+offsets per shard at 100 TB: tens of thousands of
  * shards, which also matches loader-rank counts). The window carries
  * only (id, shard, coin, n_tokens) — text stays in place.
  */
object TrainingOrder {

  /** (idCol, shard, pos, n_tokens, token_offset) for one epoch:
    * `pos` = 0-based position of the doc in its shard's read order,
    * `token_offset` = tokens preceding it in the shard (whitespace
    * count on `textCol`) — the cursor a loader seeks to. */
  def epochOrder(docs: DataFrame, idCol: String, textCol: String,
                 epoch: Int, shards: Int): DataFrame = {
    val coin = Curation.epochCoin(col(idCol), epoch)
    val w = Window.partitionBy(col("shard"))
      .orderBy(col("__coin"), col(idCol))
    docs.select(col(idCol),
        Curation.hashBucket(concat_ws(":", lit(epoch), col(idCol).cast("string")),
          shards).as("shard"),
        coin.as("__coin"),
        size(split(col(textCol), " ")).as("n_tokens"))
      .withColumn("pos", (row_number().over(w) - 1).cast(IntegerType))
      .withColumn("token_offset",
        coalesce(sum(col("n_tokens"))
          .over(w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col(idCol), col("shard"), col("pos"), col("n_tokens"),
        col("token_offset"))
  }
}
