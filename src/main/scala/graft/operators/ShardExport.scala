package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

import graft.functions.{Curation, TextAnalysis}
import graft.store.SnapshotStore

/** Materialized training-shard export — the pipeline's OUTPUT side: the
  * curated corpus written as fixed-token-budget shards in a
  * deterministic pseudo-random order, with a manifest, published
  * atomically. The WebDataset/MDS-style layout a dataloader actually
  * consumes: rank r streams shard files r, r+W, r+2W...; the manifest's
  * token counts drive step accounting.
  *
  * Assignment: docs ordered by the epoch coin md5("epoch:id")
  * ([[Curation.epochCoin]] — [[TrainingOrder]]'s byte-reproducible
  * shuffle, independent of cluster size and input partitioning), then
  * cut greedily at `budgetTokens` boundaries WITHOUT splitting docs:
  * shard = floor(exclusive-running-token-sum / budget), the q44 pack
  * rule lifted from a per-language window to a GLOBAL total order via
  * [[SequencePacking.globalRunningSum]] (range-partitioned prefix sums —
  * one range shuffle, never a single-partition window). A shard may
  * overrun the budget by at most one document (inherent to atomic docs;
  * the oracle replays the same rule).
  *
  * Export: one parquet directory per shard (hash-repartitioned on
  * shard_id — each shard lands wholly in one task, so one file per
  * shard), rows sorted in replay order within the shard, plus a
  * `_shard_manifest` summary table. The whole shard set is staged and
  * published as ONE [[SnapshotStore]] version: a reader never observes
  * a half-written epoch, and re-exports (next epoch, re-run) are new
  * snapshots — the same commit discipline as the persisted indexes.
  */
object ShardExport {

  /** (idCol, n_tokens, tok_start, shard_id, __coin) for one epoch:
    * deterministic shard + within-shard replay order for every doc. */
  def assignShards(docs: DataFrame, idCol: String, textCol: String,
                   epoch: Int, budgetTokens: Long): DataFrame = {
    require(budgetTokens > 0, "budgetTokens must be positive")
    val prepared = docs
      .withColumn("__coin", Curation.epochCoin(col(idCol), epoch))
      .withColumn("n_tokens", TextAnalysis.tokenCountWs(col(textCol)))
    SequencePacking.globalRunningSum(prepared,
        ord = Seq(col("__coin"), col(idCol)),
        valueCol = col("n_tokens"), startCol = "tok_start",
        endCol = "__tok_end")
      .withColumn("shard_id",
        floor(col("tok_start") / budgetTokens).cast(IntegerType))
      .drop("__tok_end")
  }

  /** Write the epoch's shards + manifest, atomically published; returns
    * the snapshot version. Shard rows keep all of `docs`' columns plus
    * (shard_id, n_tokens); the manifest is (shard_id, n_docs,
    * shard_tokens). */
  def export(spark: SparkSession, docs: DataFrame, idCol: String,
             textCol: String, epoch: Int, budgetTokens: Long,
             root: String): Int = {
    val staged = SnapshotStore.stage(root)
    val assigned = assignShards(docs, idCol, textCol, epoch, budgetTokens)
    // Hash-repartition on shard_id: every shard wholly in one task ->
    // partitionBy emits exactly one file per shard directory; the sort
    // puts rows in replay order inside the file.
    assigned
      .repartition(col("shard_id"))
      .sortWithinPartitions(col("shard_id"), col("__coin"), col(idCol))
      .drop("__coin")
      .write.partitionBy("shard_id")
      .parquet(staged.resolve("shards").toString)
    // Manifest derived from the WRITTEN files, not the assignment plan:
    // one pass over the corpus total (re-running the assignment would
    // repeat its range shuffle), and the manifest provably describes
    // the physical artifact. Shard-count-sized (corpus tokens /
    // budget) — bounded metadata, so one file is the right layout. The
    // name must not start with '_' (Spark's readers skip hidden paths).
    spark.read.parquet(staged.resolve("shards").toString)
      .groupBy(col("shard_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("shard_tokens"))
      .coalesce(1)
      .write.parquet(staged.resolve("manifest").toString)
    val parent = SnapshotStore.currentVersion(root).getOrElse(0)
    SnapshotStore.publish(root, staged, parent)
  }

  /** The published manifest of a snapshot (newest by default). */
  def manifest(spark: SparkSession, root: String,
               version: Option[Int] = None): DataFrame =
    spark.read.parquet(
      SnapshotStore.resolve(root, version) + "/manifest")

  /** Read shards back (newest snapshot by default) — the dataloader's
    * view; `shard_id` partition pruning makes single-shard reads
    * touch one directory. */
  def readShards(spark: SparkSession, root: String,
                 version: Option[Int] = None): DataFrame =
    spark.read.parquet(SnapshotStore.resolve(root, version) + "/shards")
}
