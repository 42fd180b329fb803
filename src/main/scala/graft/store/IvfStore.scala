package graft.store

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.IvfIndex

/** Transactional persistence for the IVF vector index — the raw
  * `assign(...).write.partitionBy("ivf_cluster")` + `appendBatch`
  * mode("append") layout is right for a single writer, but a reader
  * globbing the directory mid-append can observe a torn batch (some
  * cluster partitions updated, others not). This wraps the SAME
  * cluster-partitioned layout in [[SnapshotStore]]'s snapshot + CAS
  * protocol, so the vector table gets the guarantees the BM25 index and
  * MergeStore tables already have: atomic publish, version pinning,
  * time travel until vacuum, and loser-recomputes concurrency.
  *
  * Each snapshot holds `vectors/ivf_cluster=<c>/...` — probes read it
  * with the same partition pruning as the raw layout ([[read]] returns a
  * plain DataFrame for [[IvfIndex.searchTopK]] / `knnJoinApprox`).
  * Appends write ONLY the batch's files and carry the previous
  * snapshot's files by hard link (O(1) per file), preserving the
  * incremental-cost story of [[IvfIndex.appendBatch]]. The drift-trigger
  * variant composes: run `appendBatch` statistics on the batch first,
  * then commit through here.
  */
object IvfStore {

  private val Vectors = "vectors"

  def currentVersion(indexDir: String): Option[Int] =
    SnapshotStore.currentVersion(indexDir)

  /** Create the index: assign the corpus and publish snapshot v0. */
  def init(spark: SparkSession, df: DataFrame, vecCol: String,
           model: IvfIndex.Model, indexDir: String,
           clusterCol: String = "ivf_cluster"): Int = {
    val stage = SnapshotStore.stage(indexDir)
    IvfIndex.assign(spark, df, vecCol, model, clusterCol)
      .write.partitionBy(clusterCol).parquet(s"$stage/$Vectors")
    SnapshotStore.publish(indexDir, stage,
      currentVersion(indexDir).getOrElse(-1))
  }

  /** Append a batch as a new atomic snapshot: batch files written fresh,
    * prior snapshot carried by hard link. A concurrent reader pinned on
    * the old version keeps a complete consistent index; the next
    * resolve sees the complete new one. */
  def append(spark: SparkSession, batch: DataFrame, vecCol: String,
             model: IvfIndex.Model, indexDir: String,
             clusterCol: String = "ivf_cluster"): Int = {
    val parentV = currentVersion(indexDir).getOrElse(
      sys.error(s"IvfStore.append: no committed index at $indexDir"))
    val prev = java.nio.file.Paths
      .get(SnapshotStore.resolve(indexDir, Some(parentV)), Vectors)
    val stage = SnapshotStore.stage(indexDir)
    IvfIndex.assign(spark, batch, vecCol, model, clusterCol)
      .write.partitionBy(clusterCol).parquet(s"$stage/$Vectors")
    SnapshotStore.carryLink(prev, stage.resolve(Vectors), s"carry-$parentV-")
    SnapshotStore.publish(indexDir, stage, parentV)
  }

  /** Read a committed snapshot's vector table (newest by default) —
    * cluster-partitioned, so probe joins prune partitions exactly like
    * the raw layout. */
  def read(spark: SparkSession, indexDir: String,
           version: Option[Int] = None): DataFrame =
    spark.read.parquet(
      s"${SnapshotStore.resolve(indexDir, version)}/$Vectors")

  /** Drop snapshots below the newest `retainVersions` — hard-link
    * reference counting keeps shared files alive while any retained
    * snapshot still points at them. */
  def vacuum(indexDir: String, retainVersions: Int = 1): Int =
    SnapshotStore.vacuum(indexDir, retainVersions)
}
