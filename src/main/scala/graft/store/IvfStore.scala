package graft.store

import scala.jdk.CollectionConverters._

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

  /** DELETE vectors by id — the compliance verb for the ANN index,
    * PARTITION-GRANULAR: the table is cluster-partitioned and a doomed
    * id lives in exactly the partition its assignment put it in, so
    * only the AFFECTED cluster partitions rewrite (anti-joined); every
    * other partition carries into the new snapshot by hard link. The
    * text index needed tombstones because term clustering smears a doc
    * across all files (Bm25.deleteFromIndex); here the layout already
    * co-locates by the delete's unit, so the MergeStore-style
    * file-granular rewrite applies directly — no tombstones, no
    * query-time anti-join, and searches over the survivors are exact by
    * construction. Returns the new version (parent if nothing matched). */
  def delete(spark: SparkSession, indexDir: String, doomedIds: DataFrame,
             idCol: String, clusterCol: String = "ivf_cluster"): Int = {
    import org.apache.spark.sql.functions.col
    val parentV = currentVersion(indexDir).getOrElse(
      sys.error(s"IvfStore.delete: no committed index at $indexDir"))
    val prev = java.nio.file.Paths
      .get(SnapshotStore.resolve(indexDir, Some(parentV)), Vectors)
    val vectors = read(spark, indexDir, Some(parentV))
    val doomed = doomedIds
      .select(col(doomedIds.columns.head).as(idCol)).distinct()
    // Affected cluster list: bounded by k (the coarse-quantizer size),
    // driver-safe by construction.
    val affected = vectors.join(doomed, Seq(idCol), "left_semi")
      .select(col(clusterCol)).distinct()
      .collect().map(_.get(0)).toSeq
    if (affected.isEmpty) return parentV
    val stage = SnapshotStore.stage(indexDir)
    vectors.where(col(clusterCol).isin(affected: _*)) // partition-pruned
      .join(doomed, Seq(idCol), "left_anti")
      .write.partitionBy(clusterCol).parquet(s"$stage/$Vectors")
    // Carry every UNaffected partition directory by hard link.
    val affectedDirs = affected.map(c => s"$clusterCol=$c").toSet
    java.nio.file.Files.list(prev).iterator().asScala
      .filter(p => java.nio.file.Files.isDirectory(p) &&
        !affectedDirs.contains(p.getFileName.toString))
      .foreach { p =>
        SnapshotStore.carryLink(p,
          stage.resolve(Vectors).resolve(p.getFileName.toString),
          s"carry-$parentV-")
      }
    SnapshotStore.publish(indexDir, stage, parentV)
  }

  /** Drop snapshots below the newest `retainVersions` — hard-link
    * reference counting keeps shared files alive while any retained
    * snapshot still points at them. */
  def vacuum(indexDir: String, retainVersions: Int = 1): Int =
    SnapshotStore.vacuum(indexDir, retainVersions)
}
