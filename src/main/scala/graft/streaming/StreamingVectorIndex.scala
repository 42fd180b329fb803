package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.IvfIndex
import graft.store.{IvfStore, MergeStore, PqStore, SnapshotStore}

/** Continuous vector-index maintenance: the [[MergeStoreCdc]] change
  * stream of an embeddings table drives [[IvfStore.applyChanges]]
  * through foreachBatch, so the ANN index FOLLOWS the table
  * commit-by-commit — [[StreamingSearch]]'s "index follows the store"
  * shape for the vector side, completing the symmetry across every
  * derived structure (views↔StreamingIvm, replicas↔StreamingSync,
  * text index↔StreamingSearch, vector index↔this).
  *
  * Exactly-once under replay: each micro-batch publishes ONE index
  * snapshot carrying the batch's high commit version as snapshot
  * metadata ([[AppliedKey]]) — revision and marker are a single atomic
  * publish; a redelivered batch at or below the marker drops whole, a
  * straddling batch slices per-commit (StreamingIvm's rules).
  *
  * Model discipline: batches assign with the PARENT snapshot's own
  * pinned model ([[IvfStore.applyChanges]] takes none), so a follower
  * can never pair new vectors with the wrong centroids. Drift is the
  * caller's orchestration: run [[IvfIndex.driftStat]] on a schedule
  * and rebuild via [[initIndex]] when due — a retrain mid-stream would
  * silently re-cluster under a pinned reader, exactly what the store
  * exists to prevent.
  *
  * Scale shape per micro-batch: the batch holds only the span's
  * changed rows; the index pays assignment of the batch plus a
  * partition-granular COW on the affected clusters, never a corpus
  * re-assign.
  */
object StreamingVectorIndex {

  /** Which ANN store a followed index applies its change batches to —
    * the one seam between the plain-IVF and IVF-PQ lifecycles. Both
    * share the snapshot layout (vectors/ + model/), the marker idiom,
    * and the maintenance verb; they differ only in the applyChanges
    * encode step (PQ residual-encodes with the parent's pinned
    * codebooks). */
  sealed trait StoreKind {
    private[streaming] def applyChanges(spark: SparkSession,
        indexDir: String, upserts: DataFrame, deletes: DataFrame,
        idCol: String, vecCol: String, meta: Map[String, String]): Int
  }
  /** Plain IVF ([[IvfStore]]). */
  case object PlainIvf extends StoreKind {
    private[streaming] def applyChanges(spark: SparkSession,
        indexDir: String, upserts: DataFrame, deletes: DataFrame,
        idCol: String, vecCol: String, meta: Map[String, String]): Int =
      IvfStore.applyChanges(spark, indexDir, upserts, deletes, idCol,
        vecCol, meta = meta)
  }
  /** IVF-PQ ([[PqStore]]): upserts re-encode under the PARENT
    * snapshot's pinned codebooks; retrains stay out-of-band. */
  case object IvfPq extends StoreKind {
    private[streaming] def applyChanges(spark: SparkSession,
        indexDir: String, upserts: DataFrame, deletes: DataFrame,
        idCol: String, vecCol: String, meta: Map[String, String]): Int =
      PqStore.applyChanges(spark, indexDir, upserts, deletes, idCol,
        vecCol, meta = meta)
  }

  /** Snapshot-metadata key holding the applied source version. */
  private[graft] val AppliedKey = "ivf.applied"

  /** Source version the index currently reflects. */
  def appliedVersion(indexDir: String): Int =
    SnapshotStore.markerValue(indexDir, AppliedKey).map(_.toInt)
      .getOrElse(sys.error(
        s"$indexDir carries no $AppliedKey marker — not a followed " +
          "index (or every marked snapshot was vacuumed; rebuild with " +
          "initIndex)"))

  /** Train on the source head and publish snapshot v0 with the applied
    * marker — the one full train+assign the index ever runs. Returns
    * the source version the index reflects. */
  def initIndex(spark: SparkSession, sourceTarget: String,
                indexDir: String, idCol: String, vecCol: String,
                k: Int, iters: Int = 5, seed: Long = 42L): Int = {
    val head = MergeStore.version(sourceTarget)
      .getOrElse(sys.error(s"no committed version at $sourceTarget"))
    val corpus = MergeStore.read(spark, sourceTarget, Some(head))
    val model = IvfIndex.train(corpus, idCol, vecCol, k, iters, seed = seed)
    IvfStore.init(spark, corpus, vecCol, model, indexDir,
      meta = Map(AppliedKey -> head.toString))
    head
  }

  /** Start following `sourceTarget`'s change stream into the index
    * (created by [[initIndex]]). AvailableNow by default; ProcessingTime
    * for an always-on tail. */
  /** `maintainEvery = n > 0` runs [[IvfStore.maintainIndex]] after
    * every n-th advancing batch (cap-gated re-pack of accreted
    * per-cluster files, model untouched, marker carried) — the
    * StreamingIvm/StreamingSearch in-stream maintenance rule: an
    * always-on follower has no scheduled-job host. */
  def follow(spark: SparkSession, sourceTarget: String, indexDir: String,
             idCol: String, vecCol: String, checkpoint: String,
             trigger: Trigger = Trigger.AvailableNow(),
             maxVersionsPerBatch: Int = 0,
             maintainEvery: Int = 0, maxFiles: Int = 64,
             store: StoreKind = PlainIvf): StreamingQuery = {
    var advancedBatches = 0L // driver-side: foreachBatch runs on the driver
    MergeStoreCdc.readStream(spark, sourceTarget, pk = Seq(idCol),
        includePreimages = false,
        maxVersionsPerBatch = maxVersionsPerBatch,
        fromVersion = Some(appliedVersion(indexDir)))
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val advanced = applyCdcBatch(batch, indexDir, idCol, vecCol, store)
        if (advanced && maintainEvery > 0) {
          advancedBatches += 1
          if (advancedBatches % maintainEvery == 0)
            IvfStore.maintainIndex(spark, indexDir, maxFiles,
              meta = Map(AppliedKey ->
                appliedVersion(indexDir).toString)): Unit
        }
      }
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .start()
  }

  /** Apply one CDC micro-batch to the index, exactly once: terminal
    * change per id (delete@v1 + reinsert@v2 ends present), then ONE
    * [[IvfStore.applyChanges]] publish carrying the marker. Visible for
    * specs; returns true iff the batch advanced the index. */
  def applyCdcBatch(batch: DataFrame, indexDir: String,
                    idCol: String, vecCol: String,
                    store: StoreKind = PlainIvf): Boolean = {
    if (batch.isEmpty) return false
    val applied = appliedVersion(indexDir)
    val Array(lo, hi) = batch
      .agg(min(col(MergeStoreCdc.CommitVersionCol)),
        max(col(MergeStoreCdc.CommitVersionCol)))
      .collect()(0).toSeq.map(_.asInstanceOf[Long]).toArray
    if (hi <= applied) return false // replayed batch: drop whole
    val fresh =
      if (lo > applied) batch
      else batch.where(col(MergeStoreCdc.CommitVersionCol) > applied)
    val events = fresh
      .where(col(MergeStoreCdc.ChangeTypeCol) =!= "update_preimage")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol))
      .orderBy(col(MergeStoreCdc.CommitVersionCol).desc)
    val terminal = events
      .withColumn("__rn", row_number().over(w)).where(col("__rn") === 1)
      .drop("__rn", MergeStoreCdc.CommitVersionCol)
    // Upserts keep EVERY source column (the table may carry metadata
    // next to the vector; the index snapshot holds the full row).
    val upserts = terminal.where(col(MergeStoreCdc.ChangeTypeCol).isin(
        "insert", "update_postimage"))
      .drop(MergeStoreCdc.ChangeTypeCol)
    val deletes = terminal
      .where(col(MergeStoreCdc.ChangeTypeCol) === "delete")
      .select(col(idCol))
    store.applyChanges(batch.sparkSession, indexDir, upserts, deletes,
      idCol, vecCol, meta = Map(AppliedKey -> hi.toString))
    true
  }
}
