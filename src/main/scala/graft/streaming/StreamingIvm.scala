package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.IncrementalView
import graft.operators.IncrementalView.IvmSpec

/** Continuous incremental view maintenance: the [[MergeStoreCdc]]
  * change stream drives [[IncrementalView]]'s delta algebra through
  * foreachBatch, so the gold view follows the fact table commit-by-
  * commit WITHOUT anyone scheduling refreshes — the streaming
  * materialized view (Databricks DLT / Flink dynamic-table shape) on
  * this engine's own primitives.
  *
  * Exactly-once under replay: foreachBatch redelivers a batch after a
  * crash, and delta application is NOT idempotent (applying a +1 twice
  * corrupts the count), so each batch is guarded by the view's
  * high-water mark — a batch whose max `_commit_version` is at or below
  * the applied version is dropped whole. That works because batches
  * arrive in commit order and carry COMPLETE commits (the CDC source
  * slices spans on version boundaries), making "applied through version
  * V" a total description of view state; it is the same
  * txnVersion/txnAppId dedup idiom Delta documents for foreachBatch
  * sinks.
  *
  * Scale shape per micro-batch: the batch holds only the span's changed
  * rows (file-pruned at the source); the delta aggregate is map-side
  * combinable to one row per touched group; the view update is a
  * file-granular merge + delete on the view's own COW store. Steady
  * state cost tracks the COMMIT RATE, never the table or view size.
  */
object StreamingIvm {

  /** Start maintaining `viewTarget` (created by
    * [[IncrementalView.initView]]) from `sourceTarget`'s change stream.
    * AvailableNow by default (catch up, then stop — the scheduled-job
    * shape); pass `Trigger.ProcessingTime(...)` for an always-on tail. */
  def maintain(spark: SparkSession, sourceTarget: String,
               viewTarget: String, spec: IvmSpec, checkpoint: String,
               trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    MergeStoreCdc.readStream(spark, sourceTarget,
        // Any TABLE column keys the feed (the weight algebra is
        // pk-independent); groupBy may name enriched dimension columns
        // the table doesn't have.
        pk = Seq(graft.store.MergeStore.read(spark, sourceTarget)
          .columns.head),
        includePreimages = true,
        fromVersion = Some(0) /* guarded below; checkpoint advances it */)
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        applyCdcBatch(batch, viewTarget, spec,
          source = Some(sourceTarget)): Unit
      }
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .start()

  /** Apply one CDC micro-batch to the view, exactly once. `source` is
    * required when the spec carries min/max (departure-touched groups
    * recompute from the source pinned at the batch's high version).
    * Visible for specs; returns true iff the batch advanced the view. */
  def applyCdcBatch(batch: DataFrame, viewTarget: String,
                    spec: IvmSpec,
                    source: Option[String] = None): Boolean = {
    if (batch.isEmpty) return false
    val spark = batch.sparkSession
    val Array(lo, hi) = batch
      .agg(min(col(MergeStoreCdc.CommitVersionCol)),
        max(col(MergeStoreCdc.CommitVersionCol)))
      .collect()(0).toSeq.map(_.asInstanceOf[Long]).toArray
    val applied = IncrementalView.appliedVersion(viewTarget)
    if (hi <= applied) return false // replayed batch: drop whole
    require(lo > applied,
      s"CDC batch [$lo,$hi] straddles the view's applied version " +
        s"$applied at $viewTarget — feed and view marker have diverged")
    val delta = IncrementalView.deltaState(
      batch.drop(MergeStoreCdc.CommitVersionCol), spec)
    IncrementalView.applyDeltaToStore(spark, viewTarget, delta, spec,
      hi.toInt, source)
    true
  }
}
