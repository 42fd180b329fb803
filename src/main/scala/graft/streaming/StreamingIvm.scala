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
    * shape); pass `Trigger.ProcessingTime(...)` for an always-on tail.
    *
    * `maintainEvery = n > 0` runs [[IncrementalView.maintainView]]
    * after every n-th micro-batch that advanced the view: each batch
    * commits one view version (replacement files + superseded ones kept
    * for time travel), so an always-on tail accretes files and
    * manifests WITHOUT BOUND unless someone compacts — and a streaming
    * view has no scheduled-job host to do it, so the stream itself must.
    * The maintenance pass is cap-gated (`maxLiveFiles`, default 4 ×
    * `targetFiles`), cheap to check, and carries the applied marker
    * through the compaction commit; vacuum then reclaims superseded
    * files past `vacuumGraceMillis`. The batch counter is per-query-run
    * (a restart restarts the cadence) — correctness never depends on
    * it, only the file-count bound's promptness does. */
  def maintain(spark: SparkSession, sourceTarget: String,
               viewTarget: String, spec: IvmSpec, checkpoint: String,
               trigger: Trigger = Trigger.AvailableNow(),
               maintainEvery: Int = 0, targetFiles: Int = 4,
               maxLiveFiles: Int = 0,
               vacuumGraceMillis: Long =
                 graft.store.MergeStore.DefaultVacuumGraceMillis,
               maxVersionsPerBatch: Int = 0): StreamingQuery = {
    var advancedBatches = 0L // driver-side: foreachBatch runs on the driver
    MergeStoreCdc.readStream(spark, sourceTarget,
        // Any TABLE column keys the feed (the weight algebra is
        // pk-independent); groupBy may name enriched dimension columns
        // the table doesn't have.
        pk = Seq(graft.store.MergeStore.read(spark, sourceTarget)
          .columns.head),
        includePreimages = true,
        // The CDC admission cap: a post-downtime catch-up drains in
        // bounded per-batch spans; the ±weight delta algebra is
        // additive over any partition of the commit sequence, and the
        // marker advances per batch — identical final view either way.
        maxVersionsPerBatch = maxVersionsPerBatch,
        // Seed at the view's OWN high-water mark, not 0: a view
        // initialized when the source was already at version N must not
        // rematerialize (0, N] on its first micro-batch (all of it would
        // be at-or-below the applied marker), and a commit landing
        // before the first stream run must not straddle the marker.
        // Once the checkpoint holds offsets, they take precedence.
        fromVersion = Some(IncrementalView.appliedVersion(viewTarget)))
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val advanced = applyCdcBatch(batch, viewTarget, spec,
          source = Some(sourceTarget))
        if (advanced && maintainEvery > 0) {
          advancedBatches += 1
          if (advancedBatches % maintainEvery == 0)
            IncrementalView.maintainView(spark, viewTarget, spec,
              targetFiles, maxLiveFiles,
              vacuumGraceMillis = vacuumGraceMillis): Unit
        }
      }
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .start()
  }

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
    var applied = IncrementalView.appliedVersion(viewTarget)
    if (hi <= applied) return false // replayed batch: drop whole
    // A batch straddling the marker (lo <= applied < hi) happens when
    // the view advanced OUTSIDE this stream (a manual refresh between
    // runs, or a checkpoint older than the marker): the already-applied
    // prefix must be dropped per-commit, not hard-failed — commits are
    // whole within the feed, so the version filter slices exactly.
    //
    // The loop exists because a SKIPPED attempt must not strand a
    // sub-span: the MarkerGuard drops the batch whole when a rival
    // maintainer moved the marker mid-flight, but the rival may have
    // applied a SHORTER overlapping span (a manual refresh that read
    // the source before commits up to `hi` landed, moving the marker to
    // m < hi). The streaming checkpoint still advances past this batch,
    // so commits (m, hi] would otherwise be applied by NO ONE and the
    // view would sit silently stale until a full refresh. Re-reading
    // the marker and re-applying the remaining sub-span INSIDE this
    // foreachBatch invocation closes that hole; each iteration either
    // lands its span (marker -> hi, loop exits) or loses to a rival
    // that strictly advanced the marker (markers only move up), so the
    // loop terminates.
    while (hi > applied) {
      val fresh =
        if (lo > applied) batch
        else batch.where(col(MergeStoreCdc.CommitVersionCol) > applied)
      val delta = IncrementalView.deltaState(
        fresh.drop(MergeStoreCdc.CommitVersionCol), spec)
      // expectedApplied closes the check-then-act window: the
      // appliedVersion read above is only a pre-filter; the commit
      // itself carries a MarkerGuard pinned at that base, re-verified
      // inside every OCC attempt — a rival maintainer (a manual refresh
      // racing this stream) that moved the marker mid-batch turns this
      // commit into a dropped replay instead of a double-apply.
      IncrementalView.applyDeltaToStore(spark, viewTarget, delta, spec,
        hi.toInt, source, expectedApplied = Some(applied))
      val now = IncrementalView.appliedVersion(viewTarget)
      if (now <= applied)
        throw new IllegalStateException(
          s"IVM marker at $viewTarget did not advance past $applied " +
            s"while applying span ($lo, $hi] — a rival moved it " +
            "backwards? failing the batch so the checkpoint does not " +
            "advance past an unapplied span")
      applied = now
    }
    true
  }
}
