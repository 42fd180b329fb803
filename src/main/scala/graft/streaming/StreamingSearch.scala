package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.Bm25
import graft.store.{MergeStore, SnapshotStore}

/** Continuous search-index maintenance: the [[MergeStoreCdc]] change
  * stream of a documents table drives [[Bm25.applyChangesToIndex]]
  * through foreachBatch, so the inverted index FOLLOWS the table
  * commit-by-commit — the "search index follows the store" pipeline
  * (Elasticsearch following a primary via CDC, Lucene soft-commits
  * behind a WAL) on this engine's own primitives, completing the verb
  * symmetry: StreamingIvm keeps aggregate views current, StreamingSync
  * keeps replicas current, this keeps the retrieval structure current.
  *
  * Exactly-once under replay: each micro-batch publishes ONE index
  * snapshot carrying the batch's high commit version as snapshot
  * metadata ([[AppliedKey]]) — "index revised" and "marker advanced"
  * are a single atomic publish, so a redelivered foreachBatch batch is
  * dropped whole when its span is at or below the marker, and a batch
  * straddling the marker (a manual upsert between stream runs) is
  * sliced per-commit. Index revision is additionally CONTENT-idempotent
  * (re-upserting identical docs yields identical effective postings),
  * so even a crash between publish and checkpoint converges — the
  * marker guard just avoids burying live segments twice.
  *
  * Scale shape per micro-batch: the batch holds only the span's changed
  * docs (file-pruned at the source); the index pays tokenize(batch) +
  * the index-summary pass, never a corpus re-tokenize; `maintainEvery`
  * compacts cap-gated from inside the stream (an always-on tail has no
  * scheduled-job host — StreamingIvm's argument), carrying the applied
  * marker through the compaction commit.
  */
object StreamingSearch {

  /** Snapshot-metadata key holding the applied source version. */
  private[graft] val AppliedKey = "bm25.applied"

  /** Source version the index currently reflects — from the newest
    * snapshot carrying [[AppliedKey]] (a compaction by a rival
    * maintenance job that forgot the marker is walked past). */
  def appliedVersion(indexDir: String): Int =
    SnapshotStore.markerValue(indexDir, AppliedKey).map(_.toInt)
      .getOrElse(sys.error(
        s"$indexDir carries no $AppliedKey marker — not a followed " +
          "index (or every marked snapshot was vacuumed; rebuild with " +
          "initIndex)"))

  /** Build the index from the source table's head snapshot, stamping
    * the applied marker — the one full tokenize the index ever runs.
    * Returns the source version the index reflects. */
  def initIndex(spark: SparkSession, sourceTarget: String,
                indexDir: String, idCol: String, textCol: String,
                numFiles: Int = 16): Int = {
    val head = MergeStore.version(sourceTarget)
      .getOrElse(sys.error(s"no committed version at $sourceTarget"))
    Bm25.buildIndex(
      MergeStore.read(spark, sourceTarget, Some(head))
        .select(col(idCol), col(textCol)),
      idCol, textCol, indexDir, numFiles,
      meta = Map(AppliedKey -> head.toString))
    head
  }

  /** Start following `sourceTarget`'s change stream into the index
    * (created by [[initIndex]]). AvailableNow by default (catch up,
    * then stop — the scheduled-job shape); ProcessingTime for an
    * always-on tail. `maintainEvery = n > 0` runs [[Bm25
    * .maintainIndex]] after every n-th advancing batch (cap-gated
    * compaction + tombstone fold, marker carried); the batch counter is
    * per-query-run — only the hygiene bound's promptness depends on it. */
  def follow(spark: SparkSession, sourceTarget: String, indexDir: String,
             idCol: String, textCol: String, checkpoint: String,
             trigger: Trigger = Trigger.AvailableNow(),
             numFiles: Int = 4, maintainEvery: Int = 0,
             compactFiles: Int = 16, maxPostingsFiles: Int = 0,
             maxVersionsPerBatch: Int = 0): StreamingQuery = {
    var advancedBatches = 0L // driver-side: foreachBatch runs on the driver
    MergeStoreCdc.readStream(spark, sourceTarget, pk = Seq(idCol),
        includePreimages = false,
        maxVersionsPerBatch = maxVersionsPerBatch,
        // Seed at the index's OWN marker: an index built when the
        // source was at N must not re-apply (0, N] on first run.
        fromVersion = Some(appliedVersion(indexDir)))
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val advanced = applyCdcBatch(batch, indexDir, idCol, textCol,
          numFiles)
        if (advanced && maintainEvery > 0) {
          advancedBatches += 1
          if (advancedBatches % maintainEvery == 0)
            Bm25.maintainIndex(spark, indexDir, compactFiles,
              maxPostingsFiles,
              meta = Map(AppliedKey ->
                appliedVersion(indexDir).toString)): Unit
        }
      }
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .start()
  }

  /** Apply one CDC micro-batch to the index, exactly once: reduce the
    * batch to the TERMINAL change per doc (a multi-commit batch can
    * delete@v1 then re-insert@v2 — only the last change may apply),
    * then upsert the arrivals and delete the departures in ONE
    * publish carrying the batch's high version as the applied marker.
    * Visible for specs; returns true iff the batch advanced the index. */
  def applyCdcBatch(batch: DataFrame, indexDir: String,
                    idCol: String, textCol: String,
                    numFiles: Int = 4): Boolean = {
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
    // Robust to a pre-image-bearing feed, like StreamingSync: preimages
    // tie their post-image on commit version and must not win the
    // terminal window.
    val events = fresh
      .where(col(MergeStoreCdc.ChangeTypeCol) =!= "update_preimage")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol))
      .orderBy(col(MergeStoreCdc.CommitVersionCol).desc)
    val terminal = events
      .withColumn("__rn", row_number().over(w)).where(col("__rn") === 1)
      .drop("__rn", MergeStoreCdc.CommitVersionCol)
    val upserts = terminal.where(col(MergeStoreCdc.ChangeTypeCol).isin(
        "insert", "update_postimage"))
      .select(col(idCol), col(textCol))
    val deletes = terminal
      .where(col(MergeStoreCdc.ChangeTypeCol) === "delete")
      .select(col(idCol))
    Bm25.applyChangesToIndex(upserts, deletes, idCol, textCol, indexDir,
      numFiles, meta = Map(AppliedKey -> hi.toString))
    true
  }
}
