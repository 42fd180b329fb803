package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.IvfIndex
import graft.store.IvfStore

/** Streaming ANN search: arriving query vectors probed against a STATIC
  * trained IVF index — the online-retrieval twin of the batch
  * [[IvfIndex.knnJoinApprox]], completing the ANN lifecycle (offline
  * train → incremental append ([[IvfIndex.appendBatch]], StreamingIvfSpec's
  * streaming assign) → online query, this file).
  *
  * Shape: micro-batches of queries run the EXACT batch probe join via
  * foreachBatch. Inside a micro-batch the query set is a plain DataFrame,
  * so the cluster-keyed equi-join + per-query top-k window apply
  * unchanged — streamed results are bit-identical to batch results for
  * the same queries (spec-pinned, the StreamingDedup batch==stream
  * convention). foreachBatch rather than a stream-static join because the
  * per-src top-k RANKING window isn't expressible in append-mode
  * streaming; the join itself would be, but splitting ranking from
  * probing would buffer unbounded per-query candidate state for no win.
  *
  * Scale: each micro-batch is queries-sized, the corpus side is the
  * static `partitionBy(ivf_cluster)` table read with partition pruning —
  * per-trigger work is O(batch · nprobe/k share of the corpus), the same
  * plan the batch join runs, amortized over arrivals. Exactly-once lands
  * via the sink's idempotent re-run of a replayed epoch (parquet append +
  * checkpoint here; a MergeStore upsert keyed on (query, rank) in a
  * deployment that needs atomic republish).
  */
object StreamingAnn {

  /** Start the streaming search: every arriving query row (id + vector)
    * emits its approximate top-k corpus neighbors to `outDir` as parquet.
    * `corpus` is the static assigned table ([[IvfIndex.assign]] output or
    * the cluster-partitioned index directory read back). */
  def searchStream(queries: DataFrame, qIdCol: String,
                   corpus: DataFrame, cIdCol: String, vecCol: String,
                   model: IvfIndex.Model, k: Int, nprobe: Int,
                   outDir: String, checkpointDir: String,
                   trigger: Trigger = Trigger.AvailableNow(),
                   maxClusterSize: Int = 0): StreamingQuery =
    queries.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        IvfIndex.knnJoinApprox(batch.sparkSession, batch, qIdCol,
            corpus, cIdCol, vecCol, model, k = k, nprobe = nprobe,
            maxClusterSize = maxClusterSize)
          .write.mode("append").parquet(outDir)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()

  /** [[searchStream]] over a PINNED [[IvfStore]] snapshot: corpus and
    * model resolve ONCE, at stream start, from one committed version —
    * the same one-publish consistency the store gives batch search. The
    * separate (corpus, model) overload re-opens the mismatch the store
    * closed: a caller passing `IvfStore.read(dir)` plus a model it held
    * from training can pair post-append vectors with pre-append
    * centroids. Here a mid-stream append or drift retrain lands a new
    * version this stream never sees — every micro-batch probes the same
    * frozen snapshot (results independent of arrival timing; the old
    * version stays readable until vacuum, the usual pinned-reader
    * retention contract). Restart the stream to adopt a newer index. */
  def searchStream(queries: DataFrame, qIdCol: String, indexDir: String,
                   version: Option[Int], cIdCol: String, vecCol: String,
                   k: Int, nprobe: Int, outDir: String,
                   checkpointDir: String, trigger: Trigger,
                   maxClusterSize: Int): StreamingQuery = {
    val spark = queries.sparkSession
    val v = version.orElse(IvfStore.currentVersion(indexDir)).getOrElse(
      sys.error(s"StreamingAnn: no committed index at $indexDir"))
    searchStream(queries, qIdCol,
      IvfStore.read(spark, indexDir, Some(v)), cIdCol, vecCol,
      IvfStore.model(spark, indexDir, Some(v)), k, nprobe,
      outDir, checkpointDir, trigger, maxClusterSize)
  }

  /** [[searchStream]] over a pinned snapshot with the default trigger
    * (AvailableNow) and no cluster-size cap. */
  def searchStream(queries: DataFrame, qIdCol: String, indexDir: String,
                   version: Option[Int], cIdCol: String, vecCol: String,
                   k: Int, nprobe: Int, outDir: String,
                   checkpointDir: String): StreamingQuery =
    searchStream(queries, qIdCol, indexDir, version, cIdCol, vecCol,
      k, nprobe, outDir, checkpointDir, Trigger.AvailableNow(), 0)
}
