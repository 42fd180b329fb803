package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.IvfIndex

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
}
