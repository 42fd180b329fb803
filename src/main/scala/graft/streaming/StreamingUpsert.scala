package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.store.MergeStore

/** The general-purpose EXACTLY-ONCE streaming sink into a MergeStore
  * table: any streaming DataFrame lands as transactional upserts (and
  * optionally CDC-style deletes) through `applyChanges`, with the
  * micro-batch id riding the table's own manifest commit as a marker —
  * Delta's documented txnAppId/txnVersion idiom for foreachBatch
  * sinks, enforced INSIDE every OCC attempt by [[MergeStore
  * .MarkerGuard]]. A redelivered batch (crash between sink commit and
  * checkpoint advance) is dropped whole; a racing maintainer losing
  * the CAS re-checks on retry, so the replay can never double-apply.
  *
  * Contract: the marker key is `stream.<appId>` — one appId per
  * (checkpoint, table) pairing, exactly Delta's txnAppId rule. A NEW
  * checkpoint against a table that carries an old appId's markers must
  * use a fresh appId (batch ids restart at 0 and would read as
  * replays).
  *
  * Scale shape per micro-batch: one pruned affected-file probe + a
  * file-granular COW rewrite, cost tracking the BATCH, never the
  * table (the same argument as the batch verbs). An uninitialized
  * target is created from the first batch, clustered on the key.
  */
object StreamingUpsert {

  /** [[exactlyOnce]] addressed by CATALOG TABLE NAME instead of path —
    * `writeStream`-into-`graft.db.t` for the library route (the
    * foreachBatch-installing shape; a DSv2 streaming write would
    * re-implement parquet task writers outside the verbs' OCC). The
    * name resolves through [[graft.store.GraftCatalog.resolvePath]]
    * (registration first, then the warehouse), `mustExist = false` —
    * the first batch births the table, exactly like the path route.
    * `pk = Nil` reads the table's durable `graft.pk` policy (declared
    * at CREATE TABLE or SET TBLPROPERTIES), so a SQL-declared table
    * needs no Scala-side key repetition. */
  def toTable(source: DataFrame, table: String, checkpoint: String,
              pk: Seq[String] = Nil,
              appId: String = "graft-stream-upsert",
              deleteCol: Option[String] = None,
              trigger: Trigger = Trigger.AvailableNow(),
              initFiles: Int = 8,
              maxRetries: Int = 3,
              optimizeEvery: Int = 0,
              optimizeSmallFiles: Int = 0,
              optimizeSmallBytes: Long = 32L << 20,
              optimizeTargetBytes: Long = 128L << 20): StreamingQuery = {
    val path = graft.store.GraftCatalog.resolvePath(
      source.sparkSession, table, mustExist = false)
    val keys =
      if (pk.nonEmpty) pk
      else if (MergeStore.exists(path)) MergeStore.tablePk(path)
      else Nil
    require(keys.nonEmpty,
      s"no key columns for streaming upsert into '$table' — pass pk, " +
        "or declare TBLPROPERTIES('graft.pk'='...') on the table")
    exactlyOnce(source, path, keys, checkpoint, appId, deleteCol,
      trigger, initFiles, maxRetries, optimizeEvery, optimizeSmallFiles,
      optimizeSmallBytes, optimizeTargetBytes)
  }

  /** Start landing `source` into `target` keyed on `pk`. Rows where
    * `deleteCol` (optional) is TRUE are deletes-by-key; everything
    * else upserts (delete-then-upsert composition within one batch is
    * applyChanges' defined semantics). AvailableNow by default.
    *
    * `optimizeEvery > 0` runs [[MergeStore.compactSmall]] after every
    * N-th batch (the BM25 index's `maintainEvery` idiom, on the table
    * itself): a trickle sink is exactly where sub-`optimizeSmallBytes`
    * files pile up, and the incremental bin-pack bounds the live file
    * count at O(table/target + N) instead of O(batches).
    * `optimizeSmallFiles > 0` triggers by STATE instead of cadence:
    * the pass runs when the manifest's live small-file count crosses
    * the threshold — bursty batch sizes need no N tuning, and the
    * check is a manifest `z:`-line read ([[MergeStore.fileSizes]]),
    * zero data-directory stats. Maintenance needs no marker of its
    * own — the rewrite is content-preserving (the change feed nets it
    * to zero rows, followers are pinned across compactions), and a
    * crash-redelivered pass finds the already-packed file and no-ops. */
  def exactlyOnce(source: DataFrame, target: String, pk: Seq[String],
                  checkpoint: String,
                  appId: String = "graft-stream-upsert",
                  deleteCol: Option[String] = None,
                  trigger: Trigger = Trigger.AvailableNow(),
                  initFiles: Int = 8,
                  maxRetries: Int = 3,
                  optimizeEvery: Int = 0,
                  optimizeSmallFiles: Int = 0,
                  optimizeSmallBytes: Long = 32L << 20,
                  optimizeTargetBytes: Long = 128L << 20): StreamingQuery = {
    require(pk.nonEmpty, "StreamingUpsert needs key columns")
    val key = s"stream.$appId"
    source.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val s = batch.sparkSession
        val isDel = deleteCol.map(c => coalesce(col(c), lit(false)))
        val ups = isDel.map(d => batch.where(!d).drop(deleteCol.get))
          .getOrElse(batch)
        val dels = isDel.map(d => batch.where(d).select(pk.map(col): _*))
          .getOrElse(batch.limit(0).select(pk.map(col): _*))
        if (MergeStore.version(target).isEmpty) {
          // First batch births the table — marker in the SAME commit,
          // so a redelivery of batch 0 reads as applied and drops.
          MergeStore.init(s,
            graft.operators.Upsert.dedupByKey(
              ups.where(pk.map(col(_).isNotNull).reduce(_ && _)), pk,
              Seq(monotonically_increasing_id())),
            target, numFiles = initFiles, clusterBy = pk,
            meta = Map(key -> id.toString))
        } else {
          MergeStore.applyChanges(s, target, ups, dels, pk,
            meta = Map(key -> id.toString),
            maxRetries = maxRetries,
            guard = Some(MergeStore.MarkerGuard(key, id,
              expected = if (id == 0) None else Some(id - 1))))
        }
        val due =
          (optimizeEvery > 0 && id % optimizeEvery == optimizeEvery - 1) ||
            (optimizeSmallFiles > 0 &&
              MergeStore.fileSizes(target).count { case (_, sz) =>
                sz >= 0 && sz < optimizeSmallBytes
              } >= optimizeSmallFiles)
        if (due)
          // Maintenance is best-effort: the batch's rows and marker are
          // already committed, so a bin-pack that loses every OCC retry
          // to a hot rival must not kill the stream — the tail just
          // waits for the next pass.
          try MergeStore.compactSmall(s, target, optimizeSmallBytes,
            optimizeTargetBytes, maxRetries = maxRetries): Unit
          catch {
            case e: java.util.ConcurrentModificationException =>
              System.err.println(s"[graft-stream-upsert] optimize pass " +
                s"skipped at batch $id (contended): ${e.getMessage}")
          }
        ()
      }
      .start()
  }
}
