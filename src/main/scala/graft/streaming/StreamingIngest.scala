package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.Trigger

import graft.core.Settings
import graft.flatten.PayloadExplode
import graft.registry.EndpointConfig
import graft.run.Runner
import graft.store.{CoreSink, CoreStore, MergeStore, RawStore}

/** Streaming EP2: raw pages stream into the typed core store via
  * foreachBatch upsert (SURVEY §7 M4 — the reference's page loop is already
  * micro-batch-shaped; this is its continuous form).
  *
  * Each micro-batch runs the same explode→map→PK-upsert as the batch path
  * (CoreStore.upsert is idempotent last-write-wins, so replays and
  * at-least-once delivery are safe — exactly the reference's rerun
  * contract). Trigger.AvailableNow gives bounded catch-up runs; a real
  * deployment would run ProcessingTime for continuous tailing.
  */
object StreamingIngest {

  def coreLoadStream(spark: SparkSession, endpoint: EndpointConfig,
                     settings: Settings, checkpoint: String,
                     sink: CoreSink = CoreSink.Partition): org.apache.spark.sql.streaming.StreamingQuery = {
    val rawPath = RawStore.path(settings.warehouseRoot, endpoint.name)
    val pages = spark.readStream
      .schema(Runner.rawPageSchema)
      .parquet(rawPath)

    pages.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val typed = PayloadExplode.toCore(batch, endpoint, withOrder = true)
        sink match {
          case CoreSink.Partition =>
            CoreStore.upsert(batch.sparkSession, typed, settings.warehouseRoot,
              endpoint, intraBatchOrder = Seq("__page_number", "__pos"))
          case CoreSink.Merge =>
            // A stream of micro-batches is exactly the trickle-update shape
            // the COW sink exists for: each batch rewrites only the files
            // holding its matched keys, not the whole year partition.
            MergeStore.upsert(batch.sparkSession, typed,
              CoreStore.path(settings.warehouseRoot, endpoint.name),
              endpoint.primaryKey, endpoint.columns.map(_.target),
              ordCols = Seq("__page_number", "__pos"),
              clusterBy = "year" +: endpoint.primaryKey.filterNot(_ == "year"))
        }
        ()
      }
      .start()
  }
}
