package graft

import graft.core.Settings
import graft.registry.Registry
import graft.run.Runner
import graft.store.{CoreSink, CoreStore, MergeStore}
import graft.streaming.StreamingIngest

/** Streaming EP2 equivalence: raw pages ingested through the foreachBatch
  * streaming core load must produce exactly the rows the batch path does,
  * and restarts (new AvailableNow run over the same checkpoint) are no-ops.
  */
class StreamingIngestSpec extends SparkSpec {

  test("streaming core load == batch core load; restart is a no-op") {
    val root = tmpDir("graft-sing")
    val settings = Settings(apiBase = "https://fake.test/api/v1",
      warehouseRoot = root, rateLimitRps = 0, rawPageSize = 2)
    val api = new FakeDirectoryApi
    // EP1 only: raw pages for two years.
    Seq(2010, 2011).foreach(y =>
      Runner.loadRawYear(spark, Registry.directory, settings, api, y))

    val checkpoint = tmpDir("graft-sing-ckpt")
    val q = StreamingIngest.coreLoadStream(
      spark, Registry.directory, settings, checkpoint)
    q.awaitTermination()

    val streamed = CoreStore.read(spark, root, "directory")
    assert(streamed.count() == 6)

    // Batch path on a separate warehouse for comparison.
    val root2 = tmpDir("graft-sing2")
    val settings2 = settings.copy(warehouseRoot = root2)
    Seq(2010, 2011).foreach(y =>
      Runner.loadRawYear(spark, Registry.directory, settings2, new FakeDirectoryApi, y))
    Runner.loadCoreFromRaw(spark, Registry.directory, settings2)
    val batch = CoreStore.read(spark, root2, "directory")

    val cols = batch.columns.sorted.toSeq
    assert(
      streamed.select(cols.head, cols.tail: _*).orderBy("unitid", "year")
        .collect().toSeq ==
      batch.select(cols.head, cols.tail: _*).orderBy("unitid", "year")
        .collect().toSeq)

    // Restart over the same checkpoint: no new data → core unchanged.
    val q2 = StreamingIngest.coreLoadStream(
      spark, Registry.directory, settings, checkpoint)
    q2.awaitTermination()
    assert(CoreStore.read(spark, root, "directory").count() == 6)
  }

  test("streaming merge sink == batch partition sink; restart is a no-op") {
    val root = tmpDir("graft-sing-m")
    val settings = Settings(apiBase = "https://fake.test/api/v1",
      warehouseRoot = root, rateLimitRps = 0, rawPageSize = 2)
    Seq(2010, 2011).foreach(y =>
      Runner.loadRawYear(spark, Registry.directory, settings,
        new FakeDirectoryApi, y))

    val checkpoint = tmpDir("graft-sing-m-ckpt")
    val q = StreamingIngest.coreLoadStream(
      spark, Registry.directory, settings, checkpoint, sink = CoreSink.Merge)
    q.awaitTermination()
    assert(MergeStore.exists(CoreStore.path(root, "directory")))
    val streamed = CoreStore.read(spark, root, "directory")
    assert(streamed.count() == 6)

    // Same rows as the batch partition-sink path.
    val root2 = tmpDir("graft-sing-m2")
    val settings2 = settings.copy(warehouseRoot = root2)
    Seq(2010, 2011).foreach(y =>
      Runner.loadRawYear(spark, Registry.directory, settings2,
        new FakeDirectoryApi, y))
    Runner.loadCoreFromRaw(spark, Registry.directory, settings2)
    val batch = CoreStore.read(spark, root2, "directory")
    val cols = batch.columns.sorted.toSeq
    assert(
      streamed.select(cols.head, cols.tail: _*).orderBy("unitid", "year")
        .collect().toSeq ==
      batch.select(cols.head, cols.tail: _*).orderBy("unitid", "year")
        .collect().toSeq)

    // Restart: replayed micro-batches merge idempotently (at-least-once).
    val q2 = StreamingIngest.coreLoadStream(
      spark, Registry.directory, settings, checkpoint, sink = CoreSink.Merge)
    q2.awaitTermination()
    assert(CoreStore.read(spark, root, "directory").count() == 6)
  }
}
