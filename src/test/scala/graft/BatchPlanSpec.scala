package graft

import org.apache.spark.sql.functions.sum

import graft.core.Settings
import graft.run.{BatchPlan, Runner}
import graft.registry.Registry
import graft.store.{CoreSink, CoreStore, MergeStore}

/** The endpoints.yaml batch plan: parse the documented shape, fail fast on
  * typos BEFORE any fetch, and drive the real EP1→EP2 pipeline per entry.
  */
class BatchPlanSpec extends SparkSpec {

  private val plan = """
    |# nightly refresh
    |plan:
    |  - endpoint: directory
    |    years: 2010-2011   # range
    |  - endpoint: directory
    |    years: 2010        # single year, rerun (idempotence)
    |""".stripMargin

  test("parse: comments, ranges, single years") {
    val entries = BatchPlan.parse(plan)
    assert(entries == Seq(
      BatchPlan.Entry("directory", 2010, 2011),
      BatchPlan.Entry("directory", 2010, 2010)))
  }

  test("parse fails fast: unknown endpoint, orphan years, inverted range") {
    val unknown = intercept[IllegalArgumentException] {
      BatchPlan.parse("plan:\n  - endpoint: fynance\n    years: 2010")
    }
    assert(unknown.getMessage.contains("Unknown endpoint 'fynance'"))
    assert(unknown.getMessage.contains("finance")) // suggests the known list
    intercept[IllegalArgumentException] {
      BatchPlan.parse("plan:\n  years: 2010")
    }
    intercept[IllegalArgumentException] {
      BatchPlan.parse("plan:\n  - endpoint: directory\n    years: 2020-2010")
    }
    intercept[IllegalArgumentException] {
      BatchPlan.parse("plan:\n  - endpoint: directory\n    years: banana")
    }
  }

  test("run: entries drive the pipeline in order, idempotent rerun entry") {
    val root = tmpDir("batch-plan")
    val settings = Settings(apiBase = "https://fake.test/api/v1",
      warehouseRoot = root, rateLimitRps = 0, rawPageSize = 2)
    val logs = BatchPlan.run(spark, settings, new FakeDirectoryApi,
      BatchPlan.parse(plan))
    assert(logs.map(_.status) == Seq("succeeded", "succeeded"))
    assert(logs.head.year_start == 2010 && logs.head.year_end == 2011)
    // 2010 (3 records) + 2011 (3 records); the rerun entry inserts nothing
    assert(logs(1).rows_inserted == 0)
    assert(CoreStore.read(spark, root, "directory").count() == 6)
  }

  test("parse: sink selector, before or after years; typos fail fast") {
    val entries = BatchPlan.parse("""
      |plan:
      |  - endpoint: directory
      |    years: 2010-2011
      |    sink: merge
      |  - endpoint: directory
      |    sink: partition
      |    years: 2012
      |  - endpoint: directory
      |    years: 2013
      |""".stripMargin)
    assert(entries.map(_.sink) ==
      Seq(CoreSink.Merge, CoreSink.Partition, CoreSink.Partition))
    val typo = intercept[IllegalArgumentException] {
      BatchPlan.parse(
        "plan:\n  - endpoint: directory\n    years: 2010\n    sink: merje")
    }
    assert(typo.getMessage.contains("unknown sink 'merje'"))
    intercept[IllegalArgumentException] { // sink with no entry
      BatchPlan.parse("plan:\n  sink: merge")
    }
    intercept[IllegalArgumentException] { // two sink lines, one entry
      BatchPlan.parse("plan:\n  - endpoint: directory\n" +
        "    sink: merge\n    years: 2010\n    sink: partition")
    }
  }

  test("merge sink end-to-end: same final rows as partition sink, COW layout") {
    // Partition-sink warehouse (the default path).
    val rootP = tmpDir("plan-sink-p")
    val settingsP = Settings(apiBase = "https://fake.test/api/v1",
      warehouseRoot = rootP, rateLimitRps = 0, rawPageSize = 2)
    BatchPlan.run(spark, settingsP, new FakeDirectoryApi, BatchPlan.parse(
      "plan:\n  - endpoint: directory\n    years: 2010-2011"))

    // Merge-sink warehouse: first entry inits the table, second merges
    // (the rerun must be a pure update — idempotence through the COW path).
    val rootM = tmpDir("plan-sink-m")
    val settingsM = settingsP.copy(warehouseRoot = rootM)
    val logs = BatchPlan.run(spark, settingsM, new FakeDirectoryApi,
      BatchPlan.parse("""
        |plan:
        |  - endpoint: directory
        |    years: 2010-2011
        |    sink: merge
        |  - endpoint: directory
        |    years: 2010
        |    sink: merge
        |""".stripMargin))
    assert(logs.map(_.status) == Seq("succeeded", "succeeded"))
    assert(logs(1).rows_inserted == 0) // rerun: updates only

    // The merge warehouse holds the COW layout, and CoreStore.read
    // dispatches on it transparently.
    assert(MergeStore.exists(CoreStore.path(rootM, "directory")))
    val cols = CoreStore.read(spark, rootP, "directory").columns.sorted.toSeq
    def rows(root: String) =
      CoreStore.read(spark, root, "directory")
        .select(cols.head, cols.tail: _*)
        .orderBy("unitid", "year").collect().toSeq
    assert(rows(rootM) == rows(rootP))

    // Trickle rerun of ONE year through each sink: the partition sink
    // rewrites the whole year, the merge sink only matched-key files.
    Runner.loadCoreFromRaw(spark, Registry.directory, settingsM,
      years = Seq(2011), sink = CoreSink.Merge)
    assert(rows(rootM) == rows(rootP)) // still identical after the merge
  }

  test("merge-sink maintenance: trickle batches keep live file count bounded") {
    import spark.implicits._
    import java.nio.file.{Files, Paths}
    // Every pipeline merge goes through MergeStore.upsert, which runs
    // maintain() after the merge: past 4x the layout target the table
    // compacts back and vacuums. Without it, 12 insert-only trickle
    // batches onto a 2-file table would accrete 14 live files.
    val target = tmpDir("merge-maint") + "/tbl"
    def batch(lo: Int, hi: Int) =
      (lo until hi).map(i => (i.toLong, s"v$i")).toDF("id", "value")
    // vacuumGraceMillis = 0: this test IS the single writer, so its own
    // superseded files are immediately reclaimable (the disk-bound
    // assertion below); production multi-writer loads keep the default
    // grace window.
    MergeStore.upsert(spark, batch(0, 100), target,
      pk = Seq("id"), dataCols = Seq("id", "value"),
      clusterBy = Seq("id"), numFiles = 2, vacuumGraceMillis = 0)
    val counts = (1 to 12).map { b =>
      MergeStore.upsert(spark, batch(b * 100, (b + 1) * 100), target,
        pk = Seq("id"), dataCols = Seq("id", "value"),
        clusterBy = Seq("id"), numFiles = 2, vacuumGraceMillis = 0)
      MergeStore.liveFiles(target).size
    }
    assert(counts.max <= 8, s"live files grew past the 4x cap: $counts")
    assert(counts.exists(_ == 2), s"compaction never ran: $counts")
    // Content survives every compact/vacuum cycle.
    assert(MergeStore.read(spark, target).count() == 1300)
    assert(MergeStore.read(spark, target).agg(sum("id")).head().getLong(0)
      == (0L until 1300L).sum)
    // Vacuum keeps the data directory bounded too (superseded compaction
    // inputs are deleted; only post-compaction accretion remains).
    val onDisk = Files.list(Paths.get(target, "data")).count()
    assert(onDisk <= 10, s"data dir holds $onDisk files")
  }
}
