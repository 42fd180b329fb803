package graft

import graft.core.Settings
import graft.run.BatchPlan
import graft.store.CoreStore

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
}
