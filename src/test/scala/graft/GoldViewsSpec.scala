package graft

import org.apache.spark.sql.functions._

import graft.core.Settings
import graft.registry.Registry
import graft.run.Runner
import graft.store.CoreStore
import graft.views.GoldViews

/** Gold-layer views over real pipeline output: run EP1→EP2 on the fake
  * transport fixture, then build every documented BI view (Q8-Q13) from the
  * core table and check shapes/values.
  */
class GoldViewsSpec extends SparkSpec {

  private lazy val root = {
    val r = tmpDir("graft-gold")
    val settings = Settings(apiBase = "https://fake.test/api/v1",
      warehouseRoot = r, rateLimitRps = 0, rawPageSize = 2)
    Runner.loadEndpointYears(spark, Registry.directory, settings,
      new FakeDirectoryApi, 2010, 2011)
    r
  }

  private lazy val core = CoreStore.read(spark, root, "directory")

  test("Q8 institutions_latest: one row per unitid at max year") {
    val latest = GoldViews.institutionsLatest(core)
    assert(latest.count() == latest.select("unitid").distinct().count())
    assert(latest.where(col("unitid") === 100654)
      .collect()(0).getAs[Int]("year") == 2011)
  }

  test("Q9 enriched: fact gains name/state/sector via broadcast join") {
    import spark.implicits._
    val fact = Seq((100654, 2010, 1500), (100663, 2010, 900))
      .toDF("unitid", "year", "applications")
    val e = GoldViews.enriched(fact, core).orderBy("unitid")
    assert(e.columns.contains("inst_name") && e.columns.contains("state_abbr"))
    assert(e.collect()(0).getAs[String]("inst_name") == "Alabama A & M University")
  }

  test("Q10/Q12 decode: sector codes become labels, unknown stays null") {
    val decoded = GoldViews.decode(
      core.select(col("unitid"), col("year"), col("sector")),
      GoldViews.sectorDim(spark), "sector")
    val labels = decoded.where(col("unitid") === 100654 && col("year") === 2010)
      .select("label").collect()
    assert(labels(0).getString(0) == "Public 4-year or above")
  }

  test("Q11 yearly_kpis: per-year counts and rates") {
    val kpis = GoldViews.yearlyKpis(core).collect()
    assert(kpis.length == 2)
    val y2010 = kpis.find(_.getAs[Int]("year") == 2010).get
    assert(y2010.getAs[Long]("n_institutions") == 3)
  }

  test("Q13 refresh: gold table atomically replaced, readers see new data") {
    val p1 = GoldViews.refresh(GoldViews.institutionsLatest(core), root,
      "institutions_latest")
    val first = spark.read.parquet(p1).count()
    // Recompute with a filter — refresh must fully replace, not append.
    GoldViews.refresh(
      GoldViews.institutionsLatest(core.where(col("unitid") =!= 999999)),
      root, "institutions_latest")
    val second = spark.read.parquet(p1).count()
    assert(second == first - 1)
  }
}
