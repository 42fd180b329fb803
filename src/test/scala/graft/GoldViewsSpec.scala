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

  test("region + locale dims (architecture.md:46-48) decode like sector") {
    import spark.implicits._
    val facts = Seq((1, 5, 11), (2, 8, 43), (3, 99, 99))
      .toDF("id", "region", "urban_centric_locale")
    val decoded = GoldViews.decode(
      GoldViews.decode(facts, GoldViews.regionDim(spark), "region", "region_label"),
      GoldViews.localeDim(spark), "urban_centric_locale", "locale_label")
      .orderBy("id").collect()
    assert(decoded(0).getAs[String]("region_label") == "Southeast")
    assert(decoded(0).getAs[String]("locale_label") == "City: Large")
    assert(decoded(1).getAs[String]("region_label") == "Far West")
    assert(decoded(1).getAs[String]("locale_label") == "Rural: Remote")
    // unknown codes survive the left join as null labels
    assert(decoded(2).isNullAt(decoded(2).fieldIndex("region_label")))
    assert(decoded(2).isNullAt(decoded(2).fieldIndex("locale_label")))
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
