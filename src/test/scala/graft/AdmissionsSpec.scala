package graft

import org.apache.spark.sql.functions._

import graft.flatten.PayloadExplode
import graft.registry.Registry
import graft.views.GoldViews

/** Second registry endpoint (admissions — the mapper the reference
  * documents at architecture.md:122 but never ships): the SAME generic
  * machinery (native expression mapper, alias coalesce, sentinel
  * cleaning, enrichment view) must serve it with zero new operator code —
  * the registry config IS the onboarding cost of an endpoint.
  */
class AdmissionsSpec extends SparkSpec {
  import spark.implicits._

  private def admissionsPages = Seq(
    (2011, 1, """[
      {"unitid":100654,"year":2011,"applcn":"2100","admssn":1500,"enrlt":"600","satvr25":"430","satvr75":520},
      {"unitid":100663,"year":2011,"number_applied":"-1","applicants_total":"5800","number_admitted":5000,"enrolled_total":"  ","enrlt":"1400","actcm25":"21"},
      {"unitid":999999,"year":2011,"applcn":"-3","admssn":"12.5","enrlt":-2}]"""))
    .toDF("year", "page_number", "payload")

  private def directoryPages = Seq(
    (2011, 1, """[
      {"unitid":100654,"year":2011,"instnm":"Alabama A & M University","stabbr":"AL","sector":1},
      {"unitid":100663,"year":2011,"instnm":"UAB","stabbr":"AL","sector":1}]"""))
    .toDF("year", "page_number", "payload")

  test("registry mapper generalizes: alias coalesce + cleaning on ADM fields") {
    val core = PayloadExplode.toCore(admissionsPages, Registry.admissions)
      .orderBy("unitid").collect()
    assert(core.length == 3)
    val r0 = core(0) // straightforward short-name aliases
    assert(r0.getAs[Int]("number_applied") == 2100)
    assert(r0.getAs[Int]("number_admitted") == 1500)
    assert(r0.getAs[Int]("sat_reading_25_pctl") == 430)
    assert(r0.getAs[Int]("sat_reading_75_pctl") == 520)
    val r1 = core(1) // sentinel "-1" first alias skipped for real later alias
    assert(r1.getAs[Int]("number_applied") == 5800)
    assert(r1.getAs[Int]("number_enrolled_total") == 1400) // blank skipped
    val r2 = core(2) // suppressed / malformed / N-A → all NULL
    assert(r2.isNullAt(r2.fieldIndex("number_applied")))
    assert(r2.isNullAt(r2.fieldIndex("number_admitted"))) // "12.5" guard
    assert(r2.isNullAt(r2.fieldIndex("number_enrolled_total")))
  }

  test("admissions_enriched (architecture.md:53-54) + accept-rate KPI") {
    val adm = PayloadExplode.toCore(admissionsPages, Registry.admissions)
    val dir = PayloadExplode.toCore(directoryPages, Registry.directory)
    val enriched = GoldViews.enriched(adm, dir)
      .withColumn("accept_rate",
        round(col("number_admitted").cast("double") /
          nullif(col("number_applied"), lit(0)), 4))
      .orderBy("unitid").collect()
    assert(enriched(0).getAs[String]("inst_name") == "Alabama A & M University")
    assert(enriched(0).getAs[String]("state_abbr") == "AL")
    assert(enriched(0).getAs[Double]("accept_rate") == 0.7143)
    assert(enriched(1).getAs[Double]("accept_rate") == 0.8621)
    // unmatched fact row survives the left join with null dims
    assert(enriched(2).isNullAt(enriched(2).fieldIndex("inst_name")))
  }

  test("schema + PK contract from the config (registry.py invariants)") {
    val cfg = Registry.admissions
    assert(cfg.schema.fieldNames.toSeq.take(2) == Seq("unitid", "year"))
    assert(cfg.primaryKey.forall(pk => !cfg.schema(pk).nullable))
    assert(Registry.endpoint("admissions") eq cfg)
  }
}
