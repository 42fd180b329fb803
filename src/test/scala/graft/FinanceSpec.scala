package graft

import org.apache.spark.sql.functions._

import graft.flatten.PayloadExplode
import graft.registry.Registry
import graft.store.CoreStore
import graft.views.GoldViews

/** Fourth registry endpoint (finance — the last mapper the reference names
  * at architecture.md:122 but never ships): like admissions/completions,
  * onboarding is PURE CONFIG — the generic mapper, sentinel cleaning,
  * enrichment view, and PK-upsert store serve it with zero new operator
  * code. Money lands as DOUBLE via the T4 float path (large-system totals
  * exceed 32-bit; decimals like "1234567.89" must survive, unlike the
  * int path's "12.5"→NULL guard).
  */
class FinanceSpec extends SparkSpec {
  import spark.implicits._

  private def financePages = Seq(
    (2011, 1, """[
      {"unitid":100654,"year":2011,"gasb_fasb":"GASB","total_revenues":"125000000.50","exp_total":118000000,"exp_instruc_total":"41000000","endowment_eoy":"52000000.25"},
      {"unitid":100663,"year":2011,"acctstd":"FASB","rev_total":"-1","rev_total_current":"890000000","exp_total":"  ","total_expenses":"870000000","rev_investment_return":"-4500000.75"},
      {"unitid":999999,"year":2011,"rev_total":"-2","exp_total":"N/A","endowment_eoy":"none"}]"""))
    .toDF("year", "page_number", "payload")

  private def directoryPages = Seq(
    (2011, 1, """[
      {"unitid":100654,"year":2011,"instnm":"Alabama A & M University","stabbr":"AL","sector":1},
      {"unitid":100663,"year":2011,"instnm":"UAB","stabbr":"AL","sector":1}]"""))
    .toDF("year", "page_number", "payload")

  test("registry mapper generalizes: alias drift + sentinels + float cast") {
    val core = PayloadExplode.toCore(financePages, Registry.finance)
      .orderBy("unitid").collect()
    assert(core.length == 3)
    val r0 = core(0) // survey short names, decimals preserved by T4
    assert(r0.getAs[String]("accounting_standard") == "GASB")
    assert(r0.getAs[Double]("rev_total") == 1.250000005e8)
    assert(r0.getAs[Double]("exp_total") == 1.18e8)
    assert(r0.getAs[Double]("exp_instruction") == 4.1e7)
    assert(r0.getAs[Double]("endowment_assets") == 5.200000025e7)
    val r1 = core(1) // sentinel "-1" skipped for the real later alias;
                     // blank skipped; NEGATIVE non-sentinel value kept
                     // (investment losses are legitimate money)
    assert(r1.getAs[String]("accounting_standard") == "FASB")
    assert(r1.getAs[Double]("rev_total") == 8.9e8)
    assert(r1.getAs[Double]("exp_total") == 8.7e8)
    assert(r1.getAs[Double]("rev_investment_return") == -4500000.75)
    val r2 = core(2) // suppressed / malformed → NULL, never a crash
    assert(r2.isNullAt(r2.fieldIndex("rev_total")))
    assert(r2.isNullAt(r2.fieldIndex("exp_total")))
    assert(r2.isNullAt(r2.fieldIndex("endowment_assets")))
  }

  test("finance_enriched + instruction-share KPI over the gold view") {
    val fin = PayloadExplode.toCore(financePages, Registry.finance)
    val dir = PayloadExplode.toCore(directoryPages, Registry.directory)
    val enriched = GoldViews.enriched(fin, dir)
      .withColumn("instruction_share",
        round(col("exp_instruction") / nullif(col("exp_total"), lit(0.0)), 4))
      .orderBy("unitid").collect()
    assert(enriched(0).getAs[String]("inst_name") == "Alabama A & M University")
    assert(enriched(0).getAs[Double]("instruction_share") == 0.3475)
    // null exp_instruction → null share, unmatched dims → null name
    assert(enriched(1).isNullAt(enriched(1).fieldIndex("instruction_share")))
    assert(enriched(2).isNullAt(enriched(2).fieldIndex("inst_name")))
  }

  test("PK upsert through CoreStore: idempotent rerun, newest batch wins") {
    val root = tmpDir("finance-store")
    val fin = PayloadExplode.toCore(financePages, Registry.finance)
    val (ins1, upd1) = CoreStore.upsert(spark, fin, root, Registry.finance)
    assert(ins1 == 3 && upd1 == 0)
    // identical rerun: nothing inserted, every PK updated-in-place
    val (ins2, upd2) = CoreStore.upsert(spark, fin, root, Registry.finance)
    assert(ins2 == 0 && upd2 == 3)
    assert(CoreStore.read(spark, root, "finance").count() == 3)
    // revised batch for one unitid wins over the stored row
    val revised = fin.where(col("unitid") === 100654)
      .withColumn("rev_total", lit(1.3e8))
    CoreStore.upsert(spark, revised, root, Registry.finance)
    val after = CoreStore.read(spark, root, "finance")
    assert(after.count() == 3)
    assert(after.where(col("unitid") === 100654)
      .select("rev_total").as[Double].head() == 1.3e8)
  }

  test("schema + PK contract from the config (registry.py invariants)") {
    val cfg = Registry.finance
    assert(cfg.schema.fieldNames.toSeq.take(2) == Seq("unitid", "year"))
    assert(cfg.primaryKey.forall(pk => !cfg.schema(pk).nullable))
    assert(Registry.endpoint("finance") eq cfg)
  }
}
