package graft

import org.apache.spark.sql.functions._

import graft.flatten.PayloadExplode
import graft.operators.Upsert
import graft.registry.Registry
import graft.views.GoldViews

/** Third registry endpoint (completions, architecture.md:122/55): the
  * composite 4-column PK case (unitid, year, cipcode, award_level —
  * architecture.md:43) through the generic mapper, upsert, and the
  * completions_by_cip dim-decode view shape.
  */
class CompletionsSpec extends SparkSpec {
  import spark.implicits._

  private def pages = Seq(
    (2011, 1, """[
      {"unitid":100654,"year":2011,"cip6":"11.0701","awlevel":5,"ctotalt":"42","ctotalm":30,"ctotalw":"12"},
      {"unitid":100654,"year":2011,"cip6":"11.0701","awlevel":7,"ctotalt":"10"},
      {"unitid":100654,"year":2011,"cipcode":"27.0101","awlevel":5,"awards":"-3","ctotalm":"5"},
      {"unitid":100663,"year":2011,"cip":"27.0101","awlevel":"5","ctotalt":"  17 "}]"""))
    .toDF("year", "page_number", "payload")

  private def cipDim = Seq(
    ("11.0701", "Computer Science"),
    ("27.0101", "Mathematics, General"))
    .toDF("code", "label")

  test("composite 4-column PK: mapping, nullability, upsert") {
    val core = PayloadExplode.toCore(pages, Registry.completions)
    assert(core.count() == 4)
    // distinct across all 4 key columns, not any prefix
    assert(core.select("unitid", "year", "cipcode", "award_level")
      .distinct().count() == 4)
    val cfg = Registry.completions
    assert(cfg.primaryKey.size == 4 &&
      cfg.primaryKey.forall(pk => !cfg.schema(pk).nullable))
    // last-write-wins on the FULL composite key
    val dup = core.withColumn("awards_total",
      when(col("award_level") === 7, lit(99)).otherwise(col("awards_total")))
    val up = Upsert.upsertByKey(core, dup, cfg.primaryKey,
      Seq(col("awards_total").isNotNull.cast("int")))
    assert(up.count() == 4)
  }

  test("alias drift (cip6/cipcode/cip) lands in one column; sentinel → null") {
    val core = PayloadExplode.toCore(pages, Registry.completions)
      .orderBy("unitid", "cipcode", "award_level").collect()
    assert(core.map(_.getAs[String]("cipcode")).toSeq ==
      Seq("11.0701", "11.0701", "27.0101", "27.0101"))
    val suppressed = core(2)
    assert(suppressed.isNullAt(suppressed.fieldIndex("awards_total"))) // "-3"
    assert(suppressed.getAs[Int]("awards_men") == 5)
    assert(core(3).getAs[Int]("awards_total") == 17) // trimmed "  17 "
  }

  test("completions_by_cip view shape (architecture.md:55): CIP dim decode") {
    val core = PayloadExplode.toCore(pages, Registry.completions)
    val byCip = GoldViews.decode(core, cipDim, "cipcode", "cip_title")
      .groupBy("cipcode", "cip_title")
      .agg(sum("awards_total").as("awards"))
      .orderBy("cipcode").collect()
    assert(byCip(0).getAs[String]("cip_title") == "Computer Science")
    assert(byCip(0).getAs[Long]("awards") == 52) // 42 + 10
    assert(byCip(1).getAs[String]("cip_title") == "Mathematics, General")
    assert(byCip(1).getAs[Long]("awards") == 17) // suppressed row contributes null
  }
}
