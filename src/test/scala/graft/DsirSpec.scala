package graft

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.Dsir

/** DSIR contract: the likelihood-ratio weights separate target-like from
  * non-target documents, the Gumbel resample matches the target
  * distribution (and flattens to uniform as temperature grows), and the
  * whole draw is a deterministic function of (data, coin) — invariant to
  * partitioning like every other selection operator in the engine.
  *
  * The fixture documents share one synthetic vocabulary across langs (the
  * lang column is a label, not a linguistic difference), so the
  * enrichment properties are asserted on a constructed corpus with a real
  * domain signal; the fixture only pins weight DIRECTION + determinism
  * (its exact values are pinned end-to-end by q83's DuckDB oracle).
  */
class DsirSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Tables.load(spark, sf(), "documents")

  /** 400 docs, half "domain" (distinct content words), half background;
    * both halves share function words so the vocabularies overlap. */
  private def synth = spark.range(400).select(
    col("id").as("doc_id"),
    (col("id") % 2 === 0).as("is_tgt"),
    when(col("id") % 2 === 0,
      concat(lit("the data of quantum tensor gradient embedding "),
        lit("quantum model the of")))
      .otherwise(
        concat(lit("the data of invoice ledger shipment warehouse "),
          lit("invoice account the of"))).as("text"))

  test("weights + resample: target domain decisively enriched") {
    val w = Dsir.importanceWeights(synth, "doc_id", "text", col("is_tgt"))
      .join(synth.select("doc_id", "is_tgt"), "doc_id")
      .select($"is_tgt", $"__logw").as[(Boolean, Double)].collect()
    val mt = w.filter(_._1).map(_._2).sum / w.count(_._1)
    val mr = w.filterNot(_._1).map(_._2).sum / w.count(!_._1)
    info(f"mean logw: target=$mt%.3f background=$mr%.3f")
    assert(mt > mr + 1.0,
      s"likelihood ratio must separate distinct vocabularies: $mt vs $mr")
    val picked = Dsir.resampleTopK(synth, "doc_id", "text",
        col("is_tgt"), k = 100)
      .join(synth.select("doc_id", "is_tgt"), "doc_id")
    val frac = picked.where($"is_tgt").count() / 100.0
    info(f"resample target fraction = $frac%.2f (base rate 0.5)")
    assert(frac >= 0.95)
  }

  test("temperature flattens the draw toward a uniform sample") {
    def tgtCount(t: Double) = Dsir.resampleTopK(synth, "doc_id", "text",
        col("is_tgt"), k = 100, temperature = t)
      .join(synth.select("doc_id", "is_tgt"), "doc_id")
      .where($"is_tgt").count()
    val sharp = tgtCount(1.0)
    val flat = tgtCount(1e6)
    info(s"target@100: T=1 -> $sharp, T=1e6 -> $flat")
    // T -> inf degenerates the key to pure Gumbel noise = uniform draw;
    // the md5 coin is lang-independent, so ~half the picks are target.
    assert(sharp >= 95 && flat < 70 && flat > 30)
  }

  test("fixture weights order the declared target above the rest") {
    val w = Dsir.importanceWeights(docs, "doc_id", "text",
        col("lang") === "en")
      .join(docs.select("doc_id", "lang"), "doc_id")
      .select($"lang" === "en", $"__logw").as[(Boolean, Double)].collect()
    val mt = w.filter(_._1).map(_._2).sum / w.count(_._1)
    val mr = w.filterNot(_._1).map(_._2).sum / w.count(!_._1)
    info(f"fixture mean logw: en=$mt%.4f other=$mr%.4f (weak by design)")
    assert(mt > mr)
  }

  test("resample is partitioning-invariant (deterministic coin + weights)") {
    def run(parts: Int) = Dsir.resampleTopK(
        docs.repartition(parts), "doc_id", "text",
        col("lang") === "en", k = 50)
      .select("doc_id", "logw", "gkey")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
      .toSeq
    assert(run(1) == run(13))
  }
}
