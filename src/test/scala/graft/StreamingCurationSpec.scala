package graft

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.streaming.StreamingCuration

/** Streaming curation == batch curation: the same quality + acceptance
  * transform over the replayed documents stream must produce exactly the
  * batch rows (stateless + stream-static join → no ordering or state
  * caveats to carve out).
  */
class StreamingCurationSpec extends SparkSpec {
  import spark.implicits._

  test("streamed curate == batch curate, rates honored") {
    val rates = Seq(("en", 0.4), ("de", 1.0), ("es", 1.0), ("fr", 1.0),
      ("zh", 1.0)).toDF("lang", "rate")
    val batch = StreamingCuration.curate(
        Tables.load(spark, sf(), "documents"), rates, minQuality = 0.5)
      .as[(Long, String, Double, Double)].collect().toSet
    val streamed = StreamingCuration.runAvailableNow(
        spark, sf(), rates, minQuality = 0.5)
      .as[(Long, String, Double, Double)].collect().toSet
    assert(batch.nonEmpty)
    assert(streamed == batch,
      s"missed ${(batch -- streamed).size}, extra ${(streamed -- batch).size}")
    // The gates actually bind: some docs rejected on quality, and the
    // en rate keeps roughly 40% of what quality lets through.
    val all = Tables.load(spark, sf(), "documents").count()
    assert(batch.size < all)
    val en = batch.count(_._2 == "en").toDouble
    val enQuality = StreamingCuration.curate(
        Tables.load(spark, sf(), "documents"),
        Seq(("en", 1.0)).toDF("lang", "rate"), minQuality = 0.5)
      .where($"lang" === "en").count().toDouble
    assert(en / enQuality > 0.25 && en / enQuality < 0.55,
      s"en acceptance ${en / enQuality} not ~0.4")
  }

  test("decontamination gate: no exactly-contaminated doc survives; streamed == batch") {
    val d = Tables.load(spark, sf(), "documents")
    val train = d.where($"doc_id" % 50 =!= 0)
    val bench = d.where($"doc_id" % 50 === 0)
    val bloom = graft.operators.Dedup.benchBloom(bench, "doc_id", "text", n = 3)
    val kept = StreamingCuration.decontaminationGate(train, bloom,
        n = 3, minShared = 3)
      .select("doc_id").as[Long].collect().toSet
    // Exact pairwise flags (the q54 answer) must be fully quarantined:
    // pairwise-shared <= union-shared and the bloom has no false negatives.
    val flagged = graft.operators.Dedup.crossNgramOverlap(
        train, bench, "doc_id", "text", n = 3, minShared = 3L)
      .select("train_id").as[Long].collect().toSet
    assert(flagged.nonEmpty, "fixture has no contaminated docs — vacuous")
    assert((kept & flagged).isEmpty,
      s"contaminated docs passed the gate: ${(kept & flagged).take(5)}")
    // Over-quarantine (union semantics + fpp) stays measured and bounded.
    val total = train.count()
    val quarantined = total - kept.size
    info(s"quarantined $quarantined/$total (exact pairwise flags: ${flagged.size})")
    assert(quarantined < total, "gate quarantined everything")
    // Streamed replay through a real streaming query == the batch rows.
    val name = s"decon_${System.nanoTime()}"
    val q = StreamingCuration.decontaminationGate(
        spark.readStream.schema(StreamingCuration.documentsFileSchema)
          .option("pathGlobFilter", "documents.parquet").parquet(sf())
          .where($"doc_id" % 50 =!= 0),
        bloom, n = 3, minShared = 3)
      .select("doc_id", "bench_hits")
      .writeStream.format("memory").queryName(name)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    val streamed = spark.table(name).select("doc_id").as[Long].collect().toSet
    assert(streamed == kept,
      s"missed ${(kept -- streamed).size}, extra ${(streamed -- kept).size}")
  }

  test("classifier gate: frozen distilled model meters the stream == batch") {
    import graft.functions.TextAnalysis
    import graft.operators.QualityClassifier
    val docs = Tables.load(spark, sf(), "documents")
    // Train batch-side (the offline step); gate with the frozen weights.
    val model = QualityClassifier.trainSample(docs, "doc_id", "text",
      TextAnalysis.qualityScore(col("text")) >= 0.78)
    val batch = StreamingCuration.classifierGate(docs, model, minScore = 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(batch.nonEmpty && batch.size < docs.count(),
      "gate must reject some and keep some")
    val name = s"clf_${System.nanoTime()}"
    val q = StreamingCuration.classifierGate(
        spark.readStream.schema(StreamingCuration.documentsFileSchema)
          .option("pathGlobFilter", "documents.parquet").parquet(sf()),
        model, minScore = 0.5)
      .select("doc_id")
      .writeStream.format("memory").queryName(name)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    val streamed = spark.table(name).select("doc_id").as[Long].collect().toSet
    assert(streamed == batch)
  }
}
