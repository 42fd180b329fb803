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
}
