package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.core.Tables
import graft.operators.Dedup
import graft.streaming.StreamingDedup

/** Streaming near-dup dedup contract: the inline Scala signature mirrors
  * the Column simhash bit-for-bit, batch-mode decisions equal the
  * simhashPairs-derived answer, and the streaming run — including pairs
  * SPANNING micro-batches, which only per-bucket state can catch —
  * equals the batch run on the same data.
  */
class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Tables.load(spark, sf(), "documents")
    .select("doc_id", "text")

  test("inline Scala simhash == Column simhash64, bit for bit") {
    val colSigs = Dedup.simhash64(docs, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    val scalaSigs = docs.as[(Long, String)].collect()
      .map { case (id, t) => id -> StreamingDedup.simhash64Scala(t) }.toMap
    assert(colSigs == scalaSigs)
    assert(colSigs.nonEmpty)
  }

  /** Expected per-doc answer derived from the batch pair operator:
    * smallest matching earlier id (and that pair's hamming). */
  private def expectedFrom(d: org.apache.spark.sql.DataFrame) =
    Dedup.simhashPairs(d, "doc_id", "text", maxHamming = 3)
      .groupBy(col("id_b").as("doc_id"))
      .agg(min(struct(col("id_a"), col("hamming"))).as("m"))
      .select(col("doc_id"), col("m.id_a").as("dup_of"),
        col("m.hamming").as("hamming"))

  test("batch-mode decisions == simhashPairs-derived dup set (real corpus)") {
    val withDups = docs.unionByName( // inject exact dups: corpus has few
      docs.where(col("doc_id") % 7 === 0)
        .select((col("doc_id") + 1000000).as("doc_id"), col("text")))
    val actual = StreamingDedup.duplicates(
        StreamingDedup.decisions(withDups, "doc_id", "text").toDF())
      .as[(Long, Long, Int)].collect().toSet
    val expected = expectedFrom(withDups)
      .as[(Long, Long, Int)].collect().toSet
    assert(actual == expected)
    assert(actual.nonEmpty)
  }

  test("streaming == batch, with dup pairs spanning micro-batches") {
    val texts = docs.orderBy("doc_id").as[(Long, String)].collect().take(20)
    // batch 1: ids 1..20; batch 2: the SAME texts under ids 21..40 —
    // every batch-2 doc's nearest match lives in batch-1 state.
    val b1 = texts.zipWithIndex.map { case ((_, t), i) => (i + 1L, t) }
    val b2 = texts.zipWithIndex.map { case ((_, t), i) => (i + 21L, t) }

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Long, String)]
    val stream = ms.toDF().toDF("doc_id", "text")
    val name = s"neardup_${System.nanoTime()}"
    val q = StreamingDedup.decisions(stream, "doc_id", "text")
      .writeStream.outputMode("append").format("memory")
      .queryName(name).trigger(Trigger.ProcessingTime(0)).start()
    try {
      ms.addData(b1.toIndexedSeq)
      q.processAllAvailable()
      ms.addData(b2.toIndexedSeq)
      q.processAllAvailable()
    } finally q.stop()

    val streamed = StreamingDedup.duplicates(spark.table(name))
      .as[(Long, Long, Int)].collect().toSet
    val batchDf = (b1 ++ b2).toSeq.toDF("doc_id", "text")
    val batch = StreamingDedup.duplicates(
        StreamingDedup.decisions(batchDf, "doc_id", "text").toDF())
      .as[(Long, Long, Int)].collect().toSet
    assert(streamed == batch)
    // the cross-batch matches are really there: every batch-2 id has an
    // exact twin in batch-1 state, so each must resolve to SOME batch-1
    // doc — the twin, or an even smaller id within the radius (min wins)
    (21L to 40L).foreach { id =>
      val hit = streamed.find(_._1 == id)
      assert(hit.exists(d => d._2 <= id - 20L && d._3 <= 3),
        s"missing/wrong cross-batch dup for $id: $hit")
    }
  }
}
