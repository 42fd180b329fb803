package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.core.Tables
import graft.operators.Dedup
import graft.streaming.{StreamingCuration, StreamingDedup}

/** The streaming cross-corpus gate must equal the batch operator
  * row-for-row: same banding, same exact-Jaccard verification — on the
  * same q77 split of the documents table, in batch mode AND through a
  * real streaming replay.
  */
class StreamingCrossDedupSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Tables.load(spark, sf(), "documents")
  private def existing = docs.where(length($"source") === 4)
  private def incoming = docs.where(length($"source") > 4)

  test("batch-mode gate == minhashLshPairsAgainst on the q77 split") {
    val expect = Dedup.minhashLshPairsAgainst(existing, incoming,
        "doc_id", "text")
      .as[(Long, Long, Double)].collect().toSet
    val got = StreamingDedup.crossDedupGate(incoming, existing,
        "doc_id", "text")
      .as[(Long, Long, Double)].collect().toSet
    assert(expect.nonEmpty, "fixture has no cross pairs — vacuous")
    assert(got == expect,
      s"missed ${(expect -- got).size}, extra ${(got -- expect).size}")
  }

  test("streamed replay == batch gate") {
    val expect = StreamingDedup.crossDedupGate(incoming, existing,
        "doc_id", "text")
      .as[(Long, Long, Double)].collect().toSet
    val name = s"crossdedup_${System.nanoTime()}"
    val stream = spark.readStream
      .schema(StreamingCuration.documentsFileSchema)
      .option("pathGlobFilter", "documents.parquet").parquet(sf())
      .where(length($"source") > 4)
    val q = StreamingDedup.crossDedupGate(stream, existing, "doc_id", "text")
      .writeStream.format("memory").queryName(name)
      .outputMode("append")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val streamed = spark.table(name)
      .as[(Long, Long, Double)].collect().toSet
    assert(streamed == expect,
      s"missed ${(expect -- streamed).size}, extra ${(streamed -- expect).size}")
  }
}
