package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.functions.TextAnalysis
import graft.operators.SequencePacking

/** Concatenate-and-chunk packing contract: the distributed global running
  * sum equals the naive single-partition window, is partitioning-
  * invariant, and the chunk accounting conserves tokens (every sequence
  * exactly full except the last).
  */
class SequencePackingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.load(spark, sf(), "documents")
    .select(col("doc_id"), col("text"))

  test("globalRunningSum == naive single-partition window cumsum") {
    val dist = SequencePacking.globalRunningSum(
        docs.withColumn("v", TextAnalysis.tokenCountWs(col("text"))),
        Seq(col("doc_id")), col("v"), "s", "e")
      .select($"doc_id", $"s", $"e").as[(Long, Long, Long)]
      .collect().sortBy(_._1).toSeq
    val naive = docs
      .withColumn("v", TextAnalysis.tokenCountWs(col("text")).cast("long"))
      .withColumn("e", sum("v").over(Window.orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select($"doc_id", ($"e" - $"v").as("s"), $"e")
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(dist == naive)
  }

  test("running sum is input-partitioning-invariant") {
    def run(df: org.apache.spark.sql.DataFrame) =
      SequencePacking.globalRunningSum(
          df.withColumn("v", TextAnalysis.tokenCountWs(col("text"))),
          Seq(col("doc_id")), col("v"), "s", "e")
        .select($"doc_id", $"s", $"e").as[(Long, Long, Long)]
        .collect().sortBy(_._1).toSeq
    assert(run(docs) == run(docs.repartition(7)))
    assert(run(docs) == run(docs.coalesce(1)))
  }

  test("chunk accounting: every sequence exactly full except the last") {
    val W = 256
    val spans = SequencePacking.chunkSpans(docs, Seq(col("doc_id")),
      TextAnalysis.tokenCountWs(col("text")), windowTokens = W)
    val stats = SequencePacking.chunkStats(spans, windowTokens = W)
      .select($"seq", $"n_docs", $"seq_tokens")
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    val total = docs
      .agg(sum(TextAnalysis.tokenCountWs(col("text")).cast("long")))
      .head.getLong(0)
    // Dense sequence ids 0..last, conservation, exact fill.
    assert(stats.map(_._1) == (0L until stats.size.toLong))
    assert(stats.map(_._3).sum == total)
    assert(stats.init.forall(_._3 == W.toLong),
      "every non-final sequence must hold exactly W tokens")
    assert(stats.last._3 == total - W.toLong * (stats.size - 1))
    assert(stats.forall(_._2 >= 1))
    // A doc spans exactly the sequences between its boundaries.
    val bad = spans.where(col("first_seq") =!= floor(col("tok_start") / W) ||
      col("last_seq") =!= floor((col("tok_end") - 1) / W)).count()
    assert(bad == 0)
  }

  test("straddling docs are counted in every sequence they touch") {
    // 3 docs of 10 tokens each, window 8: doc 1 fills seq0[0..8), doc 2
    // spans seq0+seq1+seq2? offsets: d1 [0,10) -> seq 0,1; d2 [10,20) ->
    // seq 1,2; d3 [20,30) -> seq 2,3.
    val three = Seq.tabulate(3)(i =>
        ((i + 1).toLong, Seq.fill(10)("w").mkString(" ")))
      .toDF("doc_id", "text")
    val spans = SequencePacking.chunkSpans(three, Seq(col("doc_id")),
      TextAnalysis.tokenCountWs(col("text")), windowTokens = 8)
      .select($"doc_id", $"first_seq", $"last_seq")
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(spans == Seq((1L, 0L, 1L), (2L, 1L, 2L), (3L, 2L, 3L)))
    val stats = SequencePacking.chunkStats(
        SequencePacking.chunkSpans(three, Seq(col("doc_id")),
          TextAnalysis.tokenCountWs(col("text")), windowTokens = 8),
        windowTokens = 8)
      .select($"seq", $"n_docs", $"seq_tokens")
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    // seq0 [0,8) holds only doc1; seq1 [8,16) = doc1 tail + doc2 head;
    // seq2 [16,24) = doc2 tail + doc3 head; seq3 [24,30) = doc3 tail.
    assert(stats == Seq((0L, 1L, 8L), (1L, 2L, 8L), (2L, 2L, 8L),
      (3L, 1L, 6L)))
  }
}
