package graft

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.expressions.BpeCodec
import graft.operators.BpeTokenizer

/** BPE contract: merges are learned by weighted pair frequency with
  * deterministic tie-breaks, apply is the canonical greedy
  * lowest-rank-first encode, the distributed codegen projection equals
  * the driver codec row-for-row, and training is partitioning-invariant.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Tables.load(spark, sf(), "documents")

  test("merge learning follows weighted pair frequency (Sennrich example)") {
    // "low" x5, "lowest" x2: the most frequent pairs are (l,o) and (o,w)
    // at weight 7; the lexicographic tie-break picks (l,o) first, after
    // which (lo,w) at 7 beats everything — the classic BPE progression.
    val corpus = (Seq.fill(5)("low") ++ Seq.fill(2)("lowest"))
      .toDF("text")
    val codec = BpeTokenizer.train(corpus, "text", numMerges = 3,
      minPairCount = 2)
    assert(codec.merges.take(3).toSeq ==
      Seq(("l", "o"), ("lo", "w"), ("e", "s")))
    // "low" is now a single token; "lowest" = [low][es][t].
    assert(codec.encodeWord("low").toSeq == Seq("low"))
    assert(codec.encodeWord("lowest").toSeq == Seq("low", "es", "t"))
    // Unknown symbols pass through unmerged (no rank -> no merge) — and
    // never spin: an absent pair must rank "no merge", not rank 0.
    assert(codec.encodeWord("xyz").toSeq == Seq("x", "y", "z"))
  }

  test("greedy apply: rank order wins, round-trip preserves characters") {
    val codec = new BpeCodec(Array(("a", "b"), ("ab", "c")))
    assert(codec.encodeWord("abab").toSeq == Seq("ab", "ab"))
    assert(codec.encodeWord("abcabc").toSeq == Seq("abc", "abc"))
    assert(codec.encodeWord("bac").toSeq == Seq("b", "a", "c"))
    // Tokens always concatenate back to the word — BPE is lossless.
    val fixture = docs.select("text").as[String].take(50)
    val trained = BpeTokenizer.train(docs, "text", numMerges = 30)
    fixture.foreach { t =>
      assert(trained.encodeText(t).mkString("") == t.replace(" ", ""))
    }
  }

  test("distributed codegen encode == driver codec, row for row") {
    val codec = BpeTokenizer.train(docs, "text", numMerges = 30)
    val viaEngine = BpeTokenizer.encode(docs, "text", codec)
      .select($"doc_id", $"bpe")
      .as[(Long, Seq[String])].collect().toMap
    val viaDriver = docs.select("doc_id", "text").as[(Long, String)]
      .collect()
      .map { case (id, t) => id -> codec.encodeText(t).toSeq }.toMap
    assert(viaEngine == viaDriver)
  }

  test("training is partitioning-invariant") {
    def mergesAt(parts: Int) =
      BpeTokenizer.train(docs.repartition(parts), "text", numMerges = 20)
        .merges.toSeq
    assert(mergesAt(1) == mergesAt(13))
  }
}
