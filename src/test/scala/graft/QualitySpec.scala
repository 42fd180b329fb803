package graft

import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis
import graft.operators.CorpusLm

/** Repetition statistics and corpus-LM scoring on corpora where every
  * value is hand-computable: bigram modes, distinct ratios, exact unigram
  * probabilities.
  */
class QualitySpec extends SparkSpec {
  import spark.implicits._

  test("bigrams: shifted zip, single-token doc empty") {
    val df = Seq((1L, "a b a b"), (2L, "solo")).toDF("doc_id", "text")
    val got = df.select($"doc_id", TextAnalysis.bigrams($"text").as("bg"))
      .as[(Long, Seq[String])].collect().toMap
    assert(got(1L) == Seq("a b", "b a", "a b"))
    assert(got(2L).isEmpty)
  }

  test("repetition stats: hand-computed mode and ratios") {
    val df = Seq(
      (1L, "a b a b"),            // 4 tokens, 2 distinct; top bigram "a b" x2 of 3
      (2L, "all words differ"),   // 3 tokens, 3 distinct; every bigram unique
      (3L, "solo")                // 1 token: no bigrams
    ).toDF("doc_id", "text")

    val toks = split($"text", " ")
    val base = df.select($"doc_id",
      size(toks).as("n_tokens"),
      size(array_distinct(toks)).as("n_distinct"),
      TextAnalysis.bigrams($"text").as("bgs"))
    val top = base.select($"doc_id", explode($"bgs").as("bg"))
      .groupBy("doc_id", "bg").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(max($"c").cast("int").as("top"))
    val got = base.join(top, Seq("doc_id"), "left")
      .select($"doc_id", $"n_tokens", $"n_distinct", coalesce($"top", lit(0)))
      .as[(Long, Int, Int, Int)].collect().map(r => r._1 -> (r._2, r._3, r._4)).toMap

    assert(got(1L) == ((4, 2, 2)))
    assert(got(2L) == ((3, 3, 1)))
    assert(got(3L) == ((1, 1, 0)))
  }

  test("unigramLogProb: exact probabilities on a tiny corpus") {
    // Corpus tokens: a a a b  → p(a)=3/4, p(b)=1/4.
    val df = Seq((1L, "a a"), (2L, "a b")).toDF("doc_id", "text")
    val got = CorpusLm.unigramLogProb(df, "doc_id", "text")
      .as[(Long, Int, Double, Double)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap

    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val lpA = math.log(3.0 / 4.0)
    val lpB = math.log(1.0 / 4.0)
    assert(got(1L) == ((2, r6(lpA), r6(lpA))))
    assert(got(2L) == ((2, r6((lpA + lpB) / 2.0), r6(lpB))))
  }

  test("unigramLogProb: broadcast and shuffle-join paths agree") {
    val df = Seq((1L, "x y z"), (2L, "x x q"), (3L, "y")).toDF("doc_id", "text")
    val b = CorpusLm.unigramLogProb(df, "doc_id", "text").orderBy("doc_id").collect()
    val s = CorpusLm.unigramLogProb(df, "doc_id", "text", broadcastVocab = false)
      .orderBy("doc_id").collect()
    assert(b.sameElements(s))
  }

  test("bigramLogProb: exact interpolated probabilities on a tiny corpus") {
    // Corpus tokens: a b a b a  → N=5, c(a)=3, c(b)=2.
    // Bigram counts: (a,b)=1 (doc 1), (b,a)=2 (one per doc).
    val df = Seq((1L, "a b a"), (2L, "b a")).toDF("doc_id", "text")
    val got = CorpusLm.bigramLogProb(df, "doc_id", "text")
      .as[(Long, Int, Double, Double)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap

    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val pAB = 0.75 * (1.0 / 3.0) + 0.25 * (2.0 / 5.0) // p(b | a)
    val pBA = 0.75 * (2.0 / 2.0) + 0.25 * (3.0 / 5.0) // p(a | b)
    val lAB = math.log(pAB); val lBA = math.log(pBA)
    // doc 1 = "a b a": positions (a,b), (b,a); doc 2 = "b a": one (b,a).
    assert(got(1L) == ((2, r6((lAB + lBA) / 2.0), r6(math.min(lAB, lBA)))))
    assert(got(2L) == ((1, r6(lBA), r6(lBA))))
    // Single-token doc has no bigram positions → absent, like bigrams().
    val single = CorpusLm.bigramLogProb(
      Seq((9L, "a b"), (10L, "a")).toDF("doc_id", "text"), "doc_id", "text")
    assert(single.select("doc_id").as[Long].collect().toSet == Set(9L))
  }

  test("bigramLogProb: broadcast and shuffle-join paths agree") {
    val df = Seq((1L, "x y z x y"), (2L, "x x q z"), (3L, "y x")).toDF("doc_id", "text")
    val b = CorpusLm.bigramLogProb(df, "doc_id", "text").orderBy("doc_id").collect()
    val s = CorpusLm.bigramLogProb(df, "doc_id", "text", broadcastVocab = false)
      .orderBy("doc_id").collect()
    assert(b.sameElements(s))
  }
}
