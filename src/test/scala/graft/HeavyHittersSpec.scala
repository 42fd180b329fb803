package graft

import org.apache.spark.sql.functions._

import graft.expressions.MisraGriesAgg
import graft.operators.HeavyHitters

/** Misra-Gries sketch semantics plus the two-pass exact top-k operator:
  * the retention guarantee on an adversarial stream, exactness below
  * capacity, partitioning invariance of the FINAL answer (the candidate
  * set may differ with merge order; the re-counted top-k may not), and
  * parity with brute force on the real documents table.
  */
class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  private def sketch(items: Seq[String], capacity: Int,
                     partitions: Int): Seq[String] = {
    MisraGriesAgg.register(spark)
    items.toDF("s").repartition(partitions)
      .agg(call_function("mg_candidates", $"s", lit(capacity)).as("c"))
      .head().getSeq[String](0)
  }

  test("below capacity the sketch is lossless: candidates == distinct items") {
    val items = Seq("a", "b", "a", "c", "b", "a")
    assert(sketch(items, capacity = 16, partitions = 3).sorted ==
      Seq("a", "b", "c"))
  }

  test("retention guarantee: count > N/(m+1) survives an adversarial tail") {
    // 40 copies of HOT drowned in 160 singletons; m=8 → threshold
    // 200/9 ≈ 22 < 40, so HOT must be retained for ANY partitioning.
    val items = Seq.fill(40)("HOT") ++ (1 to 160).map(i => s"tail_$i")
    for (p <- Seq(1, 4, 32)) {
      val cands = sketch(new scala.util.Random(42).shuffle(items),
        capacity = 8, partitions = p)
      assert(cands.contains("HOT"), s"HOT lost at partitions=$p: $cands")
      assert(cands.size <= 8)
    }
  }

  test("word_ngrams keeps duplicates in position order; word_shingles dedups") {
    graft.expressions.TextShingleExpressions.register(spark)
    val df = Seq("a b a b a").toDF("t")
    val all = df.select(call_function("word_ngrams", $"t", lit(2)))
      .head().getSeq[String](0)
    assert(all == Seq("a b", "b a", "a b", "b a"))
    val distinctSh = df.select(call_function("word_shingles", $"t", lit(2)))
      .head().getSeq[String](0)
    assert(distinctSh == Seq("a b", "b a"))
    val short = df.select(call_function("word_ngrams", $"t", lit(6)))
      .head().getSeq[String](0)
    assert(short.isEmpty)
  }

  test("two-pass top-k == brute force on real docs, any partitioning") {
    val d = graft.core.Tables.load(spark, "/root/testdata/sf0.01", "documents")
    graft.expressions.TextShingleExpressions.register(spark)
    val grams = d.select(
      explode(call_function("word_ngrams", $"text", lit(3))).as("ngram"))
    val brute = grams.groupBy("ngram").agg(count(lit(1)).as("cnt"))
      .orderBy($"cnt".desc, $"ngram").limit(50)
      .as[(String, Long)].collect().toSeq
    // Capacity 8192 < the ~16k distinct trigrams at sf0.01 — the sketch
    // genuinely compresses here, and the answer must still be exact:
    // retention threshold N/(m+1) ≈ 25665/8193 ≈ 3.1 sits below the
    // rank-50 count of 5, so every top-50 trigram (and every count-5 tie)
    // is guaranteed into the candidate set for any merge order.
    for (p <- Seq(1, 32)) {
      val got = HeavyHitters.topKNgrams(d.repartition(p), "text",
          n = 3, k = 50, capacity = 8192)
        .as[(String, Long)].collect().toSeq
      assert(got == brute, s"top-k mismatch at partitions=$p")
    }
  }
}
