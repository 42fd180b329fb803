package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.expressions.{BpeCodec, BpeEncode}

/** BPE tokenizer TRAINING, Spark-first (Sennrich et al., ACL 2016; the
  * same two-phase shape as HuggingFace tokenizers and sentencepiece):
  *
  *   1. **Word-type counts** — the only corpus-sized pass: one
  *      map-side-combinable groupBy(word) count. Its result is bounded
  *      by WORD TYPES (Heaps' law), not corpus size — the same
  *      driver-collect budget as [[CorpusLm]]'s vocabulary and
  *      [[IvfIndex]]'s training sample. This is exactly how the
  *      reference tokenizer trainers scale: merges are a function of the
  *      word-count table, so a 100 TB corpus trains from the same
  *      aggregate a 100 MB corpus does.
  *   2. **Merge learning** — driver-side loop over the weighted word
  *      types: each round counts adjacent symbol pairs (weighted by word
  *      frequency) and merges the most frequent pair everywhere. Fully
  *      deterministic: counts are exact longs; ties break on the
  *      lexicographically smallest (a, b); the word table is sorted
  *      before the loop so no hash-iteration order leaks in.
  *
  * Application is the 100 TB win: [[BpeCodec]] rides a codegen
  * expression ([[encode]]) — corpus tokenization is a map-only
  * projection, no shuffle, no join.
  *
  * Declared ceiling (the [[IvfIndex.train]] discipline): a web-scale
  * vocabulary of ~10^8 types at ~10 bytes is a few GB on the driver —
  * past that, pair counting itself becomes a per-round Spark aggregate
  * over the word table (NOT the corpus); the loop structure is unchanged.
  */
object BpeTokenizer {

  /** Learn `numMerges` merges from the corpus (merges stop early when no
    * pair reaches `minPairCount`). */
  def train(docs: DataFrame, textCol: String, numMerges: Int,
            minPairCount: Long = 2L): BpeCodec = {
    val counts = docs
      .select(explode(split(col(textCol), " ")).as("w"))
      .where(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("n"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .sortBy(_._1)
    trainFromWordCounts(counts, numMerges, minPairCount)
  }

  /** The driver-side merge loop, exposed for the past-the-ceiling path
    * (feed it a pre-aggregated word-count table from anywhere). */
  def trainFromWordCounts(counts: Array[(String, Long)], numMerges: Int,
                          minPairCount: Long = 2L): BpeCodec = {
    val weights = counts.map(_._2)
    val seqs: Array[Array[String]] =
      counts.map(_._1.map(String.valueOf(_)).toArray)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var rounds = 0
    var exhausted = false
    while (rounds < numMerges && !exhausted) {
      // Boxed values (the BpeCodec.rank lesson): primitive-valued java
      // maps silently unbox a missing key's null.
      val pc = new java.util.HashMap[(String, String), java.lang.Long]()
      var wi = 0
      while (wi < seqs.length) {
        val s = seqs(wi); val wt = weights(wi)
        var i = 0
        while (i < s.length - 1) {
          val k = (s(i), s(i + 1))
          val prev = pc.get(k)
          pc.put(k, java.lang.Long.valueOf(
            (if (prev eq null) 0L else prev.longValue()) + wt))
          i += 1
        }
        wi += 1
      }
      // Deterministic argmax: highest weighted count, ties to the
      // lexicographically smallest pair — no hash-order dependence.
      var best: (String, String) = null
      var bestN = 0L
      val it = pc.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val k = e.getKey; val n = e.getValue.longValue()
        if (n > bestN || (n == bestN && best != null &&
            (k._1 < best._1 || (k._1 == best._1 && k._2 < best._2)))) {
          best = k; bestN = n
        }
      }
      if (best == null || bestN < minPairCount) exhausted = true
      else {
        merges += best
        wi = 0
        while (wi < seqs.length) {
          seqs(wi) = mergePair(seqs(wi), best._1, best._2)
          wi += 1
        }
        rounds += 1
      }
    }
    new BpeCodec(merges.toArray)
  }

  private def mergePair(s: Array[String], a: String,
                        b: String): Array[String] = {
    val out = new scala.collection.mutable.ArrayBuffer[String](s.length)
    var i = 0
    while (i < s.length) {
      if (i < s.length - 1 && s(i) == a && s(i + 1) == b) {
        out += a + b; i += 2
      } else { out += s(i); i += 1 }
    }
    out.toArray
  }

  /** `outCol` = ARRAY<STRING> of BPE tokens — one codegen projection,
    * the codec riding as a reference object (the PqIndex.encode temp-
    * function registration pattern for parameterized expressions). */
  def encode(df: DataFrame, textCol: String, codec: BpeCodec,
             outCol: String = "bpe"): DataFrame = {
    df.sparkSession.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bpe_encode", exprs => BpeEncode(exprs(0), codec), "built-in")
    df.withColumn(outCol, call_function("bpe_encode", col(textCol)))
  }
}
