package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.expressions.{MisraGriesAgg, TextShingleExpressions}

/** Corpus-wide frequent-item extraction — boilerplate detection and vocab
  * seeding for training-data pipelines (the n-gram analogue of the
  * reference's frequency profiling; cf. `etl/mappers/directory.py:30-119`
  * for its per-column value profiling discipline).
  *
  * The 100 TB problem with "just groupBy(ngram).count()": n-gram
  * vocabularies are heavy-tailed and corpus-proportional (billions of
  * distinct trigrams on web text), so both the map-side combine hash table
  * and the shuffle scale with the corpus, to answer a question about the
  * top fifty rows. The two-pass shape here is the standard fix:
  *
  *   pass 1 — [[graft.expressions.MisraGriesAgg]] sketches candidates in
  *     bounded memory (`capacity` counters per partition, one
  *     ≤`capacity`-entry summary per partition shuffled);
  *   pass 2 — re-scan, keep only candidate n-grams (broadcast semi-join
  *     against the ≤`capacity`-row candidate set), count THOSE exactly,
  *     take top-k with a total order.
  *
  * The output is provably the exact top-k whenever the k-th true count
  * exceeds N/(capacity+1) (the MG retention guarantee) — on heavy-tailed
  * text this holds with huge margin for capacity in the tens of
  * thousands. Two scans of the corpus is the price; each is a pruned
  * column scan with no corpus-sized shuffle anywhere.
  */
object HeavyHitters {

  /** Exact top-k word n-grams of `textCol` by the two-pass sketch shape.
    * Output: (ngram, cnt), ordered cnt desc then ngram, k rows. */
  def topKNgrams(df: DataFrame, textCol: String, n: Int = 3, k: Int = 50,
                 capacity: Int = 16384): DataFrame = {
    val spark = df.sparkSession
    TextShingleExpressions.register(spark)
    MisraGriesAgg.register(spark)
    // word_ngrams, NOT word_shingles: counting needs the multiset (a doc
    // repeating a boilerplate trigram five times contributes five).
    val grams = df.select(
      explode(call_function("word_ngrams", col(textCol), lit(n))).as("ngram"))
    // Pass 1: global sketch — partial MG per partition, merged once.
    // Stays a DataFrame (1 row → exploded) so no driver collect at all.
    val cands = grams
      .agg(call_function("mg_candidates", col("ngram"), lit(capacity)).as("cand"))
      .select(explode(col("cand")).as("ngram"))
    // Pass 2: exact counts of candidates only; the broadcast keeps the
    // corpus-side scan map-local and only candidate hits reach the count.
    grams.join(broadcast(cands), "ngram")
      .groupBy("ngram").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("ngram"))
      .limit(k)
  }
}
