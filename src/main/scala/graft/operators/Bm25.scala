package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

/** BM25 keyword retrieval over a document corpus — the inverted-index
  * ranking primitive a curation stack needs next to its ANN stack
  * (retrieval-based decontamination, boilerplate hunting, eval-set
  * mining all start with "find the k docs that best match this query").
  * Okapi BM25 (Robertson & Sparck Jones), with the Lucene idf variant
  * `ln(1 + (N - df + 0.5)/(df + 0.5))` so idf is always positive.
  *
  * The plan IS the inverted index, expressed relationally:
  *
  *   1. postings (term, doc, tf): one explode + map-side-combinable
  *      groupBy — the same shape a Lucene segment write shuffles into;
  *   2. doc lengths re-aggregate FROM the postings (already doc-keyed:
  *      `sum(tf)`), so the corpus text is tokenized exactly once;
  *   3. per-term df and the scalar (N, avgdl) are Heaps-bounded /
  *      single-row aggregates;
  *   4. the query set explodes to (query_id, term), joins idf, and
  *      BROADCASTS into the postings join — map-local over the corpus,
  *      touching only postings whose term some query mentions (the
  *      inverted-index seek, as partition-pruned join instead of a
  *      disk seek). A web-scale query log would flip `broadcastQueries
  *      = false` to a plain term-keyed shuffle join — same plan shape;
  *   5. one (query_id, doc) sum and a query-partitioned top-k window.
  *
  * Nothing is corpus-proportional on the driver; the only corpus-wide
  * shuffles are the postings aggregate and the final scoring groupBy,
  * both map-side combined. Scores are `round(_, 6)` at the edge and
  * ranked on the ROUNDED value (tie-break doc id) so ordering is
  * engine-exact — the q58 transcendental-parity convention.
  */
object Bm25 {

  /** Top-k docs per query. `queries`: (queryIdCol, queryTextCol) rows;
    * whitespace tokenization matches the corpus side. */
  def searchTopK(docs: DataFrame, idCol: String, textCol: String,
                 queries: DataFrame, queryIdCol: String, queryTextCol: String,
                 k: Int = 10, k1: Double = 1.2, b: Double = 0.75,
                 broadcastQueries: Boolean = true): DataFrame = {
    val tf = docs
      .select(col(idCol), explode(split(col(textCol), " ")).as("term"))
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
    val doclen = tf.groupBy(col(idCol)).agg(sum("tf").as("dl"))
    val stats = doclen.agg(count(lit(1)).cast("double").as("n_docs"),
      (sum("dl").cast("double") / count(lit(1))).as("avgdl"))
    val df_ = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val qterms = queries
      .select(col(queryIdCol), explode(split(col(queryTextCol), " ")).as("term"))
      .distinct()
      .join(df_, "term")
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))))
      .select(col(queryIdCol), col("term"), col("idf"), col("avgdl"))
    val contrib = tf.join(doclen, idCol)
      .join(if (broadcastQueries) broadcast(qterms) else qterms, "term")
      .withColumn("c",
        col("idf") * col("tf").cast("double") * (lit(k1) + 1.0) /
          (col("tf").cast("double") +
            lit(k1) * (lit(1.0 - b) + lit(b) * col("dl").cast("double") / col("avgdl"))))
    val scored = contrib.groupBy(col(queryIdCol), col(idCol))
      .agg(round(sum("c"), 6).as("score"))
    val w = Window.partitionBy(col(queryIdCol))
      .orderBy(col("score").desc, col(idCol))
    scored.withColumn("rank", row_number().over(w).cast(IntegerType))
      .where(col("rank") <= k)
  }
}
