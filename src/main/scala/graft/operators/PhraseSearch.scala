package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.expressions.TextShingleExpressions

/** Exact-phrase retrieval over the corpus — the contamination-forensics
  * primitive ("find every document containing this exact quote") that
  * complements [[Bm25]]'s ranked bag-of-words retrieval. A phrase of L
  * words matches wherever it appears as L consecutive tokens.
  *
  * Relational shape: the corpus side explodes its L-gram multiset ONCE
  * per distinct phrase length (codegen `word_ngrams` — the q75 kernel),
  * keeping (doc, pos, gram); the phrase set broadcasts into a gram-keyed
  * equi-join, so the corpus scan is map-local and only matching
  * occurrences reach the (query, doc) count — the same
  * touch-only-matches discipline as the BM25 postings join. Phrase
  * lengths are read from the QUERY set (bounded, driver-side), never
  * the corpus.
  */
object PhraseSearch {

  /** (queryIdCol, doc `idCol`, n_hits, first_pos) for every document
    * containing each query phrase at least once. Whitespace tokenization
    * on both sides; multi-space/leading-space phrases won't match (same
    * contract as the corpus-side tokenizer). */
  def phraseMatches(docs: DataFrame, idCol: String, textCol: String,
                    queries: DataFrame, queryIdCol: String,
                    phraseCol: String): DataFrame = {
    TextShingleExpressions.register(docs.sparkSession)
    val lengths = queries.select(size(split(col(phraseCol), " ")).as("l"))
      .distinct().collect().map(_.getInt(0)).filter(_ >= 1).sorted
    require(lengths.nonEmpty, "phraseMatches: empty query set")
    val perLength = lengths.map { l =>
      val qs = queries
        .where(size(split(col(phraseCol), " ")) === l)
        .select(col(queryIdCol), col(phraseCol).as("gram"))
      val occ = docs.select(col(idCol),
        posexplode(call_function("word_ngrams", col(textCol), lit(l)))
          .as(Seq("pos", "gram")))
      occ.join(broadcast(qs), "gram")
        .groupBy(col(queryIdCol), col(idCol))
        .agg(count(lit(1)).cast("int").as("n_hits"),
          min(col("pos")).as("first_pos"))
    }
    perLength.reduce(_ unionByName _)
  }
}
