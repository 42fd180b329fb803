package graft

import graft.operators.PhraseSearch

/** Exact-phrase semantics by hand: consecutive-only matching, overlap
  * counting, multi-length query sets, and first-position reporting.
  */
class PhraseSearchSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "the quick brown fox jumps"),          // "quick brown" at pos 1
    (2L, "quick the brown fox here now"),       // words present, NOT adjacent
    (3L, "a quick brown then quick brown end"), // two hits, first at 1
    (4L, "x y z quick brown")                   // hit at pos 3
  ).toDF("doc_id", "text")

  private def run(qs: Seq[(Int, String)]) =
    PhraseSearch.phraseMatches(corpus, "doc_id", "text",
        qs.toDF("query_id", "phrase"), "query_id", "phrase")
      .select("query_id", "doc_id", "n_hits", "first_pos")
      .as[(Int, Long, Int, Int)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap

  test("consecutive-only, counts overlapping occurrences, first_pos") {
    val out = run(Seq(0 -> "quick brown"))
    assert(out.keySet.map(_._2) == Set(1L, 3L, 4L)) // doc 2 non-adjacent
    assert(out((0, 1L)) == ((1, 1)))
    assert(out((0, 3L)) == ((2, 1)))
    assert(out((0, 4L)) == ((1, 3)))
  }

  test("mixed phrase lengths resolve independently") {
    val out = run(Seq(0 -> "quick brown", 1 -> "brown fox jumps"))
    assert(out((1, 1L)) == ((1, 2)))         // trigram only in doc 1
    assert(!out.contains((1, 3L)))
    assert(out.keySet.count(_._1 == 0) == 3) // bigram hits unaffected
  }
}
