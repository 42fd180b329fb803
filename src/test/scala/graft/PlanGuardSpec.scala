package graft

/** Plan-regression gate over the ENTIRE query surface: every SparkEntry
  * query is planned against sf0.001 and its physical plan checked for the
  * shapes that do not survive scale.
  *
  *   - CartesianProduct: never. Pair generation must be inverted-index,
  *     banded, or explicitly broadcast-bounded.
  *   - BroadcastNestedLoopJoin: only in the queries that intentionally
  *     broadcast a tiny side against a non-equi condition (the exact
  *     all-pairs baselines and the broadcast-query-vector top-k). A new
  *     query acquiring a BNL join fails here and must either justify
  *     itself (add to the allowlist) or re-key its join.
  *
  * Streaming queries execute through their own harness (they cannot be
  * planned by a bare explain) and are skipped.
  */
class PlanGuardSpec extends SparkSpec {

  // Queries whose BroadcastNestedLoop is by design: a tiny broadcast side
  // under a non-equi predicate.
  private val bnlAllowed = Set(
    "q25_ann_bruteforce_topk",   // broadcast single query vector
    "q51_ann_batch_topk",        // broadcast query-vector SET (tiny side)
    "q26_cosine_neardup_pairs",  // exact all-pairs correctness baseline
    "q37_range_join",            // banded join's unbucketed comparison arm
    "q36_asof_join",             // tolerance probe on a bounded frame
    "q43_tfidf_topterms",        // broadcast of the 1-row corpus-count agg
    "q58_unigram_logprob",       // broadcast of the 1-row corpus-total agg
    "q67_bigram_logprob",        // broadcast of the 1-row corpus-total agg
    "q68_perplexity_buckets",    // broadcast of the 1-row tercile-threshold agg
    "q76_bm25_topk",             // broadcast of the 1-row (N, avgdl) agg
    "q83_dsir_resample",         // broadcast of the 1-row (V, Nr, Nt) agg
    "q87_hybrid_rrf",            // q51's broadcast query-vector SET (tiny side)
    "q89_bm25_indexed",          // q76's 1-row (N, avgdl) stats broadcast
    "q105_bm25_index_delete",    // same 1-row stats broadcast, tombstoned index
    "q108_bm25_index_upsert",    // same 1-row stats broadcast, upserted index
    "q114_stream_search")        // same 1-row stats broadcast, streamed index

  test("no cartesian products; nested-loop joins only where intended") {
    // Streaming queries: building them RUNS the stream (the returned
    // frame is just the sink read-back — no plan worth guarding).
    val skip = Set("q33_stream_windowed_agg", "q82_stream_append_windows")
    val offenders = scala.collection.mutable.ArrayBuffer[String]()
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, build) =>
      if (!skip.contains(name)) {
        val plan = build(spark, sf()).queryExecution.executedPlan.toString
        if (plan.contains("CartesianProduct"))
          offenders += s"$name: CartesianProduct"
        if (plan.contains("BroadcastNestedLoopJoin") && !bnlAllowed(name))
          offenders += s"$name: unexpected BroadcastNestedLoopJoin"
      }
    }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }
}
