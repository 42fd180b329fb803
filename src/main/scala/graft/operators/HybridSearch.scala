package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid retrieval fusion — reciprocal rank fusion (Cormack, Clarke &
  * Büttcher, SIGIR 2009), the standard way modern search stacks combine
  * a lexical ranker (BM25) with a vector ranker (ANN cosine):
  *
  *   rrf(q, d) = Σ_sides 1 / (c + rank_side(q, d))
  *
  * RRF needs only RANKS, never the incomparable raw scores — which is
  * why it beats score interpolation without per-collection calibration.
  *
  * Scale shape: each side is already a top-k' result (tiny — queries ×
  * k' rows), so fusion moves NO corpus data: a union of slim
  * (query, doc, 1/(c+rank)) triples, one groupBy(query, doc) aggregate,
  * one query-partitioned rank window. All the heavy lifting stays in
  * the sides' own scale-paths (BM25's map-local postings join, ANN's
  * partition-pruned probes).
  *
  * Determinism: with two sides there are at most two addends per (q, d)
  * group, and IEEE-754 addition is commutative, so the fused score is
  * bit-stable under any partitioning; ≥3 sides would reintroduce
  * association order, hence the round(6) at the edge (house convention).
  */
object HybridSearch {

  /** Fuse ranked sides. Each input must carry `(queryCol, docCol,
    * rankCol)` with rank 1-based within its side's per-query list.
    * Returns (query, doc, rrf, n_sides, rank) — top `k` per query,
    * ranked by (rrf desc, doc). */
  def rrfFuse(sides: Seq[DataFrame], queryCol: String, docCol: String,
              rankCol: String, k: Int, c: Int = 60): DataFrame = {
    require(sides.nonEmpty, "rrfFuse needs at least one ranked side")
    val contribs = sides.map(_.select(col(queryCol), col(docCol),
      (lit(1.0) / (lit(c).cast("double") + col(rankCol).cast("double")))
        .as("__contrib")))
    val fused = contribs.reduce(_ unionByName _)
      .groupBy(col(queryCol), col(docCol))
      .agg(round(sum(col("__contrib")), 6).as("rrf"),
        count(lit(1)).cast("int").as("n_sides"))
    val w = Window.partitionBy(col(queryCol))
      .orderBy(col("rrf").desc, col(docCol))
    fused.withColumn("rank", row_number().over(w).cast("int"))
      .where(col("rank") <= k)
  }
}
