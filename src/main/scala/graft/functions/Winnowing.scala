package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.expressions.TextShingleExpressions

/** Winnowing document fingerprints (Schleimer/Wilkerson/Aiken's MOSS
  * scheme): hash every character k-gram, slide a window of `w` hashes, keep
  * the minimum per window — the selected hashes are a position-robust
  * fingerprint set: any shared substring of length >= k+w-1 guarantees a
  * shared fingerprint.
  *
  * Hash = md5 hex of the k-gram; "minimum" = lexicographic min of the hex
  * strings, which is engine-independent (pure byte compare) — so the whole
  * computation is expressible identically in the DuckDB oracle. Everything
  * is array-lambda built-ins inside one projection: no shuffle until the
  * final per-doc explode/distinct.
  */
object Winnowing {

  /** Per-document fingerprint rows: (id, fingerprint) distinct.
    * Documents shorter than k+w-1 chars fingerprint their single window.
    *
    * Fingerprinting runs as the native [[graft.expressions.WinnowFingerprintsExpr]]
    * — one O(chars) pass per document (monotonic-deque sliding minima)
    * inside whole-stage codegen. The earlier array-lambda formulation
    * re-evaluated the full k-gram hash array per window position
    * (interpreted, O(chars²·w) md5 calls per doc) — ~1000x slower at sf0.1.
    * Small inputs that arrive in fewer partitions than cores are widened
    * first so the hash scan uses the whole machine (at real scale the file
    * count already provides parallelism and the repartition is skipped). */
  def fingerprints(df: DataFrame, idCol: String, textCol: String,
                   k: Int = 16, w: Int = 8): DataFrame = {
    TextShingleExpressions.register(df.sparkSession)
    graft.core.Par.widen(df).select(col(idCol),
        explode(call_function("winnow_fingerprints",
          col(textCol), lit(k), lit(w))).as("fingerprint"))
      .distinct()
  }

  /** Containment detection (the MOSS use of winnowing): pairs of documents
    * sharing >= `minOverlap` of the SMALLER document's fingerprints —
    * catches copied/contained passages that whole-document similarity
    * (Jaccard over everything) dilutes away. Inverted fingerprint-index
    * self-join: only docs sharing a fingerprint ever meet (no all-pairs);
    * overlap = shared / min(|A|, |B|), the containment coefficient. Hot
    * fingerprints (boilerplate substrings) fatten buckets the same way hot
    * shingles do — cap them upstream like Dedup.ngramJaccardPairs'
    * maxShingleDf if a corpus needs it. */
  def overlapPairs(df: DataFrame, idCol: String, textCol: String,
                   k: Int = 16, w: Int = 8,
                   minOverlap: Double = 0.5): DataFrame = {
    // Cached: three consumers (sizes + both self-join sides) would
    // otherwise re-run the winnowing kernel over the whole corpus per
    // consumer (the Dedup.ngramJaccardPairs lesson — its shingle table
    // is cached for exactly this reason; at 100 TB materialize once
    // instead).
    val fps = fingerprints(df, idCol, textCol, k, w).cache()
    val sizes = fps.groupBy(idCol).agg(count(lit(1)).as("n_fp"))
    val shared = fps.as("a").join(fps.as("b"),
        col("a.fingerprint") === col("b.fingerprint")
          && col(s"a.$idCol") < col(s"b.$idCol"))
      .groupBy(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"))
      .agg(count(lit(1)).as("shared"))
    val sa = sizes.select(col(idCol).as("id_a"), col("n_fp").as("n_a"))
    val sb = sizes.select(col(idCol).as("id_b"), col("n_fp").as("n_b"))
    shared.join(sa, "id_a").join(sb, "id_b")
      .withColumn("overlap",
        round(col("shared") / least(col("n_a"), col("n_b")), 6))
      .where(col("overlap") >= minOverlap)
      .select("id_a", "id_b", "shared", "overlap")
  }
}
