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
    val par = df.sparkSession.sparkContext.defaultParallelism
    val src =
      if (df.isStreaming) df // partition probing/repartition is batch-only
      else if (df.rdd.getNumPartitions < par) df.repartition(par)
      else df
    src.select(col(idCol),
        explode(call_function("winnow_fingerprints",
          col(textCol), lit(k), lit(w))).as("fingerprint"))
      .distinct()
  }
}
