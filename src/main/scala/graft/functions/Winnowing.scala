package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

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
    * Documents shorter than k+w-1 chars fingerprint their single window. */
  def fingerprints(df: DataFrame, idCol: String, textCol: String,
                   k: Int = 16, w: Int = 8): DataFrame = {
    val text = col(textCol)
    val nGrams = length(text) - (k - 1)
    val grams = transform(sequence(lit(1), greatest(nGrams, lit(1))),
      i => md5(substring_index_safe(text, i, k)))
    val nWindows = size(grams) - (w - 1)
    val mins = transform(sequence(lit(1), greatest(nWindows, lit(1))),
      i => array_min(slice(grams, i, least(lit(w), size(grams)))))
    df.select(col(idCol), explode(array_distinct(mins)).as("fingerprint"))
      .distinct()
  }

  // substring(text, i, k) with a Column start index (builtin substring only
  // takes literal ints; substr(Column, Column, Column) is the general form).
  private def substring_index_safe(text: Column, i: Column, k: Int): Column =
    text.substr(i, lit(k))
}
