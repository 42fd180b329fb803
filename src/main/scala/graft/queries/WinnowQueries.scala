package graft.queries

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.functions.Winnowing

/** Winnowing (rolling-hash) fingerprints with a full oracle: md5 k-gram
  * hashes and lexicographic window minima are engine-independent, so both
  * engines compute the identical fingerprint set.
  */
object WinnowQueries extends QueryFamily {

  private val q38 = QueryDef(
    "q38_winnow_fingerprints",
    "MOSS-style winnowing: char 16-grams hashed, min hash per window of 8 " +
      "kept — a position-robust fingerprint set per document (any shared " +
      "substring of length >= 23 guarantees a shared fingerprint).",
    (s, dir) => Winnowing.fingerprints(
        Tables.load(s, dir, "documents"), "doc_id", "text", k = 16, w = 8)
      .orderBy("doc_id", "fingerprint"),
    Some("""
      WITH g AS (
        SELECT doc_id,
               list_transform(range(1, greatest(length(text) - 15, 1) + 1),
                 i -> md5(substr(text, CAST(i AS INTEGER), 16))) AS grams
        FROM documents),
      w AS (
        SELECT doc_id,
               list_distinct(list_transform(
                 range(1, greatest(len(grams) - 7, 1) + 1),
                 i -> list_min(grams[i : i + 7]))) AS fps
        FROM g)
      SELECT DISTINCT doc_id, unnest(fps) AS fingerprint
      FROM w
      ORDER BY doc_id, fingerprint"""))

  override val defs: Seq[QueryDef] = Seq(q38)
}
