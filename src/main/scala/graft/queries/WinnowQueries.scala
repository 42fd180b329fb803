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

  private val q52 = QueryDef(
    "q52_winnow_overlap_pairs",
    "Containment detection (the MOSS use of winnowing): doc pairs sharing " +
      ">= 50% of the smaller side's fingerprints, via an inverted " +
      "fingerprint-index self-join — catches copied/contained passages " +
      "that whole-document Jaccard dilutes. shared = #common " +
      "fingerprints, overlap = containment coefficient.",
    (s, dir) => Winnowing.overlapPairs(
        Tables.load(s, dir, "documents"), "doc_id", "text",
        k = 16, w = 8, minOverlap = 0.5)
      .orderBy("id_a", "id_b"),
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
        FROM g),
      fp AS (SELECT DISTINCT doc_id, unnest(fps) AS fingerprint FROM w),
      sizes AS (SELECT doc_id, count(*) AS n FROM fp GROUP BY doc_id),
      shared AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                        count(*) AS shared
                 FROM fp a JOIN fp b
                   ON a.fingerprint = b.fingerprint AND a.doc_id < b.doc_id
                 GROUP BY 1, 2)
      SELECT id_a, id_b, shared,
             round(shared * 1.0 / least(na.n, nb.n), 6) AS overlap
      FROM shared
      JOIN sizes na ON id_a = na.doc_id
      JOIN sizes nb ON id_b = nb.doc_id
      WHERE round(shared * 1.0 / least(na.n, nb.n), 6) >= 0.5
      ORDER BY id_a, id_b"""))

  override val defs: Seq[QueryDef] = Seq(q38, q52)
}
