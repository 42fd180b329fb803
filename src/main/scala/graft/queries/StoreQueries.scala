package graft.queries

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.store.MergeStore

/** MergeStore's record-level verbs under the driver's DuckDB gate: the
  * compliance DELETE (key + predicate forms) and the typed change feed.
  * Each query materializes a small COW table from `documents`, runs the
  * verb sequence, and reads the result back — the oracle replays the same
  * relational algebra (anti-joins, unions) over the source table, so a
  * wrong rewrite (resurrected row, lost survivor, misclassified change)
  * breaks the hash match. Scale behavior (file-granular rewrites, CAS
  * commits, OCC races, vacuum) is pinned in MergeStoreSpec; these queries
  * pin the VISIBLE semantics.
  */
object StoreQueries extends QueryFamily {

  /** One prepared table per (sf dir, tag), built on first use — the q89
    * convention: repeated bench passes measure the READ of the verb's
    * result, not a per-invocation table rebuild, and nothing leaks a
    * table copy per pass. The verb sequences below are deterministic, so
    * first-pass and later-pass results are identical. */
  private val tableCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def preparedTable(s: org.apache.spark.sql.SparkSession,
                            dir: String, tag: String)
                           (mutate: String => Unit): String =
    tableCache.computeIfAbsent(s"$dir#$tag", _ => {
      val target = java.nio.file.Files
        .createTempDirectory(s"graft-$tag").toString + "/tbl"
      MergeStore.init(s,
        Tables.load(s, dir, "documents").select(col("doc_id"), col("text")),
        target, numFiles = 8, clusterBy = Seq("doc_id"))
      mutate(target)
      target
    })

  private val q91 = QueryDef(
    "q91_merge_delete",
    "MergeStore DELETE, both forms, against a COW table built from " +
      "documents: delete(keys) removes every doc_id % 17 == 0, then " +
      "deleteWhere removes length(text) > 400 — file-granular rewrites " +
      "with manifest CAS commits under the hood. The read-back must " +
      "equal the source minus both removal sets (SQL DELETE semantics: " +
      "predicate TRUE dies, FALSE/NULL survives).",
    (s, dir) => {
      val target = preparedTable(s, dir, "q91") { t =>
        MergeStore.delete(s, t,
          Tables.load(s, dir, "documents")
            .where(col("doc_id") % 17 === 0).select(col("doc_id")),
          pk = Seq("doc_id"))
        MergeStore.deleteWhere(s, t, length(col("text")) > 400)
      }
      MergeStore.read(s, target)
        .select(col("doc_id"), length(col("text")).as("len"))
        .orderBy("doc_id")
    },
    Some("""
      SELECT doc_id, CAST(length(text) AS INTEGER) AS len
      FROM documents
      WHERE doc_id % 17 <> 0 AND NOT (length(text) > 400)
      ORDER BY doc_id"""))

  private val q92 = QueryDef(
    "q92_change_feed",
    "MergeStore typed change feed across three versions: v0 = documents, " +
      "v1 merges updates (doc_id % 13 == 0, text || ' v2') plus inserts " +
      "(doc_id + 1000000), v2 deletes doc_id % 29 == 0 (not updated " +
      "keys). changes(0, 2) must emit exactly the inserts, the update " +
      "POST-images, and the delete PRE-images, tagged — files common to " +
      "both manifests are never scanned, and a pure compaction would " +
      "emit nothing (content-diffed post-images).",
    (s, dir) => {
      val target = preparedTable(s, dir, "q92") { t => // v0 = init
        val docs = Tables.load(s, dir, "documents")
        val updates = docs.where(col("doc_id") % 13 === 0)
          .select(col("doc_id"), concat(col("text"), lit(" v2")).as("text"))
        val inserts = docs.where(col("doc_id") % 13 === 0)
          .select((col("doc_id") + 1000000).as("doc_id"),
            concat(lit("ins-"), col("doc_id")).as("text"))
        MergeStore.merge(s, updates.unionByName(inserts), t,
          pk = Seq("doc_id")) // v1
        MergeStore.delete(s, t,
          docs.where(col("doc_id") % 29 === 0 && col("doc_id") % 13 =!= 0)
            .select(col("doc_id")),
          pk = Seq("doc_id")) // v2
      }
      MergeStore.changes(s, target, 0, 2, pk = Seq("doc_id"))
        .select(col("doc_id"), col("_change_type"),
          length(col("text")).as("len"))
        .orderBy("doc_id", "_change_type")
    },
    Some("""
      SELECT doc_id, _change_type, len FROM (
        SELECT doc_id + 1000000 AS doc_id, 'insert' AS _change_type,
               CAST(length('ins-' || doc_id) AS INTEGER) AS len
        FROM documents WHERE doc_id % 13 = 0
        UNION ALL
        SELECT doc_id, 'update_postimage',
               CAST(length(text || ' v2') AS INTEGER)
        FROM documents WHERE doc_id % 13 = 0
        UNION ALL
        SELECT doc_id, 'delete', CAST(length(text) AS INTEGER)
        FROM documents WHERE doc_id % 29 = 0 AND doc_id % 13 <> 0)
      ORDER BY doc_id, _change_type"""))

  override val defs: Seq[QueryDef] = Seq(q91, q92)
}
