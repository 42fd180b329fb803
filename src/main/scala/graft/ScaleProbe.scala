package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{GraftSession, Tables}
import graft.functions.Winnowing
import graft.operators.Dedup

/** Scaling probe for the heavy text operators: replicates the `documents`
  * corpus N times (fresh doc_ids) and times fingerprinting / dedup at
  * growing multiples, so SCALE.md's linearity claims are measured, not
  * asserted. Usage:
  *
  *   runMain graft.ScaleProbe <sfDir> <multiple> [multiple...]
  *
  * Prints one JSON line per multiple. Replication note: near-dup pair
  * counts are NOT meaningful on replicated data (every copy is an exact
  * dup of its source) — this probe times fingerprint/shingle/signature
  * construction and exact-dedup grouping, the corpus-linear stages; the
  * pair-join stages are exercised by Bench on the real corpus.
  */
object ScaleProbe {

  private def time[A](a: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val r = a
    (r, (System.nanoTime() - t0) / 1e9)
  }

  private def replicate(docs: DataFrame, n: Int): DataFrame = {
    val total = docs.count()
    (0 until n).map { i =>
      docs.select((col("doc_id") + lit(i * total)).as("doc_id"),
        col("text"), col("lang"))
    }.reduce(_ unionByName _)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val multiples = if (args.length > 1) args.tail.map(_.toInt).toSeq else Seq(1, 10, 20)
    val spark: SparkSession = GraftSession.local(32)

    val base = Tables.load(spark, sfDir, "documents")
      .select("doc_id", "text", "lang")

    multiples.foreach { m =>
      val docs = replicate(base, m).cache()
      val n = docs.count() // materialize outside the timers

      val (_, tWinnow) = time {
        Winnowing.fingerprints(docs, "doc_id", "text").count()
      }
      val (_, tShingle) = time {
        Dedup.shingles(docs, "doc_id", "text").count()
      }
      val (_, tExact) = time {
        Dedup.exactGroups(docs, "doc_id", "text").count()
      }
      val (_, tSig) = time {
        Dedup.minhashSignatures(docs, "doc_id", "text").count()
      }
      // Cluster resolution on a synthetic chain graph (every 4 ids form a
      // 4-chain): edge count scales with the corpus, diameter stays 3 —
      // so rounds are constant and the curve isolates per-round cost.
      val (_, tCc) = time {
        val pairs = docs.select(col("doc_id").as("id_a"))
          .where(col("id_a") % 4 =!= 3)
          .select(col("id_a"), (col("id_a") + 1).as("id_b"))
        Dedup.connectedComponents(pairs, "id_a", "id_b").count()
      }
      // MERGE of a fixed 100-key batch into an m-scaled table: the scan
      // side grows with the table, the rewrite side stays bounded by the
      // batch's key spread — both visible in (time, files_rewritten).
      val mergeDir = java.nio.file.Files
        .createTempDirectory("scaleprobe-merge").toString + "/tbl"
      graft.store.MergeStore.init(spark,
        docs.select(col("doc_id").as("id"), col("text")),
        mergeDir, numFiles = 32, clusterBy = Some("id"))
      val updates = docs.select(col("doc_id").as("id"),
          concat(lit("updated "), col("text")).as("text"))
        .where(col("id") < 100)
      val (mergeStats, tMerge) = time {
        graft.store.MergeStore.merge(spark, updates, mergeDir, Seq("id"))
      }
      docs.unpersist()
      println(s"""{"metric":"scaleprobe","multiple":$m,"docs":$n,""" +
        s""""winnow_sec":${f"$tWinnow%.2f"},"shingle_sec":${f"$tShingle%.2f"},""" +
        s""""exact_dedup_sec":${f"$tExact%.2f"},"minhash_sig_sec":${f"$tSig%.2f"},""" +
        s""""cc_sec":${f"$tCc%.2f"},"merge_sec":${f"$tMerge%.2f"},""" +
        s""""merge_files_rewritten":${mergeStats.filesRewritten}}""")
    }
    spark.stop()
  }
}
