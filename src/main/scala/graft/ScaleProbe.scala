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
      docs.unpersist()
      println(s"""{"metric":"scaleprobe","multiple":$m,"docs":$n,""" +
        s""""winnow_sec":${f"$tWinnow%.2f"},"shingle_sec":${f"$tShingle%.2f"},""" +
        s""""exact_dedup_sec":${f"$tExact%.2f"},"minhash_sig_sec":${f"$tSig%.2f"}}""")
    }
    spark.stop()
  }
}
