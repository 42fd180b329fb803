package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Dataset-curation primitives for training-data pipelines: deterministic
  * split assignment, PII-style redaction, and token budgeting. All pure
  * `Column` compositions (codegen'd, shuffle-free per row) with formulas
  * chosen to be expressible identically in the DuckDB oracle.
  */
object Curation {

  /** Deterministic [0, buckets) bucket from a key: first 4 hex chars of
    * md5(key as string) → int → mod. Stable across runs, engines, cluster
    * sizes, and data order — the property a train/val/test split needs
    * (re-ingesting or re-partitioning the corpus never moves a document
    * between splits). */
  def hashBucket(key: Column, buckets: Int = 100): Column =
    (conv(substring(md5(key.cast(StringType)), 1, 4), 16, 10)
      .cast(IntegerType) % buckets)

  /** Deterministic uniform in [0, 1): first 4 hex chars of md5 / 65536 —
    * an exact binary fraction, so the SAME double on every engine (no
    * rounding needed). The acceptance coin for hash-based sampling. */
  def hashUniform(key: Column): Column =
    conv(substring(md5(key.cast(StringType)), 1, 4), 16, 10)
      .cast(DoubleType) / 65536.0

  /** 90/5/5 split label from [[hashBucket]]: train < 90, val < 95, test. */
  def splitLabel(key: Column): Column = {
    val b = hashBucket(key)
    when(b < 90, "train").when(b < 95, "val").otherwise("test")
  }

  /** Deterministic per-epoch shuffle coin: the full md5 hex of
    * "epoch:key". A different epoch gives an independent permutation;
    * the same (epoch, key) gives the same coin on every engine, run,
    * and partitioning — the property a reproducible data-loader order
    * needs. Orderings should tie-break on the key itself (md5 collisions
    * are astronomically unlikely but determinism shouldn't lean on
    * that). */
  def epochCoin(key: Column, epoch: Int): Column =
    md5(concat_ws(":", lit(epoch), key.cast(StringType)))

  /** Digit runs of 3+ — the number-ish PII-redaction target. */
  val numberPattern = "[0-9]{3,}"

  /** Email-shaped tokens (simple RE2/Java-compatible form). */
  val emailPattern = "[A-Za-z0-9]+@[A-Za-z0-9]+\\.[A-Za-z]+"

  def redactNumbers(text: Column): Column =
    regexp_replace(text, numberPattern, "<NUM>")

  def numberCount(text: Column): Column =
    regexp_count(text, lit(numberPattern)).cast(IntegerType)

  def emailCount(text: Column): Column =
    regexp_count(text, lit(emailPattern)).cast(IntegerType)

  /** Dictionary-based entity scrub: whole-word occurrences of the terms
    * are replaced by `<ENTITY>` (names-list redaction — the third classic
    * PII pass alongside the number and email regexes). `\b` word
    * boundaries are RE2- and Java-regex-compatible. */
  val entityTerms: Seq[String] = Seq("customer", "supplier", "part")

  val entityPattern: String = "\\b(" + entityTerms.mkString("|") + ")\\b"

  def redactEntities(text: Column): Column =
    regexp_replace(text, entityPattern, "<ENTITY>")

  def entityCount(text: Column): Column =
    regexp_count(text, lit(entityPattern)).cast(IntegerType)
}
