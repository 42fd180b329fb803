package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII detection + redaction — the compliance scrub a training-data
  * pipeline runs before anything ships (emails, phone numbers, IP
  * addresses, SSN-shaped ids), and the textual counterpart of
  * [[graft.store.MergeStore.delete]]'s record-level removal.
  *
  * Everything here is `regexp_replace`/`regexp_count` over built-in
  * codegen expressions — one projection over the corpus, map-local, no
  * shuffle, no UDF. The patterns are deliberately held to the
  * intersection of Java's regex and RE2 (no backreferences, no
  * lookaround) so the DuckDB oracle replays them verbatim; that same
  * restriction is what keeps them linear-time on adversarial inputs —
  * a catastrophic-backtracking pattern is a denial-of-service against
  * a 100 TB scan.
  *
  * Redaction order matters where patterns could nest: emails first
  * (their local parts contain digits and dots), then the most specific
  * numeric shapes (SSN before phone — both dashed, different group
  * widths), IPs last.
  */
object Pii {

  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val SsnPattern = "\\b\\d{3}-\\d{2}-\\d{4}\\b"
  val PhonePattern = "\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b"
  val Ipv4Pattern = "\\b(\\d{1,3}\\.){3}\\d{1,3}\\b"

  /** The (pattern, replacement-token) pipeline, in application order. */
  val Rules: Seq[(String, String)] = Seq(
    EmailPattern -> "[EMAIL]",
    SsnPattern -> "[SSN]",
    PhonePattern -> "[PHONE]",
    Ipv4Pattern -> "[IP]")

  /** Replace every PII match with its type token, one chained codegen
    * projection. */
  def redact(c: Column): Column =
    Rules.foldLeft(c) { case (acc, (pat, tok)) =>
      regexp_replace(acc, pat, tok)
    }

  /** Per-type match counts on the raw text (for reporting / routing —
    * e.g. quarantine documents past a PII density threshold). */
  def counts(c: Column): Seq[(String, Column)] = Seq(
    "n_email" -> regexp_count(c, lit(EmailPattern)),
    "n_ssn" -> regexp_count(c, lit(SsnPattern)),
    "n_phone" -> regexp_count(c, lit(PhonePattern)),
    "n_ip" -> regexp_count(c, lit(Ipv4Pattern)))

  /** True iff the text contains any PII at all — the cheap gate form
    * (a `rlike` short-circuits; counting doesn't). */
  def hasPii(c: Column): Column =
    Rules.map { case (pat, _) => c.rlike(pat) }.reduce(_ || _)
}
