package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Sentinel-null cleaning + alias-coalesce + safe casts.
  *
  * Reference semantics (all cited into /root/reference/):
  *   - `_is_missing` (etl/mappers/directory.py:30-52): None, empty/whitespace
  *     string, the strings "-1"/"-2"/"-3", and the numbers -1/-2/-3 are all
  *     "missing" (IPEDS codes: -1 missing, -2 N/A, -3 suppressed).
  *   - `_pick` (directory.py:55-67): first non-missing value among alias keys —
  *     cleaning happens BEFORE the coalesce, so an alias holding a sentinel is
  *     skipped in favor of a later alias holding data.
  *   - `_to_int` (directory.py:70-87): missing → null, trimmed "42" → 42,
  *     malformed ("12.5", "abc") → null, never throws. NB Python `int("12.5")`
  *     raises, while SQL `cast('12.5' as int)` = 12 — we match the reference
  *     with an integer-literal regex guard.
  *   - `_to_float` (directory.py:89-105), `_to_str` (directory.py:108-119).
  *
  * Everything here is a pure `Column => Column` over built-in functions, so it
  * stays inside whole-stage codegen — no UDFs in the cleaning hot path.
  */
object Cleaning {

  private val sentinelStrings = Seq("-1", "-2", "-3")
  private val intPattern = "^[+-]?[0-9]+$"

  /** True when a (string-typed) value is IPEDS-missing. */
  def isMissingStr(c: Column): Column = {
    val t = trim(c)
    c.isNull || t.isin(("" +: sentinelStrings): _*)
  }

  /** Missing → NULL; otherwise the trimmed string.
    * This is T1+T5: the canonical cleaner for string-typed raw fields.
    * Kept to ONE trim + ONE isin over the trimmed value: the 89-column
    * mapper instantiates this tree hundreds of times (per alias), and
    * expression-tree size is what pushes generated methods over janino's
    * limit. (null input: trim(null) is null, isin(null) is null → otherwise
    * branch yields trim(null) = null — still correct.) */
  def cleanStr(c: Column): Column = {
    val t = trim(c.cast(StringType))
    when(t.isin(("" +: sentinelStrings): _*), lit(null).cast(StringType))
      .otherwise(t)
  }

  /** Numeric-typed sentinel cleaning: value in (-1,-2,-3) → NULL. */
  def cleanNum(c: Column): Column =
    when(c.isin(-1, -2, -3), lit(null)).otherwise(c)

  /** T3: safe int cast of a raw (string) field. Missing/malformed → NULL.
    * The regex guard reproduces Python `int(...)` strictness ("12.5" → null).
    * Single-instance form: regexp_extract yields "" on no-match (and null
    * on null input) and `cast("")` is null in non-ANSI mode — so one
    * cleaned subtree serves both the guard and the value, halving the
    * mapper's int-column expression trees. */
  def safeInt(c: Column): Column = castCleanInt(cleanStr(c))

  /** Long variant of [[safeInt]] for 64-bit targets. */
  def safeLong(c: Column): Column =
    regexp_extract(cleanStr(c), intPattern, 0).cast(LongType)

  /** Int cast of an ALREADY-cleaned string (null or trimmed non-sentinel).
    * Used by the registry mapper where the pick happens before the cast. */
  private[graft] def castCleanInt(cleaned: Column): Column =
    regexp_extract(cleaned, intPattern, 0).cast(IntegerType)

  /** Double cast of an already-cleaned string. */
  private[graft] def castCleanDouble(cleaned: Column): Column =
    cleaned.cast(DoubleType)

  /** T4: safe double cast. Missing → NULL; malformed → NULL (non-ANSI cast
    * semantics already return NULL for unparseable doubles). */
  def safeDouble(c: Column): Column = cleanStr(c).cast(DoubleType)

  /** T5: safe string cast (missing → NULL, trimmed, empty-after-trim → NULL). */
  def safeStr(c: Column): Column = cleanStr(c)

  /** T2: first non-missing among alias columns — clean BEFORE coalesce so a
    * present sentinel is skipped (directory.py:55-67 contract). */
  def pickStr(cols: Column*): Column = coalesce(cols.map(cleanStr): _*)
  def pickInt(cols: Column*): Column = coalesce(cols.map(safeInt): _*)
  def pickDouble(cols: Column*): Column = coalesce(cols.map(safeDouble): _*)

  /** Optional suppression-flag column (architecture.md:182): TRUE when the
    * raw value is the `-3` ("suppressed") sentinel specifically — the
    * cleaning above folds it into NULL, and this flag preserves WHY the
    * value is null for downstream disclosure-control analysis. False for
    * every other shape, including the other sentinels. */
  def suppressedFlag(c: Column): Column =
    coalesce(trim(c.cast(StringType)) === "-3", lit(false))

  // Scala mirrors of the cleaning semantics, for the SQL-text UDF surface and
  // for driver-side (non-DataFrame) callers like the HTTP connector.
  private[graft] def missingScala(s: String): Boolean = {
    val t = if (s == null) null else s.trim
    t == null || t.isEmpty || sentinelStrings.contains(t)
  }
  private[graft] def cleanStrScala(s: String): String =
    if (missingScala(s)) null else s.trim
  private[graft] def toIntScala(s: String): Integer =
    if (missingScala(s) || !s.trim.matches(intPattern)) null
    else try Integer.valueOf(s.trim) catch { case _: NumberFormatException => null }
  private[graft] def toDoubleScala(s: String): java.lang.Double =
    if (missingScala(s)) null
    else try java.lang.Double.valueOf(s.trim) catch { case _: NumberFormatException => null }

  /** Register SQL-callable forms so `spark.sql` text queries can use the
    * cleaning, mirroring the reference's SQL-layer ergonomics. The Column API
    * above is the hot path (codegen'd); these UDFs are the convenience form. */
  def registerSql(spark: SparkSession): Unit =
    if (!spark.sessionState.functionRegistry.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier("ipeds_null"))) {
      spark.udf.register("ipeds_null", cleanStrScala _)
      spark.udf.register("ipeds_int", toIntScala _)
      spark.udf.register("ipeds_double", toDoubleScala _)
    }
}
