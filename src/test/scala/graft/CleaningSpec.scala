package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.functions.Cleaning

/** T1–T5 semantics pinned against the reference's _is_missing/_to_* contract
  * (/root/reference/etl/mappers/directory.py:30-119) — every sentinel
  * variant, whitespace, malformed numerics, and the clean-before-coalesce
  * alias rule (FIXTURES.md §A2 checklist).
  */
class CleaningSpec extends SparkSpec {
  import spark.implicits._

  private def one(in: String, expr: org.apache.spark.sql.Column => org.apache.spark.sql.Column): Any = {
    val r = Seq(Tuple1(in)).toDF("v").select(expr(col("v")).as("r")).collect()(0)
    if (r.isNullAt(0)) null else r.get(0)
  }

  test("cleanStr: sentinels, blanks, whitespace → null; text trimmed") {
    assert(one(null, Cleaning.cleanStr) == null)
    assert(one("", Cleaning.cleanStr) == null)
    assert(one("   ", Cleaning.cleanStr) == null)
    assert(one("-1", Cleaning.cleanStr) == null)
    assert(one(" -2 ", Cleaning.cleanStr) == null)
    assert(one("-3", Cleaning.cleanStr) == null)
    assert(one(" ok ", Cleaning.cleanStr) == "ok")
    assert(one("-4", Cleaning.cleanStr) == "-4") // only the three codes
  }

  test("safeInt: reference int() strictness — '12.5' is null, not 12") {
    assert(one("42", Cleaning.safeInt) == 42)
    assert(one(" 42 ", Cleaning.safeInt) == 42)
    assert(one("+7", Cleaning.safeInt) == 7)
    assert(one("-7", Cleaning.safeInt) == -7)
    assert(one("12.5", Cleaning.safeInt) == null)
    assert(one("abc", Cleaning.safeInt) == null)
    assert(one("-1", Cleaning.safeInt) == null) // sentinel first
    assert(one("", Cleaning.safeInt) == null)
  }

  test("safeDouble: missing → null; parses decimals; malformed → null") {
    assert(one("12.34", Cleaning.safeDouble) == 12.34)
    assert(one(" -12.5 ", Cleaning.safeDouble) == -12.5)
    assert(one("-2", Cleaning.safeDouble) == null) // sentinel
    assert(one("x", Cleaning.safeDouble) == null)
  }

  test("pick: clean BEFORE coalesce — sentinel alias skipped for later data") {
    val df = Seq(("-1", "real"), ("first", "second"), (" ", " also ")).toDF("a", "b")
    val got = df.select(Cleaning.pickStr(col("a"), col("b")).as("r"))
      .collect().map(_.getString(0))
    assert(got.toSeq == Seq("real", "first", "also"))
  }

  test("property: cleaning is idempotent (200 generated samples)") {
    val gen = Gen.oneOf(Gen.alphaNumStr,
      Gen.oneOf("-1", "-2", "-3", "", "  ", "12.5", " x "))
    Gen.listOfN(200, gen).sample.get.foreach { s =>
      val once = Cleaning.cleanStrScala(s)
      val twice = Cleaning.cleanStrScala(once)
      assert(once == twice, s"not idempotent for '$s'")
    }
  }

  test("scala mirrors match column semantics") {
    for (v <- Seq("42", "12.5", "-1", " x ", "", null))
      assert(one(v, Cleaning.safeInt) == Cleaning.toIntScala(v))
  }

  test("suppression flag: -3 only (architecture.md:182 optional column)") {
    val df = Seq("-3", " -3 ", "-1", "-2", "", "42", null)
      .toDF("v")
    val got = df.select(Cleaning.suppressedFlag(col("v")).as("f"))
      .collect().map(_.getBoolean(0)).toSeq
    assert(got == Seq(true, true, false, false, false, false, false))
  }
}
