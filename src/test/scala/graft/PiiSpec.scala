package graft

import org.apache.spark.sql.functions._

import graft.functions.Pii

/** PII detection/redaction contract: each pattern hits its shape and only
  * its shape, redaction order keeps nested shapes from shadowing each
  * other, and the whole pass is a single shuffle-free projection.
  */
class PiiSpec extends SparkSpec {
  import spark.implicits._

  private def redactOne(s: String): String =
    Seq(s).toDF("t").select(Pii.redact($"t").as("r")).as[String].head()

  test("each PII type redacts to its token") {
    assert(redactOne("mail bob.smith+x@corp.example.org now") ==
      "mail [EMAIL] now")
    assert(redactOne("ssn 123-45-6789 end") == "ssn [SSN] end")
    assert(redactOne("call 555-123-4567 end") == "call [PHONE] end")
    assert(redactOne("host 192.168.0.1 end") == "host [IP] end")
    assert(redactOne("clean text stays clean") == "clean text stays clean")
  }

  test("shapes do not shadow each other") {
    // SSN (3-2-4) and phone (3-3-4) are disjoint dash shapes.
    assert(redactOne("123-45-6789 and 123-456-7890") == "[SSN] and [PHONE]")
    // An email's digits/dots are consumed by the email rule first.
    assert(redactOne("u10.0.0.1@ex.com") == "[EMAIL]")
    // An IP is not half-eaten by the phone rule.
    assert(redactOne("10.0.0.1") == "[IP]")
  }

  test("counts and hasPii agree with redaction") {
    val df = Seq(
      (1L, "a@b.co and c@d.io call 555-123-4567"),
      (2L, "ip 10.1.2.3 ssn 111-22-3333"),
      (3L, "nothing here")).toDF("id", "text")
    val out = df.select(
        Seq($"id") ++ Pii.counts($"text").map { case (n, c) => c.as(n) } ++
          Seq(Pii.hasPii($"text").as("has")): _*)
      .as[(Long, Int, Int, Int, Int, Boolean)].collect().sortBy(_._1).toSeq
    assert(out == Seq(
      (1L, 2, 0, 1, 0, true),
      (2L, 0, 1, 0, 1, true),
      (3L, 0, 0, 0, 0, false)))
  }

  test("the redaction pass plans as a shuffle-free projection") {
    val df = Seq((1L, "x")).toDF("id", "text")
      .select($"id", Pii.redact($"text").as("r"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }
}
