package graft

import org.apache.spark.sql.functions._

import graft.operators.Upsert

/** Q7/Q8 semantics: last-write-wins upsert and latest-per-key
  * (/root/reference/etl/core_io.py:107-112; architecture.md:53).
  */
class UpsertSpec extends SparkSpec {
  import spark.implicits._

  test("upsertByKey: update wins, inserts kept, untouched rows survive") {
    val base = Seq((1, "a", 1), (2, "b", 1), (3, "c", 1)).toDF("k", "v", "ver")
    val upd = Seq((2, "B", 2), (4, "d", 2)).toDF("k", "v", "ver")
    val got = Upsert.upsertByKey(base, upd, Seq("k"), Seq(col("ver")))
      .orderBy("k").select("k", "v").as[(Int, String)].collect().toSeq
    assert(got == Seq((1, "a"), (2, "B"), (3, "c"), (4, "d")))
  }

  test("upsert is idempotent: upsert(upsert(x)) == upsert(x)") {
    val base = Seq((1, "a", 1), (2, "b", 1)).toDF("k", "v", "ver")
    val upd = Seq((2, "B", 2)).toDF("k", "v", "ver")
    val once = Upsert.upsertByKey(base, upd, Seq("k"), Seq(col("ver")))
    val twice = Upsert.upsertByKey(once, upd, Seq("k"), Seq(col("ver")))
    assert(once.orderBy("k").collect().toSeq == twice.orderBy("k").collect().toSeq)
  }

  test("latestPerKey keeps the max-order row per key with all columns") {
    val df = Seq(
      (10, 2020, "old"), (10, 2023, "new"), (20, 2021, "only"))
      .toDF("unitid", "year", "tag")
    val got = Upsert.latestPerKey(df, Seq("unitid"), Seq(col("year")))
      .orderBy("unitid").as[(Int, Int, String)].collect().toSeq
    assert(got == Seq((10, 2023, "new"), (20, 2021, "only")))
  }

  test("latestPerKey tie-breaks deterministically via ord columns") {
    val df = Seq((1, 2020, 5, "lo"), (1, 2020, 9, "hi")).toDF("k", "y", "seq", "tag")
    val got = Upsert.latestPerKey(df, Seq("k"), Seq(col("y"), col("seq")))
      .select("tag").as[String].collect().toSeq
    assert(got == Seq("hi"))
  }
}
