package graft

import org.apache.spark.sql.functions._

import graft.ingest.Chunker

/** T11: page chunking (/root/reference/etl/raw_io.py:159-178) — 1-based
  * page numbers, fixed page size, per-partition numbering.
  */
class ChunkerSpec extends SparkSpec {
  import spark.implicits._

  test("1-based pages of fixed size, remainder in last page") {
    val df = (1 to 1203).toDF("id")
    val pages = Chunker.withPageNumber(df, Seq(col("id")), 500)
      .groupBy("page_number").count().orderBy("page_number")
      .as[(Int, Long)].collect().toSeq
    assert(pages == Seq((1, 500L), (2, 500L), (3, 203L)))
  }

  test("partition-scoped numbering restarts per partition value") {
    val df = Seq.tabulate(7)(i => (2020 + i % 2, i)).toDF("year", "id")
    val pages = Chunker.withPageNumber(df, Seq(col("id")), 2, Seq("year"))
    val perYear = pages.groupBy("year").agg(max("page_number").as("maxp"))
      .orderBy("year").as[(Int, Int)].collect().toSeq
    assert(perYear == Seq((2020, 2), (2021, 2)))
  }

  test("paginate emits page rows with record_count and sorted payload") {
    val df = Seq((3, "c"), (1, "a"), (2, "b")).toDF("id", "v")
    val page = Chunker.paginate(df, Seq(col("id")), 10).collect()(0)
    assert(page.getAs[Int]("page_number") == 1)
    assert(page.getAs[Int]("record_count") == 3)
    val payload = page.getSeq[org.apache.spark.sql.Row](
      page.fieldIndex("payload"))
    assert(payload.map(_.getInt(0)) == Seq(1, 2, 3))
  }
}
