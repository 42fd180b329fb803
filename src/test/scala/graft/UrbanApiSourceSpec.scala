package graft

import org.apache.spark.sql.functions._

import graft.flatten.PayloadExplode
import graft.registry.Registry
import graft.sources.UrbanApiTransports

/** DataSource V2 connector: spark.read.format("urbanapi") must plan one
  * partition per year, fetch through the registered transport, and produce
  * raw page rows identical in shape to the driver-side path.
  */
class UrbanApiSourceSpec extends SparkSpec {

  private def read(years: String) = {
    UrbanApiTransports.register("fake-dir", new FakeDirectoryApi)
    spark.read.format("urbanapi")
      .option("endpoint", "directory")
      .option("years", years)
      .option("apiBase", "https://fake.test/api/v1")
      .option("pageSize", "2")
      .option("rps", "0")
      .option("transport", "fake-dir")
      .load()
  }

  test("short name resolves; schema is the raw page schema") {
    val df = read("2010")
    assert(df.schema.fieldNames.toSeq == Seq("year", "page_number",
      "source_url", "source_hash", "ingested_at", "record_count", "payload"))
  }

  test("one input partition per year; rows match the driver-side path") {
    val df = read("2010-2011")
    assert(df.rdd.getNumPartitions == 2)
    val pages = df.select("year", "page_number", "record_count")
      .orderBy("year", "page_number")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2))).toSeq
    assert(pages == Seq((2010, 1, 2), (2010, 2, 1), (2011, 1, 2), (2011, 2, 1)))
  }

  test("connector output flows straight into PayloadExplode + registry mapper") {
    val typed = PayloadExplode.toCore(read("2011"), Registry.directory)
    val r = typed.where(col("unitid") === 100654).collect()(0)
    assert(r.getAs[String]("inst_name") == "Alabama A & M University (renamed)")
    assert(r.getAs[Int]("year") == 2011) // backfilled from page year
  }

  test("csv year list and unknown transport error") {
    assert(read("2010,2011").select("year").distinct().count() == 2)
    val e = intercept[Exception] {
      spark.read.format("urbanapi")
        .option("endpoint", "directory").option("years", "2010")
        .option("apiBase", "x").option("transport", "nope").load().count()
    }
    assert(e.getMessage != null)
  }
}
