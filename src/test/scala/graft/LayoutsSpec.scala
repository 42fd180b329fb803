package graft

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.store.Layouts

/** Range clustering = data skipping: the same selective filter over the
  * same rows must read a fraction of the bytes when the layout is
  * clustered on the filter column — and return identical results.
  */
class LayoutsSpec extends SparkSpec {

  test("clustered layout skips row groups: fewer bytes, same rows") {
    val events = Tables.load(spark, sf(), "events")
      .select("event_id", "user_id", "event_type", "value")
    val dir = java.nio.file.Files.createTempDirectory("layouts").toString
    val clustered = s"$dir/clustered"
    val shuffled = s"$dir/shuffled"
    Layouts.clusteredWrite(events, clustered, Seq("user_id"), numFiles = 16)
    // Same content, random layout: shuffle on a hash so every file spans
    // the full user_id range (worst-case min/max stats).
    events.repartition(16, hash(col("event_id")))
      .write.mode("overwrite").parquet(shuffled)

    def rowsAndBytes(path: String): (Set[Long], Long) = {
      val (rows, bytes) = Layouts.measuredInputBytes(spark) {
        spark.read.parquet(path)
          .where(col("user_id") === 7L)
          .select("event_id").collect().map(_.getLong(0)).toSet
      }
      (rows, bytes)
    }
    val (rowsC, bytesC) = rowsAndBytes(clustered)
    val (rowsS, bytesS) = rowsAndBytes(shuffled)

    assert(rowsC == rowsS && rowsC.nonEmpty, "layouts must agree on content")
    assert(bytesC * 2 < bytesS,
      s"clustered scan read $bytesC bytes, shuffled $bytesS — no skipping?")
  }
}
