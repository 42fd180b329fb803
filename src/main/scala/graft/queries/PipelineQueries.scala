package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.Tables
import graft.flatten.PayloadExplode
import graft.functions.Cleaning
import graft.ingest.Chunker

/** Driver-checkable queries exercising the IPEDS pipeline machinery itself
  * (chunk → JSON page payload → explode → alias/clean/cast) on testdata,
  * so the EP1→EP2 path has DuckDB oracles beyond the ScalaTest fixtures.
  */
object PipelineQueries extends QueryFamily {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** events → JSON pages of 500 → PayloadExplode.records → typed extraction.
    * The whole EP1/EP2 transform chain must be the identity on the record
    * set; the oracle is simply the original table. */
  private val q31 = QueryDef(
    "q31_pipeline_roundtrip",
    "T8+T9+T11 roundtrip: records serialized into raw JSON page payloads " +
      "(chunked 500/page like raw_io.py:159-178), then exploded and " +
      "re-typed via the map-based record parser — must equal the source.",
    (s, dir) => {
      val recs = t(s, dir, "events")
        .select(struct(col("event_id"), col("user_id"), col("event_type")).as("r"))
      val pages = Chunker
        .withPageNumber(recs, Seq(col("r.event_id")), 500)
        .groupBy("page_number")
        .agg(to_json(sort_array(collect_list(col("r")))).as("payload"))
        .withColumn("year", lit(2024))
      PayloadExplode.records(pages)
        .select(
          Cleaning.safeLong(element_at(col("record"), "event_id")).as("event_id"),
          Cleaning.safeLong(element_at(col("record"), "user_id")).as("user_id"),
          Cleaning.cleanStr(element_at(col("record"), "event_type")).as("event_type"))
        .orderBy("event_id")
    },
    Some("""
      SELECT event_id, user_id, event_type
      FROM events
      ORDER BY event_id"""))

  override val defs: Seq[QueryDef] = Seq(q31)
}
