package graft.flatten

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.registry.EndpointConfig

/** T7+T8+T9: raw page → typed core rows.
  *
  * Reference (/root/reference/etl/core_io.py:57-90 and the notebook's
  * `jsonb_array_elements` LATERAL flatten): each raw page's payload — a JSON
  * array of flat objects — expands to one row per record; records missing a
  * `year` inherit the page row's year (core_io.py:86-90, applied
  * unconditionally per SURVEY §3 EP2); each record is then alias-coalesced,
  * sentinel-cleaned, and safe-cast via the registry mapper.
  *
  * Records parse as MAP<STRING,STRING> (not a fixed struct) because source
  * field names drift across years — the registry's alias lists do the
  * resolution. `from_json` yields NULL for malformed payloads; those pages
  * drop out (counted by the runner as skipped, core_io.py:82-84 contract).
  *
  * Scale: explode is narrow (no shuffle); the mapper is one `select` of
  * codegen'd expressions. Ordered flatten (page order preserved,
  * core_io.py:70-72) uses posexplode + (year, page_number, pos) sort only
  * when the caller asks — ordering is meaningless for the core upsert.
  */
object PayloadExplode {

  private val recordsType = ArrayType(MapType(StringType, StringType))

  /** Explode pages into raw record maps, keeping page provenance columns. */
  def records(pages: DataFrame, ordered: Boolean = false): DataFrame = {
    val exploded = pages
      .withColumn("__records", from_json(col("payload"), recordsType))
      .where(col("__records").isNotNull)
      .select(col("year").as("__page_year"), col("page_number"),
        posexplode(col("__records")).as(Seq("__pos", "record")))
    if (ordered) exploded.orderBy("__page_year", "page_number", "__pos")
    else exploded
  }

  /** Full flatten+map: pages → typed rows matching `endpoint.schema`.
    * With `withOrder=true`, appends `__page_number`/`__pos` provenance so
    * callers can reproduce the reference's record-order semantics
    * (executemany applies batch rows in order — the LAST record with a
    * given PK wins, core_io.py:146-153).
    *
    * The mapper is the native [[graft.expressions.MapRegistryRecord]]
    * expression: one map traversal per record and a codegen footprint that
    * keeps the stage inside whole-stage codegen (the composed-builtins
    * form, kept as [[toCoreViaColumns]] for cross-checking, overflows
    * janino's method limit at 89 columns). */
  def toCore(pages: DataFrame, endpoint: EndpointConfig,
             withOrder: Boolean = false): DataFrame = {
    val spark = pages.sparkSession
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "map_registry_record",
      exprs => graft.expressions.MapRegistryRecord(
        exprs(0), exprs(1).eval().toString),
      "built-in")
    val recs = records(pages)
      .withColumn("__rec",
        call_function("map_registry_record", col("record"), lit(endpoint.name)))
    finish(recs, endpoint, withOrder, c => col(s"__rec.$c"))
  }

  /** Composed-builtins mapper (ColumnSpec.expr per column) — the reference
    * implementation the expression path is equivalence-tested against. */
  def toCoreViaColumns(pages: DataFrame, endpoint: EndpointConfig,
                       withOrder: Boolean = false): DataFrame = {
    val recs = records(pages)
    finishWith(recs, endpoint, withOrder,
      spec => spec.expr(col("record")))
  }

  private def finish(recs: DataFrame, endpoint: EndpointConfig,
                     withOrder: Boolean, field: String => Column): DataFrame =
    finishWith(recs, endpoint, withOrder, spec => field(spec.target).as(spec.target))

  private def finishWith(recs: DataFrame, endpoint: EndpointConfig,
                         withOrder: Boolean,
                         mapCol: graft.registry.ColumnSpec => Column): DataFrame = {
    val mapped = endpoint.columns.map { spec =>
      if (spec.target == "year")
        // T7 year backfill: record year, else the page's year.
        coalesce(mapCol(spec), col("__page_year")).as("year")
      else mapCol(spec)
    }
    val ordered =
      if (withOrder) mapped ++ Seq(col("page_number").as("__page_number"),
        col("__pos").as("__pos"))
      else mapped
    recs.select(ordered: _*)
  }
}
