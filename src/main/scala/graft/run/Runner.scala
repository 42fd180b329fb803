package graft.run

import java.sql.Timestamp
import java.time.Instant

import com.fasterxml.jackson.databind.ObjectMapper

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import graft.core.Settings
import graft.flatten.PayloadExplode
import graft.functions.Hashing
import graft.registry.EndpointConfig
import graft.sources.HttpPagedSource
import graft.sources.HttpPagedSource.Transport
import graft.store.{CoreSink, CoreStore, LineageLog, MergeStore, RawStore}

/** The orchestration layer the reference documents but never ships
  * (`etl/runner.py`, /root/reference/architecture.md:123 [doc-only]; actual
  * orchestration lives in notebooks 10/20). One call drives EP1 → EP2:
  *
  *   fetch(year) → chunk into pages of rawPageSize → canonical-sha1 +
  *   provenance → RawStore hash-guarded upsert → PayloadExplode + registry
  *   mapper → CoreStore PK upsert → lineage (load_log + source_trace).
  *
  * Reruns are idempotent end-to-end: unchanged years rewrite nothing in raw
  * (hash guard) and upsert identical rows in core (P3 contract).
  */
object Runner {

  private val mapper = new ObjectMapper()

  val rawPageSchema: StructType = StructType(Seq(
    StructField("year", IntegerType, nullable = false),
    StructField("page_number", IntegerType, nullable = false),
    StructField("source_url", StringType, nullable = false),
    StructField("source_hash", StringType, nullable = false),
    StructField("ingested_at", TimestampType, nullable = false),
    StructField("record_count", IntegerType, nullable = false),
    StructField("payload", StringType, nullable = false)))

  /** EP1 driver side: fetched records → page rows (chunking + hashing +
    * provenance, raw_io.py:159-178). 1-based page numbers; source_url
    * synthesized per page (raw_io.py:173). */
  def buildPageRows(endpoint: EndpointConfig, settings: Settings, year: Int,
                    recordsJson: String,
                    now: Instant = Instant.now()): Seq[Row] = {
    val all = mapper.readTree(recordsJson)
    require(all.isArray, s"records payload must be a JSON array")
    val nodes = (0 until all.size()).map(all.get)
    val ts = Timestamp.from(now)
    nodes.grouped(settings.rawPageSize).zipWithIndex.map { case (chunk, idx) =>
      val arr = mapper.createArrayNode()
      chunk.foreach(n => { arr.add(n); () })
      val payload = mapper.writeValueAsString(arr)
      val pageNo = idx + 1
      val url = HttpPagedSource.endpointUrl(
        settings.apiBase, endpoint.path, year) + s"?page=$pageNo"
      Row(year, pageNo, url, Hashing.canonicalSha1String(payload), ts,
        chunk.size, payload)
    }.toSeq
  }

  /** EP1: fetch one year and upsert its pages into the raw store.
    * Returns the number of pages written (changed or new). */
  def loadRawYear(spark: SparkSession, endpoint: EndpointConfig,
                  settings: Settings, transport: Transport, year: Int): Long = {
    val pages = HttpPagedSource.fetchYearPages(
      transport, settings, endpoint.path, year)
    val records = HttpPagedSource.concatRecords(pages)
    val rows = buildPageRows(endpoint, settings, year, records)
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, math.max(1, rows.size / 16)),
      rawPageSchema)
    RawStore.upsertPages(spark, df, settings.warehouseRoot, endpoint.name)
  }

  /** EP2: raw pages (optionally filtered to years) → typed core upsert.
    * Page/record positions order the batch so intra-batch PK duplicates
    * resolve last-record-wins, exactly like the reference's in-order
    * executemany (core_io.py:146-153). Returns (inserted, updated).
    *
    * `sink` selects the write path: [[CoreSink.Partition]] rewrites the
    * touched year partitions (the reference's unit); [[CoreSink.Merge]]
    * runs the file-granular copy-on-write [[MergeStore]] — same rows,
    * same idempotence contract, O(files-with-matched-keys) write
    * amplification instead of O(touched-years). */
  def loadCoreFromRaw(spark: SparkSession, endpoint: EndpointConfig,
                      settings: Settings, years: Seq[Int] = Nil,
                      sink: CoreSink = CoreSink.Partition): (Long, Long) = {
    val raw = RawStore.read(spark, settings.warehouseRoot, endpoint.name, years)
    val typed = PayloadExplode.toCore(raw, endpoint, withOrder = true)
    sink match {
      case CoreSink.Partition =>
        CoreStore.upsert(spark, typed, settings.warehouseRoot, endpoint,
          intraBatchOrder = Seq("__page_number", "__pos"))
      case CoreSink.Merge =>
        // Range-cluster year-first then the rest of the PK, so each file
        // owns a contiguous (year, key) slice: a key-local batch touches
        // few files, and year filters prune on parquet min/max.
        MergeStore.upsert(spark, typed,
          CoreStore.path(settings.warehouseRoot, endpoint.name),
          endpoint.primaryKey, endpoint.columns.map(_.target),
          ordCols = Seq("__page_number", "__pos"),
          clusterBy = "year" +: endpoint.primaryKey.filterNot(_ == "year"))
    }
  }

  /** Full pipeline for a year range, with lineage. */
  def loadEndpointYears(spark: SparkSession, endpoint: EndpointConfig,
                        settings: Settings, transport: Transport,
                        yearStart: Int, yearEnd: Int,
                        sink: CoreSink = CoreSink.Partition): LineageLog.LoadLogEntry = {
    val started = Timestamp.from(Instant.now())
    val loadId = started.getTime
    val years = yearStart to yearEnd
    years.foreach(y => loadRawYear(spark, endpoint, settings, transport, y))
    val (ins, upd) = loadCoreFromRaw(spark, endpoint, settings, years, sink)

    // Row-level provenance: one trace row per raw page of this run's years.
    val trace = RawStore.read(spark, settings.warehouseRoot, endpoint.name, years)
      .selectExpr(s"$loadId AS load_id", s"'${endpoint.name}' AS endpoint",
        "year", "source_url", "source_hash", "ingested_at")
    LineageLog.appendSourceTrace(spark, settings.warehouseRoot, trace)

    val entry = LineageLog.LoadLogEntry(
      loadId, endpoint.name, yearStart, yearEnd, ins, upd,
      started, Timestamp.from(Instant.now()), "succeeded")
    LineageLog.appendLoadLog(spark, settings.warehouseRoot, entry)
    entry
  }

  /** S10: doctor / env-check (db.py:107-132, 00_env_check.ipynb) — smoke
    * probes of session, warehouse layout, and store readability. */
  def doctor(spark: SparkSession, settings: Settings): Seq[(String, String)] = {
    val checks = Seq.newBuilder[(String, String)]
    checks += ("spark" -> spark.version)
    checks += ("select1" -> spark.sql("SELECT 1").collect().head.getInt(0).toString)
    Seq("raw", "core", "meta").foreach { layer =>
      val dir = new java.io.File(s"${settings.warehouseRoot}/$layer")
      checks += (s"layer/$layer" -> (if (dir.exists()) "present" else "absent"))
    }
    checks.result()
  }
}
