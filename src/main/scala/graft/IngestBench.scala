package graft

import com.fasterxml.jackson.databind.ObjectMapper

import graft.core.{GraftSession, Settings}
import graft.registry.Registry
import graft.run.Runner
import graft.store.{CoreStore, RawStore}

/** Ingest-throughput benchmark against the reference's only published
  * performance numbers (BASELINE.md): raw page writes at ~8-12k records/s
  * and row-wise core upserts batched 1,000/execute on Postgres.
  *
  * Generates N synthetic Directory-shaped records driver-side (like the
  * API fetch would), then times EP1 (chunk+hash+raw write) and EP2
  * (explode+map+PK upsert). Usage: runMain graft.IngestBench [nRecords]
  */
object IngestBench {

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(100000)
    val spark = GraftSession.local()
    val root = java.nio.file.Files.createTempDirectory("graft-ingestbench").toString
    val settings = Settings(apiBase = "https://bench.local/api", warehouseRoot = root)
    val endpoint = Registry.directory

    val mapper = new ObjectMapper()
    val arr = mapper.createArrayNode()
    val rnd = new scala.util.Random(42)
    (0 until n).foreach { i =>
      val o = mapper.createObjectNode()
      o.put("unitid", 100000 + i)
      o.put("year", 2020)
      o.put("inst_name", s"Institution $i")
      o.put("city", s"City${i % 1000}")
      o.put("state_abbr", Seq("AL", "CA", "NY", "TX", "-1")(i % 5))
      o.put("sector", (i % 12) - 1) // includes sentinel -1
      o.put("latitude", 30.0 + rnd.nextDouble() * 10)
      o.put("longitude", -100.0 + rnd.nextDouble() * 20)
      o.put("hbcu", i % 2)
      o.put("degree_granting", if (i % 7 == 0) "12.5" else "1") // malformed
      arr.add(o)
    }
    val recordsJson = mapper.writeValueAsString(arr)

    val t0 = System.nanoTime()
    val rows = Runner.buildPageRows(endpoint, settings, 2020, recordsJson)
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, math.max(1, rows.size / 16)),
      Runner.rawPageSchema)
    RawStore.upsertPages(spark, df, root, endpoint.name)
    val tRaw = (System.nanoTime() - t0) / 1e9

    val t1 = System.nanoTime()
    Runner.loadCoreFromRaw(spark, endpoint, settings)
    val tCore = (System.nanoTime() - t1) / 1e9
    val coreRows = CoreStore.read(spark, root, endpoint.name).count()

    println(f"""{"metric":"ingest","records":$n,"raw_sec":$tRaw%.2f,"raw_rec_per_sec":${n / tRaw}%.0f,"core_sec":$tCore%.2f,"core_rec_per_sec":${n / tCore}%.0f,"core_rows":$coreRows}""")
    spark.stop()
  }
}
