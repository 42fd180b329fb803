package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.core.Tables
import graft.streaming.{EventsStreaming, StreamingJoin}

/** Stream-stream interval join semantics: with a lateness budget
  * covering the replay's disorder the streamed attribution join equals
  * the batch twin bit-for-bit (across single- AND multi-batch
  * replays); with a zero budget and out-of-order delivery, late rows
  * are dropped — the price of the provable state bound.
  */
class StreamingJoinSpec extends SparkSpec {
  import spark.implicits._

  private val WIN = 240 // minutes; sf0.001 is sparse (16 pairs at 4 h)

  private def batchPairs: Seq[(Long, Long, Long, Long)] =
    StreamingJoin.attributionBatch(
        Tables.load(spark, sf(), "events"), WIN)
      .orderBy("user_id", "click_id", "purchase_id")
      .as[(Long, Long, Long, Long)].collect().toSeq

  test("stream-stream attribution join == batch twin (single-batch replay)") {
    val streamed = StreamingJoin.runAttributionAvailableNow(
        spark, sf(), windowMinutes = WIN)
      .orderBy("user_id", "click_id", "purchase_id")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(streamed.nonEmpty, "no attribution pairs — bad fixture window")
    assert(streamed == batchPairs)
  }

  test("left-outer stream-stream join == matched pairs + closed unmatched clicks") {
    val streamed = StreamingJoin.runAttributionOuterAvailableNow(
        spark, sf(), windowMinutes = WIN, delay = "10 minutes")
      .orderBy("user_id", "click_id", "purchase_id")
      .collect().toSeq
    val batch = StreamingJoin.attributionOuterBatch(
        Tables.load(spark, sf(), "events"), WIN, delayMs = 600000L)
      .orderBy("user_id", "click_id", "purchase_id")
      .collect().toSeq
    assert(streamed.exists(_.isNullAt(2)),
      "no unconverted clicks emitted — the outer side never flushed")
    assert(streamed == batch,
      s"${streamed.size} streamed vs ${batch.size} batch rows")
  }

  test("multi-batch in-order replay still equals the batch twin") {
    val dir = tmpDir("graft-sjoin-multi")
    val ev = Tables.load(spark, sf(), "events")
      .withColumn("__bucket", ntile(4).over(
        org.apache.spark.sql.expressions.Window.orderBy("ts")))
    (1 to 4).foreach { b =>
      val stage = tmpDir("graft-sjoin-stage")
      ev.where(col("__bucket") === b).drop("__bucket")
        .coalesce(1).write.mode("overwrite").parquet(stage)
      val part = Files.list(Paths.get(stage)).iterator()
      var src: java.nio.file.Path = null
      while (part.hasNext) {
        val p = part.next()
        if (p.getFileName.toString.endsWith(".parquet")) src = p
      }
      val dst = Paths.get(dir, f"events-$b%02d.parquet")
      Files.move(src, dst)
      // Monotone mtimes: the file source replays oldest-mtime first.
      Files.setLastModifiedTime(dst,
        java.nio.file.attribute.FileTime.fromMillis(1000000L + b * 60000L))
    }
    val stream = spark.readStream
      .schema(EventsStreaming.eventsFileSchema(spark,
        s"${sf()}/events.parquet"))
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)
    val evs = EventsStreaming.normalizeTs(stream)
    val (c, p) = StreamingJoin.sides(evs)
    // Generous lateness: a click's purchase may arrive 3 buckets later.
    val joined = StreamingJoin.attributionPairs(
      c.withWatermark("ts", "40 days"),
      p.withWatermark("ts", "40 days"), WIN)
    val name = s"sjoin_multi_${System.nanoTime()}"
    val q = joined.writeStream.outputMode("append").format("memory")
      .queryName(name).trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val streamed = spark.table(name)
      .orderBy("user_id", "click_id", "purchase_id")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(streamed == batchPairs,
      s"${streamed.size} streamed vs ${batchPairs.size} batch pairs")
  }

  test("tight watermark + out-of-order delivery drops late rows (bounded state)") {
    val dir = tmpDir("graft-sjoin-late")
    val ev = Tables.load(spark, sf(), "events")
    // Split at a KNOWN pair's purchase instant: its purchase lands in
    // phase 1, its click arrives two phases LATER. Eviction is
    // join-THEN-remove within a batch (state stored at batch N is
    // still joinable by batch N+1's inputs and only gone from N+2),
    // so a neutral middle phase — one 'view' event, which neither join
    // side admits — lets the zero-delay watermark (advanced by
    // phase 1's newer events) evict every phase-1 row before the late
    // click arrives: the straddling pair MUST be lost. Pairs entirely
    // inside one phase still join intra-batch; the loss proves
    // eviction, the subset proves no invented rows. Files are added
    // BETWEEN processAllAvailable() fences — mtime ordering is
    // filesystem-granularity-fragile; explicit fences are not.
    val lagged = batchPairs.filter(_._4 > 0)
    assert(lagged.nonEmpty, "fixture has no lagged pair to straddle")
    // Earliest-purchase lagged pair: phase 1 then carries plenty of
    // later events, pushing the watermark strictly past p_ts.
    val (probe, mid) = lagged.map { pr =>
      pr -> ev.where(col("event_id") === pr._3)
        .agg(min(unix_micros(col("ts")))).head.getLong(0)
    }.minBy(_._2)
    def dump(b: Int, part: DataFrame): Unit = {
      val stage = tmpDir("graft-sjoin-stage2")
      part.coalesce(1).write.mode("overwrite").parquet(stage)
      val files = Files.list(Paths.get(stage)).iterator()
      while (files.hasNext) {
        val f = files.next()
        if (f.getFileName.toString.endsWith(".parquet"))
          Files.move(f, Paths.get(dir, f"events-$b%02d.parquet"))
      }
    }
    dump(1, ev.where(unix_micros(col("ts")) >= mid))
    val stream = spark.readStream
      .schema(EventsStreaming.eventsFileSchema(spark,
        s"${sf()}/events.parquet"))
      .parquet(dir)
    val evs = EventsStreaming.normalizeTs(stream)
    val (c, p) = StreamingJoin.sides(evs)
    val joined = StreamingJoin.attributionPairs(
      c.withWatermark("ts", "0 seconds"),
      p.withWatermark("ts", "0 seconds"), WIN)
    val name = s"sjoin_late_${System.nanoTime()}"
    val q = joined.writeStream.outputMode("append").format("memory")
      .queryName(name).start()
    try {
      q.processAllAvailable() // phase 1: new half; WM -> stream max
      dump(2, ev.where(col("event_type") === "view")
        .orderBy(col("ts").desc).limit(1))
      q.processAllAvailable() // phase 2: neutral; phase-1 state evicts
      dump(3, ev.where(unix_micros(col("ts")) < mid))
      q.processAllAvailable() // phase 3: the late old half
    } finally q.stop()
    val streamed = spark.table(name)
      .as[(Long, Long, Long, Long)].collect().toSet
    val batch = batchPairs.toSet
    assert(streamed.subsetOf(batch),
      "late-drop regime invented pairs the batch join lacks")
    assert(!streamed.contains(probe),
      "the straddling pair survived — watermark eviction never engaged")
  }
}
