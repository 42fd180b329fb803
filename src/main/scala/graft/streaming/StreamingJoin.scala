package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Stream-STREAM joins — the one streaming shape the engine still
  * lacked (every other streaming transform here is stream-static or
  * single-input stateful). The canonical instance is the attribution
  * interval join: pair every click with the same user's purchases
  * inside the following attribution window.
  *
  * Why this shape matters at scale: a batch twin over 100 TB of events
  * re-scans BOTH sides on every schedule tick; the streaming form holds
  * only the window's worth of per-key state. Structured Streaming makes
  * that state bound PROVABLE from the query itself — an inner join with
  * (a) watermarks on both inputs and (b) a time-range join condition
  * lets the engine evict a buffered row the moment the other side's
  * watermark passes its reach (click rows age out `window` after their
  * event time, purchase rows immediately), so state is
  * O(rate × (window + lateness)), independent of stream length.
  *
  * One transform serves batch and streaming callers (the unified
  * Dataset API discipline every module here follows): the SAME
  * [[attributionPairs]] plan is the spec's batch oracle and the
  * streaming query's micro-batch body.
  */
object StreamingJoin {

  /** Click→purchase pairs per user inside `[c_ts, c_ts + windowMinutes)`
    * — an interval inner join keyed on user. Column-renaming selects
    * keep the self-join unambiguous (and, on streaming inputs, carry
    * each side's event-time watermark through the aliases). Inputs must
    * hold (user_id, event_id, ts); output is one row per qualifying
    * pair with the attribution lag in seconds. */
  def attributionPairs(clicks: DataFrame, purchases: DataFrame,
                       windowMinutes: Int): DataFrame = {
    val c = clicks.select(col("user_id").as("c_user"),
      col("event_id").as("click_id"), col("ts").as("c_ts"))
    val p = purchases.select(col("user_id").as("p_user"),
      col("event_id").as("purchase_id"), col("ts").as("p_ts"))
    c.join(p,
        col("c_user") === col("p_user") &&
          col("p_ts") >= col("c_ts") &&
          col("p_ts") < col("c_ts") +
            expr(s"INTERVAL $windowMinutes MINUTES"))
      .select(col("c_user").as("user_id"), col("click_id"),
        col("purchase_id"),
        ((unix_micros(col("p_ts")) - unix_micros(col("c_ts"))) / 1000000L)
          .cast("long").as("lag_sec"))
  }

  /** Split one normalized event stream (or batch frame) into the two
    * join inputs. Shared so the streaming runner and the batch twin
    * select identically. */
  def sides(events: DataFrame): (DataFrame, DataFrame) =
    (events.where(col("event_type") === "click"),
      events.where(col("event_type") === "purchase"))

  /** The batch twin: same split, same join plan, over a batch frame. */
  def attributionBatch(events: DataFrame, windowMinutes: Int): DataFrame = {
    val (c, p) = sides(events)
    attributionPairs(c, p, windowMinutes)
  }

  /** LEFT OUTER attribution: every click, paired with its in-window
    * purchases or surfaced once with NULLs — the conversion-funnel
    * shape (unconverted clicks are the interesting rows). On streaming
    * inputs the null row for an unmatched click is emitted when the
    * watermark closes its window (the engine must KNOW no purchase can
    * still arrive), so a bounded replay leaves the final
    * `delay + window` of clicks unemitted — the same closed-tail
    * convention as the append-mode windowed agg (q82), pinned by
    * [[closedClickCutoffMs]]. Matched pairs emit eagerly, exactly as
    * in the inner form. */
  def attributionLeftOuter(clicks: DataFrame, purchases: DataFrame,
                           windowMinutes: Int): DataFrame = {
    val c = clicks.select(col("user_id").as("c_user"),
      col("event_id").as("click_id"), col("ts").as("c_ts"))
    val p = purchases.select(col("user_id").as("p_user"),
      col("event_id").as("purchase_id"), col("ts").as("p_ts"))
    c.join(p,
        col("c_user") === col("p_user") &&
          col("p_ts") >= col("c_ts") &&
          col("p_ts") < col("c_ts") +
            expr(s"INTERVAL $windowMinutes MINUTES"),
        "left_outer")
      .select(col("c_user").as("user_id"), col("click_id"),
        col("purchase_id"),
        ((unix_micros(col("p_ts")) - unix_micros(col("c_ts"))) / 1000000L)
          .cast("long").as("lag_sec"))
  }

  /** The click-closure cutoff a bounded outer-join replay implies: a
    * click's null row can only have been emitted if the final
    * watermark passed the end of its attribution window. The final
    * watermark is NOT max(ts) − delay: each side's watermark node sees
    * only ITS OWN filtered rows, and the global watermark is the MIN
    * across nodes (Spark's default multipleWatermarkPolicy), so the
    * cutoff keys off min(max click ts, max purchase ts) at ms
    * granularity — StreamingJoinSpec caught the difference on real
    * data (the sides' maxima differ by hours). Exposed so the batch
    * twin and the DuckDB oracle name the same emitted subset. */
  def closedClickCutoffMs(events: DataFrame, delayMs: Long,
                          windowMinutes: Int): Long = {
    val (c, p) = sides(events)
    // An EMPTY side leaves max(ts) NULL: its watermark node never
    // advances past the epoch, so the global MIN watermark closes no
    // click at all — the degenerate replay emits matches only (and
    // with no clicks, nothing). Long.MinValue is exactly that cutoff;
    // an unguarded getLong would NPE on the null aggregate instead.
    val sideMax = Seq(c, p).map { side =>
      val r = side.agg(max(unix_millis(col("ts")))).head
      if (r.isNullAt(0)) Long.MinValue else r.getLong(0)
    }
    if (sideMax.contains(Long.MinValue)) Long.MinValue
    else sideMax.min - delayMs - windowMinutes.toLong * 60000L
  }

  /** Batch twin of the streamed left-outer attribution under a bounded
    * replay: all matched pairs (they emit eagerly) plus null rows for
    * exactly the closed unmatched clicks — c_ts STRICTLY before the
    * cutoff: the engine flushes a click only when the watermark moves
    * strictly past its window end (a boundary click, or one with
    * sub-millisecond event time past the ms-truncated watermark, stays
    * buffered; StreamingJoinSpec caught the off-by-one empirically). */
  def attributionOuterBatch(events: DataFrame, windowMinutes: Int,
                            delayMs: Long): DataFrame = {
    val (cl, pu) = sides(events)
    val cutoffMs = closedClickCutoffMs(events, delayMs, windowMinutes)
    val c = cl.select(col("user_id").as("c_user"),
      col("event_id").as("click_id"), col("ts").as("c_ts"))
    val p = pu.select(col("user_id").as("p_user"),
      col("event_id").as("purchase_id"), col("ts").as("p_ts"))
    c.join(p,
        col("c_user") === col("p_user") &&
          col("p_ts") >= col("c_ts") &&
          col("p_ts") < col("c_ts") +
            expr(s"INTERVAL $windowMinutes MINUTES"),
        "left_outer")
      .where(col("purchase_id").isNotNull ||
        unix_millis(col("c_ts")) < cutoffMs)
      .select(col("c_user").as("user_id"), col("click_id"),
        col("purchase_id"),
        ((unix_micros(col("p_ts")) - unix_micros(col("c_ts"))) / 1000000L)
          .cast("long").as("lag_sec"))
  }

  /** Drive the attribution join as a real stream-stream query: ONE
    * file-source stream over the events parquet, split into two
    * watermarked sides, interval-inner-joined, append mode into a
    * memory sink under Trigger.AvailableNow.
    *
    * `delay` is the lateness budget: with a delay covering the replay's
    * disorder, the streamed result is BIT-IDENTICAL to
    * [[attributionBatch]] (inner joins emit eagerly; the watermark only
    * governs state eviction, so nothing is lost while every row's match
    * can still arrive). A tight delay trades completeness for state —
    * StreamingJoinSpec pins both regimes. State-store partition count
    * is fixed at stream start, sized down for a bounded replay exactly
    * like EventsStreaming's aggregations. */
  def runAttributionAvailableNow(spark: SparkSession, sfDir: String,
                                 windowMinutes: Int = 30,
                                 delay: String = "2 hours",
                                 statePartitions: Int = 4): DataFrame = {
    val stream = spark.readStream
      .schema(EventsStreaming.eventsFileSchema(spark,
        s"$sfDir/events.parquet"))
      .option("pathGlobFilter", "events.parquet")
      .parquet(sfDir)
    val ev = EventsStreaming.normalizeTs(stream)
    val (clicks, purchases) = sides(ev)
    val joined = attributionPairs(
      clicks.withWatermark("ts", delay),
      purchases.withWatermark("ts", delay), windowMinutes)
    val name = s"events_attrib_${System.nanoTime()}"
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(key)
    spark.conf.set(key, statePartitions.toString)
    try {
      val q = joined.writeStream
        .outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    } finally spark.conf.set(key, prev)
    spark.table(name)
  }

  /** [[runAttributionAvailableNow]]'s left-outer twin. `delay` must be
    * parseable to milliseconds for the closed-click contract; see
    * [[attributionOuterBatch]] for the subset a bounded replay emits.
    * AvailableNow runs trailing no-data batches after the last data
    * batch, which is what advances the watermark one final time and
    * flushes the closed unmatched clicks' null rows. */
  def runAttributionOuterAvailableNow(spark: SparkSession, sfDir: String,
                                      windowMinutes: Int = 30,
                                      delay: String = "10 minutes",
                                      statePartitions: Int = 4): DataFrame = {
    val stream = spark.readStream
      .schema(EventsStreaming.eventsFileSchema(spark,
        s"$sfDir/events.parquet"))
      .option("pathGlobFilter", "events.parquet")
      .parquet(sfDir)
    val ev = EventsStreaming.normalizeTs(stream)
    val (clicks, purchases) = sides(ev)
    val joined = attributionLeftOuter(
      clicks.withWatermark("ts", delay),
      purchases.withWatermark("ts", delay), windowMinutes)
    val name = s"events_attrib_outer_${System.nanoTime()}"
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(key)
    spark.conf.set(key, statePartitions.toString)
    try {
      val q = joined.writeStream
        .outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    } finally spark.conf.set(key, prev)
    spark.table(name)
  }
}
