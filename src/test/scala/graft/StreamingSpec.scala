package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

import graft.core.Tables
import graft.streaming.EventsStreaming

case class Ev(user_id: Long, event_id: Long, us: Long)
case class UserSessions(user_id: Long, n_sessions: Int,
                        max_session_events: Long, n_events: Long)

/** Streaming semantics: the streaming windowed agg must equal the batch
  * computation of the same transform, and flatMapGroupsWithState
  * sessionization must equal the batch lag/cumsum sessionization.
  */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  test("streaming windowed agg == batch windowed agg on the same data") {
    val streamed = EventsStreaming.runWindowedAggAvailableNow(spark, sf())
      .orderBy("window_start", "event_type").collect().toSeq
    val batch = EventsStreaming.windowedAgg(Tables.load(spark, sf(), "events"))
      .orderBy("window_start", "event_type").collect().toSeq
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("append-mode windowed agg == batch agg over closed windows only") {
    val streamed = EventsStreaming.runWindowedAggAppend(spark, sf(),
        tmpDir("graft-append-out"), tmpDir("graft-append-ck"))
      .orderBy("window_start", "event_type").collect().toSeq
    val events = Tables.load(spark, sf(), "events")
    val cutoffMs = EventsStreaming.closedWindowCutoffMs(events)
    val all = EventsStreaming.windowedAgg(events)
    val closed = all
      .where(unix_millis(to_timestamp(col("window_start"))) + 300000L
        <= cutoffMs)
      .orderBy("window_start", "event_type").collect().toSeq
    assert(streamed == closed)
    // The open tail is real: the bounded replay's last windows are held
    // back by the watermark, so append emits strictly fewer than batch.
    assert(streamed.nonEmpty && streamed.size < all.count())
  }

  /** Streaming twin of sessionStats: per-user state via
    * flatMapGroupsWithState (AvailableNow → one bounded batch). */
  private def streamingSessionStats(gapMinutes: Int) = {
    val gapUs = gapMinutes.toLong * 60 * 1000000
    val events = EventsStreaming.normalizeTs(spark.readStream
        .schema(EventsStreaming.eventsFileSchema(spark, sf() + "/events.parquet"))
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf()))
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("us"))
      .as[Ev]

    val sessions = events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[List[Ev], UserSessions](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[Ev], state: GroupState[List[Ev]]) =>
          val evs = it.toList.sortBy(e => (e.us, e.event_id))
          var sessions = List.empty[Long]
          var current = 0L
          var prev = Long.MinValue
          evs.foreach { e =>
            if (prev == Long.MinValue || e.us - prev > gapUs) {
              if (current > 0) sessions ::= current
              current = 0
            }
            current += 1
            prev = e.us
          }
          if (current > 0) sessions ::= current
          Iterator.single(UserSessions(uid, sessions.size,
            sessions.max, sessions.sum))
      }

    val name = s"sessions_${System.nanoTime()}"
    val q = sessions.writeStream.outputMode("append").format("memory")
      .queryName(name).trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    spark.table(name)
  }

  test("streaming dedup suppresses replayed duplicates via keyed state") {
    // Stream the events file TWICE (two copies in one source dir) — an
    // at-least-once replay; dedup must restore exact-once counts.
    val dir = tmpDir("graft-dedup-replay")
    val src = new java.io.File(sf() + "/events.parquet")
    java.nio.file.Files.copy(src.toPath,
      new java.io.File(dir, "a.parquet").toPath)
    java.nio.file.Files.copy(src.toPath,
      new java.io.File(dir, "b.parquet").toPath)

    val stream = spark.readStream
      .schema(EventsStreaming.eventsFileSchema(spark, dir.toString))
      .parquet(dir.toString)
    val deduped = EventsStreaming.dedupStream(
      EventsStreaming.normalizeTs(stream))
    val name = s"dedup_${System.nanoTime()}"
    val q = deduped.writeStream.outputMode("append").format("memory")
      .queryName(name).trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    val exact = Tables.load(spark, sf(), "events").count()
    assert(spark.table(name).count() == exact)
    assert(spark.table(name).select("event_id").distinct().count() == exact)
  }

  test("native session_window == lag/cumsum sessionization") {
    // Spark's built-in session_window is the idiomatic form of
    // EventsStreaming.sessionize. Known semantic edge: session_window's
    // window is [start, last+gap), so an event at EXACTLY last+gap opens
    // a new session, while the lag rule (`new when gap > gapUs`) keeps
    // the tie in-session. This pin both cross-checks the custom
    // formulation against the built-in on real data and will flag the
    // first fixture that exercises the boundary tie.
    val events = Tables.load(spark, sf(), "events")
    val native = events
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"))
      .groupBy("user_id")
      .agg(count(lit(1)).cast("int").as("n_sessions"),
        max("n_events").as("max_session_events"),
        sum("n_events").as("n_events"))
      .orderBy("user_id")
      .as[UserSessions].collect().toSeq
    val custom = EventsStreaming.sessionStats(events, 30)
      .orderBy("user_id")
      .as[UserSessions].collect().toSeq
    assert(native == custom)
    assert(native.nonEmpty)
  }

  test("flatMapGroupsWithState sessionization == batch lag/cumsum") {
    val streaming = streamingSessionStats(30)
      .orderBy("user_id")
      .as[UserSessions].collect().toSeq
    val batch = EventsStreaming.sessionStats(
        Tables.load(spark, sf(), "events"), 30)
      .orderBy("user_id")
      .as[UserSessions].collect().toSeq
    assert(streaming == batch)
    assert(streaming.nonEmpty)
  }
}
