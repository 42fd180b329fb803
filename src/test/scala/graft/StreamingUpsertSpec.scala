package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.store.MergeStore
import graft.streaming.StreamingUpsert

/** The exactly-once streaming sink: arbitrary streams land in a
  * MergeStore table through applyChanges with the batch id committed
  * as an in-manifest marker (Delta's txnAppId/txnVersion idiom) — a
  * redelivered batch drops whole, restarts resume, CDC-style delete
  * rows compose with upserts in one transactional batch.
  */
class StreamingUpsertSpec extends SparkSpec {
  import spark.implicits._
  implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  test("stream lands as upserts + deletes; restart resumes; replayed batch drops") {
    val base = tmpDir("stream-upsert")
    val t = s"$base/tbl"
    val ck = s"$base/ck"
    val ms = MemoryStream[(Long, String, Boolean)]
    def run(): Unit = {
      val q = StreamingUpsert.exactlyOnce(
        ms.toDF().toDF("id", "payload", "is_delete"),
        t, pk = Seq("id"), checkpoint = ck, appId = "spec",
        deleteCol = Some("is_delete"))
      q.awaitTermination()
    }
    ms.addData((1L, "a", false), (2L, "b", false), (3L, "c", false))
    run() // batch 0: births the table
    assert(MergeStore.read(spark, t).count() == 3)
    ms.addData((2L, "b2", false), (3L, "", true), (4L, "d", false))
    run() // batch 1: update 2, delete 3, insert 4
    val got = MergeStore.read(spark, t)
      .select($"id", $"payload").as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "a", 2L -> "b2", 4L -> "d"))
    // Marker tracks the batch id inside the table's own commits.
    assert(MergeStore.markerValue(t, "stream.spec").contains("1"))
    // Manual redelivery of batch 1 (crash-between-commit-and-checkpoint
    // shape): the guard drops it whole — no commit, no double-apply.
    val v = MergeStore.version(t).get
    val st = MergeStore.applyChanges(spark, t,
      upserts = Seq((2L, "b2")).toDF("id", "payload"),
      deleteKeys = Seq(3L).toDF("id"), pk = Seq("id"),
      meta = Map("stream.spec" -> "1"),
      guard = Some(MergeStore.MarkerGuard("stream.spec", 1L,
        expected = Some(0L))))
    assert(st.skippedReplay && MergeStore.version(t).contains(v))
    // An empty catch-up run is a clean no-op.
    run()
    assert(MergeStore.read(spark, t).count() == 3)
  }

  test("constraints gate the streaming sink too") {
    val base = tmpDir("stream-upsert-con")
    val t = s"$base/tbl"
    val ms = MemoryStream[(Long, String)]
    ms.addData((1L, "ok"))
    val q0 = StreamingUpsert.exactlyOnce(ms.toDF().toDF("id", "payload"),
      t, pk = Seq("id"), checkpoint = s"$base/ck0", appId = "con")
    q0.awaitTermination()
    MergeStore.addConstraint(spark, t, "nonempty", "length(payload) > 0")
    ms.addData((2L, ""))
    val q1 = StreamingUpsert.exactlyOnce(ms.toDF().toDF("id", "payload"),
      t, pk = Seq("id"), checkpoint = s"$base/ck0", appId = "con")
    val failed =
      try { q1.awaitTermination(); false }
      catch { case e: org.apache.spark.sql.streaming.StreamingQueryException =>
        e.getMessage.contains("nonempty") ||
          Option(e.getCause).exists(_.getMessage.contains("nonempty")) }
    assert(failed, "violating batch must fail the stream loudly")
    assert(MergeStore.read(spark, t).count() == 1) // nothing landed
  }

  test("toTable: the sink spelled with a catalog name; graft.pk supplies the keys; exactly-once intact") {
    val base = tmpDir("stream-upsert-table")
    val t = s"$base/tbl"
    // Declared AS SQL policy: the sink reads the key from the table.
    MergeStore.create(t, org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("payload",
        org.apache.spark.sql.types.StringType))), pk = Seq("id"))
    graft.store.GraftCatalog.register("updb.sink", t)
    val ms = MemoryStream[(Long, String)]
    def run(): Unit = {
      val q = StreamingUpsert.toTable(ms.toDF().toDF("id", "payload"),
        "updb.sink", checkpoint = s"$base/ck", appId = "spec-table")
      q.awaitTermination()
    }
    ms.addData((1L, "a"), (2L, "b"))
    run() // batch 0
    ms.addData((2L, "b2"), (3L, "c"))
    run() // batch 1
    val got = MergeStore.read(spark, t)
      .select($"id", $"payload").as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "a", 2L -> "b2", 3L -> "c"))
    // Same txn markers as the path route — replay still drops.
    assert(MergeStore.markerValue(t, "stream.spec-table").contains("1"))
    run() // empty catch-up: clean no-op
    assert(MergeStore.read(spark, t).count() == 3)
    // Without pk anywhere, the refusal is loud and names the fix.
    val t2 = s"$base/tbl2"
    graft.store.GraftCatalog.register("updb.sink2", t2)
    val e = intercept[IllegalArgumentException] {
      StreamingUpsert.toTable(ms.toDF().toDF("id", "payload"),
        "updb.sink2", checkpoint = s"$base/ck2")
    }
    assert(e.getMessage.contains("graft.pk"))
    graft.store.GraftCatalog.unregister("updb.sink")
    graft.store.GraftCatalog.unregister("updb.sink2")
  }

  test("optimizeSmallFiles triggers by live small-file count, no cadence tuning") {
    val base = tmpDir("stream-opt-count")
    val t = s"$base/tbl"
    val ms = MemoryStream[(Long, String)]
    def run(): Unit = {
      val q = StreamingUpsert.exactlyOnce(ms.toDF().toDF("id", "payload"),
        t, pk = Seq("id"), checkpoint = s"$base/ck", appId = "optc",
        initFiles = 1,
        optimizeSmallFiles = 4, optimizeSmallBytes = 1L << 20)
      q.awaitTermination()
    }
    // Bursty one-row batches: the pass fires whenever the manifest
    // says >= 4 small files live — no optimizeEvery to mis-tune.
    (0 until 10).foreach { i => ms.addData((200L + i, s"p-$i")); run() }
    assert(MergeStore.read(spark, t).count() == 10)
    assert(MergeStore.liveFiles(t).size <= 4,
      s"count-triggered optimize must bound the file count, got " +
        s"${MergeStore.liveFiles(t).size}")
    assert(MergeStore.markerValue(t, "stream.optc").contains("9"))
  }

  test("optimizeEvery bounds the trickle sink's file count; invisible to marker and feed") {
    val base = tmpDir("stream-opt")
    val t = s"$base/tbl"
    val ms = MemoryStream[(Long, String, Boolean)]
    def run(): Unit = {
      val q = StreamingUpsert.exactlyOnce(
        ms.toDF().toDF("id", "payload", "is_delete"),
        t, pk = Seq("id"), checkpoint = s"$base/ck", appId = "opt",
        deleteCol = Some("is_delete"), initFiles = 1,
        optimizeEvery = 4, optimizeSmallBytes = 1L << 20)
      q.awaitTermination()
    }
    // 12 one-row batches: without maintenance the live set grows a file
    // per batch; every 4th batch bin-packs the small tail.
    (0 until 12).foreach { i =>
      ms.addData((100L + i, s"p-$i", false)); run()
    }
    assert(MergeStore.read(spark, t).count() == 12)
    assert(MergeStore.liveFiles(t).size <= 4,
      s"auto-optimize must bound the file count, got " +
        s"${MergeStore.liveFiles(t).size}")
    // The batch marker survives the interleaved maintenance commits.
    assert(MergeStore.markerValue(t, "stream.opt").contains("11"))
    // The post-birth history nets to exactly the 11 later inserts
    // (the span (0, head] excludes v0's init content): maintenance
    // commits are invisible to the change feed.
    val feed = MergeStore.changes(spark, t, 0,
      MergeStore.version(t).get, pk = Seq("id"))
    assert(feed.where(col("_change_type") === "insert").count() == 11)
    assert(feed.where(col("_change_type") =!= "insert").count() == 0)
  }
}
