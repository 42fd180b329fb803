package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.store.MergeStore
import graft.streaming.MergeStoreCdc

/** CDC streaming contract: tailing a MergeStore table must emit exactly
  * the per-commit typed change feed — same rows as the batch
  * changesByCommit over the same span (stream == batch, the house
  * streaming convention), with exact `_commit_version` attribution,
  * exactly-once across a checkpointed restart (parquet sink — the
  * memory sink cannot recover a checkpoint), and nothing at all for a
  * span with no commits.
  */
class StreamingCdcSpec extends SparkSpec {
  import spark.implicits._

  private def rows(lo: Long, hi: Long, tag: String) =
    spark.range(lo, hi).select(col("id"),
      concat(lit(tag + "-"), col("id")).as("payload"))

  private def runAvailableNow(path: String, out: String, ck: String): Unit = {
    val q = MergeStoreCdc.readStream(spark, path, pk = Seq("id"),
        fromVersion = Some(0))
      .writeStream.outputMode("append").format("parquet")
      .option("path", out).option("checkpointLocation", ck)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
  }

  private def sinkRows(out: String) =
    spark.read.parquet(out)
      .select($"id", $"payload", $"_change_type", $"_commit_version")
      .as[(Long, String, String, Long)].collect().toSet

  private def batchRows(t: String, fromV: Int, toV: Int) =
    MergeStoreCdc.changesByCommit(spark, t, Seq("id"),
        includePreimages = false, fromVersion = fromV, toVersion = toV)
      .select($"id", $"payload", $"_change_type", $"_commit_version")
      .as[(Long, String, String, Long)].collect().toSet

  test("stream == batch change feed; checkpointed restart resumes exactly-once") {
    val t = tmpDir("cdc-stream") + "/tbl"
    val out = tmpDir("cdc-stream") + "/out"
    val ck = tmpDir("cdc-stream") + "/ck"
    MergeStore.init(spark, rows(0, 1000, "v1"), t, numFiles = 8,
      clusterBy = Seq("id")) // v0
    MergeStore.merge(spark, rows(100, 110, "v2")
      .unionByName(rows(1000, 1005, "new")), t, pk = Seq("id")) // v1
    MergeStore.delete(spark, t, spark.range(200L, 220L).select(col("id")),
      pk = Seq("id")) // v2

    runAvailableNow(t, out, ck)
    val got = sinkRows(out)
    assert(got == batchRows(t, 0, 2))
    // Attribution: the merge's rows carry version 1, the delete's 2.
    assert(got.collect { case (_, _, "update_postimage", v) => v } == Set(1L))
    assert(got.collect { case (_, _, "delete", v) => v } == Set(2L))
    assert(got.count(_._3 == "insert") == 5)
    assert(got.count(_._3 == "delete") == 20)

    // Restart on the SAME checkpoint with a new commit: the sink gains
    // exactly v3's changes — v1/v2 are not re-emitted (exactly-once).
    MergeStore.merge(spark, rows(300, 303, "v3"), t, pk = Seq("id")) // v3
    runAvailableNow(t, out, ck)
    assert(sinkRows(out) == batchRows(t, 0, 3))

    // Quiesced table: a further run emits nothing.
    runAvailableNow(t, out, ck)
    assert(sinkRows(out) == batchRows(t, 0, 3))
  }

  test("maxVersionsPerBatch drains a 12-commit backlog in ceil(12/5) bounded batches, state identical") {
    val t = tmpDir("cdc-cap") + "/tbl"
    val out = tmpDir("cdc-cap") + "/out"
    val ck = tmpDir("cdc-cap") + "/ck"
    MergeStore.init(spark, rows(0, 200, "v0"), t, numFiles = 4,
      clusterBy = Seq("id")) // v0
    (1 to 12).foreach { i =>
      MergeStore.merge(spark, rows(i * 10, i * 10 + 5, s"c$i"), t,
        pk = Seq("id"))
    } // 12-commit backlog before the stream ever runs
    val spans = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    val q = MergeStoreCdc.readStream(spark, t, pk = Seq("id"),
        fromVersion = Some(0), maxVersionsPerBatch = 5)
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        val cached = b.cache()
        try {
          if (!cached.isEmpty) {
            val r = cached.agg(min($"_commit_version"),
              max($"_commit_version")).head
            spans += ((r.getLong(0), r.getLong(1)))
            cached.write.mode("append").parquet(out)
          }
        } finally { cached.unpersist(); () }
      }
      .option("checkpointLocation", ck)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    // The catch-up drained as ceil(12/5) = 3 seamless bounded spans —
    // never one 12-way union plan.
    assert(spans.toSeq == Seq((1L, 5L), (6L, 10L), (11L, 12L)))
    // ...and the concatenation is exactly the full-span change feed.
    assert(sinkRows(out) == batchRows(t, 0, 12))
    // The cap keeps applying on later runs from the checkpoint.
    (13 to 19).foreach { i =>
      MergeStore.merge(spark, rows(i * 10, i * 10 + 5, s"c$i"), t,
        pk = Seq("id"))
    }
    spans.clear()
    val q2 = MergeStoreCdc.readStream(spark, t, pk = Seq("id"),
        fromVersion = Some(0), maxVersionsPerBatch = 5)
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        val cached = b.cache()
        try {
          if (!cached.isEmpty) {
            val r = cached.agg(min($"_commit_version"),
              max($"_commit_version")).head
            spans += ((r.getLong(0), r.getLong(1)))
            cached.write.mode("append").parquet(out)
          }
        } finally { cached.unpersist(); () }
      }
      .option("checkpointLocation", ck)
      .trigger(Trigger.AvailableNow()).start()
    q2.awaitTermination()
    assert(spans.toSeq == Seq((13L, 17L), (18L, 19L)))
    assert(sinkRows(out) == batchRows(t, 0, 19))
  }

  test("fromVersion defaults to the head at stream start; a LIVE stream tails new commits") {
    val t = tmpDir("cdc-head") + "/tbl"
    val ck = tmpDir("cdc-head") + "/ck"
    MergeStore.init(spark, rows(0, 100, "v1"), t, numFiles = 4,
      clusterBy = Seq("id")) // v0
    MergeStore.merge(spark, rows(0, 5, "v2"), t, pk = Seq("id")) // v1
    // Source resolves startVersion = head (1) at query start: the v0→v1
    // history must NOT replay; commits landing while the query RUNS do.
    val q = MergeStoreCdc.readStream(spark, t, pk = Seq("id"),
        fromVersion = None)
      .writeStream.outputMode("append").format("memory")
      .queryName("cdc_live").option("checkpointLocation", ck).start()
    try {
      q.processAllAvailable()
      assert(spark.table("cdc_live").isEmpty) // no history replay
      MergeStore.merge(spark, rows(5, 8, "v3"), t, pk = Seq("id")) // v2
      q.processAllAvailable()
      val got = spark.table("cdc_live")
        .select($"id", $"_change_type", $"_commit_version")
        .as[(Long, String, Long)].collect().toSet
      assert(got == (5L to 7L).map((_, "update_postimage", 2L)).toSet)
    } finally q.stop()
  }

  test("fromVersion=None restart drains commits that landed while the query was down") {
    val t = tmpDir("cdc-gap") + "/tbl"
    val out = tmpDir("cdc-gap") + "/out"
    val ck = tmpDir("cdc-gap") + "/ck"
    MergeStore.init(spark, rows(0, 100, "v1"), t, numFiles = 2,
      clusterBy = Seq("id")) // v0
    def live(): org.apache.spark.sql.streaming.StreamingQuery =
      MergeStoreCdc.readStream(spark, t, pk = Seq("id"),
          fromVersion = None)
        .writeStream.outputMode("append").format("parquet")
        .option("path", out).option("checkpointLocation", ck).start()
    def got(): Set[(Long, Long)] = spark.read.parquet(out)
      .select($"id", $"_commit_version").as[(Long, Long)].collect().toSet
    // Run 1: "new changes only" from the head at first start; a commit
    // arriving while LIVE delivers and records the floor.
    val q1 = live()
    try {
      q1.processAllAvailable()
      MergeStore.merge(spark, rows(0, 3, "a"), t, pk = Seq("id")) // v1
      q1.processAllAvailable()
      assert(got() == (0L to 2L).map((_, 1L)).toSet)
    } finally q1.stop()
    // THE GAP: v2 commits while the query is DOWN. On restart the
    // fresh-start fallback re-resolves start = current head (2), which
    // would hide v2 forever; the persisted delivered floor (1) must win.
    MergeStore.merge(spark, rows(3, 6, "b"), t, pk = Seq("id")) // v2
    val q2 = live()
    try {
      q2.processAllAvailable()
      // Exactly v2 joins the sink — v1 is not re-emitted (checkpoint),
      // v2 is not lost (the persisted start survives the restart).
      assert(got() == ((0L to 2L).map((_, 1L)) ++
        (3L to 5L).map((_, 2L))).toSet)
    } finally q2.stop()
  }

  test("schema evolution mid-stream: a RUNNING stream keeps its start-resolved shape; a restart sees the new column") {
    val t = tmpDir("cdc-evolve") + "/tbl"
    val out = tmpDir("cdc-evolve") + "/out"
    val ck = tmpDir("cdc-evolve") + "/ck"
    MergeStore.init(spark, rows(0, 50, "v1"), t, numFiles = 2,
      clusterBy = Seq("id")) // v0
    def stream() = MergeStoreCdc.readStream(spark, t, pk = Seq("id"),
      fromVersion = Some(0))
    // Contract (documented at cdcSchema): the feed's shape is resolved
    // at STREAM START. A mid-stream evolving commit delivers its rows
    // in the old shape — appended columns are silently absent until the
    // query restarts. (Delta's readChangeFeed contract too.)
    val q1 = stream()
      .writeStream.outputMode("append").format("parquet")
      .option("path", out).option("checkpointLocation", ck).start()
    try {
      q1.processAllAvailable() // drains v0 snapshot? no — (0, head=0]: nothing
      MergeStore.merge(spark, rows(0, 3, "a"), t, pk = Seq("id")) // v1
      q1.processAllAvailable()
      // v2 EVOLVES the table (adds `score`) while the stream runs.
      MergeStore.merge(spark,
        rows(3, 6, "b").withColumn("score", col("id").cast("double")),
        t, pk = Seq("id"), allowSchemaEvolution = true) // v2
      q1.processAllAvailable()
    } finally q1.stop()
    val run1 = spark.read.parquet(out)
    assert(!run1.columns.contains("score")) // old shape throughout
    assert(run1.where($"_commit_version" === 2L).count() == 3) // delivered
    // Restart re-resolves the schema: the new column is in the feed and
    // carries values for post-evolution commits.
    assert(stream().schema.fieldNames.contains("score"))
    MergeStore.merge(spark,
      rows(6, 9, "c").withColumn("score", lit(7.5)), t,
      pk = Seq("id")) // v3
    val q2 = stream()
      .writeStream.outputMode("append").format("parquet")
      .option("path", out).option("checkpointLocation", ck).start()
    try q2.processAllAvailable() finally q2.stop()
    val run2 = spark.read.option("mergeSchema", "true").parquet(out)
    assert(run2.where($"_commit_version" === 3L)
      .select($"score").as[Double].collect().toSeq == Seq(7.5, 7.5, 7.5))
  }

  test("rename mid-stream: zero change rows, positional carry, restart adopts the new name") {
    val t = tmpDir("cdc-rename") + "/tbl"
    val out = tmpDir("cdc-rename") + "/out"
    val ck = tmpDir("cdc-rename") + "/ck"
    MergeStore.init(spark, rows(0, 50, "v1"), t, numFiles = 2,
      clusterBy = Seq("id")) // v0
    def stream() = MergeStoreCdc.readStream(spark, t, pk = Seq("id"),
      fromVersion = Some(0))
    val q1 = stream()
      .writeStream.outputMode("append").format("parquet")
      .option("path", out).option("checkpointLocation", ck).start()
    try {
      MergeStore.merge(spark, rows(0, 3, "a"), t, pk = Seq("id")) // v1
      q1.processAllAvailable()
      // v2 renames payload -> text while the stream runs: a pure
      // metadata commit, so the feed emits NOTHING for it; the
      // renamed-table commits after it deliver their rows under the
      // stream's START-resolved shape (column mapping keeps positions
      // and types — the rename is invisible to a positional consumer,
      // exactly the schema-evolution contract one verb over).
      MergeStore.renameColumn(spark, t, "payload", "text") // v2
      MergeStore.merge(spark, rows(3, 6, "b")
        .withColumnRenamed("payload", "text"), t, pk = Seq("id")) // v3
      q1.processAllAvailable()
    } finally q1.stop()
    val run1 = spark.read.parquet(out)
    assert(run1.columns.contains("payload") && !run1.columns.contains("text"))
    assert(run1.where($"_commit_version" === 2L).count() == 0) // pure rename
    assert(run1.where($"_commit_version" === 3L)
      .select($"payload").as[String].collect().toSet ==
      Set("b-3", "b-4", "b-5")) // post-rename rows, old label, right values
    // A restart re-resolves the schema and speaks the new name.
    assert(stream().schema.fieldNames.contains("text"))
    MergeStore.merge(spark, rows(6, 8, "c")
      .withColumnRenamed("payload", "text"), t, pk = Seq("id")) // v4
    val q2 = stream()
      .writeStream.outputMode("append").format("parquet")
      .option("path", out).option("checkpointLocation", ck).start()
    try q2.processAllAvailable() finally q2.stop()
    val run2 = spark.read.option("mergeSchema", "true").parquet(out)
    assert(run2.where($"_commit_version" === 4L)
      .select($"text").as[String].collect().toSet == Set("c-6", "c-7"))
  }

  test("one catch-up batch straddling a rename (and an evolution) drains cleanly") {
    val t = tmpDir("cdc-straddle") + "/tbl"
    MergeStore.init(spark, rows(0, 40, "v1"), t, numFiles = 2,
      clusterBy = Seq("id")) // v0
    MergeStore.merge(spark, rows(0, 3, "a"), t, pk = Seq("id")) // v1
    MergeStore.renameColumn(spark, t, "payload", "text") // v2
    MergeStore.merge(spark, rows(3, 6, "b")
      .withColumnRenamed("payload", "text"), t, pk = Seq("id")) // v3
    // The stream starts AFTER all three commits: batch 0 is ONE span
    // (0, 3] whose per-commit frames speak different logical names —
    // pre-fix, the union wedged the stream on a span no restart could
    // change. Aligned via physical names, it drains in head names.
    val out = tmpDir("cdc-straddle") + "/out"
    val ck = tmpDir("cdc-straddle") + "/ck"
    val q = MergeStoreCdc.readStream(spark, t, pk = Seq("id"),
        fromVersion = Some(0))
      .writeStream.outputMode("append").format("parquet")
      .option("path", out).option("checkpointLocation", ck)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.read.parquet(out)
      .select($"id", $"text", $"_change_type", $"_commit_version")
      .as[(Long, String, String, Long)].collect().toSet
    val want = MergeStoreCdc.changesByCommit(spark, t, Seq("id"),
        includePreimages = false, fromVersion = 0, toVersion = 3)
      .select($"id", $"text", $"_change_type", $"_commit_version")
      .as[(Long, String, String, Long)].collect().toSet
    assert(got == want && got.nonEmpty)
    assert(got.collect { case (_, _, _, v) => v } == Set(1L, 3L)) // v2 silent
    // An evolution inside the span null-fills its column on earlier
    // commits, exactly as read() shows their files.
    MergeStore.merge(spark, rows(6, 8, "c")
      .withColumnRenamed("payload", "text")
      .withColumn("score", lit(2.5)), t, pk = Seq("id"),
      allowSchemaEvolution = true) // v4
    val span = MergeStoreCdc.changesByCommit(spark, t, Seq("id"),
      includePreimages = false, fromVersion = 0, toVersion = 4)
    assert(span.where($"_commit_version" === 4L)
      .select($"score").as[Double].collect().toSeq == Seq(2.5, 2.5))
    assert(span.where($"_commit_version" === 1L)
      .where($"score".isNull).count() == 3)
  }

  test("pre-image feed streams too (IVM's input shape)") {
    val t = tmpDir("cdc-pre") + "/tbl"
    val ck = tmpDir("cdc-pre") + "/ck"
    MergeStore.init(spark, rows(0, 50, "v1"), t, numFiles = 2,
      clusterBy = Seq("id"))
    MergeStore.merge(spark, rows(7, 8, "v2"), t, pk = Seq("id"))
    val q = MergeStoreCdc.readStream(spark, t, pk = Seq("id"),
        includePreimages = true, fromVersion = Some(0))
      .writeStream.outputMode("append").format("memory")
      .queryName("cdc_pre").option("checkpointLocation", ck)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val byType = spark.table("cdc_pre").groupBy("_change_type").count()
      .as[(String, Long)].collect().toMap
    assert(byType == Map("update_postimage" -> 1L, "update_preimage" -> 1L))
  }

  test("table_changes TVF == changesByCommit across a rename and a MOR delete; graft.pk drives it") {
    val t = tmpDir("cdc-tvf") + "/tbl"
    MergeStore.init(spark, rows(0, 500, "v1"), t, numFiles = 4,
      clusterBy = Seq("id")) // v0
    graft.store.GraftCatalog.register("cdcdb.tvf", t)
    // Declare the key AS SQL — the TVF (and the streaming helpers)
    // read it back; the policy must survive the verb commits below.
    spark.sql(
      "ALTER TABLE graft.cdcdb.tvf SET TBLPROPERTIES ('graft.pk'='id')") // v1
    MergeStore.merge(spark, rows(50, 60, "v2"), t, pk = Seq("id")) // v2
    MergeStore.renameColumn(spark, t, "payload", "text") // v3
    MergeStore.deleteWhereMor(spark, t, col("id") >= 480) // v4: DV only
    assert(MergeStore.tablePk(t) == Seq("id"), "graft.pk must carry")
    def shape(df: org.apache.spark.sql.DataFrame) =
      df.select($"id", $"text", $"_change_type", $"_commit_version")
        .as[(Long, String, String, Long)].collect().toSet
    val viaSql = spark.sql("SELECT * FROM table_changes('cdcdb.tvf', 1, 4)")
    assert(viaSql.columns.contains("_commit_timestamp"))
    assert(shape(viaSql) == shape(MergeStoreCdc.changesByCommit(spark, t,
      Seq("id"), includePreimages = false, fromVersion = 0, toVersion = 4)))
    // to_version defaults to the head; the feed composes with SQL.
    assert(spark.sql(
      "SELECT count(*) AS n FROM table_changes('cdcdb.tvf', 4) " +
        "WHERE _change_type = 'delete'").as[Long].head() == 20L)
    // Bounds validate loudly.
    assert(intercept[Exception](spark.sql(
      "SELECT * FROM table_changes('cdcdb.tvf', 1, 99)").collect())
      .getMessage.contains("past the head"))
    // A BIGINT version that overflows Int refuses, never wraps (the
    // literal 4294967297 truncated to Int would be version 1).
    assert(intercept[Exception](spark.sql(
      "SELECT * FROM table_changes('cdcdb.tvf', 4294967297)").collect())
      .getMessage.contains("does not fit"))
    // Timestamp bounds resolve against the IN-COMMIT stamps: a from
    // timestamp = first commit at or after, to = last at or before —
    // spanning exactly [v2, v4] here by quoting v2's and v4's own
    // recorded instants (formatted in the JVM zone, the string form's
    // parse zone).
    val hist = MergeStore.history(t).toMap
    def fmt(ms: Long) = new java.sql.Timestamp(ms).toString
    val viaTs = spark.sql("SELECT * FROM table_changes('cdcdb.tvf', " +
      s"'${fmt(hist(2))}', '${fmt(hist(4))}')")
    assert(shape(viaTs) == shape(MergeStoreCdc.changesByCommit(spark, t,
      Seq("id"), includePreimages = false, fromVersion = 1,
      toVersion = 4)))
    // A from timestamp past the head refuses loudly.
    assert(intercept[Exception](spark.sql(
      "SELECT * FROM table_changes('cdcdb.tvf', '2099-01-01')").collect())
      .getMessage.contains("after the last commit"))
    graft.store.GraftCatalog.unregister("cdcdb.tvf")
  }

  test("follower spelled entirely with table names: readStreamTable + graft.pk") {
    val base = tmpDir("cdc-names")
    val t = s"$base/tbl"
    MergeStore.init(spark, rows(0, 100, "v1"), t, numFiles = 2,
      clusterBy = Seq("id")) // v0
    MergeStore.setPolicy(t, "graft.pk", Some("id")) // v1
    MergeStore.merge(spark, rows(5, 9, "v2"), t, pk = Seq("id")) // v2
    graft.store.GraftCatalog.register("cdcdb.names", t)
    val q = MergeStoreCdc.readStreamTable(spark, "cdcdb.names",
        fromVersion = Some(0))
      .writeStream.outputMode("append").format("parquet")
      .option("path", s"$base/out")
      .option("checkpointLocation", s"$base/ck")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(sinkRows(s"$base/out") == batchRows(t, 0, 2))
    // The raw-options route resolves 'table' + policy pk too.
    val viaOptions = spark.readStream.format("graft-cdc")
      .option("table", "cdcdb.names").option("fromVersion", "0").load()
    assert(viaOptions.schema.fieldNames.contains("_change_type"))
    graft.store.GraftCatalog.unregister("cdcdb.names")
  }

  test("a merge-on-read delete streams as delete changes, same as batch") {
    val base = tmpDir("cdc-mor")
    val t = s"$base/tbl"
    MergeStore.init(spark, rows(0, 400, "v1"), t, numFiles = 4,
      clusterBy = Seq("id")) // v0
    MergeStore.deleteWhereMor(spark, t, col("id") % 50 === 7) // v1: DV only
    MergeStore.merge(spark, rows(400, 410, "v2"), t, pk = Seq("id")) // v2
    runAvailableNow(t, s"$base/out", s"$base/ck")
    val got = sinkRows(s"$base/out")
    assert(got == batchRows(t, 0, 2), "stream diverged from batch feed")
    val dels = got.filter(_._3 == "delete")
    assert(dels.map(_._1) == (0L until 400L).filter(_ % 50 == 7).toSet,
      s"MOR delete rows wrong: $dels")
    assert(dels.forall(_._4 == 1L), "MOR deletes must tag their commit")
  }
}
