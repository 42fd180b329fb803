package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.IncrementalView
import graft.operators.IncrementalView.IvmSpec
import graft.store.MergeStore
import graft.streaming.StreamingIvm

/** Streaming materialized view: the CDC stream driving IncrementalView
  * through foreachBatch must leave the view equal to a from-scratch
  * re-aggregation after catching up — across multiple commits, group
  * births and deaths, a checkpointed restart, and a REPLAYED batch
  * (which the high-water-mark guard must drop, since delta application
  * is not idempotent).
  */
class StreamingIvmSpec extends SparkSpec {
  import spark.implicits._

  private val spec = IvmSpec(Seq("grp"), Seq("amount" -> "sum_amount"))

  private def rows(lo: Long, hi: Long): DataFrame = spark.range(lo, hi)
    .select(col("id"), (col("id") % 5).cast("int").as("grp"),
      (col("id") * lit(0.5)).as("amount"))

  private def sorted(df: DataFrame): Seq[(Int, Long, java.math.BigDecimal)] =
    df.select(col("grp").cast("int"), col("n_rows"),
        col("sum_amount").cast("decimal(30,4)"))
      .as[(Int, Long, java.math.BigDecimal)].collect().sortBy(_._1).toSeq

  private def assertCurrent(t: String, view: String): Unit =
    assert(sorted(MergeStore.read(spark, view)) ==
      sorted(IncrementalView.fullState(MergeStore.read(spark, t), spec)))

  test("streamed maintenance catches up, resumes from checkpoint, drops replays") {
    val t = tmpDir("sivm") + "/tbl"
    val view = tmpDir("sivm") + "/view"
    val ck = tmpDir("sivm") + "/ck"
    MergeStore.init(spark, rows(0, 800), t, numFiles = 4,
      clusterBy = Seq("id")) // v0
    IncrementalView.initView(spark, t, view, spec)

    // Two commits, then one catch-up run.
    MergeStore.merge(spark,
      rows(0, 40).withColumn("amount", col("amount") + lit(3.25)), t,
      pk = Seq("id")) // v1
    MergeStore.merge(spark,
      spark.range(800L, 850L).select(col("id"),
        lit(7).cast("int").as("grp"), lit(1.0).as("amount")),
      t, pk = Seq("id")) // v2 — group 7 born
    StreamingIvm.maintain(spark, t, view, spec, ck).awaitTermination()
    assertCurrent(t, view)
    assert(IncrementalView.appliedVersion(view) == 2)

    // New commit killing group 7; restart on the same checkpoint.
    MergeStore.delete(spark, t,
      spark.range(800L, 850L).select(col("id")), pk = Seq("id")) // v3
    StreamingIvm.maintain(spark, t, view, spec, ck).awaitTermination()
    assertCurrent(t, view)
    assert(MergeStore.read(spark, view).where(col("grp") === 7).count() == 0)

    // Quiesced table: a run with nothing to do leaves the view intact.
    StreamingIvm.maintain(spark, t, view, spec, ck).awaitTermination()
    assertCurrent(t, view)

    // Replay guard: re-applying an already-applied span's batch must be
    // dropped whole (delta application is not idempotent).
    val replay = graft.streaming.MergeStoreCdc.changesByCommit(spark, t,
      Seq("grp"), includePreimages = true, fromVersion = 2, toVersion = 3)
    assert(!StreamingIvm.applyCdcBatch(replay, view, spec))
    assertCurrent(t, view)
  }

  test("view initialized at source version > 0 streams from its own marker") {
    val t = tmpDir("sivm-late") + "/tbl"
    val view = tmpDir("sivm-late") + "/view"
    val ck = tmpDir("sivm-late") + "/ck"
    MergeStore.init(spark, rows(0, 300), t, numFiles = 2,
      clusterBy = Seq("id")) // v0
    MergeStore.merge(spark, rows(300, 320), t, pk = Seq("id")) // v1
    MergeStore.merge(spark, rows(320, 340), t, pk = Seq("id")) // v2
    // The view is born reflecting v2; a commit lands BEFORE the first
    // stream run. The old Some(0) seed made the first batch span (0, 3]
    // — straddling the applied marker and wedging the query forever.
    IncrementalView.initView(spark, t, view, spec) // applied = 2
    MergeStore.merge(spark,
      rows(0, 30).withColumn("amount", col("amount") + lit(9.5)), t,
      pk = Seq("id")) // v3
    StreamingIvm.maintain(spark, t, view, spec, ck).awaitTermination()
    assertCurrent(t, view)
    assert(IncrementalView.appliedVersion(view) == 3)
    // Restarts keep working (the marker and checkpoint now agree).
    MergeStore.merge(spark, rows(340, 350), t, pk = Seq("id")) // v4
    StreamingIvm.maintain(spark, t, view, spec, ck).awaitTermination()
    assertCurrent(t, view)
  }

  test("distinct-count sub-view composes with the stream: streamed == count(DISTINCT) from scratch") {
    import org.apache.spark.sql.functions.countDistinct
    val dSpec = IncrementalView.distinctCountSpec(Seq("grp"), "bucket")
    val t = tmpDir("sivm-distinct") + "/tbl"
    val view = tmpDir("sivm-distinct") + "/view"
    val ck = tmpDir("sivm-distinct") + "/ck"
    def withBucket(df: DataFrame) =
      df.withColumn("bucket", (col("id") % 13).cast("int"))
    MergeStore.init(spark, withBucket(rows(0, 400)), t, numFiles = 2,
      clusterBy = Seq("id")) // v0
    IncrementalView.initView(spark, t, view, dSpec)
    MergeStore.merge(spark,
      withBucket(rows(0, 400)).where(col("id") % 7 === 0)
        .withColumn("bucket", lit(77)), t, pk = Seq("id")) // v1
    MergeStore.delete(spark, t,
      MergeStore.read(spark, t)
        .where(col("grp") === 1 && col("bucket") === 4).select(col("id")),
      pk = Seq("id")) // v2
    StreamingIvm.maintain(spark, t, view, dSpec, ck).awaitTermination()
    val got = IncrementalView.readDistinctCount(spark, view, Seq("grp"))
      .select(col("grp").cast("int"), col("n_distinct"))
      .as[(Int, Long)].collect().toMap
    val want = MergeStore.read(spark, t)
      .groupBy("grp").agg(countDistinct(col("bucket")).as("n"))
      .select(col("grp").cast("int"), col("n"))
      .as[(Int, Long)].collect().toMap
    assert(got == want)
  }

  test("maintainEvery bounds a long trickle's view files while contents and marker stay exact") {
    val t = tmpDir("sivm-maint") + "/tbl"
    val view = tmpDir("sivm-maint") + "/view"
    val ck = tmpDir("sivm-maint") + "/ck"
    MergeStore.init(spark, rows(0, 400), t, numFiles = 2,
      clusterBy = Seq("id")) // v0
    IncrementalView.initView(spark, t, view, spec, numFiles = 2)
    // A long trickle of group-birth commits: each micro-batch's delta
    // lands as NEW view files (no existing file holds the key — the
    // accretion path), so without maintenance the view would sit at
    // 2 + 10 files by the end.
    (1 to 10).foreach { i =>
      MergeStore.merge(spark,
        spark.range(400L + i * 50, 425L + i * 50)
          .select(col("id"), lit(100 + i).cast("int").as("grp"),
            (col("id") * lit(0.25)).as("amount")),
        t, pk = Seq("id"))
      StreamingIvm.maintain(spark, t, view, spec, ck,
        maintainEvery = 1, targetFiles = 2, maxLiveFiles = 4,
        vacuumGraceMillis = 0).awaitTermination()
      assert(MergeStore.liveFiles(view).size <= 4,
        s"cycle $i: view files ${MergeStore.liveFiles(view).size} > cap")
    }
    assertCurrent(t, view)
    assert(IncrementalView.appliedVersion(view) ==
      MergeStore.version(t).get)
    // Maintenance kept refreshing correctly afterwards too: one more
    // ordinary update cycle through the same maintained stream.
    MergeStore.merge(spark,
      rows(0, 40).withColumn("amount", col("amount") + lit(2.0)), t,
      pk = Seq("id"))
    StreamingIvm.maintain(spark, t, view, spec, ck,
      maintainEvery = 1, targetFiles = 2, maxLiveFiles = 4,
      vacuumGraceMillis = 0).awaitTermination()
    assertCurrent(t, view)
  }

  test("vacuumed source span surfaces as a stream failure with the named retention error") {
    val t = tmpDir("sivm-vac") + "/tbl"
    val view = tmpDir("sivm-vac") + "/view"
    val ck = tmpDir("sivm-vac") + "/ck"
    MergeStore.init(spark, rows(0, 100), t, numFiles = 2,
      clusterBy = Seq("id")) // v0
    IncrementalView.initView(spark, t, view, spec) // applied = 0
    MergeStore.merge(spark, rows(100, 110), t, pk = Seq("id")) // v1
    MergeStore.merge(spark, rows(110, 120), t, pk = Seq("id")) // v2
    MergeStore.vacuum(t, retainVersions = 1, graceMillis = 0) // only v2 left
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      StreamingIvm.maintain(spark, t, view, spec, ck).awaitTermination()
    }
    def messages(th: Throwable): Seq[String] =
      if (th == null) Nil
      else Option(th.getMessage).toSeq ++ messages(th.getCause)
    assert(messages(e).exists(m =>
      m.contains("vacuumed") && m.contains("retainVersions")))
  }

  test("batch straddling the marker (manual refresh between runs) applies only the fresh suffix") {
    val t = tmpDir("sivm-strad") + "/tbl"
    val view = tmpDir("sivm-strad") + "/view"
    val ck = tmpDir("sivm-strad") + "/ck"
    MergeStore.init(spark, rows(0, 200), t, numFiles = 2,
      clusterBy = Seq("id")) // v0
    IncrementalView.initView(spark, t, view, spec) // applied = 0
    MergeStore.merge(spark, rows(200, 210), t, pk = Seq("id")) // v1
    StreamingIvm.maintain(spark, t, view, spec, ck).awaitTermination()
    assert(IncrementalView.appliedVersion(view) == 1)
    // The view advances OUTSIDE the stream (a scheduled batch refresh),
    // then more commits land: the next stream batch spans (1, 3] while
    // the marker sits at 2 — the applied prefix must be sliced off
    // per-commit, not double-applied and not hard-failed.
    MergeStore.merge(spark,
      rows(0, 20).withColumn("amount", col("amount") + lit(1.0)), t,
      pk = Seq("id")) // v2
    IncrementalView.refresh(spark, t, view, spec) // marker -> 2
    MergeStore.merge(spark,
      rows(50, 70).withColumn("amount", col("amount") + lit(2.0)), t,
      pk = Seq("id")) // v3
    StreamingIvm.maintain(spark, t, view, spec, ck).awaitTermination()
    assertCurrent(t, view)
    assert(IncrementalView.appliedVersion(view) == 3)
  }
}
