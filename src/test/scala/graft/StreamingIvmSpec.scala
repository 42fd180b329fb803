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
}
