package graft

import org.apache.spark.sql.functions._

import graft.operators.Bm25
import graft.store.{MergeStore, SnapshotStore}
import graft.streaming.{MergeStoreCdc, StreamingSearch}

/** Continuous search-index maintenance contract: a BM25 index following
  * the documents table's CDC stream must score IDENTICALLY to an index
  * built from scratch on the table's final state after every catch-up
  * run, resume from its checkpoint, resolve multi-commit batches to the
  * terminal per-doc change, drop replayed batches via the atomic
  * snapshot marker, and keep segment hygiene from inside the stream.
  */
class StreamingSearchSpec extends SparkSpec {
  import spark.implicits._

  private def docs(lo: Long, hi: Long, tag: String) =
    spark.range(lo, hi).select(col("id"),
      concat(lit(s"alpha $tag token"), (col("id") % 7).cast("string"),
        lit(" shared corpus text")).as("text"))

  private val queries = Seq((1L, "alpha shared"), (2L, "token3 corpus"))
    .toDF("qid", "qtext")

  /** Top-k over the followed index vs a from-scratch index on the
    * table's current state — rounded scores must agree exactly. */
  private def assertMatchesScratch(t: String, ix: String): Unit = {
    val got = Bm25.searchTopKIndexed(ix, queries, "qid", "qtext", k = 8)
      .select($"qid", $"doc", $"score")
      .as[(Long, Long, Double)].collect().sortBy(r => (r._1, r._2)).toSeq
    val scratchDir = tmpDir("ssearch-scratch") + "/ix"
    Bm25.buildIndex(MergeStore.read(spark, t).select($"id", $"text"),
      "id", "text", scratchDir)
    val want = Bm25.searchTopKIndexed(scratchDir, queries, "qid", "qtext",
        k = 8)
      .select($"qid", $"doc", $"score")
      .as[(Long, Long, Double)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(got == want, "followed index diverged from scratch build")
  }

  test("index follows the table across runs; delete-then-reinsert ends present") {
    val t = tmpDir("ssearch") + "/tbl"
    val ix = tmpDir("ssearch") + "/ix"
    val ck = tmpDir("ssearch") + "/ck"
    MergeStore.init(spark, docs(0, 300, "v1"), t, numFiles = 4,
      clusterBy = Seq("id")) // v0
    val seeded = StreamingSearch.initIndex(spark, t, ix, "id", "text")
    assert(seeded == 0 && StreamingSearch.appliedVersion(ix) == 0)
    assertMatchesScratch(t, ix)

    // v1: revise a slice; v2: delete a range; v3: re-insert part of the
    // deleted range. One AvailableNow run sees all three commits — the
    // re-inserted docs must end PRESENT (terminal change per doc).
    MergeStore.merge(spark, docs(0, 40, "v2"), t, pk = Seq("id")) // v1
    MergeStore.delete(spark, t, spark.range(100L, 140L).select(col("id")),
      pk = Seq("id")) // v2
    MergeStore.merge(spark, docs(100, 110, "back"), t, pk = Seq("id")) // v3
    StreamingSearch.follow(spark, t, ix, "id", "text", ck)
      .awaitTermination()
    assert(StreamingSearch.appliedVersion(ix) == 3)
    assertMatchesScratch(t, ix)

    // More commits; resume from the same checkpoint — only the new span
    // applies.
    MergeStore.merge(spark, docs(300, 320, "v4"), t, pk = Seq("id")) // v4
    StreamingSearch.follow(spark, t, ix, "id", "text", ck)
      .awaitTermination()
    assert(StreamingSearch.appliedVersion(ix) == 4)
    assertMatchesScratch(t, ix)

    // Quiesced: another run publishes nothing.
    val vBefore = Bm25.currentVersion(ix)
    StreamingSearch.follow(spark, t, ix, "id", "text", ck)
      .awaitTermination()
    assert(Bm25.currentVersion(ix) == vBefore)
  }

  test("replayed batch drops whole; straddling batch slices per-commit") {
    val t = tmpDir("ssearch-rp") + "/tbl"
    val ix = tmpDir("ssearch-rp") + "/ix"
    MergeStore.init(spark, docs(0, 200, "v1"), t, numFiles = 2,
      clusterBy = Seq("id"))
    StreamingSearch.initIndex(spark, t, ix, "id", "text")
    MergeStore.merge(spark, docs(0, 30, "v2"), t, pk = Seq("id")) // v1
    MergeStore.delete(spark, t, spark.range(50L, 70L).select(col("id")),
      pk = Seq("id")) // v2
    val batch = MergeStoreCdc.changesByCommit(spark, t, Seq("id"),
      includePreimages = false, fromVersion = 0, toVersion = 2)
    assert(StreamingSearch.applyCdcBatch(batch, ix, "id", "text"))
    assert(StreamingSearch.appliedVersion(ix) == 2)
    val v2 = Bm25.currentVersion(ix)
    assertMatchesScratch(t, ix)
    // Replay of the same batch: dropped whole, no new snapshot.
    assert(!StreamingSearch.applyCdcBatch(batch, ix, "id", "text"))
    assert(Bm25.currentVersion(ix) == v2)
    // v3 lands; a batch spanning (0, 3] straddles the marker at 2 —
    // only commit 3 may apply.
    MergeStore.merge(spark, docs(50, 55, "back"), t, pk = Seq("id")) // v3
    val straddling = MergeStoreCdc.changesByCommit(spark, t, Seq("id"),
      includePreimages = false, fromVersion = 0, toVersion = 3)
    assert(StreamingSearch.applyCdcBatch(straddling, ix, "id", "text"))
    assert(StreamingSearch.appliedVersion(ix) == 3)
    assertMatchesScratch(t, ix)
  }

  test("applyChangesToIndex: one publish, delete-then-upsert composition") {
    val ix = tmpDir("ssearch-ac") + "/ix"
    Bm25.buildIndex(docs(0, 100, "v1"), "id", "text", ix)
    val v0 = Bm25.currentVersion(ix).get
    // Doc 5 is both doomed and upserted → ends present (revised); doc 6
    // only doomed → absent; doc 100 fresh → present. ONE new snapshot.
    val up = docs(5, 6, "rev").unionByName(docs(100, 101, "new"))
    val doomed = Seq(5L, 6L).toDF("id")
    Bm25.applyChangesToIndex(up, doomed, "id", "text", ix,
      meta = Map("probe.marker" -> "42"))
    assert(Bm25.currentVersion(ix).get == v0 + 1)
    assert(SnapshotStore.meta(ix).get("probe.marker").contains("42"))
    val hits = Bm25.searchTopKIndexed(ix,
        Seq((1L, "rev new v1")).toDF("qid", "qtext"), "qid", "qtext",
        k = 200)
      .select($"doc").as[Long].collect().toSet
    assert(hits.contains(5L) && hits.contains(100L) && !hits.contains(6L))
    // Scores equal a scratch index over the composed corpus.
    val scratch = tmpDir("ssearch-ac2") + "/ix"
    Bm25.buildIndex(
      docs(0, 100, "v1").where(!col("id").isin(5L, 6L)).unionByName(up),
      "id", "text", scratch)
    val a = Bm25.searchTopKIndexed(ix, queries, "qid", "qtext", k = 8)
      .select($"qid", $"doc", $"score")
      .as[(Long, Long, Double)].collect().sortBy(r => (r._1, r._2)).toSeq
    val b = Bm25.searchTopKIndexed(scratch, queries, "qid", "qtext", k = 8)
      .select($"qid", $"doc", $"score")
      .as[(Long, Long, Double)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(a == b)
  }

  test("follower resumes exactly across delta-manifest checkpoints and index compactions") {
    // The cross-feature interaction delta manifests introduced: the
    // SOURCE table's commits are delta-encoded with a full snapshot
    // every checkpointInterval-th version, and the index may be
    // compacted (by the stream's own maintenance OR a rival maintainer)
    // between catch-ups. The follower must resume bit-exactly across
    // BOTH: a catch-up span crossing the source's full-snapshot
    // boundary, and a compaction that rewrote its own index mid-follow.
    val t = tmpDir("ssearch-dm") + "/tbl"
    val ix = tmpDir("ssearch-dm") + "/ix"
    MergeStore.init(spark, docs(0, 300, "v1"), t, numFiles = 2,
      clusterBy = Seq("id")) // v0: full snapshot
    StreamingSearch.initIndex(spark, t, ix, "id", "text", numFiles = 2)
    // 20 trickle merges: versions 1..20 — deltas except v16 (the
    // interval-th full snapshot), so the follower's catch-up spans
    // reconstruct through the checkpoint boundary.
    (1 to 20).foreach { i =>
      MergeStore.merge(spark, docs(i * 10L, i * 10L + 10,
        s"rev$i"), t, pk = Seq("id"))
    }
    // One catch-up run with in-stream maintenance: its own compactions
    // land between applied spans.
    StreamingSearch.follow(spark, t, ix, "id", "text",
      tmpDir("ssearch-dm") + "/ck1", numFiles = 2, maintainEvery = 1,
      compactFiles = 2, maxPostingsFiles = 4).awaitTermination()
    assert(StreamingSearch.appliedVersion(ix) == 20)
    assertMatchesScratch(t, ix)
    // A RIVAL maintainer compacts the index between runs; its commit
    // must carry the applied marker, so the next catch-up neither
    // replays nor skips.
    Bm25.compactIndex(spark, ix, numFiles = 2)
    assert(StreamingSearch.appliedVersion(ix) == 20,
      "compaction dropped the follower's high-water mark")
    (21 to 23).foreach { i =>
      MergeStore.merge(spark, docs(0, 40, s"late$i"), t, pk = Seq("id"))
    }
    StreamingSearch.follow(spark, t, ix, "id", "text",
      tmpDir("ssearch-dm") + "/ck2", numFiles = 2)
      .awaitTermination()
    assert(StreamingSearch.appliedVersion(ix) == 23)
    assertMatchesScratch(t, ix)
    // Source-side retention under delta manifests: vacuum to a floor
    // above the full snapshot, then keep following — the floor .ckpt
    // keeps the change feed's base reconstructable.
    MergeStore.vacuum(t, retainVersions = 2, graceMillis = 0)
    MergeStore.merge(spark, docs(5, 15, "post-vac"), t, pk = Seq("id"))
    StreamingSearch.follow(spark, t, ix, "id", "text",
      tmpDir("ssearch-dm") + "/ck3", numFiles = 2)
      .awaitTermination()
    assert(StreamingSearch.appliedVersion(ix) == 24)
    assertMatchesScratch(t, ix)
  }

  test("maintainEvery compacts from inside the stream, marker survives vacuum") {
    val t = tmpDir("ssearch-mt") + "/tbl"
    val ix = tmpDir("ssearch-mt") + "/ix"
    MergeStore.init(spark, docs(0, 200, "v1"), t, numFiles = 2,
      clusterBy = Seq("id"))
    StreamingSearch.initIndex(spark, t, ix, "id", "text", numFiles = 2)
    // Trickle revisions: every commit buries a slice, accreting
    // postings segments; the stream (maintainEvery = 1 with a tight
    // file cap) must compact as it goes.
    (1 to 4).foreach { i =>
      MergeStore.merge(spark, docs(0, 50, s"rev$i"), t, pk = Seq("id"))
      val ck = tmpDir("ssearch-mt") + s"/ck$i" // fresh run each trickle
      StreamingSearch.follow(spark, t, ix, "id", "text", ck,
        numFiles = 2, maintainEvery = 1, compactFiles = 2,
        maxPostingsFiles = 4).awaitTermination()
    }
    assert(StreamingSearch.appliedVersion(ix) == 4)
    // Hygiene held: the head snapshot's postings files stay bounded and
    // tombstones folded away by the in-stream compactions.
    val snap = Bm25.resolveSnapshot(ix)
    val postingsFiles = java.nio.file.Files
      .list(java.nio.file.Paths.get(snap, "postings")).iterator()
    val n = Iterator.continually(postingsFiles)
      .takeWhile(_.hasNext).map(_.next())
      .count(p => p.getFileName.toString.endsWith(".parquet"))
    assert(n <= 4, s"postings files unbounded under streamed upserts: $n")
    // Vacuum to head only: the compaction commit carried the marker, so
    // the high-water mark survives retention.
    SnapshotStore.vacuum(ix, retainVersions = 1)
    assert(StreamingSearch.appliedVersion(ix) == 4)
    assertMatchesScratch(t, ix)
  }
}
