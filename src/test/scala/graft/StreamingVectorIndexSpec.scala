package graft

import org.apache.spark.sql.functions._

import graft.operators.IvfIndex
import graft.store.{IvfStore, MergeStore, SnapshotStore}
import graft.streaming.{MergeStoreCdc, StreamingVectorIndex}

/** Continuous vector-index maintenance contract: an IVF index following
  * the embeddings table's CDC stream must search IDENTICALLY to an
  * index assigned from scratch (same model) on the table's final state,
  * resume from its checkpoint, resolve per-id terminal changes, drop
  * replays via the atomic snapshot marker, and never change the model
  * under a follower (batches assign with the parent's pinned model).
  */
class StreamingVectorIndexSpec extends SparkSpec {
  import spark.implicits._

  private val Dim = 8

  /** Deterministic unit-ish vectors: id spreads directions. */
  private def vecs(lo: Long, hi: Long, salt: Double) =
    spark.range(lo, hi).select(col("id"),
      array((0 until Dim).map(d =>
        sin(col("id") * lit(0.7 + d) + lit(salt)) + lit(0.01 * d)): _*)
        .as("vec"))

  private def searchAll(ix: String, version: Option[Int] = None) = {
    val q = Array.tabulate(Dim)(d => math.sin(0.3 * (d + 1)))
    IvfStore.searchTopK(spark, ix, "id", "vec", q, k = 12, nprobe = 4,
        version = version)
      .select($"id", round($"cosine", 6).as("c"))
      .as[(Long, Double)].collect().sortBy(r => (-r._2, r._1)).toSeq
  }

  /** Followed index vs scratch assignment of the table's current state
    * with the SAME model — results must agree exactly. */
  private def assertMatchesScratch(t: String, ix: String): Unit = {
    val m = IvfStore.model(spark, ix)
    val scratch = tmpDir("svix-scratch") + "/ix"
    IvfStore.init(spark, MergeStore.read(spark, t), "vec", m, scratch)
    assert(searchAll(ix) == searchAll(scratch),
      "followed index diverged from scratch assignment")
  }

  test("index follows the table across runs; model stays pinned") {
    val t = tmpDir("svix") + "/tbl"
    val ix = tmpDir("svix") + "/ix"
    val ck = tmpDir("svix") + "/ck"
    MergeStore.init(spark, vecs(0, 400, 0.0), t, numFiles = 4,
      clusterBy = Seq("id")) // v0
    val seeded = StreamingVectorIndex.initIndex(spark, t, ix, "id", "vec",
      k = 8)
    assert(seeded == 0 && StreamingVectorIndex.appliedVersion(ix) == 0)
    val m0 = IvfStore.model(spark, ix)
    assertMatchesScratch(t, ix)

    // v1: revise a slice (vectors move clusters); v2: delete a range;
    // v3: re-insert part of it. One AvailableNow run, three commits.
    MergeStore.merge(spark, vecs(0, 50, 2.0), t, pk = Seq("id")) // v1
    MergeStore.delete(spark, t, spark.range(100L, 140L).select(col("id")),
      pk = Seq("id")) // v2
    MergeStore.merge(spark, vecs(100, 110, 5.0), t, pk = Seq("id")) // v3
    StreamingVectorIndex.follow(spark, t, ix, "id", "vec", ck)
      .awaitTermination()
    assert(StreamingVectorIndex.appliedVersion(ix) == 3)
    assertMatchesScratch(t, ix)
    // The follower never retrains: model bit-identical to v0's.
    assert(IvfStore.model(spark, ix).centroids.map(_.toSeq).toSeq ==
      m0.centroids.map(_.toSeq).toSeq)

    // Resume from the checkpoint: only the new span applies.
    MergeStore.merge(spark, vecs(400, 430, 1.0), t, pk = Seq("id")) // v4
    StreamingVectorIndex.follow(spark, t, ix, "id", "vec", ck)
      .awaitTermination()
    assert(StreamingVectorIndex.appliedVersion(ix) == 4)
    assertMatchesScratch(t, ix)
  }

  test("replayed batch drops whole; pinned old version stays readable") {
    val t = tmpDir("svix-rp") + "/tbl"
    val ix = tmpDir("svix-rp") + "/ix"
    MergeStore.init(spark, vecs(0, 300, 0.0), t, numFiles = 2,
      clusterBy = Seq("id"))
    StreamingVectorIndex.initIndex(spark, t, ix, "id", "vec", k = 6)
    val preChange = searchAll(ix)
    val vInit = IvfStore.currentVersion(ix).get
    MergeStore.merge(spark, vecs(0, 40, 3.0), t, pk = Seq("id")) // v1
    MergeStore.delete(spark, t, spark.range(60L, 90L).select(col("id")),
      pk = Seq("id")) // v2
    val batch = MergeStoreCdc.changesByCommit(spark, t, Seq("id"),
      includePreimages = false, fromVersion = 0, toVersion = 2)
    assert(StreamingVectorIndex.applyCdcBatch(batch, ix, "id", "vec"))
    assert(StreamingVectorIndex.appliedVersion(ix) == 2)
    val vAfter = IvfStore.currentVersion(ix).get
    assert(vAfter == vInit + 1) // ONE publish for the whole batch
    assertMatchesScratch(t, ix)
    // Replay: dropped whole, no snapshot burned.
    assert(!StreamingVectorIndex.applyCdcBatch(batch, ix, "id", "vec"))
    assert(IvfStore.currentVersion(ix).get == vAfter)
    // Time travel: the pre-change snapshot still answers identically.
    assert(searchAll(ix, Some(vInit)) == preChange)
  }

  test("maintainEvery re-packs accreted cluster files; marker + model survive") {
    val t = tmpDir("svix-mt") + "/tbl"
    val ix = tmpDir("svix-mt") + "/ix"
    MergeStore.init(spark, vecs(0, 300, 0.0), t, numFiles = 2,
      clusterBy = Seq("id"))
    StreamingVectorIndex.initIndex(spark, t, ix, "id", "vec", k = 6)
    val m0 = IvfStore.model(spark, ix)
    def vectorFiles(): Int = {
      val it = java.nio.file.Files.walk(java.nio.file.Paths.get(
        graft.store.SnapshotStore.resolve(ix), "vectors"))
      try {
        import scala.jdk.CollectionConverters._
        it.iterator().asScala.count(p =>
          java.nio.file.Files.isRegularFile(p) &&
            p.getFileName.toString.endsWith(".parquet"))
      } finally it.close()
    }
    // Trickle revisions with a tight cap: the stream must keep the
    // per-cluster file count bounded as carries + rewrites accrete.
    (1 to 4).foreach { i =>
      MergeStore.merge(spark, vecs(0, 60, i.toDouble), t, pk = Seq("id"))
      val ck = tmpDir("svix-mt") + s"/ck$i"
      StreamingVectorIndex.follow(spark, t, ix, "id", "vec", ck,
        maintainEvery = 1, maxFiles = 12).awaitTermination()
    }
    assert(StreamingVectorIndex.appliedVersion(ix) == 4)
    assert(vectorFiles() <= 12,
      s"vector files unbounded under streamed revisions: ${vectorFiles()}")
    // Compaction never re-clusters: model bit-identical, content exact.
    assert(IvfStore.model(spark, ix).centroids.map(_.toSeq).toSeq ==
      m0.centroids.map(_.toSeq).toSeq)
    assertMatchesScratch(t, ix)
    // Marker survives head-only vacuum (compaction carried it).
    IvfStore.vacuum(ix, retainVersions = 1)
    assert(StreamingVectorIndex.appliedVersion(ix) == 4)
  }

  test("IvfStore.applyChanges: delete-then-upsert composition, one publish") {
    val ix = tmpDir("svix-ac") + "/ix"
    val corpus = vecs(0, 200, 0.0)
    val m = IvfIndex.train(corpus, "id", "vec", k = 6)
    IvfStore.init(spark, corpus, "vec", m, ix)
    val v0 = IvfStore.currentVersion(ix).get
    // id 5: doomed AND upserted → present with the NEW vector; id 6:
    // doomed only → gone; id 200: fresh → present.
    val up = vecs(5, 6, 9.0).unionByName(vecs(200, 201, 0.0))
    IvfStore.applyChanges(spark, ix, up, Seq(5L, 6L).toDF("id"),
      "id", "vec", meta = Map("probe.marker" -> "7"))
    assert(IvfStore.currentVersion(ix).get == v0 + 1)
    assert(SnapshotStore.meta(ix).get("probe.marker").contains("7"))
    val ids = IvfStore.read(spark, ix).select($"id").as[Long]
      .collect().toSet
    assert(ids.contains(5L) && ids.contains(200L) && !ids.contains(6L))
    // Content == scratch assignment of the composed corpus, same model.
    val scratch = tmpDir("svix-ac2") + "/ix"
    IvfStore.init(spark,
      corpus.where(!col("id").isin(5L, 6L)).unionByName(up), "vec", m,
      scratch)
    assert(searchAll(ix) == searchAll(scratch))
    // Empty batch + metadata: pure-carry snapshot advances the marker.
    val v1 = IvfStore.currentVersion(ix).get
    IvfStore.applyChanges(spark, ix, up.limit(0), up.select("id").limit(0),
      "id", "vec", meta = Map("probe.marker" -> "8"))
    assert(IvfStore.currentVersion(ix).get == v1 + 1)
    assert(SnapshotStore.meta(ix).get("probe.marker").contains("8"))
    assert(searchAll(ix) == searchAll(scratch)) // content untouched
  }
}
