package graft

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.PqIndex
import graft.store.{MergeStore, PqStore, SnapshotStore}
import graft.streaming.{MergeStoreCdc, StreamingVectorIndex}

/** IVF-PQ lifecycle symmetry: the coded index can FOLLOW its table's
  * change feed through [[PqStore.applyChanges]] — upserts re-encoded
  * with the PARENT snapshot's pinned model pair, deletes partition-
  * granular, marker and revision one atomic publish. A followed index
  * must search identically to a scratch encode of the table's final
  * state under the same model, replays drop whole, and pinned
  * pre-change reads stay bit-identical.
  */
class PqFollowerSpec extends SparkSpec {
  import spark.implicits._

  private lazy val e = Tables.load(spark, sf(), "embeddings")

  private def qv: Array[Double] = e.where(col("vec_id") === 0L)
    .select("embedding").head().getSeq[Float](0).map(_.toDouble).toArray

  private def search(dir: String, version: Option[Int] = None) =
    PqStore.searchTopK(spark, dir, "vec_id", "embedding", qv,
        k = 10, nprobe = 4, shortlist = 50, version = version)
      .select($"vec_id", $"adc", $"cosine").as[(Long, Double, Double)]
      .collect().toSeq

  /** Followed index vs a scratch encode of the table's current state
    * under the SAME model pair — must agree exactly. */
  private def assertMatchesScratch(t: String, ix: String): Unit = {
    val (ivf, rm) = PqStore.models(spark, ix)
    val scratch = tmpDir("pqf-scratch") + "/ix"
    PqStore.init(spark, MergeStore.read(spark, t), "embedding", ivf, rm,
      scratch)
    assert(search(ix) == search(scratch),
      "followed IVF-PQ index diverged from scratch encode")
  }

  test("applyChanges: upsert+delete in one publish, parent model pinned") {
    val t = tmpDir("pqf-apply") + "/tbl"
    val ix = tmpDir("pqf-apply") + "/ix"
    MergeStore.init(spark, e, t, numFiles = 4, clusterBy = Seq("vec_id"))
    val (ivf, rm) = PqIndex.trainIvfResidual(e, "vec_id", "embedding",
      kIvf = 16, dim = 64, m = 8, ks = 16)
    PqStore.init(spark, e, "embedding", ivf, rm, ix)
    val pre = search(ix)
    val v0 = PqStore.currentVersion(ix).get
    // Revise 30 embeddings (delete-old + insert-new must be atomic) and
    // drop 20 others, one publish.
    val revised = e.where(col("vec_id") < 30)
      .withColumn("embedding", reverse(col("embedding")))
    val doomed = spark.range(100L, 120L).select(col("id").as("vec_id"))
    val v1 = PqStore.applyChanges(spark, ix, revised, doomed,
      "vec_id", "embedding", meta = Map("mark" -> "1"))
    assert(v1 == v0 + 1)
    assert(SnapshotStore.markerValue(ix, "mark").contains("1"))
    // Deleted ids gone; revised ids present with NEW codes.
    assert(PqStore.read(spark, ix)
      .where(col("vec_id").between(100L, 119L)).count() == 0)
    assert(PqStore.read(spark, ix).count() == e.count() - 20)
    // Scratch twin: encode the same final state with the same models.
    val finalState = e.where(col("vec_id") >= 30)
      .where(!col("vec_id").between(100L, 119L))
      .unionByName(revised)
    val scratch = tmpDir("pqf-apply-scratch") + "/ix"
    PqStore.init(spark, finalState, "embedding", ivf, rm, scratch)
    assert(search(ix) == search(scratch))
    // Pinned pre-change read is bit-identical.
    assert(search(ix, Some(v0)) == pre)
  }

  test("followed IVF-PQ index equals scratch encode across multi-commit catch-ups") {
    val t = tmpDir("pqf-follow") + "/tbl"
    val ix = tmpDir("pqf-follow") + "/ix"
    val ck = tmpDir("pqf-follow") + "/ck"
    MergeStore.init(spark, e, t, numFiles = 4, clusterBy = Seq("vec_id"))
    val (ivf, rm) = PqIndex.trainIvfResidual(e, "vec_id", "embedding",
      kIvf = 16, dim = 64, m = 8, ks = 16)
    PqStore.init(spark, e, "embedding", ivf, rm, ix,
      meta = Map("ivf.applied" -> "0"))
    assert(StreamingVectorIndex.appliedVersion(ix) == 0)
    // Three source commits, one AvailableNow catch-up run.
    MergeStore.merge(spark, e.where(col("vec_id") < 25)
      .withColumn("embedding", reverse(col("embedding"))), t,
      pk = Seq("vec_id")) // v1
    MergeStore.delete(spark, t,
      spark.range(200L, 230L).select(col("id").as("vec_id")),
      pk = Seq("vec_id")) // v2
    MergeStore.merge(spark, e.where(col("vec_id").between(200L, 209L)), t,
      pk = Seq("vec_id")) // v3
    StreamingVectorIndex.follow(spark, t, ix, "vec_id", "embedding", ck,
        store = StreamingVectorIndex.IvfPq)
      .awaitTermination()
    assert(StreamingVectorIndex.appliedVersion(ix) == 3)
    assertMatchesScratch(t, ix)
    // The follower never retrains: codebooks bit-identical to init's.
    val (_, rmNow) = PqStore.models(spark, ix)
    assert(rmNow.pq.flat.sameElements(rm.pq.flat))
    // Resume from checkpoint: only the new span applies.
    MergeStore.merge(spark, e.where(col("vec_id").between(300L, 320L))
      .withColumn("embedding", reverse(col("embedding"))), t,
      pk = Seq("vec_id")) // v4
    StreamingVectorIndex.follow(spark, t, ix, "vec_id", "embedding", ck,
        store = StreamingVectorIndex.IvfPq)
      .awaitTermination()
    assert(StreamingVectorIndex.appliedVersion(ix) == 4)
    assertMatchesScratch(t, ix)
  }

  test("replayed batch drops whole; pinned old version bit-identical") {
    val t = tmpDir("pqf-replay") + "/tbl"
    val ix = tmpDir("pqf-replay") + "/ix"
    MergeStore.init(spark, e, t, numFiles = 2, clusterBy = Seq("vec_id"))
    val (ivf, rm) = PqIndex.trainIvfResidual(e, "vec_id", "embedding",
      kIvf = 16, dim = 64, m = 8, ks = 16)
    PqStore.init(spark, e, "embedding", ivf, rm, ix,
      meta = Map("ivf.applied" -> "0"))
    val pre = search(ix)
    val vInit = PqStore.currentVersion(ix).get
    MergeStore.merge(spark, e.where(col("vec_id") < 40)
      .withColumn("embedding", reverse(col("embedding"))), t,
      pk = Seq("vec_id")) // v1
    MergeStore.delete(spark, t,
      spark.range(60L, 90L).select(col("id").as("vec_id")),
      pk = Seq("vec_id")) // v2
    val batch = MergeStoreCdc.changesByCommit(spark, t, Seq("vec_id"),
      includePreimages = false, fromVersion = 0, toVersion = 2)
    assert(StreamingVectorIndex.applyCdcBatch(batch, ix, "vec_id",
      "embedding", StreamingVectorIndex.IvfPq))
    assert(StreamingVectorIndex.appliedVersion(ix) == 2)
    val vAfter = PqStore.currentVersion(ix).get
    assert(vAfter == vInit + 1) // ONE publish for the whole batch
    assertMatchesScratch(t, ix)
    // Replay: dropped whole, no snapshot burned.
    assert(!StreamingVectorIndex.applyCdcBatch(batch, ix, "vec_id",
      "embedding", StreamingVectorIndex.IvfPq))
    assert(PqStore.currentVersion(ix).get == vAfter)
    // Time travel: the pre-change snapshot answers bit-identically —
    // its codes decode with its own codebooks, untouched by the follow.
    assert(search(ix, Some(vInit)) == pre)
  }
}
