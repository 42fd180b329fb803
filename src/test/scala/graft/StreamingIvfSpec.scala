package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.core.Tables
import graft.operators.IvfIndex

/** Incremental ANN indexing: IVF assignment is a stateless codegen
  * projection, so it runs unchanged inside Structured Streaming — new
  * embeddings stream in, get their nearest-centroid cluster from the
  * (frozen) trained model, and append into the cluster-partitioned table
  * that probes read with partition pruning. This is the "index new data
  * as it arrives" path of the ANN story; training stays an offline
  * driver-side step on a bounded sample.
  */
class StreamingIvfSpec extends SparkSpec {

  test("streaming assign == batch assign; appended table stays searchable") {
    val emb = Tables.load(spark, sf(), "embeddings")
    val model = IvfIndex.train(emb, "vec_id", "embedding", k = 8)

    // Stage the corpus as parquet files (2 file-batches) for a file stream.
    val srcDir = tmpDir("ivf-stream-src")
    emb.where(col("vec_id") % 2 === 0).write.parquet(srcDir + "/b0")
    emb.where(col("vec_id") % 2 === 1).write.parquet(srcDir + "/b1")

    val outDir = tmpDir("ivf-stream-out")
    val ckpt = tmpDir("ivf-stream-ckpt")
    val stream = spark.readStream
      .schema(emb.schema)
      .option("maxFilesPerTrigger", 1) // two micro-batches, incremental
      .parquet(srcDir + "/b*")
    val assigned = IvfIndex.assign(spark, stream, "embedding", model)
    val q = assigned.writeStream
      .format("parquet")
      .option("checkpointLocation", ckpt)
      .option("path", outDir)
      .partitionBy("ivf_cluster")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val streamed = spark.read.parquet(outDir)
    val batch = IvfIndex.assign(spark, emb, "embedding", model)
    // identical assignment for every vector
    assert(streamed.count() == emb.count())
    assert(streamed.select("vec_id", "ivf_cluster")
      .except(batch.select("vec_id", "ivf_cluster")).isEmpty)

    // and the streamed table answers probes exactly like the batch index
    val qv = emb.where(col("vec_id") === 0L)
      .select("embedding").head.getSeq[Float](0).map(_.toDouble).toArray
    val fromStream = IvfIndex.searchTopK(spark, streamed, "vec_id",
      "embedding", model, qv, k = 5, nprobe = 3).collect().toSeq
    val fromBatch = IvfIndex.searchTopK(spark, batch, "vec_id",
      "embedding", model, qv, k = 5, nprobe = 3).collect().toSeq
    assert(fromStream == fromBatch)
  }

  test("streaming ANN search == batch knnJoinApprox for the same queries") {
    val emb = Tables.load(spark, sf(), "embeddings")
    val model = IvfIndex.train(emb, "vec_id", "embedding", k = 8)
    // Static corpus side: the assigned cluster-partitioned table.
    val corpusDir = tmpDir("ann-corpus") + "/t"
    IvfIndex.assign(spark, emb, "embedding", model)
      .write.partitionBy("ivf_cluster").parquet(corpusDir)
    val corpus = spark.read.parquet(corpusDir)
    // Query stream: 40 vectors arriving as two file micro-batches.
    val queries = emb.where(col("vec_id") < 40)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val srcDir = tmpDir("ann-stream-src")
    queries.where(col("query_id") % 2 === 0).write.parquet(srcDir + "/b0")
    queries.where(col("query_id") % 2 === 1).write.parquet(srcDir + "/b1")
    val outDir = tmpDir("ann-stream-out") + "/t"
    val q = graft.streaming.StreamingAnn.searchStream(
      spark.readStream.schema(queries.schema)
        .option("maxFilesPerTrigger", 1).parquet(srcDir + "/b*"),
      "query_id", corpus, "vec_id", "embedding", model,
      k = 5, nprobe = 3,
      outDir = outDir, checkpointDir = tmpDir("ann-stream-ckpt"))
    q.awaitTermination()
    val streamed = spark.read.parquet(outDir)
      .select("src", "dst", "cosine", "rk")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getInt(3))).toSeq.sorted
    val batchRes = IvfIndex.knnJoinApprox(spark, queries, "query_id",
        corpus, "vec_id", "embedding", model, k = 5, nprobe = 3)
      .select("src", "dst", "cosine", "rk")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getInt(3))).toSeq.sorted
    // Bit-identical: every query's streamed top-k equals the batch join's.
    assert(streamed == batchRes)
    assert(streamed.map(_._1).distinct.size == 40)
  }

  test("streaming ANN over a pinned IvfStore snapshot ignores a later append") {
    import graft.store.IvfStore
    val emb = Tables.load(spark, sf(), "embeddings")
    val a = emb.where(col("vec_id") % 2 === 0)
    val b = emb.where(col("vec_id") % 2 === 1)
    val model = IvfIndex.train(a, "vec_id", "embedding", k = 8)
    val dir = tmpDir("ann-pin") + "/idx"
    val v0 = IvfStore.init(spark, a, "embedding", model, dir)
    val queries = emb.where(col("vec_id") < 40)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val srcDir = tmpDir("ann-pin-src")
    queries.where(col("query_id") % 2 === 0).write.parquet(srcDir + "/b0")
    queries.where(col("query_id") % 2 === 1).write.parquet(srcDir + "/b1")
    // The index moves on AFTER the pin: an append lands v1 before the
    // stream processes a single batch.
    IvfStore.append(spark, b, "embedding", model, dir)
    val outDir = tmpDir("ann-pin-out") + "/t"
    graft.streaming.StreamingAnn.searchStream(
      spark.readStream.schema(queries.schema)
        .option("maxFilesPerTrigger", 1).parquet(srcDir + "/b*"),
      "query_id", dir, Some(v0), "vec_id", "embedding",
      k = 5, nprobe = 3, outDir = outDir,
      checkpointDir = tmpDir("ann-pin-ckpt")).awaitTermination()
    def res(df: org.apache.spark.sql.DataFrame) = df
      .select("src", "dst", "cosine", "rk")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getInt(3))).toSeq.sorted
    val streamed = res(spark.read.parquet(outDir))
    // Bit-identical to the batch probe over the store's PINNED
    // snapshot — corpus AND model resolved from the same version.
    val pinned = res(IvfIndex.knnJoinApprox(spark, queries, "query_id",
      IvfStore.read(spark, dir, Some(v0)), "vec_id", "embedding",
      IvfStore.model(spark, dir, Some(v0)), k = 5, nprobe = 3))
    assert(streamed == pinned)
    // ...and provably NOT the head's answer: every odd query's own
    // vector (cosine 1.0) lives only in the appended v1.
    val head = res(IvfIndex.knnJoinApprox(spark, queries, "query_id",
      IvfStore.read(spark, dir), "vec_id", "embedding",
      IvfStore.model(spark, dir), k = 5, nprobe = 3))
    assert(streamed != head)
  }

  test("IvfStore: legacy (pre-model) snapshot fails loudly with the migration error") {
    import scala.jdk.CollectionConverters._
    import spark.implicits._
    import graft.store.IvfStore
    val emb = Tables.load(spark, sf(), "embeddings")
    val model = IvfIndex.train(emb, "vec_id", "embedding", k = 8)
    val dir = tmpDir("ivf-legacy") + "/idx"
    IvfStore.init(spark, emb, "embedding", model, dir)
    // Simulate a pre-upgrade snapshot: published before models rode
    // snapshots, so no model/ directory exists.
    val modelDir = java.nio.file.Paths.get(
      graft.store.SnapshotStore.resolve(dir, Some(0)), "model")
    java.nio.file.Files.walk(modelDir).iterator().asScala.toSeq.reverse
      .foreach(java.nio.file.Files.deleteIfExists)
    val e1 = intercept[IllegalStateException] { IvfStore.model(spark, dir) }
    assert(e1.getMessage.contains("legacy IVF snapshot"))
    // delete() fails BEFORE staging anything (the carry would otherwise
    // die mid-walk with NoSuchFileException after files were staged).
    val e2 = intercept[IllegalStateException] {
      IvfStore.delete(spark, dir, Seq(0L).toDF("vec_id"), "vec_id")
    }
    assert(e2.getMessage.contains("legacy IVF snapshot"))
    // Pinned vector reads keep working — the caller-held-model path.
    assert(IvfStore.read(spark, dir).count() == emb.count())
  }

  test("IvfStore: atomic snapshot publish — pinned readers, link-carried appends, vacuum") {
    import graft.store.IvfStore
    import spark.implicits._
    val emb = Tables.load(spark, sf(), "embeddings")
    val model = IvfIndex.train(emb, "vec_id", "embedding", k = 8)
    val a = emb.where(col("vec_id") % 2 === 0)
    val b = emb.where(col("vec_id") % 2 === 1)
    val dir = tmpDir("ivf-store")
    val v0 = IvfStore.init(spark, a, "embedding", model, dir)
    val v0Rows = IvfStore.read(spark, dir, Some(v0))
      .select("vec_id").as[Long].collect().sorted.toSeq
    val v1 = IvfStore.append(spark, b, "embedding", model, dir)
    // Pinned v0 reader: still exactly the first half, complete.
    assert(IvfStore.read(spark, dir, Some(v0))
      .select("vec_id").as[Long].collect().sorted.toSeq == v0Rows)
    // Head: the full corpus with assignments identical to assign-at-once.
    val head = IvfStore.read(spark, dir)
    assert(head.count() == emb.count())
    assert(head.select("vec_id", "ivf_cluster")
      .except(IvfIndex.assign(spark, emb, "embedding", model)
        .select("vec_id", "ivf_cluster")).isEmpty)
    // Probes against the store read == probes against a raw assigned table.
    val qv = emb.where(col("vec_id") === 0L)
      .select("embedding").head.getSeq[Float](0).map(_.toDouble).toArray
    val fromStore = IvfIndex.searchTopK(spark, head, "vec_id",
      "embedding", model, qv, k = 5, nprobe = 3).collect().toSeq
    val fromRaw = IvfIndex.searchTopK(spark,
      IvfIndex.assign(spark, emb, "embedding", model), "vec_id",
      "embedding", model, qv, k = 5, nprobe = 3).collect().toSeq
    assert(fromStore == fromRaw)
    // Vacuum below head: v0 gone (loud at resolve), head intact — the
    // hard-link carry means shared data files survive snap-0's removal.
    assert(IvfStore.vacuum(dir) == 1)
    intercept[Exception] { IvfStore.read(spark, dir, Some(v0)).count() }
    assert(IvfStore.read(spark, dir, Some(v1)).count() == emb.count())
  }

  test("IvfStore.delete: partition-granular rewrite, unaffected clusters hard-link carry") {
    import graft.store.IvfStore
    import spark.implicits._
    val emb = Tables.load(spark, sf(), "embeddings")
    val model = IvfIndex.train(emb, "vec_id", "embedding", k = 8)
    val dir = tmpDir("ivf-del")
    val v0 = IvfStore.init(spark, emb, "embedding", model, dir)
    // Doom every id in ONE cluster plus a couple of strays, so some
    // partitions are affected and some are provably untouched.
    val assigned = IvfIndex.assign(spark, emb, "embedding", model)
    val targetCluster = assigned.groupBy("ivf_cluster").count()
      .orderBy(col("count").desc).select("ivf_cluster").head.getInt(0)
    val doomed = assigned.where(col("ivf_cluster") === targetCluster)
      .select("vec_id").limit(10)
      .unionByName(emb.select("vec_id").orderBy("vec_id").limit(2))
      .distinct()
    val doomedIds = doomed.as[Long].collect().toSet
    val v1 = IvfStore.delete(spark, dir, doomed, "vec_id")
    assert(v1 == v0 + 1)
    // Survivors exactly; assignments untouched for the rest.
    val head = IvfStore.read(spark, dir)
    assert(head.select("vec_id").as[Long].collect().toSet ==
      emb.select("vec_id").as[Long].collect().toSet -- doomedIds)
    assert(head.select("vec_id", "ivf_cluster")
      .except(assigned.join(doomed, Seq("vec_id"), "left_anti")
        .select("vec_id", "ivf_cluster")).isEmpty)
    // Pinned v0 still holds the victims; unaffected partitions in v1
    // are hard-link carries (carry- prefixed files), affected ones are
    // fresh rewrites (no carry files).
    assert(IvfStore.read(spark, dir, Some(v0)).count() == emb.count())
    val affectedClusters = assigned.join(doomed, Seq("vec_id"), "left_semi")
      .select("ivf_cluster").distinct().as[Int].collect().toSet
    val vecDir = java.nio.file.Paths.get(
      graft.store.SnapshotStore.resolve(dir, Some(v1)), "vectors")
    java.nio.file.Files.list(vecDir).iterator().forEachRemaining { p =>
      val name = p.getFileName.toString
      if (name.startsWith("ivf_cluster=")) {
        val c = name.stripPrefix("ivf_cluster=").toInt
        val files = java.nio.file.Files.list(p).iterator()
        var carried = 0; var fresh = 0
        files.forEachRemaining { f =>
          if (f.getFileName.toString.startsWith("carry-")) carried += 1
          else if (f.getFileName.toString.endsWith(".parquet")) fresh += 1
        }
        if (affectedClusters.contains(c))
          assert(carried == 0 && fresh > 0, s"cluster $c should be rewritten")
        else
          assert(carried > 0 && fresh == 0, s"cluster $c should be carried")
      }
    }
    // Deleting ids that match nothing is a no-op (no new version).
    assert(IvfStore.delete(spark, dir,
      Seq(99999999L).toDF("vec_id"), "vec_id") == v1)
  }

  test("IvfStore snapshots are self-contained: model rides every publish; time travel keeps the OLD model") {
    import graft.store.IvfStore
    val emb = Tables.load(spark, sf(), "embeddings")
    val a = emb.where(col("vec_id") % 2 === 0)
    val b = emb.where(col("vec_id") % 2 === 1)
    val modelA = IvfIndex.train(a, "vec_id", "embedding", k = 8)
    val dir = tmpDir("ivf-model")
    val v0 = IvfStore.init(spark, a, "embedding", modelA, dir)
    // Read-back centroids are bit-identical (doubles round-trip parquet).
    assert(IvfStore.model(spark, dir).centroids.map(_.toSeq).toSeq ==
      modelA.centroids.map(_.toSeq).toSeq)
    val qv = emb.where(col("vec_id") === 0L)
      .select("embedding").head.getSeq[Float](0).map(_.toDouble).toArray
    val preRetrain = IvfStore.searchTopK(spark, dir, "vec_id", "embedding",
      qv, k = 5, nprobe = 3).collect().toSeq
    // Drift retrain: the append publishes NEW model + vectors in ONE
    // snapshot; the old version still resolves the OLD model.
    val modelB = IvfIndex.train(emb, "vec_id", "embedding", k = 8,
      seed = 7L)
    val v1 = IvfStore.append(spark, b, "embedding", modelB, dir)
    assert(IvfStore.model(spark, dir, Some(v1)).centroids.map(_.toSeq).toSeq
      == modelB.centroids.map(_.toSeq).toSeq)
    assert(IvfStore.model(spark, dir, Some(v0)).centroids.map(_.toSeq).toSeq
      == modelA.centroids.map(_.toSeq).toSeq)
    // Pinned search at v0 reproduces the pre-retrain results bit-for-bit
    // — version and model can never mismatch, both resolve from one
    // snapshot.
    assert(IvfStore.searchTopK(spark, dir, "vec_id", "embedding", qv,
      k = 5, nprobe = 3, version = Some(v0)).collect().toSeq == preRetrain)
    // Delete carries the parent's model into its snapshot (no retrain).
    val v2 = IvfStore.delete(spark, dir,
      emb.where(col("vec_id") % 7 === 0).select("vec_id"), "vec_id")
    assert(IvfStore.model(spark, dir, Some(v2)).centroids.map(_.toSeq).toSeq
      == modelB.centroids.map(_.toSeq).toSeq)
  }

  test("IvfStore.appendWithDrift: one scored pass lands the batch atomically AND fires the retrain trigger") {
    import graft.store.IvfStore
    val emb = Tables.load(spark, sf(), "embeddings")
    val a = emb.where(col("vec_id") % 2 === 0)
    // Model + baseline on the training distribution (the full corpus),
    // the operational convention driftStat documents.
    val model = IvfIndex.train(emb, "vec_id", "embedding", k = 8)
    val baseline = IvfIndex.driftStat(spark, emb, "embedding", model)
    val dir = tmpDir("ivf-drift-store")
    IvfStore.init(spark, a, "embedding", model, dir)
    // In-distribution batch: lands, measures, no retrain.
    val b = emb.where(col("vec_id") % 2 === 1)
    val (v1, r1) = IvfStore.appendWithDrift(spark, b, "embedding", model,
      dir, retrainBelow = 0.9, baselineDrift = baseline)
    assert(v1 == 1 && r1.appended.contains(b.count()) && !r1.retrainDue)
    assert(IvfStore.read(spark, dir).count() == emb.count())
    // Drifted batch (vectors reversed — same trick as IvfSpec's drift
    // test): the trigger must fire; the batch still lands (the caller
    // decides what to do about the drift).
    val drifted = emb.select(col("vec_id") + 1000000,
        reverse(col("embedding")).as("embedding"))
      .toDF("vec_id", "embedding")
    val (v2, r2) = IvfStore.appendWithDrift(spark, drifted, "embedding",
      model, dir, retrainBelow = 0.9, baselineDrift = baseline)
    assert(v2 == 2 && r2.retrainDue)
    assert(r2.drift.exists(_ < 0.9 * baseline))
    // Every snapshot stays self-contained (model rides each publish).
    assert(IvfStore.model(spark, dir, Some(v2)).centroids.length == 8)
  }

  test("IVF drift lifecycle end-to-end: ingest → trigger → retrain → re-append, every pinned version bit-exact") {
    import graft.store.IvfStore
    import spark.implicits._
    val emb = Tables.load(spark, sf(), "embeddings")
    val base = emb.where(col("vec_id") % 3 === 0)
    val model0 = IvfIndex.train(base, "vec_id", "embedding", k = 8)
    val baseline0 = IvfIndex.driftStat(spark, base, "embedding", model0)
    val dir = tmpDir("ivf-lifecycle") + "/idx"
    IvfStore.init(spark, base, "embedding", model0, dir) // v0
    val qv = emb.where(col("vec_id") === 0L).select("embedding")
      .head().getSeq[Float](0).map(_.toDouble).toArray
    def searchAt(v: Int) = IvfStore.searchTopK(spark, dir, "vec_id",
        "embedding", qv, k = 5, nprobe = 3, version = Some(v))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val pinned = scala.collection.mutable.Map(0 -> searchAt(0))
    // Trickle 1: in-distribution (a fresh-id resample of the training
    // population — its drift IS the baseline) — lands atomically,
    // trigger quiet.
    val b1 = base.select((col("vec_id") + 2000000L).as("vec_id"),
      col("embedding"))
    val (v1, r1) = IvfStore.appendWithDrift(spark, b1, "embedding",
      model0, dir, retrainBelow = 0.9, baselineDrift = baseline0)
    assert(!r1.retrainDue, s"drift ${r1.drift} baseline $baseline0")
    pinned(v1) = searchAt(v1)
    // Trickle 2: drifted distribution (reversed vectors, fresh ids) —
    // the batch still LANDS (the caller owns the reaction), and the
    // SAME scored pass reports retrainDue.
    val b2 = emb.where(col("vec_id") % 3 === 2)
      .select((col("vec_id") + 1000000L).as("vec_id"),
        reverse(col("embedding")).as("embedding"))
    val (v2, r2) = IvfStore.appendWithDrift(spark, b2, "embedding",
      model0, dir, retrainBelow = 0.9, baselineDrift = baseline0)
    assert(r2.retrainDue && r2.drift.exists(_ < 0.9 * baseline0))
    pinned(v2) = searchAt(v2)
    // Act on the trigger — orchestration, exactly as documented: train
    // a NEW model + baseline on the corpus as it now is (old + drifted
    // mass), and append subsequent batches with it; the new model
    // publishes INSIDE that snapshot.
    val corpusNow = IvfStore.read(spark, dir, Some(v2))
      .select(col("vec_id"), col("embedding"))
    val model1 = IvfIndex.train(corpusNow, "vec_id", "embedding", k = 8)
    val baseline1 = IvfIndex.driftStat(spark, corpusNow, "embedding", model1)
    val b3 = corpusNow.select((col("vec_id") + 4000000L).as("vec_id"),
      col("embedding")) // fresh-id resample of the NEW mixed population
    val (v3, r3) = IvfStore.appendWithDrift(spark, b3, "embedding",
      model1, dir, retrainBelow = 0.9, baselineDrift = baseline1)
    assert(!r3.retrainDue, // the refreshed baseline covers the new mix
      s"drift ${r3.drift} baseline $baseline1")
    pinned(v3) = searchAt(v3)
    assert(IvfStore.read(spark, dir, Some(v3)).count() ==
      base.count() + b1.count() + b2.count() + b3.count())
    // THE lifecycle guarantee: every version along the way replays
    // bit-exactly — vectors AND the model that assigned them resolve
    // from each pinned snapshot, so neither the drift trigger nor the
    // retrain ever moved a committed read.
    pinned.foreach { case (v, want) =>
      assert(searchAt(v) == want, s"pinned version $v moved") }
    // Each snapshot carries the model that published it: v0-v2 the
    // original, v3 the retrained one.
    assert(IvfStore.model(spark, dir, Some(v2)).centroids.flatten.toSeq ==
      model0.centroids.flatten.toSeq)
    assert(IvfStore.model(spark, dir, Some(v3)).centroids.flatten.toSeq ==
      model1.centroids.flatten.toSeq)
  }

  test("IvfStore.delete refuses a non-integral cluster column (partition-path escaping hazard)") {
    import graft.store.{IvfStore, SnapshotStore}
    import spark.implicits._
    // Hand-build a snapshot whose cluster column is a STRING: the raw
    // dir-name match in delete's carry step would miss escaped values,
    // duplicating survivors — the guard must refuse loudly instead.
    val dir = tmpDir("ivf-strcluster")
    val stage = SnapshotStore.stage(dir)
    Seq((1L, "a b"), (2L, "c")).toDF("vec_id", "ivf_cluster")
      .write.partitionBy("ivf_cluster").parquet(s"$stage/vectors")
    SnapshotStore.publish(dir, stage, -1)
    val e = intercept[IllegalArgumentException] {
      IvfStore.delete(spark, dir, Seq(1L).toDF("vec_id"), "vec_id")
    }
    assert(e.getMessage.contains("integral"))
  }
}
