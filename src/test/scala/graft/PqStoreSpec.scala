package graft

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.{IvfIndex, PqIndex}
import graft.store.PqStore

/** PqStore contract: every snapshot is self-contained (codes + the
  * codebooks that wrote them), searches resolve both from ONE pinned
  * version, and a codebook retrain can never bleed into a pinned
  * reader — the bit-identical pre/post-retrain search at the old
  * version is the load-bearing assertion.
  */
class PqStoreSpec extends SparkSpec {
  import spark.implicits._

  private lazy val e = Tables.load(spark, sf(), "embeddings")

  private def qv: Array[Double] = e.where(col("vec_id") === 0L)
    .select("embedding").head().getSeq[Float](0).map(_.toDouble).toArray

  private def search(dir: String, version: Option[Int] = None) =
    PqStore.searchTopK(spark, dir, "vec_id", "embedding", qv,
        k = 10, nprobe = 4, shortlist = 50, version = version)
      .select($"vec_id", $"adc", $"cosine").as[(Long, Double, Double)]
      .collect().toSeq

  test("init: store search == in-session IVF-PQ bit-for-bit; models round-trip exactly") {
    val dir = tmpDir("pqstore-init") + "/idx"
    val (ivf, rm) = PqIndex.trainIvfResidual(e, "vec_id", "embedding",
      kIvf = 16, dim = 64, m = 8, ks = 16)
    val v0 = PqStore.init(spark, e, "embedding", ivf, rm, dir)
    assert(v0 == 0)
    // Doubles round-trip parquet exactly: the read-back model pair is
    // bit-identical to the trained one.
    val (ivf2, rm2) = PqStore.models(spark, dir)
    assert(ivf2.centroids.flatten.toSeq == ivf.centroids.flatten.toSeq)
    assert(rm2.pq.flat.sameElements(rm.pq.flat))
    assert(rm2.anchors.flatten.toSeq == rm.anchors.flatten.toSeq)
    assert((rm2.pq.dim, rm2.pq.m, rm2.pq.ks) == (rm.pq.dim, rm.pq.m, rm.pq.ks))
    // The committed store reproduces the in-session pipeline exactly.
    val inSession = PqIndex.searchTopKResidual(spark,
        PqIndex.encodeResidual(IvfIndex.assign(spark, e, "embedding", ivf),
          "embedding", "ivf_cluster", rm),
        "vec_id", "embedding", "pq_code", ivf, rm, qv,
        k = 10, nprobe = 4, shortlist = 50)
      .select($"vec_id", $"adc", $"cosine").as[(Long, Double, Double)]
      .collect().toSeq
    assert(inSession.nonEmpty)
    assert(search(dir) == inSession)
  }

  test("append encodes with the parent's OWN model; pinned v0 never moves") {
    val dir = tmpDir("pqstore-append") + "/idx"
    val a = e.where(col("vec_id") % 2 === 0)
    val b = e.where(col("vec_id") % 2 === 1)
    val (ivf, rm) = PqIndex.trainIvfResidual(a, "vec_id", "embedding",
      kIvf = 16, dim = 64, m = 8, ks = 16)
    val v0 = PqStore.init(spark, a, "embedding", ivf, rm, dir)
    val before = search(dir, Some(v0))
    val v1 = PqStore.append(spark, b, "embedding", dir)
    assert(v1 == v0 + 1)
    assert(PqStore.read(spark, dir, Some(v1)).count() == e.count())
    // No model argument on append: the batch was encoded with the
    // parent snapshot's pinned model, so the whole head table equals a
    // from-scratch init over the union with that same model.
    val scratch = tmpDir("pqstore-append") + "/scratch"
    PqStore.init(spark, e, "embedding", ivf, rm, scratch)
    assert(search(dir) == search(scratch))
    // The pinned old version still answers identically.
    assert(search(dir, Some(v0)) == before)
  }

  test("retrain via reindex: old-version search is bit-identical pre/post; head decodes with the new codebooks") {
    val dir = tmpDir("pqstore-retrain") + "/idx"
    val (ivf, rm) = PqIndex.trainIvfResidual(e, "vec_id", "embedding",
      kIvf = 16, dim = 64, m = 8, ks = 16)
    val v0 = PqStore.init(spark, e, "embedding", ivf, rm, dir)
    val atV0 = search(dir, Some(v0))
    // Retrain with different Lloyd depth — genuinely different codebooks.
    val (ivfB, rmB) = PqIndex.trainIvfResidual(e, "vec_id", "embedding",
      kIvf = 16, dim = 64, m = 8, ks = 16, itersIvf = 3, itersPq = 3)
    assert(!rmB.pq.flat.sameElements(rm.pq.flat))
    val v1 = PqStore.reindex(spark, dir, ivfB, rmB, "embedding")
    // THE store contract: a reader pinned before the retrain keeps
    // decoding its codes with the codebooks that wrote them —
    // bit-identical results, not merely similar ones.
    assert(search(dir, Some(v0)) == atV0)
    // The head snapshot carries the NEW model with re-encoded codes and
    // matches a from-scratch build under that model.
    assert(PqStore.models(spark, dir, Some(v1))._2.pq.flat
      .sameElements(rmB.pq.flat))
    val scratch = tmpDir("pqstore-retrain") + "/scratch"
    PqStore.init(spark, e, "embedding", ivfB, rmB, scratch)
    assert(search(dir, Some(v1)) == search(scratch))
    // Vacuum ends the old version's time travel; head survives.
    assert(PqStore.vacuum(dir) == 1)
    intercept[Exception] { PqStore.read(spark, dir, Some(v0)).count() }
    assert(search(dir) == search(dir, Some(v1)))
  }

  test("drift lifecycle on the coded layout: quiet resample, drifted trigger, reindex; pins hold") {
    val dir = tmpDir("pqstore-drift") + "/idx"
    val base = e.where(col("vec_id") % 2 === 0)
    val (ivf, rm) = PqIndex.trainIvfResidual(base, "vec_id", "embedding",
      kIvf = 16, dim = 64, m = 8, ks = 16)
    val baseline = IvfIndex.driftStat(spark, base, "embedding", ivf)
    val v0 = PqStore.init(spark, base, "embedding", ivf, rm, dir)
    val atV0 = search(dir, Some(v0))
    // In-distribution resample (fresh ids): drift == baseline, quiet;
    // the batch encodes with the PARENT's pinned models.
    val (v1, r1) = PqStore.appendWithDrift(spark,
      base.select((col("vec_id") + 2000000L).as("vec_id"), col("embedding")),
      "embedding", dir, retrainBelow = 0.9, baselineDrift = baseline)
    assert(v1 == v0 + 1 && !r1.retrainDue)
    val atV1 = search(dir, Some(v1))
    // Drifted batch (reversed vectors): lands AND fires.
    val (v2, r2) = PqStore.appendWithDrift(spark,
      base.select((col("vec_id") + 3000000L).as("vec_id"),
        reverse(col("embedding")).as("embedding")),
      "embedding", dir, retrainBelow = 0.9, baselineDrift = baseline)
    assert(v2 == v1 + 1 && r2.retrainDue)
    assert(r2.drift.exists(_ < 0.9 * baseline))
    // Act on the trigger: retrain BOTH models on the corpus as-is and
    // reindex — codes and codebooks republish together.
    val corpusNow = PqStore.read(spark, dir, Some(v2))
      .select(col("vec_id"), col("embedding"))
    val (ivfB, rmB) = PqIndex.trainIvfResidual(corpusNow, "vec_id",
      "embedding", kIvf = 16, dim = 64, m = 8, ks = 16)
    val v3 = PqStore.reindex(spark, dir, ivfB, rmB, "embedding")
    assert(v3 == v2 + 1)
    // Every pinned version along the lifecycle replays bit-exactly.
    assert(search(dir, Some(v0)) == atV0)
    assert(search(dir, Some(v1)) == atV1)
    assert(PqStore.models(spark, dir, Some(v3))._2.pq.flat
      .sameElements(rmB.pq.flat))
  }

  test("delete rewrites only affected partitions; survivor codes carry byte-identical") {
    val dir = tmpDir("pqstore-del") + "/idx"
    val (ivf, rm) = PqIndex.trainIvfResidual(e, "vec_id", "embedding",
      kIvf = 16, dim = 64, m = 8, ks = 16)
    val v0 = PqStore.init(spark, e, "embedding", ivf, rm, dir)
    val doomed = search(dir, Some(v0)).map(_._1).take(3)
    val v1 = PqStore.delete(spark, dir,
      doomed.toDF("vec_id"), "vec_id")
    assert(v1 == v0 + 1)
    val after = search(dir, Some(v1))
    assert(after.map(_._1).toSet.intersect(doomed.toSet).isEmpty)
    // Deletion never re-encodes: every surviving row's code is
    // byte-identical to its v0 code.
    val codesV0 = PqStore.read(spark, dir, Some(v0))
      .select($"vec_id", $"pq_code").as[(Long, Array[Byte])].collect().toMap
    val codesV1 = PqStore.read(spark, dir, Some(v1))
      .select($"vec_id", $"pq_code").as[(Long, Array[Byte])].collect()
    assert(codesV1.length == codesV0.size - doomed.size)
    codesV1.foreach { case (id, code) =>
      assert(java.util.Arrays.equals(code, codesV0(id)), s"code moved for $id")
    }
    // The model carried into the delete snapshot intact.
    assert(PqStore.models(spark, dir, Some(v1))._2.pq.flat
      .sameElements(rm.pq.flat))
  }
}
