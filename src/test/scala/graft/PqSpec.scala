package graft

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.{IvfIndex, PqIndex, Similarity}

/** Product-quantization semantics: distributed encode == driver twin,
  * ADC error bounded on the real corpus, exact-parameter degeneration to
  * brute force, and measured recall at the q60 operating point.
  */
class PqSpec extends SparkSpec {
  import spark.implicits._

  private lazy val e = Tables.load(spark, sf(), "embeddings")
  private lazy val pq = PqIndex.train(e, "vec_id", "embedding",
    dim = 64, m = 8, ks = 16)

  test("train is deterministic: identical codebooks across runs") {
    val again = PqIndex.train(e, "vec_id", "embedding", dim = 64, m = 8, ks = 16)
    assert(pq.flat.sameElements(again.flat))
  }

  test("distributed encode == driver-twin encodeVec on every row") {
    val got = PqIndex.encode(e, "embedding", pq)
      .select($"vec_id", $"pq_code").as[(Long, Array[Byte])]
      .collect().toMap
    val raw = e.select($"vec_id", $"embedding").as[(Long, Array[Float])].collect()
    assert(raw.nonEmpty)
    raw.foreach { case (id, v) =>
      val want = pq.encodeVec(v.map(_.toDouble))
      assert(java.util.Arrays.equals(got(id), want), s"vec $id code mismatch")
    }
    assert(got.values.head.length == 8) // 8-byte codes: 32x vs 64 floats
  }

  test("ADC error vs exact dot is bounded on the real corpus") {
    // Unit-norm corpus: dot == cosine in [-1, 1]. At m=8/ks=16 the error
    // scale is sum_j ||q_j||*||residual_j|| — with ||q_j|| ~ 0.35 and
    // per-subspace residuals ~ 0.1-0.2, mean |adc - dot| lands < 0.1 with
    // a worst-case tail near 0.5 (measured: mean 0.074, max 0.51). The
    // MEAN bound is the load-bearing one — a broken kernel (wrong LUT
    // index order, signed-byte mixup) shifts the mean to O(0.5), not the
    // tail; rank quality is separately pinned by the recall tests below.
    val raw = e.select($"vec_id", $"embedding").as[(Long, Array[Float])]
      .collect().take(200)
    val qv = raw.find(_._1 == 0L).get._2.map(_.toDouble)
    val lut = pq.lutFor(qv)
    val errs = raw.map { case (_, v) =>
      val vd = v.map(_.toDouble)
      val exact = vd.zip(qv).map { case (a, b) => a * b }.sum
      val adc = pq.adcDot(pq.encodeVec(vd), lut)
      math.abs(adc - exact)
    }
    assert(errs.max < 0.7, s"max ADC error ${errs.max}")
    assert(errs.sum / errs.length < 0.1, s"mean ADC error ${errs.sum / errs.length}")
  }

  test("nprobe=k + shortlist=n degenerates to exact brute-force top-k") {
    val ivf = IvfIndex.train(e, "vec_id", "embedding", k = 16)
    val qv = e.where($"vec_id" === 0L).select("embedding")
      .head().getSeq[Float](0).map(_.toDouble).toArray
    val n = e.count().toInt
    val indexed = PqIndex.encode(IvfIndex.assign(spark, e, "embedding", ivf),
      "embedding", pq)
    val got = PqIndex.searchTopK(spark, indexed, "vec_id", "embedding",
        "pq_code", ivf, pq, qv, k = 10, nprobe = 16, shortlist = n)
      .select("vec_id", "cosine").as[(Long, Double)].collect().toSeq
    val want = Similarity.topKNeighbors(spark, e, "vec_id", "embedding",
        queryId = 0L, k = 10)
      .select("vec_id", "cosine").as[(Long, Double)].collect().toSeq
    assert(got.sortBy(r => (-r._2, r._1)) == want.sortBy(r => (-r._2, r._1)))
  }

  private lazy val ivfM = IvfIndex.train(e, "vec_id", "embedding", k = 16)
  private lazy val pqRes = PqIndex.trainResidual(e, "vec_id", "embedding",
    ivfM, dim = 64, m = 8, ks = 16)

  test("residual encode == driver-twin residualOf + encodeVec on every row") {
    val got = PqIndex.encodeResidual(
        IvfIndex.assign(spark, e, "embedding", ivfM), "embedding",
        "ivf_cluster", pqRes)
      .select($"vec_id", $"pq_code").as[(Long, Array[Byte])]
      .collect().toMap
    val raw = e.select($"vec_id", $"embedding").as[(Long, Array[Float])].collect()
    raw.foreach { case (id, v) =>
      val vd = v.map(_.toDouble)
      val want = pqRes.pq.encodeVec(
        pqRes.residualOf(vd, PqIndex.assignOf(ivfM, vd)))
      assert(java.util.Arrays.equals(got(id), want), s"vec $id residual code mismatch")
    }
  }

  test("residual codes cut ADC error and lift recall@10 at the same m/ks") {
    // Same corpus, same 8-byte budget: the residual model quantizes
    // v - centroid, whose magnitude is a fraction of v's, so per-subspace
    // quantization cells are finer. Both claims measured against the raw
    // model trained above.
    val raw = e.select($"vec_id", $"embedding").as[(Long, Array[Float])].collect()
    val qv = raw.find(_._1 == 0L).get._2.map(_.toDouble)
    val lutRaw = pq.lutFor(qv)
    val lutRes = pqRes.pq.lutFor(qv)
    val errs = raw.map { case (_, v) =>
      val vd = v.map(_.toDouble)
      val exact = vd.zip(qv).map { case (a, b) => a * b }.sum
      val eRaw = math.abs(pq.adcDot(pq.encodeVec(vd), lutRaw) - exact)
      val c = PqIndex.assignOf(ivfM, vd)
      val r = pqRes.residualOf(vd, c)
      val eRes = math.abs(pqRes.pq.adcDot(pqRes.pq.encodeVec(r), lutRes)
        + pqRes.anchorDot(qv, c) - exact)
      (eRaw, eRes)
    }
    val meanRaw = errs.map(_._1).sum / errs.length
    val meanRes = errs.map(_._2).sum / errs.length
    info(f"mean ADC |err|: raw $meanRaw%.4f -> residual $meanRes%.4f")
    assert(meanRes < meanRaw,
      s"residual ADC error $meanRes not below raw $meanRaw")

    // Recall at a deliberately ADC-stressed point: probe everything so
    // shortlist quality is the ONLY variable, and keep the shortlist just
    // above k so ADC ordering errors actually cost recall.
    val exactTop = Similarity.topKNeighbors(spark, e, "vec_id", "embedding",
        queryId = 0L, k = 10)
      .select("vec_id").as[Long].collect().toSet
    val assigned = IvfIndex.assign(spark, e, "embedding", ivfM)
    def recallOf(got: Set[Long]): Double =
      (got & exactTop).size.toDouble / exactTop.size
    val rRaw = recallOf(
      PqIndex.searchTopK(spark, PqIndex.encode(assigned, "embedding", pq),
          "vec_id", "embedding", "pq_code", ivfM, pq, qv,
          k = 10, nprobe = 16, shortlist = 15)
        .select("vec_id").as[Long].collect().toSet)
    val rRes = recallOf(
      PqIndex.searchTopKResidual(spark,
          PqIndex.encodeResidual(assigned, "embedding", "ivf_cluster", pqRes),
          "vec_id", "embedding", "pq_code", ivfM, pqRes, qv,
          k = 10, nprobe = 16, shortlist = 15)
        .select("vec_id").as[Long].collect().toSet)
    info(f"recall@10 (nprobe=16, shortlist=15): raw $rRaw%.2f -> residual $rRes%.2f")
    assert(rRes >= rRaw, s"residual recall $rRes below raw $rRaw")
  }

  test("residual search degenerates to exact at nprobe=k, shortlist=n") {
    val qv = e.where($"vec_id" === 0L).select("embedding")
      .head().getSeq[Float](0).map(_.toDouble).toArray
    val n = e.count().toInt
    val indexed = PqIndex.encodeResidual(
      IvfIndex.assign(spark, e, "embedding", ivfM), "embedding",
      "ivf_cluster", pqRes)
    val got = PqIndex.searchTopKResidual(spark, indexed, "vec_id", "embedding",
        "pq_code", ivfM, pqRes, qv, k = 10, nprobe = 16, shortlist = n)
      .select("vec_id", "cosine").as[(Long, Double)].collect().toSeq
    val want = Similarity.topKNeighbors(spark, e, "vec_id", "embedding",
        queryId = 0L, k = 10)
      .select("vec_id", "cosine").as[(Long, Double)].collect().toSeq
    assert(got.sortBy(r => (-r._2, r._1)) == want.sortBy(r => (-r._2, r._1)))
  }

  test("recall at the q60 operating point (nprobe=4, shortlist=50)") {
    val ivf = IvfIndex.train(e, "vec_id", "embedding", k = 16)
    val qv = e.where($"vec_id" === 0L).select("embedding")
      .head().getSeq[Float](0).map(_.toDouble).toArray
    val indexed = PqIndex.encode(IvfIndex.assign(spark, e, "embedding", ivf),
      "embedding", pq)
    val got = PqIndex.searchTopK(spark, indexed, "vec_id", "embedding",
        "pq_code", ivf, pq, qv, k = 10, nprobe = 4, shortlist = 50)
      .select("vec_id").as[Long].collect().toSet
    val exact = Similarity.topKNeighbors(spark, e, "vec_id", "embedding",
        queryId = 0L, k = 10)
      .select("vec_id").as[Long].collect().toSet
    val recall = (got & exact).size.toDouble / exact.size
    assert(recall >= 0.5, s"recall@10 $recall") // floor; measured ~0.8+
  }
}
