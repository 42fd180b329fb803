package graft

import org.apache.spark.sql.functions._

import graft.operators.PcaProjection

/** PCA model semantics on data with planted structure: the dominant
  * direction is recovered, components are orthonormal with descending
  * eigenvalues, the model is invariant to input partitioning, and the
  * projection matches a driver-side replay.
  */
class PcaProjectionSpec extends SparkSpec {
  import spark.implicits._

  // Planted anisotropy in 6 dims: dim0 swings +-10, dim1 +-2, the rest
  // carry small deterministic "noise".
  private def vec(i: Int): Array[Float] = {
    val big = if (i % 2 == 0) 10f else -10f
    val mid = if (i % 3 == 0) 2f else -2f
    Array(big, mid, (i % 5) * 0.1f, (i % 7) * 0.05f, 0.01f * (i % 11), 0.2f)
  }
  private val data = Seq.tabulate(300)(i => (i.toLong, vec(i)))
    .toDF("vec_id", "embedding")

  test("dominant planted direction recovered; eigenvalues descending") {
    val m = PcaProjection.train(data, "vec_id", "embedding", numComponents = 3)
    assert(math.abs(m.components(0)(0)) > 0.99) // ~e0, the +-10 axis
    assert(m.eigenvalues.sliding(2).forall(w => w(0) >= w(1) - 1e-9))
    assert(m.explainedVariance(1) > 0.9) // the +-10 axis dominates
    assert(m.explainedVariance(3) <= 1.0 + 1e-12)
  }

  test("components orthonormal; sign convention makes the model unique") {
    val m = PcaProjection.train(data, "vec_id", "embedding", numComponents = 3)
    for (a <- m.components.indices; b <- a until m.components.length) {
      val dot = m.components(a).zip(m.components(b)).map(p => p._1 * p._2).sum
      val want = if (a == b) 1.0 else 0.0
      assert(math.abs(dot - want) < 1e-9, s"comp $a . comp $b = $dot")
    }
    m.components.foreach { c =>
      val lead = c.find(x => math.abs(x) > 1e-9)
      assert(lead.forall(_ > 0))
    }
  }

  test("measured recall-vs-compression curve on the test embeddings " +
      "(near-isotropic spectrum: the honest worst case for PCA)") {
    val e = graft.core.Tables.load(spark, sf(), "embeddings")
      .select("vec_id", "embedding").cache()
    val full = e.as[(Long, Array[Float])].collect()
      .map { case (id, v) => id -> v.map(_.toDouble) }.sortBy(_._1).toSeq

    def cos(a: Array[Double], b: Array[Double]) = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      a.indices.foreach { i => d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      d / math.sqrt(na * nb)
    }
    def top10(q: Long, vecs: Seq[(Long, Array[Double])]): Set[Long] = {
      val qv = vecs.find(_._1 == q).get._2
      vecs.filter(_._1 != q).map { case (id, v) => id -> cos(qv, v) }
        .sortBy { case (id, c) => (-c, id) }.take(10).map(_._1).toSet
    }
    val queries = full.map(_._1).take(20)
    val exact = queries.map(q => q -> top10(q, full)).toMap

    val curve = Seq(8, 16, 32).map { dOut =>
      val m = PcaProjection.train(e, "vec_id", "embedding", dOut)
      val red = PcaProjection.project(e, "embedding", m)
        .select(col("vec_id"),
          array((0 until dOut).map(k => col(s"pc$k")): _*).as("pvec"))
        .as[(Long, Array[Double])].collect().toSeq
      val recall = queries.map(q =>
        exact(q).intersect(top10(q, red)).size / 10.0).sum / queries.length
      info(f"PCA-$dOut/64: explained variance ${m.explainedVariance(dOut)}%.2f, " +
        f"mean recall@10 $recall%.2f")
      dOut -> recall
    }
    // The spectrum here is flat (synthetic near-isotropic vectors), so
    // aggressive cuts MUST lose neighbors — the curve is the measurement
    // that tells a user where their corpus sits. Pin monotonicity and
    // the half-dim floor; real text embeddings (decaying spectrum)
    // sit far above this worst case.
    assert(curve.sliding(2).forall(w => w(1)._2 >= w(0)._2))
    assert(curve.last._2 > 0.45)
  }

  test("model invariant to input partitioning; projection matches replay") {
    val m1 = PcaProjection.train(data, "vec_id", "embedding", numComponents = 2)
    val m2 = PcaProjection.train(data.repartition(7), "vec_id", "embedding",
      numComponents = 2)
    assert(m1.components.map(_.toSeq).toSeq == m2.components.map(_.toSeq).toSeq)

    val got = PcaProjection.project(data, "embedding", m1)
      .select("vec_id", "pc0", "pc1")
      .as[(Long, Double, Double)].collect().map(r => r._1 -> ((r._2, r._3)))
      .toMap
    Seq(0, 17, 299).foreach { i =>
      val v = vec(i).map(_.toDouble)
      def replay(k: Int) = {
        var s = 0.0
        v.indices.foreach(j => s += v(j) * m1.components(k)(j))
        BigDecimal(s - m1.meanDot(k))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      }
      assert(got(i.toLong) == ((replay(0), replay(1))))
    }
  }
}
