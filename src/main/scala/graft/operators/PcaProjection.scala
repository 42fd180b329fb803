package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.expressions.VectorExpressions

/** PCA dimensionality reduction for embedding columns — the FAISS
  * `PCAMatrix`/PCAR preprocessing step: project d-dim vectors onto the
  * top-d' principal directions before indexing, shrinking every
  * downstream ANN structure (and its shuffles) by d'/d at a measured
  * recall cost.
  *
  * Same deterministic-model discipline as [[IvfIndex]]/[[PqIndex]]:
  *
  *   1. [[train]] reads a BOUNDED hash-ordered sample (training never
  *      scans the corpus), builds the d×d covariance on the driver, and
  *      eigendecomposes it with a cyclic Jacobi sweep — no external
  *      solver, fully deterministic for a given (data, seed), signs
  *      normalized so the model is unique.
  *   2. [[project]] is one codegen'd projection per output dim: the
  *      native `dot_product` kernel against a LITERAL component row,
  *      minus the precomputed scalar mean·component (centering folded
  *      into a constant — (v−μ)·c = v·c − μ·c, so the hot loop never
  *      materializes a centered copy). Components travel as literals:
  *      no shuffle, no join, no interpreted lambda.
  *
  * The sequential multiply-accumulate of `dot_product` matches a
  * left-associated explicit sum in SQL bit-for-bit, so the generated
  * oracle replays the projection exactly (round(6) at the edge). */
object PcaProjection {

  /** Trained projection: `components(k)` = k-th principal direction
    * (unit norm, descending eigenvalue); `eigenvalues` aligned (only the
    * kept top-d' ones); `totalVariance` = full covariance trace, so
    * explained-variance is measured against ALL the variance, not just
    * the kept subspace. */
  final case class Model(mean: Array[Double],
                         components: Array[Array[Double]],
                         eigenvalues: Array[Double],
                         totalVariance: Double) {
    def d: Int = mean.length
    def dOut: Int = components.length

    /** Fraction of TOTAL sample variance the first k components carry. */
    def explainedVariance(k: Int): Double =
      if (totalVariance == 0.0) 0.0
      else eigenvalues.take(k).sum / totalVariance

    /** Constant fold of the centering: mean · component(k). */
    def meanDot(k: Int): Double = {
      var s = 0.0; var j = 0
      while (j < d) { s += mean(j) * components(k)(j); j += 1 }
      s
    }
  }

  /** Covariance + cyclic-Jacobi eigendecomposition over a deterministic
    * hash-ordered sample of at most `sampleN` vectors (the IVF sampling
    * convention — at 100 TB the driver sees 4096 rows, never the
    * corpus). Components are sign-normalized (first entry with
    * |x| > 1e-9 made positive) so the model is unique, not just the
    * subspace. */
  def train(df: DataFrame, idCol: String, vecCol: String, numComponents: Int,
            sampleN: Int = 4096, seed: Long = 42L): Model = {
    val sample: Array[Array[Double]] = df
      .select(col(idCol).as("__id"), col(vecCol).cast("array<double>").as("__v"))
      .where(col("__v").isNotNull)
      .orderBy(abs(hash(col("__id"), lit(seed))), col("__id"))
      .limit(sampleN)
      .select("__v").collect()
      .map(_.getSeq[Double](0).toArray)
    require(sample.nonEmpty, "PCA train: empty sample")
    val d = sample(0).length
    require(numComponents > 0 && numComponents <= d,
      s"PCA train: numComponents must be in [1, $d]")
    val n = sample.length

    val mean = new Array[Double](d)
    sample.foreach { v =>
      var j = 0; while (j < d) { mean(j) += v(j); j += 1 }
    }
    var j = 0; while (j < d) { mean(j) /= n; j += 1 }

    // Covariance (biased, 1/n — the scaling cancels in the eigenvectors).
    val cov = Array.fill(d)(new Array[Double](d))
    sample.foreach { v =>
      var a = 0
      while (a < d) {
        val da = v(a) - mean(a)
        var b = a
        while (b < d) { cov(a)(b) += da * (v(b) - mean(b)); b += 1 }
        a += 1
      }
    }
    var a = 0
    while (a < d) {
      var b = a
      while (b < d) { cov(a)(b) /= n; cov(b)(a) = cov(a)(b); b += 1 }
      a += 1
    }

    val (values, vectors) = jacobiEigen(cov)
    val order = values.indices.sortBy(i => (-values(i), i))
    val comps = order.take(numComponents).map { i =>
      val v = Array.tabulate(d)(r => vectors(r)(i))
      val lead = v.indexWhere(x => math.abs(x) > 1e-9)
      if (lead >= 0 && v(lead) < 0) v.map(-_) else v
    }.toArray
    val trace = (0 until d).map(i => cov(i)(i)).sum
    Model(mean, comps, order.take(numComponents).map(values).toArray, trace)
  }

  /** Cyclic Jacobi for a symmetric matrix: returns (eigenvalues,
    * eigenvector columns). Deterministic; converges quadratically —
    * 64×64 finishes in a handful of sweeps. */
  private def jacobiEigen(m: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val d = m.length
    val a = m.map(_.clone)
    val v = Array.tabulate(d, d)((r, c) => if (r == c) 1.0 else 0.0)
    var sweep = 0
    while (sweep < 100 && offDiag(a) > 1e-11) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          if (math.abs(a(p)(q)) > 1e-300) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
            val t = math.signum(theta) match {
              case 0.0 => 1.0
              case s => s / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            }
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var r = 0
            while (r < d) {
              val arp = a(r)(p); val arq = a(r)(q)
              a(r)(p) = c * arp - s * arq
              a(r)(q) = s * arp + c * arq
              r += 1
            }
            r = 0
            while (r < d) {
              val apr = a(p)(r); val aqr = a(q)(r)
              a(p)(r) = c * apr - s * aqr
              a(q)(r) = s * apr + c * aqr
              val vrp = v(r)(p); val vrq = v(r)(q)
              v(r)(p) = c * vrp - s * vrq
              v(r)(q) = s * vrp + c * vrq
              r += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    (Array.tabulate(d)(i => a(i)(i)), v)
  }

  private def offDiag(a: Array[Array[Double]]): Double = {
    var s = 0.0; var p = 0
    while (p < a.length) {
      var q = p + 1
      while (q < a.length) { s += a(p)(q) * a(p)(q); q += 1 }
      p += 1
    }
    s
  }

  /** One rounded projection column per component: pc_k =
    * round(dot_product(vec, comp_k) − mean·comp_k, 6). Adds columns
    * `pc0..pc{d'-1}` — flat doubles so the oracle compares them
    * directly; wrap with `array(...)` downstream if a vector column is
    * wanted. */
  def project(df: DataFrame, vecCol: String, model: Model): DataFrame = {
    VectorExpressions.register(df.sparkSession)
    val cols: Seq[Column] = model.components.indices.map { k =>
      round(call_function("dot_product", col(vecCol),
          lit(model.components(k))) - lit(model.meanDot(k)), 6)
        .as(s"pc$k")
    }
    df.select(col("*") +: cols: _*)
  }
}
