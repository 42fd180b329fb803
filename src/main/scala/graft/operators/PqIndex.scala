package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.expressions.{PqAdcDot, PqEncode}

/** Product quantization for ANN — the memory/IO compression leg of the
  * similarity stack (brute [[Similarity.topKNeighbors]] → LSH
  * [[Similarity.lshNearDupPairs]] → IVF [[IvfIndex]] → IVF-PQ here;
  * FAISS's IndexIVFPQ shape re-expressed Spark-first).
  *
  *   1. [[train]]: per-subspace k-means on the SAME bounded hash-ordered
  *      driver sample discipline as [[IvfIndex.train]] — training cost is
  *      independent of corpus size.
  *   2. [[encode]]: one codegen'd projection replaces each dim-`dim` FLOAT
  *      vector (dim*4 bytes) with an `m`-byte code — 32x at dim 64/m 8.
  *      At 100 TB the coded table is what gets cached/scanned: a
  *      1000-executor fleet holds the codes of ~10^12 vectors in memory
  *      where raw floats would spill.
  *   3. [[adcScore]]/[[searchTopK]]: a query builds its exact m x ks
  *      subspace dot-product table driver-side; scanning a code costs m
  *      array lookups (ADC). Shortlist by ADC, then exact re-rank of the
  *      shortlist against the float vectors — the standard
  *      recall-restoring tail (only `shortlist` rows ever touch floats).
  *
  * Fully deterministic for a given (data, params, seed): hash-ordered
  * sample, first-k init, strict-< argmin, fixed Lloyd rounds — so a
  * Verify-time oracle can retrain the identical model and inject expected
  * rows (the q39/q32 pattern).
  */
object PqIndex {

  /** codebooks(j)(c) = centroid c of subspace j (dsub dims each). */
  final case class Model(dim: Int, m: Int, ks: Int,
                         codebooks: Array[Array[Array[Double]]]) {
    require(dim % m == 0, s"dim $dim not divisible by m $m")
    def dsub: Int = dim / m

    /** Flat [(j*ks + c)*dsub + d] layout for the codegen kernel. */
    def flat: Array[Double] = {
      val out = new Array[Double](m * ks * dsub)
      var j = 0
      while (j < m) {
        var c = 0
        while (c < ks) {
          System.arraycopy(codebooks(j)(c), 0, out, (j * ks + c) * dsub, dsub)
          c += 1
        }
        j += 1
      }
      out
    }

    /** Driver-side twin of [[PqEncode]] — the oracle's ground truth. */
    def encodeVec(v: Array[Double]): Array[Byte] = {
      val code = new Array[Byte](m)
      var j = 0
      while (j < m) {
        var bestC = 0; var bestD = Double.MaxValue
        var c = 0
        while (c < ks) {
          var d2 = 0.0; var d = 0
          while (d < dsub) {
            val idx = j * dsub + d
            val x = (if (idx < v.length) v(idx) else 0.0) - codebooks(j)(c)(d)
            d2 += x * x
            d += 1
          }
          if (d2 < bestD) { bestD = d2; bestC = c }
          c += 1
        }
        code(j) = bestC.toByte
        j += 1
      }
      code
    }

    /** Query LUT: lut[j*ks + c] = dot(query subvector j, codebook(j)(c)). */
    def lutFor(q: Array[Double]): Array[Double] = {
      val lut = new Array[Double](m * ks)
      var j = 0
      while (j < m) {
        var c = 0
        while (c < ks) {
          var s = 0.0; var d = 0
          while (d < dsub) {
            val idx = j * dsub + d
            s += (if (idx < q.length) q(idx) else 0.0) * codebooks(j)(c)(d)
            d += 1
          }
          lut(j * ks + c) = s
          c += 1
        }
        j += 1
      }
      lut
    }

    /** Driver-side twin of [[PqAdcDot]]. */
    def adcDot(code: Array[Byte], lut: Array[Double]): Double = {
      var s = 0.0; var j = 0
      val n = math.min(m, code.length)
      while (j < n) { s += lut(j * ks + (code(j) & 0xff)); j += 1 }
      s
    }
  }

  /** Per-subspace L2 k-means on a deterministic hash-ordered sample of at
    * most `sampleN` vectors. Init = the first ks sample subvectors;
    * `iters` Lloyd rounds; empty clusters keep their previous centroid.
    * `sampleN <= 0` (default) auto-scales with the codebook size:
    * max(4096, 50*ks) — [[IvfIndex.train]]'s FAISS sizing discipline.
    */
  def train(df: DataFrame, idCol: String, vecCol: String, dim: Int,
            m: Int, ks: Int, iters: Int = 8, sampleN: Int = 0,
            seed: Long = 42L): Model = {
    require(dim % m == 0, s"dim $dim not divisible by m $m")
    Model(dim, m, ks,
      lloyd(collectSample(df, idCol, vecCol, dim, ks, sampleN, seed),
        dim, m, ks, iters))
  }

  /** Residual-PQ model: per-subspace codebooks fit to `v − anchor(cell)`,
    * plus the anchors themselves. The anchor of a cell is the UNNORMALIZED
    * mean of its training vectors — not the spherical IVF centroid: the
    * conditional mean minimizes E‖residual‖², while subtracting a
    * renormalized unit centroid from a diffusely-clustered vector can
    * make the residual LARGER than the vector (measured on the test
    * corpus before this design). Cells with no training mass anchor at
    * the origin — residual degenerates to the raw vector there. */
  final case class ResidualModel(pq: Model, anchors: Array[Array[Double]]) {
    def residualOf(v: Array[Double], cell: Int): Array[Double] = {
      val a = anchors(cell)
      Array.tabulate(v.length)(i => v(i) - (if (i < a.length) a(i) else 0.0))
    }
    /** dot(q, anchor(cell)) — the constant the ADC score adds back. */
    def anchorDot(q: Array[Double], cell: Int): Double = {
      val a = anchors(cell)
      var s = 0.0; var i = 0
      val n = math.min(q.length, a.length)
      while (i < n) { s += q(i) * a(i); i += 1 }
      s
    }
  }

  /** Residual-PQ trainer (FAISS IndexIVFPQ shape): learn per-cell mean
    * anchors from the bounded hash-ordered sample, then fit the subspace
    * codebooks to the residuals. Same code size as [[train]], lower ADC
    * error and higher recall (PqSpec measures both). Cell assignment
    * mirrors [[IvfIndex.assign]]'s argmax (first-max tie-break,
    * degenerate norms to cell 0) so train/encode/oracle agree. */
  def trainResidual(df: DataFrame, idCol: String, vecCol: String,
                    ivf: IvfIndex.Model, dim: Int, m: Int, ks: Int,
                    iters: Int = 8, sampleN: Int = 0,
                    seed: Long = 42L): ResidualModel =
    trainResidualFromSample(
      collectSample(df, idCol, vecCol, dim, ks, sampleN, seed),
      ivf, dim, m, ks, iters)

  /** [[trainResidual]]'s body over an already-collected sample (see
    * [[trainIvfResidual]] for why). */
  def trainResidualFromSample(sample: Array[Array[Double]],
                              ivf: IvfIndex.Model, dim: Int, m: Int,
                              ks: Int, iters: Int = 8): ResidualModel = {
    require(dim % m == 0, s"dim $dim not divisible by m $m")
    val cells = sample.map(v => assignOf(ivf, v))
    val sums = Array.fill(ivf.k)(new Array[Double](dim))
    val counts = new Array[Long](ivf.k)
    sample.indices.foreach { i =>
      val c = cells(i); val v = sample(i)
      var d = 0
      while (d < dim) { sums(c)(d) += v(d); d += 1 }
      counts(c) += 1
    }
    val anchors = Array.tabulate(ivf.k) { c =>
      if (counts(c) == 0) new Array[Double](dim)
      else sums(c).map(_ / counts(c))
    }
    val residuals = sample.indices.map { i =>
      val a = anchors(cells(i)); val v = sample(i)
      Array.tabulate(dim)(d => v(d) - a(d))
    }.toArray
    ResidualModel(Model(dim, m, ks, lloyd(residuals, dim, m, ks, iters)),
      anchors)
  }

  /** Train the coarse IVF model AND the residual-PQ codebooks from ONE
    * hash-ordered sample collect. `IvfIndex.train` + [[trainResidual]]
    * separately each run an identical full-scan + TakeOrdered + collect
    * job (same seed, same ordering, overlapping n) — at 100 TB that is a
    * second pass over the corpus for bytes the driver already holds, and
    * even at bench scale it is a whole extra Spark job on the index-build
    * path. Sample size = the max of both trainers' auto-scaled wants, so
    * neither model trains on fewer vectors than its standalone twin.
    * Deterministic: callers and their Verify-time oracle twins go through
    * this same path, so engine and oracle models stay bit-identical. */
  def trainIvfResidual(df: DataFrame, idCol: String, vecCol: String,
                       kIvf: Int, dim: Int, m: Int, ks: Int,
                       itersIvf: Int = 8, itersPq: Int = 8,
                       sampleN: Int = 0, seed: Long = 42L)
      : (IvfIndex.Model, ResidualModel) = {
    val n = if (sampleN > 0) sampleN
    else math.max(math.max(4096, 50 * ks), 50 * kIvf)
    val sample = collectSample(df, idCol, vecCol, dim, ks, n, seed)
    val ivf = IvfIndex.trainFromRaw(sample, kIvf, itersIvf)
    (ivf, trainResidualFromSample(sample, ivf, dim, m, ks, itersPq))
  }

  /** Driver-side twin of [[IvfIndex.assign]]: cosine argmax over the
    * coarse centroids, first-max tie-break, -2.0 sentinel for degenerate
    * norms (zero vectors land in cluster 0 on both sides). */
  def assignOf(ivf: IvfIndex.Model, v: Array[Double]): Int = {
    val cs = ivf.centroids.map { c =>
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      val n = math.min(v.length, c.length)
      while (i < n) {
        dot += v(i) * c(i); na += v(i) * v(i); nb += c(i) * c(i); i += 1
      }
      if (na == 0.0 || nb == 0.0) -2.0
      else dot / (math.sqrt(na) * math.sqrt(nb))
    }
    cs.indexOf(cs.max)
  }

  private def collectSample(df: DataFrame, idCol: String, vecCol: String,
                            dim: Int, ks: Int, sampleN: Int,
                            seed: Long): Array[Array[Double]] = {
    val n = if (sampleN > 0) sampleN else math.max(4096, 50 * ks)
    val sample: Array[Array[Double]] = df
      .select(col(idCol).as("__id"), col(vecCol).cast("array<double>").as("__v"))
      .where(col("__v").isNotNull)
      .orderBy(abs(hash(col("__id"), lit(seed))), col("__id"))
      .limit(n)
      .select("__v").collect()
      .map(_.getSeq[Double](0).padTo(dim, 0.0).toArray)
    require(sample.length >= ks,
      s"PQ train: need >= $ks sample vectors, got ${sample.length}")
    sample
  }

  private def lloyd(sample: Array[Array[Double]], dim: Int, m: Int, ks: Int,
                    iters: Int): Array[Array[Array[Double]]] = {
    val dsub = dim / m
    val codebooks = Array.tabulate(m) { j =>
      val subs = sample.map(v => java.util.Arrays.copyOfRange(v, j * dsub, (j + 1) * dsub))
      var cents = subs.take(ks).map(_.clone)
      var round = 0
      while (round < iters) {
        val sums = Array.fill(ks)(new Array[Double](dsub))
        val counts = new Array[Long](ks)
        subs.foreach { v =>
          var best = 0; var bestD = Double.MaxValue
          var c = 0
          while (c < ks) {
            var d2 = 0.0; var d = 0
            while (d < dsub) { val x = v(d) - cents(c)(d); d2 += x * x; d += 1 }
            if (d2 < bestD) { bestD = d2; best = c }
            c += 1
          }
          var d = 0
          while (d < dsub) { sums(best)(d) += v(d); d += 1 }
          counts(best) += 1
        }
        cents = cents.indices.map { c =>
          if (counts(c) == 0) cents(c)
          else sums(c).map(_ / counts(c))
        }.toArray
        round += 1
      }
      cents
    }
    codebooks
  }

  /** Add `outCol` = the m-byte PQ code. One codegen'd projection; the
    * codebooks ride the expression (addReferenceObj) — no join, no
    * shuffle. Registered as a temp function whose builder closure captures
    * the model (the [[graft.flatten.PayloadExplode.toCore]] pattern for
    * parameterized native expressions); resolution is eager, so the
    * returned frame keeps its own expression instance. */
  def encode(df: DataFrame, vecCol: String, model: Model,
             outCol: String = "pq_code"): DataFrame = {
    df.sparkSession.sessionState.functionRegistry.createOrReplaceTempFunction(
      "pq_encode",
      exprs => PqEncode(exprs(0), model.flat, model.m, model.ks, model.dsub),
      "built-in")
    df.withColumn(outCol, call_function("pq_encode", col(vecCol)))
  }

  /** Residual encode: `pq_code` quantizes `v − anchor(clusterCol)` (the
    * [[trainResidual]] pairing). The anchor table constant-folds into the
    * plan as a literal array-of-arrays, so the subtraction is one per-row
    * element_at + zip_with — index-BUILD cost, off the search path, and
    * the m*ks*dsub PqEncode argmin still dominates it. `df` must already
    * carry the IVF cluster id ([[IvfIndex.assign]]). */
  def encodeResidual(df: DataFrame, vecCol: String, clusterCol: String,
                     rm: ResidualModel,
                     outCol: String = "pq_code"): DataFrame = {
    val model = rm.pq
    df.sparkSession.sessionState.functionRegistry.createOrReplaceTempFunction(
      "pq_encode",
      exprs => PqEncode(exprs(0), model.flat, model.m, model.ks, model.dsub),
      "built-in")
    val anchors = array(rm.anchors.map(a =>
      array(a.map(lit).toSeq: _*)).toSeq: _*)
    val residual = zip_with(
      col(vecCol).cast("array<double>"),
      element_at(anchors, col(clusterCol) + 1),
      (x, y) => x - y)
    df.withColumn(outCol, call_function("pq_encode", residual))
  }

  /** ADC approximate dot(query, ·) over a coded column of `df`. Returns
    * the frame with `outCol` appended (the LUT is closure-captured into
    * the expression at registration, same pattern as [[encode]]). */
  def withAdcScore(df: DataFrame, codeCol: String, model: Model,
                   query: Array[Double], outCol: String): DataFrame = {
    val lut = model.lutFor(query)
    df.sparkSession.sessionState.functionRegistry.createOrReplaceTempFunction(
      "pq_adc_dot",
      exprs => PqAdcDot(exprs(0), lut, model.m, model.ks),
      "built-in")
    df.withColumn(outCol, call_function("pq_adc_dot", col(codeCol)))
  }

  /** IVF-PQ search: probe the nprobe nearest IVF clusters (partition
    * pruning at scale), ADC-shortlist within them, exact-cosine re-rank
    * of the shortlist only. Ties break on id everywhere; scores round(6)
    * — fully deterministic, engine-independent.
    *
    * Two actions by design (the FAISS shape): the shortlist pass scans
    * ONLY (cluster, id, code) — the float column never rides the top-50
    * reduction, so a columnar store reads 8-byte codes, not 260-byte
    * vectors (at 1 M rows this is the difference between an ADC scan
    * that beats the float scan and one that ties it — see SCALE.md
    * ann-curve). The bounded (≤ `shortlist`) id list then comes back as
    * a pushed IN filter, so the float fetch row-group-skips to just the
    * re-rank candidates. */
  def searchTopK(spark: SparkSession, indexed: DataFrame, idCol: String,
                 vecCol: String, codeCol: String, ivf: IvfIndex.Model,
                 pq: Model, queryVec: Array[Double], k: Int,
                 nprobe: Int, shortlist: Int,
                 clusterCol: String = "ivf_cluster",
                 roundTo: Int = 6): DataFrame =
    searchImpl(spark, indexed, idCol, vecCol, codeCol, ivf, pq, None,
      queryVec, k, nprobe, shortlist, clusterCol, roundTo)

  /** [[searchTopK]] over residual codes ([[trainResidual]] /
    * [[encodeResidual]]): the ADC score adds back the per-cluster
    * constant dot(q, anchor) — nprobe driver-computed literals on a when
    * chain, zero extra data movement. Same two-action FAISS shape. */
  def searchTopKResidual(spark: SparkSession, indexed: DataFrame,
                         idCol: String, vecCol: String, codeCol: String,
                         ivf: IvfIndex.Model, rm: ResidualModel,
                         queryVec: Array[Double], k: Int,
                         nprobe: Int, shortlist: Int,
                         clusterCol: String = "ivf_cluster",
                         roundTo: Int = 6): DataFrame =
    searchImpl(spark, indexed, idCol, vecCol, codeCol, ivf, rm.pq, Some(rm),
      queryVec, k, nprobe, shortlist, clusterCol, roundTo)

  private def searchImpl(spark: SparkSession, indexed: DataFrame,
                         idCol: String, vecCol: String, codeCol: String,
                         ivf: IvfIndex.Model, pq: Model,
                         residual: Option[ResidualModel],
                         queryVec: Array[Double], k: Int,
                         nprobe: Int, shortlist: Int,
                         clusterCol: String,
                         roundTo: Int): DataFrame = {
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{DoubleType, StructField, StructType}
    val probes = ivf.rankClusters(queryVec).take(nprobe)
    graft.expressions.VectorExpressions.register(spark)
    val qLit = array(queryVec.map(lit).toSeq: _*)
    val probed = indexed
      .where(col(clusterCol).isin(probes.map(Integer.valueOf).toSeq: _*))
    val adcExpr = residual match {
      case None => col("adc")
      case Some(rm) =>
        col("adc") + probes.tail.foldLeft(
          when(col(clusterCol) === lit(probes.head),
            lit(rm.anchorDot(queryVec, probes.head)))) {
          (acc, p) => acc.when(col(clusterCol) === lit(p),
            lit(rm.anchorDot(queryVec, p)))
        }
    }
    val short: Array[Row] =
      withAdcScore(probed, codeCol, pq, queryVec, "adc")
        .select(col(idCol), round(adcExpr, roundTo).as("adc"))
        .orderBy(col("adc").desc, col(idCol))
        .limit(shortlist)
        .collect()
    val slSchema = StructType(Seq(
      StructField(idCol, indexed.schema(idCol).dataType),
      StructField("adc", DoubleType)))
    val sl = spark.createDataFrame(
      short.map(r => Row(r.get(0), r.getDouble(1))).toList.asJava, slSchema)
    indexed
      .where(col(idCol).isInCollection(short.map(_.get(0)).toSeq))
      .select(col(idCol), col(vecCol))
      .join(broadcast(sl), idCol)
      .select(col(idCol), col("adc"),
        round(call_function("cosine_sim", col(vecCol), qLit), roundTo)
          .as("cosine"))
      .orderBy(col("cosine").desc, col(idCol))
      .limit(k)
  }
}
