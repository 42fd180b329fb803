package graft.store

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{ArrayType, DoubleType, IntegerType, StructField, StructType}

import graft.operators.{IvfIndex, PqIndex}

/** Transactional persistence for the IVF-PQ index — [[IvfStore]]'s
  * snapshot pattern extended to the product-quantized layout. The plain
  * IVF store closed the state-outside-the-commit-protocol gap for
  * centroids; IVF-PQ has it one level up: a coded table is only
  * decodable with the EXACT codebooks (and residual anchors) that
  * encoded it — an ADC scan pairing committed codes with a retrained
  * codebook isn't "lower recall", it's bit-level garbage. So every
  * snapshot here is fully self-contained:
  *
  *   <indexDir>/snap-<N>/
  *     vectors/ivf_cluster=<c>/...  (id, float vector, m-byte pq_code)
  *     model/ivf/        (cid, centroid)   coarse quantizer
  *     model/codebooks/  (j, c, centroid)  per-subspace PQ codebooks
  *     model/anchors/    (cid, anchor)     residual anchors
  *     model/params/     (dim, m, ks)      one row
  *
  * published atomically through [[SnapshotStore]]'s stage + CAS marker.
  * [[searchTopK]] resolves vectors, coarse model, codebooks, and
  * anchors from ONE pinned version, so a codes/codebooks mismatch is
  * impossible by construction: a reader pinned before a retrain keeps
  * decoding with the codebooks that wrote its codes (PqStoreSpec pins
  * bit-identical pre/post-retrain search at the old version).
  *
  * Write verbs mirror the consistency rule "codes and codebooks move
  * together":
  *   - [[append]] encodes the batch with the PARENT snapshot's OWN
  *     pinned model (no model argument to mismatch) and carries the
  *     parent's immutable cluster partitions by hard link — O(batch).
  *   - [[reindex]] is the retrain path: a NEW model re-assigns and
  *     re-encodes the WHOLE corpus and publishes model + vectors in one
  *     snapshot — never an in-place codebook swap. FAISS rebuilds an
  *     IndexIVFPQ for the same reason; here old versions additionally
  *     stay searchable until [[vacuum]].
  *   - deletes: the snapshot layout (vectors/ + model/) is identical to
  *     IvfStore's, so [[IvfStore.delete]] applies verbatim — partition-
  *     granular rewrite, model carried by hard link, pq_code columns
  *     ride the rewrite untouched.
  *
  * All model tables are driver-tiny (k + m*ks + k + 1 rows) and doubles
  * round-trip parquet exactly, so a read-back model is bit-identical to
  * the trained one — the determinism the Verify-time oracle twin
  * (SimilarityQueries.ivfpqOracle) depends on.
  */
object PqStore {

  private val Vectors = "vectors"

  def currentVersion(indexDir: String): Option[Int] =
    SnapshotStore.currentVersion(indexDir)

  private def writeModels(spark: SparkSession, ivf: IvfIndex.Model,
                          rm: PqIndex.ResidualModel,
                          stage: java.nio.file.Path): Unit = {
    val centroidSchema = StructType(Seq(
      StructField("cid", IntegerType, nullable = false),
      StructField("centroid", ArrayType(DoubleType), nullable = false)))
    def tiny(rows: Seq[Row], schema: StructType, name: String): Unit =
      spark.createDataFrame(rows.asJava, schema)
        .coalesce(1) // k / m*ks / 1 rows — genuinely tiny by design
        .write.parquet(s"$stage/model/$name")
    tiny(ivf.centroids.zipWithIndex.map { case (c, i) => Row(i, c.toSeq) },
      centroidSchema, "ivf")
    tiny(
      (for (j <- 0 until rm.pq.m; c <- 0 until rm.pq.ks)
        yield Row(j, c, rm.pq.codebooks(j)(c).toSeq)),
      StructType(Seq(
        StructField("j", IntegerType, nullable = false),
        StructField("c", IntegerType, nullable = false),
        StructField("centroid", ArrayType(DoubleType), nullable = false))),
      "codebooks")
    tiny(rm.anchors.zipWithIndex.map { case (a, i) => Row(i, a.toSeq) },
      StructType(Seq(
        StructField("cid", IntegerType, nullable = false),
        StructField("anchor", ArrayType(DoubleType), nullable = false))),
      "anchors")
    tiny(Seq(Row(rm.pq.dim, rm.pq.m, rm.pq.ks)),
      StructType(Seq(
        StructField("dim", IntegerType, nullable = false),
        StructField("m", IntegerType, nullable = false),
        StructField("ks", IntegerType, nullable = false))),
      "params")
  }

  /** The (coarse IVF, residual PQ) model pair a committed snapshot's
    * codes were written with — the ONLY codebooks that can decode them. */
  def models(spark: SparkSession, indexDir: String,
             version: Option[Int] = None)
      : (IvfIndex.Model, PqIndex.ResidualModel) = {
    val snap = SnapshotStore.resolve(indexDir, version)
    val ivfRows = spark.read.parquet(s"$snap/model/ivf").orderBy("cid").collect()
    require(ivfRows.map(_.getInt(0)).toSeq == ivfRows.indices,
      s"corrupt ivf model at $indexDir: cids not contiguous from 0")
    val ivf = IvfIndex.Model(ivfRows.map(_.getSeq[Double](1).toArray))
    val p = spark.read.parquet(s"$snap/model/params").head()
    val (dim, m, ks) = (p.getInt(0), p.getInt(1), p.getInt(2))
    val cb = Array.ofDim[Array[Double]](m, ks)
    spark.read.parquet(s"$snap/model/codebooks").collect().foreach { r =>
      cb(r.getInt(0))(r.getInt(1)) = r.getSeq[Double](2).toArray
    }
    require(cb.forall(_.forall(_ != null)),
      s"corrupt codebooks at $indexDir: missing (j, c) cells")
    val anchorRows = spark.read.parquet(s"$snap/model/anchors")
      .orderBy("cid").collect()
    require(anchorRows.map(_.getInt(0)).toSeq == anchorRows.indices,
      s"corrupt anchors at $indexDir: cids not contiguous from 0")
    (ivf, PqIndex.ResidualModel(
      PqIndex.Model(dim, m, ks, cb),
      anchorRows.map(_.getSeq[Double](1).toArray)))
  }

  /** Assign + residual-encode `df` and publish snapshot v0 — vectors,
    * codes, and the complete model set in one atomic publish. */
  def init(spark: SparkSession, df: DataFrame, vecCol: String,
           ivf: IvfIndex.Model, rm: PqIndex.ResidualModel, indexDir: String,
           clusterCol: String = "ivf_cluster",
           codeCol: String = "pq_code",
           meta: Map[String, String] = Map.empty): Int = {
    val stage = SnapshotStore.stage(indexDir)
    PqIndex.encodeResidual(
        IvfIndex.assign(spark, df, vecCol, ivf, clusterCol),
        vecCol, clusterCol, rm, codeCol)
      .write.partitionBy(clusterCol).parquet(s"$stage/$Vectors")
    writeModels(spark, ivf, rm, stage)
    SnapshotStore.writeMeta(stage, meta)
    SnapshotStore.publish(indexDir, stage,
      currentVersion(indexDir).getOrElse(-1))
  }

  /** Append a batch encoded with the PARENT snapshot's own pinned model
    * — the only model its codes can legally join. Parent partitions
    * carry by hard link; the parent's model republishes unchanged into
    * the new snapshot (staged fresh — model tables are tiny — so every
    * snapshot stays self-contained without cross-snapshot links). When
    * drift statistics say the model is stale, the answer is [[reindex]],
    * never appending with a different model: half-old, half-new codes
    * under one codebook set would be undecodable. */
  def append(spark: SparkSession, batch: DataFrame, vecCol: String,
             indexDir: String, clusterCol: String = "ivf_cluster",
             codeCol: String = "pq_code"): Int = {
    val parentV = currentVersion(indexDir).getOrElse(
      sys.error(s"PqStore.append: no committed index at $indexDir"))
    val (ivf, rm) = models(spark, indexDir, Some(parentV))
    val prev = java.nio.file.Paths
      .get(SnapshotStore.resolve(indexDir, Some(parentV)), Vectors)
    val stage = SnapshotStore.stage(indexDir)
    PqIndex.encodeResidual(
        IvfIndex.assign(spark, batch, vecCol, ivf, clusterCol),
        vecCol, clusterCol, rm, codeCol)
      .write.partitionBy(clusterCol).parquet(s"$stage/$Vectors")
    SnapshotStore.carryLink(prev, stage.resolve(Vectors), s"carry-$parentV-")
    writeModels(spark, ivf, rm, stage)
    SnapshotStore.publish(indexDir, stage, parentV)
  }

  /** [[append]] with [[IvfIndex.appendBatch]]'s drift-retrain trigger —
    * the IvfStore.appendWithDrift lifecycle on the coded layout: ONE
    * scored assignment pass (against the PARENT snapshot's pinned
    * coarse model) both lands the batch atomically and measures its
    * drift vs the train-time baseline. The retrain decision returns to
    * the caller; acting on it here means [[reindex]] with freshly
    * trained models — never an in-place codebook swap. */
  def appendWithDrift(spark: SparkSession, batch: DataFrame, vecCol: String,
                      indexDir: String, retrainBelow: Double,
                      baselineDrift: Double,
                      clusterCol: String = "ivf_cluster",
                      codeCol: String = "pq_code")
      : (Int, IvfIndex.AppendResult) = {
    require(!baselineDrift.isNaN && retrainBelow > 0.0,
      "appendWithDrift needs baselineDrift (record driftStat on the " +
        "training distribution at train time) and a retrainBelow factor")
    val parentV = currentVersion(indexDir).getOrElse(
      sys.error(s"PqStore.appendWithDrift: no committed index at $indexDir"))
    val (ivf, rm) = models(spark, indexDir, Some(parentV))
    val prev = java.nio.file.Paths
      .get(SnapshotStore.resolve(indexDir, Some(parentV)), Vectors)
    val scored = IvfIndex.assignScored(spark, batch, vecCol, ivf,
      clusterCol).cache()
    try {
      val stage = SnapshotStore.stage(indexDir)
      PqIndex.encodeResidual(scored.drop("proto_cos"), vecCol, clusterCol,
          rm, codeCol)
        .write.partitionBy(clusterCol).parquet(s"$stage/$Vectors")
      SnapshotStore.carryLink(prev, stage.resolve(Vectors), s"carry-$parentV-")
      writeModels(spark, ivf, rm, stage)
      val v = SnapshotStore.publish(indexDir, stage, parentV)
      val row = scored.agg(
        org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)),
        org.apache.spark.sql.functions.avg(
          org.apache.spark.sql.functions.col("proto_cos"))).head
      val result =
        if (row.getLong(0) == 0L)
          IvfIndex.AppendResult(Some(0L), None, retrainDue = false)
        else {
          val d = row.getDouble(1)
          IvfIndex.AppendResult(Some(row.getLong(0)), Some(d),
            retrainDue = d < retrainBelow * baselineDrift)
        }
      (v, result)
    } finally scored.unpersist()
  }

  /** The retrain path: re-assign and re-encode the ENTIRE current
    * corpus (parent snapshot's vectors plus `extra` batch, if any) with
    * a NEW model pair, publishing codes + model together — the only
    * legal way codebooks ever change. Costs one full encode pass (the
    * FAISS rebuild shape); old versions stay pinned-searchable with
    * their own codebooks until [[vacuum]]. */
  def reindex(spark: SparkSession, indexDir: String,
              ivf: IvfIndex.Model, rm: PqIndex.ResidualModel,
              vecCol: String, extra: Option[DataFrame] = None,
              clusterCol: String = "ivf_cluster",
              codeCol: String = "pq_code"): Int = {
    val parentV = currentVersion(indexDir).getOrElse(
      sys.error(s"PqStore.reindex: no committed index at $indexDir"))
    val corpus = read(spark, indexDir, Some(parentV))
      .drop(clusterCol, codeCol)
    val full = extra.map(corpus.unionByName(_)).getOrElse(corpus)
    val stage = SnapshotStore.stage(indexDir)
    PqIndex.encodeResidual(
        IvfIndex.assign(spark, full, vecCol, ivf, clusterCol),
        vecCol, clusterCol, rm, codeCol)
      .write.partitionBy(clusterCol).parquet(s"$stage/$Vectors")
    writeModels(spark, ivf, rm, stage)
    SnapshotStore.publish(indexDir, stage, parentV)
  }

  /** A committed snapshot's coded vector table (newest by default) —
    * cluster-partitioned, so probe filters prune partitions. */
  def read(spark: SparkSession, indexDir: String,
           version: Option[Int] = None): DataFrame =
    spark.read.parquet(
      s"${SnapshotStore.resolve(indexDir, version)}/$Vectors")

  /** [[PqIndex.searchTopKResidual]] against ONE committed snapshot:
    * codes, coarse centroids, codebooks, and anchors all resolve from
    * the same version — the pinned read that makes a mid-stream or
    * post-retrain mismatch impossible by construction. */
  def searchTopK(spark: SparkSession, indexDir: String, idCol: String,
                 vecCol: String, queryVec: Array[Double], k: Int,
                 nprobe: Int, shortlist: Int,
                 version: Option[Int] = None,
                 clusterCol: String = "ivf_cluster",
                 codeCol: String = "pq_code"): DataFrame = {
    val v = version.orElse(currentVersion(indexDir))
    val (ivf, rm) = models(spark, indexDir, v)
    PqIndex.searchTopKResidual(spark, read(spark, indexDir, v), idCol,
      vecCol, codeCol, ivf, rm, queryVec, k, nprobe, shortlist, clusterCol)
  }

  /** DELETE vectors by id — identical snapshot layout to the plain IVF
    * store (vectors/ + model/), so the partition-granular COW delete
    * applies verbatim: affected cluster partitions rewrite anti-joined
    * (codes ride untouched — deletion never re-encodes), everything
    * else carries by hard link, model included. */
  def delete(spark: SparkSession, indexDir: String, doomedIds: DataFrame,
             idCol: String, clusterCol: String = "ivf_cluster"): Int =
    IvfStore.delete(spark, indexDir, doomedIds, idCol, clusterCol)

  /** UPSERT vectors and DELETE ids in ONE atomic snapshot publish, with
    * optional snapshot metadata — [[IvfStore.applyChanges]] on the
    * coded layout, the verb a CDC-driven follower needs (a revised
    * embedding is delete-old + insert-new, and the two must never be
    * separable by a crash). The codes-and-codebooks rule holds by
    * construction: upserts assign AND residual-encode with the PARENT
    * snapshot's own pinned model pair (there is no model argument to
    * mismatch), the parent's model republishes into the new snapshot,
    * and deletion/revision never retrains — drift-triggered retrains
    * stay on the [[reindex]] path. Partition-granular like [[delete]]:
    * affected clusters are those holding any batch id's OLD vector;
    * their survivors rewrite anti-joined, every other partition carries
    * by hard link, and the freshly encoded upserts land in whatever
    * clusters the parent model assigns. A doc in BOTH sets ends PRESENT
    * with its new code (delete-then-upsert composition). An empty batch
    * with metadata publishes a pure-carry snapshot so a follower's
    * progress marker can advance past empty spans. */
  def applyChanges(spark: SparkSession, indexDir: String,
                   upserts: DataFrame, doomedIds: DataFrame,
                   idCol: String, vecCol: String,
                   clusterCol: String = "ivf_cluster",
                   codeCol: String = "pq_code",
                   meta: Map[String, String] = Map.empty): Int = {
    val parentV = currentVersion(indexDir).getOrElse(
      sys.error(s"PqStore.applyChanges: no committed index at $indexDir"))
    // The PARENT's pinned model pair both encodes the upserts (no
    // model argument to mismatch) and re-stages into the new snapshot
    // (model tables are driver-tiny, so staging fresh beats linking a
    // multi-table directory).
    val (ivf, rm) = models(spark, indexDir, Some(parentV))
    IvfStore.applyChangesSkeleton(spark, indexDir, parentV, upserts,
      doomedIds, idCol, clusterCol, meta, "PqStore.applyChanges")(
      ups => PqIndex.encodeResidual(
        IvfIndex.assign(spark, ups, vecCol, ivf, clusterCol),
        vecCol, clusterCol, rm, codeCol))(
      stage => writeModels(spark, ivf, rm, stage))
  }

  /** Cap-gated re-pack of accreted per-cluster files — layout only,
    * model and codes untouched. The snapshot layout matches IvfStore's,
    * so its maintenance verb applies verbatim (the model directory —
    * ivf + codebooks + anchors + params here — carries recursively). */
  def maintainIndex(spark: SparkSession, indexDir: String, maxFiles: Int,
                    clusterCol: String = "ivf_cluster",
                    meta: Map[String, String] = Map.empty): Boolean =
    IvfStore.maintainIndex(spark, indexDir, maxFiles, clusterCol, meta)

  /** Drop snapshots below the newest `retainVersions` — hard-link
    * reference counting keeps shared partition files alive while any
    * retained snapshot references them. */
  def vacuum(indexDir: String, retainVersions: Int = 1): Int =
    SnapshotStore.vacuum(indexDir, retainVersions)
}
