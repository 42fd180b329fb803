package graft.store

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.IvfIndex

/** Transactional persistence for the IVF vector index — the raw
  * `assign(...).write.partitionBy("ivf_cluster")` + `appendBatch`
  * mode("append") layout is right for a single writer, but a reader
  * globbing the directory mid-append can observe a torn batch (some
  * cluster partitions updated, others not). This wraps the SAME
  * cluster-partitioned layout in [[SnapshotStore]]'s snapshot + CAS
  * protocol, so the vector table gets the guarantees the BM25 index and
  * MergeStore tables already have: atomic publish, version pinning,
  * time travel until vacuum, and loser-recomputes concurrency.
  *
  * Each snapshot holds `vectors/ivf_cluster=<c>/...` — probes read it
  * with the same partition pruning as the raw layout ([[read]] returns a
  * plain DataFrame for [[IvfIndex.searchTopK]] / `knnJoinApprox`).
  * Appends write ONLY the batch's files and carry the previous
  * snapshot's files by hard link (O(1) per file), preserving the
  * incremental-cost story of [[IvfIndex.appendBatch]]. The drift-trigger
  * variant composes: run `appendBatch` statistics on the batch first,
  * then commit through here.
  */
object IvfStore {

  private val Vectors = "vectors"
  private val Model = "model"

  def currentVersion(indexDir: String): Option[Int] =
    SnapshotStore.currentVersion(indexDir)

  /** The snapshot carries its own MODEL (`model/` — (cid, centroid)
    * parquet) next to the vectors: a probe against snapshot v is only
    * correct with the exact centroids that assigned v, so the model must
    * ride the same atomic publish — a pinned/time-travel reader after a
    * drift retrain would otherwise probe old clusters with new
    * centroids, silently wrong. The BM25 snapshot's self-containment
    * (postings + df + doclen + stats in one publish), applied to the
    * vector index; the reference's registry-as-single-source-of-truth
    * principle (`registry.py:5-10`) for index metadata. */
  private def writeModel(spark: SparkSession, model: IvfIndex.Model,
                         stage: java.nio.file.Path): Unit = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{ArrayType, DoubleType, IntegerType, StructField, StructType}
    val schema = StructType(Seq(
      StructField("cid", IntegerType, nullable = false),
      StructField("centroid", ArrayType(DoubleType), nullable = false)))
    spark.createDataFrame(
        model.centroids.zipWithIndex
          .map { case (c, i) => Row(i, c.toSeq) }.toList.asJava, schema)
      .coalesce(1) // k rows — genuinely tiny, one file by design
      .write.parquet(s"$stage/$Model")
  }

  /** Loud migration gate for snapshots published by the pre-model
    * format (vectors only, no `model/`): every code path that needs the
    * snapshot's own model — [[model]], [[searchTopK]], [[delete]]'s
    * carry — would otherwise die mid-plan (AnalysisException on the
    * read, NoSuchFileException mid-carryLink after some files already
    * staged). Name the condition and the remedy instead. */
  private def requireModelDir(indexDir: String, version: Option[Int]): Unit = {
    val snap = SnapshotStore.resolve(indexDir, version)
    if (!java.nio.file.Files.isDirectory(
        java.nio.file.Paths.get(snap, Model)))
      throw new IllegalStateException(
        s"legacy IVF snapshot at $snap: published before models rode " +
          "snapshots, so no model/ directory exists — rebuild the index " +
          "with IvfStore.init(corpus, model) to migrate (pinned reads of " +
          "legacy versions can still use IvfIndex.searchTopK with a " +
          "caller-held model)")
  }

  /** The model a committed snapshot's vectors were assigned with
    * (newest snapshot by default). Doubles round-trip parquet exactly,
    * so the read-back centroids are bit-identical to the trained ones. */
  def model(spark: SparkSession, indexDir: String,
            version: Option[Int] = None): IvfIndex.Model = {
    requireModelDir(indexDir, version)
    val rows = spark.read
      .parquet(s"${SnapshotStore.resolve(indexDir, version)}/$Model")
      .orderBy("cid").collect()
    val centroids = rows.map(r => r.getSeq[Double](1).toArray)
    require(rows.map(_.getInt(0)).toSeq == centroids.indices,
      s"corrupt model table at $indexDir: cids not contiguous from 0")
    IvfIndex.Model(centroids)
  }

  /** Create the index: assign the corpus with `model` and publish
    * snapshot v0 — vectors AND the model that assigned them, atomically. */
  def init(spark: SparkSession, df: DataFrame, vecCol: String,
           model: IvfIndex.Model, indexDir: String,
           clusterCol: String = "ivf_cluster",
           meta: Map[String, String] = Map.empty): Int = {
    val stage = SnapshotStore.stage(indexDir)
    IvfIndex.assign(spark, df, vecCol, model, clusterCol)
      .write.partitionBy(clusterCol).parquet(s"$stage/$Vectors")
    writeModel(spark, model, stage)
    SnapshotStore.writeMeta(stage, meta)
    SnapshotStore.publish(indexDir, stage,
      currentVersion(indexDir).getOrElse(-1))
  }

  /** Append a batch as a new atomic snapshot: batch files written fresh,
    * prior snapshot carried by hard link, and the (possibly retrained)
    * `model` republished INSIDE the snapshot — a drift retrain swaps
    * model + vectors in one publish, so no reader can ever pair a
    * version with the wrong centroids. A concurrent reader pinned on
    * the old version keeps the old model with the old vectors. */
  def append(spark: SparkSession, batch: DataFrame, vecCol: String,
             model: IvfIndex.Model, indexDir: String,
             clusterCol: String = "ivf_cluster"): Int =
    publishAssigned(spark,
      IvfIndex.assign(spark, batch, vecCol, model, clusterCol),
      model, indexDir, clusterCol)

  /** Stage an already-assigned batch next to the hard-link-carried
    * parent vectors + the assigning model, publish atomically. */
  private def publishAssigned(spark: SparkSession, assigned: DataFrame,
                              model: IvfIndex.Model, indexDir: String,
                              clusterCol: String): Int = {
    val parentV = currentVersion(indexDir).getOrElse(
      sys.error(s"IvfStore.append: no committed index at $indexDir"))
    val prev = java.nio.file.Paths
      .get(SnapshotStore.resolve(indexDir, Some(parentV)), Vectors)
    val stage = SnapshotStore.stage(indexDir)
    assigned.write.partitionBy(clusterCol).parquet(s"$stage/$Vectors")
    SnapshotStore.carryLink(prev, stage.resolve(Vectors), s"carry-$parentV-")
    writeModel(spark, model, stage)
    SnapshotStore.publish(indexDir, stage, parentV)
  }

  /** [[append]] with [[IvfIndex.appendBatch]]'s drift-retrain trigger,
    * through the transactional layout — the complete continual-ingest
    * lifecycle in one call: ONE scored assignment pass both lands the
    * batch (atomic snapshot, parent carried by hard link) and measures
    * its drift (mean cosine-to-own-centroid, IvfIndex.driftStat's
    * statistic) against the train-time baseline. The retrain decision
    * returns to the CALLER, exactly as in appendBatch: acting on it —
    * train a new model, `append` the next batches with it (the new
    * model publishes INSIDE that snapshot), schedule a reindex — is
    * orchestration, not an append side effect. */
  def appendWithDrift(spark: SparkSession, batch: DataFrame, vecCol: String,
                      model: IvfIndex.Model, indexDir: String,
                      retrainBelow: Double, baselineDrift: Double,
                      clusterCol: String = "ivf_cluster")
      : (Int, IvfIndex.AppendResult) = {
    require(!baselineDrift.isNaN && retrainBelow > 0.0,
      "appendWithDrift needs baselineDrift (record driftStat on the " +
        "training distribution at train time) and a retrainBelow factor")
    val scored = IvfIndex.assignScored(spark, batch, vecCol, model,
      clusterCol).cache()
    try {
      val v = publishAssigned(spark, scored.drop("proto_cos"), model,
        indexDir, clusterCol)
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

  /** [[IvfIndex.searchTopK]] against ONE committed snapshot: vectors and
    * model resolve from the SAME version, so a model/vector mismatch is
    * impossible by construction — the probe list comes from the
    * centroids that actually assigned the partitions being pruned. */
  def searchTopK(spark: SparkSession, indexDir: String, idCol: String,
                 vecCol: String, queryVec: Array[Double], k: Int,
                 nprobe: Int, version: Option[Int] = None,
                 clusterCol: String = "ivf_cluster"): DataFrame = {
    val v = version.orElse(currentVersion(indexDir))
    IvfIndex.searchTopK(spark, read(spark, indexDir, v), idCol, vecCol,
      model(spark, indexDir, v), queryVec, k, nprobe, clusterCol)
  }

  /** Read a committed snapshot's vector table (newest by default) —
    * cluster-partitioned, so probe joins prune partitions exactly like
    * the raw layout. */
  def read(spark: SparkSession, indexDir: String,
           version: Option[Int] = None): DataFrame =
    spark.read.parquet(
      s"${SnapshotStore.resolve(indexDir, version)}/$Vectors")

  /** DELETE vectors by id — the compliance verb for the ANN index,
    * PARTITION-GRANULAR: the table is cluster-partitioned and a doomed
    * id lives in exactly the partition its assignment put it in, so
    * only the AFFECTED cluster partitions rewrite (anti-joined); every
    * other partition carries into the new snapshot by hard link. The
    * text index needed tombstones because term clustering smears a doc
    * across all files (Bm25.deleteFromIndex); here the layout already
    * co-locates by the delete's unit, so the MergeStore-style
    * file-granular rewrite applies directly — no tombstones, no
    * query-time anti-join, and searches over the survivors are exact by
    * construction. Returns the new version (parent if nothing matched). */
  def delete(spark: SparkSession, indexDir: String, doomedIds: DataFrame,
             idCol: String, clusterCol: String = "ivf_cluster"): Int = {
    import org.apache.spark.sql.functions.col
    val parentV = currentVersion(indexDir).getOrElse(
      sys.error(s"IvfStore.delete: no committed index at $indexDir"))
    val prev = java.nio.file.Paths
      .get(SnapshotStore.resolve(indexDir, Some(parentV)), Vectors)
    val vectors = read(spark, indexDir, Some(parentV))
    // The carry step below matches partition DIRECTORIES by the raw
    // string s"$clusterCol=$value" — correct only while the value needs
    // none of Spark's partition-path escaping. Integral cluster ids
    // (what assign() produces) never do; anything else must not reach
    // this path silently, or an escaped on-disk dir name would miss the
    // affectedDirs match and the old full partition would be hard-link
    // carried NEXT TO the survivor rewrite (duplicating survivors and
    // resurrecting doomed rows).
    val clusterType = vectors.schema(clusterCol).dataType
    require(Seq(org.apache.spark.sql.types.IntegerType,
        org.apache.spark.sql.types.LongType,
        org.apache.spark.sql.types.ShortType,
        org.apache.spark.sql.types.ByteType).contains(clusterType),
      s"IvfStore.delete: cluster column '$clusterCol' must be integral " +
        s"(got $clusterType) — non-integral values need partition-path " +
        "escaping the directory carry does not apply")
    // Still before any staging: a legacy (pre-model) parent has no
    // model/ to carry — fail with the named migration error, not a
    // NoSuchFileException mid-carryLink.
    requireModelDir(indexDir, Some(parentV))
    val doomed = doomedIds
      .select(col(doomedIds.columns.head).as(idCol)).distinct()
    // Affected cluster list: bounded by k (the coarse-quantizer size),
    // driver-safe by construction.
    val affected = vectors.join(doomed, Seq(idCol), "left_semi")
      .select(col(clusterCol)).distinct()
      .collect().map(_.get(0)).toSeq
    if (affected.isEmpty) return parentV
    val stage = SnapshotStore.stage(indexDir)
    // Deletion never retrains the quantizer: the parent's model carries
    // by hard link so the new snapshot stays self-contained.
    SnapshotStore.carryLink(
      java.nio.file.Paths.get(SnapshotStore.resolve(indexDir, Some(parentV)),
        Model),
      stage.resolve(Model), s"carry-$parentV-")
    vectors.where(col(clusterCol).isin(affected: _*)) // partition-pruned
      .join(doomed, Seq(idCol), "left_anti")
      .write.partitionBy(clusterCol).parquet(s"$stage/$Vectors")
    // Carry every UNaffected partition directory by hard link.
    val affectedDirs = affected.map(c => s"$clusterCol=$c").toSet
    java.nio.file.Files.list(prev).iterator().asScala
      .filter(p => java.nio.file.Files.isDirectory(p) &&
        !affectedDirs.contains(p.getFileName.toString))
      .foreach { p =>
        SnapshotStore.carryLink(p,
          stage.resolve(Vectors).resolve(p.getFileName.toString),
          s"carry-$parentV-")
      }
    SnapshotStore.publish(indexDir, stage, parentV)
  }

  /** UPSERT vectors and DELETE ids in ONE atomic snapshot publish, with
    * optional snapshot metadata — [[graft.store.MergeStore.applyChanges]]
    * reaching the vector index, the verb a CDC-driven follower needs
    * (a revised embedding is delete-old + insert-new, and the two must
    * never be separable by a crash). Partition-granular like [[delete]]:
    * affected clusters are those holding any batch id's OLD vector
    * (upserted or doomed — both die); their survivors rewrite
    * anti-joined, every other partition carries by hard link, and the
    * upserts — assigned with the PARENT's own pinned model, so there is
    * no model argument to mismatch — land as fresh files in whatever
    * clusters the assignment puts them. A doc in BOTH sets ends PRESENT
    * with its new vector (delete-then-upsert composition). Deletion
    * and revision never retrain the quantizer: the parent's model
    * carries; drift-triggered retrains stay on the [[append]]/reindex
    * path. An empty batch with metadata publishes a pure-carry snapshot
    * so a follower's progress marker can advance past empty spans. */
  def applyChanges(spark: SparkSession, indexDir: String,
                   upserts: DataFrame, doomedIds: DataFrame,
                   idCol: String, vecCol: String,
                   clusterCol: String = "ivf_cluster",
                   meta: Map[String, String] = Map.empty): Int = {
    val parentV = currentVersion(indexDir).getOrElse(
      sys.error(s"IvfStore.applyChanges: no committed index at $indexDir"))
    requireModelDir(indexDir, Some(parentV))
    applyChangesSkeleton(spark, indexDir, parentV, upserts, doomedIds,
      idCol, clusterCol, meta, "IvfStore.applyChanges")(
      ups => IvfIndex.assign(spark, ups, vecCol,
        model(spark, indexDir, Some(parentV)), clusterCol))(
      stage => SnapshotStore.carryLink(
        java.nio.file.Paths.get(
          SnapshotStore.resolve(indexDir, Some(parentV)), Model),
        stage.resolve(Model), s"carry-$parentV-"))
  }

  /** The partition-granular applyChanges SKELETON both ANN stores
    * share (plain IVF and IVF-PQ have the identical snapshot layout —
    * vectors/ + model/ — and identical COW rules): resolve the pinned
    * parent, find the affected clusters (those holding any batch id's
    * OLD vector; bounded by k, driver-safe), rewrite their survivors
    * anti-joined, land the store-specific `encode` of the upserts
    * alongside, carry every untouched partition by hard link, persist
    * the model via `persistModel` (IVF carries the parent's dir by
    * link; PQ re-stages its tiny model tables), and publish ONE
    * snapshot with `meta`. A doc in BOTH sets ends PRESENT with its
    * new vector; an empty batch with metadata publishes a pure carry
    * so follower markers advance past empty spans. */
  private[store] def applyChangesSkeleton(
      spark: SparkSession, indexDir: String, parentV: Int,
      upserts: DataFrame, doomedIds: DataFrame, idCol: String,
      clusterCol: String, meta: Map[String, String], verb: String)(
      encode: DataFrame => DataFrame)(
      persistModel: java.nio.file.Path => Unit): Int = {
    import org.apache.spark.sql.functions.col
    val snap = SnapshotStore.resolve(indexDir, Some(parentV))
    val prev = java.nio.file.Paths.get(snap, Vectors)
    val vectors = spark.read.parquet(s"$snap/$Vectors")
    val clusterType = vectors.schema(clusterCol).dataType
    require(Seq(org.apache.spark.sql.types.IntegerType,
        org.apache.spark.sql.types.LongType,
        org.apache.spark.sql.types.ShortType,
        org.apache.spark.sql.types.ByteType).contains(clusterType),
      s"$verb: cluster column '$clusterCol' must be " +
        s"integral (got $clusterType) — delete()'s partition-path rule")
    val batchIds = upserts.select(col(idCol)).distinct()
      .unionByName(doomedIds.select(col(doomedIds.columns.head).as(idCol))
        .distinct())
      .distinct()
    // Affected cluster list: bounded by k, driver-safe (delete()'s rule).
    val affected = vectors.join(batchIds, Seq(idCol), "left_semi")
      .select(col(clusterCol)).distinct()
      .collect().map(_.get(0)).toSeq
    val assigned = encode(upserts)
      .select(vectors.columns.map(col).toIndexedSeq: _*)
    val survivors =
      if (affected.isEmpty) assigned.limit(0)
      else vectors.where(col(clusterCol).isin(affected: _*)) // pruned
        .join(batchIds, Seq(idCol), "left_anti")
    val replacement = survivors.unionByName(assigned)
    if (affected.isEmpty && upserts.isEmpty && meta.isEmpty)
      return parentV // true no-op: don't burn a version
    val stage = SnapshotStore.stage(indexDir)
    replacement.write.partitionBy(clusterCol).parquet(s"$stage/$Vectors")
    // Carry every UNaffected partition directory by hard link — batch
    // files already staged under their cluster dirs sit alongside the
    // carried names (distinct prefixes, no collision).
    val affectedDirs = affected.map(c => s"$clusterCol=$c").toSet
    java.nio.file.Files.list(prev).iterator().asScala
      .filter(p => java.nio.file.Files.isDirectory(p) &&
        !affectedDirs.contains(p.getFileName.toString))
      .foreach { p =>
        SnapshotStore.carryLink(p,
          stage.resolve(Vectors).resolve(p.getFileName.toString),
          s"carry-$parentV-")
      }
    persistModel(stage)
    SnapshotStore.writeMeta(stage, meta)
    SnapshotStore.publish(indexDir, stage, parentV)
  }

  /** Re-pack the vector table and publish as a new snapshot — pure
    * layout rewrite, content and MODEL unchanged (the parent's model
    * carries; compaction must never re-cluster under a pinned reader).
    * Every [[append]]/[[applyChanges]] adds a files-worth per touched
    * cluster while carries accrete the rest, so a long-followed index
    * pays a per-file open per probe partition until someone re-packs —
    * MergeStore.compact's role, vector-shaped. `meta` carries a
    * follower's progress marker through the rewrite (maintainView's
    * rule: a bare compact + vacuum would destroy the high-water mark). */
  def compact(spark: SparkSession, indexDir: String,
              clusterCol: String = "ivf_cluster",
              meta: Map[String, String] = Map.empty): Int = {
    val parentV = currentVersion(indexDir).getOrElse(
      sys.error(s"IvfStore.compact: no committed index at $indexDir"))
    requireModelDir(indexDir, Some(parentV))
    val stage = SnapshotStore.stage(indexDir)
    read(spark, indexDir, Some(parentV))
      .repartition(org.apache.spark.sql.functions.col(clusterCol))
      .write.partitionBy(clusterCol).parquet(s"$stage/$Vectors")
    SnapshotStore.carryLink(
      java.nio.file.Paths.get(
        SnapshotStore.resolve(indexDir, Some(parentV)), Model),
      stage.resolve(Model), s"carry-$parentV-")
    SnapshotStore.writeMeta(stage, meta)
    SnapshotStore.publish(indexDir, stage, parentV)
  }

  /** Cap-gated maintenance: [[compact]] only when the live snapshot's
    * vector-file count exceeds `maxFiles` (a free directory walk) —
    * Bm25.maintainIndex's shape for the vector index. Returns true iff
    * a compaction ran. Call after append/applyChanges batches or on a
    * follower's cadence. */
  def maintainIndex(spark: SparkSession, indexDir: String,
                    maxFiles: Int,
                    clusterCol: String = "ivf_cluster",
                    meta: Map[String, String] = Map.empty): Boolean = {
    require(maxFiles > 0, "maintainIndex needs a positive file cap")
    val snap = SnapshotStore.resolve(indexDir, None)
    val it = java.nio.file.Files.walk(
      java.nio.file.Paths.get(snap, Vectors))
    val n = try it.iterator().asScala.count(p =>
      java.nio.file.Files.isRegularFile(p) &&
        p.getFileName.toString.endsWith(".parquet"))
    finally it.close()
    if (n <= maxFiles) false
    else { compact(spark, indexDir, clusterCol, meta); true }
  }

  /** Drop snapshots below the newest `retainVersions` — hard-link
    * reference counting keeps shared files alive while any retained
    * snapshot still points at them. */
  def vacuum(indexDir: String, retainVersions: Int = 1): Int =
    SnapshotStore.vacuum(indexDir, retainVersions)
}
