package graft.store

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Upsert

/** Record-level MERGE sink: file-granular copy-on-write with a versioned
  * manifest — the scale path past [[CoreStore]]'s partition-rewrite upsert.
  *
  * CoreStore reproduces the reference's write unit (rewrite the year
  * partitions a batch touches — fine for its yearly full loads). At 100 TB
  * a trickle of updates against a year holding thousands of files would
  * rewrite all of them; the industry fix (Delta/Iceberg COW, both public
  * OSS designs) is to rewrite only the FILES containing matched keys and
  * commit the new file set atomically through a manifest. Those table
  * formats aren't on this classpath, so this is the same design in
  * miniature:
  *
  *   - `<target>/data/` holds immutable parquet files.
  *   - `<target>/_manifest/v<N>.list` names the live files of version N
  *     (one relative path per line). Readers list the manifest dir, take
  *     the highest N, and read exactly those files — never a raw glob of
  *     data/, so concurrent merges and un-vacuumed garbage are invisible.
  *   - A merge: (1) semi-join updates against the live rows to find the
  *     files holding matched PKs; (2) rewrite ONLY those files, anti-join
  *     dropping the superseded row versions, union the deduped batch;
  *     (3) publish v<N+1> via write-temp + atomic rename. Crash before
  *     (3) leaves orphan data files (removed by [[vacuum]]) and readers
  *     never see a partial commit. Single writer, like the reference's
  *     batch ETL — multi-writer needs a log with conflict detection
  *     (Delta's optimistic protocol), out of scope for a sink prototype.
  *
  * Scale notes: the affected-file list travels to the driver — it is
  * O(files-with-matches), bounded by the update batch's key spread, not
  * by table size. Write amplification is measured in MergeStoreSpec and
  * recorded in SCALE.md §MERGE.
  */
object MergeStore {

  final case class MergeStats(filesTotal: Int, filesRewritten: Int,
                              rowsInserted: Long, rowsUpdated: Long)

  private def dataDir(target: String): Path = Paths.get(target, "data")
  private def manifestDir(target: String): Path = Paths.get(target, "_manifest")

  private def currentVersion(target: String): Option[Int] = {
    val dir = manifestDir(target)
    if (!Files.isDirectory(dir)) None
    else {
      val vs = Files.list(dir).iterator().asScala
        .map(_.getFileName.toString)
        .collect { case s if s.startsWith("v") && s.endsWith(".list") =>
          s.stripPrefix("v").stripSuffix(".list").toInt
        }.toSeq
      if (vs.isEmpty) None else Some(vs.max)
    }
  }

  /** Live relative file names of a committed version (newest by default).
    * Old manifests stay readable until [[vacuum]] reclaims their files —
    * cheap time travel for debugging a bad merge. */
  def liveFiles(target: String, version: Option[Int] = None): Seq[String] =
    version.orElse(currentVersion(target)) match {
      case None => Seq.empty
      case Some(v) =>
        Files.readAllLines(manifestDir(target).resolve(s"v$v.list"))
          .asScala.toSeq.filter(_.nonEmpty)
    }

  /** Atomically publish `files` as the next manifest version. */
  private def commit(target: String, files: Seq[String]): Int = {
    val next = currentVersion(target).getOrElse(-1) + 1
    val dir = manifestDir(target)
    Files.createDirectories(dir)
    val tmp = dir.resolve(s".v$next.tmp")
    Files.write(tmp, files.sorted.mkString("\n").getBytes("UTF-8"))
    Files.move(tmp, dir.resolve(s"v$next.list"),
      StandardCopyOption.ATOMIC_MOVE)
    next
  }

  /** Write `df` as new immutable parquet files under data/, returning
    * their relative names. Files are born under a unique staging name and
    * moved in — a crashed writer never leaves a half-written file behind
    * a name a manifest could reference. */
  private def writeFiles(df: DataFrame, target: String): Seq[String] = {
    Files.createDirectories(Paths.get(target)) // fresh warehouse: parent may not exist
    val stage = Files.createTempDirectory(
      Paths.get(target).getParent, ".stage-")
    df.write.mode("overwrite").parquet(stage.toString)
    Files.createDirectories(dataDir(target))
    val batch = java.util.UUID.randomUUID().toString.take(8)
    val parts = Files.list(stage).iterator().asScala
      .filter(_.getFileName.toString.endsWith(".parquet")).toSeq.sortBy(_.toString)
    val named = parts.zipWithIndex.map { case (p, i) =>
      val name = s"part-$batch-$i.parquet"
      Files.move(p, dataDir(target).resolve(name))
      name
    }
    Files.list(stage).iterator().asScala.foreach(Files.deleteIfExists)
    Files.deleteIfExists(stage)
    named
  }

  /** Create the table from `df` (replacing any prior version). `numFiles`
    * controls the physical file count — at scale you'd size files to
    * ~128 MB–1 GB; here it lets tests pin amplification. `clusterBy`
    * range-partitions on a column so each file owns a contiguous key
    * range — the layout that makes a key-local update batch touch few
    * files (and parquet min/max stats prune scans). */
  def init(spark: SparkSession, df: DataFrame, target: String,
           numFiles: Int, clusterBy: Seq[String] = Nil): Unit = {
    val arranged =
      if (clusterBy.nonEmpty) df.repartitionByRange(numFiles, clusterBy.map(col): _*)
      else df.repartition(numFiles)
    val files = writeFiles(arranged, target)
    commit(target, files)
  }

  /** Read a committed version (newest by default) — exactly the
    * manifest's files. */
  def read(spark: SparkSession, target: String,
           version: Option[Int] = None): DataFrame = {
    val files = liveFiles(target, version)
    require(files.nonEmpty, s"no committed version at $target")
    spark.read.parquet(files.map(f => dataDir(target).resolve(f).toString): _*)
  }

  /** CoreStore.upsert-shaped entry point for the pipeline's merge sink:
    * first load creates the table ([[init]], range-clustered on
    * `clusterBy` so later key-local merges touch few files), every load
    * after that is a file-granular [[merge]]. Returns (inserted, updated),
    * the load_log fields — drop-in for [[CoreStore.upsert]]'s contract
    * (idempotent, last-write-wins per PK, `ordCols` ordering intra-batch
    * duplicates). */
  def upsert(spark: SparkSession, rows: DataFrame, target: String,
             pk: Seq[String], dataCols: Seq[String],
             ordCols: Seq[String] = Nil, clusterBy: Seq[String] = Nil,
             numFiles: Int = 8, maxLiveFiles: Int = 0): (Long, Long) = {
    require(pk.nonEmpty, s"merge sink at $target has no primary key")
    val incoming = rows.where(pk.map(col(_).isNotNull).reduce(_ && _))
    if (currentVersion(target).isEmpty) {
      val ord = if (ordCols.nonEmpty) ordCols.map(col)
        else Seq(monotonically_increasing_id())
      val deduped = Upsert.dedupByKey(incoming, pk, ord)
        .select(dataCols.map(col): _*)
      init(spark, deduped, target, numFiles, clusterBy)
      (read(spark, target).count(), 0L)
    } else {
      val stats = merge(spark,
        incoming.select((dataCols ++ ordCols).map(col): _*),
        target, pk, ordCols)
      maintain(spark, target, numFiles, maxLiveFiles, clusterBy)
      (stats.rowsInserted, stats.rowsUpdated)
    }
  }

  /** Scheduled maintenance, run automatically after every [[upsert]]
    * merge: when the manifest's live file count exceeds `maxLiveFiles`
    * (default 4 × the `targetFiles` layout target — enough slack that
    * steady trickle loads don't compact every batch, tight enough that
    * scan-time per-file opens stay bounded), [[compact]] back to
    * `targetFiles` range-clustered files and [[vacuum]] the superseded
    * ones. Single-writer safe by the same manifest-commit protocol as
    * the merges themselves. Returns true iff a compaction ran. */
  def maintain(spark: SparkSession, target: String, targetFiles: Int,
               maxLiveFiles: Int = 0, clusterBy: Seq[String] = Nil): Boolean = {
    val cap = if (maxLiveFiles > 0) maxLiveFiles else 4 * targetFiles
    if (liveFiles(target).size <= cap) false
    else {
      compact(spark, target, targetFiles, clusterBy)
      vacuum(target)
      true
    }
  }

  /** True iff `target` holds a committed merge table — how readers
    * distinguish this layout from CoreStore's partitioned parquet. */
  def exists(target: String): Boolean = currentVersion(target).isDefined

  /** MERGE `updates` into the table on `pk` (incoming wins; within the
    * batch the highest `ordCols` wins, like CoreStore's intra-batch
    * order). Rewrites only the files containing matched keys. */
  def merge(spark: SparkSession, updates: DataFrame, target: String,
            pk: Seq[String], ordCols: Seq[String] = Nil): MergeStats = {
    val before = liveFiles(target)
    require(before.nonEmpty, s"no committed version at $target")
    val ord = if (ordCols.nonEmpty) ordCols.map(col)
      else Seq(monotonically_increasing_id())
    val incoming = Upsert.dedupByKey(
      updates.where(pk.map(col(_).isNotNull).reduce(_ && _)), pk, ord)
      .select(read(spark, target).columns.map(col).toIndexedSeq: _*)
      .cache()

    val live = read(spark, target)
      .withColumn("__file", element_at(split(input_file_name(), "/"), -1))
    // Files holding at least one matched PK — the COW rewrite set.
    val affected = live.join(incoming, pk, "left_semi")
      .select("__file").distinct()
      .collect().map(_.getString(0)).toSet

    val rowsUpdated = live.join(incoming, pk, "left_semi").count()
    val rowsInserted = incoming.join(
      read(spark, target), pk, "left_anti").count()

    // Survivors of the affected files (their non-matched rows) plus the
    // incoming batch become the replacement files; untouched files are
    // carried into the next manifest as-is.
    val survivors = live
      .where(col("__file").isin(affected.toSeq: _*))
      .join(incoming, pk, "left_anti")
      .drop("__file")
    val replacement = survivors.unionByName(incoming)
    val newFiles =
      if (affected.isEmpty) writeFiles(incoming, target)
      else writeFiles(replacement.repartition(math.max(1, affected.size)), target)
    commit(target, (before.filterNot(affected) ++ newFiles).distinct)
    incoming.unpersist()
    MergeStats(before.size, affected.size, rowsInserted, rowsUpdated)
  }

  /** Row-level diff between two committed versions (change-data-feed
    * lite): the rows of `toVersion` that are NOT in `fromVersion` — i.e.
    * every inserted row plus the post-image of every update. Because
    * data files are immutable, files common to both manifests cannot
    * contribute (their rows cancel exactly), so only the files UNIQUE to
    * each side are ever scanned — a trickle merge's diff reads the few
    * rewritten files, not the table. exceptAll keeps duplicate-row
    * multiplicity honest. */
  def diff(spark: SparkSession, target: String,
           fromVersion: Int, toVersion: Int): DataFrame = {
    def readFiles(names: Seq[String]): Option[DataFrame] =
      if (names.isEmpty) None
      else Some(spark.read.parquet(
        names.map(f => dataDir(target).resolve(f).toString): _*))
    val before = liveFiles(target, Some(fromVersion)).toSet
    val after = liveFiles(target, Some(toVersion)).toSet
    (readFiles((after -- before).toSeq.sorted),
      readFiles((before -- after).toSeq.sorted)) match {
      case (None, _) => read(spark, target, Some(toVersion)).limit(0)
      case (Some(added), None) => added
      case (Some(added), Some(removed)) => added.exceptAll(removed)
    }
  }

  /** Compact: bin-pack the live rows into `targetFiles` files and commit
    * the result as the next version — pure layout rewrite, content
    * unchanged. A long run of trickle merges accretes small replacement
    * files (every scan pays a per-file open); periodic compaction is the
    * standard table-format answer. `clusterBy` restores range clustering
    * so future merges stay few-file again. */
  def compact(spark: SparkSession, target: String, targetFiles: Int,
              clusterBy: Seq[String] = Nil): Int = {
    val df = read(spark, target)
    val arranged =
      if (clusterBy.nonEmpty) df.repartitionByRange(targetFiles, clusterBy.map(col): _*)
      else df.repartition(targetFiles)
    commit(target, writeFiles(arranged, target))
  }

  /** Delete data files no manifest version references... in this
    * prototype, files the NEWEST version no longer references (time
    * travel is not kept). Safe any time for a single writer. */
  def vacuum(target: String): Int = {
    val live = liveFiles(target).toSet
    val orphans = Files.list(dataDir(target)).iterator().asScala
      .filter(p => !live.contains(p.getFileName.toString)).toSeq
    orphans.foreach(Files.deleteIfExists)
    orphans.size
  }
}
