package graft.store

import java.nio.file.{Files, Path, Paths}

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
  *     (3) publish v<N+1> via write-temp + atomic create-if-absent.
  *     Crash before (3) leaves orphan data files (removed by [[vacuum]])
  *     and readers never see a partial commit.
  *   - Multi-writer: optimistic concurrency. Every merge reads one
  *     pinned snapshot version and its commit is a CAS on that version
  *     (create v<N+1> if absent — see [[commit]]); a writer that loses
  *     the race gets ConcurrentModificationException and recomputes the
  *     merge against the new head (`maxRetries`). Delta's optimistic
  *     protocol in miniature, spec'd with two interleaved writers in
  *     MergeStoreSpec.
  *
  * Scale notes: the affected-file list travels to the driver — it is
  * O(files-with-matches), bounded by the update batch's key spread, not
  * by table size. Write amplification is measured in MergeStoreSpec and
  * recorded in SCALE.md §MERGE.
  */
object MergeStore {

  final case class MergeStats(filesTotal: Int, filesRewritten: Int,
                              rowsInserted: Long, rowsUpdated: Long)

  final case class DeleteStats(filesTotal: Int, filesRewritten: Int,
                               rowsDeleted: Long)

  /** Default vacuum grace window (10 min): a data file younger than this
    * is never reclaimed even when no retained manifest references it,
    * because it may belong to an in-flight merge that staged its files
    * but has not yet won the manifest CAS — vacuuming it would let the
    * winning commit reference a vanished file (data loss on read).
    * Delta's `VACUUM ... RETAIN` solves the same race the same way;
    * tests that vacuum their own quiesced tables pass 0. */
  val DefaultVacuumGraceMillis: Long = 10L * 60 * 1000

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

  /** Newest committed version number, if the table exists — the head a
    * change-feed consumer (replication [[sync]], incremental view
    * maintenance) records as its high-water mark. */
  def version(target: String): Option[Int] = currentVersion(target)

  /** Live relative file names of a committed version (newest by default).
    * Old manifests stay readable until [[vacuum]] reclaims their files —
    * cheap time travel for debugging a bad merge. Metadata lines
    * (`#key=value`, see [[manifestMeta]]) are not files. */
  def liveFiles(target: String, version: Option[Int] = None): Seq[String] =
    version.orElse(currentVersion(target)) match {
      case None => Seq.empty
      case Some(v) =>
        Files.readAllLines(manifestDir(target).resolve(s"v$v.list"))
          .asScala.toSeq.filter(l => l.nonEmpty && !l.startsWith("#"))
    }

  /** Metadata recorded INSIDE a manifest commit — `#key=value` lines
    * ahead of the file list. State that must advance atomically with a
    * commit (an IVM view's applied source version, a sink's transaction
    * watermark) rides the same create-if-absent CAS write as the file
    * list, so no crash window can separate "data applied" from "marker
    * advanced" — Delta's txnAppId/txnVersion idiom. Empty for versions
    * whose writer attached none, and for vacuumed (missing) manifests. */
  def manifestMeta(target: String,
                   version: Option[Int] = None): Map[String, String] =
    version.orElse(currentVersion(target)) match {
      case None => Map.empty
      case Some(v) =>
        val p = manifestDir(target).resolve(s"v$v.list")
        if (!Files.exists(p)) Map.empty
        else Files.readAllLines(p).asScala
          .filter(_.startsWith("#"))
          .map { l =>
            val kv = l.stripPrefix("#")
            val i = kv.indexOf('=')
            require(i > 0, s"malformed manifest metadata line at $target v$v: $l")
            kv.take(i) -> kv.drop(i + 1)
          }.toMap
    }

  /** Atomically publish `files` as version `parent + 1`, FAILING if that
    * version already exists — the manifest CAS that turns the sink
    * multi-writer-safe (Delta's optimistic concurrency in miniature).
    *
    * Versions are dense sequential integers, so "reject if the parent
    * version moved" is exactly "create v(parent+1) if absent". The
    * atomic create-with-content primitive is link(2): the manifest is
    * fully written to a private temp name first, then hard-linked to its
    * final name — `createLink` fails with FileAlreadyExistsException if
    * another writer published first, and readers can never observe a
    * partially-written manifest under a versioned name. (The old
    * ATOMIC_MOVE publish was atomic but REPLACED an existing version —
    * two racing writers silently lost one commit.) On an object store
    * the same slot maps to a conditional PUT (If-None-Match) or a
    * commit/catalog service. */
  private def commit(target: String, files: Seq[String], parent: Int,
                     meta: Map[String, String] = Map.empty): Int = {
    val next = parent + 1
    val dir = manifestDir(target)
    Files.createDirectories(dir)
    meta.foreach { case (k, v) =>
      require(k.nonEmpty && !k.contains('=') && !(k + v).exists(c => c == '\n' || c == '\r'),
        s"manifest metadata key/value must be newline-free and '='-free keys: $k=$v")
    }
    val metaLines = meta.toSeq.sorted.map { case (k, v) => s"#$k=$v" }
    val tmp = dir.resolve(
      s".v$next-${java.util.UUID.randomUUID().toString.take(8)}.tmp")
    Files.write(tmp,
      (metaLines ++ files.sorted).mkString("\n").getBytes("UTF-8"))
    try {
      Files.createLink(dir.resolve(s"v$next.list"), tmp)
      next
    } catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        throw new java.util.ConcurrentModificationException(
          s"commit conflict at $target: another writer published v$next " +
            s"while this merge was reading v$parent — re-read and retry")
    } finally Files.deleteIfExists(tmp)
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
           numFiles: Int, clusterBy: Seq[String] = Nil,
           meta: Map[String, String] = Map.empty): Unit = {
    val arranged =
      if (clusterBy.nonEmpty) df.repartitionByRange(numFiles, clusterBy.map(col): _*)
      else df.repartition(numFiles)
    val files = writeFiles(arranged, target)
    commit(target, files, currentVersion(target).getOrElse(-1), meta)
  }

  /** Read a committed version (newest by default) — exactly the
    * manifest's files. */
  def read(spark: SparkSession, target: String,
           version: Option[Int] = None): DataFrame = {
    val files = liveFiles(target, version)
    require(files.nonEmpty, s"no committed version at $target")
    // mergeSchema: after an evolving merge the untouched carried files
    // keep the OLD physical schema; the union schema (old columns + the
    // evolved ones, null where a file predates them) is the table. Cost
    // is a footer read per live file — the count maintain() bounds.
    spark.read.option("mergeSchema", "true")
      .parquet(files.map(f => dataDir(target).resolve(f).toString): _*)
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
             numFiles: Int = 8, maxLiveFiles: Int = 0,
             maxRetries: Int = 3,
             vacuumGraceMillis: Long = DefaultVacuumGraceMillis): (Long, Long) = {
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
        target, pk, ordCols, maxRetries)
      maintain(spark, target, numFiles, maxLiveFiles, clusterBy,
        vacuumGraceMillis)
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
               maxLiveFiles: Int = 0, clusterBy: Seq[String] = Nil,
               vacuumGraceMillis: Long = DefaultVacuumGraceMillis): Boolean = {
    val cap = if (maxLiveFiles > 0) maxLiveFiles else 4 * targetFiles
    if (liveFiles(target).size <= cap) false
    else {
      compact(spark, target, targetFiles, clusterBy)
      // Default grace: files a rival in-flight writer has staged (young,
      // unreferenced) survive; this writer's own superseded files are
      // reclaimed on a later maintenance pass once they age out. A
      // known-single-writer pipeline passes 0 for immediate reclaim.
      vacuum(target, graceMillis = vacuumGraceMillis)
      true
    }
  }

  /** True iff `target` holds a committed merge table — how readers
    * distinguish this layout from CoreStore's partitioned parquet. */
  def exists(target: String): Boolean = currentVersion(target).isDefined

  /** MERGE `updates` into the table on `pk` (incoming wins; within the
    * batch the highest `ordCols` wins, like CoreStore's intra-batch
    * order). Rewrites only the files containing matched keys.
    *
    * Multi-writer safe via optimistic concurrency: the whole merge reads
    * ONE pinned snapshot version (never "the newest", which another
    * writer may advance mid-merge), and the final [[commit]] is a CAS on
    * that snapshot. A lost race throws ConcurrentModificationException —
    * or, with `maxRetries > 0`, transparently recomputes the merge
    * against the new head (the data files it staged for the lost attempt
    * become orphans, reclaimed by [[vacuum]]). Recomputation, not rebase:
    * an upsert's result depends on the head's row versions, so replaying
    * against the new snapshot is the only generally-correct resolution. */
  def merge(spark: SparkSession, updates: DataFrame, target: String,
            pk: Seq[String], ordCols: Seq[String] = Nil,
            maxRetries: Int = 0,
            snapshotVersion: Option[Int] = None,
            allowSchemaEvolution: Boolean = false): MergeStats =
    try mergeOnce(spark, updates, target, pk, ordCols, snapshotVersion,
      allowSchemaEvolution)
    catch {
      case _: java.util.ConcurrentModificationException if maxRetries > 0 =>
        // Replay resolves the snapshot FRESH (never the stale pin): the
        // retry exists precisely because that version is no longer head.
        merge(spark, updates, target, pk, ordCols, maxRetries - 1,
          allowSchemaEvolution = allowSchemaEvolution)
    }

  private def mergeOnce(spark: SparkSession, updates: DataFrame,
                        target: String, pk: Seq[String],
                        ordCols: Seq[String],
                        snapshotVersion: Option[Int],
                        allowSchemaEvolution: Boolean = false): MergeStats = {
    val parentV = snapshotVersion.orElse(currentVersion(target))
      .getOrElse(sys.error(s"no committed version at $target"))
    val before = liveFiles(target, Some(parentV))
    def snapshot = read(spark, target, Some(parentV))
    val ord = if (ordCols.nonEmpty) ordCols.map(col)
      else Seq(monotonically_increasing_id())
    val deduped = Upsert.dedupByKey(
      updates.where(pk.map(col(_).isNotNull).reduce(_ && _)), pk, ord)
    // Schema evolution (Delta's mergeSchema shape): with it on, batch
    // columns absent from the table are APPENDED (carried files keep
    // their physical schema — read()'s mergeSchema nulls them there),
    // and table columns absent from the batch null-fill on the incoming
    // rows. Off (the default), the batch must project exactly onto the
    // table's columns — a drifted producer fails loudly here instead of
    // silently reshaping the table.
    // Batch-only ordering columns are part of the merge CONTRACT, not
    // schema drift — only other unknown columns trip the strict check.
    val extra = deduped.columns
      .filterNot(snapshot.columns.contains).filterNot(ordCols.contains)
    require(allowSchemaEvolution || extra.isEmpty,
      s"merge batch carries columns absent from the table " +
        s"(${extra.mkString(", ")}) — a drifted producer, or pass " +
        "allowSchemaEvolution=true to append them")
    val batchOnlyOrd = ordCols.filterNot(snapshot.columns.contains)
    val incoming = (
      if (allowSchemaEvolution)
        snapshot.limit(0).unionByName(deduped.drop(batchOnlyOrd: _*),
          allowMissingColumns = true)
      else deduped.select(snapshot.columns.map(col).toIndexedSeq: _*)
      ).cache()

    val live = snapshot
      .withColumn("__file", element_at(split(input_file_name(), "/"), -1))
    // Files holding at least one matched PK — the COW rewrite set.
    val affected = live.join(incoming, pk, "left_semi")
      .select("__file").distinct()
      .collect().map(_.getString(0)).toSet

    val rowsUpdated = live.join(incoming, pk, "left_semi").count()
    val rowsInserted = incoming.join(snapshot, pk, "left_anti").count()

    // Survivors of the affected files (their non-matched rows) plus the
    // incoming batch become the replacement files; untouched files are
    // carried into the next manifest as-is.
    val survivors = live
      .where(col("__file").isin(affected.toSeq: _*))
      .join(incoming, pk, "left_anti")
      .drop("__file")
    val replacement =
      survivors.unionByName(incoming, allowMissingColumns = true)
    val newFiles =
      if (affected.isEmpty) writeFiles(incoming, target)
      else writeFiles(replacement.repartition(math.max(1, affected.size)), target)
    try commit(target, (before.filterNot(affected) ++ newFiles).distinct,
      parentV)
    finally incoming.unpersist()
    MergeStats(before.size, affected.size, rowsInserted, rowsUpdated)
  }

  /** DELETE by key set: remove every row whose `pk` appears in `keys` —
    * the compliance-delete (GDPR / takedown) a production training-data
    * store needs and the one MERGE verb the upsert-only reference never
    * had. Same file-granular COW shape as [[merge]]: semi-join `keys`
    * against the pinned snapshot to find the files holding doomed rows,
    * rewrite ONLY those files anti-joined (their surviving rows), and
    * CAS-commit the new file set. A file whose every row dies is simply
    * dropped from the manifest — no replacement write at all.
    *
    * Multi-writer safe by the same optimistic protocol as merge: lost
    * CAS ⇒ ConcurrentModificationException, or transparent recompute
    * against the new head with `maxRetries > 0`. Deleting keys that are
    * not in the table is a no-op for those keys (idempotent reruns).
    *
    * Scale: `keys` is the removal-request batch (small vs the table);
    * it drives one semi-join shuffle bounded by the affected files'
    * rows, never a full-table rewrite. Range clustering ([[init]]'s
    * `clusterBy`) keeps a key-local removal batch touching few files. */
  def delete(spark: SparkSession, target: String, keys: DataFrame,
             pk: Seq[String], maxRetries: Int = 0,
             snapshotVersion: Option[Int] = None): DeleteStats = {
    require(pk.nonEmpty, s"delete at $target needs a key")
    val keyRows = keys.select(pk.map(col): _*)
      .where(pk.map(col(_).isNotNull).reduce(_ && _)).distinct()
    deleteRetrying(spark, target, maxRetries, snapshotVersion,
      live => live.join(keyRows, pk, "left_semi"),
      live => live.join(keyRows, pk, "left_anti"))
  }

  /** DELETE by predicate (`DELETE FROM t WHERE p`): rows where `predicate`
    * is TRUE die; NULL and FALSE survive (SQL DELETE semantics). Same COW
    * rewrite + CAS commit as the key form. The predicate is pushed into
    * the snapshot scan, so with range/Z-order clustering the affected-file
    * probe prunes on parquet min/max stats instead of reading the table. */
  def deleteWhere(spark: SparkSession, target: String,
                  predicate: org.apache.spark.sql.Column,
                  maxRetries: Int = 0,
                  snapshotVersion: Option[Int] = None): DeleteStats = {
    val doomed = coalesce(predicate, lit(false))
    deleteRetrying(spark, target, maxRetries, snapshotVersion,
      live => live.where(doomed),
      live => live.where(!doomed))
  }

  private def deleteRetrying(spark: SparkSession, target: String,
                             maxRetries: Int, snapshotVersion: Option[Int],
                             doomed: DataFrame => DataFrame,
                             survivors: DataFrame => DataFrame): DeleteStats =
    try deleteOnce(spark, target, snapshotVersion, doomed, survivors)
    catch {
      case _: java.util.ConcurrentModificationException if maxRetries > 0 =>
        // Replay against the FRESH head, exactly like merge's retry.
        deleteRetrying(spark, target, maxRetries - 1, None, doomed, survivors)
    }

  private def deleteOnce(spark: SparkSession, target: String,
                         snapshotVersion: Option[Int],
                         doomed: DataFrame => DataFrame,
                         survivors: DataFrame => DataFrame): DeleteStats = {
    val parentV = snapshotVersion.orElse(currentVersion(target))
      .getOrElse(sys.error(s"no committed version at $target"))
    val before = liveFiles(target, Some(parentV))
    val live = read(spark, target, Some(parentV))
      .withColumn("__file", element_at(split(input_file_name(), "/"), -1))
    val dead = doomed(live)
    val affected = dead.select("__file").distinct()
      .collect().map(_.getString(0)).toSet
    if (affected.isEmpty)
      return DeleteStats(before.size, 0, 0L) // nothing matched: no commit
    val rowsDeleted = dead.count()
    val kept = survivors(live.where(col("__file").isin(affected.toSeq: _*)))
      .drop("__file")
    // A fully-dead file set writes nothing — the manifest just drops it.
    val newFiles =
      if (kept.isEmpty) Seq.empty
      else writeFiles(kept.repartition(math.max(1, affected.size)), target)
    commit(target, (before.filterNot(affected) ++ newFiles).distinct, parentV)
    DeleteStats(before.size, affected.size, rowsDeleted)
  }

  final case class ApplyStats(filesTotal: Int, filesRewritten: Int,
                              rowsUpserted: Long, rowsDeleted: Long,
                              skippedReplay: Boolean = false)

  /** In-transaction idempotence guard for [[applyChanges]] (Delta's
    * txnAppId/txnVersion check): the batch commits only if the newest
    * committed `key` marker still has the value the batch was BUILT
    * against. `expected = Some(v)`: abort unless the marker is exactly
    * v — any movement means a rival maintainer applied an overlapping
    * span (even a SUB-span: a per-commit stream landing base+1 under a
    * scheduled full-span refresh — a >=-only check would let the
    * refresh's retry double-apply that overlap). `expected = None`
    * (no base known): abort only when the marker already covers
    * `newVersion`. Aborts surface as `skippedReplay`, never commit. */
  final case class MarkerGuard(key: String, newVersion: Long,
                               expected: Option[Long] = None) {
    def stale(current: Option[Long]): Boolean = expected match {
      case Some(e) => !current.contains(e)
      case None => current.exists(_ >= newVersion)
    }
  }

  /** Newest value of manifest-metadata `key` at or below a version
    * (head by default) — the generic walk behind progress markers: a
    * commit that doesn't carry the key (a compaction, a rival verb) is
    * skipped; vacuumed manifests read as empty. O(1) in steady state
    * (the head usually carries its consumer's marker). */
  def markerValue(target: String, key: String,
                  atVersion: Option[Int] = None): Option[String] =
    atVersion.orElse(currentVersion(target)) match {
      case None => None
      case Some(head) => (head to 0 by -1).iterator
        .flatMap(v => manifestMeta(target, Some(v)).get(key))
        .nextOption()
    }

  /** MERGE `upserts` and DELETE `deleteKeys` in ONE atomic commit, with
    * optional manifest metadata — the transactional sink for a consumer
    * that must apply a change batch PLUS its progress marker
    * all-or-nothing (IncrementalView's delta application: separate
    * merge / delete / marker steps left a crash window where a
    * redelivered batch double-applied the delta). Same file-granular
    * COW shape as [[merge]] + [[delete]] fused: affected files are
    * those holding a matched upsert key OR a doomed delete key; their
    * survivors (rows matching neither) rewrite together with the
    * incoming batch, everything else carries by manifest reference. A
    * key in BOTH sets ends PRESENT (delete-then-upsert composition). A
    * batch that touches nothing still commits a metadata-only version
    * when `meta` is non-empty, so progress markers advance past empty
    * spans. OCC retry semantics match the single verbs.
    *
    * A [[MarkerGuard]] makes the change batch a TRANSACTIONAL
    * IDEMPOTENT write: each attempt — including every OCC retry, which
    * re-reads the head — first reads the newest committed marker and
    * DROPS THE BATCH WHOLE (no commit, no files, `skippedReplay =
    * true`) when the guard says a rival already applied an overlapping
    * span. A caller-side check-then-act is racy precisely on the retry
    * path: two maintainers of one view both read marker = X, both
    * build the span delta, the loser's retry recomputes against the
    * winner's head and re-applies the same delta (doubling counts) —
    * re-checking INSIDE the attempt, against the same parent version
    * the CAS commits on, closes that window: a rival landing between
    * the check and the CAS fails the CAS, and the retry re-checks. */
  def applyChanges(spark: SparkSession, target: String, upserts: DataFrame,
                   deleteKeys: DataFrame, pk: Seq[String],
                   ordCols: Seq[String] = Nil,
                   meta: Map[String, String] = Map.empty,
                   maxRetries: Int = 0,
                   snapshotVersion: Option[Int] = None,
                   guard: Option[MarkerGuard] = None): ApplyStats =
    try applyChangesOnce(spark, target, upserts, deleteKeys, pk, ordCols,
      meta, snapshotVersion, guard)
    catch {
      case _: java.util.ConcurrentModificationException if maxRetries > 0 =>
        applyChanges(spark, target, upserts, deleteKeys, pk, ordCols, meta,
          maxRetries - 1, guard = guard)
    }

  private def applyChangesOnce(spark: SparkSession, target: String,
                               upserts: DataFrame, deleteKeys: DataFrame,
                               pk: Seq[String], ordCols: Seq[String],
                               meta: Map[String, String],
                               snapshotVersion: Option[Int],
                               guard: Option[MarkerGuard]): ApplyStats = {
    require(pk.nonEmpty, s"applyChanges at $target needs a key")
    val parentV = snapshotVersion.orElse(currentVersion(target))
      .getOrElse(sys.error(s"no committed version at $target"))
    val before = liveFiles(target, Some(parentV))
    guard.foreach { g =>
      if (g.stale(markerValue(target, g.key, Some(parentV)).map(_.toLong)))
        return ApplyStats(before.size, 0, 0L, 0L, skippedReplay = true)
    }
    val snapshot = read(spark, target, Some(parentV))
    val ord = if (ordCols.nonEmpty) ordCols.map(col)
      else Seq(monotonically_increasing_id())
    val incoming = Upsert.dedupByKey(
        upserts.where(pk.map(col(_).isNotNull).reduce(_ && _)), pk, ord)
      .select(snapshot.columns.map(col).toIndexedSeq: _*).cache()
    val keys = deleteKeys.select(pk.map(col): _*)
      .where(pk.map(col(_).isNotNull).reduce(_ && _)).distinct().cache()
    try {
      val live = snapshot
        .withColumn("__file", element_at(split(input_file_name(), "/"), -1))
      val matchedUp = live.join(incoming, pk, "left_semi")
      val matchedDel = live.join(keys, pk, "left_semi")
      val affected = matchedUp.select("__file")
        .union(matchedDel.select("__file")).distinct()
        .collect().map(_.getString(0)).toSet
      val rowsUpserted = incoming.count()
      // Deleted = doomed keys present in the snapshot and NOT re-upserted
      // (delete-then-upsert composition: such a key survives as the
      // incoming row, so it did not end deleted).
      val rowsDeleted = matchedDel.join(incoming, pk, "left_anti").count()
      if (affected.isEmpty && rowsUpserted == 0L) {
        // Nothing to rewrite: a metadata-only commit still advances the
        // progress marker atomically (same file list, next version).
        if (meta.nonEmpty) commit(target, before, parentV, meta)
        return ApplyStats(before.size, 0, 0L, 0L)
      }
      val survivors = live
        .where(col("__file").isin(affected.toSeq: _*))
        .join(incoming, pk, "left_anti")
        .join(keys, pk, "left_anti")
        .drop("__file")
      val replacement = survivors.unionByName(incoming)
      val newFiles =
        if (affected.isEmpty) writeFiles(incoming, target)
        else if (replacement.isEmpty) Seq.empty
        else writeFiles(
          replacement.repartition(math.max(1, affected.size)), target)
      commit(target, (before.filterNot(affected) ++ newFiles).distinct,
        parentV, meta)
      ApplyStats(before.size, affected.size, rowsUpserted, rowsDeleted)
    } finally { incoming.unpersist(); keys.unpersist() }
  }

  /** Loud contract for consumers reading BEHIND head: every manifest a
    * change-feed span touches must still exist. After a vacuum dropped
    * one, the raw failure was a NoSuchFileException mid-plan (or a
    * FileNotFoundException mid-job); this names the cause and the
    * remedy instead. */
  private def requireSpanReadable(target: String, versions: Int*): Unit = {
    val missing = versions.distinct.sorted.filterNot(v =>
      Files.exists(manifestDir(target).resolve(s"v$v.list")))
    if (missing.nonEmpty)
      throw new IllegalStateException(
        s"change-feed span version(s) ${missing.mkString(", ")} vacuumed " +
          s"at $target — increase retainVersions (or the vacuum grace " +
          "window) so retention covers this consumer's lag, and rebuild " +
          "the consumer from a retained snapshot")
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
    requireSpanReadable(target, fromVersion, toVersion)
    def readFiles(names: Seq[String]): Option[DataFrame] =
      if (names.isEmpty) None
      else Some(spark.read.option("mergeSchema", "true").parquet(
        names.map(f => dataDir(target).resolve(f).toString): _*))
    val before = liveFiles(target, Some(fromVersion)).toSet
    val after = liveFiles(target, Some(toVersion)).toSet
    (readFiles((after -- before).toSeq.sorted),
      readFiles((before -- after).toSeq.sorted)) match {
      case (None, _) => read(spark, target, Some(toVersion)).limit(0)
      case (Some(added), None) => added
      case (Some(added), Some(removed)) =>
        // Align across schema evolution: pre-evolution removed files
        // null-fill the appended columns, exactly as read() shows them.
        added.exceptAll(
          added.limit(0).unionByName(removed, allowMissingColumns = true))
    }
  }

  /** Typed change feed between two committed versions — [[diff]] plus
    * removals. Emits every changed row tagged `_change_type`
    * (Delta CDF's column name): `insert` (key new in `toVersion`),
    * `update_postimage` (key existed, content changed — the new row),
    * `delete` (key gone — the old row, so downstream consumers can
    * propagate the removal). Keyed on `pk`, so it understands DELETEs
    * the row-multiset [[diff]] cannot distinguish from rewrites.
    *
    * Same file-pruning argument as diff: immutable files common to both
    * manifests cancel exactly, so only each side's unique files are
    * scanned. A pure compaction (same content, new layout) emits ZERO
    * rows: post-images are content-diffed (exceptAll) before keying,
    * not just key-matched.
    *
    * `includePreimages = true` additionally emits `update_preimage`
    * rows (the OLD row of every content-changed key — Delta CDF's
    * fourth change type). Consumers that must SUBTRACT superseded state
    * (incremental view maintenance, downstream aggregates) need the
    * pre-image; plain replication does not, so the default stays the
    * three-type feed. Pre-images come from the same two already-aligned
    * per-side unique-file scans — no extra IO. */
  def changes(spark: SparkSession, target: String,
              fromVersion: Int, toVersion: Int,
              pk: Seq[String], includePreimages: Boolean = false): DataFrame = {
    require(pk.nonEmpty, s"changes at $target needs a key")
    requireSpanReadable(target, fromVersion, toVersion)
    def readFiles(names: Seq[String]): Option[DataFrame] =
      if (names.isEmpty) None
      else Some(spark.read.option("mergeSchema", "true").parquet(
        names.map(f => dataDir(target).resolve(f).toString): _*))
    val beforeNames = liveFiles(target, Some(fromVersion)).toSet
    val afterNames = liveFiles(target, Some(toVersion)).toSet
    val emptyOut = read(spark, target, Some(toVersion)).limit(0)
      .withColumn("_change_type", lit(""))
    (readFiles((afterNames -- beforeNames).toSeq.sorted),
      readFiles((beforeNames -- afterNames).toSeq.sorted)) match {
      case (None, None) => emptyOut
      case (added, removed) =>
        // Align both sides onto the evolved (to-version) schema: removed
        // pre-evolution files null-fill appended columns, as read() does.
        val base = emptyOut.drop("_change_type")
        def align(df: DataFrame): DataFrame =
          base.unionByName(df, allowMissingColumns = true)
        val addRows = added.map(align).getOrElse(base)
        val remRows = removed.map(align).getOrElse(base)
        val remKeys = remRows.select(pk.map(col): _*).distinct()
        val addKeys = addRows.select(pk.map(col): _*).distinct()
        // Content-changed post-images only — a compaction emits nothing.
        val changedPost = addRows.exceptAll(remRows)
        val inserts = changedPost.join(remKeys, pk, "left_anti")
          .withColumn("_change_type", lit("insert"))
        val updates = changedPost.join(remKeys, pk, "left_semi")
          .withColumn("_change_type", lit("update_postimage"))
        val deletes = remRows.join(addKeys, pk, "left_anti")
          .withColumn("_change_type", lit("delete"))
        val threeTyped = inserts.unionByName(updates).unionByName(deletes)
        val typed =
          if (!includePreimages) threeTyped
          else {
            // Old rows of content-changed surviving keys — the mirror of
            // `updates`: content-diff from the REMOVED side, then keep
            // only keys that still exist (pure-compaction rows cancelled
            // in the exceptAll, so a layout rewrite still emits nothing).
            val preimages = remRows.exceptAll(addRows)
              .join(addKeys, pk, "left_semi")
              .withColumn("_change_type", lit("update_preimage"))
            threeTyped.unionByName(preimages)
          }
        // Stable contract: table columns in table order, then the tag —
        // the key-USING joins above float `pk` to the front, which
        // positional consumers (the CDC source's InternalRow wrap) must
        // never see vary with the choice of key.
        typed.select(base.columns.map(col) :+ col("_change_type"): _*)
    }
  }

  final case class SyncStats(upserted: Long, deleted: Long)

  /** Replicate a version span onto another MergeStore table by shipping
    * ONLY the change feed — the cross-region/downstream-copy primitive.
    * At 100 TB a replica cannot re-copy the table per refresh; the
    * industry shape (Delta deep-clone incremental sync, Iceberg
    * changelog consumption) is: read changes(from, to), MERGE the
    * insert/update post-images, DELETE the deleted keys. Both verbs are
    * file-granular on the replica, so a trickle of source commits costs
    * a trickle of replica rewrites.
    *
    * The replica must exist (initialize it once from
    * `read(source, Some(fromVersion))` — the "deep clone" step);
    * `fromVersion` must be the replica's last-applied source version
    * for the span composition to be exact. Because changes() nets each
    * key to ONE terminal change across the span, apply order within the
    * span is immaterial. Idempotent: re-syncing an applied span is a
    * no-op merge + no-op delete. */
  def sync(spark: SparkSession, source: String, replica: String,
           fromVersion: Int, toVersion: Int, pk: Seq[String],
           maxRetries: Int = 3): SyncStats = {
    require(exists(replica),
      s"replica $replica must be initialized from source version $fromVersion")
    val feed = changes(spark, source, fromVersion, toVersion, pk).cache()
    try {
      val upserts = feed.where(col("_change_type").isin(
        "insert", "update_postimage")).drop("_change_type")
      val deletes = feed.where(col("_change_type") === "delete")
        .select(pk.map(col): _*).distinct()
      val nUp = upserts.count()
      if (nUp > 0) merge(spark, upserts, replica, pk, maxRetries = maxRetries)
      val del =
        if (deletes.isEmpty) DeleteStats(0, 0, 0L)
        else delete(spark, replica, deletes, pk, maxRetries = maxRetries)
      SyncStats(nUp, del.rowsDeleted)
    } finally feed.unpersist()
  }

  /** Compact: bin-pack the live rows into `targetFiles` files and commit
    * the result as the next version — pure layout rewrite, content
    * unchanged. A long run of trickle merges accretes small replacement
    * files (every scan pays a per-file open); periodic compaction is the
    * standard table-format answer. `clusterBy` restores range clustering
    * so future merges stay few-file again. */
  def compact(spark: SparkSession, target: String, targetFiles: Int,
              clusterBy: Seq[String] = Nil,
              meta: Map[String, String] = Map.empty): Int = {
    val parentV = currentVersion(target)
      .getOrElse(sys.error(s"no committed version at $target"))
    val df = read(spark, target, Some(parentV))
    val arranged =
      if (clusterBy.nonEmpty) df.repartitionByRange(targetFiles, clusterBy.map(col): _*)
      else df.repartition(targetFiles)
    commit(target, writeFiles(arranged, target), parentV, meta)
  }

  /** Delete data files outside the retention window: anything not
    * referenced by the newest `retainVersions` manifests (default 1 —
    * the original keep-head-only behavior; older manifests above the
    * floor are dropped too, ending their time travel).
    *
    * Retention interacts with optimistic concurrency: a reader pinned on
    * version N (time travel, or a long scan that resolved the manifest
    * before a rival committed N+1) still needs N's files. Head-only
    * vacuum is safe only when nothing reads behind head; a multi-writer/
    * multi-reader deployment sets `retainVersions` to cover its longest
    * reader — exactly Delta's `VACUUM ... RETAIN` contract, expressed in
    * versions instead of hours.
    *
    * Retention also protects IN-FLIGHT WRITERS: a rival merge stages its
    * data files via writeFiles() BEFORE winning the manifest CAS; in that
    * window the files are unreferenced and look like orphans. `graceMillis`
    * (default [[DefaultVacuumGraceMillis]]) skips any data file younger
    * than the window, so a concurrent vacuum can never delete files a
    * soon-to-win commit will reference. Pass 0 only when no writer can be
    * mid-merge (single-writer maintenance windows, tests). */
  def vacuum(target: String, retainVersions: Int = 1,
             graceMillis: Long = DefaultVacuumGraceMillis): Int = {
    require(retainVersions >= 1, "must retain at least the head version")
    val head = currentVersion(target)
      .getOrElse(return 0)
    val floor = math.max(0, head - retainVersions + 1)
    val live = (floor to head).flatMap(v => liveFiles(target, Some(v))).toSet
    val cutoff = System.currentTimeMillis() - graceMillis
    val orphans = Files.list(dataDir(target)).iterator().asScala
      .filter(p => !live.contains(p.getFileName.toString) &&
        Files.getLastModifiedTime(p).toMillis <= cutoff).toSeq
    orphans.foreach(Files.deleteIfExists)
    // Manifests below the retention floor reference vanished files —
    // remove them so a stale time travel fails at manifest lookup (a
    // clear error) instead of at mid-scan file-not-found.
    Files.list(manifestDir(target)).iterator().asScala
      .filter { p =>
        val n = p.getFileName.toString
        n.startsWith("v") && n.endsWith(".list") &&
          n.stripPrefix("v").stripSuffix(".list").toInt < floor
      }.toSeq.foreach(Files.deleteIfExists)
    orphans.size
  }
}
