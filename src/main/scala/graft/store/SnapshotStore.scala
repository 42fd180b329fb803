package graft.store

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import scala.jdk.CollectionConverters._

/** Versioned-snapshot directory publishing — the shared commit protocol
  * behind every PERSISTED INDEX in the engine (BM25 postings, the IVF
  * vector index). MergeStore solves atomicity for row tables with a
  * per-file manifest; an index is a small constellation of derived
  * tables that must be read AS ONE CONSISTENT SET (postings with their
  * df/stats, vectors with their centroid layout), so the unit of commit
  * here is a whole snapshot DIRECTORY:
  *
  *   <root>/snap-<N>/...      immutable complete snapshot
  *   <root>/_commits/v<N>     commit markers (empty files)
  *
  * A writer stages a complete snapshot under a hidden temp name inside
  * the root (same filesystem → rename is atomic), renames it to
  * snap-<N+1>, then publishes by hard-linking the v<N+1> marker —
  * create-if-absent, so two racing writers serialize exactly like
  * MergeStore's manifest CAS: the loser gets
  * ConcurrentModificationException and recomputes against the new head.
  * Readers resolve the highest committed marker once and read only that
  * snapshot's directories — never a mix of generations. Incremental
  * writers carry the previous snapshot's immutable data files into the
  * new snapshot BY HARD LINK (O(1) per file, zero bytes copied), so an
  * append costs the batch plus the summary tables, not a data copy.
  * On an object store the same slots map to a conditional PUT; the
  * carry-by-link becomes manifest reuse (Iceberg's shape).
  */
object SnapshotStore {

  private def commitsDir(root: String): Path = Paths.get(root, "_commits")

  def snapPath(root: String, v: Int): String = s"$root/snap-$v"

  /** Highest committed snapshot version, if any. */
  def currentVersion(root: String): Option[Int] = {
    val dir = commitsDir(root)
    if (!Files.isDirectory(dir)) None
    else {
      val vs = Files.list(dir).iterator().asScala
        .map(_.getFileName.toString)
        .collect { case s if s.startsWith("v") => s.stripPrefix("v").toInt }
        .toSeq
      if (vs.isEmpty) None else Some(vs.max)
    }
  }

  /** The committed snapshot directory to read (newest by default) —
    * loud failure on an empty root. */
  def resolve(root: String, version: Option[Int] = None): String =
    snapPath(root, version.orElse(currentVersion(root)).getOrElse(
      sys.error(s"no committed snapshot at $root")))

  /** Create a hidden staging directory inside `root` (same filesystem as
    * the final name, so the publish rename is atomic). */
  def stage(root: String): Path = {
    Files.createDirectories(Paths.get(root))
    Files.createTempDirectory(Paths.get(root), ".stage-")
  }

  /** Hard-link every data file under `from` into the same relative
    * location under `into`, prefixing file names with `prefix` so carried
    * files can never collide with the batch's own part files. Walks
    * nested partition directories (ivf_cluster=N/...). */
  def carryLink(from: Path, into: Path, prefix: String): Unit = {
    Files.walk(from).iterator().asScala
      .filter(p => Files.isRegularFile(p) &&
        p.getFileName.toString.endsWith(".parquet"))
      .foreach { p =>
        val rel = from.relativize(p)
        val target =
          if (rel.getParent == null) into.resolve(prefix + rel.getFileName)
          else into.resolve(rel.getParent.toString)
            .resolve(prefix + rel.getFileName)
        Files.createDirectories(target.getParent)
        Files.createLink(target, p)
      }
  }

  /** Metadata file name inside a snapshot: `key=value` lines written
    * into the STAGE before publish, so metadata commits atomically with
    * the snapshot it describes — the MergeStore manifest-metadata idiom
    * for directory snapshots. A consumer's progress marker (the applied
    * source version of a continuously maintained index) rides here:
    * no crash can separate "batch applied" from "marker advanced". */
  private val MetaFile = "_meta"

  /** Write `meta` into a staged snapshot (call before [[publish]]).
    * Keys and values must be newline-free; keys '='-free. */
  def writeMeta(staged: Path, meta: Map[String, String]): Unit =
    if (meta.nonEmpty) {
      meta.foreach { case (k, v) =>
        require(k.nonEmpty && !k.contains('=') &&
          !(k + v).exists(c => c == '\n' || c == '\r'),
          s"snapshot metadata must be newline-free with '='-free keys: $k=$v")
      }
      Files.write(staged.resolve(MetaFile),
        meta.toSeq.sorted.map { case (k, v) => s"$k=$v" }
          .mkString("\n").getBytes("UTF-8"))
    }

  /** Metadata of a committed snapshot (empty when the writer attached
    * none, and for vacuumed versions). */
  def meta(root: String, version: Option[Int] = None): Map[String, String] = {
    val v = version.orElse(currentVersion(root))
      .getOrElse(return Map.empty)
    val p = Paths.get(snapPath(root, v), MetaFile)
    if (!Files.exists(p)) Map.empty
    else Files.readAllLines(p).asScala.filter(_.nonEmpty).map { l =>
      val i = l.indexOf('=')
      require(i > 0, s"malformed snapshot metadata at $root v$v: $l")
      l.take(i) -> l.drop(i + 1)
    }.toMap
  }

  /** Newest value of metadata `key` at or below a version (head by
    * default) — a commit that doesn't carry the key (a compaction, a
    * rival verb) is skipped; vacuumed snapshots read as empty. O(1) in
    * steady state (the head usually carries its consumer's marker). */
  def markerValue(root: String, key: String,
                  atVersion: Option[Int] = None): Option[String] =
    atVersion.orElse(currentVersion(root)) match {
      case None => None
      case Some(head) => (head to 0 by -1).iterator
        .flatMap(v => meta(root, Some(v)).get(key))
        .nextOption()
    }

  /** Atomically publish `staged` as snap-(parent+1): rename into place,
    * then CAS the commit marker (create-if-absent — a lost race throws
    * ConcurrentModificationException, MergeStore's protocol). */
  def publish(root: String, staged: Path, parent: Int): Int = {
    val next = parent + 1
    val finalDir = Paths.get(snapPath(root, next))
    Files.createDirectories(commitsDir(root))
    val marker = commitsDir(root).resolve(s"v$next")
    val tmpMarker = commitsDir(root).resolve(
      s".v$next-${java.util.UUID.randomUUID().toString.take(8)}.tmp")
    Files.write(tmpMarker, Array.emptyByteArray)
    def conflict(): Nothing =
      throw new java.util.ConcurrentModificationException(
        s"snapshot commit conflict at $root: another writer took v$next " +
          s"— re-read the head and retry (a snap-$next dir without a " +
          s"v$next marker would be a crashed writer's residue: remove it)")
    try {
      // The rename is the first CAS arm: a rival's snapshot already at
      // snap-<next> fails the move — same conflict as losing the marker.
      try Files.move(staged, finalDir, StandardCopyOption.ATOMIC_MOVE)
      catch {
        case _: java.nio.file.FileAlreadyExistsException => conflict()
        case e: java.nio.file.FileSystemException
          if Files.exists(finalDir) => conflict()
      }
      try { Files.createLink(marker, tmpMarker); next }
      catch {
        case _: java.nio.file.FileAlreadyExistsException => conflict()
      }
    } finally Files.deleteIfExists(tmpMarker)
  }

  /** Drop snapshots below the newest `retainVersions` (markers + dirs).
    * Hard-linked carries keep shared data files alive until the LAST
    * snapshot referencing them is removed — the filesystem's link count
    * is the reference count, so no orphan tracking is needed. */
  def vacuum(root: String, retainVersions: Int = 1): Int = {
    require(retainVersions >= 1, "must retain at least the head snapshot")
    currentVersion(root) match {
      case None => 0
      case Some(head) =>
        val floor = head - retainVersions + 1
        val doomed = Files.list(commitsDir(root)).iterator().asScala
          .map(_.getFileName.toString)
          .collect { case s if s.startsWith("v") => s.stripPrefix("v").toInt }
          .filter(_ < floor).toSeq
        doomed.foreach { v =>
          val dir = Paths.get(snapPath(root, v))
          if (Files.isDirectory(dir))
            Files.walk(dir).iterator().asScala.toSeq.reverse
              .foreach(Files.deleteIfExists)
          Files.deleteIfExists(commitsDir(root).resolve(s"v$v"))
        }
        doomed.size
    }
  }
}
