package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{GraftSession, Tables}
import graft.functions.Winnowing
import graft.operators.Dedup
import graft.registry.Registry
import graft.store.{CoreStore, MergeStore}

/** Scaling probe for the heavy text operators: replicates the `documents`
  * corpus N times (fresh doc_ids) and times fingerprinting / dedup at
  * growing multiples, so SCALE.md's linearity claims are measured, not
  * asserted. Usage:
  *
  *   runMain graft.ScaleProbe <sfDir> <multiple> [multiple...]
  *
  * Prints one JSON line per multiple. Replication note: near-dup pair
  * counts are NOT meaningful on replicated data (every copy is an exact
  * dup of its source) — this probe times fingerprint/shingle/signature
  * construction and exact-dedup grouping, the corpus-linear stages; the
  * pair-join stages are exercised by Bench on the real corpus.
  */
object ScaleProbe {

  private def time[A](a: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val r = a
    (r, (System.nanoTime() - t0) / 1e9)
  }

  private def replicate(docs: DataFrame, n: Int): DataFrame = {
    val total = docs.count()
    (0 until n).map { i =>
      docs.select((col("doc_id") + lit(i * total)).as("doc_id"),
        col("text"), col("lang"))
    }.reduce(_ unionByName _)
  }

  /** Bytes and file count written under `dir` since `t0` (recursive) —
    * how the sink-delta probe attributes physical write amplification. */
  private def writtenSince(dir: String, t0: Long): (Long, Int) = {
    val root = java.nio.file.Paths.get(dir)
    if (!java.nio.file.Files.isDirectory(root)) return (0L, 0)
    val it = java.nio.file.Files.walk(root)
    try {
      val fresh = it.iterator()
      var bytes = 0L; var files = 0
      fresh.forEachRemaining { p =>
        if (java.nio.file.Files.isRegularFile(p) &&
            p.getFileName.toString.endsWith(".parquet") &&
            java.nio.file.Files.getLastModifiedTime(p).toMillis >= t0) {
          bytes += java.nio.file.Files.size(p); files += 1
        }
      }
      (bytes, files)
    } finally it.close()
  }

  /** Measured write-amplification delta between the two core sinks on a
    * trickle update, through the REAL store code the pipeline dispatches
    * to ([[Runner.loadCoreFromRaw]]'s `sink` selector): a directory-shaped
    * table of `n` rows over `years` year partitions, then a 100-key
    * single-year update batch through `CoreStore.upsert` (partition
    * rewrite) vs `MergeStore.upsert` (file-granular COW). Prints one JSON
    * line; numbers land in SCALE.md §MERGE. */
  private def sinkDeltaProbe(spark: SparkSession, n: Long, years: Int,
                             filesPerYear: Int): Unit = {
    val ep = Registry.directory
    val perYear = n / years
    val base = spark.range(n).select(
      (col("id") % perYear).cast("int").as("unitid"),
      (lit(2014) + (col("id") / perYear)).cast("int").as("year"),
      concat(lit("Institution #"), col("id")).as("inst_name"),
      concat(lit("City "), col("id") % 1000).as("city"),
      (col("id") % 180 - 90.0).as("latitude"),
      (col("id") % 360 - 180.0).as("longitude"))
    val typed = ep.columns.foldLeft(base) { (df, c) =>
      if (df.columns.contains(c.target)) df
      else df.withColumn(c.target, lit(null).cast(c.dataType))
    }.select(ep.columns.map(c => col(c.target)): _*).cache()
    typed.count()

    val root = java.nio.file.Files
      .createTempDirectory("scaleprobe-sink").toString
    val targetP = CoreStore.path(root + "/p", ep.name)
    val targetM = CoreStore.path(root + "/m", ep.name)
    CoreStore.upsert(spark, typed, root + "/p", ep)
    MergeStore.upsert(spark, typed, targetM, ep.primaryKey,
      ep.columns.map(_.target), clusterBy = Seq("year", "unitid"),
      numFiles = years * filesPerYear)

    // 100 keys, one year — the trickle shape.
    val updates = typed.where(col("year") === 2014 && col("unitid") < 100)
      .withColumn("inst_name", concat(lit("UPDATED "), col("inst_name")))

    val t0p = System.currentTimeMillis()
    val (_, tP) = time { CoreStore.upsert(spark, updates, root + "/p", ep) }
    val (bytesP, filesP) = writtenSince(targetP, t0p)

    val t0m = System.currentTimeMillis()
    val (_, tM) = time {
      MergeStore.upsert(spark, updates, targetM, ep.primaryKey,
        ep.columns.map(_.target), clusterBy = Seq("year", "unitid"))
    }
    val (bytesM, filesM) = writtenSince(targetM + "/data", t0m)
    typed.unpersist()

    println(s"""{"metric":"sink_delta","rows":$n,"years":$years,""" +
      s""""files_per_year":$filesPerYear,""" +
      s""""update_keys":100,"partition_sec":${f"$tP%.2f"},""" +
      s""""partition_bytes_written":$bytesP,"partition_files_written":$filesP,""" +
      s""""merge_sec":${f"$tM%.2f"},"merge_bytes_written":$bytesM,""" +
      s""""merge_files_written":$filesM}""")
  }

  /** Block-count sensitivity for the exact block-grid similarity join
    * (q40's operator): times [[graft.operators.Similarity.blockedNearDupPairs]]
    * over the real embeddings at each `blocks` setting, pinning the same
    * pair count (exactness is block-count-invariant; only distribution
    * granularity changes). Sizing rule goes in SCALE.md §q40. */
  private def blockCurveProbe(spark: SparkSession, sfDir: String,
                              blockCounts: Seq[Int]): Unit = {
    val emb = Tables.load(spark, sfDir, "embeddings")
      .select("vec_id", "embedding").cache()
    emb.count()
    blockCounts.foreach { blocks =>
      val (pairs, t) = time {
        graft.operators.Similarity.blockedNearDupPairs(
          spark, emb, "vec_id", "embedding",
          threshold = 0.42, blocks = blocks).count()
      }
      println(s"""{"metric":"block_curve","blocks":$blocks,""" +
        s""""pairs":$pairs,"sec":${f"$t%.2f"}}""")
    }
    emb.unpersist()
  }

  /** Data-skipping curve: the SAME selective predicate over the SAME rows
    * in a range-clustered vs hash-shuffled parquet layout, at growing file
    * counts — measures the bytes a pushed filter actually reads
    * ([[graft.store.Layouts]]; numbers land in SCALE.md §LAYOUT). */
  private def skipCurveProbe(spark: SparkSession, sfDir: String,
                             replicate: Int, fileCounts: Seq[Int]): Unit = {
    import graft.store.Layouts
    val base = Tables.load(spark, sfDir, "events")
      .select("event_id", "user_id", "event_type", "value")
    val big = (0 until replicate).map { i =>
      base.select((col("event_id") + lit(i * 10000000L)).as("event_id"),
        col("user_id"), col("event_type"), col("value"))
    }.reduce(_ unionByName _).cache()
    val n = big.count()
    val dir = java.nio.file.Files.createTempDirectory("skipcurve").toString
    fileCounts.foreach { files =>
      Layouts.clusteredWrite(big, s"$dir/c$files", Seq("user_id"), files)
      big.repartition(files, hash(col("event_id")))
        .write.mode("overwrite").parquet(s"$dir/s$files")
      def scan(path: String): (Long, Long, Double) = {
        val ((rows, t), bytes) = Layouts.measuredInputBytes(spark) {
          time(spark.read.parquet(path)
            .where(col("user_id") === 7L).count())
        }
        (rows, bytes, t)
      }
      val (rowsC, bytesC, tC) = scan(s"$dir/c$files")
      val (rowsS, bytesS, tS) = scan(s"$dir/s$files")
      require(rowsC == rowsS, s"layout changed the answer: $rowsC != $rowsS")
      println(s"""{"metric":"skip_curve","rows":$n,"files":$files,""" +
        s""""clustered_bytes":$bytesC,"shuffled_bytes":$bytesS,""" +
        s""""ratio":${f"${bytesS.toDouble / math.max(bytesC, 1)}%.1f"},""" +
        s""""clustered_sec":${f"$tC%.2f"},"shuffled_sec":${f"$tS%.2f"}}""")
    }
    big.unpersist()
  }

  /** Manifest-level data-skipping audit (MergeStore per-file stats vs a
    * stats-less twin): the same range-clustered COW table is built WITH
    * and WITHOUT manifest stats, then (a) a narrow range read and (b) a
    * key-local trickle merge run against both. The stats table's probe
    * should plan O(overlapping files) — candidate counts, scanned bytes,
    * and wall time are all reported, and both arms must return identical
    * answers. This is the layer ABOVE skip-curve's row-group stats: at
    * 100 TB the row-group path still lists and opens every live file's
    * footer (an object-store GET each); the manifest path prunes from
    * the commit log alone. */
  /** Deletion vectors vs copy-on-write for the design-case workload:
    * a SCATTERED point-delete batch (one key per file — COW's worst
    * case, it rewrites every file; MOR's best case, it writes k tiny
    * sidecars). Measures delete cost both ways, the read tax the
    * vectors impose (broadcast anti-join vs plain scan), and the
    * purge that retires it. Answers cross-checked between arms. */
  private def dvProbe(spark: SparkSession, n: Long,
                      fileCounts: Seq[Int]): Unit = {
    val df = spark.range(n).select(col("id"),
      (col("id") % 97).cast("int").as("grp"),
      concat(lit("payload-"), col("id")).as("payload"))
    fileCounts.foreach { files =>
      val dir = java.nio.file.Files.createTempDirectory("dvprobe").toString
      val tMor = s"$dir/mor"
      val tCow = s"$dir/cow"
      MergeStore.init(spark, df, tMor, files, clusterBy = Seq("id"))
      MergeStore.init(spark, df, tCow, files, clusterBy = Seq("id"))
      val step = math.max(1L, n / 100)
      def keys = spark.range(100).select((col("id") * step + 1).as("id"))
      val (morStats, morSec) =
        time(MergeStore.deleteMor(spark, tMor, keys, Seq("id")))
      val (cowStats, cowSec) =
        time(MergeStore.delete(spark, tCow, keys, Seq("id")))
      require(morStats.rowsDeleted == cowStats.rowsDeleted,
        s"MOR and COW disagree: ${morStats.rowsDeleted} != " +
          s"${cowStats.rowsDeleted}")
      val (cntDv, readDvSec) = time(MergeStore.read(spark, tMor).count())
      val (cntCow, readCowSec) = time(MergeStore.read(spark, tCow).count())
      require(cntDv == cntCow, s"DV read diverged: $cntDv != $cntCow")
      val (purged, purgeSec) = time(MergeStore.purgeDeletes(spark, tMor))
      val (cntP, readPurgedSec) = time(MergeStore.read(spark, tMor).count())
      require(cntP == cntDv, "purge changed the answer")
      println(s"""{"metric":"dv_vs_cow","rows":$n,"files":$files,""" +
        s""""rows_deleted":${morStats.rowsDeleted},""" +
        s""""mor_delete_sec":${f"$morSec%.3f"},""" +
        s""""cow_delete_sec":${f"$cowSec%.3f"},""" +
        s""""files_marked":${morStats.filesMarked},""" +
        s""""files_rewritten_cow":${cowStats.filesRewritten},""" +
        s""""read_dv_sec":${f"$readDvSec%.3f"},""" +
        s""""read_cow_sec":${f"$readCowSec%.3f"},""" +
        s""""purge_sec":${f"$purgeSec%.3f"},"purged_files":$purged,""" +
        s""""read_purged_sec":${f"$readPurgedSec%.3f"}}""")
    }
  }

  /** The AUTOMATIC skipping path (GraftFileIndex behind readSkipping)
    * vs a plain full-list read, same filtered aggregate: verifies the
    * FileIndex route hits the manifest-pruned numbers with no explicit
    * scan verb — and that a DV-bearing table keeps skipping (the
    * anti-join rides above the pruned scan). Answers cross-checked. */
  private def skipReadProbe(spark: SparkSession, n: Long,
                            fileCounts: Seq[Int]): Unit = {
    import graft.store.Layouts
    val df = spark.range(n).select(col("id"),
      (col("id") % 97).cast("int").as("grp"),
      concat(lit("payload-"), col("id")).as("payload"))
    fileCounts.foreach { files =>
      val t = java.nio.file.Files.createTempDirectory("skipread")
        .toString + "/tbl"
      MergeStore.init(spark, df, t, files, clusterBy = Seq("id"))
      val lo = n / 2
      val hi = n / 2 + 1000
      def pred = col("id") >= lo && col("id") <= hi
      val (skipRes, bytesSkip) = Layouts.measuredInputBytes(spark) {
        time(MergeStore.readSkipping(spark, t).where(pred)
          .agg(count(lit(1)), sum("id")).collect()(0))
      }
      val (fullRes, bytesFull) = Layouts.measuredInputBytes(spark) {
        time(MergeStore.read(spark, t).where(pred)
          .agg(count(lit(1)), sum("id")).collect()(0))
      }
      require(skipRes._1 == fullRes._1,
        s"skipping changed the answer: ${skipRes._1} != ${fullRes._1}")
      // MOR-delete half the probed range: skipping must survive DVs.
      MergeStore.deleteWhereMor(spark, t,
        col("id") >= lo && col("id") < lo + 500)
      val (dvRes, bytesDv) = Layouts.measuredInputBytes(spark) {
        time(MergeStore.readSkipping(spark, t).where(pred)
          .agg(count(lit(1)), sum("id")).collect()(0))
      }
      val expectRows = hi - lo + 1 - 500
      require(dvRes._1.getLong(0) == expectRows,
        s"DV read wrong: ${dvRes._1.getLong(0)} != $expectRows")
      println(s"""{"metric":"skip_read","rows":$n,"files":$files,""" +
        s""""skip_sec":${f"${skipRes._2}%.3f"},""" +
        s""""full_sec":${f"${fullRes._2}%.3f"},""" +
        s""""skip_bytes":$bytesSkip,"full_bytes":$bytesFull,""" +
        s""""skip_dv_sec":${f"${dvRes._2}%.3f"},""" +
        s""""skip_dv_bytes":$bytesDv}""")
    }
  }

  /** Null-count skipping at the sparse-optional-column shape: `emb` is
    * non-null for only the newest `density` fraction of rows (an
    * embedding backfill in progress). Clustered on the same axis, most
    * files are ENTIRELY null — invisible to min/max stats. Measures an
    * IS NOT NULL aggregate (the backfill consumer) and an IS NULL count
    * (the backlog audit) through readSkipping vs the plain read, and a
    * DELETE WHERE emb IS NULL-shaped probe prune on the verb path. */
  private def nullSkipProbe(spark: SparkSession, n: Long,
                            fileCounts: Seq[Int],
                            density: Double = 0.05): Unit = {
    import graft.store.Layouts
    val cut = (n * (1.0 - density)).toLong
    val df = spark.range(n).select(col("id"),
      when(col("id") >= cut, col("id").cast("double") * 0.25)
        .otherwise(lit(null)).as("emb"),
      concat(lit("payload-"), col("id")).as("payload"))
    fileCounts.foreach { files =>
      val t = java.nio.file.Files.createTempDirectory("nullskip")
        .toString + "/tbl"
      MergeStore.init(spark, df, t, files, clusterBy = Seq("id"),
        statsCols = Some(Seq("id", "emb")))
      def aggIt(d: org.apache.spark.sql.DataFrame) =
        d.where(col("emb").isNotNull)
          .agg(count(lit(1)), sum("emb")).collect()(0)
      val (skipRes, bytesSkip) = Layouts.measuredInputBytes(spark) {
        time(aggIt(MergeStore.readSkipping(spark, t)))
      }
      val (fullRes, bytesFull) = Layouts.measuredInputBytes(spark) {
        time(aggIt(MergeStore.read(spark, t)))
      }
      require(skipRes._1 == fullRes._1,
        s"null skipping changed the answer: ${skipRes._1} != ${fullRes._1}")
      val (nullCnt, bytesNull) = Layouts.measuredInputBytes(spark) {
        time(MergeStore.readSkipping(spark, t)
          .where(col("emb").isNull).count())
      }
      require(nullCnt._1 == cut,
        s"IS NULL count wrong: ${nullCnt._1} != $cut")
      println(s"""{"metric":"null_skip","rows":$n,"files":$files,""" +
        s""""density":$density,""" +
        s""""notnull_skip_sec":${f"${skipRes._2}%.3f"},""" +
        s""""notnull_full_sec":${f"${fullRes._2}%.3f"},""" +
        s""""skip_bytes":$bytesSkip,"full_bytes":$bytesFull,""" +
        s""""isnull_skip_sec":${f"${nullCnt._2}%.3f"},""" +
        s""""isnull_bytes":$bytesNull}""")
    }
  }

  private def manifestSkipProbe(spark: SparkSession, n: Long,
                                fileCounts: Seq[Int]): Unit = {
    import graft.store.Layouts
    val df = spark.range(n).select(col("id"),
      (col("id") % 97).cast("int").as("grp"),
      // High-cardinality key UNCORRELATED with the id clustering — the
      // bloom arm's lookup column (min/max can't prune it).
      ((col("id") * 48271L) % n).as("doc"),
      concat(lit("payload-"), col("id")).as("payload"))
    fileCounts.foreach { files =>
      val dir = java.nio.file.Files.createTempDirectory("manifestskip")
        .toString
      val tA = s"$dir/with-stats"
      val tB = s"$dir/no-stats"
      val tBloom0 = System.nanoTime()
      MergeStore.init(spark, df, tA, files, clusterBy = Seq("id"),
        bloomCols = Seq("doc"))
      val bloomBuildSec = (System.nanoTime() - tBloom0) / 1e9
      MergeStore.init(spark, df, tB, files, clusterBy = Seq("id"),
        statsCols = Some(Nil))
      val lo = n / 2
      val hi = n / 2 + 1000
      val cand = MergeStore.candidateFiles(spark, tA, "id",
        Some(lo), Some(hi)).size
      val (scanA, bytesA) = Layouts.measuredInputBytes(spark) {
        time(MergeStore.scanRange(spark, tA, "id", Some(lo), Some(hi))
          .count())
      }
      val (scanB, bytesB) = Layouts.measuredInputBytes(spark) {
        time(MergeStore.scanRange(spark, tB, "id", Some(lo), Some(hi))
          .count())
      }
      require(scanA._1 == scanB._1,
        s"pruning changed the answer: ${scanA._1} != ${scanB._1}")
      // Bloom arm: a 5-key point-lookup batch on the uncorrelated
      // column — plan-time bloom tests vs a full scan + IN.
      val probeKeys: Seq[Any] = (1L to 5L).map(i => (i * 7919L) % n)
      val (pointA, bytesPA) = Layouts.measuredInputBytes(spark) {
        time(MergeStore.scanPoints(spark, tA, "doc", probeKeys).count())
      }
      val (pointB, bytesPB) = Layouts.measuredInputBytes(spark) {
        time(spark.read.parquet(s"$tB/data")
          .where(col("doc").isin(probeKeys: _*)).count())
      }
      require(pointA._1 == pointB._1,
        s"bloom pruning changed the answer: ${pointA._1} != ${pointB._1}")
      // Key-local trickle merge: 100 keys from one narrow range.
      def batch = spark.range(lo, lo + 100).select(col("id"),
        lit(7).cast("int").as("grp"),
        ((col("id") * 48271L) % n).as("doc"),
        concat(lit("v2-"), col("id")).as("payload"))
      val (mA, tMergeA) = time(MergeStore.merge(spark, batch, tA, Seq("id")))
      val (mB, tMergeB) = time(MergeStore.merge(spark, batch, tB, Seq("id")))
      require(mA.filesRewritten == mB.filesRewritten &&
        mA.rowsUpdated == mB.rowsUpdated,
        "stats changed merge behavior")
      println(s"""{"metric":"manifest_skip","rows":$n,"files":$files,""" +
        s""""candidates":$cand,""" +
        s""""scan_stats_sec":${f"${scanA._2}%.3f"},""" +
        s""""scan_full_sec":${f"${scanB._2}%.3f"},""" +
        s""""scan_stats_bytes":$bytesA,"scan_full_bytes":$bytesB,""" +
        s""""point_bloom_sec":${f"${pointA._2}%.3f"},""" +
        s""""point_full_sec":${f"${pointB._2}%.3f"},""" +
        s""""point_bloom_bytes":$bytesPA,"point_full_bytes":$bytesPB,""" +
        s""""bloom_build_sec":${f"$bloomBuildSec%.3f"},""" +
        s""""merge_stats_sec":${f"$tMergeA%.3f"},""" +
        s""""merge_full_sec":${f"$tMergeB%.3f"},""" +
        s""""files_rewritten":${mA.filesRewritten}}""")
    }
  }

  /** Commit METADATA cost vs live-file count: with full-snapshot
    * manifests every trickle commit rewrote the complete file list plus
    * every per-file stats line — O(live files) bytes per commit, tens
    * of MB at 100 TB (10⁵–10⁶ files). With incremental manifests a
    * trickle commit writes a DELTA (its few changed files + their fresh
    * stats) and only every interval-th commit is a full snapshot. This
    * probe builds tables at several live-file counts, runs the same
    * key-local trickle merge and a metadata-only marker commit against
    * each, and reports the DELTA manifest bytes next to the full
    * snapshot's: flat vs file count is the pass condition (the full
    * line shows what every commit USED to cost). Time travel across
    * the span is exercised so the measurement can't silently trade
    * correctness. */
  private def commitCostProbe(spark: SparkSession,
                              fileCounts: Seq[Int]): Unit = {
    fileCounts.foreach { files =>
      val rows = files.toLong * 50
      val dir = java.nio.file.Files.createTempDirectory("commitcost")
        .toString
      val t = s"$dir/tbl"
      val df = spark.range(rows).select(col("id"),
        (col("id") % 97).cast("int").as("grp"),
        concat(lit("p-"), col("id")).as("payload"))
      val (_, initSec) = time(
        MergeStore.init(spark, df, t, files, clusterBy = Seq("id")))
      def manifestBytes(v: Int): Long = java.nio.file.Files.size(
        java.nio.file.Paths.get(t, "_manifest", s"v$v.list"))
      // Key-local trickle merge: 50 keys from one narrow range.
      val batch = spark.range(rows / 2, rows / 2 + 50).select(col("id"),
        lit(7).cast("int").as("grp"),
        concat(lit("v2-"), col("id")).as("payload"))
      val (st, mergeSec) = time(MergeStore.merge(spark, batch, t, Seq("id")))
      // Metadata-only marker commit (the streaming-sink heartbeat shape).
      val empty = MergeStore.read(spark, t).limit(0)
      val (_, markSec) = time(MergeStore.applyChanges(spark, t,
        upserts = empty, deleteKeys = empty.select("id"), pk = Seq("id"),
        meta = Map("probe.mark" -> "1")))
      // Reconstruction still exact across the delta chain.
      require(MergeStore.read(spark, t).count() == rows,
        "delta-manifest head count drifted")
      require(MergeStore.read(spark, t, Some(0)).count() == rows,
        "time travel below the deltas drifted")
      // OCC resolution cost: a DISJOINT loser (pinned below a rival
      // commit, far key range) resolves by manifest-only REBASE — its
      // wall time is ONE verb compute; an OVERLAPPING loser pays the
      // recompute (≈ two computes). The gap is what file-disjoint
      // conflict validation buys per collision.
      def keyBatch(lo: Long) = spark.range(lo, lo + 50).select(col("id"),
        lit(9).cast("int").as("grp"),
        concat(lit("occ-"), col("id")).as("payload"))
      val pin = MergeStore.version(t).get
      MergeStore.merge(spark, keyBatch(rows / 4), t, Seq("id")) // rival
      val (stR, rebaseSec) = time(MergeStore.merge(spark,
        keyBatch(3 * rows / 4), t, Seq("id"), maxRetries = 0,
        snapshotVersion = Some(pin)))
      require(stR.rebases == 1 && stR.recomputes == 0,
        s"expected a rebase, got $stR")
      val (stC, recomputeSec) = time(MergeStore.merge(spark,
        keyBatch(rows / 4 + 10), t, Seq("id"), maxRetries = 1,
        snapshotVersion = Some(pin)))
      require(stC.recomputes == 1, s"expected a recompute, got $stC")
      println(s"""{"metric":"commit_cost","files":$files,"rows":$rows,""" +
        s""""full_manifest_bytes":${manifestBytes(0)},""" +
        s""""merge_delta_bytes":${manifestBytes(1)},""" +
        s""""marker_delta_bytes":${manifestBytes(2)},""" +
        s""""files_rewritten":${st.filesRewritten},""" +
        s""""init_sec":${f"$initSec%.3f"},""" +
        s""""merge_sec":${f"$mergeSec%.3f"},""" +
        s""""marker_commit_sec":${f"$markSec%.3f"},""" +
        s""""occ_rebase_sec":${f"$rebaseSec%.3f"},""" +
        s""""occ_recompute_sec":${f"$recomputeSec%.3f"}}""")
    }
  }

  /** Checkpoint-cost probe (VERDICT r12 #3): full-snapshot manifest
    * BYTES and cold reconstruction WALL vs live-file count, compressed
    * vs plain text, up to file counts (65k, 256k) where writing real
    * parquet would dominate the probe — so the manifest is SYNTHETIC
    * (realistic per-file stats/nulls lines committed through the REAL
    * encoder via commitForProbe) and the reconstruction walk is the
    * real reader, cache-cleared. A delta commit on top shows ordinary
    * commits stay O(changes) whatever the snapshot format. */
  private def ckptCostProbe(spark: SparkSession,
                            fileCounts: Seq[Int]): Unit = {
    val schemaJson = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("grp",
        org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField("payload",
        org.apache.spark.sql.types.StringType))).json
    fileCounts.foreach { files =>
      val names = (0 until files).map(i => f"part-synth-$i%07d.parquet")
      // One stats + one nulls line per file on `id` (the clustered
      // column's realistic shape: 50 keys per file, contiguous ranges).
      val meta = Map("schema" -> schemaJson, "stats.cols" -> "id") ++
        names.zipWithIndex.flatMap { case (f, i) =>
          Seq(s"s:$f:id" -> s"n ${i * 50L} ${i * 50L + 49}",
            s"n:$f:id" -> s"0 50")
        }
      def run(threshold: Long): (Long, Double, Long) = {
        val dir = java.nio.file.Files.createTempDirectory("ckptcost")
        val t = s"$dir/tbl"
        System.setProperty("graft.manifest.compress.threshold",
          threshold.toString)
        try {
          MergeStore.commitForProbe(t, names, -1, meta)
          val stored = java.nio.file.Files.size(
            java.nio.file.Paths.get(t, "_manifest", "v0.list"))
          MergeStore.clearStateCacheForProbe()
          val (live, wall) = time(MergeStore.liveFiles(t))
          require(live.size == files, "synthetic reconstruction drifted")
          // Ordinary commit on top stays a delta: O(changes) bytes.
          MergeStore.commitForProbe(t,
            names :+ "part-synth-extra.parquet", 0,
            meta + (s"s:part-synth-extra.parquet:id" ->
              s"n ${files * 50L} ${files * 50L + 49}"))
          val delta = java.nio.file.Files.size(
            java.nio.file.Paths.get(t, "_manifest", "v1.list"))
          (stored, wall, delta)
        } finally System.clearProperty(
          "graft.manifest.compress.threshold")
      }
      val (gzBytes, gzWall, gzDelta) = run(1L)            // always gzip
      val (txtBytes, txtWall, txtDelta) = run(Long.MaxValue) // never
      println(s"""{"metric":"ckpt_cost","files":$files,""" +
        s""""snapshot_text_bytes":$txtBytes,""" +
        s""""snapshot_gz_bytes":$gzBytes,""" +
        s""""reconstruct_text_sec":${f"$txtWall%.3f"},""" +
        s""""reconstruct_gz_sec":${f"$gzWall%.3f"},""" +
        s""""delta_bytes_text":$txtDelta,"delta_bytes_gz":$gzDelta}""")

      // Parquet-checkpoint arm (graft.ckpt.format=parquet): same
      // synthetic state, measuring (a) columnar snapshot bytes,
      // (b) full-state cold reconstruction, and (c) the COLD PRUNED
      // PROBE — a selective candidateFiles range served by a
      // column-pruned, row-group-filtered checkpoint read instead of
      // any reconstruction — against the same probe on the gzip-text
      // table (which must reconstruct everything first).
      val probeLo = (files / 2) * 50L
      val probeHi = probeLo + 499L // ~10 of `files` ranges overlap
      def coldProbe(t: String): (Seq[String], Double) = {
        MergeStore.clearStateCacheForProbe()
        time(MergeStore.candidateFiles(spark, t, "id",
          Some(probeLo), Some(probeHi)))
      }
      def runPq(): (Long, Double, Double, Double, Double, Double,
          Double) = {
        val dir = java.nio.file.Files.createTempDirectory("ckptcost")
        val t = s"$dir/tbl"
        System.setProperty("graft.manifest.compress.threshold", "1")
        try {
          // v0, fresh table: the SLOT is the cheap gzip text full; the
          // parquet encode happens OFF the commit path (async sidecar,
          // drained here to time it and to give the cold probes their
          // columnar base).
          val (_, commitWall) = time(MergeStore.commitForProbe(t, names,
            -1, meta + ("ckpt.format" -> "parquet")))
          val (_, encodeWall) = time(MergeStore.drainCheckpoints())
          val sidecar = java.nio.file.Paths.get(t, "_manifest", "v0.ckpt")
          require(java.nio.file.Files.exists(sidecar),
            "async parquet sidecar did not land")
          val stored = java.nio.file.Files.size(sidecar)
          MergeStore.clearStateCacheForProbe()
          val (live, wall) = time(MergeStore.liveFiles(t))
          require(live.size == files, "parquet reconstruction drifted")
          val hitsBefore = MergeStore.coldProbeHits.get()
          val (cand, probeWall) = coldProbe(t)
          require(MergeStore.coldProbeHits.get() > hitsBefore,
            "parquet cold probe did not engage")
          require(cand.size >= 10 && cand.size <= 12,
            s"selective probe shape drifted: ${cand.size}")
          // Ordinary delta commit (v1, off-interval) as the baseline,
          // then an interval-SLOT commit (interval 1 makes v2 a slot):
          // the slot write must cost the SAME — a text delta — with
          // the columnar encode riding the async sidecar, never the
          // commit path. (At this synthetic scale the state exceeds
          // the memo's admission cap, so BOTH pay the parent-state
          // reconstruction — the honest per-commit cost here.)
          def extraStat(i: Int) = s"s:part-synth-extra$i.parquet:id" ->
            s"n ${files * 50L + i} ${files * 50L + 49 + i}"
          val (_, ordinaryWall) = time(MergeStore.commitForProbe(t,
            names :+ "part-synth-extra0.parquet", 0,
            meta + ("ckpt.format" -> "parquet") + extraStat(0)))
          System.setProperty("graft.manifest.checkpoint.interval", "1")
          val (_, slotWall) = time(MergeStore.commitForProbe(t,
            names ++ Seq("part-synth-extra0.parquet",
              "part-synth-extra1.parquet"), 1,
            meta + ("ckpt.format" -> "parquet") + extraStat(0) +
              extraStat(1)))
          MergeStore.drainCheckpoints()
          require(java.nio.file.Files.exists(
            java.nio.file.Paths.get(t, "_manifest", "v2.ckpt")),
            "slot commit's async sidecar did not land")
          (stored, wall, probeWall, commitWall, encodeWall,
            ordinaryWall, slotWall)
        } finally {
          System.clearProperty("graft.manifest.compress.threshold")
          System.clearProperty("graft.manifest.checkpoint.interval")
        }
      }
      val (pqBytes, pqWall, pqProbe, pqCommit, pqEncode, pqOrdinary,
        pqSlot) = runPq()
      // The same cold probe against the gzip table: full reconstruct
      // then driver-side interval tests.
      val gzDir = java.nio.file.Files.createTempDirectory("ckptcost")
      val gzT = s"$gzDir/tbl"
      System.setProperty("graft.manifest.compress.threshold", "1")
      val gzProbe = try {
        MergeStore.commitForProbe(gzT, names, -1, meta)
        coldProbe(gzT)._2
      } finally System.clearProperty("graft.manifest.compress.threshold")
      println(s"""{"metric":"ckpt_cost_parquet","files":$files,""" +
        s""""sidecar_pq_bytes":$pqBytes,""" +
        s""""fresh_commit_sec":${f"$pqCommit%.3f"},""" +
        s""""async_encode_sec":${f"$pqEncode%.3f"},""" +
        s""""ordinary_commit_sec":${f"$pqOrdinary%.3f"},""" +
        s""""slot_commit_sec":${f"$pqSlot%.3f"},""" +
        s""""reconstruct_pq_sec":${f"$pqWall%.3f"},""" +
        s""""cold_probe_pq_sec":${f"$pqProbe%.4f"},""" +
        s""""cold_probe_gz_sec":${f"$gzProbe%.4f"}}""")
    }
  }

  /** Multi-writer rebase throughput (VERDICT r12 #6): N concurrent
    * KEY-DISJOINT merge writers hammer one clustered table, each
    * landing `commitsPer` trickle merges. Every lost CAS must resolve
    * by manifest-only REBASE (zero recomputes asserted) — the number
    * SCALE.md's multi-writer story quotes is landed commits/sec and
    * the rebase count at each N. */
  /** Incremental OPTIMIZE vs whole-table compaction as the table grows:
    * init `bigFiles` right-sized files, zero-copy clone a twin, trickle
    * the SAME 64 one-row appends into both, then bin-pack the small
    * tail on one ([[MergeStore.compactSmall]]) and rewrite the whole
    * table on the other ([[MergeStore.compact]]). The claim under test:
    * optimize cost tracks the TAIL (flat as bigFiles grows) while the
    * full rewrite tracks the TABLE. Equality of the two results is
    * asserted in-pass. */
  private def optimizeCostProbe(spark: SparkSession,
                                bigCounts: Seq[Int]): Unit = {
    val trickles = 64
    bigCounts.foreach { bigFiles =>
      val dir = java.nio.file.Files.createTempDirectory("optcost")
      val t = s"$dir/tbl"
      val twin = s"$dir/twin"
      val rows = bigFiles * 8000L
      MergeStore.init(spark,
        spark.range(rows).select(col("id"),
          (col("id") % 97).cast("int").as("grp"),
          concat(lit("p-"), col("id")).as("payload")),
        t, numFiles = bigFiles, clusterBy = Seq("id"))
      MergeStore.cloneTable(spark, t, twin)
      Seq(t, twin).foreach { tbl =>
        (0 until trickles).foreach { i =>
          MergeStore.append(spark,
            spark.range(rows + i, rows + i + 1).select(col("id"),
              lit(1).cast("int").as("grp"),
              concat(lit("tiny-"), col("id")).as("payload")),
            tbl): Unit
        }
      }
      // Sizes must come from the manifest's z: lines — a maintenance
      // pass on a size-lined table does ZERO data-directory stat calls
      // (at 10⁵–10⁶ files on an object store, each stat is a HEAD).
      MergeStore.sizeStatFallbacks.set(0L)
      val (stOpt, optWall) = time {
        MergeStore.compactSmall(spark, t, smallBytes = 16 << 10)
      }
      require(MergeStore.sizeStatFallbacks.get() == 0L,
        s"compactSmall statted ${MergeStore.sizeStatFallbacks.get()} " +
          "data files on a size-lined table — z: lines must serve sizes")
      val (_, fullWall) = time {
        MergeStore.compact(spark, twin, targetFiles = bigFiles)
      }
      require(stOpt.compacted == trickles,
        s"expected the $trickles-file tail to pack, got $stOpt")
      require(MergeStore.liveFiles(t).size == bigFiles + stOpt.produced)
      require(MergeStore.read(spark, t).count() ==
        MergeStore.read(spark, twin).count(),
        "optimize and full compact must preserve identical content")
      println(s"""{"metric":"optimize_cost","big_files":$bigFiles,""" +
        s""""trickle_files":$trickles,""" +
        s""""optimize_sec":${f"$optWall%.3f"},""" +
        s""""full_compact_sec":${f"$fullWall%.3f"},""" +
        s""""ratio":${f"${fullWall / optWall}%.2f"}}""")
    }
  }

  /** The analyzer-rule tax on NON-Graft queries: the session extension
    * injects [[graft.store.GraftResolution]] into every query's
    * analysis fixpoint, so a plan with no Graft table anywhere must
    * pay only the rule's cheap bail-out (one read-only traversal per
    * iteration), not its transform passes. Measures parse+analyze wall
    * for a representative agg query, `iters` times, in the Graft
    * session (extension + bail-out) vs a vanilla session on the SAME
    * SparkContext with NO extensions — the r13 VERDICT's prescribed
    * separation of rule tax from box drift. */
  private def ruleTaxProbe(spark: SparkSession, iters: Int): Unit = {
    import org.apache.spark.sql.SparkSession
    val q = "SELECT grp, count(*) AS n, sum(id) AS s FROM ruletax_src " +
      "WHERE id % 3 = 0 GROUP BY grp ORDER BY grp"
    def fixture(s: SparkSession): Unit =
      s.range(100000L).select(col("id"),
        (col("id") % 13).cast("int").as("grp"))
        .createOrReplaceTempView("ruletax_src")
    def analyzeLoop(s: SparkSession): Double = time {
      var i = 0
      while (i < iters) { s.sql(q).queryExecution.analyzed; i += 1 }
    }._2
    fixture(spark)
    // A second session on the same context, extensions cleared: the
    // no-rule baseline. Active/default session restore afterwards.
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val vanilla = SparkSession.builder()
      .config("spark.sql.extensions", "")
      .config("spark.sql.shuffle.partitions", "32")
      .getOrCreate()
    try {
      fixture(vanilla)
      // Alternate A/B rounds and take each side's MIN: a sequential
      // A-then-B layout hands B all of A's JIT warmup and reads as a
      // phantom rule tax several times the rule's true cost.
      analyzeLoop(spark); analyzeLoop(vanilla) // joint warm
      val (withS, without) = (1 to 3).map { _ =>
        (analyzeLoop(spark), analyzeLoop(vanilla))
      }.unzip match { case (a, b) => (a.min, b.min) }
      // The rule's own cost, isolated: apply it to the analyzed plan
      // directly (the bail-out path — no Graft relation anywhere).
      val analyzed = spark.sql(q).queryExecution.analyzed
      val rule = graft.store.GraftResolution(spark)
      rule.apply(analyzed): Unit
      val t0 = System.nanoTime()
      var i = 0
      while (i < 100000) { rule.apply(analyzed): Unit; i += 1 }
      val ruleUs = (System.nanoTime() - t0) / 1e3 / 100000
      println(s"""{"metric":"rule_tax","iters":$iters,""" +
        s""""with_extension_sec":${f"$withS%.3f"},""" +
        s""""without_extension_sec":${f"$without%.3f"},""" +
        s""""per_query_overhead_us":${
          f"${(withS - without) / iters * 1e6}%.1f"},""" +
        s""""rule_apply_us":${f"$ruleUs%.2f"}}""")
    } finally {
      SparkSession.setDefaultSession(spark)
      SparkSession.setActiveSession(spark)
    }
  }

  private def rebaseContentionProbe(spark: SparkSession,
                                    writerCounts: Seq[Int],
                                    commitsPer: Int): Unit = {
    writerCounts.foreach { n =>
      val dir = java.nio.file.Files.createTempDirectory("occ-cont")
      val t = s"$dir/tbl"
      val rows = 800000L
      MergeStore.init(spark,
        spark.range(rows).select(col("id"),
          (col("id") % 97).cast("int").as("grp"),
          concat(lit("p-"), col("id")).as("payload")),
        t, numFiles = 64, clusterBy = Seq("id"))
      val pool = java.util.concurrent.Executors.newFixedThreadPool(n)
      implicit val ec: scala.concurrent.ExecutionContext =
        scala.concurrent.ExecutionContext.fromExecutor(pool)
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration._
      val span = rows / n // one disjoint key region per writer
      val (stats, wall) = time {
        val fs = (0 until n).map { w =>
          Future {
            (0 until commitsPer).map { c =>
              val lo = w * span + c * 100L
              MergeStore.merge(spark,
                spark.range(lo, lo + 50).select(col("id"),
                  lit(w).cast("int").as("grp"),
                  concat(lit(s"w$w-c$c-"), col("id")).as("payload")),
                t, Seq("id"), maxRetries = 3)
            }
          }
        }
        try fs.flatMap(Await.result(_, 15.minutes))
        finally pool.shutdown()
      }
      val rebases = stats.map(_.rebases).sum
      val recomputes = stats.map(_.recomputes).sum
      require(recomputes == 0,
        s"key-disjoint writers recomputed at n=$n: $recomputes")
      val landed = n * commitsPer
      require(MergeStore.version(t).get == landed,
        "a commit went missing under contention")
      println(s"""{"metric":"rebase_contention","writers":$n,""" +
        s""""commits":$landed,"wall_sec":${f"$wall%.3f"},""" +
        s""""commits_per_sec":${f"${landed / wall}%.2f"},""" +
        s""""rebases":$rebases,"recomputes":$recomputes}""")
    }
  }

  /** Compressed bytes of the column chunks whose dotted path starts with
    * `colPrefix`, across every parquet file under `dir` (recursive) — the
    * exact IO a column-pruned scan of that column must perform. Read from
    * footers; no data pages touched. */
  private def columnBytes(dir: String, colPrefix: String): Long = {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    val conf = new org.apache.hadoop.conf.Configuration()
    val root = java.nio.file.Paths.get(dir)
    if (!java.nio.file.Files.isDirectory(root)) return 0L
    val it = java.nio.file.Files.walk(root)
    try {
      var bytes = 0L
      it.iterator().forEachRemaining { p =>
        if (java.nio.file.Files.isRegularFile(p) &&
            p.getFileName.toString.endsWith(".parquet")) {
          val in = HadoopInputFile.fromPath(
            new org.apache.hadoop.fs.Path(p.toString), conf)
          val r = ParquetFileReader.open(in)
          try {
            r.getFooter.getBlocks.forEach { b =>
              b.getColumns.forEach { c =>
                if (c.getPath.toDotString.startsWith(colPrefix))
                  bytes += c.getTotalSize
              }
            }
          } finally r.close()
        }
      }
      bytes
    } finally it.close()
  }

  /** ANN scaling curve: exact brute-force top-k (float scan) vs IVF-PQ
    * (probe filter + 8-byte ADC scan + 50-row exact re-rank) on the
    * embeddings corpus replicated N× with fresh ids. Index build (assign +
    * encode, the one-off cost) is timed separately from per-query search.
    * Local wall-clock is job-overhead-bound at these sizes, so the
    * at-scale signal reported alongside it is SCAN IO: the parquet
    * column-chunk bytes each plan must read after partition and column
    * pruning. Numbers land in SCALE.md §Similarity/ANN. */
  private def annCurveProbe(spark: SparkSession, sfDir: String,
                            multiples: Seq[Int]): Unit = {
    import graft.operators.{IvfIndex, PqIndex, Similarity}
    val base = Tables.load(spark, sfDir, "embeddings")
      .select("vec_id", "embedding")
    val total = base.count()
    multiples.foreach { m =>
      // Replicas are PERTURBED (×(1 + i·1e-6)): byte-identical copies
      // would dictionary-compress to nothing and fake the IO numbers;
      // the tiny scale factor keeps the geometry (cosine is invariant)
      // while making the float pages realistic.
      val vecs = (0 until m).map { i =>
        base.select((col("vec_id") + lit(i * total)).as("vec_id"),
          transform(col("embedding"),
            x => x * (lit(1.0f) + lit(i.toFloat) * lit(1e-6f)))
            .as("embedding"))
      }.reduce(_ unionByName _).cache()
      val n = vecs.count()
      val ivf = IvfIndex.train(vecs, "vec_id", "embedding", k = 16)
      val pq = PqIndex.train(vecs, "vec_id", "embedding", dim = 64, m = 8, ks = 16)
      val qv = base.where(col("vec_id") === 0L).select("embedding")
        .head().getSeq[Float](0).map(_.toDouble).toArray
      // Both sides search PARQUET, not cache: the at-scale path is
      // storage — the IVF side gets partitionBy(ivf_cluster) pruning and
      // reads only the 8-byte code column in the ADC pass.
      val dir = java.nio.file.Files.createTempDirectory("anncurve").toString
      // Sane file counts: the replicated union has one partition per
      // replica — written as-is it spills thousands of sliver files
      // (and per-file overhead, not the algorithm, dominates the scan).
      vecs.repartition(32).write.mode("overwrite").parquet(s"$dir/flat")
      val (_, tBuild) = time {
        PqIndex.encode(
            IvfIndex.assign(spark, vecs, "embedding", ivf), "embedding", pq)
          .repartition(col("ivf_cluster"))
          .write.mode("overwrite").partitionBy("ivf_cluster")
          .parquet(s"$dir/ivfpq")
      }
      val flat = spark.read.parquet(s"$dir/flat")
      val indexed = spark.read.parquet(s"$dir/ivfpq")
      val (exact, tExact) = time {
        Similarity.topKNeighbors(spark, flat, "vec_id", "embedding",
          queryId = 0L, k = 10).collect().map(_.getLong(0)).toSet
      }
      val (got, tPq) = time {
        PqIndex.searchTopK(spark, indexed, "vec_id", "embedding", "pq_code",
          ivf, pq, qv, k = 10, nprobe = 4, shortlist = 50)
          .collect().map(_.getLong(0)).toSet
      }
      // Scan IO from the footers: the exact scan reads (embedding, id) of
      // the whole table; the ADC pass reads (code, id) of the 4 probed
      // cluster dirs only (partition pruning). The 50-row float fetch is
      // bounded by shortlist x vector size — noted, not measured.
      val probes = ivf.rankClusters(qv).take(4)
      val exactBytes = columnBytes(s"$dir/flat", "embedding") +
        columnBytes(s"$dir/flat", "vec_id")
      val adcBytes = probes.map { c =>
        columnBytes(s"$dir/ivfpq/ivf_cluster=$c", "pq_code") +
          columnBytes(s"$dir/ivfpq/ivf_cluster=$c", "vec_id")
      }.sum
      // Replicated corpora carry m exact copies of every vector: top-k
      // fills with tied duplicates, so set recall is only indicative here
      // (the honest recall number is IvfSpec/PqSpec's, on the real corpus).
      val recall = (got & exact).size.toDouble / exact.size
      println(s"""{"metric":"ann_curve","n":$n,"build_sec":${f"$tBuild%.2f"},""" +
        s""""exact_sec":${f"$tExact%.2f"},"ivfpq_sec":${f"$tPq%.2f"},""" +
        s""""exact_scan_bytes":$exactBytes,"adc_scan_bytes":$adcBytes,""" +
        s""""io_ratio":${f"${exactBytes.toDouble / math.max(adcBytes, 1L)}%.1f"},""" +
        s""""recall_indicative":${f"$recall%.2f"}}""")
      vecs.unpersist()
    }
  }

  /** IVF kNN-graph skew probe: a uniform corpus vs a twin where ~half the
    * vectors pile into one tight cone (one hot IVF cell — the Zipf shape
    * real embedding corpora show). Measures the graph build unmitigated
    * vs with the `maxClusterSize` salting lever; the claim to check is
    * the Bench skew suite's: mitigated hot stays within ~2x of the
    * uniform twin (salting is exact, so recall is not a variable here —
    * IvfSpec pins output equality). Numbers land in SCALE.md §IVF-SKEW. */
  private def ivfSkewProbe(spark: SparkSession, n: Long,
                           maxClusterSize: Int): Unit = {
    import graft.operators.IvfIndex
    // The model is PINNED, not trained: a trained quantizer adaptively
    // splits any hot region it can tell apart (the first version of this
    // probe learned that the hard way), so the honest skew scenario is
    // the one k-means cannot fix — many EXACT-duplicate vectors in one
    // cell. 16 ring directions (100 at d, 1 at d+1 mod 16) make every
    // cell's second-nearest probe its unique ring successor, so the
    // uniform twin's join is genuinely even.
    val k = 16
    val dirs = Array.tabulate(k) { d =>
      val v = new Array[Double](k)
      v(d) = 100.0; v((d + 1) % k) = 1.0
      val norm = math.sqrt(v.map(x => x * x).sum)
      v.map(_ / norm)
    }
    val model = IvfIndex.Model(dirs)
    def mk(hotPct: Int): DataFrame = {
      // Direction id: hot rows collapse onto direction 0; the rest spread
      // round-robin over the remaining ring.
      val dirCol = when(pmod(col("id"), lit(100)) < lit(hotPct), lit(0))
        .otherwise(pmod(col("id"), lit(k - 1)) + 1)
      val vec = array((0 until k).map { d =>
        when(dirCol === lit(d), lit(100.0f))
          .when(dirCol === lit((d + k - 1) % k), lit(1.0f))
          .otherwise(lit(0.0f))
      }: _*)
      spark.range(n).select(col("id").as("vec_id"), vec.as("embedding"))
    }
    def run(df: DataFrame, cap: Int): (Double, Long) = {
      val maxCell = IvfIndex.assign(spark, df, "embedding", model)
        .groupBy("ivf_cluster").count()
        .agg(max("count")).head().getLong(0)
      val (_, t) = time {
        IvfIndex.knnGraphApprox(spark, df, "vec_id", "embedding", model,
          k = 5, nprobe = 2, maxClusterSize = cap).count()
      }
      (t, maxCell)
    }
    val uniform = mk(0).cache(); uniform.count()
    val hot = mk(50).cache(); hot.count()
    // At 100 TB neither join side broadcasts — local[32] would happily
    // broadcast a 20k-row assigned table, which erases join-key
    // partitioning and with it the very skew under measurement. Force
    // the at-scale shuffle-join shape (the Bench skew suite's
    // hint("merge") discipline, applied via conf because the join is
    // inside the operator).
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      run(uniform.limit(2000), 0) // warmup: codegen + first-shuffle costs
      val (tUni, cellUni) = run(uniform, 0)
      val (tHotRaw, cellHot) = run(hot, 0)
      val (tHotSalted, _) = run(hot, maxClusterSize)
      println(s"""{"metric":"ivf_skew","n":$n,"max_cluster_size":$maxClusterSize,""" +
        s""""uniform_sec":${f"$tUni%.2f"},"uniform_max_cell":$cellUni,""" +
        s""""hot_unsalted_sec":${f"$tHotRaw%.2f"},"hot_max_cell":$cellHot,""" +
        s""""hot_salted_sec":${f"$tHotSalted%.2f"},""" +
        s""""salted_vs_uniform":${f"${tHotSalted / math.max(tUni, 1e-9)}%.2f"}}""")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    uniform.unpersist(); hot.unpersist()
  }

  /** Bloom-prefilter probe (q71's lever): fixed bench side, train side
    * replicated ×N. Measures the two things the lever trades on — the
    * broadcast payload gap (bloom bytes vs the exact string index the
    * broadcast join would ship) and the survivor fraction the prefilter
    * admits to the verify join — plus wall time of both paths, with the
    * pair counts asserted identical (the exactness contract). */
  private def bloomCurveProbe(spark: SparkSession, sfDir: String,
                              multiples: Seq[Int]): Unit = {
    graft.expressions.BloomExpressions.register(spark)
    val docs = Tables.load(spark, sfDir, "documents")
    val bench = docs.where(col("doc_id") % 50 === 0)
    val distinctSh = Dedup.shingles(bench, "doc_id", "text", 3)
      .select("shingle").distinct().localCheckpoint(true)
    val benchItems = math.max(distinctSh.count(), 1L)
    val benchStrBytes = distinctSh
      .agg(sum(octet_length(col("shingle")))).head().getLong(0)
    val bf = distinctSh.stat.bloomFilter(col("shingle"), benchItems, 0.01)
    val bloomBytes = {
      val b = new java.io.ByteArrayOutputStream(); bf.writeTo(b); b.size
    }
    val bfLit = {
      val b = new java.io.ByteArrayOutputStream(); bf.writeTo(b); b.toByteArray
    }
    multiples.foreach { m =>
      val train = replicate(docs.where(col("doc_id") % 50 =!= 0), m)
        .localCheckpoint(true)
      val trainSh = Dedup.shingles(train, "doc_id", "text", 3)
      val total = trainSh.count()
      val kept = trainSh.where(call_function(
        "bloom_might_contain", lit(bfLit), col("shingle"))).count()
      val (nExact, tExact) = time(Dedup.crossNgramOverlap(
        train, bench, "doc_id", "text", 3, 3L).count())
      val (nBloom, tBloom) = time(Dedup.crossNgramOverlapBloom(
        train, bench, "doc_id", "text", 3, 3L).count())
      require(nExact == nBloom,
        s"bloom path diverged at x$m: $nExact vs $nBloom")
      println(s"""{"metric":"bloom_curve","multiple":$m,""" +
        s""""bench_items":$benchItems,"bench_index_bytes":$benchStrBytes,""" +
        s""""bloom_bytes":$bloomBytes,"train_shingles":$total,""" +
        s""""survivors":$kept,"survivor_frac":${f"${kept.toDouble / math.max(total, 1L)}%.4f"},""" +
        s""""pairs":$nExact,"exact_sec":${f"$tExact%.2f"},""" +
        s""""bloom_sec":${f"$tBloom%.2f"}}""")
      train.unpersist()
    }
  }

  /** BPE scaling: train once (word-count aggregate + driver merge loop —
    * corpus-size-independent past the aggregate), then time the map-only
    * codegen tokenize pass at growing corpus multiples. The claim under
    * test: tokenization throughput (tokens/s) is flat as the corpus
    * grows — the scan is the only corpus-sized cost. Replicas reuse the
    * text verbatim (BPE cost depends on content, not ids). */
  private def bpeCurveProbe(spark: SparkSession, sfDir: String,
                            multiples: Seq[Int]): Unit = {
    import graft.operators.BpeTokenizer
    val base = Tables.load(spark, sfDir, "documents")
      .select("doc_id", "text")
    val total = base.count()
    val (codec, tTrain) = time {
      BpeTokenizer.train(base, "text", numMerges = 50)
    }
    multiples.foreach { m =>
      val corpus = (0 until m).map { i =>
        base.select((col("doc_id") + lit(i * total)).as("doc_id"),
          col("text"))
      }.reduce(_ unionByName _).repartition(32).cache()
      val rows = corpus.count()
      val (toks, tEnc) = time {
        BpeTokenizer.encode(corpus, "text", codec)
          .agg(sum(size(col("bpe")))).head().getLong(0)
      }
      println(s"""{"probe":"bpe-curve","multiple":$m,"rows":$rows,""" +
        s""""merges":${codec.merges.length},""" +
        s""""train_sec":${f"$tTrain%.2f"},"tokens":$toks,""" +
        s""""encode_sec":${f"$tEnc%.2f"},""" +
        s""""tokens_per_sec":${(toks / math.max(tEnc, 1e-9)).toLong}}""")
      corpus.unpersist()
    }
  }

  /** Incremental view maintenance advantage: a KPI view over a COW
    * table, advanced after a FIXED-size trickle merge, at GROWING table
    * sizes — incremental refresh (change-feed delta + file-granular
    * view merge) timed against the full rebuild (re-aggregate +
    * rewrite) the reference's refresh model implies. The claim under
    * test is the two cost PROPORTIONALITIES: refresh tracks the
    * rewritten-file bytes (≈ flat as n grows, since the trickle is
    * fixed and the table is id-clustered), rebuild tracks the table
    * (linear in n). At local test sizes the table fits in page cache
    * and per-job overhead dominates refresh, so the raw ratio only
    * crosses over once n is big enough — which is exactly the point:
    * at 100 TB, n is 10^6 times "big enough". */
  private def ivmProbe(spark: SparkSession, ns: Seq[Long],
                       batch: Int): Unit = {
    import graft.operators.IncrementalView
    val spec = IncrementalView.IvmSpec(Seq("grp"),
      Seq("amount" -> "sum_amount"))
    def rows(lo: Long, hi: Long) = spark.range(lo, hi)
      .select(col("id"), (col("id") % 1000).cast("int").as("grp"),
        (col("id") * lit(0.25)).as("amount"))
    ns.foreach { n =>
      val root = java.nio.file.Files.createTempDirectory("graft-ivm-probe")
        .toString
      val t = s"$root/tbl"
      // Production holds FILE SIZE roughly constant and grows the file
      // COUNT with the table (maxPartitionBytes-sized parquet); a fixed
      // file count would instead grow each file with n and cap the scan
      // ratio at files/filesTouched.
      val files = math.max(16, (n / 250000L).toInt)
      MergeStore.init(spark, rows(0, n), t, numFiles = files,
        clusterBy = Seq("id"))
      val view = s"$root/view"
      val (_, tInit) = time(IncrementalView.initView(spark, t, view, spec))
      // A key-local trickle: `batch` consecutive ids get a measure bump
      // (id-clustered table → few files rewritten, the steady-state
      // shape trickle ingestion produces).
      val lo = (n / 2) - (batch / 2)
      MergeStore.merge(spark,
        rows(lo, lo + batch).withColumn("amount", col("amount") + lit(1.0)),
        t, pk = Seq("id"))
      val (_, tRefresh) = time(IncrementalView.refresh(spark, t, view, spec))
      val rebuildDir = s"$root/rebuild"
      val (_, tRebuild) = time {
        MergeStore.init(spark,
          IncrementalView.fullState(MergeStore.read(spark, t), spec),
          rebuildDir, numFiles = 4, clusterBy = Seq("grp"))
      }
      // The overhead-free metric: bytes a refresh SCANS (files unique
      // to either side of the span) vs bytes a rebuild scans (the
      // table). Wall clock at these local sizes is fixed job overhead;
      // the bytes ratio is what survives the 10^6× scale-up.
      def bytes(names: Iterable[String]): Long = names.map { f =>
        java.nio.file.Files.size(java.nio.file.Paths.get(t, "data", f))
      }.sum
      val v0 = MergeStore.liveFiles(t, Some(0)).toSet
      val v1 = MergeStore.liveFiles(t, Some(1)).toSet
      val spanBytes = bytes((v0 -- v1) ++ (v1 -- v0))
      val tableBytes = bytes(v1)
      println(f"""{"probe":"ivm","n":$n,"batch":$batch,""" +
        f""""init_sec":$tInit%.3f,"refresh_sec":$tRefresh%.3f,""" +
        f""""rebuild_sec":$tRebuild%.3f,""" +
        f""""advantage_x":${tRebuild / tRefresh}%.2f,""" +
        f""""span_bytes":$spanBytes,"table_bytes":$tableBytes,""" +
        f""""scan_advantage_x":${tableBytes.toDouble / math.max(1L, spanBytes)}%.1f}""")
    }
  }

  /** STREAMING IVM at scale — [[ivmProbe]]'s continuous twin: the view
    * follows a trickle-merging table through [[graft.streaming.StreamingIvm]]
    * (CDC source → foreachBatch delta application), and the claim under
    * test is that the PER-TRICKLE maintenance cost tracks the TRICKLE,
    * not the table: each micro-batch scans only its commit's unique
    * files, aggregates one row per touched group, and lands one
    * file-granular view commit. Wall-clock per trickle should stay
    * ~flat as n grows 2M→64M (micro-batch machinery is fixed overhead;
    * the data work is batch-sized), while the span-bytes/table-bytes
    * ratio — the metric that survives the 10^6× scale-up — widens
    * linearly with n exactly as in the batch probe. */
  private def streamingIvmProbe(spark: SparkSession, ns: Seq[Long],
                                batch: Int, trickles: Int): Unit = {
    import graft.operators.IncrementalView
    import graft.streaming.StreamingIvm
    val spec = IncrementalView.IvmSpec(Seq("grp"),
      Seq("amount" -> "sum_amount"))
    def rows(lo: Long, hi: Long) = spark.range(lo, hi)
      .select(col("id"), (col("id") % 1000).cast("int").as("grp"),
        (col("id") * lit(0.25)).as("amount"))
    ns.foreach { n =>
      val root = java.nio.file.Files.createTempDirectory("graft-sivm-probe")
        .toString
      val t = s"$root/tbl"
      val files = math.max(16, (n / 250000L).toInt)
      MergeStore.init(spark, rows(0, n), t, numFiles = files,
        clusterBy = Seq("id"))
      val view = s"$root/view"
      IncrementalView.initView(spark, t, view, spec)
      val ck = s"$root/ck"
      // One cold run to pay the checkpoint-creation cost outside the
      // per-trickle measurement (it has nothing to drain).
      StreamingIvm.maintain(spark, t, view, spec, ck).awaitTermination()
      var total = 0.0
      var spanBytesSum = 0L
      (1 to trickles).foreach { i =>
        // Key-local trickles at rotating offsets: the id-clustered
        // steady-state shape (few files rewritten per commit).
        val lo = (n / (trickles + 1)) * i
        MergeStore.merge(spark,
          rows(lo, lo + batch).withColumn("amount",
            col("amount") + lit(i.toDouble)),
          t, pk = Seq("id"))
        // maintainEvery keeps the long-lived view's file count bounded
        // from inside the stream itself (no scheduled-job host exists
        // for a streaming view) — the probe reports the resulting
        // bound alongside the per-trickle cost.
        val (_, tRun) = time(
          StreamingIvm.maintain(spark, t, view, spec, ck,
              maintainEvery = 1, targetFiles = 4, maxLiveFiles = 16,
              vacuumGraceMillis = 0)
            .awaitTermination())
        total += tRun
        val v = MergeStore.version(t).get
        def bytes(names: Iterable[String]): Long = names.map { f =>
          java.nio.file.Files.size(java.nio.file.Paths.get(t, "data", f))
        }.sum
        val prev = MergeStore.liveFiles(t, Some(v - 1)).toSet
        val cur = MergeStore.liveFiles(t, Some(v)).toSet
        spanBytesSum += bytes((prev -- cur) ++ (cur -- prev))
      }
      val tableBytes = MergeStore.liveFiles(t).map { f =>
        java.nio.file.Files.size(java.nio.file.Paths.get(t, "data", f))
      }.sum
      // Sanity: the followed view must equal the marker's promise.
      require(IncrementalView.appliedVersion(view)
        == MergeStore.version(t).get, "view fell behind its source")
      println(f"""{"probe":"sivm","n":$n,"batch":$batch,""" +
        f""""trickles":$trickles,""" +
        f""""per_trickle_sec":${total / trickles}%.3f,""" +
        f""""span_bytes_per_trickle":${spanBytesSum / trickles},""" +
        f""""table_bytes":$tableBytes,""" +
        f""""view_live_files":${MergeStore.liveFiles(view).size},""" +
        f""""scan_advantage_x":${tableBytes.toDouble * trickles /
          math.max(1L, spanBytesSum)}%.1f}""")
    }
  }

  /** BM25 SEGMENT HYGIENE — measures what repeated [[graft.operators
    * .Bm25.upsertToIndex]] cycles do to a live index and what
    * `compactIndex` buys back. Each upsert adds one postings segment
    * (batch-clustered files) and grows the tombstone table; searches
    * pay (a) more file opens per term IN-list probe — the term slice
    * now lives in every segment's files — and (b) the tombstone
    * anti-join over a growing marker set. Compaction folds both away:
    * one globally term-clustered segment, zero tombstones. The probe
    * runs two arms over the same revision stream — never-compact vs
    * compact-every-C — and prints per-cycle search latency, postings
    * file count, physical-vs-effective postings rows, and tombstone
    * rows, so SCALE.md's recommended live-segment cap is a measured
    * curve, not a guess. */
  private def bm25SegProbe(spark: SparkSession, sfDir: String,
                           cycles: Int, compactEvery: Int): Unit = {
    import graft.operators.Bm25
    val docs = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    import spark.implicits._
    val qs = Seq(0 -> "dup hash join", 1 -> "data quality model",
        2 -> "the and of")
      .toDF("query_id", "qtext")
    Seq(0, compactEvery).distinct.foreach { ce =>
      val dir = java.nio.file.Files.createTempDirectory("graft-bm25seg")
        .toString + "/idx"
      Bm25.buildIndex(docs, "doc_id", "text", dir)
      (1 to cycles).foreach { i =>
        val revised = docs.where(col("doc_id") % 7 === i % 7)
          .select(col("doc_id"),
            concat(col("text"), lit(s" cyc$i")).as("text"))
        val (_, tUp) = time(Bm25.upsertToIndex(revised, "doc_id", "text", dir))
        val compacted = ce > 0 && i % ce == 0
        val tComp =
          if (!compacted) 0.0
          else time(Bm25.compactIndex(spark, dir))._2
        // Warm once (plan/code caches), then measure the steady search.
        Bm25.searchTopKIndexed(dir, qs, "query_id", "qtext", k = 10).collect()
        val (_, tSearch) = time(
          Bm25.searchTopKIndexed(dir, qs, "query_id", "qtext", k = 10)
            .collect())
        val snap = Bm25.resolveSnapshot(dir)
        def filesUnder(sub: String): Int = {
          val p = java.nio.file.Paths.get(snap, sub)
          if (!java.nio.file.Files.isDirectory(p)) 0
          else {
            import scala.jdk.CollectionConverters._
            val it = java.nio.file.Files.walk(p)
            try it.iterator().asScala.count(q =>
              java.nio.file.Files.isRegularFile(q) &&
                q.getFileName.toString.endsWith(".parquet"))
            finally it.close()
          }
        }
        val physRows = spark.read.option("mergeSchema", "true")
          .parquet(s"$snap/postings").count()
        val tombRows =
          if (!java.nio.file.Files.isDirectory(
            java.nio.file.Paths.get(snap, "tombstones"))) 0L
          else spark.read.parquet(s"$snap/tombstones").count()
        println(f"""{"probe":"bm25seg","arm":"${if (ce > 0) s"compact$ce"
          else "never"}","cycle":$i,"upsert_sec":$tUp%.3f,""" +
          f""""compact_sec":$tComp%.3f,"search_sec":$tSearch%.3f,""" +
          f""""postings_files":${filesUnder("postings")},""" +
          f""""postings_rows_physical":$physRows,""" +
          f""""tombstone_rows":$tombRows,"compacted":$compacted}""")
      }
    }
  }

  /** Cache-vs-recompute curve for the CORPUS-SIZED cached intermediate
    * (CorpusLm.bigramLogProb's `bgs` — one row per bigram occurrence,
    * the largest .cache() the operators take): times the full scoring
    * pass at growing corpus multiples under (a) the default
    * MEMORY_AND_DISK cache, (b) DISK_ONLY, and (c) NO cache (the two
    * consumers re-tokenize). The 100 TB question this answers: at what
    * corpus-to-memory ratio does materializing the exploded intermediate
    * stop paying for the one recompute pass it saves? Row counts are
    * asserted equal across arms. Numbers land in SCALE.md §LM-CACHE. */
  private def lmCacheProbe(spark: SparkSession, sfDir: String,
                           multiples: Seq[Int]): Unit = {
    import org.apache.spark.storage.StorageLevel
    val base = Tables.load(spark, sfDir, "documents")
      .select("doc_id", "text", "lang")
    multiples.foreach { m =>
      val docs = replicate(base, m).localCheckpoint(true)
      val n = docs.count()
      def run(tag: String, lvl: Option[StorageLevel]): (Long, Double) = {
        spark.catalog.clearCache() // isolate arms: no cross-arm reuse
        val (rows, t) = time {
          graft.operators.CorpusLm.bigramLogProb(
            docs, "doc_id", "text", bgsStorage = lvl).count()
        }
        (rows, t)
      }
      val (rMem, tMem) = run("mem", Some(StorageLevel.MEMORY_AND_DISK))
      val (rDisk, tDisk) = run("disk", Some(StorageLevel.DISK_ONLY))
      val (rNone, tNone) = run("none", None)
      require(rMem == rDisk && rDisk == rNone,
        s"cache level changed the answer: $rMem/$rDisk/$rNone")
      spark.catalog.clearCache()
      println(s"""{"metric":"lm_cache","multiple":$m,"docs":$n,""" +
        s""""rows":$rMem,"mem_and_disk_sec":${f"$tMem%.2f"},""" +
        s""""disk_only_sec":${f"$tDisk%.2f"},""" +
        s""""no_cache_sec":${f"$tNone%.2f"}}""")
    }
  }

  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("lm-cache")) {
      val spark = GraftSession.local(32)
      val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
      val multiples = if (args.length > 2) args.drop(2).map(_.toInt).toSeq
        else Seq(1, 10, 40)
      lmCacheProbe(spark, sfDir, multiples)
      spark.stop()
      return
    }
    if (args.headOption.contains("commit-cost")) {
      val spark = GraftSession.local(32)
      val counts = if (args.length > 1) args.drop(1).map(_.toInt).toSeq
        else Seq(512, 4096, 16384)
      commitCostProbe(spark, counts)
      spark.stop()
      return
    }
    if (args.headOption.contains("ckpt-cost")) {
      val spark = GraftSession.local(32)
      val counts = if (args.length > 1) args.drop(1).map(_.toInt).toSeq
        else Seq(4096, 16384, 65536, 262144)
      ckptCostProbe(spark, counts)
      spark.stop()
      return
    }
    if (args.headOption.contains("optimize-cost")) {
      val spark = GraftSession.local(32)
      val counts = if (args.length > 1) args.drop(1).map(_.toInt).toSeq
        else Seq(64, 256, 1024)
      optimizeCostProbe(spark, counts)
      spark.stop()
      return
    }
    if (args.headOption.contains("rule-tax")) {
      val spark = GraftSession.local(32)
      val iters = if (args.length > 1) args(1).toInt else 1000
      ruleTaxProbe(spark, iters)
      spark.stop()
      return
    }
    if (args.headOption.contains("rebase-contention")) {
      val spark = GraftSession.local(32)
      val commitsPer = if (args.length > 1) args(1).toInt else 8
      val writers = if (args.length > 2) args.drop(2).map(_.toInt).toSeq
        else Seq(2, 4, 8)
      rebaseContentionProbe(spark, writers, commitsPer)
      spark.stop()
      return
    }
    if (args.headOption.contains("bm25seg")) {
      val spark = GraftSession.local(32)
      val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
      val cycles = if (args.length > 2) args(2).toInt else 8
      val compactEvery = if (args.length > 3) args(3).toInt else 4
      bm25SegProbe(spark, sfDir, cycles, compactEvery)
      spark.stop()
      return
    }
    if (args.headOption.contains("sivm")) {
      val spark = GraftSession.local(32)
      val batch = if (args.length > 1) args(1).toInt else 10000
      val trickles = if (args.length > 2) args(2).toInt else 5
      val ns = if (args.length > 3) args.drop(3).map(_.toLong).toSeq
        else Seq(2000000L, 8000000L, 32000000L)
      streamingIvmProbe(spark, ns, batch, trickles)
      spark.stop()
      return
    }
    if (args.headOption.contains("ivm")) {
      val spark = GraftSession.local(32)
      val batch = if (args.length > 1) args(1).toInt else 10000
      val ns = if (args.length > 2) args.drop(2).map(_.toLong).toSeq
        else Seq(2000000L, 8000000L, 32000000L)
      ivmProbe(spark, ns, batch)
      spark.stop()
      return
    }
    if (args.headOption.contains("bpe-curve")) {
      val spark = GraftSession.local(32)
      val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
      val multiples = if (args.length > 2) args.drop(2).map(_.toInt).toSeq
        else Seq(1, 5, 10)
      bpeCurveProbe(spark, sfDir, multiples)
      spark.stop()
      return
    }
    if (args.headOption.contains("bloom-curve")) {
      val spark = GraftSession.local(32)
      val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
      val multiples = if (args.length > 2) args.drop(2).map(_.toInt).toSeq
        else Seq(1, 5, 10)
      bloomCurveProbe(spark, sfDir, multiples)
      spark.stop()
      return
    }
    if (args.headOption.contains("ivf-skew")) {
      val spark = GraftSession.local(32)
      val n = if (args.length > 1) args(1).toLong else 20000L
      val cap = if (args.length > 2) args(2).toInt else 640
      ivfSkewProbe(spark, n, cap)
      spark.stop()
      return
    }
    if (args.headOption.contains("ann-curve")) {
      val spark = GraftSession.local(32)
      val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
      val multiples = if (args.length > 2) args.drop(2).map(_.toInt).toSeq
        else Seq(10, 50, 100)
      annCurveProbe(spark, sfDir, multiples)
      spark.stop()
      return
    }
    if (args.headOption.contains("skip-read")) {
      val spark = GraftSession.local(32)
      val n = if (args.length > 1) args(1).toLong else 4000000L
      val counts = if (args.length > 2) args.drop(2).map(_.toInt).toSeq
        else Seq(16, 64, 256)
      skipReadProbe(spark, n, counts)
      spark.stop()
      return
    }
    if (args.headOption.contains("dv")) {
      val spark = GraftSession.local(32)
      val n = if (args.length > 1) args(1).toLong else 4000000L
      val counts = if (args.length > 2) args.drop(2).map(_.toInt).toSeq
        else Seq(16, 64, 256)
      dvProbe(spark, n, counts)
      spark.stop()
      return
    }
    if (args.headOption.contains("nullskip")) {
      val spark = GraftSession.local(32)
      val n = if (args.length > 1) args(1).toLong else 4000000L
      val counts = if (args.length > 2) args.drop(2).map(_.toInt).toSeq
        else Seq(16, 64, 256)
      nullSkipProbe(spark, n, counts)
      spark.stop()
      return
    }
    if (args.headOption.contains("manifest-skip")) {
      val spark = GraftSession.local(32)
      val n = if (args.length > 1) args(1).toLong else 4000000L
      val counts = if (args.length > 2) args.drop(2).map(_.toInt).toSeq
        else Seq(16, 64, 256)
      manifestSkipProbe(spark, n, counts)
      spark.stop()
      return
    }
    if (args.headOption.contains("skip-curve")) {
      val spark = GraftSession.local(32)
      val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
      val replicate = if (args.length > 2) args(2).toInt else 10
      val counts = if (args.length > 3) args.drop(3).map(_.toInt).toSeq
        else Seq(4, 16, 64)
      skipCurveProbe(spark, sfDir, replicate, counts)
      spark.stop()
      return
    }
    if (args.headOption.contains("block-curve")) {
      val spark = GraftSession.local(32)
      val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
      val counts = if (args.length > 2) args.drop(2).map(_.toInt).toSeq
        else Seq(4, 16, 64)
      blockCurveProbe(spark, sfDir, counts)
      spark.stop()
      return
    }
    if (args.headOption.contains("sink-delta")) {
      val spark = GraftSession.local(32)
      val n = if (args.length > 1) args(1).toLong else 1000000L
      val years = if (args.length > 2) args(2).toInt else 10
      val filesPerYear = if (args.length > 3) args(3).toInt else 4
      sinkDeltaProbe(spark, n, years, filesPerYear)
      spark.stop()
      return
    }
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val multiples = if (args.length > 1) args.tail.map(_.toInt).toSeq else Seq(1, 10, 20)
    val spark: SparkSession = GraftSession.local(32)

    val base = Tables.load(spark, sfDir, "documents")
      .select("doc_id", "text", "lang")

    multiples.foreach { m =>
      val docs = replicate(base, m).cache()
      val n = docs.count() // materialize outside the timers

      val (_, tWinnow) = time {
        Winnowing.fingerprints(docs, "doc_id", "text").count()
      }
      val (_, tShingle) = time {
        Dedup.shingles(docs, "doc_id", "text").count()
      }
      val (_, tExact) = time {
        Dedup.exactGroups(docs, "doc_id", "text").count()
      }
      val (_, tSig) = time {
        Dedup.minhashSignatures(docs, "doc_id", "text").count()
      }
      // Cluster resolution on a synthetic chain graph (every 4 ids form a
      // 4-chain): edge count scales with the corpus, diameter stays 3 —
      // so rounds are constant and the curve isolates per-round cost.
      val (_, tCc) = time {
        val pairs = docs.select(col("doc_id").as("id_a"))
          .where(col("id_a") % 4 =!= 3)
          .select(col("id_a"), (col("id_a") + 1).as("id_b"))
        Dedup.connectedComponents(pairs, "id_a", "id_b").count()
      }
      // MERGE of a fixed 100-key batch into an m-scaled table: the scan
      // side grows with the table, the rewrite side stays bounded by the
      // batch's key spread — both visible in (time, files_rewritten).
      val mergeDir = java.nio.file.Files
        .createTempDirectory("scaleprobe-merge").toString + "/tbl"
      graft.store.MergeStore.init(spark,
        docs.select(col("doc_id").as("id"), col("text")),
        mergeDir, numFiles = 32, clusterBy = Seq("id"))
      val updates = docs.select(col("doc_id").as("id"),
          concat(lit("updated "), col("text")).as("text"))
        .where(col("id") < 100)
      val (mergeStats, tMerge) = time {
        graft.store.MergeStore.merge(spark, updates, mergeDir, Seq("id"))
      }
      // DELETE of the same 100-key spread: identical COW shape — the
      // rewrite set is bounded by the keys' file spread, not table size.
      val (delStats, tDelete) = time {
        graft.store.MergeStore.delete(spark, mergeDir,
          keys = docs.select((col("doc_id") + 100).as("id"))
            .where(col("id") < 200),
          pk = Seq("id"))
      }
      docs.unpersist()
      println(s"""{"metric":"scaleprobe","multiple":$m,"docs":$n,""" +
        s""""winnow_sec":${f"$tWinnow%.2f"},"shingle_sec":${f"$tShingle%.2f"},""" +
        s""""exact_dedup_sec":${f"$tExact%.2f"},"minhash_sig_sec":${f"$tSig%.2f"},""" +
        s""""cc_sec":${f"$tCc%.2f"},"merge_sec":${f"$tMerge%.2f"},""" +
        s""""merge_files_rewritten":${mergeStats.filesRewritten},""" +
        s""""delete_sec":${f"$tDelete%.2f"},""" +
        s""""delete_files_rewritten":${delStats.filesRewritten}}""")
    }
    spark.stop()
  }
}
