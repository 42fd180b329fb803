package graft

import org.apache.spark.sql.functions._

import graft.store.MergeStore

/** Manifest-level data skipping: per-file column stats ride the same
  * commit CAS as the file list, carry forward for untouched files,
  * recompute for rewritten ones, and prune both the [[MergeStore
  * .scanRange]] read path and the merge/delete affected-file probe —
  * always a SUPERSET of the true matches, so every result below is
  * pinned bit-identical against the unpruned plan.
  */
class DataSkippingSpec extends SparkSpec {
  import spark.implicits._

  private val N = 10000
  private val FILES = 16

  private def base = spark.range(N.toLong)
    .select(col("id"), (col("id") % 97).cast("int").as("grp"),
      concat(lit("v1-"), col("id")).as("payload"))

  private def freshTable(): String = {
    val target = tmpDir("skip-store") + "/tbl"
    MergeStore.init(spark, base, target, FILES, clusterBy = Seq("id"))
    target
  }

  private def statsLines(t: String, v: Option[Int] = None) =
    MergeStore.manifestMeta(t, v).filter(_._1.startsWith("s:"))

  test("init writes per-file min/max stats for the cluster column") {
    val t = freshTable()
    assert(MergeStore.statsColumns(t) == Seq("id"))
    val lines = statsLines(t)
    val files = MergeStore.liveFiles(t)
    assert(lines.size == files.size, "one id-stats line per live file")
    // Stats must equal the per-file truth recomputed by direct read.
    val truth = MergeStore.read(spark, t)
      .withColumn("__file", element_at(split(input_file_name(), "/"), -1))
      .groupBy("__file").agg(min("id").as("mn"), max("id").as("mx"))
      .as[(String, Long, Long)].collect()
      .map { case (f, mn, mx) => f -> ((mn, mx)) }.toMap
    files.foreach { f =>
      val Array(tag, mn, mx) = lines(s"s:$f:id").split(" ")
      assert(tag == "n")
      assert((mn.toLong, mx.toLong) == truth(f), s"stats drift for $f")
    }
    // Range clustering means the per-file ranges tile [0, N) — a narrow
    // probe must prune to a small fraction of the files.
    val cand = MergeStore.candidateFiles(spark, t, "id",
      Some(100L), Some(110L))
    assert(cand.size <= 2, s"expected <=2 candidates, got ${cand.size}")
  }

  test("scanRange == read().where(...) bit-identically, while pruning") {
    val t = freshTable()
    val pruned = MergeStore.scanRange(spark, t, "id",
      Some(2500L), Some(2600L))
      .select($"id", $"payload").as[(Long, String)].collect().sorted
    val full = MergeStore.read(spark, t)
      .where(col("id") >= 2500L && col("id") <= 2600L)
      .select($"id", $"payload").as[(Long, String)].collect().sorted
    assert(pruned.toSeq == full.toSeq)
    // Half-open scans too.
    val hi = MergeStore.scanRange(spark, t, "id", Some((N - 50).toLong), None)
      .count()
    assert(hi == 50)
    assert(MergeStore.candidateFiles(spark, t, "id",
      Some((N - 50).toLong), None).size <= 2)
    // Out-of-range probe: zero candidates, empty result, schema intact.
    val none = MergeStore.scanRange(spark, t, "id",
      Some(10 * N.toLong), None)
    assert(none.count() == 0)
    assert(none.columns.toSeq == Seq("id", "grp", "payload"))
  }

  test("merge maintains stats: carried files keep lines, rewrites recompute") {
    val t = freshTable()
    val before = statsLines(t)
    val updates = spark.range(100L, 110L)
      .select(col("id"), lit(7).cast("int").as("grp"),
        concat(lit("v2-"), col("id")).as("payload"))
    val st = MergeStore.merge(spark, updates, t, Seq("id"))
    assert(st.filesRewritten >= 1)
    val after = statsLines(t)
    val live = MergeStore.liveFiles(t).toSet
    // Exactly the live files carry stats — no orphan lines for dropped
    // files, none missing for replacements.
    assert(after.keys.map(_.split(":")(1)).toSet == live)
    // Untouched files' lines carried verbatim.
    val carried = after.keySet.intersect(before.keySet)
    assert(carried.nonEmpty)
    carried.foreach(k => assert(after(k) == before(k)))
    // Replacement files' stats equal their recomputed truth.
    val truth = MergeStore.read(spark, t)
      .withColumn("__file", element_at(split(input_file_name(), "/"), -1))
      .groupBy("__file").agg(min("id").as("mn"), max("id").as("mx"))
      .as[(String, Long, Long)].collect()
      .map { case (f, mn, mx) => f -> ((mn, mx)) }.toMap
    live.foreach { f =>
      val Array(_, mn, mx) = after(s"s:$f:id").split(" ")
      assert((mn.toLong, mx.toLong) == truth(f))
    }
  }

  test("merge/delete results identical with and without stats") {
    // Same verb script against a stats-bearing and a stats-less table;
    // contents and MergeStats/DeleteStats must agree exactly.
    val tA = freshTable()
    val tB = tmpDir("skip-store-b") + "/tbl"
    MergeStore.init(spark, base, tB, FILES, clusterBy = Seq("id"),
      statsCols = Some(Nil)) // clustered but NO stats
    assert(MergeStore.statsColumns(tB).isEmpty)
    val updates = spark.range(4000L, 4040L)
      .select(col("id"), lit(1).cast("int").as("grp"),
        concat(lit("v2-"), col("id")).as("payload"))
      .union(spark.range(N.toLong, N + 5L)
        .select(col("id"), lit(2).cast("int").as("grp"),
          concat(lit("new-"), col("id")).as("payload")))
    val mA = MergeStore.merge(spark, updates, tA, Seq("id"))
    val mB = MergeStore.merge(spark, updates, tB, Seq("id"))
    assert(mA.rowsUpdated == mB.rowsUpdated &&
      mA.rowsInserted == mB.rowsInserted)
    // File counts are a property of the PHYSICAL layout, not of stats:
    // repartitionByRange samples boundaries with run-varying seeds, so
    // a key range sitting on an ideal boundary can straddle it in one
    // table and not the other. Behavior parity = same rows touched +
    // same content; the pruning spirit = both verbs stay few-file.
    assert(mA.filesRewritten <= FILES / 4 && mB.filesRewritten <= FILES / 4,
      s"key-local merge should touch few files: ${mA.filesRewritten}, " +
        s"${mB.filesRewritten}")
    val doomed = spark.range(500L, 600L).select(col("id"))
    val dA = MergeStore.delete(spark, tA, doomed, Seq("id"))
    val dB = MergeStore.delete(spark, tB, doomed, Seq("id"))
    assert(dA.rowsDeleted == dB.rowsDeleted)
    assert(dA.filesRewritten <= FILES / 4 && dB.filesRewritten <= FILES / 4,
      s"key-local delete should touch few files: ${dA.filesRewritten}, " +
        s"${dB.filesRewritten}")
    val a = MergeStore.read(spark, tA).select($"id", $"grp", $"payload")
      .as[(Long, Int, String)].collect().sorted.toSeq
    val b = MergeStore.read(spark, tB).select($"id", $"grp", $"payload")
      .as[(Long, Int, String)].collect().sorted.toSeq
    assert(a == b)
  }

  test("legacy stats-less table: every path degrades to no pruning") {
    val t = tmpDir("skip-legacy") + "/tbl"
    MergeStore.init(spark, base, t, FILES, clusterBy = Seq("id"),
      statsCols = Some(Nil))
    assert(statsLines(t).isEmpty)
    // candidateFiles returns everything; scanRange still exact.
    assert(MergeStore.candidateFiles(spark, t, "id", Some(0L), Some(1L))
      .size == FILES)
    assert(MergeStore.scanRange(spark, t, "id", Some(0L), Some(9L))
      .count() == 10)
    // compact(statsCols = Some(...)) is the backfill upgrade path.
    MergeStore.compact(spark, t, targetFiles = 8, clusterBy = Seq("id"),
      statsCols = Some(Seq("id")))
    assert(MergeStore.statsColumns(t) == Seq("id"))
    assert(statsLines(t).size == MergeStore.liveFiles(t).size)
    assert(MergeStore.candidateFiles(spark, t, "id", Some(0L), Some(1L))
      .size <= 1)
  }

  test("string stats: URL-encoded lines, UTF-8 byte-order pruning") {
    val t = tmpDir("skip-str") + "/tbl"
    // Keys with '=', spaces, and newlines — the manifest line format
    // must survive them; ranges cluster lexically.
    val df = spark.range(1000L).select(
      concat(lit("k "), lpad(col("id").cast("string"), 5, "0"),
        lit("=x\ny")).as("k"),
      col("id").as("v"))
    MergeStore.init(spark, df, t, 8, clusterBy = Seq("k"))
    assert(MergeStore.statsColumns(t) == Seq("k"))
    val lo = "k 00100=x\ny"
    val hi = "k 00110=x\ny"
    val pruned = MergeStore.scanRange(spark, t, "k", Some(lo), Some(hi))
      .select($"k").as[String].collect().sorted.toSeq
    val full = MergeStore.read(spark, t)
      .where(col("k") >= lo && col("k") <= hi)
      .select($"k").as[String].collect().sorted.toSeq
    assert(pruned == full && pruned.size == 11)
    assert(MergeStore.candidateFiles(spark, t, "k", Some(lo), Some(hi))
      .size <= 2)
    // The manifest itself must still parse (no line-structure damage).
    assert(MergeStore.liveFiles(t).forall(f => !f.contains("\n")))
  }

  test("timestamp + date stats prune and stay exact") {
    val t = tmpDir("skip-ts") + "/tbl"
    val df = spark.range(2000L).select(
      col("id"),
      timestamp_seconds(
        unix_timestamp(lit("2026-01-01 00:00:00")) + col("id") * 60L)
        .as("ts"),
      date_add(lit("2026-01-01").cast("date"),
        (col("id") / 10).cast("int")).as("d"))
    MergeStore.init(spark, df, t, 8, clusterBy = Seq("ts"),
      statsCols = Some(Seq("ts", "d")))
    assert(MergeStore.statsColumns(t) == Seq("ts", "d"))
    val lo = java.sql.Timestamp.valueOf("2026-01-01 04:00:00")
    val hi = java.sql.Timestamp.valueOf("2026-01-01 05:00:00")
    val pruned = MergeStore.scanRange(spark, t, "ts", Some(lo), Some(hi))
      .select($"id").as[Long].collect().sorted.toSeq
    val full = MergeStore.read(spark, t)
      .where(col("ts") >= lit(lo) && col("ts") <= lit(hi))
      .select($"id").as[Long].collect().sorted.toSeq
    assert(pruned == full && pruned.nonEmpty)
    assert(MergeStore.candidateFiles(spark, t, "ts", Some(lo), Some(hi))
      .size <= 2)
    val dLo = java.sql.Date.valueOf("2026-03-01")
    val dPruned = MergeStore.scanRange(spark, t, "d", Some(dLo), None)
    val dFull = MergeStore.read(spark, t).where(col("d") >= lit(dLo))
    assert(dPruned.count() == dFull.count())
  }

  test("non-finite doubles: no stats line, file stays candidate, scans exact") {
    val t = tmpDir("inf-stats") + "/tbl"
    // One file's score range touches +Infinity: it must keep NO min/max
    // line (Infinity does not parse as the BigDecimal the numeric tag
    // compares with) and stay a candidate on every range probe, never
    // plant a NumberFormatException in the planner.
    val df = spark.range(1000L).select(col("id"),
      when(col("id") === 999L, lit(Double.PositiveInfinity))
        .when(col("id") === 998L, lit(Double.NegativeInfinity))
        .otherwise(col("id").cast("double") / 10.0).as("score"))
    MergeStore.init(spark, df, t, 4, clusterBy = Seq("id"),
      statsCols = Some(Seq("id", "score")))
    val meta = MergeStore.manifestMeta(t)
    val infFiles = MergeStore.liveFiles(t).filter { f =>
      // files holding ids 998/999 sit in the top id range
      MergeStore.candidateFiles(spark, t, "id", Some(998L), Some(999L))
        .contains(f)
    }
    assert(infFiles.nonEmpty)
    assert(infFiles.forall(f => !meta.contains(s"s:$f:score")),
      "a file with a non-finite score must carry no min/max stats line")
    // Range scans on the score column stay exact AND never throw.
    val got = MergeStore.scanRange(spark, t, "score", Some(50.0), Some(60.0))
      .count()
    assert(got == MergeStore.read(spark, t)
      .where(col("score").between(50.0, 60.0)).count())
    // An infinity probe finds the infinite rows (file kept candidate).
    assert(MergeStore.scanRange(spark, t, "score",
      Some(Double.PositiveInfinity), None).count() == 1)
    // Verbs whose predicate implies score bounds still work.
    val doomed = MergeStore.read(spark, t)
      .where(col("score") > 90.0).count()
    assert(doomed > 0)
    assert(MergeStore.deleteWhere(spark, t, col("score") > 90.0)
      .rowsDeleted == doomed)
  }

  test("nulls: all-null stats column leaves the file a candidate, exact") {
    val t = tmpDir("skip-null") + "/tbl"
    // Half the rows carry NULL v; one whole range of files is all-null.
    val df = spark.range(1000L).select(col("id"),
      when(col("id") < 500L, col("id")).otherwise(lit(null))
        .cast("long").as("v"))
    MergeStore.init(spark, df, t, 8, clusterBy = Seq("v"),
      statsCols = Some(Seq("v")))
    // Files holding only NULL v have no stats line — candidates forever.
    val pruned = MergeStore.scanRange(spark, t, "v", Some(100L), Some(110L))
      .select($"id").as[Long].collect().sorted.toSeq
    val full = MergeStore.read(spark, t)
      .where(col("v") >= 100L && col("v") <= 110L)
      .select($"id").as[Long].collect().sorted.toSeq
    // NULL rows fail the predicate on both paths (SQL semantics).
    assert(pruned == full && pruned.size == 11)
  }

  test("verb probes prune by nullness: a complete out-of-reach file can be GONE") {
    val t = tmpDir("skip-null-verb") + "/tbl"
    val df = spark.range(1000L).select(col("id"),
      when(col("id") % 5 === 0, lit(null)).otherwise(col("id"))
        .cast("long").as("v"),
      concat(lit("p-"), col("id")).as("payload"))
    MergeStore.init(spark, df, t, 8, clusterBy = Seq("v"),
      statsCols = Some(Seq("v")))
    // Physically delete a file whose v column is COMPLETE (no nulls):
    // a DELETE WHERE v IS NULL must never even list it — its nulls
    // line says 0 of n, so the probe prunes it before any scan.
    val meta = MergeStore.manifestMeta(t)
    val complete = meta.collectFirst {
      case (k, v) if k.startsWith("n:") && v.startsWith("0 ") =>
        k.stripPrefix("n:").takeWhile(_ != ':')
    }.getOrElse(fail("no complete file — fixture layout drifted"))
    java.nio.file.Files.delete(
      java.nio.file.Paths.get(t, "data", complete))
    val stats = MergeStore.deleteWhere(spark, t, col("v").isNull)
    assert(stats.rowsDeleted == 200)
    // The rerun prunes the same way (the rewritten replacements carry
    // nulls=0 lines too) and is a no-op — the gone file was never
    // listed by either pass. (A full read WOULD crash: we broke the
    // table on purpose; the point is the pruned verb path never looks.)
    assert(MergeStore.deleteWhere(spark, t, col("v").isNull)
      .rowsDeleted == 0)
  }

  test("rowCount answers COUNT(*) from the manifest, exact through verbs and DVs") {
    val t = tmpDir("rowcount") + "/tbl"
    val df = spark.range(2000L).select(col("id"),
      concat(lit("p-"), col("id")).as("payload"))
    MergeStore.init(spark, df, t, 8, clusterBy = Seq("id"))
    def check(): Unit = {
      val meta = MergeStore.rowCount(spark, t)
      assert(meta.contains(MergeStore.read(spark, t).count()),
        s"manifest count $meta != scan")
    }
    check() // 2000
    MergeStore.merge(spark, spark.range(1990L, 2050L).select(col("id"),
      lit("m").as("payload")), t, Seq("id"))
    check() // 2050
    MergeStore.deleteWhere(spark, t, col("id") % 7 === 0)
    check()
    // MOR deletes subtract their vectors' positions.
    MergeStore.deleteWhereMor(spark, t, col("id") % 11 === 1)
    check()
    MergeStore.updateWhereMor(spark, t, col("id") === 2L,
      Map("payload" -> lit("u")))
    check() // update: net row count unchanged, old buried + new appended
    // The counted path is PURE catalog: with position counts recorded
    // in the dv: lines, COUNT(*) must not open a single sidecar — prove
    // it by hiding the sidecar directory entirely.
    val expected = MergeStore.read(spark, t).count()
    val dvDir = java.nio.file.Paths.get(t, "_dv")
    val hidden = java.nio.file.Paths.get(t, "_dv_hidden")
    java.nio.file.Files.move(dvDir, hidden)
    try assert(MergeStore.rowCount(spark, t).contains(expected),
      "rowCount touched a DV sidecar despite recorded counts")
    finally java.nio.file.Files.move(hidden, dvDir)
    MergeStore.purgeDeletes(spark, t)
    check()
    // A stats-less table answers None (fallback to a scan).
    val legacy = tmpDir("rowcount-legacy") + "/tbl"
    MergeStore.init(spark, df, legacy, 4) // no clusterBy: no stats cols
    assert(MergeStore.rowCount(spark, legacy).isEmpty)
  }

  test("scanForKeys == semi-join over the full read, while pruning") {
    val t = freshTable()
    val keys = spark.range(3000L, 3050L).select(col("id"))
      .union(spark.range(7000L, 7010L).select(col("id")))
    val pruned = MergeStore.scanForKeys(spark, t, keys, Seq("id"))
      .select($"id", $"payload").as[(Long, String)].collect().sorted.toSeq
    val full = MergeStore.read(spark, t)
      .join(keys, Seq("id"), "left_semi")
      .select($"id", $"payload").as[(Long, String)].collect().sorted.toSeq
    assert(pruned == full && pruned.size == 60)
    // Keys outside every file range: empty result, no error.
    assert(MergeStore.scanForKeys(spark, t,
      spark.range(50000L, 50010L).select(col("id")), Seq("id"))
      .count() == 0)
  }

  test("z-ordered COW table: stats prune on EITHER dimension, exact") {
    val t = tmpDir("skip-z") + "/tbl"
    // Two independent uniform dims — lexicographic clustering would
    // leave y's per-file range spanning its whole domain.
    // 200×200 grid: x and y genuinely independent.
    val df = spark.range(40000L).select(col("id"),
      (col("id") % 200).as("x"),
      (col("id") / 200L).as("y"))
    MergeStore.init(spark, df, t, 64, zorderBy = Seq("x", "y"))
    assert(MergeStore.statsColumns(t) == Seq("x", "y"))
    val candX = MergeStore.candidateFiles(spark, t, "x",
      Some(10L), Some(20L)).size
    val candY = MergeStore.candidateFiles(spark, t, "y",
      Some(10L), Some(20L)).size
    assert(candX < 40 && candY < 40,
      s"z-order must make BOTH dims skippable: x=$candX y=$candY of 64")
    // Box probe: conjunction prunes multiplicatively; result exact.
    val box = MergeStore.scanRanges(spark, t, Map(
        "x" -> (Some(10L), Some(20L)), "y" -> (Some(10L), Some(20L))))
      .select($"id").as[Long].collect().sorted.toSeq
    val full = MergeStore.read(spark, t)
      .where(col("x").between(10L, 20L) && col("y").between(10L, 20L))
      .select($"id").as[Long].collect().sorted.toSeq
    assert(box == full && box.nonEmpty)
  }

  test("IVM marker and stats coexist in one manifest commit") {
    // The view's own commits (applyChanges with the applied marker) run
    // on a stats-bearing table: marker reads stay exact, stats stay
    // file-consistent, and a refresh after mutations matches scratch.
    import graft.operators.IncrementalView
    val t = tmpDir("skip-ivm") + "/tbl"
    MergeStore.init(spark, base, t, 8, clusterBy = Seq("id"))
    val view = tmpDir("skip-ivm") + "/view"
    val spec = IncrementalView.IvmSpec(Seq("grp"),
      sums = Seq("id" -> "sum_id"))
    IncrementalView.initView(spark, t, view, spec)
    assert(MergeStore.statsColumns(view) == Seq("grp"))
    MergeStore.merge(spark,
      spark.range(100L, 160L).select(col("id"),
        lit(998).cast("int").as("grp"),
        concat(lit("m-"), col("id")).as("payload")),
      t, pk = Seq("id"))
    IncrementalView.refresh(spark, t, view, spec)
    assert(IncrementalView.appliedVersion(view) ==
      MergeStore.version(t).get)
    val got = IncrementalView.readView(spark, view, spec)
      .select($"grp", $"n_rows", $"sum_id")
      .as[(Int, Long, Double)].collect().sortBy(_._1).toSeq
    val want = IncrementalView.fullState(MergeStore.read(spark, t), spec)
      .select($"grp", $"n_rows", col("sum_id").cast("double"))
      .as[(Int, Long, Double)].collect().sortBy(_._1).toSeq
    assert(got == want)
    // Stats lines on the view cover exactly its live files.
    assert(statsLines(view).keys.map(_.split(":")(1)).toSet ==
      MergeStore.liveFiles(view).toSet)
  }

  test("bloom sidecars: point lookups on an UNCLUSTERED column prune files") {
    val t = tmpDir("skip-bloom") + "/tbl"
    // Clustered by ts-like `seq`; `doc` is high-cardinality and
    // UNCORRELATED with the layout — min/max stats are useless for it
    // (every file spans the whole doc domain), blooms are the lever.
    val df = spark.range(20000L).select(col("id").as("seq"),
      ((col("id") * 48271L) % 20000L).as("doc"),
      concat(lit("p-"), col("id")).as("payload"))
    MergeStore.init(spark, df, t, 16, clusterBy = Seq("seq"),
      bloomCols = Seq("doc"))
    assert(MergeStore.bloomColumns(t) == Seq("doc"))
    // One sidecar per (file, col), referenced from the manifest.
    val bloomRefs = MergeStore.manifestMeta(t)
      .filter(_._1.startsWith("b:"))
    assert(bloomRefs.size == MergeStore.liveFiles(t).size)
    // Point-lookup batch: exact vs bloom-pruned, bit-identical.
    val probe = Seq(17L, 4242L, 19999L, 1234567L) // last one absent
    val pruned = MergeStore.scanPoints(spark, t, "doc", probe)
      .select($"seq", $"doc").as[(Long, Long)].collect().sorted.toSeq
    val full = MergeStore.read(spark, t)
      .where(col("doc").isin(probe: _*))
      .select($"seq", $"doc").as[(Long, Long)].collect().sorted.toSeq
    assert(pruned == full && pruned.size == 3)
    // A single-value probe must plan strictly fewer files than live
    // (the 1% fpp bloom rejects ~all non-holders of one value).
    val one = MergeStore.scanPoints(spark, t, "doc", Seq(17L))
    assert(one.count() == 1)
    // Blooms survive a merge (carried + recomputed) and stay exact.
    MergeStore.merge(spark,
      spark.range(5L).select(col("id").as("seq"), lit(999999L).as("doc"),
        lit("m").as("payload")),
      t, pk = Seq("seq"))
    val after = MergeStore.scanPoints(spark, t, "doc", Seq(999999L))
      .select($"seq").as[Long].collect().sorted.toSeq
    assert(after == Seq(0L, 1L, 2L, 3L, 4L))
    assert(MergeStore.manifestMeta(t).count(_._1.startsWith("b:")) ==
      MergeStore.liveFiles(t).size)
    // Vacuum reclaims sidecars of superseded files.
    val bloomsOnDisk = () => java.nio.file.Files
      .list(java.nio.file.Paths.get(t, "_blooms")).count()
    val beforeVac = bloomsOnDisk()
    MergeStore.vacuum(t, graceMillis = 0)
    assert(bloomsOnDisk() < beforeVac)
    assert(bloomsOnDisk() == MergeStore.liveFiles(t).size)
  }

  test("string bloom column: lookups prune and stay exact") {
    val t = tmpDir("skip-bloom-s") + "/tbl"
    val df = spark.range(5000L).select(col("id"),
      concat(lit("doc-"), ((col("id") * 7919L) % 5000L)).as("key"))
    MergeStore.init(spark, df, t, 8, clusterBy = Seq("id"),
      bloomCols = Seq("key"))
    val pruned = MergeStore.scanPoints(spark, t, "key",
        Seq("doc-17", "doc-absent"))
      .select($"id").as[Long].collect().sorted.toSeq
    val full = MergeStore.read(spark, t)
      .where(col("key").isin("doc-17", "doc-absent"))
      .select($"id").as[Long].collect().sorted.toSeq
    assert(pruned == full && pruned.size == 1)
  }

  test("reserved metadata namespace is refused for user metadata") {
    val t = freshTable()
    intercept[IllegalArgumentException] {
      MergeStore.compact(spark, t, 4, clusterBy = Seq("id"),
        meta = Map("stats.cols" -> "boom"))
    }
  }
}
