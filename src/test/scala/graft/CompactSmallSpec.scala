package graft

import org.apache.spark.sql.functions._

import graft.store.{GraftCatalog, MergeStore}

/** Incremental OPTIMIZE ([[MergeStore.compactSmall]]): bin-pack only
  * the small files, leave right-sized files untouched, materialize
  * deletion vectors, rebase past concurrent appends — and the
  * `CALL graft.system.optimize_small` SQL spelling. */
class CompactSmallSpec extends SparkSpec {
  import spark.implicits._

  private val N = 20000

  private def base = spark.range(N.toLong)
    .select(col("id"), (col("id") % 13).cast("int").as("grp"),
      concat(lit("x-"), col("id")).as("payload"))

  /** 4 big files + `tiny` single-row appends. */
  private def trickled(tag: String, tiny: Int): String = {
    val t = tmpDir(s"opt-$tag") + "/tbl"
    MergeStore.init(spark, base, t, 4, clusterBy = Seq("id"))
    (1 to tiny).foreach { i =>
      MergeStore.append(spark,
        Seq((N + i.toLong, 99, s"tiny-$i")).toDF("id", "grp", "payload")
          .select($"id", $"grp".cast("int"), $"payload"), t): Unit
    }
    t
  }

  test("bin-packs only the small files; content and big files untouched") {
    val t = trickled("pack", 6)
    val before = MergeStore.read(spark, t).orderBy("id").collect().toSeq
    val liveBefore = MergeStore.liveFiles(t)
    assert(liveBefore.size == 10)
    val big = liveBefore.filter(f =>
      java.nio.file.Files.size(
        java.nio.file.Paths.get(t, "data", f)) >= 4096).toSet
    assert(big.size == 4, s"init files must be over the test threshold")
    val st = MergeStore.compactSmall(spark, t, smallBytes = 4096)
    assert(st.compacted == 6 && st.produced == 1, st.toString)
    val liveAfter = MergeStore.liveFiles(t).toSet
    assert(liveAfter.size == 5)
    assert(big.subsetOf(liveAfter), "right-sized files must not rewrite")
    assert(MergeStore.read(spark, t).orderBy("id").collect().toSeq ==
      before, "bin-packing must preserve content exactly")
    // Stats carry for untouched files, recompute for the packed one:
    // a key probe into the packed range still prunes the big files.
    assert(MergeStore.candidateFiles(spark, t, "id",
      Some(N + 1L), Some(N + 6L)).size == 1)
  }

  test("fewer than 2 small files is a no-op") {
    val t = trickled("noop", 1)
    val v = MergeStore.version(t).get
    val st = MergeStore.compactSmall(spark, t, smallBytes = 4096)
    assert(st.compacted == 0 && st.version == v)
    assert(MergeStore.version(t).get == v, "no-op must not commit")
  }

  test("deletion vectors materialize: buried rows stay dead, sidecar lines retire") {
    val t = trickled("dv", 4)
    MergeStore.deleteWhereMor(spark, t, $"id" === (N + 2).toLong)
    assert(MergeStore.dvMeta(t).nonEmpty)
    val st = MergeStore.compactSmall(spark, t, smallBytes = 4096)
    assert(st.compacted == 4)
    assert(MergeStore.dvMeta(t).isEmpty,
      "DV lines must retire with the rewritten file names")
    val after = MergeStore.read(spark, t)
    assert(after.where($"id" === (N + 2).toLong).count() == 0,
      "materialized delete must hold")
    assert(after.count() == N + 3)
  }

  test("a rival append rebases (zero recompute); a rival DV on a candidate recomputes") {
    val t = trickled("occ", 3)
    val v = MergeStore.version(t).get
    // Rival lands AFTER our snapshot pin: append = policy-unchanged,
    // candidates untouched → rebase.
    MergeStore.append(spark,
      Seq((N + 100L, 1, "rival")).toDF("id", "grp", "payload")
        .select($"id", $"grp".cast("int"), $"payload"), t): Unit
    val st = MergeStore.compactSmall(spark, t, smallBytes = 4096,
      snapshotVersion = Some(v))
    assert(st.rebases == 1 && st.recomputes == 0, st.toString)
    val read = MergeStore.read(spark, t)
    assert(read.where($"payload" === "rival").count() == 1,
      "the rival's append must survive the rebased compaction")
    assert(read.count() == N + 4)
    // Rival buries a row IN a candidate small file → DV lines moved →
    // recompute (so the materialization can't resurrect the row).
    val t2 = trickled("occ2", 3)
    val v2 = MergeStore.version(t2).get
    MergeStore.deleteWhereMor(spark, t2, $"id" === (N + 1).toLong)
    val st2 = MergeStore.compactSmall(spark, t2, smallBytes = 4096,
      maxRetries = 1, snapshotVersion = Some(v2))
    assert(st2.recomputes == 1, st2.toString)
    assert(MergeStore.read(spark, t2)
      .where($"id" === (N + 1).toLong).count() == 0,
      "the recomputed pass must respect the rival's delete")
  }

  test("column-mapped (renamed) tables bin-pack under the mapping") {
    val t = trickled("ren", 4)
    MergeStore.renameColumn(spark, t, "payload", "body")
    val before = MergeStore.read(spark, t).orderBy("id").collect().toSeq
    val st = MergeStore.compactSmall(spark, t, smallBytes = 4096)
    assert(st.compacted == 4)
    assert(MergeStore.read(spark, t).orderBy("id").collect().toSeq ==
      before, "rewrite must round-trip through the physical names")
    // The packed file still serves the renamed column and the key probe.
    assert(MergeStore.read(spark, t).where($"id" === (N + 1).toLong)
      .select($"body").as[String].head() == "tiny-1")
    assert(MergeStore.candidateFiles(spark, t, "id",
      Some(N + 1L), Some(N + 4L)).size == 1)
  }

  test("CALL graft.system.optimize_small drives the verb") {
    val t = trickled("sql", 5)
    GraftCatalog.register("db.opts", t)
    val r = spark.sql("CALL graft.system.optimize_small('db.opts', " +
      "small_bytes => 4096)").collect().head
    assert(r.getInt(1) == 5 && r.getInt(2) == 1, r.toString)
    assert(MergeStore.liveFiles(t).size == 5)
    assert(spark.sql("SELECT count(*) AS n FROM graft.db.opts")
      .as[Long].head() == N + 5)
  }
}
