package graft

import org.apache.spark.sql.functions._

import graft.store.{GraftCatalog, MergeStore}

/** Table maintenance through Spark 4's native `CALL` statement — the
  * DSv2 `ProcedureCatalog` on [[GraftCatalog]]: history, compact (with
  * Z-order / range layout), restore, vacuum, clone_table, all as plain
  * `spark.sql` text with named or positional arguments, plus `SHOW
  * PROCEDURES` / `DESCRIBE PROCEDURE` discovery. */
class GraftProcedureSpec extends SparkSpec {
  import spark.implicits._

  private val N = 5000

  private def base = spark.range(N.toLong)
    .select(col("id"), (col("id") % 13).cast("int").as("grp"),
      concat(lit("p-"), col("id")).as("payload"))

  private def fresh(n: String): String = {
    val t = tmpDir(s"proc-$n") + "/tbl"
    MergeStore.init(spark, base, t, 8, clusterBy = Seq("id"))
    GraftCatalog.register(s"db.$n", t)
    t
  }

  test("history: the commit log as rows, oldest first, with per-commit file deltas") {
    val t = fresh("hist")
    MergeStore.deleteWhere(spark, t, $"id" < 100L) // v1
    MergeStore.deleteWhere(spark, t, $"id" < 200L) // v2
    val h = spark.sql("CALL graft.system.history(table => 'db.hist')")
      .select($"version", $"commit_time".cast("long"), $"format",
        $"added_files", $"removed_files", $"live_files")
      .collect().toSeq
    assert(h.map(_.getInt(0)) == Seq(0, 1, 2), s"got $h")
    val times = h.map(_.getLong(1))
    assert(times.sorted == times && times.forall(_ > 0))
    // v0 is a full snapshot (fresh table): live-file count, no deltas.
    assert(h.head.getString(2) == "full" && h.head.getInt(5) == 8)
    assert(h.head.isNullAt(3) && h.head.isNullAt(4))
    // The deletes are delta commits: rewritten files counted off the
    // manifest's +/- lines, never reconstructed.
    h.tail.foreach { r =>
      assert(r.getString(2) == "delta")
      assert(r.getInt(3) >= 1 && r.getInt(4) >= 1 && r.isNullAt(5), r)
    }
  }

  test("details: one-row table summary") {
    val t = fresh("det")
    MergeStore.deleteWhereMor(spark, t, $"id" === 3L)
    val r = spark.sql("CALL graft.system.details('db.det')").collect().head
    assert(r.getInt(0) == 1, "head version after the MOR delete")
    assert(r.getInt(1) == 8, "live files")
    assert(r.getLong(2) > 0, "bytes")
    assert(r.getLong(3) == N - 1, "metadata-exact row count nets the DV")
    assert(r.getInt(4) == 1, "one deletion vector")
    assert(!r.getBoolean(5), "no MOR routing policy set")
    assert(r.getInt(6) == 0, "no constraints")
    assert(r.getString(7) == "id", "clustered init records stats policy")
  }

  test("compact: positional + named args, Z-order layout, semantics preserved") {
    val t = fresh("cpt")
    // Trickle three appends → small files pile up.
    (1 to 3).foreach { i =>
      MergeStore.append(spark, base.limit(10)
        .select($"id" + (N * i).toLong as "id", $"grp", $"payload"), t): Unit
    }
    val before = MergeStore.read(spark, t).orderBy("id").collect().toSeq
    val r = spark.sql(
      "CALL graft.system.compact('db.cpt', target_files => 4, " +
        "zorder_by => 'id,grp')").collect().head
    assert(r.getInt(1) == 4, s"files: $r")
    assert(MergeStore.liveFiles(t).size == 4)
    assert(MergeStore.read(spark, t).orderBy("id").collect().toSeq == before,
      "compaction must not change content")
    // The compacted layout still skips on the stats columns.
    assert(MergeStore.read(spark, t).where($"id" === 7L).count() == 1)
  }

  test("restore: a new head with the old version's content") {
    val t = fresh("rst")
    MergeStore.deleteWhere(spark, t, $"id" % 2 === 0) // v1
    val r = spark.sql(
      "CALL graft.system.restore('db.rst', version => 0)").collect().head
    assert(r.getInt(0) == 2, s"restore commits a NEW version: $r")
    assert(MergeStore.read(spark, t).count() == N,
      "restored head must carry the pre-delete content")
    assert(MergeStore.read(spark, t, Some(1)).count() == N / 2,
      "history stays intact under restore")
  }

  test("restore by timestamp resolves against the in-commit instants") {
    val t = fresh("rstts")
    MergeStore.deleteWhere(spark, t, $"id" % 2 === 0) // v1
    // Quote v0's own recorded instant — the restore target is the
    // state AT that time, regardless of what mtimes say.
    val ts0 = new java.sql.Timestamp(MergeStore.history(t).head._2)
    val r = spark.sql(
      s"CALL graft.system.restore('db.rstts', timestamp => '$ts0')")
      .collect().head
    assert(r.getInt(0) == 2 && r.getInt(1) == 0, r.toString)
    assert(MergeStore.read(spark, t).count() == N)
    // Exactly one of version/timestamp.
    val e = intercept[Exception] { spark.sql(
      "CALL graft.system.restore('db.rstts', version => 0, " +
        "timestamp => '2099-01-01')").collect() }
    assert(e.getMessage.contains("exactly one"), e.getMessage)
    val e2 = intercept[Exception] { spark.sql(
      "CALL graft.system.restore('db.rstts')").collect() }
    assert(e2.getMessage.contains("exactly one"), e2.getMessage)
  }

  test("vacuum: drops files outside retention; old versions stop reading") {
    val t = fresh("vac")
    MergeStore.deleteWhere(spark, t, $"id" < 2500L) // v1 rewrites most files
    val r = spark.sql(
      "CALL graft.system.vacuum('db.vac', retain_versions => 1, " +
        "grace_millis => 0)").collect().head
    assert(r.getInt(0) > 0, "the rewritten v0 files must reclaim")
    assert(MergeStore.read(spark, t).count() == N - 2500)
    intercept[Exception] {
      MergeStore.read(spark, t, Some(0)).count()
    }
    // Defaults: grace window keeps everything young; zero deletions.
    MergeStore.deleteWhere(spark, t, $"id" < 2600L)
    assert(spark.sql("CALL graft.system.vacuum('db.vac')")
      .collect().head.getInt(0) == 0)
  }

  test("vacuum dry run reports the reclaim set and mutates nothing") {
    val t = fresh("vacdry")
    MergeStore.deleteWhere(spark, t, $"id" < 2500L) // v1 rewrites files
    def dataCount = java.nio.file.Files.list(
      java.nio.file.Paths.get(t, "data")).count()
    val dataBefore = dataCount
    val r = spark.sql(
      "CALL graft.system.vacuum('db.vacdry', retain_versions => 1, " +
        "grace_millis => 0, dry_run => true)").collect().head
    assert(r.getInt(0) > 0 && r.getBoolean(1), r.toString)
    assert(dataCount == dataBefore,
      "dry run must delete nothing")
    assert(MergeStore.read(spark, t, Some(0)).count() == N,
      "dry run must keep every retained-window read working")
    // The real pass reclaims exactly what the dry run reported.
    val real = spark.sql(
      "CALL graft.system.vacuum('db.vacdry', retain_versions => 1, " +
        "grace_millis => 0)").collect().head
    assert(real.getInt(0) == r.getInt(0) && !real.getBoolean(1))
  }

  test("clone_table by timestamp pins the resolved version") {
    val t = fresh("clnts")
    MergeStore.deleteWhere(spark, t, $"id" < 10L) // v1
    val ts0 = new java.sql.Timestamp(MergeStore.history(t).head._2)
    val dest = tmpDir("proc-clnts-dest") + "/tbl"
    GraftCatalog.register("db.clntsd", dest)
    val r = spark.sql("CALL graft.system.clone_table(" +
      s"source => 'db.clnts', dest => 'db.clntsd', timestamp => '$ts0')")
      .collect().head
    assert(r.getInt(0) == 0, s"timestamp must resolve to v0: $r")
    assert(MergeStore.read(spark, dest).count() == N)
    val e = intercept[Exception] { spark.sql(
      "CALL graft.system.clone_table(source => 'db.clnts', " +
        "dest => 'db.clntsd', version => 0, timestamp => '2099-01-01')")
      .collect() }
    assert(e.getMessage.contains("at most one"), e.getMessage)
  }

  test("clone_table: zero-copy clone via CALL; clones evolve independently") {
    val t = fresh("cln")
    MergeStore.deleteWhere(spark, t, $"id" < 10L) // v1
    val dest = tmpDir("proc-cln-dest") + "/tbl"
    GraftCatalog.register("db.cln2", dest)
    val r = spark.sql(
      "CALL graft.system.clone_table(source => 'db.cln', " +
        "dest => 'db.cln2', version => 0)").collect().head
    assert(r.getInt(0) == 0)
    assert(spark.sql("SELECT count(*) AS n FROM graft.db.cln2")
      .as[Long].head() == N, "clone pinned at v0 sees the pre-delete rows")
    spark.sql("DELETE FROM graft.db.cln2 WHERE id < 1000")
    assert(MergeStore.read(spark, t).count() == N - 10,
      "clone writes must not touch the source")
  }

  test("SHOW PROCEDURES and DESCRIBE PROCEDURE surface the registry") {
    val shown = spark.sql("SHOW PROCEDURES IN graft.system")
      .select("procedure_name").as[String].collect().toSet
    assert(Set("history", "details", "vacuum", "compact",
      "optimize_small", "restore", "clone_table").subsetOf(shown),
      s"got $shown")
    val desc = spark.sql("DESCRIBE PROCEDURE graft.system.vacuum")
      .as[String].collect().mkString("\n")
    assert(desc.contains("vacuum"), desc)
  }

  test("refusals: unknown procedure, missing table, bad namespace") {
    val e1 = intercept[Exception] {
      spark.sql("CALL graft.system.zap('db.x')").collect()
    }
    // Spark wraps loadProcedure failures as FAILED_TO_LOAD_ROUTINE; the
    // named refusal rides the cause chain.
    val chain = Iterator.iterate(e1: Throwable)(_.getCause)
      .takeWhile(_ != null).map(_.getMessage).mkString(" | ")
    assert(chain.contains("unknown procedure"), chain)
    val e2 = intercept[Exception] {
      spark.sql("CALL graft.system.history('db.nope_missing')").collect()
    }
    assert(e2.getMessage.toLowerCase.contains("table"), e2.getMessage)
  }
}
