package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.store.MergeStore

/** The round-11 table verbs completing MergeStore's Delta-parity
  * surface: predicate UPDATE (copy-on-write, file-granular, manifest-
  * pruned probe), RESTORE-to-version (rollback as a forward commit with
  * a correct change feed), and zero-copy CLONE (hard-linked data files,
  * carried skipping metadata, full divergence afterwards).
  */
class TableVerbsSpec extends SparkSpec {
  import spark.implicits._

  private val N = 10000
  private val FILES = 16

  private def base = spark.range(N.toLong)
    .select(col("id"), (col("id") % 97).cast("int").as("grp"),
      concat(lit("v1-"), col("id")).as("payload"))

  private def freshTable(): String = {
    val target = tmpDir("table-verbs") + "/tbl"
    MergeStore.init(spark, base, target, FILES, clusterBy = Seq("id"))
    target
  }

  // ---------------------------------------------------------------- UPDATE

  test("updateWhere: TRUE rows take SET, FALSE and NULL rows survive untouched") {
    val target = tmpDir("upd-null") + "/tbl"
    // score is NULL on every 100th row — SQL UPDATE must leave NULL-
    // predicate rows untouched, exactly like DELETE's survival rule.
    val df = spark.range(N.toLong).select(col("id"),
      when(col("id") % 100 === 0, lit(null))
        .otherwise(col("id") % 5).cast("long").as("score"),
      concat(lit("v1-"), col("id")).as("payload"))
    MergeStore.init(spark, df, target, FILES, clusterBy = Seq("id"))
    val stats = MergeStore.updateWhere(spark, target,
      col("score") > 2,
      Map("payload" -> concat(lit("upd-"), col("id"))))
    val expectHit = df.where(coalesce(col("score") > 2, lit(false))).count()
    assert(stats.rowsUpdated == expectHit && expectHit > 0)
    assert(MergeStore.version(target).contains(1))
    val back = MergeStore.read(spark, target)
      .select($"id", $"payload").as[(Long, String)].collect().toMap
    (0L until N.toLong).foreach { i =>
      val updated = i % 100 != 0 && i % 5 > 2
      assert(back(i) == (if (updated) s"upd-$i" else s"v1-$i"),
        s"row $i wrong after update")
    }
  }

  test("updateWhere: SET sees the OLD row — simultaneous assignment swaps") {
    val target = tmpDir("upd-swap") + "/tbl"
    val df = spark.range(200L).select(col("id"),
      col("id").as("a"), (col("id") * 2).as("b"))
    MergeStore.init(spark, df, target, 4, clusterBy = Seq("id"))
    MergeStore.updateWhere(spark, target, col("id") < 50,
      Map("a" -> col("b"), "b" -> col("a")))
    val back = MergeStore.read(spark, target)
      .select($"id", $"a", $"b").as[(Long, Long, Long)]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    (0L until 200L).foreach { i =>
      val want = if (i < 50) (i * 2, i) else (i, i * 2)
      assert(back(i) == want, s"row $i: ${back(i)} != $want")
    }
  }

  test("updateWhere: file-granular COW; no match means no commit") {
    val t = freshTable()
    val before = MergeStore.liveFiles(t).toSet
    // A key-local range on the id-clustered layout touches few files.
    val stats = MergeStore.updateWhere(spark, t,
      col("id") >= 100 && col("id") <= 120,
      Map("payload" -> lit("ranged")))
    assert(stats.rowsUpdated == 21)
    assert(stats.filesRewritten <= 2,
      s"range update rewrote ${stats.filesRewritten} of $FILES files")
    val after = MergeStore.liveFiles(t).toSet
    // Every untouched file carried by reference into the new manifest.
    assert((before -- after).size == stats.filesRewritten)
    // No matching rows: version must not burn.
    val noop = MergeStore.updateWhere(spark, t, col("id") === -1,
      Map("payload" -> lit("never")))
    assert(noop.rowsUpdated == 0 && noop.filesRewritten == 0)
    assert(MergeStore.version(t).contains(1))
    // Unknown SET column refused loudly.
    val e = intercept[IllegalArgumentException] {
      MergeStore.updateWhere(spark, t, col("id") === 1,
        Map("nope" -> lit(1)))
    }
    assert(e.getMessage.contains("nope"))
  }

  test("updateWhere/deleteWhere probes are manifest-pruned: an out-of-range file can be GONE") {
    val t = freshTable()
    // Physically remove the files holding the TOP of the key range. If
    // the affected-file probe scanned the table (instead of pruning by
    // the predicate's implied bounds against manifest stats), the
    // missing files would fail the scan — this is the at-scale property
    // that a key-local verb reads O(overlap) files, pinned by making
    // "read anything else" impossible.
    val doomed = MergeStore.candidateFiles(spark, t, "id",
      Some(9600L), Some(9999L))
    assert(doomed.size < FILES / 2, "layout sanity: top range is few files")
    val dataDir = Paths.get(t, "data")
    doomed.foreach(f => Files.delete(dataDir.resolve(f)))
    val u = MergeStore.updateWhere(spark, t, col("id") < 100,
      Map("payload" -> concat(lit("upd-"), col("id"))))
    assert(u.rowsUpdated == 100)
    val d = MergeStore.deleteWhere(spark, t, col("id") >= 100 && col("id") < 150)
    assert(d.rowsDeleted == 50)
    val low = MergeStore.scanRange(spark, t, "id", Some(0L), Some(199L))
      .select($"id", $"payload").as[(Long, String)].collect().toMap
    assert(low.size == 150)
    (0L until 100L).foreach(i => assert(low(i) == s"upd-$i"))
    (150L until 200L).foreach(i => assert(low(i) == s"v1-$i"))
  }

  test("updateWhere: change feed is exactly the update pre/post pairs") {
    val t = freshTable() // v0
    MergeStore.updateWhere(spark, t, col("id") >= 500 && col("id") < 510,
      Map("payload" -> concat(lit("upd-"), col("id")))) // v1
    val feed = MergeStore.changes(spark, t, 0, 1, pk = Seq("id"),
        includePreimages = true)
      .select($"id", $"_change_type", $"payload")
      .as[(Long, String, String)].collect()
    val post = feed.filter(_._2 == "update_postimage").map(r => r._1 -> r._3).toMap
    val pre = feed.filter(_._2 == "update_preimage").map(r => r._1 -> r._3).toMap
    assert(feed.count(r => r._2 == "insert" || r._2 == "delete") == 0)
    assert(post == (500L until 510L).map(i => i -> s"upd-$i").toMap)
    assert(pre == (500L until 510L).map(i => i -> s"v1-$i").toMap)
  }

  // --------------------------------------------------------------- RESTORE

  private def mutateTwice(t: String): Unit = {
    MergeStore.merge(spark, spark.range(0L, 40L)
      .select(col("id"), (col("id") % 97).cast("int").as("grp"),
        concat(lit("v2-"), col("id")).as("payload"))
      .union(spark.range(N.toLong, N + 25L)
        .select(col("id"), (col("id") % 97).cast("int").as("grp"),
          concat(lit("new-"), col("id")).as("payload"))),
      t, pk = Seq("id")) // v1: revisions + inserts
    MergeStore.delete(spark, t,
      spark.range(40L, 80L).select(col("id")), pk = Seq("id")) // v2
  }

  test("restore: head returns to the target version bit-exactly; history intact") {
    val t = freshTable() // v0
    mutateTwice(t)       // v1, v2
    val v0Rows = MergeStore.read(spark, t, Some(0))
      .select($"id", $"payload").as[(Long, String)].collect().toSet
    val v2Rows = MergeStore.read(spark, t, Some(2))
      .select($"id", $"payload").as[(Long, String)].collect().toSet
    val newV = MergeStore.restore(spark, t, 0) // v3
    assert(newV == 3 && MergeStore.version(t).contains(3))
    val headRows = MergeStore.read(spark, t)
      .select($"id", $"payload").as[(Long, String)].collect().toSet
    assert(headRows == v0Rows)
    // The rolled-back state is still pinned-readable (forward rollback,
    // not history rewrite).
    assert(MergeStore.read(spark, t, Some(2))
      .select($"id", $"payload").as[(Long, String)].collect().toSet == v2Rows)
    // Skipping metadata carried: a range probe on the restored head
    // still prunes via manifest stats.
    assert(MergeStore.candidateFiles(spark, t, "id",
      Some(0L), Some(10L)).size < FILES)
    assert(MergeStore.scanRange(spark, t, "id", Some(0L), Some(10L))
      .count() == 11)
  }

  test("restore: the change feed reverts — CDC follower replica converges") {
    val t = freshTable() // v0
    val replica = tmpDir("restore-replica") + "/tbl"
    MergeStore.init(spark, MergeStore.read(spark, t, Some(0)), replica,
      numFiles = 4, clusterBy = Seq("id"))
    mutateTwice(t) // v1, v2
    MergeStore.sync(spark, t, replica, 0, 2, pk = Seq("id"))
    MergeStore.restore(spark, t, 0) // v3
    MergeStore.sync(spark, t, replica, 2, 3, pk = Seq("id"))
    val got = MergeStore.read(spark, replica)
      .select($"id", $"payload").as[(Long, String)].collect().toSet
    val want = MergeStore.read(spark, t, Some(0))
      .select($"id", $"payload").as[(Long, String)].collect().toSet
    assert(got == want)
  }

  test("restore to a vacuumed version fails with the named retention error") {
    val t = freshTable() // v0
    mutateTwice(t)       // v1, v2
    MergeStore.vacuum(t, retainVersions = 1, graceMillis = 0)
    val e = intercept[IllegalStateException] {
      MergeStore.restore(spark, t, 0)
    }
    assert(e.getMessage.contains("vacuumed"))
    // Bounds outside history refused too.
    intercept[IllegalArgumentException] {
      MergeStore.restore(spark, t, 99)
    }
  }

  // ----------------------------------------------------------------- CLONE

  test("cloneTable: zero-copy birth, then the tables diverge independently") {
    val src = freshTable() // v0
    val dst = tmpDir("clone-dst") + "/tbl"
    MergeStore.cloneTable(spark, src, dst)
    // Clone reads identical to the source version.
    assert(MergeStore.read(spark, dst)
      .select($"id", $"payload").as[(Long, String)].collect().toSet ==
      MergeStore.read(spark, src)
        .select($"id", $"payload").as[(Long, String)].collect().toSet)
    // Zero-copy: the shared files are the SAME inode, not copies.
    val f = MergeStore.liveFiles(dst).head
    assert(Files.isSameFile(
      Paths.get(src, "data", f), Paths.get(dst, "data", f)))
    // Divergence: mutate the clone; the source never moves.
    MergeStore.deleteWhere(spark, dst, col("id") < 100)
    assert(MergeStore.version(src).contains(0))
    assert(MergeStore.read(spark, src).count() == N)
    assert(MergeStore.read(spark, dst).count() == N - 100)
    // Mutate + compact + vacuum the SOURCE; the clone's links survive
    // the source unlinking its own directory entries.
    MergeStore.deleteWhere(spark, src, col("id") >= N - 200)
    MergeStore.compact(spark, src, targetFiles = 4, clusterBy = Seq("id"))
    MergeStore.vacuum(src, retainVersions = 1, graceMillis = 0)
    assert(MergeStore.read(spark, dst).count() == N - 100)
    // A clone refuses to land on an existing table.
    intercept[IllegalArgumentException] {
      MergeStore.cloneTable(spark, src, dst)
    }
  }

  test("cloneTable carries skipping metadata: stats AND blooms prune on the clone") {
    val src = tmpDir("clone-skip") + "/src"
    MergeStore.init(spark, base, src, FILES, clusterBy = Seq("id"),
      bloomCols = Seq("payload"))
    val dst = tmpDir("clone-skip") + "/dst"
    MergeStore.cloneTable(spark, src, dst)
    // Stats lines carried: range probe prunes on the clone.
    assert(MergeStore.candidateFiles(spark, dst, "id",
      Some(0L), Some(10L)).size < FILES)
    // Bloom sidecars linked: a point lookup on the unclustered string
    // column returns exactly its row, pruning files on the way.
    val hit = MergeStore.scanPoints(spark, dst, "payload", Seq("v1-4321"))
      .select($"id").as[Long].collect().toSeq
    assert(hit == Seq(4321L))
    assert(Files.isDirectory(Paths.get(dst, "_blooms")))
  }

  // ------------------------------------------------------------- TIME TRAVEL

  test("timestamp time travel: versionAt/readAsOf resolve commit instants") {
    val target = freshTable() // v0
    Thread.sleep(30)
    val afterInit = System.currentTimeMillis()
    Thread.sleep(30)
    MergeStore.deleteWhere(spark, target, col("id") < 100) // v1
    Thread.sleep(30)
    val afterDelete = System.currentTimeMillis()
    assert(MergeStore.versionAt(target, afterInit).contains(0))
    assert(MergeStore.versionAt(target, afterDelete).contains(1))
    assert(MergeStore.versionAt(target, 0L).isEmpty) // pre-history
    assert(MergeStore.readAsOf(spark, target, afterInit).count() == N)
    assert(MergeStore.readAsOf(spark, target, afterDelete).count() == N - 100)
    val e = intercept[RuntimeException] {
      MergeStore.readAsOf(spark, target, 0L)
    }
    assert(e.getMessage.contains("no commit at or before"))
    val h = MergeStore.history(target)
    assert(h.map(_._1) == Seq(0, 1) && h(0)._2 <= h(1)._2)
  }

  // ------------------------------------------------------------ DROP COLUMN

  test("dropColumn: metadata-only drop; verbs continue; rewrites purge bytes") {
    val target = freshTable() // schema: id, grp, payload
    val v0 = MergeStore.version(target).get
    MergeStore.dropColumn(spark, target, "payload")
    assert(MergeStore.version(target).contains(v0 + 1))
    assert(MergeStore.liveFiles(target) ==
      MergeStore.liveFiles(target, Some(v0)), "drop must not rewrite files")
    val back = MergeStore.read(spark, target)
    assert(back.columns.toSeq == Seq("id", "grp"))
    // Time travel below the drop still shows the column.
    assert(MergeStore.read(spark, target, Some(v0)).columns.contains("payload"))
    // Verbs keep working against the narrowed schema.
    MergeStore.merge(spark,
      spark.range(N.toLong, N.toLong + 5)
        .select(col("id"), lit(0).cast("int").as("grp")),
      target, pk = Seq("id"))
    MergeStore.deleteWhere(spark, target, col("id") < 10)
    assert(MergeStore.read(spark, target).count() == N + 5 - 10)
    assert(MergeStore.read(spark, target).columns.toSeq == Seq("id", "grp"))
    // A compaction purges the dropped bytes physically.
    MergeStore.compact(spark, target, targetFiles = 2)
    val physical = spark.read.parquet(
      MergeStore.liveFiles(target).map(f => s"$target/data/" + f): _*)
    assert(!physical.columns.contains("payload"),
      "compaction should purge dropped column bytes")
  }

  test("dropColumn refusals: skipping participants, constraint references, legacy") {
    val target = freshTable() // clustered on id => id is a stats column
    intercept[IllegalArgumentException] {
      MergeStore.dropColumn(spark, target, "id")
    }
    MergeStore.addConstraint(spark, target, "grp_pos", "grp >= 0")
    val e = intercept[IllegalArgumentException] {
      MergeStore.dropColumn(spark, target, "grp")
    }
    assert(e.getMessage.contains("grp_pos"))
    MergeStore.dropConstraint(spark, target, "grp_pos")
    MergeStore.dropColumn(spark, target, "grp") // now fine
    assert(MergeStore.read(spark, target).columns.toSeq ==
      Seq("id", "payload"))
  }
}
