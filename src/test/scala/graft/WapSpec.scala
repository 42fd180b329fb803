package graft

import org.apache.spark.sql.functions._

import graft.store.MergeStore

/** Write-audit-publish: stage verbs on a zero-copy branch, audit, then
  * publish the branch head onto the source as one atomic CAS against
  * the recorded branch point — or drop the branch and nothing
  * happened. Publishing never clobbers a concurrent source commit.
  */
class WapSpec extends SparkSpec {
  import spark.implicits._

  private val N = 6000
  private val FILES = 12

  private def base = spark.range(N.toLong).select(col("id"),
    (col("id") % 89).cast("int").as("grp"),
    concat(lit("v1-"), col("id")).as("payload"))

  private def freshSource(tag: String): String = {
    val t = tmpDir(tag) + "/tbl"
    MergeStore.init(spark, base, t, FILES, clusterBy = Seq("id"),
      bloomCols = Seq("payload"))
    t
  }

  test("branch, stage verbs, audit, publish: source takes the branch state atomically") {
    val src = freshSource("wap-happy")
    val br = tmpDir("wap-happy-br") + "/branch"
    val baseV = MergeStore.branchTable(spark, src, br)
    assert(baseV == 0)
    // Stage a realistic batch: merge + predicate delete + MOR delete.
    MergeStore.merge(spark, spark.range(100L, 160L).select(col("id"),
      lit(7).cast("int").as("grp"),
      concat(lit("staged-"), col("id")).as("payload")), br, Seq("id"))
    MergeStore.deleteWhere(spark, br, col("id") >= 5000L)
    MergeStore.deleteWhereMor(spark, br, col("id") === 42L)
    // Audit on the branch; source is untouched throughout.
    assert(MergeStore.read(spark, br).count() == N - 1000 - 1)
    assert(MergeStore.read(spark, src).count() == N)
    assert(MergeStore.version(src).contains(0))
    val v = MergeStore.publishTable(spark, src, br,
      meta = Map("audit.stamp" -> "wap-spec"))
    assert(v == 1)
    // Source == branch bit-for-bit; the audit stamp rode the commit.
    val a = MergeStore.read(spark, src).orderBy("id").collect().toSeq
    val b = MergeStore.read(spark, br).orderBy("id").collect().toSeq
    assert(a == b && a.size == N - 1000 - 1)
    assert(MergeStore.userManifestMeta(src).get("audit.stamp")
      .contains("wap-spec"))
    // Time travel below the publish still shows the pre-WAP state.
    assert(MergeStore.read(spark, src, Some(0)).count() == N)
    // Published skipping metadata works on the source: stats prune and
    // the carried/recomputed bloom sidecars resolve.
    assert(MergeStore.scanRange(spark, src, "id", Some(100), Some(110))
      .count() == 11)
    assert(MergeStore.scanPoints(spark, src, "payload",
      Seq("staged-120", "v1-7")).count() == 2)
    // The branch stays independently usable afterwards.
    MergeStore.deleteWhere(spark, br, col("id") === 7L)
    assert(MergeStore.read(spark, src).where($"id" === 7L).count() == 1)
  }

  test("publish refuses a moved source; audit rejection is just dropping the branch") {
    val src = freshSource("wap-race")
    val br = tmpDir("wap-race-br") + "/branch"
    MergeStore.branchTable(spark, src, br)
    MergeStore.deleteWhere(spark, br, col("id") < 100L) // staged
    // A rival lands on the source after the branch point.
    MergeStore.merge(spark, spark.range(3L).select(col("id"),
      lit(1).cast("int").as("grp"), lit("rival").as("payload")),
      src, Seq("id"))
    val e = intercept[java.util.ConcurrentModificationException] {
      MergeStore.publishTable(spark, src, br)
    }
    assert(e.getMessage.contains("re-branch"))
    // Source keeps the rival's state; the staged delete never leaked.
    assert(MergeStore.read(spark, src).count() == N)
    assert(MergeStore.read(spark, src).where($"payload" === "rival")
      .count() == 3)
    // Rejected audit = drop the branch dir; source needs nothing.
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    Files.walk(Paths.get(br).getParent).iterator().asScala.toSeq
      .sortBy(-_.getNameCount).foreach(Files.deleteIfExists(_))
    assert(MergeStore.read(spark, src).count() == N)
    // Not-a-branch / wrong-source refusals.
    val plain = tmpDir("wap-plain") + "/tbl"
    MergeStore.init(spark, base, plain, 4, clusterBy = Seq("id"))
    intercept[RuntimeException] {
      MergeStore.publishTable(spark, src, plain)
    }
    val other = freshSource("wap-other")
    val br2 = tmpDir("wap-other-br") + "/branch"
    MergeStore.branchTable(spark, other, br2)
    intercept[IllegalArgumentException] {
      MergeStore.publishTable(spark, src, br2)
    }
  }

  test("a publish is an ordinary commit to followers: the replica converges") {
    val src = freshSource("wap-follow")
    val replica = tmpDir("wap-follow-rep") + "/tbl"
    MergeStore.cloneTable(spark, src, replica) // replica at v0 state
    val br = tmpDir("wap-follow-br") + "/branch"
    MergeStore.branchTable(spark, src, br)
    MergeStore.merge(spark, spark.range(10L).select(col("id"),
      lit(3).cast("int").as("grp"), lit("wap").as("payload")), br, Seq("id"))
    MergeStore.deleteWhere(spark, br, col("id") >= 5900L)
    MergeStore.publishTable(spark, src, br) // src v1
    // The publish's change feed is computed relationally from the
    // file-list diff like any commit — one sync converges the replica.
    MergeStore.sync(spark, src, replica, fromVersion = 0, toVersion = 1,
      pk = Seq("id"))
    val a = MergeStore.read(spark, src).orderBy("id").collect().toSeq
    val b = MergeStore.read(spark, replica).orderBy("id").collect().toSeq
    assert(a == b && a.size == N - 100 + 0)
  }

  test("publish is CAS-atomic: a second publish of the same branch is refused") {
    val src = freshSource("wap-double")
    val br = tmpDir("wap-double-br") + "/branch"
    MergeStore.branchTable(spark, src, br)
    MergeStore.deleteWhere(spark, br, col("id") === 0L)
    MergeStore.publishTable(spark, src, br)
    // The source now sits past the branch point; replaying the same
    // publish must refuse rather than double-apply.
    intercept[java.util.ConcurrentModificationException] {
      MergeStore.publishTable(spark, src, br)
    }
    assert(MergeStore.read(spark, src).count() == N - 1)
  }

  test("wap markers are branch POLICY: publish survives a branch-side vacuum") {
    val src = freshSource("wap-vacuum")
    val br = tmpDir("wap-vacuum-br") + "/branch"
    MergeStore.branchTable(spark, src, br) // markers born on branch v0
    // A long-lived audit branch: several verb commits, then retention
    // maintenance DROPS the birth manifest. The wap.* markers must ride
    // every branch commit like constraints do, or the vacuum would
    // sever the branch from its source and the publish would fail.
    MergeStore.merge(spark, spark.range(N.toLong, N + 5L).select(col("id"),
      lit(1).cast("int").as("grp"), lit("aud").as("payload")), br, Seq("id"))
    MergeStore.deleteWhere(spark, br, col("id") === 1L)
    MergeStore.vacuum(br, retainVersions = 1, graceMillis = 0)
    assert(!java.nio.file.Files.exists(
        java.nio.file.Paths.get(br, "_manifest", "v0.list")),
      "vacuum should have dropped the branch's birth manifest")
    val v = MergeStore.publishTable(spark, src, br)
    assert(v == 1)
    assert(MergeStore.read(spark, src).count() == N + 5 - 1)
    // The published commit does NOT leak the branch markers.
    assert(!MergeStore.userManifestMeta(src).contains("wap.source"))
  }
}
