package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._

import graft.store.{GraftFileIndex, MergeStore}

/** Automatic planning-time data skipping: `MergeStore.readSkipping`
  * plans through a GraftFileIndex, so FileSourceStrategy's pushed data
  * filters prune files via manifest stats and bloom sidecars with no
  * explicit scan verb — and the result is row-identical to `read`
  * under every predicate.
  */
class SkippingReadSpec extends SparkSpec {
  import spark.implicits._

  private val N = 20000
  private val FILES = 16

  /** The GraftFileIndex behind a planned DataFrame, after forcing
    * execution (listFiles runs at physical planning). */
  private def plannedFiles(df: DataFrame): Seq[String] = {
    df.collect()
    val idx = df.queryExecution.analyzed.collect {
      case l: LogicalRelation => l.relation
    }.collectFirst {
      case h: HadoopFsRelation if h.location.isInstanceOf[GraftFileIndex] =>
        h.location.asInstanceOf[GraftFileIndex]
    }
    idx.flatMap(_.lastPlannedFiles).getOrElse(
      fail("no GraftFileIndex listing in the plan"))
  }

  private def initClustered(): String = {
    val t = tmpDir("skip-read") + "/tbl"
    val df = spark.range(N.toLong).select(col("id"),
      (col("id") % 1000).cast("int").as("grp"),
      concat(lit("p-"), col("id")).as("payload"))
    MergeStore.init(spark, df, t, FILES, clusterBy = Seq("id"))
    t
  }

  test("readSkipping with no filters reads the full table, bit-identical to read") {
    val t = initClustered()
    val a = MergeStore.read(spark, t).orderBy("id").collect().toSeq
    val b = MergeStore.readSkipping(spark, t).orderBy("id").collect().toSeq
    assert(a == b)
  }

  test("a range .where on the cluster column prunes files at plan time") {
    val t = initClustered()
    val p = col("id") >= 100 && col("id") < 300
    val skip = MergeStore.readSkipping(spark, t).where(p)
    val planned = plannedFiles(skip)
    assert(planned.size < FILES / 2,
      s"expected a selective range to prune most of $FILES files, " +
        s"planned ${planned.size}")
    assert(skip.orderBy("id").collect().toSeq ==
      MergeStore.read(spark, t).where(p).orderBy("id").collect().toSeq)
  }

  test("spark.sql over a temp view prunes through the same index") {
    val t = initClustered()
    MergeStore.readSkipping(spark, t).createOrReplaceTempView("skip_v")
    val df = spark.sql(
      "SELECT count(*) AS n, sum(id) AS s FROM skip_v WHERE id BETWEEN 500 AND 999")
    val planned = plannedFiles(df)
    assert(planned.size < FILES / 2, s"sql view planned ${planned.size}")
    assert(df.collect()(0).getLong(0) == 500L)
  }

  test("equality on a bloom column prunes via sidecars; IN-lists too") {
    val t = tmpDir("skip-bloom") + "/tbl"
    // High-cardinality UNCLUSTERED column: stats ranges are useless
    // (every file spans the domain), only the bloom can skip.
    val df = spark.range(N.toLong).select(col("id"),
      concat(lit("u-"), ((col("id") * 2654435761L) % N)).as("ukey"),
      (col("id") % 7).as("grp"))
    MergeStore.init(spark, df, t, FILES, clusterBy = Seq("id"),
      bloomCols = Seq("ukey"))
    val one = MergeStore.readSkipping(spark, t)
      .where(col("ukey") === "u-12345")
    val planned = plannedFiles(one)
    assert(planned.size < FILES,
      s"bloom point lookup planned all $FILES files")
    assert(one.count() ==
      MergeStore.read(spark, t).where(col("ukey") === "u-12345").count())
    val in = MergeStore.readSkipping(spark, t)
      .where(col("ukey").isin("u-12345", "u-777", "u-19000"))
    assert(plannedFiles(in).size < FILES)
    assert(in.orderBy("id").collect().toSeq ==
      MergeStore.read(spark, t)
        .where(col("ukey").isin("u-12345", "u-777", "u-19000"))
        .orderBy("id").collect().toSeq)
  }

  test("OR / non-literal predicates degrade to a full candidate list, never a wrong prune") {
    val t = initClustered()
    val p = col("id") < 100 || col("grp") === 500
    val df = MergeStore.readSkipping(spark, t).where(p)
    assert(df.orderBy("id").collect().toSeq ==
      MergeStore.read(spark, t).where(p).orderBy("id").collect().toSeq)
    // NULL-safe: a predicate that is NULL for some rows drops them on
    // both paths (filter semantics), pruning stays a superset.
    val q = when(col("id") % 2 === 0, col("id") < 200).otherwise(lit(null))
    assert(MergeStore.readSkipping(spark, t).where(q).count() ==
      MergeStore.read(spark, t).where(q).count())
  }

  test("the index pins its version: a later commit never shifts a built plan") {
    val t = initClustered()
    val pinned = MergeStore.readSkipping(spark, t, version = Some(0))
    MergeStore.deleteWhere(spark, t, col("id") < 1000) // v1
    assert(pinned.count() == N.toLong) // still v0
    assert(MergeStore.readSkipping(spark, t).count() == N.toLong - 1000)
    // And the pruned path under the pin reads v0's files.
    assert(pinned.where(col("id") < 500).count() == 500L)
  }

  test("skipping composes with Z-order: either z dimension prunes") {
    val t = tmpDir("skip-z") + "/tbl"
    val df = spark.range(N.toLong).select(col("id"),
      (col("id") % 211).cast("long").as("x"),
      ((col("id") * 7919L) % 211).cast("long").as("y"))
    MergeStore.init(spark, df, t, FILES, zorderBy = Seq("x", "y"))
    val px = MergeStore.readSkipping(spark, t).where(col("x") === 13L)
    val py = MergeStore.readSkipping(spark, t).where(col("y") === 42L)
    assert(plannedFiles(px).size < FILES, "x-dim did not prune")
    assert(plannedFiles(py).size < FILES, "y-dim did not prune")
    assert(px.count() ==
      MergeStore.read(spark, t).where(col("x") === 13L).count())
    assert(py.count() ==
      MergeStore.read(spark, t).where(col("y") === 42L).count())
  }

  test("schema evolution: readSkipping null-fills pre-evolution files like read") {
    val t = initClustered()
    MergeStore.merge(spark,
      spark.range(N.toLong, N.toLong + 50).select(col("id"),
        lit(1).cast("int").as("grp"),
        concat(lit("p-"), col("id")).as("payload"),
        lit("fresh").as("tag")),
      t, pk = Seq("id"), allowSchemaEvolution = true)
    val a = MergeStore.read(spark, t).orderBy("id").collect().toSeq
    val b = MergeStore.readSkipping(spark, t).orderBy("id").collect().toSeq
    assert(a == b)
    assert(MergeStore.readSkipping(spark, t)
      .where(col("tag") === "fresh").count() == 50L)
  }

  test("the index's manifest-derived size lets a small dim auto-broadcast") {
    val big = initClustered()
    val dimT = tmpDir("skip-dim") + "/tbl"
    MergeStore.init(spark,
      spark.range(100L).select(col("id").as("grp"),
        concat(lit("g-"), col("id")).as("label")),
      dimT, numFiles = 1)
    val joined = MergeStore.readSkipping(spark, big)
      .join(MergeStore.readSkipping(spark, dimT), Seq("grp"))
    joined.collect()
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"expected the 100-row dim to auto-broadcast, plan:\n$plan")
  }

  test("null-count stats: IS NOT NULL prunes all-null files, IS NULL prunes complete ones") {
    val t = tmpDir("skip-nullcnt") + "/tbl"
    // Cluster by v so its NULL rows co-locate: range partitioning
    // sorts nulls first, so the leading files are ALL-null — exactly
    // the files min/max lines cannot describe (no orderable values).
    val df = spark.range(N.toLong).select(col("id"),
      when(col("id") % 4 === 0, lit(null)).otherwise(col("id"))
        .cast("long").as("v"))
    MergeStore.init(spark, df, t, FILES, clusterBy = Seq("v"),
      statsCols = Some(Seq("v")))
    val nNull = N / 4
    val notNull = MergeStore.readSkipping(spark, t)
      .where(col("v").isNotNull)
    val p1 = plannedFiles(notNull)
    assert(p1.size < FILES,
      s"IS NOT NULL planned all $FILES files — all-null files unpruned")
    assert(notNull.count() == N - nNull)
    val isNull = MergeStore.readSkipping(spark, t).where(col("v").isNull)
    val p2 = plannedFiles(isNull)
    assert(p2.size < FILES / 2,
      s"IS NULL planned ${p2.size} of $FILES — complete files unpruned")
    assert(isNull.count() == nNull)
    // An equality pushes IsNotNull implicitly: the all-null files drop
    // from the plan even though they carry no min/max line at all.
    val eq = MergeStore.readSkipping(spark, t).where(col("v") === 8001L)
    assert(plannedFiles(eq).size < FILES / 2)
    assert(eq.count() == 1)
    // The null-count lines follow a rename like every other stats key.
    MergeStore.renameColumn(spark, t, "v", "val")
    val renamed = MergeStore.readSkipping(spark, t)
      .where(col("val").isNull)
    assert(plannedFiles(renamed).size == p2.size)
    assert(renamed.count() == nNull)
  }

  test("pruning survives deletion vectors: filters push below the DV anti-join") {
    val t = initClustered()
    MergeStore.deleteWhereMor(spark, t, col("id") >= 100 && col("id") < 200)
    val p = col("id") >= 100 && col("id") < 300
    val df = MergeStore.readSkipping(spark, t).where(p)
    // The DV wrap derives its file column from _metadata.file_name
    // (deterministic) precisely so this predicate still reaches
    // listFiles — input_file_name() would pin it above the anti-join
    // and silently un-prune every DV-bearing table.
    val planned = plannedFiles(df)
    assert(planned.size < FILES / 2,
      s"DV wrap blocked pushdown: planned ${planned.size} of $FILES files")
    assert(df.count() == 100) // 200..299 alive; 100..199 buried
    assert(df.orderBy("id").collect().toSeq ==
      MergeStore.read(spark, t).where(p).orderBy("id").collect().toSeq)
  }
}
