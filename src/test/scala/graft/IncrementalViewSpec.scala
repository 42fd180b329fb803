package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.IncrementalView
import graft.operators.IncrementalView.IvmSpec
import graft.store.MergeStore

/** Incremental view maintenance contract: a materialized COUNT/SUM view
  * advanced purely from the pre-image-bearing change feed must equal a
  * from-scratch re-aggregation after EVERY commit — including group
  * birth, group death, measure-moving updates, group-moving updates,
  * compactions (no-op deltas), and replica sync. Exactness rides the
  * DECIMAL(30,4) accumulator, so full-vs-incremental can never diverge
  * by float association.
  */
class IncrementalViewSpec extends SparkSpec {
  import spark.implicits._

  private val spec = IvmSpec(groupBy = Seq("grp"),
    sums = Seq("amount" -> "sum_amount"))

  private def rows(n: Long): DataFrame = spark.range(n)
    .select(col("id"), (col("id") % 7).cast("int").as("grp"),
      (col("id") * lit(1.25)).as("amount"))

  private def sorted(df: DataFrame): Seq[(Int, Long, java.math.BigDecimal)] =
    df.select(col("grp").cast("int"), col("n_rows"),
        col("sum_amount").cast("decimal(30,4)"))
      .as[(Int, Long, java.math.BigDecimal)].collect().sortBy(_._1).toSeq

  private def assertViewCurrent(t: String, view: String): Unit = {
    val got = sorted(MergeStore.read(spark, view))
    val want = sorted(IncrementalView.fullState(MergeStore.read(spark, t), spec))
    assert(got == want)
  }

  test("refresh chain equals full recompute across merge, delete, compact") {
    val t = tmpDir("ivm") + "/tbl"
    val view = tmpDir("ivm") + "/view"
    MergeStore.init(spark, rows(2000), t, numFiles = 8, clusterBy = Seq("id"))
    IncrementalView.initView(spark, t, view, spec)
    assertViewCurrent(t, view)

    // v1: updates that MOVE rows between groups and change the measure.
    val upd = rows(2000).where(col("id") % 13 === 0)
      .withColumn("grp", lit(3))
      .withColumn("amount", col("amount") + lit(10.5))
    MergeStore.merge(spark, upd, t, pk = Seq("id"))
    val s1 = IncrementalView.refresh(spark, t, view, spec)
    assert(s1.fromVersion == 0 && s1.toVersion == 1)
    assertViewCurrent(t, view)

    // v2: inserts into a brand-new group (group birth).
    val births = spark.range(2000L, 2100L)
      .select(col("id"), lit(99).cast("int").as("grp"),
        lit(2.5).as("amount"))
    MergeStore.merge(spark, births, t, pk = Seq("id"))
    IncrementalView.refresh(spark, t, view, spec)
    assertViewCurrent(t, view)
    assert(MergeStore.read(spark, view).where(col("grp") === 99).count() == 1)

    // v3: delete the whole new group (group death — view row must GO,
    // not linger at zero).
    MergeStore.delete(spark, t,
      spark.range(2000L, 2100L).select(col("id")), pk = Seq("id"))
    val s3 = IncrementalView.refresh(spark, t, view, spec)
    assert(s3.groupsDeleted == 1)
    assertViewCurrent(t, view)
    assert(MergeStore.read(spark, view).where(col("grp") === 99).count() == 0)

    // v4: compaction — a pure layout rewrite nets a ZERO delta; refresh
    // must advance the high-water mark without touching any group.
    MergeStore.compact(spark, t, targetFiles = 4, clusterBy = Seq("id"))
    val s4 = IncrementalView.refresh(spark, t, view, spec)
    assert(s4.groupsUpserted == 0 && s4.groupsDeleted == 0)
    assert(IncrementalView.appliedVersion(view) ==
      MergeStore.version(t).get)
    assertViewCurrent(t, view)

    // Already-current refresh is a no-op.
    val s5 = IncrementalView.refresh(spark, t, view, spec)
    assert(s5.fromVersion == s5.toVersion)
  }

  test("refresh after a multi-commit gap applies the NET span delta once") {
    val t = tmpDir("ivm-gap") + "/tbl"
    val view = tmpDir("ivm-gap") + "/view"
    MergeStore.init(spark, rows(500), t, numFiles = 4, clusterBy = Seq("id"))
    IncrementalView.initView(spark, t, view, spec)
    // Three commits, ONE refresh: update then delete the same keys —
    // the span nets to a plain delete; double-counting the intermediate
    // update would corrupt the sums.
    val k = rows(500).where(col("id") % 10 === 0)
    MergeStore.merge(spark, k.withColumn("amount", col("amount") * 2), t,
      pk = Seq("id"))
    MergeStore.delete(spark, t, k.select(col("id")), pk = Seq("id"))
    MergeStore.merge(spark,
      spark.range(500L, 520L).select(col("id"),
        lit(1).cast("int").as("grp"), lit(4.0).as("amount")),
      t, pk = Seq("id"))
    IncrementalView.refresh(spark, t, view, spec)
    assertViewCurrent(t, view)
  }

  test("filtered (sigma) view: updates crossing the selection boundary maintain exactly") {
    val fSpec = IvmSpec(Seq("grp"), Seq("amount" -> "sum_amount"),
      filter = Some(col("amount") >= 100.0))
    val t = tmpDir("ivm-filter") + "/tbl"
    val view = tmpDir("ivm-filter") + "/view"
    MergeStore.init(spark, rows(400), t, numFiles = 4, clusterBy = Seq("id"))
    IncrementalView.initView(spark, t, view, fSpec)
    def current(): Unit = {
      val got = sorted(MergeStore.read(spark, view))
      val want = sorted(
        IncrementalView.fullState(MergeStore.read(spark, t), fSpec))
      assert(got == want)
    }
    current()
    // One commit with all four crossings: INTO the selection (id 10:
    // 12.5 -> 150), OUT of it (id 300: 375 -> 10), staying in with a
    // measure change (id 320: 400 -> 410), staying out (id 20: 25 -> 30).
    val upd = Seq((10L, 150.0), (300L, 10.0), (320L, 410.0), (20L, 30.0))
      .toDF("id", "amount")
      .select(col("id"), (col("id") % 7).cast("int").as("grp"),
        col("amount"))
    MergeStore.merge(spark, upd, t, pk = Seq("id"))
    IncrementalView.refresh(spark, t, view, fSpec)
    current()
    // Delete spanning both sides of the boundary.
    MergeStore.delete(spark, t,
      spark.range(150L, 250L).select(col("id")), pk = Seq("id"))
    IncrementalView.refresh(spark, t, view, fSpec)
    current()
  }

  test("join view: grouped by a broadcast-dimension attribute, maintained from fact changes") {
    val dim = Seq((0, "alpha"), (1, "beta"), (2, "gamma"), (3, "alpha"),
      (4, "beta"), (5, "gamma"), (6, "delta"))
      .toDF("dkey", "region")
    val jSpec = IvmSpec(Seq("region"), Seq("amount" -> "sum_amount"),
      maxs = Seq("amount" -> "max_amount"),
      enrich = df => df.join(broadcast(dim), col("grp") === col("dkey"),
        "left").drop("dkey"))
    val t = tmpDir("ivm-join") + "/tbl"
    val view = tmpDir("ivm-join") + "/view"
    MergeStore.init(spark, rows(600), t, numFiles = 4, clusterBy = Seq("id"))
    IncrementalView.initView(spark, t, view, jSpec)
    def current(): Unit = {
      def shape(df: org.apache.spark.sql.DataFrame) = df
        .select(col("region"), col("n_rows"),
          col("sum_amount").cast("decimal(30,4)"),
          col("max_amount").cast("decimal(20,4)"))
        .as[(String, Long, java.math.BigDecimal, java.math.BigDecimal)]
        .collect().sortBy(_._1).toSeq
      assert(shape(MergeStore.read(spark, view)) ==
        shape(IncrementalView.fullState(MergeStore.read(spark, t), jSpec)))
    }
    current()
    // Fact update that MOVES rows across dimension groups (grp 1 -> 6,
    // beta -> delta) — pre-image departs beta (max may vacate:
    // recompute), post-image arrives in delta.
    MergeStore.merge(spark,
      rows(600).where(col("id") % 50 === 1).withColumn("grp", lit(6)),
      t, pk = Seq("id"))
    IncrementalView.refresh(spark, t, view, jSpec)
    current()
    MergeStore.delete(spark, t,
      spark.range(0L, 100L).select(col("id")), pk = Seq("id"))
    IncrementalView.refresh(spark, t, view, jSpec)
    current()
  }

  test("flatmap view: token counts maintained from document changes") {
    // enrich = deterministic explode (1 -> n): the corpus vocabulary as
    // an incrementally-maintained view — a pre-image explodes into
    // exactly the rows its arrival did, so subtraction cancels
    // token-for-token.
    val tSpec = IvmSpec(Seq("token"), sums = Nil,
      enrich = df => df.withColumn("token",
        explode(split(col("text"), " "))))
    val t = tmpDir("ivm-flat") + "/tbl"
    val view = tmpDir("ivm-flat") + "/view"
    val docs = spark.range(200).select(col("id"),
      concat_ws(" ", lit("w"), (col("id") % 11).cast("string"),
        (col("id") % 7).cast("string")).as("text"))
    MergeStore.init(spark, docs, t, numFiles = 4, clusterBy = Seq("id"))
    IncrementalView.initView(spark, t, view, tSpec)
    def current(): Unit = {
      def shape(df: org.apache.spark.sql.DataFrame) = df
        .select(col("token"), col("n_rows"))
        .as[(String, Long)].collect().sortBy(_._1).toSeq
      assert(shape(MergeStore.read(spark, view)) ==
        shape(IncrementalView.fullState(MergeStore.read(spark, t), tSpec)))
    }
    current()
    // Update rewrites some docs' text (tokens change sets), insert new
    // docs, then delete others — counts must track exactly.
    MergeStore.merge(spark,
      docs.where(col("id") % 13 === 0)
        .withColumn("text", concat(col("text"), lit(" extra extra"))),
      t, pk = Seq("id"))
    IncrementalView.refresh(spark, t, view, tSpec)
    current()
    assert(MergeStore.read(spark, view)
      .where(col("token") === "extra").head().getAs[Long]("n_rows") ==
      2L * docs.where(col("id") % 13 === 0).count())
    MergeStore.delete(spark, t,
      spark.range(0L, 50L).select(col("id")), pk = Seq("id"))
    IncrementalView.refresh(spark, t, view, tSpec)
    current()
  }

  test("min/max view: arrivals strengthen incrementally, departures recompute the group") {
    val eSpec = IvmSpec(Seq("grp"), Seq("amount" -> "sum_amount"),
      mins = Seq("amount" -> "min_amount"),
      maxs = Seq("amount" -> "max_amount"))
    val t = tmpDir("ivm-ext") + "/tbl"
    val view = tmpDir("ivm-ext") + "/view"
    MergeStore.init(spark, rows(700), t, numFiles = 8, clusterBy = Seq("id"))
    IncrementalView.initView(spark, t, view, eSpec)
    def current(): Unit = {
      val got = MergeStore.read(spark, view)
        .select(col("grp").cast("int"), col("n_rows"),
          col("sum_amount").cast("decimal(30,4)"),
          col("min_amount").cast("decimal(20,4)"),
          col("max_amount").cast("decimal(20,4)"))
        .as[(Int, Long, java.math.BigDecimal, java.math.BigDecimal,
          java.math.BigDecimal)].collect().sortBy(_._1).toSeq
      val want = IncrementalView
        .fullState(MergeStore.read(spark, t), eSpec)
        .select(col("grp").cast("int"), col("n_rows"),
          col("sum_amount").cast("decimal(30,4)"),
          col("min_amount").cast("decimal(20,4)"),
          col("max_amount").cast("decimal(20,4)"))
        .as[(Int, Long, java.math.BigDecimal, java.math.BigDecimal,
          java.math.BigDecimal)].collect().sortBy(_._1).toSeq
      assert(got == want)
    }
    current()
    // Arrival-only commit: inserts with a new global max per group —
    // the incremental least/greatest path.
    MergeStore.merge(spark,
      spark.range(700L, 750L).select(col("id"),
        (col("id") % 7).cast("int").as("grp"),
        (col("id") * lit(10.0)).as("amount")),
      t, pk = Seq("id"))
    IncrementalView.refresh(spark, t, view, eSpec)
    current()
    // Departure commit: delete exactly the rows holding each group's
    // max (the 700-749 inserts) — the removed-extremum case only a
    // group recompute can answer.
    MergeStore.delete(spark, t,
      spark.range(700L, 750L).select(col("id")), pk = Seq("id"))
    IncrementalView.refresh(spark, t, view, eSpec)
    current()
    // Update that LOWERS a group's min holder (id 0: amount 0 -> 500):
    // pre-image departs, group recomputes, min moves to the runner-up.
    MergeStore.merge(spark,
      Seq((0L, 0, 500.0)).toDF("id", "grp", "amount"), t, pk = Seq("id"))
    IncrementalView.refresh(spark, t, view, eSpec)
    current()
  }

  test("changes with pre-images: typed feed carries old rows; compaction emits nothing") {
    val t = tmpDir("cdf-pre") + "/tbl"
    MergeStore.init(spark, rows(300), t, numFiles = 4, clusterBy = Seq("id"))
    MergeStore.merge(spark,
      rows(300).where(col("id") === 7)
        .withColumn("amount", lit(123.0)), t, pk = Seq("id"))
    val feed = MergeStore.changes(spark, t, 0, 1, pk = Seq("id"),
      includePreimages = true)
    val byType = feed.groupBy("_change_type").count()
      .as[(String, Long)].collect().toMap
    assert(byType == Map("update_postimage" -> 1L, "update_preimage" -> 1L))
    val pre = feed.where(col("_change_type") === "update_preimage")
      .select(col("amount")).as[Double].head()
    assert(pre == 7 * 1.25) // the OLD measure, not the new one
    MergeStore.compact(spark, t, targetFiles = 2, clusterBy = Seq("id"))
    assert(MergeStore.changes(spark, t, 1, 2, pk = Seq("id"),
      includePreimages = true).count() == 0)
  }

  test("sync replicates a span change-feed-only and is idempotent") {
    val t = tmpDir("sync") + "/tbl"
    val r = tmpDir("sync") + "/replica"
    MergeStore.init(spark, rows(1000), t, numFiles = 8, clusterBy = Seq("id"))
    MergeStore.init(spark, MergeStore.read(spark, t), r, numFiles = 8,
      clusterBy = Seq("id")) // deep clone of v0
    MergeStore.merge(spark,
      rows(1000).where(col("id") % 9 === 0)
        .withColumn("amount", col("amount") + 1)
        .unionByName(spark.range(1000L, 1010L).select(col("id"),
          lit(2).cast("int").as("grp"), lit(9.0).as("amount"))),
      t, pk = Seq("id")) // v1
    MergeStore.delete(spark, t,
      spark.range(0L, 50L).select(col("id")), pk = Seq("id")) // v2
    val st = MergeStore.sync(spark, t, r, 0, 2, pk = Seq("id"))
    assert(st.deleted == 50)
    def snap(p: String) = MergeStore.read(spark, p)
      .select($"id", $"grp", $"amount").as[(Long, Int, Double)]
      .collect().sortBy(_._1).toSeq
    assert(snap(r) == snap(t))
    // Re-applying the same span must change nothing (idempotence).
    MergeStore.sync(spark, t, r, 0, 2, pk = Seq("id"))
    assert(snap(r) == snap(t))
  }
}
