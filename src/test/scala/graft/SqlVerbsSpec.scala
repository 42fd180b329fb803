package graft

import org.apache.spark.sql.functions._

import graft.store.{MergeStore, SqlVerbs}

/** SQL text surface for the table verbs: `UPDATE / DELETE FROM /
  * MERGE INTO` statements parsed by Spark's OWN parser dispatch to the
  * MergeStore verbs with identical semantics to the Scala API — same
  * COW/MOR cost shape, same constraints, same change feed.
  */
class SqlVerbsSpec extends SparkSpec {
  import spark.implicits._

  private val N = 6000

  private def base = spark.range(N.toLong)
    .select(col("id"), (col("id") % 97).cast("int").as("grp"),
      concat(lit("v1-"), col("id")).as("payload"))

  private def fresh(tag: String): (String, Map[String, String]) = {
    val t = tmpDir(tag) + "/tbl"
    MergeStore.init(spark, base, t, 8, clusterBy = Seq("id"))
    (t, Map("events" -> t))
  }

  test("UPDATE by SQL == updateWhere: simultaneous SET, NULL predicate rows survive") {
    val (t, cat) = fresh("sqlv-upd")
    val r = SqlVerbs.execute(spark,
      "UPDATE events SET payload = concat('u-', id), grp = grp + 1 " +
        "WHERE id % 100 = 3", cat)
    val st = r.asInstanceOf[SqlVerbs.Updated].stats
    assert(st.rowsUpdated == 60)
    // Twin table through the Scala API: bit-identical result.
    val twin = tmpDir("sqlv-upd-twin") + "/tbl"
    MergeStore.init(spark, base, twin, 8, clusterBy = Seq("id"))
    MergeStore.updateWhere(spark, twin, expr("id % 100 = 3"),
      Map("payload" -> expr("concat('u-', id)"), "grp" -> expr("grp + 1")))
    assert(MergeStore.read(spark, t).orderBy("id").collect().toSeq ==
      MergeStore.read(spark, twin).orderBy("id").collect().toSeq)
    assert(MergeStore.read(spark, t).where($"id" === 103L)
      .select($"payload").as[String].head() == "u-103")
  }

  test("DELETE by SQL == deleteWhere; MOR routing marks instead of rewriting") {
    val (t, cat) = fresh("sqlv-del")
    val r = SqlVerbs.execute(spark,
      "DELETE FROM events WHERE grp = 7", cat)
    assert(r.asInstanceOf[SqlVerbs.Deleted].stats.rowsDeleted ==
      base.where($"grp" === 7).count())
    assert(MergeStore.read(spark, t).where($"grp" === 7).count() == 0)
    // MOR route: deletion vectors, no data-file rewrite.
    val filesBefore = MergeStore.liveFiles(t).toSet
    val r2 = SqlVerbs.execute(spark,
      "DELETE FROM events WHERE id = 100", cat, mor = true)
    assert(r2.asInstanceOf[SqlVerbs.MorDeleted].stats.rowsDeleted == 1)
    assert(MergeStore.liveFiles(t).toSet == filesBefore,
      "MOR delete must not rewrite data files")
    assert(MergeStore.dvMeta(t).nonEmpty)
    assert(MergeStore.read(spark, t).where($"id" === 100L).count() == 0)
  }

  test("MERGE INTO by SQL == merge: upsert form on the ON-clause keys") {
    val (t, cat) = fresh("sqlv-merge")
    spark.range(100L, 110L)
      .select(col("id"), lit(7).cast("int").as("grp"),
        concat(lit("m-"), col("id")).as("payload"))
      .union(spark.range(N.toLong, N + 5L)
        .select(col("id"), lit(8).cast("int").as("grp"),
          concat(lit("new-"), col("id")).as("payload")))
      .createOrReplaceTempView("updates_v")
    val r = SqlVerbs.execute(spark,
      "MERGE INTO events t USING updates_v s ON t.id = s.id " +
        "WHEN MATCHED THEN UPDATE SET * " +
        "WHEN NOT MATCHED THEN INSERT *", cat)
    val st = r.asInstanceOf[SqlVerbs.Merged].stats
    assert(st.rowsUpdated == 10 && st.rowsInserted == 5)
    val rows = MergeStore.read(spark, t)
      .where($"id".isin((100L to 109L) ++ (N.toLong until N + 5L): _*))
      .select($"id", $"payload").as[(Long, String)].collect().toMap
    (100L to 109L).foreach(i => assert(rows(i) == s"m-$i"))
    (N.toLong until N + 5).foreach(i => assert(rows(i) == s"new-$i"))
    assert(MergeStore.read(spark, t).count() == N + 5)
    // Sole WHEN MATCHED THEN DELETE: key-set removal.
    spark.range(100L, 105L).select(col("id"))
      .createOrReplaceTempView("doomed_v")
    val r2 = SqlVerbs.execute(spark,
      "MERGE INTO events t USING doomed_v s ON t.id = s.id " +
        "WHEN MATCHED THEN DELETE", cat)
    assert(r2.asInstanceOf[SqlVerbs.Deleted].stats.rowsDeleted == 5)
    assert(MergeStore.read(spark, t).count() == N)
  }

  test("single-action MERGE keeps SQL semantics: insert-only and update-only") {
    val (t, cat) = fresh("sqlv-single")
    // Source overlaps the table on 100..104 and extends past N by 3.
    spark.range(100L, 105L)
      .select(col("id"), lit(1).cast("int").as("grp"),
        concat(lit("src-"), col("id")).as("payload"))
      .union(spark.range(N.toLong, N + 3L)
        .select(col("id"), lit(2).cast("int").as("grp"),
          concat(lit("src-"), col("id")).as("payload")))
      .createOrReplaceTempView("single_src")
    // INSERT-only: matched rows must stay UNTOUCHED (a bare upsert
    // would overwrite 100..104 — the silent-wrong-data shape).
    val ins = SqlVerbs.execute(spark,
      "MERGE INTO events t USING single_src s ON t.id = s.id " +
        "WHEN NOT MATCHED THEN INSERT *", cat)
    val insSt = ins.asInstanceOf[SqlVerbs.Merged].stats
    assert(insSt.rowsInserted == 3 && insSt.rowsUpdated == 0, s"$insSt")
    val afterIns = MergeStore.read(spark, t)
    assert(afterIns.count() == N + 3)
    assert(afterIns.where($"id" === 102L).select($"payload")
      .as[String].head() == "v1-102", "insert-only touched a matched row")
    assert(afterIns.where($"id" === N.toLong).select($"payload")
      .as[String].head() == s"src-$N")
    // UPDATE-only: unmatched source rows must be IGNORED. Source still
    // carries N..N+2 (now matched after the insert) plus nothing new —
    // shrink the table first so the source has genuinely unmatched rows.
    MergeStore.deleteWhere(spark, t, col("id") >= N.toLong) // back to N rows
    val upd = SqlVerbs.execute(spark,
      "MERGE INTO events t USING single_src s ON t.id = s.id " +
        "WHEN MATCHED THEN UPDATE SET *", cat)
    val updSt = upd.asInstanceOf[SqlVerbs.Merged].stats
    assert(updSt.rowsUpdated == 5 && updSt.rowsInserted == 0, s"$updSt")
    val afterUpd = MergeStore.read(spark, t)
    assert(afterUpd.count() == N, "update-only inserted unmatched rows")
    assert(afterUpd.where($"id" === 102L).select($"payload")
      .as[String].head() == "src-102")
    assert(afterUpd.where($"id" >= N.toLong).count() == 0)
  }

  test("struct columns: nested-field references are field access, not table qualifiers") {
    val t = tmpDir("sqlv-struct") + "/tbl"
    val df = spark.range(100L).select(col("id"),
      struct((col("id") % 5).cast("int").as("kind"),
        lit("m").as("tag")).as("meta"),
      concat(lit("v-"), col("id")).as("payload"))
    MergeStore.init(spark, df, t, 4, clusterBy = Seq("id"))
    val cat = Map("events" -> t)
    // Bare struct path in WHERE and in a SET value.
    SqlVerbs.execute(spark,
      "UPDATE events SET payload = concat('k-', meta.kind) " +
        "WHERE meta.kind = 3", cat)
    assert(MergeStore.read(spark, t).where($"id" === 3L)
      .select($"payload").as[String].head() == "k-3")
    // Alias-qualified struct path (3-part name): e.meta.kind.
    SqlVerbs.execute(spark,
      "DELETE FROM events e WHERE e.meta.kind = 4", cat)
    assert(MergeStore.read(spark, t).count() == 80)
    assert(MergeStore.read(spark, t)
      .where($"meta.kind" === 4).count() == 0)
    // MERGE conditions traverse struct fields on both sides.
    MergeStore.read(spark, t).limit(0).unionByName(
      spark.range(0L, 100L, 5L).select(col("id"),
        struct(lit(9).cast("int").as("kind"), lit("s").as("tag"))
          .as("meta"),
        lit("src").as("payload"))).createOrReplaceTempView("sqlv_struct_src")
    val r = SqlVerbs.execute(spark,
      "MERGE INTO events t USING sqlv_struct_src s ON t.id = s.id " +
        "WHEN MATCHED AND s.meta.kind > t.meta.kind THEN " +
        "UPDATE SET payload = concat(t.payload, '!'), meta = s.meta",
      cat)
    assert(r.asInstanceOf[SqlVerbs.Merged].stats.rowsUpdated ==
      MergeStore.read(spark, t).where($"id" % 5 === 0).count())
    assert(MergeStore.read(spark, t).where($"id" === 10L)
      .select($"meta.kind").as[Int].head() == 9)
  }

  test("MERGE WITH SCHEMA EVOLUTION: the star upsert appends batch-only columns") {
    val (t, cat) = fresh("sqlv-evolve")
    base.where($"id" < 10)
      .unionByName(spark.range(N.toLong, N + 5L)
        .select(col("id"), lit(3).cast("int").as("grp"),
          concat(lit("new-"), col("id")).as("payload")))
      .withColumn("score", col("id").cast("double") / 2)
      .createOrReplaceTempView("sqlv_evo_src")
    val r = SqlVerbs.execute(spark,
      "MERGE WITH SCHEMA EVOLUTION INTO events t USING sqlv_evo_src s " +
        "ON t.id = s.id " +
        "WHEN MATCHED THEN UPDATE SET * " +
        "WHEN NOT MATCHED THEN INSERT *", cat)
    val st = r.asInstanceOf[SqlVerbs.Merged].stats
    assert(st.rowsUpdated == 10 && st.rowsInserted == 5)
    val after = MergeStore.read(spark, t)
    assert(after.columns.contains("score"), "schema must evolve")
    // Touched rows carry the new column; carried rows null-fill.
    assert(after.where($"id" === 4L).select($"score").as[Double]
      .head() == 2.0)
    assert(after.where($"score".isNotNull).count() == 15)
    assert(after.count() == N + 5)
  }

  test("refusals are loud: unknown table, unsupported shapes, constraints still gate") {
    val (t, cat) = fresh("sqlv-refuse")
    intercept[RuntimeException] {
      SqlVerbs.execute(spark, "DELETE FROM nope WHERE id = 1", cat)
    }
    intercept[RuntimeException] {
      SqlVerbs.execute(spark, "SELECT * FROM events", cat)
    }
    intercept[RuntimeException] { // evolution is star-upsert-only
      SqlVerbs.execute(spark,
        "MERGE WITH SCHEMA EVOLUTION INTO events t USING events s " +
          "ON t.id = s.id " +
          "WHEN MATCHED AND s.grp = 1 THEN UPDATE SET *", cat)
    }
    // The dispatched verb's own constraint gate still fires from SQL.
    MergeStore.addConstraint(spark, t, "grp_pos", "grp >= 0")
    intercept[IllegalStateException] {
      SqlVerbs.execute(spark,
        "UPDATE events SET grp = -1 WHERE id = 5", cat)
    }
    assert(MergeStore.read(spark, t).where($"grp" < 0).count() == 0)
  }
}
