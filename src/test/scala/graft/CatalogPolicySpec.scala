package graft

import org.apache.spark.sql.functions._

import graft.store.{GraftCatalog, MergeStore}

/** Table policy through SQL DDL: ALTER TABLE ADD/DROP CONSTRAINT
  * (Spark 4.1's native constraint syntax → MergeStore CHECK policy),
  * in-DDL constraints on CREATE TABLE, and SET/UNSET TBLPROPERTIES →
  * metadata-only policy commits (MOR routing, stats/bloom skip-index
  * policy). */
class CatalogPolicySpec extends SparkSpec {
  import spark.implicits._

  private val N = 2000

  private def base = spark.range(N.toLong)
    .select(col("id"), (col("id") % 7).cast("int").as("grp"),
      concat(lit("c-"), col("id")).as("payload"))

  private def fresh(n: String): String = {
    val t = tmpDir(s"pol-$n") + "/tbl"
    MergeStore.init(spark, base, t, 4, clusterBy = Seq("id"))
    GraftCatalog.register(s"db.$n", t)
    t
  }

  test("ALTER TABLE ADD CONSTRAINT enforces at every verb; DROP lifts it") {
    val t = fresh("ck")
    spark.sql("ALTER TABLE graft.db.ck ADD CONSTRAINT grp_bounds " +
      "CHECK (grp >= 0 AND grp < 7)")
    assert(MergeStore.constraints(t).contains("grp_bounds"))
    // A violating INSERT through the catalog refuses BEFORE commit.
    val v = MergeStore.version(t).get
    val e = intercept[Exception] {
      spark.sql(s"INSERT INTO graft.db.ck VALUES (${N + 1}, 99, 'bad')")
    }
    assert(e.getMessage.contains("grp_bounds"), e.getMessage)
    assert(MergeStore.version(t).get == v, "refused verb must not commit")
    // A clean INSERT passes.
    spark.sql(s"INSERT INTO graft.db.ck VALUES (${N + 2}, 3, 'ok')")
    assert(MergeStore.read(spark, t).count() == N + 1)
    // Adding a constraint the EXISTING rows violate refuses.
    val e2 = intercept[Exception] {
      spark.sql("ALTER TABLE graft.db.ck ADD CONSTRAINT no_low " +
        "CHECK (id > 1000)")
    }
    assert(e2.getMessage.contains("existing rows violate"), e2.getMessage)
    // DROP CONSTRAINT lifts enforcement.
    spark.sql("ALTER TABLE graft.db.ck DROP CONSTRAINT grp_bounds")
    spark.sql(s"INSERT INTO graft.db.ck VALUES (${N + 3}, 99, 'now-ok')")
    assert(MergeStore.read(spark, t).where($"grp" === 99).count() == 1)
    // DROP ... IF EXISTS on a missing name is a no-op, not an error.
    spark.sql("ALTER TABLE graft.db.ck DROP CONSTRAINT IF EXISTS nope")
  }

  test("CREATE TABLE with an in-DDL CHECK constraint") {
    System.setProperty("graft.catalog.warehouse", tmpDir("pol-wh"))
    try {
      spark.sql("CREATE TABLE graft.wh.ckd (id BIGINT, v STRING, " +
        "CONSTRAINT pos_id CHECK (id > 0))")
      val p = System.getProperty("graft.catalog.warehouse") + "/wh/ckd"
      assert(MergeStore.constraints(p).contains("pos_id"))
      intercept[Exception] {
        spark.sql("INSERT INTO graft.wh.ckd VALUES (-1, 'bad')")
      }
      spark.sql("INSERT INTO graft.wh.ckd VALUES (1, 'good')")
      assert(spark.sql("SELECT count(*) AS n FROM graft.wh.ckd")
        .as[Long].head() == 1)
    } finally System.clearProperty("graft.catalog.warehouse")
  }

  test("SET TBLPROPERTIES('graft.mor') routes DML through deletion vectors; UNSET reverts") {
    val t = fresh("morp")
    spark.sql(
      "ALTER TABLE graft.db.morp SET TBLPROPERTIES ('graft.mor'='true')")
    val files = MergeStore.liveFiles(t).toSet
    assert(spark.sql("DELETE FROM graft.db.morp WHERE id = 5")
      .as[Long].head() == 1)
    assert(MergeStore.liveFiles(t).toSet == files,
      "MOR policy via SET TBLPROPERTIES must route the delete through DVs")
    assert(MergeStore.dvMeta(t).nonEmpty)
    // UNSET drops the durable policy → copy-on-write again.
    spark.sql("ALTER TABLE graft.db.morp UNSET TBLPROPERTIES ('graft.mor')")
    assert(spark.sql("DELETE FROM graft.db.morp WHERE id = 6")
      .as[Long].head() == 1)
    assert(MergeStore.liveFiles(t).toSet != files,
      "after UNSET the delete must rewrite (COW)")
    assert(spark.sql("SELECT count(*) AS n FROM graft.db.morp")
      .as[Long].head() == N - 2)
  }

  test("durable MOR policy survives restore and clone") {
    val t = fresh("morsurv")
    spark.sql(
      "ALTER TABLE graft.db.morsurv SET TBLPROPERTIES ('graft.mor'='true')")
    spark.sql("DELETE FROM graft.db.morsurv WHERE id = 1") // v2, via DV
    spark.sql("CALL graft.system.restore('db.morsurv', version => 1)")
    assert(MergeStore.manifestMeta(t).get("graft.mor").contains("true"),
      "restore must carry the MOR policy like constraints")
    val files = MergeStore.liveFiles(t).toSet
    spark.sql("DELETE FROM graft.db.morsurv WHERE id = 2")
    assert(MergeStore.liveFiles(t).toSet == files,
      "post-restore DML must still route through deletion vectors")
    // Clones inherit the policy too.
    GraftCatalog.register("db.morsurv2", tmpDir("pol-morsurv2") + "/tbl")
    spark.sql("CALL graft.system.clone_table('db.morsurv', 'db.morsurv2')")
    val p2 = spark.sql("CALL graft.system.details('db.morsurv2')")
      .collect().head
    assert(p2.getBoolean(5), "clone must carry the durable MOR policy")
  }

  test("CREATE TABLE with an unsupported constraint kind leaves nothing behind") {
    System.setProperty("graft.catalog.warehouse", tmpDir("pol-badcon"))
    try {
      val e = intercept[Exception] {
        spark.sql("CREATE TABLE graft.wh.badcon (id BIGINT, " +
          "CONSTRAINT u_bad UNIQUE (id))")
      }
      assert(e.getMessage.contains("not supported"), e.getMessage)
      assert(!spark.catalog.tableExists("graft.wh.badcon"),
        "a refused CREATE must not leave a created table")
      // The corrected statement now succeeds instead of AlreadyExists.
      spark.sql("CREATE TABLE graft.wh.badcon (id BIGINT, " +
        "CONSTRAINT pos CHECK (id > 0))")
      assert(spark.catalog.tableExists("graft.wh.badcon"))
    } finally System.clearProperty("graft.catalog.warehouse")
  }

  test("PRIMARY KEY constraints record the graft.pk key policy (informational)") {
    System.setProperty("graft.catalog.warehouse", tmpDir("pol-pk"))
    try {
      spark.sql("CREATE TABLE graft.wh.pkt (id BIGINT, v STRING, " +
        "CONSTRAINT pk PRIMARY KEY (id))")
      val p = System.getProperty("graft.catalog.warehouse") + "/wh/pkt"
      assert(MergeStore.tablePk(p) == Seq("id"))
      // The policy feeds the SQL-only consumers: table_changes needs
      // no pk argument, and it survives verb commits.
      spark.sql("INSERT INTO graft.wh.pkt VALUES (1, 'a'), (2, 'b')") // v1
      spark.sql("UPDATE graft.wh.pkt SET v = 'a2' WHERE id = 1") // v2
      assert(spark.sql(
        "SELECT count(*) AS n FROM table_changes('wh.pkt', 2) " +
          "WHERE _change_type = 'update_postimage'")
        .as[Long].head() == 1L)
      // ALTER TABLE ADD CONSTRAINT ... PRIMARY KEY sets it too.
      val t2 = fresh("pkalter")
      spark.sql("ALTER TABLE graft.db.pkalter ADD CONSTRAINT pk2 " +
        "PRIMARY KEY (id)")
      assert(MergeStore.tablePk(t2) == Seq("id"))
    } finally System.clearProperty("graft.catalog.warehouse")
  }

  test("DESCRIBE TABLE EXTENDED surfaces version and carried policies") {
    val t = fresh("desc")
    spark.sql("ALTER TABLE graft.db.desc ADD CONSTRAINT pos CHECK (id >= 0)")
    spark.sql(
      "ALTER TABLE graft.db.desc SET TBLPROPERTIES ('graft.mor'='true')")
    val desc = spark.sql("DESCRIBE TABLE EXTENDED graft.db.desc")
      .collect().map(r => s"${r.getString(0)}|${r.getString(1)}")
      .mkString("\n")
    assert(desc.contains("graft.version"), desc)
    assert(desc.contains("graft.mor") && desc.contains("true"), desc)
    assert(desc.contains("graft.constraints") && desc.contains("pos"), desc)
    assert(desc.contains("graft.stats.cols") && desc.contains("id"), desc)
  }

  test("SET TBLPROPERTIES('graft.stats.cols') governs future writes") {
    val t = tmpDir("pol-stats") + "/tbl"
    // No stats at init (legacy-style table).
    MergeStore.init(spark, base, t, 4)
    GraftCatalog.register("db.statp", t)
    assert(MergeStore.statsColumns(t).isEmpty)
    spark.sql("ALTER TABLE graft.db.statp " +
      "SET TBLPROPERTIES ('graft.stats.cols'='id,grp')")
    assert(MergeStore.statsColumns(t) == Seq("id", "grp"))
    // A column not in the schema refuses loudly.
    val e = intercept[Exception] {
      spark.sql("ALTER TABLE graft.db.statp " +
        "SET TBLPROPERTIES ('graft.stats.cols'='nope')")
    }
    assert(e.getMessage.contains("nope"), e.getMessage)
    // Unknown properties refuse loudly (never silently dropped).
    // ('owner' and friends are intercepted by Spark itself as reserved,
    // so probe with an arbitrary non-reserved name.)
    val e2 = intercept[Exception] {
      spark.sql("ALTER TABLE graft.db.statp " +
        "SET TBLPROPERTIES ('team.notes'='hello')")
    }
    assert(e2.getMessage.contains("not a graft policy"), e2.getMessage)
  }

  test("resolvePath recognizes GraftCatalog bound under any catalog name") {
    // Register the class under a second name with its own warehouse —
    // name-addressed surfaces (table_changes, streaming helpers) must
    // resolve 'lake.db.t' through THAT warehouse, not assume 'graft'.
    val wh = tmpDir("pol-lake-wh")
    spark.conf.set("spark.sql.catalog.lake",
      classOf[graft.store.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.lake.warehouse", wh)
    try {
      val p = wh + "/db/lk"
      MergeStore.init(spark, base, p, 2, clusterBy = Seq("id"))
      assert(GraftCatalog.resolvePath(spark, "lake.db.lk") ==
        java.nio.file.Paths.get(wh, "db", "lk").toString)
      // SQL through the second catalog name works end to end.
      assert(spark.sql("SELECT count(*) AS n FROM lake.db.lk")
        .as[Long].head() == N)
      // An unbound prefix is treated as a db name, not a catalog.
      val e = intercept[Exception] {
        GraftCatalog.resolvePath(spark, "nope.db.lk")
      }
      assert(e.getMessage.contains("no committed MergeStore table") ||
        e.getMessage.contains("no location for table"), e.getMessage)
    } finally {
      spark.conf.unset("spark.sql.catalog.lake.warehouse")
      spark.conf.unset("spark.sql.catalog.lake")
    }
  }
}
