package graft

import org.apache.spark.sql.functions._

import graft.store.{GraftCatalog, MergeStore}

/** REPLACE TABLE [AS SELECT] / CREATE OR REPLACE through the staging
  * catalog (StagingTableCatalog): the replace is ONE commit on the
  * existing manifest chain carrying the new definition whole — new
  * schema, new content, policies reset to the statement's — so time
  * travel below the replace still reads the OLD table (Delta's
  * REPLACE, not the log-erasing drop+create fallback). */
class ReplaceTableSpec extends SparkSpec {
  import spark.implicits._

  private def withWarehouse[A](f: String => A): A = {
    val wh = tmpDir("rep-wh")
    System.setProperty("graft.catalog.warehouse", wh)
    try f(wh)
    finally System.clearProperty("graft.catalog.warehouse")
  }

  test("CREATE OR REPLACE AS SELECT: new schema + content, history intact") {
    withWarehouse { wh =>
      spark.sql("CREATE TABLE graft.rwh.t1 (id BIGINT, s STRING) " +
        "TBLPROPERTIES ('graft.pk' = 'id')")
      spark.sql("INSERT INTO graft.rwh.t1 VALUES (1, 'a'), (2, 'b')")
      val p = s"$wh/rwh/t1"
      val vBefore = MergeStore.version(p).get
      spark.range(10L, 13L)
        .select(col("id"), (col("id") * 2).as("doubled"))
        .createOrReplaceTempView("r1_src")
      spark.sql("CREATE OR REPLACE TABLE graft.rwh.t1 AS " +
        "SELECT * FROM r1_src")
      // New definition at head.
      val rows = spark.sql("SELECT * FROM graft.rwh.t1 ORDER BY id")
        .collect().toSeq.map(_.toString)
      assert(rows == Seq("[10,20]", "[11,22]", "[12,24]"), rows.toString)
      assert(spark.table("graft.rwh.t1").columns.toSeq ==
        Seq("id", "doubled"))
      // ONE commit on the same chain; the old content time-travels.
      assert(MergeStore.version(p).get == vBefore + 1,
        "REPLACE must be one more commit, not a fresh table")
      val old = spark.sql(
        s"SELECT * FROM graft.rwh.t1 VERSION AS OF $vBefore ORDER BY id")
        .collect().toSeq.map(_.toString)
      assert(old == Seq("[1,a]", "[2,b]"),
        s"time travel below the replace must read the OLD table: $old")
      // Policies reset: the old graft.pk does not leak through.
      assert(!MergeStore.manifestMeta(p).contains("graft.pk"),
        "REPLACE resets policies to the new statement's")
      spark.sql("DROP TABLE graft.rwh.t1")
    }
  }

  test("plain REPLACE TABLE truncates under the new schema; constraints and defaults apply") {
    withWarehouse { wh =>
      spark.sql("CREATE TABLE graft.rwh.t2 (id BIGINT, s STRING)")
      spark.sql("INSERT INTO graft.rwh.t2 VALUES (1, 'a')")
      spark.sql("REPLACE TABLE graft.rwh.t2 " +
        "(id BIGINT, n INT DEFAULT 5, CONSTRAINT pos CHECK (id >= 0))")
      assert(spark.table("graft.rwh.t2").count() == 0L)
      spark.sql("INSERT INTO graft.rwh.t2 (id) VALUES (7)")
      assert(spark.sql("SELECT n FROM graft.rwh.t2 WHERE id = 7")
        .collect().head.getInt(0) == 5,
        "a DEFAULT declared in the REPLACE schema must fill")
      val p = s"$wh/rwh/t2"
      val e = intercept[Exception] {
        MergeStore.append(spark, Seq((-3L, 1)).toDF("id", "n"), p)
      }
      assert(e.getMessage.contains("pos"),
        s"a CHECK declared in the REPLACE must enforce: ${e.getMessage}")
      spark.sql("DROP TABLE graft.rwh.t2")
    }
  }

  test("REPLACE of a missing table refuses; CREATE OR REPLACE creates it") {
    withWarehouse { wh =>
      intercept[Exception] {
        spark.sql("REPLACE TABLE graft.rwh.nope (id BIGINT)")
      }: Unit
      spark.range(3L).select(col("id"))
        .createOrReplaceTempView("r3_src")
      spark.sql("CREATE OR REPLACE TABLE graft.rwh.t3 AS " +
        "SELECT * FROM r3_src")
      assert(spark.table("graft.rwh.t3").count() == 3L)
      spark.sql("DROP TABLE graft.rwh.t3")
    }
  }

  test("the COPY INTO ledger resets across a REPLACE (files re-ingest)") {
    withWarehouse { wh =>
      import java.nio.file.{Files, Paths}
      import scala.jdk.CollectionConverters._
      spark.sql("CREATE TABLE graft.rwh.t4 (id BIGINT, s STRING)")
      val p = s"$wh/rwh/t4"
      val src = tmpDir("rep-src")
      val stage = tmpDir("rep-stage")
      spark.range(5L).select(col("id"),
        concat(lit("r-"), col("id")).as("s"))
        .coalesce(1).write.mode("overwrite").parquet(stage)
      val one = Files.list(Paths.get(stage)).iterator().asScala
        .find(_.getFileName.toString.endsWith(".parquet")).get
      Files.move(one, Paths.get(src, "a.parquet")): Unit
      assert(MergeStore.copyInto(spark, p, s"$src/a.parquet")
        .filesLoaded == 1)
      spark.sql("REPLACE TABLE graft.rwh.t4 (id BIGINT, s STRING)")
      // The replaced table starts over: the same file ingests again.
      val st = MergeStore.copyInto(spark, p, s"$src/a.parquet")
      assert(st.filesLoaded == 1 && st.filesSkipped == 0,
        s"REPLACE must reset the ingest ledger: $st")
      assert(spark.table("graft.rwh.t4").count() == 5L)
      spark.sql("DROP TABLE graft.rwh.t4")
    }
  }
}
