package graft

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.functions.Curation

class CurationSpec extends SparkSpec {
  import spark.implicits._

  test("hash split: deterministic, partition-invariant, ~90/5/5") {
    val d = Tables.load(spark, sf(), "documents")
    val split = d.select(col("doc_id"), Curation.splitLabel(col("doc_id")).as("s"))
    val counts = split.groupBy("s").count().as[(String, Long)].collect().toMap
    val n = counts.values.sum
    assert(counts.keySet == Set("train", "val", "test"))
    // 500 docs: expect ~450/25/25; allow generous tolerance for hash noise.
    assert(counts("train") > n * 8 / 10 && counts("train") < n * 95 / 100)

    // Same label regardless of physical layout (the property that matters:
    // re-partitioning or re-ingesting must never move a doc across splits).
    val reparted = d.repartition(7)
      .select(col("doc_id"), Curation.splitLabel(col("doc_id")).as("s"))
    assert(split.except(reparted).isEmpty && reparted.except(split).isEmpty)
  }

  test("redaction: digit runs / entity terms replaced, counts match, idempotent") {
    val df = Seq(
      (1L, "call 555123 or 42 now"),       // one 3+ digit run; 42 untouched
      (2L, "reach a1@b2.com today"),       // one email
      (3L, "customer departed the party"), // 1 whole-word entity; no substring hits
      (4L, "nothing here")
    ).toDF("doc_id", "text")
    val r = df.select(col("doc_id"),
      Curation.numberCount(col("text")).as("nn"),
      Curation.emailCount(col("text")).as("ne"),
      Curation.entityCount(col("text")).as("nent"),
      Curation.redactEntities(Curation.redactNumbers(col("text"))).as("red"))
      .as[(Long, Int, Int, Int, String)].collect().sortBy(_._1)
    assert(r(0) == ((1L, 1, 0, 0, "call <NUM> or 42 now")))
    assert(r(1)._2 == 0 && r(1)._3 == 1)
    // "departed"/"party" contain entity substrings but \b guards them.
    assert(r(2) == ((3L, 0, 0, 1, "<ENTITY> departed the party")))
    assert(r(3) == ((4L, 0, 0, 0, "nothing here")))
    // Redacting an already-redacted text is a no-op.
    val twice = df.select(
      Curation.redactEntities(Curation.redactNumbers(
        Curation.redactEntities(Curation.redactNumbers(col("text"))))).as("t"))
      .as[String].collect().toSet
    assert(twice == r.map(_._5).toSet)
  }

  test("q44 packing: packs respect the running-fill invariant") {
    val q = graft.SparkEntry.queries("q44_seq_packing")(spark, sf())
    val rows = q.collect()
    assert(rows.nonEmpty)
    // Every pack except possibly each lang's last must have crossed the
    // 512-token budget (streaming fill only opens a new pack after the
    // previous one is full).
    val byLang = rows.groupBy(_.getString(0))
    byLang.foreach { case (_, packs) =>
      val sorted = packs.sortBy(_.getInt(1))
      // A new pack only opens once the running total has crossed its
      // 512-token boundary: prefix sum through pack p >= 512*(p+1) for
      // every non-final pack.
      val prefix = sorted.map(_.getLong(3)).scanLeft(0L)(_ + _).drop(1)
      sorted.dropRight(1).zip(prefix).foreach { case (r, cum) =>
        assert(cum >= 512L * (r.getInt(1) + 1),
          s"pack ${r.getInt(1)} closed before its boundary")
      }
      // pack ids are dense from 0
      assert(sorted.map(_.getInt(1)).toSeq == sorted.indices.map(identity))
    }
  }

  test("hashUniform: exact [0,1) coin, stable, layout-invariant") {
    val df = Tables.load(spark, sf(), "documents").select("doc_id")
    val u = df.select(Curation.hashUniform($"doc_id").as("u"))
      .as[Double].collect()
    assert(u.forall(x => x >= 0.0 && x < 1.0))
    assert(u.distinct.length > u.length / 2) // spread, not constant
    val again = df.repartition(7)
      .select(Curation.hashUniform($"doc_id").as("u")).as[Double].collect()
    assert(u.sorted.toSeq == again.sorted.toSeq)
  }

  test("temperature resample: minority languages keep a higher share") {
    // alpha < 1 flattens the language distribution: acceptance rate must
    // be weakly DECREASING in language size, with the smallest languages
    // at or near full retention (rate ~ 1).
    val d = Tables.load(spark, sf(), "documents")
    val kept = SparkEntry.queries("q62_temperature_resample")(spark, sf())
    val n = d.groupBy("lang").count().as[(String, Long)].collect().toMap
    val k = kept.groupBy("lang").count().as[(String, Long)].collect().toMap
    val rates = n.keys.map(l => l -> k.getOrElse(l, 0L).toDouble / n(l)).toMap
    val bySize = n.toSeq.sortBy(_._2).map(_._1)
    val (small, large) = (bySize.head, bySize.last)
    assert(rates(small) > rates(large),
      s"small lang $small rate ${rates(small)} <= large $large ${rates(large)}")
    // Flattening: the smallest language's SHARE of the kept set must
    // exceed its share of the original corpus (and the largest's shrink).
    val (ntot, ktot) = (n.values.sum.toDouble, k.values.sum.toDouble)
    assert(k(small) / ktot > n(small) / ntot,
      s"small-lang share did not grow: ${k(small) / ktot} vs ${n(small) / ntot}")
    assert(k(large) / ktot < n(large) / ntot,
      s"large-lang share did not shrink: ${k(large) / ktot} vs ${n(large) / ntot}")
  }

  test("mixture epochs: copy counts realize the weights, deterministically") {
    import graft.operators.Mixture
    val d = Tables.load(spark, sf(), "documents")
    val weights = Seq("src0" -> 2.3, "src1" -> 1.0, "src2" -> 0.44,
      "src3" -> 3.0)
    val mix = Mixture.materializeEpochs(
      d.where(col("source").isin("src0", "src1", "src2", "src3")),
      "doc_id", "source", weights)
    val perDoc = mix.groupBy("doc_id", "source")
      .agg(max("epoch").as("copies"))
    // Integer weights are exact: every doc of an integer-weight source
    // gets exactly w copies — no fractional draw at all.
    assert(perDoc.where(col("source") === "src1")
      .select("copies").distinct().as[Int].collect().toSeq == Seq(1))
    assert(perDoc.where(col("source") === "src3")
      .select("copies").distinct().as[Int].collect().toSeq == Seq(3))
    // Fractional weights: copies ∈ {floor, floor+1} and the realized
    // mean tracks the weight (binomial tolerance on a small fixture).
    val c0 = perDoc.where(col("source") === "src0")
      .select("copies").as[Int].collect()
    assert(c0.forall(c => c == 2 || c == 3))
    val mean0 = c0.sum.toDouble / c0.length
    assert(math.abs(mean0 - 2.3) < 0.25, s"realized mean $mean0 vs 2.3")
    // Sub-1 weight IS a subsample: some docs drop out entirely.
    val src2Docs = d.where(col("source") === "src2").count()
    val src2Kept = perDoc.where(col("source") === "src2").count()
    assert(src2Kept > 0 && src2Kept < src2Docs)
    // Determinism: the realized mixture is partitioning-invariant.
    val a = mix.orderBy("doc_id", "epoch").collect().toSeq
    val b = Mixture.materializeEpochs(
        d.where(col("source").isin("src0", "src1", "src2", "src3"))
          .repartition(13), "doc_id", "source", weights)
      .orderBy("doc_id", "epoch").collect().toSeq
    assert(a == b)
  }

  test("leakage-safe split: no duplicate cluster straddles a split") {
    import graft.operators.Dedup
    val d = Tables.load(spark, sf(), "documents")
    val pairs = Dedup.ngramJaccardPairs(d, "doc_id", "text",
      n = 3, threshold = 0.8)
    val split = Dedup.connectedComponents(pairs, "id_a", "id_b")
      .select(col("id").as("doc_id"), col("comp"))
      .join(d.select("doc_id"), Seq("doc_id"), "right")
      .withColumn("cluster_id", coalesce(col("comp"), col("doc_id")))
      .withColumn("split", Curation.splitLabel(col("cluster_id")))
    // The defining property: every near-duplicate PAIR lands on the same
    // side — the q41 per-doc split provably violates this on the fixture
    // (otherwise this test asserts nothing).
    val sides = split.select("doc_id", "split")
    val straddling = pairs
      .join(sides.withColumnRenamed("doc_id", "id_a")
        .withColumnRenamed("split", "sa"), "id_a")
      .join(sides.withColumnRenamed("doc_id", "id_b")
        .withColumnRenamed("split", "sb"), "id_b")
      .where(col("sa") =!= col("sb")).count()
    assert(straddling == 0)
    val naive = pairs
      .withColumn("sa", Curation.splitLabel(col("id_a")))
      .withColumn("sb", Curation.splitLabel(col("id_b")))
      .where(col("sa") =!= col("sb")).count()
    info(s"naive per-doc split straddles $naive near-dup pairs; " +
      "cluster split straddles 0")
    assert(naive > 0, "fixture has no straddling pairs; test is vacuous")
  }
}
