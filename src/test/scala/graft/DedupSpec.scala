package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Dedup operator semantics on constructed corpora where ground truth is
  * known by hand: shingling edges, exact groups, jaccard values, LSH recall
  * on high-similarity pairs, simhash robustness to small edits.
  */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy cat"), // 1-word change
    (3L, "completely different text with other words entirely present"),
    (4L, "the quick brown fox jumps over the lazy dog"), // exact dup of 1
    (5L, "tiny")                                          // < 3 tokens
  ).toDF("doc_id", "text")

  test("shingles: n-gram count, distinctness, short-doc empty") {
    val sh = Dedup.shingles(corpus, "doc_id", "text", 3)
    val counts = sh.groupBy("doc_id").count().orderBy("doc_id")
      .as[(Long, Long)].collect().toMap
    assert(counts(1L) == 7) // 9 words → 7 trigrams
    assert(!counts.contains(5L)) // too short → no shingles
    val one = sh.where($"doc_id" === 1).select("shingle").as[String].collect()
    assert(one.contains("the quick brown") && one.contains("the lazy dog"))
  }

  test("exactGroups: identical docs grouped, min id kept") {
    val g = Dedup.exactGroups(corpus, "doc_id", "text")
    val m = g.select("keep_id", "dup_count").as[(Long, Long)].collect().toMap
    assert(m(1L) == 2) // docs 1+4
    assert(m(2L) == 1 && m(3L) == 1 && m(5L) == 1)
  }

  test("ngramJaccardPairs: hand-computed jaccard for 1-word edit") {
    // docs 1,2: 7 trigrams each; only the final trigram differs ("the lazy
    // dog" vs "the lazy cat") → 6 shared / 8 union = 0.75.
    val pairs = Dedup.ngramJaccardPairs(corpus, "doc_id", "text", 3, 0.5)
      .orderBy("id_a", "id_b")
      .select("id_a", "id_b", "jaccard").as[(Long, Long, Double)].collect()
    assert(pairs.exists { case (a, b, j) => a == 1 && b == 2 && j == 0.75 })
    assert(pairs.exists { case (a, b, j) => a == 1 && b == 4 && j == 1.0 })
    assert(pairs.exists { case (a, b, j) => a == 2 && b == 4 && j == 0.75 })
    assert(pairs.length == 3) // doc 3 pairs with nothing
  }

  test("minhashLshPairs: no false positives; finds the exact-dup pair") {
    val exact = Dedup.ngramJaccardPairs(corpus, "doc_id", "text", 3, 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val lsh = Dedup.minhashLshPairs(corpus, "doc_id", "text", 3,
        numHashes = 32, rowsPerBand = 2, threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(lsh.subsetOf(exact))
    // identical docs share every minhash → (1,4) is caught with prob 1;
    // the j=0.75 pairs each miss with prob (1-0.5625)^16 ≈ 2e-6 — assert
    // ≥2 of 3 so a once-in-a-million miss can't flake the suite.
    assert(lsh.contains((1L, 4L)))
    assert(lsh.size >= 2, s"LSH found only $lsh of $exact")
  }

  test("minhash signatures: identical docs → identical signatures") {
    val sigs = Dedup.minhashSignatures(corpus, "doc_id", "text")
      .where($"doc_id".isin(1, 4))
      .select("sig").as[Seq[Long]].collect()
    assert(sigs(0) == sigs(1))
  }

  test("simhash: exact dup → distance 0; near dup → small; distinct → large") {
    val h = Dedup.simhash64(corpus, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    assert(h(1L) == h(4L))
    val near = java.lang.Long.bitCount(h(1L) ^ h(2L))
    val far = java.lang.Long.bitCount(h(1L) ^ h(3L))
    assert(near < far)
    val pairs = Dedup.simhashPairs(corpus, "doc_id", "text", maxHamming = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 4L)))
    assert(!pairs.contains((1L, 3L)))
  }

  test("connectedComponents: min-label fixpoint over chains and islands") {
    // components: {1,2,3,4} (a 3-hop chain — needs >1 propagation round),
    // {10,11}, and a self-contained triangle {20,21,22}
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L),
      (20L, 21L), (21L, 22L), (20L, 22L)).toDF("id_a", "id_b")
    val comps = Dedup.connectedComponents(pairs, "id_a", "id_b")
      .as[(Long, Long)].collect().toMap
    assert(comps == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L, 22L -> 20L))
  }

  test("connectedComponents: maxIters guard throws instead of wrong output") {
    val chain = (1L until 12L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    intercept[IllegalArgumentException] { // force the distributed path
      Dedup.connectedComponents(chain, "id_a", "id_b", maxIters = 2,
        driverEdgeLimit = 0L)
    }
    // and with room it converges to one component rooted at 1
    val ok = Dedup.connectedComponents(chain, "id_a", "id_b")
      .as[(Long, Long)].collect()
    assert(ok.forall(_._2 == 1L) && ok.length == 12)
  }

  test("connectedComponents: driver union-find == distributed propagation") {
    // deterministic pseudo-random graph: chains, triangles, islands
    val pairs = (0L until 300L).flatMap { i =>
      val base = i * 7 % 97
      Seq((base, base + (i % 3) + 1), (i % 89, (i * 13) % 89 + 1))
    }.toDF("id_a", "id_b")
    val viaDriver = Dedup.connectedComponents(pairs, "id_a", "id_b")
      .as[(Long, Long)].collect().toSet
    val viaLoop = Dedup.connectedComponents(pairs, "id_a", "id_b",
        driverEdgeLimit = 0L)
      .as[(Long, Long)].collect().toSet
    assert(viaDriver == viaLoop)
    assert(viaDriver.nonEmpty)
  }

  test("crossNgramOverlap: shared-shingle counting against a benchmark set") {
    val train = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"), // = bench 100
      (2L, "the quick brown fox naps all day long"),       // shares 2 shingles
      (3L, "completely different words here entirely")     // shares none
    ).toDF("doc_id", "text")
    val bench = Seq(
      (100L, "the quick brown fox jumps over the lazy dog")
    ).toDF("doc_id", "text")
    val flagged = graft.operators.Dedup
      .crossNgramOverlap(train, bench, "doc_id", "text", n = 3, minShared = 2L)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    // doc 1 is the benchmark verbatim: all 7 of its 3-gram shingles match;
    // doc 2 shares exactly ("the quick brown", "quick brown fox");
    // doc 3 is clean and absent.
    assert(flagged.toSeq == Seq((1L, 100L, 7L), (2L, 100L, 2L)))
    // raising the bar to 3 clears doc 2
    val strict = graft.operators.Dedup
      .crossNgramOverlap(train, bench, "doc_id", "text", n = 3, minShared = 3L)
      .as[(Long, Long, Long)].collect()
    assert(strict.toSeq == Seq((1L, 100L, 7L)))
  }

  test("crossNgramOverlapBloom == crossNgramOverlap on real docs; prefilter bites") {
    // Parity on the real sf0.001 documents table with the q54/q71 split —
    // the Bloom path must be output-identical (no false negatives exist in
    // a Bloom filter; the verify join drops the false positives).
    val d = graft.core.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val train = d.where($"doc_id" % 50 =!= 0)
    val bench = d.where($"doc_id" % 50 === 0)
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, Long, Long)].collect().sorted.toSeq
    val exact = norm(Dedup.crossNgramOverlap(
      train, bench, "doc_id", "text", n = 3, minShared = 2L))
    val bloom = norm(Dedup.crossNgramOverlapBloom(
      train, bench, "doc_id", "text", n = 3, minShared = 2L))
    assert(exact.nonEmpty, "fixture produced no overlap pairs — test is vacuous")
    assert(bloom == exact)
    // The prefilter itself earns its keep: the surviving fraction of the
    // training shingle scan stays near truth + fpp, not near 1.
    val st = Dedup.shingles(train, "doc_id", "text", 3)
    val sb = Dedup.shingles(bench, "doc_id", "text", 3)
      .select($"shingle").distinct()
    val expected = math.max(sb.count(), 1L)
    val bf = sb.stat.bloomFilter(col("shingle"), expected, 0.01)
    val bytes = { val b = new java.io.ByteArrayOutputStream(); bf.writeTo(b); b.toByteArray }
    graft.expressions.BloomExpressions.register(spark)
    val total = st.count()
    val kept = st.where(call_function(
      "bloom_might_contain", lit(bytes), $"shingle")).count()
    val trueHits = st.join(sb, "shingle").count()
    info(f"bloom prefilter: $kept/$total kept (true hits $trueHits, fpp=0.01)")
    assert(kept >= trueHits, "bloom filter dropped a true member (false negative)")
    assert(kept <= trueHits + (0.05 * total).toLong + 10,
      s"prefilter too loose: kept $kept of $total with only $trueHits true hits")
  }

  test("distributed propagation matches driver path on the REAL sf0.1 pair graph") {
    // q49's actual input at Verify scale: at sf0.1 the near-dup pair set
    // is far below driverEdgeLimit, so CORRECTNESS exercises only the
    // union-find. This pins the min-label loop — the path that runs at
    // 100 TB — to the same fixpoint on real (not synthetic-fixture) data.
    val docs = spark.read.parquet(sf("sf0.1") + "/documents.parquet")
      .select("doc_id", "text")
    val pairs = graft.operators.Dedup.ngramJaccardPairs(
      docs, "doc_id", "text", n = 3, threshold = 0.8)
      .select("id_a", "id_b").cache()
    assert(pairs.count() > 0)
    val viaDriver = graft.operators.Dedup
      .connectedComponents(pairs, "id_a", "id_b")
      .as[(Long, Long)].collect().toSet
    val viaLoop = graft.operators.Dedup
      .connectedComponents(pairs, "id_a", "id_b", driverEdgeLimit = 0L)
      .as[(Long, Long)].collect().toSet
    pairs.unpersist()
    assert(viaDriver == viaLoop)
  }

  test("prefix-filtered ngramJaccardPairs == exhaustive self-join, " +
      "on real docs, across thresholds and the hot-shingle cap") {
    // The PPJoin-style candidate pruning must be invisible in the output:
    // identical (id_a, id_b, jaccard) sets against the pre-prefix-filter
    // formulation, on real corpus data (not just the hand corpus), at a
    // loose threshold (many surviving pairs), the declared 0.8, and with
    // maxShingleDf capping hot shingles out of the index.
    val docs = graft.core.Tables.load(spark, sf(), "documents")
      .select("doc_id", "text")
    def pairsOf(df: org.apache.spark.sql.DataFrame) =
      df.select("id_a", "id_b", "jaccard")
        .as[(Long, Long, Double)].collect().toSet
    for ((t, cap) <- Seq((0.3, None), (0.8, None), (0.5, Some(40)))) {
      val fast = pairsOf(Dedup.ngramJaccardPairs(
        docs, "doc_id", "text", 3, t, cap))
      val slow = pairsOf(Dedup.ngramJaccardPairsExhaustive(
        docs, "doc_id", "text", 3, t, cap))
      assert(fast == slow,
        s"t=$t cap=$cap: prefix-filtered ${fast.size} pairs != " +
          s"exhaustive ${slow.size}; missing=${(slow -- fast).take(5)} " +
          s"extra=${(fast -- slow).take(5)}")
      assert(slow.nonEmpty || t == 0.8, s"t=$t produced no pairs to compare")
    }
    // And on the hand corpus with an exact dup + sub-threshold pair.
    assert(pairsOf(Dedup.ngramJaccardPairs(corpus, "doc_id", "text", 3, 0.5))
      == pairsOf(Dedup.ngramJaccardPairsExhaustive(
        corpus, "doc_id", "text", 3, 0.5)))
  }

  test("fused minhash_sigs kernel == the Column-op pipeline, bit for bit") {
    // Reconstruct the former explode + min-agg signature pipeline inline
    // and pin that the fused per-row kernel produces identical arrays.
    import org.apache.spark.sql.types.LongType
    val docs = graft.core.Tables.load(spark, sf(), "documents")
      .select("doc_id", "text")
    val numHashes = 32; val seed = 42L
    val cs = graft.expressions.MinHashSigsExpr.coeffs(numHashes, seed)
    val sh = Dedup.shingles(docs, "doc_id", "text", 3)
      .withColumn("__x",
        conv(substring(md5(col("shingle")), 1, 7), 16, 10).cast(LongType))
    val mins = cs.toSeq.zipWithIndex.map { case ((a, b), i) =>
      min((col("__x") * a + b) % 2147483647L).as(s"__h$i")
    }
    val reference = sh.groupBy("doc_id").agg(mins.head, mins.tail: _*)
      .select(col("doc_id"),
        array((0 until numHashes).map(i => col(s"__h$i")): _*).as("sig"))
      .as[(Long, Seq[Long])].collect().toMap
    val fused = Dedup.minhashSignatures(docs, "doc_id", "text")
      .as[(Long, Seq[Long])].collect().toMap
    assert(fused == reference)
    assert(fused.nonEmpty)
  }

  test("minhashLshPairsAgainst: cross-corpus only, no self-pairs, " +
      "overlapping ids safe") {
    val existing = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "totally unrelated reference text goes right here today")
    ).toDF("doc_id", "text")
    val incoming = Seq(
      (1L, "the quick brown fox jumps over the lazy cat"), // dups ref 1
      (7L, "the quick brown fox jumps over the lazy dog"), // exact of ref 1
      (8L, "nothing like anything in the reference corpus at all")
    ).toDF("doc_id", "text")
    val got = Dedup.minhashLshPairsAgainst(existing, incoming,
        "doc_id", "text", threshold = 0.7)
      .as[(Long, Long, Double)].collect().map(r => (r._1, r._2)).toSet
    // id 1 appears on BOTH sides with different text: the pair must be
    // (new 1, ref 1), and the exact twin (new 7, ref 1) must be found;
    // no existing-existing or incoming-incoming pairs can appear.
    assert(got == Set((1L, 1L), (7L, 1L)))
  }

  test("removeDupSpans: first occurrence kept, later spans dropped") {
    val d = Seq(
      (1L, "a b c d e"),          // canonical "a b c d" at (1,0)
      (2L, "x a b c d y"),        // same span at (2,1) → tokens 1..4 drop
      (3L, "p q r s p q r s"),    // within-doc repeat: (3,4) drops
      (4L, "unique words only here now"), // nothing duplicated
      (5L, "w z")                 // < n tokens → no grams, unchanged
    ).toDF("doc_id", "text")
    val out = Dedup.removeDupSpans(d, "doc_id", "text", n = 4)
      .as[(Long, String, Int)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(1L) == (("a b c d e", 0)))
    assert(out(2L) == (("x y", 4)))
    assert(out(3L) == (("p q r s", 4)))
    assert(out(4L) == (("unique words only here now", 0)))
    assert(out(5L) == (("w z", 0)))
  }
}
