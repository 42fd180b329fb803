package graft

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.expressions.VectorExpressions
import graft.operators.Similarity

/** Vector expression semantics + similarity operator behavior, including
  * measured LSH recall against the exact baseline on the real corpus.
  */
class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private lazy val vecs = Seq(
    (1L, Array(1.0f, 0.0f, 0.0f)),
    (2L, Array(0.0f, 1.0f, 0.0f)),
    (3L, Array(1.0f, 1.0f, 0.0f)),
    (4L, Array(2.0f, 0.0f, 0.0f)),  // colinear with 1
    (5L, Array(0.0f, 0.0f, 0.0f))   // zero vector
  ).toDF("vec_id", "embedding")

  test("cosine_sim: orthogonal=0, colinear=1, 45deg, zero-norm→null") {
    VectorExpressions.register(spark)
    def cosOf(a: Long, b: Long): Option[Double] = {
      val l = vecs.where($"vec_id" === a).select($"embedding".as("x"))
      val r = vecs.where($"vec_id" === b).select($"embedding".as("y"))
      val row = l.crossJoin(r).select(expr("cosine_sim(x, y)").as("c")).collect()(0)
      if (row.isNullAt(0)) None else Some(row.getDouble(0))
    }
    assert(cosOf(1, 2).contains(0.0))
    assert(cosOf(1, 4).contains(1.0))
    assert(math.abs(cosOf(1, 3).get - math.sqrt(0.5)) < 1e-12)
    assert(cosOf(1, 5).isEmpty) // zero norm → null, never divide-by-zero
  }

  test("dot_product matches hand math incl. float→double widening") {
    VectorExpressions.register(spark)
    val d = vecs.where($"vec_id" === 3).select($"embedding".as("x"))
      .crossJoin(vecs.where($"vec_id" === 4).select($"embedding".as("y")))
      .select(expr("dot_product(x, y)").as("d")).as[Double].collect()(0)
    assert(d == 2.0)
  }

  test("expression survives codegen (no fallback errors) on real data") {
    val e = Tables.load(spark, sf(), "embeddings")
    val out = Similarity.topKNeighbors(spark, e, "vec_id", "embedding", 0L, 5)
      .collect()
    assert(out.length == 5)
    assert(out.head.getLong(0) == 0L) // self-similarity 1.0 ranks first
    assert(out.head.getDouble(1) == 1.0)
  }

  test("exact near-dup pairs are symmetric-free and thresholded") {
    val e = Tables.load(spark, sf(), "embeddings")
    val pairs = Similarity.cosineNearDupPairs(spark, e, "vec_id", "embedding", 0.42)
      .collect()
    assert(pairs.nonEmpty)
    pairs.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      assert(r.getDouble(2) >= 0.42)
    }
  }

  test("LSH near-dup recall vs exact at 16 planes / r=2 (q27 params)") {
    val e = Tables.load(spark, sf(), "embeddings")
    val exact = Similarity.cosineNearDupPairs(spark, e, "vec_id", "embedding", 0.42)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val lsh = Similarity.lshNearDupPairs(spark, e, "vec_id", "embedding",
        0.42, dim = 64, numPlanes = 16, rowsPerBand = 2)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // Candidates pass a sound quantized prefilter then exact verification
    // → no false positives ever.
    assert(lsh.subsetOf(exact))
    // Recall: at cos=0.42, P(band hit)=(1-acos(.42)/pi)^2≈0.40,
    // P(miss)=(1-.40)^8≈1.5e-2 per pair (expected misses ~0.5 of ~34
    // pairs). Assert ≥90% (allows 3 misses) so the suite can't flake:
    // P(≥4 misses) ≈ 2e-4 by Poisson(0.5).
    assert(lsh.size >= exact.size * 9 / 10,
      s"LSH missed ${(exact -- lsh).size} of ${exact.size}")
  }

  test("block-grid join (q40) == exact all-pairs, any block count") {
    // q40's claim: the grid enumerates every unordered pair exactly once
    // (off-diagonal cells meet each cross-block pair in one cell; the
    // diagonal dedups by id order), so its output EQUALS the exact
    // O(n^2) baseline by construction — while the plan stays equi-keyed
    // (PlanGuardSpec). blocks=1 degenerates to one diagonal cell; 7
    // exercises uneven hash-block sizes; 16 is the q40 setting.
    val e = Tables.load(spark, sf(), "embeddings")
    val exact = Similarity.cosineNearDupPairs(spark, e, "vec_id", "embedding", 0.42)
      .select("id_a", "id_b", "cosine").as[(Long, Long, Double)].collect().toSet
    for (blocks <- Seq(1, 7, 16)) {
      val blocked = Similarity.blockedNearDupPairs(spark, e, "vec_id",
          "embedding", 0.42, blocks = blocks)
        .select("id_a", "id_b", "cosine").as[(Long, Long, Double)].collect().toSet
      assert(blocked == exact, s"blocks=$blocks: missed " +
        s"${(exact -- blocked).size}, extra ${(blocked -- exact).size}")
    }
  }

  test("knnGraph == brute-force window, any block count") {
    // Same grid claim as q40, for the top-k form: every unordered pair
    // scored once, two-level top-k loses nothing (the cell-local prune
    // keeps k per (cell, src); a src's global top-k all survive it
    // because each lives in SOME cell where it ranks <= k for that src).
    import org.apache.spark.sql.expressions.Window
    val e = Tables.load(spark, sf(), "embeddings").limit(200)
    VectorExpressions.register(spark)
    val a = e.select($"vec_id".as("src"), $"embedding".as("va"))
    val b = e.select($"vec_id".as("dst"), $"embedding".as("vb"))
    val w = Window.partitionBy($"src").orderBy($"cosine".desc, $"dst")
    val naive = a.join(b, $"src" =!= $"dst")
      .select($"src", $"dst",
        round(expr("cosine_sim(va, vb)"), 6).as("cosine"))
      .withColumn("rk", row_number().over(w).cast("int"))
      .where($"rk" <= 4)
      .as[(Long, Long, Double, Int)].collect().toSet
    for (blocks <- Seq(1, 5, 8)) {
      val got = Similarity.knnGraph(spark, e, "vec_id", "embedding",
          k = 4, blocks = blocks)
        .as[(Long, Long, Double, Int)].collect().toSet
      assert(got == naive, s"blocks=$blocks: missed " +
        s"${(naive -- got).size}, extra ${(got -- naive).size}")
    }
  }
}
