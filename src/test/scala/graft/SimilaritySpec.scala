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

  test("dense banding (q40 params: 48 planes / r=2) == exact all-pairs") {
    // q40's claim: at 24 bands the banded candidate generation is
    // effectively exhaustive for >=0.42 pairs (miss prob 0.593^24 ≈
    // 3.5e-6 per pair) — its output must EQUAL the exact O(n^2) baseline
    // on this corpus, while the plan stays equi-keyed (PlanGuardSpec).
    val e = Tables.load(spark, sf(), "embeddings")
    val exact = Similarity.cosineNearDupPairs(spark, e, "vec_id", "embedding", 0.42)
      .select("id_a", "id_b", "cosine").as[(Long, Long, Double)].collect().toSet
    val banded = Similarity.lshNearDupPairs(spark, e, "vec_id", "embedding",
        0.42, dim = 64, numPlanes = 48, rowsPerBand = 2)
      .select("id_a", "id_b", "cosine").as[(Long, Long, Double)].collect().toSet
    assert(banded == exact,
      s"banded missed ${(exact -- banded).size}, extra ${(banded -- exact).size}")
  }
}
