package graft

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.expressions.{QuantizeExpressions, VectorExpressions}
import graft.operators.Similarity

/** Int8 quantization semantics + the exactness guarantee of the quantized
  * near-dup prefilter (quantized path must be a pure optimization: same
  * output as the float path).
  */
class QuantizeSpec extends SparkSpec {
  import spark.implicits._

  test("quantize_int8: codes reconstruct within scale/2; zero vector → null cosine") {
    QuantizeExpressions.register(spark)
    val df = Seq(
      (1L, Array(0.5f, -1.0f, 0.25f, 0.0f)),
      (2L, Array(0.0f, 0.0f, 0.0f, 0.0f))
    ).toDF("id", "v")
    val q = df.select($"id", expr("quantize_int8(v)").as("q"))

    val r1 = q.where($"id" === 1L).select("q.scale", "q.codes").head
    val scale = r1.getDouble(0)
    val codes = r1.getAs[Array[Byte]](1)
    assert(scale == 1.0 / 127.0) // maxAbs = 1.0
    // round(v/scale): 0.5→64 (63.5 rounds half-up), -1.0→-127, 0.25→32, 0→0
    assert(codes.toSeq == Seq[Byte](64, -127, 32, 0))
    Seq(0.5, -1.0, 0.25, 0.0).zip(codes).foreach { case (v, c) =>
      assert(math.abs(c * scale - v) <= scale / 2 + 1e-12)
    }

    // zero vector: all-zero codes, quantized cosine against anything = null
    val zero = q.where($"id" === 2L).select("q.codes").head.getAs[Array[Byte]](0)
    assert(zero.forall(_ == 0))
    val c = q.as("a").crossJoin(q.as("b"))
      .where($"a.id" === 1L && $"b.id" === 2L)
      .select(expr("quantized_cosine(a.q, b.q)")).head
    assert(c.isNullAt(0))
  }

  test("quantized cosine error vs exact is small on the real corpus") {
    QuantizeExpressions.register(spark)
    VectorExpressions.register(spark)
    val e = Tables.load(spark, sf(), "embeddings").limit(50)
      .select($"vec_id", $"embedding")
    val a = e.select($"vec_id".as("id_a"), $"embedding".as("va"),
      expr("quantize_int8(embedding)").as("qa"))
    val b = e.select($"vec_id".as("id_b"), $"embedding".as("vb"),
      expr("quantize_int8(embedding)").as("qb"))
    val maxErr = a.join(b, $"id_a" < $"id_b")
      .select(abs(expr("quantized_cosine(qa, qb)") -
        expr("cosine_sim(va, vb)")).as("err"))
      .agg(max("err")).head.getDouble(0)
    // Worst-case bound for dim 64 is ~2*sqrt(64)/127 ≈ 0.126; measured is
    // far tighter. The 0.05 prefilter margin must dominate this.
    assert(maxErr < 0.02, s"quantized cosine max error $maxErr")
  }

  test("heavy-tailed vectors break the default margin; measured margin restores exactness") {
    QuantizeExpressions.register(spark)
    VectorExpressions.register(spark)
    // Heavy-tailed magnitudes: one dominant coordinate crushes every other
    // code toward 0 — the worst case for symmetric per-vector scaling.
    val rnd = new scala.util.Random(7)
    def vec(dim: Int, spike: Boolean): Seq[Float] = {
      val v = Seq.fill(dim)((rnd.nextDouble() * 2 - 1).toFloat)
      if (spike) v.updated(rnd.nextInt(dim), (v.head.sign * 50).toFloat) else v
    }
    val rows = (0 until 40).map { i =>
      (i.toLong, vec(if (i % 3 == 0) 8 else 64, spike = i % 2 == 0))
    }
    val df = rows.toDF("vec_id", "embedding")

    // 1. The documented hazard is real: error here exceeds the 0.05
    //    default margin (the corpus itself stays under 0.02 — previous
    //    test). This is WHY quantizedNearDupPairs states a precondition.
    val measured = Similarity.measuredQuantizationMargin(
      spark, df, "vec_id", "embedding")
    assert(measured > 0.05, s"expected adversarial error > default margin, got $measured")

    // 2. The measured-margin path restores exactness: prefilter at the
    //    measured error (+ tiny slack) == exact all-pairs output.
    val exact = Similarity.cosineNearDupPairs(spark, df, "vec_id",
      "embedding", threshold = 0.3).collect().toSet
    val quantized = Similarity.quantizedNearDupPairs(spark, df, "vec_id",
      "embedding", threshold = 0.3, margin = measured + 1e-9)
      .collect().toSet
    assert(quantized == exact)
  }

  test("quantized near-dup == exact near-dup (pairs AND cosines)") {
    val e = Tables.load(spark, sf(), "embeddings")
    val exact = Similarity.cosineNearDupPairs(spark, e, "vec_id", "embedding", 0.42)
      .orderBy("id_a", "id_b").collect().toSeq
    val quant = Similarity.quantizedNearDupPairs(spark, e, "vec_id", "embedding", 0.42)
      .orderBy("id_a", "id_b").collect().toSeq
    assert(exact.nonEmpty)
    assert(quant == exact)
  }
}
