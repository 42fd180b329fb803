package graft

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.functions.TextAnalysis
import graft.operators.QualityClassifier

/** Classifier-distillation contract: the sampled trainer actually learns
  * the gate it distills, the distributed trainer agrees with the sampled
  * twin (quality, not bytes — float partial-sum order varies with layout,
  * the IvfIndex.trainDistributed caveat), and the driver scoring twin is
  * bit-identical to the distributed codegen projection.
  */
class QualityClassifierSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Tables.load(spark, sf(), "documents")
  private def label = TextAnalysis.qualityScore(col("text")) >= 0.78

  test("sampled trainer learns the distilled gate") {
    val m = QualityClassifier.trainSample(docs, "doc_id", "text", label)
    val scored = QualityClassifier.score(docs, "text", m)
      .select(label.cast("int").as("y"),
        (col("score") >= 0.5).cast("int").as("p"))
    val n = scored.count().toDouble
    val acc = scored.where($"y" === $"p").count() / n
    val base = math.max(scored.where($"y" === 1).count() / n,
      scored.where($"y" === 0).count() / n)
    info(f"accuracy=$acc%.3f majority-class baseline=$base%.3f")
    // Must beat always-predict-majority — i.e. it learned something real
    // about the gate from the cheap features, not just the prior.
    assert(acc > base + 0.05)
    assert(acc > 0.8)
  }

  test("distributed trainer == sampled twin up to float-sum noise") {
    // The fixture corpus (500 docs) fits inside trainSample's 4096-row
    // sample, so both trainers see the SAME rows and compute the SAME
    // mathematical full-batch gradient each iteration — only the
    // floating-point accumulation order differs (fixed driver order vs
    // partition-parallel partial sums). Weights must therefore agree to
    // float noise, which is the strongest mechanism check available
    // without demanding bit equality across layouts.
    val iters = 30
    val ms = QualityClassifier.trainSample(docs, "doc_id", "text", label,
      iters = iters)
    val md = QualityClassifier.trainDistributed(spark, docs, "doc_id",
      "text", label, iters = iters)
    val maxDelta = ms.weights.zip(md.weights)
      .map { case (a, b) => math.abs(a - b) }.max
    info(f"max |w_sample - w_distributed| = $maxDelta%.2e after $iters iters")
    assert(maxDelta < 1e-8)
  }

  test("driver scoring twin is bit-identical to the codegen projection") {
    val m = QualityClassifier.trainSample(docs, "doc_id", "text", label)
    val rows = QualityClassifier.score(docs, "text", m)
      .select(col("doc_id"),
        array(QualityClassifier.featureCols(col("text")): _*).as("x"),
        col("score"))
      .collect()
    rows.foreach { r =>
      val twin = QualityClassifier.scoreOf(r.getSeq[Double](1).toArray, m)
      assert(twin == r.getDouble(2),
        s"doc ${r.getLong(0)}: twin $twin != engine ${r.getDouble(2)}")
    }
  }
}
