package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Linear quality classifier — the CCNet/fastText pattern (Wenzek et al.
  * 2020; Joulin et al. 2017): distill an expensive quality gate into a
  * cheap-surface-feature logistic model, then score the whole corpus with
  * the frozen weights. At 100 TB the expensive gate (LM perplexity, full
  * quality pipeline) runs on a sample; the distilled linear model runs on
  * everything as ONE codegen projection — no shuffle, no join, no state.
  *
  * Two trainers, the [[IvfIndex]] discipline:
  *   - [[trainSample]]: full-batch gradient descent over a bounded
  *     hash-ordered driver sample, accumulated in a FIXED order — bit
  *     deterministic for a given (data, seed), so engine queries and
  *     their Verify-time oracle twins share exact weights.
  *   - [[trainDistributed]]: the scale path past the driver-sample
  *     ceiling — each GD iteration is one map-side-combinable aggregate
  *     over the full corpus (d+1 partial sums reach the driver). Float
  *     partial-sum order varies with partitioning, so it is
  *     bit-deterministic only for a fixed layout; the spec pins QUALITY
  *     (agreement with the sampled twin), not bytes — same caveat as
  *     `IvfIndex.trainDistributed`.
  *
  * Features are fixed surface statistics (each a pure codegen Column and
  * a driver twin that replays the identical double arithmetic):
  * log-length, token count, mean token length, stopword ratio,
  * distinct-token ratio. Scaled by constants, not data moments, so
  * inference needs no statistics pass.
  */
object QualityClassifier {

  /** weights.length == dim + 1; last entry is the bias. */
  final case class Model(weights: Array[Double]) {
    require(weights.length == dim + 1,
      s"expected ${dim + 1} weights, got ${weights.length}")
  }

  val dim = 5

  /** The feature projection. Must stay in lock-step with [[featuresOf]]:
    * same counts, same cast points, same operation order. */
  def featureCols(text: Column): Seq[Column] = {
    val toks = split(text, " ")
    val nChars = length(text)
    val nToks = size(toks)
    Seq(
      log(lit(1.0) + nChars.cast("double")) / lit(10.0),
      nToks.cast("double") / lit(100.0),
      ((nChars - nToks + 1).cast("double") / nToks.cast("double")) / lit(10.0),
      size(filter(toks,
        t => t.isin(graft.functions.TextAnalysis.stopwords: _*)))
        .cast("double") / nToks.cast("double"),
      size(array_distinct(toks)).cast("double") / nToks.cast("double"))
  }

  /** Driver twin of [[featureCols]], replaying Spark's semantics exactly:
    * `length` counts codepoints, `split` keeps trailing empty tokens
    * (limit -1), and every division happens at the same double. */
  def featuresOf(text: String): Array[Double] = {
    val toks = text.split(" ", -1)
    val nChars = text.codePointCount(0, text.length)
    val nToks = toks.length
    Array(
      math.log(1.0 + nChars.toDouble) / 10.0,
      nToks.toDouble / 100.0,
      ((nChars - nToks + 1).toDouble / nToks.toDouble) / 10.0,
      toks.count(graft.functions.TextAnalysis.stopwords.contains(_))
        .toDouble / nToks.toDouble,
      toks.distinct.length.toDouble / nToks.toDouble)
  }

  private def sigmoid(z: Double): Double = 1.0 / (1.0 + math.exp(-z))

  /** Full-batch GD over (features, label) rows in the given order. */
  private def descend(xs: Array[Array[Double]], ys: Array[Int],
                      iters: Int, lr: Double): Model = {
    val n = xs.length
    require(n > 0, "classifier train: empty sample")
    val w = new Array[Double](dim + 1)
    var it = 0
    while (it < iters) {
      val g = new Array[Double](dim + 1)
      var i = 0
      while (i < n) {
        val x = xs(i)
        var z = w(dim); var d = 0
        while (d < dim) { z += w(d) * x(d); d += 1 }
        val err = sigmoid(z) - ys(i)
        d = 0
        while (d < dim) { g(d) += err * x(d); d += 1 }
        g(dim) += err
        i += 1
      }
      var d = 0
      while (d <= dim) { w(d) -= lr * g(d) / n; d += 1 }
      it += 1
    }
    Model(w)
  }

  /** Deterministic sampled trainer: hash-ordered bounded collect (the
    * engine's standard sampling coin), GD accumulated in that fixed
    * order. `label` is any boolean Column over `df`'s rows — typically
    * the expensive gate being distilled. */
  def trainSample(df: DataFrame, idCol: String, textCol: String,
                  label: Column, iters: Int = 3000, lr: Double = 5.0,
                  sampleN: Int = 4096, seed: Long = 42L): Model = {
    val rows = df
      .select(col(idCol).as("__id"),
        array(featureCols(col(textCol)): _*).as("__x"),
        label.cast("int").as("__y"))
      .orderBy(abs(hash(col("__id"), lit(seed))), col("__id"))
      .limit(sampleN)
      .collect()
    descend(rows.map(_.getSeq[Double](1).toArray), rows.map(_.getInt(2)),
      iters, lr)
  }

  /** Distributed trainer: one aggregate per GD iteration. The gradient
    * Σ (σ(w·x) − y)·[x, 1] is a sum of per-row terms, so each iteration
    * is a single codegen projection (literal weights) + one hash
    * aggregate with map-side partial sums — d+2 doubles cross the wire
    * per partition, nothing corpus-sized ever reaches the driver. */
  def trainDistributed(spark: SparkSession, df: DataFrame, idCol: String,
                       textCol: String, label: Column, iters: Int = 30,
                       lr: Double = 5.0): Model = {
    val base = df.select(
      array(featureCols(col(textCol)): _*).as("__x"),
      label.cast("int").cast("double").as("__y"))
    var w = new Array[Double](dim + 1)
    var it = 0
    while (it < iters) {
      val z = (0 until dim).map(d =>
        element_at(col("__x"), d + 1) * lit(w(d))).reduce(_ + _) + lit(w(dim))
      val err = (lit(1.0) / (lit(1.0) + exp(-z))) - col("__y")
      val aggCols =
        count(lit(1)).cast("double").as("n") +:
          sum(err).as(s"g$dim") +:
          (0 until dim).map(d =>
            sum(err * element_at(col("__x"), d + 1)).as(s"g$d"))
      val sums = base.agg(aggCols.head, aggCols.tail: _*).head()
      val n = sums.getDouble(0)
      val next = w.clone()
      next(dim) -= lr * sums.getDouble(1) / n
      var d = 0
      while (d < dim) { next(d) -= lr * sums.getDouble(2 + d) / n; d += 1 }
      w = next
      it += 1
    }
    Model(w)
  }

  /** Score every row with the frozen model: sigmoid(w·x + b) as one
    * literal-weights codegen projection, rounded once at the edge. */
  def score(df: DataFrame, textCol: String, model: Model,
            outCol: String = "score", roundTo: Int = 6): DataFrame = {
    val fs = featureCols(col(textCol))
    val z = fs.zipWithIndex
      .map { case (f, d) => f * lit(model.weights(d)) }
      .reduce(_ + _) + lit(model.weights(dim))
    df.withColumn(outCol, round(lit(1.0) / (lit(1.0) + exp(-z)), roundTo))
  }

  /** Driver twin of [[score]]'s arithmetic — the SAME left-fold dot with
    * the bias added LAST (the Column `reduce(_ + _) + bias` order), the
    * same sigmoid, and Spark's round (BigDecimal.valueOf = decimal text
    * repr, HALF_UP) — for Verify-time oracle generation. */
  def scoreOf(x: Array[Double], model: Model, roundTo: Int = 6): Double = {
    var z = 0.0; var d = 0
    while (d < dim) { z += x(d) * model.weights(d); d += 1 }
    z += model.weights(dim)
    java.math.BigDecimal.valueOf(sigmoid(z))
      .setScale(roundTo, java.math.RoundingMode.HALF_UP).doubleValue()
  }
}
