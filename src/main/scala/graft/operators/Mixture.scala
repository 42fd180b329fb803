package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Curation

/** Training-mixture materialization with FRACTIONAL epochs — the
  * data-mixture table every large pretraining run publishes (GPT-3's
  * "epochs elapsed when training" column, Brown et al. 2020 Table 2.2:
  * Wikipedia 3.4 epochs, Common Crawl 0.44): a source weighted w
  * contributes floor(w) full copies of itself plus a w−floor(w)
  * fraction of its documents one more time.
  *
  * The fractional copy is selected by the engine's deterministic md5
  * coin, NOT a random sample: the same documents appear in the extra
  * epoch on every run, engine, partitioning, and cluster size — so a
  * resumed or re-sharded training job sees the identical mixture (the
  * q41/q62/q78 reproducibility discipline).
  *
  * Scale shape: weights are a tiny broadcast dim; copy counts are one
  * map-only projection; the copies themselves are `explode(sequence)` —
  * no shuffle anywhere. Feeding [[TrainingOrder.epochOrder]] downstream
  * gives each epoch its own deterministic shuffle order.
  */
object Mixture {

  /** Materialize (id, source, epoch) rows: epoch ∈ [1, copies(doc)],
    * where copies = floor(w(source)) + (coin(id) < frac(w) ? 1 : 0).
    * Documents of weight-0 sources (and fractional losers of w < 1
    * sources) drop out entirely — weight 0.44 IS a 44% subsample. */
  def materializeEpochs(docs: DataFrame, idCol: String, sourceCol: String,
                        weights: Seq[(String, Double)]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val wt = weights.toDF(sourceCol, "__w")
    docs.join(broadcast(wt), sourceCol)
      .withColumn("__copies",
        (floor(col("__w")) +
          when(Curation.hashUniform(col(idCol)) < col("__w") - floor(col("__w")),
            1).otherwise(0)).cast("int"))
      .where(col("__copies") > 0)
      .select(col(idCol), col(sourceCol),
        explode(sequence(lit(1), col("__copies"))).as("epoch"))
  }
}
