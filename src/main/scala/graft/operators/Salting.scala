package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation utilities. AQE's skew-join splitting covers most cases
  * at runtime (enabled in GraftSession); salting is the explicit tool for
  * the cases AQE can't fix — skewed AGGREGATION keys, and broadcast-
  * ineligible skewed joins on known-hot keys.
  */
object Salting {

  /** Two-phase salted aggregation: aggregate on (key, salt) first, then on
    * key. Correct for decomposable aggregates (sum/count/min/max) — the
    * caller supplies the partial and final agg columns. E.g. for a count:
    * partial = count(1) as c, final = sum(c). A skewed key's rows split
    * across `buckets` reducers in phase 1, so no single task owns the key. */
  def saltedAgg(df: DataFrame, keys: Seq[String], buckets: Int,
                partial: Seq[Column], fin: Seq[Column]): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(buckets)))
    salted
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(partial.head, partial.tail: _*)
      .groupBy(keys.map(col): _*)
      .agg(fin.head, fin.tail: _*)
  }

  /** Salted join for a skewed LEFT side against a small-ish right side:
    * left keys get a random salt in [0, buckets); the right side is
    * replicated `buckets` times so every (key, salt) pair finds its match.
    * Use when the right side is too big to broadcast outright but its
    * replication factor is affordable. */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 buckets: Int): DataFrame = {
    val saltedLeft = left.withColumn("__salt",
      pmod(pmod(hash(col(key), monotonically_increasing_id()), lit(buckets))
        + lit(buckets), lit(buckets)))
    val replicatedRight = right.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    saltedLeft.join(replicatedRight, Seq(key, "__salt")).drop("__salt")
  }
}
