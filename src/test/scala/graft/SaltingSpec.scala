package graft

import org.apache.spark.sql.functions._

import graft.operators.Salting

/** Salting correctness: salted results must equal unsalted results. */
class SaltingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val skewed = {
    // 10k rows of one hot key + a long tail.
    val hot = Seq.fill(10000)(("hot", 1.0))
    val tail = (1 to 100).map(i => (s"k$i", i.toDouble))
    (hot ++ tail).toDF("k", "v")
  }

  test("saltedAgg(sum,count) == plain groupBy") {
    val plain = skewed.groupBy("k")
      .agg(sum($"v").as("s"), count(lit(1)).as("n"))
      .orderBy("k").as[(String, Double, Long)].collect().toSeq
    val salted = Salting.saltedAgg(skewed, Seq("k"), buckets = 8,
        partial = Seq(sum($"v").as("ps"), count(lit(1)).as("pn")),
        fin = Seq(sum($"ps").as("s"), sum($"pn").as("n")))
      .orderBy("k").as[(String, Double, Long)].collect().toSeq
    assert(salted == plain)
  }

  test("saltedJoin == plain join") {
    val right = Seq(("hot", "H"), ("k1", "A"), ("k2", "B")).toDF("k", "label")
    val plain = skewed.join(right, "k").groupBy("k", "label").count()
      .orderBy("k").as[(String, String, Long)].collect().toSeq
    val salted = Salting.saltedJoin(skewed, right, "k", buckets = 4)
      .groupBy("k", "label").count()
      .orderBy("k").as[(String, String, Long)].collect().toSeq
    assert(salted == plain)
  }
}
