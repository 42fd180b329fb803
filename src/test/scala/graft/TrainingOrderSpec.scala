package graft

import org.apache.spark.sql.functions._

import graft.operators.TrainingOrder

/** Epoch-order semantics: partitioning invariance (the training order can
  * never depend on how the input happened to be laid out), epoch
  * independence, and the per-shard position/offset contract.
  */
class TrainingOrderSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq.tabulate(200) { i =>
    (i.toLong, Seq.fill(1 + i % 7)("w").mkString(" "))
  }.toDF("doc_id", "text")

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.select("doc_id", "shard", "pos", "n_tokens", "token_offset")
      .as[(Long, Int, Int, Int, Long)].collect().sortBy(r => (r._2, r._3))

  test("order is invariant to input partitioning") {
    val a = rows(TrainingOrder.epochOrder(corpus, "doc_id", "text", 0, 4))
    val b = rows(TrainingOrder.epochOrder(corpus.repartition(13), "doc_id",
      "text", 0, 4))
    assert(a.sameElements(b))
  }

  test("different epochs give different permutations, same doc set") {
    val e0 = rows(TrainingOrder.epochOrder(corpus, "doc_id", "text", 0, 4))
    val e1 = rows(TrainingOrder.epochOrder(corpus, "doc_id", "text", 1, 4))
    assert(e0.map(_._1).toSet == e1.map(_._1).toSet)
    assert(!e0.map(_._1).sameElements(e1.map(_._1)))
  }

  test("per-shard contract: dense 0-based pos, offset = prefix token sum") {
    val out = rows(TrainingOrder.epochOrder(corpus, "doc_id", "text", 3, 4))
    assert(out.map(_._2).forall(s => s >= 0 && s < 4))
    out.groupBy(_._2).foreach { case (_, shard) =>
      assert(shard.map(_._3).toSeq == shard.indices)
      var cum = 0L
      shard.foreach { r =>
        assert(r._5 == cum)
        cum += r._4
      }
    }
    // tokens conserved: 28 full cycles of 1..7 plus the i%7=0..3 tail
    assert(out.map(_._4).sum == 28 * (1 to 7).sum + (1 to 4).sum)
  }
}
