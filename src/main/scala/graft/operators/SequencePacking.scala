package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Concatenate-and-chunk sequence packing — the GPT-style pretraining
  * layout: the corpus is one long token stream in a deterministic total
  * order, cut into fixed `windowTokens` sequences; a document may
  * straddle a cut (its tail continues in the next sequence). This is the
  * complement of q44's greedy WHOLE-DOC packing (`CurationQueries`),
  * which never splits a doc and therefore under-fills windows; here
  * every sequence is exactly full except the last — the shape token
  *-budget accounting and dataloader sharding actually use.
  *
  * The primitive is a GLOBAL RUNNING SUM of per-doc token counts over a
  * total order, and the scale hazard is obvious: the naive
  * `sum().over(Window.orderBy(...))` collapses the corpus into ONE
  * partition. [[globalRunningSum]] is the distributed form, mirroring
  * [[graft.ingest.Chunker.globalRowNumber]]: range-partition on the
  * order key, partition-LOCAL prefix sums (an ordered scan inside each
  * sorted partition — the textbook justified mapPartitions, chosen over
  * a `Window.partitionBy(pid)` because that would hash-shuffle the
  * whole corpus a second time), then shift each partition by the
  * cumulative totals of its predecessors — a #partitions-row aggregate,
  * broadcast back. One range shuffle total, reused by AQE across the
  * data and offsets subtrees.
  */
object SequencePacking {

  /** Add exclusive/inclusive global running-sum bounds of `valueCol`
    * (cast to long) over the total order `ord`: for each row,
    * `startCol` = sum of all earlier rows' values, `endCol` = startCol +
    * own value. `ord` must be a total order (include a unique key) so
    * range boundaries cannot split ties. */
  def globalRunningSum(df: DataFrame, ord: Seq[Column], valueCol: Column,
                       startCol: String, endCol: String): DataFrame = {
    val parts = df.sparkSession.sparkContext.defaultParallelism
    val prepared = df
      .withColumn("__v", valueCol.cast(LongType))
      .repartitionByRange(parts, ord: _*)
      .sortWithinPartitions(ord: _*)
      .withColumn("__pid", spark_partition_id())
    val schema = prepared.schema.add("__run", LongType)
    val vIdx = prepared.schema.fieldIndex("__v")
    val run = prepared.mapPartitions { it =>
      var acc = 0L
      it.map { r => acc += r.getLong(vIdx); Row.fromSeq(r.toSeq :+ acc) }
    }(Encoders.row(schema))
    // Per-partition totals -> exclusive prefix offsets: the only
    // unpartitioned window runs over ~#cores rows, then broadcasts.
    val offsets = run.groupBy("__pid").agg(sum("__v").as("__cnt"))
      .withColumn("__off",
        coalesce(sum(col("__cnt")).over(Window.orderBy(col("__pid"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("__pid", "__off")
    run.join(broadcast(offsets), "__pid")
      .withColumn(endCol, col("__run") + col("__off"))
      .withColumn(startCol, col(endCol) - col("__v"))
      .drop("__pid", "__run", "__v")
  }

  /** Per-document chunk spans: global token interval [tok_start,
    * tok_end) in the concatenated stream, plus the first/last sequence
    * ids the doc touches (`floor(start / W)` .. `floor((end - 1) / W)`).
    * Zero-token docs are dropped — they occupy no stream positions. */
  def chunkSpans(docs: DataFrame, ord: Seq[Column], tokenCount: Column,
                 windowTokens: Int): DataFrame = {
    require(windowTokens > 0, "windowTokens must be positive")
    globalRunningSum(docs.withColumn("__n_tok", tokenCount.cast(LongType)),
        ord, col("__n_tok"), "tok_start", "tok_end")
      .where(col("__n_tok") > 0)
      .withColumn("first_seq",
        floor(col("tok_start") / windowTokens).cast(LongType))
      .withColumn("last_seq",
        floor((col("tok_end") - 1) / windowTokens).cast(LongType))
      .withColumnRenamed("__n_tok", "n_tokens")
  }

  /** Per-sequence occupancy from [[chunkSpans]] output: docs touching
    * each sequence and the tokens each contributes (every sequence sums
    * to exactly `windowTokens` except the final partial one). The
    * explode is bounded: a doc spans at most ceil(len/W) + 1 sequences,
    * so blowup is corpus-tokens / W — the output's natural size. */
  def chunkStats(spans: DataFrame, windowTokens: Int): DataFrame =
    spans
      .withColumn("seq", explode(sequence(col("first_seq"), col("last_seq"))))
      .withColumn("seq_lo", col("seq") * windowTokens)
      .withColumn("seq_hi", (col("seq") + 1) * windowTokens)
      .withColumn("tokens_in_seq",
        least(col("tok_end"), col("seq_hi")) -
          greatest(col("tok_start"), col("seq_lo")))
      .groupBy("seq")
      .agg(count(lit(1)).as("n_docs"),
        sum("tokens_in_seq").as("seq_tokens"))
}
