package graft.core

import org.apache.spark.sql.DataFrame

/** Scan-parallelism guard shared by the pair-join / per-row-kernel
  * operators.
  *
  * A small table often arrives as ONE parquet file and therefore ONE scan
  * partition (`files.maxPartitionBytes` only splits large files). Most of
  * this engine's heavy operators then do their expensive work — native
  * per-row kernels (winnowing, dHash decode, shingling) or the probe side
  * of a broadcast pair join (all-pairs cosine, banded hamming, LSH bucket
  * self-joins, IVF probe scoring) — BEFORE any exchange, so the whole
  * O(n·kernel) or O(candidate-pairs) cost lands on a single task while
  * every other core idles. That is the "one huge unsplittable input"
  * skew case of the optimization playbook: repartition immediately after
  * the read.
  *
  * [[widen]] round-robins the input up to the session's default
  * parallelism ONLY when the source has fewer partitions — at real scale
  * the file count already provides parallelism and this is a no-op (the
  * probe costs one `toRdd` partition-count lookup, no job), and streaming
  * frames pass through untouched (repartition probing is batch-only).
  * Row-level determinism is unaffected: downstream operators are
  * per-row kernels or equi/pair joins whose output is order-independent,
  * and every declared query totally orders (or aggregates) its output.
  */
object Par {

  def widen(df: DataFrame): DataFrame = {
    if (df.isStreaming) df
    else {
      val par = df.sparkSession.sparkContext.defaultParallelism
      // toRdd (internal rows) probes the partition count without the
      // encoder-mapped lineage df.rdd would build on every call.
      if (df.queryExecution.toRdd.getNumPartitions < par) df.repartition(par)
      else df
    }
  }
}
