package graft.ingest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

/** T11: page chunking — split an ordered record set into fixed-size pages
  * with a 1-based page_number, the shape the reference's raw layer stores
  * (/root/reference/etl/raw_io.py:159-178, page size 500 via RAW_PAGE_SIZE).
  *
  * Scale note: the reference chunks per (endpoint, year); callers should
  * pass `partitionCols` (e.g. year) so each group numbers its own pages
  * and the sort is fully distributed. When a single global sequence IS
  * wanted (empty partition list), we still never run a single-partition
  * window over the data: [[globalRowNumber]] range-partitions by the sort
  * key, numbers rows within each partition, and shifts by per-partition
  * offsets — the only unpartitioned window runs over one count row per
  * partition (~#cores rows), not the dataset.
  */
object Chunker {

  /** Add `page_number` (1-based within `partitionCols`) ordering by `ord`. */
  def withPageNumber(df: DataFrame, ord: Seq[Column], pageSize: Int,
                     partitionCols: Seq[String] = Nil): DataFrame = {
    val numbered =
      if (partitionCols.isEmpty) globalRowNumber(df, ord, "__rn")
      else {
        val w = Window.partitionBy(partitionCols.map(col): _*).orderBy(ord: _*)
        df.withColumn("__rn", row_number().over(w))
      }
    numbered
      .withColumn("page_number",
        (floor((col("__rn") - 1) / pageSize) + 1).cast(IntegerType))
      .drop("__rn")
  }

  /** Distributed global row_number over a total order `ord` (pass a unique
    * key so range-partition boundaries cannot split ties).
    *
    * Plan shape: range-repartition on `ord` (global order ACROSS
    * partitions), sort within each partition, then read the partition id
    * and 0-based row offset straight out of `monotonically_increasing_id`
    * (pid*2^33 + offset) — within-partition numbering costs one projection,
    * no window, no second full-data shuffle. The global sequence is
    * recovered by adding the cumulative row count of all earlier
    * partitions: a ~#partitions-row aggregate whose running-sum window is
    * negligible, broadcast-joined back. AQE reuses the identical range
    * exchange between the data subtree and the counts subtree, so the
    * dataset is shuffled once. */
  def globalRowNumber(df: DataFrame, ord: Seq[Column], outCol: String): DataFrame = {
    val parts = df.sparkSession.sparkContext.defaultParallelism
    val numbered = df.repartitionByRange(parts, ord: _*)
      .sortWithinPartitions(ord: _*)
      .withColumn("__mid", monotonically_increasing_id())
      .withColumn("__pid", shiftright(col("__mid"), 33).cast(IntegerType))
      .withColumn("__prn", col("__mid").bitwiseAND(lit((1L << 33) - 1)) + 1)
      .drop("__mid")
    val offsets = numbered.groupBy("__pid")
      .agg(count(lit(1)).as("__cnt"))
      .withColumn("__off",
        coalesce(sum(col("__cnt")).over(Window.orderBy(col("__pid"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("__pid", "__off")
    numbered.join(broadcast(offsets), "__pid")
      .withColumn(outCol, col("__prn") + col("__off"))
      .drop("__pid", "__prn", "__off")
  }

  /** Collapse records into one row per page: (partitionCols..., page_number,
    * record_count, payload array-of-structs) — the raw page row shape. */
  def paginate(df: DataFrame, ord: Seq[Column], pageSize: Int,
               partitionCols: Seq[String] = Nil): DataFrame = {
    val numbered = withPageNumber(df, ord, pageSize, partitionCols)
    val dataCols = df.columns.map(col)
    numbered
      .groupBy((partitionCols :+ "page_number").map(col): _*)
      .agg(
        count(lit(1)).cast(IntegerType).as("record_count"),
        sort_array(collect_list(struct(dataCols.toIndexedSeq: _*))).as("payload"))
  }
}
