package graft.ingest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

/** T11: page chunking — split an ordered record set into fixed-size pages
  * with a 1-based page_number, the shape the reference's raw layer stores
  * (/root/reference/etl/raw_io.py:159-178, page size 500 via RAW_PAGE_SIZE).
  *
  * Scale note: a global `Window.orderBy` funnels everything through one
  * partition. The reference chunks per (endpoint, year); we mirror that —
  * callers pass `partitionCols` (e.g. year) so each partition numbers its own
  * pages independently and the sort is distributed. An empty partition list
  * reproduces the single-sequence semantics for small inputs.
  */
object Chunker {

  /** Add `page_number` (1-based within `partitionCols`) ordering by `ord`. */
  def withPageNumber(df: DataFrame, ord: Seq[Column], pageSize: Int,
                     partitionCols: Seq[String] = Nil): DataFrame = {
    val w =
      if (partitionCols.isEmpty) Window.orderBy(ord: _*)
      else Window.partitionBy(partitionCols.map(col): _*).orderBy(ord: _*)
    df.withColumn("__rn", row_number().over(w))
      .withColumn("page_number",
        (floor((col("__rn") - 1) / pageSize) + 1).cast(IntegerType))
      .drop("__rn")
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
        sort_array(collect_list(struct(dataCols: _*))).as("payload"))
  }
}
