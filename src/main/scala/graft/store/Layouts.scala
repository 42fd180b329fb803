package graft.store

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Physical-layout tools: range clustering for parquet data skipping.
  *
  * Spark prunes FILES only on partition columns; everything finer rides
  * parquet's own min/max statistics — the reader skips a row group when
  * the pushed predicate excludes its [min, max]. On randomly laid-out
  * data those stats are useless (every row group spans the whole key
  * range); after `repartitionByRange + sortWithinPartitions` each row
  * group covers a narrow slice, so a selective filter touches ~1/files
  * of the bytes. At 100 TB this is the difference between a point query
  * reading gigabytes and reading the whole table — the same reason the
  * reference puts btree indexes on its hot columns (raw:
  * etl/raw_io.py:115-116 `*_raw_hash_idx`/`*_raw_year_idx`; core:
  * notebooks/20_load_core_directory.ipynb cell 3
  * `*_year_idx`/`*_state_idx`), re-expressed as layout, the only index
  * Spark has.
  *
  * Choose cluster columns like index columns: the highest-selectivity
  * equality/range predicates of the workload. One column gives perfect
  * runs; two gives a lexicographic compromise (the second column only
  * helps within ties of the first).
  */
object Layouts {

  /** Range-clustered parquet write: `numFiles` files, each covering a
    * narrow contiguous range of `clusterCols` (range partition + in-file
    * sort = every row group's min/max is tight). */
  def clusteredWrite(df: DataFrame, path: String, clusterCols: Seq[String],
                     numFiles: Int): Unit =
    df.repartitionByRange(numFiles, clusterCols.map(col): _*)
      .sortWithinPartitions(clusterCols.map(col): _*)
      .write.mode("overwrite").parquet(path)

  /** Z-order clustered write: multi-dimensional data skipping.
    *
    * Lexicographic clustering ([[clusteredWrite]] with two columns)
    * serves only its LEADING column — the second column's min/max spans
    * its whole domain in every file, so a filter on it alone skips
    * nothing. The Z-curve interleaves the bits of each column's
    * bucketized rank instead, so a file's rows are contiguous on the
    * space-filling curve and every clustered dimension's per-file
    * [min, max] tightens to ~(numFiles)^(-1/k) of its domain: with 64
    * files over 2 dims, a point filter on EITHER column touches ~1/8 of
    * the bytes (vs 1/64-and-1 for lexicographic). The classic trade
    * (Morton 1966; the layout behind Delta/Iceberg OPTIMIZE ZORDER):
    * give up perfect leading-column runs to make every dimension
    * skippable.
    *
    * Buckets are equal-width over the measured global [min, max] (one
    * bounded 2k-scalar aggregate — no per-value driver state); heavily
    * skewed columns would want quantile cutpoints instead, at the cost
    * of shipping the cutpoint arrays. Numeric columns only. */
  def zorderWrite(df: DataFrame, path: String, zCols: Seq[String],
                  numFiles: Int, bitsPerDim: Int = 8): Unit =
    zorderArrange(df, zCols, numFiles, bitsPerDim)
      .write.mode("overwrite").parquet(path)

  /** The z-curve layout WITHOUT the write: `numFiles` partitions, rows
    * contiguous on the Morton curve, sorted (z, cols...) within each —
    * for sinks that commit through their own protocol (MergeStore's
    * z-ordered COW tables stage the arranged rows and publish via the
    * manifest CAS). Same bucketization as [[zorderWrite]]. */
  def zorderArrange(df: DataFrame, zCols: Seq[String],
                    numFiles: Int, bitsPerDim: Int = 8): DataFrame = {
    require(zCols.size >= 2,
      "zorder needs >= 2 columns; use clusteredWrite for one")
    require(bitsPerDim * zCols.size <= 62, "z-value must fit a long")
    val buckets = 1 << bitsPerDim
    val statCols = zCols.flatMap(c =>
      Seq(min(col(c)).cast("double"), max(col(c)).cast("double")))
    val stats = df.agg(statCols.head, statCols.tail: _*).head()
    val bucketCols: Seq[Column] = zCols.zipWithIndex.map { case (c, i) =>
      if (stats.isNullAt(2 * i)) lit(0L) // empty input or all-null column
      else {
        val lo = stats.getDouble(2 * i)
        val hi = stats.getDouble(2 * i + 1)
        if (lo == hi) lit(0L)
        else coalesce(
          // width_bucket is 1..n (n+1 at hi, 0 never with measured lo);
          // clamp and shift to 0..n-1
          least(greatest(width_bucket(col(c).cast("double"),
            lit(lo), lit(hi), lit(buckets)), lit(1L)), lit(buckets.toLong))
            - lit(1L),
          lit(0L))
      }
    }
    val z = (for {
      (b, d) <- bucketCols.zipWithIndex
      j <- 0 until bitsPerDim
    } yield shiftleft(shiftright(b, j).bitwiseAND(lit(1L)),
        j * zCols.size + d))
      .reduce(_ bitwiseOR _)
    df.withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z") +: zCols.map(col): _*)
      .drop("__z")
  }

  /** Run `action` and return (result, task input bytes read) — the layout
    * audit: how many bytes a filter actually scanned. Listener events are
    * asynchronous; polled to quiescence (bounded) after the action. */
  def measuredInputBytes[A](spark: SparkSession)(action: => A): (A, Long) = {
    val bytes = new AtomicLong(0L)
    val listener = new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) bytes.addAndGet(m.inputMetrics.bytesRead)
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val r = action
      var last = -1L
      var stable = 0
      var waited = 0
      while (stable < 3 && waited < 50) { // quiesce: 3 x 100ms unchanged
        Thread.sleep(100)
        waited += 1
        val now = bytes.get()
        if (now == last) stable += 1 else { stable = 0; last = now }
      }
      (r, bytes.get())
    } finally {
      spark.sparkContext.removeSparkListener(listener)
    }
  }
}
