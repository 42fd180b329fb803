package graft.store

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

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
