// The ONE file outside the graft package: Spark's v1 streaming Source
// contract requires getBatch to return a DataFrame whose logical plan is
// flagged isStreaming=true, and the only constructor for that —
// SparkSession.internalCreateDataFrame(rdd, schema, isStreaming = true),
// the exact call Spark's own FileStreamSource makes
// (sql/core FileStreamSource.scala) — is private[sql]. Third-party v1
// connectors (spark-redis, bahir's MQTT source, ...) all use this same
// sql-subpackage shim to reach it; the alternative (reimplementing
// LogicalRDD construction) would duplicate more private API, not less.
package org.apache.spark.sql.graftshim

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.classic.{SparkSession => ClassicSession}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.{DataFrame, SparkSession}

object StreamingBatches {

  /** Wrap already-computed InternalRows as a STREAMING DataFrame — what
    * a v1 Source must hand back from getBatch. */
  def asStreamingBatch(spark: SparkSession, rows: RDD[InternalRow],
                       schema: StructType): DataFrame =
    spark.asInstanceOf[ClassicSession]
      .internalCreateDataFrame(rows, schema, isStreaming = true)
}

object PlanFrames {

  /** A logical plan as a DataFrame — `Dataset.ofRows`, which is
    * `private[sql]`. The SQL-verb layer needs it to evaluate a parsed
    * INSERT statement's query subtree, and the catalog's analysis rule
    * needs it to splice a MergeStore skipping read under a resolved
    * relation; Spark's own catalog extensions (Delta's DeltaAnalysis,
    * Iceberg's extensions) reach the same entry point. */
  def ofRows(spark: SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[ClassicSession], plan)
}
