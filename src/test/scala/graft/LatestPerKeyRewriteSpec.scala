package graft

import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window}
import org.apache.spark.sql.expressions.{Window => W}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.plans.LatestPerKeyRewrite

/** The latest-per-key optimizer rule: the row_number()==1 idiom must plan
  * as a max_by Aggregate (map-side-combinable) instead of a Window sort,
  * with identical results.
  */
class LatestPerKeyRewriteSpec extends SparkSpec {

  private def latestIdiom = {
    val w = W.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
    Tables.load(spark, sf(), "orders")
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select("o_custkey", "o_orderkey", "o_totalprice")
  }

  test("rewrites window idiom to max_by aggregate with equal results") {
    val expected = latestIdiom.orderBy("o_custkey").collect().toSeq

    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ LatestPerKeyRewrite
    try {
      val df = latestIdiom
      val optimized = df.queryExecution.optimizedPlan
      assert(optimized.collect { case w: Window => w }.isEmpty,
        s"window survived:\n$optimized")
      val aggs = optimized.collect { case a: Aggregate => a }
      assert(aggs.exists(_.aggregateExpressions.exists(
        _.toString.toLowerCase.contains("max_by"))),
        s"no max_by aggregate:\n$optimized")
      assert(df.orderBy("o_custkey").collect().toSeq == expected)
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == LatestPerKeyRewrite)
    }
  }

  test("does NOT rewrite when rn is kept or order is ascending") {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ LatestPerKeyRewrite
    try {
      // rn kept in output → window must survive.
      val w = W.partitionBy(col("o_custkey")).orderBy(col("o_orderdate").desc)
      val kept = Tables.load(spark, sf(), "orders")
        .withColumn("rn", row_number().over(w))
        .where(col("rn") === 1)
        .select("o_custkey", "rn")
      assert(kept.queryExecution.optimizedPlan
        .collect { case x: Window => x }.nonEmpty)

      // ascending order → first-per-key, not our pattern → survives.
      val wAsc = W.partitionBy(col("o_custkey")).orderBy(col("o_orderdate").asc)
      val asc = Tables.load(spark, sf(), "orders")
        .withColumn("rn", row_number().over(wAsc))
        .where(col("rn") === 1)
        .select("o_custkey", "o_orderkey")
      assert(asc.queryExecution.optimizedPlan
        .collect { case x: Window => x }.nonEmpty)
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == LatestPerKeyRewrite)
    }
  }
}
