package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Bucketing: the co-located-join story for repeated large joins at scale.
  * Writing both sides bucketed by the join key must let SortMergeJoin run
  * WITHOUT a shuffle exchange on either side.
  */
class BucketingSpec extends SparkSpec {

  test("bucketed join on the bucket key plans no shuffle exchange") {
    val wh = tmpDir("graft-bucket-wh")
    // Disable broadcast so the join strategy is the bucketable SMJ path.
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Tables.load(spark, sf(), "orders")
        .write.bucketBy(8, "o_custkey").sortBy("o_custkey")
        .option("path", s"$wh/orders_b")
        .mode("overwrite").saveAsTable("orders_b")
      Tables.load(spark, sf(), "customer")
        .withColumnRenamed("c_custkey", "o_custkey")
        .write.bucketBy(8, "o_custkey").sortBy("o_custkey")
        .option("path", s"$wh/customer_b")
        .mode("overwrite").saveAsTable("customer_b")

      val joined = spark.table("orders_b")
        .join(spark.table("customer_b"), "o_custkey")
      val n = joined.count()
      assert(n > 0)

      val shuffles = joined.queryExecution.executedPlan.collect {
        case s: ShuffleExchangeExec => s
      }
      assert(shuffles.isEmpty,
        s"bucketed join should be shuffle-free, found ${shuffles.size} exchanges")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS customer_b")
    }
  }
}
