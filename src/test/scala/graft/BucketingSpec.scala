package graft

import org.apache.spark.sql.functions._
import graft.sources.Bucketing

class BucketingSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("joining two tables bucketed on the key needs no exchange") {
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    val lineitem = spark.read.parquet(s"$sf/lineitem.parquet")
    Bucketing.writeBucketed(orders.withColumnRenamed("o_orderkey", "orderkey"),
      "orders_b", "orderkey", 4)
    Bucketing.writeBucketed(lineitem.withColumnRenamed("l_orderkey", "orderkey"),
      "lineitem_b", "orderkey", 4)
    try {
      // force the shuffle-or-not decision to be about bucketing, not size
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Bucketing.joinBucketed(spark, "orders_b", "lineitem_b", "orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join should read co-located buckets without a shuffle:\n$plan")
      // and it still computes the right thing
      val n = joined.count()
      val expected = orders.join(lineitem, col("o_orderkey") === col("l_orderkey")).count()
      assert(n == expected)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }
}
