package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BucketedSpec extends SparkSpec {
  import spark.implicits._

  test("co-located bucketed join plans with zero shuffles") {
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    val lineitem = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .withColumnRenamed("l_orderkey", "o_orderkey")
    val oldThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // at this test scale Spark would broadcast; disable it so the plan
      // shows what bucketing buys on two genuinely large fact tables
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      Bucketed.save(orders, "bkt_orders", "o_orderkey", buckets = 8)
      Bucketed.save(lineitem, "bkt_lineitem", "o_orderkey", buckets = 8)
      val joined = Bucketed.cojoin(spark, "bkt_lineitem", "bkt_orders", "o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join must not shuffle:\n${plan.take(1200)}")
      assert(plan.contains("SortMergeJoin"), plan.take(400))
      // and it returns the same rows as the plain shuffled join
      val expected = lineitem.join(orders, "o_orderkey").count()
      assert(joined.count() == expected)
      // the unbucketed form of the same join DOES shuffle — the contrast
      val unbucketed = lineitem.join(orders, "o_orderkey")
        .queryExecution.executedPlan.toString
      assert(unbucketed.contains("Exchange"))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", oldThreshold)
      spark.sql("DROP TABLE IF EXISTS bkt_orders")
      spark.sql("DROP TABLE IF EXISTS bkt_lineitem")
    }
  }
}
