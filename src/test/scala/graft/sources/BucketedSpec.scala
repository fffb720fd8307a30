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

  test("ensure() builds once, then serves without rewriting (build/serve split)") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    try {
      Bucketed.ensure(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), "bkt_ensure", "k", buckets = 4)
      val firstWrite = spark.table("bkt_ensure").inputFiles.toSet
      // second ensure with DIFFERENT data must be a no-op — the table
      // (and its files) stay exactly as built
      Bucketed.ensure(Seq((9L, "z")).toDF("k", "v"), "bkt_ensure", "k", buckets = 4)
      assert(spark.table("bkt_ensure").inputFiles.toSet == firstWrite)
      assert(spark.table("bkt_ensure").orderBy("k").as[(Long, String)].collect()
        .toSeq == Seq((1L, "a"), (2L, "b")))
      // the df argument is by-name: a no-op ensure must not even
      // evaluate it (so serve calls can pass an expensive pipeline)
      var evaluated = false
      Bucketed.ensure({ evaluated = true; Seq((1L, "x")).toDF("k", "v") },
        "bkt_ensure", "k", buckets = 4)
      assert(!evaluated, "ensure() evaluated its DataFrame despite the table existing")
    } finally spark.sql("DROP TABLE IF EXISTS bkt_ensure")
  }

  test("save() refuses to clear a colliding non-table directory") {
    val wh = new org.apache.hadoop.fs.Path(
      new org.apache.hadoop.fs.Path(new java.net.URI(
        spark.catalog.getDatabase("default").locationUri)), "bkt_guard")
    val fs = wh.getFileSystem(spark.sparkContext.hadoopConfiguration)
    try {
      // a directory that does NOT look like a Spark table (user data)
      fs.mkdirs(wh)
      val f = fs.create(new org.apache.hadoop.fs.Path(wh, "precious.txt"))
      f.writeBytes("not a table"); f.close()
      val err = intercept[Exception] {
        Bucketed.save(Seq((1L, "a")).toDF("k", "v"), "bkt_guard", "k", buckets = 2)
      }
      // saveAsTable refuses the occupied location — and the precious
      // file must still be there (the orphan probe didn't delete it)
      assert(fs.exists(new org.apache.hadoop.fs.Path(wh, "precious.txt")),
        s"guard failed: user directory was deleted (saveAsTable error was: ${err.getMessage})")
    } finally {
      spark.sql("DROP TABLE IF EXISTS bkt_guard")
      if (fs.exists(wh)) fs.delete(wh, true)
    }
  }
}
