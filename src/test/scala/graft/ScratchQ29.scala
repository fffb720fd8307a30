package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profile for q29_map_merge's cost structure (round 18);
  * delete after use. */
object ScratchQ29 {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    SparkEntry.queries("q04_lineitem_agg")(spark, sfDir).count() // warm
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s  (n=$n)")
    }
    val ev0 = graft.sources.Tables.load(spark, sfDir, "events")
    time("scan only")(ev0.count())
    time("scan+json")(ev0
      .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
      .filter(col("k").isNotNull).count())
    time("scan+json+day")(ev0
      .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
      .filter(col("k").isNotNull && col("day").isNotNull).count())
    val full = SparkEntry.queries("q29_map_merge")
    time("full q29 (1st)")(full(spark, sfDir).count())
    time("full q29 (2nd)")(full(spark, sfDir).count())
    // the explode+first agg without the map assembly
    val ev = ev0
      .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
      .withColumn("vclass",
        when(col("k") % 4 === 0, "car").when(col("k") % 4 === 1, "truck")
          .when(col("k") % 4 === 2, "bus").otherwise("bike"))
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
      .withColumn("breakdown",
        map(col("vclass"), lit(1), concat(lit("evt_"), col("event_type")), lit(1)))
    time("explode+agg1")(ev
      .select(col("day"), explode(col("breakdown")).as(Seq("key", "value")))
      .groupBy("day", "key").agg(sum("value")).count())
    spark.stop()
    sys.exit(0)
  }
}
