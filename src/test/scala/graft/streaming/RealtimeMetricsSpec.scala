package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import java.nio.file.Files

class RealtimeMetricsSpec extends SparkSpec {
  import spark.implicits._

  private val url = "jdbc:derby:memory:graft_rtm;create=true"

  test("toKeyValue: every non-key column lands in the JSON value doc") {
    val agg = Seq(("downtown", 42L, 33.5), ("industrial", 7L, 12.25))
      .toDF("zone", "n", "avg_speed")
    val kv = RealtimeMetrics.toKeyValue(agg, "zone", 1767103200000L)
    assert(kv.columns.toSeq == Seq("metric_key", "metric_value", "updated_at"))
    val rows = kv.orderBy("metric_key").collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("downtown", "industrial"))
    assert(rows(0).getString(1) == """{"n":42,"avg_speed":33.5}""")
    // the JSON value parses back to the original columns
    val back = kv.select(col("metric_key"),
        from_json(col("metric_value"),
          org.apache.spark.sql.types.StructType.fromDDL("n BIGINT, avg_speed DOUBLE"),
          Map.empty[String, String]).as("v"))
      .select("metric_key", "v.n", "v.avg_speed")
      .orderBy("metric_key").collect()
    assert(back(1).getLong(1) == 7L && back(1).getDouble(2) == 12.25)
  }

  test("realtime_metrics roundtrip: collector snapshot upserts as latest values (Derby)") {
    implicit val sqlCtx = spark.sqlContext
    val metrics = new CollectorMetrics()
    spark.streams.addListener(metrics)
    val root = graft.sources.Scratch.dir("rtm").toString
    val mem = MemoryStream[FrameDets]
    val q = DualSink.start(VisionStreamJob.track(mem.toDS()),
      s"$root/ckpt", s"$root/warehouse", s"$root/lake", triggerMs = 100)
    try {
      val t0 = 1767103200000L
      mem.addData((0 until 4).map(i =>
        FrameDets(s"CAM_0${i % 2 + 1}", t0 + i * 500L,
          Seq(DetRaw("Car", 10 + i, 20, 70 + i, 140)))): _*)
      q.processAllAvailable()
      val deadline = System.currentTimeMillis() + 15000
      while (metrics.records.get() < 4 && System.currentTimeMillis() < deadline)
        Thread.sleep(100)
      assert(metrics.records.get() == 4)

      // first snapshot creates the table
      RealtimeMetrics.upsertSnapshot(
        RealtimeMetrics.collectorSnapshot(spark, metrics, t0), url)
      val read1 = spark.read.format("jdbc").option("url", url)
        .option("dbtable", "realtime_metrics").load()
      assert(read1.columns.toSeq == Seq("metric_key", "metric_value", "updated_at"))
      assert(read1.count() == 5)
      val recs1 = read1.filter(col("metric_key") === "collector_records")
        .select(get_json_object(col("metric_value"), "$.value")).head.getString(0)
      assert(recs1 == "4", s"got $recs1")

      // more data → a later snapshot REPLACES values instead of appending
      mem.addData((4 until 6).map(i =>
        FrameDets(s"CAM_0${i % 2 + 1}", t0 + i * 500L,
          Seq(DetRaw("Car", 10 + i, 20, 70 + i, 140)))): _*)
      q.processAllAvailable()
      val deadline2 = System.currentTimeMillis() + 15000
      while (metrics.records.get() < 6 && System.currentTimeMillis() < deadline2)
        Thread.sleep(100)
      RealtimeMetrics.upsertSnapshot(
        RealtimeMetrics.collectorSnapshot(spark, metrics, t0 + 2000L), url)
      val read2 = spark.read.format("jdbc").option("url", url)
        .option("dbtable", "realtime_metrics").load()
      assert(read2.count() == 5, "latest-values table must not grow")
      val recs2 = read2.filter(col("metric_key") === "collector_records")
        .select(get_json_object(col("metric_value"), "$.value")).head.getString(0)
      assert(recs2 == "6", s"got $recs2")
      // updated_at moved forward with the refresh
      val ts = read2.agg(max(col("updated_at")).cast("long")).head.getLong(0)
      assert(ts == 1767103202L)
    } finally { q.stop(); spark.streams.removeListener(metrics) }
  }
}
