package graft.sources

import graft.SparkSpec
import graft.generator.Generator
import graft.schemas.Schemas
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files

class TopicStreamSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String = graft.sources.Scratch.dir("graft_topic").toString

  private def produceThreeTopics(base: String): Unit = {
    // the bridge's routing: mqtt prefix → kafka topic (F15), then keyed send
    val lines =
      Generator.airQuality(spark, 6).toJSON.toDF("value") union
        Generator.parking(spark, 6).toJSON.toDF("value") union
        Generator.trafficEdges(spark, 6).toJSON.toDF("value")
    TopicStream.writeTopic(
      lines.withColumn("topic",
        graft.functions.City.routeTopic(get_json_object(col("value"), "$.mqtt_topic"))),
      base, col("topic"), col("value"))
  }

  test("producer + batch read: topic routing and device-key extraction (S5/S6)") {
    val base = tmp()
    produceThreeTopics(base)
    val all = TopicStream.read(spark, base,
      Seq("smart-city-air-quality", "smart-city-parking", "smart-city-traffic-edges"))
    val byTopic = all.groupBy("topic").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byTopic == Map(
      "smart-city-air-quality" -> 6L, "smart-city-parking" -> 6L,
      "smart-city-traffic-edges" -> 6L))
    // keys are the device ids (sensor/lot/edge), like the bridge's keyed send
    val keys = all.select("key").collect().map(_.getString(0)).toSet
    assert(keys.exists(_.startsWith("AQ_LUX_")) && keys.exists(_.startsWith("PARK_LUX_"))
      && keys.exists(_.startsWith("edge_")), s"keys=$keys")
    // kafka-wire columns all present
    assert(all.columns.toSeq == Seq("key", "value", "topic", "partition", "timestamp"))
    // same key → same partition (per-device ordering, W10)
    val parts = all.select("key", "partition").distinct().groupBy("key").count()
      .filter(col("count") > 1).count()
    assert(parts == 0, "a device key must map to exactly one partition")
  }

  test("subscribe prunes unselected topic dirs") {
    val base = tmp()
    produceThreeTopics(base)
    val one = TopicStream.read(spark, base, Seq("smart-city-parking"))
    assert(one.count() == 6)
    assert(one.select("topic").distinct().collect().map(_.getString(0)).toSeq ==
      Seq("smart-city-parking"))
  }

  test("maxFilesPerTrigger paces ingestion like maxOffsetsPerTrigger (S5)") {
    val base = tmp()
    // three separate appends → at least three files in the topic dir
    // (the file source tracks paths, unique per write)
    (0 until 3).foreach { _ =>
      TopicStream.writeTopic(
        Generator.cameraFrameLines(2).toDF("value")
          .withColumn("topic", lit("smart-city-camera-frames")),
        base, col("topic"), col("value"))
    }
    val batchSizes = scala.collection.mutable.ArrayBuffer[Long]()
    val q = TopicStream.readStream(spark, base, Seq("smart-city-camera-frames"),
        maxFilesPerTrigger = Some(1))
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        batchSizes += b.count(); ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    assert(batchSizes.sum == 6, s"all rows ingested: $batchSizes")
    assert(batchSizes.count(_ > 0) >= 3,
      s"one file per micro-batch means >= 3 non-empty batches: $batchSizes")
  }

  test("multi-topic streaming collector routes into per-type bronze trees (S7)") {
    val base = tmp()
    val lake = tmp()
    produceThreeTopics(base)
    val fallback = to_timestamp(lit("1999-01-01 00:00:00"))
    val q = TopicStream.collectToBronze(spark, base,
      Map(
        "smart-city-air-quality" -> ("air_quality", Schemas.airQuality),
        "smart-city-parking" -> ("parking", Schemas.parking),
        "smart-city-traffic-edges" -> ("traffic_edges", Schemas.trafficEdges)),
      lake, fallback, s"${tmp()}/ckpt", Trigger.AvailableNow())
    q.awaitTermination(60000)
    val aq = Lake.readBronze(spark, s"$lake/air_quality", Schemas.airQuality)
    val pk = Lake.readBronze(spark, s"$lake/parking", Schemas.parking)
    val te = Lake.readBronze(spark, s"$lake/traffic_edges", Schemas.trafficEdges)
    assert(aq.count() == 6 && pk.count() == 6 && te.count() == 6)
    // event-time partition keys present and nested payload survived
    assert(aq.schema.fieldNames.contains("hour"))
    assert(pk.select(col("data.vehicle_breakdown")).na.drop().count() == 6)
  }

  test("vision job end-to-end from a camera-frames topic dir (S5 → U1 → W4)") {
    val base = tmp()
    // one frame with a Z-suffixed timestamp rides along: the bridge
    // emits bare local datetimes, but the collector path tolerates the
    // Z/offset variants and the detector must not choke on them mid-run
    val zFrame = Generator.cameraFrameLines(1).head
      .replaceFirst("""("timestamp":"[^"]+)"""", "$1Z\"")
      .replaceFirst(""""frame_number":0""", "\"frame_number\":99")
    assert(zFrame.contains("Z\""), "fixture must carry the Z suffix")
    assert(zFrame.contains("\"frame_number\":99"),
      "frame_number edit missed — generator format drifted")
    TopicStream.writeTopic(
      (Generator.cameraFrameLines(12) :+ zFrame).toDF("value")
        .withColumn("topic", lit("smart-city-camera-frames")),
      base, col("topic"), col("value"))
    val frames = TopicStream.readStream(spark, base, Seq("smart-city-camera-frames"))
      .select(from_json(col("value"), Schemas.cameraFrame).as("f")).select("f.*")
    val tracked = VisionFromWire(frames)
    val q = tracked.writeStream.format("memory").queryName("wire_tracked")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val rows = spark.table("wire_tracked").collect()
      assert(rows.length == 13, s"got ${rows.length} tracked frames")
      val total = spark.sql("SELECT sum(total_objects) FROM wire_tracked")
        .collect().head.getLong(0)
      assert(total > 0, "some frames must carry detections")
    } finally q.stop()
  }

  /** The production wiring: wire frames → detector → tracker. */
  private def VisionFromWire(frames: org.apache.spark.sql.DataFrame) =
    graft.streaming.VisionStreamJob.track(
      graft.streaming.VisionStreamJob.syntheticDetect(frames))
}
