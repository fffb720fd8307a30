package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class CameraEventsSpec extends SparkSpec {
  import spark.implicits._

  private val url = "jdbc:derby:memory:graft_cam;create=true"

  private def dets(n: Int, people: Int) =
    (0 until n).map(i => DetOut(i, if (i < people) "Person" else "Car",
      10, 20, 70, 140, Centroid(40, 80), 0.0, None, None, None, None))

  test("fromTracked: per-frame counts, zone from broadcast dim, unknown camera kept") {
    val t0 = 1767103200000L
    val tracked = Seq(
      VisionOut("CAM_01", t0, 3, dets(3, 1)),
      VisionOut("CAM_01", t0 + 500, 0, Nil),
      VisionOut("CAM_99", t0 + 1000, 2, dets(2, 2))).toDS()
    val dim = Seq(("CAM_01", "downtown"), ("CAM_02", "port")).toDF("camera_id", "zone")
    val out = CameraEvents.fromTracked(tracked, dim)
    assert(out.columns.toSeq == Seq("camera_id", "zone", "event_type",
      "vehicle_count", "pedestrian_count", "timestamp", "created_at"))
    val rows = out.orderBy("timestamp").collect()
    assert(rows.map(r => (r.getString(0), r.getString(1), r.getInt(3), r.getInt(4))).toSeq ==
      Seq(("CAM_01", "downtown", 2, 1), ("CAM_01", "downtown", 0, 0),
        ("CAM_99", null, 0, 2)))
    assert(out.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"))
  }

  test("camera_events appends across micro-batches through foreachBatch (Derby)") {
    implicit val sqlCtx = spark.sqlContext
    val t0 = 1767103200000L
    val dim = Seq(("CAM_01", "downtown")).toDF("camera_id", "zone")
    val mem = MemoryStream[FrameDets]
    val q = VisionStreamJob.track(mem.toDS()).writeStream
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[VisionOut], _: Long) =>
        CameraEvents.appendJdbc(
          CameraEvents.fromTracked(batch, dim), url)
      }
      .start()
    try {
      mem.addData(FrameDets("CAM_01", t0, Seq(DetRaw("Car", 10, 20, 70, 140))))
      q.processAllAvailable()
      // person far from the existing car track — association would
      // otherwise keep the old track's type (tracker semantics)
      mem.addData(FrameDets("CAM_01", t0 + 500,
        Seq(DetRaw("Person", 400, 300, 460, 440), DetRaw("Car", 12, 20, 72, 140))))
      q.processAllAvailable()
      val back = spark.read.jdbc(url, "camera_events", new java.util.Properties())
      assert(back.count() == 2)
      val byTs = back.orderBy("timestamp").collect()
      assert(byTs.map(r => (r.getAs[Int]("vehicle_count"),
        r.getAs[Int]("pedestrian_count"))).toSeq == Seq((1, 0), (1, 1)))
      assert(byTs.forall(_.getAs[String]("zone") == "downtown"))
    } finally q.stop()
  }
}
