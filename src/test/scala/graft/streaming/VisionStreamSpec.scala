package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.nio.file.Files

class VisionStreamSpec extends SparkSpec {
  import spark.implicits._

  /** Two cameras, objects drifting 8px/frame rightward — always within
    * the 50px gate, so each camera keeps stable ids. */
  private def mkFrames(n: Int): Seq[FrameDets] =
    (0 until n).flatMap { i =>
      Seq("CAM_01", "CAM_02").map { cam =>
        val base = if (cam == "CAM_01") 0 else 300
        val dets = Seq(
          DetRaw("Person", base + i * 8, 80 + i * 5, base + i * 8 + 60, 200 + i * 5),
          DetRaw("Car", base + 150 + i * 8, 170 + i * 5, base + 210 + i * 8, 290 + i * 5))
        FrameDets(cam, 1700000000000L + i * 500L, dets)
      }
    }

  test("batch track: stable ids per camera, durations grow with event time") {
    val out = VisionStreamJob.track(mkFrames(10).toDS()).collect()
      .sortBy(o => (o.camera_id, o.event_ms))
    assert(out.length == 20)
    val cam1 = out.filter(_.camera_id == "CAM_01")
    // same two ids across all frames (tracked, not re-registered)
    assert(cam1.flatMap(_.detections.map(_.object_id)).toSet == Set(0, 1))
    // duration of last frame = 9 * 0.5s = 4.5s
    assert(cam1.last.detections.map(_.tracking_duration_seconds).toSet == Set(4.5))
    // Person rows carry demographics defaults; Car rows don't
    val person = cam1.head.detections.find(_.detection_type == "Person").get
    assert(person.gender.contains("Unknown") && person.age.contains("Unknown"))
    val car = cam1.head.detections.find(_.detection_type == "Car").get
    assert(car.gender.isEmpty && car.age.isEmpty)
  }

  test("streaming track over MemoryStream: state persists across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[FrameDets]
    val q = VisionStreamJob.track(mem.toDS()).writeStream
      .format("memory").queryName("tracked").outputMode("append").start()
    try {
      val frames = mkFrames(10)
      mem.addData(frames.take(8): _*)  // frames 0-3 of each camera
      q.processAllAvailable()
      mem.addData(frames.drop(8): _*)  // frames 4-9 — state must carry
      q.processAllAvailable()
      val rows = spark.sql("SELECT camera_id, event_ms, total_objects FROM tracked").collect()
      assert(rows.length == 20)
      // ids survived the batch boundary: no re-registration (ids stay 0/1)
      val ids = spark.sql("SELECT explode(detections.object_id) FROM tracked WHERE camera_id='CAM_01'")
        .collect().map(_.getInt(0)).toSet
      assert(ids == Set(0, 1), s"ids=$ids")
    } finally q.stop()
  }

  test("streaming equals batch on the same input") {
    implicit val sqlCtx = spark.sqlContext
    val frames = mkFrames(6)
    val batch = VisionStreamJob.track(frames.toDS()).collect().toSet
    val mem = MemoryStream[FrameDets]
    val q = VisionStreamJob.track(mem.toDS()).writeStream
      .format("memory").queryName("tracked_eq").outputMode("append").start()
    try {
      frames.grouped(5).foreach { g => mem.addData(g: _*); q.processAllAvailable() }
      val streamed = spark.table("tracked_eq").as[VisionOut].collect().toSet
      assert(streamed == batch)
    } finally q.stop()
  }

  test("synthetic detector: deterministic, guards missing frame_data") {
    import graft.generator.Generator
    val frames = Seq(
      ("CAM_01", "2025-12-30T14:00:00", 1L, "b64data"),
      ("CAM_01", "2025-12-30T14:00:01", 2L, ""),
      ("CAM_02", "2025-12-30T14:00:00", 1L, "b64data"))
      .toDF("camera_id", "timestamp", "frame_number", "frame_data")
    val a = VisionStreamJob.syntheticDetect(frames).collect()
    val b = VisionStreamJob.syntheticDetect(frames).collect()
    assert(a.toSeq == b.toSeq)
    assert(a.find(_.eventMs == 1767103201000L).get.detections.isEmpty) // empty frame_data -> no dets
    // F13: payloads that don't base64-decode are guarded to no detections
    val garbage = Seq(("CAM_01", "2025-12-30T14:00:02", 3L, "@@not-base64@@"))
      .toDF("camera_id", "timestamp", "frame_number", "frame_data")
    assert(VisionStreamJob.syntheticDetect(garbage).collect().head.detections.isEmpty)
  }

  test("synthetic detector tolerates Z and offset frame timestamps") {
    // the bridge emits bare local datetimes, but the collector path
    // tolerates Z/offset variants — the detector must too (parseIsoTs
    // semantics: explicit offset honored, bare datetime is UTC)
    val frames = Seq(
      ("CAM_01", "2025-12-30T14:00:00", 1L, "b64data"),
      ("CAM_01", "2025-12-30T14:00:00Z", 1L, "b64data"),
      ("CAM_01", "2025-12-30T16:00:00+02:00", 1L, "b64data"))
      .toDF("camera_id", "timestamp", "frame_number", "frame_data")
    val out = VisionStreamJob.syntheticDetect(frames).collect()
    assert(out.length == 3)
    assert(out.map(_.eventMs).distinct.toSeq == Seq(1767103200000L),
      "all three spellings denote the same instant")
  }

  test("continuous 1-min aggregate (batch mode) counts per bucket/camera") {
    // 10 frames at 0.5s cadence => all in one minute bucket
    val tracked = VisionStreamJob.track(mkFrames(10).toDS())
    val agg = VisionStreamJob.continuousAgg(tracked, withWatermark = false)
      .orderBy("bucket", "camera_id").collect()
    assert(agg.length == 2)
    agg.foreach { r =>
      assert(r.getLong(2) == 20)      // 2 dets * 10 frames
      assert(r.getLong(3) == 2)       // 2 unique objects (approx, exact at this card.)
      assert(r.getDouble(4) > 0.0)
    }
  }

  test("W2 sink: continuous aggregate streams closed buckets into JDBC once") {
    implicit val sqlCtx = spark.sqlContext
    val url = "jdbc:derby:memory:graft_agg;create=true"
    val base = 1700000040000L
    def vo(tMs: Long) = VisionOut("CAM_01", tMs, 1, Seq(
      DetOut(0, "Person", 0, 0, 60, 120, Centroid(30, 60), 1.0, None, None, None, None)))
    val mem = MemoryStream[VisionOut]
    val q = DualSink.startAggToJdbc(
      VisionStreamJob.continuousAgg(mem.toDS()), url, "traffic_1min",
      graft.sources.Scratch.dir("agg_jdbc_ckpt").toString, triggerMs = 100)
    try {
      mem.addData(vo(base), vo(base + 1000), vo(base + 2000))
      q.processAllAvailable()
      mem.addData(vo(base + 240000)) // advance watermark past bucket end
      q.processAllAvailable()
      mem.addData(vo(base + 600000)) // flush
      q.processAllAvailable()
    } finally q.stop()
    val back = spark.read.format("jdbc")
      .option("url", url).option("dbtable", "traffic_1min").load()
    val bucket0 = back.filter(col("bucket") === new java.sql.Timestamp(base))
    assert(bucket0.count() == 1, "closed bucket appended exactly once")
    assert(bucket0.select("detection_count").collect().head.getLong(0) == 3)
  }

  test("dual sink JDBC leg (S8): vision detections land in embedded Derby") {
    implicit val sqlCtx = spark.sqlContext
    val url = "jdbc:derby:memory:graft_vision;create=true"
    val root = graft.sources.Scratch.dir("dualsink_jdbc").toString
    val tracked = VisionStreamJob.track(mkFrames(6).toDS()).toDF()
    DualSink.writeBatch(tracked, batchId = 7L, warehousePath = s"$root/wh",
      lakePath = s"$root/lake", jdbcUrl = Some(url))
    val back = spark.read.format("jdbc")
      .option("url", url).option("dbtable", "vision_detections").load()
    assert(back.count() == 24) // 6 frames * 2 cams * 2 dets
    assert(back.select("_batch_id").distinct().collect().map(_.getLong(0)).toSeq == Seq(7L))
    assert(back.columns.map(_.toLowerCase).toSet
      .contains("tracking_duration"))
  }

  test("W7 checkpoint restart: tracker state recovers, no replayed duplicates") {
    implicit val sqlCtx = spark.sqlContext
    val root = graft.sources.Scratch.dir("dualsink_restart").toString
    val frames = mkFrames(10)
    val mem = MemoryStream[FrameDets]
    // run 1: first 4 frames per camera, then stop
    val q1 = DualSink.start(VisionStreamJob.track(mem.toDS()),
      s"$root/ckpt", s"$root/warehouse", s"$root/lake", triggerMs = 100)
    try {
      mem.addData(frames.take(8): _*)
      q1.processAllAvailable()
    } finally q1.stop()
    // run 2: NEW query, same checkpoint — resumes committed offsets and
    // recovers the per-camera tracker state from the state store
    val q2 = DualSink.start(VisionStreamJob.track(mem.toDS()),
      s"$root/ckpt", s"$root/warehouse", s"$root/lake", triggerMs = 100)
    try {
      mem.addData(frames.drop(8): _*)
      q2.processAllAvailable()
    } finally q2.stop()
    val wh = spark.read.parquet(s"$root/warehouse")
    // 10 frames * 2 cams * 2 dets, exactly once (no replayed batches)
    assert(wh.count() == 40, s"got ${wh.count()}")
    assert(wh.select("camera_id", "time", "object_id").distinct().count() == 40,
      "replay after restart must not duplicate rows")
    // ids survived the restart: still the originally registered 0/1
    val ids = wh.filter(col("camera_id") === "CAM_01")
      .select("object_id").distinct().collect().map(_.getInt(0)).toSet
    assert(ids == Set(0, 1), s"state lost across restart: ids=$ids")
    // both runs wrote batches (distinct _batch_id across the restart)
    assert(wh.select("_batch_id").distinct().count() >= 2)
  }

  test("W2 watermark: a frame later than 2 minutes is excluded from its closed bucket") {
    implicit val sqlCtx = spark.sqlContext
    val base = 1700000040000L // minute-aligned
    def vo(tMs: Long) = VisionOut("CAM_01", tMs, 1, Seq(
      DetOut(0, "Person", 0, 0, 60, 120, Centroid(30, 60), 1.0, None, None, None, None)))
    val mem = MemoryStream[VisionOut]
    val q = VisionStreamJob.continuousAgg(mem.toDS()).writeStream
      .format("memory").queryName("cagg_wm").outputMode("append").start()
    try {
      // three on-time frames in bucket [base, base+1min)
      mem.addData(vo(base), vo(base + 1000), vo(base + 2000))
      q.processAllAvailable()
      // advance event time 4 min → watermark (max - 2 min) passes the
      // bucket end → the bucket finalizes and is emitted
      mem.addData(vo(base + 240000))
      q.processAllAvailable()
      // LATE: belongs to the closed bucket, > 2 min behind the watermark
      mem.addData(vo(base + 3000))
      q.processAllAvailable()
      // push the watermark further so every closable bucket flushes
      mem.addData(vo(base + 600000))
      q.processAllAvailable()
      val bucket0 = spark.sql(
        s"SELECT detection_count FROM cagg_wm WHERE bucket = timestamp_millis(${base}L)")
        .collect()
      assert(bucket0.length == 1, s"closed bucket must emit exactly once, got ${bucket0.length}")
      assert(bucket0.head.getLong(0) == 3,
        s"late frame must be dropped: count=${bucket0.head.getLong(0)}")
    } finally q.stop()
  }

  test("A13: observed collector metrics surface through the listener") {
    implicit val sqlCtx = spark.sqlContext
    val metrics = new CollectorMetrics()
    spark.streams.addListener(metrics)
    val root = graft.sources.Scratch.dir("dualsink_metrics").toString
    val mem = MemoryStream[FrameDets]
    val q = DualSink.start(VisionStreamJob.track(mem.toDS()),
      s"$root/ckpt", s"$root/warehouse", s"$root/lake", triggerMs = 100)
    try {
      mem.addData(mkFrames(6): _*)
      q.processAllAvailable()
      // listener delivery is async — poll briefly
      val deadline = System.currentTimeMillis() + 15000
      while (metrics.records.get() < 12 && System.currentTimeMillis() < deadline)
        Thread.sleep(100)
      assert(metrics.records.get() == 12, s"records=${metrics.records.get()}")
      assert(metrics.objects.get() == 24, s"objects=${metrics.objects.get()}") // 2 dets/frame
      assert(metrics.lastBatchId >= 0 && metrics.ratePerSec > 0.0)
    } finally { q.stop(); spark.streams.removeListener(metrics) }
  }

  test("dual sink: warehouse parquet + y/m/d lake from one stream") {
    implicit val sqlCtx = spark.sqlContext
    val root = graft.sources.Scratch.dir("dualsink").toString
    val mem = MemoryStream[FrameDets]
    val q = DualSink.start(VisionStreamJob.track(mem.toDS()),
      s"$root/ckpt", s"$root/warehouse", s"$root/lake", triggerMs = 100)
    try {
      mem.addData(mkFrames(6): _*)
      q.processAllAvailable()
    } finally q.stop()
    val wh = spark.read.parquet(s"$root/warehouse")
    assert(wh.count() == 24) // 6 frames * 2 cams * 2 dets
    assert(wh.columns.contains("_batch_id"))
    // exact event-time layout: 1700000000000 ms → 2023-11-14 UTC (an
    // any-year=-dir-exists fallback would pass wrong month/day math)
    assert(new java.io.File(s"$root/lake/year=2023/month=11/day=14").exists(),
      new java.io.File(s"$root/lake").listFiles().map(_.getName).mkString(","))
    val lake = spark.read.json(s"$root/lake")
    assert(lake.count() == 12)
  }
}
