package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Vision stream pipeline (SURVEY §3.2), Spark-first:
  * frames → synthetic detector (U1) → per-camera stateful tracking
  * (W4, `flatMapGroupsWithState`) → windowed continuous aggregate (W2)
  * and dual sink (S8/W9, `foreachBatch`).
  *
  * The reference keys by camera and re-parses JSON per record
  * (flink_vision_job_proper.py:520); here the schema rides in the
  * Dataset so there's no re-parse, and state is an encodable case class
  * instead of a pickled Python object.
  */
// ---- typed rows ----
case class DetRaw(detType: String, x1: Int, y1: Int, x2: Int, y2: Int,
                  age: Option[String] = None, gender: Option[String] = None,
                  ageConf: Double = 0.0, genderConf: Double = 0.0)

case class FrameDets(cameraId: String, eventMs: Long, detections: Seq[DetRaw])

case class Centroid(x: Int, y: Int)

case class DetOut(object_id: Int, detection_type: String,
                  x1: Int, y1: Int, x2: Int, y2: Int,
                  centroid: Centroid, tracking_duration_seconds: Double,
                  gender: Option[String], gender_confidence: Option[Double],
                  age: Option[String], age_confidence: Option[Double])

case class VisionOut(camera_id: String, event_ms: Long, total_objects: Int,
                     detections: Seq[DetOut])

object VisionStreamJob {

  /** W4: the per-camera stateful tracking function. Frames inside a
    * micro-batch are processed in event-time order (the reference relies
    * on Kafka per-key arrival order; Spark's group iterator has no
    * order guarantee, so we sort — deterministic under replay). */
  def trackFn(cameraId: String, frames: Iterator[FrameDets],
              state: GroupState[TrackerState]): Iterator[VisionOut] = {
    var st = state.getOption.getOrElse(TrackerState.empty)
    val out = frames.toSeq.sortBy(_.eventMs).map { frame =>
      val dets = frame.detections.toIndexedSeq.map(d =>
        DetectionIn((d.x1 + d.x2) / 2.0, (d.y1 + d.y2) / 2.0, d.detType,
          BBox(d.x1, d.y1, d.x2, d.y2), d.age, d.gender, d.ageConf, d.genderConf))
      st = Tracker.update(st, dets, frame.eventMs)
      // reference: empty frame → `update` returns {} → emit 0 objects
      val visible = if (dets.isEmpty) Vector.empty else st.objects
      val outDets = visible.map { o =>
        val isPerson = o.objType == "Person"
        DetOut(o.id, o.objType, o.bbox.x1, o.bbox.y1, o.bbox.x2, o.bbox.y2,
          Centroid(o.cx.toInt, o.cy.toInt),
          math.rint((frame.eventMs - o.firstSeenMs) / 100.0) / 10.0,
          if (isPerson) Some(o.gender.getOrElse("Unknown")) else None,
          if (isPerson) Some(math.rint(o.genderConf * 100) / 100.0) else None,
          if (isPerson) Some(o.age.getOrElse("Unknown")) else None,
          if (isPerson) Some(math.rint(o.ageConf * 100) / 100.0) else None)
      }
      VisionOut(cameraId, frame.eventMs, outDets.size, outDets)
    }
    state.update(st)
    out.iterator
  }

  /** Apply tracking to a (streaming or batch) typed Dataset. */
  def track(frames: Dataset[FrameDets]): Dataset[VisionOut] = {
    import frames.sparkSession.implicits._
    frames.groupByKey(_.cameraId)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(trackFn)
  }

  /** Frame timestamps arrive as bare ISO local datetimes from the
    * bridge, but the collector path tolerates `Z`/offset suffixes —
    * accept both here too. An explicit offset is honored; a bare
    * datetime is fixed as UTC (the vision-pipeline contract; note
    * [[graft.functions.City.parseIsoTs]] resolves bare datetimes in the
    * SESSION timezone — identical only under the UTC sessions this
    * library pins, so don't treat the two as interchangeable
    * elsewhere). */
  private[streaming] def parseFrameTsMs(ts: String): Long =
    try java.time.OffsetDateTime.parse(ts).toInstant.toEpochMilli
    catch {
      case _: java.time.format.DateTimeParseException =>
        java.time.LocalDateTime.parse(ts)
          .toInstant(java.time.ZoneOffset.UTC).toEpochMilli
    }

  /** U1: deterministic synthetic detector standing in for YOLO (the
    * image libs aren't shipped; decode is stubbed). Detection count and
    * positions derive from a hash of (camera, frame) — stable across
    * runs. Heavy init would go in the mapPartitions setup (open()
    * analog).
    *
    * F22/U5: Person detections carry the body-heuristic demographics
    * (vision_prototype.py:145-216): bbox aspect ratio < 2.3 → Child
    * (0.65) else Adult (0.70/0.75 by ratio); gender from the
    * "clothing saturation" stand-in (a deterministic hash replaces the
    * pixel statistics the stubbed decode can't supply), base 0.55.
    * Confidences get the reference's ±jitter, deterministic per frame —
    * so confidences VARY across frames and the tracker's
    * strictly-higher-confidence upgrade path (W4) runs in streaming. */
  def syntheticDetect(frames: DataFrame): Dataset[FrameDets] = {
    import frames.sparkSession.implicits._
    // F13: real base64 decode of the frame payload (the reference's
    // b64decode at flink_vision_job_proper.py:149-151); undecodable or
    // empty payloads are guarded to zero detections (P4). Only the
    // image decode itself remains stubbed.
    frames.select(col("camera_id"), col("timestamp"), col("frame_number"),
        try_to_binary(col("frame_data"), lit("base64")).as("frame_bytes"))
      .as[(String, String, Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition "model load" happens here (amortized, like open())
        it.map { case (cam, ts, frameNo, frameBytes) =>
          val eventMs = parseFrameTsMs(ts)
          val valid = frameBytes != null && frameBytes.nonEmpty
          val n = if (!valid) 0 else (math.abs((cam + frameNo).hashCode) % 4)
          val dets = (0 until n).map { d =>
            val x = 50 + d * 150 + (frameNo % 50).toInt * 8
            val y = 80 + d * 90 + (frameNo % 50).toInt * 5
            val isPerson = d % 2 == 0
            val h = 100 + ((cam.hashCode.abs + d) % 3) * 40 // 100/140/180 px
            val w = 60
            if (!isPerson) DetRaw("Car", x, y, x + w, y + h)
            else {
              val aspect = h.toDouble / w
              val (age, ageBase) =
                if (aspect < 2.3) ("Child", 0.65)
                else if (aspect < 3.0) ("Adult", 0.70)
                else ("Adult", 0.75)
              // deterministic stand-ins for the reference's random jitter
              // (uniform(-0.1, +0.15) gender, (-0.1, +0.1) age) and for
              // the clothing-saturation gender split
              val mix = graft.operators.Sketches.mix64(
                cam.hashCode.toLong * 31 + frameNo * 7 + d)
              val gJit = ((mix & 0xff) / 255.0) * 0.25 - 0.10
              val aJit = (((mix >>> 8) & 0xff) / 255.0) * 0.20 - 0.10
              val gender = if (((mix >>> 16) & 1L) == 0L) "Male" else "Female"
              DetRaw("Person", x, y, x + w, y + h,
                age = Some(age), gender = Some(gender),
                ageConf = math.min(0.85, math.rint((ageBase + aJit) * 1000) / 1000),
                genderConf = math.min(0.85, math.rint((0.55 + gJit) * 1000) / 1000))
            }
          }
          FrameDets(cam, eventMs, dets)
        }
      }
  }

  /** W2: the 1-minute continuous aggregate (traffic_1min analog,
    * init-timescaledb.sql:50-68) with the ~2-minute lateness the
    * refresh policy implies. Works on the tracked output. */
  def continuousAgg(tracked: Dataset[VisionOut], withWatermark: Boolean = true): DataFrame = {
    val d0 = tracked.toDF()
      .withColumn("time", timestamp_millis(col("event_ms")))
      .withColumn("det", explode_outer(col("detections")))
    val d = if (withWatermark) d0.withWatermark("time", "2 minutes") else d0
    d.groupBy(window(col("time"), "1 minute").as("bucket"), col("camera_id"))
      .agg(count(col("det")).as("detection_count"),
        approx_count_distinct(col("det.object_id")).as("unique_objects"),
        avg(col("det.tracking_duration_seconds")).as("avg_duration"))
      .select(col("bucket.start").as("bucket"), col("camera_id"),
        col("detection_count"), col("unique_objects"), col("avg_duration"))
  }
}
