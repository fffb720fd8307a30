package graft.generator

import graft.SparkSpec
import graft.streaming.VisionStreamJob
import org.apache.spark.sql.functions._

class GeneratorSpec extends SparkSpec {
  import spark.implicits._

  test("F21: temperature follows the 15±10 sine anchored at 6h") {
    val rows = Generator.airQuality(spark, 24)
      .select(col("data.timestamp").as("ts"),
        col("data.measurements.temperature_celsius").as("t"))
      .collect()
    rows.foreach { r =>
      val tsStr = r.getString(0)
      // skip the deliberately-garbage timestamps (every 11th record)
      if (tsStr.matches("\\d{4}.*")) {
        val hour = java.time.LocalDateTime
          .parse(tsStr.stripSuffix("Z")).getHour
        val want = 15.0 + 10.0 * math.sin((hour - 6) * math.Pi / 12)
        assert(math.abs(r.getDouble(1) - want) < 0.06, s"t(${hour}h)=${r.getDouble(1)} want $want")
      }
    }
  }

  test("F20: parking events carry plates and exit durations through the schema") {
    val ev = Generator.parking(spark, 64)
      .select(col("data.parking_lot_id").as("lot"), col("data.event").as("e"))
      .filter(col("e").isNotNull && col("e.event_type").isNotNull)
    val rows = ev.collect()
    assert(rows.length == 16, s"every 4th record carries an event: ${rows.length}")
    val entered = ev.filter(col("e.event_type") === "vehicle_entered")
    val exited = ev.filter(col("e.event_type") === "vehicle_exited")
    assert(entered.count() > 0 && exited.count() > 0)
    // plate format where present; only the plate-recognition lot has them
    val plates = ev.select(col("lot"), col("e.license_plate")).na.drop().collect()
    assert(plates.nonEmpty)
    plates.foreach { p =>
      assert(p.getString(1).matches("LUX-[A-Z]{3}-[0-9]{3}"), p.getString(1))
      assert(p.getString(0) == "PARK_LUX_001", "only the configured lot reads plates")
    }
    // exits carry dwell minutes rounded to 1 dp; entries don't
    val durs = exited.select(col("e.duration_minutes")).collect().map(_.getDouble(0))
    assert(durs.forall(d => d > 0 && math.abs(d * 10 - math.rint(d * 10)) < 1e-9))
    assert(entered.filter(col("e.duration_minutes").isNotNull).count() == 0)
  }

  test("F22/U5: detector demographics flow through the tracker with confidence upgrades") {
    val frames = Generator.cameraFrames(spark, 40)
    val out = VisionStreamJob.track(VisionStreamJob.syntheticDetect(frames))
      .collect().sortBy(o => (o.camera_id, o.event_ms))
    val persons = out.flatMap(o => o.detections.filter(_.detection_type == "Person")
      .map(d => (o.camera_id, o.event_ms, d)))
    assert(persons.nonEmpty, "the synthetic detector must emit Person detections")
    // demographics populated (not the Unknown defaults)
    assert(persons.exists(p => p._3.gender.exists(g => g == "Male" || g == "Female")))
    assert(persons.exists(p => p._3.age.exists(a => a == "Adult" || a == "Child")))
    // W4 upgrade path: per (camera, object) the confidence never decreases
    persons.groupBy(p => (p._1, p._3.object_id)).foreach { case (key, hist) =>
      val confs = hist.sortBy(_._2).flatMap(_._3.gender_confidence)
      confs.sliding(2).filter(_.length == 2).foreach { w =>
        assert(w(1) >= w(0), s"$key gender conf dropped ${w(0)} -> ${w(1)}")
      }
    }
    // and at least one object actually upgraded (jitter makes confs vary)
    val upgraded = persons.groupBy(p => (p._1, p._3.object_id)).exists { case (_, hist) =>
      val confs = hist.sortBy(_._2).flatMap(_._3.gender_confidence)
      confs.distinct.size > 1
    }
    assert(upgraded, "some object must see a strictly-higher-confidence upgrade")
  }
}
