package graft.generator

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import graft.schemas.Schemas

/** Deterministic (seeded) fixture generators mirroring the reference
  * simulators' payload shapes (SURVEY §1.3, FIXTURES.md). Emits JSON
  * lines parsed through the declared schemas — the same path real lake
  * data takes. Never uses wall clock; all timestamps derive from a
  * fixed base instant.
  *
  * Payload shapes: air_quality_simulator.py:149-185,
  * parking_simulator.py:173-209, sumo_mqtt_connector.py:132-160,
  * rtsp_to_kafka_bridge.py:204-217.
  */
object Generator {
  val Seed = 42L
  val BaseEpochSec: Long = 1767103200L // 2025-12-30T14:00:00Z

  // Always emits seconds (Python isoformat style) — LocalDateTime.toString
  // drops ":00" seconds, which breaks offset-suffixed parses downstream.
  private val isoFmt = java.time.format.DateTimeFormatter
    .ofPattern("yyyy-MM-dd'T'HH:mm:ss")
  private def iso(epochSec: Long, micros: Int = 0, suffix: String = ""): String = {
    val i = java.time.Instant.ofEpochSecond(epochSec, micros * 1000L)
    val dt = java.time.LocalDateTime.ofInstant(i, java.time.ZoneOffset.UTC)
    val frac = if (micros > 0) f".${micros}%06d" else ""
    isoFmt.format(dt) + frac + suffix
  }

  /** PM2.5 values straddling every AQI breakpoint (FIXTURES.md §1). */
  val pm25Breakpoints: Seq[Double] =
    Seq(11.9, 12.0, 12.1, 35.4, 35.5, 55.4, 55.5, 150.4, 150.5, 250.4, 260.0, 600.0)

  private def jsonDs(spark: SparkSession, lines: Seq[String]): Dataset[String] = {
    import spark.implicits._
    spark.createDataset(lines)
  }

  /** Enveloped air-quality records; every 7th timestamp is Z-suffixed and
    * every 11th is garbage (exercises the parse-fallback path F8). */
  def airQuality(spark: SparkSession, n: Int, seed: Long = Seed): DataFrame = {
    val rnd = new scala.util.Random(seed)
    val zones = Seq("downtown", "industrial")
    val lines = (0 until n).map { i =>
      val pm25 = pm25Breakpoints(i % pm25Breakpoints.size) + rnd.nextDouble() * 0.01
      val sensor = s"AQ_LUX_${"%03d".format(i % 2 + 1)}"
      val zone = zones(i % 2)
      val tsEpoch = BaseEpochSec + i * 300L
      val ts =
        if (i % 11 == 10) "not-a-timestamp"
        else if (i % 7 == 6) iso(tsEpoch, 0, "Z")
        else iso(tsEpoch)
      val pm10 = pm25 * 1.7
      // F21: sine-wave daily temperature 15±10 °C anchored at 6h
      // (air_quality_simulator.py:146), from the record's event hour.
      val hour = java.time.Instant.ofEpochSecond(tsEpoch)
        .atZone(java.time.ZoneOffset.UTC).getHour
      val temp = 15.0 + 10.0 * math.sin((hour - 6) * math.Pi / 12)
      s"""{"mqtt_topic":"air_quality/$sensor/data","timestamp":"${iso(tsEpoch)}","bridge_received_at":"${iso(tsEpoch + 1)}","data":{"device_type":"air_quality_sensor","protocol":"MQTT","sensor_id":"$sensor","sensor_name":"Station $sensor","timestamp":"$ts","location":{"gps":{"latitude":49.6116,"longitude":6.1319},"city":"Luxembourg City","zone":"$zone","address":"Boulevard Royal"},"measurements":{"pm25":${"%.3f".format(pm25)},"pm10":${"%.3f".format(pm10)},"no2":${"%.2f".format(20 + rnd.nextDouble() * 40)},"co":${"%.3f".format(rnd.nextDouble() * 2)},"o3":${"%.2f".format(rnd.nextDouble() * 60)},"so2":${"%.2f".format(rnd.nextDouble() * 10)},"temperature_celsius":${"%.1f".format(temp)},"humidity_percent":${"%.1f".format(40 + rnd.nextDouble() * 50)}},"aqi":null,"sensor_status":{"online":true,"calibration_date":"2025-12-01","battery_percent":${50 + rnd.nextInt(50)},"signal_strength":${40 + rnd.nextInt(60)}}}}"""
    }
    spark.read.schema(Schemas.airQuality).json(jsonDs(spark, lines))
  }

  /** Deterministic Luxembourg-style plate `LUX-AAA-999`
    * (parking_simulator.py:103-105). */
  private def plate(rnd: scala.util.Random): String = {
    val letters = (0 until 3).map(_ => ('A' + rnd.nextInt(26)).toChar).mkString
    val digits = (0 until 3).map(_ => rnd.nextInt(10)).mkString
    s"LUX-$letters-$digits"
  }

  /** Enveloped parking status records with MAP vehicle_breakdown. Every
    * 4th record carries a parking `event` (F20,
    * parking_simulator.py:103-154): alternating vehicle_entered (with a
    * license plate when the lot has plate recognition — lot 1 only, like
    * the reference's per-lot config flag) and vehicle_exited (with plate
    * and dwell `duration_minutes` rounded to 1 dp). */
  def parking(spark: SparkSession, n: Int, seed: Long = Seed): DataFrame = {
    val rnd = new scala.util.Random(seed)
    val vehicleTypes = Seq("sedan", "suv", "truck", "motorcycle", "electric")
    val lines = (0 until n).map { i =>
      val lot = s"PARK_LUX_${"%03d".format(i % 3 + 1)}"
      val total = 100 + (i % 3) * 50
      val occupied = rnd.nextInt(total + 1)
      val rate = math.rint(occupied.toDouble / total * 100) / 100
      val status =
        if (rate >= 0.95) "full" else if (rate >= 0.80) "high"
        else if (rate >= 0.50) "medium" else "low"
      val price = math.rint(2.5 * (1 + rate * 0.5) * 100) / 100
      val cars = (occupied * 0.8).toInt
      val breakdown = s"""{"car":$cars,"motorcycle":${occupied - cars}}"""
      val ts = iso(BaseEpochSec + i * 30L)
      val event =
        if (i % 4 != 3) "null"
        else {
          val spot = s"SPOT_${"%03d".format(rnd.nextInt(total) + 1)}"
          val vt = vehicleTypes(rnd.nextInt(vehicleTypes.size))
          val hasPlates = i % 3 == 0 // lot PARK_LUX_001 has plate recognition
          val lp = if (hasPlates) "\"" + plate(rnd) + "\"" else "null"
          if (i % 8 == 3)
            s"""{"event_type":"vehicle_entered","spot_id":"$spot","vehicle_type":"$vt","license_plate":$lp,"timestamp":"$ts","duration_minutes":null}"""
          else {
            val durMin = math.rint((5 * 60 + rnd.nextInt(4 * 3600)) / 60.0 * 10) / 10
            s"""{"event_type":"vehicle_exited","spot_id":"$spot","vehicle_type":"$vt","license_plate":$lp,"timestamp":"$ts","duration_minutes":$durMin}"""
          }
        }
      s"""{"mqtt_topic":"parking/$lot/status","timestamp":"$ts","bridge_received_at":"$ts","data":{"device_type":"parking_iot_sensor","protocol":"LoRaWAN","parking_lot_id":"$lot","parking_lot_name":"Lot $lot","timestamp":"$ts","location":{"gps":{"latitude":49.61,"longitude":6.13},"city":"Luxembourg City","zone":"downtown","address":"Rue $i"},"occupancy":{"total_spots":$total,"occupied_spots":$occupied,"available_spots":${total - occupied},"occupancy_rate":$rate,"status":"$status"},"vehicle_breakdown":$breakdown,"pricing":{"current_rate_per_hour":$price,"currency":"EUR"},"sensor_status":{"online_sensors":$total,"offline_sensors":0,"battery_low":${rnd.nextInt(5)}},"event":$event}}"""
    }
    spark.read.schema(Schemas.parking).json(jsonDs(spark, lines))
  }

  /** Enveloped traffic-edge records with vehicle_types MAP. */
  def trafficEdges(spark: SparkSession, n: Int, seed: Long = Seed): DataFrame = {
    val rnd = new scala.util.Random(seed)
    val lines = (0 until n).map { i =>
      val edge = s"edge_${i % 20}"
      val count = 1 + rnd.nextInt(30)
      val speed = math.rint((5 + rnd.nextDouble() * 85) * 10) / 10
      val occ = math.rint(rnd.nextDouble() * 100) / 100
      val congestion =
        if (occ > 0.8 || speed < 20) "high"
        else if (occ > 0.5 || speed < 40) "medium" else "low"
      val cars = (count * 0.7).toInt
      val trucks = count - cars
      val ts = iso(BaseEpochSec + i * 5L)
      s"""{"mqtt_topic":"traffic/sumo/edges/$edge","timestamp":"$ts","bridge_received_at":"$ts","data":{"device_type":"sumo_edge_sensor","edge_id":"$edge","timestamp":"$ts","simulation_time":${i * 5.0},"traffic_data":{"vehicle_count":$count,"average_speed_kmh":$speed,"lane_occupancy":$occ,"congestion_level":"$congestion","vehicle_types":{"passenger":$cars,"truck":$trucks}}}}"""
    }
    spark.read.schema(Schemas.trafficEdges).json(jsonDs(spark, lines))
  }

  /** Flat traffic analytics events — batch-job input
    * (traffic_batch_processing.py:50-59). Values are JSON strings to
    * exercise the job's casts. */
  def trafficEvents(spark: SparkSession, n: Int, seed: Long = Seed): DataFrame = {
    val rnd = new scala.util.Random(seed)
    val zones = Seq("downtown", "industrial", "residential", "commercial")
    val roadTypes = Seq("highway", "arterial", "local")
    val lines = (0 until n).map { i =>
      val zone = zones(rnd.nextInt(zones.size))
      val rt = roadTypes(rnd.nextInt(roadTypes.size))
      val ts = iso(BaseEpochSec + (i / 8) * 3600L) // 8 sensors per hourly batch
      s"""{"sensor_id":"TS_${"%03d".format(i % 8)}","road_id":"R${i % 25}","road_type":"$rt","zone":"$zone","vehicle_count":"${rnd.nextInt(120)}","average_speed":"${"%.1f".format(5 + rnd.nextDouble() * 100)}","occupancy_rate":"${"%.2f".format(rnd.nextDouble())}","event_time":"$ts"}"""
    }
    spark.read.schema(Schemas.trafficEvent).json(jsonDs(spark, lines))
  }

  /** Flat camera-frame messages (rtsp_to_kafka_bridge.py:204-217):
    * camera metadata merged in, frame payload as base64 of a REAL tiny
    * JPEG (encoded with the JDK codec — deterministic gradient pixels
    * varying per frame, so downstream decode sees genuine compressed
    * image bytes like the reference's re-encoded RTSP frames). */
  def cameraFrames(spark: SparkSession, n: Int, seed: Long = Seed): DataFrame =
    spark.read.schema(Schemas.cameraFrame).json(jsonDs(spark, cameraFrameLines(n)))

  /** Raw JSON lines of [[cameraFrames]] (what rides on the wire). */
  def cameraFrameLines(n: Int): Seq[String] = (0 until n).map { i =>
    val cam = s"CAM_${"%02d".format(i % 2 + 1)}"
    val ts = iso(BaseEpochSec + i / 2, (i % 2) * 500000)
    val jpeg = graft.operators.Multimodal.Codec.encodeJpeg(
      graft.operators.Multimodal.Codec.grayImage(16, 12)(
        (x, y) => (x * 7 + y * 11 + i * 13) % 256))
    val payload = java.util.Base64.getEncoder.encodeToString(jpeg)
    s"""{"camera_id":"$cam","camera_name":"Camera $cam","location":"Gare","camera_type":"traffic","timestamp":"$ts","frame_number":$i,"width":16,"height":12,"format":"jpeg","frame_data":"$payload"}"""
  }

  /** Synthetic camera-frame detection messages (flat, not enveloped):
    * deterministic detector substitute for YOLO (U1) — each frame i has
    * (i % 4) detections walking diagonally, so the tracker sees smooth
    * motion. */
  def visionDetections(spark: SparkSession, frames: Int, seed: Long = Seed): DataFrame = {
    val lines = (0 until frames).map { i =>
      val cam = s"CAM_${"%02d".format(i % 2 + 1)}"
      val nDet = i % 4
      val dets = (0 until nDet).map { d =>
        val x = 50 + d * 150 + (i / 2) * 8 // drifts right over time
        val y = 80 + d * 90 + (i / 2) * 5
        val typ = if (d % 2 == 0) "Person" else "Car"
        s"""{"object_id":null,"type":"$typ","bounding_box":{"x1":$x,"y1":$y,"x2":${x + 60},"y2":${y + 120}},"centroid":{"x":${x + 30},"y":${y + 60}},"tracking_duration_seconds":null,"gender":null,"gender_confidence":null,"age":null,"age_confidence":null}"""
      }.mkString("[", ",", "]")
      val ts = iso(BaseEpochSec + i / 2, (i % 2) * 500000)
      s"""{"camera_id":"$cam","timestamp":"$ts","total_objects":$nDet,"detections":$dets}"""
    }
    spark.read.schema(Schemas.visionDetections).json(jsonDs(spark, lines))
  }
}
