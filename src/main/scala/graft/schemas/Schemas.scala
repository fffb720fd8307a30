package graft.schemas

import org.apache.spark.sql.types._

/** Declared schemas for the smart-city lake tables, ported from the
  * reference's canonical type authority
  * (/root/reference/pipline2/setup_smart_city_hive.hql) — schema
  * inference is a correctness hazard at 100 TB, so every source reads
  * with one of these (SURVEY §1.4).
  */
object Schemas {

  private def st(fields: (String, DataType)*): StructType =
    StructType(fields.map { case (n, t) => StructField(n, t) })

  val gps: StructType = st("latitude" -> DoubleType, "longitude" -> DoubleType)

  val location: StructType = st("gps" -> gps, "city" -> StringType,
    "zone" -> StringType, "address" -> StringType)

  // ---- air_quality (setup_smart_city_hive.hql:29-48) ----
  val airQualityData: StructType = st(
    "device_type" -> StringType, "protocol" -> StringType,
    "sensor_id" -> StringType, "sensor_name" -> StringType,
    "timestamp" -> StringType, "location" -> location,
    "measurements" -> st("pm25" -> DoubleType, "pm10" -> DoubleType,
      "no2" -> DoubleType, "co" -> DoubleType, "o3" -> DoubleType,
      "so2" -> DoubleType, "temperature_celsius" -> DoubleType,
      "humidity_percent" -> DoubleType),
    "aqi" -> st("value" -> IntegerType, "category" -> StringType,
      "health_advisory" -> StringType),
    "sensor_status" -> st("online" -> BooleanType,
      "calibration_date" -> StringType, "battery_percent" -> IntegerType,
      "signal_strength" -> IntegerType))

  // ---- parking (setup_smart_city_hive.hql:51-72) ----
  val parkingData: StructType = st(
    "device_type" -> StringType, "protocol" -> StringType,
    "parking_lot_id" -> StringType, "parking_lot_name" -> StringType,
    "timestamp" -> StringType, "location" -> location,
    "occupancy" -> st("total_spots" -> IntegerType,
      "occupied_spots" -> IntegerType, "available_spots" -> IntegerType,
      "occupancy_rate" -> DoubleType, "status" -> StringType),
    "vehicle_breakdown" -> MapType(StringType, IntegerType),
    "pricing" -> st("current_rate_per_hour" -> DoubleType, "currency" -> StringType),
    "sensor_status" -> st("online_sensors" -> IntegerType,
      "offline_sensors" -> IntegerType, "battery_low" -> IntegerType),
    "event" -> st("event_type" -> StringType, "spot_id" -> StringType,
      "vehicle_type" -> StringType, "license_plate" -> StringType,
      "timestamp" -> StringType, "duration_minutes" -> DoubleType))

  // ---- traffic edges (setup_smart_city_hive.hql:77-98) ----
  val trafficEdgeData: StructType = st(
    "device_type" -> StringType, "edge_id" -> StringType,
    "timestamp" -> StringType, "simulation_time" -> DoubleType,
    "traffic_data" -> st("vehicle_count" -> IntegerType,
      "average_speed_kmh" -> DoubleType, "lane_occupancy" -> DoubleType,
      "congestion_level" -> StringType,
      "vehicle_types" -> MapType(StringType, IntegerType)))

  // ---- traffic vehicles (setup_smart_city_hive.hql:105-127) ----
  val trafficVehicleData: StructType = st(
    "vehicle_id" -> StringType, "timestamp" -> StringType,
    "simulation_time" -> DoubleType,
    "vehicle_info" -> st("type" -> StringType, "vehicle_class" -> StringType),
    "location" -> st(
      "position" -> st("x" -> DoubleType, "y" -> DoubleType),
      "road_id" -> StringType, "lane_id" -> StringType),
    "dynamics" -> st("speed_kmh" -> DoubleType, "acceleration" -> DoubleType),
    "emissions" -> st("co2_mg_s" -> DoubleType, "fuel_ml_s" -> DoubleType),
    "traffic_state" -> st("waiting_time_s" -> DoubleType))

  // ---- traffic lights (setup_smart_city_hive.hql:131-146) ----
  val trafficLightData: StructType = st(
    "timestamp" -> StringType, "traffic_light_id" -> StringType,
    "state" -> StringType, "phase_duration" -> IntegerType,
    "next_switch" -> IntegerType)

  // ---- simulation stats (setup_smart_city_hive.hql:151-169) ----
  val simulationStatsData: StructType = st(
    "timestamp" -> StringType, "simulation_time" -> DoubleType,
    "statistics" -> st("vehicles_departed" -> IntegerType,
      "vehicles_arrived" -> IntegerType, "vehicles_current" -> IntegerType,
      "vehicles_loaded" -> IntegerType))

  /** Bridge envelope wrapping every MQTT-originated record
    * (mqtt_to_kafka_bridge.py:175-180). */
  def enveloped(data: StructType): StructType = st(
    "mqtt_topic" -> StringType, "timestamp" -> StringType,
    "bridge_received_at" -> StringType, "data" -> data)

  val airQuality: StructType = enveloped(airQualityData)
  val parking: StructType = enveloped(parkingData)
  val trafficEdges: StructType = enveloped(trafficEdgeData)
  val trafficVehicles: StructType = enveloped(trafficVehicleData)
  val trafficLights: StructType = enveloped(trafficLightData)
  val simulationStats: StructType = enveloped(simulationStatsData)

  // ---- vision detections (setup_smart_city_hive.hql:7-26; NOT enveloped) ----
  val boundingBox: StructType = st("x1" -> IntegerType, "y1" -> IntegerType,
    "x2" -> IntegerType, "y2" -> IntegerType)

  val detection: StructType = st(
    "object_id" -> IntegerType, "type" -> StringType,
    "bounding_box" -> boundingBox,
    "centroid" -> st("x" -> IntegerType, "y" -> IntegerType),
    "tracking_duration_seconds" -> DoubleType,
    "gender" -> StringType, "gender_confidence" -> DoubleType,
    "age" -> StringType, "age_confidence" -> DoubleType)

  val visionDetections: StructType = st(
    "camera_id" -> StringType, "timestamp" -> StringType,
    "total_objects" -> IntegerType,
    "detections" -> ArrayType(detection))

  /** Camera frame message — flat, NOT enveloped
    * (rtsp_to_kafka_bridge.py:204-217). */
  val cameraFrame: StructType = st(
    "camera_id" -> StringType, "camera_name" -> StringType,
    "location" -> StringType, "camera_type" -> StringType,
    "timestamp" -> StringType, "frame_number" -> LongType,
    "width" -> IntegerType, "height" -> IntegerType,
    "format" -> StringType, "frame_data" -> StringType)

  /** Flat traffic analytics event — the batch job's input shape
    * (traffic_batch_processing.py:50-59). */
  val trafficEvent: StructType = st(
    "sensor_id" -> StringType, "road_id" -> StringType,
    "road_type" -> StringType, "zone" -> StringType,
    "vehicle_count" -> StringType, "average_speed" -> StringType,
    "occupancy_rate" -> StringType, "event_time" -> StringType)
}
