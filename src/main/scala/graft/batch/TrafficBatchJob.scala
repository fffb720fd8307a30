package graft.batch

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.City
import graft.schemas.Schemas

/** The reference's batch analytics job, re-expressed Spark-first
  * (traffic_batch_processing.py — SURVEY §3.1). Differences, by design:
  *  - declared schema instead of inference (inference = extra full scan
  *    and a correctness hazard at 100 TB); `inferSchema=true` keeps the
  *    reference-compat mode
  *  - the reference's `avg_speed` column-name bug in the JDBC projection
  *    (`:111-113` selects a column that doesn't exist) is fixed
  *  - groupBy on raw `timestamp` (near-per-record groups) kept for
  *    parity; windowed variant is the sane default for real data
  */
object TrafficBatchJob {

  /** P1 casts + P2 congestion derivation. */
  def transform(raw: DataFrame): DataFrame =
    raw.select(
      col("sensor_id"), col("road_id"), col("road_type"), col("zone"),
      col("vehicle_count").cast("int").as("vehicle_count"),
      col("average_speed").cast("float").as("average_speed"),
      col("occupancy_rate").cast("float").as("occupancy_rate"),
      City.parseIsoTs(col("event_time")).as("timestamp"))
      .withColumn("congestion_level", City.congestionOccupancy(col("occupancy_rate")))

  /** A1: zone aggregation (hash agg w/ partial map-side combine). */
  def zoneAnalytics(traffic: DataFrame, windowed: Boolean = false): DataFrame = {
    val timeKey = if (windowed) window(col("timestamp"), "1 hour")("start").as("timestamp")
                  else col("timestamp")
    traffic.groupBy(col("zone"), timeKey)
      .agg(avg("average_speed").as("avg_speed"),
        sum("vehicle_count").as("total_vehicles"),
        avg("occupancy_rate").as("avg_occupancy"))
  }

  /** A2: road-type aggregation. */
  def roadAnalytics(traffic: DataFrame, windowed: Boolean = false): DataFrame = {
    val timeKey = if (windowed) window(col("timestamp"), "1 hour")("start").as("timestamp")
                  else col("timestamp")
    traffic.groupBy(col("road_type"), timeKey)
      .agg(avg("average_speed").as("avg_speed"),
        count(lit(1)).as("event_count"),
        avg("occupancy_rate").as("avg_occupancy"))
  }

  /** A7: the `hourly_traffic_stats` rollup — the reference declares the
    * table (init-db.sql:72-82) and plans an `hourly_analytics.py`
    * (pipline2/README.md:57) but never wrote the job; this is it. */
  def hourlyStats(traffic: DataFrame): DataFrame =
    traffic.groupBy(col("zone"), date_trunc("hour", col("timestamp")).as("hour"))
      .agg(sum("vehicle_count").as("total_vehicles"),
        avg("average_speed").as("avg_speed"),
        max("occupancy_rate").as("peak_congestion"))

  /** A3-A5 summary row. */
  def summary(traffic: DataFrame): DataFrame =
    traffic.agg(count(lit(1)).as("total_events"),
      countDistinct(col("zone")).as("unique_zones"),
      countDistinct(col("road_id")).as("unique_roads"),
      min("timestamp").as("min_ts"), max("timestamp").as("max_ts"))

  /** Full pipeline: read JSONL lake → transform → write parquet-by-zone
    * → optional JDBC sink (S3). Returns the transformed frame. */
  def run(spark: SparkSession, rawPath: String, processedPath: String,
          jdbcUrl: Option[String] = None,
          jdbcProps: Map[String, String] = Map.empty,
          inferSchema: Boolean = false): DataFrame = {
    // NB: the reference reads its JSONL lake with multiline=true
    // (traffic_batch_processing.py:40-42), which makes Spark parse each
    // FILE as a single JSON document — only the first record per file
    // survives. We read JSONL correctly (one record per line) in both
    // modes and do not copy that bug.
    val raw =
      if (inferSchema) spark.read.json(rawPath)
      else spark.read.schema(Schemas.trafficEvent).json(rawPath)
    val traffic = transform(raw)

    // S2: columnar processed store, partitioned by zone.
    traffic.write.mode("append").partitionBy("zone")
      .parquet(s"$processedPath/traffic_events")

    // S3: JDBC sink with corrected projection + created_at (P7).
    jdbcUrl.foreach { url =>
      val props = new java.util.Properties()
      jdbcProps.foreach { case (k, v) => props.setProperty(k, v) }
      traffic.select(col("zone"), col("road_id"), col("road_type"),
          col("average_speed"), col("vehicle_count"), col("occupancy_rate"),
          col("congestion_level"), col("timestamp"))
        .withColumn("created_at", current_timestamp())
        .write.mode("append").jdbc(url, "traffic_analytics", props)
    }
    traffic
  }
}
