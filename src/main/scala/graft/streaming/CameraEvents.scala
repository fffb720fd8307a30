package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** The `camera_events` warehouse leg (init-db.sql:58-68): `(camera_id,
  * zone, event_type, vehicle_count, pedestrian_count, timestamp,
  * created_at)` — an append-only event log, indexed by (zone,
  * timestamp). The reference declares the table but ships no writer
  * (the same gap `realtime_metrics` had); this is the populating job:
  * tracked vision output shaped into one summary row per (camera,
  * frame), counts split Person vs everything-else, zone attached from
  * the camera dimension by broadcast (the J1/J2 stream-static enrich —
  * unknown cameras keep a NULL zone rather than dropping the event).
  *
  * `created_at` is the DDL's insert-time audit column — the one place
  * the wall clock is correct by definition; event time stays in
  * `timestamp`. */
object CameraEvents {

  /** One `camera_events` row per tracked frame. */
  def fromTracked(tracked: Dataset[VisionOut], cameraDim: DataFrame): DataFrame =
    tracked.toDF()
      .select(col("camera_id"),
        lit("frame_summary").as("event_type"),
        size(filter(col("detections"),
          d => d("detection_type") =!= "Person")).as("vehicle_count"),
        size(filter(col("detections"),
          d => d("detection_type") === "Person")).as("pedestrian_count"),
        timestamp_millis(col("event_ms")).as("timestamp"))
      .join(broadcast(cameraDim.select(col("camera_id"), col("zone"))),
        Seq("camera_id"), "left")
      .select(col("camera_id"), col("zone"), col("event_type"),
        col("vehicle_count"), col("pedestrian_count"), col("timestamp"),
        current_timestamp().as("created_at"))

  /** Append a batch of event rows (the event-log contract — unlike
    * [[RealtimeMetrics.upsertSnapshot]]'s latest-values overwrite).
    * From a stream, call inside `foreachBatch` like the
    * [[DualSink]] JDBC leg. Column types pinned for dialects that map
    * StringType to CLOB (Derby). */
  def appendJdbc(rows: DataFrame, jdbcUrl: String,
                 table: String = "camera_events",
                 jdbcProps: Map[String, String] = Map.empty): Unit = {
    val props = new java.util.Properties()
    jdbcProps.foreach { case (k, v) => props.setProperty(k, v) }
    rows.write.mode("append")
      .option("createTableColumnTypes",
        "camera_id VARCHAR(100), zone VARCHAR(100), event_type VARCHAR(50)")
      .jdbc(jdbcUrl, table, props)
  }
}
