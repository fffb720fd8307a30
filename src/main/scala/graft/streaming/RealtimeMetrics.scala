package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The `realtime_metrics` dashboard table analog (init-db.sql:85-89):
  * `(metric_key VARCHAR PRIMARY KEY, metric_value JSONB, updated_at
  * TIMESTAMP)` — latest values only, keyed. The reference declares the
  * table but ships no writer; this is the missing populating job,
  * Spark-first:
  *
  *  - the VALUE is a JSON document (`to_json` of the metric struct) —
  *    Postgres JSONB accepts the text form on insert, and every other
  *    JDBC target stores it as VARCHAR, so the portable column type is
  *    the JSON string;
  *  - "latest values" + Spark JDBC (no per-row MERGE in the DataFrame
  *    API) means each refresh writes the COMPLETE current snapshot
  *    with overwrite + truncate: idempotent under foreachBatch's
  *    at-least-once replay (a replayed snapshot converges where an
  *    append would duplicate), and `truncate` keeps externally-created
  *    DDL (the primary key) instead of dropping the table. A
  *    Postgres-native deployment could swap in INSERT .. ON CONFLICT;
  *    the semantics are the same.
  */
object RealtimeMetrics {

  /** Generic shaping: any aggregate frame → `(metric_key,
    * metric_value, updated_at)` rows where the value document carries
    * every column except the key. `asOfMs` is caller-supplied event
    * time — the library never reads the wall clock. */
  def toKeyValue(df: DataFrame, keyCol: String, asOfMs: Long): DataFrame = {
    val docCols = df.columns.filterNot(_ == keyCol).map(col)
    df.select(col(keyCol).cast("string").as("metric_key"),
      to_json(struct(docCols.toIndexedSeq: _*)).as("metric_value"),
      timestamp_millis(lit(asOfMs)).as("updated_at"))
  }

  /** Snapshot of a [[CollectorMetrics]] listener as dashboard rows —
    * one key per operational counter (the collectors' stats dicts,
    * air_quality_collector.py:165-179), values as JSON docs. Driver-
    * side by nature: these are the stream's observed counters, five
    * numbers, not data rows. */
  def collectorSnapshot(spark: SparkSession, m: CollectorMetrics,
                        asOfMs: Long): DataFrame = {
    import spark.implicits._
    val rate = math.rint(m.ratePerSec * 100) / 100
    Seq(
      ("collector_records", s"""{"value":${m.records.get()}}"""),
      ("collector_objects", s"""{"value":${m.objects.get()}}"""),
      ("collector_batches", s"""{"value":${m.batches.get()}}"""),
      ("collector_last_batch_id", s"""{"value":${m.lastBatchId}}"""),
      ("collector_rate_per_sec", s"""{"value":$rate}"""))
      .toDF("metric_key", "metric_value")
      .select(col("metric_key"), col("metric_value"),
        timestamp_millis(lit(asOfMs)).as("updated_at"))
  }

  /** Write a snapshot as THE table contents (latest-values contract).
    * Overwrite + truncate: see the object doc for why this is the
    * portable upsert. When the table doesn't exist yet it is created
    * with VARCHAR key/value columns matching the reference DDL shape
    * (several JDBC dialects — Derby included — would otherwise map
    * StringType to CLOB, which can't even be compared to a literal);
    * a pre-created table (the init-db.sql DDL, JSONB and all) is kept
    * as-is thanks to `truncate`. */
  def upsertSnapshot(rows: DataFrame, jdbcUrl: String,
                     table: String = "realtime_metrics",
                     jdbcProps: Map[String, String] = Map.empty): Unit = {
    val props = new java.util.Properties()
    jdbcProps.foreach { case (k, v) => props.setProperty(k, v) }
    rows.write.mode("overwrite").option("truncate", "true")
      .option("createTableColumnTypes",
        "metric_key VARCHAR(100), metric_value VARCHAR(8000)")
      .jdbc(jdbcUrl, table, props)
  }
}
