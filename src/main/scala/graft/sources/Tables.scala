package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver's test tables (`/root/testdata/sf*`).
  *
  * `events.parquet` stores TIMESTAMP(NANOS), which Spark 4's vectorized
  * parquet reader rejects (`PARQUET_TYPE_ILLEGAL`). We read it with the
  * legacy nanos-as-long conf and convert to a microsecond TIMESTAMP
  * (truncation — matches DuckDB's behavior when comparing at second
  * granularity). All other tables read natively.
  */
object Tables {
  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = name match {
    case "events" =>
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$sfDir/events.parquet")
      // integer `div`, not `/` — double division loses sub-us precision
      // on 2^60-size nanosecond epochs
      raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    case other =>
      spark.read.parquet(s"$sfDir/$other.parquet")
  }

  /** Register every table as a temp view for the SQL surface (S12/A8). */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
