package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import graft.functions.City

/** Bronze-lake collector semantics (SURVEY S7/W1/W6): append-only
  * records partitioned by EVENT-time-derived `year=/month=/day=/hour=`
  * dirs — late records land in old partitions by construction, and
  * read-side partition pruning is free.
  *
  * Partition key derivation replicates the collectors
  * (air_quality_collector.py:95-120): nested `data.timestamp` first,
  * envelope `timestamp` second, then an injectable fallback (the
  * reference uses wall clock — nondeterministic, so tests inject).
  */
object Lake {

  /** Event time for an enveloped record. */
  def eventTime(df: DataFrame, fallback: Column = current_timestamp()): Column = {
    val hasNested = df.schema.fields.exists(f => f.name == "data" &&
      f.dataType.isInstanceOf[StructType] &&
      f.dataType.asInstanceOf[StructType].fieldNames.contains("timestamp"))
    val candidates =
      if (hasNested) Seq(col("data.timestamp"), col("timestamp"))
      else Seq(col("timestamp"))
    City.parseIsoTs(coalesce(candidates: _*), fallback)
  }

  /** Append event-time partition key columns. */
  def withPartitionKeys(df: DataFrame, fallback: Column = current_timestamp()): DataFrame =
    df.select(col("*") +: City.partitionCols(eventTime(df, fallback)): _*)

  /** Write a bronze partition tree. `format` "json" mirrors the
    * reference's JSONL lake; "parquet" is the scale-path default. */
  def writeBronze(df: DataFrame, path: String, format: String = "json",
                  fallback: Column = current_timestamp()): Unit =
    withPartitionKeys(df, fallback).write.mode("append")
      .partitionBy("year", "month", "day", "hour").format(format).save(path)

  /** Read a bronze tree back with its declared schema; partition columns
    * come from the directory layout (pruning on them is free). */
  def readBronze(spark: SparkSession, path: String, schema: StructType,
                 format: String = "json"): DataFrame = {
    val partitioned = new StructType(
      (schema.fields ++ new StructType()
        .add("year", "string").add("month", "string")
        .add("day", "string").add("hour", "string").fields))
    spark.read.schema(partitioned).format(format)
      .option("basePath", path).load(path)
  }

  /** Register a bronze tree in the session catalog as a partitioned
    * table + MSCK REPAIR to discover partitions (S12). */
  def registerTable(spark: SparkSession, name: String, path: String,
                    schema: StructType, format: String = "json"): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    spark.sql(
      s"""CREATE TABLE $name (${schema.toDDL},
         |  year STRING, month STRING, day STRING, hour STRING)
         |USING $format
         |PARTITIONED BY (year, month, day, hour)
         |LOCATION '$path'""".stripMargin)
    spark.sql(s"MSCK REPAIR TABLE $name")
  }
}
