package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table helpers for co-located joins. A fact-fact equi-join
  * normally shuffles both sides on the key every query; writing both
  * tables bucketed (and sorted) by that key moves the shuffle to write
  * time — reads are already hash-partitioned, so the join plans with
  * zero exchanges. This is the storage-layout answer to the same
  * problem `Skew.saltedJoin` attacks at runtime, and the right default
  * for repeatedly-joined 100 TB fact tables. */
object Bucketed {

  /** Write `df` as a bucketed, sorted managed table (overwrites). Safe
    * to re-run across sessions: a fresh metastore can inherit a stale
    * warehouse directory from a previous run — `saveAsTable` refuses to
    * reuse the location even in overwrite mode — so any orphan location
    * for an unregistered table of this name is cleared first. */
  def save(df: DataFrame, table: String, key: String, buckets: Int = 32): Unit = {
    // the DROP quoting and the orphan-location probe below both assume
    // an unqualified name in the default database (a qualified name
    // lives at <warehouse>/<db>.db/<table> and would dodge the probe —
    // and the backticked DROP would target the wrong table)
    require(!table.contains("."),
      s"Bucketed.save takes an unqualified table name in the default database, got '$table'")
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"),
      table.toLowerCase(java.util.Locale.ROOT)) // catalog lowercases locale-free
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet").saveAsTable(table) // managed: spark.sql.warehouse.dir
  }

  /** Equi-join two tables previously saved with the same (key, buckets)
    * layout; planned shuffle-free. */
  def cojoin(spark: SparkSession, left: String, right: String,
             key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)
}
