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
    // resolve the location from the catalog's default database — the
    // value the catalog actually uses — not the session conf, which can
    // drift from it (shared state pins the boot-time warehouse; a
    // session-modified conf would make this probe look at the wrong
    // directory)
    val loc = new org.apache.hadoop.fs.Path(
      new org.apache.hadoop.fs.Path(new java.net.URI(
        spark.catalog.getDatabase("default").locationUri)),
      table.toLowerCase(java.util.Locale.ROOT)) // catalog lowercases locale-free
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // destructive delete: only clear the orphan if it actually looks
    // like a Spark table directory (committed _SUCCESS marker or
    // parquet part-files), never an arbitrary directory that happens
    // to collide with the table name
    def looksLikeTableDir: Boolean = {
      val entries = fs.listStatus(loc).map(_.getPath.getName)
      entries.isEmpty || entries.contains("_SUCCESS") ||
        entries.exists(n => n.startsWith("part-") || n.endsWith(".parquet"))
    }
    if (fs.exists(loc) && fs.getFileStatus(loc).isDirectory && looksLikeTableDir)
      fs.delete(loc, true)
    df.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet").saveAsTable(table) // managed: spark.sql.warehouse.dir
  }

  /** [[save]] only when `table` is not already registered — the
    * build/serve split for the bucketed lifecycle: the one-time
    * write-shuffle (build) runs on first call, and every later call is
    * a no-op so the caller's join measures only the serve path. The
    * caller owns staleness — encode the dataset identity in the table
    * name if the same session serves multiple inputs. */
  def ensure(df: => DataFrame, table: String, key: String, buckets: Int = 32)
            (implicit spark: SparkSession): Unit =
    if (!spark.catalog.tableExists(table)) save(df, table, key, buckets)

  /** Equi-join two tables previously saved with the same (key, buckets)
    * layout; planned shuffle-free. */
  def cojoin(spark: SparkSession, left: String, right: String,
             key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)
}
