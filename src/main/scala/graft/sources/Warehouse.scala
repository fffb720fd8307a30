package graft.sources

import org.apache.spark.sql.SparkSession

/** Warehouse-directory hygiene shared by every build-once table writer
  * ([[Bucketed]], `Dedup.ensureNgramTables`, demo jobs): a fresh
  * metastore can inherit a stale warehouse directory from a previous
  * session — `saveAsTable` refuses to reuse the location even in
  * overwrite mode (LOCATION_ALREADY_EXISTS) — so the orphan location of
  * an UNREGISTERED table must be cleared before writing. */
object Warehouse {

  /** Fail fast on qualified names: a qualified table lives at
    * `<warehouse>/<db>.db/<table>` and would dodge the orphan probe
    * (and backticked DROPs elsewhere would target the wrong table). */
  def requireUnqualified(table: String, who: String): Unit =
    require(!table.contains("."),
      s"$who takes an unqualified table name in the default database, got '$table'")

  /** Delete the default-database location for `table` if it exists but
    * the catalog has no such table. The location is resolved from the
    * catalog's default database — the value the catalog actually uses —
    * not the session conf, which can drift from it. Destructive delete
    * is gated on the directory actually looking like a Spark table dir
    * (committed _SUCCESS marker or part/parquet files), never an
    * arbitrary directory that happens to collide with the name. */
  def clearOrphanLocation(spark: SparkSession, table: String): Unit = {
    requireUnqualified(table, "Warehouse.clearOrphanLocation")
    if (spark.catalog.tableExists(table)) return
    val loc = new org.apache.hadoop.fs.Path(
      new org.apache.hadoop.fs.Path(new java.net.URI(
        spark.catalog.getDatabase("default").locationUri)),
      table.toLowerCase(java.util.Locale.ROOT)) // catalog lowercases locale-free
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def looksLikeTableDir: Boolean = {
      val entries = fs.listStatus(loc).map(_.getPath.getName)
      entries.isEmpty || entries.contains("_SUCCESS") ||
        entries.exists(n => n.startsWith("part-") || n.endsWith(".parquet"))
    }
    if (fs.exists(loc) && fs.getFileStatus(loc).isDirectory && looksLikeTableDir)
      fs.delete(loc, true)
  }
}
