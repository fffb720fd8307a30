package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** The warehouse census ([[Warehouse.auditTables]]): one row per
  * graft-managed catalog table with its row count and — for ledgered
  * tables — the maintenance high-water batch. The ledger column is a
  * CONTRACT between two modules that never call each other: the key
  * `Maintenance.refreshLedgered` stamps must be the key the audit
  * reads, so the round-trip is pinned through the real stamping path
  * (a rollup state refresh), not a hand-written property. */
class WarehouseSpec extends SparkSpec {
  import spark.implicits._

  private val prefix = "graft_whspec_"

  private def drop(tables: String*): Unit = tables.foreach { t =>
    spark.sql(s"DROP TABLE IF EXISTS $t")
    Warehouse.clearOrphanLocation(spark, t)
  }

  test("auditTables censuses plain and ledgered tables with the stamped high-water batch") {
    val plain = s"${prefix}plain"
    val ledgered = s"${prefix}state"
    drop(plain, ledgered, s"${ledgered}_staging")
    try {
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
        .write.saveAsTable(plain)
      val ts = new Timestamp(1767103200000L)
      def incr(rows: Seq[(Long, Double)]) =
        graft.operators.Rollup.hourlyState(
          rows.toDF("id", "value").withColumn("ts", lit(ts)),
          "ts", "value", Seq.empty)
      // two applied batches through the REAL ledger path — the audit
      // must surface the stamped high-water mark, not batch count
      assert(graft.streaming.Maintenance.refreshRollupState(
        spark, ledgered, incr(Seq((1L, 1.0))), 0L))
      assert(graft.streaming.Maintenance.refreshRollupState(
        spark, ledgered, incr(Seq((2L, 2.0))), 7L))

      val audit = Warehouse.auditTables(spark, prefix)
        .orderBy("table_name")
        .collect()
      assert(audit.map(_.getString(0)).toSeq == Seq(plain, ledgered),
        s"census rows: ${audit.mkString(", ")}")
      val pl = audit(0); val led = audit(1)
      assert(pl.getLong(1) == 3L, "plain table row count")
      assert(pl.isNullAt(3), "plain table must have no ledger mark")
      assert(led.getLong(1) == 1L, "rollup state is one merged hour row")
      assert(!led.isNullAt(3) && led.getLong(3) == 7L,
        s"ledgered high-water batch: ${led.get(3)} (the stamped property " +
          "key and the audited key diverged)")
      assert(audit.forall(_.getLong(2) > 0L), "creation stamps missing")
      // a replayed batch id must not move the audited high water
      assert(!graft.streaming.Maintenance.refreshRollupState(
        spark, ledgered, incr(Seq((3L, 3.0))), 7L))
      val again = Warehouse.auditTables(spark, prefix)
        .filter(col("table_name") === ledgered).head()
      assert(again.getLong(3) == 7L)
    } finally drop(plain, ledgered, s"${ledgered}_staging")
  }

  test("auditTables scopes to the prefix — foreign tables never enter the census") {
    val foreign = "whspec_foreign_table"
    drop(foreign)
    try {
      Seq((1L, "x")).toDF("k", "v").write.saveAsTable(foreign)
      assert(Warehouse.auditTables(spark, prefix).isEmpty)
    } finally drop(foreign)
  }
}
