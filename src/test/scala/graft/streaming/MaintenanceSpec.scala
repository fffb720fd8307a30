package graft.streaming

import graft.SparkSpec
import graft.operators.Rollup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.nio.file.Files
import java.sql.Timestamp

case class Tick(id: Long, ts: Timestamp, kind: String, value: Double, rev: Int)

/** Continuous maintenance semantics: the streamed rollup state equals
  * the from-scratch rollup of everything streamed so far, replayed
  * batches are detected and skipped (exactly-once effect), and the
  * streamed lake upsert converges to latest-wins without bookkeeping.
  */
class MaintenanceSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minute: Int) = new Timestamp(1767103200000L + minute * 60000L)

  test("streamingRollup state tracks the from-scratch rollup batch after batch") {
    implicit val sqlCtx = spark.sqlContext
    val stateTable = "graft_maint_rollup_state"
    spark.sql(s"DROP TABLE IF EXISTS $stateTable")
    spark.sql(s"DROP TABLE IF EXISTS ${stateTable}_staging")
    graft.sources.Warehouse.clearOrphanLocation(spark, stateTable)
    graft.sources.Warehouse.clearOrphanLocation(spark, s"${stateTable}_staging")
    val ckpt = Files.createTempDirectory("maint_ckpt").toString
    val mem = MemoryStream[Tick]
    val q = Maintenance.streamingRollup(mem.toDF(), "ts", "value",
      Seq("kind"), stateTable, ckpt)
    try {
      var all = Seq.empty[Tick]
      val batches = Seq(
        (1 to 20).map(i => Tick(i, ts(i % 90), if (i % 2 == 0) "a" else "b", i * 1.5, 0)),
        (21 to 30).map(i => Tick(i, ts(i % 90), "a", i * 2.0, 0)),
        (31 to 45).map(i => Tick(i, ts(i % 90), "c", 7.25, 0)))
      for (batch <- batches) {
        mem.addData(batch: _*)
        q.processAllAvailable()
        all = all ++ batch
        val expect = Rollup.report(
          Rollup.hourlyState(all.toDF(), "ts", "value", Seq("kind")))
        // the swap ran in the stream's cloned session; this session's
        // cached listing is stale by design (Maintenance scaladoc)
        spark.catalog.refreshTable(stateTable)
        val got = Rollup.report(spark.table(stateTable))
        assert(got.exceptAll(expect).isEmpty && expect.exceptAll(got).isEmpty,
          s"state diverged after ${all.size} rows")
      }
    } finally {
      q.stop()
      spark.sql(s"DROP TABLE IF EXISTS $stateTable")
    }
  }

  test("refreshRollupState skips a replayed batch id — no double counting") {
    val stateTable = "graft_maint_replay_state"
    spark.sql(s"DROP TABLE IF EXISTS $stateTable")
    spark.sql(s"DROP TABLE IF EXISTS ${stateTable}_staging")
    graft.sources.Warehouse.clearOrphanLocation(spark, stateTable)
    graft.sources.Warehouse.clearOrphanLocation(spark, s"${stateTable}_staging")
    val b0 = Seq(Tick(1, ts(0), "a", 10.0, 0), Tick(2, ts(0), "a", 20.0, 0)).toDF()
    val b1 = Seq(Tick(3, ts(0), "a", 30.0, 0)).toDF()
    def incr(df: org.apache.spark.sql.DataFrame) =
      Rollup.hourlyState(df, "ts", "value", Seq("kind"))
    try {
      assert(Maintenance.refreshRollupState(spark, stateTable, incr(b0), 0L))
      assert(Maintenance.refreshRollupState(spark, stateTable, incr(b1), 1L))
      val before = Rollup.report(spark.table(stateTable)).collect().toSeq
      // crash-replay of batch 1: detected via the high-water mark
      assert(!Maintenance.refreshRollupState(spark, stateTable, incr(b1), 1L))
      val after = Rollup.report(spark.table(stateTable)).collect().toSeq
      assert(after == before, "replayed batch was merged twice")
      val n = spark.table(stateTable).agg(sum("n")).head.getLong(0)
      assert(n == 3L, s"expected 3 contributing rows, state says $n")
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $stateTable")
    }
  }

  test("crash between state drop and staging rename: recovery adopts staging") {
    val stateTable = "graft_maint_crash_state"
    val staging = s"${stateTable}_staging"
    spark.sql(s"DROP TABLE IF EXISTS $stateTable")
    spark.sql(s"DROP TABLE IF EXISTS $staging")
    graft.sources.Warehouse.clearOrphanLocation(spark, stateTable)
    graft.sources.Warehouse.clearOrphanLocation(spark, staging)
    val b0 = Seq(Tick(1, ts(0), "a", 10.0, 0), Tick(2, ts(0), "b", 20.0, 0)).toDF()
    val b1 = Seq(Tick(3, ts(0), "a", 30.0, 0)).toDF()
    val b2 = Seq(Tick(4, ts(0), "c", 40.0, 0)).toDF()
    def incr(df: org.apache.spark.sql.DataFrame) =
      Rollup.hourlyState(df, "ts", "value", Seq("kind"))
    try {
      assert(Maintenance.refreshRollupState(spark, stateTable, incr(b0), 0L))
      // replay batch 1's swap BY HAND up to the crash point: staging
      // holds the merged state and the stamped mark, the old state is
      // dropped, the rename never happened
      val merged = Rollup.merge(spark.table(stateTable), incr(b1))
      merged.write.saveAsTable(staging)
      spark.sql(s"ALTER TABLE $staging SET TBLPROPERTIES " +
        s"('${Maintenance.LastBatchProp}'='1')")
      spark.sql(s"DROP TABLE $stateTable")
      graft.sources.Warehouse.clearOrphanLocation(spark, stateTable)
      // the stream redelivers batch 1: recovery must adopt the staging
      // table (merge skipped — its effect is already in the state),
      // NOT restart the state from this one increment
      assert(!Maintenance.refreshRollupState(spark, stateTable, incr(b1), 1L),
        "replayed batch re-merged after crash recovery")
      val n1 = spark.table(stateTable).agg(sum("n")).head.getLong(0)
      assert(n1 == 3L, s"state lost/reset across the crash window: $n1 rows")
      // and the stream continues normally afterwards
      assert(Maintenance.refreshRollupState(spark, stateTable, incr(b2), 2L))
      val expect = Rollup.report(Rollup.hourlyState(
        b0.unionByName(b1).unionByName(b2), "ts", "value", Seq("kind")))
      val got = Rollup.report(spark.table(stateTable))
      assert(got.exceptAll(expect).isEmpty && expect.exceptAll(got).isEmpty,
        "state wrong after crash-window recovery")
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $stateTable")
      spark.sql(s"DROP TABLE IF EXISTS $staging")
    }
  }

  test("streamingRollup checkpoint restart: no re-merge, state stays exact") {
    implicit val sqlCtx = spark.sqlContext
    val stateTable = "graft_maint_restart_state"
    spark.sql(s"DROP TABLE IF EXISTS $stateTable")
    spark.sql(s"DROP TABLE IF EXISTS ${stateTable}_staging")
    graft.sources.Warehouse.clearOrphanLocation(spark, stateTable)
    graft.sources.Warehouse.clearOrphanLocation(spark, s"${stateTable}_staging")
    val ckpt = Files.createTempDirectory("maint_restart").toString
    val mem = MemoryStream[Tick]
    val run1 = (1 to 10).map(i => Tick(i, ts(i), "a", i * 1.0, 0))
    val run2 = (11 to 15).map(i => Tick(i, ts(i), "b", i * 1.0, 0))
    val q1 = Maintenance.streamingRollup(mem.toDF(), "ts", "value",
      Seq("kind"), stateTable, ckpt)
    try {
      mem.addData(run1: _*)
      q1.processAllAvailable()
    } finally q1.stop()
    // NEW query, same checkpoint: committed offsets resume, and the
    // high-water mark would reject any replayed batch the restart
    // re-delivers
    val q2 = Maintenance.streamingRollup(mem.toDF(), "ts", "value",
      Seq("kind"), stateTable, ckpt)
    try {
      mem.addData(run2: _*)
      q2.processAllAvailable()
      spark.catalog.refreshTable(stateTable)
      val expect = Rollup.report(Rollup.hourlyState(
        (run1 ++ run2).toDF(), "ts", "value", Seq("kind")))
      val got = Rollup.report(spark.table(stateTable))
      assert(got.exceptAll(expect).isEmpty && expect.exceptAll(got).isEmpty,
        "state wrong after checkpoint restart")
      val n = spark.table(stateTable).agg(sum("n")).head.getLong(0)
      assert(n == 15L, s"rows double-merged across restart: $n")
    } finally {
      q2.stop()
      spark.sql(s"DROP TABLE IF EXISTS $stateTable")
    }
  }

  test("streamingUpsert applies CDC batches to the lake, latest version winning") {
    implicit val sqlCtx = spark.sqlContext
    val root = Files.createTempDirectory("maint_lake").toString
    val lake = s"$root/lake"
    Seq(Tick(1, ts(0), "a", 1.0, 0), Tick(2, ts(0), "b", 2.0, 0))
      .toDF().write.partitionBy("kind").parquet(lake)
    val mem = MemoryStream[Tick]
    val q = Maintenance.streamingUpsert(mem.toDF(), lake,
      keyCols = Seq("id"), partitionCol = "kind", versionCol = "rev",
      checkpoint = s"$root/ckpt")
    try {
      mem.addData(Tick(1, ts(1), "a", 1.5, 1))               // update
      q.processAllAvailable()
      mem.addData(Tick(3, ts(2), "b", 3.0, 1),               // insert
                  Tick(1, ts(3), "a", 1.25, 0))              // stale rev: loses
      q.processAllAvailable()
      val got = spark.read.parquet(lake)
        .select("id", "value", "rev", "kind")
        .as[(Long, Double, Int, String)].collect().sortBy(_._1).toSeq
      assert(got == Seq((1L, 1.5, 1, "a"), (2L, 2.0, 0, "b"), (3L, 3.0, 1, "b")))
    } finally q.stop()
  }
}
