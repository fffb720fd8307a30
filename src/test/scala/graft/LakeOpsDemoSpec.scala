package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.operators.Rollup

/** Composition e2e for [[LakeOpsDemo]]: each lifecycle stage
  * reconciles against its closed form on the demo's own output.
  */
class LakeOpsDemoSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("lake-ops demo: upsert, incremental rollup, pruned scan, and profile reconcile") {
    val outDir = graft.sources.Scratch.dir("graft_lakeops_spec").toString
    val r = LakeOpsDemo.run(spark, sfDir, outDir)

    val merged = spark.read.parquet(s"$outDir/events_lake")
    // MERGE arithmetic: base + inserts rows; every 7th key updated in place
    assert(merged.count() == r.baseRows + r.insertedKeys)
    val updated = merged.filter(col("event_id") % 7 === 0 && col("event_id") >= 0)
    assert(updated.count() == r.updatedKeys)
    assert(updated.filter(col("rev") =!= 1).count() == 0,
      "an updated key kept its base revision")
    assert(merged.filter(col("event_id") < 0).count() == r.insertedKeys)

    // incremental refresh identity: kept + recomputed == from-scratch
    val scratch = Rollup.hourlyState(merged, "ts", "value", Seq("event_type"))
    val d1 = Rollup.report(r.rollupState).exceptAll(Rollup.report(scratch))
    val d2 = Rollup.report(scratch).exceptAll(Rollup.report(r.rollupState))
    assert(d1.isEmpty && d2.isEmpty, "incremental rollup diverged from scratch")
    assert(r.rollupRows == scratch.count())

    // layout: the box read pruned files and lost no rows
    assert(r.prunedFilesRead > 0 && r.prunedFilesRead < r.totalFiles,
      s"pruning read ${r.prunedFilesRead} of ${r.totalFiles}")

    // profile gate: totals line up with the merged table
    val prof = r.profile.collect()
      .map(row => row.getString(0) -> row.getLong(1)).toMap
    assert(prof.values.toSet == Set(merged.count()))
  }
}
