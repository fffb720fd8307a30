package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Layout, Profile, Rollup}
import graft.sources.{Lake, Tables}

/** The runnable end-to-end slice for the LAKE-MANAGEMENT surface (the
  * third demo leg, next to [[PipelineDemo]]'s reference dataflow and
  * [[CorpusDemo]]'s curation slice): one `main` that walks a
  * partitioned fact table through the lifecycle a 100 TB table
  * actually lives —
  *
  *   partitioned write → CDC MERGE (`Lake.upsert`, latest-wins) →
  *   incremental rollup refresh (`Rollup.merge` of the update's
  *   partial state) → Z-order rewrite + min-max manifest
  *   (`Layout.writeZOrdered`/`buildManifest`) → manifest-pruned box
  *   query (`Layout.prunedRead`) → column-profile health gate
  *   (`Profile.profile`)
  *
  * Every stage is an existing, individually-oracled library call
  * (q77, q76, q73/q79, q81); this object only composes them, and the
  * composition spec reconciles each stage against its closed form. */
object LakeOpsDemo {

  final case class Result(baseRows: Long, updatedKeys: Long, insertedKeys: Long,
                          rollupRows: Long, prunedFilesRead: Int,
                          totalFiles: Int, profile: DataFrame,
                          rollupState: DataFrame)

  def run(spark: SparkSession, sfDir: String, outDir: String): Result = {
    val lakeDir = s"$outDir/events_lake"
    val zDir = s"$outDir/events_zorder"

    // 1. the partitioned fact table (rev 0 everywhere)
    val ev = Tables.load(spark, sfDir, "events")
      .select(col("event_id"), col("ts"), col("user_id"),
        col("value"), lit(0).as("rev"), col("event_type"))
    ev.repartition(8, col("event_id"))
      .write.mode("overwrite").partitionBy("event_type").parquet(lakeDir)
    val baseRows = ev.count()

    // 2. CDC MERGE: corrections to every 7th key + new negative keys
    val matched = ev.filter(col("event_id") % 7 === 0)
    val inserts = ev.filter(col("event_id") % 97 === 0)
      .select((-col("event_id") - 1).as("event_id"), col("ts"), col("user_id"),
        (col("value") * 2).as("value"), lit(1).as("rev"), col("event_type"))
    val updates = matched
      .select(col("event_id"), col("ts"), col("user_id"),
        (col("value") + 1000).as("value"), lit(1).as("rev"), col("event_type"))
      .unionByName(inserts)
    Lake.upsert(spark, lakeDir, updates,
      keyCols = Seq("event_id"), partitionCol = "event_type", versionCol = "rev")

    // 3. rollup refresh under IN-PLACE updates: an updated row can't
    //    just merge in as an increment (its old value already
    //    contributed), so the refresh recomputes ONLY the hours the
    //    CDC batch touched and keeps the stored state for every other
    //    hour — history outside the touched hours is never re-read.
    val hourOf = date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss")
    val baseState = Rollup.hourlyState(ev, "ts", "value", Seq("event_type"))
    val touched = updates.select(hourOf.as("hour")).distinct()
    val keptState = baseState.join(broadcast(touched), Seq("hour"), "left_anti")
    val touchedRows = spark.read.parquet(lakeDir)
      .withColumn("hour", hourOf)
      .join(broadcast(touched), "hour").drop("hour")
    val state = Rollup.merge(keptState,
      Rollup.hourlyState(touchedRows, "ts", "value", Seq("event_type")))
    val rollupRows = Rollup.report(state).count()

    // 4. layout: Z-order the merged table on (user_id, event_id),
    //    manifest it, and answer a 2-D box query by pruning
    val merged = spark.read.parquet(lakeDir)
    val st = merged.agg(
      min("user_id").as("umin"), max("user_id").as("umax"),
      min("event_id").as("emin"), max("event_id").as("emax")).head()
    val (umin, umax, emin, emax) =
      (st.getLong(0), st.getLong(1), st.getLong(2), st.getLong(3))
    Layout.writeZOrdered(merged.drop("ts"), zDir,
      Seq(Layout.quantize(col("user_id"), lit(umin), lit(umax), 8),
          Layout.quantize(col("event_id"), lit(emin), lit(emax), 8)),
      bits = 8, numFiles = 64)
    val manifest = Layout.buildManifest(spark, zDir, Seq("user_id", "event_id"))
    val totalFiles = manifest.count().toInt
    val box = Layout.prunedRead(spark, manifest, Map(
      "user_id" -> (umin + (umax - umin) * 3 / 8, umin + (umax - umin) * 5 / 8),
      "event_id" -> (emin + (emax - emin) * 3 / 8, emin + (emax - emin) * 5 / 8)))
    val prunedFilesRead = box.inputFiles.length

    // 5. health gate over the final table
    val profile = Profile.profile(merged, Seq("event_id", "user_id", "value", "rev"))

    Result(baseRows,
      updatedKeys = matched.count(), insertedKeys = inserts.count(),
      rollupRows, prunedFilesRead, totalFiles, profile,
      rollupState = state)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val outDir = if (args.length > 1) args(1)
      else graft.sources.Scratch.dir("graft_lakeops").toString
    val spark = SparkSession.builder()
      .appName("graft-lakeops-demo").master("local[4]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", false)
      .getOrCreate()
    try {
      val r = run(spark, sfDir, outDir)
      println(s"lake rows:      ${r.baseRows} (+${r.insertedKeys} inserted, " +
        s"${r.updatedKeys} updated in place)")
      println(s"rollup rows:    ${r.rollupRows}")
      println(s"box query read: ${r.prunedFilesRead} of ${r.totalFiles} files")
      r.profile.show(20, false)
    } finally spark.stop()
  }
}
