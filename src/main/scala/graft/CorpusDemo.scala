package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Text
import graft.operators.{Corpus, Packing}
import graft.sources.Tables

/** The runnable end-to-end slice for the TRAINING-DATA surface (the
  * complement of [[PipelineDemo]]'s reference dataflow): one `main`
  * that takes a raw document corpus to packed training shards —
  *
  *   health report (q60 shape) → `Corpus.refine` (language/quality/
  *   repetition gates + exact dedup) → `Text.scrubPii` → sliding-window
  *   chunking (`Text.chunkByTokens`) → token-budget packing
  *   (`Packing.packContiguous`) → parquet shards partitioned by shard
  *
  * Every stage is an existing, individually-oracled library call; this
  * object only composes them, so it is both the "first thing a data
  * curator runs" and the subject of the composition e2e spec. */
object CorpusDemo {

  final case class Result(inputDocs: Long, survivors: Long, chunks: Long,
                          bins: Long, report: DataFrame)

  /** Run the full curation slice: read `documents` under `sfDir`,
    * write packed chunk shards under `outDir`. `chunkTokens`/`stride`
    * size the retrieval windows; `budgetTokens` is the per-bin packing
    * target. */
  def run(spark: SparkSession, sfDir: String, outDir: String,
          chunkTokens: Int = 50, stride: Int = 40,
          budgetTokens: Long = 2000L, shards: Int = 4): Result = {
    val docs = Tables.load(spark, sfDir, "documents")
      .select("doc_id", "source", "text")
    val inputDocs = docs.count()

    // 1. gates + exact dedup (q61 shape), then PII scrubbing — scrub
    //    AFTER dedup so near-identical PII variants can't defeat the
    //    digest, and chunks downstream never carry raw identifiers
    val refined = Corpus.refine(docs, "doc_id", "text")
      .withColumn("text", Text.scrubPii(col("text")))
    val survivors = refined.count()

    // 2. sliding-window chunks, one row per chunk (q52 shape)
    val chunks = refined
      .select(col("doc_id"), col("source"),
        posexplode(Text.chunkByTokens(col("text"), chunkTokens, stride)))
      .select(col("doc_id"), col("source"), col("pos").as("chunk_id"),
        col("col").as("chunk"),
        Text.tokenCount(col("col")).cast("long").as("n_tokens"))
    // a chunk's identity is (doc, chunk_id); pack on a single sortable id
    val withId = chunks.withColumn("item_id",
      col("doc_id") * 10000L + col("chunk_id"))

    // 3. contiguous token-budget packing into shards (q53 shape)
    val packed = Packing.packContiguous(withId, "item_id", "n_tokens",
      budget = budgetTokens, shards = shards)

    // 4. land the shards columnar, partitioned for per-shard reads
    packed.select("shard", "bin", "item_id", "doc_id", "chunk_id",
        "source", "chunk", "n_tokens")
      .write.mode("overwrite").partitionBy("shard").parquet(s"$outDir/shards")

    val out = spark.read.parquet(s"$outDir/shards")
    val report = out.groupBy("shard")
      .agg(countDistinct(col("bin")).as("n_bins"),
        count(lit(1)).as("n_chunks"),
        sum("n_tokens").as("total_tokens"))
      .orderBy("shard")
    Result(inputDocs, survivors, out.count(),
      out.select("shard", "bin").distinct().count(), report)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val outDir = if (args.length > 1) args(1)
      else java.nio.file.Files.createTempDirectory("graft-corpus-demo").toString
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[4]"))
      .appName("graft-corpus-demo")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val r = run(spark, sfDir, outDir)
      println(s"input docs:  ${r.inputDocs}")
      println(s"survivors:   ${r.survivors}")
      println(s"chunks:      ${r.chunks}")
      println(s"packed bins: ${r.bins}")
      r.report.show(20, truncate = false)
      println(s"shards at: $outDir/shards")
    } finally spark.stop()
  }
}
