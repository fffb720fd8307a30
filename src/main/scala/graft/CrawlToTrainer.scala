package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The crawl → corpus → trainer SEAM: [[CrawlDemo]]'s refined,
  * rank/quality-scored, anchor-labeled export fed into
  * [[CorpusDemo.trainerFeed]] as ONE reconciled pipeline run — raw
  * WARC bytes in, packed integer training sequences out, with the
  * counts tied out row-for-row across the seam:
  *
  *   - every crawl survivor (the docs the WET export published and the
  *     CDXJ loop ranged-fetched back) appears in EXACTLY ONE token
  *     sequence, and no sequence carries a doc_id the crawl never
  *     landed — set equality both directions plus a multiplicity
  *     check, not just matching counts;
  *   - the crawl's own audited shard manifest is the HANDOFF format
  *     (the trainer reads the landed parquet back, never a live frame —
  *     a crash between the stages resumes from the manifest).
  *
  * Both halves are the existing composition surfaces
  * ([[CrawlDemo.run]], [[CorpusDemo.trainerFeed]]); this object only
  * seams them, and CrawlToTrainerSpec reconciles the tie-out on the
  * WARC fixture. Scale shape: the seam adds one parquet read and three
  * |docs|-keyed hash aggregations/anti-joins — nothing driver-side
  * beyond the existing demo scalars. */
object CrawlToTrainer {

  final case class Result(crawl: CrawlDemo.Result,
                          trainerDocs: Long,
                          feed: CorpusDemo.TrainerFeed,
                          docIdsTieOut: Boolean)

  def run(spark: SparkSession, warcDir: String, robots: DataFrame,
          outDir: String, agent: String = "graftbot",
          shards: Int = 4, budgetTokens: Long = 2000L,
          frontierTable: String = "graft_c2t_frontier"): Result = {
    // 1. the crawl half: WARC → refined/anchored/audited shard export
    val crawl = CrawlDemo.run(spark, warcDir, robots, s"$outDir/crawl",
      agent = agent, shards = shards, frontierTable = frontierTable)

    // 2. the handoff reads the LANDED export back (manifest-audited
    //    parquet is the seam's contract, not an in-memory frame)
    val landed = graft.operators.Sampling.readShardedExport(spark,
        s"$outDir/crawl")
      .select("doc_id", "text")
    val trainerDocs = landed.count()

    // 3. the trainer half over the crawl's corpus
    val feed = CorpusDemo.trainerFeed(spark, landed,
      s"$outDir/trainer", budgetTokens = budgetTokens, shards = shards)

    // 4. row-for-row tie-out across the seam: explode the sequences'
    //    doc_ids and require (a) every landed doc in exactly one
    //    sequence, (b) no unknown doc in any sequence
    val seqDocs = graft.operators.Sampling
      .readShardedExport(spark, s"$outDir/trainer/token_shards")
      .select(explode(col("doc_ids")).as("doc_id"))
    val multiplicityOk = seqDocs.groupBy("doc_id")
      .agg(count(lit(1)).as("n")).filter(col("n") =!= 1L).isEmpty
    val coverageOk =
      landed.select("doc_id").except(seqDocs.select("doc_id")).isEmpty &&
        seqDocs.select("doc_id").except(landed.select("doc_id")).isEmpty
    Result(crawl, trainerDocs, feed, multiplicityOk && coverageOk)
  }

  def main(args: Array[String]): Unit = {
    val warcDir = if (args.length > 0) args(0)
      else sys.env.getOrElse("SPARK_GRAFT_WARC_DIR", "/tmp/graft_crawl_warc")
    val outDir = if (args.length > 1) args(1)
      else graft.sources.Scratch.dir("graft-c2t").toString
    val spark = SparkSession.builder()
      .appName("graft-crawl-to-trainer").master("local[4]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      import spark.implicits._
      val robots = Seq.empty[(String, String)].toDF("host", "robots_txt")
      val r = run(spark, warcDir, robots, outDir)
      println(s"crawl survivors=${r.crawl.survivors} " +
        s"wetOk=${r.crawl.wetAuditOk} cdxFetched=${r.crawl.cdxFetched} " +
        s"-> trainerDocs=${r.trainerDocs} " +
        s"sequences=${r.feed.tokenSequences} " +
        s"seqDocs=${r.feed.tokenSeqDocs} audit=${r.feed.tokenAuditOk} " +
        s"tieOut=${r.docIdsTieOut}")
      println(s"token shards at: $outDir/trainer/token_shards")
    } finally spark.stop()
  }
}
