package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Charset, Corpus, Frontier, Graph, Html, Robots, Sampling, Url}
import graft.sources.Warc

/** The runnable end-to-end slice for the CRAWL surface — the round-10
  * stack composed as the pipeline a CommonCrawl-style corpus actually
  * runs, from raw WARC bytes to an audited text export:
  *
  *   WARC segments ([[Warc.readWarc]]: framing, gzip, HTTP split)
  *   → main-content extraction ([[Html.extractMainText]])
  *   → outlinks ([[Html.extractLinks]]) → canonical host edges
  *     ([[Url.hostEdges]]) → exact-integer host PageRank
  *     ([[Graph.pageRankMicro]])
  *   → robots-exclusion gate for the next crawl round
  *     ([[Robots.filterAllowed]] over the canonical outlinks)
  *   → politeness-bounded frontier scheduling scored by host rank
  *     ([[Frontier.schedule]]) with crawl-delay fetch ETAs and
  *     `Sitemap:` discovery off the same robots frame
  *     ([[Robots.crawlDelay]] / [[Robots.sitemapUrls]])
  *   → text refinement ([[Corpus.refine]]) joined with the host rank
  *   → audited sharded export ([[Sampling.writeShardedWithManifest]] +
  *     [[Sampling.verifyShardedExport]])
  *
  * Every stage is an existing, individually-oracled library call
  * (q115/q116, q111, q113/q114, q117, q61, q105); this object only
  * composes them, and the e2e spec reconciles stage counts against
  * one another. */
object CrawlDemo {

  final case class Result(records: Long, pages: Long, extracted: Long,
                          hostEdges: Long, rankedHosts: Long,
                          frontierAllowed: Long, frontierDenied: Long,
                          scheduled: Long, delayedSlots: Long,
                          sitemapsDiscovered: Long, survivors: Long,
                          auditOk: Boolean, wetAuditOk: Boolean)

  def run(spark: SparkSession, warcDir: String, robots: DataFrame,
          outDir: String, agent: String = "graftbot",
          shards: Int = 4, maxPerHost: Int = 4): Result = {
    // 1. ingest: one row per WARC record, HTTP responses split out
    val records = Warc.readWarc(spark, warcDir).cache()
    val nRecords = records.count()
    val pages = records
      .filter(col("warc_type") === "response" && col("http_status") === 200)
      .select(col("target_uri").as("url"),
        // charset-sniffed decode (BOM / header / meta / UTF-8 probe /
        // cp1252 fallback) — a raw cast would mojibake the legacy tail
        Charset.decodeText(col("body"), col("http_content_type"))
          .getField("text").as("html"))
      // full 64-bit ids: a mod-10⁹ fold collides at birthday scale
      // (hundreds of merged pages per million URLs, corrupting every
      // doc_id join downstream); the raw hash is collision-free in
      // practice (~n²/2⁶⁵) and the export manifest folds internally,
      // so nothing downstream needs compact ids
      .withColumn("doc_id", xxhash64(col("url")))
      .cache()
    val nPages = pages.count()
    // belt-and-braces: a doc_id collision would silently merge pages
    // in every join below — fail loudly instead (cheap: pages is
    // cached and |pages|-sized)
    val idClash = pages.agg(
      (countDistinct(col("url")) - countDistinct(col("doc_id"))).as("d"))
      .head().getLong(0)
    require(idClash == 0, s"doc_id hash collision on $idClash url(s)")

    // 2. text side: main-content extraction, then the refine gates
    val extracted = Html.extractMainText(pages, "doc_id", "html")
      .filter(length(col("main_text")) > 0)
    val nExtracted = extracted.count()

    // 3. graph side: outlinks → canonical host edges → integer
    //    PageRank (the host-quality signal)
    val links = Html.extractLinks(pages, "doc_id", "html")
      .join(pages.select(col("doc_id"), col("url")), "doc_id")
      // a page that declares <base href> resolves its relative links
      // against it, not the page URL
      .withColumn("base_url", coalesce(col("base_href"), col("url")))
    val edges = Url.hostEdges(links, "base_url", "href")
    val nEdges = edges.count()
    val ranks = Graph.pageRankMicro(edges, "src_host", "dst_host",
      iterations = 4)
    val nHosts = ranks.count()

    // 4. frontier side: canonical outlink URLs gated by robots for
    //    the next crawl round
    val frontier = Robots.filterAllowed(
      links.select(Url.resolve(col("base_url"), col("href")).as("url"))
        .filter(col("url").isNotNull).distinct(),
      "url", robots, agent).cache()
    val nAllowed = frontier.filter(col("allowed")).count()
    val nDenied = frontier.filter(!col("allowed")).count()

    // 4b. politeness-bounded scheduling of the allowed frontier:
    //    score each URL by its host's PageRank (broadcast — |hosts|
    //    rows; unranked hosts score 0) and keep each host's best
    //    maxPerHost slots through the bounded aggregator (no per-host
    //    window)
    val scheduled = Frontier.schedule(
      frontier.filter(col("allowed")).select(col("url"), col("host"))
        .join(broadcast(ranks.select(col("node").as("host"),
          col("rank_micro").as("score"))), Seq("host"), "left")
        .select(col("url"), coalesce(col("score"), lit(0L)).as("score")),
      "url", "score", maxPerHost)
    val nScheduled = scheduled.count()

    // 4c. politeness metadata off the same robots frame: per-slot
    //    fetch ETAs (slot × Crawl-delay; undeclared hosts fetch
    //    immediately) and Sitemap: discovery pointers for the next
    //    round's frontier feed
    val delayedSlots = scheduled
      .join(broadcast(robots.select(col(robots.columns.head).as("host"),
        col(robots.columns(1)).as("__robots"))), Seq("host"), "left")
      .select(col("host"), col("host_slot"),
        (col("host_slot") *
          coalesce(Robots.crawlDelay(col("__robots"), agent), lit(0L)))
          .as("fetch_eta_sec"))
      .filter(col("fetch_eta_sec") > 0).count()
    val nSitemaps = robots
      .select(explode(Robots.sitemapUrls(col(robots.columns(1))))
        .as("sitemap_url")).count()

    // 5. curate: refine the extracted text, attach the host rank
    //    (broadcast — |hosts| rows) so downstream gates can budget by
    //    host quality
    val refined = Corpus.refine(
        extracted.select(col("doc_id"), col("main_text").as("text")),
        "doc_id", "text", minQuality = None)
      .join(pages.select(col("doc_id"), Url.host(col("url")).as("host")),
        "doc_id")
      .join(broadcast(ranks.withColumnRenamed("node", "host")
        .withColumnRenamed("rank_micro", "host_rank_micro")),
        Seq("host"), "left")
      .cache()
    val nSurvivors = refined.count()

    // 6. audited exports: parquet shards for training, WET segments
    //    for interchange — both manifest-audited
    Sampling.writeShardedWithManifest(
      refined.select("doc_id", "host", "host_rank_micro", "text"),
      "doc_id", shards, outDir)
    val auditOk = Sampling.verifyShardedExport(spark, outDir, "doc_id")
      .filter(!col("ok")).isEmpty
    val wetDir = outDir + "_wet"
    Warc.writeTextSegments(
      refined.join(pages.select(col("doc_id"), col("url")), "doc_id")
        .select(col("url"), col("text")),
      "url", "text", wetDir)
    val wetAuditOk = Warc.auditTextSegments(spark, wetDir)
      .filter(!col("ok")).isEmpty

    records.unpersist(); pages.unpersist(); frontier.unpersist()
    ranks.unpersist(); refined.unpersist()
    Result(nRecords, nPages, nExtracted, nEdges, nHosts,
      nAllowed, nDenied, nScheduled, delayedSlots, nSitemaps,
      nSurvivors, auditOk, wetAuditOk)
  }

  def main(args: Array[String]): Unit = {
    val warcDir = if (args.length > 0) args(0)
      else sys.env.getOrElse("SPARK_GRAFT_WARC_DIR", "/tmp/graft_crawl_warc")
    val outDir = if (args.length > 1) args(1) else "/tmp/graft_crawl_out"
    val spark = SparkSession.builder()
      .appName("graft-crawl-demo").master("local[4]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    try {
      import spark.implicits._
      val robots = Seq.empty[(String, String)].toDF("host", "robots_txt")
      val r = run(spark, warcDir, robots, outDir)
      println(s"records=${r.records} pages=${r.pages} " +
        s"extracted=${r.extracted} edges=${r.hostEdges} " +
        s"hosts=${r.rankedHosts} frontier=${r.frontierAllowed}+" +
        s"${r.frontierDenied} scheduled=${r.scheduled} " +
        s"delayedSlots=${r.delayedSlots} sitemaps=${r.sitemapsDiscovered} " +
        s"survivors=${r.survivors} audit=${r.auditOk} wet=${r.wetAuditOk}")
    } finally spark.stop()
  }
}
