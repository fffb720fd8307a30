package graft

import org.apache.spark.sql.functions._

/** [[CrawlToTrainer]] — the crawl→corpus→trainer seam reconciled on a
  * WARC fixture: the docs the crawl published (WET/CDXJ-verified) and
  * the packed token sequences must tie out row-for-row. */
class CrawlToTrainerSpec extends SparkSpec {
  import spark.implicits._

  private def ascii(s: String) =
    s.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)

  test("crawl survivors and token-shard docs tie out row-for-row across the seam") {
    val dir = graft.sources.Scratch.dir("graft_c2t_fix").toString
    val out = graft.sources.Scratch.dir("graft_c2t_out").toString
    val tbl = "graft_c2t_spec_frontier"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    graft.sources.Warehouse.clearOrphanLocation(spark, tbl)
    // five unique English-ish pages (all pass the refine gates) plus
    // one duplicated body — the dedup gate drops one of the pair, so
    // the tie-out must track SURVIVORS, not captures
    def page(i: Int, body: String): (String, String, Array[Byte]) =
      ("response", s"https://e.com/p$i",
        graft.sources.Warc.httpResponse(ascii(
          s"<html><body><p>$body</p><a href=\"/n$i\">next link $i</a>" +
            "</body></html>")))
    def body(i: Int) =
      s"the page number $i describes the data and the methods used " +
        s"in the careful study of the system with detail item $i"
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "seg-00000.warc"),
      graft.sources.Warc.buildSegment(Seq(
        ("warcinfo", null: String, ascii("software: graft\r\n")),
        page(1, body(1)), page(2, body(2)), page(3, body(3)),
        page(4, body(4)),
        page(5, body(4))))) // exact-dup body of p4 — one of the two drops
    val robots = Seq(("e.com", "User-agent: *\nAllow: /\n"))
      .toDF("host", "robots_txt")
    try {
      val r = CrawlToTrainer.run(spark, dir, robots, out,
        frontierTable = tbl)
      // crawl half: 5 captures, 4 survive the dedup gate; both export
      // audits green and the CDXJ loop fetched every survivor back
      assert(r.crawl.pages == 5 && r.crawl.survivors == 4,
        s"pages=${r.crawl.pages} survivors=${r.crawl.survivors}")
      assert(r.crawl.auditOk && r.crawl.wetAuditOk)
      assert(r.crawl.cdxFetched == r.crawl.survivors)
      // the handoff read the LANDED export (not a live frame): counts
      // agree with the crawl's own survivor count
      assert(r.trainerDocs == r.crawl.survivors,
        s"trainerDocs=${r.trainerDocs}")
      // trainer half: every doc packs into exactly one sequence; the
      // manifest audit is green
      assert(r.feed.tokenSeqDocs == r.trainerDocs,
        s"seqDocs=${r.feed.tokenSeqDocs}")
      assert(r.feed.tokenSequences >= 1 && r.feed.tokenAuditOk)
      // the row-for-row tie-out (set equality both directions plus
      // multiplicity) held
      assert(r.docIdsTieOut, "doc_ids must tie out across the seam")
      // independent re-derivation: the WET conversion records' URIs
      // map 1:1 onto the token sequences' doc_ids via the crawl's
      // own id scheme (xxhash64 of the url)
      val wetDocs = graft.sources.Warc
        .readWarc(spark, s"$out/crawl_wet")
        .filter(col("warc_type") === "conversion")
        .select(xxhash64(col("target_uri")).as("doc_id"))
      val seqDocs = spark.read.parquet(s"$out/trainer/token_shards")
        .select(explode(col("doc_ids")).as("doc_id"))
      assert(wetDocs.except(seqDocs).isEmpty && seqDocs.except(wetDocs).isEmpty,
        "WET-published docs and token-shard docs must be the same set")
    } finally spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }
}
