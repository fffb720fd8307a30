package graft

import org.apache.spark.sql.functions._

/** [[CrawlDemo]] — the WARC→export composition reconciled stage by
  * stage on a closed-form two-host fixture. */
class CrawlDemoSpec extends SparkSpec {
  import spark.implicits._

  private def ascii(s: String) = s.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)

  private def page(host: String, path: String, body: String,
                   outlinks: Seq[String]): (String, String, Array[Byte]) = {
    val html = "<html><body><nav><a href=\"/nav\">N</a></nav>" +
      s"<p>$body</p>" +
      outlinks.map(u => s"""<a href="$u">out</a>""").mkString(" ") +
      "</body></html>"
    ("response", s"https://$host$path", Warc2.http(ascii(html)))
  }
  private object Warc2 {
    def http(b: Array[Byte]) = graft.sources.Warc.httpResponse(b)
  }

  test("crawl demo: every stage count reconciles on a two-host fixture") {
    val dir = java.nio.file.Files.createTempDirectory("graft_crawl_fix").toString
    val out = java.nio.file.Files.createTempDirectory("graft_crawl_out").toString + "/export"
    // four pages, two hosts; every body is English-ish (passes the
    // refine language gate) and unique (survives exact dedup)
    def body(i: Int) =
      s"the page number $i describes the data and the methods used in " +
      s"the careful study of the system with detail item $i"
    val segs = Seq(
      Seq(
        ("warcinfo", null: String, ascii("software: graft\r\n")),
        page("a.com", "/p1", body(1), Seq("https://b.com/x", "/local1")),
        page("a.com", "/p2", body(2), Seq("https://b.com/y"))),
      Seq(
        ("warcinfo", null: String, ascii("software: graft\r\n")),
        page("b.com", "/q1", body(3), Seq("https://a.com/z")),
        page("b.com", "/q2", body(4), Seq())))
    segs.zipWithIndex.foreach { case (recs, i) =>
      java.nio.file.Files.write(
        java.nio.file.Paths.get(dir, f"seg-$i%05d.warc"),
        graft.sources.Warc.buildSegment(recs))
    }
    // robots: b.com denies graftbot everything; a.com allows all but
    // sets a 7 s crawl delay and publishes a sitemap pointer
    val robots = Seq(
      ("b.com", "User-agent: graftbot\nDisallow: /\n"),
      ("a.com", "User-agent: *\nAllow: /\nCrawl-delay: 7\n" +
        "Sitemap: https://a.com/sitemap.xml\n"))
      .toDF("host", "robots_txt")
    val r = CrawlDemo.run(spark, dir, robots, out)
    assert(r.records == 6, s"2 warcinfo + 4 responses, got ${r.records}")
    assert(r.pages == 4 && r.extracted == 4)
    // host edges: a→b (outlinks to b), a→a (/local1 + /nav self),
    // b→a (outlink), b→b (/nav self) — 4 distinct edges, 2 hosts
    assert(r.hostEdges == 4, s"edges ${r.hostEdges}")
    assert(r.rankedHosts == 2)
    // frontier: distinct canonical outlink urls = b.com/x, b.com/y,
    // a.com/z, a.com/local1, a.com/nav, b.com/nav — b.com ones denied
    assert(r.frontierAllowed == 3 && r.frontierDenied == 3,
      s"frontier ${r.frontierAllowed}+${r.frontierDenied}")
    // all 3 allowed URLs live on a.com, under the per-host budget of 4
    assert(r.scheduled == 3, s"scheduled ${r.scheduled}")
    // a.com's 7 s delay: slots 1 and 2 wait (slot 0 fetches now)
    assert(r.delayedSlots == 2, s"delayedSlots ${r.delayedSlots}")
    assert(r.sitemapsDiscovered == 1, s"sitemaps ${r.sitemapsDiscovered}")
    // all four unique texts survive refinement; both exports audit
    // clean, and the WET leg reads back through the proven reader
    assert(r.survivors == 4 && r.auditOk, s"survivors ${r.survivors}")
    assert(r.wetAuditOk, "WET export must audit clean")
    val wetBack = graft.sources.Warc.readWarc(spark, out + "_wet")
      .filter(col("warc_type") === "conversion")
    assert(wetBack.count() == 4)
    // the export carries the host rank column for every row
    val exported = spark.read.parquet(out)
    assert(exported.count() == 4)
    assert(exported.filter(col("host_rank_micro").isNull).count() == 0,
      "every exported doc must carry its host's rank")
    // rank sanity: both hosts received mass (positive micro-units)
    assert(exported.select("host_rank_micro").as[Long].collect().forall(_ > 0))
  }
}
