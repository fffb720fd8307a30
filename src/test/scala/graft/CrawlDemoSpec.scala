package graft

import org.apache.spark.sql.functions._

/** [[CrawlDemo]] — the WARC→export composition reconciled stage by
  * stage on a closed-form two-host fixture, now including redirect
  * chains (a loop among them), sitemap-fed discovery, and the
  * persisted frontier + warehouse census. */
class CrawlDemoSpec extends SparkSpec {
  import spark.implicits._

  private def ascii(s: String) = s.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)

  private def page(host: String, path: String, body: String,
                   outlinks: Seq[String]): (String, String, Array[Byte]) = {
    val html = "<html><body><nav><a href=\"/nav\">N</a></nav>" +
      s"<p>$body</p>" +
      outlinks.map(u => s"""<a href="$u">out</a>""").mkString(" ") +
      "</body></html>"
    ("response", s"https://$host$path", graft.sources.Warc.httpResponse(ascii(html)))
  }
  private def redirect(host: String, path: String,
                       location: String): (String, String, Array[Byte]) =
    ("response", s"https://$host$path", graft.sources.Warc.httpResponseWith(
      Array.empty[Byte], status = "301 Moved Permanently",
      extraHeaders = Seq(s"Location: $location")))

  test("crawl demo: every stage count reconciles on a two-host fixture") {
    val dir = graft.sources.Scratch.dir("graft_crawl_fix").toString
    val out = graft.sources.Scratch.dir("graft_crawl_out").toString + "/export"
    val tbl = "graft_crawldemo_frontier"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    graft.sources.Warehouse.clearOrphanLocation(spark, tbl)
    // four pages, two hosts; every body is English-ish (passes the
    // refine language gate) and unique (survives exact dedup)
    def body(i: Int) =
      s"the page number $i describes the data and the methods used in " +
      s"the careful study of the system with detail item $i"
    val segs = Seq(
      Seq(
        ("warcinfo", null: String, ascii("software: graft\r\n")),
        page("a.com", "/p1", body(1), Seq("https://b.com/x", "/local1")),
        page("a.com", "/p2", body(2), Seq("https://b.com/y")),
        // spam page: English (passes the lang gate) but carries a C4
        // blocklist word — the badwords gate must drop it AND charge
        // a.com's keep-rate in the quality loop; no outlinks, so the
        // discovery pool and host graph are untouched
        page("a.com", "/spam", "the casino site offers the games and " +
          "the best of the chances for the win", Seq()),
        // redirect chain to an UNCRAWLED target → frontier discovery
        redirect("a.com", "/moved", "/fresh"),
        // 2-cycle: must cap out as looped, never enter the frontier
        redirect("a.com", "/l1", "/l2"),
        redirect("a.com", "/l2", "/l1")),
      Seq(
        ("warcinfo", null: String, ascii("software: graft\r\n")),
        page("b.com", "/q1", body(3), Seq("https://a.com/z")),
        page("b.com", "/q2", body(4), Seq()),
        // cross-host redirect whose terminal is ALSO link-discovered —
        // the pool dedups to one slot
        redirect("b.com", "/oldq", "https://a.com/z")))
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
    // fetched sitemap content: /sm1 is sitemap-ONLY discovery, /nav
    // overlaps link discovery (dedup), b.com/smdenied is robots-gated;
    // the unpublished.xml content must be IGNORED (no robots pointer)
    val sitemaps = Seq(
      ("https://a.com/sitemap.xml",
        "<urlset><url><loc>https://a.com/sm1</loc></url>" +
          "<url><loc>https://a.com/nav</loc></url>" +
          "<url><loc>https://b.com/smdenied</loc></url></urlset>"),
      ("https://a.com/unpublished.xml",
        "<urlset><url><loc>https://a.com/ghost</loc></url></urlset>"))
      .toDF("sitemap_url", "xml")
    try {
      val r = CrawlDemo.run(spark, dir, robots, out,
        sitemaps = Some(sitemaps), frontierTable = tbl)
      assert(r.records == 11,
        s"2 warcinfo + 5 pages + 4 redirects, got ${r.records}")
      assert(r.pages == 5 && r.extracted == 5)
      // no page in this fixture carries a robots meta — both gates idle
      assert(r.noindexPages == 0 && r.nofollowPages == 0)
      // redirect side: 4 sources (moved, l1, l2, oldq); l1/l2 loop;
      // terminals dedup to {a.com/fresh, a.com/z}
      assert(r.redirects == 4, s"redirect edges ${r.redirects}")
      assert(r.redirectLoops == 2, s"loops ${r.redirectLoops}")
      assert(r.redirectTerminals == 2, s"terminals ${r.redirectTerminals}")
      // host edges: a→b (outlinks to b), a→a (/local1 + /nav self),
      // b→a (outlink), b→b (/nav self) — 4 distinct edges, 2 hosts
      assert(r.hostEdges == 4, s"edges ${r.hostEdges}")
      assert(r.rankedHosts == 2)
      assert(r.sitemapsDiscovered == 1, s"sitemaps ${r.sitemapsDiscovered}")
      assert(r.sitemapUrls == 3, s"sitemap urls ${r.sitemapUrls} (ghost leaked?)")
      // discovery pool: links {b/x, b/y, a/z, a/local1, a/nav, b/nav}
      // ∪ terminals {a/fresh, a/z} ∪ sitemap {a/sm1, a/nav, b/smdenied}
      // = 9 distinct; b.com's 4 deny, a.com's 5 allow
      assert(r.frontierAllowed == 5 && r.frontierDenied == 4,
        s"frontier ${r.frontierAllowed}+${r.frontierDenied}")
      // budget: 5 allowed a.com URLs, maxPerHost=4, equal scores →
      // url-asc keeps fresh/local1/nav/sm1 and drops /z
      assert(r.scheduled == 4, s"scheduled ${r.scheduled}")
      // a.com's 7 s delay: slots 1-3 wait (slot 0 fetches now)
      assert(r.delayedSlots == 3, s"delayedSlots ${r.delayedSlots}")
      // four of the five unique texts survive refinement (the spam
      // page fails the C4 badwords gate); both exports audit clean,
      // and the WET leg reads back through the proven reader
      assert(r.survivors == 4 && r.auditOk, s"survivors ${r.survivors}")
      assert(r.wetAuditOk, "WET export must audit clean")
      // anchor field: four content-link targets ({b/x, a/local1, b/y,
      // a/z}, all labeled "out"; the chrome /nav labels stay out), none
      // of them a crawled page — so the export's field is all-NULL and
      // the probe ranking finds nothing (no body says "out" either)
      assert(r.anchorTargets == 4, s"anchor targets ${r.anchorTargets}")
      assert(r.anchoredSurvivors == 0 && r.anchorFusedHits == 0)
      // the WAT artifact: one metadata record per crawled 200-page,
      // audited under its own record type
      assert(r.watRecords == r.pages,
        s"WAT records ${r.watRecords} != pages ${r.pages}")
      assert(r.watAuditOk, "WAT export must audit clean")
      // the publish → index → consume loop reconciles: every survivor
      // fetches back through the CDXJ-roundtripped capture index
      assert(r.cdxFetched == r.survivors,
        s"cdx fetch ${r.cdxFetched} != survivors ${r.survivors}")
      val wetBack = graft.sources.Warc.readWarc(spark, out + "_wet")
        .filter(col("warc_type") === "conversion")
      assert(wetBack.count() == 4)
      // the persisted frontier holds all 5 allowed URLs; the census
      // reports it with its row count
      val census = r.census.collect()
      assert(census.map(_.getString(0)).toSeq == Seq(tbl), census.mkString)
      assert(census.head.getLong(1) == 5L, s"frontier rows ${census.head}")
      // a re-run appends nothing (idempotent per URL) and schedules
      // identically
      val r2 = CrawlDemo.run(spark, dir, robots, out,
        sitemaps = Some(sitemaps), frontierTable = tbl)
      assert(r2.census.collect().head.getLong(1) == 5L,
        "re-run must not grow the frontier")
      assert(r2.scheduled == 4)
      // the export carries the host rank column for every row
      val exported = spark.read.parquet(out)
      assert(exported.count() == 4)
      assert(exported.filter(col("host_rank_micro").isNull).count() == 0,
        "every exported doc must carry its host's rank")
      // rank sanity: both hosts received mass (positive micro-units)
      assert(exported.select("host_rank_micro").as[Long].collect().forall(_ > 0))
      // the QUALITY LOOP fed the frontier — and the badwords gate
      // charges it: a.com yielded 2 keepers of 3 pages (the spam page
      // fell), so its keep-rate is floor(2000/3) = 666 milli and each
      // a.com frontier row's score must be exactly rank × 666 (a
      // rank-only score would store the bare rank; a gate that didn't
      // reach the quality loop would store rank × 1000)
      val aRank = exported.filter(col("host") === "a.com")
        .select("host_rank_micro").as[Long].head()
      val fScores = spark.table(tbl)
        .filter(col("url").startsWith("https://a.com/"))
        .select("score").as[Long].collect()
      assert(fScores.nonEmpty && fScores.forall(_ == aRank * 666L),
        s"frontier scores must be rank×quality: ${fScores.mkString(",")} " +
          s"vs ${aRank * 666L}")
    } finally spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }

  test("robots meta directives gate the demo: noindex drops content, nofollow drops outlinks") {
    val dir = graft.sources.Scratch.dir("graft_crawl_meta").toString
    val out = graft.sources.Scratch.dir("graft_crawl_mout").toString + "/export"
    val tbl = "graft_crawldemo_meta_frontier"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    graft.sources.Warehouse.clearOrphanLocation(spark, tbl)
    def metaPage(path: String, robots: String, mark: Int,
                 link: String): (String, String, Array[Byte]) = {
      val meta = if (robots == null) ""
        else s"""<meta name="robots" content="$robots">"""
      val html = s"<html><head>$meta</head><body><p>the page about " +
        s"careful study number $mark with detailed methods and data " +
        s"item $mark</p><a href=\"$link\">l</a></body></html>"
      ("response", s"https://c.com$path",
        graft.sources.Warc.httpResponse(ascii(html)))
    }
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "seg-00000.warc"),
      graft.sources.Warc.buildSegment(Seq(
        metaPage("/p1", null, 1, "/l1"),        // plain: content + link
        metaPage("/p2", "noindex", 2, "/l2"),   // content gone, link stays
        metaPage("/p3", "nofollow", 3, "/l3")))) // content stays, link gone
    val robots = Seq(("c.com", "User-agent: *\nAllow: /\n"))
      .toDF("host", "robots_txt")
    try {
      val r = CrawlDemo.run(spark, dir, robots, out, frontierTable = tbl)
      assert(r.pages == 3 && r.noindexPages == 1 && r.nofollowPages == 1,
        s"pages=${r.pages} noindex=${r.noindexPages} nofollow=${r.nofollowPages}")
      // content gate: p2's text never reaches extraction/refinement
      assert(r.extracted == 2 && r.survivors == 2,
        s"extracted=${r.extracted} survivors=${r.survivors}")
      // link gate: /l3 never enters discovery — /l1 (p1) and /l2 (p2:
      // noindex still FOLLOWS) do
      assert(r.frontierAllowed == 2, s"allowed=${r.frontierAllowed}")
      val frontierUrls = spark.table(tbl)
        .select("url").as[String].collect().toSet
      assert(frontierUrls == Set("https://c.com/l1", "https://c.com/l2"),
        frontierUrls.toString)
      // WAT still records every capture (metadata is not content)
      assert(r.watRecords == 3)
      // anchor targets: p1/p2's links carry text "l"; p3's nofollow
      // edge never exists, so /l3 is no anchor target either
      assert(r.anchorTargets == 2, s"anchor targets ${r.anchorTargets}")
    } finally spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }

  test("anchor-text leg: per-target field joins the export and wins as a fused BM25 field") {
    val dir = graft.sources.Scratch.dir("graft_crawl_anch").toString
    val out = graft.sources.Scratch.dir("graft_crawl_aout").toString + "/export"
    val tbl = "graft_crawldemo_anchor_frontier"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    graft.sources.Warehouse.clearOrphanLocation(spark, tbl)
    // two pages that link to EACH OTHER with descriptive labels the
    // target's own text never contains — the navigational case anchor
    // fields exist for
    def linkedPage(path: String, mark: String, href: String,
                   label: String): (String, String, Array[Byte]) = {
      val html = s"<html><body><p>the $mark page describes careful " +
        s"methods and data in detail for the study item $mark</p>" +
        s"""<a href="$href">$label</a></body></html>"""
      ("response", s"https://d.com$path",
        graft.sources.Warc.httpResponse(ascii(html)))
    }
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "seg-00000.warc"),
      graft.sources.Warc.buildSegment(Seq(
        linkedPage("/p1", "first", "/p2", "silver banana guide"),
        linkedPage("/p2", "second", "/p1", "crimson kiwi manual"))))
    val robots = Seq(("d.com", "User-agent: *\nAllow: /\n"))
      .toDF("host", "robots_txt")
    try {
      val r = CrawlDemo.run(spark, dir, robots, out, frontierTable = tbl)
      assert(r.survivors == 2 && r.auditOk)
      // both crawled pages ARE anchor targets, so the field joins both
      assert(r.anchorTargets == 2 && r.anchoredSurvivors == 2,
        s"targets=${r.anchorTargets} anchored=${r.anchoredSurvivors}")
      // the export carries each page's INBOUND description
      val exported = spark.read.parquet(out)
      val terms = exported.select("doc_id", "anchor_terms")
        .as[(Long, String)].collect().toMap
      assert(terms.values.toSet ==
        Set("silver banana guide", "crimson kiwi manual"), terms.toString)
      // the probe (tie on n_anchors=1 → url-asc picks /p1 → leading
      // term "crimson") appears in NO body text, so the body ranking
      // is empty and the fused ranking still finds p1 through its
      // anchor field — the navigational win, observable as exactly
      // one fused hit
      assert(r.anchorFusedHits == 1, s"fused hits ${r.anchorFusedHits}")
    } finally spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }
}
