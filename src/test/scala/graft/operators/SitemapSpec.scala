package graft.operators

import graft.SparkSpec

/** [[Sitemap]] — protocol parsing. Both entry kinds, optional fields,
  * entity decode, namespaces, CDATA, and degradation are pinned on
  * hand-built XML. */
class SitemapSpec extends SparkSpec {
  import spark.implicits._

  private def entries(xml: String) =
    Sitemap.parseKernel(xml).map(e =>
      (e.kind, e.loc, e.lastmod, e.changefreq, e.priority))

  test("urlset: full and minimal entries, document order, entity decode") {
    val xml = """<?xml version="1.0" encoding="UTF-8"?>
      <urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
        <url>
          <loc>https://a.com/p?x=1&amp;y=2</loc>
          <lastmod>2026-01-15</lastmod>
          <changefreq>daily</changefreq>
          <priority>0.8</priority>
        </url>
        <url><loc> https://a.com/q </loc></url>
      </urlset>"""
    assert(entries(xml) == Vector(
      ("url", "https://a.com/p?x=1&y=2", "2026-01-15", "daily", "0.8"),
      ("url", "https://a.com/q", null, null, null)), entries(xml).toString)
  }

  test("sitemapindex entries surface with kind=sitemap") {
    val xml = """<sitemapindex>
      <sitemap><loc>https://a.com/sitemap1.xml.gz</loc>
        <lastmod>2026-02-01T00:00:00Z</lastmod></sitemap>
      <sitemap><loc>https://a.com/sitemap2.xml.gz</loc></sitemap>
    </sitemapindex>"""
    assert(entries(xml) == Vector(
      ("sitemap", "https://a.com/sitemap1.xml.gz", "2026-02-01T00:00:00Z", null, null),
      ("sitemap", "https://a.com/sitemap2.xml.gz", null, null, null)))
  }

  test("slop: locless entries drop, namespaced tags match, CDATA, comments, torn tail") {
    val xml = """<urlset>
      <url><lastmod>2026-01-01</lastmod></url>
      <url><sm:loc><![CDATA[https://a.com/r?a=1&b=2]]></sm:loc></url>
      <!-- <url><loc>https://ghost.com/</loc></url> -->
      <url><loc>https://a.com/s</loc><priority>1.0"""
    assert(entries(xml) == Vector(
      ("url", "https://a.com/r?a=1&b=2", null, null, null)),
      entries(xml).toString)
    // stray loc outside any entry does not exist
    assert(entries("<urlset><loc>https://x.com/</loc></urlset>").isEmpty)
    assert(entries(null) == Vector.empty)
  }

  test("mismatched close tags neither end nor mislabel the open entry") {
    // a stray </sitemap> inside a <url> is noise: the entry survives
    // and closes at its REAL </url>
    val stray = "<urlset><url><loc>https://a.com/1</loc></sitemap>" +
      "<lastmod>2026-02-02</lastmod></url></urlset>"
    assert(entries(stray) ==
      Vector(("url", "https://a.com/1", "2026-02-02", null, null)),
      entries(stray).toString)
    // and a </url> close can never emit a <sitemap> entry
    val cross = "<sitemapindex><sitemap><loc>https://a.com/s.xml</loc></url>" +
      "</sitemap></sitemapindex>"
    assert(entries(cross) ==
      Vector(("sitemap", "https://a.com/s.xml", null, null, null)))
  }

  test("unknown nested elements are transparent — an open leaf keeps its collected text") {
    // a vendor extension nested inside <loc> must not discard the loc
    val nested = "<urlset><url><loc>https://a.com/<x:v/>page</loc></url></urlset>"
    assert(entries(nested) ==
      Vector(("url", "https://a.com/page", null, null, null)),
      entries(nested).toString)
    // extension blocks BETWEEN leaves stay inert
    val ext = "<urlset><url><image:image><image:caption>cap</image:caption>" +
      "</image:image><loc>https://a.com/i</loc></url></urlset>"
    assert(entries(ext) ==
      Vector(("url", "https://a.com/i", null, null, null)),
      entries(ext).toString)
  }

  test("corpus form: one row per entry with positions; NULL xml degrades") {
    val df = Seq(
      (1L, "<urlset><url><loc>https://a.com/1</loc></url>" +
        "<url><loc>https://a.com/2</loc></url></urlset>"),
      (2L, null.asInstanceOf[String])).toDF("doc_id", "xml")
    val got = Sitemap.extractEntries(df, "doc_id", "xml")
      .select("doc_id", "entry_pos", "kind", "loc")
      .as[(Long, Int, String, String)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(got == Seq((1L, 0, "url", "https://a.com/1"),
      (1L, 1, "url", "https://a.com/2")), got.toString)
  }
}
