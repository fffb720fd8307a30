package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Html]] — main-content extraction. The kernel is pinned on
  * hand-built tag soup (every state-machine transition), the
  * classifier on boundary fixtures where each rule flips, and the
  * corpus form on composition with [[Corpus.refine]]. */
class HtmlSpec extends SparkSpec {
  import spark.implicits._

  private def blocks(html: String): Seq[(String, Int, Boolean)] =
    Html.extractBlocks(html).map(b => (b.text, b.linkChars, b.inChrome))

  test("kernel: tags strip, blocks segment at block tags, inline tags do not break blocks") {
    val got = blocks("<p>one <b>bold</b> word</p><div>two</div>three")
    assert(got == Seq(("one bold word", 0, false), ("two", 0, false),
      ("three", 0, false)), got.toString)
  }

  test("kernel: script/style/comments vanish, even with '<' inside and sloppy case") {
    val html = "<p>a</p><SCRIPT>if(a<b){x='</p>';}</SCRIPT>" +
      "<style>p{color:red}</style><!-- <p>ghost</p> --><p>b</p>"
    assert(blocks(html) == Seq(("a", 0, false), ("b", 0, false)))
    // unterminated raw-text element swallows the rest (tolerant, no throw)
    assert(blocks("<p>a</p><script>var x = 1;") == Seq(("a", 0, false)))
  }

  test("kernel: chrome containers flag nested text; unclosed chrome stays chrome") {
    val got = blocks("<nav><div>menu</div></nav><p>body</p>" +
      "<footer><p>foot</p>")
    assert(got == Seq(("menu", 0, true), ("body", 0, false),
      ("foot", 0, true)), got.toString)
  }

  test("recovery: omitted </head> — <body> closes head scope, body text is not chrome") {
    // HTML5 legally omits </head>; without recovery the whole body
    // would classify as chrome and main_text would be silently empty
    val got = blocks("<html><head><title>T</title><body><p>real body text</p>")
    assert(got == Seq(("T", 0, true), ("real body text", 0, false)),
      got.toString)
    // metadata still works on the same slop, and title cannot leak
    // past an omitted </title> once <body> opens
    val s = Html.scanHtml("<head><title>Only Title<body><p>content</p>")
    assert(s.title == "Only Title", s.title)
    assert(s.blocks.map(b => (b.text, b.inChrome)) ==
      Vector(("Only Title", true), ("content", false)))
  }

  test("recovery: unclosed <a> poisons only its own block, not the rest of the document") {
    val got = blocks("<p><a href=\"/x\">cta</p><p>clean text here</p>")
    assert(got == Seq(("cta", 3, false), ("clean text here", 0, false)),
      got.toString)
    // head links are chrome links
    val s = Html.scanHtml("<head><a href=\"/h\">h</a><body><a href=\"/b\">b</a>")
    assert(s.links.map(l => (l.href, l.inChrome)) ==
      Vector(("/h", true), ("/b", false)))
  }

  test("kernel: link chars count inside <a> only; quoted '>' in attributes survives") {
    val got = blocks("""<p><a href="x>y" title='a>b'>link text</a> plain</p>""")
    assert(got == Seq(("link text plain", 9, false)), got.toString)
  }

  test("kernel: entities decode (named + numeric), unknown pass verbatim, nbsp collapses") {
    val got = blocks("<p>a &amp; b &lt;tag&gt; &quot;q&quot; &#65;&#x42; " +
      "&nbsp;&nbsp; c &unknown; d</p>")
    assert(got == Seq(("""a & b <tag> "q" AB c &unknown; d""", 0, false)),
      got.toString)
  }

  test("kernel: stray '<', self-closing tags, whitespace runs, doctype") {
    val got = blocks("<!DOCTYPE html><p>1 < 2   and<br/>more\n\ttext</p>")
    // br is a block tag: it flushes
    assert(got == Seq(("1 < 2 and", 0, false), ("more text", 0, false)),
      got.toString)
  }

  test("classifier boundaries: minChars and maxLinkDensity flip exactly at their thresholds") {
    // length: 10 chars kept at minChars=10, dropped at 11
    val ten = "<p>abcdefghij</p>"
    assert(Html.extractMainKernel(ten, 10, 1.0) == (("abcdefghij", 1, 0)))
    assert(Html.extractMainKernel(ten, 11, 1.0) == (("", 0, 1)))
    // link density: text "aaaa b" with 4 linked of 6 → 0.666…; keep at
    // 0.67, drop at 0.66 (<= comparison)
    val link = "<p><a>aaaa</a> b</p>"
    assert(Html.extractMainKernel(link, 1, 0.67) == (("aaaa b", 1, 0)))
    assert(Html.extractMainKernel(link, 1, 0.66) == (("", 0, 1)))
  }

  test("extractMainText: corpus form — NULL html degrades, output composes with Corpus.refine") {
    val docs = Seq(
      (1L, "<body><nav><a href=/>Home</a></nav>" +
        "<p>the quick brown fox jumps over the lazy dog today</p>" +
        "<footer>(c) corp</footer></body>"),
      (2L, null.asInstanceOf[String])
    ).toDF("doc_id", "html")
    val got = Html.extractMainText(docs, "doc_id", "html")
      .collect().map(r => r.getLong(0) ->
        ((Option(r.getString(1)), r.getInt(2), r.getInt(3)))).toMap
    assert(got(1L) ==
      ((Some("the quick brown fox jumps over the lazy dog today"), 1, 2)))
    assert(got(2L) == ((None, 0, 0)))
    // the CCNet order: extract first, then the refine gates — the
    // extracted frame is a (doc_id, text) corpus like any other
    val refined = Corpus.refine(
      Html.extractMainText(docs.filter(col("doc_id") === 1L), "doc_id", "html")
        .select(col("doc_id"), col("main_text").as("text")),
      "doc_id", "text", minQuality = None)
    assert(refined.count() == 1L)
  }

  test("extractLinks: attribute forms, entity decode, chrome flags, no ghost links") {
    val html = "<nav><a href=\"/home\">Home</a></nav>" +
      "<p><a href='/single'>s</a> <a href=bare>b</a> " +
      "<A HREF=\"/q?a=1&amp;b=2\">ent</A> " +
      "<a name=x>no href</a> <a href=\"/dup\" href=\"/second\">first wins</a></p>" +
      "<script>var s = '<a href=\"/ghost1\">';</script>" +
      "<!-- <a href=\"/ghost2\">x</a> -->" +
      "<a href=\"/tail\"/>"
    val got = Html.extractLinksKernel(html)
    assert(got.map(l => (l.href, l.inChrome)) == Vector(
      ("/home", true), ("/single", false), ("bare", false),
      ("/q?a=1&b=2", false), ("/dup", false), ("/tail", false)),
      got.toString)
    // corpus form: doc order preserved, NULL html yields no rows
    val docs = Seq((1L, html), (2L, null.asInstanceOf[String])).toDF("doc_id", "html")
    val rows = Html.extractLinks(docs, "doc_id", "html")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSeq
    assert(rows.map(_._1).forall(_ == 1L) && rows.size == 6)
    assert(rows.sortBy(_._2).map(_._3) ==
      Seq("/home", "/single", "bare", "/q?a=1&b=2", "/dup", "/tail"))
  }

  test("head metadata: first title/description/base win, entities decode, ws collapses") {
    val html = "<html><head><title>One\n  &amp;  Two</title>" +
      "<title>second ignored</title>" +
      "<base href=\"/b1?a=1&amp;b=2\"><base href=\"/b2\">" +
      "<meta content=\"first desc\" name=\"Description\">" +
      "<meta name=\"description\" content=\"second ignored\">" +
      "</head><body><a href=\"x\">l</a></body></html>"
    val s = Html.scanHtml(html)
    assert(s.title == "One & Two", s.title)
    assert(s.baseHref == "/b1?a=1&b=2", s.baseHref)
    assert(s.metaDescription == "first desc", s.metaDescription)
    // absent fields are null; NULL html degrades in the corpus form
    val bare = Html.scanHtml("<p>no head</p>")
    assert(bare.title == null && bare.baseHref == null &&
      bare.metaDescription == null)
    val docs = Seq((1L, html), (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "html")
    val rows = Html.extractMetadata(docs, "doc_id", "html")
      .collect().map(r => r.getLong(0) ->
        ((Option(r.getString(1)), Option(r.getString(3)), r.getInt(4)))).toMap
    assert(rows(1L) == ((Some("One & Two"), Some("/b1?a=1&b=2"), 1)))
    assert(rows(2L) == ((None, None, 0)))
    // extractLinks now carries base_href on every row
    val link = Html.extractLinks(docs.filter(col("doc_id") === 1L),
        "doc_id", "html").select("base_href").head()
    assert(link.getString(0) == "/b1?a=1&b=2")
  }

  test("extractMainText rejects degenerate parameters at plan time") {
    val docs = Seq((1L, "<p>x</p>")).toDF("doc_id", "html")
    intercept[IllegalArgumentException](
      Html.extractMainText(docs, "doc_id", "html", minChars = 0))
    intercept[IllegalArgumentException](
      Html.extractMainText(docs, "doc_id", "html", maxLinkDensity = 1.5))
  }

  test("robotsDirectives: token parsing, none, case/space slop, absent default, most-restrictive combine") {
    import spark.implicits._
    val docs = Seq(
      (1L, """<html><head><meta name="robots" content="noindex, nofollow"></head></html>"""),
      (2L, """<html><head><meta name="ROBOTS" content=" NoIndex "></head></html>"""),
      (3L, """<html><head><meta name=robots content=none></head></html>"""),
      (4L, """<html><head><meta name="robots" content="index, follow"></head></html>"""),
      (5L, "<html><head><title>no directive</title></head></html>"),
      // multiple robots metas combine, most restrictive wins (the
      // CMS-plus-plugin reality); a DIFFERENT meta name never matches
      (6L, """<html><head><meta name="robots" content="nofollow"><meta name="robots" content="noindex"></head></html>"""),
      (7L, """<html><head><meta name="googlebot" content="noindex"></head></html>"""),
      (8L, null.asInstanceOf[String]))
      .toDF("doc_id", "html")
    val got = Html.robotsDirectives(docs, "doc_id", "html")
      .orderBy("doc_id")
      .select("meta_robots", "noindex", "nofollow")
      .as[(String, Boolean, Boolean)].collect().toSeq
    assert(got == Seq(
      ("noindex, nofollow", true, true),
      (" NoIndex ", true, false),
      ("none", true, true),
      ("index, follow", false, false),
      (null, false, false),
      ("nofollow; noindex", true, true),
      (null, false, false),
      (null, false, false)), got.mkString("\n"))
  }

  test("canonicalTargets: relative/absolute/base-href resolution, self-canonical default, totality") {
    import spark.implicits._
    val docs = Seq(
      // relative canonical resolves against the PAGE URL
      (1L, "https://a.com/dir/v1.html",
        """<html><head><link rel="canonical" href="main.html"></head></html>"""),
      // absolute canonical with case slop canonicalizes
      (2L, "https://a.com/v2.html",
        """<html><head><link rel="CANONICAL" href="HTTPS://A.COM:443/main.html"></head></html>"""),
      // a declared <base href> wins over the page URL for resolution
      (3L, "https://a.com/v3.html",
        """<html><head><base href="https://b.org/root/"><link rel="canonical" href="main.html"></head></html>"""),
      // no declaration: the page is its own canonical
      (4L, "https://a.com/solo.html", "<html><head></head></html>"),
      // first rel=canonical wins; other rels never match
      (5L, "https://a.com/v5.html",
        """<html><head><link rel="stylesheet" href="s.css"><link rel="canonical" href="/one.html"><link rel="canonical" href="/two.html"></head></html>"""),
      // NULL html: self-canonical, no declaration — the column is total
      (6L, "https://a.com/vnull.html", null.asInstanceOf[String]),
      // a ROOT-RELATIVE <base href> (valid HTML) resolves against the
      // page URL first — it must not discard the declaration
      (7L, "https://a.com/x/v7.html",
        """<html><head><base href="/en/"><link rel="canonical" href="main.html"></head></html>"""),
      // rel is a space-separated token list
      (8L, "https://a.com/v8.html",
        """<html><head><link rel="canonical alternate" href="/main.html"></head></html>"""),
      // a canonical injected AFTER <body> opens (the SEO-injection
      // vector: user content echoed into the page) never counts
      (9L, "https://a.com/v9.html",
        """<html><head></head><body><link rel="canonical" href="https://spam.example/"></body></html>"""))
      .toDF("doc_id", "url", "html")
    val got = Html.canonicalTargets(docs, "doc_id", "url", "html")
      .orderBy("doc_id")
      .select("canonical_href", "canonical_url")
      .as[(String, String)].collect().toSeq
    assert(got == Seq(
      ("main.html", "https://a.com/dir/main.html"),
      ("HTTPS://A.COM:443/main.html", "https://a.com/main.html"),
      ("main.html", "https://b.org/root/main.html"),
      (null, "https://a.com/solo.html"),
      ("/one.html", "https://a.com/one.html"),
      (null, "https://a.com/vnull.html"),
      ("main.html", "https://a.com/en/main.html"),
      ("/main.html", "https://a.com/main.html"),
      (null, "https://a.com/v9.html")), got.mkString("\n"))
  }

  test("implicit body open: content without <body> still gates head-scoped signals") {
    // a body-less template whose user-content echo carries a canonical
    // AND a robots meta — text content opened the body implicitly, so
    // neither hijacks the page (round-13 ADVICE: the old guard flipped
    // only on an explicit <body> tag)
    val injected = Html.scanHtml(
      "<html><head><title>T</title></head>" +
        "<p>user content echoed here</p>" +
        "<link rel=\"canonical\" href=\"https://spam.example/\">" +
        "<meta name=\"robots\" content=\"noindex\">")
    assert(injected.canonicalHref == null, "canonical after content must not count")
    assert(injected.robotsMetas.isEmpty, "robots meta after content must not count")
    // a content TAG (not just text) opens the body too
    val tagOpened = Html.scanHtml(
      "<div></div><meta name=robots content=noindex>" +
        "<link rel=canonical href=/x>")
    assert(tagOpened.robotsMetas.isEmpty && tagOpened.canonicalHref == null)
    // head-scoped tags and title TEXT do not open the body: a page
    // that omits <head> entirely keeps its legitimate declarations
    val impliedHead = Html.scanHtml(
      "<html><title>Only Title</title>" +
        "<meta name=\"robots\" content=\"nofollow\">" +
        "<link rel=\"canonical\" href=\"/real.html\">" +
        "<body><p>text</p>")
    assert(impliedHead.robotsMetas == Vector("nofollow"))
    assert(impliedHead.canonicalHref == "/real.html")
    // corpus form: the injected doc reads as allow/self-canonical
    val docs = Seq((1L,
      "<p>echo</p><meta name=robots content=\"noindex,nofollow\">"))
      .toDF("doc_id", "html")
    val rd = Html.robotsDirectives(docs, "doc_id", "html").head()
    assert(rd.getString(1) == null && !rd.getBoolean(2) && !rd.getBoolean(3))
  }

  test("implicit body open: XHTML prolog, BOM, and title text are NOT content — declarations survive") {
    // the '<?xml?>' prolog is a processing instruction, not visible
    // text: an XHTML page's head-scoped robots/canonical must survive
    val xhtml = Html.scanHtml(
      "<?xml version=\"1.0\" encoding=\"UTF-8\"?>" +
        "<html><head><meta name=\"robots\" content=\"noindex\">" +
        "<link rel=\"canonical\" href=\"/real.html\"></head>" +
        "<body><p>content</p></body></html>")
    assert(xhtml.robotsMetas == Vector("noindex"), xhtml.robotsMetas)
    assert(xhtml.canonicalHref == "/real.html")
    // a leading BOM (html not routed through the charset decode)
    // collapses like whitespace — neither body-opening nor block text
    val bom = Html.scanHtml(
      "\uFEFF<html><head><meta name=\"robots\" content=\"nofollow\">" +
        "</head><body><p>x</p></body>")
    assert(bom.robotsMetas == Vector("nofollow"), bom.robotsMetas)
    assert(bom.blocks.map(_.text) == Vector("x"))
  }

  test("unquoted href ending in '/' opens a REAL anchor — text and density credited") {
    // HTML5 ignores a '/' in a start tag; only a STANDALONE slash
    // before '>' self-closes here — the last char of a bare attribute
    // value must not
    val links = Html.extractLinksKernel(
      "<p><a href=https://ex.com/>click here</a> and " +
        "<a href=/dir/ >trailing space</a></p>")
    assert(links.map(l => (l.href, l.text)) == Vector(
      ("https://ex.com/", "click here"),
      ("/dir/", "trailing space")), links.mkString("\n"))
    // density credit follows: the block's linked chars count the label
    val b = Html.extractBlocks("<p><a href=https://ex.com/>click</a> x</p>")
    assert(b == Vector(Html.Block("click x", 5, false)), b.toString)
    // an explicit standalone slash still self-closes
    val sc = Html.extractLinksKernel("<a href=\"/t\" />no label</a>")
    assert(sc.map(l => (l.href, l.text)) == Vector(("/t", null)))
    // the FAST-SKIP branch (depth-tracked tags that don't parse
    // attributes) applies the same rule: a bare value ending in '/'
    // must not collapse a chrome/figure scope
    val chrome = blocks("<nav data-home=https://ex.com/>menu</nav>" +
      "<p>content text</p>")
    assert(chrome == Seq(("menu", 0, true), ("content text", 0, false)),
      chrome.toString)
    val figDocs = Seq((1L, "https://a.com/f.html",
      "<figure data-src=/imgs/><img src=\"x.jpg\">" +
        "<figcaption>the cap</figcaption></figure>"))
      .toDF("doc_id", "url", "html")
    val fig = Html.imageTextPairs(figDocs, "doc_id", "url", "html")
      .select("caption").as[String].head()
    assert(fig == "the cap", fig)
    // ...while '<br/>' style self-closing syntax keeps working
    assert(blocks("<p>a<br/>b</p>") == Seq(("a", 0, false), ("b", 0, false)))
  }

  test("nested figcaption whitespace: a space falling inside a nested figure still separates the outer caption's words") {
    val docs = Seq((1L, "https://a.com/w.html",
      "<figure><img src=\"a.jpg\"><figcaption>Hello" +
        "<figure> </figure>world</figcaption></figure>"))
      .toDF("doc_id", "url", "html")
    val got = Html.imageTextPairs(docs, "doc_id", "url", "html")
      .select("caption").as[String].head()
    assert(got == "Hello world", got)
  }

  test("nested figures: captions bind nearest-enclosing, outer fills only the uncaptioned remainder") {
    val docs = Seq((1L, "https://a.com/f.html",
      "<figure><img src=\"a.jpg\">" +
        "<figure><img src=\"b.jpg\"><figcaption>B cap</figcaption></figure>" +
        "<img src=\"c.jpg\">" +
        "<figcaption>A cap</figcaption></figure>" +
        // unclosed figure: closes at end-of-document, caption binds
        "<figure><img src=\"d.jpg\"><figcaption>D cap</figcaption>"))
      .toDF("doc_id", "url", "html")
    val got = Html.imageTextPairs(docs, "doc_id", "url", "html")
      .orderBy("img_pos").select("src", "caption")
      .as[(String, String)].collect().toSeq
    assert(got == Seq(("a.jpg", "A cap"), ("b.jpg", "B cap"),
      ("c.jpg", "A cap"), ("d.jpg", "D cap")), got.mkString("\n"))
  }

  test("anchor text: entity decode, nested markup strips, block boundary ends credit, textless is NULL") {
    val links = Html.extractLinksKernel(
      "<p><a href=\"/a\">Big  <b>Bold</b>\n text &amp; more</a>" +
        " <a href=\"/b\"><img src=\"i.png\"></a>" +
        " <a href=\"/c\">start<p>after the boundary</p>more</a></p>" +
        "<nav><a href=\"/n\">Nav Label</a></nav>")
    assert(links.map(l => (l.href, l.text, l.inChrome)) == Vector(
      ("/a", "Big Bold text & more", false),
      ("/b", null, false),
      ("/c", "start", false),
      ("/n", "Nav Label", true)), links.mkString("\n"))
    // invalid nested <a href>: the OUTERMOST anchor owns the text,
    // the inner row keeps its edge with NULL text
    val nested = Html.extractLinksKernel(
      "<a href=\"/outer\">out <a href=\"/inner\">in</a> side</a>")
    assert(nested.map(l => (l.href, l.text)) == Vector(
      ("/outer", "out in side"), ("/inner", null)), nested.mkString("\n"))
    // corpus form carries anchor_text next to href
    val rows = Html.extractLinks(
        Seq((1L, "<a href=/x>label</a><a href=/y></a>")).toDF("doc_id", "html"),
        "doc_id", "html")
      .orderBy("link_pos").select("href", "anchor_text")
      .as[(String, String)].collect().toSeq
    assert(rows == Seq(("/x", "label"), ("/y", null)))
  }

  test("imageTextPairs: src resolution, alt/caption semantics, figcaption association, chrome") {
    val docs = Seq(
      (1L, "https://a.com/dir/page.html",
        "<html><head><title>Page &amp; Title</title></head><body>" +
          // relative src resolves against the page URL
          "<img src=\"pics/cat.jpg\" alt=\"A &quot;cat&quot; photo\">" +
          // absolute src canonicalizes; explicit empty alt stays ""
          "<img src=\"HTTPS://B.ORG:443/dog.png\" alt=\"\">" +
          // no alt, title attribute becomes the caption fallback
          "<img src=\"/bird.gif\" title=\"a bird\">" +
          // src-less img yields no row
          "<img alt=\"ghost\">" +
          "</body></html>"),
      // figure/figcaption: caption binds to imgs of the SAME figure,
      // whether it precedes or follows them; title attr loses to it
      (2L, "https://a.com/fig.html",
        "<figure><img src=\"f1.jpg\" alt=\"one\" title=\"t1\">" +
          "<figcaption>The  real &amp; caption</figcaption>" +
          "<img src=\"f2.jpg\"></figure>" +
          "<figure><img src=\"f3.jpg\"></figure>" +
          "<img src=\"f4.jpg\">"),
      // base-href-aware resolution + chrome flag
      (3L, "https://a.com/x/b.html",
        "<html><head><base href=\"/en/\"></head><body>" +
          "<nav><img src=\"logo.svg\" alt=\"logo\"></nav>" +
          "<img src=\"hero.jpg\" alt=\"hero\"></body></html>"),
      (4L, "https://a.com/n.html", null.asInstanceOf[String]))
      .toDF("doc_id", "url", "html")
    val got = Html.imageTextPairs(docs, "doc_id", "url", "html")
      .orderBy("doc_id", "img_pos")
      .select("doc_id", "image_url", "alt_text", "caption", "in_chrome",
        "page_title")
      .as[(Long, String, String, String, Boolean, String)].collect().toSeq
    assert(got == Seq(
      (1L, "https://a.com/dir/pics/cat.jpg", "A \"cat\" photo", null, false,
        "Page & Title"),
      (1L, "https://b.org/dog.png", "", null, false, "Page & Title"),
      (1L, "https://a.com/bird.gif", null, "a bird", false, "Page & Title"),
      (2L, "https://a.com/f1.jpg", "one", "The real & caption", false, null),
      (2L, "https://a.com/f2.jpg", null, "The real & caption", false, null),
      (2L, "https://a.com/f3.jpg", null, null, false, null),
      (2L, "https://a.com/f4.jpg", null, null, false, null),
      (3L, "https://a.com/en/logo.svg", "logo", null, true, null),
      (3L, "https://a.com/en/hero.jpg", "hero", null, false, null)),
      got.mkString("\n"))
  }

  test("appendToAnchorTable: per-page idempotent; crash between postings and markers dedups on re-absorb") {
    val tbl = "graft_anchor_spec_tbl"
    Seq(tbl, s"${tbl}_pages").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      graft.sources.Warehouse.clearOrphanLocation(spark, t)
    }
    def pages(rows: (Long, String, String)*) =
      rows.toDF("doc_id", "url", "html")
    val p12 = pages(
      (1L, "https://a.com/1", "<a href=\"/x\">one label</a>"),
      // a zero-link page must still MARK, or it re-scans every replay
      (2L, "https://a.com/2", "<p>no links at all</p>"))
    assert(Html.appendToAnchorTable(spark, p12, "doc_id", "url", "html", tbl) == 2L)
    assert(Html.appendToAnchorTable(spark, p12, "doc_id", "url", "html", tbl) == 0L,
      "replay must absorb nothing")
    // crash window: doc 3's POSTINGS land but its marker does not —
    // the next absorb re-extracts (marker missing) and the row-level
    // anti-join against the postings' own doc ids drops the duplicates
    val p3 = pages((3L, "https://a.com/3", "<a href=\"/x\">three label</a>"))
    Html.anchorTextEdges(p3, "doc_id", "url", "html")
      .write.mode("append").saveAsTable(tbl)
    assert(Html.appendToAnchorTable(spark, p3, "doc_id", "url", "html", tbl) == 1L)
    assert(spark.table(tbl).filter(col("doc_id") === 3L).count() == 1L,
      "crash-window re-absorb must not duplicate postings")
    // the served profile aggregates everything absorbed, exactly once
    val prof = Html.anchorProfileFromTable(spark, tbl)
      .orderBy("dst_url")
      .select("dst_url", "n_anchors", "n_src_pages", "anchor_terms")
      .as[(String, Long, Long, String)].collect().toSeq
    assert(prof == Seq(("https://a.com/x", 2L, 2L, "one label three label")),
      prof.toString)
    Seq(tbl, s"${tbl}_pages").foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  test("anchorTextEdges: base-aware canonical destinations with anchor text, shuffle-free") {
    val docs = Seq(
      (1L, "https://a.com/src.html",
        "<a href=\"next.html\">Next &amp; Prev</a>" +
          "<a href=\"HTTPS://B.ORG:443/x\"><img src=i.png></a>"),
      (2L, "https://a.com/x/b.html",
        "<head><base href=\"/en/\"></head><body>" +
          "<a href=\"rel.html\">deep label</a>"))
      .toDF("doc_id", "url", "html")
    val got = Html.anchorTextEdges(docs, "doc_id", "url", "html")
      .orderBy("doc_id", "link_pos")
      .select("src_url", "dst_url", "anchor_text", "in_chrome")
      .as[(String, String, String, Boolean)].collect().toSeq
    assert(got == Seq(
      ("https://a.com/src.html", "https://a.com/next.html", "Next & Prev", false),
      ("https://a.com/src.html", "https://b.org/x", null, false),
      ("https://a.com/x/b.html", "https://a.com/en/rel.html", "deep label", false)),
      got.mkString("\n"))
    // extraction is one kernel pass + scalar kernels: no exchange in
    // the plan (the src_url column rides the row, never re-joined)
    val plan = Html.anchorTextEdges(docs, "doc_id", "url", "html")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("interleaveKernel: placeholders at document positions, chrome imgs out, boilerplate text dies while its images live") {
    val long1 = "This opening paragraph carries plenty of characters."
    val long2 = "The second paragraph also easily clears the bar."
    // mid-paragraph image anchors BEFORE its containing block
    val (t1, i1, k1, _, _) = Html.interleaveKernel(
      s"<p>half $long1<img src='mid.jpg' alt='m'> rest</p><p>$long2</p>",
      25, 0.33)
    assert(t1 == s"<|image_0|>\nhalf $long1 rest\n$long2", t1)
    assert(i1.map(_._1).toSeq == Seq("mid.jpg") && k1 == 2)
    // between-paragraph image lands between; trailing image trails;
    // chrome logo never emits; a dropped block's image survives
    val (t2, i2, _, _, _) = Html.interleaveKernel(
      s"<nav>chrome<img src='logo.png'></nav><p>$long1</p>" +
        s"<img src='a.jpg'><p>$long2</p><div>tiny<img src='b.png'></div>",
      25, 0.33)
    assert(t2 == s"$long1\n<|image_0|>\n$long2\n<|image_1|>", t2)
    assert(i2.map(_._1).toSeq == Seq("a.jpg", "b.png"))
    // all text dropped: images still emit, in order, text is only
    // placeholders
    val (t3, i3, k3, _, _) = Html.interleaveKernel(
      "<p>tiny</p><img src='x.png'><p>wee</p><img src='y.png'>", 25, 0.33)
    assert(t3 == "<|image_0|>\n<|image_1|>" && i3.length == 2 && k3 == 0, t3)
    // caption ladder: figcaption beats title beats alt
    val (_, i4, _, _, _) = Html.interleaveKernel(
      "<figure><img src='f.png' title='T' alt='A'>" +
        "<figcaption>FC</figcaption></figure>" +
        "<img src='g.png' title='T2' alt='A2'><img src='h.png' alt='A3'>",
      25, 0.33)
    assert(i4.map(_._2).toSeq == Seq("FC", "T2", "A3"), i4.mkString(","))
    // DataFrame surface: NULL html → NULL text, empty arrays; no
    // exchange in the plan
    val df = Seq((1L, "https://a.com/p.html", null: String))
      .toDF("doc_id", "url", "html")
    val row = Html.interleavedDocs(df, "doc_id", "url", "html").head()
    assert(row.getString(2) == null && row.getInt(6) == 0)
    val plan = Html.interleavedDocs(df, "doc_id", "url", "html")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }
}
