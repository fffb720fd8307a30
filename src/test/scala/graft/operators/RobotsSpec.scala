package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Robots]] — RFC 9309 semantics pinned rule by rule. */
class RobotsSpec extends SparkSpec {
  import spark.implicits._

  private def ok(txt: String, path: String, agent: String = "graftbot") =
    Robots.isAllowedKernel(txt, agent, path)

  test("longest-match wins; Allow beats Disallow on a length tie") {
    val txt =
      """User-agent: *
        |Disallow: /private
        |Allow: /private/ok
        |""".stripMargin
    assert(!ok(txt, "/private/x"))
    assert(ok(txt, "/private/ok/y"), "longer Allow must win")
    assert(ok(txt, "/public"))
    // exact length tie: Allow wins (RFC 9309 §2.2.2)
    val tie = "User-agent: *\nDisallow: /a/\nAllow: /a/$\n"
    // '/a/$' (4 octets) vs '/a/' (3): the $ pattern only matches '/a/'
    assert(ok(tie, "/a/"))
    assert(!ok(tie, "/a/b"))
    val realTie = "User-agent: *\nDisallow: /ab\nAllow: /ab\n"
    assert(ok(realTie, "/ab/x"), "equal-length patterns: Allow wins")
  }

  test("wildcards and end anchors match per the RFC extensions") {
    val txt = "User-agent: *\nDisallow: /*.gif$\nDisallow: /tmp*/logs\n"
    assert(!ok(txt, "/img/banner.gif"))
    assert(ok(txt, "/img/banner.gif?v=2"), "$ must anchor the END")
    assert(ok(txt, "/img/banner.gifx"))
    assert(!ok(txt, "/tmp2024/logs"))
    assert(ok(txt, "/tmp2024/log"))
    // bare-prefix semantics: no implicit anchor
    val p = "User-agent: *\nDisallow: /x$\n"
    assert(!ok(p, "/x"))
    assert(ok(p, "/xy"))
  }

  test("agent-specific groups REPLACE the * groups; same-token groups merge") {
    val txt =
      """User-agent: graftbot
        |Disallow: /only-graft
        |User-agent: *
        |Disallow: /everyone
        |User-agent: GraftBot
        |Disallow: /more-graft
        |""".stripMargin
    // graftbot sees ONLY its groups (both, merged; case-insensitive)
    assert(!ok(txt, "/only-graft/x"))
    assert(!ok(txt, "/more-graft/x"))
    assert(ok(txt, "/everyone/x"), "* rules must NOT apply to a matched agent")
    // another bot falls back to *
    assert(!ok(txt, "/everyone/x", agent = "otherbot"))
    assert(ok(txt, "/only-graft/x", agent = "otherbot"))
  }

  test("allow-all idioms: empty Disallow, missing robots, no matching rule; comments strip") {
    assert(ok("User-agent: *\nDisallow:\n", "/anything"))
    assert(ok(null, "/anything"))
    assert(ok("", "/anything"))
    assert(ok("User-agent: *\nDisallow: /x # but not this\n", "/y"))
    assert(!ok("user-AGENT: *   \n  DISALLOW:   /x   \n", "/x/y"),
      "fields are case-insensitive and whitespace-tolerant")
    // a shared-agent-line group: UA lines stack until the first rule
    val stacked = "User-agent: a\nUser-agent: graftbot\nDisallow: /s\n"
    assert(!ok(stacked, "/s"))
  }

  test("patternMatches agrees with a regex reference over random patterns and paths") {
    // independent semantics statement: '*' → '.*', trailing '$' →
    // end anchor, everything else literal, always anchored at start
    def ref(pattern: String, path: String): Boolean = {
      val anchored = pattern.endsWith("$")
      val p = if (anchored) pattern.dropRight(1) else pattern
      val rx = p.split("\\*", -1).map(java.util.regex.Pattern.quote)
        .mkString("(?s).*") + (if (anchored) "$" else "(?s).*")
      path.matches(rx)
    }
    val rnd = new scala.util.Random(7)
    val atoms = Seq("/", "a", "b", "*", ".gif", "$", "tmp", "x", "*", "/")
    (0 until 3000).foreach { _ =>
      val pattern = (0 until 1 + rnd.nextInt(5))
        .map(_ => atoms(rnd.nextInt(atoms.length))).mkString +
        (if (rnd.nextBoolean()) "$" else "")
      val path = "/" + (0 until rnd.nextInt(6))
        .map(_ => atoms(rnd.nextInt(atoms.length - 3))).mkString
      assert(Robots.patternMatches(pattern, path) == ref(pattern, path),
        s"kernel vs regex diverged: pattern='$pattern' path='$path'")
    }
  }

  test("filterAllowed: per-host join, missing robots allows, bad URLs gate false") {
    val urls = Seq(
      (1L, "https://one.com/private/x"),
      (2L, "https://one.com/open"),
      (3L, "https://two.com/anything"),   // no robots row
      (4L, "mailto:no@way.com"))           // uncanonicalizable
      .toDF("id", "url")
    val robots = Seq(("one.com", "User-agent: *\nDisallow: /private\n"))
      .toDF("host", "robots_txt")
    val got = Robots.filterAllowed(urls, "url", robots, "graftbot")
      .select("id", "allowed").as[(Long, Boolean)].collect().toMap
    assert(got == Map(1L -> false, 2L -> true, 3L -> true, 4L -> false),
      got.toString)
    intercept[IllegalArgumentException](
      Robots.filterAllowed(urls, "url", robots.withColumn("x", lit(1)), "g"))
  }

  test("filterAllowed: duplicate host rows collapse instead of multiplying URLs") {
    val urls = Seq((1L, "https://one.com/private/x"),
      (2L, "https://one.com/open")).toDF("id", "url")
    // two rows for the same host: deterministic collapse (max body —
    // here the one that disallows /private, lexicographically greater)
    val robots = Seq(
      ("one.com", "User-agent: *\nDisallow: /private\n"),
      ("one.com", "User-agent: *\nDisallow: /other\n"))
      .toDF("host", "robots_txt")
    val got = Robots.filterAllowed(urls, "url", robots, "graftbot")
    assert(got.count() == 2, "join must not fan URL rows out")
    val verdicts = got.select("id", "allowed")
      .as[(Long, Boolean)].collect().toMap
    assert(verdicts == Map(1L -> false, 2L -> true), verdicts.toString)
  }

  test("filterAllowed: reserved output columns (host, allowed) are guarded") {
    val robots = Seq(("one.com", "User-agent: *\nDisallow: /p\n"))
      .toDF("host", "robots_txt")
    val withHost = Seq(("https://one.com/x", "stale"))
      .toDF("url", "host")
    intercept[IllegalArgumentException](
      Robots.filterAllowed(withHost, "url", robots, "g"))
    val withAllowed = Seq(("https://one.com/x", true))
      .toDF("url", "allowed")
    intercept[IllegalArgumentException](
      Robots.filterAllowed(withAllowed, "url", robots, "g"))
  }

  test("crawl-delay: group replacement, largest-wins, ceil of fractional, garbage ignored") {
    val txt = "User-agent: graftbot\nCrawl-delay: 2.5\nDisallow: /x\n" +
      "User-agent: *\nCrawl-delay: 10\n"
    // agent-specific group REPLACES *: graftbot gets ceil(2.5)=3, not 10
    assert(Robots.crawlDelayKernel(txt, "graftbot") == Some(3L))
    assert(Robots.crawlDelayKernel(txt, "otherbot") == Some(10L))
    // two applicable groups with delays: the larger (conservative) wins
    val two = "User-agent: a\nCrawl-delay: 4\nUser-agent: a\nCrawl-delay: 9\n"
    assert(Robots.crawlDelayKernel(two, "a") == Some(9L))
    // undeclared / garbage / missing robots → None
    assert(Robots.crawlDelayKernel("User-agent: *\nDisallow: /\n", "a").isEmpty)
    assert(Robots.crawlDelayKernel("User-agent: *\nCrawl-delay: soon\n", "a").isEmpty)
    assert(Robots.crawlDelayKernel(null, "a").isEmpty)
    // a crawl-delay line closes the group like a rule does: a following
    // User-agent starts a NEW group
    val closing = "User-agent: a\nCrawl-delay: 5\nUser-agent: b\nDisallow: /\n"
    assert(Robots.crawlDelayKernel(closing, "b").isEmpty)
    assert(Robots.isAllowedKernel(closing, "a", "/anything"))
  }

  test("sitemap directives: group-independent, case-insensitive, file order, comments") {
    val txt = "Sitemap: https://a.com/s1.xml\n" +
      "User-agent: *\nDisallow: /x\n" +
      "SITEMAP: https://a.com/s2.xml.gz # the gz one\n" +
      "User-agent: bot\nAllow: /\n" +
      "sitemap:https://a.com/s1.xml\n" + // duplicate kept, no space ok
      "Sitemap:\n" +                     // empty value drops
      "# Sitemap: https://ghost.com/\n"  // whole-line comment
    assert(Robots.sitemapUrlsKernel(txt).toSeq == Seq(
      "https://a.com/s1.xml", "https://a.com/s2.xml.gz",
      "https://a.com/s1.xml"))
    assert(Robots.sitemapUrlsKernel(null).isEmpty)
    assert(Robots.sitemapUrlsKernel("User-agent: *\nDisallow:\n").isEmpty)
    // the directive does not disturb group parsing around it
    assert(!Robots.isAllowedKernel(txt, "anyone", "/x/y"))
    assert(Robots.isAllowedKernel(txt, "bot", "/x/y"))
  }

  test("robots matching sees percent-normalized paths (Url canonical form)") {
    // /%7Eme and /~me are the same resource; the disallow rule written
    // either way must gate both spellings
    val urls = Seq((1L, "https://h.com/%7Eme/file"),
      (2L, "https://h.com/~me/file"),
      (3L, "https://h.com/other")).toDF("id", "url")
    val robots = Seq(("h.com", "User-agent: *\nDisallow: /~me\n"))
      .toDF("host", "robots_txt")
    val got = Robots.filterAllowed(urls, "url", robots, "bot")
      .select("id", "allowed").as[(Long, Boolean)].collect().toMap
    assert(got == Map(1L -> false, 2L -> false, 3L -> true), got.toString)
  }
}
