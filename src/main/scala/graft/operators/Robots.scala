package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Robots Exclusion Protocol (RFC 9309) evaluation — the fetch gate
  * between [[Html.extractLinks]]/[[Url]] and a compliant crawler's
  * frontier: every CommonCrawl-style corpus is robots-filtered at
  * collection time, and a re-crawl/refresh pipeline re-evaluates the
  * rules. Implemented to the RFC's matching semantics:
  *
  *  - GROUP SELECTION: the groups whose `User-agent` token equals the
  *    crawler's product token (case-insensitive) apply; only if NONE
  *    match does the crawler fall back to the `*` groups. Multiple
  *    groups with the same matched token merge (RFC 9309 § 2.2.1).
  *  - RULE MATCHING: `Allow`/`Disallow` values match as path prefixes
  *    with `*` (any substring) and a trailing `$` (end anchor); the
  *    MOST SPECIFIC match wins = longest pattern in octets, and on a
  *    length tie `Allow` wins (§ 2.2.2). No matching rule → allowed;
  *    an empty `Disallow:` value matches nothing (the classic
  *    "allow all" idiom); no robots.txt at all → allowed.
  *  - lines parse field-insensitively, `#` comments strip, unknown
  *    fields (Sitemap, Crawl-delay, …) are ignored; a `User-agent`
  *    line after rules starts a new group.
  *
  * Everything is a pure JVM kernel over the robots TEXT — no fetching
  * (the pipeline stores each host's robots.txt alongside its pages,
  * the CommonCrawl layout) — so battery q117 states every verdict
  * closed-form. Scale shape: [[filterAllowed]] is one host-keyed join
  * of the URL frame against the (host, robots_txt) table — robots
  * bodies are small and per-host, so the join's robots side is
  * |hosts|-sized — plus a scalar verdict kernel; nothing quadratic,
  * nothing driver-side. A host legally has ONE robots.txt: duplicate
  * host rows in the robots frame would multiply URL rows through the
  * join, so [[filterAllowed]] deterministically collapses them
  * (lexicographic max body) instead of trusting the input. */
object Robots {

  private[operators] final case class Group(agents: Seq[String],
                                            rules: Seq[(Boolean, String)],
                                            delay: Option[Long] = None)

  /** Parse robots.txt into user-agent groups. `Crawl-delay` (de facto
    * standard, not in RFC 9309 but honored by most crawlers) parses
    * as whole seconds — fractional values round UP (a polite crawler
    * never rounds a delay down), non-numeric values are ignored. */
  private[operators] def parse(txt: String): Seq[Group] = {
    if (txt == null) return Seq.empty
    val groups = Seq.newBuilder[Group]
    var agents = List.empty[String]
    var rules = List.empty[(Boolean, String)]
    var delay: Option[Long] = None
    var inRules = false
    def flush(): Unit = {
      if (agents.nonEmpty) groups += Group(agents.reverse, rules.reverse, delay)
      agents = Nil; rules = Nil; delay = None; inRules = false
    }
    txt.split("\n", -1).foreach { raw =>
      val noComment = {
        val h = raw.indexOf('#')
        if (h < 0) raw else raw.substring(0, h)
      }
      val line = noComment.trim
      val ci = line.indexOf(':')
      if (ci > 0) {
        val field = line.substring(0, ci).trim.toLowerCase(java.util.Locale.ROOT)
        val value = line.substring(ci + 1).trim
        field match {
          case "user-agent" =>
            if (inRules) flush()
            agents ::= value.toLowerCase(java.util.Locale.ROOT)
          case "allow" | "disallow" if agents.nonEmpty =>
            inRules = true
            // an empty pattern matches nothing (the allow-all idiom)
            if (value.nonEmpty) rules ::= (field == "allow", value)
          case "crawl-delay" if agents.nonEmpty =>
            inRules = true
            try {
              val d = math.ceil(value.toDouble).toLong
              if (d >= 0 && delay.forall(d > _)) delay = Some(d)
            } catch { case _: NumberFormatException => () }
          case _ => ()
        }
      }
    }
    flush()
    groups.result()
  }

  /** The crawl-delay verdict for `agent`: group selection follows the
    * same replacement rule as [[isAllowedKernel]] (agent-specific
    * groups REPLACE the `*` groups); when several applicable groups
    * declare a delay the LARGEST wins (conservative). None when no
    * applicable group declares one (crawler default applies). */
  private[operators] def crawlDelayKernel(txt: String,
                                          agent: String): Option[Long] = {
    if (txt == null) return None
    val groups = parse(txt)
    val a = agent.toLowerCase(java.util.Locale.ROOT)
    val specific = groups.filter(_.agents.contains(a))
    val applicable = if (specific.nonEmpty) specific
                     else groups.filter(_.agents.contains("*"))
    val ds = applicable.flatMap(_.delay)
    if (ds.isEmpty) None else Some(ds.max)
  }

  /** Column form: crawl-delay seconds for a fixed agent (NULL when
    * undeclared). Composes with [[Frontier.schedule]]: a host's
    * earliest polite fetch time for its slot-`s` URL is
    * `s * crawl_delay`. */
  def crawlDelay(robotsTxt: Column, agent: String): Column =
    udf((t: String) => crawlDelayKernel(t, agent)).apply(robotsTxt)

  /** `Sitemap:` directives in file order — the DISCOVERY pointer
    * robots.txt carries (sitemaps.org / RFC 9309 § 2.3: the line is
    * independent of any user-agent group and may appear anywhere in
    * the file; the value is a full URL, case-preserved). Field name
    * matches case-insensitively, comments strip, empty values drop,
    * duplicates kept (file order is the publisher's signal). Feed the
    * result into sitemap fetching → [[Sitemap.extractEntries]] →
    * [[Frontier.schedule]] — the crawl discovery loop (battery
    * q127). */
  private[operators] def sitemapUrlsKernel(txt: String): Array[String] = {
    if (txt == null) return Array.empty
    txt.split("\n", -1).flatMap { raw =>
      val noComment = {
        val h = raw.indexOf('#')
        if (h < 0) raw else raw.substring(0, h)
      }
      val line = noComment.trim
      val ci = line.indexOf(':')
      if (ci > 0 &&
          line.substring(0, ci).trim
            .equalsIgnoreCase("sitemap")) {
        val v = line.substring(ci + 1).trim
        if (v.nonEmpty) Some(v) else None
      } else None
    }
  }

  /** Column form: array of `Sitemap:` URLs in file order (empty for
    * none/NULL). */
  def sitemapUrls(robotsTxt: Column): Column =
    udf((t: String) => sitemapUrlsKernel(t)).apply(robotsTxt)

  /** RFC 9309 pattern match: prefix semantics with `*` wildcards and
    * an optional trailing `$` end anchor. */
  private[operators] def patternMatches(pattern: String, path: String): Boolean = {
    val anchored = pattern.endsWith("$")
    val p = if (anchored) pattern.dropRight(1) else pattern
    val parts = p.split("\\*", -1)
    def inOrder(ps: Array[String], s: String): Boolean = {
      var pos = 0
      var i = 0
      var ok = true
      while (ok && i < ps.length) {
        val part = ps(i)
        if (i == 0) {
          if (!s.startsWith(part)) ok = false else pos = part.length
        } else {
          val f = s.indexOf(part, pos)
          if (f < 0) ok = false else pos = f + part.length
        }
        i += 1
      }
      ok
    }
    if (!anchored) inOrder(parts, path)
    else {
      val last = parts.last
      if (!path.endsWith(last)) false
      else if (parts.length == 1) path == last
      else inOrder(parts.init,
        path.substring(0, path.length - last.length))
    }
  }

  /** The verdict kernel: is `path` fetchable for `agent` under this
    * robots.txt? */
  private[operators] def isAllowedKernel(txt: String, agent: String,
                                         path: String): Boolean = {
    if (txt == null || path == null) return true
    val groups = parse(txt)
    val a = agent.toLowerCase(java.util.Locale.ROOT)
    val specific = groups.filter(_.agents.contains(a))
    val applicable = if (specific.nonEmpty) specific
                     else groups.filter(_.agents.contains("*"))
    val rules = applicable.flatMap(_.rules)
    val p = if (path.isEmpty) "/" else path
    var bestLen = -1
    var bestAllow = true
    rules.foreach { case (allow, pattern) =>
      if (patternMatches(pattern, p)) {
        val len = pattern.length
        if (len > bestLen || (len == bestLen && allow && !bestAllow)) {
          bestLen = len; bestAllow = allow
        }
      }
    }
    if (bestLen < 0) true else bestAllow
  }

  /** Column form: `allowed(robots_txt, path)` for a fixed agent. */
  def allowed(robotsTxt: Column, path: Column, agent: String): Column =
    udf((t: String, p: String) => isAllowedKernel(t, agent, p))
      .apply(robotsTxt, path)

  /** Gate a URL frame against per-host robots rules: `urls` must
    * carry a canonical URL column; `robots` is a 2-column
    * `(host, robots_txt)` frame (|hosts|-sized — one row per host, the
    * stored-robots layout; duplicate host rows collapse
    * deterministically to the lexicographically greatest body rather
    * than fanning URL rows out through the join). Output: the input
    * columns plus `host` and `allowed` — both names are RESERVED and
    * must not already exist on `urls` (guarded, since `withColumn`
    * would silently overwrite them); hosts with no robots row allow
    * everything. The join is host-keyed and left — URLs that don't
    * canonicalize gate to allowed = false (an unfetchable URL is not
    * fetchable). */
  def filterAllowed(urls: DataFrame, urlCol: String, robots: DataFrame,
                    agent: String): DataFrame = {
    val rCols = robots.columns
    require(rCols.length == 2,
      s"robots must be (host, robots_txt), got ${rCols.mkString(",")}")
    Seq("host", "allowed").foreach { reserved =>
      require(!urls.columns.contains(reserved),
        s"urls already has a '$reserved' column — filterAllowed outputs " +
          "reserved columns (host, allowed); rename the input column")
    }
    val r = robots.select(col(rCols(0)).as("host"),
      col(rCols(1)).as("__robots"))
      .groupBy("host").agg(max(col("__robots")).as("__robots"))
    val pathOf = udf { (u: String) =>
      val c = Url.canonicalKernel(u)
      if (c == null) null
      else {
        val i = c.indexOf('/', c.indexOf("//") + 2)
        if (i < 0) "/" else c.substring(i)
      }
    }
    urls.withColumn("host", Url.host(col(urlCol)))
      .withColumn("__path", pathOf(col(urlCol)))
      .join(r, Seq("host"), "left")
      .withColumn("allowed",
        col("__path").isNotNull &&
          allowed(col("__robots"), col("__path"), agent))
      .drop("__robots", "__path")
  }
}
