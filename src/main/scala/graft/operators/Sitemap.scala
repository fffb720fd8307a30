package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sitemap (sitemaps.org XML, public protocol) parsing — the crawl
  * DISCOVERY feed that complements [[Robots]]' exclusion gate: hosts
  * publish `<urlset>` files of fetchable URLs (with optional
  * freshness hints) and `<sitemapindex>` files pointing at more
  * sitemaps; a crawler folds both into its frontier. This parses the
  * protocol's actual surface:
  *
  *  - `<urlset>` entries (`<url>` elements): `loc` (required — a
  *    locless entry is dropped), `lastmod`, `changefreq`, `priority`;
  *  - `<sitemapindex>` entries (`<sitemap>` elements): `loc` +
  *    `lastmod`, surfaced with `kind = "sitemap"` so the caller can
  *    route them back into sitemap fetching rather than page
  *    fetching;
  *  - values are entity-decoded (`&amp;` is ubiquitous in real locs)
  *    and whitespace-trimmed; `priority`/`changefreq` stay VERBATIM
  *    STRINGS (priority is a decimal the protocol caps at 1.0 —
  *    deciding its numeric type is the caller's exactness call);
  *  - unknown elements are skipped; malformed tails degrade (entries
  *    parsed before the corruption survive); namespaced tags
  *    (`<sm:loc>`) match by local name.
  *
  * One single-pass per-char scan per document (the [[Html]] kernel
  * discipline — no DOM, no regex), embarrassingly parallel,
  * shuffle-free. Battery q120 oracles both entry kinds closed-form. */
object Sitemap {

  /** One parsed entry. */
  private[operators] final case class Entry(kind: String, loc: String,
                                            lastmod: String,
                                            changefreq: String,
                                            priority: String)

  private def localName(name: String): String = {
    val i = name.lastIndexOf(':')
    if (i < 0) name else name.substring(i + 1)
  }

  /** The scan kernel: entries in document order. */
  private[operators] def parseKernel(xml: String): Vector[Entry] = {
    if (xml == null) return Vector.empty
    val out = Vector.newBuilder[Entry]
    val n = xml.length
    var i = 0
    var entryKind: String = null // "url" | "sitemap" when inside one
    var loc: String = null
    var lastmod: String = null
    var changefreq: String = null
    var priority: String = null
    var leaf: String = null      // current leaf tag collecting text
    val text = new java.lang.StringBuilder

    def resetEntry(): Unit = {
      loc = null; lastmod = null; changefreq = null; priority = null
    }

    while (i < n) {
      val c = xml.charAt(i)
      if (c == '<') {
        if (xml.regionMatches(i, "<!--", 0, 4)) {
          val e = xml.indexOf("-->", i + 4)
          i = if (e < 0) n else e + 3
        } else if (xml.regionMatches(i, "<![CDATA[", 0, 9)) {
          val e = xml.indexOf("]]>", i + 9)
          val end = if (e < 0) n else e
          if (leaf != null) text.append(xml, i + 9, end)
          i = if (e < 0) n else e + 3
        } else {
          val closing = i + 1 < n && xml.charAt(i + 1) == '/'
          var j = i + (if (closing) 2 else 1)
          val ns = j
          while (j < n && {
            val ch = xml.charAt(j)
            ch != '>' && ch != ' ' && ch != '\t' && ch != '\n' && ch != '\r' &&
              ch != '/'
          }) j += 1
          val name = localName(
            xml.substring(ns, j).toLowerCase(java.util.Locale.ROOT))
          // skip to tag end, honoring nothing fancy (sitemap XML
          // attributes carry no quoted '>' in practice; a missing '>'
          // is corruption and ends the scan)
          val g = xml.indexOf('>', j)
          if (g < 0) { i = n }
          else {
            val selfClosing = g > i && xml.charAt(g - 1) == '/'
            i = g + 1
            name match {
              case "url" | "sitemap" =>
                if (closing) {
                  // only a close tag MATCHING the open entry kind ends
                  // it — a stray </sitemap> inside a <url> (or vice
                  // versa) is corruption noise, not a boundary, and
                  // must neither emit nor mislabel the open entry
                  if (name == entryKind) {
                    if (loc != null)
                      out += Entry(entryKind, loc, lastmod, changefreq, priority)
                    entryKind = null; resetEntry(); leaf = null
                  }
                } else if (!selfClosing) {
                  entryKind = name; resetEntry(); leaf = null
                }
              case "loc" | "lastmod" | "changefreq" | "priority" =>
                if (closing) {
                  if (entryKind != null && leaf == name) {
                    val v = Html.decodeEntities(text.toString).trim
                    val vv = if (v.isEmpty) null else v
                    name match {
                      case "loc" => if (loc == null) loc = vv
                      case "lastmod" => if (lastmod == null) lastmod = vv
                      case "changefreq" => if (changefreq == null) changefreq = vv
                      case _ => if (priority == null) priority = vv
                    }
                  }
                  leaf = null
                } else if (!selfClosing && entryKind != null) {
                  leaf = name; text.setLength(0)
                }
              // unknown elements (protocol extensions like
              // <image:image>, <news:news>) are transparent: an open
              // leaf keeps collecting across them — a <loc> value must
              // not be discarded because a vendor tag nested inside it
              case _ => ()
            }
          }
        }
      } else {
        if (leaf != null) text.append(c)
        i += 1
      }
    }
    out.result()
  }

  /** Corpus form: `(doc_id, entry_pos, kind, loc, lastmod, changefreq,
    * priority)` — one row per entry in document order; NULL xml yields
    * no rows. Compose `kind = 'sitemap'` rows back into sitemap
    * fetching and `kind = 'url'` rows into [[Robots.filterAllowed]] →
    * [[Frontier.schedule]]. */
  def extractEntries(docs: DataFrame, idCol: String,
                     xmlCol: String): DataFrame = {
    val k = udf { (xml: String) =>
      parseKernel(xml).map(e =>
        (e.kind, e.loc, e.lastmod, e.changefreq, e.priority)).toArray
    }
    docs.select(col(idCol).as("doc_id"), k(col(xmlCol)).as("r"))
      .select(col("doc_id"), posexplode(col("r")).as(Seq("entry_pos", "e")))
      .select(col("doc_id"), col("entry_pos"),
        col("e._1").as("kind"), col("e._2").as("loc"),
        col("e._3").as("lastmod"), col("e._4").as("changefreq"),
        col("e._5").as("priority"))
  }
}
