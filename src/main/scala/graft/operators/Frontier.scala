package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Crawl-frontier scheduling — the step between link discovery
  * ([[Html.extractLinks]] / [[Sitemap.extractEntries]], gated by
  * [[Robots.filterAllowed]]) and fetching: pick WHICH URLs of each
  * host to crawl next and in WHAT order, under the two constraints
  * every polite crawler runs with (public practice — Heritrix/Nutch
  * frontier design):
  *
  *  - PER-HOST BUDGET: at most `maxPerHost` URLs per host per round,
  *    the best-scored first (score = whatever quality signal the
  *    pipeline computed — host PageRank micro-units, discovery
  *    priority, freshness), so one giant host cannot monopolize a
  *    crawl round;
  *  - POLITENESS WAVES: the output's `host_slot` (0-based rank within
  *    the host) is the wave number — fetching in `host_slot`-major
  *    order touches every host once before touching any host twice,
  *    which IS per-host rate limiting when a wave's fan-out spans the
  *    fleet.
  *
  * Scale shape: the per-host selection is the [[TopK]] discipline —
  * a BOUNDED best-k aggregator (here carrying the URL string, ordered
  * score desc / url asc for oracle-stable determinism), so Spark
  * plans a partial aggregate: each input partition reduces to ≤ k
  * rows per host BEFORE the shuffle, the exchange carries
  * O(partitions × hosts × k), never O(urls), and no per-host window
  * ever materializes a giant host in one task. One groupBy + one
  * posexplode; no join-back (the buffer carries the URL). Battery
  * q121 states every slot closed-form. */
object Frontier {

  /** One scored URL in the bounded buffer. */
  final case class ScoredUrl(url: String, score: Long)

  /** Bounded best-k: score descending, url ascending on ties — total
    * and engine-independent, so DuckDB's `row_number` oracle agrees. */
  final class UrlTopKAggregator(k: Int)
      extends Aggregator[ScoredUrl, Seq[ScoredUrl], Seq[ScoredUrl]] {
    private def better(a: ScoredUrl, b: ScoredUrl): Boolean =
      if (a.score != b.score) a.score > b.score else a.url < b.url

    /** Insert with URL dedup: a URL already buffered keeps its best
      * score and never consumes a second budget slot — re-discovered
      * links are the NORM in a crawl round, and k slots of one URL
      * would starve the host's real frontier. O(k) scan, k is small. */
    private def insert(buf: Seq[ScoredUrl], x: ScoredUrl): Seq[ScoredUrl] = {
      val i = buf.indexWhere(_.url == x.url)
      if (i >= 0) {
        if (x.score > buf(i).score) buf.updated(i, x).sortWith(better) else buf
      }
      else if (buf.length >= k && better(buf.last, x)) buf
      else (buf :+ x).sortWith(better).take(k)
    }

    override def zero: Seq[ScoredUrl] = Seq.empty
    override def reduce(b: Seq[ScoredUrl], x: ScoredUrl): Seq[ScoredUrl] =
      insert(b, x)
    override def merge(a: Seq[ScoredUrl], b: Seq[ScoredUrl]): Seq[ScoredUrl] =
      b.foldLeft(a)(insert)
    override def finish(r: Seq[ScoredUrl]): Seq[ScoredUrl] = r
    override def bufferEncoder: Encoder[Seq[ScoredUrl]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[ScoredUrl]]()
    override def outputEncoder: Encoder[Seq[ScoredUrl]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[ScoredUrl]]()
  }

  /** Column form: best-k `(url, score)` structs per group. */
  def urlTopK(k: Int): (Column, Column) => Column = {
    val agg = udaf(new UrlTopKAggregator(k), Encoders.product[ScoredUrl])
    (url: Column, score: Column) => agg(url, score)
  }

  /** Schedule a crawl round: `(host, host_slot, url, score)` — the
    * best `maxPerHost` URLs of each host (score desc, url tiebreak),
    * `host_slot` 0-based within the host. `urls` must carry canonical
    * URLs ([[Url.canonical]] — uncanonicalizable rows are dropped,
    * they are not fetchable) and an integral score column; NULL scores
    * (an upstream left join's unranked rows) coalesce to 0 rather than
    * crash the aggregator's non-nullable buffer, and duplicate URLs
    * within a host consume ONE budget slot at their best score. Fetch
    * order for politeness: `ORDER BY host_slot, score DESC`
    * (wave-major). */
  def schedule(urls: DataFrame, urlCol: String, scoreCol: String,
               maxPerHost: Int): DataFrame =
    scheduleByKey(urls, Url.host(col(urlCol)), urlCol, scoreCol, maxPerHost)

  /** [[schedule]] under an ARBITRARY politeness key: group by any
    * derivable Column — [[Url.apexDomain]] so a registrant's many
    * subdomains share one budget (the Heritrix "queue by assignment
    * domain" knob), a resolved IP block, a tenant id. Output keeps the
    * `(host, host_slot, url, score)` shape; `host` carries the KEY's
    * value. Same bounded best-k plan: partial aggregates before the
    * one O(keys×k) exchange, never a per-key window. Battery q134
    * budgets 20 sibling hosts under their shared apex closed-form. */
  def scheduleByKey(urls: DataFrame, key: Column, urlCol: String,
                    scoreCol: String, maxPerKey: Int): DataFrame = {
    require(maxPerKey >= 1, s"maxPerKey must be >= 1, got $maxPerKey")
    urls.select(key.as("host"),
        col(urlCol).as("__url"),
        coalesce(col(scoreCol).cast("long"), lit(0L)).as("__score"))
      .filter(col("host").isNotNull)
      .groupBy("host")
      .agg(urlTopK(maxPerKey)(col("__url"), col("__score")).as("top"))
      .select(col("host"), posexplode(col("top")).as(Seq("host_slot", "s")))
      .select(col("host"), col("host_slot"),
        col("s.url").as("url"), col("s.score").as("score"))
  }

  /** Per-host QUALITY aggregate — the feedback half of the crawl
    * quality loop: `docs` carries one row per processed document with
    * its host and a boolean kept/dropped verdict (refine survival, a
    * classifier gate, dedup survival…); output is one row per host —
    * `(host, n_docs, n_kept, quality_milli)` with `quality_milli` the
    * integer keep-rate `1000·kept div docs` (floor division computed
    * exactly — the numerator is reduced to a multiple of the divisor
    * before the divide, so the double op is error-free and any engine
    * replays it). One hash agg with map-side combine; |hosts| rows. */
  def hostQuality(docs: DataFrame, hostCol: String,
                  keptCol: String): DataFrame = {
    val agg = docs.groupBy(col(hostCol).as("host"))
      .agg(count(lit(1)).as("n_docs"),
        coalesce(sum(col(keptCol).cast("long")), lit(0L)).as("n_kept"))
    val x = col("n_kept") * lit(1000L)
    agg.withColumn("quality_milli",
      ((x - pmod(x, col("n_docs"))) / col("n_docs")).cast("long"))
  }

  /** Quality-blended frontier score: `rank × quality_milli` — a pure
    * long product (scores are ORDINAL, so no normalizing division is
    * needed and the arithmetic stays engine-exact). A host with no
    * rank scores 0 (undiscovered in the link graph — lowest
    * priority); a host with no quality signal yet takes
    * `defaultQualityMilli` (neutral 1000 = "not yet judged", NOT 0 —
    * a new host must not be starved by the absence of evidence).
    * Battery q149 pins the flip: a high-rank/low-quality host loses
    * its apex budget to a low-rank/high-quality one. */
  def qualityScore(rankMicro: Column, qualityMilli: Column,
                   defaultQualityMilli: Long = 1000L): Column =
    coalesce(rankMicro.cast("long"), lit(0L)) *
      coalesce(qualityMilli.cast("long"), lit(defaultQualityMilli))

  /** Revisit interval in seconds for a sitemaps.org `changefreq`
    * label (case-insensitive): always→0, hourly→3600, daily→86400,
    * weekly→604800, monthly→2592000 (30 d), yearly→31536000;
    * `never`→NULL (no finite interval); unknown/NULL labels take
    * `defaultSec` — a publisher hint is a HINT, absence must not pin
    * a page forever. Pure expression, codegen-friendly. */
  def recrawlIntervalSec(changefreq: Column, defaultSec: Long): Column = {
    val f = lower(trim(changefreq))
    when(f === "always", lit(0L))
      .when(f === "hourly", lit(3600L))
      .when(f === "daily", lit(86400L))
      .when(f === "weekly", lit(604800L))
      .when(f === "monthly", lit(2592000L))
      .when(f === "yearly", lit(31536000L))
      .when(f === "never", lit(null).cast("long"))
      .otherwise(lit(defaultSec))
  }

  /** Freshness-aware recrawl gate: mark which KNOWN URLs are due at
    * `nowEpochSec` — `due = last_fetch + interval(changefreq) ≤ now`,
    * with `never` pages never due and a NULL or UNPARSEABLE
    * `last_fetch` (never-fetched row off a left join against the
    * fetch ledger, or a malformed timestamp) due IMMEDIATELY —
    * three-valued SQL would otherwise make `due` NULL and the row
    * invisible to BOTH `due` and `!due` filters, and ANSI mode would
    * throw mid-job on a garbage string. Adds `interval_sec` and
    * `due` (never NULL); row-local and shuffle-free — compose the due
    * survivors into [[schedule]]/[[scheduleByKey]] for the next round
    * (battery q135 states every verdict closed-form per changefreq
    * regime). */
  def markDueForRecrawl(urls: DataFrame, lastFetchCol: String,
                        changefreqCol: String, nowEpochSec: Long,
                        defaultIntervalSec: Long = 7L * 24 * 3600): DataFrame = {
    val interval = recrawlIntervalSec(col(changefreqCol), defaultIntervalSec)
    // try_cast: a non-numeric last_fetch lands NULL (→ due) instead
    // of the raw cast's ANSI throw or a NULL-propagating comparison;
    // and the comparison keeps last_fetch ALONE on its side — the
    // algebraically-equal lf + interval <= now would overflow (and
    // ANSI-throw) on a corrupt near-Long.Max timestamp, while
    // now - interval is bounded driver-side arithmetic
    val lf = col(lastFetchCol).try_cast("long")
    urls.withColumn("interval_sec", interval)
      .withColumn("due",
        col("interval_sec").isNotNull &&
          (lf.isNull || lf <= lit(nowEpochSec) - col("interval_sec")))
  }

  /** Append newly DISCOVERED URLs to a persisted frontier TABLE
    * (created on first call) — the streaming-maintenance half of the
    * crawl loop (the
    * [[graft.operators.Dedup.appendToSketchTable]] discipline):
    * URLs canonicalize on the way in ([[Url.canonical]]; non-web rows
    * drop), in-batch duplicates collapse to their max score
    * (deterministic), and already-frontiered URLs anti-join away — so
    * an at-least-once `foreachBatch` channel replaying a batch
    * appends nothing, and a URL's priority is FIXED AT FIRST
    * DISCOVERY (rescoring a live frontier is a rebuild, by design:
    * the table stays append-only and replay-idempotent). Serve any
    * time with [[scheduleFromTable]]. */
  def appendToFrontierTable(spark: org.apache.spark.sql.SparkSession,
                            urls: DataFrame, urlCol: String,
                            scoreCol: String, table: String): Unit = {
    val canon = urls
      .select(Url.canonical(col(urlCol)).as("url"),
        coalesce(col(scoreCol).cast("long"), lit(0L)).as("score"))
      .filter(col("url").isNotNull)
      .groupBy("url").agg(max(col("score")).as("score"))
    if (!spark.catalog.tableExists(table)) {
      graft.sources.Warehouse.clearOrphanLocation(spark, table)
      canon.write.saveAsTable(table)
    } else {
      canon.join(spark.table(table).select(col("url")), Seq("url"), "left_anti")
        .write.mode("append").saveAsTable(table)
    }
  }

  /** Schedule the next crawl round off the frontier table, excluding
    * URLs the crawler already fetched (`fetched`: any frame whose
    * first column holds canonical URLs — the crawl ledger). Identical
    * answers to [[schedule]] over everything discovered so far minus
    * the ledger (battery q124 pins the streamed lifecycle against the
    * q121 batch oracle). */
  def scheduleFromTable(spark: org.apache.spark.sql.SparkSession,
                        table: String, fetched: Option[DataFrame],
                        maxPerHost: Int): DataFrame = {
    val base = spark.table(table)
    val pending = fetched.fold(base) { f =>
      val fCol = f.columns.head
      base.join(f.select(col(fCol).as("url")).distinct(),
        Seq("url"), "left_anti")
    }
    schedule(pending, "url", "score", maxPerHost)
  }
}
