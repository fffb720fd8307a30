package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Frontier]] — politeness-bounded crawl scheduling. Slot
  * assignment, budget, tiebreaks, and the bounded partial-aggregate
  * plan shape are pinned. */
class FrontierSpec extends SparkSpec {
  import spark.implicits._

  test("schedule: per-host budget, score-desc slots, url tiebreak, bad URLs drop") {
    val urls = Seq(
      ("https://big.com/a", 10L), ("https://big.com/b", 30L),
      ("https://big.com/c", 20L), ("https://big.com/d", 5L),
      ("https://small.com/x", 7L), ("https://small.com/y", 7L),
      ("mailto:not@fetchable", 99L)).toDF("url", "score")
    val got = Frontier.schedule(urls, "url", "score", maxPerHost = 3)
      .select("host", "host_slot", "url", "score")
      .as[(String, Int, String, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(got == Seq(
      ("big.com", 0, "https://big.com/b", 30L),
      ("big.com", 1, "https://big.com/c", 20L),
      ("big.com", 2, "https://big.com/a", 10L),
      // equal scores: url ascending breaks the tie deterministically
      ("small.com", 0, "https://small.com/x", 7L),
      ("small.com", 1, "https://small.com/y", 7L)), got.toString)
  }

  test("the selection aggregates partially before the shuffle (bounded, no window)") {
    val urls = (0 until 200).map(i =>
      (s"https://h${i % 4}.com/p$i", i.toLong)).toDF("url", "score")
    val df = Frontier.schedule(urls, "url", "score", maxPerHost = 5)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Window"), "per-host ranking fell back to a window")
    assert(p.toLowerCase.contains("partial_urltopkaggregator"),
      "selection lost its map-side combine:\n" + p.take(1200))
    assert(df.count() == 20)
  }

  test("frontier table lifecycle: idempotent appends, first-discovery priority, ledger exclusion") {
    val tbl = "graft_frontierspec_tbl"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    try {
      val b1 = Seq(("https://A.com:443/x", 5L), ("https://a.com/y", 9L),
        ("mailto:no", 99L)).toDF("url", "score")
      Frontier.appendToFrontierTable(spark, b1, "url", "score", tbl)
      // replay b1 plus a re-discovery of /x at a different score and
      // one genuinely new URL
      val b2 = Seq(("https://a.com/x", 50L), ("https://a.com/y", 9L),
        ("https://b.com/z", 1L)).toDF("url", "score")
      Frontier.appendToFrontierTable(spark, b2, "url", "score", tbl)
      val rows = spark.table(tbl).as[(String, Long)].collect().toMap
      // canonicalized on the way in; no duplicates; priority fixed at
      // first discovery (the re-discovered /x keeps 5, not 50)
      assert(rows == Map("https://a.com/x" -> 5L, "https://a.com/y" -> 9L,
        "https://b.com/z" -> 1L), rows.toString)
      // serve == batch schedule over the table; ledger carves out
      // fetched URLs BEFORE ranking
      val served = Frontier.scheduleFromTable(spark, tbl, None, 2)
        .select("host", "host_slot", "url").as[(String, Int, String)]
        .collect().toSet
      assert(served == Set(("a.com", 0, "https://a.com/y"),
        ("a.com", 1, "https://a.com/x"), ("b.com", 0, "https://b.com/z")))
      val fetched = Seq("https://a.com/y").toDF("url")
      val afterLedger = Frontier.scheduleFromTable(spark, tbl, Some(fetched), 2)
        .select("host", "host_slot", "url").as[(String, Int, String)]
        .collect().toSet
      assert(afterLedger == Set(("a.com", 0, "https://a.com/x"),
        ("b.com", 0, "https://b.com/z")), afterLedger.toString)
    } finally spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }

  test("maxPerHost must be positive") {
    val urls = Seq(("https://a.com/x", 1L)).toDF("url", "score")
    intercept[IllegalArgumentException](
      Frontier.schedule(urls, "url", "score", 0))
  }

  test("scheduleByKey budgets an arbitrary politeness key (shared apex)") {
    val urls = Seq(
      ("https://a.sub1.example.com/x", 9L),
      ("https://b.sub2.example.com/y", 7L),
      ("https://c.sub3.example.com/z", 5L),
      ("https://other.org/w", 1L)).toDF("url", "score")
    // apex budget of 2: the three example.com siblings compete, the
    // weakest drops; other.org keeps its own budget
    val got = Frontier.scheduleByKey(urls,
        Url.apexDomain(col("url")), "url", "score", 2)
      .select("host", "host_slot", "url")
      .as[(String, Int, String)].collect().toSet
    assert(got == Set(
      ("example.com", 0, "https://a.sub1.example.com/x"),
      ("example.com", 1, "https://b.sub2.example.com/y"),
      ("other.org", 0, "https://other.org/w")), got.toString)
    // the per-HOST form would have scheduled all four
    assert(Frontier.schedule(urls, "url", "score", 2).count() == 4)
  }

  test("markDueForRecrawl: interval vocabulary, boundary equality, never, default") {
    val now = 1000000L
    val rows = Seq(
      // (url, last_fetch, changefreq): age exactly AT the interval is due
      ("u_always", now, "always"),
      ("u_hourly_due", now - 3600L, "HOURLY"),        // case-insensitive
      ("u_hourly_not", now - 3599L, "hourly"),
      ("u_daily_not", now - 86399L, "daily"),
      ("u_never", now - 100000000L, "never"),
      ("u_garbage_due", now - 604800L, "biweeklyish"), // default week
      ("u_garbage_not", now - 604799L, "biweeklyish"),
      ("u_null_cf_due", now - 604800L, null.asInstanceOf[String]))
      .toDF("url", "last_fetch", "changefreq")
    val got = Frontier.markDueForRecrawl(rows, "last_fetch", "changefreq", now)
      .select("url", "due").as[(String, Boolean)].collect().toMap
    assert(got == Map(
      "u_always" -> true, "u_hourly_due" -> true, "u_hourly_not" -> false,
      "u_daily_not" -> false, "u_never" -> false,
      "u_garbage_due" -> true, "u_garbage_not" -> false,
      "u_null_cf_due" -> true), got.toString)
  }

  test("markDueForRecrawl: a NULL last_fetch is due now, not three-valued invisible") {
    // the left-join-against-the-ledger shape: never-fetched rows NULL
    val now = 1000000L
    val rows = Seq(
      ("u_never_fetched", None, "daily"),
      ("u_never_fetched_never", None, "never"), // `never` still wins
      ("u_fetched_not_due", Some(now - 10L), "daily"))
      .toDF("url", "last_fetch", "changefreq")
    val got = Frontier.markDueForRecrawl(rows, "last_fetch", "changefreq", now)
      .select("url", "due").as[(String, Boolean)].collect().toMap
    assert(got == Map(
      "u_never_fetched" -> true,
      "u_never_fetched_never" -> false,
      "u_fetched_not_due" -> false), got.toString)
    // and no row ever carries a NULL due
    val dueCol = Frontier.markDueForRecrawl(rows, "last_fetch", "changefreq", now)
    assert(dueCol.filter(dueCol("due").isNull).count() == 0L)
    // an UNPARSEABLE last_fetch string is due too (try_cast, not the
    // ANSI-throwing cast, and not a NULL-propagating comparison); a
    // numeric-but-absurd future timestamp must not OVERFLOW the
    // comparison (last_fetch stays alone on its side) — not due
    val garbage = Seq(
      ("u_garbage_lf", "not-a-timestamp", "daily"),
      ("u_longmax_lf", Long.MaxValue.toString, "daily"))
      .toDF("url", "last_fetch", "changefreq")
    val g = Frontier.markDueForRecrawl(garbage, "last_fetch", "changefreq", now)
      .select("url", "due").as[(String, Boolean)].collect().toMap
    assert(g == Map("u_garbage_lf" -> true, "u_longmax_lf" -> false), g.toString)
  }

  test("NULL scores schedule at 0 instead of crashing the aggregator") {
    // the shape an upstream left join produces: unranked hosts NULL
    val urls = Seq(("https://a.com/ranked", Some(5L)),
      ("https://a.com/unranked", None),
      ("https://b.com/only", None)).toDF("url", "score")
    val got = Frontier.schedule(urls, "url", "score", 2)
      .select("host", "host_slot", "url", "score")
      .as[(String, Int, String, Long)].collect().toSet
    assert(got == Set(("a.com", 0, "https://a.com/ranked", 5L),
      ("a.com", 1, "https://a.com/unranked", 0L),
      ("b.com", 0, "https://b.com/only", 0L)), got.toString)
  }

  test("duplicate URLs consume one budget slot at their best score") {
    // /dup arrives three times (re-discovery is the norm); it must
    // hold ONE slot at score 9, leaving the second slot for /other —
    // which a slot-per-row bug would starve out
    val urls = Seq(("https://a.com/dup", 9L), ("https://a.com/dup", 3L),
      ("https://a.com/dup", 9L), ("https://a.com/other", 1L),
      ("https://a.com/third", 0L)).toDF("url", "score").repartition(3)
    val got = Frontier.schedule(urls, "url", "score", 2)
      .select("host_slot", "url", "score")
      .as[(Int, String, Long)].collect().toSet
    assert(got == Set((0, "https://a.com/dup", 9L),
      (1, "https://a.com/other", 1L)), got.toString)
  }

  test("hostQuality: exact integer keep-rates; qualityScore blends and defaults") {
    import spark.implicits._
    val docs = Seq(
      ("a.com", true), ("a.com", true), ("a.com", false),  // 2/3 → 666
      ("b.com", false), ("b.com", false),                  // 0/2 → 0
      ("c.com", true))                                     // 1/1 → 1000
      .toDF("host", "kept")
    val q = Frontier.hostQuality(docs, "host", "kept")
      .select("host", "n_docs", "n_kept", "quality_milli")
      .as[(String, Long, Long, Long)].collect().sortBy(_._1)
    assert(q.toSeq == Seq(("a.com", 3L, 2L, 666L), ("b.com", 2L, 0L, 0L),
      ("c.com", 1L, 1L, 1000L)), q.mkString(","))
    // blend: pure product; NULL rank → 0 (undiscovered host is lowest
    // priority), NULL quality → neutral default (absence of evidence
    // must not starve a new host)
    val blended = Seq(
      (Some(100L), Some(500L)), (None, Some(900L)), (Some(100L), None))
      .toDF("rank", "qm")
      .select(Frontier.qualityScore(col("rank"), col("qm")).as("s"))
      .as[Long].collect().toSeq
    assert(blended == Seq(50000L, 0L, 100000L), blended.toString)
    // the q149 flip in miniature: high-rank/low-quality loses the
    // shared budget to low-rank/high-quality
    val urls = Seq(
      ("https://hi.example.com/1", 1000L, 50L),   // rank 1000, q 50
      ("https://lo.example.com/1", 200L, 900L))   // rank 200,  q 900
      .toDF("url", "rank", "qm")
      .select(col("url"),
        Frontier.qualityScore(col("rank"), col("qm")).as("score"))
    val winner = Frontier.scheduleByKey(urls,
        Url.apexDomain(col("url")), "url", "score", maxPerKey = 1)
      .select("url").as[String].head()
    assert(winner == "https://lo.example.com/1")
  }
}
