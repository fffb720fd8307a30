package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CorpusSpec extends SparkSpec {
  import spark.implicits._

  private val goodEn = "the quick brown fox jumps over the lazy dog and " +
    "walks on with a calm and steady pace for quite a while longer today"

  test("refine: each gate drops exactly what it should; survivors keep min id") {
    val docs = Seq(
      (1L, goodEn),                               // survives everything
      (2L, goodEn),                               // exact copy of 1 -> dropped
      (3L, "le chat est sur la table et il dort dans la maison pour la nuit"), // fr
      (4L, "spam spam spam spam spam spam spam spam spam spam"), // repetition
      (5L, "!!! ??? !!! ??? !!!")                 // quality floor (pure punct)
    ).toDF("doc_id", "text")
    val got = Corpus.refine(docs, "doc_id", "text",
      langs = Set("en"), minQuality = Some(0.3),
      maxDupTokenFraction = Some(0.5))
      .select("doc_id").as[Long].collect().sorted
    assert(got.toSeq == Seq(1L))
  }

  test("refine: disabled gates are skipped; near-dup flag engages MinHash") {
    val docs = Seq(
      (1L, goodEn),
      (2L, goodEn + " extra"),  // near-dup of 1, NOT exact
      (3L, "le chat est sur la table et il dort dans la maison pour la nuit")
    ).toDF("doc_id", "text")
    // every gate off: exact dedup only — all three texts are distinct
    val loose = Corpus.refine(docs, "doc_id", "text", langs = Set.empty,
      minQuality = None, maxDupTokenFraction = None)
      .select("doc_id").as[Long].collect().sorted
    assert(loose.toSeq == Seq(1L, 2L, 3L))
    // near-dup pass drops the higher-id member of the near-identical pair
    val strict = Corpus.refine(docs, "doc_id", "text", langs = Set.empty,
      minQuality = None, maxDupTokenFraction = None, dropNearDups = true)
      .select("doc_id").as[Long].collect().sorted
    assert(strict.toSeq == Seq(1L, 3L))
  }

  test("refineStream: same gates as batch, dedup within the watermark, streaming plan") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val mem = MemoryStream[(java.sql.Timestamp, String)]
    val refined = Corpus.refineStream(mem.toDF().toDF("ts", "text"),
      "text", "ts", langs = Set("en"), minQuality = Some(0.3),
      maxDupTokenFraction = Some(0.5))
    assert(refined.isStreaming)
    val q = refined.writeStream.format("memory").queryName("stream_refine")
      .outputMode("append").start()
    try {
      def t(min: Int) = new java.sql.Timestamp(1700000000000L + min * 60000L)
      mem.addData(
        (t(0), goodEn),                                    // survives
        (t(1), goodEn),                                    // dup within watermark
        (t(2), "le chat est sur la table et il dort dans la maison pour la nuit"),
        (t(3), "spam spam spam spam spam spam spam spam spam spam"),
        (t(4), null.asInstanceOf[String]))
      q.processAllAvailable()
      val texts = spark.sql("SELECT text FROM stream_refine")
        .collect().map(_.getString(0))
      assert(texts.toSeq == Seq(goodEn), s"got ${texts.length} rows")
      // batch refine over the same rows (sans dedup-horizon nuances)
      // agrees on the survivor set
      val batch = Corpus.refine(
        Seq((1L, goodEn), (2L, goodEn),
          (3L, "le chat est sur la table et il dort dans la maison pour la nuit"),
          (4L, "spam spam spam spam spam spam spam spam spam spam"),
          (5L, null.asInstanceOf[String])).toDF("doc_id", "text"),
        "doc_id", "text")
        .select("text").collect().map(_.getString(0))
      assert(batch.toSeq == texts.toSeq)
    } finally q.stop()
  }

  test("refine preserves all caller columns on survivors") {
    val docs = Seq((1L, "web", goodEn), (2L, "web", goodEn))
      .toDF("doc_id", "source", "text")
    val out = Corpus.refine(docs, "doc_id", "text").collect()
    assert(out.map(_.length).toSeq == Seq(3))
    assert(out.head.getString(1) == "web")
  }

  test("applyTakedowns: each rule kind kills exactly its own matches, in canonical space") {
    val docs = Seq(
      (1L, "https://www.keep.example.com/a"),          // survives
      (2L, "https://EXACT.example.com/x?utm_source=t"),// url rule (canonical)
      (3L, "https://bad-host.example.com/y"),          // host rule
      (4L, "https://sub.tree.example.org/z"),          // domain rule (subdomain)
      (5L, "https://tree.example.org/w"),              // domain rule (apex itself)
      (6L, "https://trees.example.org/v"),             // label boundary: SURVIVES
      (7L, "https://www.keep.example.com/sec/ret/p"),  // prefix rule
      (8L, "not a url at all")                         // garbage: survives
    ).toDF("doc_id", "url")
    val rules = Seq(
      ("url", "https://exact.example.com/x"),   // no utm; must still hit doc 2
      ("host", "bad-host.example.com"),
      ("domain", "tree.example.org"),
      ("prefix", "https://www.keep.example.com/sec/")
    ).toDF("kind", "value")
    val kept = Corpus.applyTakedowns(docs, "url", rules)
      .select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(1L, 6L, 8L))
    // the takedown must not invent columns
    assert(Corpus.applyTakedowns(docs, "url", rules).columns.toSeq ==
      Seq("doc_id", "url"))
  }

  test("applyTakedowns: host/domain rules written with trailing slashes or paths still match") {
    // real opt-out/DMCA lists write names as "example.com/" or
    // "example.com/some/path" — the name part must still key the rule
    val docs = Seq(
      (1L, "https://www.tree.example.org/a"),
      (2L, "https://sub.tree.example.org/b"),
      (3L, "https://bad-host.example.com/c"),
      (4L, "https://keep.example.net/d")
    ).toDF("doc_id", "url")
    val rules = Seq(
      ("domain", "tree.example.org/"),          // trailing slash
      ("host", "bad-host.example.com/robots.txt") // stray path
    ).toDF("kind", "value")
    val kept = Corpus.applyTakedowns(docs, "url", rules)
      .select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(4L), kept.mkString(","))
    // and the audit receipts count the same matches, not zeros
    val audit = Corpus.takedownAudit(docs, "url", rules)
      .collect().map(r => (r.getString(1), r.getLong(2))).toMap
    assert(audit == Map("tree.example.org/" -> 2L,
      "bad-host.example.com/robots.txt" -> 1L), audit.toString)
  }

  test("applyTakedowns: domain rule catches apex captures on a non-default port") {
    // the apex-on-a-port SURT key is `org,example,tree:8080)/...` —
    // matched by neither `key,` (subdomain) nor `key)` (default-port
    // apex); the `:` disjunct must catch it while `trees` (label
    // boundary) still survives
    val docs = Seq(
      (1L, "https://tree.example.org:8080/a"),     // apex, non-default port
      (2L, "https://sub.tree.example.org:8443/b"), // subdomain + port
      (3L, "https://trees.example.org:8080/c"),    // label boundary: SURVIVES
      (4L, "https://keep.example.net/d")           // unrelated: survives
    ).toDF("doc_id", "url")
    val rules = Seq(("domain", "tree.example.org")).toDF("kind", "value")
    val kept = Corpus.applyTakedowns(docs, "url", rules)
      .select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(3L, 4L), kept.mkString(","))
    // the audit receipts agree with the purge (the gap used to be
    // invisible BECAUSE both sides shared the incomplete predicate)
    val audit = Corpus.takedownAudit(docs, "url", rules)
      .collect().map(r => (r.getString(1), r.getLong(2))).toMap
    assert(audit == Map("tree.example.org" -> 2L), audit.toString)
  }

  test("takedownAudit: one receipt row per rule, zero-matched rules included") {
    val docs = Seq(
      (1L, "https://a.example.com/x"),
      (2L, "https://b.example.com/y"),
      (3L, "https://sub.a.example.com/z")
    ).toDF("doc_id", "url")
    val rules = Seq(
      ("domain", "a.example.com"),   // docs 1 and 3
      ("host", "b.example.com"),     // doc 2
      ("url", "https://nowhere.example.com/q") // zero matches
    ).toDF("kind", "value")
    val audit = Corpus.takedownAudit(docs, "url", rules)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(audit == Set(
      ("domain", "a.example.com", 2L),
      ("host", "b.example.com", 1L),
      ("url", "https://nowhere.example.com/q", 0L)))
  }

  test("appendToTakedownTable: (kind,value)-idempotent filing, verbatim values, null rules drop") {
    val tbl = "graft_test_takedown_rules"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    graft.sources.Warehouse.clearOrphanLocation(spark, tbl)
    val batch1 = Seq(("HOST", "a.example.com"), ("domain", "b.example.org/"),
      ("host", "a.example.com"), // in-batch case-duplicate of row 1
      (null.asInstanceOf[String], "x"), ("url", null.asInstanceOf[String]))
      .toDF("kind", "value")
    assert(Corpus.appendToTakedownTable(spark, batch1, tbl) == 2L,
      "case-folded dup collapses, null kind/value rows drop")
    assert(Corpus.appendToTakedownTable(spark, batch1, tbl) == 0L,
      "replay files nothing")
    val batch2 = Seq(("host", "a.example.com"), ("prefix", "https://c.example.com/p"))
      .toDF("kind", "value")
    assert(Corpus.appendToTakedownTable(spark, batch2, tbl) == 1L,
      "only the unseen rule files")
    // values file VERBATIM (trailing slash intact — keying is match-time)
    val got = spark.table(tbl).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(("host", "a.example.com"), ("domain", "b.example.org/"),
      ("prefix", "https://c.example.com/p")), got.toString)
    // and the accumulated table purges exactly like a one-shot frame
    val docs = Seq((1L, "https://a.example.com/x"),
      (2L, "https://sub.b.example.org/y"), (3L, "https://keep.example.net/z"))
      .toDF("doc_id", "url")
    val kept = Corpus.applyTakedowns(docs, "url", spark.table(tbl))
      .select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(3L))
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }

  test("cascadeTakedown: derived rows follow the corpus purge as a whitelist") {
    val survivors = Seq(1L, 3L).toDF("doc_id")
    val derived = Seq((1L, 10), (2L, 20), (3L, 30), (99L, 40))
      .toDF("doc_id", "payload")
    val kept = Corpus.cascadeTakedown(derived, "doc_id", survivors, "doc_id")
      .select("doc_id").as[Long].collect().sorted
    // 2 purged WITH the corpus; 99 (never in the corpus) purged too —
    // whitelist semantics, not anti-against-purged
    assert(kept.toSeq == Seq(1L, 3L))
  }

  test("applyTakedowns plan: corpus never shuffles — every rule join is broadcast") {
    val docs = Seq((1L, "https://a.example.com/x")).toDF("doc_id", "url")
    val rules = Seq(("url", "https://a.example.com/x"),
      ("host", "h.example.com"), ("domain", "d.example.org"),
      ("prefix", "https://p.example.com/")).toDF("kind", "value")
    val plan = Corpus.applyTakedowns(docs, "url", rules)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin"), plan)
    assert(!plan.contains("Exchange hashpartitioning"), plan)
  }

  test("snapshotDiff: presence decides added/removed, digests decide changed, NULLs compare null-safely") {
    import org.apache.spark.sql.functions.col
    val a = Seq((1L, "same"), (2L, "old"), (3L, "gone"),
        (5L, null.asInstanceOf[String]), (6L, null.asInstanceOf[String]),
        (7L, "was text")).toDF("doc_id", "text")
    val b = Seq((1L, "same"), (2L, "new"), (4L, "fresh"),
        (5L, null.asInstanceOf[String]), (6L, "now text"),
        (7L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val got = Corpus.snapshotDiff(a, b, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "unchanged", 2L -> "changed", 3L -> "removed",
      4L -> "added", 5L -> "unchanged", 6L -> "changed", 7L -> "changed"),
      s"statuses wrong: $got")
    // char totals: NULL text counts 0, present text counts its length
    val chars = Corpus.snapshotDiff(a, b, "doc_id", "text")
      .filter(col("doc_id") === 6L).head()
    assert(chars.getInt(2) == 0 && chars.getInt(3) == "now text".length)
  }

  test("gateAttribution: first-fail funnel sums to input and reconciles with refine") {
    // quality must fail AFTER language passes, so the quality-class
    // doc carries one English stopword and a punctuation flood (the
    // punct-ratio quality component zeroes, langId still says en);
    // an all-punct text would say 'und' and charge 'lang' instead —
    // first-fail order is itself under test here. At the DEFAULT 0.3
    // floor the quality class is unreachable once language passes
    // (comp1+comp3 ≥ 1.04 and comp4 ≥ 0.5 on any en text), hence 0.7.
    val docs = Seq(
      (1L, "the cat sat on the mat and looked out the window for hours"),
      (2L, "the cat sat on the mat and looked out the window for hours"), // dup of 1
      (3L, "le chat est sur le tapis et il regarde par la fenetre"),      // lang
      (4L, "the " + "!? " * 40),                                          // quality (en)
      (5L, "the " * 30),                                                  // repetition (en)
      (6L, null.asInstanceOf[String]),                                    // null text
      (7L, "a different english sentence with the usual words in it for the test")
    ).toDF("doc_id", "text")
    val got = Corpus.gateAttribution(docs, "doc_id", "text",
        minQuality = 0.7)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(6L) == "null_text", s"got $got")
    assert(got(3L) == "lang")
    assert(got(4L) == "quality")
    assert(got(5L) == "repetition")
    assert(got(2L) == "duplicate" && got(1L) == "kept")
    assert(got(7L) == "kept")
    // funnel is total and `kept` equals refine's survivor count
    assert(got.size == 7)
    val kept = got.values.count(_ == "kept").toLong
    assert(kept == Corpus.refine(docs, "doc_id", "text",
        minQuality = Some(0.7)).count(),
      "kept class must equal the refine survivor count")
    // an all-punct text is charged to LANG (und), never quality —
    // the ordering subtlety pinned explicitly
    val und = Corpus.gateAttribution(
        Seq((9L, "@@ ## $$ %% !! ??")).toDF("doc_id", "text"),
        "doc_id", "text", minQuality = 0.7)
      .head().getString(1)
    assert(und == "lang", s"all-punct must charge lang, got $und")
  }

  test("gateAttribution namedRepetition: Gopher rules report by name, dup_token closes the ladder, default mode unchanged") {
    // gibberish words keep langId at 'und'; langs=Set("und") +
    // minQuality=0 open the upstream gates so the repetition stage
    // gets the charge
    val docs = Seq(
      (1L, "qq1\n\nzz2\n\nqq1\n\nzz3\n\nqq1\n\nzz4\n\nqq1"), // dup_para 3/7
      (2L, "aa1 bb1 uu1 uu2 aa1 bb1 uu3 uu4 aa1 bb1"),        // top_2gram
      // no Gopher rule fires (repeats far apart, never the same
      // neighbor, so every n-gram is unique) but dup-token fraction
      // is 3/8 > 0.3 — the ladder's FINAL dup_token rule catches it
      (3L, "pp1 qq2 pp1 rr3 pp1 ss4 pp1 tt5"),
      (4L, "vv1 vv2 vv3 vv4 vv5 vv6"),                        // clean
      (5L, "vv1 vv2 vv3 vv4 vv5 vv6")                         // exact dup of 4
    ).toDF("doc_id", "text")
    val named = Corpus.gateAttribution(docs, "doc_id", "text",
        langs = Set("und"), minQuality = 0.0,
        maxDupTokenFraction = 0.3, namedRepetition = true)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(named(1L) == "repetition:dup_para", s"got $named")
    assert(named(2L) == "repetition:top_2gram", s"got $named")
    assert(named(3L) == "repetition:dup_token", s"got $named")
    assert(named(4L) == "kept" && named(5L) == "duplicate", s"got $named")
    // the kept-count invariant holds under the ladder too: refine's
    // gopherRepetition flag is the pipeline-side mirror of
    // namedRepetition, gate for gate
    assert(named.values.count(_ == "kept").toLong ==
      Corpus.refine(docs, "doc_id", "text", langs = Set("und"),
        minQuality = Some(0.0), maxDupTokenFraction = Some(0.3),
        gopherRepetition = true).count(),
      "named funnel 'kept' must equal refine(gopherRepetition=true) survivors")
    // default mode on the same frame keeps the legacy verdict label
    val legacy = Corpus.gateAttribution(docs, "doc_id", "text",
        langs = Set("und"), minQuality = 0.0, maxDupTokenFraction = 0.3)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(legacy(3L) == "repetition" && !legacy.values.exists(_.contains(":")),
      s"default mode must keep the plain 'repetition' label, got $legacy")
  }
}
