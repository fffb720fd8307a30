package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  test("bm25 matches a hand-computed reference on a tiny corpus") {
    val docs = Seq(
      (1L, "data model training data"),
      (2L, "the quick brown fox"),
      (3L, "data"),
      (4L, "completely unrelated words here")
    ).toDF("doc_id", "text")
    val got = Retrieval.bm25(docs, "doc_id", "text", Seq("data", "model"))
      .as[(Long, Double)].collect().toMap

    // reference: N=4, avgdl = (4+4+1+4)/4 = 3.25
    val N = 4.0; val avgdl = 3.25; val (k1, b) = (1.2, 0.75)
    def idf(df: Double) = math.log(1 + (N - df + 0.5) / (df + 0.5))
    def w(tf: Double, dl: Double, df: Double) =
      idf(df) * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))
    val want = Map(
      1L -> (w(2, 4, 2) + w(1, 4, 1)), // data tf=2 df=2; model tf=1 df=1
      3L -> w(1, 1, 2))                // data tf=1, short doc boosts
    assert(got.keySet === want.keySet)  // docs 2 and 4 have no query term
    want.foreach { case (id, s) =>
      assert(math.abs(got(id) - s) < 1e-9, s"doc $id: got ${got(id)} want $s")
    }
    // the short doc with one 'data' outranks nothing with tf=2 + extra term
    assert(got(1L) > got(3L))
  }

  test("appendToBm25Tables: per-doc idempotent absorbs, zero-token docs in avgdl, serve == ad-hoc") {
    val docs = Seq(
      (1L, "data model training data"),
      (2L, "the quick brown fox"),
      (3L, "data"),
      (4L, "completely unrelated words here"),
      (5L, "   ") // zero-token: no postings, still counts in n_docs/avgdl
    ).toDF("doc_id", "text")
    val statsT = "graft_test_bm25s_stats"
    val dlT = "graft_test_bm25s_dl"
    Seq(statsT, dlT).foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      graft.sources.Warehouse.clearOrphanLocation(spark, t)
    }
    assert(Retrieval.appendToBm25Tables(spark, docs.filter($"doc_id" <= 2),
      "doc_id", "text", statsT, dlT) == 2L)
    assert(Retrieval.appendToBm25Tables(spark, docs,
      "doc_id", "text", statsT, dlT) == 3L,
      "only unseen docs absorb on an overlapping batch")
    assert(Retrieval.appendToBm25Tables(spark, docs,
      "doc_id", "text", statsT, dlT) == 0L, "whole-corpus replay is a no-op")
    assert(spark.table(dlT).count() == 5L,
      "the zero-token doc holds a dl row")
    assert(spark.table(dlT).filter($"doc_id" === 5L)
      .select("dl").as[Int].head() == 0)
    assert(spark.table(statsT).filter($"doc_id" === 5L).count() == 0L,
      "zero-token docs have no postings")
    // served scores equal the ad-hoc formula over everything absorbed
    val served = Retrieval.bm25FromTables(spark, statsT, dlT,
      Seq("data", "model")).as[(Long, Double)].collect().toMap
    val adhoc = Retrieval.bm25(docs, "doc_id", "text",
      Seq("data", "model")).as[(Long, Double)].collect().toMap
    assert(served.keySet == adhoc.keySet)
    adhoc.foreach { case (id, s) =>
      assert(math.abs(served(id) - s) < 1e-12, s"doc $id: $s vs ${served(id)}")
    }
    Seq(statsT, dlT).foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  test("bm25 properties on the real corpus: query-term docs only, tf monotone") {
    val docs = graft.sources.Tables.load(spark, "/root/testdata/sf0.01", "documents")
    val scores = Retrieval.bm25(docs, "doc_id", "text", Seq("the"))
      .as[(Long, Double)].collect().toMap
    val withTerm = docs
      .filter(array_contains(split(lower(trim($"text")), "\\s+"), "the"))
      .select("doc_id").as[Long].collect().toSet
    assert(scores.keySet === withTerm)
    assert(scores.values.forall(_ > 0))
  }

  test("rrfFuse: hand-checked fusion, overlap counted once per list, no corpus-scale ops") {
    // list A ranks docs 1,2,3; list B ranks 3,2,9 — doc 3 appears in
    // both (ranks 3 and 1), doc 9 only in B
    val a = Seq((1L, 1), (2L, 2), (3L, 3)).toDF("doc_id", "rank")
    val b = Seq((3L, 1), (2L, 3), (9L, 2)).toDF("doc_id", "rank")
    val fused = Retrieval.rrfFuse(Seq(a, b), "doc_id", "rank", kRrf = 60)
    val got = fused.collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    def s(ranks: Int*) = ranks.map(r => 1.0 / (60 + r)).sum
    assert(got(1L) == ((s(1), 1L)))
    assert(got(2L) == ((s(2, 3), 2L)))
    assert(got(3L) == ((s(3, 1), 2L)))
    assert(got(9L) == ((s(2), 1L)))
    // shape: union + one aggregate — no join, no window, no sort
    val plan = fused.queryExecution.executedPlan.toString
    assert(!plan.contains("Join") && !plan.contains("Window"), plan.take(800))
    // degenerate inputs rejected
    intercept[IllegalArgumentException](Retrieval.rrfFuse(Nil, "doc_id", "rank"))
    intercept[IllegalArgumentException](
      Retrieval.rrfFuse(Seq(a), "doc_id", "rank", kRrf = 0))
  }

  test("bm25TopK ranks deterministically and plans per-partition top-n") {
    val docs = graft.sources.Tables.load(spark, "/root/testdata/sf0.01", "documents")
    val top = Retrieval.bm25TopK(docs, "doc_id", "text",
      Seq("the", "data", "model"), n = 10)
    val rows = top.as[(Long, Double)].collect()
    assert(rows.length == 10)
    assert(rows.map(_._2).toSeq === rows.map(_._2).sortBy(-_).toSeq)
    val plan = top.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(500))
  }

  test("bm25JoinTopK equals the single-query form, query by query") {
    val docs = graft.sources.Tables
      .load(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "text")
    // two synthetic query "docs" whose texts are the term bags
    val queries = Seq((9001L, "the data model"), (9002L, "spark join stream"))
      .toDF("doc_id", "text")
    // cap disabled: the single-query form applies no df-cap, so exact
    // parity is only defined at maxDfFraction = 1.0
    val batch = Retrieval.bm25JoinTopK(docs, "doc_id", "text",
        queries, "doc_id", "text", n = 15, maxDfFraction = 1.0)
      .select("query_id", "doc_id", "score", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        math.round(r.getDouble(2) * 1e9), r.getInt(3)))
      .groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3, t._4)).toSeq.sortBy(_._3)).toMap
    for ((qid, terms) <- Seq((9001L, Seq("the", "data", "model")),
                             (9002L, Seq("spark", "join", "stream")))) {
      val single = Retrieval.bm25TopK(docs, "doc_id", "text", terms, n = 15)
        .collect().zipWithIndex
        .map { case (r, i) => (r.getLong(0), math.round(r.getDouble(1) * 1e9), i + 1) }
        .toSeq
      assert(batch(qid) == single, s"batch run for $qid diverged from single-query bm25")
    }
  }

  test("bm25JoinTopK df-cap drops stopword terms below the candidate join") {
    // every doc shares 'the' (a true stopword: df = n_docs); only doc
    // 1 shares a content term with the query. Uncapped, the stopword
    // enumerates one candidate row per document — |queries|×|docs| on
    // a real corpus; capped, docs reachable ONLY through it vanish.
    val docs = Seq(
      (1L, "the zebra migrates"),
      (2L, "the quick fox"),
      (3L, "the slow snail"),
      (4L, "the bright star")
    ).toDF("doc_id", "text")
    val queries = Seq((9L, "the zebra")).toDF("doc_id", "text")
    val capped = Retrieval.bm25JoinTopK(docs, "doc_id", "text",
        queries, "doc_id", "text", n = 10)
      .select("doc_id").as[Long].collect().toSet
    assert(capped == Set(1L),
      s"stopword-only candidates survived the df-cap: $capped")
    // uncapped, all four docs match through 'the'
    val uncapped = Retrieval.bm25JoinTopK(docs, "doc_id", "text",
        queries, "doc_id", "text", n = 10, maxDfFraction = 1.0)
      .select("doc_id").as[Long].collect().toSet
    assert(uncapped == Set(1L, 2L, 3L, 4L))
    intercept[IllegalArgumentException](
      Retrieval.bm25JoinTopK(docs, "doc_id", "text", queries, "doc_id",
        "text", maxDfFraction = 0.0))
  }

  test("bm25JoinTopK plan: docFreq is semi-joined to query terms and never force-broadcast") {
    val docs = graft.sources.Tables
      .load(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "text")
    val queries = Seq((9001L, "the data model")).toDF("doc_id", "text")
    val q = Retrieval.bm25JoinTopK(docs, "doc_id", "text",
        queries, "doc_id", "text", n = 10)
    // the |vocab|-row docFreq aggregate must be pruned by a LeftSemi
    // against the distinct query-term set before it joins anything
    val p = q.queryExecution.executedPlan.toString
    assert(p.contains("LeftSemi"), p.take(1500))
    // corpus-as-queries regime: the distinct query-term set IS the
    // vocabulary, so the df slice must carry NO broadcast hint — the
    // only forced broadcasts in the analyzed plan are the two one-row
    // corpus-stat frames. (AQE may still broadcast the slice at
    // runtime from its MEASURED size; that adaptivity is the point.)
    val hints = "ResolvedHint".r.findAllIn(q.queryExecution.analyzed.toString).size
    assert(hints == 2,
      s"expected exactly the 2 one-row corpus-stat hints, got $hints")
    // with size-based broadcasting off, the unhinted slice must fall
    // back to a shuffle join: no BroadcastExchange subtree may contain
    // the LeftSemi (parent-first print)
    val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val cold = Retrieval.bm25JoinTopK(docs, "doc_id", "text",
          queries, "doc_id", "text", n = 10)
        .queryExecution.executedPlan.toString
      var i = cold.indexOf("BroadcastExchange")
      while (i >= 0) {
        val next = cold.indexOf("BroadcastExchange", i + 1)
        val end = if (next >= 0) next else cold.length
        assert(!cold.substring(i, end).contains("LeftSemi"),
          "df slice still under a forced BroadcastExchange:\n" + cold.take(1500))
        i = next
      }
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
  }

  test("bm25JoinTopK corpus-as-queries: every doc a query, parity with single-query bm25") {
    // the dedup-by-retrieval regime the broadcast fix targets: the
    // distinct query-term set is the whole vocabulary. df-cap disabled
    // (this fixture's df is a content signal — 30/31 terms exceed any
    // sane cap) so parity with the capless single-query form is exact.
    val docs = graft.sources.Tables
      .load(spark, "/root/testdata/sf0.01", "documents")
      .select("doc_id", "text")
    val batch = Retrieval.bm25JoinTopK(docs, "doc_id", "text",
        docs, "doc_id", "text", n = 5, maxDfFraction = 1.0,
        excludeSelf = true)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        math.round(r.getDouble(2) * 1e9), r.getInt(3)))
      .groupBy(_._1).view
      .mapValues(_.map(t => (t._2, t._3, t._4)).toSeq.sortBy(_._3)).toMap
    assert(batch.size == docs.count(),
      s"some queries returned nothing: ${batch.size}")
    // spot-check three queries against the single-query path
    val spot = docs.filter(col("doc_id").isin(3L, 250L, 499L))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    for ((qid, text) <- spot) {
      val terms = text.toLowerCase.trim.split("\\s+").filter(_.nonEmpty).toSeq
      // stats stay corpus-wide (excludeSelf only drops the query doc
      // from the CANDIDATES, not from df/avgdl) — so score on the full
      // corpus, then drop self and take the top 5
      val single = Retrieval.bm25(docs, "doc_id", "text", terms)
        .filter(col("doc_id") =!= qid)
        .orderBy(col("score").desc, col("doc_id"))
        .limit(5)
        .collect().zipWithIndex
        .map { case (r, i) => (r.getLong(0), math.round(r.getDouble(1) * 1e9), i + 1) }
        .toSeq
      assert(batch(qid) == single,
        s"corpus-as-queries run diverged from single-query bm25 for $qid")
    }
  }

  test("retrieval-quality floor: recall@10 >= 0.4 on the near-dup truth set") {
    // the q86 harness at sf0.001. Deterministic end to end (exact
    // tf/df integers, rank ties broken by id), so a floor is safe to
    // pin; an index regression that tanks ranking quality fails here
    // even if it still hash-matches its own oracle. The pinned value
    // IS the measured mean on this fixture: the synthetic corpus draws
    // every doc from the same 31-word vocabulary, so bag-of-words BM25
    // can only partially resolve a word-ORDER-defined (trigram
    // Jaccard) truth set — 0.40 is the honest ceiling here, not a
    // weakness of the operator (on Zipfian text the partners' shared
    // rare terms dominate).
    val docs = graft.sources.Tables
      .load(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "text")
    val pairs = Dedup.ngramJaccard(docs, "doc_id", "text", n = 3, threshold = 0.5)
    val rel = pairs.select(col("doc_a").as("query_id"), col("doc_b").as("doc_id"))
      .union(pairs.select(col("doc_b").as("query_id"), col("doc_a").as("doc_id")))
    val queries = docs.join(
      rel.select(col("query_id").as("doc_id")).distinct(), Seq("doc_id"))
    assert(queries.count() > 0, "fixture lost its near-dup pairs")
    // cap disabled, like q86: this fixture's 31-term vocabulary makes
    // every content term look like a stopword by df
    val run = Retrieval.bm25JoinTopK(docs, "doc_id", "text",
      queries, "doc_id", "text", n = 20, excludeSelf = true,
      maxDfFraction = 1.0)
    val m = Retrieval.evalRanking(run, rel, k = 10)
      .agg(avg(col("recall_at_k")).as("mean_recall")).as[Double].head()
    assert(m >= 0.4, f"mean recall@10 regressed: $m%.4f < 0.4")
  }

  test("evalRanking matches hand-computed metrics on a closed-form fixture") {
    // run: q1 retrieves docs 10,11,12 at ranks 1,2,3; q2 retrieves 20 at rank 11
    val run = Seq((1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3), (2L, 20L, 11))
      .toDF("query_id", "doc_id", "rank")
    // truth: q1's relevant = {11, 12, 99(missed)}; q2's = {20} but only at rank 11 > k
    val rel = Seq((1L, 11L), (1L, 12L), (1L, 99L), (2L, 20L))
      .toDF("query_id", "doc_id")
    val got = Retrieval.evalRanking(run, rel, k = 10)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(got(1L) == ((3L, 2L, math.rint(2.0 / 3 * 1e6) / 1e6, 0.5)),
      s"q1 metrics wrong: ${got(1L)}")
    // q2: relevant doc retrieved but OUTSIDE k -> zero credit
    assert(got(2L) == ((1L, 0L, 0.0, 0.0)), s"q2 metrics wrong: ${got(2L)}")
  }

  test("evalRanking is immune to duplicate relevance rows and duplicate run pairs") {
    // doubled relevance rows must not inflate n_rel/hits; a run pair
    // listed twice must count once at its BEST rank
    val run = Seq((1L, 10L, 5), (1L, 10L, 2), (1L, 11L, 1))
      .toDF("query_id", "doc_id", "rank")
    val rel = Seq((1L, 10L), (1L, 10L), (1L, 11L), (1L, 99L))
      .toDF("query_id", "doc_id")
    val got = Retrieval.evalRanking(run, rel, k = 10)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(got(1L) == ((3L, 2L, math.rint(2.0 / 3 * 1e6) / 1e6, 1.0)),
      s"duplicate-input metrics wrong: ${got(1L)}")
  }

  test("mineHardNegatives: relevant excluded, survivors re-ranked, nNeg bound, dup-immune") {
    // q1 run: docs 10(rel),11,12,13(rel),14 at ranks 1..5 -> negatives
    // 11,12,14 re-ranked 1,2,3; nNeg=2 keeps 11,12. q2 all-relevant ->
    // no negatives. Duplicate run pair (2 ranks) and doubled relevance
    // rows must not fan out or double-emit.
    val run = Seq(
      (1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3), (1L, 13L, 4), (1L, 14L, 5),
      (1L, 11L, 7),                 // duplicate pair at a worse rank
      (2L, 20L, 1))
      .toDF("query_id", "doc_id", "rank")
    val rel = Seq((1L, 10L), (1L, 13L), (1L, 13L), (2L, 20L))
      .toDF("query_id", "doc_id")
    val got = Retrieval.mineHardNegatives(run, rel, nNeg = 2)
      .orderBy("query_id", "neg_rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    assert(got == Seq((1L, 11L, 1), (1L, 12L, 2)), s"got $got")
    // nNeg above the survivor count returns them all, ranks contiguous
    val all = Retrieval.mineHardNegatives(run, rel, nNeg = 10)
      .orderBy("query_id", "neg_rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    assert(all == Seq((1L, 11L, 1), (1L, 12L, 2), (1L, 14L, 3)), s"got $all")
  }

  test("phraseMatches: overlaps, repeats, case-insensitivity, and the leg-join plan") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c a b"),        // "a b" at 0 and 3
      (2L, "A B"),              // case-insensitive hit at 0
      (3L, "b a"),              // reversed: no hit
      (4L, "x x x"),            // repeated-term phrase fixture
      (5L, "")                  // empty
    ).toDF("doc_id", "text")
    val ab = Retrieval.phraseMatches(docs, "doc_id", "text", Seq("a", "b"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(2)))).toMap
    assert(ab == Map(1L -> ((2L, 0)), 2L -> ((1L, 0))), s"got $ab")
    // "x x" overlaps at 0 and 1 — the self-joining legs must count both
    val xx = Retrieval.phraseMatches(docs, "doc_id", "text", Seq("x", "x"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(xx == Map(4L -> 2L), s"got $xx")
    // plan: no cartesian, no window
    val plan = Retrieval.phraseMatches(docs, "doc_id", "text", Seq("a", "b"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("Window"),
      plan.take(600))
    intercept[IllegalArgumentException](
      Retrieval.phraseMatches(docs, "doc_id", "text", Seq.empty))
  }

  test("phraseMatches: leading tab/newline does not shift positions (tokensOf parity)") {
    import spark.implicits._
    // trim() strips only spaces — a leading tab used to mint a ""
    // token at pos 0 and shift every position by one vs tokensOf
    val docs = Seq((1L, "\ta b"), (2L, "\na b"), (3L, " a b")).toDF("doc_id", "text")
    val got = Retrieval.phraseMatches(docs, "doc_id", "text", Seq("a", "b"))
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(got == Map(1L -> 0, 2L -> 0, 3L -> 0), s"positions shifted: $got")
  }
}
