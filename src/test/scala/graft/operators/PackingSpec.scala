package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PackingSpec extends SparkSpec {
  import spark.implicits._

  test("contiguous packing: bins fill to the budget, straddle by at most one doc") {
    val docs = (1L to 200L).map(i => (i, 100L + (i % 7) * 50L)).toDF("id", "toks")
    val packed = Packing.packContiguous(docs, "id", "toks", budget = 1000L, shards = 1)
    val bins = packed.groupBy("bin").agg(sum("toks").as("total"),
        max("toks").as(("biggest")), count(lit(1)).as("n"))
      .orderBy("bin").as[(Long, Long, Long, Long)].collect()
    assert(bins.length > 1)
    // every bin except the last holds budget +- one straddling doc:
    // its own last doc overhangs into the next span (overfill), and
    // the previous bin's straddler eats into this bin's span
    // (underfill) — both bounded by the largest document
    val maxDoc = 100L + 6 * 50L
    bins.dropRight(1).foreach { case (bin, total, _, _) =>
      assert(total > 1000L - maxDoc, s"bin $bin underfilled: $total")
      assert(total < 1000L + maxDoc, s"bin $bin overfilled: $total")
    }
    // bins are contiguous in the order column: id ranges do not overlap
    val ranges = packed.groupBy("bin").agg(min("id").as("lo"), max("id").as("hi"))
      .orderBy("bin").as[(Long, Long, Long)].collect()
    ranges.sliding(2).foreach {
      case Array((_, _, hi1), (_, lo2, _)) => assert(hi1 < lo2)
      case _ =>
    }
  }

  test("sharded packing: deterministic shard draw, each shard packs independently") {
    val docs = (1L to 500L).map(i => (i, 97L)).toDF("id", "toks")
    val packed = Packing.packContiguous(docs, "id", "toks", budget = 500L, shards = 4)
      .persist()
    try {
      val shards = packed.select("shard").distinct().as[Int].collect().toSet
      assert(shards.subsetOf(Set(0, 1, 2, 3)) && shards.size == 4)
      // same call again: identical assignment (pure function of ids)
      val again = Packing.packContiguous(docs.repartition(11), "id", "toks",
        budget = 500L, shards = 4)
      assert(packed.select("id", "shard", "bin").as[(Long, Int, Long)].collect().toSet ===
        again.select("id", "shard", "bin").as[(Long, Int, Long)].collect().toSet)
      // bins within every shard start at 0 and are dense
      val perShard = packed.groupBy("shard")
        .agg(min("bin").as("lo"), max("bin").as("hi"),
          countDistinct("bin").as("n"))
        .as[(Int, Long, Long, Long)].collect()
      perShard.foreach { case (s, lo, hi, n) =>
        assert(lo == 0L && n == hi + 1, s"shard $s bins not dense: [$lo,$hi] n=$n")
      }
    } finally packed.unpersist()
  }

  test("assembleSequences: exact concatenation, aligned offsets, null text as empty") {
    import spark.implicits._
    // one shard, fixed bins: hand-checkable
    val packed = Seq(
      (1L, "alpha", 0, 0L),
      (2L, "bee", 0, 0L),
      (3L, null.asInstanceOf[String], 0, 0L), // null concatenates as ""
      (10L, "solo", 0, 1L))
      .toDF("doc_id", "text", "shard", "bin")
    val got = Packing.assembleSequences(packed, "doc_id", "text",
        orderCol = "doc_id", sep = "--")
      .orderBy("shard", "bin")
      .select("doc_ids", "offsets", "sequence", "n_docs", "seq_chars")
      .as[(Seq[Long], Seq[Long], String, Int, Long)].collect()
    assert(got.length == 2)
    val (ids0, offs0, seq0, n0, c0) = got(0)
    assert(ids0 == Seq(1L, 2L, 3L) && n0 == 3)
    assert(seq0 == "alpha--bee--", "null text joins as empty")
    // starts: alpha@0, bee@7 (5+2), ""@12 (7+3+2)
    assert(offs0 == Seq(0L, 7L, 12L), offs0.toString)
    assert(c0 == seq0.length.toLong)
    val (ids1, offs1, seq1, _, _) = got(1)
    assert(ids1 == Seq(10L) && seq1 == "solo" && offs1 == Seq(0L))
    // a supplementary-plane separator counts ONE code point (Spark's
    // length unit), not its two UTF-16 units — offsets stay aligned
    val astral = Packing.assembleSequences(
        Seq((1L, "ab", 0, 0L), (2L, "cd", 0, 0L))
          .toDF("doc_id", "text", "shard", "bin"),
        "doc_id", "text", orderCol = "doc_id", sep = "🔚")
      .select("offsets", "seq_chars").as[(Seq[Long], Long)].head()
    assert(astral == ((Seq(0L, 3L), 5L)), astral.toString)
    // each doc is recoverable from its offset (the mask-boundary
    // contract): substring(seq, off, nextOff - off - sepLen) == text
    val texts = Seq("alpha", "bee", "")
    val bounds = offs0 :+ (seq0.length + 2).toLong
    texts.zipWithIndex.foreach { case (t, i) =>
      val s = seq0.substring(bounds(i).toInt,
        (bounds(i + 1) - 2).toInt)
      assert(s == t, s"slot $i: '$s' != '$t'")
    }
  }

  test("assembleTokenSequences: flattened ids with EOS per doc, aligned offsets, null arrays as empty") {
    import spark.implicits._
    val packed = Seq(
      (1L, Seq(7L, 8L, 9L), 0, 0L),
      (2L, Seq(5L), 0, 0L),
      (3L, null.asInstanceOf[Seq[Long]], 0, 0L), // null = empty doc
      (10L, Seq(11L, 12L), 0, 1L))
      .toDF("doc_id", "token_ids", "shard", "bin")
    val got = Packing.assembleTokenSequences(packed, "doc_id",
        "token_ids", orderCol = "doc_id")
      .orderBy("shard", "bin")
      .select("doc_ids", "offsets", "sequence", "n_docs", "seq_tokens")
      .as[(Seq[Long], Seq[Long], Seq[Long], Int, Long)].collect()
    assert(got.length == 2)
    val (ids0, offs0, seq0, n0, t0) = got(0)
    assert(ids0 == Seq(1L, 2L, 3L) && n0 == 3)
    // doc1 ids + EOS, doc2 ids + EOS, empty doc -> bare EOS
    assert(seq0 == Seq(7L, 8L, 9L, 0L, 5L, 0L, 0L), seq0.toString)
    // starts: doc1@0, doc2@4 (3+1), doc3@6 (4+1+1)
    assert(offs0 == Seq(0L, 4L, 6L), offs0.toString)
    assert(t0 == 7L)
    val (ids1, offs1, seq1, _, t1) = got(1)
    assert(ids1 == Seq(10L) && seq1 == Seq(11L, 12L, 0L) &&
      offs1 == Seq(0L) && t1 == 3L)
    // each doc is recoverable from its offset (the mask contract):
    // slice(seq, off, nextOff - off - 1) == its ids
    val docs = Seq(Seq(7L, 8L, 9L), Seq(5L), Seq.empty[Long])
    val bounds = offs0 :+ (seq0.length).toLong
    docs.zipWithIndex.foreach { case (d, i) =>
      val s = seq0.slice(bounds(i).toInt, (bounds(i + 1) - 1).toInt)
      assert(s == d, s"slot $i: $s != $d")
    }
    // a custom separator id lands instead of 0
    val sep9 = Packing.assembleTokenSequences(
        Seq((1L, Seq(1L), 0, 0L)).toDF("doc_id", "token_ids", "shard", "bin"),
        "doc_id", "token_ids", orderCol = "doc_id", sepId = 9L)
      .select("sequence").as[Seq[Long]].head()
    assert(sep9 == Seq(1L, 9L))
    // deterministic under repartitioning (sort-in-aggregate)
    val a = Packing.assembleTokenSequences(packed.repartition(7),
        "doc_id", "token_ids", orderCol = "doc_id")
      .orderBy("shard", "bin").select("sequence", "offsets")
      .as[(Seq[Long], Seq[Long])].collect().toSeq
    val b = Packing.assembleTokenSequences(packed.coalesce(1),
        "doc_id", "token_ids", orderCol = "doc_id")
      .orderBy("shard", "bin").select("sequence", "offsets")
      .as[(Seq[Long], Seq[Long])].collect().toSeq
    assert(a == b)
  }

  test("sequenceAttribution: offset-delta shares (sep included) reconcile per group; a corrupted offset misattributes") {
    val toks = Seq(
      (1L, Seq(10L, 11L, 12L)), // 3 tokens + sep = 4
      (2L, Seq(20L)),           // 1 + 1 = 2
      (3L, Seq(30L, 31L)),      // 2 + 1 = 3
      (4L, null)                // NULL text: 0 + 1 = 1 (sep only)
    ).toDF("doc_id", "token_ids")
      .withColumn("n_tokens",
        coalesce(size(col("token_ids")), lit(0)).cast("long"))
    val meta = Seq((1L, "a"), (2L, "a"), (3L, "b"), (4L, "b"))
      .toDF("doc_id", "grp")
    val seqs = Packing.assembleTokenSequences(
      Packing.packContiguous(toks, "doc_id", "n_tokens",
        budget = 100L, shards = 1),
      "doc_id", "token_ids", orderCol = "doc_id")
    val got = Packing.sequenceAttribution(seqs, meta, "doc_id", "grp")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(got == Map("a" -> ((2L, 6L)), "b" -> ((2L, 4L))), s"got $got")
    // the ledger audits the GEOMETRY: shifting one interior offset
    // moves a token between adjacent docs' shares (totals conserved)
    // index 2 sits on the doc-2/doc-3 boundary — a cross-GROUP shift
    // (an intra-group one would conserve the group totals and hide)
    val corrupted = seqs.withColumn("offsets",
      transform(col("offsets"),
        (o, i) => when(i === 2, o + 1L).otherwise(o)))
    val g2 = Packing.sequenceAttribution(corrupted, meta, "doc_id", "grp")
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(g2.values.sum == 10L && g2 != got.map { case (k, v) => k -> v._2 },
      s"corruption must shift attribution, got $g2")
  }

  test("packBestFit: deterministic BFD assignment, oversize/zero-size legs, tighter than first-fit on a skewed fixture") {
    import spark.implicits._
    // budget 100, sizes 70 + 50x4 + 25x6: BFD fills the 70-bin's gap
    // with a 25, pairs the 50s, and packs the rest 4-to-a-bin
    val docs = (Seq((1L, 70L)) ++ (2L to 5L).map(_ -> 50L) ++
      (6L to 11L).map(_ -> 25L)).toDF("doc_id", "n_tokens")
    val got = Packing.packBestFit(docs, "doc_id", "n_tokens", budget = 100L)
      .select("doc_id", "bin").as[(Long, Long)].collect().toMap
    val want = Map(1L -> 0L, 2L -> 1L, 3L -> 1L, 4L -> 2L, 5L -> 2L,
      6L -> 0L, 7L -> 3L, 8L -> 3L, 9L -> 3L, 10L -> 3L, 11L -> 4L)
    assert(got == want, s"got $got")
    // deterministic under repartitioning
    val got2 = Packing.packBestFit(docs.repartition(5), "doc_id",
        "n_tokens", budget = 100L)
      .select("doc_id", "bin").as[(Long, Long)].collect().toMap
    assert(got2 == want)
    // report: 5 bins, 420 of 500 capacity filled
    val rep = Packing.packingReport(
        Packing.packBestFit(docs, "doc_id", "n_tokens", 100L),
        "n_tokens", 100L)
      .select("n_bins", "n_items", "packed_size", "fill_milli",
        "padding_waste")
      .as[(Long, Long, Long, Long, Long)].head()
    assert(rep == ((5L, 11L, 420L, 840L, 80L)), rep.toString)
    // oversize items take a dedicated bin each; zero-size items place
    // as size 1 (never an infinite loop, never dropped)
    val odd = Seq((1L, 150L), (2L, 150L), (3L, 0L), (4L, 30L))
      .toDF("doc_id", "n_tokens")
    val gotOdd = Packing.packBestFit(odd, "doc_id", "n_tokens", 100L)
      .select("doc_id", "bin").as[(Long, Long)].collect().toMap
    assert(gotOdd.values.toSeq.sorted.distinct.size >= 3 &&
      gotOdd(1L) != gotOdd(2L), s"oversize must not share: $gotOdd")
    assert(gotOdd.contains(3L), s"zero-size doc must land: $gotOdd")
    // the classic FF-vs-BFD separation: sizes 40,40,60,60 in id order.
    // first-fit (id order, no straddle) opens 3 bins; BFD pairs 60+40
    // twice and fills both bins completely
    val skew = Seq((1L, 40L), (2L, 40L), (3L, 60L), (4L, 60L))
      .toDF("doc_id", "n_tokens")
    val bfdFill = Packing.packingReport(
        Packing.packBestFit(skew, "doc_id", "n_tokens", 100L),
        "n_tokens", 100L)
      .select("fill_milli").as[Long].head()
    // inline first-fit reference (first bin that fits, id order)
    val sizes = Seq(40L, 40L, 60L, 60L)
    val ffBins = scala.collection.mutable.ArrayBuffer[Long]()
    sizes.foreach { s =>
      val i = ffBins.indexWhere(_ + s <= 100L)
      if (i >= 0) ffBins(i) += s else ffBins += s
    }
    val ffFill = ffBins.sum * 1000L / (ffBins.length * 100L)
    assert(bfdFill == 1000L && ffFill == 666L && bfdFill > ffFill,
      s"bfd $bfdFill vs ff $ffFill")
  }

  test("packBestFit: skew-safe rank — no window over the raw (shard,size) class; fractional sizes rank by their long value") {
    import spark.implicits._
    // 90%-one-size fixture: the typical LLM packing input (max-seq-len
    // truncation makes one size class dominate). The rank must come
    // from the two-pass id-class histogram, never a row_number window
    // partitioned by (shard, size) alone — that serializes the
    // dominant class through one task.
    val dom = ((1L to 90L).map(_ -> 50L) ++ (91L to 100L).map(_ -> 30L))
      .toDF("doc_id", "n_tokens")
    val packed = Packing.packBestFit(dom, "doc_id", "n_tokens", 100L)
    val plan = packed.queryExecution.executedPlan.toString
    val windows = plan.split("\n").filter(_.contains("Window"))
      .filterNot(_.contains("WindowGroupLimit")).toSeq
    assert(windows.nonEmpty, "expected the within-bucket rank window")
    windows.foreach(w => assert(w.contains("__cls"),
      s"a window runs over the raw size class (single-task on the dominant size):\n$w"))
    // assignment identical to the naive single-window reference
    val got = packed.select("doc_id", "bin").as[(Long, Long)]
      .collect().toMap
    val naive = {
      val ranks = (1L to 90L).zipWithIndex.map { case (id, r) =>
        id -> (0L, r.toLong) } ++
        (91L to 100L).zipWithIndex.map { case (id, r) =>
          id -> (1L, r.toLong) }
      // BFD by hand: 45 bins of 50+50, then 30s best-fit 3-to-a-bin
      ranks.toMap.map { case (id, (cls, r)) =>
        id -> (if (cls == 0L) r / 2 else 45L + r / 3)
      }
    }
    assert(got == naive, s"got $got")
    // every bin respects the budget
    val fills = packed.groupBy("bin").agg(sum("n_tokens").as("s"))
      .select("s").as[Long].collect()
    assert(fills.forall(_ <= 100L), fills.mkString(","))
    // odd-n50 tail bin (the q176 oracle's other parity leg): 70 + 3
    // fifties + 7 twentyfives — the lone half-filled 50-bin absorbs
    // 25-ranks 1..2, ranks 3+ open a fresh 4-pack
    val oddN50 = (Seq((0L, 70L)) ++ Seq(1L, 3L, 5L).map(_ -> 50L) ++
      Seq(2L, 4L, 6L, 8L, 10L, 12L, 14L).map(_ -> 25L))
      .toDF("doc_id", "n_tokens")
    val gotOddN50 = Packing.packBestFit(oddN50, "doc_id", "n_tokens", 100L)
      .select("doc_id", "bin").as[(Long, Long)].collect().toMap
    val wantOddN50 = Map(0L -> 0L, 1L -> 1L, 3L -> 1L, 5L -> 2L,
      2L -> 0L, 4L -> 2L, 6L -> 2L, 8L -> 3L, 10L -> 3L, 12L -> 3L,
      14L -> 3L)
    assert(gotOddN50 == wantOddN50, s"got $gotOddN50")
    // fractional size column (ADVICE round 15): 3.0 and 3.4 share the
    // long class 3 — ranks must be computed on the CAST value, so the
    // class packs budget/3 items per bin, never overlapping ranks
    val frac = (1L to 12L).map(i => (i, if (i % 2 == 0) 3.0 else 3.4))
      .toDF("doc_id", "sz")
    val fracPacked = Packing.packBestFit(frac, "doc_id", "sz", 9L)
    val fracFills = fracPacked.groupBy("bin")
      .agg(count(lit(1)).as("n")).select("n").as[Long].collect()
    assert(fracFills.forall(_ <= 3L) && fracFills.sum == 12L,
      s"overlapping ranks overfilled a bin: ${fracFills.mkString(",")}")
  }

  test("assembleSftSequences: completion-only spans, sep trains iff completion non-empty, clamps, NULL boundary trains in full") {
    import spark.implicits._
    // one bin, seven boundary classes: full-completion, all-prompt,
    // NULL (unlabeled -> full), half, empty doc, boundary > len
    // (clamps to all-prompt), negative boundary (clamps to 0)
    val packed = Seq(
      (1L, Seq(10L, 11L, 12L), Some(0L)),   // all completion
      (2L, Seq(20L, 21L), Some(2L)),        // all prompt -> empty span
      (3L, Seq(30L, 31L), None),            // NULL -> trains in full
      (4L, Seq(40L, 41L, 42L, 43L), Some(2L)), // half
      (5L, Seq.empty[Long], None),          // empty doc -> empty span
      (6L, Seq(60L), Some(9L)),             // boundary > len -> clamp
      (7L, Seq(70L), Some(-3L)))            // negative -> clamp to 0
      .map { case (id, t, b) => (id, t, b, 0, 0L) }
      .toDF("doc_id", "token_ids", "prompt_tokens", "shard", "bin")
    val got = Packing.assembleSftSequences(packed, "doc_id", "token_ids",
        "prompt_tokens", orderCol = "doc_id")
      .select("offsets", "mask_starts", "mask_ends", "seq_tokens")
      .as[(Seq[Long], Seq[Long], Seq[Long], Long)].head()
    assert(got._1 == Seq(0L, 4L, 7L, 10L, 15L, 16L, 18L), got.toString)
    assert(got._2 == Seq(0L, 6L, 7L, 12L, 15L, 17L, 18L), got.toString)
    assert(got._3 == Seq(4L, 6L, 10L, 15L, 15L, 17L, 20L), got.toString)
    assert(got._4 == 20L, got.toString)
    // geometry consistency: every span sits inside the sequence and
    // empty spans are exactly the all-prompt/empty docs
    got._2.zip(got._3).foreach { case (s, e) =>
      assert(s <= e && e <= got._4, s"span [$s,$e) out of range")
    }
    assert(got._2.zip(got._3).count { case (s, e) => s == e } == 3)
  }

  test("assemblePreferencePairs: shared prompt mask, sep trains iff completion non-empty, NULL arrays as empty") {
    import spark.implicits._
    val pairs = Seq(
      (1L, Some(Seq(1L, 2L)), Some(Seq(10L, 11L, 12L)), Some(Seq(20L))),
      (2L, Some(Seq(1L, 2L)), Some(Seq(10L)), Some(Seq.empty[Long])), // degenerate rejected
      (3L, None, Some(Seq(10L, 11L)), Some(Seq(20L, 21L))),           // NULL prompt
      (4L, Some(Seq(1L)), None, Some(Seq(20L))))                      // NULL chosen
      .toDF("doc_id", "prompt", "chosen", "rejected")
    val got = Packing.assemblePreferencePairs(pairs, "doc_id",
        "prompt", "chosen", "rejected", sepId = 9L)
      .orderBy("doc_id")
      .as[(Long, Long, Seq[Long], Long, Long, Seq[Long], Long, Long)]
      .collect().toSeq
    // (id, mask_start, seq_c, n_c, end_c, seq_r, n_r, end_r)
    assert(got(0) == ((1L, 2L, Seq(1L, 2L, 10L, 11L, 12L, 9L), 6L, 6L,
      Seq(1L, 2L, 20L, 9L), 4L, 4L)), got(0).toString)
    // empty rejected: sep still lands (geometry aligned) but the
    // mask is empty — end == start
    assert(got(1) == ((2L, 2L, Seq(1L, 2L, 10L, 9L), 4L, 4L,
      Seq(1L, 2L, 9L), 3L, 2L)), got(1).toString)
    // NULL prompt: bare completion pair, mask from position 0
    assert(got(2) == ((3L, 0L, Seq(10L, 11L, 9L), 3L, 3L,
      Seq(20L, 21L, 9L), 3L, 3L)), got(2).toString)
    // NULL chosen: degenerate but the row survives for the audit
    assert(got(3) == ((4L, 1L, Seq(1L, 9L), 2L, 1L,
      Seq(1L, 20L, 9L), 3L, 3L)), got(3).toString)
  }

  test("batchByLength: descending fill, open-batch handoff across size classes, oversize dedicated, pad_len states the cost") {
    import spark.implicits._
    // budget 150: the 200 is oversize (dedicated, pad 200); 70s cap 2
    // -> one full batch + an open tail; the first 50 fills that open
    // batch (padded to 70); remaining 50s cap 3; 25s cap 6
    val docs = (Seq((1L, 200L)) ++ (2L to 4L).map(_ -> 70L) ++
      (5L to 8L).map(_ -> 50L) ++ (9L to 13L).map(_ -> 25L))
      .toDF("doc_id", "n_tokens")
    val got = Packing.batchByLength(docs, "doc_id", "n_tokens", 150L)
      .select("doc_id", "batch", "pad_len").as[(Long, Long, Long)]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    val want = Map(
      1L -> ((0L, 200L)),
      2L -> ((1L, 70L)), 3L -> ((1L, 70L)), 4L -> ((2L, 70L)),
      5L -> ((2L, 70L)), 6L -> ((3L, 50L)), 7L -> ((3L, 50L)),
      8L -> ((3L, 50L)),
      9L -> ((4L, 25L)), 10L -> ((4L, 25L)), 11L -> ((4L, 25L)),
      12L -> ((4L, 25L)), 13L -> ((4L, 25L)))
    assert(got == want, s"got $got")
    // every batch's padded cost respects the budget (oversize aside)
    val costs = got.values.groupBy(_._1)
      .map { case (b, xs) => b -> xs.head._2 * xs.size }
    assert(costs.filter(_._1 != 0L).values.forall(_ <= 150L), costs.toString)
    // deterministic under repartitioning
    val got2 = Packing.batchByLength(docs.repartition(5), "doc_id",
        "n_tokens", 150L)
      .select("doc_id", "batch", "pad_len").as[(Long, Long, Long)]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got2 == want)
    // the skew-safe rank machinery is shared with packBestFit: every
    // plan window carries the id-class key
    val plan = Packing.batchByLength(
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
          .select(col("doc_id"), (length(col("text")) % 64).as("sz")),
        "doc_id", "sz", 128L)
      .queryExecution.executedPlan.toString
    plan.split("\n").filter(_.contains("Window"))
      .filterNot(_.contains("WindowGroupLimit"))
      .foreach(w => assert(w.contains("__cls"), w))
  }

  test("assembleSftSequencesMultiTurn: clamp/extend/NULL/empty span edges, adjacent spans stay distinct") {
    import spark.implicits._
    // hand-computed geometry: one shard, one bin (budget >> total),
    // offsets off(d_i) = sum of (len_j + 1) over earlier docs
    val docs = Seq(
      // d1 len 5 off 0: interior span, no separator extension
      (1L, Seq(1L, 2L, 3L, 4L, 5L), Option(Seq((1L, 3L)))),
      // d2 len 4 off 6: terminal span -> +1 covers the separator
      (2L, Seq(6L, 7L, 8L, 9L), Option(Seq((0L, 4L)))),
      // d3 len 3 off 11: NULL spans = pretraining doc, full + sep
      (3L, Seq(10L, 11L, 12L), Option.empty[Seq[(Long, Long)]]),
      // d4 len 2 off 15: EMPTY span list contributes nothing
      (4L, Seq(13L, 14L), Option(Seq.empty[(Long, Long)])),
      // d5 len 0 off 18: empty doc, NULL spans -> still nothing
      (5L, Seq.empty[Long], Option.empty[Seq[(Long, Long)]]),
      // d6 len 3 off 19: wild span clamps to [0,len] then extends
      (6L, Seq(15L, 16L, 17L), Option(Seq((-2L, 99L)))),
      // d7 len 4 off 23: zero-width and inverted spans both drop
      (7L, Seq(18L, 19L, 20L, 21L), Option(Seq((2L, 2L), (3L, 2L)))),
      // d8 len 3 off 28: adjacent spans stay distinct; the second
      // reaches len and extends, the first does not
      (8L, Seq(22L, 23L, 24L), Option(Seq((1L, 2L), (2L, 3L)))))
      .toDF("doc_id", "token_ids", "spans0")
      .withColumn("spans", expr(
        "transform(spans0, z -> struct(z._1 as start, z._2 as end))"))
      .withColumn("n_tokens", size(col("token_ids")).cast("long"))
    val packed = Packing.packContiguous(docs, "doc_id", "n_tokens",
      budget = 1000L, shards = 1)
    val out = Packing.assembleSftSequencesMultiTurn(packed, "doc_id",
      "token_ids", "spans", orderCol = "doc_id")
    assert(out.count() == 1)
    val r = out.selectExpr("n_docs", "seq_tokens", "n_spans",
        "masked_tokens",
        "transform(mask_spans, z -> array(z.start, z.end)) as sp",
        "offsets")
      .as[(Int, Long, Int, Long, Seq[Seq[Long]], Seq[Long])].head()
    assert(r._1 == 8 && r._2 == 32, r)
    assert(r._6 == Seq(0L, 6L, 11L, 15L, 18L, 19L, 23L, 28L), r._6)
    val want = Seq(Seq(1L, 3L), Seq(6L, 11L), Seq(11L, 15L),
      Seq(19L, 23L), Seq(29L, 30L), Seq(30L, 32L))
    assert(r._5 == want, r._5)
    assert(r._3 == 6 && r._4 == want.map(s => s(1) - s(0)).sum, r)
  }

  test("contextOrder: greedy nearest-neighbor path from the smallest-id seed, hand-derived zigzag") {
    import spark.implicits._
    // one cluster, positions (id: pos) 0:5 1:9 2:2 3:12 4:0 5:7 6:14
    // 7:3 — from the interior seed (id 0 at pos 5) the greedy walk
    // zigzags: 0 -> 5(d2, id-tie over 7) -> 1 -> 3 -> 6 -> 7 -> 2 -> 4
    val pos = Map(0L -> 5f, 1L -> 9f, 2L -> 2f, 3L -> 12f, 4L -> 0f,
      5L -> 7f, 6L -> 14f, 7L -> 3f)
    val docs = pos.toSeq.map { case (id, p) => (id, Seq(1000f, p)) }
      .toDF("doc_id", "emb")
    val got = Packing.contextOrder(docs, "doc_id", "emb",
        Array(Array(1f, 0f)))
      .select("doc_id", "ctx_rank").as[(Long, Long)].collect().toMap
    val want = Map(0L -> 0L, 5L -> 1L, 1L -> 2L, 3L -> 3L, 6L -> 4L,
      7L -> 5L, 2L -> 6L, 4L -> 7L)
    assert(got == want, got.toString)
  }

  test("packInContext: same-cluster co-bin rate beats id-order packing on an interleaved clustered corpus") {
    import spark.implicits._
    // 4 clusters of 25 docs with ids INTERLEAVED (id % 4 = cluster):
    // id-order packing scatters every cluster across bins; in-context
    // packing reunites them
    // directional clusters (the IVF model is cosine): cluster c on
    // one-hot axis c, the within-cluster position on a 5th dim
    val docs = (0L until 100L).map { id =>
      val c = (id % 4).toInt
      val emb = Seq.tabulate(5)(d =>
        if (d == c) 1000f else if (d == 4) (id / 4).toFloat else 0f)
      (id, 50L, emb, c)
    }.toDF("doc_id", "n_tokens", "emb", "truth")
    val centroids = (0 until 4)
      .map(c => Array.tabulate(5)(d => if (d == c) 1f else 0f)).toArray
    def purity(packed: org.apache.spark.sql.DataFrame): Double = {
      val bins = packed.groupBy("shard", "bin")
        .agg(collect_list("truth").as("ts"))
        .select("ts").as[Seq[Int]].collect()
      bins.map(ts => ts.groupBy(identity).values.map(_.size).max.toDouble /
        ts.size).sum / bins.size
    }
    val ctx = purity(Packing.packInContext(docs, "doc_id", "n_tokens",
      "emb", centroids, budget = 250L))
    val byId = purity(Packing.packContiguous(docs, "doc_id", "n_tokens",
      budget = 250L))
    // 25 docs x 50 tokens = 1250 per cluster = exactly 5 pure bins
    assert(ctx == 1.0, s"in-context purity $ctx")
    assert(byId <= 0.5, s"id-order purity $byId")
    // sharding splits BY CELL: a cluster never straddles shards
    val sharded = Packing.packInContext(docs, "doc_id", "n_tokens",
        "emb", centroids, budget = 250L, shards = 2)
      .groupBy("truth").agg(countDistinct("shard").as("n"))
      .select("n").as[Long].collect()
    assert(sharded.forall(_ == 1L), sharded.toSeq.toString)
  }

  test("packContiguousBy: appending a partition never moves earlier partitions' bins; the plain packer avalanches") {
    import spark.implicits._
    def assignments(df: org.apache.spark.sql.DataFrame) =
      Packing.packContiguousBy(df, "id", "toks", "part",
          budget = 300L, shards = 2)
        .select("id", "shard", "bin").as[(Long, Long, Long)]
        .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    def mk(maxId: Long) = (0L until maxId)
      .map(id => (id, 40L + (id % 5) * 13L, id / 50L))
      .toDF("id", "toks", "part")
    val before = assignments(mk(100))   // parts 0, 1
    val after = assignments(mk(150))    // part 2 appended
    // the incremental-maintenance property: every pre-existing doc
    // keeps its exact (shard, bin)
    assert(before.forall { case (id, sb) => after(id) == sb })
    // contrast: the PLAIN packer's running sum avalanches — inserting
    // one mid-corpus doc moves someone later in the same shard
    def plain(extra: Boolean) = {
      val ids = (0L until 200L by 2L) ++ (if (extra) Seq(99L) else Nil)
      Packing.packContiguous(ids.map(id => (id, 50L)).toDF("id", "toks"),
          "id", "toks", budget = 300L, shards = 1)
        .select("id", "bin").as[(Long, Long)].collect().toMap
    }
    val p0 = plain(false)
    val p1 = plain(true)
    assert((100L until 200L by 2L).exists(id => p0(id) != p1(id)),
      "expected the running-sum avalanche on the plain packer")
  }

  test("batchDistinctBy: no batch holds a group twice, groups never split shards, batches balanced, deterministic") {
    import spark.implicits._
    // skewed fixture: group sizes 1..25 with interleaved ids
    val rnd = new scala.util.Random(3)
    val rows = (0L until 400L).map(id => (id, (rnd.nextInt(30) + 1).toLong))
      .toDF("pair_id", "grp")
    val out = Packing.batchDistinctBy(rows, "pair_id", "grp",
        batchSize = 4, shards = 3)
      .select("pair_id", "grp", "shard", "stripe", "batch")
      .as[(Long, Long, Int, Long, Long)].collect()
    // the in-batch-negative property: a (shard, stripe, batch) triple
    // never contains the same group twice
    out.groupBy(r => (r._3, r._4, r._5)).foreach { case (b, rs) =>
      val gs = rs.map(_._2)
      assert(gs.distinct.length == gs.length, s"batch $b collides: $gs")
    }
    // a group lives in exactly one shard
    out.groupBy(_._2).foreach { case (g, rs) =>
      assert(rs.map(_._3).distinct.length == 1, s"group $g split shards")
    }
    // balance: within a (shard, stripe), only the LAST batch is short
    out.groupBy(r => (r._3, r._4)).foreach { case (_, rs) =>
      val sizes = rs.groupBy(_._5).toSeq.sortBy(_._1).map(_._2.length)
      assert(sizes.dropRight(1).forall(_ == 4), sizes.toString)
    }
    // deterministic under repartitioning
    val out2 = Packing.batchDistinctBy(rows.repartition(7), "pair_id",
        "grp", batchSize = 4, shards = 3)
      .select("pair_id", "grp", "shard", "stripe", "batch")
      .as[(Long, Long, Int, Long, Long)].collect()
    assert(out.sortBy(_._1).toSeq == out2.sortBy(_._1).toSeq)
  }

  test("histogram solvers fail loud on NULL sizes, naming the column") {
    import spark.implicits._
    // a NULL size would land in the histogram as getLong's 0 default
    // while the row-side lookup receives NULL — allocation key and
    // lookup key diverge, so the histogram pass rejects NULLs with
    // the column name instead (round-16 ADVICE)
    val docs = Seq((1L, Some(70L)), (2L, None), (3L, Some(50L)))
      .toDF("doc_id", "n_tokens")
    val e1 = intercept[IllegalArgumentException](
      Packing.packBestFit(docs, "doc_id", "n_tokens", 150L))
    assert(e1.getMessage.contains("n_tokens") &&
      e1.getMessage.contains("NULL"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException](
      Packing.batchByLength(docs, "doc_id", "n_tokens", 150L))
    assert(e2.getMessage.contains("n_tokens") &&
      e2.getMessage.contains("NULL"), e2.getMessage)
  }

  test("packBestFit: run-length solver equals an independent per-item best-fit greedy") {
    import spark.implicits._
    // reference: the literal BFD walk — items in (size DESC, id)
    // order, each to the bin with the SMALLEST remaining >= size
    // (ties to the lowest bin id), else a new bin; oversize items a
    // dedicated (never-reused) bin
    def refBfd(items: Seq[(Long, Long)], budget: Long): Map[Long, Long] = {
      val sorted = items.sortBy { case (id, sz) => (-sz, id) }
      val rem = scala.collection.mutable.ArrayBuffer[Long]()
      val out = scala.collection.mutable.Map[Long, Long]()
      sorted.foreach { case (id, sz) =>
        val s = math.max(sz, 1L)
        if (sz > budget) { rem += -1L; out(id) = rem.size - 1L }
        else {
          val fits = rem.zipWithIndex.filter(_._1 >= s)
          if (fits.isEmpty) { rem += (budget - s); out(id) = rem.size - 1L }
          else {
            val best = fits.map(_._1).min
            val i = fits.filter(_._1 == best).map(_._2).min
            rem(i) -= s
            out(id) = i.toLong
          }
        }
      }
      out.toMap
    }
    val fixtures: Seq[(Long, Seq[Long])] = Seq(
      // consecutive same-bin placements vs a tighter third bin
      100L -> Seq(70L, 60L, 40L, 30L, 30L, 25L, 25L, 25L, 10L, 10L,
        10L, 10L, 10L, 10L),
      // ties across equal remainings, exact fits
      10L -> Seq(7L, 7L, 3L, 3L, 3L, 2L, 2L, 1L, 1L, 1L),
      // oversize + zero-size in one walk
      12L -> Seq(13L, 11L, 11L, 6L, 6L, 6L, 5L, 4L, 0L, 1L, 1L),
      // dominant one-size class
      100L -> Seq.fill(17)(30L))
    fixtures.zipWithIndex.foreach { case ((budget, sizes), fi) =>
      val items = sizes.zipWithIndex.map { case (s, i) => ((i + 1).toLong, s) }
      val got = Packing.packBestFit(items.toDF("doc_id", "n_tokens"),
          "doc_id", "n_tokens", budget)
        .select("doc_id", "bin").as[(Long, Long)].collect().toMap
      assert(got == refBfd(items, budget),
        s"fixture $fi (budget $budget): $got vs ${refBfd(items, budget)}")
    }
  }

  test("batchByLength: run-length solver equals an independent item-walk greedy on cross-class handoff chains") {
    import spark.implicits._
    // reference implementation: the literal greedy the solver's
    // histogram run-length form must reproduce — walk items in
    // (size DESC, id) order, fill the single open batch to its
    // capacity (fixed at open time: budget div first-item size),
    // dedicated batches for oversize
    def refBatch(items: Seq[(Long, Long)],
                 budget: Long): Map[Long, (Long, Long)] = {
      val sorted = items.sortBy { case (id, sz) => (-sz, id) }
      var nb = -1L; var cap = 0L; var used = 0L; var pad = 0L
      val out = scala.collection.mutable.Map[Long, (Long, Long)]()
      sorted.foreach { case (id, sz) =>
        val s = math.max(sz, 1L)
        if (s > budget) { nb += 1; out(id) = (nb, s); cap = 0; used = 0 }
        else if (used < cap) { used += 1; out(id) = (nb, pad) }
        else { nb += 1; pad = s; cap = budget / s; used = 1
               out(id) = (nb, pad) }
      }
      out.toMap
    }
    val fixtures: Seq[(Long, Seq[Long])] = Seq(
      // cross-class handoff CHAIN: the 30-batch takes two 10s
      100L -> (Seq(60L, 30L) ++ Seq.fill(5)(10L)),
      // single dominant class with an open tail
      100L -> Seq.fill(23)(10L),
      // oversize ahead of everything; exact-fit classes
      7L -> (Seq(9L, 9L) ++ Seq.fill(4)(3L) ++ Seq.fill(3)(2L)),
      // handoff into a class that itself reopens twice
      100L -> (Seq(40L) ++ Seq.fill(2)(35L) ++ Seq.fill(3)(20L)),
      // zero/negative sizes place as 1 and sort after positives
      10L -> Seq(5L, 0L, -2L, 3L, 3L, 3L))
    fixtures.zipWithIndex.foreach { case ((budget, sizes), fi) =>
      val items = sizes.zipWithIndex.map { case (s, i) => ((i + 1).toLong, s) }
      val got = Packing.batchByLength(items.toDF("doc_id", "n_tokens"),
          "doc_id", "n_tokens", budget)
        .select("doc_id", "batch", "pad_len").as[(Long, Long, Long)]
        .collect().map(r => r._1 -> ((r._2, r._3))).toMap
      assert(got == refBatch(items, budget),
        s"fixture $fi (budget $budget): $got vs ${refBatch(items, budget)}")
    }
  }

  test("positionIds: positions reset at every doc boundary, separator takes its own doc's last slot, empty-array docs span 1") {
    import spark.implicits._
    val packed = Seq(
      (1L, Seq(10L, 11L, 12L), 0, 0L),
      (2L, Seq.empty[Long], 0, 0L),      // empty doc -> just its sep, span 1
      (3L, Seq(30L, 31L), 0, 0L))
      .toDF("doc_id", "token_ids", "shard", "bin")
    val seqs = Packing.assembleTokenSequences(packed, "doc_id",
      "token_ids", orderCol = "doc_id")
    val got = Packing.positionIds(seqs)
      .select("position_ids", "sequence").as[(Seq[Long], Seq[Long])].head()
    // docs span 4, 1, 3: positions restart at each boundary
    assert(got._1 == Seq(0L, 1L, 2L, 3L, 0L, 0L, 1L, 2L), got.toString)
    assert(got._1.size == got._2.size, "positions must cover the sequence")
  }

  test("fertilityTelemetry: geometry-derived tokens (sep excluded), exact floor ratios, NULL on zero denominators") {
    import spark.implicits._
    val packed = Seq(
      (1L, Seq(7L, 8L, 9L), 0, 0L),   // 3 tokens
      (2L, Seq(5L), 0, 0L),           // 1 token
      (3L, Seq(4L, 4L), 0, 1L))       // 2 tokens
      .toDF("doc_id", "token_ids", "shard", "bin")
    val seqs = Packing.assembleTokenSequences(packed, "doc_id",
      "token_ids", orderCol = "doc_id")
    val meta = Seq(
      (1L, "a", 10L, 2L, 12L),
      (2L, "a", 5L, 1L, 5L),
      (3L, "b", 0L, 0L, 0L)) // zero denominators -> NULL ratios
      .toDF("doc_id", "src", "n_chars", "n_words", "n_bytes")
    val got = Packing.fertilityTelemetry(seqs, meta, "doc_id", "src",
        "n_chars", "n_words", "n_bytes")
      .collect().map(r => r.getString(0) -> r).toMap
    val a = got("a")
    // a: 4 tokens (sep excluded), 15 chars, 3 words, 17 bytes:
    // 4000 div 15 = 266, 4000 div 3 = 1333, 17000 div 4 = 4250
    assert(a.getLong(1) == 2L && a.getLong(2) == 4L, a.toString)
    assert(a.getLong(3) == 266L && a.getLong(4) == 1333L &&
      a.getLong(5) == 4250L, a.toString)
    val b = got("b")
    assert(b.getLong(2) == 2L && b.isNullAt(3) && b.isNullAt(4) &&
      b.getLong(5) == 0L, b.toString)
    // geometry, not re-tokenization: corrupting an offset shifts the
    // per-doc split but conserves the group totals only if the docs
    // stay in one group — across groups the fertility MOVES
    val corrupted = seqs.withColumn("offsets",
      transform(col("offsets"), (o, i) => when(i === 1, o + 1L).otherwise(o)))
    val g2 = Packing.fertilityTelemetry(corrupted, meta, "doc_id", "src",
        "n_chars", "n_words", "n_bytes")
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(g2("a") == 4L, s"single-group corruption conserves: $g2")
    val meta2 = meta.withColumn("src",
      when(col("doc_id") === 2L, lit("c")).otherwise(col("src")))
    val g3 = Packing.fertilityTelemetry(corrupted, meta2, "doc_id", "src",
        "n_chars", "n_words", "n_bytes")
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    // doc1's true count is 3; the corrupted offset hands it doc2's
    // stolen token — the ledger reports the artifact, not the truth
    assert(g3("a") == 4L && g3("c") == 0L,
      s"cross-group corruption must shift fertility: $g3")
  }

  test("multimodal assembly: pack-order refs, slot table positions, image attribution from geometry") {
    import spark.implicits._
    val IM = Multimodal.ImagePlaceholderId
    // doc1: [7, IM, 8] with one ref; doc2: [IM, 5, IM] with two refs;
    // doc3: text-only — same bin, pack order 1,2,3
    val packed = Seq(
      (1L, Seq(7L, IM, 8L), Seq("r1a"), 0, 0L),
      (2L, Seq(IM, 5L, IM), Seq("r2a", "r2b"), 0, 0L),
      (3L, Seq(9L), Seq.empty[String], 0, 0L))
      .toDF("doc_id", "token_ids", "image_refs", "shard", "bin")
    val seqs = Packing.assembleMultimodalSequences(packed, "doc_id",
      "token_ids", "image_refs", orderCol = "doc_id")
    val r = seqs.select("sequence", "offsets", "image_refs")
      .as[(Seq[Long], Seq[Long], Seq[String])].head()
    // sequence: 7 IM 8 0 | IM 5 IM 0 | 9 0 — refs flatten in pack order
    assert(r._1 == Seq(7L, IM, 8L, 0L, IM, 5L, IM, 0L, 9L, 0L), r._1)
    assert(r._2 == Seq(0L, 4L, 8L) && r._3 == Seq("r1a", "r2a", "r2b"))
    // the lookaside table: slot ordinal -> 0-based sequence position
    // -> ref, exactly aligned
    val slots = Packing.imageSlotTable(seqs)
      .select("slot", "position", "image_ref")
      .as[(Int, Int, String)].collect().sortBy(_._1).toSeq
    assert(slots == Seq((0, 1, "r1a"), (1, 4, "r2a"), (2, 6, "r2b")),
      slots.toString)
    // a slot/ref count MISMATCH surfaces as a NULL field, never a
    // silent truncation
    val bad = Packing.assembleMultimodalSequences(
      Seq((1L, Seq(IM, IM), Seq("only_one"), 0, 0L))
        .toDF("doc_id", "token_ids", "image_refs", "shard", "bin"),
      "doc_id", "token_ids", "image_refs", orderCol = "doc_id")
    val badSlots = Packing.imageSlotTable(bad)
      .select("position", "image_ref").collect()
    assert(badSlots.length == 2 && badSlots.count(_.isNullAt(1)) == 1,
      badSlots.mkString(","))
    // image attribution from the landed geometry: slots count within
    // each doc's own offset span
    val meta = Seq((1L, "a"), (2L, "b"), (3L, "a")).toDF("doc_id", "grp")
    val att = Packing.sequenceAttribution(seqs, meta, "doc_id", "grp",
        imageId = Some(IM))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // a: docs 1 (3 ids + sep, 1 slot) + 3 (1 id + sep, 0 slots);
    // b: doc 2 (3 ids + sep, 2 slots)
    assert(att == Map("a" -> (2L, 6L, 1L), "b" -> (1L, 4L, 2L)),
      att.toString)
    // without imageId the ledger keeps its unimodal 3-column schema
    assert(Packing.sequenceAttribution(seqs, meta, "doc_id", "grp")
      .columns.toSeq == Seq("grp", "n_docs", "n_tokens_with_sep"))
  }
}
