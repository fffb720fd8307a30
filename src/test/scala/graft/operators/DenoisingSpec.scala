package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DenoisingSpec extends SparkSpec {
  import spark.implicits._

  private val S = 1000000L

  /** Independent imperative reference of the deterministic T5 span
    * corruption (same public rule, written separately). */
  private def ref(id: Long, toks: Seq[Long]): (Seq[Long], Seq[Long]) = {
    val n = toks.length.toLong
    val nNoise = math.min((n * 15 + 50) / 100, n)
    val nSpans = if (nNoise > 0) math.max((nNoise * 2 + 3) / 6, 1L) else 0L
    if (nSpans == 0) return (toks, Seq.empty)
    val seg = n / nSpans
    val base = nNoise / nSpans
    val rem = nNoise % nSpans
    val spans = (0L until nSpans).map { k =>
      val len = math.min(base + (if (k < rem) 1L else 0L), seg)
      val h = (id * 1103515245L + 12345L + k * 2654435761L) % 2147483647L
      val start = k * seg + h % (seg - len + 1)
      (k, start, len)
    }
    val in = Seq.newBuilder[Long]
    var pos = 0L
    spans.foreach { case (k, st, len) =>
      in ++= toks.slice(pos.toInt, st.toInt)
      in += S + k
      pos = st + len
    }
    in ++= toks.slice(pos.toInt, n.toInt)
    val tgt = spans.flatMap { case (k, st, len) =>
      (S + k) +: toks.slice(st.toInt, (st + len).toInt)
    } :+ (S + nSpans)
    (in.result(), tgt)
  }

  /** Splice each target span back over its sentinel — must reproduce
    * the original ids exactly (the lossless-objective invariant). */
  private def splice(in: Seq[Long], tgt: Seq[Long]): Seq[Long] = {
    val spans = scala.collection.mutable.Map.empty[Long, Seq[Long]]
    var cur = -1L
    val buf = scala.collection.mutable.ArrayBuffer.empty[Long]
    tgt.foreach { id =>
      if (id >= S) {
        if (cur >= 0) spans(cur) = buf.toSeq
        cur = id - S; buf.clear()
      } else buf += id
    }
    in.flatMap(id => if (id >= S) spans.getOrElse(id - S, Seq.empty)
                     else Seq(id))
  }

  private def run(rows: Seq[(Long, Seq[Long])]) =
    Denoising.spanCorrupt(rows.toDF("doc_id", "token_ids"),
        "doc_id", "token_ids", sentinelBase = S)
      .select("doc_id", "input_ids", "target_ids")
      .as[(Long, Seq[Long], Seq[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap

  test("spanCorrupt equals the independent reference; splice reconstruction is exact") {
    val rnd = new scala.util.Random(7)
    val rows = (0L until 60L).map { id =>
      id -> Seq.fill(rnd.nextInt(300))(rnd.nextLong(1000).abs)
    }
    val got = run(rows)
    rows.foreach { case (id, toks) =>
      val (wi, wt) = ref(id, toks)
      val (gi, gt) = got(id)
      assert(gi == wi && gt == wt, s"doc $id")
      // invariants: sizes and lossless splice
      val n = toks.length.toLong
      val nNoise = math.min((n * 15 + 50) / 100, n)
      val nSpans = if (nNoise > 0) math.max((nNoise * 2 + 3) / 6, 1L) else 0L
      assert(gi.length == n - nNoise + nSpans, s"doc $id input size")
      assert(gt.length ==
        (if (nSpans > 0) nNoise + nSpans + 1 else 0), s"doc $id target size")
      assert(splice(gi, gt) == toks, s"doc $id splice")
    }
  }

  test("degenerate docs: empty/NULL/tiny arrays pass through uncorrupted") {
    val tiny = run(Seq(
      (1L, Seq.empty[Long]), (2L, Seq(9L)), (3L, Seq(9L, 8L, 7L))))
    assert(tiny(1L) == ((Seq.empty, Seq.empty)))
    assert(tiny(2L) == ((Seq(9L), Seq.empty)))   // round(0.45) = 0 noise
    assert(tiny(3L) == ((Seq(9L, 8L, 7L), Seq.empty)))
    val n = Denoising.spanCorrupt(
        Seq((4L, Option.empty[Seq[Long]])).toDF("doc_id", "token_ids"),
        "doc_id", "token_ids", sentinelBase = S)
      .select("input_ids", "target_ids", "n_input", "n_target")
      .as[(Seq[Long], Seq[Long], Long, Long)].head()
    assert(n == ((Seq.empty, Seq.empty, 0L, 0L)))
  }

  test("prefixLmSplit: final-quarter target, at-least-one-token floor, sentinel grammar, degenerate docs") {
    def runP(rows: Seq[(Long, Seq[Long])]) =
      Denoising.prefixLmSplit(rows.toDF("doc_id", "token_ids"),
          "doc_id", "token_ids", sentinelBase = S)
        .select("doc_id", "input_ids", "target_ids")
        .as[(Long, Seq[Long], Seq[Long])].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
    val got = runP(Seq(
      (1L, (1L to 8L).toSeq),   // n=8: target = last 2
      (2L, Seq(5L)),            // n=1: floor -> the whole doc is target
      (3L, (1L to 5L).toSeq),   // n=5: 5//4 = 1 -> target last 1
      (4L, Seq.empty[Long])))
    assert(got(1L) == (((1L to 6L) :+ S, Seq(S, 7L, 8L, S + 1))))
    assert(got(2L) == ((Seq(S), Seq(S, 5L, S + 1))))
    assert(got(3L) == (((1L to 4L) :+ S, Seq(S, 5L, S + 1))))
    assert(got(4L) == ((Seq.empty, Seq.empty)))
    // splice invariant holds for the prefix-LM grammar too
    got.filter(_._2._1.nonEmpty).foreach { case (id, (in, tgt)) =>
      assert(splice(in, tgt) == (in.dropRight(1) ++
        tgt.drop(1).dropRight(1)), s"doc $id")
    }
  }

  test("corruption is a pure function of (id, tokens): repartitioning changes nothing; ids diverge corruption") {
    val toks = (1L to 50L).toSeq
    val a = run(Seq((10L, toks), (11L, toks)))
    val b = Denoising.spanCorrupt(
        Seq((10L, toks), (11L, toks)).toDF("doc_id", "token_ids")
          .repartition(7),
        "doc_id", "token_ids", sentinelBase = S)
      .select("doc_id", "input_ids", "target_ids")
      .as[(Long, Seq[Long], Seq[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(a == b)
    // same tokens, different ids -> different span placement (the
    // LCG seed is the id)
    assert(a(10L) != a(11L))
  }
}
