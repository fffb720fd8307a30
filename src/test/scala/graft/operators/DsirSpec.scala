package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** DSIR importance scoring behind q89: the gram kernel matches an
  * independent reimplementation, the fitted scores match a driver-side
  * recount under the exact formula, scoring is an exact integer (so
  * repartitioning can't move it), and target-like documents outscore
  * source-typical ones.
  */
class DsirSpec extends SparkSpec {
  import spark.implicits._

  /** Independent gram-bucket reference: split on the regex-\s set,
    * lowercase, hash unigrams and "w1 w2" bigram STRINGS through the
    * same public recipe (FNV-1a then mix64) — but via string building
    * rather than the kernel's single-pass char walk. */
  private def refBuckets(text: String, dim: Int): Seq[Int] = {
    if (text == null) return Seq.empty
    def fnv(s: String): Long = {
      var h = 0xcbf29ce484222325L
      s.foreach { c => h ^= Character.toLowerCase(c).toLong; h *= 0x100000001b3L }
      h
    }
    val toks = text.split("\\s+").filter(_.nonEmpty)
    val uni = toks.map(t => (Sketches.mix64(fnv(t)) & (dim - 1)).toInt)
    val big = toks.sliding(2).filter(_.length == 2)
      .map(p => (Sketches.mix64(fnv(p(0) + " " + p(1))) & (dim - 1)).toInt).toSeq
    // kernel order: each token's unigram, then the bigram ending at it
    toks.indices.flatMap { i =>
      if (i == 0) Seq(uni(i)) else Seq(uni(i), big(i - 1))
    }
  }

  test("gramBuckets equals the string-built reference, multiplicity and order included") {
    val dim = 4096
    val samples = Seq(
      "the quick brown fox", "one", "", "  spaced   out\ttokens\n",
      "repeat repeat repeat", "MiXeD Case TOKENS", null,
      "a b a b a", "tab\tsep\nnl")
    samples.foreach { s =>
      assert(Dsir.gramBuckets(s, dim).toSeq == refBuckets(s, dim),
        s"kernel diverged on '$s'")
    }
  }

  test("fit + score matches a driver-side recount of the exact formula") {
    val dim = 256
    val target = Seq("good clean prose here", "clean prose again").toDF("text")
    val source = Seq(
      (1L, "good clean prose here"), (2L, "clean prose again"),
      (3L, "spam junk words now"), (4L, "junk junk spam now"),
      (5L, "")).toDF("doc_id", "text")
    val lr = Dsir.fitLogRatioMicro(target, source.select("text"), "text", dim)

    // independent recount: distributions and quantized ratios rebuilt
    // from refBuckets, scores summed per doc
    def cnt(texts: Seq[String]): Map[Int, Long] =
      texts.flatMap(refBuckets(_, dim)).groupBy(identity)
        .map { case (b, xs) => b -> xs.size.toLong }
    val tc = cnt(Seq("good clean prose here", "clean prose again"))
    val sc = cnt(Seq("good clean prose here", "clean prose again",
      "spam junk words now", "junk junk spam now", ""))
    val lnT = math.log(tc.values.sum + dim.toDouble)
    val lnS = math.log(sc.values.sum + dim.toDouble)
    val refLr = Array.tabulate(dim) { b =>
      val v = math.log(tc.getOrElse(b, 0L) + 1.0) - lnT -
        math.log(sc.getOrElse(b, 0L) + 1.0) + lnS
      math.floor(v * 1e6 + 0.5).toLong
    }
    assert(lr.toSeq == refLr.toSeq, "fitted micro ratio table diverged")

    val got = Dsir.importanceScoreMicro(source, "doc_id", "text", lr)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    Seq((1L, "good clean prose here"), (2L, "clean prose again"),
      (3L, "spam junk words now"), (4L, "junk junk spam now"), (5L, ""))
      .foreach { case (id, text) =>
        val bs = refBuckets(text, dim)
        assert(got(id) == ((bs.size.toLong, bs.map(refLr(_)).sum)),
          s"doc $id score diverged")
      }
    // target-member docs outscore source-only docs
    assert(Seq(1L, 2L).map(got(_)._2).min > Seq(3L, 4L).map(got(_)._2).max,
      "importance ratio failed to separate target-like from source-only docs")
  }

  test("scores are exact integers: invariant under repartitioning; degenerate dims rejected") {
    val docs = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val lr = Dsir.fitLogRatioMicro(
      docs.filter(col("source") === "src0").select("text"),
      docs.select("text"), "text", dim = 1024)
    val a = Dsir.importanceScoreMicro(docs, "doc_id", "text", lr)
      .collect().map(_.toString).sorted.toSeq
    val b = Dsir.importanceScoreMicro(docs.repartition(13), "doc_id", "text", lr)
      .collect().map(_.toString).sorted.toSeq
    assert(a == b, "integer scores moved under repartitioning")
    intercept[IllegalArgumentException](Dsir.bucketCounts(docs, "text", 100))
    intercept[IllegalArgumentException](
      Dsir.importanceScoreMicro(docs, "doc_id", "text", new Array[Long](100)))
    // the scoring plan is one narrow pass — no join, one exchange at most
    val p = Dsir.importanceScoreMicro(docs, "doc_id", "text", lr)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Join"), "scoring grew a join:\n" + p.take(800))
  }

  test("jsDivergencePico: identical slices are exactly zero; symmetry; bounds") {
    import spark.implicits._
    val a = Seq("alpha beta gamma", "beta gamma delta", "x y z").toDF("text")
    val b = Seq("epsilon zeta", "eta theta iota kappa").toDF("text")
    def row(x: org.apache.spark.sql.DataFrame) = {
      val r = x.head()
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    }
    // identical slices: every bucket has ma == mb, ln(1) == 0 exactly
    val same = row(Dsir.jsDivergencePico(a, a, "text", 256))
    assert(same._3 == 0L && same._4 == 0L && same._5 == 0L,
      s"identical slices must diverge by exactly zero, got $same")
    // symmetry: swapping slices swaps the KL halves, js2 invariant
    val ab = row(Dsir.jsDivergencePico(a, b, "text", 256))
    val ba = row(Dsir.jsDivergencePico(b, a, "text", 256))
    assert(ab._3 == ba._4 && ab._4 == ba._3 && ab._5 == ba._5,
      s"JS must be symmetric: $ab vs $ba")
    // disjoint vocabularies drift hard but never past 2·ln2 (+ dim/2
    // quantization slack); totals count grams with multiplicity
    assert(ab._5 > 0L && ab._5 <= (2 * math.log(2) * 1e12).toLong + 256,
      s"js2 out of [0, 2·ln2] pico-nats: $ab")
    // 3 docs × (3 uni + 2 bi) = 15; (2+1) + (4+3) = 10
    assert(ab._1 == 15L && ab._2 == 10L,
      s"gram totals (uni+bigram multiplicity) wrong: $ab")
  }

  test("jsDivergencePico: integer result is partition-independent") {
    val docs = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val en = docs.filter(col("lang") === "en").select("text")
    val rest = docs.filter(col("lang") =!= "en").select("text")
    val one = Dsir.jsDivergencePico(en, rest, "text", 1024).head().toSeq
    val other = Dsir.jsDivergencePico(en.repartition(11), rest.repartition(7),
      "text", 1024).head().toSeq
    assert(one == other, s"drift integers moved under repartitioning: $one vs $other")
    // KL(P||M) >= 0 mathematically; the quantized integer sum can sit
    // at most dim/2 pico below it
    assert(one.drop(2).forall(_.asInstanceOf[Long] >= -512L),
      s"KL halves must be non-negative within quantization slack: $one")
  }

  test("bucketCountsBy state merges: split-and-sum == one-shot; FromCounts == text form") {
    val docs = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val dim = 1024
    // merge algebra: per-(group, bucket) counts of two halves ADD to
    // the one-shot counts — the streaming-state invariant
    val whole = Dsir.bucketCountsBy(docs, "lang", "text", dim)
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    val h1 = Dsir.bucketCountsBy(docs.filter(col("doc_id") % 2 === 0), "lang", "text", dim)
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    val h2 = Dsir.bucketCountsBy(docs.filter(col("doc_id") % 2 === 1), "lang", "text", dim)
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    val summed = (h1.keySet ++ h2.keySet).map(k =>
      k -> (h1.getOrElse(k, 0L) + h2.getOrElse(k, 0L))).toMap
    assert(summed == whole, "split counts failed to add up to the one-shot state")
    // the counts-serve path equals the text path bit-for-bit
    val en = docs.filter(col("lang") === "en").select("text")
    val rest = docs.filter(col("lang") =!= "en").select("text")
    val viaText = Dsir.jsDivergencePico(en, rest, "text", dim).head().toSeq
    val viaCounts = Dsir.jsDivergencePicoFromCounts(
      Dsir.bucketCounts(en, "text", dim),
      Dsir.bucketCounts(rest, "text", dim), dim).head().toSeq
    assert(viaText == viaCounts, s"serve paths diverged: $viaText vs $viaCounts")
  }

  test("jsDriftMatrixPico: every cell equals the two-slice call bit-for-bit") {
    val docs = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val dim = 512
    val counts = Dsir.bucketCountsBy(docs, "lang", "text", dim)
    val matrix = Dsir.jsDriftMatrixPico(counts, "lang", dim)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val langs = docs.select("lang").distinct()
      .collect().map(_.getString(0)).sorted
    assert(matrix.size == langs.size * (langs.size - 1) / 2,
      s"matrix shape wrong: ${matrix.size} cells for ${langs.size} groups")
    for (Array(la, lb) <- langs.combinations(2)) {
      val direct = Dsir.jsDivergencePicoFromCounts(
        counts.filter(col("lang") === la).select("bucket", "cnt"),
        counts.filter(col("lang") === lb).select("bucket", "cnt"), dim)
        .head().getLong(4)
      assert(matrix((la, lb)) == direct,
        s"cell ($la, $lb): matrix ${matrix((la, lb))} != direct $direct")
    }
  }
}
