package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LangModelSpec extends SparkSpec {
  import spark.implicits._

  test("bigram LM matches a hand-computed reference on a tiny corpus") {
    // corpus: "a b a b" + "a b c" → bigrams: (a,b)x3, (b,a)x1, (b,c)x1
    // ctx: a→3, b→2;  V = 3 (a, b, c)
    val docs = Seq((1L, "a b a b"), (2L, "a b c")).toDF("doc_id", "text")
    val got = LangModel.perplexityScore(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    def c(cnt: Long, ctx: Long) =
      math.round(math.log((cnt + 1.0) / (ctx + 3.0)) * 1e6)
    val ab = c(3, 3); val ba = c(1, 2); val bc = c(1, 2)
    val d1 = 2 * ab + ba // doc 1: (a,b) twice + (b,a)
    val d2 = ab + bc
    def avg(s: Long, n: Long) =
      BigDecimal(s / 1e6 / n).setScale(4, BigDecimal.RoundingMode.HALF_UP)
        .toDouble
    assert(got(1L) == ((3L, d1, avg(d1, 3))), s"got ${got(1L)}")
    assert(got(2L) == ((2L, d2, avg(d2, 2))), s"got ${got(2L)}")
  }

  test("scoring a disjoint corpus floors unseen bigrams and contexts, short docs drop") {
    val train = Seq((1L, "a b a b"), (2L, "a b c")).toDF("doc_id", "text")
    val occ = LangModel.docBigramOcc(train, "doc_id", "text")
    val big = LangModel.bigramCounts(occ)
    val probe = Seq((10L, "a b"), (11L, "x y"), (12L, "b z"), (13L, "solo"))
      .toDF("doc_id", "text")
    val got = LangModel.scoreFromModel(
        LangModel.docBigramOcc(probe, "doc_id", "text"), big,
        LangModel.contextCounts(big), LangModel.vocabStats(train, "text"))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    def c(cnt: Long, ctx: Long) =
      math.round(math.log((cnt + 1.0) / (ctx + 3.0)) * 1e6)
    assert(got(10L) == c(3, 3))          // seen bigram (a,b): cnt 3, ctx 3
    assert(got(11L) == c(0, 0))          // unseen context: ln(1/V)
    assert(got(12L) == c(0, 2))          // seen context, unseen bigram
    assert(!got.contains(13L))           // single-token doc: no bigrams
  }

  test("persisted model tables serve the one-shot answer identically") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .filter($"doc_id" < 50)
    val (bigT, ctxT, vocT) =
      ("graft_test_lm_big", "graft_test_lm_ctx", "graft_test_lm_voc")
    Seq(bigT, ctxT, vocT).foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    try {
      LangModel.ensureBigramTables(spark, docs, "doc_id", "text",
        bigT, ctxT, vocT)
      val served = LangModel.scoreFromModel(
          LangModel.docBigramOcc(docs, "doc_id", "text"),
          spark.table(bigT), spark.table(ctxT), spark.table(vocT))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val oneShot = LangModel.perplexityScore(docs, "doc_id", "text")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(served == oneShot)
      // idempotent re-ensure is a no-op (table existence keys the build)
      LangModel.ensureBigramTables(spark, docs, "doc_id", "text",
        bigT, ctxT, vocT)
      assert(spark.table(bigT).count() > 0)
    } finally
      Seq(bigT, ctxT, vocT).foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  test("perplexityBuckets: per-language head/middle/tail by rank, identical texts share a bucket") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .filter($"doc_id" < 90).select("doc_id", "text", "lang")
    val got = LangModel.perplexityBuckets(docs, "doc_id", "text", "lang")
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("lang"),
        r.getAs[Double]("avg_logprob"), r.getAs[Int]("bucket")))
    assert(got.nonEmpty)
    // reference: per-lang rank cut on the same rounded score,
    // value-block granular
    val byLang = got.groupBy(_._2)
    byLang.foreach { case (lang, rows) =>
      val n = rows.length.toLong
      val histo = rows.groupBy(_._3).map { case (s, rs) => s -> rs.length.toLong }
      val orderedVals = histo.keys.toSeq.sortBy(-_)
      var lo = 0L
      val expected = orderedVals.map { v =>
        val b = (lo * 3 / n).toInt; lo += histo(v); v -> b
      }.toMap
      rows.foreach { case (id, _, s, b) =>
        assert(b == expected(s), s"doc $id lang $lang score $s: " +
          s"bucket $b != ${expected(s)}")
      }
      // every doc with the same score shares the bucket by construction
      assert(rows.groupBy(_._3).values.forall(_.map(_._4).distinct.size == 1))
    }
    // buckets are rank-ordered: no head doc scores below a tail doc
    var sawTail = false
    byLang.foreach { case (_, rows) =>
      val head = rows.filter(_._4 == 0).map(_._3)
      val tail = rows.filter(_._4 == 2).map(_._3)
      if (head.nonEmpty && tail.nonEmpty) {
        sawTail = true
        assert(head.min >= tail.max)
      }
    }
    assert(sawTail, "fixture too degenerate: no language produced a tail")
  }

  test("degenerate smoothing rejected") {
    val docs = Seq((1L, "a b")).toDF("doc_id", "text")
    val occ = LangModel.docBigramOcc(docs, "doc_id", "text")
    val big = LangModel.bigramCounts(occ)
    intercept[IllegalArgumentException](
      LangModel.scoreFromModel(occ, big, LangModel.contextCounts(big),
        LangModel.vocabStats(docs, "text"), k = 0.0))
  }
}
