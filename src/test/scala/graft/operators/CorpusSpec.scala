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
}
