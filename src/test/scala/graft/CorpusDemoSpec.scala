package graft

import org.apache.spark.sql.functions._

/** E2E composition spec for the training-data curation slice: raw
  * corpus → refined → scrubbed → chunked → packed shards, with
  * invariants that reconcile across stages. */
class CorpusDemoSpec extends SparkSpec {

  test("corpus demo: curation slice lands shards with consistent invariants") {
    val out = graft.sources.Scratch.dir("graft-curate").toString
    val r = CorpusDemo.run(spark, "/root/testdata/sf0.001", out,
      chunkTokens = 50, stride = 40, budgetTokens = 2000L, shards = 4)

    // gates + dedup only ever shrink the corpus; something must survive
    assert(r.survivors > 0 && r.survivors <= r.inputDocs)
    // every chunk respects the window size, carries text, and parses
    val shardsDf = spark.read.parquet(s"$out/shards")
    assert(shardsDf.count() == r.chunks && r.chunks > 0)
    assert(shardsDf.filter(col("n_tokens") > 50 || col("n_tokens") < 1).count() == 0)
    // no unscrubbed PII pattern survives into the shards
    assert(shardsDf.filter(
      col("chunk").rlike(graft.functions.Text.EmailRe)).count() == 0)
    // packing is total and bin-local: every chunk has a shard and bin,
    // shards partition the id space deterministically
    assert(shardsDf.filter(col("shard").isNull || col("bin").isNull).count() == 0)
    assert(shardsDf.select("shard").distinct().count() <= 4)
    // document contiguity: every chunk of a doc lands in one shard
    assert(shardsDf.groupBy("doc_id")
      .agg(countDistinct(col("shard")).as("s")).filter(col("s") > 1).count() == 0)
    // shard dirs are physically partitioned for per-shard reads
    val dirs = new java.io.File(s"$out/shards").listFiles()
      .filter(_.isDirectory).map(_.getName)
    assert(dirs.nonEmpty && dirs.forall(_.startsWith("shard=")))
    // the per-shard report reconciles with the landed data
    val reportTotal = r.report.agg(sum("n_chunks")).collect().head.getLong(0)
    assert(reportTotal == r.chunks)

    // the post-landing takedown reconciles three ways: receipts sum to
    // the purged docs (the two rule cohorts are disjoint), the cascade
    // removed exactly the purged docs' chunks, and zero-matched rules
    // would still file a receipt row
    val receipts = r.takedownReceipts.collect()
      .map(row => (row.getString(0), row.getLong(2))).toMap
    assert(receipts.keySet == Set("host", "domain"))
    assert(receipts.values.sum == r.takedownRemovedDocs,
      s"receipts $receipts must reconcile with ${r.takedownRemovedDocs}")
    assert(r.takedownRemovedDocs > 0, "the site3/site4 cohorts exist")
    val purgedChunks = shardsDf
      .filter(pmod(col("doc_id"), lit(20)).isin(3, 4)).count()
    assert(r.chunksAfterTakedown == r.chunks - purgedChunks,
      "the cascade drops exactly the purged docs' chunks")

    // the TRAINER FEED reconciles: the CCNet tail gate dropped a
    // nonzero strict subset of survivors (each language loses ~its
    // worst-scored third), FIM transformed a strict subset of the
    // gated feed (the hash gate takes ~half, never all or none at
    // this size), every GATED survivor packed into exactly ONE token
    // sequence (doc conservation through gate→tokenize→pack→
    // assemble), sequences landed and the manifest re-audit is clean
    assert(r.pplTailDropped > 0 && r.pplTailDropped < r.survivors,
      s"CCNet gate: ${r.pplTailDropped} of ${r.survivors}")
    val gated = r.survivors - r.pplTailDropped
    assert(r.fimTransformed > 0 && r.fimTransformed < gated,
      s"FIM gate: ${r.fimTransformed} of $gated")
    assert(r.tokenSequences > 0 && r.tokenAuditOk)
    assert(r.tokenSeqDocs == gated,
      s"token-shard docs ${r.tokenSeqDocs} must conserve the gated feed $gated")
    val seqDf = spark.read.parquet(s"$out/token_shards")
    // offsets align with n_docs, sequences are EOS-terminated integer
    // arrays sized seq_tokens, and every sequence row is recoverable
    // from its manifest-audited shard layout
    assert(seqDf.filter(size(col("offsets")) =!= col("n_docs")).count() == 0)
    assert(seqDf.filter(size(col("sequence")) =!= col("seq_tokens")).count() == 0)
    assert(seqDf.filter(element_at(col("sequence"), -1) =!=
      graft.operators.Bpe.SepId).count() == 0,
      "every packed sequence ends with the EOS separator")
    // position_ids ride the export: same length as the sequence, and
    // they reset to 0 exactly at each doc's landed offset
    assert(seqDf.filter(size(col("position_ids")) =!= col("seq_tokens"))
      .count() == 0)
    assert(seqDf.filter(not(forall(col("offsets"), o =>
      element_at(col("position_ids"), (o + 1).cast("int")) === 0L)))
      .count() == 0,
      "positions must reset to 0 at every landed doc offset")
  }

  test("trainerFeed on an EMPTY corpus lands zeros and audits clean, never a crash") {
    import spark.implicits._
    // a corpus where every doc failed the refine gates: the export
    // writes no shard subtrees at all (partitioned writes emit no
    // files for absent partitions) — the round-13 ADVICE empty-corpus
    // path, closed at the read-back layer, not just the NULL sum
    val out = graft.sources.Scratch.dir("graft_cd_empty").toString
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val feed = CorpusDemo.trainerFeed(spark, empty, out)
    assert(feed == CorpusDemo.TrainerFeed(0L, 0L, 0L, true), feed.toString)
  }
}
