package graft

import org.apache.spark.sql.functions._

/** [[MultimodalDemo]] composition: the counts must reconcile end to
  * end — every payload decodes, every injected clone is found in its
  * own modality, and the export audits clean. */
class MultimodalDemoSpec extends SparkSpec {

  test("media in == fingerprinted; clones all pair; export audits ok") {
    val out = java.nio.file.Files.createTempDirectory("graft_mm_spec").toString
    val r = MultimodalDemo.run(spark, "/root/testdata/sf0.001", out,
      cloneEvery = 10)
    val nDocs = graft.sources.Tables.load(spark, "/root/testdata/sf0.001",
      "documents").count()
    val nClones = graft.sources.Tables.load(spark, "/root/testdata/sf0.001",
        "documents").filter(pmod(col("doc_id"), lit(10)) === 0).count()
    assert(r.inputMedia == nDocs + nClones, s"synthesis drifted: $r")
    // every payload decodes into exactly one modality's fingerprints
    assert(r.images + r.audio == r.inputMedia, s"a payload failed to decode: $r")
    // at least one pair per injected clone (its base), clones always
    // the larger id so they all drop; coincidental same-texture pairs
    // may drop a few bases too — survivors is bounded both ways
    assert(r.dupPairs >= nClones, s"missed clone pairs: $r (expected >= $nClones)")
    assert(r.survivors <= r.inputMedia - nClones, s"a clone survived: $r")
    assert(r.survivors > 0, s"everything dropped: $r")
    assert(r.auditOk, s"export audit failed: $r")
  }
}
