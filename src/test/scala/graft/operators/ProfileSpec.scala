package graft.operators

import graft.SparkSpec

/** Profile semantics behind q81: the metrics match hand-computed
  * truth on a fixture with known nulls/duplicates, and the whole
  * profile is one job over the data.
  */
class ProfileSpec extends SparkSpec {
  import spark.implicits._

  test("profile reports exact n/nulls/distinct/min/max per column") {
    val df = Seq(
      (Some(3L), Some("b")), (Some(1L), None), (None, Some("a")),
      (Some(3L), Some("a")), (Some(7L), Some("c")))
      .toDF("x", "s")
    val got = Profile.profile(df, Seq("x", "s"), exactDistinct = true)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5)))
      .toMap
    assert(got("x") == ((5L, 1L, 3L, "1", "7")))
    assert(got("s") == ((5L, 1L, 3L, "a", "c")))
  }

  test("null-only and single-value columns profile without surprises") {
    val df = Seq((Option.empty[String], "k"), (None, "k")).toDF("dead", "const")
    val got = Profile.profile(df, Seq("dead", "const"), exactDistinct = true)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), Option(r.getString(4))))
      .toMap
    assert(got("dead") == ((2L, 2L, 0L, None)))
    assert(got("const") == ((2L, 0L, 1L, Some("k"))))
  }

  test("default (approx) gate matches exact within HLL tolerance, no Expand") {
    val docs = graft.sources.Tables
      .load(spark, "/root/testdata/sf0.001", "documents")
    val cols = Seq("doc_id", "lang", "source", "n_chars")
    val exact = Profile.profile(docs, cols, exactDistinct = true)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    val approx = Profile.profile(docs, cols)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    cols.foreach { c =>
      val (e, a) = (exact(c), approx(c))
      assert(math.abs(a - e) <= math.max(2L, (e * 0.05).toLong),
        s"$c: approx $a vs exact $e drifted past HLL tolerance")
    }
    // the plan-shape claim the scaladoc makes: the default gate
    // compiles WITHOUT Expand (exact mode knowingly pays it)
    val defPlan = Profile.profileAgg(docs, cols, exactDistinct = false)
      .queryExecution.executedPlan.toString
    assert(!defPlan.contains("Expand"),
      "default profile gate compiled an Expand:\n" + defPlan)
    val exPlan = Profile.profileAgg(docs, cols, exactDistinct = true)
      .queryExecution.executedPlan.toString
    assert(exPlan.contains("Expand"),
      "exact mode no longer expands — update the Profile scaladoc")
  }
}
