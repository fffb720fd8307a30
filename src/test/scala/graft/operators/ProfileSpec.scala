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
    val got = Profile.profile(df, Seq("x", "s"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5)))
      .toMap
    assert(got("x") == ((5L, 1L, 3L, "1", "7")))
    assert(got("s") == ((5L, 1L, 3L, "a", "c")))
  }

  test("null-only and single-value columns profile without surprises") {
    val df = Seq((Option.empty[String], "k"), (None, "k")).toDF("dead", "const")
    val got = Profile.profile(df, Seq("dead", "const"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), Option(r.getString(4))))
      .toMap
    assert(got("dead") == ((2L, 2L, 0L, None)))
    assert(got("const") == ((2L, 0L, 1L, Some("k"))))
  }
}
