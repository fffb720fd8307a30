package graft.operators

import graft.SparkSpec
import graft.functions.Text
import org.apache.spark.sql.functions._

class FreqSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs =
    graft.sources.Tables.load(spark, "/root/testdata/sf0.01", "documents")

  private def sketch(capacity: Int, df: org.apache.spark.sql.DataFrame,
                     colName: String): Map[String, Long] =
    df.agg(Freq.frequentTerms(capacity)(col(colName)).as("fi"))
      .select(explode(col("fi")).as("tc"))
      .select($"tc.term", $"tc.count").as[(String, Long)]
      .collect().toMap

  test("unsaturated sketch equals the exact groupBy counts, any partitioning") {
    val toks = docs.select(explode(Text.tokens(col("text"))).as("term"))
    val want = toks.groupBy("term").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    assert(want.size <= 64, s"fixture vocabulary grew: ${want.size}")
    val got = sketch(2048, toks, "term")
    assert(got == want)
    val gotRepart = sketch(2048, toks.repartition(13), "term")
    assert(gotRepart == want, "unsaturated MG must be partitioning-independent")
  }

  test("saturated sketch: epsilon-bound counts, no false negatives above n/(c+1)") {
    // Zipf-ish adversarial stream: term i appears ~ 60000/i times,
    // plus a long tail of singletons to force constant eviction
    val rows =
      (1 to 30).flatMap(i => Seq.fill(60000 / i)(s"head_$i")) ++
      (0 until 20000).map(i => s"tail_$i")
    val n = rows.length.toLong
    val c = 64
    val df = rows.toDF("term").repartition(8)
    val truth = rows.groupBy(identity).map { case (t, l) => t -> l.length.toLong }
    val got = sketch(c, df, "term")
    assert(got.size <= c)
    val eps = n.toDouble / (c + 1)
    got.foreach { case (t, est) =>
      val tru = truth(t)
      assert(est <= tru, s"$t overcounted: $est > $tru")
      assert(est >= tru - eps, s"$t undercounted beyond bound: $est < $tru - $eps")
    }
    // completeness: every term above the frequency floor is present
    truth.filter(_._2 > eps).keys.foreach { t =>
      assert(got.contains(t), s"heavy hitter $t missing (true ${truth(t)}, floor $eps)")
    }
  }

  test("plan: partial aggregate — the exchange carries sketches, not token rows") {
    val toks = docs.select(explode(Text.tokens(col("text"))).as("term"))
    val out = toks.agg(Freq.frequentTerms(256)(col("term")))
    val plan = out.queryExecution.executedPlan.toString.toLowerCase
    assert(plan.contains("partial"), s"no partial aggregate in:\n$plan")
  }

  test("null terms are ignored; empty input yields an empty sketch") {
    val df = Seq(Some("a"), None, Some("a"), Some("b"), None).toDF("term")
    val got = sketch(8, df, "term")
    assert(got == Map("a" -> 2L, "b" -> 1L))
    val empty = Seq.empty[String].toDF("term")
    assert(sketch(8, empty, "term").isEmpty)
  }
}
