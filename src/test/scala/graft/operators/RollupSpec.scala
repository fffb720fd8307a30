package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The algebra behind q76: merging partial states in any batching is
  * indistinguishable from the from-scratch rollup, and the merge
  * itself shuffles state rows once — it never re-touches the inputs'
  * row count.
  */
class RollupSpec extends SparkSpec {

  private lazy val events =
    graft.sources.Tables.load(spark, "/root/testdata/sf0.01", "events")

  private def state(pred: org.apache.spark.sql.Column) =
    Rollup.hourlyState(events.filter(pred), "ts", "value", Seq("event_type"))

  test("merge of any increment batching equals the from-scratch state") {
    val whole = Rollup.hourlyState(events, "ts", "value", Seq("event_type"))
    val m = col("event_id") % 3
    // ((a+b)+c) and (a+(b+c)) and (a+b+c) all equal whole
    val a = state(m === 0); val b = state(m === 1); val c = state(m === 2)
    val leftAssoc = Rollup.merge(Rollup.merge(a, b), c)
    val rightAssoc = Rollup.merge(a, Rollup.merge(b, c))
    val flat = Rollup.merge(a, b, c)
    for (got <- Seq(leftAssoc, rightAssoc, flat)) {
      val d1 = Rollup.report(got).exceptAll(Rollup.report(whole))
      val d2 = Rollup.report(whole).exceptAll(Rollup.report(got))
      assert(d1.isEmpty && d2.isEmpty)
    }
  }

  test("report derives avg from state, never stores it") {
    val whole = Rollup.hourlyState(events, "ts", "value", Seq("event_type"))
    assert(whole.columns.toSet == Set("hour", "event_type", "n", "s", "mn", "mx"))
    val rep = Rollup.report(whole)
    assert(rep.columns.toSet ==
      Set("hour", "event_type", "n", "total_value", "avg_value", "min_value", "peak_value"))
    // spot-check the derivation on one key
    val r = rep.orderBy("hour", "event_type").limit(1).collect().head
    val n = r.getLong(r.fieldIndex("n"))
    assert(n > 0)
  }

  test("merging an increment is one state-sized shuffle, not a history re-scan") {
    val incrState = state(col("event_id") % 5 === 0)
    val baseState = state(col("event_id") % 5 =!= 0)
    val merged = Rollup.merge(baseState, incrState)
    val p = merged.queryExecution.executedPlan.toString
    // partial-aggregate before the exchange: each input side reduces
    // to its own state rows locally, then one hash exchange merges
    val firstAgg = p.indexOf("HashAggregate")
    val firstExchange = p.indexOf("Exchange")
    assert(firstAgg >= 0 && firstExchange >= 0 && firstAgg < firstExchange,
      "no map-side partial aggregate above the merge exchange:\n" + p.take(1500))
  }
}
