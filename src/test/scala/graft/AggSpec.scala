package graft

import org.apache.spark.sql.functions._

/** Semantics behind the q45-q47 OLAP battery entries: exact-vs-approx
  * percentile error bounds, rollup == union-of-grouping-sets, pivot ==
  * conditional aggregation. The DuckDB oracles check cross-engine
  * parity; these check the Spark-side algebra.
  */
class AggSpec extends SparkSpec {
  import spark.implicits._

  private lazy val lineitem =
    graft.sources.Tables.load(spark, "/root/testdata/sf0.01", "lineitem")

  test("percentile_approx lands within its rank-error bound of exact percentile") {
    // accuracy a => rank error <= n/a; convert to a value-error check by
    // bracketing the approx result between exact percentiles at
    // p +- eps (the documented guarantee, GK sketch)
    val accuracy = 100
    val n = lineitem.count()
    val eps = n.toDouble / accuracy / n  // = 1/accuracy rank fraction
    Seq(0.25, 0.5, 0.9).foreach { p =>
      val row = lineitem.agg(
        expr(s"percentile_approx(l_extendedprice, $p, $accuracy)").as("approx"),
        expr(s"percentile(l_extendedprice, ${math.max(0.0, p - eps)})").as("lo"),
        expr(s"percentile(l_extendedprice, ${math.min(1.0, p + eps)})").as("hi"))
        .collect().head
      val (approx, lo, hi) = (row.getDouble(0), row.getDouble(1), row.getDouble(2))
      assert(approx >= lo && approx <= hi,
        s"p=$p approx=$approx outside exact rank bracket [$lo, $hi]")
    }
  }

  test("HLL sketch: error bound vs exact, and shard-merge equals whole-corpus sketch") {
    val events = graft.sources.Tables.load(spark, "/root/testdata/sf0.01", "events")
    val row = events.agg(
      expr("hll_sketch_estimate(hll_sketch_agg(user_id, 14))").as("est"),
      countDistinct($"user_id").as("exact")).collect().head
    val (est, exact) = (row.getLong(0).toDouble, row.getLong(1).toDouble)
    // lgConfigK=14 → relative error ~1.04/sqrt(2^14) ≈ 0.8%; assert 5%
    assert(math.abs(est - exact) / exact < 0.05, s"est=$est exact=$exact")
    // mergeability — THE scale property: sketch each shard, union the
    // sketches, estimate once; must equal the single-pass sketch exactly
    val whole = events.agg(expr("hll_sketch_agg(user_id, 14)").as("sk"))
      .select(expr("hll_sketch_estimate(sk)")).as[Long].collect().head
    val merged = events.withColumn("shard", $"event_id" % 8)
      .groupBy("shard").agg(expr("hll_sketch_agg(user_id, 14)").as("sk"))
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))")).as[Long].collect().head
    assert(merged === whole, s"sharded merge $merged != single-pass $whole")
  }

  test("rollup equals the union of its grouping sets") {
    val rolled = lineitem.rollup("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n"))
      .select(coalesce($"l_returnflag", lit("ALL")).as("rf"),
        coalesce($"l_linestatus", lit("ALL")).as("ls"), $"n")
      .as[(String, String, Long)].collect().toSet
    val fine = lineitem.groupBy("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n"))
      .as[(String, String, Long)].collect().toSet
    val mid = lineitem.groupBy("l_returnflag").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().map { case (rf, n) => (rf, "ALL", n) }.toSet
    val total = Set(("ALL", "ALL", lineitem.count()))
    assert(rolled === (fine ++ mid ++ total))
  }

  test("pivot with an explicit value list equals conditional aggregation") {
    val events = graft.sources.Tables.load(spark, "/root/testdata/sf0.01", "events")
      .withColumn("cohort", $"user_id" % 10)
    val types = Seq("click", "error", "purchase", "signup", "view")
    val pivoted = events.groupBy("cohort")
      .pivot("event_type", types).agg(round(avg("value"), 4))
      .orderBy("cohort").collect()
    val cond = events.groupBy("cohort")
      .agg(round(avg(when($"event_type" === types.head, $"value")), 4).as(types.head),
        types.tail.map(t =>
          round(avg(when($"event_type" === t, $"value")), 4).as(t)): _*)
      .orderBy("cohort").collect()
    assert(pivoted.map(_.toSeq).toSeq === cond.map(_.toSeq).toSeq)
    // and the explicit-values pivot plans a single aggregate pass over
    // one scan (no per-value union)
    val plan = events.groupBy("cohort").pivot("event_type", types)
      .agg(round(avg("value"), 4)).queryExecution.executedPlan.toString
    assert(!plan.contains("Union"), plan.take(600))
  }
}
