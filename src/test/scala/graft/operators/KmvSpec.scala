package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class KmvSpec extends SparkSpec {
  import spark.implicits._

  private lazy val events =
    graft.sources.Tables.load(spark, "/root/testdata/sf0.01", "events")

  test("unsaturated sketches are exact and partitioning-independent") {
    val k = 4096
    val got = events.groupBy("event_type")
      .agg(Kmv.ndvEst(k)(Kmv.kmvAgg(k)(col("user_id"))).as("ndv"))
      .as[(String, Long)].collect().toMap
    val want = events.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("ndv"))
      .as[(String, Long)].collect().toMap
    assert(got == want, s"got $got want $want")
    // the sketch itself (not just the estimate) is a pure function of
    // the value set — repartitioning must not move a single hash
    val sk1 = events.agg(Kmv.kmvAgg(k)(col("user_id"))).as[Seq[Long]].head()
    val sk2 = events.repartition(17)
      .agg(Kmv.kmvAgg(k)(col("user_id"))).as[Seq[Long]].head()
    assert(sk1 == sk2)
    assert(sk1 == sk1.sorted && sk1.distinct == sk1, "sketch not sorted-distinct")
  }

  test("set algebra is exact while the union sketch is unsaturated") {
    val k = 4096
    def sketch(tp: String): Array[Long] =
      events.filter(col("event_type") === tp && col("value") > 80)
        .agg(Kmv.kmvAgg(k)(col("user_id"))).as[Seq[Long]].head().toArray
    def ids(tp: String): Set[Long] =
      events.filter(col("event_type") === tp && col("value") > 80)
        .select("user_id").as[Long].collect().toSet
    val (a, b) = (sketch("click"), sketch("view"))
    val (ia, ib) = (ids("click"), ids("view"))
    assert(Kmv.estimateNdv(a, k) == ia.size)
    assert(Kmv.unionEstimate(a, b, k) == (ia ++ ib).size)
    assert(Kmv.intersectEstimate(a, b, k) == (ia & ib).size)
    assert(Kmv.differenceEstimate(a, b, k) == (ia -- ib).size)
    // inclusion-exclusion closes exactly in the exact regime
    assert(Kmv.unionEstimate(a, b, k) ==
      Kmv.estimateNdv(a, k) + Kmv.differenceEstimate(b, a, k))
  }

  test("saturated estimator: ~1/sqrt(k) relative error at ndv >> k") {
    val k = 256
    val n = 100000L
    val df = spark.range(n).select(col("id"))
    val sk = df.agg(Kmv.kmvAgg(k)(col("id"))).as[Seq[Long]].head().toArray
    assert(sk.length == k, "sketch should be saturated")
    val est = Kmv.estimateNdv(sk, k).toDouble
    val rel = math.abs(est - n) / n
    // 1/sqrt(k-2) ~ 6.3%; allow 3 sigma — deterministic data, safe pin
    assert(rel < 0.19, f"relative error $rel%.4f out of bound (est $est%.0f)")
  }

  test("saturated set ops: overlap estimates within bound, merge == one-shot") {
    val k = 512
    // A = [0, 60k), B = [40k, 100k) -> |A∩B| = 20k, |A∪B| = 100k
    val a = spark.range(0, 60000).agg(Kmv.kmvAgg(k)(col("id")))
      .as[Seq[Long]].head().toArray
    val b = spark.range(40000, 100000).agg(Kmv.kmvAgg(k)(col("id")))
      .as[Seq[Long]].head().toArray
    val one = spark.range(0, 100000).agg(Kmv.kmvAgg(k)(col("id")))
      .as[Seq[Long]].head().toArray
    // a union sketch is itself a valid sketch: merging the halves must
    // reproduce the one-shot sketch of the union stream key-for-key
    assert(Kmv.mergeKeys(a, b, k).toSeq == one.toSeq)
    val estU = Kmv.unionEstimate(a, b, k).toDouble
    val estI = Kmv.intersectEstimate(a, b, k).toDouble
    assert(math.abs(estU - 100000) / 100000 < 0.15, s"union $estU")
    // intersection adds binomial selection noise on top of the union
    // estimate; 20% of 512 minima ~ 102 hits, 3 sigma ~ 28%
    assert(math.abs(estI - 20000) / 20000 < 0.35, s"intersect $estI")
  }

  test("estimates run inside the plan as a partial aggregate") {
    val k = 64
    val out = events.groupBy("event_type")
      .agg(Kmv.ndvEst(k)(Kmv.kmvAgg(k)(col("user_id"))).as("ndv"))
    // map-side combine: the physical plan carries a partial_ and a
    // final aggregate pair, so the exchange moves ≤ k-long arrays
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("partial_kmvaggregator") ||
      plan.toLowerCase.contains("partial"), s"no partial aggregate:\n$plan")
    assert(out.count() == 5)
  }
}
