package graft

import org.apache.spark.sql.functions._
import graft.operators.RuntimeFilter

/** Semantics behind q74: the bloom prune never loses a matching row
  * (one-sided error), actually prunes (the point of the exercise),
  * and the filter runs on the fact side BELOW the join's exchange —
  * i.e. before any shuffle moves the pruned rows.
  */
class RuntimeFilterSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"
  private lazy val lineitem = graft.sources.Tables.load(spark, dir, "lineitem")
  private lazy val urgent = graft.sources.Tables.load(spark, dir, "orders")
    .filter(col("o_orderpriority") === "1-URGENT")

  test("bloomPrunedJoin equals the plain join row-for-row") {
    val pruned = RuntimeFilter
      .bloomPrunedJoin(lineitem, urgent, "l_orderkey", "o_orderkey")
      .select("l_orderkey", "l_linenumber")
    val plain = lineitem.join(urgent,
        lineitem("l_orderkey") === urgent("o_orderkey"))
      .select("l_orderkey", "l_linenumber")
    assert(pruned.count() == plain.count())
    assert(pruned.exceptAll(plain).isEmpty && plain.exceptAll(pruned).isEmpty)
  }

  test("no false negatives, and the prune is effective at its fpp") {
    val matching = lineitem
      .join(urgent.select("o_orderkey"),
        lineitem("l_orderkey") === col("o_orderkey"), "left_semi")
      .count()
    val kept = RuntimeFilter
      .bloomMightContain(lineitem, urgent, "l_orderkey", "o_orderkey",
        expectedKeys = 10000, fpp = 0.01)
      .count()
    val total = lineitem.count()
    assert(kept >= matching, s"bloom lost matches: kept=$kept matching=$matching")
    // fpp 0.01 over the ~80% non-matching rows: kept should hug the
    // matching count, nowhere near the unpruned total
    assert(kept <= matching + (total - matching) / 20,
      s"prune ineffective: kept=$kept matching=$matching total=$total")
  }

  test("non-integral keys are rejected up front, not silently pruned to empty") {
    import spark.implicits._
    // a string key would cast to null per row and drop EVERY fact row —
    // the guard must fail fast instead (round-6 ADVICE finding)
    val factStr = Seq(("k1", 1.0), ("k2", 2.0)).toDF("k", "v")
    val dimStr = Seq(("k1", "x")).toDF("dk", "name")
    val eFact = intercept[IllegalArgumentException] {
      RuntimeFilter.bloomPrunedJoin(factStr, lineitem, "k", "l_orderkey")
    }
    assert(eFact.getMessage.contains("integral"))
    val eDim = intercept[IllegalArgumentException] {
      RuntimeFilter.bloomPrunedJoin(lineitem, dimStr, "l_orderkey", "dk")
    }
    assert(eDim.getMessage.contains("integral"))
  }

  test("the bloom filter sits below the fact-side exchange in the plan") {
    val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force a shuffle join so "below the exchange" is observable
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val df = RuntimeFilter
        .bloomPrunedJoin(lineitem, urgent, "l_orderkey", "o_orderkey")
      val p = df.queryExecution.executedPlan.toString
      val join = p.indexOf("SortMergeJoin")
      assert(join >= 0, p.take(600))
      val sub = p.substring(join)
      val filterAt = sub.indexOf("UDF")
      assert(filterAt >= 0, "no UDF filter under the join:\n" + sub.take(1200))
      val exchangeAt = sub.indexOf("Exchange")
      assert(exchangeAt >= 0 && exchangeAt < filterAt,
        "bloom filter not below the shuffle:\n" + sub.take(1200))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    }
  }
}
