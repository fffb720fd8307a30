package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Graph.pageRankMicro]] — exact-integer PageRank. Hand-derived
  * closed forms on tiny graphs (the integer arithmetic makes every
  * expected value computable on paper), plus partition-independence
  * and the dangling-mass-drop invariant.
  */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  private def ranks(edges: Seq[(String, String)], iters: Int,
                    parts: Int = 1): Map[String, Long] =
    Graph.pageRankMicro(edges.toDF("src", "dst").repartition(parts),
        "src", "dst", iters)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("a 3-cycle is an exact fixed point of the integer iteration") {
    // N=3: r0 = 333333333, base = 15e9/300 = 50000000, outdeg 1
    // contrib = floor(333333333*85/100) = 283333333 -> r1 = r0. Exact.
    val e = Seq("a" -> "b", "b" -> "c", "c" -> "a")
    for (it <- Seq(0, 1, 4)) {
      val r = ranks(e, it)
      assert(r == Map("a" -> 333333333L, "b" -> 333333333L, "c" -> 333333333L),
        s"at $it iterations")
    }
  }

  test("star graph: hub accumulates leaf mass; exact hand-computed step") {
    // hub<->l1, hub<->l2. N=3, r0=333333333, base=50000000.
    // leaves: 50000000 + floor(333333333*85/200) = 191666666
    // hub:    50000000 + 2*floor(333333333*85/100) = 616666666
    val e = Seq("h" -> "l1", "h" -> "l2", "l1" -> "h", "l2" -> "h")
    val r = ranks(e, 1)
    assert(r("h") == 616666666L)
    assert(r("l1") == 191666666L && r("l2") == 191666666L)
    assert(r("h") > r("l1"))
  }

  test("dangling nodes drop their out-mass; totals decay monotonically") {
    // a->b, b dangling. N=2, r0=500000000, base=75000000.
    // iter1: a = base (no in-edges), b = base + floor(500000000*85/100).
    val e = Seq("a" -> "b")
    val r1 = ranks(e, 1)
    assert(r1 == Map("a" -> 75000000L, "b" -> 500000000L))
    val totals = (0 to 3).map(it => ranks(e, it).values.sum)
    assert(totals == totals.sorted.reverse, s"not decaying: $totals")
  }

  test("duplicate edges collapse: multiplicity never multiplies mass") {
    val once = ranks(Seq("a" -> "b", "b" -> "a"), 3)
    val dup = ranks(Seq("a" -> "b", "a" -> "b", "a" -> "b", "b" -> "a"), 3)
    assert(once == dup)
  }

  test("partition-independence: identical ranks at any input layout") {
    val e = (1 to 40).map(i => s"n${i % 7}" -> s"n${(i * 3) % 7}")
    assert(ranks(e, 3, parts = 1) == ranks(e, 3, parts = 13))
  }

  test("assumeDistinct on pre-collapsed edges equals the dedup path") {
    val e = Seq("a" -> "b", "b" -> "c", "c" -> "a", "a" -> "c")
    val dup = e ++ e // duplicates the operator must collapse
    val viaDedup = ranks(dup, 3)
    val viaAssume = Graph.pageRankMicro(
      e.toDF("src", "dst"), "src", "dst", 3, assumeDistinct = true)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(viaDedup == viaAssume)
  }

  test("lineage stays flat across checkpoint boundaries (many iterations run)") {
    // 12 iterations with checkpointEvery=2 crosses 6 persist/release
    // cycles; the point is that it RUNS and stays exact, not speed.
    val e = Seq("a" -> "b", "b" -> "c", "c" -> "a")
    val r = Graph.pageRankMicro(e.toDF("src", "dst"), "src", "dst",
        iterations = 12, checkpointEvery = 2)
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(r == Map("a" -> 333333333L, "b" -> 333333333L, "c" -> 333333333L))
  }

  test("ensureEdgeTable + pageRankMicroFromTable: serve equals ad-hoc bit-for-bit, build runs once") {
    val tbl = "graft_graphspec_edges"
    Seq(tbl, tbl + "_nodes").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      graft.sources.Warehouse.clearOrphanLocation(spark, t)
    }
    // hub-and-cycle graph with a dangling node and duplicate edges
    val edges = Seq("a" -> "b", "a" -> "b", "b" -> "c", "c" -> "a",
      "a" -> "d").toDF("src", "dst")
    Graph.ensureEdgeTable(spark, edges, "src", "dst", tbl)
    // idempotent: a second ensure with DIFFERENT (would-be-wrong) edges
    // must not rebuild — existence-keyed like ensureBm25Tables
    Graph.ensureEdgeTable(spark,
      Seq("x" -> "y").toDF("src", "dst"), "src", "dst", tbl)
    assert(spark.table(tbl).count() == 4) // duplicates collapsed, not rebuilt
    for (iters <- Seq(0, 1, 4, 7)) {
      val served = Graph.pageRankMicroFromTable(spark, tbl, iters)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val adhoc = Graph.pageRankMicro(edges, "src", "dst", iters)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(served == adhoc, s"serve diverged from ad-hoc at $iters iterations")
    }
    Seq(tbl, tbl + "_nodes").foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  test("convergence stop: epsilon halts the cycle early at its fixed point, exactly") {
    val tbl = "graft_graphspec_conv"
    Seq(tbl, tbl + "_nodes").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      graft.sources.Warehouse.clearOrphanLocation(spark, t)
    }
    // a 3-cycle reaches its exact integer fixed point after step 1
    // (uniform init IS the fixed point, modulo the floor residue) —
    // epsilon 0 must stop there and still return the exact ranks
    Graph.ensureEdgeTable(spark,
      Seq("a" -> "b", "b" -> "c", "c" -> "a").toDF("src", "dst"),
      "src", "dst", tbl)
    val r = Graph.pageRankMicroFromTable(spark, tbl, iterations = 50,
        epsilonMicro = 1L)
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(r == Map("a" -> 333333333L, "b" -> 333333333L, "c" -> 333333333L))
    // a graph still moving under a tiny epsilon runs to maxIterations
    // and matches the fixed-unroll form
    val tbl2 = "graft_graphspec_conv2"
    Seq(tbl2, tbl2 + "_nodes").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      graft.sources.Warehouse.clearOrphanLocation(spark, t)
    }
    val star = Seq("a" -> "hub", "b" -> "hub", "c" -> "hub",
      "hub" -> "a").toDF("src", "dst")
    Graph.ensureEdgeTable(spark, star, "src", "dst", tbl2)
    val conv = Graph.pageRankMicroFromTable(spark, tbl2, iterations = 3,
        epsilonMicro = 1L)
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    val fixed = Graph.pageRankMicro(star, "src", "dst", iterations = 3)
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(conv == fixed,
      "still-moving graph must run all iterations under a small epsilon")
    Seq(tbl, tbl + "_nodes", tbl2, tbl2 + "_nodes")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  test("iterationPartitions ramps with edge count (round-18 adaptive layout)") {
    // floor: one task per ~1M edges up to cores; past the core count
    // one partition per ~4M edges so per-task state stays bounded
    assert(Graph.iterationPartitions(0L, 32) == 1)
    assert(Graph.iterationPartitions(60L, 32) == 1)            // q114 scale
    assert(Graph.iterationPartitions(1200000L, 32) == 2)       // q95 scale
    assert(Graph.iterationPartitions(20000000L, 32) == 20)
    assert(Graph.iterationPartitions(128000000L, 32) == 32)
    assert(Graph.iterationPartitions(10000000000L, 32) == 2500)
    assert(Graph.iterationPartitions(10000000L, 4) == 4)
  }

  test("pageRankMicro restores the session shuffle-partition conf") {
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    val e = Seq("a" -> "b", "b" -> "a").toDF("src", "dst")
    Graph.pageRankMicro(e, "src", "dst", iterations = 2).collect()
    assert(spark.conf.get("spark.sql.shuffle.partitions") == before,
      "the adaptive iteration layout must not leak into the session conf")
  }
}
