package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ComponentsSpec extends SparkSpec {
  import spark.implicits._

  /** Driver-side union-find reference (iterative find — the path-graph
    * case would recurse thousands deep). */
  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElseUpdate(r, r) != r) r = parent(r)
      var c = x
      while (parent(c) != r) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  private def run(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Components.connectedComponents(edges.toDF("a", "b"), "a", "b")
      .as[(Long, Long)].collect().toMap

  test("matches union-find on random graphs (25 seeds)") {
    (1 to 25).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val n = 2 + rnd.nextInt(40)
      val edges = (1 to rnd.nextInt(60)).map(_ =>
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      val want = {
        val uf = unionFind(edges)
        // nodes only in self-loops still form singleton components
        uf
      }
      assert(run(edges) === want, s"seed=$seed edges=$edges")
    }
  }

  test("transitive chains collapse to one component (hub never paired with tail)") {
    // {(b,c),(a,c)} — b is only ever on the doc_a side; pairwise
    // doc_b-dropping would keep {a,b}, clusters must keep only {a}
    val got = run(Seq((2L, 3L), (1L, 3L)))
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("path graph converges within the round budget (log-round, not diameter)") {
    // a 2000-node path is the adversarial case for naive min-label
    // propagation (needs 2000 rounds); large-star/small-star must
    // finish inside the default 50-round budget
    val edges = (0L until 1999L).map(i => (i, i + 1))
    val got = run(edges)
    assert(got.size == 2000 && got.values.forall(_ == 0L))
  }

  test("duplicate, reversed, and self-loop edges are tolerated") {
    val got = run(Seq((1L, 2L), (2L, 1L), (1L, 2L), (3L, 3L), (4L, 5L)))
    // 3's only edge is a self-loop: it names the node, so it appears
    // as its own singleton component
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 4L, 5L -> 4L))
  }

  test("empty edge set yields an empty frame") {
    assert(run(Nil).isEmpty)
  }

  test("dropNearDuplicateClusters keeps one representative per cluster + singletons") {
    val docs = Seq((1L, "x"), (2L, "x"), (3L, "x"), (9L, "unique"))
      .toDF("doc_id", "text")
    val pairs = Seq((2L, 3L), (1L, 3L)).toDF("doc_a", "doc_b")
    val kept = Dedup.dropNearDuplicateClusters(docs, "doc_id", pairs)
      .select("doc_id").as[Long].collect().toSet
    assert(kept === Set(1L, 9L))
  }

  test("incremental catalog: merges, path compression, late re-rooting, replay no-op") {
    val tbl = "graft_compspec_cat"
    Seq(tbl, tbl + "_remap").foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    def serve(): Map[Long, Long] =
      Components.componentsFromTable(spark, tbl)
        .as[(Long, Long)].collect().toMap
    try {
      // batch 1: two clusters {1,2} and {3,4}
      Components.appendToComponentsTable(spark,
        Seq((1L, 2L), (3L, 4L)).toDF("a", "b"), "a", "b", tbl)
      assert(serve() == Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 3L))
      assert(spark.table(tbl + "_remap").isEmpty)
      // batch 2: a bridge merges them — only the remap changes, the
      // base table stays append-only
      val baseBefore = spark.table(tbl).as[(Long, Long)].collect().toSet
      Components.appendToComponentsTable(spark,
        Seq((2L, 3L)).toDF("a", "b"), "a", "b", tbl)
      assert(serve() == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L))
      assert(spark.table(tbl).as[(Long, Long)].collect().toSet == baseBefore,
        "base table must not be rewritten by a merge")
      assert(spark.table(tbl + "_remap").as[(Long, Long)].collect().toSet ==
        Set((3L, 1L)))
      // batch 3: a SMALLER new node re-roots the whole cluster; the
      // standing remap row must path-compress to the new root
      Components.appendToComponentsTable(spark,
        Seq((0L, 4L)).toDF("a", "b"), "a", "b", tbl)
      assert(serve() == Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 0L))
      assert(spark.table(tbl + "_remap").as[(Long, Long)].collect().toSet ==
        Set((3L, 0L), (1L, 0L)),
        "remap must stay path-compressed (no 3→1→0 chain)")
      // replay of batch 2: pure no-op
      val remapBefore = spark.table(tbl + "_remap").as[(Long, Long)].collect().toSet
      val nBase = spark.table(tbl).count()
      Components.appendToComponentsTable(spark,
        Seq((2L, 3L)).toDF("a", "b"), "a", "b", tbl)
      assert(spark.table(tbl).count() == nBase)
      assert(spark.table(tbl + "_remap").as[(Long, Long)].collect().toSet ==
        remapBefore)
      // self-loop-only newcomer lands as its own singleton
      Components.appendToComponentsTable(spark,
        Seq((42L, 42L)).toDF("a", "b"), "a", "b", tbl)
      assert(serve()(42L) == 42L)
      // and the catalog equals a from-scratch batch clustering of
      // every pair delivered so far (singletons aside: batch CC drops
      // the pure self-loop node's edge at canonicalization but still
      // surfaces it — so the full frames must match exactly)
      val batchAll = Components.connectedComponents(
        Seq((1L, 2L), (3L, 4L), (2L, 3L), (0L, 4L), (42L, 42L)).toDF("a", "b"),
        "a", "b").as[(Long, Long)].collect().toMap
      assert(serve() == batchAll)
    } finally
      Seq(tbl, tbl + "_remap").foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }
}
