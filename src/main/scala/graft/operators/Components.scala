package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components over a pair/edge frame — the step
  * that turns near-duplicate PAIRS (MinHash/SimHash/n-gram output)
  * into duplicate CLUSTERS so a corpus can keep exactly one
  * representative per group. Transitivity matters: a–b and b–c verified
  * pairs mean {a,b,c} is one cluster even when (a,c) itself was never a
  * candidate.
  *
  * Algorithm: alternating large-star / small-star (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC'14) — each
  * round is two grouped aggregations over the edge list, the edge set
  * only ever points toward smaller labels, and convergence takes
  * O(log n) rounds on any graph (a path graph converges in ~log
  * rounds where naive min-label propagation needs diameter rounds).
  * Everything stays distributed: no edge list on the driver, each
  * round checkpoints its frame and explicitly frees the superseded
  * round's blocks, and the fixpoint test is exact edge-set equality.
  */
object Components {

  /** `(node, component)` for every node appearing in `edges`, where
    * `component` is the smallest node id in the node's connected
    * component. Input columns `aCol`/`bCol` must share one numeric/
    * comparable type; self-loops and duplicate/reversed edges are
    * tolerated (a node whose only edge is a self-loop is its own
    * singleton component). Nodes not mentioned in any edge at all are
    * absent from the output — corpus singletons are the caller's
    * id set minus this frame (see [[Dedup.dropNearDuplicateClusters]],
    * where that difference is exactly the left-anti join).
    */
  def connectedComponents(edges: DataFrame, aCol: String, bCol: String,
                          maxIterations: Int = 50): DataFrame = {
    // canonical working set: both directions, no self-loops
    def sym(e: DataFrame): DataFrame =
      e.select(col("u"), col("v"))
        .union(e.select(col("v").as("u"), col("u").as("v")))
        .filter(col("u") =!= col("v"))
        .distinct()

    // localCheckpoint (not persist): an iterated DataFrame's LOGICAL
    // plan nests one level per round even when persisted, and ~10+
    // rounds of star operations overflow Catalyst's analysis stack.
    // Checkpointing materializes the round eagerly and truncates the
    // lineage to the stored blocks; superseded rounds are freed
    // explicitly below (GC/ContextCleaner alone would let up to three
    // materialized edge-set copies per round pile up in block-manager
    // storage on exactly the corpus-scale graphs this targets). (On a
    // real cluster with lineage-loss concerns, reliable `checkpoint`
    // to the checkpoint dir is the drop-in alternative.)
    // materialize the input pair list before sym() references it twice
    // (u,v and v,u branches) — otherwise an expensive upstream pair
    // generation (e.g. n-gram Jaccard) executes once per branch
    val input = edges.select(col(aCol).as("u"), col(bCol).as("v"))
      .localCheckpoint()

    // row counts ride each checkpoint's materialization job as an
    // Observation (computed by the tasks that are already running) —
    // the fixpoint precheck below then costs zero extra jobs per
    // round, instead of the two count() jobs it used to launch.
    def checkpointCounted(df: DataFrame): (DataFrame, Long) = {
      val obs = org.apache.spark.sql.Observation()
      val ck = df.observe(obs, count(lit(1)).as("n")).localCheckpoint()
      (ck, obs.get("n").asInstanceOf[Long])
    }

    var (cur, curCount) = checkpointCounted(sym(input))

    // free a superseded checkpoint's blocks now, not at some future GC:
    // a localCheckpointed frame is a LogicalRDD leaf over a persisted
    // RDD, and unpersisting that RDD is the only prompt release.
    // (`input` stays live — the lazy singleton/root frames below read
    // it when the CALLER executes the result.)
    def free(df: DataFrame): Unit =
      df.queryExecution.analyzed.foreach {
        case lr: org.apache.spark.sql.execution.LogicalRDD =>
          lr.rdd.unpersist(blocking = false)
        case _ => ()
      }

    var converged = false
    var iter = 0
    while (!converged && iter < maxIterations) {
      // large-star: every neighbor v > u links to m(u) = min(u, N(u))
      val withMin = cur.groupBy("u")
        .agg(min(col("v")).as("mnbr"))
        .withColumn("m", least(col("u"), col("mnbr")))
        .select("u", "m")
      val large = cur.join(withMin, "u")
        .filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .filter(col("u") =!= col("v"))
      val afterLarge = sym(large).localCheckpoint()

      // small-star: every neighbor v <= u (and u itself) links to m(u)
      val directed = afterLarge.filter(col("v") < col("u"))
      val dmin = directed.groupBy("u").agg(min(col("v")).as("m"))
      val small = directed.join(dmin, "u")
        .select(col("v").as("u"), col("m").as("v"))
        .filter(col("u") =!= col("v"))
        .union(dmin.select(col("u"), col("m").as("v")))
      val (next, nextCount) = checkpointCounted(sym(small))

      // fixpoint: the symmetric edge sets are equal (both canonical
      // and deduped, so equal counts + empty anti-join is equality).
      // The count precheck is free (observed above); the exact
      // anti-join runs only on rounds whose counts already agree —
      // typically once, at convergence itself.
      converged = nextCount == curCount && next.except(cur).isEmpty
      free(afterLarge)
      free(cur)
      cur = next
      curCount = nextCount
      iter += 1
    }
    require(converged,
      s"connectedComponents did not converge in $maxIterations rounds")

    // at fixpoint the graph is a union of stars rooted at component
    // minima: every node points at its root, roots point at nothing
    val members = cur.filter(col("v") < col("u"))
      .select(col("u").as("node"), col("v").as("component"))
    val roots = cur.select(col("v").as("node")).distinct()
      .join(members.select(col("node")), Seq("node"), "left_anti")
      .select(col("node"), col("node").as("component"))
    // nodes whose every edge was a self-loop vanished from the working
    // set at canonicalization; they are still named by the input, so
    // they surface as their own singleton components
    val allNodes = input.select(col("u").as("node"))
      .union(input.select(col("v").as("node"))).distinct()
    val isolated = allNodes
      .join(members.select(col("node")).union(roots.select(col("node"))),
        Seq("node"), "left_anti")
      .select(col("node"), col("node").as("component"))
    members.union(roots).union(isolated)
  }
}
