package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed link-graph ranking (Brin & Page 1998's PageRank) in
  * EXACT integer arithmetic — the domain/page quality signal a
  * web-crawl curation pipeline feeds into its keep/drop gates
  * (the CommonCrawl-derived pipelines rank hosts by link centrality
  * before content filters ever run).
  *
  * Exactness discipline (the q85/q89 integer pattern): rank mass is
  * held in integer micro-units of `scale`. One iteration is
  * `r'(v) = base + Σ_{u→v} floor(r(u)·dampNum / (dampDen·outdeg(u)))`
  * with `base = floor(scale·(dampDen−dampNum) / (dampDen·N))` — every
  * operation is integer floor-division or integer addition, so the
  * result is bit-identical across engines, partitionings, and
  * summation orders, and a DuckDB oracle can replay the whole
  * fixed-iteration unroll (battery q95). The flooring residue and the
  * out-mass of dangling nodes (no out-edges) are DROPPED, not
  * redistributed — total mass decays slightly per iteration, which is
  * the documented teleport-absorbing variant; ORDER of ranks (the
  * signal a curation gate consumes) is unaffected.
  *
  * Scale shape: per iteration, ranks join out-degrees on the node key
  * (both |nodes|-sized, co-partitioned after the first exchange), the
  * edge list joins on `src` (edges persisted pre-partitioned by `src`
  * once, reused every iteration), and contributions aggregate by
  * `dst` — the one unavoidable PageRank exchange, with map-side
  * combine because the aggregate is a plain integer SUM. Nothing is
  * ever collected; driver state is the node count. Every
  * `checkpointEvery` iterations the rank frame is persisted,
  * MATERIALIZED, and the previous one released — downstream stages
  * read the cached blocks, so no iteration ever recomputes an earlier
  * one (the logical plan object still nests; at very high iteration
  * counts swap the persist for `localCheckpoint` to truncate it).
  * The scratch frames (edge list, node list) are unpersisted before
  * returning; the RETURNED rank frame is persisted and materialized —
  * the caller owns its unpersist.
  */
object Graph {

  /** `(node, rank_micro)` after `iterations` synchronous PageRank
    * steps over `edges(srcCol, dstCol)`. Duplicate edges are
    * collapsed (link multiplicity does not multiply mass — the
    * classic formulation); self-loops are legal and kept. Initial
    * rank is the uniform `floor(scale / N)`.
    */
  def pageRankMicro(edges: DataFrame, srcCol: String, dstCol: String,
                    iterations: Int,
                    dampNum: Long = 85L, dampDen: Long = 100L,
                    scale: Long = 1000000000L,
                    checkpointEvery: Int = 5,
                    assumeDistinct: Boolean = false): DataFrame = {
    require(iterations >= 0, s"iterations must be >= 0, got $iterations")
    require(dampDen > 0 && dampNum >= 0 && dampNum <= dampDen,
      s"damping must satisfy 0 <= dampNum <= dampDen, got $dampNum/$dampDen")
    require(scale > 0, s"scale must be positive, got $scale")
    require(checkpointEvery >= 1,
      s"checkpointEvery must be >= 1, got $checkpointEvery")

    // The out-degree is a static property of the source node, so it is
    // folded INTO the persisted edge list once (src, dst, __od) rather
    // than re-joined every step. With e pinned to HashPartitioning(src)
    // and nodes/ranks to HashPartitioning(node), every per-iteration
    // join satisfies its required distribution from the persisted
    // layout, leaving the dst-keyed contribution SUM as the ONE
    // exchange per step — the canonical distributed-PageRank shape.
    // Node keys keep their NATIVE type — long keys shuffle and compare
    // far cheaper than decorated strings at web-graph scale.
    // `assumeDistinct = true` skips the (src, dst) dedup exchange when
    // the caller guarantees collapsed multiplicity (e.g. it distincted
    // one direction and mirrored — the two directions are disjoint by
    // construction).
    val cleaned = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .na.drop()
    val dedup = (if (assumeDistinct) cleaned else cleaned.distinct())
      .persist(StorageLevel.MEMORY_AND_DISK)
    val outdeg = dedup.groupBy(col("src").as("__on"))
      .agg(count(lit(1)).as("__od"))
    // the explicit repartition matters: AQE broadcasts the small
    // outdeg side, which would leave the join output in dedup's
    // (src, dst) layout — and every iteration's ranks⋈e join would
    // re-exchange the full edge list on src
    val e = dedup.join(outdeg, dedup("src") === outdeg("__on"))
      .select(col("src"), col("dst"), col("__od"))
      .repartition(col("src"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nodes = dedup.select(col("src").as("node"))
      .union(dedup.select(col("dst").as("node"))).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)

    val n = nodes.count()
    require(n > 0, "pageRankMicro needs a non-empty edge list")
    e.count() // materialize BEFORE releasing the frame it reads
    dedup.unpersist()
    val base = scale * (dampDen - dampNum) / (dampDen * n)
    val r0 = scale / n

    var ranks = nodes.withColumn("rank_micro", lit(r0))
    var persisted: Option[DataFrame] = None
    var i = 0
    while (i < iterations) {
      // dangling nodes have no e row — their out-mass drops here
      val contribs = ranks
        .join(e, ranks("node") === e("src"))
        .select(col("dst").as("node"),
          // `div`, not `/`: Column./ is DOUBLE division, whose
          // round-to-nearest can land ON an integer the true quotient
          // sits just under — truncating that is off by one vs exact
          // integer floor. `div` is exact integral division.
          expr(s"(rank_micro * $dampNum) div ($dampDen * __od)").as("__c"))
        .groupBy("node").agg(sum(col("__c")).as("__m"))
      ranks = nodes.join(contribs, Seq("node"), "left")
        .select(col("node"),
          (lit(base) + coalesce(col("__m"), lit(0L))).as("rank_micro"))
      i += 1
      if (i % checkpointEvery == 0 || i == iterations) {
        val next = ranks.persist(StorageLevel.MEMORY_AND_DISK)
        next.count() // materialize BEFORE releasing the frame it reads
        persisted.foreach(_.unpersist())
        persisted = Some(next)
        ranks = next
      }
    }
    // iterations == 0 returns the uniform init — persist + materialize
    // it too, so the scratch frames can be released uniformly below
    if (persisted.isEmpty) {
      ranks = ranks.persist(StorageLevel.MEMORY_AND_DISK)
      ranks.count()
    }
    // release the scratch caches: the final ranks are materialized, so
    // nothing recomputes through these. The returned (persisted) frame
    // is the caller's to unpersist.
    e.unpersist()
    nodes.unpersist()
    ranks
  }
}
