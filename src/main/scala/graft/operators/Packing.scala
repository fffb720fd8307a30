package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sequence packing: assign documents to fixed-token-budget bins for
  * training-batch assembly. True first-fit bin packing is inherently
  * sequential (each placement depends on every earlier bin's fill);
  * the scalable form is CONTIGUOUS packing — fix a deterministic
  * document order, take the running token total, and cut a bin
  * boundary every `budget` tokens: `bin = floor(cum_before / budget)`.
  * Bins straddle boundaries by at most one document (the straddler is
  * then truncated or carried by the batch assembler), which is exactly
  * the standard pack-then-split used for pretraining shards.
  *
  * Scale shape: one window sort per shard. Sharding is the lever —
  * rows are first hash-sharded (deterministically, by id), each shard
  * packs independently, so the sort parallelizes and no single-
  * partition global window appears anywhere. More shards = more
  * parallelism and the same per-bin statistics.
  */
object Packing {

  /** Adds `shard` (deterministic id hash in [0, shards)) and `bin`
    * (contiguous token-budget index within the shard, by ascending
    * `orderCol`). Output = input columns + (shard, bin).
    */
  def packContiguous(df: DataFrame, idCol: String, sizeCol: String,
                     budget: Long, shards: Int = 1,
                     orderCol: Option[String] = None): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    require(shards > 0, s"shards must be positive, got $shards")
    val ord = orderCol.getOrElse(idCol)
    // same engine-independent draw as Sampling: md5 hex prefix mod shards
    val shard = pmod(conv(substring(md5(col(idCol).cast("string")), 1, 8), 16, 10)
      .cast("long"), lit(shards.toLong)).cast("int")
    // id tiebreak: a user-supplied orderCol with duplicate values would
    // otherwise sum in shuffle-arrival order and cut nondeterministic
    // bin boundaries
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy(col(ord), col(idCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    df.withColumn("shard", shard)
      .withColumn("bin",
        floor(coalesce(sum(col(sizeCol)).over(w), lit(0L)) / budget))
  }

  /** Materialize [[packContiguous]] bins into TRAINING SEQUENCES —
    * the step between packing and the trainer: one row per
    * `(shard, bin)` with the bin's documents concatenated in pack
    * order (`sep` between them), the doc ids, and each document's
    * START OFFSET within the sequence — the boundary array an
    * attention/loss mask is built from (tokens must not attend
    * across document boundaries inside a packed sequence).
    *
    * Plan shape: ONE hash aggregation — per-bin items collect into an
    * array sorted IN the aggregate (`array_sort`, no window), and the
    * offsets are an exclusive prefix sum folded in one `aggregate`
    * HOF pass over the sorted lengths (self-contained lambdas — no
    * per-element re-evaluation of outer expressions). Per-task memory
    * is one bin, which `budget` bounds by construction; bins never
    * concentrate (they are the finest grain of the data). NULL texts
    * concatenate as empty (offsets stay aligned). */
  def assembleSequences(packed: DataFrame, idCol: String, textCol: String,
                        orderCol: String, sep: String = "\n\n"): DataFrame = {
    // sep length in CODE POINTS — Spark's length() counts code
    // points, so a supplementary-plane separator (an emoji marker)
    // must not count its surrogate pair twice or every offset after
    // the first doc drifts. Ids keep their NATIVE type (string-keyed
    // corpora pack too; a forced long cast would ANSI-throw).
    val sepLen = sep.codePointCount(0, sep.length).toLong
    val items = array_sort(collect_list(struct(
      col(orderCol).as("o"), col(idCol).as("id"),
      coalesce(col(textCol).cast("string"), lit("")).as("t"))))
    packed.groupBy(col("shard"), col("bin"))
      .agg(items.as("__items"))
      .select(col("shard"), col("bin"),
        transform(col("__items"), x => x.getField("id")).as("doc_ids"),
        aggregate(
          transform(col("__items"),
            x => length(x.getField("t")).cast("long")),
          struct(lit(0L).as("acc"),
            array().cast("array<long>").as("offs")),
          (s, l) => struct(
            (s.getField("acc") + l + lit(sepLen)).as("acc"),
            concat(s.getField("offs"), array(s.getField("acc"))).as("offs")),
          s => s.getField("offs")).as("offsets"),
        array_join(transform(col("__items"), x => x.getField("t")), sep)
          .as("sequence"))
      .withColumn("n_docs", size(col("doc_ids")))
      .withColumn("seq_chars", length(col("sequence")).cast("long"))
  }

  /** The TOKEN-ID form of [[assembleSequences]] — the literal trainer
    * feed: `packed` carries an `array<long>` token-id column (e.g.
    * [[Bpe.tokenIds]]' output run through [[packContiguous]] on
    * `n_tokens`), and each `(shard, bin)` materializes as ONE
    * integer sequence — every document's ids in pack order, a `sepId`
    * token ([[Bpe.SepId]]; the EOS convention) after EACH document —
    * plus the per-doc START OFFSETS (doc k starts at
    * Σ_{j<k}(len_j + 1)) the attention/loss mask is built from, and
    * `doc_ids` for provenance. Export the result with
    * `Sampling.writeShardedWithManifest` keyed on a bin id for
    * manifest-audited training shards.
    *
    * Same plan shape as the string form: ONE hash aggregation,
    * sort-in-aggregate, offsets an exclusive prefix sum in one
    * `aggregate` HOF pass, the flatten a second self-contained HOF —
    * per-task memory is one bin, bounded by the pack budget. NULL
    * token arrays assemble as empty (their sep still lands, offsets
    * stay aligned — same contract as NULL texts). */
  def assembleTokenSequences(packed: DataFrame, idCol: String,
                             tokensCol: String, orderCol: String,
                             sepId: Long = 0L): DataFrame = {
    val items = array_sort(collect_list(struct(
      col(orderCol).as("o"), col(idCol).as("id"),
      coalesce(col(tokensCol), array().cast("array<long>")).as("t"))))
    packed.groupBy(col("shard"), col("bin"))
      .agg(items.as("__items"))
      .select(col("shard"), col("bin"),
        transform(col("__items"), x => x.getField("id")).as("doc_ids"),
        aggregate(
          transform(col("__items"),
            x => size(x.getField("t")).cast("long")),
          struct(lit(0L).as("acc"),
            array().cast("array<long>").as("offs")),
          (s, l) => struct(
            (s.getField("acc") + l + lit(1L)).as("acc"),
            concat(s.getField("offs"), array(s.getField("acc"))).as("offs")),
          s => s.getField("offs")).as("offsets"),
        flatten(transform(col("__items"),
          x => concat(x.getField("t"), array(lit(sepId))))).as("sequence"))
      .withColumn("n_docs", size(col("doc_ids")))
      .withColumn("seq_tokens", size(col("sequence")).cast("long"))
  }

  /** One run-length allocation of best-fit-decreasing packing:
    * items of one size class with ranks `[r0, r0 + nBins·perBin)`
    * (tail run: the LAST bin may take fewer — `lastBinItems`) land in
    * bins `startBin + (rank - r0) div perBin`. */
  private[operators] final case class BfdRun(r0: Long, startBin: Long,
                                             nBins: Long, perBin: Long)

  /** Best-fit-decreasing packing (Krell et al. 2021's histogram
    * formulation — the public "Efficient Sequence Packing" recipe) —
    * the tighter alternative to [[packContiguous]] when padding waste
    * matters more than a streaming-friendly order: sizes sort
    * DESCENDING and each item goes to the fullest bin that still fits
    * (the bin with the SMALLEST remaining ≥ size; ties to the lowest
    * bin id), opening a new bin when none fits. Items larger than the
    * budget get a dedicated bin each; sizes ≤ 0 place as size 1.
    *
    * Scale shape — the histogram trick: the solver never sees rows.
    * It runs on the `(shard, size) → count` HISTOGRAM (bounded driver
    * state: sizes are token lengths ≤ max-sequence-length, so the
    * collect is ≤ shards × budget rows no matter the corpus), tracks
    * bins as (remaining → id-range) GROUPS (≤ budget distinct
    * remainings), and emits RUN-LENGTH allocations (rank interval →
    * bin arithmetic, [[BfdRun]]) whose total count is bounded by
    * groups × sizes — so the broadcast assignment table stays small
    * while the bins themselves can number in the billions. Row-side
    * work is the per-class rank plus a broadcast binary-search
    * lookup. Output = input columns + (shard, bin), the
    * [[packContiguous]] contract, so the assemblers compose
    * unchanged. Deterministic by construction: ranks order by id,
    * groups by bin id, so any engine replays the exact assignment
    * (battery q176 states it closed-form).
    *
    * The rank itself is skew-safe for numeric ids: LLM packing input
    * is dominated by ONE size class (every long doc truncates to the
    * max sequence length), so a rank window partitioned by
    * (shard, size) would serialize |class|/shards rows through single
    * tasks. Instead the [[Sampling.topFractionBy]] discipline: ids
    * bucket into ≤ 2^24 order-preserving classes (sortable double
    * bits), a (shard, size, idClass) COUNT histogram prefix-sums into
    * per-bucket rank offsets — a window over HISTOGRAM rows, never
    * data rows — and the exact `row_number` only runs within each
    * bucket (for a dominant size class, a ~2^-24 slice of it).
    * Non-numeric ids keep the direct per-class window (no
    * order-preserving bounded bucketing exists for arbitrary
    * strings); sizes always rank by their LONG value — the histogram
    * key — so fractional size columns cannot produce overlapping
    * ranks within a class. */
  def packBestFit(df: DataFrame, idCol: String, sizeCol: String,
                  budget: Long, shards: Int = 1): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    require(shards > 0, s"shards must be positive, got $shards")
    val shard = pmod(conv(substring(md5(col(idCol).cast("string")), 1, 8),
      16, 10).cast("long"), lit(shards.toLong)).cast("int")
    val sharded = df.withColumn("shard", shard)
    // bounded collect: the (shard, size) histogram — ≤ shards ×
    // |distinct sizes| rows (token lengths, not documents)
    val hist = sharded.groupBy(col("shard"),
        col(sizeCol).cast("long").as("__sz"))
      .agg(count(lit(1)).as("__n")).collect()
      .map { r =>
        // fail loud on NULL sizes (binUdf's discipline): a bare
        // getLong would NPE without naming the cause, and the
        // allocation key (0 default) would diverge from the row-side
        // lookup key (NULL)
        require(!r.isNullAt(1),
          s"packBestFit: size column '$sizeCol' has NULLs " +
            s"(${r.getLong(2)} rows in shard ${r.getInt(0)}) — " +
            "sizes must be non-null token lengths")
        (r.getInt(0), r.getLong(1), r.getLong(2))
      }
    val allocs: Map[(Int, Long), Array[BfdRun]] =
      hist.groupBy(_._1).flatMap { case (sh, rows) =>
        // bin groups: remaining → (startBinId → nBins), both ordered
        val groups = new java.util.TreeMap[Long,
          java.util.TreeMap[Long, Long]]()
        var nextBin = 0L
        def addGroup(rem: Long, startBin: Long, n: Long): Unit =
          if (n > 0 && rem > 0) {
            val m = groups.computeIfAbsent(rem,
              _ => new java.util.TreeMap[Long, Long]())
            m.put(startBin, n)
          }
        rows.toSeq.sortBy(-_._2).map { case (_, size, count) =>
          val runs = Array.newBuilder[BfdRun]
          var rank = 0L
          var c = count
          if (size > budget) {
            // oversize: one dedicated bin per item
            runs += BfdRun(0L, nextBin, c, 1L)
            nextBin += c
            c = 0
          }
          val s = math.max(size, 1L)
          while (c > 0) {
            val e = groups.ceilingEntry(s)
            if (e == null) {
              // no bin fits: open new bins, perBin items each
              val perBin = budget / s
              val nFull = c / perBin
              if (nFull > 0) {
                runs += BfdRun(rank, nextBin, nFull, perBin)
                addGroup(budget - perBin * s, nextBin, nFull)
                nextBin += nFull; rank += nFull * perBin
                c -= nFull * perBin
              }
              if (c > 0) { // tail bin with the leftovers
                runs += BfdRun(rank, nextBin, 1L, c)
                addGroup(budget - c * s, nextBin, 1L)
                nextBin += 1; rank += c
                c = 0
              }
            } else {
              val rem = e.getKey
              val range = e.getValue.firstEntry() // lowest bin ids first
              val startBin = range.getKey
              val nAvail = range.getValue
              val perBin = rem / s // ≥ 1 (rem ≥ s by ceilingEntry)
              // retire the whole range; surviving pieces re-add below
              e.getValue.remove(startBin)
              if (e.getValue.isEmpty) groups.remove(rem)
              val nFull = math.min(nAvail, c / perBin)
              if (nFull > 0) {
                runs += BfdRun(rank, startBin, nFull, perBin)
                rank += nFull * perBin; c -= nFull * perBin
                addGroup(rem - perBin * s, startBin, nFull)
              }
              val partial = c > 0 && nFull < nAvail
              if (partial) {
                // the class ran out mid-bin: one bin takes the rest
                runs += BfdRun(rank, startBin + nFull, 1L, c)
                addGroup(rem - c * s, startBin + nFull, 1L)
                rank += c; c = 0
              }
              // untouched bins of the range keep their remaining
              val touched = nFull + (if (partial) 1L else 0L)
              addGroup(rem, startBin + touched, nAvail - touched)
            }
          }
          (sh, size) -> runs.result()
        }
      }
    val bcAllocs = df.sparkSession.sparkContext.broadcast(allocs)
    val binUdf = udf { (sh: Int, size: Long, rank: Long) =>
      // fail loud: a missing key means the input re-evaluated
      // non-deterministically between the histogram collect and the
      // assignment pass (same contract as integerCentroids)
      val runs = bcAllocs.value.getOrElse((sh, size),
        throw new IllegalStateException(
          s"packBestFit: no allocation for (shard=$sh, size=$size) — " +
            "the input frame or size column re-evaluated " +
            "non-deterministically between the histogram and " +
            "assignment passes"))
      // runs are rank-ordered; binary search for the last r0 ≤ rank
      var lo = 0
      var hi = runs.length - 1
      while (lo < hi) {
        val mid = (lo + hi + 1) >>> 1
        if (runs(mid).r0 <= rank) lo = mid else hi = mid - 1
      }
      val r = runs(lo)
      r.startBin + (rank - r.r0) / r.perBin
    }
    val szl = col(sizeCol).cast("long")
    withClassRank(df, sharded, idCol, szl)
      .withColumn("bin", binUdf(col("shard"), szl, col("__rank")))
      .drop("__rank")
  }

  /** Skew-safe 0-based rank by `idCol` within each (shard, long-cast
    * size) class — the row side of both histogram solvers
    * ([[packBestFit]], [[batchByLength]]): bucket ids into ≤ 2^24
    * order-preserving classes (sortable double bits), offset per
    * bucket from a histogram prefix sum (a window over HISTOGRAM
    * rows, never data rows), exact `row_number` only within a
    * bucket. NULL keys coalesce to Long.MinValue so they keep their
    * row through the equi-join and still sort FIRST (the window
    * form's null-first order): the shifted id classes span ±2^23,
    * far above the sentinel, and a real Long.MinValue size is out of
    * any token-length domain. Non-numeric ids keep the direct
    * per-class window (no order-preserving bounded bucketing exists
    * for arbitrary strings). */
  private def withClassRank(df: DataFrame, sharded: DataFrame,
                            idCol: String, szl: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    df.schema(idCol).dataType match {
      case _: org.apache.spark.sql.types.NumericType =>
        val cls = coalesce(
          shiftright(graft.expressions.ScalarExpressions
            .sortableBits(col(idCol).cast("double")), 40),
          lit(Long.MinValue))
        val szlKey = coalesce(szl, lit(Long.MinValue))
        val offs = sharded
          .groupBy(col("shard"), szlKey.as("__szl"), cls.as("__cls"))
          .agg(count(lit(1)).as("__c"))
          .withColumn("__off",
            coalesce(sum(col("__c")).over(Window
              .partitionBy("shard", "__szl").orderBy("__cls")
              .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
          .drop("__c")
        val wIn = Window.partitionBy(col("shard"), col("__szl"),
          col("__cls")).orderBy(col(idCol))
        sharded.withColumn("__szl", szlKey).withColumn("__cls", cls)
          .join(offs, Seq("shard", "__szl", "__cls"))
          .withColumn("__rank",
            col("__off") + row_number().over(wIn).cast("long") - 1L)
          .drop("__szl", "__cls", "__off")
      case _ =>
        val w = Window.partitionBy(col("shard"), szl).orderBy(col(idCol))
        sharded.withColumn("__rank", row_number().over(w).cast("long") - 1L)
    }
  }

  /** In-context pretraining ORDER (Shi et al. 2023, public: packing
    * semantically RELATED documents into the same training sequence
    * beats random packing — the model learns to use cross-document
    * context): per IVF cell (frozen centroid model, the
    * [[Similarity.ivfAssign]] composition), a greedy
    * nearest-neighbor PATH — seed at the cell's smallest id, then
    * repeatedly hop to the nearest unvisited member (squared L2,
    * ties to the smaller id) — the paper's traveling-neighbor
    * heuristic, run cell-locally. Emits `(id, cell, ctx_rank)`;
    * cell-major `(cell, ctx_rank)` is the pack order
    * ([[packInContext]] feeds it to the contiguous packer).
    *
    * Scale shape: the path is inherently sequential, so it runs PER
    * CELL (`flatMapGroups`), never globally — cell sizes are bounded
    * by the centroid model's nlist design (the IVF discipline; the
    * O(m²) hop scan is the standard in-memory kNN-chain cost on a
    * bounded cell). The centroid matrix broadcasts; nothing else
    * exchanges beyond the one cell shuffle. Ids must be numeric
    * (cast to long — the [[packBestFit]] class-rank situation);
    * NULL vectors are the caller's to filter. */
  def contextOrder(docs: DataFrame, idCol: String, vecCol: String,
                   centroids: Array[Array[Float]]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val assigned = Similarity.ivfAssign(
      docs.select(col(idCol).cast("long"), col(vecCol)), idCol, vecCol,
      centroids)
    assigned.select(col("corpus_id"), col("cvec").cast("array<double>"),
        col("cell"))
      .as[(Long, Seq[Double], Int)]
      .groupByKey(_._3)
      .flatMapGroups { (cell, it) =>
        val a = it.toArray.sortBy(_._1)
        val n = a.length
        val vecs = a.map(_._2.toArray)
        def d2(x: Array[Double], y: Array[Double]): Double = {
          var s = 0.0
          var i = 0
          val m = math.min(x.length, y.length)
          while (i < m) { val d = x(i) - y(i); s += d * d; i += 1 }
          s
        }
        val rank = new Array[Int](n)
        val visited = new Array[Boolean](n)
        var cur = 0 // seed: the cell's smallest id
        visited(0) = true
        var step = 1
        while (step < n) {
          var best = -1
          var bestD = Double.MaxValue
          var j = 0
          while (j < n) {
            // strict <: j ascends in id order, so ties keep the
            // smaller id
            if (!visited(j)) {
              val d = d2(vecs(cur), vecs(j))
              if (d < bestD) { bestD = d; best = j }
            }
            j += 1
          }
          visited(best) = true
          rank(best) = step
          cur = best
          step += 1
        }
        a.indices.iterator.map(i => (a(i)._1, cell, rank(i).toLong))
      }
      .toDF(idCol, "cell", "ctx_rank")
  }

  /** [[packContiguous]] under the [[contextOrder]] — the in-context
    * pretraining packer: bins fill in `(cell, ctx_rank)` order, so a
    * training sequence holds a RUN of the similarity path instead of
    * an id-adjacent slice, and shards split BY CELL (`cell % shards`)
    * so co-located documents never scatter (the md5-of-id draw would
    * break exactly the locality this packer exists to create).
    * Output = input columns + (cell, ctx_rank, shard, bin) — the
    * assemblers compose unchanged on (shard, bin). Battery q184
    * states cell, rank, shard, and bin closed-form on a planted
    * permutation fixture; PackingSpec shows the same-cluster co-bin
    * rate beating id-order packing on a clustered corpus. */
  def packInContext(docs: DataFrame, idCol: String, sizeCol: String,
                    vecCol: String, centroids: Array[Array[Float]],
                    budget: Long, shards: Int = 1): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    require(shards > 0, s"shards must be positive, got $shards")
    val ord = contextOrder(docs, idCol, vecCol, centroids)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard")
      .orderBy(col("cell"), col("ctx_rank"), col(idCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        -1)
    docs.join(ord, idCol)
      .withColumn("shard", pmod(col("cell").cast("long"),
        lit(shards.toLong)).cast("int"))
      .withColumn("bin",
        floor(coalesce(sum(col(sizeCol)).over(w), lit(0L)) / budget))
  }

  /** Partition-scoped contiguous packing — the INCREMENTAL
    * trainer-shard maintenance story. [[packContiguous]]'s bin
    * boundaries are a running sum, so ONE inserted document shifts
    * every later bin in its shard (the avalanche): at 100 TB a daily
    * corpus append would force a full repack. Packing WITHIN a
    * partition (a snapshot/date/epoch key) contains the avalanche —
    * appending partition P touches only P's bins, and every earlier
    * partition's shard/bin assignment is BYTE-IDENTICAL to what it
    * was (PackingSpec pins exactly that; the public practice in every
    * sharded-dataset layout that packs per input shard).
    *
    * The partition index folds into the emitted `shard` column
    * (`part · shards + localShard`), so the assemblers' `(shard,
    * bin)` contract — and everything downstream — composes
    * unchanged. `partCol` must be a non-negative integral key (cast
    * to long; date partitions map to epoch days upstream). */
  def packContiguousBy(df: DataFrame, idCol: String, sizeCol: String,
                       partCol: String, budget: Long,
                       shards: Int = 1): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    require(shards > 0, s"shards must be positive, got $shards")
    val localShard = pmod(conv(substring(md5(col(idCol).cast("string")),
      1, 8), 16, 10).cast("long"), lit(shards.toLong))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy(col(idCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        -1)
    df.withColumn("shard",
        col(partCol).cast("long") * shards + localShard)
      .withColumn("bin",
        floor(coalesce(sum(col(sizeCol)).over(w), lit(0L)) / budget))
  }

  /** Conflict-free batch assembly for in-batch negatives — the
    * contrastive-training constraint (public practice in every
    * dual-encoder stack, DPR/GTR/E5: a batch's OTHER passages serve
    * as negatives, so a batch must never contain two pairs sharing a
    * passage or the "negative" is a false negative): rows sharing a
    * `groupCol` value (the passage) spread across STRIPES — stripe r
    * holds each group's r-th row (rank by id within group) — and
    * batches fill WITHIN a stripe in id order, `batchSize` at a time.
    * Since a stripe holds at most one row per group, no batch can
    * collide BY CONSTRUCTION; only each (shard, stripe)'s tail batch
    * runs short.
    *
    * Scale shape: groups shard FIRST by md5(group) (a group never
    * splits across shards, so distinctness survives), the per-group
    * rank window is bounded by the mining fan-out (pairs per passage
    * are capped at mining time — the q181 bounded-partition
    * argument), and the per-(shard, stripe) window is bounded by
    * |groups| / shards. Output = input + (shard, stripe, batch);
    * a batch is identified by the (shard, stripe, batch) triple. */
  def batchDistinctBy(df: DataFrame, idCol: String, groupCol: String,
                      batchSize: Int, shards: Int = 1): DataFrame = {
    require(batchSize > 0, s"batchSize must be positive, got $batchSize")
    require(shards > 0, s"shards must be positive, got $shards")
    import org.apache.spark.sql.expressions.Window
    val shard = pmod(conv(substring(md5(col(groupCol).cast("string")), 1, 8),
      16, 10).cast("long"), lit(shards.toLong)).cast("int")
    val wG = Window.partitionBy(col(groupCol)).orderBy(col(idCol))
    val wS = Window.partitionBy(col("shard"), col("stripe"))
      .orderBy(col(idCol))
    df.withColumn("shard", shard)
      .withColumn("stripe", row_number().over(wG).cast("long") - 1L)
      .withColumn("__seq", row_number().over(wS).cast("long") - 1L)
      .withColumn("batch", expr(s"__seq div $batchSize"))
      .drop("__seq")
  }

  /** Packing-efficiency report per shard — fill rate (permille of
    * bin capacity actually holding payload) and padding waste
    * (capacity the trainer pads over), for ANY (shard, bin)-shaped
    * packing so best-fit and contiguous compare on equal terms.
    * Oversize items can push a bin past its budget, so `fill_milli`
    * may exceed 1000 and waste floors at the per-bin level's truth.
    * Exact integers throughout. */
  def packingReport(packed: DataFrame, sizeCol: String,
                    budget: Long): DataFrame =
    packed.groupBy(col("shard"))
      .agg(countDistinct(col("bin")).as("n_bins"),
        sum(col(sizeCol).cast("long")).as("packed_size"),
        count(lit(1)).as("n_items"))
      .select(col("shard"), col("n_bins"), col("n_items"),
        col("packed_size"),
        expr(s"(packed_size * 1000) div (n_bins * $budget)")
          .as("fill_milli"),
        (col("n_bins") * budget - col("packed_size")).as("padding_waste"))

  /** The SFT loss-mask form of [[assembleTokenSequences]] — the
    * instruction-tuning trainer seam (the public recipe: train on
    * completions only, prompt tokens contribute no loss): each doc
    * carries a prompt/completion BOUNDARY column (its prompt token
    * count), and the assembly emits, alongside the usual geometry,
    * the per-doc half-open span `[mask_start, mask_end)` over the
    * packed `sequence` that the loss applies to:
    *
    *   mask_start = offset + clamp(boundary, 0, len)
    *   mask_end   = offset + len + 1  when the completion is
    *                non-empty (the doc's separator/EOS trains too —
    *                the model must learn to STOP after a completion);
    *                = mask_start otherwise (an all-prompt or empty
    *                doc contributes nothing, not even its separator).
    *
    * A NULL boundary is an unlabeled (pretraining) document mixed
    * into the SFT batch: it trains in full (boundary 0). Spans derive
    * purely from the LANDED geometry — offsets, lengths, boundary —
    * the [[sequenceAttribution]] discipline, so a corrupted offset
    * surfaces as a wrong span, never silently. Same plan shape as
    * the base assembler: ONE hash aggregation, sort-in-aggregate,
    * HOF prefix sums, per-task memory one bin (battery q177 states
    * every span closed-form off the q145 chain). */
  def assembleSftSequences(packed: DataFrame, idCol: String,
                           tokensCol: String, boundaryCol: String,
                           orderCol: String, sepId: Long = 0L): DataFrame = {
    val items = array_sort(collect_list(struct(
      col(orderCol).as("o"), col(idCol).as("id"),
      coalesce(col(tokensCol), array().cast("array<long>")).as("t"),
      coalesce(col(boundaryCol).cast("long"), lit(0L)).as("b"))))
    packed.groupBy(col("shard"), col("bin"))
      .agg(items.as("__items"))
      .select(col("shard"), col("bin"),
        transform(col("__items"), x => x.getField("id")).as("doc_ids"),
        aggregate(
          transform(col("__items"),
            x => size(x.getField("t")).cast("long")),
          struct(lit(0L).as("acc"),
            array().cast("array<long>").as("offs")),
          (s, l) => struct(
            (s.getField("acc") + l + lit(1L)).as("acc"),
            concat(s.getField("offs"), array(s.getField("acc"))).as("offs")),
          s => s.getField("offs")).as("offsets"),
        flatten(transform(col("__items"),
          x => concat(x.getField("t"), array(lit(sepId))))).as("sequence"),
        transform(col("__items"),
          x => size(x.getField("t")).cast("long")).as("__lens"),
        transform(col("__items"),
          x => least(greatest(x.getField("b"), lit(0L)),
            size(x.getField("t")).cast("long"))).as("__cb"))
      .withColumn("mask_starts",
        zip_with(col("offsets"), col("__cb"), (o, c) => o + c))
      .withColumn("mask_ends",
        zip_with(col("mask_starts"),
          zip_with(col("offsets"), col("__lens"), (o, l) => o + l),
          (s, ol) => when(s < ol, ol + lit(1L)).otherwise(s)))
      .drop("__lens", "__cb")
      .withColumn("n_docs", size(col("doc_ids")))
      .withColumn("seq_tokens", size(col("sequence")).cast("long"))
  }

  /** The MULTI-TURN form of [[assembleSftSequences]] — the chat-SFT
    * trainer seam (public recipe in every chat-SFT stack: train on
    * every assistant turn, mask user/system turns and role headers):
    * each doc carries a SPAN LIST `array<struct<start, end>>` in its
    * own token coordinates (from [[graft.functions.Text
    * .turnMaskSpans]]), and the assembly emits `mask_spans` — the
    * spans re-based onto the packed `sequence`, flattened in pack
    * order. Per span, with `len` the doc's token count:
    *
    *   start' = offset + clamp(start, 0, len)
    *   end'   = offset + clamp(end, start, len), PLUS 1 when the
    *            clamped end reaches `len` on a non-empty span — the
    *            doc's separator/EOS trains with a completion that
    *            runs to the end of the doc (the model must learn to
    *            STOP), exactly [[assembleSftSequences]]'s rule;
    *            interior spans never touch the separator.
    *
    * Empty spans (after clamping) are dropped; a NULL span list is an
    * unlabeled pretraining document mixed into the batch and trains
    * in full including its separator (the NULL-boundary convention);
    * an EMPTY list contributes nothing. Spans derive purely from the
    * LANDED geometry — offsets, lengths, the span list — so a
    * corrupted offset surfaces as a wrong span, never silently. Same
    * plan shape as the base assembler: ONE hash aggregation,
    * sort-in-aggregate, HOF prefix sums, per-task memory one bin
    * (battery q182 states every span closed-form off per-turn token
    * counts; PackingSpec pins the clamp/extend/NULL edges). */
  def assembleSftSequencesMultiTurn(packed: DataFrame, idCol: String,
                                    tokensCol: String, spansCol: String,
                                    orderCol: String,
                                    sepId: Long = 0L): DataFrame = {
    val emptySpans = array().cast("array<struct<start:bigint,end:bigint>>")
    val items = array_sort(collect_list(struct(
      col(orderCol).as("o"), col(idCol).as("id"),
      coalesce(col(tokensCol), array().cast("array<long>")).as("t"),
      col(spansCol).as("sp"))))
    packed.groupBy(col("shard"), col("bin"))
      .agg(items.as("__items"))
      .select(col("shard"), col("bin"),
        transform(col("__items"), x => x.getField("id")).as("doc_ids"),
        aggregate(
          transform(col("__items"),
            x => size(x.getField("t")).cast("long")),
          struct(lit(0L).as("acc"),
            array().cast("array<long>").as("offs")),
          (s, l) => struct(
            (s.getField("acc") + l + lit(1L)).as("acc"),
            concat(s.getField("offs"), array(s.getField("acc"))).as("offs")),
          s => s.getField("offs")).as("offsets"),
        flatten(transform(col("__items"),
          x => concat(x.getField("t"), array(lit(sepId))))).as("sequence"),
        col("__items"))
      .withColumn("mask_spans",
        flatten(zip_with(col("__items"), col("offsets"), (x, off) => {
          val len = size(x.getField("t")).cast("long")
          val sp = x.getField("sp")
          val full = when(len > 0,
              array(struct(off.as("start"), (off + len + 1L).as("end"))))
            .otherwise(emptySpans)
          val rebased = transform(coalesce(sp, emptySpans), s0 => {
            val cs = least(greatest(coalesce(s0.getField("start"), lit(0L)),
              lit(0L)), len)
            val ce0 = least(greatest(coalesce(s0.getField("end"), lit(0L)),
              cs), len)
            val ce = when(ce0 === len && ce0 > cs, ce0 + lit(1L))
              .otherwise(ce0)
            struct((off + cs).as("start"), (off + ce).as("end"))
          })
          when(sp.isNull, full)
            .otherwise(filter(rebased,
              z => z.getField("end") > z.getField("start")))
        })))
      .drop("__items")
      .withColumn("n_docs", size(col("doc_ids")))
      .withColumn("seq_tokens", size(col("sequence")).cast("long"))
      .withColumn("n_spans", size(col("mask_spans")))
      .withColumn("masked_tokens", aggregate(col("mask_spans"), lit(0L),
        (a, z) => a + z.getField("end") - z.getField("start")))
  }

  /** The MULTIMODAL form of [[assembleTokenSequences]] — the
    * interleaved trainer feed ([[Multimodal.tokenizeInterleaved]]'s
    * output run through [[packContiguous]] on `n_tokens`): identical
    * sequence/offsets/ids assembly, plus the bin's `image_refs`
    * flattened in the SAME pack order — so the k-th
    * [[Multimodal.ImagePlaceholderId]] token in `sequence` refers to
    * `image_refs[k]`, the ordinal contract the trainer's embedding
    * lookaside relies on ([[imageSlotTable]] materializes it). Same
    * plan shape: ONE hash aggregation, sort-in-aggregate, HOF prefix
    * sums; per-task memory one bin. */
  def assembleMultimodalSequences(packed: DataFrame, idCol: String,
                                  tokensCol: String, refsCol: String,
                                  orderCol: String,
                                  sepId: Long = 0L): DataFrame = {
    val items = array_sort(collect_list(struct(
      col(orderCol).as("o"), col(idCol).as("id"),
      coalesce(col(tokensCol), array().cast("array<long>")).as("t"),
      coalesce(col(refsCol), array().cast("array<string>")).as("r"))))
    packed.groupBy(col("shard"), col("bin"))
      .agg(items.as("__items"))
      .select(col("shard"), col("bin"),
        transform(col("__items"), x => x.getField("id")).as("doc_ids"),
        aggregate(
          transform(col("__items"),
            x => size(x.getField("t")).cast("long")),
          struct(lit(0L).as("acc"),
            array().cast("array<long>").as("offs")),
          (s, l) => struct(
            (s.getField("acc") + l + lit(1L)).as("acc"),
            concat(s.getField("offs"), array(s.getField("acc"))).as("offs")),
          s => s.getField("offs")).as("offsets"),
        flatten(transform(col("__items"),
          x => concat(x.getField("t"), array(lit(sepId))))).as("sequence"),
        flatten(transform(col("__items"), x => x.getField("r")))
          .as("image_refs"))
      .withColumn("n_docs", size(col("doc_ids")))
      .withColumn("seq_tokens", size(col("sequence")).cast("long"))
  }

  /** The image LOOKASIDE table of assembled multimodal sequences —
    * one row per image slot: `(shard, bin, slot, position,
    * image_ref)` where `position` is the 0-based index of the slot's
    * placeholder token in `sequence` and `slot` its ordinal among the
    * sequence's placeholders. Derived FROM THE LANDED SEQUENCE (the
    * [[sequenceAttribution]] geometry discipline): positions come
    * from scanning the assembled ids, refs from the aligned flattened
    * list — a slot/ref count mismatch surfaces as NULL fields in the
    * zip rather than silently truncating. Pure HOF pass + explode; no
    * shuffle beyond the input's. */
  def imageSlotTable(seqs: DataFrame,
                     imageId: Long =
                       Multimodal.ImagePlaceholderId): DataFrame = {
    val positions = filter(
      transform(col("sequence"), (t, i) => when(t === imageId, i)
        .otherwise(lit(-1))), p => p >= 0)
    seqs.select(col("shard"), col("bin"),
        posexplode(zip_with(positions, col("image_refs"),
          (p, r) => struct(p.as("position"), r.as("image_ref")))))
      .select(col("shard"), col("bin"), col("pos").as("slot"),
        col("col.position").as("position"),
        col("col.image_ref").as("image_ref"))
  }

  /** Per-group token attribution of assembled sequences — the data-
    * governance ledger ("how many tokens did each source contribute
    * to the training batch"), computed FROM THE LANDED SHARD GEOMETRY
    * itself rather than by re-tokenizing: each document's token share
    * is its offset delta (next offset, else `seq_tokens`, minus its
    * own — which INCLUDES its separator, the token the trainer
    * actually consumes for it), so the ledger audits the assembled
    * artifact and a corrupted offset array shows up as a wrong
    * attribution, not a silently re-derived right one. `docMeta`
    * supplies the group column keyed by `idCol`. Output
    * `(<groupCol>, n_docs, n_tokens_with_sep)`. Plan: one HOF pass
    * per sequence row, explode to |docs| rows of (id, share), one
    * join to the (narrow) meta frame, one hash agg.
    *
    * With `imageId` (the multimodal ledger), each document's IMAGE
    * SLOT count is also recovered from the landed geometry — the
    * placeholder tokens inside the doc's own offset span — and the
    * output gains `n_image_slots`; the base two columns are unchanged
    * so unimodal ledgers (q169) keep their schema. */
  /** Tokenizer FERTILITY telemetry per group — the mixture-design
    * dashboard numbers (tokens per 1000 chars, tokens per 1000 words,
    * bytes per token in milli-units), computed from the LANDED shard
    * geometry exactly like [[sequenceAttribution]]: each document's
    * token count is its offset delta MINUS its separator (fertility
    * describes the tokenizer, not the packing convention), never
    * re-tokenized — a corrupted shard shows up as a wrong fertility,
    * not a silently re-derived right one. `docMeta` supplies the
    * group plus the text-side denominators (chars/words/bytes of
    * whatever form fed the tokenizer — the caller pins the
    * convention). Ratios are exact integer floor-divisions
    * (engine-identical); a zero denominator yields NULL rather than
    * an ANSI divide error. Output `(<groupCol>, n_docs, n_tokens,
    * tokens_per_kchar, tokens_per_kword, bytes_per_token_milli)`.
    * Plan: one HOF pass per sequence row, explode, one join to the
    * narrow meta frame, ONE hash agg. */
  def fertilityTelemetry(seqs: DataFrame, docMeta: DataFrame,
                         idCol: String, groupCol: String,
                         charsCol: String, wordsCol: String,
                         bytesCol: String): DataFrame = {
    val n = size(col("doc_ids"))
    val shares = zip_with(col("doc_ids"),
      transform(sequence(lit(1), n), i =>
        when(i < n, element_at(col("offsets"), i + 1))
          .otherwise(col("seq_tokens")) -
          element_at(col("offsets"), i) - lit(1L)),
      (id, tok) => struct(id.as("id"), tok.as("tok")))
    // exact integer floor division (`div`), NULL on a zero denominator
    // (ANSI would throw)
    def ratio(numSql: String, denSql: String): Column =
      expr(s"CASE WHEN $denSql = 0 THEN NULL " +
        s"ELSE ($numSql) div ($denSql) END")
    seqs.filter(n > 0).select(explode(shares).as("z"))
      .select(col("z.id").as(idCol), col("z.tok").as("doc_tokens"))
      .join(docMeta.select(col(idCol), col(groupCol), col(charsCol),
        col(wordsCol), col(bytesCol)), Seq(idCol))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("doc_tokens")).as("n_tokens"),
        sum(col(charsCol).cast("long")).as("__c"),
        sum(col(wordsCol).cast("long")).as("__w"),
        sum(col(bytesCol).cast("long")).as("__b"))
      .select(col(groupCol), col("n_docs"), col("n_tokens"),
        ratio("n_tokens * 1000", "__c").as("tokens_per_kchar"),
        ratio("n_tokens * 1000", "__w").as("tokens_per_kword"),
        ratio("__b * 1000", "n_tokens").as("bytes_per_token_milli"))
  }

  def sequenceAttribution(seqs: DataFrame, docMeta: DataFrame,
                          idCol: String, groupCol: String,
                          imageId: Option[Long] = None): DataFrame = {
    val n = size(col("doc_ids"))
    val shares = zip_with(col("doc_ids"),
      transform(sequence(lit(1), n), i => {
        val st = element_at(col("offsets"), i)
        val en = when(i < n, element_at(col("offsets"), i + 1))
          .otherwise(col("seq_tokens"))
        struct((Seq((en - st).as("tok")) ++ imageId.map(iid =>
          size(filter(slice(col("sequence"), (st + 1).cast("int"),
              (en - st).cast("int")), t => t === iid))
            .cast("long").as("img"))): _*)
      }),
      (id, s) => struct((Seq(id.as("id"), s.getField("tok").as("tok")) ++
        imageId.map(_ => s.getField("img").as("img"))): _*))
    // n == 0 guard: spark's sequence(1, 0) counts DOWN ([1, 0]), so
    // an empty bin must not reach the share expression at all
    val exploded = seqs.filter(n > 0).select(explode(shares).as("z"))
      .select(Seq(col("z.id").as(idCol), col("z.tok").as("doc_tokens")) ++
        imageId.map(_ => col("z.img").as("doc_image_slots")): _*)
    exploded
      .join(docMeta.select(col(idCol), col(groupCol)), Seq(idCol))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_docs"),
        (Seq(sum(col("doc_tokens")).as("n_tokens_with_sep")) ++
          imageId.map(_ =>
            sum(col("doc_image_slots")).as("n_image_slots"))): _*)
  }

  /** Batching-efficiency report per shard for a [[batchByLength]]
    * output — the [[packingReport]] counterpart for padded batches:
    * `padded_tokens` is the trainer's REAL cost (Σ pad_len × batch
    * size), `padding_waste` what it pads over, `fill_milli` the
    * payload permille of that cost. Group-by-length batching pads
    * NOTHING inside a single-size batch (pad_len == every member), so
    * waste comes only from cross-class handoff batches — the report
    * states exactly that (battery q178b pins it closed-form). Exact
    * integers throughout. */
  def batchingReport(batched: DataFrame, sizeCol: String): DataFrame =
    batched.groupBy(col("shard"), col("batch"), col("pad_len"))
      .agg(count(lit(1)).as("__n"),
        sum(col(sizeCol).cast("long")).as("__p"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_batches"), sum(col("__n")).as("n_items"),
        sum(col("__p")).as("payload_tokens"),
        sum(col("pad_len") * col("__n")).as("padded_tokens"))
      .select(col("shard"), col("n_batches"), col("n_items"),
        col("payload_tokens"), col("padded_tokens"),
        expr("payload_tokens * 1000 div padded_tokens").as("fill_milli"),
        (col("padded_tokens") - col("payload_tokens")).as("padding_waste"))

  /** Per-token POSITION IDS for a packed sequence — the third column
    * of the trainer contract next to `sequence` and `offsets`
    * (public packed-training practice: positions RESET at every
    * document boundary so rotary/absolute embeddings treat each doc
    * as its own context, and the doc-causal attention block mask is
    * derived from the same offsets): for the doc spanning
    * `[offset_k, offset_{k+1})` the positions are `0..span-1`, the
    * separator taking the last position of ITS OWN doc. Pure
    * geometry — one HOF pass over the offsets, no re-tokenization,
    * O(bin) per row; an empty bin yields an empty array (the
    * [[sequenceAttribution]] `sequence(1, 0)` guard). Works on any
    * assembler output carrying `doc_ids`/`offsets`/`seq_tokens`
    * (battery q179 restates every position closed-form off the q145
    * chain). */
  def positionIds(seqs: DataFrame): DataFrame = {
    val n = size(col("doc_ids"))
    val spans = transform(sequence(lit(1), n), i => {
      val st = element_at(col("offsets"), i)
      val en = when(i < n, element_at(col("offsets"), i + 1))
        .otherwise(col("seq_tokens"))
      sequence(lit(0L), en - st - 1L)
    })
    seqs.withColumn("position_ids",
      when(n > 0, flatten(spans)).otherwise(array().cast("array<long>")))
  }

  /** Preference-pair assembly — the DPO/RLHF post-training data seam
    * (Rafailov et al. 2023's public recipe: each example is a prompt
    * with a CHOSEN and a REJECTED completion; the loss compares the
    * policy's completion log-probs, so both sequences need the same
    * completion-only mask discipline as [[assembleSftSequences]]):
    * per pair,
    *
    *   seq_chosen   = prompt ++ chosen   ++ sep
    *   seq_rejected = prompt ++ rejected ++ sep
    *   mask_start   = |prompt|            (shared — same prompt)
    *   mask_end_*   = |prompt| + |completion| + 1 when the completion
    *                  is non-empty (the separator/EOS trains), else
    *                  mask_start (a degenerate empty completion
    *                  contributes nothing)
    *
    * NULL arrays assemble as empty, like the base assembler — a pair
    * with a NULL prompt is a bare completion pair, a NULL completion
    * is degenerate but never drops the row (the audit sees it).
    * Row-local, shuffle-free, pure codegen array ops: at 100 TB this
    * is a map-only projection that fuses into the scan. Feed the
    * result to [[batchByLength]] on
    * `greatest(n_tokens_chosen, n_tokens_rejected)` for
    * padding-efficient trainer batches (battery q178 chains both). */
  def assemblePreferencePairs(df: DataFrame, idCol: String,
                              promptCol: String, chosenCol: String,
                              rejectedCol: String,
                              sepId: Long = 0L): DataFrame = {
    val empty = array().cast("array<long>")
    val p = coalesce(col(promptCol), empty)
    def leg(c: String, tag: String) = {
      val comp = coalesce(col(c), empty)
      Seq(
        concat(p, comp, array(lit(sepId))).as(s"seq_$tag"),
        (size(p) + size(comp) + 1).cast("long").as(s"n_tokens_$tag"),
        when(size(comp) > 0, (size(p) + size(comp) + 1).cast("long"))
          .otherwise(size(p).cast("long")).as(s"mask_end_$tag"))
    }
    df.select(Seq(col(idCol), size(p).cast("long").as("mask_start")) ++
      leg(chosenCol, "chosen") ++ leg(rejectedCol, "rejected"): _*)
  }

  /** One run-length batch allocation of [[batchByLength]]: ranks
    * `[r0, r0 + nBatches·perBatch)` of a shard's DESCENDING size
    * order land in batches `startBatch + (rank - r0) div perBatch`,
    * each padded to `padLen` (the tail batch may hold fewer). */
  private[operators] final case class LenRun(r0: Long, startBatch: Long,
                                             perBatch: Long, padLen: Long)

  /** Length-bucketed dynamic batching — the padding-waste answer for
    * sequences that CANNOT concatenate (SFT/DPO pairs, reward-model
    * inputs: each example keeps its own attention span, so bins pad
    * to their longest member instead of packing). The public
    * dynamic-batching recipe (fairseq/HF `group_by_length`): sizes
    * sort DESCENDING within a shard and fill batches under a padded
    * token budget — a batch's cost is `max_len × count`, and since
    * the walk is descending, `max_len` is the batch's FIRST item, so
    * its capacity is `budget div first_len`, fixed at open time.
    * Items larger than the budget get a dedicated batch each; sizes
    * ≤ 0 place as 1.
    *
    * Scale shape — [[packBestFit]]'s histogram discipline end to end:
    * the solver walks the bounded (shard, size) histogram descending
    * and emits RUN-LENGTH allocations ([[LenRun]]); the only open
    * state is the current batch (its pad length and remaining slots),
    * so driver state is O(distinct sizes). Rows pay the same
    * skew-safe two-pass rank as packBestFit — descending this time —
    * and a broadcast binary-search lookup. Output = input + (shard,
    * batch, pad_len); `pad_len` is the batch's padded width, so
    * `sum(pad_len)` grouped by batch states the trainer's real cost
    * (battery q178b reports fill/waste closed-form). Deterministic:
    * batches fill in (size DESC, id ASC) order. */
  def batchByLength(df: DataFrame, idCol: String, sizeCol: String,
                    budget: Long, shards: Int = 1): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    require(shards > 0, s"shards must be positive, got $shards")
    val shard = pmod(conv(substring(md5(col(idCol).cast("string")), 1, 8),
      16, 10).cast("long"), lit(shards.toLong)).cast("int")
    val sharded = df.withColumn("shard", shard)
    val szl = col(sizeCol).cast("long")
    val hist = sharded.groupBy(col("shard"), szl.as("__sz"))
      .agg(count(lit(1)).as("__n")).collect()
      .map { r =>
        // fail loud on NULL sizes (batchUdf's discipline; see
        // packBestFit's histogram for the key-divergence rationale)
        require(!r.isNullAt(1),
          s"batchByLength: size column '$sizeCol' has NULLs " +
            s"(${r.getLong(2)} rows in shard ${r.getInt(0)}) — " +
            "sizes must be non-null token lengths")
        (r.getInt(0), r.getLong(1), r.getLong(2))
      }
    val allocs: Map[(Int, Long), Array[LenRun]] =
      hist.groupBy(_._1).flatMap { case (_, rows) =>
        var nextBatch = 0L
        // the one piece of open state: the current batch's pad
        // length and how many more items it takes
        var openPad = 0L
        var openLeft = 0L
        rows.toSeq.sortBy(r => (-r._2, r._3)).map { case (sh, size, count) =>
          val runs = Array.newBuilder[LenRun]
          var rank = 0L
          var c = count
          val s = math.max(size, 1L)
          if (s > budget) {
            runs += LenRun(0L, nextBatch, 1L, s)
            nextBatch += c; rank += c; c = 0
          }
          if (c > 0 && openLeft > 0) {
            val take = math.min(openLeft, c)
            runs += LenRun(rank, nextBatch - 1L, take, openPad)
            openLeft -= take; rank += take; c -= take
          }
          if (c > 0) {
            val cap = budget / s // ≥ 1 (s ≤ budget here)
            val nFull = c / cap
            if (nFull > 0) {
              runs += LenRun(rank, nextBatch, cap, s)
              nextBatch += nFull; rank += nFull * cap; c -= nFull * cap
            }
            if (c > 0) { // tail batch stays OPEN for smaller classes
              runs += LenRun(rank, nextBatch, cap, s)
              nextBatch += 1
              openPad = s; openLeft = cap - c
              rank += c; c = 0
            } else if (nFull > 0) {
              openLeft = 0 // full batches close
            }
          }
          (sh, size) -> runs.result()
        }
      }
    val bcAllocs = df.sparkSession.sparkContext.broadcast(allocs)
    val batchUdf = udf { (sh: Int, size: Long, rank: Long) =>
      val runs = bcAllocs.value.getOrElse((sh, size),
        throw new IllegalStateException(
          s"batchByLength: no allocation for (shard=$sh, size=$size) — " +
            "the input frame or size column re-evaluated " +
            "non-deterministically between the histogram and " +
            "assignment passes"))
      var lo = 0
      var hi = runs.length - 1
      while (lo < hi) {
        val mid = (lo + hi + 1) >>> 1
        if (runs(mid).r0 <= rank) lo = mid else hi = mid - 1
      }
      val r = runs(lo)
      (r.startBatch + (rank - r.r0) / r.perBatch, r.padLen)
    }
    // the packBestFit two-pass rank verbatim: the rank is WITHIN a
    // (shard, size) class ordered by id — the descending size walk
    // lives entirely in the histogram solver above
    withClassRank(df, sharded, idCol, szl)
      .withColumn("__b", batchUdf(col("shard"), szl, col("__rank")))
      .withColumn("batch", col("__b._1"))
      .withColumn("pad_len", col("__b._2"))
      .drop("__rank", "__b")
  }
}
