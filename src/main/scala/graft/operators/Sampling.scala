package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic, engine-independent sampling for reproducible data
  * pipelines. `df.sample()` draws from a per-partition RNG: the result
  * changes with partitioning, retries, and Spark versions, which makes
  * experiment reruns and cross-system audits impossible. Here
  * membership is a pure function of the row's id — keep the row iff a
  * hex prefix of `md5(salt || id)` falls under the fraction's
  * threshold — so any engine with md5 (DuckDB oracles included)
  * selects the exact same rows, partitioning never matters, and
  * changing the salt draws a fresh independent sample.
  *
  * The predicate is a codegen'd column expression; at 100 TB the
  * sample is a scan-side filter with no shuffle at all.
  */
object Sampling {

  private val HexWidth = 8              // 32 bits of the digest
  private val HexSpace = 1L << (4 * HexWidth)

  /** `md5(salt || id)` hex prefix as a lexicographic threshold string:
    * uniform in [0, 16^8), compared as lowercase hex in any engine. */
  private def bucketCol(idCol: Column, salt: String): Column =
    substring(md5(concat(lit(salt), idCol.cast("string"))), 1, HexWidth)

  /** The threshold hex string for a fraction (rows strictly below it
    * are kept): `hex(floor(f * 16^8))`, zero-padded to 8 chars. */
  def thresholdHex(fraction: Double): String = {
    require(fraction >= 0.0 && fraction <= 1.0,
      s"fraction must be in [0,1], got $fraction")
    val cut = math.min(HexSpace, math.floor(fraction * HexSpace).toLong)
    if (cut >= HexSpace) "g" // > every hex digit: keep all
    else f"$cut%08x"
  }

  /** Keep ≈`fraction` of rows, membership decided by
    * `md5(salt || id)` — deterministic across engines, partitionings,
    * and reruns. */
  def hashSample(df: DataFrame, idCol: String, fraction: Double,
                 salt: String = "graft"): DataFrame =
    df.filter(bucketCol(col(idCol), salt) < lit(thresholdHex(fraction)))

  /** Per-stratum fractions (strata absent from the map are dropped) —
    * the deterministic form of `sampleBy`, e.g. down-weighting an
    * over-represented source in a training mixture. */
  def stratifiedSample(df: DataFrame, idCol: String, strataCol: String,
                       fractions: Map[String, Double],
                       salt: String = "graft"): DataFrame = {
    require(fractions.nonEmpty, "stratifiedSample needs at least one stratum")
    val bucket = bucketCol(col(idCol), salt)
    val keep = fractions.foldLeft(lit(false)) { case (acc, (stratum, f)) =>
      acc || (col(strataCol) === lit(stratum) && bucket < lit(thresholdHex(f)))
    }
    df.filter(keep)
  }

  /** Training-mixture EPOCH weighting — the up-sampling half that
    * [[stratifiedSample]] (fractions ≤ 1) can't express: weight 2.5
    * means every row of that stratum appears twice and joins a third
    * deterministic 50% draw, i.e. the "source seen ~2.5 times per
    * epoch" repetition factor of a pretraining data recipe. Output
    * gains an `epoch` column (0-based copy number) so downstream
    * shuffling/packing can keep copies apart; strata absent from the
    * map are dropped, weight 0 drops the stratum.
    *
    * Membership of the fractional copy reuses the md5 rule with the
    * epoch number folded into the salt — engine-independent,
    * partition-independent, and independent across epochs. The plan is
    * a scan-side explode of a small literal range + filter: no
    * shuffle, no RNG, nothing driver-side. */
  def epochMixture(df: DataFrame, idCol: String, strataCol: String,
                   weights: Map[String, Double],
                   salt: String = "graft"): DataFrame = {
    require(weights.nonEmpty, "epochMixture needs at least one stratum")
    require(weights.values.forall(w => w >= 0 && w <= 100),
      s"weights must be in [0,100], got $weights")
    // all-zero weights still need one epoch slot for the (never-kept)
    // fractional test; sequence(0,-1) would count DOWN
    val maxCopies = math.max(1L, weights.values.map(w => math.ceil(w).toLong).max)
    val full = weights.foldLeft(lit(null).cast("long")) {
      case (acc, (stratum, w)) =>
        when(col(strataCol) === lit(stratum), lit(math.floor(w).toLong))
          .otherwise(acc)
    }
    val frac = weights.foldLeft(lit(null).cast("string")) {
      case (acc, (stratum, w)) =>
        when(col(strataCol) === lit(stratum),
          lit(thresholdHex(w - math.floor(w)))).otherwise(acc)
    }
    df.withColumn("__full", full).withColumn("__frac", frac)
      .filter(col("__full").isNotNull)
      .withColumn("epoch", explode(sequence(lit(0L), lit(maxCopies - 1))))
      .filter(col("epoch") < col("__full") ||
        (col("epoch") === col("__full") &&
          bucketCol(col(idCol), salt + "_e") < col("__frac")))
      .drop("__full", "__frac")
  }

  /** Exactly `n` rows (fewer if the input is smaller): the n smallest
    * `md5(salt || id)` digests — a uniform fixed-size draw that plans
    * as TakeOrderedAndProject (per-partition top-n + single merge, no
    * global sort shuffle). Deterministic: the full digest is the sort
    * key, with the id as an unambiguous tiebreak. */
  def fixedSizeSample(df: DataFrame, idCol: String, n: Int,
                      salt: String = "graft"): DataFrame = {
    require(n >= 0, s"sample size must be non-negative, got $n")
    df.withColumn("__draw", md5(concat(lit(salt), col(idCol).cast("string"))))
      .orderBy(col("__draw"), col(idCol))
      .limit(n)
      .drop("__draw")
  }

  /** Deterministic train/val/test split: label each row by where its
    * `md5(salt || key)` draw falls among the splits' cumulative
    * thresholds. Membership is a pure function of the key, so the
    * split survives reruns and engine changes, and a row can never
    * silently migrate between train and eval. Fractions must sum
    * to 1 (the last split absorbs the hex-threshold rounding sliver).
    *
    * `keyCol` defaults to the id, but pass a GROUP representative to
    * make the split leakage-free: hashing a near-duplicate cluster's
    * representative (q78b composes this with the n-gram dedup
    * clusters) puts every member of a cluster in the SAME split, so
    * eval never scores on a near-copy of a training row.
    */
  def splitAssign(df: DataFrame, idCol: String,
                  splits: Seq[(String, Double)],
                  keyCol: Option[String] = None,
                  salt: String = "graft"): DataFrame = {
    require(splits.nonEmpty, "need at least one split")
    require(splits.forall(_._2 >= 0), s"negative fraction in $splits")
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      s"fractions must sum to 1, got ${splits.map(_._2).sum}")
    val draw = bucketCol(col(keyCol.getOrElse(idCol)), salt)
    val cums = splits.map(_._2).scanLeft(0.0)(_ + _).tail
    val label = splits.init.zip(cums.init)
      .foldLeft(Option.empty[Column]) { case (acc, ((name, _), cum)) =>
        val c = lit(thresholdHex(cum))
        Some(acc.fold(when(draw < c, name))(_.when(draw < c, name)))
      }
      .fold(lit(splits.head._1))(_.otherwise(splits.last._1))
    df.withColumn("split", label)
  }

  /** Split-leakage AUDIT — the check "Documenting Large Webtext
    * Corpora" (Dodge et al. 2021, public) ran on C4, finding eval
    * items duplicated into train: given per-row split labels, report
    * every EXACT-duplicate group whose members span more than one
    * split — the rows an id-keyed split scatters across the
    * train/eval boundary. One row per leaking group:
    * `(leader, n_docs, n_splits, splits_csv)` — smallest member id,
    * group size, distinct splits, sorted split list. The group key is
    * md5 of the text (the exact-dedup digest discipline: the shuffle
    * key is 16 fixed bytes, never the document), so the whole audit
    * is ONE digest-keyed hash aggregation with map-side combine and
    * |groups| output rows. Composition: run after [[splitAssign]] to
    * QUANTIFY what an id-keyed split leaks, or as the regression
    * audit proving a cluster-keyed split (q78b's representative
    * keying) leaks ZERO groups. Battery q160 oracles planted clones
    * closed-form both ways. */
  def splitLeakage(df: DataFrame, idCol: String, textCol: String,
                   splitCol: String): DataFrame =
    df.select(col(idCol).as("doc_id"), md5(col(textCol)).as("__digest"),
        col(splitCol).as("__split"))
      .groupBy("__digest")
      .agg(min(col("doc_id")).as("leader"),
        count(lit(1)).as("n_docs"),
        countDistinct(col("__split")).as("n_splits"),
        concat_ws(",", sort_array(collect_set(col("__split"))))
          .as("splits_csv"))
      .filter(col("n_splits") > 1)
      .select("leader", "n_docs", "n_splits", "splits_csv")

  /** Deterministic global shuffle + shard assignment for training-data
    * export. Trainers need the corpus cut into N shards whose
    * membership AND intra-shard order are reproducible across reruns,
    * engines, and partitionings (so a resumed run reads the same byte
    * stream): shard = low 4 bytes of `md5(salt || id)` mod N, position
    * = rank of the digest within the shard (id tiebreak). The digest
    * IS the shuffle — rows land in md5 order, which is independent of
    * any input order, so this doubles as the corpus-level "global
    * shuffle before training" pass. One hash-partition exchange on
    * `shard` plus a per-shard sort; nothing global, nothing on the
    * driver.
    */
  def shardAssign(df: DataFrame, idCol: String, numShards: Int,
                  salt: String = "graft"): DataFrame = {
    require(numShards >= 1, s"numShards must be >= 1, got $numShards")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy(col("__draw"), col(idCol))
    df.withColumn("__draw", md5(concat(lit(salt), col(idCol).cast("string"))))
      .withColumn("shard",
        (conv(substring(col("__draw"), 1, HexWidth), 16, 10).cast("long")
          % numShards).cast("int"))
      .withColumn("pos", row_number().over(w) - 1)
      .drop("__draw")
  }

  /** Materialize the shards: one parquet file per `shard=k/` directory,
    * rows inside each file in `pos` order. The repartition groups each
    * shard whole into one task (hash collisions can merge two shards
    * into one task, never split one), so each directory is written by
    * exactly one task as one run-length of sorted rows.
    */
  def writeSharded(df: DataFrame, idCol: String, numShards: Int,
                   path: String, salt: String = "graft"): Unit =
    shardAssign(df, idCol, numShards, salt)
      .repartition(numShards, col("shard"))
      .sortWithinPartitions("shard", "pos")
      .write.mode("overwrite").partitionBy("shard").parquet(path)

  /** Order-preserving score CLASS with a hard-bounded class space:
    * for a numeric score, the top `classBits` bits of the IEEE
    * sortable-long form of `score` cast to double
    * ([[graft.expressions.DoubleSortableBits]]) — monotone
    * non-decreasing in the score (class(x) > class(y) implies x > y),
    * at most `2^classBits` classes EVER regardless of |rows|, and
    * log-spaced (each binade of score magnitude gets its own
    * subdivisions, so heavy-tailed scores — perplexities, losses —
    * don't collapse into one class the way range-normalized buckets
    * do). A non-numeric score falls back to the raw value as its own
    * class: per-value histograms, the pre-quantization behavior —
    * bounded only by |distinct values| (documented contract for
    * callers with exotic orderable score types). NULL scores have a
    * NULL class, which sorts after every real class exactly as NULL
    * scores sort after every real score. */
  private def scoreClass(df: DataFrame, scoreCol: String,
                         classBits: Int): Column = {
    require(classBits >= 1 && classBits <= 63,
      s"classBits must be in [1, 63], got $classBits")
    df.schema(scoreCol).dataType match {
      case _: org.apache.spark.sql.types.NumericType =>
        shiftright(graft.expressions.ScalarExpressions
          .sortableBits(col(scoreCol).cast("double")), 64 - classBits)
      case _ => col(scoreCol)
    }
  }

  /** Keep each group's top `fraction` of rows by `scoreCol` (ties
    * broken by `idCol` so selection is deterministic) — the
    * quality-budgeted curation primitive: "keep the best half of every
    * domain under the learned gate" composes a [[graft.operators.Classifier]]
    * score with this. Kept size is `ceil(fraction * |group|)`, so no
    * group is emptied while `fraction > 0`.
    *
    * Skew-safe two-pass threshold select, bounded for ANY numeric
    * score distribution. The obvious plan — `row_number` + `count`
    * windows over `partitionBy(group)` — is one shuffle but serializes
    * EVERY row of a group through one task's sort; with a dominant
    * group (one source = half the corpus, the normal web-crawl mixture
    * shape) that task is the job. And a per-(group, RAW score)
    * histogram is no better when scores are continuous: every row its
    * own class, the histogram IS the group again. Here instead:
    *  1. a per-(group, [[scoreClass]]) COUNT histogram — one shuffle,
    *     map-side combine, ≤ `2^classBits` rows per group no matter
    *     how many rows or distinct scores the group holds;
    *  2. a window over the histogram (class rows only) finds each
    *     group's BOUNDARY class `c*` — the highest class whose
    *     descending cumulative count reaches `k = ceil(n·fraction)` —
    *     and how many of its rows still fit;
    *  3. the tiny `(group, c*, slots)` frame broadcasts back: rows in
    *     classes ABOVE `c*` are kept with no ordering work at all
    *     (class order implies score order), and only the boundary
    *     class pays an exact `(score desc, id)` `row_number` for the
    *     remaining slots — a window over one class's rows (for
    *     continuous scores a ~`2^-subdivision` slice of the group; for
    *     a point-mass score, the tie set itself — id-order resolution
    *     over a tie mass is inherent to the semantics, not the plan).
    * Rows with a NULL score sort after every non-null score (the
    * `desc` default), exactly like the single-window form did.
    * Results are bit-identical to that form for every score type —
    * quantization only routes rows; selection is exact (spec-pinned
    * on a continuous-score skew fixture). */
  def topFractionBy(df: DataFrame, groupCol: String, scoreCol: String,
                    idCol: String, fraction: Double,
                    classBits: Int = 24): DataFrame = {
    require(fraction >= 0 && fraction <= 1,
      s"fraction must be in [0, 1], got $fraction")
    import org.apache.spark.sql.expressions.Window
    val cls = scoreClass(df, scoreCol, classBits)
    val hist = df.groupBy(col(groupCol).as("__g"), cls.as("__cls"))
      .agg(count(lit(1)).as("__c"))
    val wCum = Window.partitionBy("__g").orderBy(col("__cls").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wN = Window.partitionBy("__g")
    val cuts = hist
      .withColumn("__cum", sum(col("__c")).over(wCum))
      .withColumn("__k", ceil(sum(col("__c")).over(wN) * fraction))
      .filter(col("__cum") >= col("__k") && col("__cum") - col("__c") < col("__k"))
      .select(col("__g"), col("__cls").as("__cut"),
        (col("__k") - (col("__cum") - col("__c"))).cast("long").as("__slots"))
    // inner join: a group with no cut row (fraction = 0) keeps nothing;
    // null-safe so a NULL group key stays a group, as the window form
    // treated it
    val withCut = df.withColumn("__cls", cls)
      .join(broadcast(cuts), col(groupCol) <=> col("__g"))
    // a NULL boundary class means even the null-scored tail is
    // partially kept: every non-null class sorts above it
    val above = withCut
      .filter((col("__cut").isNull && col("__cls").isNotNull) ||
        col("__cls") > col("__cut"))
      .drop("__g", "__cls", "__cut", "__slots")
    val bW = Window.partitionBy(groupCol)
      .orderBy(col(scoreCol).desc, col(idCol))
    val boundary = withCut.filter(col("__cls") <=> col("__cut"))
      .withColumn("__rn", row_number().over(bW))
      .filter(col("__rn") <= col("__slots"))
      .drop("__g", "__cls", "__cut", "__slots", "__rn")
    above.unionByName(boundary)
  }

  /** Keep each group's best rows by `scoreCol` until a per-group
    * WEIGHT budget is spent — the token-budget curation primitive
    * ("take 50B tokens of web, 5B of code"): rows are considered in
    * (score desc, id asc) order and a row is kept iff the group's
    * running weight total INCLUDING it stays ≤ the group's budget.
    * Weight is any non-negative column (token count, char count,
    * bytes); a NULL weight counts as 0. Because weights are
    * non-negative the running total is monotone, so the kept set is a
    * deterministic prefix of the ordered group — once one row
    * overflows the budget, everything after it is out too.
    *
    * Skew-safe exactly like [[topFractionBy]] — the naive plan (one
    * cumulative-sum window over `partitionBy(group)`) serializes every
    * row of a dominant group through one task's sort, and a RAW-score
    * histogram degenerates to |rows| on continuous scores. Instead:
    *  1. a per-(group, [[scoreClass]]) histogram aggregates
    *     SUM(weight) — one shuffle, map-side combine, ≤ `2^classBits`
    *     rows per group for any numeric score distribution;
    *  2. a window over the histogram (class rows only) finds the
    *     group's crossing class `c*` — the unique class where the
    *     descending cumulative weight first exceeds the budget — and
    *     the budget remaining when the class starts;
    *  3. the tiny `(group, c*, remaining)` frame broadcasts back: rows
    *     in classes ABOVE `c*` are kept with zero ordering work
    *     (their cumulative weight fits by construction), rows below
    *     are dropped, and only the crossing class pays an exact
    *     `(score desc, id)` cumulative-sum window against the
    *     remaining budget — one class's rows, never the group.
    * A group whose total weight fits its budget has no crossing class
    * and keeps every row. NULL scores order after all non-null scores,
    * as in [[topFractionBy]]; results are bit-identical to the
    * single-window form (quantization routes rows, selection is
    * exact). `budgets` is a 2-column (group, budget) frame —
    * |groups|-sized, broadcast; the uniform-`Long` overload wraps a
    * constant. */
  def tokenBudgetBy(df: DataFrame, groupCol: String, scoreCol: String,
                    idCol: String, weightCol: String,
                    budgets: DataFrame, classBits: Int = 24): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bCols = budgets.columns
    require(bCols.length == 2 && bCols.head == groupCol,
      s"budgets must be ($groupCol, <budget>), got ${bCols.mkString(",")}")
    val bud = budgets.select(col(bCols(0)).as("__bg"),
      col(bCols(1)).cast("long").as("__budget"))
    val w = coalesce(col(weightCol).cast("long"), lit(0L))
    val cls = scoreClass(df, scoreCol, classBits)
    val hist = df.groupBy(col(groupCol).as("__g"), cls.as("__cls"))
      .agg(sum(w).as("__w"))
      .join(broadcast(bud), col("__g") <=> col("__bg"))
    val wCum = Window.partitionBy("__g").orderBy(col("__cls").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // the crossing class: cumulative weight strictly exceeds the
    // budget here and did not before it — unique per group because the
    // cumulative sum is monotone and a zero-weight class cannot cross
    val cuts = hist
      .withColumn("__cum", sum(col("__w")).over(wCum))
      .filter(col("__cum") > col("__budget") &&
        col("__cum") - col("__w") <= col("__budget"))
      .select(col("__g"), col("__cls").as("__cut"),
        (col("__budget") - (col("__cum") - col("__w"))).as("__rem"),
        lit(true).as("__crossed"))
    // LEFT join: a group with no crossing class fits its budget whole.
    // __crossed (never null on a hit) disambiguates "no crossing
    // class" from "the NULL-score class is the crossing class" —
    // both leave __cut null.
    val withCut = df.withColumn("__cls", cls)
      .join(broadcast(cuts), col(groupCol) <=> col("__g"), "left")
    val above = withCut
      .filter(col("__crossed").isNull ||
        (col("__cut").isNull && col("__cls").isNotNull) ||
        col("__cls") > col("__cut"))
      .drop("__g", "__cls", "__cut", "__rem", "__crossed")
    val bW = Window.partitionBy(groupCol)
      .orderBy(col(scoreCol).desc, col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val boundary = withCut
      .filter(col("__crossed").isNotNull && col("__cls") <=> col("__cut"))
      .withColumn("__tcum", sum(w).over(bW))
      .filter(col("__tcum") <= col("__rem"))
      .drop("__g", "__cls", "__cut", "__rem", "__crossed", "__tcum")
    above.unionByName(boundary)
  }

  /** [[tokenBudgetBy]] with the same budget for every group. */
  def tokenBudgetBy(df: DataFrame, groupCol: String, scoreCol: String,
                    idCol: String, weightCol: String, budget: Long): DataFrame =
    tokenBudgetBy(df, groupCol, scoreCol, idCol, weightCol, budget, 24)

  /** [[tokenBudgetBy]] uniform-budget form with an explicit class
    * width (only one overload may carry defaults). */
  def tokenBudgetBy(df: DataFrame, groupCol: String, scoreCol: String,
                    idCol: String, weightCol: String, budget: Long,
                    classBits: Int): DataFrame = {
    require(budget >= 0, s"budget must be >= 0, got $budget")
    val bud = df.select(col(groupCol)).distinct()
      .withColumn("budget", lit(budget))
    tokenBudgetBy(df, groupCol, scoreCol, idCol, weightCol, bud, classBits)
  }

  /** [[writeSharded]] plus a verification MANIFEST: per-shard
    * `(n_rows, id_sum, id_sq_sum)` written to
    * `_graft_export_manifest` under the export root (underscore
    * prefix — shard readers never see it). The manifest is what makes
    * a multi-TB training export AUDITABLE: a resumed, copied, or
    * partially-restored export re-verifies in ONE cheap scan
    * ([[verifyShardedExport]]) without re-deriving the assignment.
    * Checksums are plain integer aggregates (count / Σh / Σh² over
    * `h = id mod 1 000 000 007`) so any engine — including the
    * battery oracle (q105) — recomputes them; they catch dropped,
    * duplicated, and cross-shard-misplaced rows with miss probability
    * ~1/P per moment. (A tamper that preserves all three moments at
    * once is constructible in principle — use content digests where
    * ADVERSARIAL tampering is in scope; this guards against loss and
    * corruption, the operational failure modes.) The mod-P fold plus
    * DECIMAL(38,0) sums make the moments OVERFLOW-SAFE for ANY Long
    * id — raw 64-bit hash ids included ([[graft.CrawlDemo]] rides
    * `xxhash64` straight through) — out to ~10²⁰ rows per shard;
    * unfolded Σid² would break under ANSI beyond ~2×10⁶ rows even
    * for compact sequential ids. */
  def writeShardedWithManifest(df: DataFrame, idCol: String, numShards: Int,
                               path: String, salt: String = "graft"): Unit = {
    writeSharded(df, idCol, numShards, path, salt)
    shardAssign(df, idCol, numShards, salt)
      .groupBy("shard")
      .agg(momentAggs(idCol).head, momentAggs(idCol).tail: _*)
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$path/_graft_export_manifest")
  }

  /** Per-shard moment aggregates, overflow-safe for any Long id: the
    * id folds to `h = pmod(id, P)` (non-negative, < 10⁹), and Σh / Σh²
    * accumulate as DECIMAL(38,0) — exact to ~10²⁰ rows. */
  private val MomentPrime = 1000000007L
  private def momentAggs(idCol: String): Seq[Column] = {
    val h = pmod(col(idCol), lit(MomentPrime))
    Seq(count(lit(1)).as("n_rows"),
      sum(h.cast("decimal(28,0)")).cast("decimal(38,0)").as("id_sum"),
      sum(h.cast("decimal(19,0)") * h.cast("decimal(19,0)"))
        .cast("decimal(38,0)").as("id_sq_sum"))
  }

  /** Read a [[writeShardedWithManifest]] export's SHARD subtrees
    * explicitly (`basePath` keeps the `shard=` partition column): the
    * manifest directory is invisible by API rather than by the parquet
    * reader's hidden-path default — no "All paths were ignored" WARN
    * per serve, and a consumer cloning the read through a
    * path-filterless API can never ingest manifest rows as data (the
    * [[graft.sources.Warc.readCdxj]] discipline). Degrades to the
    * plain directory read when no shard subtree exists. */
  def readShardedExport(spark: SparkSession, path: String): DataFrame =
    readShardedExportOpt(spark, path)
      .getOrElse(spark.read.parquet(path))

  /** [[readShardedExport]] that admits the EMPTY export: an export of
    * zero rows writes no `shard=` subtrees at all (partitioned writes
    * emit no files for absent partitions), so there is nothing to
    * infer a schema from — `None` lets the caller treat "no shard
    * subtree" as zero rows instead of a schema-inference crash. */
  def readShardedExportOpt(spark: SparkSession,
                           path: String): Option[DataFrame] = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val parts = fs.listStatus(root).toSeq
      .filter(st => st.isDirectory && {
        val n = st.getPath.getName
        !n.startsWith("_") && !n.startsWith(".")
      }).map(_.getPath.toString).sorted
    if (parts.isEmpty) None
    else Some(spark.read.option("basePath", path).parquet(parts: _*))
  }

  /** Re-audit an export against its manifest: one scan of the shard
    * directories, grouped per shard, full-outer joined to the
    * manifest — `(shard, n_rows, id_sum, id_sq_sum, ok)`. A missing
    * shard directory, a lost or duplicated row, or a row landed in
    * the wrong shard flips `ok` on every affected shard. */
  def verifyShardedExport(spark: SparkSession, path: String,
                          idCol: String): DataFrame = {
    // hidden-named dir: read by explicit visible part files (the
    // shared [[graft.sources.Warehouse.visibleFiles]] discipline)
    val mFiles = graft.sources.Warehouse.visibleFiles(spark,
      s"$path/_graft_export_manifest")
    require(mFiles.nonEmpty, s"no manifest part files under " +
      s"$path/_graft_export_manifest")
    val manifest = spark.read.parquet(mFiles: _*)
      .select(col("shard"), col("n_rows").as("__mn"),
        col("id_sum").as("__ms"), col("id_sq_sum").as("__mq"))
    // an EMPTY export has no shard subtree: audit it as zero actual
    // rows (the manifest of an empty export is itself empty, so the
    // join below is vacuous and ok — a NON-empty manifest over a
    // missing subtree still flips ok on every manifest shard)
    val actual = readShardedExportOpt(spark, path)
      .map(_.groupBy("shard")
        .agg(momentAggs(idCol).head, momentAggs(idCol).tail: _*))
      .getOrElse(manifest.select(col("shard"), col("__mn").as("n_rows"),
        col("__ms").as("id_sum"), col("__mq").as("id_sq_sum")).limit(0))
    actual.join(manifest, Seq("shard"), "full_outer")
      .select(col("shard"),
        coalesce(col("n_rows"), lit(0L)).as("n_rows"),
        coalesce(col("id_sum"), lit(0).cast("decimal(38,0)")).as("id_sum"),
        coalesce(col("id_sq_sum"), lit(0).cast("decimal(38,0)")).as("id_sq_sum"),
        (col("n_rows") <=> col("__mn") && col("id_sum") <=> col("__ms") &&
          col("id_sq_sum") <=> col("__mq")).as("ok"))
  }

  /** Temperature-scaled mixture quotas (the mT5/XLM-R multilingual
    * sampling rule, Xue et al. 2021 / Conneau et al. 2020): stratum
    * `i` receives a share of `totalTarget` proportional to
    * `n_i^alpha`, `alpha < 1` up-weighting low-resource strata.
    * Exact-integer apportionment: each stratum's weight is
    * `s_i = floor(n_i^alpha · 2^20 + 0.5)` — at the default
    * `alpha = 0.5` the power is `Math.sqrt`, which IEEE 754 requires
    * to be CORRECTLY ROUNDED, and the 2^20 scaling is exact, so `s_i`
    * is bit-identical in any conforming engine (the q96 oracle
    * recomputes it in DuckDB; other alphas use `Math.pow`, which is
    * only faithfully rounded — deterministic in the JVM, best-effort
    * cross-engine). Quotas are the largest-remainder apportionment of
    * `totalTarget` by `s_i` (ties on remainder broken by stratum
    * name), then capped at `n_i` — an over-allocated low-resource
    * stratum just falls short, nothing is redistributed. Pure integer
    * function of `(counts, totalTarget)`: unit-testable, replayable.
    */
  def temperatureQuotas(counts: Seq[(String, Long)], totalTarget: Long,
                        alpha: Double = 0.5): Seq[(String, Long)] = {
    require(totalTarget >= 0, s"totalTarget must be >= 0, got $totalTarget")
    require(counts.forall(_._2 >= 0), s"negative stratum count in $counts")
    require(counts.map(_._1).distinct.size == counts.size,
      "duplicate stratum in counts")
    val cs = counts.sortBy(_._1)
    val sw = cs.map { case (g, n) =>
      val w = if (alpha == 0.5) math.sqrt(n.toDouble)
              else math.pow(n.toDouble, alpha)
      g -> BigInt(math.floor(w * (1L << 20) + 0.5).toLong)
    }
    val tot = sw.map(_._2).sum
    if (tot == 0) return cs.map { case (g, _) => g -> 0L }
    val t = BigInt(totalTarget)
    val raw = sw.map { case (g, si) => (g, (t * si / tot).toLong, t * si % tot) }
    val leftover = totalTarget - raw.map(_._2).sum
    val bumped = raw.sortBy { case (g, _, rem) => (-rem, g) }
      .zipWithIndex
      .map { case ((g, q, _), i) => g -> (if (i < leftover) q + 1 else q) }
      .toMap
    cs.map { case (g, n) => g -> math.min(bumped(g), n) }
  }

  /** Materialize a [[temperatureQuotas]] mixture: keep, per stratum,
    * exactly its quota of rows — the quota smallest `md5(salt || id)`
    * digests (id tiebreak), the same engine-independent draw as
    * [[fixedSizeSample]] but per-group and skew-safe.
    *
    * Skew-safe exact selection via DIGEST-PREFIX two-pass (the
    * [[topFractionBy]] histogram trick with the digest's first
    * `prefixLen` hex chars as the score class — uniform by
    * construction, so every class holds ~`n_g / 16^prefixLen` rows):
    *  1. per-(stratum, prefix) COUNT histogram — one shuffle,
    *     map-side combine, ≤ `16^prefixLen` rows per stratum;
    *  2. a window over the histogram (prefix rows only) marks each
    *     kept prefix with how many of its rows fit the quota;
    *  3. the cuts frame broadcasts back: rows in a fully-kept prefix
    *     pass with zero ordering work; only the one BOUNDARY prefix
    *     per stratum pays a `row_number` over its ~`n_g/16^prefixLen`
    *     rows — never a full-group sort, no dominant-stratum
    *     straggler.
    * Driver state is the |strata|-row count map (bounded — the same
    * contract as [[epochMixture]]'s weight map). Rows with a NULL
    * stratum are dropped. `n_i` must stay below 2^53 for the exact
    * weight arithmetic (at 2^53 rows per stratum you have other
    * problems).
    */
  def temperatureMixture(df: DataFrame, idCol: String, strataCol: String,
                         totalTarget: Long, alpha: Double = 0.5,
                         salt: String = "graft",
                         prefixLen: Int = 3): DataFrame = {
    require(prefixLen >= 1 && prefixLen <= 8,
      s"prefixLen must be in [1, 8], got $prefixLen")
    import org.apache.spark.sql.expressions.Window
    val spark = df.sparkSession
    import spark.implicits._
    val counts = df.filter(col(strataCol).isNotNull)
      .groupBy(col(strataCol).cast("string").as("g"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    if (counts.isEmpty) return df.limit(0)
    val quotas = temperatureQuotas(counts, totalTarget, alpha)
    val qdf = quotas.toDF("__g", "__q")
    val withD = df.filter(col(strataCol).isNotNull)
      .withColumn("__g", col(strataCol).cast("string"))
      .withColumn("__d", md5(concat(lit(salt), col(idCol).cast("string"))))
      .withColumn("__p", substring(col("__d"), 1, prefixLen))
    val wCum = Window.partitionBy("__g").orderBy("__p")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cuts = withD.groupBy("__g", "__p").agg(count(lit(1)).as("__c"))
      .join(broadcast(qdf), "__g")
      .withColumn("__cum", sum(col("__c")).over(wCum))
      .filter(col("__cum") - col("__c") < col("__q"))
      .select(col("__g"), col("__p"),
        least(col("__c"), col("__q") - (col("__cum") - col("__c")))
          .cast("long").as("__take"),
        col("__c").as("__cls"))
    val joined = withD.join(broadcast(cuts), Seq("__g", "__p"))
    val whole = joined.filter(col("__take") === col("__cls"))
      .drop("__g", "__d", "__p", "__take", "__cls")
    val bW = Window.partitionBy("__g", "__p").orderBy(col("__d"), col(idCol))
    val boundary = joined.filter(col("__take") < col("__cls"))
      .withColumn("__rn", row_number().over(bW))
      .filter(col("__rn") <= col("__take"))
      .drop("__g", "__d", "__p", "__take", "__cls", "__rn")
    whole.unionByName(boundary)
  }

  /** Rank-interval buckets over a QUANTIZED score, per group — the
    * scale-honest form of per-group `ntile`: instead of a window over
    * every row of a group (which serializes a 100 TB language's
    * documents through one task), the rows collapse to a
    * (group, score) histogram first. The contract that bounds the
    * histogram is that `scoreCol` is already quantized to a finite
    * grid (e.g. a 4-dp-rounded log-probability spans ≤ a few hundred
    * thousand distinct values no matter how many documents carry
    * them) — so the per-group window here runs over a bounded frame
    * and the assignment joins back as a broadcast.
    *
    * Bucket semantics are value-granular on purpose (the CCNet
    * discipline): every row with the same score lands in the same
    * bucket — the bucket of the VALUE BLOCK's first rank,
    * `floor(rows_before · numBuckets / n)` in exact integer
    * arithmetic — rather than ntile's arbitrary tie splitting. A
    * value block straddling a boundary goes wholly to the earlier
    * bucket, so bucket sizes are approximate exactly when ties are;
    * assignment is a pure function of the score distribution,
    * independent of partitioning, row order, and engine. Rows with a
    * NULL group or score DROP (explicitly, not by join accident) —
    * the [[temperatureMixture]] NULL-stratum contract; a caller that
    * must keep unscored rows anti-joins them back under whatever
    * neutral default its pipeline uses (the [[graft.CorpusDemo]]
    * gate keeps them). */
  def valueRankBuckets(df: DataFrame, groupCol: String, scoreCol: String,
                       numBuckets: Int,
                       descending: Boolean = true): DataFrame = {
    require(numBuckets >= 1, s"numBuckets must be >= 1, got $numBuckets")
    import org.apache.spark.sql.expressions.Window
    val in = df.filter(col(groupCol).isNotNull && col(scoreCol).isNotNull)
    val hist = in.groupBy(col(groupCol), col(scoreCol))
      .agg(count(lit(1)).as("__cnt"))
    val ord = if (descending) col(scoreCol).desc else col(scoreCol).asc
    val w = Window.partitionBy(col(groupCol)).orderBy(ord)
    val cum = hist.select(col(groupCol), col(scoreCol),
      coalesce(sum(col("__cnt")).over(
          w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)).as("__lo"),
      sum(col("__cnt")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
        .as("__n"))
    // floor((lo · k) / n) stays in BIGINT end-to-end (`div`, not `/`):
    // no float quotient ever decides a bucket boundary
    val assigned = cum
      .withColumn("bucket",
        expr(s"__lo * ${numBuckets}L div __n").cast("int"))
      .select(col(groupCol), col(scoreCol), col("bucket"))
    in.join(broadcast(assigned), Seq(groupCol, scoreCol))
  }

  /** Rejection sampling / best-of-n — the RLHF candidate filter
    * (public recipe, e.g. Llama 2's rejection-sampling stage: sample
    * n completions per prompt, keep the reward-model argmax): per
    * `groupCol` keep the top `keep` rows by `(scoreCol DESC, idCol)`
    * — ties resolve by id, so selection is deterministic — with two
    * audit columns the curation dashboard wants:
    * `pick_rank` (0 = winner) and `margin` = this pick's score minus
    * the NEXT candidate's (NULL when no candidate follows — a
    * singleton group's winner has no margin; a near-zero margin flags
    * prompts where the reward model couldn't separate candidates).
    *
    * One window, ONE pass. Unlike the corpus-wide groups
    * [[topFractionBy]]'s histogram discipline exists for, the
    * partition here is a prompt's CANDIDATE SET — bounded by the
    * generator's fan-out (n is 4..64 in practice), not by the corpus
    * — so the direct window is the scale-correct plan and the
    * histogram two-pass would only add shuffles. */
  def rejectionSample(df: DataFrame, groupCol: String, scoreCol: String,
                      idCol: String, keep: Int = 1): DataFrame = {
    require(keep >= 1, s"keep must be >= 1, got $keep")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col(scoreCol).desc, col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .withColumn("margin", col(scoreCol) - lead(col(scoreCol), 1).over(w))
      .filter(col("__rn") <= keep)
      .withColumn("pick_rank", (col("__rn") - 1).cast("int"))
      .drop("__rn")
  }
}
