package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus-trained bigram language-model scoring — the KenLM-style
  * perplexity quality gate every large-scale text pipeline runs (CCNet
  * trains an LM on a reference corpus and keeps the well-scored tail;
  * reference analog: the quality heuristics around
  * `pipline2/data-proccessor/` scored rows one-at-a-time, this is the
  * corpus-statistical form). Counts use add-one (Laplace) smoothing per
  * `k`, so unseen bigrams score ln(k/(k·V)) instead of -∞.
  *
  * Cross-engine determinism: per-bigram log-probabilities are rounded
  * to integer MICRO-NATS (`round(ln(p)·1e6)` as BIGINT) before any
  * aggregation, so the per-document sum is integer arithmetic —
  * commutative, order-independent, immune to float summation order —
  * and only the final `sum/1e6/n` average re-enters double land (one
  * exact division chain, rounded to 4 dp). The only cross-engine risk
  * left is a libm-vs-JVM ulp on `ln` landing within ~1e-10 of a
  * half-micro-nat — the same risk class the BM25 oracle (q54) already
  * carries at 4 dp.
  *
  * Tokenization is the dedup-family discipline ([[Sketches.normalize]]:
  * lowercase, ASCII-punct strip, whitespace collapse), NOT BM25's
  * whitespace-only split — the two families are intentionally distinct
  * and each is pinned to its own oracle.
  *
  * Scale shape: the model tables are token-keyed aggregates (bigram
  * counts, context counts, a one-row vocab stat) — Zipf-skewed but
  * narrow; scoring is one corpus scan exploded to per-doc bigram
  * OCCURRENCE counts (grouped before the join, so hot bigrams cross
  * the wire once per document, not once per token), a shuffle join
  * against the bigram table on (w1, w2) — AQE handles the Zipf head —
  * and one hash aggregation back to doc grain. Nothing driver-side;
  * the one-row stats frame rides a broadcast cross join. */
object LangModel {

  /** Ordered (non-distinct) adjacent token pairs of the normalized
    * text, one JVM kernel pass per document (the HOF outer-reference
    * trap measured here too; see the verify skill notes). */
  // tuple (not a nested case class — janino cannot codegen an inner
  // class constructor, and the interpreted fallback is the hot path)
  private val bigramsUdf = udf((text: String) => {
    val ws = Sketches.normalize(text).split(' ')
    if (ws.length < 2) Array.empty[(String, String)]
    else Array.tabulate(ws.length - 1)(i => (ws(i), ws(i + 1)))
  })
  private val tokensUdf =
    udf((text: String) => Sketches.normalize(text).split(' '))

  /** Per-document bigram occurrence counts `(doc_id, w1, w2, occ)` —
    * the shared root of training and scoring. Documents with fewer
    * than two tokens contribute no rows. */
  def docBigramOcc(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        explode(bigramsUdf(col(textCol))).as("bg"))
      .groupBy(col("doc_id"), col("bg._1").as("w1"), col("bg._2").as("w2"))
      .agg(count(lit(1)).as("occ"))

  /** Corpus bigram counts `(w1, w2, cnt)`. */
  def bigramCounts(docOcc: DataFrame): DataFrame =
    docOcc.groupBy("w1", "w2").agg(sum(col("occ")).as("cnt"))

  /** Context (bigram-prefix) counts `(w1, ctx)` — marginal of
    * [[bigramCounts]]. */
  def contextCounts(bigrams: DataFrame): DataFrame =
    bigrams.groupBy("w1").agg(sum(col("cnt")).as("ctx"))

  /** One-row vocabulary stat `(v)`: distinct normalized tokens in the
    * corpus, doc-final tokens included (they appear as bigram suffixes
    * but never prefixes — the smoothing denominator needs them). */
  def vocabStats(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(tokensUdf(col(textCol))).as("t"))
      .agg(countDistinct(col("t")).as("v"))

  /** Score documents off pre-built model frames: for every adjacent
    * token pair, `ln((cnt+k)/(ctx+k·v))`, rounded to micro-nats and
    * summed exactly. Output `(doc_id, n_bigrams, sum_scaled,
    * avg_logprob)`, one row per document that has at least one bigram.
    * Bigrams or contexts the model never saw coalesce to count 0 (the
    * smoothed floor), so scoring a corpus disjoint from the training
    * corpus is well-defined. */
  def scoreFromModel(docOcc: DataFrame, bigrams: DataFrame, ctx: DataFrame,
                     vocab: DataFrame, k: Double = 1.0): DataFrame = {
    require(k > 0, s"smoothing k must be positive, got $k")
    val contrib = round(
      log((coalesce(col("cnt"), lit(0L)) + lit(k)) /
          (coalesce(col("ctx"), lit(0L)) + lit(k) * col("v"))) * lit(1e6), 0)
      .cast("long")
    docOcc
      .join(bigrams, Seq("w1", "w2"), "left")
      .join(ctx, Seq("w1"), "left")
      .crossJoin(broadcast(vocab))
      .select(col("doc_id"), col("occ"), contrib.as("c"))
      .groupBy("doc_id")
      .agg(sum(col("occ") * col("c")).as("sum_scaled"),
        sum(col("occ")).as("n_bigrams"))
      .select(col("doc_id"), col("n_bigrams"), col("sum_scaled"),
        round(col("sum_scaled") / lit(1e6) / col("n_bigrams"), 4)
          .as("avg_logprob"))
  }

  /** One-shot self-scoring composition: train on `docs`, score `docs`.
    * The plan references the docOcc subtree from both the model and
    * scoring branches and Spark re-executes common subplans per branch
    * — the [[ensureBigramTables]] lifecycle is the corpus-scale form
    * (battery q70 vs q70b, same oracle). */
  def perplexityScore(docs: DataFrame, idCol: String, textCol: String,
                      k: Double = 1.0): DataFrame = {
    val occ = docBigramOcc(docs, idCol, textCol)
    val big = bigramCounts(occ)
    scoreFromModel(occ, big, contextCounts(big), vocabStats(docs, textCol), k)
  }

  /** CCNet's head/middle/tail selection: score every document with
    * the corpus bigram LM, then cut each language's score
    * distribution into `buckets` rank intervals — head = the
    * best-scored (least perplex) third, tail = the worst. The cut is
    * [[Sampling.valueRankBuckets]] over the 4-dp-quantized
    * `avg_logprob` (ordered DESCENDING — higher average
    * log-probability means lower perplexity), so no language ever
    * sorts its documents through one task: the distribution collapses
    * to a bounded (lang, score) histogram, cutoffs come from exact
    * integer rank arithmetic on that histogram, and the assignment
    * broadcasts back. Documents with fewer than two tokens have no
    * bigrams and drop, exactly as they do from [[perplexityScore]].
    *
    * Output: `(doc_id, lang, n_bigrams, sum_scaled, avg_logprob,
    * bucket)` with bucket ∈ [0, buckets). */
  def perplexityBuckets(docs: DataFrame, idCol: String, textCol: String,
                        langCol: String, buckets: Int = 3,
                        k: Double = 1.0): DataFrame =
    bucketsFromScores(perplexityScore(docs, idCol, textCol, k),
      docs, idCol, langCol, buckets)

  /** The cut half of [[perplexityBuckets]] applied to ANY
    * already-scored frame (`(doc_id, n_bigrams, sum_scaled,
    * avg_logprob)` — one-shot, persisted-table, or streamed-model
    * scoring all produce it): ONE implementation of the lang join +
    * histogram cut + column shape, so the q162/q162b serve paths
    * cannot drift from each other. */
  def bucketsFromScores(scored: DataFrame, docs: DataFrame, idCol: String,
                        langCol: String, buckets: Int = 3): DataFrame = {
    // Round-17 note: the histogram cut references this frame from two
    // branches (per-lang distinct-score histogram + row-side bucket
    // assignment), so the scoring subtree executes twice per call —
    // but pinning it here MEASURED a wash for the one-shot path
    // (1.95 s -> 1.90 at sf0.1) and a regression for the table-served
    // path (q162b 1.23 s -> 1.66: the recompute is two cheap table
    // scans, the cache build is a barrier). Left recomputing; at
    // corpus scale callers should materialize scores to a table and
    // serve the cut from it (the q162b lifecycle), not pin in-memory.
    val withLang = scored.join(
      docs.select(col(idCol).as("doc_id"), col(langCol).as("lang")),
      Seq("doc_id"))
    Sampling.valueRankBuckets(withLang, "lang", "avg_logprob",
        buckets, descending = true)
      .select("doc_id", "lang", "n_bigrams", "sum_scaled", "avg_logprob",
        "bucket")
  }

  /** Distinct normalized tokens of a corpus slice, one row per token —
    * the mergeable form of the vocabulary stat: a distinct-token TABLE
    * unions idempotently across increments (an anti-join append is a
    * no-op on replay), where the one-row `countDistinct` of
    * [[vocabStats]] cannot absorb a delta without re-reading the
    * corpus. */
  def distinctTokens(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(tokensUdf(col(textCol))).as("t")).distinct()

  /** The one-row `(v)` vocab stat off a [[distinctTokens]]-shaped
    * table. */
  def vocabFromTokens(tokens: DataFrame): DataFrame =
    tokens.agg(count(lit(1)).as("v"))

  /** Score a corpus off the STREAMED model state
    * ([[graft.streaming.Maintenance]]'s bigram-count + distinct-token
    * tables): context counts are the bigram table's prefix marginal —
    * derived here rather than persisted, so the streaming leg
    * maintains two tables, not three, and the marginal can never
    * drift out of sync with the counts it summarizes. Answers
    * exactly as [[perplexityScore]] over everything absorbed so far. */
  def scoreFromTables(spark: SparkSession, docs: DataFrame, idCol: String,
                      textCol: String, bigramsTable: String,
                      tokensTable: String, k: Double = 1.0): DataFrame = {
    val big = spark.table(bigramsTable)
    scoreFromModel(docBigramOcc(docs, idCol, textCol), big,
      contextCounts(big), vocabFromTokens(spark.table(tokensTable)), k)
  }

  /** Build-once/serve-many lifecycle: write bigram counts, context
    * counts and the vocab stat as catalog tables unless present
    * (idempotent; the [[Dedup.ensureNgramTables]] pattern — dataset
    * identity must ride in the table names). The corpus is read twice
    * per build (bigram pass + vocab pass), never per query. */
  def ensureBigramTables(spark: SparkSession, docs: => DataFrame,
                         idCol: String, textCol: String, bigramsTable: String,
                         ctxTable: String, vocabTable: String): Unit = {
    if (!spark.catalog.tableExists(bigramsTable)) {
      graft.sources.Warehouse.clearOrphanLocation(spark, bigramsTable)
      bigramCounts(docBigramOcc(docs, idCol, textCol))
        .write.mode("overwrite").saveAsTable(bigramsTable)
    }
    if (!spark.catalog.tableExists(ctxTable)) {
      graft.sources.Warehouse.clearOrphanLocation(spark, ctxTable)
      contextCounts(spark.table(bigramsTable))
        .write.mode("overwrite").saveAsTable(ctxTable)
    }
    if (!spark.catalog.tableExists(vocabTable)) {
      graft.sources.Warehouse.clearOrphanLocation(spark, vocabTable)
      vocabStats(docs, textCol)
        .write.mode("overwrite").saveAsTable(vocabTable)
    }
  }
}
