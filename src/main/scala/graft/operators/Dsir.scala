package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** DSIR-style importance scoring for data selection (Xie et al. 2023,
  * "Data Selection for Language Models via Importance Resampling" —
  * public): fit hashed-n-gram multinomial distributions over a TARGET
  * corpus (what you want more of) and the RAW source corpus, then
  * score every raw document by its log importance ratio
  * `log w(x) = Σ_b n_b(x) · (log p_b − log q_b)` with add-1 smoothing.
  * Selection composes downstream ([[Sampling.topFractionBy]] /
  * [[Sampling.fixedSizeSample]] on the score — the paper's top-k
  * heuristic, or Gumbel-perturbed resampling).
  *
  * Features are unigram + bigram hashes bucketed mod `dim` (the
  * hashing trick — no vocabulary table, no shuffle to build one),
  * using the exact mix64∘FNV-1a kernel of [[Sketches.tokenHashes]]
  * (bigrams hash the string "w1 w2"), which is what lets a DuckDB
  * oracle replay the whole pipeline (battery q89).
  *
  * Exactness discipline (the q85 integer-score pattern): each
  * bucket's log ratio is quantized ONCE, driver-side, to integer
  * micro-units — `floor(1e6·lr + 0.5)`, the same expression the
  * oracle evaluates on the same integer ln arguments — and a
  * document's score is the exact integer sum of its buckets'
  * micro-ratios. Summation order can never change the answer, so the
  * score is bit-identical across engines, partitionings, and reruns.
  *
  * Scale shape: fitting is one pass per corpus producing ≤ `dim`
  * count rows (map-side combine); the ratio table is dim-sized
  * (broadcast in the scoring UDF's closure); scoring is one narrow
  * pass with no join and no shuffle. Nothing is ever vocabulary- or
  * corpus-sized on the driver.
  */
object Dsir {

  /** Unigram + bigram feature buckets of one document, multiplicity
    * kept (multinomial counts, not presence). Tokens split on
    * whitespace, lowercased per char; bigram hash = the FNV-1a∘mix64
    * hash of "tok1 tok2". One JVM pass, no intermediate strings. */
  private[operators] def gramBuckets(text: String, dim: Int): Array[Int] = {
    if (text == null) return Array.emptyIntArray
    val mask = dim - 1
    val out = Array.newBuilder[Int]
    // FNV-1a over the lowercased chars of [start, end)
    def fnvRange(s: String, start: Int, end: Int, h0: Long): Long = {
      var h = h0
      var i = start
      while (i < end) {
        h ^= Character.toLowerCase(s.charAt(i)).toLong
        h *= 0x100000001b3L
        i += 1
      }
      h
    }
    val Fnv0 = 0xcbf29ce484222325L
    var prevStart = -1
    var prevEnd = -1
    var i = 0
    val n = text.length
    while (i < n) {
      while (i < n && Sketches.isRegexWs(text.charAt(i))) i += 1
      val start = i
      while (i < n && !Sketches.isRegexWs(text.charAt(i))) i += 1
      if (i > start) {
        out += (Sketches.mix64(fnvRange(text, start, i, Fnv0)) & mask).toInt
        if (prevStart >= 0) {
          // bigram = FNV over "prev cur" (single space), then mix64
          var h = fnvRange(text, prevStart, prevEnd, Fnv0)
          h ^= ' '.toLong; h *= 0x100000001b3L
          h = fnvRange(text, start, i, h)
          out += (Sketches.mix64(h) & mask).toInt
        }
        prevStart = start; prevEnd = i
      }
    }
    out.result()
  }

  private def requirePow2(dim: Int): Unit =
    require(dim >= 2 && (dim & (dim - 1)) == 0,
      s"dim must be a power of two for hash-mask bucketing, got $dim")

  /** Per-bucket gram counts of a corpus: `(bucket, cnt)`, absent
    * buckets omitted. One corpus pass; the aggregate output is
    * ≤ `dim` rows. */
  def bucketCounts(docs: DataFrame, textCol: String, dim: Int): DataFrame = {
    requirePow2(dim)
    val kernel = udf { (text: String) => gramBuckets(text, dim) }
    docs.select(explode(kernel(col(textCol))).as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("cnt"))
  }

  /** Fit the per-bucket integer micro log-ratio table
    * `floor(1e6·(ln(tc_b+1) − ln(T+dim) − ln(sc_b+1) + ln(S+dim)) + 0.5)`
    * (add-1-smoothed multinomials; the exact ln-argument decomposition
    * the q89 oracle replays on the same integers). Driver state is the
    * two ≤dim-row count maps — bounded at any corpus size. */
  def fitLogRatioMicro(target: DataFrame, source: DataFrame, textCol: String,
                       dim: Int): Array[Long] = {
    requirePow2(dim)
    def counts(df: DataFrame): Map[Int, Long] =
      bucketCounts(df, textCol, dim).collect()
        .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val tc = counts(target)
    val sc = counts(source)
    val tTot = tc.values.sum
    val sTot = sc.values.sum
    val lnT = math.log(tTot + dim.toDouble)
    val lnS = math.log(sTot + dim.toDouble)
    Array.tabulate(dim) { b =>
      val lr = math.log(tc.getOrElse(b, 0L) + 1.0) - lnT -
        math.log(sc.getOrElse(b, 0L) + 1.0) + lnS
      math.floor(lr * 1e6 + 0.5).toLong
    }
  }

  /** Per-document importance score under a fitted micro ratio table:
    * `(doc_id, n_grams, score_micro)` with
    * `score_micro = Σ lrMicro(bucket)` over the doc's grams
    * (multiplicity kept) — an EXACT integer. One narrow pass; the
    * table rides the UDF closure. */
  def importanceScoreMicro(docs: DataFrame, idCol: String, textCol: String,
                           lrMicro: Array[Long]): DataFrame = {
    val dim = lrMicro.length
    requirePow2(dim)
    val kernel = udf { (text: String) =>
      val bs = gramBuckets(text, dim)
      var s = 0L
      var i = 0
      while (i < bs.length) { s += lrMicro(bs(i)); i += 1 }
      (bs.length.toLong, s)
    }
    docs.select(col(idCol).as("doc_id"), kernel(col(textCol)).as("r"))
      .select(col("doc_id"), col("r._1").as("n_grams"),
        col("r._2").as("score_micro"))
  }

  /** Jensen-Shannon drift between two corpus slices over the same
    * hashed-gram feature space — the distribution-shift monitor a
    * continuously-ingested corpus needs ("did this crawl snapshot's
    * token mix move away from the reference slice?"). Distributions
    * are add-1-smoothed multinomials over the `dim` buckets (every
    * bucket carries mass, so absent-from-both buckets still
    * contribute their smoothing term and the divergence of identical
    * slices is exactly zero).
    *
    * Exactness discipline: each bucket's two midpoint-KL terms
    * `m_a·ln(2·m_a/(m_a+m_b))` and `m_b·ln(2·m_b/(m_a+m_b))` are
    * quantized to integer PICO-units — `floor(x·1e12 + 0.5)` — with a
    * fixed float expression tree (every step a correctly-rounded
    * IEEE op except `ln`, whose ≤1-ulp spread sits ~4 orders of
    * magnitude under the quantization step), and the totals are exact
    * integer sums, so the result is stable across partitionings and
    * engines; the q97 oracle replays the identical expression in
    * DuckDB. `js2_pico = kl_a_pico + kl_b_pico` is TWICE the JS
    * divergence (in pico-nats) — kept unsplit so no engine ever
    * divides an integer. Bounds: `0 ≤ js2_pico ≲ 2·ln2·1e12`.
    *
    * Scale shape: one pass per slice (≤ dim count rows out), then all
    * arithmetic on a `dim`-row frame built from `range(dim)` with the
    * two count maps broadcast-joined on — nothing corpus-sized moves,
    * nothing is collected. Output is ONE row:
    * `(grams_a, grams_b, kl_a_pico, kl_b_pico, js2_pico)`.
    */
  def jsDivergencePico(a: DataFrame, b: DataFrame, textCol: String,
                       dim: Int): DataFrame =
    jsDivergencePicoFromCounts(bucketCounts(a, textCol, dim),
      bucketCounts(b, textCol, dim), dim)

  /** Per-(group, bucket) gram counts — the MERGEABLE drift state:
    * counts add under union, so per-slice distributions can be
    * maintained from a stream (see
    * [[graft.streaming.Maintenance.streamingDriftCounts]]) and
    * history is never re-read. One corpus pass; ≤ |groups|·dim rows
    * out, map-side combine. */
  def bucketCountsBy(docs: DataFrame, groupCol: String, textCol: String,
                     dim: Int): DataFrame = {
    requirePow2(dim)
    val kernel = udf { (text: String) => gramBuckets(text, dim) }
    docs.select(col(groupCol), explode(kernel(col(textCol))).as("bucket"))
      .groupBy(col(groupCol), col("bucket")).agg(count(lit(1)).as("cnt"))
  }

  /** [[jsDivergencePico]] over pre-aggregated `(bucket, cnt)` count
    * frames — the serve path off maintained drift state (filter the
    * state to a slice, re-sum by bucket, feed here). Identical
    * arithmetic, identical result. */
  def jsDivergencePicoFromCounts(countsA: DataFrame, countsB: DataFrame,
                                 dim: Int): DataFrame = {
    requirePow2(dim)
    val spark = countsA.sparkSession
    val ca = countsA.select(col("bucket"), col("cnt").as("__ca"))
    val cb = countsB.select(col("bucket"), col("cnt").as("__cb"))
    val ta = ca.agg(coalesce(sum("__ca"), lit(0L)).as("__ta"))
    val tb = cb.agg(coalesce(sum("__cb"), lit(0L)).as("__tb"))
    val per = spark.range(dim).select(col("id").cast("int").as("bucket"))
      .join(broadcast(ca), Seq("bucket"), "left")
      .join(broadcast(cb), Seq("bucket"), "left")
      .crossJoin(broadcast(ta)).crossJoin(broadcast(tb))
    // fixed expression tree, mirrored verbatim by the q97 oracle SQL
    val ma = (coalesce(col("__ca"), lit(0L)) + lit(1L)).cast("double") /
      (col("__ta") + lit(dim.toLong)).cast("double")
    val mb = (coalesce(col("__cb"), lit(0L)) + lit(1L)).cast("double") /
      (col("__tb") + lit(dim.toLong)).cast("double")
    val ka = floor(ma * log(lit(2.0) * ma / (ma + mb)) * lit(1e12) + lit(0.5))
    val kb = floor(mb * log(lit(2.0) * mb / (ma + mb)) * lit(1e12) + lit(0.5))
    per.agg(max(col("__ta")).as("grams_a"), max(col("__tb")).as("grams_b"),
        sum(ka).as("kl_a_pico"), sum(kb).as("kl_b_pico"),
        (sum(ka) + sum(kb)).as("js2_pico"))
  }

  /** The FULL pairwise drift matrix over a per-group count frame
    * ([[bucketCountsBy]] output or a [[graft.streaming.Maintenance.streamingDriftCounts]]
    * state table): `(group_a, group_b, js2_pico)` for every unordered
    * group pair — the monitoring dashboard's "which sources are
    * drifting apart" view, computed in ONE plan instead of
    * |groups|² [[jsDivergencePicoFromCounts]] calls. Arithmetic is
    * the identical fixed expression tree, so each matrix cell equals
    * the two-slice call bit-for-bit (spec-pinned) and the q110 oracle
    * replays the whole matrix.
    *
    * Scale shape: densify to |groups|·dim rows (every bucket carries
    * smoothing mass even where absent), self-join on `bucket`
    * (|groups|²·dim rows — at 4096 buckets and a few hundred
    * sources this is millions, not billions), quantize per bucket,
    * integer-sum per pair. Nothing driver-side. */
  def jsDriftMatrixPico(countsBy: DataFrame, groupCol: String,
                        dim: Int): DataFrame = {
    requirePow2(dim)
    val spark = countsBy.sparkSession
    val groups = countsBy.select(col(groupCol).as("__g")).distinct()
    val tot = countsBy.groupBy(col(groupCol).as("__tg"))
      .agg(sum(col("cnt")).as("__t"))
    val dense = groups
      .crossJoin(spark.range(dim).select(col("id").cast("int").as("bucket")))
      .join(countsBy.select(col(groupCol).as("__g"), col("bucket"), col("cnt")),
        Seq("__g", "bucket"), "left")
      .join(broadcast(tot), col("__g") === col("__tg"))
      .select(col("__g"), col("bucket"),
        ((coalesce(col("cnt"), lit(0L)) + lit(1L)).cast("double") /
          (col("__t") + lit(dim.toLong)).cast("double")).as("__m"))
    val a = dense.select(col("__g").as("ga"), col("bucket"),
      col("__m").as("ma"))
    val b = dense.select(col("__g").as("gb"), col("bucket"),
      col("__m").as("mb"))
    val ka = floor(col("ma") * log(lit(2.0) * col("ma") /
      (col("ma") + col("mb"))) * lit(1e12) + lit(0.5))
    val kb = floor(col("mb") * log(lit(2.0) * col("mb") /
      (col("ma") + col("mb"))) * lit(1e12) + lit(0.5))
    a.join(b, Seq("bucket")).filter(col("ga") < col("gb"))
      .select(col("ga"), col("gb"), ka.as("__ka"), kb.as("__kb"))
      .groupBy(col("ga").as("group_a"), col("gb").as("group_b"))
      .agg((sum(col("__ka")) + sum(col("__kb"))).as("js2_pico"))
  }
}
