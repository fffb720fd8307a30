package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Span-corruption objective assembly — the T5 denoising recipe
  * (Raffel et al. 2020 §3.1.4, public): sampled token SPANS are
  * replaced by sentinel tokens in the encoder input, and the decoder
  * target is the dropped spans, each prefixed by its sentinel, plus a
  * final sentinel — the objective every encoder-decoder pretraining
  * stack (T5/UL2 family) feeds on, and the complement of the q144 FIM
  * transform on the decoder-only side.
  *
  * Where T5 samples spans randomly, this engine derives them
  * DETERMINISTICALLY from the document id (the q181 LCG discipline),
  * so the corruption is a pure function of (id, tokens) that any
  * engine replays closed-form — the battery oracle rebuilds every
  * input/target id:
  *
  *  - `n_noise = round(n · density)` (integer half-up, exact),
  *    clamped to `n`; `n_spans = round(n_noise / mean_span)`, at
  *    least 1 when `n_noise > 0`;
  *  - the sequence splits into `n_spans` equal segments of
  *    `seg = n div n_spans` tokens; span k (0-based) has length
  *    `L_k = base + [k < rem]` (`base = n_noise div n_spans`,
  *    `rem = n_noise mod n_spans`), clamped to `seg`, and starts at
  *    `k·seg + (h_k mod (seg − L_k + 1))` where
  *    `h_k = (id·1103515245 + 12345 + k·2654435761) mod 2^31−1` —
  *    spans never touch segment boundaries' neighbors, so they are
  *    disjoint and ordered by construction;
  *  - sentinel ids count UP from `sentinelBase` (`<extra_id_k>`);
  *    the target ends with sentinel `n_spans` (T5's terminal
  *    sentinel).
  *
  * Degenerate docs degrade cleanly: `n = 0` (or a NULL array) yields
  * an empty input and the bare terminal sentinel is omitted too
  * (`n_spans = 0` → input = tokens, target = empty — nothing was
  * corrupted, nothing to decode).
  *
  * Everything is pure Column HOFs over closed-form arithmetic —
  * codegen, row-local, fuses into the scan; no UDF, no shuffle.
  * Invariants (DenoisingSpec): `|input| = n − n_noise + n_spans`,
  * `|target| = n_noise + n_spans + 1`, and splicing each target span
  * back over its sentinel reproduces the original ids exactly.
  */
object Denoising {

  /** Exact integer division for non-negative operands (house rule:
    * never float-divide where the oracle integer-divides). */
  private def idiv(a: Column, b: Column): Column =
    ((a - pmod(a, b)) / b).cast("long")

  def spanCorrupt(df: DataFrame, idCol: String, tokensCol: String,
                  sentinelBase: Long, densityPct: Int = 15,
                  meanSpan: Int = 3): DataFrame = {
    require(densityPct > 0 && densityPct <= 100,
      s"densityPct must be in (0, 100], got $densityPct")
    require(meanSpan > 0, s"meanSpan must be positive, got $meanSpan")
    val emptyL = array().cast("array<long>")
    val t = coalesce(col(tokensCol), emptyL)
    val n = size(t).cast("long")
    val id = col(idCol).cast("long")
    // round-half-up(n·pct/100) and round-half-up(nNoise/meanSpan)
    val nNoise = least(idiv(n * densityPct + 50L, lit(100L)), n)
    val nSpans = when(nNoise > 0,
      greatest(idiv(nNoise * 2 + meanSpan, lit(2 * meanSpan)), lit(1L)))
      .otherwise(lit(0L))
    val seg = when(nSpans > 0, idiv(n, nSpans)).otherwise(lit(0L))
    val base = when(nSpans > 0, idiv(nNoise, nSpans)).otherwise(lit(0L))
    val rem = when(nSpans > 0, pmod(nNoise, nSpans)).otherwise(lit(0L))
    // span table: (k, start, len), disjoint and ascending by k
    val spans = when(nSpans > 0 && seg > 0,
      transform(sequence(lit(0L), nSpans - 1), k => {
        val len0 = base + when(k < rem, 1L).otherwise(0L)
        val len = least(len0, seg)
        val h = pmod(id * 1103515245L + 12345L + k * 2654435761L,
          lit(2147483647L))
        val start = k * seg + pmod(h, seg - len + 1L)
        struct(k.as("k"), start.as("start"), len.as("len"))
      })).otherwise(array().cast(
        "array<struct<k:bigint,start:bigint,len:bigint>>"))
    // encoder input: inter-span slices with one sentinel per span
    val input = aggregate(spans,
      struct(lit(0L).as("pos"), emptyL.as("acc")),
      (s, sp) => struct(
        (sp.getField("start") + sp.getField("len")).as("pos"),
        concat(s.getField("acc"),
          slice(t, (s.getField("pos") + 1L).cast("int"),
            (sp.getField("start") - s.getField("pos")).cast("int")),
          array(sp.getField("k") + sentinelBase)).as("acc")),
      s => concat(s.getField("acc"),
        slice(t, (s.getField("pos") + 1L).cast("int"),
          (n - s.getField("pos")).cast("int"))))
    // decoder target: sentinel_k ++ dropped span k, terminal sentinel
    val target = when(nSpans > 0, concat(
      flatten(transform(spans, sp => concat(
        array(sp.getField("k") + sentinelBase),
        slice(t, (sp.getField("start") + 1L).cast("int"),
          sp.getField("len").cast("int"))))),
      array(nSpans + sentinelBase))).otherwise(emptyL)
    df.withColumn("input_ids", input)
      .withColumn("target_ids", target)
      .withColumn("n_input", size(col("input_ids")).cast("long"))
      .withColumn("n_target", size(col("target_ids")).cast("long"))
  }

  /** The PrefixLM / UL2 S-denoiser split (Raffel 2020 §3.1.2's
    * prefix-LM objective; Tay et al. 2022's S-denoiser, public):
    * the decoder learns to CONTINUE — target = the document's final
    * quarter (always at least one token on non-empty docs), input =
    * the prefix plus the sentinel, target = sentinel + suffix +
    * terminal sentinel (the q185 sentinel grammar, so R/X/S modes
    * mix in one batch with one decoder contract). Deterministic —
    * the split point is pure arithmetic, no sampling at all. Same
    * degenerate behavior as [[spanCorrupt]]: empty/NULL docs pass
    * through empty. Pure Column ops, row-local. */
  def prefixLmSplit(df: DataFrame, idCol: String, tokensCol: String,
                    sentinelBase: Long): DataFrame = {
    val emptyL = array().cast("array<long>")
    val t = coalesce(col(tokensCol), emptyL)
    val n = size(t).cast("long")
    val split = when(n > 0, n - greatest(idiv(n, lit(4L)), lit(1L)))
      .otherwise(lit(0L))
    val input = when(n > 0,
      concat(slice(t, lit(1), split.cast("int")), array(lit(sentinelBase))))
      .otherwise(emptyL)
    val target = when(n > 0,
      concat(array(lit(sentinelBase)),
        slice(t, (split + 1L).cast("int"), (n - split).cast("int")),
        array(lit(sentinelBase + 1L))))
      .otherwise(emptyL)
    df.withColumn("input_ids", input)
      .withColumn("target_ids", target)
      .withColumn("n_input", size(col("input_ids")).cast("long"))
      .withColumn("n_target", size(col("target_ids")).cast("long"))
  }
}
