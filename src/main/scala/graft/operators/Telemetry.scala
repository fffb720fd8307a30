package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Text

/** Continuous corpus telemetry: per-group document/token counts plus
  * a KMV distinct-token sketch ([[Kmv]]) and a Misra-Gries
  * heavy-hitter sketch ([[Freq]]), held as ONE mergeable state frame
  * of |groups| rows.
  *
  * This is the monitoring surface a growing 100 TB corpus actually
  * needs: "how many docs/tokens per source, how diverse is each
  * source's vocabulary, what dominates it" — answered continuously
  * WITHOUT re-reading history, because every column is mergeable:
  * counts add, KMV sketches union (idempotently), MG sketches combine
  * under the mergeable-summaries rule. A micro-batch contributes one
  * |groups|-row increment; state size never depends on corpus size.
  *
  * Exactness: in the unsaturated regime (per-group distinct tokens
  * below both `k` and `capacity`) the sketches are complete, so ndv
  * and top-term counts are exact — the battery (q93) oracle regime.
  * Saturated behavior inherits each sketch's pinned bounds.
  *
  * The streamed lifecycle lives in
  * [[graft.streaming.Maintenance.streamingTelemetry]]; merge is NOT
  * idempotent in the count/MG columns, so that path drives it through
  * the batch-id ledger. TelemetrySpec pins streamed == one-shot.
  */
object Telemetry {

  /** One-shot telemetry over a document frame: `groupCol, n_docs,
    * n_tokens, kmv array<bigint>, mg map<string,bigint>`. Two narrow
    * aggregations (docs, exploded tokens) joined on the group key —
    * both shuffles carry per-group aggregates, never documents. */
  def telemetry(df: DataFrame, groupCol: String, textCol: String,
                k: Int = 4096, capacity: Int = 4096): DataFrame = {
    val toks = df.select(col(groupCol),
      explode(Text.tokens(col(textCol))).as("__term"))
    val tok = toks.groupBy(groupCol).agg(
      count(lit(1)).as("n_tokens"),
      Kmv.kmvAgg(k)(col("__term")).as("kmv"),
      Freq.frequentTermsMap(capacity)(col("__term")).as("mg"))
    val docs = df.groupBy(groupCol).agg(count(lit(1)).as("n_docs"))
    docs.join(tok, Seq(groupCol), "full_outer")
      .select(col(groupCol),
        coalesce(col("n_docs"), lit(0L)).as("n_docs"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("kmv"), array().cast("array<bigint>")).as("kmv"),
        coalesce(col("mg"), map().cast("map<string,bigint>")).as("mg"))
  }

  /** Merge two telemetry frames (state ∪ increment): counts add, KMV
    * sketches union, MG sketches combine. A |groups|-row full-outer
    * join — state never grows with history. */
  def merge(state: DataFrame, incr: DataFrame, groupCol: String,
            k: Int = 4096, capacity: Int = 4096): DataFrame = {
    val s = state.select(col(groupCol), col("n_docs").as("__sd"),
      col("n_tokens").as("__st"), col("kmv").as("__sk"), col("mg").as("__sm"))
    val i = incr.select(col(groupCol), col("n_docs").as("__id"),
      col("n_tokens").as("__it"), col("kmv").as("__ik"), col("mg").as("__im"))
    s.join(i, Seq(groupCol), "full_outer")
      .select(col(groupCol),
        (coalesce(col("__sd"), lit(0L)) + coalesce(col("__id"), lit(0L))).as("n_docs"),
        (coalesce(col("__st"), lit(0L)) + coalesce(col("__it"), lit(0L))).as("n_tokens"),
        Kmv.mergeCol(k)(col("__sk"), col("__ik")).as("kmv"),
        Freq.mergeCol(capacity)(col("__sm"), col("__im")).as("mg"))
  }

  /** Human/oracle-facing report off the state: `groupCol, n_docs,
    * n_tokens, ndv_tokens, top_term, top_n`. Exact in the
    * unsaturated regime, estimates otherwise. */
  def report(state: DataFrame, groupCol: String, k: Int = 4096): DataFrame =
    state.select(col(groupCol), col("n_docs"), col("n_tokens"),
        Kmv.ndvEst(k)(col("kmv")).as("ndv_tokens"),
        Freq.topOfMap(col("mg")).as("__top"))
      .select(col(groupCol), col("n_docs"), col("n_tokens"), col("ndv_tokens"),
        col("__top.term").as("top_term"), col("__top.count").as("top_n"))
}
