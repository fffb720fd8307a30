package graft.operators

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Misra-Gries frequent-items ("heavy hitters") sketch — Misra &
  * Gries 1982, with the mergeable-summaries combine step of Agarwal
  * et al. 2013 (PODS, "Mergeable Summaries").
  *
  * The exact top-k terms of a 100 TB corpus via `groupBy(term)` is a
  * full |vocab|-keyed shuffle of every token occurrence. This
  * aggregator keeps a bounded ≤ `capacity`-entry counter map instead,
  * so Spark plans it as a partial aggregate with map-side combine:
  * each input partition reduces to one small map BEFORE the shuffle
  * and the exchange carries O(partitions × capacity) entries, never
  * O(tokens).
  *
  * Guarantees (n = total count aggregated, c = capacity):
  *  - every stored count ĉ(t) satisfies
  *    `true(t) − n/(c+1) ≤ ĉ(t) ≤ true(t)`;
  *  - every term with `true(t) > n/(c+1)` IS in the sketch —
  *    no false negatives above the frequency floor;
  *  - while the map never overflows (distinct terms ≤ c throughout,
  *    e.g. a capacity comfortably above the vocabulary bound), no
  *    decrement ever fires and all counts are EXACT — the q92 oracle
  *    regime, where results equal the groupBy-count truth and are
  *    partitioning-independent.
  * Saturated sketches stay inside the ε-bound but the exact stored
  * values depend on merge order (inherent to mergeable MG) — treat
  * them as estimates, as FreqSpec pins.
  */
object Freq {

  /** One reported term with its (lower-bound) count. */
  final case class TermCount(term: String, count: Long)

  /** Classic MG point update. */
  private def mgReduce(capacity: Int)(buf: Map[String, Long],
                                      term: String): Map[String, Long] =
    if (term == null) buf
    else buf.get(term) match {
      case Some(c) => buf.updated(term, c + 1)
      case None if buf.size < capacity => buf.updated(term, 1L)
      case None =>
        // no room — decrement every counter, drop zeros (the newcomer
        // is absorbed into the shared decrement)
        buf.collect { case (t, c) if c > 1 => t -> (c - 1) }
    }

  /** Mergeable-summaries combine: sum counts, then subtract the
    * (capacity+1)-th largest from everything — at most `capacity`
    * strictly-positive entries survive. */
  private def mgMerge(capacity: Int)(a: Map[String, Long],
                                     b: Map[String, Long]): Map[String, Long] = {
    if (a.isEmpty) return b
    if (b.isEmpty) return a
    val m = b.foldLeft(a) { case (acc, (t, c)) =>
      acc.updated(t, acc.getOrElse(t, 0L) + c)
    }
    if (m.size <= capacity) m
    else {
      val counts = m.values.toArray
      java.util.Arrays.sort(counts)
      val thresh = counts(counts.length - capacity - 1)
      m.collect { case (t, c) if c > thresh => t -> (c - thresh) }
    }
  }

  /** Deterministic presentation order: count desc, term asc. */
  private def mgSorted(r: Map[String, Long]): Seq[TermCount] =
    r.toSeq.map { case (t, c) => TermCount(t, c) }
      .sortBy(tc => (-tc.count, tc.term))

  final class MisraGriesAggregator(capacity: Int)
      extends Aggregator[String, Map[String, Long], Seq[TermCount]] {
    require(capacity >= 1, s"capacity must be >= 1, got $capacity")
    override def zero: Map[String, Long] = Map.empty
    override def reduce(buf: Map[String, Long], term: String): Map[String, Long] =
      mgReduce(capacity)(buf, term)
    override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] =
      mgMerge(capacity)(a, b)
    override def finish(r: Map[String, Long]): Seq[TermCount] = mgSorted(r)
    override def bufferEncoder: Encoder[Map[String, Long]] =
      ExpressionEncoder[Map[String, Long]]()
    override def outputEncoder: Encoder[Seq[TermCount]] =
      ExpressionEncoder[Seq[TermCount]]()
  }

  /** [[MisraGriesAggregator]] that emits the raw counter map
    * (`map<string,bigint>`) — the storable/mergeable state form for
    * incremental maintenance ([[mergeCol]] / [[Telemetry]]). */
  final class MisraGriesMapAggregator(capacity: Int)
      extends Aggregator[String, Map[String, Long], Map[String, Long]] {
    require(capacity >= 1, s"capacity must be >= 1, got $capacity")
    override def zero: Map[String, Long] = Map.empty
    override def reduce(buf: Map[String, Long], term: String): Map[String, Long] =
      mgReduce(capacity)(buf, term)
    override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] =
      mgMerge(capacity)(a, b)
    override def finish(r: Map[String, Long]): Map[String, Long] = r
    override def bufferEncoder: Encoder[Map[String, Long]] =
      ExpressionEncoder[Map[String, Long]]()
    override def outputEncoder: Encoder[Map[String, Long]] =
      ExpressionEncoder[Map[String, Long]]()
  }

  /** `frequentTerms(capacity)(termCol)` →
    * `array<struct<term,count>>` sorted count desc, term asc. NULL
    * terms are ignored. */
  def frequentTerms(capacity: Int): Column => Column = {
    val agg = udaf(new MisraGriesAggregator(capacity), Encoders.STRING)
    (c: Column) => agg(c)
  }

  /** `frequentTermsMap(capacity)(termCol)` → the raw counter map
    * (`map<string,bigint>`), the form [[mergeCol]] merges. */
  def frequentTermsMap(capacity: Int): Column => Column = {
    val agg = udaf(new MisraGriesMapAggregator(capacity), Encoders.STRING)
    (c: Column) => agg(c)
  }

  /** `mergeCol(capacity)(a, b)` → two counter maps merged under the
    * same mergeable-summaries rule, NULL inputs treated as empty —
    * the incremental-maintenance primitive. NOT idempotent
    * (re-merging a replayed batch double-counts): drive it through a
    * batch-id ledger. */
  def mergeCol(capacity: Int): (Column, Column) => Column = {
    val f = udf((a: Map[String, Long], b: Map[String, Long]) =>
      mgMerge(capacity)(if (a == null) Map.empty[String, Long] else a,
        if (b == null) Map.empty[String, Long] else b))
    (a: Column, b: Column) => f(a, b)
  }

  /** `topOfMap(mapCol)` → the map's best `struct<term,count>` under
    * (count desc, term asc), NULL for an empty/NULL map — the
    * deterministic report side of the map form. */
  def topOfMap: Column => Column = {
    val f = udf((m: Map[String, Long]) =>
      if (m == null || m.isEmpty) None else Some(mgSorted(m).head))
    (c: Column) => f(c)
  }
}
