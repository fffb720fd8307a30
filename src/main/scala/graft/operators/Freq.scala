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

  final class MisraGriesAggregator(capacity: Int)
      extends Aggregator[String, Map[String, Long], Seq[TermCount]] {
    require(capacity >= 1, s"capacity must be >= 1, got $capacity")

    override def zero: Map[String, Long] = Map.empty

    override def reduce(buf: Map[String, Long], term: String): Map[String, Long] =
      if (term == null) buf
      else buf.get(term) match {
        case Some(c) => buf.updated(term, c + 1)
        case None if buf.size < capacity => buf.updated(term, 1L)
        case None =>
          // classic MG: no room — decrement every counter, drop zeros
          // (the newcomer is absorbed into the shared decrement)
          buf.collect { case (t, c) if c > 1 => t -> (c - 1) }
      }

    override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
      if (a.isEmpty) return b
      if (b.isEmpty) return a
      val m = b.foldLeft(a) { case (acc, (t, c)) =>
        acc.updated(t, acc.getOrElse(t, 0L) + c)
      }
      if (m.size <= capacity) m
      else {
        // subtract the (capacity+1)-th largest count from everything;
        // at most `capacity` strictly-positive entries survive
        val counts = m.values.toArray
        java.util.Arrays.sort(counts)
        val thresh = counts(counts.length - capacity - 1)
        m.collect { case (t, c) if c > thresh => t -> (c - thresh) }
      }
    }

    override def finish(r: Map[String, Long]): Seq[TermCount] =
      r.toSeq.map { case (t, c) => TermCount(t, c) }
        .sortBy(tc => (-tc.count, tc.term))

    override def bufferEncoder: Encoder[Map[String, Long]] =
      ExpressionEncoder[Map[String, Long]]()
    override def outputEncoder: Encoder[Seq[TermCount]] =
      ExpressionEncoder[Seq[TermCount]]()
  }

  /** `frequentTerms(capacity)(termCol)` →
    * `array<struct<term,count>>` sorted count desc, term asc. NULL
    * terms are ignored. */
  def frequentTerms(capacity: Int): Column => Column = {
    val agg = udaf(new MisraGriesAggregator(capacity), Encoders.STRING)
    (c: Column) => agg(c)
  }
}
