package graft.operators

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Distributed per-group top-k without a window function.
  *
  * `row_number() OVER (PARTITION BY group)` shuffles every scored row
  * into one partition per group — a single task per group is the skew
  * and parallelism ceiling at 100 TB (round-1 verdict #4). This
  * aggregator keeps a bounded best-k buffer instead, so Spark plans it
  * as a partial aggregate (map-side combine): each input partition
  * reduces to ≤ k rows per group *before* the shuffle, and the exchange
  * carries O(partitions × groups × k) rows, never O(rows).
  *
  * Ordering: score descending, id ascending on ties — identical to the
  * `ORDER BY cosine DESC, corpus_id` window it replaces, so results are
  * deterministic and oracle-stable.
  */
object TopK {

  /** One scored candidate. Ids are integral (bigint-castable) — callers
    * with string ids should rank a surrogate and join back. */
  final case class Scored(id: Long, score: Double)

  /** Bounded top-k accumulator; buffer kept sorted best-first, ≤ k.
    * Ordering is total via `java.lang.Double.compare` — NaN ranks as the
    * greatest score (matching Spark's sort order, and therefore the
    * `ORDER BY score DESC` window this aggregate replaces), so results
    * stay deterministic even for NaN scores (e.g. zero-norm cosines). */
  final class TopKAggregator(k: Int) extends Aggregator[Scored, Seq[Scored], Seq[Scored]] {
    private def better(a: Scored, b: Scored): Boolean = {
      val c = java.lang.Double.compare(a.score, b.score)
      if (c != 0) c > 0 else a.id < b.id
    }

    private def insert(buf: Seq[Scored], x: Scored): Seq[Scored] =
      if (buf.length >= k && better(buf.last, x)) buf
      else (buf :+ x).sortWith(better).take(k)

    override def zero: Seq[Scored] = Seq.empty
    override def reduce(buf: Seq[Scored], x: Scored): Seq[Scored] = insert(buf, x)
    override def merge(a: Seq[Scored], b: Seq[Scored]): Seq[Scored] = b.foldLeft(a)(insert)
    override def finish(r: Seq[Scored]): Seq[Scored] = r
    override def bufferEncoder: Encoder[Seq[Scored]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
    override def outputEncoder: Encoder[Seq[Scored]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
  }

  /** Column form: `topK(k)(idCol, scoreCol)` → array<struct<id,score>>
    * of the k best rows in the group, best first. */
  def topK(k: Int): (Column, Column) => Column = {
    val agg = udaf(new TopKAggregator(k), Encoders.product[Scored])
    (id: Column, score: Column) => agg(id, score)
  }
}
