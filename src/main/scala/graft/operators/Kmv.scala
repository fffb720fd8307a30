package graft.operators

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** KMV (k-minimum-values) distinct-count sketches with set algebra —
  * Bar-Yossef et al. 2002's counting sketch plus Beyer et al. 2007's
  * (SIGMOD, "On Synopses for Distinct-Value Estimation Under Multiset
  * Operations") union/intersection/difference estimators.
  *
  * A sketch is the k smallest distinct 64-bit hashes of a column —
  * a bounded `array<bigint>`, so the aggregation plans as a partial
  * aggregate with map-side combine: each input partition reduces to
  * one ≤ k-long array per group BEFORE the shuffle, and the exchange
  * carries O(partitions × groups × k) longs, never O(rows). Unlike
  * Spark's HLL sketches, KMV sketches support INTERSECTION and
  * DIFFERENCE estimates, not just union — "how many users both
  * clicked and viewed" across 100 TB without a distinct-join.
  *
  * Exactness contract (what the q91 oracle leans on): while a sketch
  * holds fewer than k hashes it IS the complete distinct hash set, so
  * every estimator below returns the exact distinct count (up to
  * 64-bit hash collisions, vanishing at any oracle-checkable scale
  * and deterministic in any case). Saturated sketches estimate with
  * relative error ~1/sqrt(k-2) (KmvSpec pins the bound on a 100k-ndv
  * stream at k=256).
  *
  * Internal representation: keys are the raw `xxhash64` value with the
  * sign bit flipped, so SIGNED array order equals UNSIGNED hash order;
  * arrays are sorted ascending and duplicate-free. The estimator maps
  * the k-th smallest back to a fraction of the full 2^64 hash space.
  */
object Kmv {

  /** Sign-flip: signed order of the stored key == unsigned order of
    * the raw hash. */
  @inline private def flip(h: Long): Long = h ^ Long.MinValue

  /** Merge two sorted duplicate-free key arrays, keeping the k
    * smallest. */
  private[operators] def mergeKeys(a: Array[Long], b: Array[Long],
                                   k: Int): Array[Long] = {
    val out = new Array[Long](math.min(a.length + b.length, k))
    var i = 0; var j = 0; var n = 0
    while (n < out.length && (i < a.length || j < b.length)) {
      val takeA = j >= b.length || (i < a.length && a(i) <= b(j))
      val v = if (takeA) a(i) else b(j)
      if (takeA) i += 1 else j += 1
      if (!takeA && i > 0 && a(i - 1) == v) ()          // dup across arrays
      else if (n > 0 && out(n - 1) == v) ()             // defensive dedup
      else { out(n) = v; n += 1 }
    }
    if (n == out.length) out else java.util.Arrays.copyOf(out, n)
  }

  private def contains(a: Array[Long], key: Long): Boolean =
    java.util.Arrays.binarySearch(a, key) >= 0

  /** Bounded distinct-min-hash accumulator. Steady-state rejection is
    * one comparison against the current max; accepted inserts (only
    * ~k·ln(n/k) of them over a whole stream) pay one array copy. */
  final class KmvAggregator(k: Int)
      extends Aggregator[Long, Array[Long], Array[Long]] {
    require(k >= 2, s"k must be >= 2, got $k")

    override def zero: Array[Long] = Array.emptyLongArray

    override def reduce(buf: Array[Long], h: Long): Array[Long] = {
      val key = flip(h)
      if (buf.length >= k && key >= buf(buf.length - 1)) buf
      else {
        val pos = java.util.Arrays.binarySearch(buf, key)
        if (pos >= 0) buf                               // already present
        else {
          val ins = -pos - 1
          val n = math.min(buf.length + 1, k)
          val out = new Array[Long](n)
          System.arraycopy(buf, 0, out, 0, ins)
          out(ins) = key
          System.arraycopy(buf, ins, out, ins + 1, n - ins - 1)
          out
        }
      }
    }

    override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
      mergeKeys(a, b, k)
    override def finish(r: Array[Long]): Array[Long] = r
    override def bufferEncoder: Encoder[Array[Long]] =
      ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Array[Long]] =
      ExpressionEncoder[Array[Long]]()
  }

  /** `kmvAgg(k)(col)` → the group's KMV sketch (`array<bigint>`).
    * NULLs hash to the xxhash64 seed value, i.e. count as one distinct
    * value — filter upstream if NULL should not count. */
  def kmvAgg(k: Int): Column => Column = {
    val agg = udaf(new KmvAggregator(k), Encoders.scalaLong)
    (c: Column) => agg(xxhash64(c))
  }

  /** The fraction of the 2^64 hash space at or below a stored key. */
  @inline private def fraction(key: Long): Double =
    (key.toDouble + 9.223372036854775808e18 + 1.0) / 1.8446744073709552e19

  /** Distinct-count estimate from a sketch: exact cardinality while
    * unsaturated, `(k-1)/U(k)` once the k-th minimum exists. */
  def estimateNdv(sketch: Array[Long], k: Int): Long =
    if (sketch.length < k) sketch.length.toLong
    else math.round((k - 1).toDouble / fraction(sketch(k - 1)))

  /** |A ∪ B|: merge (a union sketch is itself a valid sketch), then
    * estimate. */
  def unionEstimate(a: Array[Long], b: Array[Long], k: Int): Long =
    estimateNdv(mergeKeys(a, b, k), k)

  /** |A ∩ B| (Beyer et al. 2007): over the union sketch's k minima L,
    * the match fraction ρ = |L ∩ A ∩ B| / |L| times the union estimate.
    * Exact while the union sketch is unsaturated (complete sets). */
  def intersectEstimate(a: Array[Long], b: Array[Long], k: Int): Long = {
    val u = mergeKeys(a, b, k)
    val common = u.count(x => contains(a, x) && contains(b, x))
    if (u.length < k) common.toLong
    else math.round(common.toDouble / k * estimateNdv(u, k))
  }

  /** |A \ B|, same union-sketch argument with an in-A-not-in-B match. */
  def differenceEstimate(a: Array[Long], b: Array[Long], k: Int): Long = {
    val u = mergeKeys(a, b, k)
    val only = u.count(x => contains(a, x) && !contains(b, x))
    if (u.length < k) only.toLong
    else math.round(only.toDouble / k * estimateNdv(u, k))
  }

  // ---- Column forms, so estimates stay inside the plan (no collect)

  /** `ndvEst(k)(sketchCol)` → bigint estimate. */
  def ndvEst(k: Int): Column => Column = {
    val f = udf((s: Seq[Long]) => estimateNdv(s.toArray, k))
    (c: Column) => f(c)
  }

  /** `unionEst(k)(a, b)` → bigint |A ∪ B| estimate. */
  def unionEst(k: Int): (Column, Column) => Column = {
    val f = udf((a: Seq[Long], b: Seq[Long]) =>
      unionEstimate(a.toArray, b.toArray, k))
    (a: Column, b: Column) => f(a, b)
  }

  /** `intersectEst(k)(a, b)` → bigint |A ∩ B| estimate. */
  def intersectEst(k: Int): (Column, Column) => Column = {
    val f = udf((a: Seq[Long], b: Seq[Long]) =>
      intersectEstimate(a.toArray, b.toArray, k))
    (a: Column, b: Column) => f(a, b)
  }

  /** `diffEst(k)(a, b)` → bigint |A \ B| estimate. */
  def diffEst(k: Int): (Column, Column) => Column = {
    val f = udf((a: Seq[Long], b: Seq[Long]) =>
      differenceEstimate(a.toArray, b.toArray, k))
    (a: Column, b: Column) => f(a, b)
  }

  /** `mergeCol(k)(a, b)` → the merged sketch (`array<bigint>`), NULL
    * inputs treated as empty — the incremental-maintenance primitive:
    * stored state ∪ a micro-batch's sketch is itself a valid sketch,
    * and the merge is idempotent (re-merging a replayed batch's
    * sketch changes nothing — set union deduplicates). */
  def mergeCol(k: Int): (Column, Column) => Column = {
    val f = udf((a: Seq[Long], b: Seq[Long]) => mergeKeys(
      if (a == null) Array.emptyLongArray else a.toArray,
      if (b == null) Array.emptyLongArray else b.toArray, k))
    (a: Column, b: Column) => f(a, b)
  }
}
