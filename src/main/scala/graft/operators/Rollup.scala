package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental rollup maintenance: keep a keyed aggregate table
  * up to date by merging the new partition's PARTIAL state into the
  * existing state instead of re-scanning history.
  *
  * At lake scale the rollup's input is append-only (a new hour/day of
  * events lands; yesterday's 100 TB never changes), so a full
  * recompute does ~all its work re-deriving numbers it already has.
  * The fix is the classic algebraic-aggregate split the engines'
  * partial/final phases use internally, lifted to the table level:
  * store the MERGEABLE state (count, sum, min, max) keyed by the
  * rollup dimensions, combine states with a union + re-aggregate
  * (associative + commutative, so any grouping of increments gives
  * the same state), and derive the non-mergeable outputs (avg) only
  * at report time. Merging an increment shuffles |distinct keys|
  * state rows, not history.
  *
  * q76 proves the identity the whole scheme rests on:
  * `report(merge(state(base), state(incr))) == report(state(all))`,
  * with the full recompute as the DuckDB oracle.
  */
object Rollup {

  private val StateCols = Seq("n", "s", "mn", "mx")

  /** The mergeable per-key state of `valCol` grouped by `keyCols` +
    * the event-time hour of `tsCol`.
    *
    * The sum accumulates as DECIMAL, not double: a double sum is
    * order-dependent in its last bits, and a state that differs by
    * the batching of its increments is not a state — the q76 data has
    * real rows (e.g. an avg of exactly 44.64125) where that last bit
    * flips the rounded report. Decimal addition is exact, so any
    * merge tree produces bit-identical state. min/max stay double —
    * no arithmetic, no order sensitivity. */
  def hourlyState(df: DataFrame, tsCol: String, valCol: String,
                  keyCols: Seq[String]): DataFrame = {
    val hour = date_format(date_trunc("hour", col(tsCol)), "yyyy-MM-dd HH:mm:ss")
    df.groupBy((hour.as("hour") +: keyCols.map(col)): _*)
      .agg(count(lit(1)).as("n"),
           sum(col(valCol).cast("decimal(20,4)")).as("s"),
           min(valCol).as("mn"), max(valCol).as("mx"))
  }

  /** Combine any number of partial states into one: union + re-sum.
    * count/sum merge by `sum`, min/max by `min`/`max` — all
    * associative and commutative, so increments can arrive in any
    * order and any batching. */
  def merge(states: DataFrame*): DataFrame = {
    require(states.nonEmpty, "merge needs at least one state")
    val keys = states.head.columns.filterNot(StateCols.contains)
    states.reduce(_ unionByName _)
      .groupBy(keys.toIndexedSeq.map(col): _*)
      .agg(sum("n").as("n"), sum("s").as("s"),
           min("mn").as("mn"), max("mx").as("mx"))
  }

  /** Derive the user-facing rollup from the state: the non-mergeable
    * avg comes from s/n here, never stored.
    *
    * The 4-dp average is computed in INTEGER 1e-4 UNITS with an exact
    * half-up division — `(2·su + n) div (2n)` for the non-negative
    * sums an events rollup carries — and only then divided by 10⁴ as
    * ONE IEEE double division any engine reproduces bit-for-bit.
    * `round(s/n, 4)` on doubles is NOT that: Spark's round works on
    * the double's shortest decimal representation while other engines
    * round the binary value, and real regenerated data lands averages
    * exactly on the 4-dp tie (1236.27/24 = 51.51125 — Spark said
    * 51.5113, DuckDB 51.5112; caught by the round-15 full-battery
    * sweep, 4 of 3600 hours). Integer units make the tie-break a
    * stated rule instead of a representation accident. */
  def report(state: DataFrame): DataFrame = {
    val keys = state.columns.filterNot(StateCols.contains).toIndexedSeq
    state
      .withColumn("__su", (col("s") * 10000).cast("long"))
      .withColumn("__au", expr("(__su * 2 + n) div (2 * n)"))
      .select(keys.map(col) ++ Seq(
        col("n"),
        (col("__su").cast("double") / 10000.0).as("total_value"),
        (col("__au").cast("double") / 10000.0).as("avg_value"),
        round(col("mn"), 4).as("min_value"),
        round(col("mx"), 4).as("peak_value")): _*)
  }
}
