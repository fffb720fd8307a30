package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Column profiling for pipeline health gates: row count, null count,
  * distinct count, and min/max per column, emitted as one narrow
  * (col_name, metric-per-column) frame.
  *
  * A curation pipeline wants this after every stage — a filter that
  * silently nulled a column or collapsed its cardinality should fail
  * the run, not surface in a training curve weeks later.
  *
  * The DEFAULT gate uses `approx_count_distinct` (HLL±5%), and that
  * choice is about plan shape, not just estimator cost: N exact
  * `countDistinct`s in one `agg` compile to an Expand that replicates
  * every input row N+1 ways before the shuffle — a ~7x shuffle
  * amplification on a 6-column profile, which at 100 TB is the
  * difference between a cheap invariant check and a full extra
  * pipeline stage. The approx path is genuinely one pass with no
  * Expand (PlanSpec pins this), which is what a between-every-two-
  * stages gate must be. `exactDistinct = true` keeps the exact
  * semantics for small tables and cross-engine oracling (q81) and
  * knowingly pays the Expand.
  *
  * min/max are emitted as strings so heterogeneous columns share one
  * schema; both engines compare ASCII strings bytewise, and numeric
  * columns stringify AFTER the typed min/max (no lexicographic-number
  * trap).
  */
object Profile {

  /** The one-row wide aggregate the profile pivots from — exposed so
    * plan tests can assert the default path compiles without Expand. */
  private[graft] def profileAgg(df: DataFrame, cols: Seq[String],
                                exactDistinct: Boolean): DataFrame = {
    val aggs = cols.flatMap { c =>
      val distinctAgg =
        if (exactDistinct) countDistinct(col(c))
        else approx_count_distinct(col(c))
      Seq(count(lit(1)).as(s"${c}__n"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nulls"),
        distinctAgg.as(s"${c}__distinct"),
        min(col(c)).cast("string").as(s"${c}__min"),
        max(col(c)).cast("string").as(s"${c}__max"))
    }
    df.agg(aggs.head, aggs.tail: _*)
  }

  /** Profile `cols` of `df` as `(col_name, n, nulls, n_distinct,
    * min_s, max_s)`.
    *
    * API NOTE (behavior change in round 7, kept deliberately):
    * `n_distinct` is an `approx_count_distinct` HLL estimate (±5%
    * relative error) unless `exactDistinct = true`. A caller using the
    * profile as an exact-cardinality equality gate MUST pass
    * `exactDistinct = true`; the approx default exists because the
    * exact form's Expand plan is a ~(cols+1)× shuffle amplification
    * (scaladoc above) — the wrong default for a between-every-two-
    * stages health gate at scale. `n`, `nulls`, `min_s`, `max_s` are
    * exact under both modes. */
  def profile(df: DataFrame, cols: Seq[String],
              exactDistinct: Boolean = false): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val row = profileAgg(df, cols, exactDistinct).head()
    val spark = df.sparkSession
    import spark.implicits._
    cols.map { c =>
      (c,
        row.getLong(row.fieldIndex(s"${c}__n")),
        row.getLong(row.fieldIndex(s"${c}__nulls")),
        row.getLong(row.fieldIndex(s"${c}__distinct")),
        row.getString(row.fieldIndex(s"${c}__min")),
        row.getString(row.fieldIndex(s"${c}__max")))
    }.toDF("col_name", "n", "nulls", "n_distinct", "min_s", "max_s")
  }
}
