package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Column profiling for pipeline health gates: row count, null count,
  * exact distinct count, and min/max per column, emitted as one
  * narrow (col_name, metric-per-column) frame.
  *
  * A curation pipeline wants this after every stage — a filter that
  * silently nulled a column or collapsed its cardinality should fail
  * the run, not surface in a training curve weeks later. All
  * per-column aggregates evaluate in a single pass over the data
  * (one agg row, pivoted to narrow form driver-side — the wide row is
  * |cols|·4 cells, not data-sized). Exact distincts are the one
  * genuinely expensive metric at 100 TB; swap `countDistinct` for
  * `approx_count_distinct` (HLL, one pass, no expand) when the gate
  * tolerates ±2% — the q55 battery entry measures that estimator's
  * error separately.
  *
  * min/max are emitted as strings so heterogeneous columns share one
  * schema; both engines compare ASCII strings bytewise, and numeric
  * columns stringify AFTER the typed min/max (no lexicographic-number
  * trap).
  */
object Profile {

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs = cols.flatMap { c =>
      Seq(count(lit(1)).as(s"${c}__n"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nulls"),
        countDistinct(col(c)).as(s"${c}__distinct"),
        min(col(c)).cast("string").as(s"${c}__min"),
        max(col(c)).cast("string").as(s"${c}__max"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*).head()
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
