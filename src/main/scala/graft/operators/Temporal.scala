package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series operators Spark has no native form for: backward as-of
  * join, point-in-interval range join, and gap sessionization. Each is
  * expressed as a declarative plan shaped for scale — one key shuffle
  * and no row-pair explosion — rather than the naive inequality join
  * Catalyst would plan as a nested-loop/cartesian product.
  */
object Temporal {

  /** Backward as-of join: for every left row, attach the value columns
    * of the LATEST right row on the same key with
    * `right.ts <= left.ts` (inclusive; left-join semantics — no prior
    * right row yields NULLs).
    *
    * Shape: tag both sides, union, and run ONE cumulative
    * `last(ignoreNulls)` window over `(key ORDER BY ts, side, ord)` on
    * a single struct carrying ALL right value columns plus the right
    * timestamp — right rows sort before left rows at equal timestamps,
    * so the boundary is inclusive, and `ord` breaks right-side
    * timestamp ties deterministically (the largest `ord` wins,
    * matching `ORDER BY ts DESC, ord DESC LIMIT 1`). Filling the
    * struct as a unit (rather than each column independently) is what
    * makes a NULL inside the latest right row come through as NULL
    * instead of silently pulling that column from an older row — the
    * matched row is one row, never a mix. This is ONE hash shuffle on
    * the key plus one sort — no range cross-join, no per-left probe —
    * and both the shuffle and the sort scale with rows/key, not
    * pairs/key. Skewed keys degrade to a big per-key sort, the same
    * failure mode (and the same salting remedy) as any keyed window.
    *
    * `toleranceSec` bounds the lookback: a matched right row older
    * than `left.ts - tolerance` is treated as no match (its values
    * null out), the asof-join tolerance semantics pandas/QuestDB users
    * expect.
    *
    * `rightVals` must not collide with left column names — the output
    * is all left columns plus the filled `rightVals`.
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
               leftTs: String, rightTs: String, rightVals: Seq[String],
               rightOrd: Option[String] = None,
               toleranceSec: Option[Long] = None): DataFrame = {
    require(rightVals.nonEmpty, "asofJoin needs at least one right value column")
    val collisions = rightVals.toSet intersect left.columns.toSet
    require(collisions.isEmpty,
      s"right value columns collide with left columns: ${collisions.mkString(", ")}")
    val lcols = left.columns.toSeq
    val ordL = lit(null).cast("long").as("__ord")
    val ordR = rightOrd.map(c => col(c).cast("long")).getOrElse(lit(0L)).as("__ord")
    // one struct per right row: every value column + the right ts (for
    // the tolerance check), filled as a UNIT so the matched row can
    // never be a mix of right rows
    val rvType = org.apache.spark.sql.types.StructType(
      rightVals.map(v => org.apache.spark.sql.types.StructField(
        v, right.schema(v).dataType)) :+
        org.apache.spark.sql.types.StructField(
          "__rts", right.schema(rightTs).dataType))
    val lSide = left.select(
      Seq(col(key).as("__key"), col(leftTs).as("__ts"), lit(1).as("__side"), ordL) ++
        lcols.map(col) :+
        lit(null).cast(rvType).as("__rv"): _*)
    // a right row with no timestamp cannot be "the latest at-or-before"
    // anything — unfiltered it would sort first (nulls-first) and leak
    // into the fill with a null __rts that turns the tolerance predicate
    // three-valued
    val rSide = right.filter(col(rightTs).isNotNull).select(
      Seq(col(key).as("__key"), col(rightTs).as("__ts"), lit(0).as("__side"), ordR) ++
        lcols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(rightVals.map(col) :+ col(rightTs).as("__rts"): _*).as("__rv"): _*)
    val w = Window.partitionBy("__key")
      .orderBy(col("__ts"), col("__side"), col("__ord"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = lSide.unionByName(rSide)
      .withColumn("__rv", last(col("__rv"), ignoreNulls = true).over(w))
    val inTol = toleranceSec match {
      case None => lit(true)
      case Some(tol) =>
        // a match older than the tolerance nulls out (the matched right
        // row's own timestamp rides inside the struct)
        unix_micros(col("__ts")) - unix_micros(col("__rv.__rts")) <= tol * 1000000L
    }
    filled.filter(col("__side") === 1)
      .select(lcols.map(col) ++
        rightVals.map(v => when(inTol, col("__rv").getField(v)).as(v)): _*)
  }

  /** Nearest as-of join: for every left row, attach the value columns
    * of the right row on the same key whose timestamp is CLOSEST to
    * the left timestamp, in either direction (pandas
    * `merge_asof(direction='nearest')` semantics). Tie between an
    * equally-near earlier and later right row prefers the earlier
    * (backward) one; right rows tied on the SAME timestamp resolve to
    * the largest `ord`, like [[asofJoin]]. `toleranceSec` bounds the
    * match distance on both sides.
    *
    * Shape: the same tagged union as [[asofJoin]] with TWO cumulative
    * struct fills — one over ascending time (nearest at-or-before) and
    * one over descending time (nearest at-or-after) — then a per-row
    * distance compare picks the closer struct. Still ONE hash shuffle
    * on the key; the two window orderings share it and each add a
    * sort. */
  def asofJoinNearest(left: DataFrame, right: DataFrame, key: String,
                      leftTs: String, rightTs: String, rightVals: Seq[String],
                      rightOrd: Option[String] = None,
                      toleranceSec: Option[Long] = None): DataFrame = {
    require(rightVals.nonEmpty, "asofJoinNearest needs at least one right value column")
    val collisions = rightVals.toSet intersect left.columns.toSet
    require(collisions.isEmpty,
      s"right value columns collide with left columns: ${collisions.mkString(", ")}")
    val lcols = left.columns.toSeq
    val ordL = lit(null).cast("long").as("__ord")
    val ordR = rightOrd.map(c => col(c).cast("long")).getOrElse(lit(0L)).as("__ord")
    val rvType = org.apache.spark.sql.types.StructType(
      rightVals.map(v => org.apache.spark.sql.types.StructField(
        v, right.schema(v).dataType)) :+
        org.apache.spark.sql.types.StructField(
          "__rts", right.schema(rightTs).dataType))
    val lSide = left.select(
      Seq(col(key).as("__key"), col(leftTs).as("__ts"), lit(1).as("__side"), ordL) ++
        lcols.map(col) :+
        lit(null).cast(rvType).as("__rv"): _*)
    // null-timestamp right rows are rejected, as in [[asofJoin]] — here
    // they'd additionally make the backward/forward distance compare
    // three-valued, yielding direction-dependent arbitrary matches
    val rSide = right.filter(col(rightTs).isNotNull).select(
      Seq(col(key).as("__key"), col(rightTs).as("__ts"), lit(0).as("__side"), ordR) ++
        lcols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(rightVals.map(col) :+ col(rightTs).as("__rts"): _*).as("__rv"): _*)
    // backward: latest right at-or-before (ties on ts -> largest ord);
    // forward: earliest right at-or-after (ties on ts -> largest ord).
    // Right rows sort before left at equal timestamps in BOTH
    // directions, so the boundary is inclusive both ways.
    val wB = Window.partitionBy("__key")
      .orderBy(col("__ts"), col("__side"), col("__ord"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wF = Window.partitionBy("__key")
      .orderBy(col("__ts").desc, col("__side"), col("__ord"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = lSide.unionByName(rSide)
      .withColumn("__b", last(col("__rv"), ignoreNulls = true).over(wB))
      .withColumn("__f", last(col("__rv"), ignoreNulls = true).over(wF))
    val dB = unix_micros(col("__ts")) - unix_micros(col("__b.__rts"))
    val dF = unix_micros(col("__f.__rts")) - unix_micros(col("__ts"))
    val tolUs = toleranceSec.map(t => lit(t * 1000000L))
    val bOk = col("__b").isNotNull && tolUs.map(dB <= _).getOrElse(lit(true))
    val fOk = col("__f").isNotNull && tolUs.map(dF <= _).getOrElse(lit(true))
    // tie (dB == dF) prefers backward
    val chosen = when(bOk && (!fOk || dB <= dF), col("__b"))
      .when(fOk, col("__f"))
    filled.filter(col("__side") === 1)
      .select(lcols.map(col) ++
        rightVals.map(v => chosen.getField(v).as(v)): _*)
  }

  /** Point-in-interval range join: rows of `points` matched to every
    * row of `intervals` whose `[startCol, endCol]` (inclusive both
    * ends) contains `pointTs`. Output carries all columns of both
    * inputs (caller aliases collisions away).
    *
    * Catalyst plans a raw `p.ts BETWEEN i.start AND i.end` join as a
    * broadcast-nested-loop or cartesian product — O(|points| ×
    * |intervals|) comparisons. Here time is quantized into fixed bins:
    * each point belongs to exactly one bin, each interval explodes to
    * the bins it overlaps, and the join is an EQUI-join on the bin id
    * that only then filters exact containment. Each qualifying
    * (point, interval) pair meets in exactly one bin — the point's —
    * so no post-join dedup is needed. Work scales with
    * points + intervals × (len/bin + 1) + true matches, and the bin
    * join shuffles/broadcasts like any equi-join (AQE, salting, and
    * broadcast all apply).
    *
    * Pick `binSeconds` near the typical interval length: much smaller
    * multiplies the interval explosion, much larger degrades the bin
    * filter toward all-pairs within a bin.
    */
  def rangeJoinPointInterval(points: DataFrame, intervals: DataFrame,
                             pointTs: String, startCol: String, endCol: String,
                             binSeconds: Long = 600L): DataFrame = {
    require(binSeconds > 0, s"binSeconds must be positive, got $binSeconds")
    val binUs = binSeconds * 1000000L
    val p = points.withColumn("__bin", floor(unix_micros(col(pointTs)) / binUs))
    val i = intervals.withColumn("__bin",
      explode(sequence(floor(unix_micros(col(startCol)) / binUs),
        floor(unix_micros(col(endCol)) / binUs))))
    p.join(i, "__bin")
      .filter(col(pointTs) >= col(startCol) && col(pointTs) <= col(endCol))
      .drop("__bin")
  }

  /** Gap sessionization: within each key, order rows by
    * `(ts, ord...)` and start a new session whenever the gap from the
    * previous row exceeds `gapSeconds` (a gap of exactly `gapSeconds`
    * stays in the session). Appends `session_idx`, a 1-based per-key
    * session counter — `(key, session_idx)` identifies a session.
    *
    * One keyed shuffle + sort; `lag` and the running `sum` share the
    * window spec so Spark evaluates both in a single Window operator.
    * This is the batch form of what Structured Streaming's
    * `session_window` computes incrementally.
    */
  /** Streaming gap sessions — the incremental form of [[sessionize]]:
    * `session_window` merges events on the same key arriving within
    * `gapSeconds` of each other; a session finalizes (and emits, in
    * append mode) once the event-time watermark passes its end. Output
    * per session: `key, session_start, session_end, n_events` with
    * `session_end = last event + gap` (Spark's window-end convention —
    * batch `sessionize` reports observed `max(ts)` instead; the parity
    * spec reconciles the two). State is bounded by the watermark: a
    * straggler older than the horizon starts a NEW session rather than
    * reopening a finalized one — the same bounded-state trade as
    * [[Dedup.streamingExact]].
    */
  def streamingSessions(df: DataFrame, key: String, tsCol: String,
                        gapSeconds: Long,
                        watermark: String = "10 minutes"): DataFrame = {
    require(gapSeconds > 0, s"gapSeconds must be positive, got $gapSeconds")
    df.withWatermark(tsCol, watermark)
      .groupBy(session_window(col(tsCol), s"$gapSeconds seconds"), col(key))
      .agg(count(lit(1)).as("n_events"))
      .select(col(key), col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"), col("n_events"))
  }

  def sessionize(df: DataFrame, key: String, tsCol: String,
                 gapSeconds: Long, ordCols: Seq[String] = Nil): DataFrame = {
    require(gapSeconds > 0, s"gapSeconds must be positive, got $gapSeconds")
    val order = col(tsCol) +: ordCols.map(col)
    val w = Window.partitionBy(key).orderBy(order: _*)
    val prevTs = lag(col(tsCol), 1).over(w)
    df.withColumn("__new_session",
        when(prevTs.isNull ||
          unix_micros(col(tsCol)) - unix_micros(prevTs) > gapSeconds * 1000000L, 1)
          .otherwise(0))
      .withColumn("session_idx", sum(col("__new_session"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("__new_session")
  }
}
