package graft.streaming

/** Pure, deterministic port of the reference's per-camera centroid
  * tracker (flink_vision_job_proper.py:35-123 `SimpleTracker`). One
  * `update` call = one frame. Divergences from the reference, by design
  * (SURVEY §7.4):
  *  - event-time `first_seen`/durations instead of wall clock
  *    (determinism; the reference's `time.time()` makes goldens flap)
  *  - the argsort over row-minima is STABLE with row-index tie-break
  *    (numpy's default introsort is unstable on ties — nondeterministic)
  *  - unused detection columns register in ascending column order and
  *    unused rows age in ascending row order (CPython small-int set
  *    iteration order, made explicit)
  * Everything else matches: greedy min-distance matching with a 50 px
  * gate, `disappeared` counter reset on match, deregister strictly
  * after `maxDisappeared` misses, monotone never-reused ids,
  * best-confidence age/gender upgrades, original type kept.
  */
case class BBox(x1: Int, y1: Int, x2: Int, y2: Int)

case class DetectionIn(
    cx: Double, cy: Double, objType: String, bbox: BBox,
    age: Option[String] = None, gender: Option[String] = None,
    ageConf: Double = 0.0, genderConf: Double = 0.0)

case class TrackedObj(
    id: Int, cx: Double, cy: Double, objType: String, bbox: BBox,
    age: Option[String], gender: Option[String],
    ageConf: Double, genderConf: Double,
    firstSeenMs: Long, disappeared: Int)

/** `objects` preserves registration order (the reference's Python dict
  * insertion order) — matching iterates rows in that order. */
case class TrackerState(nextId: Int, objects: Vector[TrackedObj],
                        maxDisappeared: Int = 30)

object TrackerState {
  val empty: TrackerState = TrackerState(0, Vector.empty)
}

object Tracker {

  private def dist(ox: Double, oy: Double, dx: Double, dy: Double): Double =
    math.hypot(ox - dx, oy - dy)

  /** One frame. Returns the post-update state; the *visible* output is
    * `state.objects` (the reference emits every currently-tracked
    * object, including ones not matched this frame). */
  def update(st: TrackerState, dets: IndexedSeq[DetectionIn], nowMs: Long): TrackerState = {
    if (dets.isEmpty) {
      // :62-67 — age everyone, deregister past the limit
      val aged = st.objects
        .map(o => o.copy(disappeared = o.disappeared + 1))
        .filter(_.disappeared <= st.maxDisappeared)
      return st.copy(objects = aged)
    }

    if (st.objects.isEmpty) {
      // :74-76 — register all, detection order
      val regs = dets.zipWithIndex.map { case (d, i) => register(st.nextId + i, d, nowMs) }
      return st.copy(nextId = st.nextId + dets.size, objects = st.objects ++ regs)
    }

    // :78-89 — D[row][col]; rows by ascending row-min (stable); col = argmin of row
    val nRows = st.objects.size
    val d = Array.tabulate(nRows, dets.size) { (r, c) =>
      dist(st.objects(r).cx, st.objects(r).cy, dets(c).cx, dets(c).cy)
    }
    val argminCol = d.map(row => row.indices.minBy(row(_))) // first-min like np.argmin
    val rowOrder = (0 until nRows).sortBy(r => (d(r)(argminCol(r)), r))

    val usedRows = collection.mutable.Set.empty[Int]
    val usedCols = collection.mutable.Set.empty[Int]
    val updated = st.objects.toArray
    for (row <- rowOrder) {
      val colC = argminCol(row)
      if (!usedRows.contains(row) && !usedCols.contains(colC) && d(row)(colC) <= 50.0) {
        val det = dets(colC)
        val o = updated(row)
        // :70-85 — new centroid, reset disappeared, new bbox; keep type;
        // upgrade age/gender only on strictly higher confidence
        val (age, ageConf) =
          if (det.age.isDefined && det.ageConf > o.ageConf) (det.age, det.ageConf)
          else (o.age, o.ageConf)
        val (gender, genderConf) =
          if (det.gender.isDefined && det.genderConf > o.genderConf) (det.gender, det.genderConf)
          else (o.gender, o.genderConf)
        updated(row) = o.copy(cx = det.cx, cy = det.cy, bbox = det.bbox,
          disappeared = 0, age = age, ageConf = ageConf,
          gender = gender, genderConf = genderConf)
        usedRows += row
        usedCols += colC
      }
    }

    // :91-99 — unmatched rows age (ascending row order) and may deregister
    val survivors = updated.zipWithIndex.flatMap { case (o, r) =>
      if (usedRows.contains(r)) Some(o)
      else {
        val aged = o.copy(disappeared = o.disappeared + 1)
        if (aged.disappeared > st.maxDisappeared) None else Some(aged)
      }
    }.toVector

    // :101-103 — unmatched cols register, ascending col order
    val newCols = dets.indices.filterNot(usedCols.contains)
    val regs = newCols.zipWithIndex.map { case (c, i) => register(st.nextId + i, dets(c), nowMs) }

    st.copy(nextId = st.nextId + newCols.size, objects = survivors ++ regs)
  }

  private def register(id: Int, d: DetectionIn, nowMs: Long): TrackedObj =
    TrackedObj(id, d.cx, d.cy, d.objType, d.bbox, d.age, d.gender,
      d.ageConf, d.genderConf, nowMs, 0)
}
