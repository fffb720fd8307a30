package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

class TrackerSpec extends AnyFunSuite {

  private def det(cx: Double, cy: Double, t: String = "Car"): DetectionIn =
    DetectionIn(cx, cy, t, BBox(cx.toInt - 30, cy.toInt - 60, cx.toInt + 30, cy.toInt + 60))

  test("first frame registers all detections with ids 0..n-1 in order") {
    val st = Tracker.update(TrackerState.empty, IndexedSeq(det(10, 10), det(200, 200)), 0L)
    assert(st.objects.map(_.id) == Vector(0, 1))
    assert(st.nextId == 2)
  }

  test("match within 50px updates centroid and resets disappeared") {
    var st = Tracker.update(TrackerState.empty, IndexedSeq(det(100, 100)), 0L)
    st = Tracker.update(st, IndexedSeq.empty, 1000L) // miss -> disappeared=1
    assert(st.objects.head.disappeared == 1)
    st = Tracker.update(st, IndexedSeq(det(130, 140)), 2000L) // dist=50 exactly
    assert(st.objects.map(_.id) == Vector(0))
    assert(st.objects.head.cx == 130 && st.objects.head.cy == 140)
    assert(st.objects.head.disappeared == 0)
    assert(st.objects.head.firstSeenMs == 0L)
  }

  test("detection beyond 50px registers a new id; old object ages") {
    var st = Tracker.update(TrackerState.empty, IndexedSeq(det(100, 100)), 0L)
    st = Tracker.update(st, IndexedSeq(det(100, 151)), 1000L) // dist 51
    assert(st.objects.map(_.id) == Vector(0, 1))
    assert(st.objects.find(_.id == 0).get.disappeared == 1)
    assert(st.objects.find(_.id == 1).get.disappeared == 0)
  }

  test("deregister strictly after 30 misses; ids never reused") {
    var st = Tracker.update(TrackerState.empty, IndexedSeq(det(100, 100)), 0L)
    (1 to 30).foreach(i => st = Tracker.update(st, IndexedSeq.empty, i * 1000L))
    assert(st.objects.size == 1 && st.objects.head.disappeared == 30)
    st = Tracker.update(st, IndexedSeq.empty, 31000L) // 31st miss -> gone
    assert(st.objects.isEmpty)
    st = Tracker.update(st, IndexedSeq(det(100, 100)), 32000L)
    assert(st.objects.map(_.id) == Vector(1)) // id 0 never reused
  }

  test("age/gender upgrade only on strictly higher confidence; type immutable") {
    val d0 = DetectionIn(100, 100, "Person", BBox(70, 40, 130, 160),
      Some("Adult"), Some("Male"), 0.5, 0.6)
    var st = Tracker.update(TrackerState.empty, IndexedSeq(d0), 0L)
    val d1 = DetectionIn(105, 100, "Car", BBox(75, 40, 135, 160),
      Some("Child"), Some("Female"), 0.4, 0.9)
    st = Tracker.update(st, IndexedSeq(d1), 1000L)
    val o = st.objects.head
    assert(o.objType == "Person")                 // type never updated
    assert(o.age.contains("Adult") && o.ageConf == 0.5)      // 0.4 < 0.5 kept
    assert(o.gender.contains("Female") && o.genderConf == 0.9) // 0.9 > 0.6 upgraded
  }

  test("greedy matching: closest pair wins, second detection takes remaining") {
    // objects at 0 and 100; detections at 95 and 5 (reversed order)
    var st = Tracker.update(TrackerState.empty,
      IndexedSeq(det(0, 0), det(100, 0)), 0L)
    st = Tracker.update(st, IndexedSeq(det(95, 0), det(5, 0)), 1000L)
    val byId = st.objects.map(o => o.id -> (o.cx, o.cy)).toMap
    assert(byId(0) == ((5.0, 0.0)))
    assert(byId(1) == ((95.0, 0.0)))
  }

  test("two detections one object: nearest matches, other registers") {
    var st = Tracker.update(TrackerState.empty, IndexedSeq(det(50, 50)), 0L)
    st = Tracker.update(st, IndexedSeq(det(90, 50), det(55, 50)), 1000L)
    val byId = st.objects.map(o => o.id -> o.cx).toMap
    assert(byId(0) == 55.0) // nearest (dist 5) matched
    assert(byId(1) == 90.0) // farther one registered fresh
  }

  test("invariants under 200 random seeded frame sequences") {
    val rnd = new scala.util.Random(42)
    (0 until 200).foreach { trial =>
      var st = TrackerState.empty
      var maxSeenId = -1
      (0 until 40).foreach { i =>
        val dets = IndexedSeq.fill(rnd.nextInt(6))(
          det(rnd.nextDouble() * 640, rnd.nextDouble() * 480,
            if (rnd.nextBoolean()) "Person" else "Car"))
        val prevIds = st.objects.map(_.id).toSet
        st = Tracker.update(st, dets, i * 1000L)
        val ids = st.objects.map(_.id)
        assert(ids.distinct.size == ids.size, s"trial $trial: duplicate ids")
        assert(st.objects.forall(_.disappeared <= 30), s"trial $trial: unbounded disappeared")
        val newIds = ids.toSet -- prevIds
        newIds.foreach(id => assert(id > maxSeenId, s"trial $trial: id $id reused"))
        maxSeenId = math.max(maxSeenId, if (ids.isEmpty) maxSeenId else ids.max)
        // every disappeared=0 object was matched or registered by one of
        // THIS frame's detections — the bound is the detection count
        // (max(dets, ids) was vacuous: ids.size always covers objects)
        assert(st.objects.count(_.disappeared == 0) <= dets.size,
          s"trial $trial: more fresh objects than detections")
      }
    }
  }

  test("deterministic: same input sequence twice gives identical states") {
    def run(): TrackerState = {
      val rnd = new scala.util.Random(7)
      var st = TrackerState.empty
      (0 until 60).foreach { i =>
        val dets = IndexedSeq.fill(rnd.nextInt(5))(
          det(rnd.nextDouble() * 640, rnd.nextDouble() * 480))
        st = Tracker.update(st, dets, i * 500L)
      }
      st
    }
    assert(run() == run())
  }
}
