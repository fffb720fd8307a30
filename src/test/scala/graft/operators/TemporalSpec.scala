package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

import java.sql.Timestamp

class TemporalSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // ------------------------------------------------------------ asofJoin

  test("asofJoin picks the latest at-or-before right row per key, null when none") {
    val left = Seq(
      (1L, 10L, ts("2024-01-01 00:00:05")),
      (2L, 10L, ts("2024-01-01 00:00:20")),
      (3L, 20L, ts("2024-01-01 00:00:10")),
      (4L, 30L, ts("2024-01-01 00:00:10"))  // key with no right rows at all
    ).toDF("id", "k", "t")
    val right = Seq(
      (10L, ts("2024-01-01 00:00:01"), 1.0, 100L),
      (10L, ts("2024-01-01 00:00:10"), 2.0, 101L),
      (10L, ts("2024-01-01 00:00:30"), 3.0, 102L),
      (20L, ts("2024-01-01 00:00:11"), 9.0, 103L)  // after the only left probe
    ).toDF("k", "t", "v", "ord")
    val out = Temporal.asofJoin(left, right, "k", "t", "t", Seq("v"),
        rightOrd = Some("ord"))
      .orderBy("id").select("id", "v").as[(Long, Option[Double])].collect()
    assert(out === Seq(
      (1L, Some(1.0)),   // only 00:00:01 is at-or-before 00:00:05
      (2L, Some(2.0)),   // 00:00:10 beats 00:00:01; 00:00:30 is future
      (3L, None),        // right exists for k=20 but only in the future
      (4L, None)))       // no right rows for k=30
  }

  test("asofJoin boundary is inclusive and right-side ties break by ord (max wins)") {
    val left = Seq((1L, 5L, ts("2024-01-01 12:00:00"))).toDF("id", "k", "t")
    val right = Seq(
      (5L, ts("2024-01-01 12:00:00"), 10.0, 7L),  // same instant as the probe
      (5L, ts("2024-01-01 12:00:00"), 20.0, 9L),  // same instant, larger ord
      (5L, ts("2024-01-01 11:59:59"), 30.0, 99L)
    ).toDF("k", "t", "v", "ord")
    val out = Temporal.asofJoin(left, right, "k", "t", "t", Seq("v"),
      rightOrd = Some("ord")).select("v").as[Double].collect()
    assert(out === Seq(20.0)) // inclusive boundary, ord=9 beats ord=7
  }

  test("asofJoin tolerance nulls out matches older than the lookback") {
    val left = Seq(
      (1L, 5L, ts("2024-01-01 00:10:00")),
      (2L, 5L, ts("2024-01-01 01:00:00"))
    ).toDF("id", "k", "t")
    val right = Seq((5L, ts("2024-01-01 00:09:00"), 1.5, 1L)).toDF("k", "t", "v", "ord")
    val out = Temporal.asofJoin(left, right, "k", "t", "t", Seq("v"),
        rightOrd = Some("ord"), toleranceSec = Some(300L))
      .orderBy("id").select("id", "v").as[(Long, Option[Double])].collect()
    assert(out === Seq((1L, Some(1.5)), (2L, None))) // 51 min > 5 min tolerance
  }

  test("asofJoin: a NULL in the latest right row comes through, never a stale value") {
    // the matched row is ONE row: a null v in the latest right row must
    // surface as null, not fall back to an older row's value — and with
    // several value columns the output may never mix right rows
    val left = Seq((1L, 5L, ts("2024-01-01 00:10:00"))).toDF("id", "k", "t")
    val right = Seq(
      (5L, ts("2024-01-01 00:01:00"), Some(1.0), Some("old"), 1L),
      (5L, ts("2024-01-01 00:09:00"), None: Option[Double], Some("new"), 2L)
    ).toDF("k", "t", "v", "tag", "ord")
    val out = Temporal.asofJoin(left, right, "k", "t", "t", Seq("v", "tag"),
        rightOrd = Some("ord"))
      .select("v", "tag").as[(Option[Double], Option[String])].collect()
    assert(out === Seq((None, Some("new"))), s"got ${out.toSeq}")
    // tolerance decides on the matched row's own timestamp: the latest
    // right row (00:09, in tolerance) matched, so tag flows and v stays
    // null — the old row's 1.0 must not resurface via the lookback
    val tol = Temporal.asofJoin(left, right, "k", "t", "t", Seq("v", "tag"),
        rightOrd = Some("ord"), toleranceSec = Some(120L))
      .select("v", "tag").as[(Option[Double], Option[String])].collect()
    assert(tol === Seq((None, Some("new"))), s"got ${tol.toSeq}")
  }

  test("asofJoinNearest: closest row wins either direction, ties go backward") {
    val left = Seq(
      (1L, 5L, ts("2024-01-01 00:10:00")), // back at 00:09 (60s) vs fwd 00:12 (120s) -> back
      (2L, 5L, ts("2024-01-01 00:11:00")), // back 120s vs fwd 60s -> fwd
      (3L, 5L, ts("2024-01-01 00:03:00")), // only future rows -> nearest fwd
      (4L, 9L, ts("2024-01-01 00:00:00"))  // no right rows for key
    ).toDF("id", "k", "t")
    val right = Seq(
      (5L, ts("2024-01-01 00:09:00"), 1.0, 1L),
      (5L, ts("2024-01-01 00:12:00"), 2.0, 2L)
    ).toDF("k", "t", "v", "ord")
    val out = Temporal.asofJoinNearest(left, right, "k", "t", "t", Seq("v"),
        rightOrd = Some("ord"))
      .orderBy("id").select("id", "v").as[(Long, Option[Double])].collect()
    assert(out === Seq((1L, Some(1.0)), (2L, Some(2.0)),
      (3L, Some(1.0)), (4L, None)))
    // exact-tie distance prefers the backward row; equal-ts rights
    // resolve to the largest ord
    val tied = Seq((1L, 5L, ts("2024-01-01 00:10:30"))).toDF("id", "k", "t")
    val t1 = Temporal.asofJoinNearest(tied, right, "k", "t", "t", Seq("v"),
      rightOrd = Some("ord")).select("v").as[Double].collect()
    assert(t1 === Seq(1.0)) // 90s both ways -> backward 00:09 wins
    val dupTs = Seq(
      (5L, ts("2024-01-01 00:09:00"), 1.0, 1L),
      (5L, ts("2024-01-01 00:09:00"), 7.0, 9L)
    ).toDF("k", "t", "v", "ord")
    val t2 = Temporal.asofJoinNearest(tied, dupTs, "k", "t", "t", Seq("v"),
      rightOrd = Some("ord")).select("v").as[Double].collect()
    assert(t2 === Seq(7.0)) // same ts -> ord 9 beats ord 1
    // tolerance bounds both directions
    val t3 = Temporal.asofJoinNearest(left, right, "k", "t", "t", Seq("v"),
        rightOrd = Some("ord"), toleranceSec = Some(90L))
      .orderBy("id").select("id", "v").as[(Long, Option[Double])].collect()
    assert(t3 === Seq((1L, Some(1.0)), (2L, Some(2.0)),
      (3L, None), (4L, None))) // id=3's nearest is 360s away > 90s
  }

  test("asof joins reject right rows with a NULL timestamp") {
    // a null-ts right row used to sort nulls-first into the cumulative
    // fill (asofJoin: it becomes "the earliest row"; asofJoinNearest:
    // its null __rts turns the direction compare three-valued) — both
    // must behave as if the row were absent
    val left = Seq(
      (1L, 5L, ts("2024-01-01 00:10:00")),
      (2L, 6L, ts("2024-01-01 00:10:00"))  // key whose ONLY right row is null-ts
    ).toDF("id", "k", "t")
    val right = Seq(
      (5L, Option(ts("2024-01-01 00:09:00")), 1.0, 1L),
      (5L, None: Option[Timestamp], 666.0, 2L),
      (6L, None: Option[Timestamp], 777.0, 1L)
    ).toDF("k", "t", "v", "ord")
    for (join <- Seq(Temporal.asofJoin _, Temporal.asofJoinNearest _)) {
      val out = join(left, right, "k", "t", "t", Seq("v"), Some("ord"), None)
        .orderBy("id").select("id", "v").as[(Long, Option[Double])].collect()
      assert(out === Seq((1L, Some(1.0)), (2L, None)), s"got ${out.toSeq}")
      val tol = join(left, right, "k", "t", "t", Seq("v"), Some("ord"), Some(300L))
        .orderBy("id").select("id", "v").as[(Long, Option[Double])].collect()
      assert(tol === Seq((1L, Some(1.0)), (2L, None)), s"got ${tol.toSeq}")
    }
  }

  test("asofJoin refuses colliding value column names") {
    val l = Seq((1L, ts("2024-01-01 00:00:00"), 0.0)).toDF("k", "t", "v")
    val r = Seq((1L, ts("2024-01-01 00:00:00"), 1.0)).toDF("k", "t", "v")
    val e = intercept[IllegalArgumentException] {
      Temporal.asofJoin(l, r, "k", "t", "t", Seq("v"))
    }
    assert(e.getMessage.contains("collide"))
  }

  test("asofJoin equals the brute-force per-row probe on real events (sf0.001)") {
    val e = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "events")
      .select("event_id", "user_id", "ts", "value", "event_type")
    val clicks = e.filter($"event_type" === "click").select("event_id", "user_id", "ts")
    val views = e.filter($"event_type" === "view")
      .select($"user_id", $"ts", $"value".as("vv"), $"event_id".as("vord"))
    val got = Temporal.asofJoin(clicks, views, "user_id", "ts", "ts", Seq("vv"),
        rightOrd = Some("vord"))
      .select("event_id", "vv").as[(Long, Option[Double])].collect().toMap
    // brute force on the driver: per click, max-(ts, id) view at-or-before
    val vrows = views.as[(Long, Timestamp, Double, Long)].collect()
    val crows = clicks.as[(Long, Long, Timestamp)].collect()
    assert(crows.nonEmpty && vrows.nonEmpty)
    crows.foreach { case (id, u, t) =>
      val cand = vrows.filter(v => v._1 == u && !v._2.after(t))
      val want = if (cand.isEmpty) None
        else Some(cand.maxBy(v => (v._2.getTime, v._4))._3)
      assert(got(id) === want, s"click $id")
    }
  }

  test("asofJoinNearest equals the brute-force per-row probe on real events (sf0.001)") {
    val e = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "events")
      .select("event_id", "user_id", "ts", "value", "event_type")
    val clicks = e.filter($"event_type" === "click").select("event_id", "user_id", "ts")
    val views = e.filter($"event_type" === "view")
      .select($"user_id", $"ts", $"value".as("vv"), $"event_id".as("vord"))
    val got = Temporal.asofJoinNearest(clicks, views, "user_id", "ts", "ts",
        Seq("vv"), rightOrd = Some("vord"))
      .select("event_id", "vv").as[(Long, Option[Double])].collect().toMap
    // brute force on the driver: per click, min |delta|; ties backward,
    // then largest ord
    val vrows = views.as[(Long, Timestamp, Double, Long)].collect()
    val crows = clicks.as[(Long, Long, Timestamp)].collect()
    assert(crows.nonEmpty && vrows.nonEmpty)
    crows.foreach { case (id, u, t) =>
      val cand = vrows.filter(_._1 == u)
      val want = if (cand.isEmpty) None
        else Some(cand.minBy { v =>
          val d = math.abs(v._2.getTime - t.getTime)
          (d, if (v._2.after(t)) 1 else 0, -v._4)
        }._3)
      assert(got(id) === want, s"click $id")
    }
  }

  test("asofJoin plans one key shuffle, no join operator") {
    val l = Seq((1L, 5L, ts("2024-01-01 00:00:00"))).toDF("id", "k", "t")
    val r = Seq((5L, ts("2024-01-01 00:00:00"), 1.0)).toDF("k", "t", "v")
    val p = Temporal.asofJoin(l, r, "k", "t", "t", Seq("v"))
      .queryExecution.executedPlan.toString
    assert(!p.contains("Join"), s"asofJoin must not plan a join:\n${p.take(800)}")
    assert("hashpartitioning".r.findAllIn(p).size == 1,
      s"expected exactly one key shuffle:\n${p.take(800)}")
    assert(p.contains("Window"))
  }

  // ---------------------------------------------- rangeJoinPointInterval

  test("range join equals the naive inequality join on real events (sf0.001)") {
    val e = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "events")
    val errors = e.filter($"event_type" === "error")
      .select($"event_id".as("err_id"), $"ts".as("s"),
        ($"ts" + expr("INTERVAL 10 MINUTES")).as("en"))
    val clicks = e.filter($"event_type" === "click")
      .select($"event_id".as("click_id"), $"ts".as("ct"))
    val got = Temporal.rangeJoinPointInterval(clicks, errors, "ct", "s", "en",
        binSeconds = 600L)
      .select("err_id", "click_id").as[(Long, Long)].collect().toSet
    val naive = clicks.join(errors, $"ct" >= $"s" && $"ct" <= $"en")
      .select("err_id", "click_id").as[(Long, Long)].collect().toSet
    assert(got === naive)
    assert(naive.nonEmpty)
  }

  test("range join: inclusive ends, multi-bin spans, and bin-size invariance") {
    val points = Seq(
      (1L, ts("2024-01-01 00:00:00")),  // exactly at start
      (2L, ts("2024-01-01 00:10:00")),  // exactly at end
      (3L, ts("2024-01-01 00:10:01")),  // just past end
      (4L, ts("2024-01-01 00:04:00"))
    ).toDF("pid", "pt")
    val ivals = Seq((100L, ts("2024-01-01 00:00:00"), ts("2024-01-01 00:10:00")))
      .toDF("iid", "s", "en")
    // a bin far smaller than the interval forces a multi-bin explosion;
    // matches must be identical for any bin size (each pair meets only
    // in the point's own bin — no dups, no misses)
    Seq(7L, 60L, 600L, 3600L).foreach { bin =>
      val got = Temporal.rangeJoinPointInterval(points, ivals, "pt", "s", "en",
          binSeconds = bin)
        .select("pid").as[Long].collect().toSet
      assert(got === Set(1L, 2L, 4L), s"binSeconds=$bin")
    }
  }

  test("range join plans an equi-join on the bin, not a cartesian/nested-loop") {
    val points = Seq((1L, ts("2024-01-01 00:00:00"))).toDF("pid", "pt")
    val ivals = Seq((100L, ts("2024-01-01 00:00:00"), ts("2024-01-01 00:10:00")))
      .toDF("iid", "s", "en")
    val p = Temporal.rangeJoinPointInterval(points, ivals, "pt", "s", "en")
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p.take(800))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(800))
  }

  // ----------------------------------------------------------- sessionize

  test("sessionize: gap strictly greater than gapSeconds starts a new session") {
    val df = Seq(
      (1L, 7L, ts("2024-01-01 00:00:00")),
      (2L, 7L, ts("2024-01-01 00:30:00")),  // gap exactly 1800 s — same session
      (3L, 7L, ts("2024-01-01 01:00:01")),  // 1801 s — new session
      (4L, 7L, ts("2024-01-01 01:10:00")),
      (5L, 8L, ts("2024-01-01 00:00:00"))   // other key restarts at 1
    ).toDF("event_id", "user_id", "t")
    val got = Temporal.sessionize(df, "user_id", "t", gapSeconds = 1800L,
        ordCols = Seq("event_id"))
      .select("event_id", "session_idx").as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 2L, 5L -> 1L))
  }

  test("sessionize covers every row exactly once (partition invariant, sf0.001)") {
    val e = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "events")
      .select("event_id", "user_id", "ts")
    val out = Temporal.sessionize(e, "user_id", "ts", 1800L, Seq("event_id"))
    assert(out.count() == e.count())
    // session ids are dense per user: max == distinct count
    val bad = out.groupBy("user_id")
      .agg(max("session_idx").as("mx"), countDistinct("session_idx").as("n"))
      .filter($"mx" =!= $"n").count()
    assert(bad == 0)
    // within a session, consecutive gaps never exceed the timeout;
    // across session boundaries they always do
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val gaps = out.withColumn("prev_ts", lag("ts", 1).over(w))
      .withColumn("prev_sess", lag("session_idx", 1).over(w))
      .filter($"prev_ts".isNotNull)
      .withColumn("gap_us", unix_micros($"ts") - unix_micros($"prev_ts"))
    assert(gaps.filter($"prev_sess" === $"session_idx" &&
      $"gap_us" > 1800L * 1000000L).count() == 0)
    assert(gaps.filter($"prev_sess" =!= $"session_idx" &&
      $"gap_us" <= 1800L * 1000000L).count() == 0)
  }
}
