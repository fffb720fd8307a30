package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import java.sql.Timestamp

case class Ev(event_id: Long, user_id: Long, ts: Timestamp, value: Double)

/** Batch/streaming parity for gap sessions: the incremental
  * `session_window` plan must finalize exactly the sessions the batch
  * window computes.
  */
class TemporalStreamSpec extends SparkSpec {
  import spark.implicits._

  test("streamingSessions emits exactly the batch sessionize sessions (sf0.001 events)") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val events = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "events")
      .select("event_id", "user_id", "ts", "value").as[Ev].collect().toSeq
    assert(events.nonEmpty)
    val maxTs = events.map(_.ts.getTime).max

    val mem = MemoryStream[Ev]
    val sessions = Temporal.streamingSessions(mem.toDF(), "user_id", "ts",
      gapSeconds = 1800L, watermark = "0 seconds")
    val q = sessions.writeStream.format("memory")
      .queryName("graft_sessions").outputMode("append").start()
    try {
      mem.addData(events: _*)
      q.processAllAvailable()
      // two sentinel batches: the first advances the watermark past
      // every real session's end, the second gives the engine a batch
      // in which to finalize + emit against that watermark
      val sentinel = Ev(-1L, -1L, new Timestamp(maxTs + 7L * 24 * 3600 * 1000), 0.0)
      mem.addData(sentinel); q.processAllAvailable()
      mem.addData(sentinel.copy(event_id = -2L)); q.processAllAvailable()

      val streamed = spark.table("graft_sessions")
        .filter($"user_id" >= 0)
        .select($"user_id", $"session_start", $"session_end", $"n_events")
        .as[(Long, Timestamp, Timestamp, Long)].collect().toSet

      // batch reference: same gap rule; session_window's end is
      // last-event + gap, batch reports observed max(ts)
      val batch = Temporal.sessionize(
          events.toDF(), "user_id", "ts", gapSeconds = 1800L, ordCols = Seq("event_id"))
        .groupBy("user_id", "session_idx")
        .agg(min("ts").as("session_start"),
          (max("ts") + expr("INTERVAL 1800 SECONDS")).as("session_end"),
          count(lit(1)).as("n_events"))
        .select($"user_id", $"session_start", $"session_end", $"n_events")
        .as[(Long, Timestamp, Timestamp, Long)].collect().toSet

      assert(streamed === batch,
        s"streaming=${streamed.size} batch=${batch.size} " +
          s"onlyStreaming=${(streamed -- batch).take(3)} onlyBatch=${(batch -- streamed).take(3)}")
    } finally {
      q.stop()
      spark.sql("DROP VIEW IF EXISTS graft_sessions")
    }
  }

  test("streamingSessions merges out-of-order arrivals inside the watermark into one session") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ev(id: Long, t: String) = Ev(id, 1L, Timestamp.valueOf(t), 1.0)
    val mem = MemoryStream[Ev]
    val q = Temporal.streamingSessions(mem.toDF(), "user_id", "ts",
        gapSeconds = 600L, watermark = "1 hour")
      .writeStream.format("memory").queryName("graft_sessions_ooo")
      .outputMode("append").start()
    try {
      // second micro-batch delivers an EARLIER event that bridges two
      // provisional sessions into one — state merging, not append-only
      mem.addData(ev(1, "2024-01-01 10:00:00"), ev(2, "2024-01-01 10:16:00"))
      q.processAllAvailable()
      mem.addData(ev(3, "2024-01-01 10:08:00"))
      q.processAllAvailable()
      mem.addData(ev(99, "2024-01-02 00:00:00")); q.processAllAvailable()
      mem.addData(ev(98, "2024-01-02 12:00:00")); q.processAllAvailable()
      val out = spark.table("graft_sessions_ooo")
        .filter($"session_start" < "2024-01-01 23:00:00")
        .select($"n_events").as[Long].collect().toSeq
      assert(out === Seq(3L), s"expected one merged 3-event session, got $out")
    } finally {
      q.stop()
      spark.sql("DROP VIEW IF EXISTS graft_sessions_ooo")
    }
  }
}
