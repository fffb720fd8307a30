package graft.streaming

import org.apache.spark.sql.streaming.StreamingQueryListener
import java.util.concurrent.atomic.AtomicLong

/** A13: collector-style operational counters. The reference collectors
  * keep running `records_consumed` / `records_written` / rate stats
  * (air_quality_collector.py:165-179, mqtt_to_kafka_bridge.py:208-220);
  * the Spark-native equivalent is `Dataset.observe` metrics surfaced
  * through a `StreamingQueryListener` — computed on the executors as
  * part of the running query, no extra pass, no driver-side counting of
  * data rows.
  *
  * Attach with `spark.streams.addListener(metrics)`; pair with the
  * `observe(DualSink.MetricsName, …)` call wired into [[DualSink.start]].
  */
final class CollectorMetrics(metricName: String = DualSink.MetricsName)
    extends StreamingQueryListener {

  /** Total rows seen across all batches. */
  val records = new AtomicLong(0)
  /** Total detected objects across all batches. */
  val objects = new AtomicLong(0)
  /** Batches that carried the observed metric. */
  val batches = new AtomicLong(0)
  @volatile var lastBatchId: Long = -1L
  @volatile private var firstMs: Long = -1L
  @volatile private var lastMs: Long = -1L

  override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()

  override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
    val row = e.progress.observedMetrics.get(metricName)
    if (row != null) {
      records.addAndGet(row.getAs[Long]("records"))
      objects.addAndGet(row.getAs[Long]("objects"))
      batches.incrementAndGet()
      lastBatchId = e.progress.batchId
      val now = System.currentTimeMillis()
      if (firstMs < 0) firstMs = now
      lastMs = now
    }
  }

  override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()

  /** Records/second over the observed span (the collectors' rate stat). */
  def ratePerSec: Double = {
    val span = math.max(1L, lastMs - firstMs)
    records.get() * 1000.0 / span
  }
}
