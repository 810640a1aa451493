package graft.streaming

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener._
import org.slf4j.LoggerFactory

/**
 * Operational metrics (reference O13): the reference logs per-dump ingress
 * rate and per-batch write rate/size/duration as JSON lines
 * (MessageProcessor.java:82-89, QueueWriter.java:149-158). Structured
 * Streaming computes every one of those natively per micro-batch; this
 * listener surfaces them in the same shape and retains them for
 * programmatic assertion.
 */
object MetricsListener {
  /** One reference-shaped metrics record per micro-batch. */
  final case class BatchMetrics(
      queryRunId: String, batchId: Long, numInputRows: Long,
      inputRowsPerSecond: Double, processedRowsPerSecond: Double,
      batchDurationMs: Long)

  /** Default in-memory retention. The LOG LINE is the durable record
    * (the reference's shape too); the buffer exists for programmatic
    * assertion and must not grow with stream lifetime — at the
    * pipeline's 1 s cadence an unbounded buffer is ~86k records/day of
    * slow driver leak. */
  val DefaultMaxRetained = 10000
}

final class MetricsListener(
    maxRetained: Int = MetricsListener.DefaultMaxRetained)
    extends StreamingQueryListener {
  import MetricsListener.BatchMetrics

  require(maxRetained > 0, s"maxRetained must be positive, got $maxRetained")

  private val log = LoggerFactory.getLogger(getClass)
  private val buf = ArrayBuffer.empty[BatchMetrics]

  def batches: Seq[BatchMetrics] = synchronized(buf.toSeq)

  /** Input rows summed once per batch OVER THE RETAINED WINDOW
    * (`maxRetained` batches). Keyed by (query run, batchId) —
    * the listener is registered session-wide, so bare batchIds collide
    * across queries — and resolved by `max`: Spark may re-emit a progress
    * event for the same batchId (e.g. an empty re-emission at query
    * termination), and the largest observation is the one that carried
    * the batch's rows. */
  def totalInputRows: Long =
    batches.groupBy(m => (m.queryRunId, m.batchId)).values
      .map(_.map(_.numInputRows).max).sum

  override def onQueryStarted(event: QueryStartedEvent): Unit =
    log.info(s"""{"event":"started","id":"${event.id}","name":"${event.name}"}""")

  override def onQueryProgress(event: QueryProgressEvent): Unit = {
    val p = event.progress
    val m = BatchMetrics(
      queryRunId = p.runId.toString,
      batchId = p.batchId,
      numInputRows = p.numInputRows,
      inputRowsPerSecond = p.inputRowsPerSecond,
      processedRowsPerSecond = p.processedRowsPerSecond,
      batchDurationMs = p.batchDuration)
    synchronized {
      buf += m
      // oldest-first eviction at the cap (the log line already shipped)
      if (buf.length > maxRetained) buf.dropInPlace(buf.length - maxRetained)
    }
    // msgRateIn / rows-written-rate parity (MessageProcessor.java:87,
    // QueueWriter.java:149-154)
    log.info(s"""{"event":"progress","batchId":${m.batchId},"rows":${m.numInputRows},""" +
      s""""rowsPerSec":${m.processedRowsPerSecond},"durationMs":${m.batchDurationMs}}""")
  }

  override def onQueryTerminated(event: QueryTerminatedEvent): Unit =
    log.info(s"""{"event":"terminated","id":"${event.id}","error":${event.exception.isDefined}}""")
}
