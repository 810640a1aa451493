package graft.streaming

import org.apache.spark.sql.streaming.StreamingQuery
import org.slf4j.LoggerFactory

/**
 * Restart policy around a streaming query (reference O12 + O14): a failed
 * batch leaves the checkpoint un-advanced, so restarting the query replays
 * the same data — the Spark equivalent of the reference's
 * no-ack → Pulsar-ackTimeout redelivery loop (MessageProcessor.java:131-143,
 * environment.conf:9). The consecutive-failure budget itself lives in
 * [[FailFastSink]] (it must survive restarts, like the reference's
 * `subsequentWriteFailCount` field survives dump cycles); once the sink
 * throws [[FailFastExhausted]] the supervisor stops retrying and rethrows —
 * the reference's teardown path (Main.java:31-39).
 */
object StreamSupervisor {

  private val log = LoggerFactory.getLogger(getClass)

  /**
   * Run `startQuery` to completion, restarting on transient failure.
   *
   * @param startQuery   starts (or restarts) the query from its checkpoint
   * @param maxRestarts  hard cap on restarts, a backstop against a
   *                     poison-pill loop that never reaches the sink budget
   * @return number of times the query was started
   */
  def runToCompletion(startQuery: () => StreamingQuery, maxRestarts: Int = 100): Int = {
    var starts = 0
    var done = false
    while (!done) {
      val q = startQuery()
      starts += 1
      try {
        q.awaitTermination()
        done = true
      } catch {
        case e: Throwable if isExhausted(e) =>
          log.error(s"fail-fast budget exhausted after $starts starts; tearing down")
          throw e
        case e: Throwable if starts <= maxRestarts =>
          log.warn(s"query failed (start $starts), restarting from checkpoint: ${e.getMessage}")
        case e: Throwable =>
          throw e
      }
    }
    starts
  }

  /** True when [[FailFastExhausted]] appears anywhere in the cause chain
    * (it wraps the original sink error, so a root-cause walk would step
    * straight past it). */
  @annotation.tailrec
  def isExhausted(t: Throwable): Boolean =
    t match {
      case null => false
      case _: FailFastExhausted => true
      case _ if t.getCause eq t => false
      case _ => isExhausted(t.getCause)
    }
}
