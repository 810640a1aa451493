package graft.streaming

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.DataFrame

/**
 * Per-micro-batch sink contract used from `foreachBatch` — the Spark
 * restatement of the reference's `QueueWriter.write(List<Hfp.Data>, long)`
 * (QueueWriter.java:50-165): one call per trigger firing, all-or-nothing
 * from the caller's point of view (a thrown exception fails the batch, the
 * streaming checkpoint does not advance, and the data is redelivered on
 * restart — the Pulsar no-ack/redelivery loop, MessageProcessor.java:131-143,
 * subsumed by Spark's offset WAL).
 */
trait BatchSink extends Serializable {
  def write(batch: DataFrame, batchId: Long): Unit
}

/** Append each micro-batch to a parquet directory — the file-landing twin
  * of the reference's JDBC sink, partitionable by the hypertable's own
  * axes (init.sql:70-73) for scan pruning at rest. */
final class ParquetBatchSink(path: String, partitionColumns: Seq[String] = Nil)
    extends BatchSink {
  override def write(batch: DataFrame, batchId: Long): Unit = {
    val w = batch.write.mode("append")
    (if (partitionColumns.nonEmpty) w.partitionBy(partitionColumns: _*) else w)
      .parquet(path)
  }
}

/**
 * Fail-fast circuit breaker around any sink (reference O12: the
 * `subsequentWriteFailCount` budget, QueueWriter.java:20,152,156-161 —
 * 10 consecutive failed batches tear the application down; any success
 * resets the counter).
 *
 * A non-exhausted failure rethrows the original cause: the streaming query
 * fails, the supervisor restarts it from the checkpoint, and the same
 * batch is replayed (the reference's no-ack → Pulsar-redelivery path,
 * environment.conf:9). Once the budget is exhausted the error is wrapped
 * in [[FailFastExhausted]], which [[StreamSupervisor]] refuses to retry —
 * the reference's rethrow-to-teardown (Main.java:31-39).
 */
final class FailFastSink(inner: BatchSink, maxConsecutiveFailures: Int = 10)
    extends BatchSink {
  private val consecutiveFailures = new AtomicInteger(0)

  override def write(batch: DataFrame, batchId: Long): Unit =
    try {
      inner.write(batch, batchId)
      consecutiveFailures.set(0)
    } catch {
      case e: Throwable =>
        val n = consecutiveFailures.incrementAndGet()
        if (n >= maxConsecutiveFailures)
          throw new FailFastExhausted(
            s"sink failed $n consecutive times (budget $maxConsecutiveFailures)", e)
        throw e
    }
}

/** Terminal failure: the consecutive-failure budget is spent; do not restart. */
final class FailFastExhausted(msg: String, cause: Throwable)
    extends RuntimeException(msg, cause)
