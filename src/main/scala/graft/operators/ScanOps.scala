package graft.operators

import org.apache.spark.sql.DataFrame

/** Scan-side helpers shared by the CPU-heavy per-row operators. */
object ScanOps {

  /**
   * Small-input parallelism guard for CPU-bound per-row stages (hashing,
   * stopword scoring, hyperplane dots): Spark's scan splitter sizes
   * partitions for I/O (`maxPartitionBytes`/`openCostInBytes`), so a
   * few-MB parquet file arrives as 1-2 partitions and the per-row work
   * runs on 1-2 cores. When the scan offers fewer partitions than the
   * cluster has slots, spread it; the explicit partition count keeps AQE
   * from coalescing the exchange back down (AQE only coalesces counts it
   * chose itself). At real scale the scan has ≫ slots partitions and this
   * is a no-op — row bodies then never cross a shuffle.
   */
  def spreadSmallInput(df: DataFrame): DataFrame = {
    val slots = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < slots) df.repartition(slots) else df
  }
}
