package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/**
 * Spatial file layout for bounding-box workloads (the reference's
 * lat/long B-tree indexes, run/init.sql:83-84, restated at the storage
 * layer): interleave the bits of quantized latitude and longitude into a
 * Morton (Z-order) code and range-partition + sort the write on it, so
 * points that are close in 2-D land in the same files and row groups.
 * A bounding-box scan then skips most files on parquet min/max footer
 * stats alone — the 2-D generalization of the BRIN/time-chunk layout
 * the at-rest landing already uses for the time axis.
 *
 * Pure integer expression arithmetic (quantize → shift/mask → sum), so
 * the code computes inside whole-stage codegen; the only data movement
 * is the explicit range repartition of the write itself.
 */
object SpatialLayout {

  /** Value → `bits`-bit cell index over [min, max], clamped at the
    * edges (out-of-range points land in the boundary cells). Long
    * literals: `1 << 31` as an Int is negative and would silently
    * collapse every point to cell 0. */
  def quantize(c: Column, min: Double, max: Double, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
    least(lit((1L << bits) - 1), greatest(lit(0L),
      floor((c - lit(min)) / lit(max - min) * lit(1L << bits))
        .cast(LongType)))
  }

  /** Morton (Z-order) code: bit i of the quantized latitude goes to
    * output bit 2i+1, of longitude to bit 2i. WGS84 domains. */
  def mortonCode(lat: Column, lng: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
    val la = quantize(lat, -90.0, 90.0, bits)
    val lo = quantize(lng, -180.0, 180.0, bits)
    (0 until bits).map { i =>
      shiftright(la, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1)) +
        shiftright(lo, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i))
    }.reduce(_ + _)
  }

  /**
   * Write `df` as parquet spatially clustered into `numFiles` files:
   * range-partitioned and sorted by Morton code. The helper column is
   * dropped before the write — the layout survives as file/row-group
   * locality, not as a stored column.
   */
  def writeSpatiallyClustered(df: DataFrame, latCol: String, lngCol: String,
      path: String, numFiles: Int, bits: Int = 16): Unit =
    df.withColumn("__morton", mortonCode(col(latCol), col(lngCol), bits))
      .repartitionByRange(numFiles, col("__morton"))
      .sortWithinPartitions("__morton")
      .drop("__morton")
      .write.mode("overwrite").parquet(path)
}
