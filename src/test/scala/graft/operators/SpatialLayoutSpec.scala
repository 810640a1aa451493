package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Z-order layout property: after Morton clustering, a small bounding
  * box overlaps the min/max envelope of only a few files, where a
  * round-robin layout smears every file across the whole extent — the
  * file-level stat-skipping the reference's lat/long B-trees imply. */
class SpatialLayoutSpec extends SparkSuite {

  // 40k points on a deterministic 200×200 grid over the Helsinki region
  private def points =
    spark.range(40000).select(
      col("id"),
      (lit(59.8) + (col("id") % 200).cast("double") / 200.0).as("lat"),
      (lit(24.4) + (col("id") / 200 % 200).cast("double") / 200.0).as("lng"))

  private case class FileStats(minLat: Double, maxLat: Double,
      minLng: Double, maxLng: Double)

  private def fileStats(path: String): Seq[FileStats] =
    spark.read.parquet(path)
      .groupBy(input_file_name())
      .agg(min("lat"), max("lat"), min("lng"), max("lng"))
      .collect().toSeq
      .map(r => FileStats(r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))

  private def touching(stats: Seq[FileStats],
      lo: (Double, Double), hi: (Double, Double)): Int =
    stats.count(s => !(s.maxLat < lo._1 || s.minLat > hi._1 ||
      s.maxLng < lo._2 || s.minLng > hi._2))

  test("morton code interleaves: neighbors in 2-D are neighbors in the code") {
    // two adjacent grid cells differ in few low bits; opposite corners
    // of the domain sit at the extremes of the code space
    val codes = Seq((59.8, 24.4), (60.8, 25.4), (-90.0, -180.0), (90.0, 180.0))
      .map { case (la, lo) =>
        spark.range(1).select(
          SpatialLayout.mortonCode(lit(la), lit(lo)).as("m")).head().getLong(0)
      }
    assert(codes(2) === 0L)                      // domain min → code 0
    assert(codes(3) === (1L << 32) - 1)          // domain max → all 32 bits set
    assert(codes(0) < codes(1))                  // NE of Helsinki sorts after
  }

  test("a small bbox touches few Z-ordered files but every round-robin file") {
    val zDir = Files.createTempDirectory("graft_z_").toString
    val rrDir = Files.createTempDirectory("graft_rr_").toString
    SpatialLayout.writeSpatiallyClustered(points, "lat", "lng", zDir, numFiles = 16)
    points.repartition(16).write.mode("overwrite").parquet(rrDir)
    val (zStats, rrStats) = (fileStats(zDir), fileStats(rrDir))
    assert(zStats.size === 16 && rrStats.size === 16)
    // ~0.05° box ≈ 1/400 of the extent's area
    val lo = (60.30, 24.90); val hi = (60.35, 24.95)
    val zTouch = touching(zStats, lo, hi)
    val rrTouch = touching(rrStats, lo, hi)
    assert(rrTouch === 16, s"round-robin should smear: $rrTouch")
    assert(zTouch <= 4, s"Z-order should localize: $zTouch of 16 files touch")
    // layout is lossless: the bbox query returns identical rows
    def bbox(path: String) = spark.read.parquet(path)
      .filter(col("lat").between(lo._1, hi._1) && col("lng").between(lo._2, hi._2))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(bbox(zDir) === bbox(rrDir) && bbox(zDir).nonEmpty)
  }
}
