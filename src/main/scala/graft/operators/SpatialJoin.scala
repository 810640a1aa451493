package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * ε-radius planar point self-join by grid-cell bucketing — the spatial
 * counterpart of the banded-candidate discipline used everywhere else in
 * this engine (LSH bands, simhash blocks, FastSS variants): candidates
 * come from an EQUALITY join on a derived bucket key, never from an
 * all-pairs product or a non-equi join the planner would nested-loop.
 *
 * The reference's data model is a vehicle-position firehose
 * (lat/long per HFP message — MessageProcessor.java handleMessage);
 * "which vehicles were within ε of each other" is the proximity query
 * that model implies (headway monitoring, bunching detection), and it is
 * also the collision-pair primitive of any geospatial training-data
 * pipeline.
 *
 * Correctness: with cell width exactly ε, two points at distance ≤ ε
 * differ by at most 1 in each floor(coord/ε) cell index, so scanning the
 * 3×3 neighborhood of one side is exhaustive (the classic fixed-grid
 * spatial join). Each unordered pair is emitted exactly ONCE: the probe
 * side explodes to its 9 neighbor cells, the build side stays in its own
 * single cell, and `id_a < id_b` keeps one orientation — a pair meets in
 * exactly one (probe-neighbor, build-home) cell.
 *
 * Scale shape: the only corpus-sized shuffle is the (cx, cy) equality
 * join, 9n probe rows against n build rows; the distance test is a
 * codegen'd long filter on the join output. Work is Σ over cells of
 * 9·|cell|², the grid twin of the LSH bucket bound — ε (the cell width)
 * is the occupancy knob, and a hot cell (a depot where every vehicle
 * parks) is diagnosed by the same counts-of-counts profile as any hot
 * key (SkewOps.keySkewProfile on the cell id) and handled by AQE skew
 * split, since the join is a plain shuffled equi-join.
 *
 * All arithmetic is integer (millimeter coordinates, squared distance —
 * no sqrt, no doubles), so the pair set is bit-deterministic
 * cross-engine. `epsMm` is capped so dx² + dy² (|dx|, |dy| ≤ 2ε inside a
 * 3×3 neighborhood) cannot overflow a long.
 */
object SpatialJoin {

  /** All (id_a, id_b, dist2_mm2) with id_a < id_b and squared planar
    * distance ≤ epsMm². Coordinates are integer millimeters (longs,
    * negative allowed — cell indexing floor-divides). */
  def epsSelfJoin(points: DataFrame, idCol: String, xCol: String,
      yCol: String, epsMm: Long): DataFrame = {
    require(epsMm >= 1 && epsMm <= 1000000000L,
      s"epsMm in [1, 1e9] (long-safe squared distance), got $epsMm")
    val eps = lit(epsMm)
    val p = points.select(col(idCol).as("pid"),
      col(xCol).cast("long").as("x"), col(yCol).cast("long").as("y"),
      TemporalOps.floorDiv(col(xCol).cast("long"), lit(epsMm)).as("cx"),
      TemporalOps.floorDiv(col(yCol).cast("long"), lit(epsMm)).as("cy"))
    val neighborhood = array(
      (for (dx <- -1 to 1; dy <- -1 to 1) yield
        struct((col("cx") + dx).as("cx"), (col("cy") + dy).as("cy"))): _*)
    val probe = p.select(col("pid").as("id_a"), col("x").as("xa"),
      col("y").as("ya"), explode(neighborhood).as("c"))
    val build = p.select(col("pid").as("id_b"), col("x").as("xb"),
      col("y").as("yb"), col("cx"), col("cy"))
    val dx = col("xa") - col("xb")
    val dy = col("ya") - col("yb")
    val d2 = dx * dx + dy * dy
    probe
      .select(col("id_a"), col("xa"), col("ya"),
        col("c.cx").as("cx"), col("c.cy").as("cy"))
      .join(build, Seq("cx", "cy"))
      .where(col("id_a") < col("id_b") && d2 <= eps * eps)
      .select(col("id_a"), col("id_b"), d2.as("dist2_mm2"))
  }
}
