package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

class SpatialJoinSpec extends SparkSuite {
  import spark.implicits._

  private val Eps = 100L

  /** Deterministic scatter with cell-boundary stragglers and negatives. */
  private def pts = (1 to 400).map { i =>
    (i.toLong, (i * 37L + 11L) % 1000L - 300L, (i * 91L + 5L) % 1000L - 300L)
  }.toDF("pid", "x", "y")

  private def brute(df: org.apache.spark.sql.DataFrame) = {
    val a = df.select(col("pid").as("id_a"), col("x").as("xa"), col("y").as("ya"))
    val b = df.select(col("pid").as("id_b"), col("x").as("xb"), col("y").as("yb"))
    val d2 = (col("xa") - col("xb")) * (col("xa") - col("xb")) +
      (col("ya") - col("yb")) * (col("ya") - col("yb"))
    a.crossJoin(b).where(col("id_a") < col("id_b") && d2 <= Eps * Eps)
      .select(col("id_a"), col("id_b"), d2.as("dist2_mm2"))
  }

  test("grid join equals brute force on a scatter with negative coords") {
    val grid = SpatialJoin.epsSelfJoin(pts, "pid", "x", "y", Eps)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val ref = brute(pts)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(grid.nonEmpty, "fixture produced no pairs — eps too small")
    assert(grid === ref)
  }

  test("boundary semantics: distance exactly eps is IN, eps+1 is OUT, " +
    "coincident points pair at distance 0, each pair emitted once") {
    val edge = Seq(
      (1L, 0L, 0L), (2L, Eps, 0L),       // exactly eps apart → in
      (3L, 500L, 0L), (4L, 500L + Eps + 1L, 0L), // just outside → out
      (5L, -50L, -50L), (6L, -50L, -50L), // coincident, negative cell
      (7L, Eps - 1L, 1L)                  // cell straddler near (1,2)
    ).toDF("pid", "x", "y")
    val got = SpatialJoin.epsSelfJoin(edge, "pid", "x", "y", Eps)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.length === got.toSet.size, "duplicate pair emitted")
    val pairs = got.map(t => (t._1, t._2)).toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.contains((3L, 4L)))
    assert(got.contains((5L, 6L, 0L)))
    assert(pairs.contains((1L, 7L)) && pairs.contains((2L, 7L)))
  }

  test("eps bounds validated") {
    intercept[IllegalArgumentException](
      SpatialJoin.epsSelfJoin(pts, "pid", "x", "y", 0L))
    intercept[IllegalArgumentException](
      SpatialJoin.epsSelfJoin(pts, "pid", "x", "y", 2000000000L))
  }

  test("plan shape: candidates come from one equality join on the cell " +
    "key — no cartesian/nested-loop arm") {
    val plan = SpatialJoin.epsSelfJoin(pts, "pid", "x", "y", Eps)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }
}
