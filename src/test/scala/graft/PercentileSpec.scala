package graft

import org.apache.spark.sql.functions._

/**
 * The q58 gate proves the EXACT percentile; this spec proves the 100 TB
 * scale path beside it: `approx_percentile` (Greenwald-Khanna sketch —
 * mergeable partial state, bounded memory, no per-group sort buffer)
 * honors its rank-error contract against the exact answer. GK guarantees
 * the returned value's rank is within n/accuracy of the requested rank,
 * so the approx median must lie between the exact percentiles at
 * p ± 1/accuracy — the principled bound, not a hand-picked epsilon.
 */
class PercentileSpec extends SparkSuite {

  test("approx_percentile lands within its GK rank-error bound of the exact percentile") {
    val acc = 100 // rank error <= n/100, i.e. p stays within ±0.01
    val li = spark.read.parquet(sf("0.01") + "/lineitem.parquet")
    val rows = li.groupBy("l_returnflag", "l_linestatus")
      .agg(
        percentile(col("l_quantity"), lit(0.5 - 1.0 / acc)).as("lo"),
        percentile(col("l_quantity"), lit(0.5 + 1.0 / acc)).as("hi"),
        percentile_approx(col("l_quantity"), lit(0.5), lit(acc)).as("approx"))
      .collect()
    assert(rows.length == 6)
    for (r <- rows) {
      val (lo, hi, approx) =
        (r.getDouble(2), r.getDouble(3), r.getDouble(4))
      assert(lo <= approx && approx <= hi,
        s"approx median $approx outside rank-error band [$lo, $hi] " +
          s"for group (${r.get(0)}, ${r.get(1)})")
    }
  }
}
