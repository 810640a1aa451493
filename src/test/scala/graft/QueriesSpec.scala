package graft

/**
 * Registry smoke: every declared query builds a plan and returns rows at
 * sf0.001; oracle keys ⊆ query keys; flagship entry is non-empty. The
 * value-level gate is the driver's DuckDB compare (scripts/oracle_check.py
 * reproduces it locally at sf0.01).
 */
class QueriesSpec extends SparkSuite {

  test("entry (flagship) returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql keys are a subset of queries keys") {
    val extra = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(extra.isEmpty, s"oracleSql without query: $extra")
  }

  test("headline queries exist in the registry") {
    val missing = SparkEntry.headlineQueries.toSet -- SparkEntry.queries.keySet
    assert(missing.isEmpty)
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name runs at sf0.001 and returns rows") {
      val df = fn(spark, sf())
      assert(df.count() > 0, s"$name returned no rows")
    }
  }
}
