package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

class SkewOpsSpec extends SparkSuite {
  import spark.implicits._

  // 1000-row hot key 1 + singleton keys 2..50
  private def skewedLeft =
    ((1 to 1000).map(i => (1L, s"hot$i")) ++ (2 to 50).map(k => (k.toLong, s"cold$k")))
      .toDF("k", "lv")
  private def right = (1 to 50).map(k => (k.toLong, s"r$k")).toDF("k", "rv")

  test("salted join result equals the plain join, including the hot key's rows") {
    val plain = skewedLeft.join(right, Seq("k"))
      .select("k", "lv", "rv").collect().toSet
    val salted = SkewOps.saltedJoin(skewedLeft, right, "k", salts = 8)
      .select("k", "lv", "rv").collect().toSet
    assert(salted === plain)
    assert(plain.count(_.getLong(0) == 1L) === 1000)
  }

  test("the hot key's probe rows actually spread across salt values") {
    val salts = 8
    val l = skewedLeft.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(salts.toLong)))
    val spread = l.filter(col("k") === 1).select(countDistinct(col("__salt")))
      .head().getLong(0)
    assert(spread === salts.toLong, s"hot key uses only $spread of $salts salts")
  }

  test("non-positive salts rejected") {
    intercept[IllegalArgumentException](SkewOps.saltedJoin(skewedLeft, right, "k", 0))
  }
}
