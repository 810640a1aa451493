package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Semantic properties of the deterministic Bloom pre-filter beyond the
  * q192 oracle gate. */
class BloomOpsSpec extends SparkSuite {
  import spark.implicits._

  private def small = (1L to 20L).toDF("k")
  private def large = (1L to 2000L).toDF("k")

  test("bloom prefilter: zero false negatives by construction; the " +
      "default geometry passes no stranger at this size") {
    val tagged = BloomOps.bloomTag(large, "k",
      BloomOps.buildBitmap(small, "k"))
    assert(tagged.filter(col("k") <= 20 && col("bloom_pass") === 0)
      .count() === 0, "a member failed the filter — impossible by OR-build")
    assert(tagged.filter(col("k") > 20 && col("bloom_pass") === 1)
      .count() === 0, "2^16 bits / 60 set: fp must be ~0 here")
  }

  test("a cramped bitmap yields false positives but still no false " +
      "negatives, and the fp SET is deterministic") {
    def passSum = BloomOps.bloomTag(large, "k",
        BloomOps.buildBitmap(small, "k", bits = 64), bits = 64)
    val t = passSum
    assert(t.filter(col("k") <= 20 && col("bloom_pass") === 0).count() === 0)
    val fps = t.filter(col("k") > 20 && col("bloom_pass") === 1).count()
    assert(fps > 0, "60 probe bits in a 64-bit bitmap must collide")
    // the exact same pass set on a rebuild — the fp set is part of the
    // contract, not an accident of partitioning
    def sig(df: org.apache.spark.sql.DataFrame) =
      df.filter(col("bloom_pass") === 1).agg(sum(col("k"))).head().getLong(0)
    assert(sig(t) === sig(passSum))
  }

  test("bloomTag is streaming-safe: a LANDED bitmap tags an unbounded " +
      "stream as a stateless projection (the reuse story: build once in " +
      "batch, filter every micro-batch)") {
    import org.apache.spark.sql.streaming.Trigger
    val bm = BloomOps.buildBitmap(small, "k")
    val in = java.nio.file.Files.createTempDirectory("bloom_stream_in_")
      .toString
    (1L to 200L).toDF("k").write.mode("overwrite").parquet(in)
    val tagged = BloomOps.bloomTag(
      spark.readStream.schema("k LONG").parquet(in), "k", bm)
    assert(tagged.isStreaming)
    val q = tagged.writeStream.format("memory").queryName("bloom_stream")
      .trigger(Trigger.AvailableNow()).start()
    try q.awaitTermination(60000) finally q.stop()
    val rows = spark.table("bloom_stream").collect()
      .map(r => r.getAs[Long]("k") -> r.getAs[Int]("bloom_pass")).toMap
    assert(rows.size === 200)
    // members always pass; at this geometry nothing else does
    assert((1L to 20L).forall(rows(_) == 1))
    assert((21L to 200L).forall(rows(_) == 0))
  }

  test("bitmap shape: one row, bits/32 words, dense") {
    val bm = BloomOps.buildBitmap(small, "k").collect()
    assert(bm.length === 1)
    assert(bm.head.getSeq[Long](0).length === BloomOps.DefaultBits / 32)
    // 32-bit words: every word a small non-negative long in both engines
    assert(bm.head.getSeq[Long](0).forall(w => w >= 0 && w < (1L << 32)))
  }
}
