package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.streaming.Trigger

import graft.SparkSuite

/**
 * Streaming histogram quantiles: nBuckets longs of state per key where
 * exact quantiles need the whole history — q129's IVM-quantile answer
 * kept live. Counts commute, so unlike the SpaceSaving summary the
 * estimates are arrival-order-independent BY CONSTRUCTION; the spec
 * pins exact lower-edge estimates across three checkpointed
 * micro-batches, including clamping and the mid-stream flush.
 */
class StreamQuantileSpec extends SparkSuite {
  import spark.implicits._

  private def tmp(p: String): String = Files.createTempDirectory(p).toString

  private val schema = "k LONG, t LONG, tie LONG, v LONG"

  private def writeBatch(dir: String,
      rows: Seq[(Long, Long, Long, Long)]): Unit =
    rows.toDF("k", "t", "tie", "v").coalesce(1)
      .write.mode("append").json(dir)

  private def runOnce(out: String, ckpt: String, in: String): Unit =
    StatefulOps.quantileStream(
        spark.readStream.schema(schema).json(in),
        lo = 0L, width = 10L, nBuckets = 10, percentiles = Seq(50, 90))
      .toDF().writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .outputMode("append").trigger(Trigger.Once()).start()
      .awaitTermination()

  test("histogram-state quantiles are exact lower edges across " +
      "micro-batch boundaries; out-of-range values clamp; a mid-stream " +
      "flush sees only the prefix") {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val F = StatefulOps.QFlushValue
      // batch1: values 5, 15, 25 then FLUSH (n=3: p50 → cum walk over
      // buckets [0,10,20]: 2·100 ≥ 150 at bucket 1 edge 10; p90 →
      // bucket 2 edge 20)
      val b1 = Seq((0L, 1L, 1L, 5L), (0L, 2L, 2L, 15L),
        (0L, 3L, 3L, 25L), (0L, 4L, 4L, F))
      // batch2: six more values in the 90s (95 clamps to bucket 9,
      // 999 clamps too) — median moves right
      val b2 = (5L to 10L).map(t => (0L, t, t, if (t == 10) 999L else 95L))
      // batch3: final flush: n=9; p50: cum 100·cum ≥ 450 → walk 5,15,
      // 25 (cum 3 at b2 → 300 < 450) then buckets empty until b9: cum
      // 9 → edge 90; p90 → edge 90
      val b3 = Seq((0L, 11L, 11L, F))
      val in = tmp("q_in_"); val out = tmp("q_out_"); val ck = tmp("q_ck_")
      Seq(b1, b2, b3).foreach { b => writeBatch(in, b); runOnce(out, ck, in) }
      val got = spark.read.parquet(out).collect()
        .map(r => (r.getAs[Long]("n"), r.getAs[Long]("q")) ->
          r.getAs[Long]("est")).toMap
      assert(got((3L, 50L)) == 10L)
      assert(got((3L, 90L)) == 20L)
      assert(got((9L, 50L)) == 90L)
      assert(got((9L, 90L)) == 90L)
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }
}
