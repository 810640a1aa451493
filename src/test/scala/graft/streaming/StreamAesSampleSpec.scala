package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSuite
import graft.operators.CorpusAssembly

/**
 * Streaming A-ES weighted reservoir (q180's stream twin): k items per
 * stratum, odds ∝ weight, in exactly k state entries per key — and
 * BIT-IDENTICAL to the batch operator on the same rows, because both
 * run the same deterministic md5 → Q20-log2 → Q36-ratio key lattice.
 * The replay crosses three checkpointed micro-batches, shuffles the
 * arrival order between stream and batch, and still agrees exactly:
 * min-k of a set is arrival-order independent by construction (the
 * property that makes A-ES the distributed/streaming-native weighted
 * sampler).
 */
class StreamAesSampleSpec extends SparkSuite {
  import spark.implicits._

  private def tmp(p: String): String = Files.createTempDirectory(p).toString

  private val schema = "k LONG, id LONG, w LONG"

  test("streaming A-ES across 3 checkpointed restarts == batch sampler " +
      "bit-for-bit; state bounded at k; w <= 0 dropped") {
    val key = "spark.sql.streaming.stateStore.providerClass"
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    // 2 strata × 90 items with varied weights, including w <= 0 rows
    val rows = (1 to 180).map { i =>
      (i % 2L, i.toLong * 17, if (i % 19 == 0) 0L else (i % 7L) * 100 + 1)
    }
    val in = tmp("aes_in_"); val out = tmp("aes_out_"); val ck = tmp("aes_ck_")
    def runOnce(): Unit =
      StatefulOps.aesSampleStream(
          spark.readStream.schema(schema).json(in), k = 9)
        .toDF().writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ck)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
        .awaitTermination()
    // stream sees a DIFFERENT arrival order than batch (reversed, then
    // chunked); the sample must not care
    val shuffled = rows.reverse
    val batches = Seq(shuffled.take(60), shuffled.slice(60, 120),
      shuffled.drop(120) ++ Seq((0L, StatefulOps.AesFlushId, 1L),
        (1L, StatefulOps.AesFlushId, 1L)))
    batches.foreach { b =>
      b.toDF("k", "id", "w").coalesce(1).write.mode("append").json(in)
      runOnce()
    }
    val got = spark.read.parquet(out)
      .select("k", "rk", "id", "w", "aesKey")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).sortBy(x => (x._1, x._2)).toSeq
    val want = CorpusAssembly.weightedSampleNoReplacement(
        rows.toDF("k", "id", "w"), "k", "id", "w", 9)
      .select(col("k"), col("rk"), col("id"), col("w"), col("aes_key"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).sortBy(x => (x._1, x._2)).toSeq
    assert(got === want)
    assert(got.size === 18) // k = 9 per stratum, both emitted on flush
    assert(got.forall(_._4 > 0))
  }
}
