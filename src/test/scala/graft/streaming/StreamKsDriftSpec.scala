package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSuite
import graft.operators.StatsOps

/**
 * Streaming KS drift monitor (q197's stream twin): per-cell binned
 * (value → (a, b)) count state, the exact cross-multiplied gap lattice
 * of the batch operator — so the flush emission over N micro-batches is
 * BIT-identical to `StatsOps.ksTest` over the union of those batches,
 * including the lowest-value argmax tie-break. Counts commute: the
 * replay crosses three checkpointed restarts with reversed arrival
 * order vs batch and still agrees exactly.
 */
class StreamKsDriftSpec extends SparkSuite {
  import spark.implicits._

  private def tmp(p: String): String = Files.createTempDirectory(p).toString

  private val schema = "cell STRING, slice STRING, v LONG"

  test("streaming KS drift across 3 checkpointed restarts == batch " +
      "ksTest bit-for-bit; one-sided cell emits nulls") {
    val key = "spark.sql.streaming.stateStore.providerClass"
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    // "shift": B sits 5 above A (strong d); "same": identical supports
    // with an argmax tie resolved to the LOWEST value; "solo": A only
    val rows = (1 to 200).map { i =>
      val slice = if (i % 2 == 0) "A" else "B"
      val v = (i % 7).toLong + (if (slice == "B") 5L else 0L)
      ("shift", slice, v)
    } ++ (1 to 80).map(i =>
      ("same", if (i % 2 == 0) "A" else "B", (i % 5).toLong)) ++
      (1 to 10).map(i => ("solo", "A", i.toLong))
    val in = tmp("ks_in_"); val out = tmp("ks_out_"); val ck = tmp("ks_ck_")
    def runOnce(): Unit =
      StatefulOps.ksDriftStream(
          spark.readStream.schema(schema).json(in))
        .toDF().writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ck)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
        .awaitTermination()
    val shuffled = rows.reverse
    val flushes = Seq("shift", "same", "solo")
      .map(c => (c, StatefulOps.KsFlushSlice, 0L))
    val batches = Seq(shuffled.take(90), shuffled.slice(90, 200),
      shuffled.drop(200) ++ flushes)
    batches.foreach { b =>
      b.toDF("cell", "slice", "v").coalesce(1)
        .write.mode("append").json(in)
      runOnce()
    }
    def norm(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2),
          Option(r.get(3)).map(_.asInstanceOf[Long]),
          Option(r.get(4)).map(_.asInstanceOf[Long])))).toMap
    val got = norm(spark.read.parquet(out).collect())
    val want = norm(StatsOps.ksTest(
      rows.toDF("cell", "slice", "v"), "cell", "slice", "A", "B", "v")
      .collect())
    assert(got === want)
    assert(got("shift")._3.exists(_ > 500000L))
    assert(got("same")._3.contains(0L) && got("same")._4.contains(0L))
    assert(got("solo")._3.isEmpty && got("solo")._4.isEmpty)
  }
}
