package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSuite
import graft.operators.StatsOps

/**
 * Streaming Jensen–Shannon drift monitor (q198's stream twin): per-cell
 * (key → (p, q)) count state, divergence on the SAME Log2Q20 lattice
 * and the same truncate-toward-zero divisions as the batch operator —
 * so the flush emission over N micro-batches is BIT-identical to
 * `StatsOps.jsDivergence` over the union of those batches. Counts
 * commute, so the replay crosses three checkpointed restarts with a
 * reversed arrival order vs batch and still agrees exactly. A cell
 * whose reference slice never arrives emits null, matching the batch
 * null contract.
 */
class StreamJsDriftSpec extends SparkSuite {
  import spark.implicits._

  private def tmp(p: String): String = Files.createTempDirectory(p).toString

  private val schema = "cell STRING, slice STRING, item STRING"

  test("streaming JS drift across 3 checkpointed restarts == batch " +
      "divergence bit-for-bit; empty reference slice emits null") {
    val key = "spark.sql.streaming.stateStore.providerClass"
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    // cell "drift": B's distribution is A's with a spike; cell "same":
    // identical slices (js must be exactly 0); cell "onesided": A only
    // (js must be null)
    val rows = (1 to 240).map { i =>
      val slice = if (i % 2 == 0) "A" else "B"
      val item =
        if (slice == "B" && i % 8 == 1) "spike" else "k" + (i % 5)
      ("drift", slice, item)
    } ++ (1 to 60).map(i => ("same", if (i % 2 == 0) "A" else "B",
      "k" + (i % 3))) ++
      (1 to 20).map(i => ("onesided", "A", "k" + (i % 4)))
    val in = tmp("js_in_"); val out = tmp("js_out_"); val ck = tmp("js_ck_")
    def runOnce(): Unit =
      StatefulOps.jsDriftStream(
          spark.readStream.schema(schema).json(in))
        .toDF().writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ck)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
        .awaitTermination()
    val shuffled = rows.reverse
    val flushes = Seq("drift", "same", "onesided")
      .map(c => (c, StatefulOps.JsFlushSlice, "x"))
    val batches = Seq(shuffled.take(100), shuffled.slice(100, 220),
      shuffled.drop(220) ++ flushes)
    batches.foreach { b =>
      b.toDF("cell", "slice", "item").coalesce(1)
        .write.mode("append").json(in)
      runOnce()
    }
    val got = spark.read.parquet(out)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3),
          Option(r.get(4)).map(_.asInstanceOf[Long])))).toMap
    val want = StatsOps.jsDivergence(
        rows.toDF("cell", "slice", "item"), "cell", "slice", "A", "B",
        "item")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3),
          Option(r.get(4)).map(_.asInstanceOf[Long])))).toMap
    assert(got === want)
    assert(got("drift")._4.exists(_ > 0L))
    assert(got("same")._4.contains(0L))
    assert(got("onesided")._4.isEmpty)
  }
}
