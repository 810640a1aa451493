package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSuite
import graft.operators.StatsOps
import graft.queries.Tables

/**
 * Streaming twin of the q279 runs-test monitor (the 21st twin): the
 * stream carries four longs per cell where the batch operator counts
 * hierarchically over order buckets — each micro-batch is a bucket
 * and the carried last flag is the boundary term, so the final
 * emitted row per cell must be bit-equal to the batch summary, z
 * included, even when the chunk boundaries split the click cell's
 * planted 64-long runs MID-RUN (the carried flag is exactly the
 * state a naive per-batch recount would lose).
 */
class StreamRunsSpec extends SparkSuite {

  private def tmp(p: String): String = Files.createTempDirectory(p).toString

  /** q279's exact flag fixture over the real events table. */
  private def flags: DataFrame =
    Tables.events(spark, sf())
      .select(col("event_type").as("k"), col("event_id").as("t"),
        when(col("event_type") === "click",
          (expr("(event_id div 64) % 2") === 0L).cast("long"))
          .otherwise(when(col("value").isNotNull,
            (expr("cast(cast(value as decimal(18,4)) * 10000 " +
              "as bigint)") >= 500000L).cast("long"))).as("b"))
      .filter(col("b").isNotNull)

  test("streaming runs monitor ≡ batch hierarchical count bit-for-bit " +
      "across checkpointed restarts that split the planted runs") {
    val key = "spark.sql.streaming.stateStore.providerClass"
    spark.conf.set(key, "org.apache.spark.sql.execution.streaming." +
      "state.RocksDBStateStoreProvider")
    val in = tmp("runs_in_"); val out = tmp("runs_out_")
    val ck = tmp("runs_ck_")
    val frame = flags.localCheckpoint(true)
    // boundaries at 100/160: NOT multiples of 64, so the click cell's
    // planted runs straddle both restarts mid-run
    def chunk(pred: org.apache.spark.sql.Column): Unit =
      frame.filter(pred).coalesce(1).write.mode("append").json(in)
    def runOnce(): Unit =
      StatefulOps.runsStream(
          spark.readStream.schema("k STRING, t LONG, b LONG").json(in))
        .toDF().writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ck)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
        .awaitTermination()
    chunk(col("t") < 100L); runOnce()
    chunk(col("t") >= 100L && col("t") < 160L); runOnce()
    chunk(col("t") >= 160L); runOnce()

    val finals = spark.read.parquet(out).collect()
      .map(r => (r.getString(0),
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), if (r.isNullAt(6)) null else r.getLong(6))))
      .groupBy(_._1)
      .map { case (k, rows) => k -> rows.map(_._2).maxBy(_._1) }
    val want = StatsOps.runsTest(
        frame.toDF("cell", "o", "b"), "cell", "o", "b")
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4),
        if (r.isNullAt(5)) null else r.getLong(5)))).toMap
    assert(finals.keySet === want.keySet)
    for ((k, (_, n, n1, n0, rRuns, z)) <- finals) {
      val (wn, wn1, wn0, wr, wz) = want(k)
      assert((n, n1, n0, rRuns) === ((wn, wn1, wn0, wr)), s"cell $k")
      assert(z === wz, s"cell $k z")
    }
    // the monitor actually monitors: click's planted clumping reads a
    // large negative z on the FINAL row
    assert(finals("click")._6.asInstanceOf[Long] < -10000L)
  }
}
