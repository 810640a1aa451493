package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSuite
import graft.operators.StatsOps
import graft.queries.Tables

/**
 * Streaming twin of the q252 CUSUM changepoint monitor: the stream
 * runs the recursions directly on TWO longs of state per cell where
 * the batch operator distributes them via the prefix-min identity —
 * and the two must agree bit-for-bit on every (cell, t) row, alarms
 * included, even when the series is split across checkpointed
 * micro-batch boundaries MID-EXCURSION (the injected click shift
 * spans the last chunk boundary, so the upper CUSUM is nonzero at a
 * restart — the state the checkpoint must carry).
 */
class StreamCusumSpec extends SparkSuite {

  private def tmp(p: String): String = Files.createTempDirectory(p).toString

  private val KUp = 700000L; private val HUp = 600000L
  private val KDn = 300000L; private val HDn = 600000L

  /** q252's exact daily fixture over the real events table. */
  private def daily: DataFrame =
    Tables.events(spark, sf())
      .filter(col("value").isNotNull)
      .select(col("event_type").as("et"),
        expr("ts div 86400000000000").as("day"),
        expr("cast(cast(value as decimal(18,4)) * 10000 as bigint)")
          .as("c"))
      .groupBy(col("et"), col("day"))
      .agg(expr("sum(c) div count(1)").as("a"))
      .select(col("et").as("k"), col("day").as("t"),
        (col("a") +
          when(col("et") === "click" && col("day") >= 19743L, 500000L)
            .otherwise(0L) -
          when(col("et") === "error" && col("day") >= 19743L, 400000L)
            .otherwise(0L)).as("v"))

  test("streaming CUSUM ≡ batch prefix-min identity bit-for-bit " +
      "across checkpointed restarts that split the injected excursion") {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "org.apache.spark.sql.execution.streaming." +
      "state.RocksDBStateStoreProvider")
    try {
      val in = tmp("cusum_in_"); val out = tmp("cusum_out_")
      val ck = tmp("cusum_ck_")
      val frame = daily.localCheckpoint(true)
      // chunk boundaries: pre-shift / shift onset / mid-excursion —
      // the third restart begins with a nonzero standing S+
      def chunk(pred: org.apache.spark.sql.Column): Unit =
        frame.filter(pred).coalesce(1).write.mode("append").json(in)
      def runOnce(): Unit =
        StatefulOps.cusumStream(
            spark.readStream.schema("k STRING, t LONG, v LONG").json(in),
            KUp, HUp, KDn, HDn)
          .toDF().writeStream.format("parquet")
          .option("path", out).option("checkpointLocation", ck)
          .outputMode("append").trigger(Trigger.AvailableNow()).start()
          .awaitTermination()
      chunk(col("t") < 19740L); runOnce()
      chunk(col("t") >= 19740L && col("t") < 19746L); runOnce()
      chunk(col("t") >= 19746L); runOnce()

      val got = spark.read.parquet(out).collect()
        .map(r => (r.getString(0), r.getLong(1)) ->
          ((r.getLong(2), r.getLong(3), r.getInt(4), r.getLong(5),
            r.getInt(6)))).toMap
      val want = StatsOps.cusum(frame, "k", "t", "v",
          KUp, HUp, KDn, HDn)
        .collect().map(r => (r.getString(0), r.getLong(1)) ->
          ((r.getLong(2), r.getLong(3), r.getInt(4), r.getLong(5),
            r.getInt(6)))).toMap
      assert(got === want)
      assert(got.nonEmpty)
      // the fixture's planted alarms actually fire in the stream
      assert(got.exists { case ((k, _), t) => k == "click" && t._3 == 1 })
      assert(got.exists { case ((k, _), t) => k == "error" && t._5 == 1 })
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }
}
