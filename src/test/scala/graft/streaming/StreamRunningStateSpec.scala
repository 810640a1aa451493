package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSuite
import graft.operators.TemporalOps

/**
 * Streaming twins of the round-8 running-state operators: the stream
 * keeps ONE long per key (`StatefulOps.RunningRecurrenceProcessor`)
 * where batch holds the history, and must produce bit-identical values
 * — EWMA vs `TemporalOps.ewmaSmooth`, clamped balance vs
 * `TemporalOps.clampedBalance` — even when a key's series is split
 * across micro-batch boundaries (checkpointed state continues the
 * walk).
 */
class StreamRunningStateSpec extends SparkSuite {
  import spark.implicits._

  private def tmp(p: String): String = Files.createTempDirectory(p).toString

  private val schema = "k LONG, t LONG, tie LONG, x LONG"

  private def writeBatch(dir: String, rows: Seq[(Long, Long, Long, Long)]): Unit =
    rows.toDF("k", "t", "tie", "x").coalesce(1)
      .write.mode("append").json(dir)

  private def runOnce(out: String, ckpt: String, in: String,
      step: (Option[Long], Long) => Long): Unit =
    StatefulOps.runningRecurrenceStream(
        spark.readStream.schema(schema).json(in), step)
      .toDF().writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .outputMode("append").trigger(Trigger.Once()).start()
      .awaitTermination()

  private def withRocksDb(body: => Unit): Unit = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  private def streamed(out: String): Map[(Long, Long), Long] =
    spark.read.parquet(out).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(4)).toMap

  // a key whose walk crosses both batch boundaries, plus a key that
  // appears only in the second batch (fresh state mid-stream)
  private val batch1 = Seq((1L, 1L, 1L, 900L), (1L, 2L, 2L, -400L),
    (2L, 1L, 3L, 100L))
  private val batch2 = Seq((1L, 3L, 4L, -800L), (3L, 1L, 5L, 50L))
  private val batch3 = Seq((1L, 4L, 6L, 300L), (2L, 2L, 7L, -500L),
    (3L, 2L, 8L, 70L))
  private val allRows = batch1 ++ batch2 ++ batch3

  test("streaming EWMA ≡ batch ewmaSmooth across micro-batch boundaries") {
    withRocksDb {
      val in = tmp("ew_in_"); val out = tmp("ew_out_"); val ck = tmp("ew_ck_")
      Seq(batch1, batch2, batch3).foreach { b =>
        writeBatch(in, b); runOnce(out, ck, in, StatefulOps.EwmaStep)
      }
      val want = TemporalOps.ewmaSmooth(
          allRows.toDF("k", "t", "tie", "x"), "k", "t", "tie", "x")
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(4))
        .toMap
      assert(streamed(out) === want)
      assert(streamed(out).size === allRows.size)
    }
  }

  test("streaming clamped balance ≡ batch clampedBalance (reflection " +
      "identity) across micro-batch boundaries") {
    withRocksDb {
      val in = tmp("cb_in_"); val out = tmp("cb_out_"); val ck = tmp("cb_ck_")
      Seq(batch1, batch2, batch3).foreach { b =>
        writeBatch(in, b); runOnce(out, ck, in, StatefulOps.ClampStep)
      }
      val want = TemporalOps.clampedBalance(
          allRows.toDF("k", "t", "tie", "x"), "k", "t", "tie", "x")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Long]("balance"))
        .toMap
      assert(streamed(out) === want)
      // the fixture actually clamps: key 1's third step would go negative
      assert(streamed(out)((1L, 3L)) === 0L)
    }
  }
}
