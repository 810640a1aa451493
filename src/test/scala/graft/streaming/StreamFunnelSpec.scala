package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSuite
import graft.operators.TemporalOps

/**
 * Streaming twin of the time-bounded funnel (q140): the per-user stage
 * machine (`StatefulOps.FunnelProcessor`) must reach exactly the stages
 * — at exactly the times — that `TemporalOps.funnelWithin` derives in
 * batch, even when a user's events split across micro-batch boundaries
 * (checkpointed state continues the machine), and must emit each
 * advancement exactly once.
 */
class StreamFunnelSpec extends SparkSuite {
  import spark.implicits._

  private def tmp(p: String): String = Files.createTempDirectory(p).toString

  private val Gap = 10L
  private val Stages = Seq("signup", "click", "purchase")
  private val schema = "u LONG, t LONG, et STRING"

  private def writeBatch(dir: String, rows: Seq[(Long, Long, String)]): Unit =
    rows.toDF("u", "t", "et").coalesce(1)
      .write.mode("append").json(dir)

  private def runOnce(out: String, ckpt: String, in: String): Unit =
    StatefulOps.funnelStream(
        spark.readStream.schema(schema).json(in), Stages, Gap)
      .toDF().writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .outputMode("append").trigger(Trigger.Once()).start()
      .awaitTermination()

  // the q140 spec fixture, re-cut so every interesting user's series
  // crosses a micro-batch boundary:
  //  u1 full conversion; u2 click outside the window; u3 the greedy
  //  trap (late click must NOT re-anchor); u4 inclusive boundary;
  //  u5 no signup → never advances
  private val batch1 = Seq(
    (1L, 0L, "signup"), (1L, 5L, "click"),
    (2L, 0L, "signup"),
    (3L, 0L, "signup"), (3L, 1L, "click"),
    (5L, 0L, "click"))
  private val batch2 = Seq(
    (1L, 12L, "purchase"),
    (2L, 11L, "click"), (2L, 12L, "purchase"),
    (3L, 10L, "click"),
    (4L, 0L, "signup"))
  private val batch3 = Seq(
    (3L, 20L, "purchase"),
    (4L, 10L, "click"), (4L, 20L, "purchase"),
    (5L, 1L, "purchase"))
  private val allRows = batch1 ++ batch2 ++ batch3

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

  test("streaming funnel ≡ batch funnelWithin across micro-batch " +
      "boundaries; each advance emitted exactly once") { withRocksDb {
    val in = tmp("fn_in_"); val out = tmp("fn_out_"); val ck = tmp("fn_ck_")
    Seq(batch1, batch2, batch3).foreach { b =>
      writeBatch(in, b); runOnce(out, ck, in)
    }
    val advances = spark.read.parquet(out).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // exactly once: no duplicate (user, stage)
    assert(advances.map(a => (a._1, a._2)).distinct.size == advances.size)
    val topStage = advances.groupBy(_._1).view
      .mapValues(_.map(_._2).max).toMap
    val stageTimes = advances.map(a => (a._1, a._2) -> a._3).toMap

    val batchOut = TemporalOps.funnelWithin(
        allRows.toDF("u", "t", "et"), "u", "t", "et", Stages, Gap)
      .collect()
    for (r <- batchOut) {
      val u = r.getLong(0)
      assert(topStage(u) == r.getAs[Long]("stage_reached"), s"u=$u")
      for (k <- 1 to Stages.size; if !r.isNullAt(k))
        assert(stageTimes((u, k.toLong)) == r.getLong(k),
          s"u=$u stage $k time")
    }
    // batch emits one row per signup user; the stream never advances a
    // user batch never saw (u5 has no signup → absent both sides)
    assert(topStage.keySet == batchOut.map(_.getLong(0)).toSet)
  } }
}
