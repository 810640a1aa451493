package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.streaming.Trigger

import graft.SparkSuite
import graft.operators.MotionOps

/**
 * Streaming twin of `MotionOps.dwellEpisodes`: one current-run record
 * per vehicle in `transformWithState` where batch re-derives episodes
 * from history; an episode row emits the moment its run breaks. The
 * equivalence claim: over CLOSED runs, the streamed episodes equal the
 * batch operator's — per count, duration total and longest — even with
 * every vehicle's fix series split across three checkpointed
 * micro-batches (the open-run-at-feed-end case is deliberately ALSO
 * pinned: it must NOT emit).
 */
class StreamDwellSpec extends SparkSuite {
  import spark.implicits._

  private def tmp(p: String): String = Files.createTempDirectory(p).toString

  private val schema = "k LONG, t LONG, tie LONG, x LONG, y LONG"

  private def writeBatch(dir: String,
      rows: Seq[(Long, Long, Long, Long, Long)]): Unit =
    rows.toDF("k", "t", "tie", "x", "y").coalesce(1)
      .write.mode("append").json(dir)

  private def runOnce(out: String, ckpt: String, in: String): Unit =
    StatefulOps.dwellStream(
        spark.readStream.schema(schema).json(in), maxStepMm = 100L,
        minFixes = 3)
      .toDF().writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .outputMode("append").trigger(Trigger.Once()).start()
      .awaitTermination()

  // vehicle 1: dwell at (0,0) over t=0..2 (3 fixes), jump, dwell at
  // (5000,0) over t=10..13 (4 fixes), jump at t=20 closing it, then a
  // 2-fix run (below minFixes) closed by a final jump at t=40.
  // vehicle 2: one long dwell t=0..4 closed at t=50, then an OPEN run
  // (2 fixes at the end — must not emit).
  // The three batch boundaries fall INSIDE runs, not between them.
  private val batch1 = Seq(
    (1L, 0L, 0L, 0L, 0L), (1L, 1L, 1L, 10L, 0L),
    (2L, 0L, 0L, 0L, 0L), (2L, 1L, 1L, 0L, 10L))
  private val batch2 = Seq(
    (1L, 2L, 2L, 20L, 0L), (1L, 10L, 3L, 5000L, 0L),
    (1L, 11L, 4L, 5010L, 0L),
    (2L, 2L, 2L, 0L, 20L), (2L, 3L, 3L, 0L, 30L))
  private val batch3 = Seq(
    (1L, 12L, 5L, 5020L, 0L), (1L, 13L, 6L, 5030L, 0L),
    (1L, 20L, 7L, 99999L, 0L), (1L, 30L, 8L, 99990L, 0L),
    (1L, 40L, 9L, 50000L, 0L),
    (2L, 4L, 4L, 0L, 40L), (2L, 50L, 5L, 88888L, 0L),
    (2L, 51L, 6L, 88890L, 0L))
  private val allRows = batch1 ++ batch2 ++ batch3

  test("streamed closed dwell episodes ≡ batch dwellEpisodes across " +
      "micro-batch boundaries; the still-open run never emits") {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val in = tmp("dw_in_"); val out = tmp("dw_out_"); val ck = tmp("dw_ck_")
      Seq(batch1, batch2, batch3).foreach { b =>
        writeBatch(in, b); runOnce(out, ck, in)
      }
      val eps = spark.read.parquet(out).collect()
        .map(r => (r.getAs[Long]("k"), r.getAs[Long]("start_us"),
          r.getAs[Long]("end_us"), r.getAs[Long]("n_fixes"))).toSet
      // closed qualifying runs only: v1's two dwells; v2's first dwell.
      // v2's trailing 2-fix run is open ⇒ absent; v1's 2-fix run at
      // t=20..30 is closed but below minFixes ⇒ absent.
      assert(eps == Set((1L, 0L, 2L, 3L), (1L, 10L, 13L, 4L),
        (2L, 0L, 4L, 5L)))
      // aggregate equivalence against the batch operator (whose input
      // is the same frame; its final open run per key contributes no
      // CLOSED episode here because v2's open run is below minFixes
      // anyway and v1 ends on a closed break)
      val batchAgg = MotionOps.dwellEpisodes(
          allRows.toDF("k", "t_us", "tie", "x_mm", "y_mm"),
          "k", "t_us", "x_mm", "y_mm", "tie", maxStepMm = 100L,
          minFixes = 3)
        .collect().map(r => r.getLong(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
      val streamAgg = eps.groupBy(_._1).map { case (k, es) =>
        k -> (es.size.toLong, es.toSeq.map(e => e._3 - e._2).sum,
          es.map(e => e._3 - e._2).max)
      }
      assert(streamAgg == batchAgg)
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }
}
