package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.{SparkEntry, SparkSuite}
import graft.queries.{AnalyticsQueries, Tables}

/**
 * Streaming twin of the q265 SPRT — the operator whose native shape IS
 * the stream: `StatefulOps.sprtStream` walks the same Q20-lattice LLR
 * over q265's exact per-cell trial order across three checkpointed
 * restarts, with the chunk boundaries placed so some cells cross
 * mid-chunk-1 (the restart must carry a LATCHED decision) and others
 * are still walking at the boundary (the restart must carry live
 * counters). The final latched call per cell is asserted equal to the
 * batch q265 registry row, and the latch is proven permanent — every
 * post-decision row reports the first crossing, not a re-decision.
 */
class StreamSprtSpec extends SparkSuite {

  private def tmp(p: String): String = Files.createTempDirectory(p).toString

  /** q265's exact trial stream with its per-cell total order made an
    * explicit rank (the stream contract wants one ordering column). */
  private def trials: DataFrame = {
    val w = Window.partitionBy("k").orderBy("ts", "event_id")
    Tables.events(spark, sf())
      .filter(col("value").isNotNull)
      .select(col("event_type").as("k"), col("ts"), col("event_id"),
        (col("value") >=
          when(col("event_type") === "purchase", 34.0).otherwise(82.0))
          .cast("long").as("succ"))
      .withColumn("t", row_number().over(w).cast("long"))
      .select(col("k"), col("t"), col("succ"))
  }

  test("streaming SPRT latches the batch first-crossing decision " +
      "across checkpointed restarts that split cells mid-walk") {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "org.apache.spark.sql.execution.streaming." +
      "state.RocksDBStateStoreProvider")
    try {
      val in = tmp("sprt_in_"); val out = tmp("sprt_out_")
      val ck = tmp("sprt_ck_")
      val frame = trials.localCheckpoint(true)
      // q265 decides between t=31 and t=91 per cell at sf0.001 (and
      // earlier at larger sf): boundary 1 at t=40 splits cells into
      // already-latched vs still-walking; boundary 2 is deep
      // post-decision tail
      def chunk(pred: org.apache.spark.sql.Column): Unit =
        frame.filter(pred).coalesce(1).write.mode("append").json(in)
      def runOnce(): Unit =
        StatefulOps.sprtStream(
            spark.readStream.schema("k STRING, t LONG, succ LONG")
              .json(in),
            AnalyticsQueries.SprtP0, AnalyticsQueries.SprtP1)
          .toDF().writeStream.format("parquet")
          .option("path", out).option("checkpointLocation", ck)
          .outputMode("append").trigger(Trigger.AvailableNow()).start()
          .awaitTermination()
      chunk(col("t") <= 40L); runOnce()
      chunk(col("t") > 40L && col("t") <= 120L); runOnce()
      chunk(col("t") > 120L); runOnce()

      val rows = spark.read.parquet(out).collect()
      val byCell = rows.groupBy(_.getString(0))
      // final latched call per cell == the batch q265 registry row
      val want = SparkEntry.queries("q265_sprt_sequential")(spark, sf())
        .collect().map(r => r.getString(0) ->
          ((r.getString(3), r.getLong(4), r.getLong(5), r.getLong(6))))
        .toMap
      assert(want.values.exists(_._1 == "h1"))
      assert(want.values.exists(_._1 == "h0"))
      for ((cell, cellRows) <- byCell) {
        val last = cellRows.maxBy(_.getLong(1))
        val got = (last.getString(5), last.getLong(6), last.getLong(7),
          last.getLong(8))
        assert(got === want(cell), s"cell $cell")
        // the latch is permanent: every post-decision row reports the
        // SAME first crossing
        val (_, nDec, _, _) = want(cell)
        val post = cellRows.filter(_.getLong(1) >= nDec)
        assert(post.forall(r => r.getString(5) == got._1 &&
          r.getLong(6) == nDec), s"cell $cell re-decided")
        // and pre-crossing rows were honestly undecided
        val pre = cellRows.filter(_.getLong(1) < nDec)
        assert(pre.forall(r => r.getString(5) == "continue" &&
          r.isNullAt(6)), s"cell $cell decided early")
      }
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }
}
