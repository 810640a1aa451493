package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.streaming.Trigger

import graft.SparkSuite

/**
 * Streaming SpaceSaving heavy hitters: m counters per key where exact
 * counts need unbounded state. Two layers of claim:
 *  - the ORDER-INDEPENDENT guarantees (every item with true count >
 *    N/m tracked; count − err ≤ true ≤ count for tracked items);
 *  - the engine's stronger determinism: with the per-batch (t, tie)
 *    sort and checkpointed state, the summary is replay-identical —
 *    pinned by exact counter values across three micro-batches.
 */
class StreamHeavyHittersSpec extends SparkSuite {
  import spark.implicits._

  private def tmp(p: String): String = Files.createTempDirectory(p).toString

  private val schema = "k LONG, t LONG, tie LONG, item STRING"

  private def writeBatch(dir: String,
      rows: Seq[(Long, Long, Long, String)]): Unit =
    rows.toDF("k", "t", "tie", "item").coalesce(1)
      .write.mode("append").json(dir)

  private def runOnce(out: String, ckpt: String, in: String): Unit =
    StatefulOps.heavyHittersStream(
        spark.readStream.schema(schema).json(in), m = 3)
      .toDF().writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .outputMode("append").trigger(Trigger.Once()).start()
      .awaitTermination()

  test("SpaceSaving guarantees hold and the summary is replay-exact " +
      "across micro-batch boundaries; flush emits, counting rows don't") {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      // true counts over 18 rows: a=9, b=5, c=2, d=1, e=1; m=3 ⇒
      // N/m = 6: only a is GUARANTEED, b comfortably survives too.
      val items = Seq("a", "b", "a", "c", "a", "b", "a", "d", "a", "b",
        "a", "c", "a", "b", "e", "a", "b", "a")
      val ts = items.zipWithIndex.map { case (it, i) =>
        (0L, i.toLong, i.toLong, it) }
      val batches = Seq(ts.take(6), ts.slice(6, 12),
        ts.drop(12) :+ ((0L, 99L, 99L, StatefulOps.SsFlushItem)))
      val in = tmp("hh_in_"); val out = tmp("hh_out_"); val ck = tmp("hh_ck_")
      batches.foreach { b => writeBatch(in, b); runOnce(out, ck, in) }
      val got = spark.read.parquet(out).collect()
        .map(r => r.getAs[String]("item") ->
          (r.getAs[Long]("count"), r.getAs[Long]("err"))).toMap
      // only the flush emitted: exactly m = 3 tracked items
      assert(got.size == 3)
      val truth = Map("a" -> 9L, "b" -> 5L, "c" -> 2L, "d" -> 1L,
        "e" -> 1L)
      // guarantee: every item with true > N/m is tracked
      assert(got.contains("a"))
      // guarantee: count - err <= true <= count for all tracked items
      got.foreach { case (i, (c, e)) =>
        assert(c >= truth(i), s"$i overcount bound")
        assert(c - e <= truth(i), s"$i undercount bound")
      }
      // determinism: replay the exact same walk by hand
      var entries = Map.empty[String, (Long, Long)]
      items.foreach { it =>
        entries.get(it) match {
          case Some((c, e)) => entries += it -> (c + 1, e)
          case None if entries.size < 3 => entries += it -> (1L, 0L)
          case None =>
            val (evict, (minC, _)) =
              entries.toSeq.minBy { case (i2, (c, _)) => (c, i2) }
            entries = entries - evict + (it -> (minC + 1, minC))
        }
      }
      assert(got == entries)
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }
}
