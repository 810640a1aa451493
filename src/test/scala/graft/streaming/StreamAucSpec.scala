package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSuite

/**
 * Streaming exact AUC (q209's stream twin): score-lattice counts per
 * cell survive micro-batch boundaries through the checkpoint, and a
 * flush replays the batch midrank identity — so the stream's answer on
 * a prefix must equal StatsOps.aucRoc run in batch over the same rows,
 * bit for bit. The spec pins that equivalence across three
 * checkpointed micro-batches plus the one-class None case.
 */
class StreamAucSpec extends SparkSuite {
  import spark.implicits._

  private def tmp(p: String): String = Files.createTempDirectory(p).toString

  private val schema = "cell STRING, t LONG, tie LONG, s LONG, y LONG"

  private def writeBatch(dir: String,
      rows: Seq[(String, Long, Long, Long, Long)]): Unit =
    rows.toDF("cell", "t", "tie", "s", "y").coalesce(1)
      .write.mode("append").json(dir)

  private def runOnce(out: String, ckpt: String, in: String): Unit =
    StatefulOps.aucStream(spark.readStream.schema(schema).json(in))
      .toDF().writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .outputMode("append").trigger(Trigger.Once()).start()
      .awaitTermination()

  test("stream AUC equals batch aucRoc on the same prefix across " +
      "micro-batch boundaries; a one-class cell flushes None") {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val F = StatefulOps.AucFlushScore
      val rnd = new scala.util.Random(42)
      // two cells; "m" gets a real mixed feed, "solo" only positives
      def mk(n: Int, t0: Long) = (1 to n).map { i =>
        ("m", t0 + i, i.toLong, rnd.nextInt(12).toLong,
          if (rnd.nextBoolean()) 1L else 0L)
      }
      val b1 = mk(40, 0) :+ (("solo", 900L, 0L, 5L, 1L))
      val b2 = mk(40, 100)
      val b3 = Seq(("m", 999L, 0L, F, 0L), ("solo", 999L, 0L, F, 0L))
      val in = tmp("a_in_"); val out = tmp("a_out_"); val ck = tmp("a_ck_")
      Seq(b1, b2, b3).foreach { b => writeBatch(in, b); runOnce(out, ck, in) }
      val got = spark.read.parquet(out).collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
          Option(r.get(3)).map(_.asInstanceOf[Long])))).toMap
      // batch reference over exactly the flushed prefix
      val batchRows = (b1 ++ b2).filter(_._1 == "m")
        .map(r => ("m", r._4, r._5)).toDF("cell", "s", "y")
      val want = graft.operators.StatsOps.aucRoc(batchRows, "cell", "s", "y")
        .collect().map(r => r.getString(0) -> ((r.getLong(1),
          r.getLong(2), Option(r.get(3)).map(_.asInstanceOf[Long]))))
        .toMap
      assert(got("m") === want("m"))
      assert(got("m")._3.isDefined)
      assert(got("solo") === ((1L, 0L, None)))
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("a mid-batch sentinel emits the AUC of ONLY the rows ordered " +
      "before it; later rows in the same micro-batch still reach state") {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val F = StatefulOps.AucFlushScore
      val rnd = new scala.util.Random(7)
      val pre = (1 to 25).map(i => ("c", i.toLong, 0L,
        rnd.nextInt(9).toLong, if (rnd.nextBoolean()) 1L else 0L))
      val post = (26 to 50).map(i => ("c", i.toLong, 0L,
        rnd.nextInt(9).toLong, if (rnd.nextBoolean()) 1L else 0L))
      // ONE micro-batch: prefix rows, sentinel, then more count rows
      val b1 = pre ++ Seq(("c", 25L, 99L, F, 0L)) ++ post
      val b2 = Seq(("c", 999L, 0L, F, 0L))
      val in = tmp("am_in_"); val out = tmp("am_out_")
      val ck = tmp("am_ck_")
      Seq(b1, b2).foreach { b => writeBatch(in, b); runOnce(out, ck, in) }
      def batchAuc(rows: Seq[(String, Long, Long, Long, Long)]) =
        graft.operators.StatsOps.aucRoc(
          rows.map(r => (r._1, r._4, r._5)).toDF("cell", "s", "y"),
          "cell", "s", "y").collect()
          .map(r => (r.getLong(1), r.getLong(2),
            Option(r.get(3)).map(_.asInstanceOf[Long]))).head
      val got = spark.read.parquet(out)
        .orderBy("n_pos", "n_neg").collect()
        .map(r => (r.getLong(1), r.getLong(2),
          Option(r.get(3)).map(_.asInstanceOf[Long])))
      assert(got.length === 2)
      // the mid-batch sentinel saw exactly the pre-sentinel prefix …
      assert(got.head === batchAuc(pre))
      // … and the dedicated flush proves the post-sentinel rows landed
      assert(got.last === batchAuc(pre ++ post))
      assert(batchAuc(pre) !== batchAuc(pre ++ post))
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }
}
