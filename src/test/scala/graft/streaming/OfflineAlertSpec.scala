package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, unix_millis}
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

import graft.SparkSuite

/**
 * Event-time timer semantics (StatefulOps.OfflineDetector): a vehicle
 * that stops reporting for the gap is flagged when the WATERMARK passes
 * its deadline — absence detection, which no per-row operator can
 * express. Driven through checkpointed AvailableNow runs: watermark
 * state persists, the post-data no-data batch fires due timers, and no
 * wall clock is involved anywhere (re-armed keys never fire stale
 * timers).
 */
class OfflineAlertSpec extends SparkSuite {
  import spark.implicits._

  private def tmp(p: String): String = Files.createTempDirectory(p).toString
  private val schema = StructType(Seq(
    StructField("unique_vehicle_id", StringType), StructField("ts", TimestampType)))
  private val T0 = Timestamp.valueOf("2024-06-05 08:00:00").getTime

  private def writeBatch(in: String, rows: Seq[(String, Long)]): Unit =
    rows.map { case (v, ms) => (v, new Timestamp(ms)) }
      .toDF("unique_vehicle_id", "ts")
      .coalesce(1).write.mode("append").json(in)

  private def alerts(in: String): DataFrame =
    StatefulOps.offlineAlerts(
      spark.readStream.schema(schema).json(in)
        .withWatermark("ts", "0 seconds")
        .withColumn("ts_ms", unix_millis(col("ts"))),
      "ts_ms", gapMs = 60000L).toDF()

  private def runOnce(df: DataFrame, out: String, ckpt: String): Unit =
    df.writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
      .awaitTermination()

  private def got(out: String): Set[(String, Long)] =
    try spark.read.parquet(out).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    catch { case _: Throwable => Set.empty }

  test("a silent vehicle alerts when the watermark passes its deadline; " +
      "an active one re-arms and never fires a stale timer") {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val in = tmp("oa_in_"); val out = tmp("oa_out_"); val ckpt = tmp("oa_ck_")
      // A reports twice, B once; 60 s gap: nothing is due yet
      writeBatch(in, Seq(("A", T0), ("A", T0 + 10000), ("B", T0)))
      runOnce(alerts(in), out, ckpt)
      assert(got(out) === Set.empty)
      // A reports at +120 s → watermark reaches T0+120 s: B's T0+60 s
      // deadline fires (B offline since T0); A re-armed to +180 s — its
      // old +70 s timer was deleted, no stale fire
      writeBatch(in, Seq(("A", T0 + 120000)))
      runOnce(alerts(in), out, ckpt)
      assert(got(out) === Set(("B", T0)))
      // an unrelated vehicle pushes the watermark past A's deadline:
      // A fires exactly once, with its LAST position; B does not repeat
      writeBatch(in, Seq(("C", T0 + 300000)))
      runOnce(alerts(in), out, ckpt)
      assert(got(out) === Set(("B", T0), ("A", T0 + 120000)))
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }
}
