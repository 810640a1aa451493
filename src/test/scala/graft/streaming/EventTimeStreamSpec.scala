package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, unix_seconds}
import org.apache.spark.sql.streaming.Trigger

import graft.operators.HfpFlatten
import graft.sources.HfpRawIngest

import graft.SparkSuite

/**
 * Event-time streaming semantics: watermark advancement, append-mode
 * window emission, late-data dropping, and key-dedup within the
 * watermark. Each scenario drives the real wire→envelope→flatten stream
 * through SEVERAL AvailableNow runs sharing one checkpoint: the watermark
 * persists in the checkpoint between runs, so emission/ eviction points
 * are fully deterministic (no sleeps, no trigger races).
 */
class EventTimeStreamSpec extends SparkSuite {
  import spark.implicits._

  private def tmp(prefix: String): String = Files.createTempDirectory(prefix).toString

  private val topic =
    "/hfp/v2/journey/ongoing/vp/bus/0022/00854/2550/2/X/08:00/1/4/60;24/28/65/06"

  /** One wire record with the given event time (tst) and vehicle. */
  private def rec(tst: String, veh: Int = 854, spd: Double = 10.0): (String, String, Long) =
    (topic.replace("/00854/", f"/$veh%05d/"),
      s"""{"VP":{"dir":"2","oper":22,"veh":$veh,"tst":"$tst","tsi":1,"spd":$spd,"route":"2550"}}""",
      1717574400000L)

  /** Write one file of wire records into the streaming input dir. */
  private def writeFile(dir: String, n: Int, recs: Seq[(String, String, Long)]): Unit =
    recs.toDF("topic", "payload", "received_at")
      .coalesce(1).write.mode("append").json(dir)

  private def vehiclesStream(in: String): DataFrame =
    HfpFlatten.flatten(
      HfpRawIngest.toEnvelope(
        spark.readStream.schema(HfpStreamPipeline.wireSchema).json(in)),
      strictTst = false)

  /** One AvailableNow run of `df` into a parquet sink, shared checkpoint. */
  private def runOnce(df: DataFrame, out: String, ckpt: String): Unit =
    df.writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
      .awaitTermination()

  private def outRows(out: String): Array[org.apache.spark.sql.Row] =
    try spark.read.parquet(out).collect() catch { case _: Throwable => Array.empty }

  test("tumbling window: emits only when watermark passes window end; late rows dropped") {
    val in = tmp("et_in_"); val out = tmp("et_out_"); val ckpt = tmp("et_ck_")
    def agg = EventTimeOps.tumblingRouteCounts(vehiclesStream(in),
      watermarkDelay = "2 minutes", windowDuration = "1 minute")

    // run 1: three events in windows [08:00) and [08:01) → watermark ends
    // at 08:01:10-2m = 07:59:10 → nothing emitted yet
    writeFile(in, 1, Seq(
      rec("2024-06-05T08:00:10Z"), rec("2024-06-05T08:00:20Z"), rec("2024-06-05T08:01:10Z")))
    runOnce(agg, out, ckpt)
    assert(outRows(out).isEmpty)

    // run 2: event at 08:05 advances the watermark to 08:03; AvailableNow
    // then runs one more (empty) batch against the new watermark, which
    // closes and emits [08:00) and [08:01) within the same run
    writeFile(in, 2, Seq(rec("2024-06-05T08:05:00Z")))
    runOnce(agg, out, ckpt)
    val w0800 = 1717574400000000L // 2024-06-05T08:00:00Z in epoch micros
    def emitted = outRows(out).map(r => (r.getAs[Long]("window_start_us"),
      r.getAs[Long]("n_events"))).sorted.toSeq
    assert(emitted === Seq((w0800, 2L), (w0800 + 60000000L, 1L)))

    // run 3: fresh event at 08:10 (watermark → 08:08, closing [08:05))
    // AND a too-late event at 08:00:30 — behind the 08:03 watermark, so it
    // is dropped and the already-emitted [08:00) count stays 2
    writeFile(in, 3, Seq(rec("2024-06-05T08:10:00Z"), rec("2024-06-05T08:00:30Z")))
    runOnce(agg, out, ckpt)
    assert(emitted === Seq((w0800, 2L), (w0800 + 60000000L, 1L), (w0800 + 300000000L, 1L)))
  }

  test("sliding window: each event counts in two overlapping windows; append on watermark") {
    val in = tmp("sl_in_"); val out = tmp("sl_out_"); val ckpt = tmp("sl_ck_")
    def agg = EventTimeOps.slidingRouteCounts(vehiclesStream(in),
      watermarkDelay = "2 minutes", windowDuration = "2 minutes",
      slideDuration = "1 minute")

    // run 1: two events inside 08:00 — they belong to BOTH [07:59, 08:01)
    // and [08:00, 08:02); watermark 07:58:20 → nothing emitted yet
    writeFile(in, 1, Seq(
      rec("2024-06-05T08:00:10Z"), rec("2024-06-05T08:00:20Z")))
    runOnce(agg, out, ckpt)
    assert(outRows(out).isEmpty)

    // run 2: 08:05 advances the watermark to 08:03, closing both
    // overlapping windows — the same two events appear in each
    writeFile(in, 2, Seq(rec("2024-06-05T08:05:00Z")))
    runOnce(agg, out, ckpt)
    val w0800 = 1717574400000000L
    val emitted = outRows(out).map(r => (r.getAs[Long]("window_start_us"),
      r.getAs[Long]("n_events"))).sorted.toSeq
    assert(emitted === Seq((w0800 - 60000000L, 2L), (w0800, 2L)))
  }

  test("dropDuplicatesWithinWatermark: duplicate key suppressed within the horizon") {
    val in = tmp("dd_in_"); val out = tmp("dd_out_"); val ckpt = tmp("dd_ck_")
    def dedup = EventTimeOps.dedupWithinWatermark(vehiclesStream(in), "10 minutes")
      .select("unique_vehicle_id", "tst", "event_type")

    // run 1: the same (vehicle, tst, event_type) twice in one batch plus a
    // distinct second vehicle → 2 rows out
    writeFile(in, 1, Seq(
      rec("2024-06-05T08:00:00Z"), rec("2024-06-05T08:00:00Z"), rec("2024-06-05T08:00:05Z", veh = 900)))
    runOnce(dedup, out, ckpt)
    assert(outRows(out).length === 2)

    // run 2: the same key AGAIN in a later batch, still within the 10 min
    // horizon → suppressed by checkpointed state; one genuinely new key
    writeFile(in, 2, Seq(
      rec("2024-06-05T08:00:00Z"), rec("2024-06-05T08:02:00Z", veh = 901)))
    runOnce(dedup, out, ckpt)
    assert(outRows(out).length === 3)
  }

  test("streaming OHLC: append emission on watermark close; emitted " +
      "buckets are bit-equal to the batch resampleOhlc twin") {
    val in = tmp("oh_in_"); val out = tmp("oh_out_"); val ckpt = tmp("oh_ck_")
    def agg = EventTimeOps.vehicleOhlc(vehiclesStream(in),
      watermarkDelay = "2 minutes", windowDuration = "1 minute")

    // run 1: two vehicles, multiple speeds inside [08:00) (+ one in
    // [08:01)) — nothing emitted until the watermark passes the windows
    writeFile(in, 1, Seq(
      rec("2024-06-05T08:00:05Z", veh = 854, spd = 12.5),
      rec("2024-06-05T08:00:20Z", veh = 854, spd = 7.25),
      rec("2024-06-05T08:00:40Z", veh = 854, spd = 9.0),
      rec("2024-06-05T08:00:10Z", veh = 900, spd = 3.0),
      rec("2024-06-05T08:01:30Z", veh = 900, spd = 4.5)))
    runOnce(agg, out, ckpt)
    assert(outRows(out).isEmpty)

    // run 2: 08:05 advances the watermark to 08:03 → both buckets close
    writeFile(in, 2, Seq(rec("2024-06-05T08:05:00Z", veh = 854, spd = 1.0)))
    runOnce(agg, out, ckpt)
    val streamed = outRows(out).map(r => (
      r.getAs[Long]("bucket_t"), r.getAs[String]("unique_vehicle_id"),
      r.getAs[Long]("n"), r.getAs[Long]("open"), r.getAs[Long]("high"),
      r.getAs[Long]("low"), r.getAs[Long]("close"), r.getAs[Long]("total")))
      .sorted.toSeq
    // vehicle 854 [08:00): open 1250 (08:00:05), high 1250, low 725,
    // close 900 (08:00:40) — open ≠ low and close ≠ high, so the
    // composite-order argmin/argmax is actually exercised
    assert(streamed.map(r => (r._2.split('/')(1), r._3, r._4, r._7)).toSet ==
      Set(("854", 3L, 1250L, 900L), ("900", 1L, 300L, 300L),
        ("900", 1L, 450L, 450L)))

    // the emitted rows equal the BATCH twin over the same (closed) rows
    val batch = graft.operators.TemporalOps.resampleOhlc(
      HfpFlatten.flatten(
        HfpRawIngest.toEnvelope(
          spark.read.schema(HfpStreamPipeline.wireSchema).json(in)),
        strictTst = false)
        .select(col("unique_vehicle_id"),
          org.apache.spark.sql.functions.unix_micros(col("tst")).as("t_us"),
          col("tsi"),
          (col("spd").cast("decimal(18,4)") * 100).cast("long").as("spd_c")),
      "unique_vehicle_id", "t_us", "tsi", "spd_c", 60000000L)
      .filter(col("bucket_t") < 1717574520000000L) // only closed buckets
      .collect().map(r => (
        r.getAs[Long]("bucket_t"), r.getAs[String]("unique_vehicle_id"),
        r.getAs[Long]("n"), r.getAs[Long]("open"), r.getAs[Long]("high"),
        r.getAs[Long]("low"), r.getAs[Long]("close"), r.getAs[Long]("total")))
      .sorted.toSeq
    assert(streamed == batch,
      s"stream/batch divergence:\nstream=$streamed\nbatch=$batch")
  }

  test("flatMapGroupsWithState trips: state survives micro-batches; equals the batch twin") {
    val in = tmp("tr_in_"); val out = tmp("tr_out_"); val ckpt = tmp("tr_ck_")
    // the fixture's tsi field is constant; trip-time is the tst event time
    def withEventSec(df: DataFrame) =
      df.withColumn("tsi", unix_seconds(col("tst")))
    def trips = StatefulOps.assignTrips(withEventSec(vehiclesStream(in)), gapSec = 600).toDF()

    // batch 1: two events 08:00/08:05 (one trip, gap < 10 min)
    writeFile(in, 1, Seq(rec("2024-06-05T08:00:00Z"), rec("2024-06-05T08:05:00Z")))
    runOnce(trips, out, ckpt)
    // batch 2: 08:10 continues trip 0 ACROSS the batch boundary;
    // 09:00 opens trip 1 (gap 50 min); second vehicle starts its own trip 0
    writeFile(in, 2, Seq(rec("2024-06-05T08:10:00Z"),
      rec("2024-06-05T09:00:00Z"), rec("2024-06-05T09:00:00Z", veh = 950)))
    runOnce(trips, out, ckpt)

    val got = outRows(out)
      .map(r => (r.getAs[String]("unique_vehicle_id"), r.getAs[Long]("tsi"),
        r.getAs[Long]("trip_id"))).toSet
    // cross-batch continuity: 08:10 is still trip 0; 09:00 is trip 1
    assert(got.count(_._1 == "22/854") === 4)
    assert(got.filter(_._1 == "22/854").map(_._3) === Set(0L, 1L))
    assert(got.filter(t => t._1 == "22/854" && t._3 == 1L).size === 1)
    assert(got.filter(_._1 == "22/950").map(_._3) === Set(0L))

    // equals the batch twin over the full input
    val batch = StatefulOps.assignTripsBatch(
      withEventSec(HfpFlatten.flatten(HfpRawIngest.toEnvelope(
        spark.read.schema(HfpStreamPipeline.wireSchema).json(in)), strictTst = false)),
      gapSec = 600)
      .collect().map(r => (r.getAs[String]("unique_vehicle_id"),
        r.getAs[Long]("tsi"), r.getAs[Long]("trip_id"))).toSet
    assert(got === batch)
  }

  test("transformWithState trips: the Spark 4 stateful API matches fMGWS and the batch twin") {
    val in = tmp("tw_in_"); val out = tmp("tw_out_"); val ckpt = tmp("tw_ck_")
    // transformWithState needs the RocksDB provider (multi-column-family
    // state layout); scoped to this test, restored after
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      def withEventSec(df: DataFrame) =
        df.withColumn("tsi", unix_seconds(col("tst")))
      def trips = StatefulOps.assignTripsTws(
        withEventSec(vehiclesStream(in)), gapSec = 600).toDF()

      // same fixture as the fMGWS test: trip 0 spans the batch boundary,
      // the 50-min gap opens trip 1, a second vehicle starts its own 0
      writeFile(in, 1, Seq(rec("2024-06-05T08:00:00Z"), rec("2024-06-05T08:05:00Z")))
      runOnce(trips, out, ckpt)
      writeFile(in, 2, Seq(rec("2024-06-05T08:10:00Z"),
        rec("2024-06-05T09:00:00Z"), rec("2024-06-05T09:00:00Z", veh = 950)))
      runOnce(trips, out, ckpt)

      val got = outRows(out)
        .map(r => (r.getAs[String]("unique_vehicle_id"), r.getAs[Long]("tsi"),
          r.getAs[Long]("trip_id"))).toSet
      assert(got.count(_._1 == "22/854") === 4)
      assert(got.filter(_._1 == "22/854").map(_._3) === Set(0L, 1L))
      assert(got.filter(_._1 == "22/950").map(_._3) === Set(0L))

      val full = withEventSec(HfpFlatten.flatten(HfpRawIngest.toEnvelope(
        spark.read.schema(HfpStreamPipeline.wireSchema).json(in)), strictTst = false))
      // equals the OTHER stateful API run over the same stream history…
      val viaFmgws = StatefulOps.assignTrips(full, gapSec = 600)
        .collect().map(t => (t.unique_vehicle_id, t.tsi, t.trip_id)).toSet
      assert(got === viaFmgws)
      // …and the declarative batch twin
      val batch = StatefulOps.assignTripsBatch(full, gapSec = 600)
        .collect().map(r => (r.getAs[String]("unique_vehicle_id"),
          r.getAs[Long]("tsi"), r.getAs[Long]("trip_id"))).toSet
      assert(got === batch)
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("session window: closes only when the watermark passes end+gap, merges within gap") {
    val in = tmp("sw_in_"); val out = tmp("sw_out_"); val ckpt = tmp("sw_ck_")
    def sessions = EventTimeOps.vehicleSessions(vehiclesStream(in),
      watermarkDelay = "1 minute", gap = "2 minutes")

    // one vehicle: events at 08:00:00 and 08:01:00 (same session, gap<2m);
    // second vehicle far later advances the watermark in the next run
    writeFile(in, 1, Seq(rec("2024-06-05T08:00:00Z"), rec("2024-06-05T08:01:00Z")))
    runOnce(sessions, out, ckpt)
    assert(outRows(out).isEmpty)

    // run 2: 08:30 event advances the watermark to 08:29 > 08:01+2m gap →
    // the merged two-event session emits within this run
    writeFile(in, 2, Seq(rec("2024-06-05T08:30:00Z", veh = 950)))
    runOnce(sessions, out, ckpt)
    val rows2 = outRows(out)
    assert(rows2.length === 1)
    assert(rows2.head.getAs[Long]("n_events") === 2L)
    assert(rows2.head.getAs[Long]("session_end_us")
      - rows2.head.getAs[Long]("session_start_us") === 180000000L) // 1 min span + 2 min gap

    // run 3: 08:40 closes vehicle 950's singleton; 951's own session stays
    // open (watermark 08:39 < its end+gap)
    writeFile(in, 3, Seq(rec("2024-06-05T08:40:00Z", veh = 951)))
    runOnce(sessions, out, ckpt)
    val byVeh = outRows(out).map(r =>
      r.getAs[String]("unique_vehicle_id") -> r.getAs[Long]("n_events")).toMap
    assert(byVeh === Map("22/854" -> 2L, "22/950" -> 1L))
  }
}
