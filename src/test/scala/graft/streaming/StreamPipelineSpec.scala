package graft.streaming

import java.nio.file.Files
import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

import graft.SparkSuite

/**
 * Integration spec for the streaming slice (SURVEY §7.1 step 5): a fixture
 * directory is streamed through source → envelope → dead-letter split →
 * flatten → sink with checkpointing, exercising O1/O5/O10-O14 parity:
 * exact landed rows, metrics emission, replay-on-failure, and the
 * 10-consecutive-failures teardown.
 */
class StreamPipelineSpec extends SparkSuite {
  import spark.implicits._

  private val goodTopic =
    "/hfp/v2/journey/ongoing/vp/bus/0022/00854/2550/2/Itakeskus(M)/08:29/1362148/4/60;24/28/65/06"
  private def goodPayload(veh: Int, tsi: Long): String =
    s"""{"VP":{"desi":"550","dir":"2","oper":22,"veh":$veh,"tst":"2024-06-05T08:00:01.412Z","tsi":$tsi,"spd":8.49,"drst":0,"oday":"2024-06-05","start":"08:29"}}"""

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  /** n good wire records + optionally one malformed-payload poison row,
    * written as JSON-lines files into a fresh input dir. */
  private def writeInput(n: Int, poison: Boolean, files: Int = 2): String = {
    val dir = tmp("hfp_in_")
    val good = (1 to n).map(i => (goodTopic, goodPayload(800 + i, 1717574400L + i), 1717574401500L + i))
    val all = if (poison) good :+ ((goodTopic, "not json {", 9999999999999L)) else good
    all.toDF("topic", "payload", "received_at")
      .repartition(files).write.mode("overwrite").json(dir)
    dir
  }

  private def countRows(path: String): Long =
    try spark.read.parquet(path).count() catch { case _: Throwable => 0L }

  test("happy path: fixture dir streams to parquet; dead-letter split; metrics emitted") {
    val in = writeInput(n = 20, poison = true)
    val out = tmp("hfp_out_")
    val dead = tmp("hfp_dead_")
    val cfg = HfpStreamPipeline.Config(
      inputDir = in, checkpointDir = tmp("hfp_ckpt_"),
      availableNow = true, deadLetterDir = Some(dead))
    val listener = new MetricsListener
    spark.streams.addListener(listener)
    try {
      val q = HfpStreamPipeline.start(spark, cfg, new ParquetBatchSink(out))
      q.awaitTermination()
      val landed = spark.read.parquet(out)
      assert(landed.count() === 20)
      assert(landed.columns.length === 40)        // full vehicles relation
      assert(landed.columns.take(3) === Array("received_at", "topic_prefix", "topic_version"))
      assert(countRows(dead) === 1)               // poison row dead-lettered, not lost
      // listener events deliver asynchronously; poll briefly
      val deadline = System.currentTimeMillis() + 15000
      while (listener.totalInputRows < 21 && System.currentTimeMillis() < deadline)
        Thread.sleep(100)
      assert(listener.totalInputRows === 21)      // 20 good + 1 poison entered the query
      assert(listener.batches.forall(_.batchDurationMs >= 0))
    } finally spark.streams.removeListener(listener)
  }

  test("at-rest layout: hour+vehicle partitioned landing prunes on the scan (init.sql:70-73)") {
    val in = tmp("hfp_in_")
    // two observation hours, two vehicles
    val rows = for {
      (veh, topicVeh) <- Seq((854, "00854"), (855, "00855"))
      hour <- Seq(0, 1)
      i <- 1 to 5
    } yield {
      val topic = s"/hfp/v2/journey/ongoing/vp/bus/0022/$topicVeh/2550/2/A/08:29/1/4/60;24/28/65/06"
      (topic, goodPayload(veh, 1717574400L + hour * 3600 + i),
        1717574400000L + hour * 3600000L + i * 1000L)
    }
    rows.toDF("topic", "payload", "received_at")
      .repartition(2).write.mode("overwrite").json(in)
    val out = tmp("hfp_out_")
    val cfg = HfpStreamPipeline.Config(
      inputDir = in, checkpointDir = tmp("hfp_ckpt_"), availableNow = true)
    val q = HfpStreamPipeline.start(spark, cfg, new PartitionedVehiclesSink(out))
    q.awaitTermination()

    // physical layout: received_hour=yyyy-MM-dd-HH/vehicle_bucket=N dirs
    val hourDirs = new java.io.File(out).listFiles()
      .filter(_.getName.startsWith(s"${AtRestLayout.HourColumn}=")).map(_.getName).sorted
    assert(hourDirs.toSeq === Seq(
      s"${AtRestLayout.HourColumn}=2024-06-05-08", s"${AtRestLayout.HourColumn}=2024-06-05-09"))

    val landed = spark.read.parquet(out)
    assert(landed.count() === 20)
    // an hour predicate must reach the scan as a PartitionFilter (the
    // chunk-exclusion twin) and read only that hour's rows
    val oneHour = landed.filter(col(AtRestLayout.HourColumn) === "2024-06-05-08")
    val scanPlan = oneHour.queryExecution.executedPlan.toString
    assert(scanPlan.contains("PartitionFilters") &&
      scanPlan.contains(AtRestLayout.HourColumn), scanPlan)
    assert(oneHour.count() === 10)
    // pruning is visible in the partitions the scan actually selects
    import org.apache.spark.sql.execution.FileSourceScanExec
    def selectedParts(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.executedPlan
        .collect { case f: FileSourceScanExec => f }
        .map(_.selectedPartitions.partitionCount).sum
    val pruned = selectedParts(oneHour)
    val all = selectedParts(landed)
    assert(pruned > 0 && pruned < all, s"pruned=$pruned all=$all")
    assert(landed.inputFiles.forall(_.contains(s"${AtRestLayout.BucketColumn}=")))

    // the hour column is session-timezone invariant (UTC rendering)
    val tz = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "Europe/Helsinki")
      val hours = AtRestLayout.addColumns(spark.read.parquet(out)
          .drop(AtRestLayout.HourColumn, AtRestLayout.BucketColumn))
        .select(AtRestLayout.HourColumn).distinct()
        .collect().map(_.getString(0)).sorted
      assert(hours.toSeq === Seq("2024-06-05-08", "2024-06-05-09"))
    } finally spark.conf.set("spark.sql.session.timeZone", tz)
  }

  test("protobuf wire path streams to the same landed rows as the JSON path (MessageProcessor.java:119)") {
    import graft.sources.{HfpProtobuf, HfpRawIngest, SourceFactory}
    // the SAME wire records through both paths: text JSON-lines, and
    // protobuf Hfp.Data bytes encoded from the identical envelopes
    val jsonIn = writeInput(n = 12, poison = false)
    val outJson = tmp("hfp_out_json_")
    HfpStreamPipeline.start(spark,
      HfpStreamPipeline.Config(inputDir = jsonIn,
        checkpointDir = tmp("hfp_ckpt_"), availableNow = true),
      new ParquetBatchSink(outJson)).awaitTermination()

    val binIn = tmp("hfp_bin_in_")
    val env = HfpRawIngest.toEnvelope(
      spark.read.schema(HfpStreamPipeline.wireSchema).json(jsonIn))
    HfpProtobuf.asEnvelopes(env).map(HfpProtobuf.encode).toDF("value")
      .repartition(2).write.mode("overwrite").parquet(binIn)
    // plus one undecodable record: warn-and-skip, never a poison batch
    Seq(Array[Byte](0x7f, 0x00, 0x12, 0x34)).toDF("value")
      .write.mode("append").parquet(binIn)

    val outPb = tmp("hfp_out_pb_")
    HfpStreamPipeline.start(spark,
      HfpStreamPipeline.Config(checkpointDir = tmp("hfp_ckpt_"), availableNow = true,
        source = Some(SourceFactory.SourceSpec.FileBinary(binIn))),
      new ParquetBatchSink(outPb)).awaitTermination()

    val a = spark.read.parquet(outJson).orderBy("veh").collect()
    val b = spark.read.parquet(outPb).orderBy("veh").collect()
    assert(a.length === 12)
    assert(b.toSeq === a.toSeq) // byte-identical 40-column rows, both wires
  }

  /** Sink failing `failures` times before ever writing, then healthy. */
  private final class FlakySink(inner: BatchSink, failures: Int) extends BatchSink {
    val attempts = new AtomicInteger(0)
    override def write(batch: DataFrame, batchId: Long): Unit = {
      if (attempts.incrementAndGet() <= failures)
        throw new RuntimeException(s"transient sink failure ${attempts.get()}")
      inner.write(batch, batchId)
    }
  }

  test("replay-on-failure: failed batch is redelivered from checkpoint, lands exactly the input") {
    val in = writeInput(n = 10, poison = false, files = 1)
    val out = tmp("hfp_out_")
    val ckpt = tmp("hfp_ckpt_")
    val cfg = HfpStreamPipeline.Config(inputDir = in, checkpointDir = ckpt, availableNow = true)
    val flaky = new FlakySink(new ParquetBatchSink(out), failures = 2)
    val sink = new FailFastSink(flaky, maxConsecutiveFailures = 10)
    val starts = StreamSupervisor.runToCompletion(
      () => HfpStreamPipeline.start(spark, cfg, sink))
    assert(starts === 3)                          // 2 failed runs + 1 clean
    assert(flaky.attempts.get() >= 3)
    // failure happened before the write → replay produces no duplicates
    assert(countRows(out) === 10)
  }

  test("fail-fast: consecutive-failure budget tears the pipeline down (QueueWriter.java:159-161)") {
    val in = writeInput(n = 5, poison = false, files = 1)
    val cfg = HfpStreamPipeline.Config(
      inputDir = in, checkpointDir = tmp("hfp_ckpt_"), availableNow = true)
    val alwaysFailing = new BatchSink {
      override def write(batch: DataFrame, batchId: Long): Unit =
        throw new RuntimeException("sink target down")
    }
    val sink = new FailFastSink(alwaysFailing, maxConsecutiveFailures = 3)
    val e = intercept[Throwable] {
      StreamSupervisor.runToCompletion(() => HfpStreamPipeline.start(spark, cfg, sink))
    }
    assert(StreamSupervisor.isExhausted(e), s"expected FailFastExhausted in chain, got $e")
  }
}
