package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

import graft.SparkSuite

/**
 * Streaming ingest-time exact dedup (StatefulOps.streamDedupByHash):
 * first-wins across micro-batches through the checkpoint, TTL'd state
 * re-admitting beyond the horizon — the streaming twin of q22.
 */
class StreamDedupSpec extends SparkSuite {
  import spark.implicits._

  private def tmp(p: String): String = Files.createTempDirectory(p).toString

  private val schema = StructType(Seq(
    StructField("content_hash", StringType), StructField("doc_id", LongType)))

  private def writeBatch(in: String, rows: Seq[(String, Long)]): Unit =
    rows.toDF("content_hash", "doc_id")
      .coalesce(1).write.mode("append").json(in)

  private def dedupStream(in: String, ttlMs: Long): DataFrame =
    StatefulOps.streamDedupByHash(
      spark.readStream.schema(schema).json(in),
      "content_hash", "doc_id", ttlMs)
      .toDF("content_hash", "doc_id")

  // Trigger.Once, NOT AvailableNow: with TimeMode.ProcessingTime (which
  // the TTL requires) AvailableNow's MultiBatchExecutor keeps scheduling
  // batches to re-evaluate processing-time state and the run never
  // terminates; Once processes everything available in a single batch
  @annotation.nowarn("cat=deprecation")
  private def runOnce(df: DataFrame, out: String, ckpt: String): Unit =
    df.writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .outputMode("append").trigger(Trigger.Once()).start()
      .awaitTermination()

  private def got(out: String): Set[(String, Long)] =
    spark.read.parquet(out).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet

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

  test("first document per hash wins (min id in batch); later copies " +
      "suppressed across micro-batches via checkpointed state") {
    withRocksDb {
      val in = tmp("sd_in_"); val out = tmp("sd_out_"); val ckpt = tmp("sd_ck_")
      // long TTL: nothing expires within the test
      writeBatch(in, Seq(("A", 5L), ("A", 1L), ("B", 2L)))
      runOnce(dedupStream(in, ttlMs = 3600000L), out, ckpt)
      assert(got(out) === Set(("A", 1L), ("B", 2L)))
      // second batch: duplicate A suppressed by STATE (different file,
      // different run), new C admitted
      writeBatch(in, Seq(("A", 9L), ("C", 3L)))
      runOnce(dedupStream(in, ttlMs = 3600000L), out, ckpt)
      assert(got(out) === Set(("A", 1L), ("B", 2L), ("C", 3L)))
    }
  }

  test("an id of Long.MaxValue is kept and marked seen (no sentinel " +
      "conflation in KeepFirstProcessor)") {
    withRocksDb {
      val in = tmp("sdm_in_"); val out = tmp("sdm_out_"); val ckpt = tmp("sdm_ck_")
      writeBatch(in, Seq(("M", Long.MaxValue)))
      runOnce(dedupStream(in, ttlMs = 3600000L), out, ckpt)
      assert(got(out) === Set(("M", Long.MaxValue)))
      // the marker must exist: a later copy is suppressed, not admitted
      writeBatch(in, Seq(("M", 1L)))
      runOnce(dedupStream(in, ttlMs = 3600000L), out, ckpt)
      assert(got(out) === Set(("M", Long.MaxValue)))
    }
  }

  test("the TTL is the dedup horizon: an expired hash re-admits") {
    withRocksDb {
      val in = tmp("sdt_in_"); val out = tmp("sdt_out_"); val ckpt = tmp("sdt_ck_")
      writeBatch(in, Seq(("X", 1L)))
      runOnce(dedupStream(in, ttlMs = 300L), out, ckpt)
      assert(got(out) === Set(("X", 1L)))
      Thread.sleep(1500) // well past the 300 ms horizon
      writeBatch(in, Seq(("X", 7L)))
      runOnce(dedupStream(in, ttlMs = 300L), out, ckpt)
      assert(got(out) === Set(("X", 1L), ("X", 7L)))
    }
  }
}
