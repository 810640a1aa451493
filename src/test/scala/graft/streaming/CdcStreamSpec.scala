package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

import graft.SparkSuite

/**
 * Streaming change-data-capture (StatefulOps.changeStream): upsert
 * stream → changelog across micro-batch boundaries, the stream twin of
 * MergeOps.snapshotDiff. The load-bearing assertion is the
 * materialization invariant: replaying the emitted changelog (by seq,
 * per key) reconstructs exactly the last-value-per-key state of the
 * raw input.
 */
class CdcStreamSpec extends SparkSuite {
  import spark.implicits._

  private def tmp(p: String): String = Files.createTempDirectory(p).toString

  private val schema = StructType(Seq(
    StructField("k", LongType), StructField("seq", LongType),
    StructField("v", StringType)))

  private def writeBatch(in: String, rows: Seq[(Long, Long, String)]): Unit =
    rows.toDF("k", "seq", "v").coalesce(1).write.mode("append").json(in)

  private def cdc(in: String): DataFrame =
    StatefulOps.changeStream(
      spark.readStream.schema(schema).json(in), "k", "seq", "v").toDF()

  @annotation.nowarn("cat=deprecation")
  private def runOnce(df: DataFrame, out: String, ckpt: String): Unit =
    df.writeStream.format("parquet")
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

  /** Changelog rows ordered by seq (the replay order). */
  private def changes(out: String): Seq[(Long, Long, String, String, String)] =
    spark.read.parquet(out).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getString(3), r.getString(4)))
      .sortBy(_._2).toSeq

  test("added / changed / removed across micro-batches; no-op upserts " +
      "emit nothing") { withRocksDb {
    val in = tmp("cdc_in_"); val out = tmp("cdc_out_"); val ckpt = tmp("cdc_ck_")

    // batch 1: two inserts, one in-batch transition a→b (seq order)
    writeBatch(in, Seq((1L, 1L, "a"), (1L, 2L, "b"), (2L, 3L, "x")))
    runOnce(cdc(in), out, ckpt)
    assert(changes(out) == Seq(
      (1L, 1L, "added", null, "a"), (1L, 2L, "changed", "a", "b"),
      (2L, 3L, "added", null, "x")))

    // batch 2: no-op upsert for key 2 (state survives the checkpoint —
    // emits nothing), delete of key 1, fresh key 3
    writeBatch(in, Seq((2L, 4L, "x"), (1L, 5L, ""), (3L, 6L, "z")))
    runOnce(cdc(in), out, ckpt)
    assert(changes(out) == Seq(
      (1L, 1L, "added", null, "a"), (1L, 2L, "changed", "a", "b"),
      (2L, 3L, "added", null, "x"),
      (1L, 5L, "removed", "b", null),
      (3L, 6L, "added", null, "z")))

    // batch 3: key 1 re-inserted after its delete → 'added' again, with
    // no memory of the pre-delete value
    writeBatch(in, Seq((1L, 7L, "c")))
    runOnce(cdc(in), out, ckpt)
    assert(changes(out).last == (1L, 7L, "added", null, "c"))
  }}

  test("materialization invariant: replaying the changelog rebuilds the " +
      "exact last-value-per-key state of the raw input") { withRocksDb {
    val in = tmp("cdm_in_"); val out = tmp("cdm_out_"); val ckpt = tmp("cdm_ck_")
    // a deterministic upsert history over 20 keys with deletes and
    // re-inserts, split across three micro-batches
    val history = (1L to 120L).map { s =>
      val k = (s * 7) % 20
      val v = if (s % 11 == 0) "" else s"v${(s * 13) % 5}"
      (k, s, v)
    }
    history.grouped(40).foreach { b =>
      writeBatch(in, b)
      runOnce(cdc(in), out, ckpt)
    }
    // expectation: fold the raw history (the state the upsert stream
    // describes)
    val expected = history.sortBy(_._2).foldLeft(Map.empty[Long, String]) {
      case (m, (k, _, "")) => m - k
      case (m, (k, _, v)) => m + (k -> v)
    }
    // replay: apply the changelog per key in seq order
    val replayed = changes(out).foldLeft(Map.empty[Long, String]) {
      case (m, (k, _, "removed", _, _)) => m - k
      case (m, (k, _, _, _, nv)) => m + (k -> nv)
    }
    assert(replayed == expected,
      s"changelog replay diverged:\nreplay=$replayed\nexpected=$expected")
    // and the changelog is minimal: consecutive changes per key never
    // repeat a value (no-op upserts were suppressed)
    changes(out).groupBy(_._1).values.foreach { cs =>
      cs.sortBy(_._2).sliding(2).foreach {
        case Seq((_, _, _, _, a), (_, _, _, b, _)) =>
          assert(a == b || b == null, s"gap in per-key chain: $cs")
        case _ => ()
      }
    }
  }}
}
