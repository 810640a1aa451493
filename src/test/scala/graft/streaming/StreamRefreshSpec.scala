package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

import graft.{SparkEntry, SparkSuite}
import graft.operators.{CorpusAssembly, TextDedup}
import graft.queries.Tables

/**
 * Streaming twin of the q244 incremental corpus-refresh chain (r12
 * verdict item #8): `StreamCorpus.maintainRefreshState` consumes the
 * SAME day-2 arrivals q244's batch build merges — the new third, the
 * re-delivered slice, the cross-source mirror — as a checkpointed
 * stream across three restarts, landing per-batch (src, ch, cnt) /
 * (ch, ntok) delta partitions. `readRefreshState` folds them with the
 * standing day-1 landing, and the folded state drives
 * `dedupRateManifestFromCounts` + `mixturePlan` through the identical
 * chain tail — asserted BIT-IDENTICAL to the registry q244 result.
 * Counts commute, so the 5-way chunking (deliberately co-prime with
 * the fixture's %3 / %9 arrival moduli — the even-modulus trap) can
 * never matter; the restarts prove the checkpoint actually carries
 * the epoch counter across runs.
 */
class StreamRefreshSpec extends SparkSuite {

  private val schema = StructType(Seq(
    StructField("source", StringType), StructField("text", StringType)))

  test("stream-maintained refresh state across 3 checkpointed " +
      "restarts feeds the q244 chain to bit-identical output") {
    val in = Files.createTempDirectory("refresh_in_").toString
    val state = Files.createTempDirectory("refresh_state_").toString
    val ckpt = Files.createTempDirectory("refresh_ckpt_").toString
    val day1Dir = Files.createTempDirectory("refresh_day1_").toString

    val docs = Tables.documents(spark, sf())
      .select(col("doc_id"), col("source"), col("text"))
      .localCheckpoint(true)

    // day-1 standing state — the registry's refreshDay1Dir landing
    val day1 = docs.filter(col("doc_id") % 3 =!= 0)
      .select(col("source").as("src"),
        TextDedup.hash64(col("text")).as("ch"),
        size(TextDedup.tokens(col("text"))).cast("long").as("ntok"))
    day1.groupBy(col("src"), col("ch")).agg(count(lit(1)).as("cnt"))
      .write.mode("overwrite").parquet(s"$day1Dir/sh")
    day1.select(col("ch"), col("ntok")).distinct()
      .write.mode("overwrite").parquet(s"$day1Dir/ntok")

    // q244's exact day-2 arrival multiset (doc_id kept for chunking
    // only — the stream sees (source, text))
    val arrivals = docs.filter(col("doc_id") % 3 === 0)
      .select(col("source"), col("text"), col("doc_id"))
      .unionByName(docs.filter(col("doc_id") % 9 === 1)
        .select(col("source"), col("text"), col("doc_id")))
      .unionByName(docs.filter(col("doc_id") % 9 === 4)
        .select(lit("day2_mirror").as("source"), col("text"),
          col("doc_id")))

    def chunk(pred: org.apache.spark.sql.Column): Unit =
      arrivals.filter(pred).select(col("source"), col("text"))
        .coalesce(1).write.mode("append").json(in)

    def runOnce(): Unit =
      StreamCorpus.maintainRefreshState(
          spark.readStream.schema(schema).json(in), state, ckpt)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
        .awaitTermination()

    chunk(pmod(col("doc_id"), lit(5)) < 2); runOnce()
    chunk(pmod(col("doc_id"), lit(5)) === 2); runOnce()
    chunk(pmod(col("doc_id"), lit(5)) > 2); runOnce()

    val (sh, ntok) = StreamCorpus.readRefreshState(spark, state,
      Some(day1Dir))
    val manifest = TextDedup.dedupRateManifestFromCounts(sh)
    val avail = sh.join(ntok, Seq("ch"))
      .groupBy(col("src"))
      .agg(sum(col("ntok")).as("avail_tok"))
      .withColumn("w", when(col("src") === "day2_mirror", lit(100L))
        .otherwise(expr("cast(substr(src, 4) as long) + 1")))
    val plan = CorpusAssembly.mixturePlan(avail, "src", "avail_tok",
      "w", budgetNum = 1, budgetDen = 2)
    val got = manifest
      .join(plan.select(col("src"), col("avail_tok"),
        col("target_tok"), col("capped"), col("planned_tok"),
        col("rate_ppm")), Seq("src"))
      .orderBy("src")
      .collect().map(_.toSeq).toSeq
    val want = SparkEntry.queries("q244_corpus_refresh_chain")(
        spark, sf())
      .collect().map(_.toSeq).toSeq
    assert(got.nonEmpty)
    assert(got === want)
  }
}
