package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

import graft.{SparkEntry, SparkSuite}
import graft.operators.{TextAnalysis, TextDedup}
import graft.queries.{Tables, TextQueries}

/**
 * Streaming twin of the q261 perplexity gate — the 18th twin:
 * `StreamCorpus.maintainFluencyState` scores ARRIVING documents
 * against the landed stupid-backoff model (only its own rows per
 * micro-batch — standing documents are never re-scored) and lands
 * additive (source, s, cnt) / (source, n_docs) delta partitions under
 * checkpoint-bound batch dirs. `readFluencyState` folds them with a
 * standing day-1 landing, and `fluencyGateFromCounts` derives the
 * manifest from the folded histograms — asserted BIT-IDENTICAL to the
 * registry q261 result over the same corpus. The 5-way chunking is
 * co-prime with nothing the scores depend on (the LM is a static
 * artifact), and the three restarts prove the checkpoint carries the
 * epoch counter.
 */
class StreamFluencySpec extends SparkSuite {

  private val schema = StructType(Seq(
    StructField("doc_id", LongType), StructField("source", StringType),
    StructField("text", StringType)))

  test("stream-scored fluency state across 3 checkpointed restarts " +
      "drives fluencyGateFromCounts to bit-identical q261 output") {
    val in = Files.createTempDirectory("fluency_in_").toString
    val state = Files.createTempDirectory("fluency_state_").toString
    val ckpt = Files.createTempDirectory("fluency_ckpt_").toString
    val day1Dir = Files.createTempDirectory("fluency_day1_").toString

    val docs = Tables.documents(spark, sf())
      .select(col("doc_id"), col("source"), col("text"))
      .localCheckpoint(true)
    // the registry's landed whole-corpus model, trained once here with
    // the q257 geometry (the LM is an ARTIFACT: day-2 scoring uses the
    // day-1-era model — retraining cadence is the operator's caller's
    // policy, not the state fold's)
    val lm = TextAnalysis.trainBackoffLm(docs.select(col("text")),
        "text", TextQueries.BackoffTopK3, TextQueries.BackoffTopK2,
        TextQueries.BackoffTopK1)
      .localCheckpoint(true)

    // day-1 standing state: two thirds of the corpus, landed batch-side
    val day1 = docs.filter(col("doc_id") % 3 =!= 0)
    TextAnalysis.backoffScore(day1.select(col("doc_id"), col("text")),
        "doc_id", "text", lm)
      .join(day1.select(col("doc_id").as("doc"), col("source")),
        Seq("doc"))
      .groupBy(col("source"), col("mean_score_ppm").as("s"))
      .agg(count(lit(1)).as("cnt"))
      .write.mode("overwrite").parquet(s"$day1Dir/sc")
    day1.groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
      .write.mode("overwrite").parquet(s"$day1Dir/docs")

    // day-2 arrivals: the remaining third, streamed in three chunks
    val arrivals = docs.filter(col("doc_id") % 3 === 0)

    def chunk(pred: org.apache.spark.sql.Column): Unit =
      arrivals.filter(pred)
        .coalesce(1).write.mode("append").json(in)

    def runOnce(): Unit =
      StreamCorpus.maintainFluencyState(
          spark.readStream.schema(schema).json(in), lm, state, ckpt)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
        .awaitTermination()

    chunk(pmod(col("doc_id"), lit(5)) < 2); runOnce()
    chunk(pmod(col("doc_id"), lit(5)) === 2); runOnce()
    chunk(pmod(col("doc_id"), lit(5)) > 2); runOnce()

    val (sc, totals) = StreamCorpus.readFluencyState(spark, state,
      Some(day1Dir))
    val got = TextAnalysis.fluencyGateFromCounts(sc, totals)
      .orderBy("source")
      .collect().map(_.toSeq).toSeq
    val want = SparkEntry.queries("q261_perplexity_gate")(spark, sf())
      .collect().map(_.toSeq).toSeq
    assert(got.nonEmpty)
    assert(got === want)
  }
}
