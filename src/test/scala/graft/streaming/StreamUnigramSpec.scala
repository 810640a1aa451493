package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSuite
import graft.operators.UnigramLM
import graft.queries.Tables

/**
 * Streaming twin of the q295 unigram encode (the 23rd twin): the
 * stream tokenizes each arriving (doc, word) against the landed q294
 * model with the SAME integer Viterbi lattice, keeping four running
 * longs per document — so the max-n_words row per doc must equal the
 * batch encodeStats row bit-for-bit across checkpointed restarts whose
 * chunk boundaries (hash of the word) scatter every document's words
 * over all three micro-batches. Two planted edge words ride along: an
 * over-length word (> WordMaxLen) both sides must drop, and a word
 * whose characters may be absent from the trained alphabet — dropped
 * or encoded, the twin must agree.
 */
class StreamUnigramSpec extends SparkSuite {

  private def tmp(p: String): String = Files.createTempDirectory(p).toString

  /** q294/q295's exact word-stream geometry over the real documents
    * table (lowercase alpha runs, length 3–12) plus the two plants. */
  private def docWords: DataFrame = {
    import spark.implicits._
    Tables.documents(spark, sf())
      .select(col("doc_id"),
        explode(split(lower(col("text")), "[^a-z]+")).as("w"))
      .filter(length(col("w")).between(3, 12))
      .unionByName(Seq(
        (900001L, "zzzzzzzzzzzzz"), // 13 chars: over-length, dropped
        (900002L, "qqq")            // alphabet-dependent
      ).toDF("doc_id", "w"))
  }

  test("streaming unigram tokenizer ≡ batch encodeStats bit-for-bit " +
      "across checkpointed restarts that split documents mid-stream") {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prevProvider = spark.conf.getOption(key)
    spark.conf.set(key, "org.apache.spark.sql.execution.streaming." +
      "state.RocksDBStateStoreProvider")
    try {
    val words = docWords.localCheckpoint(true)
    val model = UnigramLM.train(spark, words.select("w"), "w",
      200, 150, 80).localCheckpoint(true)
    val pieces = model.select(col("piece"), col("cost_q20"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

    val in = tmp("uni_in_"); val out = tmp("uni_out_")
    val ck = tmp("uni_ck_")
    val frame = words
      .select(col("doc_id").cast("string").as("k"), col("w"))
      .localCheckpoint(true)
    def chunk(i: Int): Unit =
      frame.filter(pmod(abs(hash(col("w"))), lit(3)) === i)
        .coalesce(1).write.mode("append").json(in)
    def runOnce(): Unit =
      StatefulOps.unigramTokenizeStream(
          spark.readStream.schema("k STRING, w STRING").json(in), pieces)
        .toDF().writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ck)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
        .awaitTermination()
    (0 until 3).foreach { i => chunk(i); runOnce() }

    val finals = spark.read.parquet(out).collect()
      .map(r => (r.getString(0),
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .groupBy(_._1)
      .map { case (k, rows) => k -> rows.map(_._2).maxBy(_._1) }
    val want = UnigramLM.encodeStats(words, "doc_id", "w", model)
      .collect()
      .map(r => r.getLong(0).toString ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(finals.keySet === want.keySet)
    for ((k, got) <- finals)
      assert(got === want(k), s"doc $k")
    // the over-length plant was dropped by BOTH sides
    assert(!finals.contains("900001"))
    // the stream actually tokenized: unigram tokens strictly fewer
    // than the char baseline somewhere (multi-char pieces in use)
    assert(finals.values.exists(v => v._3 < v._2))
    } finally {
      prevProvider match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }
}
