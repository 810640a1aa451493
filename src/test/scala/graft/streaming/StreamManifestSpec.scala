package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

import graft.SparkSuite
import graft.operators.QualityAudit
import graft.queries.Tables

/**
 * Streaming twin of the corpus manifest (q182) — with a twist that IS
 * the point: because the digest is an additive commutative aggregate,
 * the SAME `QualityAudit.corpusManifest` body runs unchanged as a
 * streaming aggregation (complete mode) — no separate stateful twin
 * code to drift out of sync. The spec replays the documents table in
 * three micro-batches across three checkpointed restarts and asserts
 * the final manifest is bit-identical to the batch operator's over the
 * same rows, per source: count/chars/range/digest all maintained
 * incrementally.
 */
class StreamManifestSpec extends SparkSuite {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType),
    StructField("source", StringType)))

  test("streaming manifest across 3 checkpointed restarts == batch " +
      "manifest bit-for-bit") {
    val in = Files.createTempDirectory("manifest_in_").toString
    val ckpt = Files.createTempDirectory("manifest_ckpt_").toString
    val docs = Tables.documents(spark, sf())
      .select(col("doc_id"), col("text"), col("source"))
      .localCheckpoint(true)

    def chunk(i: Int): Unit =
      docs.filter(col("doc_id") % 3 === i)
        .write.mode("append").json(in)

    def runOnce(): Unit = {
      val stream = spark.readStream.schema(schema).json(in)
      val q = QualityAudit.corpusManifest(stream, "source", "doc_id", "text")
        .writeStream.format("memory").queryName("manifest_stream")
        .option("checkpointLocation", ckpt)
        .outputMode("complete")
        .trigger(Trigger.AvailableNow())
        .start()
      try q.awaitTermination(60000) finally q.stop()
    }

    for (i <- 0 until 3) { chunk(i); runOnce() }

    val got = spark.table("manifest_stream")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5)))).toMap
    val want = QualityAudit.corpusManifest(docs, "source", "doc_id", "text")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5)))).toMap
    assert(got === want)
    assert(got.nonEmpty)
  }
}
