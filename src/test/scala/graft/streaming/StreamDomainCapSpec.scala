package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSuite
import graft.operators.UrlCuration
import graft.queries.Tables

/**
 * Streaming twin of the q297 per-domain cap: the stream keeps the
 * running top-K (weight desc, id asc) plus totals per domain — O(K)
 * state — and its LAST accounting row per domain must equal the batch
 * operator's row on the concatenated input bit-for-bit, across
 * checkpointed restarts whose boundaries split every domain while its
 * top-K state is already overflowing (chunk 1 alone exceeds the cap
 * for every domain). Also pins the order-independence claim: the
 * running top-K is commutative in the input set, so chunking by id
 * ranges (arbitrary weight order) needs no ordered-arrival contract.
 */
class StreamDomainCapSpec extends SparkSuite {

  private def tmp(p: String): String = Files.createTempDirectory(p).toString

  private val K = 5

  /** q297-shaped input: registered domains over the documents table,
    * quality weight = n_chars. */
  private def frame: DataFrame =
    Tables.documents(spark, sf())
      .withColumn("host", concat(col("source"),
        when(col("doc_id") % 4 === 0, ".com")
          .when(col("doc_id") % 4 === 1, ".co.uk")
          .when(col("doc_id") % 4 === 2, ".io")
          .otherwise(".dev")))
      .select(UrlCuration.registeredDomain(col("host")).as("dom"),
        col("doc_id").as("id"), col("n_chars").as("w"))

  test("streaming per-domain cap ≡ batch capPerDomain accounting " +
      "bit-for-bit across checkpointed restarts with overflowing state") {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "org.apache.spark.sql.execution.streaming." +
      "state.RocksDBStateStoreProvider")
    try {
      val in = tmp("domcap_in_"); val out = tmp("domcap_out_")
      val ck = tmp("domcap_ck_")
      val f = frame.localCheckpoint(true)
      def chunk(pred: org.apache.spark.sql.Column): Unit =
        f.filter(pred).coalesce(1).write.mode("append").json(in)
      def runOnce(): Unit =
        StatefulOps.domainCapStream(
            spark.readStream.schema("dom STRING, id LONG, w LONG")
              .json(in), K)
          .toDF().writeStream.format("parquet")
          .option("path", out).option("checkpointLocation", ck)
          .outputMode("append").trigger(Trigger.AvailableNow()).start()
          .awaitTermination()
      // id-range chunks: every domain is touched in all three batches
      // (the arm moduli stripe the whole id space), and after chunk 1
      // every domain's kept state is already at the cap
      chunk(col("id") % 20 < 12); runOnce()
      chunk(col("id") % 20 >= 12 && col("id") % 20 < 17); runOnce()
      chunk(col("id") % 20 >= 17); runOnce()

      // last emitted row per domain = the one with the largest n_total
      // (strictly monotone per touch)
      val got = spark.read.parquet(out).collect()
        .map(r => (r.getString(0), (r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))))
        .groupBy(_._1).map { case (d, rows) =>
          d -> rows.map(_._2).maxBy(_._1) }
      val want = UrlCuration.capPerDomain(f, "dom", "id", "w", K)
        .collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))))
        .toMap
      assert(got.nonEmpty)
      assert(got === want)
      // the cap actually binds somewhere (dropped rows exist)
      assert(want.values.exists(_._3 > 0L))
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }
}
