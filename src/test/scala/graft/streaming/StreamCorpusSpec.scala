package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

import graft.SparkSuite
import graft.operators.{CorpusAssembly, TextAnalysis}
import graft.queries.{Tables, TextQueries}

/**
 * The corpus pipeline's STREAMING twin (VERDICT r7 #6): q85's batch
 * result must be reproducible by replaying the same fixture through
 * the streaming front half (gates + ingest-time dedup keep-list,
 * StreamCorpus) and then running the batch back half (stratified mix →
 * packing → bin stats) over `corpus ⋉ keep-list`. Bit-for-bit — the
 * proof that the nightly batch build and a continuously-ingesting
 * build converge on the same training corpus.
 */
class StreamCorpusSpec extends SparkSuite {
  import spark.implicits._

  private def tmp(p: String): String = Files.createTempDirectory(p).toString

  private val schema = StructType(Seq(
    StructField("doc_id", LongType), StructField("lang", StringType),
    StructField("text", StringType), StructField("n_chars", LongType)))

  /** q85's fixture: the documents table plus the injected duplicate
    * slice (every 10th doc re-inserted under id + 500000). */
  private def base: DataFrame = Tables.documents(spark, sf())
    .select(col("doc_id"), col("lang"), col("text"), col("n_chars"))
  private def dupSlice: DataFrame = base.filter(col("doc_id") % 10 === 0)
    .select((col("doc_id") + 500000).as("doc_id"), col("lang"),
      col("text"), col("n_chars"))

  @annotation.nowarn("cat=deprecation") // Trigger.Once: see StreamDedupSpec
  private def runOnce(in: String, out: String, ckpt: String): Unit =
    StreamCorpus.keepList(
      spark.readStream.schema(schema).json(in),
      Seq("en", "de"), TextQueries.Q85MinChars, TextQueries.Q85MinTokens,
      ttlMs = 0L) // closed replay fixture: markers never expire
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .outputMode("append").trigger(Trigger.Once()).start()
      .awaitTermination()

  /** q85's batch back half over an already-gated, already-deduped doc
    * set — mix, pack, bin stats (corpus-order-insensitive). */
  private def backHalf(docs: DataFrame): DataFrame = {
    val mixed = CorpusAssembly.stratifiedSample(
      docs.select(col("doc_id"), col("lang"), col("text")),
      "text", "lang", TextQueries.SampleRates)
    val sharded = mixed.select(col("doc_id"),
      (col("doc_id") % 8).as("shard"),
      TextAnalysis.wsTokenCount(col("text")).as("n_tokens"))
    CorpusAssembly.binStats(
      CorpusAssembly.packBins(sharded, "doc_id", "n_tokens", "shard", 512L),
      "shard", "n_tokens", "doc_id")
      .orderBy("shard", "bin")
  }

  private def rows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq.map(_.toSeq)

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

  test("replayed stream (history batch, then the duplicate delta) + batch " +
      "back half ≡ the q85 registry result, bit-for-bit") {
    withRocksDb {
      val in = tmp("sc_in_"); val out = tmp("sc_out_"); val ckpt = tmp("sc_ck_")
      // arrival order = id order: the original corpus is batch 1, the
      // re-inserted duplicates are batch 2 — first-wins dedup then
      // coincides with the batch min-id rule (StreamCorpus scaladoc)
      base.coalesce(1).write.mode("append").json(in)
      runOnce(in, out, ckpt)
      dupSlice.coalesce(1).write.mode("append").json(in)
      runOnce(in, out, ckpt)

      val keep = spark.read.parquet(out).select(col("doc_id"))
      // every injected duplicate must have died in STREAM state, not in
      // any later batch stage
      assert(spark.read.parquet(out)
        .filter(col("doc_id") >= 500000).count() == 0,
        "a duplicate survived the streaming dedup")

      val streamed = backHalf(
        base.unionByName(dupSlice).join(keep, Seq("doc_id"), "left_semi"))
      val batch = graft.SparkEntry.queries("q85_corpus_pipeline")(spark, sf())
      assert(rows(streamed) == rows(batch),
        "stream-fed corpus diverged from the batch q85 result")
    }
  }

  test("the stream-maintained shingle index ≡ the batch-landed index over " +
      "the gated, deduped corpus (docs and shingles tables, as sets)") {
    withRocksDb {
      val in = tmp("si_in_"); val ckpt = tmp("si_ck_")
      val streamDir = tmp("si_stream_"); val batchDir = tmp("si_batch_")

      @annotation.nowarn("cat=deprecation")
      def runIndexOnce(): Unit =
        StreamCorpus.maintainShingleIndex(
          spark.readStream.schema(schema).json(in),
          Seq("en", "de"), TextQueries.Q85MinChars, TextQueries.Q85MinTokens,
          ttlMs = 0L, dir = streamDir, checkpointDir = ckpt)
          .outputMode("append").trigger(Trigger.Once()).start()
          .awaitTermination()

      base.coalesce(1).write.mode("append").json(in)
      runIndexOnce()
      dupSlice.coalesce(1).write.mode("append").json(in)
      runIndexOnce()

      // batch twin: same gates, min-id-per-hash64 dedup, one landing
      val gated = StreamCorpus.gate(base.unionByName(dupSlice),
        Seq("en", "de"), TextQueries.Q85MinChars, TextQueries.Q85MinTokens)
      val deduped = gated
        .withColumn("__rep", min("doc_id")
          .over(Window.partitionBy(graft.operators.TextDedup.hash64(col("text")))))
        .filter(col("doc_id") === col("__rep")).drop("__rep")
      graft.operators.TextDedup.landShingleIndex(
        deduped, "text", "doc_id", batchDir)

      def docSet(dir: String) =
        graft.operators.TextDedup.readDocIndex(spark, dir)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      def shingleSet(dir: String) =
        graft.operators.TextDedup.readShingleIndex(spark, dir)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

      assert(docSet(streamDir) == docSet(batchDir),
        "doc index diverged between stream maintenance and batch landing")
      assert(shingleSet(streamDir) == shingleSet(batchDir),
        "shingle index diverged between stream maintenance and batch landing")

      // batch consumers must tolerate the stream index's extra batch_id
      // partition column: same dedup groups and same MinHash signatures
      // from either copy
      def groups(dir: String) =
        graft.operators.TextDedup.exactDupGroupsFromIndex(
          graft.operators.TextDedup.readDocIndex(spark, dir))
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(groups(streamDir) == groups(batchDir))
      def sigs(dir: String) =
        graft.operators.TextDedup.signaturesFromHashRows(
          graft.operators.TextDedup.readShingleIndex(spark, dir))
          .collect().map(r => (r.getLong(0), r.getSeq[Long](1))).toSet
      assert(sigs(streamDir) == sigs(batchDir))

      // the small-files exit: folding the per-batch partition dirs with
      // the standing compactor keeps the index consumer-identical
      val compacted = tmp("si_compact_")
      graft.operators.ScanOps.compactParquet(
        spark, s"$streamDir/docs", s"$compacted/docs")
      graft.operators.ScanOps.compactParquet(
        spark, s"$streamDir/shingles", s"$compacted/shingles")
      assert(docSet(compacted) == docSet(streamDir))
      assert(shingleSet(compacted) == shingleSet(streamDir))
    }
  }

  test("a fresh checkpoint refuses to write epoch 0 over a standing " +
      "multi-batch index (its dedup markers are gone)") {
    withRocksDb {
      val in = tmp("sg_in_"); val ckpt = tmp("sg_ck_"); val dir = tmp("sg_ix_")
      // a standing index landed under a PREVIOUS checkpoint lineage
      Seq((1L, 42L)).toDF("doc_id", "content_hash")
        .write.parquet(s"$dir/docs/batch_id=1")
      base.limit(5).coalesce(1).write.mode("append").json(in)
      @annotation.nowarn("cat=deprecation")
      val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        StreamCorpus.maintainShingleIndex(
          spark.readStream.schema(schema).json(in),
          Seq("en", "de"), TextQueries.Q85MinChars, TextQueries.Q85MinTokens,
          ttlMs = 0L, dir = dir, checkpointDir = ckpt)
          .outputMode("append").trigger(Trigger.Once()).start()
          .awaitTermination()
      }
      def causes(t: Throwable): Seq[Throwable] =
        if (t == null) Nil else t +: causes(t.getCause)
      assert(causes(ex).exists(_.isInstanceOf[IllegalStateException]),
        s"expected the epoch-0 refusal, got: $ex")
    }
  }

  test("a DIFFERENT checkpoint cannot extend a marker-owned index " +
      "(lineage binding, both directions)") {
    withRocksDb {
      val in = tmp("sl_in_"); val ckptA = tmp("sl_ckA_"); val ckptB = tmp("sl_ckB_")
      val dir = tmp("sl_ix_")
      @annotation.nowarn("cat=deprecation")
      def run(ckpt: String): Unit =
        StreamCorpus.maintainShingleIndex(
          spark.readStream.schema(schema).json(in),
          Seq("en", "de"), TextQueries.Q85MinChars, TextQueries.Q85MinTokens,
          ttlMs = 0L, dir = dir, checkpointDir = ckpt)
          .outputMode("append").trigger(Trigger.Once()).start()
          .awaitTermination()
      base.limit(20).coalesce(1).write.mode("append").json(in)
      run(ckptA) // adopts the dir, writes the _lineage marker
      base.limit(40).coalesce(1).write.mode("append").json(in)
      run(ckptA) // same checkpoint extends fine
      val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        run(ckptB) // fresh checkpoint, standing index: refuse
      }
      def causes(t: Throwable): Seq[Throwable] =
        if (t == null) Nil else t +: causes(t.getCause)
      assert(causes(ex).exists(c => c.isInstanceOf[IllegalStateException] &&
        c.getMessage.contains("belongs to checkpoint")), s"got: $ex")
    }
  }

  test("a gated-out document never enters dedup state (gates run before " +
      "the hash)") {
    withRocksDb {
      val in = tmp("scg_in_"); val out = tmp("scg_out_"); val ckpt = tmp("scg_ck_")
      val longText = ("lorem ipsum dolor sit amet " * 20).trim // 100 tokens, 539 chars
      Seq(
        (1L, "en", longText, longText.length.toLong),   // passes
        (2L, "fi", longText, longText.length.toLong),   // wrong lang
        (3L, "en", "too short", 9L),                    // under both floors
        (4L, "en", longText, longText.length.toLong))   // dup of 1 by content
        .toDF("doc_id", "lang", "text", "n_chars")
        .coalesce(1).write.mode("append").json(in)
      runOnce(in, out, ckpt)
      val kept = spark.read.parquet(out)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      assert(kept.map(_._2) == Seq(1L), s"kept: $kept")
    }
  }
}
