package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

import graft.{SparkEntry, SparkSuite}
import graft.operators.VectorSearch
import graft.queries.{Tables, VectorQueries}

/**
 * Streaming twin of the q263 embedding decontamination gate — the
 * 20th twin: `StreamCorpus.maintainDecontamState` scores ARRIVING
 * train vectors against the static benchmark suite (only its own rows
 * per micro-batch — standing vectors are never re-scored) and lands
 * the flagged rows under checkpoint-bound `batch_id` partitions;
 * `readDecontamState` folds them by DISTINCT — asserted BIT-IDENTICAL
 * to the registry q263 report over the same planted fixture (exact
 * leakage at cosine 1.0, near-mutants at ≈0.999998, distorted family
 * correctly below the 0.99 line). The final chunk deliberately
 * RE-DELIVERS the near-mutant family (the at-least-once case): its
 * re-scored rows are bit-identical, so the distinct fold absorbs the
 * duplicate landing. Three restarts prove the checkpoint carries the
 * epoch counter; the all-clean middle chunk proves a zero-flag batch
 * still lands a schema-bearing partition the fold can read.
 */
class StreamDecontamSpec extends SparkSuite {

  private val schema = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("v", ArrayType(DoubleType))))

  test("stream-landed decontamination flags across 3 checkpointed " +
      "restarts (with an at-least-once re-delivery) fold to the " +
      "bit-identical q263 report") {
    val in = Files.createTempDirectory("decon_in_").toString
    val state = Files.createTempDirectory("decon_state_").toString
    val ckpt = Files.createTempDirectory("decon_ckpt_").toString

    // the q263 fixture, verbatim: originals (bench members included —
    // exact leakage), a near-mutant family (+200000, alternate dims
    // ×1.002) and a distorted family (+300000, alternate dims ×1.5)
    val emb = Tables.embeddings(spark, sf())
    val orig = emb.select(col("vec_id"),
      VectorSearch.toDouble(col("embedding")).as("v"))
    def mutant(idOff: Int, eps: Double) = emb
      .filter(col("vec_id") % 100 === 0 && col("vec_id") < 500)
      .select((col("vec_id") + idOff).as("vec_id"),
        transform(col("embedding"), (x, i) =>
          x.cast(DoubleType) *
            (lit(1.0) + lit(eps) * (i % 2).cast(DoubleType))).as("v"))
    val train = orig.union(mutant(200000, 0.002))
      .union(mutant(300000, 0.5)).localCheckpoint(true)
    val bench = emb.filter(expr(VectorQueries.QuerySetSql))
      .select(col("vec_id"), VectorSearch.toDouble(col("embedding")).as("v"))
      .localCheckpoint(true)

    def chunk(pred: org.apache.spark.sql.Column): Unit =
      train.filter(pred).coalesce(1).write.mode("append").parquet(in)

    def runOnce(): Unit =
      StreamCorpus.maintainDecontamState(
          spark.readStream.schema(schema).parquet(in), bench,
          "vec_id", "v", 0.99, state, ckpt)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
        .awaitTermination()

    // every mutant id is ≡ 0 (mod 5) — both planted families arrive in
    // chunk 1, the middle chunk is all-clean originals (zero flags)
    chunk(pmod(col("vec_id"), lit(5)) < 2); runOnce()
    chunk(pmod(col("vec_id"), lit(5)) === 2); runOnce()
    chunk(pmod(col("vec_id"), lit(5)) > 2 ||
      (col("vec_id") >= 200000 && col("vec_id") < 300000)); runOnce()

    val got = StreamCorpus.readDecontamState(spark, state, None)
      .orderBy("train_id")
      .collect().map(_.toSeq).toSeq
    val want = SparkEntry.queries("q263_embedding_decontam")(spark, sf())
      .collect().map(_.toSeq).toSeq
    assert(got.nonEmpty)
    assert(got === want)
  }
}
