package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSuite
import graft.operators.VectorSearch

/**
 * Streaming semantic dedup (q189's stream twin): per-cell exemplar
 * state survives micro-batch boundaries through the checkpoint, and on
 * an id-ordered replay of the q189 planted-mutant corpus the stream's
 * keep-set must equal batch semanticDedup's — the min id of each
 * planted neighborhood arrives first, is kept, and both mutants match
 * it. Plus the cap-pressure contract: a cell at `maxExemplars` keeps
 * COMPARING (near-dups of stored exemplars still drop) but stops
 * ADMITTING (novel overflow arrivals emit keep=1/capped=1 and are not
 * stored — their own later twins stay keepers).
 */
class StreamSemanticDedupSpec extends SparkSuite {
  import spark.implicits._

  private def tmp(p: String): String = Files.createTempDirectory(p).toString

  private val schema =
    "cell LONG, t LONG, tie LONG, vid LONG, v ARRAY<DOUBLE>, nrm DOUBLE"

  private def runOnce(out: String, ckpt: String, in: String,
      minCos: Double, cap: Int): Unit =
    StatefulOps.semanticDedupStream(
      spark.readStream.schema(schema).json(in), minCos, cap)
      .toDF().writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .outputMode("append").trigger(Trigger.Once()).start()
      .awaitTermination()

  private def withRocks(body: => Unit): Unit = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("an id-ordered replay reproduces batch semanticDedup's keep-set " +
      "on the planted-mutant corpus, across checkpointed micro-batches") {
    withRocks {
      val dir = "/root/testdata/sf0.001"
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      val orig = emb.select(col("vec_id"),
        expr("transform(embedding, x -> cast(x as double))")
          .as("embedding"))
      // the q189 fixture shape: alternate-dim scale mutants, shifted
      // off the % 50 centroid-seed lattice
      def mut(shift: Long, eps: Double) = emb
        .filter(col("vec_id") % 50 === 7)
        .select((col("vec_id") + shift).as("vec_id"),
          expr(s"transform(embedding, (x, i) -> cast(x as double) * " +
            s"(1.0 + $eps * cast(i % 2 as double)))").as("embedding"))
      val uni = orig.unionByName(mut(100001L, 0.002))
        .unionByName(mut(200002L, 0.004)).localCheckpoint(true)

      val batch = VectorSearch
        .semanticDedup(uni, "vec_id", "embedding", minCosine = 0.99)
        .collect().map(r => r.getLong(0) -> r.getInt(3)).toMap
      assert(batch.nonEmpty, "no planted components — fixture broken")
      assert(batch.valuesIterator.sum < batch.size, "no drops in batch")

      // the landed-centroid assignment the stream joins against
      val assign = VectorSearch.kmeansAssign(uni, "vec_id", "embedding")
        .select(col("vec_id"), col("cent_id"))
      val rows = uni.join(assign, "vec_id")
        .select(col("cent_id").as("cell"), col("vec_id").as("t"),
          lit(0L).as("tie"), col("vec_id").as("vid"),
          col("embedding").as("v"),
          sqrt(VectorSearch.dotD(col("embedding"), col("embedding")))
            .as("nrm"))
        .localCheckpoint(true)

      val in = tmp("sd_in_"); val out = tmp("sd_out_")
      val ck = tmp("sd_ck_")
      // three ascending vid slices — originals land before mutants
      Seq(col("vid") <= 500L,
        col("vid") > 500L && col("vid") <= 150000L,
        col("vid") > 150000L).foreach { slice =>
        rows.filter(slice).coalesce(1).write.mode("append").json(in)
        runOnce(out, ck, in, minCos = 0.99,
          cap = VectorSearch.DefaultMaxBandBucket)
      }
      val got = spark.read.parquet(out).collect()
        .map(r => r.getLong(1) -> ((r.getInt(2), r.getInt(3)))).toMap
      assert(got.size === rows.count())
      batch.foreach { case (vid, keep) =>
        assert(got(vid)._1 === keep, s"vid $vid: stream/batch keep split")
      }
      got.foreach { case (vid, (keep, capped)) =>
        if (!batch.contains(vid))
          assert(keep === 1, s"lone vid $vid dropped by the stream")
        assert(capped === 0, s"vid $vid tripped the cap at corpus scale")
      }
    }
  }

  test("cap pressure: a full cell keeps comparing but stops admitting") {
    withRocks {
      val dim = 4
      def basis(i: Int, s: Double) =
        Seq.tabulate(dim)(j => if (j == i % dim) s else 0.0)
      def rows(rs: Seq[(Long, Seq[Double])]) = rs.map { case (vid, v) =>
        (7L, vid, 0L, vid, v,
          math.sqrt(v.map(x => x * x).sum))
      }.toDF("cell", "t", "tie", "vid", "v", "nrm")

      val in = tmp("sc_in_"); val out = tmp("sc_out_")
      val ck = tmp("sc_ck_")
      // batch 1 fills the cell to cap = 3 with mutually orthogonal dirs
      rows(Seq(1L -> basis(0, 1.0), 2L -> basis(1, 1.0),
        3L -> basis(2, 1.0))).coalesce(1).write.mode("append").json(in)
      runOnce(out, ck, in, minCos = 0.99, cap = 3)
      // batch 2: novel direction (capped), near-dup of exemplar 1
      // (still drops), twin of the capped-unstored arrival (kept)
      rows(Seq(4L -> basis(3, 1.0), 5L -> basis(0, 1.5),
        6L -> basis(3, 2.0))).coalesce(1).write.mode("append").json(in)
      runOnce(out, ck, in, minCos = 0.99, cap = 3)

      val got = spark.read.parquet(out).collect()
        .map(r => r.getLong(1) ->
          ((r.getInt(2), r.getInt(3),
            Option(r.get(4)).map(_.asInstanceOf[Long])))).toMap
      assert(got(1L) === ((1, 0, None)) && got(2L) === ((1, 0, None)) &&
        got(3L) === ((1, 0, None)))
      assert(got(4L) === ((1, 1, None)), "overflow arrival not flagged")
      assert(got(5L) === ((0, 0, Some(1L))),
        "full cell stopped comparing against stored exemplars")
      assert(got(6L) === ((1, 1, None)),
        "twin of an unstored overflow arrival must stay a keeper")
    }
  }
}
