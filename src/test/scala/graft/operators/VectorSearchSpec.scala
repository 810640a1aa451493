package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import graft.SparkSuite
import graft.queries.Tables

/** Semantic + plan properties of the vector-search operators beyond the
  * oracle gate (q25/q26). */
class VectorSearchSpec extends SparkSuite {

  private def emb = Tables.embeddings(spark, sf("0.01"))

  test("knnBrute: nearest neighbor of a seeded near-identical mutant is its original") {
    val orig = emb.select(col("vec_id"), col("embedding"))
    val mut = emb.filter(col("vec_id") % 100 === 0)
      .select((col("vec_id") + 100000).as("vec_id"),
        transform(col("embedding"), (x, i) =>
          (x.cast(DoubleType) * (lit(1.0) + lit(0.002) * (i % 2).cast(DoubleType)))
            .cast("float")).as("embedding"))
    val top1 = VectorSearch.knnBrute(orig.union(mut), mut, "vec_id", "embedding", k = 1)
    val rows = top1.collect()
    assert(rows.length === 5)
    assert(rows.forall(r => r.getAs[Long]("neighbor_id") === r.getAs[Long]("query_id") - 100000))
    assert(rows.forall(_.getAs[Double]("cosine") > 0.999))
  }

  test("cosine is exactly 1.0 on identical vectors and symmetric-bounded") {
    import spark.implicits._
    val df = Seq((1L, Seq(0.6f, 0.8f)), (2L, Seq(0.6f, 0.8f)), (3L, Seq(-0.8f, 0.6f)))
      .toDF("vec_id", "embedding")
    val scored = VectorSearch.knnBrute(df, df.filter($"vec_id" === 1), "vec_id", "embedding", k = 2)
      .orderBy("rnk").collect()
    // identical vector: 1.0 up to one ulp (sqrt of the squared norm rounds)
    assert(math.abs(scored(0).getAs[Double]("cosine") - 1.0) < 1e-12)
    assert(math.abs(scored(1).getAs[Double]("cosine")) < 1e-12) // orthogonal
  }

  test("LSH bucketed pairs plan: equality join on bucket, no cartesian product") {
    val vs = emb.select(col("vec_id"), VectorSearch.toDouble(col("embedding")).as("v"))
    val plan = VectorSearch.bucketedNearDupPairs(vs, "vec_id", 0.99)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("rhp signature distributes the corpus across buckets") {
    val vs = emb.select(VectorSearch.toDouble(col("embedding")).as("v"))
      .select(VectorSearch.rhpBucket(col("v")).as("bucket"))
    val n = vs.select(countDistinct(col("bucket"))).head().getLong(0)
    // 500 random unit vectors over 8 sign bits: expect most of 256 buckets hit
    assert(n > 100, s"only $n distinct buckets")
  }
}
