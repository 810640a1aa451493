package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/**
 * Distributed graph primitives the dedup pipeline needs. The reference
 * has no graph code (its dedup is delegated entirely to the DB's unique
 * constraints); these exist because near-duplicate PAIRS (q23/q26) are
 * only half of deduplication — the actionable output is one canonical
 * document per connected CLUSTER of pairs, and pair→cluster is a
 * connected-components problem (a chain A~B, B~C must collapse to one
 * cluster even when A~C was never emitted as a pair).
 */
object GraphOps {

  /**
   * Connected components by iterative min-label propagation: every node
   * starts labeled with itself; each round a node's label drops to the
   * min of its own and its neighbors'; the fixpoint labels every node
   * with the smallest node id in its component — a unique, order-
   * independent result (bit-deterministic on any cluster).
   *
   * Scale shape: rounds = graph diameter (near-dup clusters are
   * near-cliques, diameter 2-3 in practice; GraphX/connected-components
   * uses the same propagation). Each round is one equality join
   * (edges.u = labels.node) + one min-aggregate — both hash-partitioned
   * on the SAME key, so AQE reuses the partitioning instead of
   * re-shuffling, and only (node, label) longs ever move. The
   * convergence probe is a decimal-sum aggregate (labels only ever
   * decrease, so an unchanged sum ⇔ fixpoint) — one scalar to the
   * driver per round, never row data; lineage is truncated with a
   * localCheckpoint every few rounds so the plan stays O(1) deep
   * instead of O(rounds).
   *
   * Input: a pair frame with two node-id columns (undirected edges).
   * Output: (node, component) — every node appearing in any pair,
   * labeled with its component's min node id.
   */
  def connectedComponents(
      pairs: DataFrame,
      aCol: String,
      bCol: String,
      maxIterations: Int = 50): DataFrame = {
    val edges = pairs
      .select(col(aCol).cast("long").as("u"), col(bCol).cast("long").as("v"))
      .union(pairs.select(col(bCol).cast("long").as("u"),
        col(aCol).cast("long").as("v")))
      .distinct()
      .persist()

    def labelSum(df: DataFrame): java.math.BigDecimal =
      df.agg(sum(col("label").cast(DecimalType(38, 0)))).head().getDecimal(0)

    var labels = edges.select(col("u").as("node")).distinct()
      .withColumn("label", col("node"))
      .persist()
    var prevSum = labelSum(labels)
    var converged = false
    var iter = 0
    while (!converged && iter < maxIterations) {
      iter += 1
      val msgs = edges.join(labels, edges("u") === labels("node"))
        .select(edges("v").as("node"), col("label"))
      val stepped = labels.select(col("node"), col("label")).union(msgs)
        .groupBy("node").agg(min("label").as("label"))
      val next =
        (if (iter % 5 == 0) stepped.localCheckpoint(true) else stepped)
          .persist()
      val nextSum = labelSum(next)
      converged = nextSum.compareTo(prevSum) == 0
      labels.unpersist()
      labels = next
      prevSum = nextSum
    }
    edges.unpersist()
    labels.select(col("node"), col("label").as("component"))
  }
}
