package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Hand-computable semantics of the graph primitives beyond their oracle
  * gates (q61 clusters, q67 PageRank). */
class GraphOpsSpec extends SparkSuite {
  import spark.implicits._

  private val S = GraphOps.PageRankScale

  test("connectedComponents: a chain plus an isolated edge labels by min id") {
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L)).toDF("a", "b")
    val got = GraphOps.connectedComponents(pairs, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("connectedComponents: an empty pair frame yields an empty result, not an NPE") {
    val pairs = Seq.empty[(Long, Long)].toDF("a", "b")
    assert(GraphOps.connectedComponents(pairs, "a", "b").count() === 0L)
  }

  test("connectedComponents refuses to return non-converged labels at the " +
      "iteration budget (silent truncation would multi-label components)") {
    // a 12-node chain needs more than 2 min-propagation rounds
    val pairs = (1L until 12L).map(i => (i, i + 1)).toDF("a", "b")
    val ex = intercept[IllegalStateException] {
      GraphOps.connectedComponents(pairs, "a", "b", maxIterations = 2)
    }
    assert(ex.getMessage.contains("did not converge"), ex.getMessage)
    // and with budget it converges to the single min label
    val ok = GraphOps.connectedComponents(pairs, "a", "b")
      .collect().map(r => r.getLong(1)).toSet
    assert(ok === Set(1L))
  }

  test("pageRankFixed: a 2-cycle is a fixed point at exactly SCALE") {
    val edges = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val got = GraphOps.pageRankFixed(edges, "src", "dst", iterations = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // contribution = rank div 1; rank' = 0.15·S + 0.85·S = S, every round
    assert(got === Map(1L -> S, 2L -> S))
  }

  test("pageRankFixed: in-star concentrates rank; sources keep the base; exact longs") {
    // 1 -> 2 <- 3 : node 2 is dangling (mass dropped), sources get base
    val edges = Seq((1L, 2L), (3L, 2L)).toDF("src", "dst")
    val base = 15L * S / 100
    // replay the integer recurrence exactly
    var r1 = S; var r2 = S
    for (_ <- 1 to 3) {
      val next2 = base + 85L * (r1 + r1) / 100 // both sources share rank r1
      r1 = base
      r2 = next2
    }
    val got = GraphOps.pageRankFixed(edges, "src", "dst", iterations = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> base, 3L -> base, 2L -> r2))
    assert(r2 > base) // sink genuinely accumulated
  }

  test("pageRankFixed is partitioning-invariant (bit-identical ranks)") {
    val edges = (1L to 40L).map(i => (i, (i % 7) + 1)).toDF("src", "dst")
    val a = GraphOps.pageRankFixed(edges.repartition(1), "src", "dst")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = GraphOps.pageRankFixed(edges.repartition(13, col("dst")), "src", "dst")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a === b)
  }

  test("canonicalMembers keeps the best-quality member, id tie-break") {
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("a", "b")
    val feat = Seq((1L, 5L), (2L, 9L), (3L, 9L), (10L, 1L), (11L, 1L))
      .toDF("doc_id", "quality")
    val got = GraphOps.canonicalMembers(pairs, "a", "b", feat, "doc_id", "quality")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getInt(4))))
      .toMap
    // cluster {1,2,3}: quality 9 ties between 2 and 3 → min id 2 kept
    assert(got(2L) === ((1L, 3L, 9L, 1)))
    assert(got(1L) === ((1L, 3L, 5L, 0)))
    assert(got(3L) === ((1L, 3L, 9L, 0)))
    // cluster {10,11}: full quality tie → min id 10 kept
    assert(got(10L) === ((10L, 2L, 1L, 1)))
    assert(got(11L) === ((10L, 2L, 1L, 0)))
  }

  test("canonicalMembers drops nodes with no feature row instead of " +
      "ranking them with an engine-dependent null quality") {
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("a", "b")
    val feat = Seq((1L, 4L), (2L, 7L)).toDF("doc_id", "quality") // 3 missing
    val got = GraphOps.canonicalMembers(pairs, "a", "b", feat, "doc_id", "quality")
      .collect().map(r => r.getLong(0) -> r.getInt(4)).toMap
    assert(got === Map(1L -> 0, 2L -> 1)) // 3 absent; 2 wins among ranked
  }

  test("triangleCounts: one triangle plus a pendant edge") {
    val pairs = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("a", "b")
    val got = GraphOps.triangleCounts(pairs, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 0L))
  }

  test("triangleCounts: K4 gives every node 3 triangles; duplicate and " +
      "reversed input pairs do not double-count") {
    val k4 = for {
      i <- 1L to 4L; j <- 1L to 4L if i != j // both orientations + dups
    } yield (i, j)
    val got = GraphOps.triangleCounts(k4.toDF("a", "b"), "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("triangleCounts finds the triangle when the closing edge's degree " +
      "orientation disagrees with the wedge tips' id order") {
    // {1,2,3} a triangle, plus pendants on 2 so deg(2)=4 > deg(3)=2:
    // apex 1 emits the wedge (2, 3) in id order, but the closing edge
    // orients 3→2 — a close that demands exactly b→c counts zero here
    // (the bug the first formulation and its oracle shared, each
    // undercounting sf0.01 by half).
    val pairs = Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 10L), (2L, 11L))
      .toDF("a", "b")
    val got = GraphOps.triangleCounts(pairs, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 0L, 11L -> 0L))
  }

  test("bfsDistances: path graph hops from one seed, -1 beyond the cap") {
    // 1-2-3-4-5 path, seed 1, maxHops 2: 4 and 5 unreached.
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("a", "b")
    val seeds = Seq(1L).toDF("s")
    val got = GraphOps.bfsDistances(pairs, "a", "b", seeds, "s", 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> -1L, 5L -> -1L))
  }

  test("bfsDistances: multiple seeds take the minimum hop; a seed absent " +
      "from the graph is ignored") {
    // path 1-2-3-4-5 with seeds {1, 5, 99}: node 3 is 2 hops from both.
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("a", "b")
    val seeds = Seq(1L, 5L, 99L).toDF("s")
    val got = GraphOps.bfsDistances(pairs, "a", "b", seeds, "s", 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 1L, 5L -> 0L))
    assert(!got.contains(99L))
  }

  test("bfsDistances stops early on an exhausted frontier and labels a " +
      "disconnected component -1 (reversed/duplicate edges welcome)") {
    val pairs = Seq((1L, 2L), (2L, 1L), (1L, 2L), (7L, 8L)).toDF("a", "b")
    val seeds = Seq(2L).toDF("s")
    val got = GraphOps.bfsDistances(pairs, "a", "b", seeds, "s", 50)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 0L, 7L -> -1L, 8L -> -1L))
  }

  test("bfsDistances with no surviving seeds returns every node at -1") {
    val pairs = Seq((1L, 2L)).toDF("a", "b")
    val seeds = Seq(42L).toDF("s")
    val got = GraphOps.bfsDistances(pairs, "a", "b", seeds, "s", 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> -1L, 2L -> -1L))
  }

  test("triangleCounts: a 4-cycle is triangle-free (wedges exist, none close)") {
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)).toDF("a", "b")
    val got = GraphOps.triangleCounts(pairs, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 0L))
  }

  // -------------------------------------------------------- k-core

  /** K4 on nodes 1-4 plus a chain 4-5-6: the peel-vs-one-shot fixture. */
  private def k4chain =
    Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L), (5L, 6L)).toDF("a", "b")

  test("kCore: removal cascades (a one-shot degree filter would keep " +
      "the chain node the peel removes)") {
    // degrees: 1,2,3→3; 4→4; 5→2; 6→1. k=2 one-shot would keep 5
    // (degree 2) — but removing 6 drops 5 to degree 1, so the 2-core
    // is exactly K4. core_degree inside K4 is 3 everywhere.
    val got = GraphOps.kCore(k4chain, "a", "b", 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("kCore: k above the degeneracy unravels the whole graph to an " +
      "empty (correct) core") {
    assert(GraphOps.kCore(k4chain, "a", "b", 4).isEmpty)
  }

  test("kCore: k=1 keeps every non-isolated node with its full degree") {
    val got = GraphOps.kCore(k4chain, "a", "b", 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 4L,
      5L -> 2L, 6L -> 1L))
  }

  test("kCore THROWS when the peel cannot converge within maxRounds " +
      "(the oracle-unroll contract must fail loudly)") {
    // a path 1-2-3-...-8 under k=2 peels one node per round from each
    // end: needs 4 rounds to fully unravel; cap at 2 must throw
    val path = (1L to 7L).map(i => (i, i + 1)).toDF("a", "b")
    val e = intercept[IllegalStateException] {
      GraphOps.kCore(path, "a", "b", 2, maxRounds = 2).collect()
    }
    assert(e.getMessage.contains("did not converge"))
    // and the same peel converges (to empty) with an adequate budget
    assert(GraphOps.kCore(path, "a", "b", 2, maxRounds = 10).isEmpty)
  }

  test("hitsFixed: authorities ranked by hub mass, hubs by authority " +
      "mass; the L-inf renormalization pins each top score at HitsScale") {
    // 1->10, 2->10, 3->10, 3->11: node 10 out-authorities 11 (three
    // pointers vs one); node 3 out-hubs 1/2 (points at both sinks)
    val e = Seq((1L, 10L), (2L, 10L), (3L, 10L), (3L, 11L))
      .toDF("src", "dst")
    val got = GraphOps.hitsFixed(e, "src", "dst").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got(3L)._1 === GraphOps.HitsScale)
    assert(got(1L)._1 === got(2L)._1 &&
      got(1L)._1 < got(3L)._1 && got(1L)._1 > 0)
    assert(got(10L)._2 === GraphOps.HitsScale)
    assert(got(11L)._2 < got(10L)._2 && got(11L)._2 > 0)
    // bipartite edges: pure sources carry no authority, pure sinks no
    // hub mass
    assert(Seq(1L, 2L, 3L).forall(got(_)._2 == 0L))
    assert(Seq(10L, 11L).forall(got(_)._1 == 0L))
  }

  test("adamicAdar: a shared niche affiliation outweighs nothing but " +
      "two commodity ones don't lose to it; degree-1 parts contribute " +
      "nothing; the cap drops quadratic hubs; exact lattice weights") {
    import spark.implicits._
    import graft.functions.FixedLog
    // part 100: suppliers {1,2} (deg 2, niche)
    // parts 200,201: suppliers {1,3,4} (deg 3, commodity-ish)
    // part 300: supplier {5} alone (deg 1 -> no pair, no weight)
    // part 400: suppliers 1..10 (hub, deg 10 -> dropped at cap 5)
    val edges = (Seq((1L, 100L), (2L, 100L)) ++
      Seq(1L, 3L, 4L).flatMap(u => Seq((u, 200L), (u, 201L))) ++
      Seq((5L, 300L)) ++
      (1L to 10L).map(u => (u, 400L))).toDF("u", "p")
    val got = GraphOps.adamicAdar(edges, "u", "p", topK = 10, degCap = 5L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    val w2 = (1L << 40) / FixedLog.log2q20(2L) // = 1 << 20 exactly
    val w3 = (1L << 40) / FixedLog.log2q20(3L)
    assert(w2 === (1L << 20))
    assert(got((1L, 2L)) === ((1L, w2)))
    assert(got((1L, 3L)) === ((2L, 2 * w3)))
    assert(got((3L, 4L)) === ((2L, 2 * w3)))
    // two commodity parts outweigh one niche part (2/log3 > 1/log2)
    assert(2 * w3 > w2)
    // the hub part is capped out: pairs existing ONLY via part 400
    // (e.g. suppliers 6,7) never appear, and no pair counts it
    assert(!got.contains((6L, 7L)))
    assert(got((1L, 4L))._1 === 2L) // 200,201 only — not 400
    // supplier 5 (degree-1 part only) pairs with no one
    assert(!got.keys.exists(k => k._1 == 5L || k._2 == 5L))
  }
}
