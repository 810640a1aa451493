package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

class AssociationRulesSpec extends SparkSuite {
  import spark.implicits._

  /** 10 baskets: {a,b} ×4, {a,c} ×2, {a} ×2, {b} ×1, {d,d,b} ×1 —
    * the duplicate d exercises set semantics. Supports: a=8, b=6, c=2,
    * d=1. Pairs: (a,b)=4, (a,c)=2, (b,d)=1. */
  private def baskets = Seq(
    (1L, "a"), (1L, "b"), (2L, "a"), (2L, "b"), (3L, "a"), (3L, "b"),
    (4L, "a"), (4L, "b"), (5L, "a"), (5L, "c"), (6L, "a"), (6L, "c"),
    (7L, "a"), (8L, "a"), (9L, "b"), (10L, "d"), (10L, "d"), (10L, "b"))
    .toDF("basket", "item")

  test("basketRules: supports, directional confidence and lift are " +
      "exact ppm floors; both directions emit") {
    // no pruning (thresholds 0): rules for (a,b), (a,c), (b,d)
    val got = AssociationRules.basketRules(baskets, "basket", "item", 0L, 0L)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6), r.getLong(7), r.getLong(8))).toMap
    // a→b: n_a=8, n_b=6, n_ab=4, N=10: sup=400000, conf=500000,
    // lift = 1e6·4·10/(8·6) = 833333
    assert(got(("a", "b")) == ((8L, 6L, 4L, 10L, 400000L, 500000L, 833333L)))
    // b→a: conf = 1e6·4/6 = 666666, same lift (symmetric)
    assert(got(("b", "a")) == ((6L, 8L, 4L, 10L, 400000L, 666666L, 833333L)))
    // a→c: lift = 1e6·2·10/(8·2) = 1250000 (positive association)
    assert(got(("a", "c")) == ((8L, 2L, 2L, 10L, 200000L, 250000L, 1250000L)))
    // duplicate d in basket 10 counted once: b→d n_both=1, n_d=1
    assert(got(("b", "d")) == ((6L, 1L, 1L, 10L, 100000L, 166666L, 1666666L)))
    assert(got.size == 6)
  }

  test("basketRules: the item prune removes every pair touching a rare " +
      "item BEFORE pairs form (Apriori monotonicity)") {
    // minItemSupPpm 150000 = support ≥ 1.5 baskets: drops d (1);
    // keeps a(8), b(6), c(2)
    val got = AssociationRules
      .basketRules(baskets, "basket", "item", 150000L, 0L)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(("a", "b"), ("b", "a"), ("a", "c"), ("c", "a")))
  }

  test("basketRules: the pair prune is relative to N") {
    // minPairSupPpm 300000 = pair in ≥ 3 of 10 baskets: only (a,b)=4
    val got = AssociationRules
      .basketRules(baskets, "basket", "item", 0L, 300000L)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(("a", "b"), ("b", "a")))
  }

  test("basketRules: single-item baskets produce no rules; empty input " +
      "produces an empty frame, not a division error") {
    val solo = Seq((1L, "a"), (2L, "b")).toDF("basket", "item")
    assert(AssociationRules.basketRules(solo, "basket", "item", 0L, 0L)
      .isEmpty)
    val empty = solo.filter(lit(false))
    assert(AssociationRules.basketRules(empty, "basket", "item", 0L, 0L)
      .isEmpty)
  }
}
