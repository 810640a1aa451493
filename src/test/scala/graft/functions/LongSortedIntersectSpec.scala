package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** The native sorted-merge intersect must equal `array_intersect` on its
  * contracted inputs (sorted ascending, distinct, null-free elements),
  * under BOTH evaluation modes (whole-stage codegen on → doGenCode; off
  * → nullSafeEval) — the same dual-mode pin as DoubleDotProductSpec. */
class LongSortedIntersectSpec extends SparkSuite {
  import spark.implicits._

  /** Randomized sorted-distinct long arrays from a seeded generator —
    * the exact shape the triangle closure feeds (sort_array over
    * collect_list of longs). */
  private def frames = {
    val rnd = new scala.util.Random(20260819L)
    val rows = (1 to 2000).map { i =>
      def arr() = Seq.fill(rnd.nextInt(40))(rnd.nextInt(60).toLong)
        .distinct.sorted
      (i.toLong, arr(), arr())
    }
    rows.toDF("id", "a", "b")
      // collect_list products carry containsNull = false; the literal
      // Seq encoder says true — re-assert the real element nullability
      .select(col("id"),
        col("a").cast("array<long>").as("a"),
        col("b").cast("array<long>").as("b"))
      .select(col("id"),
        when(col("a").isNotNull, col("a")).otherwise(col("a")).as("a"),
        col("b"))
  }

  test("equals array_intersect on sorted-distinct frames, codegen and interpreted") {
    // build through the SAME path as the call site so element
    // nullability is containsNull = false: aggregate + sort_array
    val base = frames
      .select(col("id"), explode(col("a")).as("x"), col("b"))
    val aAgg = base.groupBy(col("id"), col("b"))
      .agg(sort_array(collect_list(col("x"))).as("a"))
      .select(col("id"), col("a"),
        sort_array(col("b").cast("array<long>")).as("bs"))
      .select(col("id"), col("a"),
        // rebuild b with containsNull=false through the agg too
        col("bs"))
      .select(col("id"), explode(col("bs")).as("y"), col("a"))
      .groupBy(col("id"), col("a"))
      .agg(sort_array(collect_list(col("y"))).as("b"))
    for (codegen <- Seq("true", "false")) {
      spark.conf.set("spark.sql.codegen.wholeStage", codegen)
      try {
        val diff = aAgg.select(
          LongSortedIntersect.sortedIntersect(col("a"), col("b")).as("native"),
          array_intersect(col("a"), col("b")).as("builtin"))
          .filter(!(col("native") <=> col("builtin")))
          .count()
        assert(diff === 0L, s"mismatch under codegen=$codegen")
      } finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
    }
  }

  test("equals array_intersect on sorted frames WITH duplicates, " +
      "codegen and interpreted (r18 dedup-robust merge)") {
    // ADVICE r17 #1: the merge must dedup equal runs so a future caller
    // passing sorted-but-non-distinct arrays still gets exactly
    // array_intersect's distinct common elements.
    val rnd = new scala.util.Random(20260821L)
    val rows = (1 to 2000).map { i =>
      def arr() = Seq.fill(rnd.nextInt(40) + 1)(rnd.nextInt(20).toLong)
      (i.toLong, arr(), arr())
    }
    val raw = rows.toDF("id", "a", "b")
    // route through aggregation so elements carry containsNull = false;
    // NO distinct anywhere — duplicates survive into the sorted arrays
    val base = raw
      .select(col("id"), explode(col("a").cast("array<long>")).as("x"),
        col("b"))
    val aAgg = base.groupBy(col("id"), col("b"))
      .agg(sort_array(collect_list(col("x"))).as("a"))
      .select(col("id"), col("a"),
        explode(col("b").cast("array<long>")).as("y"))
      .groupBy(col("id"), col("a"))
      .agg(sort_array(collect_list(col("y"))).as("b"))
    for (codegen <- Seq("true", "false")) {
      spark.conf.set("spark.sql.codegen.wholeStage", codegen)
      try {
        val diff = aAgg.select(
          LongSortedIntersect.sortedIntersect(col("a"), col("b")).as("native"),
          array_intersect(col("a"), col("b")).as("builtin"))
          .filter(!(col("native") <=> col("builtin")))
          .count()
        assert(diff === 0L, s"dup-input mismatch under codegen=$codegen")
      } finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
    }
  }

  test("null array in -> null out, directly exercised in both modes") {
    // ADVICE r17 #2: the old 'null array' row went through
    // posexplode_outer + collect_list, which turns a null array into an
    // EMPTY one — the BinaryExpression null path was never hit. Build a
    // genuinely-null array<long> (containsNull = false) via a when()
    // with no otherwise over an aggregated array.
    val df = Seq((1L, 5L), (2L, 6L)).toDF("id", "x")
      .groupBy(col("id"))
      .agg(sort_array(collect_list(col("x"))).as("arr"))
      .select(col("id"),
        when(col("id") === 1L, col("arr")).as("a"), // null for id = 2
        col("arr").as("b"))
    for (codegen <- Seq("true", "false")) {
      spark.conf.set("spark.sql.codegen.wholeStage", codegen)
      try {
        val got = df.select(col("id"),
          LongSortedIntersect.sortedIntersect(col("a"), col("b")).as("r"))
          .orderBy("id").collect()
        assert(got(0).getSeq[Long](1) === Seq(5L),
          s"non-null row wrong under codegen=$codegen")
        assert(got(1).isNullAt(1),
          s"null array must yield null, not ${got(1).get(1)} " +
            s"(codegen=$codegen)")
      } finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
    }
  }

  test("edge shapes: empty sides, disjoint, identical, null array") {
    val df = Seq(
      (1L, Some(Seq(1L, 3L, 7L)), Some(Seq(3L, 7L, 9L))),  // [3, 7]
      (2L, Some(Seq.empty[Long]), Some(Seq(1L, 2L))),       // []
      (3L, Some(Seq(1L, 2L)), Some(Seq.empty[Long])),       // []
      (4L, Some(Seq(1L, 2L)), Some(Seq(3L, 4L))),           // []
      (5L, Some(Seq(5L, 6L)), Some(Seq(5L, 6L))),           // [5, 6]
      (6L, None, Some(Seq(1L)))                             // null
    ).toDF("id", "a0", "b0")
      .select(col("id"),
        sort_array(col("a0").cast("array<long>")).as("a1"),
        sort_array(col("b0").cast("array<long>")).as("b1"))
      // route through collect-style aggregation to get containsNull=false
      .select(col("id"),
        expr("filter(a1, x -> x is not null)").as("a1"),
        expr("filter(b1, x -> x is not null)").as("b1"))
    // filter() keeps containsNull; cast through the agg path instead
    val viaAgg = df
      .select(col("id"), posexplode_outer(col("a1"))).toDF("id", "p", "x")
      .groupBy(col("id"))
      .agg(sort_array(collect_list(col("x"))).as("a"))
      .join(df
        .select(col("id"), posexplode_outer(col("b1"))).toDF("id", "p", "y")
        .groupBy(col("id"))
        .agg(sort_array(collect_list(col("y"))).as("b")), Seq("id"))
    val got = viaAgg
      .select(col("id"),
        LongSortedIntersect.sortedIntersect(col("a"), col("b")).as("r"))
      .orderBy("id").collect()
    assert(got.map(r => (r.getLong(0), r.getSeq[Long](1))).toSeq === Seq(
      (1L, Seq(3L, 7L)), (2L, Seq()), (3L, Seq()), (4L, Seq()),
      (5L, Seq(5L, 6L)), (6L, Seq())))
  }
}
