package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

class MergeOpsSpec extends SparkSuite {
  import spark.implicits._

  private def target =
    Seq((1L, "alice", 10.0), (2L, "bob", 20.0), (3L, "carol", 30.0))
      .toDF("id", "name", "bal")

  test("replaceUpsert: source wins on collision, both sides' exclusives survive") {
    val source = Seq((2L, "bob2", 99.0), (4L, "dan", 5.0))
      .toDF("id", "name", "bal")
    val out = MergeOps.replaceUpsert(target, source, Seq("id"))
      .orderBy("id").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L, 4L))
    assert(out(1).getString(1) == "bob2" && out(1).getDouble(2) == 99.0)
    assert(out(3).getString(1) == "dan")
    assert(out(0).getString(1) == "alice")
  }

  test("mergeUpsert: matched update, source-only insert, target-only untouched") {
    val source = Seq((2L, 7.5), (4L, 1.5)).toDF("id", "delta")
    val out = MergeOps.mergeUpsert(
      target, source, Seq("id"),
      onMatch = Map("bal" -> (col("t.bal") + col("s.delta"))),
      onInsert = Map("name" -> lit("NEW"), "bal" -> col("s.delta")),
      outputCols = Seq("id", "name", "bal"))
      .orderBy("id").collect()
    assert(out.map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq ==
      Seq((1L, "alice", 10.0), (2L, "bob", 27.5), (3L, "carol", 30.0),
        (4L, "NEW", 1.5)))
  }

  test("mergeUpsert is idempotent for an empty source") {
    val source = Seq.empty[(Long, Double)].toDF("id", "delta")
    val out = MergeOps.mergeUpsert(
      target, source, Seq("id"),
      onMatch = Map("bal" -> (col("t.bal") + col("s.delta"))),
      onInsert = Map("name" -> lit("NEW"), "bal" -> col("s.delta")),
      outputCols = Seq("id", "name", "bal"))
      .orderBy("id").collect()
    assert(out.map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq ==
      Seq((1L, "alice", 10.0), (2L, "bob", 20.0), (3L, "carol", 30.0)))
  }

  test("scd2Merge: change closes + opens, no-op delta keeps one row, " +
      "insert opens, untouched survives") {
    // deltas: id=1 real change (bal 10→15), id=2 recomputes the SAME
    // value (must NOT version), id=4 is new
    val delta = Seq((1L, 15.0), (2L, 20.0), (4L, 5.0)).toDF("id", "nbal")
    val out = MergeOps.scd2Merge(
      target, delta, Seq("id"),
      tracked = Map("bal" -> col("s.nbal")),
      onInsert = Map("name" -> lit("NEW"), "bal" -> col("s.nbal")),
      outputCols = Seq("id", "name", "bal"),
      currentFrom = lit("2024-01-01"), effDate = "2024-06-01")
      .orderBy("id", "valid_from")
      .select("id", "name", "bal", "valid_from", "valid_to", "is_current")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2),
        r.getString(3), r.getString(4), r.getBoolean(5)))
      .toSeq
    assert(out == Seq(
      (1L, "alice", 10.0, "2024-01-01", "2024-06-01", false),
      (1L, "alice", 15.0, "2024-06-01", "9999-12-31", true),
      (2L, "bob", 20.0, "2024-01-01", "9999-12-31", true),
      (3L, "carol", 30.0, "2024-01-01", "9999-12-31", true),
      (4L, "NEW", 5.0, "2024-06-01", "9999-12-31", true)))
  }

  test("scd2Merge: exactly one current row per key, never zero") {
    val delta = Seq((1L, 15.0), (4L, 5.0)).toDF("id", "nbal")
    val hist = MergeOps.scd2Merge(
      target, delta, Seq("id"),
      tracked = Map("bal" -> col("s.nbal")),
      onInsert = Map("name" -> lit("NEW"), "bal" -> col("s.nbal")),
      outputCols = Seq("id", "name", "bal"),
      currentFrom = lit("2024-01-01"), effDate = "2024-06-01")
    val perKey = hist.groupBy("id")
      .agg(sum(when(col("is_current"), 1).otherwise(0)).as("open"))
      .collect()
    assert(perKey.forall(_.getLong(1) == 1L),
      perKey.map(r => (r.getLong(0), r.getLong(1))).mkString(","))
  }

  test("mergeAggStates: merge of split states equals the unsplit aggregate") {
    val rows = (1L to 100L).map(i => (i % 7, i)).toDF("k", "v")
    def st(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("k").agg(count(lit(1)).as("n"), sum("v").as("s"))
    val direct = st(rows).orderBy("k").collect().toSeq
    val merged = MergeOps.mergeAggStates(
      st(rows.filter(col("v") <= 40)), st(rows.filter(col("v") > 40)),
      Seq("k")).orderBy("k").collect().toSeq
    assert(merged.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))) ==
      direct.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))))
  }

  test("mergeAggStates: keys exclusive to one state pass through with " +
      "the other side as zero") {
    val a = Seq((1L, 2L, 10L)).toDF("k", "n", "s")
    val b = Seq((2L, 3L, 30L)).toDF("k", "n", "s")
    val out = MergeOps.mergeAggStates(a, b, Seq("k")).orderBy("k")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out == Seq((1L, 2L, 10L), (2L, 3L, 30L)))
  }

  test("snapshotDiff: classifies added/removed/changed and DROPS " +
      "unchanged keys") {
    val old = Seq((1L, 10.0, "A"), (2L, 20.0, "B"), (3L, 30.0, "C"))
      .toDF("k", "bal", "seg")
    val nw = Seq((1L, 10.0, "A"), (2L, 25.0, "B"), (4L, 40.0, "D"))
      .toDF("k", "bal", "seg")
    val out = MergeOps.snapshotDiff(old, nw, Seq("k"), Seq("bal", "seg"))
      .orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(out == Seq((2L, "changed"), (3L, "removed"), (4L, "added")))
  }

  test("snapshotDiff: column compare is null-safe — null→value and " +
      "value→null are changes, null→null is not") {
    val old = Seq((1L, Option.empty[String]), (2L, Option("x")),
      (3L, Option.empty[String])).toDF("k", "seg")
    val nw = Seq((1L, Option("y")), (2L, Option.empty[String]),
      (3L, Option.empty[String])).toDF("k", "seg")
    val out = MergeOps.snapshotDiff(old, nw, Seq("k"), Seq("seg"))
      .orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(out == Seq((1L, "changed"), (2L, "changed")))
  }

  test("snapshotDiff: emits old_/new_ values with the departed side null") {
    val old = Seq((1L, 10.0)).toDF("k", "bal")
    val nw = Seq((2L, 20.0)).toDF("k", "bal")
    val rows = MergeOps.snapshotDiff(old, nw, Seq("k"), Seq("bal"))
      .orderBy("k").collect()
    assert(rows(0).getString(1) == "removed" &&
      rows(0).getDouble(2) == 10.0 && rows(0).isNullAt(3))
    assert(rows(1).getString(1) == "added" &&
      rows(1).isNullAt(2) && rows(1).getDouble(3) == 20.0)
  }

  test("snapshotDiff: an identical snapshot diffs to zero rows") {
    val snap = Seq((1L, 10.0, "A"), (2L, 20.0, "B")).toDF("k", "bal", "seg")
    assert(MergeOps.snapshotDiff(snap, snap, Seq("k"), Seq("bal", "seg"))
      .count() == 0L)
  }

  test("snapshotDiff: a NULL-keyed row present in only one snapshot " +
      "classifies removed/added, not changed (presence is a marker, " +
      "not key nullness)") {
    val old = Seq((Option(1L), "A"), (Option.empty[Long], "GONE"))
      .toDF("k", "seg")
    val nw = Seq((Option(1L), "A"), (Option.empty[Long], "HERE"))
      .toDF("k", "seg")
    // the null key exists on BOTH sides here and its seg changed
    val both = MergeOps.snapshotDiff(old, nw, Seq("k"), Seq("seg")).collect()
    assert(both.length == 1 && both(0).getString(1) == "changed")
    // now only in old: must be 'removed', never 'changed'
    val onlyOld = MergeOps.snapshotDiff(
      old, nw.filter(col("k").isNotNull), Seq("k"), Seq("seg")).collect()
    assert(onlyOld.length == 1 && onlyOld(0).getString(1) == "removed",
      onlyOld.mkString(","))
    // and only in new: 'added'
    val onlyNew = MergeOps.snapshotDiff(
      old.filter(col("k").isNotNull), nw, Seq("k"), Seq("seg")).collect()
    assert(onlyNew.length == 1 && onlyNew(0).getString(1) == "added",
      onlyNew.mkString(","))
  }

  test("histogramState merge is lossless and grouping-independent: any " +
      "partition axis yields the same merged state as one global pass") {
    val rows = (1L to 500L).map(i => (i % 7, (i * 13L) % 1000L))
    val df = rows.toDF("day", "v")
    def state(part: org.apache.spark.sql.Column) =
      MergeOps.mergeHistogramStates(
        MergeOps.histogramState(df, part, col("v"), 0L, 100L, 8))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val byDay = state(col("day"))
    val byParity = state(col("v") % 2)
    val global = state(lit(0L))
    assert(byDay === global)
    assert(byParity === global)
    // clamped-edge rule: values ≥ 700 land in bucket 7
    val wantTop = rows.count(_._2 >= 700L).toLong
    assert(byDay(7L) === wantTop)
  }

  test("quantilesFromState: ceil-rank target and floor interpolation " +
      "on a hand state, p100 answers from the last bucket") {
    // buckets 0..2 with n = 10, 30, 10 (N=50), lo=0 width=100
    val merged = Seq((0L, 10L), (1L, 30L), (2L, 10L)).toDF("bucket", "n")
    val out = MergeOps.quantilesFromState(merged, Seq(50, 90, 100), 0L, 100L)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // p50: target 25, bucket 1 (cum 40), est 100 + (25-10)*100/30 = 150
    // p90: target 45, bucket 2 (cum 50), est 200 + (45-40)*100/10 = 250
    // p100: target 50, last bucket, est 200 + 10*100/10 = 300
    assert(out == Map(50L -> ((150L, 50L)), 90L -> ((250L, 50L)),
      100L -> ((300L, 50L))))
  }

  test("ewmaSmooth walks the trunc-div dyadic lattice exactly (driver " +
      "reference), seeds with the first value, deviation null on seed") {
    val rows = for (k <- 1L to 4L; i <- 1L to 30L)
      yield (k, i, i, (k * 31L + i * 97L) % 500L)
    val df = rows.toDF("k", "t", "id", "x")
    val got = TemporalOps.ewmaSmooth(df, "k", "t", "id", "x")
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(4), if (r.isNullAt(5)) None else Some(r.getLong(5))))
      .toMap
    for (k <- 1L to 4L) {
      var e = 0L
      for (i <- 1L to 30L) {
        val x = (k * 31L + i * 97L) % 500L
        val dev = if (i == 1L) None else Some(x - e)
        e = if (i == 1L) x else (e + x) / 2
        assert(got((k, i)) == ((e, dev)), s"k=$k i=$i")
      }
    }
  }

  test("ewmaSmooth is partitioning-independent and emits every input " +
      "row exactly once") {
    val df = (1L to 120L).map(i => (i % 5, i, i, i * 3L))
      .toDF("k", "t", "id", "x")
    def run(d: org.apache.spark.sql.DataFrame) =
      TemporalOps.ewmaSmooth(d, "k", "t", "id", "x").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(4))).toSeq.sorted
    val a = run(df.repartition(9))
    assert(a == run(df.coalesce(1)))
    assert(a.length == 120)
  }

  // ------------------------------------------------- changelog apply

  private def clBase = Seq(
    (1L, 10L, "x"), (2L, 20L, "y"), (3L, 30L, "z"), (4L, 40L, "w"))
    .toDF("id", "bal", "seg")

  test("applyChangelog: later seq wins, same-seq U/D race resolves to " +
      "the delete, inserts land, untouched base rows carry through") {
    val log = Seq(
      (1L, 1L, "U", 11L, "x"),  // overridden by seq 2 below
      (1L, 2L, "U", 12L, "x2"),
      (2L, 1L, "D", 0L, ""),    // delete
      (3L, 1L, "U", 33L, "z"),  // same-seq race: ...
      (3L, 1L, "D", 0L, ""),    // ... delete must win
      (9L, 1L, "U", 90L, "new") // base-absent insert
    ).toDF("id", "seq", "op", "bal", "seg")
    val got = MergeOps.applyChangelog(clBase, log, Seq("id"), "seq", "op",
        Seq("bal", "seg"))
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getString(3))).toSeq
    assert(got == Seq(
      (1L, 12L, "x2", "U"),
      (4L, 40L, "w", "B"),
      (9L, 90L, "new", "U")))
  }

  test("applyChangelog round-trips with snapshotDiff: diffing base vs " +
      "applied re-derives exactly the net changes") {
    val log = Seq(
      (1L, 1L, "U", 99L, "x"),
      (2L, 1L, "D", 0L, ""),
      (9L, 1L, "U", 90L, "new")).toDF("id", "seq", "op", "bal", "seg")
    val applied = MergeOps.applyChangelog(clBase, log, Seq("id"), "seq",
      "op", Seq("bal", "seg")).drop("provenance")
    val diff = MergeOps.snapshotDiff(clBase, applied, Seq("id"),
        Seq("bal", "seg"))
      .select("id", "change").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(diff == Map(1L -> "changed", 2L -> "removed", 9L -> "added"))
  }

  // -------------------------------------------------- bitemporal as-of

  /** key 1: base v@10 recorded t10 (price 100), correction of v@10
    * recorded t15 (price 101), repricing v@20 recorded t10 (price 200). */
  private def btVersions = Seq(
    (1L, 10L, 10L, 100L, 0L),
    (1L, 10L, 15L, 101L, 1L),
    (1L, 20L, 10L, 200L, 2L)).toDF("k", "vf", "tf", "price", "tie")

  test("bitemporalAsOf: the belief filter runs BEFORE validity closure " +
      "— yesterday's report reads yesterday's price, today's reads the " +
      "correction, and the repricing takes over on its valid date") {
    def at(validT: Long, txT: Long): Option[Long] = {
      val r = MergeOps.bitemporalAsOf(btVersions, "k", "vf", "tf", "tie",
        validT, txT).collect()
      assert(r.length <= 1)
      r.headOption.map(_.getAs[Long]("price"))
    }
    assert(at(12L, 12L) == Some(100L)) // correction not yet recorded
    assert(at(12L, 15L) == Some(101L)) // correction believed, replaces base
    assert(at(25L, 15L) == Some(200L)) // repricing valid, correction moot
    assert(at(25L, 12L) == Some(200L)) // repricing was known upfront
    assert(at(5L, 15L) == None)        // nothing valid yet: absent
    assert(at(12L, 5L) == None)        // nothing believed yet: absent
  }

  test("bitemporalAsOf: same-instant replayed corrections resolve by " +
      "the tie column (last writer), deterministically") {
    val dup = Seq((1L, 10L, 10L, 100L, 0L), (1L, 10L, 10L, 999L, 1L))
      .toDF("k", "vf", "tf", "price", "tie")
    val r = MergeOps.bitemporalAsOf(dup, "k", "vf", "tf", "tie", 10L, 10L)
      .collect()
    assert(r.length == 1 && r(0).getAs[Long]("price") == 999L)
  }

  // ------------------------------------------------ join-view delta

  test("joinViewDelta satisfies the IVM law: old view + delta == the " +
      "view recomputed on the grown relations, with correct provenance") {
    val baseA = Seq((1L, "a1"), (2L, "a2")).toDF("k", "pa")
    val deltaA = Seq((2L, "a2new"), (3L, "a3")).toDF("k", "pa")
    val baseB = Seq((1L, "b1"), (3L, "b3")).toDF("k", "pb")
    val deltaB = Seq((2L, "b2")).toDF("k", "pb")
    val delta = MergeOps.joinViewDelta(baseA, deltaA, baseB, deltaB,
      Seq("k"))
    val got = delta.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3))).toSet
    assert(got == Set(
      (3L, "a3", "b3", "dA_B"),       // new order meets old dim
      (2L, "a2", "b2", "A_dB"),       // old order meets new dim
      (2L, "a2new", "b2", "dA_dB")))  // both new — the term naive
                                      // ΔA⋈B ∪ A⋈ΔB silently drops
    // the law itself:
    val oldView = baseA.join(baseB, Seq("k"))
    val newView = baseA.union(deltaA).join(baseB.union(deltaB), Seq("k"))
    val reassembled = oldView.union(delta.drop("provenance"))
    assert(reassembled.exceptAll(newView).isEmpty &&
      newView.exceptAll(reassembled).isEmpty,
      "old ∪ delta must equal the recomputed view as a multiset")
  }
}
