package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Batch MERGE / upsert semantics as a declarative operator.
 *
 * The reference's only "merge" is the idempotent INSERT
 * (QueueWriter.java:45-48 `ON CONFLICT DO NOTHING` — insert-if-absent,
 * never update). A warehouse engine needs the full MERGE surface: update
 * matched rows, keep unmatched target rows, insert source-only rows
 * (SCD type-1). Both variants here stay fully declarative — one join,
 * no driver-side row handling — so Catalyst plans them as ordinary
 * shuffled (or broadcast) hash joins.
 *
 * Scale shape (100 TB target): the expensive side is the standing
 * target; the source (the day's delta) is usually orders of magnitude
 * smaller. Both variants shuffle only on the merge key, and AQE turns
 * the join broadcast-side when the delta fits; with the target
 * bucketed/partitioned by the key (BatchSinks bucketed landing) the
 * target side needs no exchange at all. A file-format with upsert
 * support (Delta/Iceberg) would add file-level pruning of untouched
 * partitions on top — the logical plan below is exactly what those
 * formats compile MERGE into.
 */
object MergeOps {

  /**
   * Whole-row SCD1 replace: source rows win on key collision, unmatched
   * target rows survive, source-only keys insert. Source must carry the
   * target's schema. One left-anti join (key columns only move for the
   * probe side) + a union — cheaper than a full outer join when the
   * update touches every column anyway.
   */
  def replaceUpsert(target: DataFrame, source: DataFrame,
      key: Seq[String]): DataFrame =
    source.unionByName(
      target.join(source.select(key.map(col): _*).distinct(), key, "left_anti"))

  /**
   * Column-level MERGE: full outer join on the key, then per-column
   * resolution — matched rows take `onMatch` expressions (which may read
   * both sides), target-only rows keep their columns, source-only rows
   * build from `onInsert`. The caller references sides as `t.<col>` /
   * `s.<col>`.
   *
   * `outputCols` fixes the output column order; for each name the
   * resolver picks (in priority): matched-update, insert-value, or the
   * surviving side's column.
   */
  def mergeUpsert(
      target: DataFrame,
      source: DataFrame,
      key: Seq[String],
      onMatch: Map[String, Column],
      onInsert: Map[String, Column],
      outputCols: Seq[String]): DataFrame = {
    val t = target.as("t")
    val s = source.as("s")
    require(key.nonEmpty, "merge requires at least one key column")
    val cond = key.map(k => col(s"t.$k") <=> col(s"s.$k")).reduce(_ && _)
    val joined = t.join(s, cond, "full_outer")
    val tPresent = key.map(k => col(s"t.$k").isNotNull).reduce(_ && _)
    val sPresent = key.map(k => col(s"s.$k").isNotNull).reduce(_ && _)
    val targetCols = target.columns.toSet
    val out = outputCols.map { c =>
      val keyCol = if (key.contains(c))
        coalesce(col(s"t.$c"), col(s"s.$c"))
      else if (targetCols.contains(c)) col(s"t.$c")
      else lit(null)
      val matched = onMatch.getOrElse(c, keyCol)
      val inserted = onInsert.getOrElse(c, keyCol)
      when(tPresent && sPresent, matched)
        .when(sPresent && !tPresent, inserted)
        .otherwise(keyCol)
        .as(c)
    }
    joined.select(out: _*)
  }

  /**
   * SCD type-2 MERGE: apply a delta to a current-rows dimension, keeping
   * HISTORY — a changed key closes its old version (`valid_to` =
   * `effDate`, no longer current) and opens a new one; an unchanged or
   * untouched key keeps its open row; a source-only key inserts a new
   * open row built from `onInsert`.
   *
   * `tracked` gives the new value expression per versioned column
   * (reading `t.<col>` / `s.<col>`); a row is "changed" iff any tracked
   * column's new value differs (null-safe) from the current one — a
   * delta that recomputes the same value does NOT spawn a version.
   *
   * Plan shape: ONE full-outer hash join on the key (AQE broadcasts the
   * delta side when it fits), then each joined row explodes into its
   * 1-or-2 output versions through a generated array — the
   * old-row/new-row pair never requires a second pass over the
   * dimension, which is the difference between this and the
   * union-of-three-selects formulation that scans a 100 TB dimension
   * twice. Dates travel as ISO strings: they are version labels, not
   * arithmetic operands, and strings dodge cross-engine date-type drift.
   */
  def scd2Merge(
      target: DataFrame,
      source: DataFrame,
      key: Seq[String],
      tracked: Map[String, Column],
      onInsert: Map[String, Column],
      outputCols: Seq[String],
      currentFrom: Column,
      effDate: String,
      highDate: String = "9999-12-31"): DataFrame = {
    val t = target.as("t")
    val s = source.as("s")
    require(key.nonEmpty, "merge requires at least one key column")
    val cond = key.map(k => col(s"t.$k") <=> col(s"s.$k")).reduce(_ && _)
    val joined = t.join(s, cond, "full_outer")
    val tPresent = key.map(k => col(s"t.$k").isNotNull).reduce(_ && _)
    val sPresent = key.map(k => col(s"s.$k").isNotNull).reduce(_ && _)
    val changed = tPresent && sPresent &&
      tracked.map { case (c, v) => !(col(s"t.$c") <=> v) }.reduce(_ || _)

    def attr(c: String, newVal: Boolean): Column =
      if (key.contains(c)) coalesce(col(s"t.$c"), col(s"s.$c"))
      else if (!newVal) col(s"t.$c")
      else if (tracked.contains(c))
        // matched-new takes the tracked expression; insert takes onInsert
        when(tPresent, tracked(c)).otherwise(onInsert.getOrElse(c, lit(null)))
      else when(tPresent, col(s"t.$c")).otherwise(onInsert.getOrElse(c, lit(null)))

    // version 1: the EXISTING row — emitted whenever the target side is
    // present; closed iff the delta changed it
    val oldRow = struct(
      (outputCols.map(c => attr(c, newVal = false).as(c)) ++ Seq(
        currentFrom.as("valid_from"),
        when(changed, lit(effDate)).otherwise(lit(highDate)).as("valid_to"),
        (!changed).as("is_current"),
        tPresent.as("keep"))): _*)
    // version 2: the NEW row — emitted on change or insert, always open
    val newRow = struct(
      (outputCols.map(c => attr(c, newVal = true).as(c)) ++ Seq(
        lit(effDate).as("valid_from"),
        lit(highDate).as("valid_to"),
        lit(true).as("is_current"),
        (changed || (sPresent && !tPresent)).as("keep"))): _*)

    joined
      .select(explode(array(oldRow, newRow)).as("r"))
      .filter(col("r.keep"))
      .select((outputCols ++ Seq("valid_from", "valid_to", "is_current"))
        .map(c => col(s"r.$c")): _*)
  }

  /**
   * Incremental-view-maintenance merge of two partial aggregation
   * states over the same keys: every non-key column is a distributive
   * measure (count/sum) combined by null-as-zero addition. With a
   * standing state table and a daily delta this replaces the 100 TB
   * full recompute with a |state| + |delta| join — the core IVM move.
   * AnalyticsQueries q81 hash-gates `merge(agg(old), agg(delta)) ==
   * agg(all)` against the oracle computing the right-hand side.
   */
  def mergeAggStates(a: DataFrame, b: DataFrame, key: Seq[String]): DataFrame = {
    require(a.columns.sameElements(b.columns),
      s"state schemas differ: ${a.columns.mkString(",")} vs ${b.columns.mkString(",")}")
    val measures = a.columns.filterNot(key.contains)
    val t = a.as("t")
    val s = b.as("s")
    require(key.nonEmpty, "merge requires at least one key column")
    val cond = key.map(k => col(s"t.$k") <=> col(s"s.$k")).reduce(_ && _)
    t.join(s, cond, "full_outer").select(
      key.map(k => coalesce(col(s"t.$k"), col(s"s.$k")).as(k)) ++
        measures.map(m =>
          (coalesce(col(s"t.$m"), lit(0L)) + coalesce(col(s"s.$m"), lit(0L))).as(m)): _*)
  }

  /**
   * Mergeable histogram STATE — the quantile counterpart of
   * [[mergeAggStates]]'s count/sum IVM: per ingest partition (a day, a
   * file batch) land fixed-geometry bucket counts; states combine by
   * bucket-wise addition (associative + commutative, so ANY merge tree
   * — daily rollups, cross-cluster unions — yields the identical
   * state); quantiles then read off the merged state at delta cost,
   * never re-scanning history. Geometry (lo/width/buckets) is the
   * contract: states merge iff they share it, same as HLL lgK in
   * [[graft.operators.SketchOps]]. Buckets clamp at the edges
   * (StatsOps.histogram's rule), so the state absorbs outliers without
   * growing.
   */
  def histogramState(df: DataFrame, part: Column, value: Column,
      lo: Long, width: Long, buckets: Int): DataFrame = {
    require(width > 0 && buckets > 0)
    val raw = TemporalOps.floorDiv(value - lo, lit(width))
    val b = least(greatest(raw, lit(0L)), lit(buckets - 1L))
    df.select(part.as("part"), b.as("bucket"))
      .groupBy("part", "bucket")
      .agg(count(lit(1)).as("n"))
  }

  /** ⊕ for [[histogramState]]: drop the partition axis, add by bucket. */
  def mergeHistogramStates(state: DataFrame): DataFrame =
    state.groupBy("bucket").agg(sum("n").as("n"))

  /**
   * Quantile estimates from a merged histogram state. The estimator is
   * a DEFINED integer statistic (the q104/q120 discipline — exact
   * cross-engine, no float interpolation lottery): for percentile q,
   * target rank = ⌈q·N/100⌉ (integer ceil), the answering bucket is
   * the first with cum ≥ target, and the estimate interpolates
   * linearly inside it: lo + bucket·width + ⌊(target − cum_before)·
   * width / n_bucket⌋. Resolution is one bucket width — the honest
   * precision of the sketch, stated rather than hidden.
   *
   * The window and the percentile probe run on the MERGED state
   * (≤ buckets rows) — the global-order window and the tiny
   * percentile×bucket cross join never touch data.
   */
  def quantilesFromState(merged: DataFrame, qsPct: Seq[Int],
      lo: Long, width: Long): DataFrame = {
    require(qsPct.nonEmpty && qsPct.forall(q => q > 0 && q <= 100))
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = merged
      .withColumn("cum", sum("n").over(w))
      .withColumn("total", sum("n").over(Window.partitionBy()))
    val spark = merged.sparkSession
    import spark.implicits._
    val qdf = qsPct.map(_.toLong).toDF("q_pct")
    qdf.crossJoin(cum)
      .withColumn("target", expr("(q_pct * total + 99) div 100"))
      .filter(col("cum") >= col("target") &&
        col("cum") - col("n") < col("target"))
      .select(col("q_pct"),
        (lit(lo) + col("bucket") * lit(width) +
          expr(s"((target - (cum - n)) * $width) div n")).as("estimate"),
        col("total").as("n_rows"))
  }

  /**
   * Snapshot DIFF: classify every key across two table versions as
   * `added` (new-only), `removed` (old-only) or `changed` (present in
   * both with some compared column differing, null-safe) — unchanged
   * keys are DROPPED, so the output is proportional to the churn, not
   * to the table. The inverse of MERGE: where merge applies a delta,
   * diff RECOVERS the delta from two snapshots — the change-data-capture
   * primitive for stores that only land full snapshots.
   *
   * Emits the key plus `old_<c>` / `new_<c>` for each compared column.
   *
   * Plan shape: both sides project to key ++ compared columns BEFORE the
   * join, so only the narrow comparison rows shuffle — a 100 TB-wide
   * snapshot diff moves its key and tracked columns, never whole rows.
   * One full-outer hash join on the key; with both snapshots
   * bucketed/partitioned by the key (BatchSinks landing) neither side
   * needs an exchange at all.
   */
  def snapshotDiff(oldSnap: DataFrame, newSnap: DataFrame,
      key: Seq[String], compare: Seq[String]): DataFrame = {
    require(key.nonEmpty, "diff requires at least one key column")
    // presence rides an explicit marker, NOT key nullness: the join is
    // null-safe, so a legitimately null-keyed row present in only one
    // snapshot must still classify added/removed (key-nullness presence
    // would misread the missing side as "present" and emit 'changed')
    val narrow = (df: DataFrame, mark: String) => df.select(
      (key ++ compare).map(col) :+ lit(1).as(mark): _*)
    val t = narrow(oldSnap, "__t_present").as("t")
    val s = narrow(newSnap, "__s_present").as("s")
    val cond = key.map(k => col(s"t.$k") <=> col(s"s.$k")).reduce(_ && _)
    val tPresent = col("t.__t_present").isNotNull
    val sPresent = col("s.__s_present").isNotNull
    val differs = compare.map(c => !(col(s"t.$c") <=> col(s"s.$c")))
      .reduceOption(_ || _).getOrElse(lit(false))
    t.join(s, cond, "full_outer")
      .withColumn("change",
        when(tPresent && !sPresent, lit("removed"))
          .when(sPresent && !tPresent, lit("added"))
          .when(differs, lit("changed")))
      .filter(col("change").isNotNull)
      .select(key.map(k => coalesce(col(s"t.$k"), col(s"s.$k")).as(k)) ++
        Seq(col("change")) ++
        compare.flatMap(c => Seq(
          col(s"t.$c").as(s"old_$c"), col(s"s.$c").as(s"new_$c"))): _*)
  }

  /**
   * Apply a CDC changelog (upserts + delete tombstones) to a base
   * snapshot — the batch half of the snapshot-maintenance loop whose
   * producing half is [[snapshotDiff]] / the CdcStream twin: replaying a
   * day of Debezium-style events onto yesterday's table. Last-writer-
   * wins per key by (seq, op): ONE per-key window keeps only the newest
   * change row, then a single full-outer join against the base resolves
   *   newest op = delete  → row gone (tombstone wins over base),
   *   newest op = upsert  → changelog values win (insert if base-absent),
   *   no change for key   → base row carried through.
   *
   * Shape: the window and the join hash on the same key, so AQE reuses
   * one Exchange on the changelog side; the base never shuffles wider
   * than key ++ payload. Output is exactly the new snapshot — applying
   * snapshotDiff(base, applyChangelog(base, log)) re-derives the net log
   * (the round-trip CdcApplySpec asserts).
   *
   * `log` carries (key, seqCol, opCol ∈ {'U','D'}, payload cols); later
   * seq wins; an equal-seq race resolves by op ascending ('D' < 'U', so
   * the DELETE ranks first and wins — deterministic, and the
   * conservative choice for retention pipelines: a delete never
   * resurrects).
   */
  def applyChangelog(base: DataFrame, log: DataFrame, key: Seq[String],
      seqCol: String, opCol: String, payload: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(key.nonEmpty, "changelog apply requires at least one key column")
    val w = Window.partitionBy(key.map(col): _*)
      .orderBy(col(seqCol).desc, col(opCol).asc)
    val latest = log
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select((key ++ Seq(opCol) ++ payload).map(col) :+
        lit(1).as("__c_present"): _*)
      .as("c")
    val b = base.select((key ++ payload).map(col) :+
      lit(1).as("__b_present"): _*).as("b")
    val cond = key.map(k => col(s"b.$k") <=> col(s"c.$k")).reduce(_ && _)
    val cPresent = col("c.__c_present").isNotNull
    b.join(latest, cond, "full_outer")
      .filter(!cPresent || col(s"c.$opCol") =!= "D")
      .select(key.map(k => coalesce(col(s"c.$k"), col(s"b.$k")).as(k)) ++
        payload.map(c => when(cPresent, col(s"c.$c"))
          .otherwise(col(s"b.$c")).as(c)) :+
        when(cPresent, col(s"c.$opCol")).otherwise(lit("B")).as("provenance"):
        _*)
  }

  /**
   * Bitemporal as-of lookup — the two-axis generalization of the SCD2
   * point-in-time read (q88 answers "what was valid at T"; this answers
   * "what did we BELIEVE at transaction time T_tx was valid at T_valid"
   * — the reproducibility question every restated-history warehouse
   * and every as-of-training-cutoff feature store must answer, and the
   * one a single-axis dimension CANNOT: a late correction rewrites
   * valid history, and reading yesterday's report requires yesterday's
   * belief, not today's).
   *
   * Input: version rows (key, validFrom, txFrom, payload...) — each row
   * asserts "from validFrom onward, the payload is X" and was recorded
   * at txFrom. Semantics, evaluated in exactly this order:
   *  1. belief filter: keep rows with txFrom ≤ txT (later corrections
   *     don't exist yet);
   *  2. per (key, validFrom): the latest surviving assertion wins —
   *     one (txFrom desc, tie) window;
   *  3. valid-time resolve: close each version at the NEXT validFrom
   *     (lead over the believed set — closure must be computed AFTER
   *     the belief filter: a correction can insert a validity boundary
   *     yesterday's belief didn't have);
   *  4. keep the row covering validT (validFrom ≤ validT < next).
   *
   * Both windows share the one key-hash partitioning; output ≤ one row
   * per key. Keys with no believed version covering validT are
   * honestly absent. tieCol completes the (txFrom) order so replayed
   * same-instant corrections resolve deterministically (last writer by
   * tie).
   */
  /**
   * Incremental JOIN-view maintenance (insert-only deltas) — the join
   * half of the IVM story (q81 maintains aggregates, q129 quantile
   * states; a materialized JOIN view is the third thing a warehouse
   * refreshes incrementally): given base relations A, B and
   * append-only deltas ΔA, ΔB, the view delta is EXACTLY
   *
   *   Δ(A ⋈ B) = ΔA ⋈ B  ∪  A ⋈ ΔB  ∪  ΔA ⋈ ΔB
   *
   * — three joins each proportional to a DELTA side, never a
   * recompute of A ⋈ B (the whole point at 100 TB: the base relations
   * are only ever probed, and when deltas are small both probes are
   * broadcast). Each output row carries which term produced it
   * (`provenance` ∈ dA_B / A_dB / dA_dB) — the diagnostic that
   * explains a surprising refresh. Inputs carry (key, payload)
   * projections; multiset semantics are the caller's contract (unique
   * keys per side ⇒ unique output rows — the fixture's case).
   *
   * The correctness law (spec + oracle): old view ∪ this delta ≡ the
   * view recomputed on (A ∪ ΔA) ⋈ (B ∪ ΔB).
   */
  def joinViewDelta(baseA: DataFrame, deltaA: DataFrame,
      baseB: DataFrame, deltaB: DataFrame,
      keys: Seq[String]): DataFrame = {
    def tag(df: DataFrame, p: String) =
      df.withColumn("provenance", lit(p))
    tag(deltaA.join(baseB, keys), "dA_B")
      .unionByName(tag(baseA.join(deltaB, keys), "A_dB"))
      .unionByName(tag(deltaA.join(deltaB, keys), "dA_dB"))
  }

  def bitemporalAsOf(df: DataFrame, keyCol: String, validFromCol: String,
      txFromCol: String, tieCol: String, validT: Long,
      txT: Long): DataFrame = {
    val byVersion = Window.partitionBy(col(keyCol), col(validFromCol))
      .orderBy(col(txFromCol).desc, col(tieCol).desc)
    val byKey = Window.partitionBy(col(keyCol))
      .orderBy(col(validFromCol))
    df.filter(col(txFromCol) <= txT)
      .withColumn("__rn", row_number().over(byVersion))
      .filter(col("__rn") === 1)
      .drop("__rn")
      .withColumn("__valid_to", lead(col(validFromCol), 1).over(byKey))
      .filter(col(validFromCol) <= validT &&
        (col("__valid_to").isNull || col("__valid_to") > validT))
      .drop("__valid_to")
  }
}
