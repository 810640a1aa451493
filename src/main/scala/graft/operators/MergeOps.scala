package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
}
