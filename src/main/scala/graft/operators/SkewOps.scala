package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

/**
 * Skew mitigation for equi-joins — the manual fallback when AQE's runtime
 * skew-join splitting (`spark.sql.adaptive.skewJoin.*`) cannot apply
 * (e.g. a build side too large to split, or a deliberately static plan).
 *
 * A hot key floods one shuffle partition with all of its rows; salting
 * splits that key's probe rows across `salts` sub-partitions and
 * replicates the build side once per salt, so the hot partition's work
 * fans out `salts`-ways. The result set is EXACTLY the plain join's —
 * the salt participates only in routing — which is what lets the q42
 * oracle gate this against an unsalted SQL join.
 *
 * Cost model: build side inflates ×`salts` (shuffle + memory), probe side
 * is unchanged. Worth it only when one key's row count ≫ the average —
 * size `salts` ≈ hot-key rows ÷ target partition rows.
 *
 * DECISION RULE vs AQE (`spark.sql.adaptive.skewJoin.*`, the zero-code
 * path a real cluster tries FIRST — SkewOpsSpec runs both on the same
 * synthesized hot key): AQE splits a skewed shuffle partition into
 * mapper-range chunks at runtime and handles even a single monster key
 * with no build-side inflation, so PREFER IT when it applies. Salting
 * remains the tool when AQE's skew split cannot fire:
 *  - STREAMING plans (AQE is disabled for stateful streaming queries;
 *    a skewed stream-stream or stream-static shuffle needs the manual
 *    operator);
 *  - AGGREGATE skew (AQE's skew optimization is join-only; a hot
 *    groupBy key needs two-phase salted aggregation);
 *  - plans that must stay STATIC (a downstream operator relies on the
 *    exact output partitioning, or `skewJoin` is off fleet-wide);
 *  - a skewed BUILD side too large to replicate per split chunk, where
 *    sizing `salts` by the hot key's row count is the finer control.
 */
object SkewOps {

  /**
   * Inner equi-join on `key` with `salts`-way salting of the left (probe)
   * side. The per-row salt only needs to spread rows of the SAME key —
   * and it must be DETERMINISTIC per row, never positional
   * (`monotonically_increasing_id` assigns by in-partition position, so
   * a fetch-failure retry that recomputes a map task over reordered
   * input re-salts rows differently than the reducers that already
   * fetched the first attempt's output — the SPARK-23207
   * indeterminate-shuffle class: rows joined twice or dropped). A hash
   * of the full row spreads every hot key whose rows differ anywhere;
   * EXACT duplicate rows share a salt, which only forfeits spread, not
   * correctness (and identical-row floods are dedup's job upstream).
   */
  /** THE routing salt — deterministic full-row hash mod `salts`,
    * shared by [[saltedJoin]] and [[saltedAggregate]] and exposed so
    * the spec asserts spread on the operator's OWN routing (an
    * assertion against a re-derived salt proves nothing if the
    * formulas drift). */
  private[graft] def rowSalt(df: DataFrame,
      salts: Int): org.apache.spark.sql.Column =
    pmod(hash(df.columns.map(col): _*), lit(salts)).cast(IntegerType)

  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      salts: Int): DataFrame = {
    require(salts > 0, s"salts must be positive, got $salts")
    val l = left.withColumn("__salt", rowSalt(left, salts))
    val r = right.withColumn("__salt",
      explode(typedlit((0 until salts).toArray)))
    l.join(r, Seq(key, "__salt")).drop("__salt")
  }

  /**
   * Two-phase salted AGGREGATION for a skewed groupBy key — the
   * aggregate-side counterpart of [[saltedJoin]] (the decision rule
   * above: AQE's skew optimization is join-only).
   *
   * When it pays: NOT for algebraic aggregates (sum/count/min/max) —
   * their map-side partial aggregation already shrinks a hot key to one
   * row per map task, and salting would only add a shuffle. It pays for
   * BUFFERING aggregates (collect_set/collect_list, percentile-style
   * TypedImperativeAggregate): their partials are as large as the data,
   * so every hot-key buffer converges on ONE reducer for the final
   * merge. Salting splits that merge `salts` ways — phase 1 merges
   * per (key, salt) in parallel, phase 2 merges `salts`
   * already-reduced buffers per key.
   *
   * `partial` aggregates run per (key, salt); `merge` aggregates run
   * per key over phase-1's output and must be the matching combine
   * functions (e.g. collect_set → flatten + array_distinct). The salt
   * never reaches the output, so results are exactly the unsalted
   * aggregation's — which is what lets q54 oracle-gate this against
   * plain GROUP BY SQL.
   */
  def saltedAggregate(df: DataFrame, key: String, salts: Int,
      partial: Seq[org.apache.spark.sql.Column],
      merge: Seq[org.apache.spark.sql.Column]): DataFrame = {
    require(salts > 0, s"salts must be positive, got $salts")
    require(partial.nonEmpty && merge.nonEmpty, "need aggregates for both phases")
    // deterministic full-row hash salt, same rationale as saltedJoin
    df.withColumn("__salt", rowSalt(df, salts))
      .groupBy(col(key), col("__salt"))
      .agg(partial.head, partial.tail: _*)
      .groupBy(col(key))
      .agg(merge.head, merge.tail: _*)
  }

  /**
   * Skew-safe EXACT distinct count per key via salted set union — the
   * canonical buffering-aggregate instance of [[saltedAggregate]]:
   * phase 1 builds `salts` bounded-size distinct sets per hot key in
   * parallel, phase 2 unions `salts` deduplicated sets instead of
   * merging every raw row on one reducer. (HLL sketches are the
   * approximate alternative; this is the exact path.)
   */
  def saltedDistinctCount(df: DataFrame, key: String, valueCol: String,
      salts: Int): DataFrame = {
    import org.apache.spark.sql.types.LongType
    saltedAggregate(df, key, salts,
      partial = Seq(collect_set(col(valueCol)).as("__partial_set")),
      merge = Seq(size(array_distinct(flatten(collect_list(col("__partial_set")))))
        .cast(LongType).as("n_distinct")))
  }

  /**
   * Key-skew profile: the counts-of-counts diagnostic that DECIDES
   * whether the salting above (or AQE's skew split) is needed at all —
   * per power-of-two frequency band, how many keys live there and how
   * many rows they carry. A healthy key reads as one tight band; a
   * monster key shows up as a lone populated high band whose
   * `total_rows` rivals the whole table (and whose band index ≈
   * log2(hot rows / target partition rows) sizes the salt count).
   *
   * The band is `floor(log2(count))` computed EXACTLY as
   * `length(bin(count)) − 1` — binary-string length, no float log, so
   * the profile is bit-deterministic cross-engine.
   *
   * Scale shape: two map-side-combined aggregates — (key → count),
   * shuffling only key+count, then (band → stats) over |keys| rows.
   * This is the profile a pipeline materializes about its OWN join keys
   * before choosing a strategy; at 100 TB it costs one narrow pass.
   */
  def keySkewProfile(df: DataFrame, key: String): DataFrame = {
    import org.apache.spark.sql.types.LongType
    // internal count is __-prefixed (the file's convention): a key
    // column literally named "cnt" must not collide with it
    df.groupBy(col(key)).agg(count(lit(1)).as("__cnt"))
      .withColumn("band", (length(expr("bin(__cnt)")) - 1).cast(LongType))
      .groupBy("band")
      .agg(
        count(lit(1)).as("n_keys"),
        sum(col("__cnt")).as("total_rows"),
        min(col("__cnt")).as("min_cnt"),
        max(col("__cnt")).as("max_cnt"))
  }
}
