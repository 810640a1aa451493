package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Edit-distance similarity join via POSITION-ANNOTATED deletion
 * neighborhoods (FastSS — Bocek et al. 2007, public algorithm): two
 * strings are within edit distance 1 iff they agree on a deletion
 * variant in one of three position-constrained ways:
 *
 *  - substitution/equality: deleting the SAME position i from both
 *    yields equal strings ⇔ they differ at most at position i;
 *  - insertion: the whole left string equals a single-deletion variant
 *    of the right (left is the shorter);
 *  - deletion: symmetric.
 *
 * Keeping the deletion position in the join key is the difference
 * between a candidate set and the answer: position-blind variant
 * equality admits distance-2 pairs whose DIFFERENT deletions collide
 * ("ax"/"ya" both yield "a"), and on dense key-like corpora (zero-padded
 * numeric ids: every 8-digit variant regrows into ~90 existing ids)
 * those false candidates dominate — measured 15 s at sf0.1 vs ~1 s for
 * the position-annotated form. With positions, EVERY candidate is a
 * true ed ≤ 1 pair, so the final `levenshtein` is a belt-and-braces
 * assert, not a rerank.
 *
 * Scale shape: n+1 variant rows per string (linear); three equality
 * hash joins whose bucket widths are bounded by the alphabet (same-
 * position variants differ only at that position), never by corpus
 * size; only the duplicate arms of repeated-character indels
 * ("aab" → "ab" two ways) reach the final pair-level distinct.
 */
object StringSimilarity {

  /**
   * Unordered pairs (idA < idB) of rows whose `str` values are within
   * edit distance 1. Output: (id_a, id_b, str_a, str_b, dist).
   */
  def editDistanceOnePairs(df: DataFrame, id: String, str: String): DataFrame = {
    // pos 0 = the string itself; pos i >= 1 deletes character i.
    // positions explode FIRST (a cheap int-array Generate) and the
    // variant is an ordinary substring/concat projection — a
    // `transform` lambda building the variant array is CodegenFallback
    // and evicts the whole projection from codegen (verify-skill note),
    // measured ~2× on this operator's generate stage
    val variants = df.select(col(id).as("__sid"), col(str).as("__s"))
      .select(col("__sid"), col("__s"),
        explode(expr("sequence(0, length(__s))")).as("__pos"))
      .select(col("__sid"), col("__s"), col("__pos"),
        when(col("__pos") === 0, col("__s"))
          .otherwise(concat(
            expr("substring(__s, 1, __pos - 1)"),
            expr("substring(__s, __pos + 1, length(__s))")))
          .as("__variant"))
    def side(suffix: String) = variants.select(
      col("__sid").as(s"id_$suffix"), col("__s").as(s"str_$suffix"),
      col("__pos").as(s"__pos_$suffix"), col("__variant").as(s"__v_$suffix"))
    val a = side("a")
    val b = side("b")
    // substitution / equality: same deletion position, equal remainder —
    // the one genuine variant self-join (n+1 rows per string both sides)
    val subs = a.join(b,
      col("__v_a") === col("__v_b") && col("__pos_a") === col("__pos_b") &&
        col("id_a") < col("id_b"))
      .select("id_a", "id_b", "str_a", "str_b")
    // indel: the pos-0 side's variant IS its whole string, so these arms
    // join the |rows|-sized STRINGS table (broadcastable) against the
    // deletion variants — no second shuffle+sort of the variant table
    // (the three-way variant self-join formulation paid six of them)
    val strings = df.select(col(id).as("__wid"), col(str).as("__wstr"))
    val dels = variants.filter(col("__pos") >= 1)
      .select(col("__sid").as("__did"), col("__s").as("__dstr"),
        col("__variant").as("__dv"))
    val insL = strings.join(dels,
        col("__wstr") === col("__dv") && col("__wid") < col("__did"))
      .select(col("__wid").as("id_a"), col("__did").as("id_b"),
        col("__wstr").as("str_a"), col("__dstr").as("str_b"))
    val insR = strings.join(dels,
        col("__wstr") === col("__dv") && col("__did") < col("__wid"))
      .select(col("__did").as("id_a"), col("__wid").as("id_b"),
        col("__dstr").as("str_a"), col("__wstr").as("str_b"))
    subs.unionByName(insL).unionByName(insR)
      // dedup the multi-arm hits (equal strings match at every shared
      // position; repeated-char indels match per duplicate deletion)
      .distinct()
      .withColumn("dist", levenshtein(col("str_a"), col("str_b")))
      .filter(col("dist") <= 1)
  }

  /**
   * Blocked record linkage: match two tables WITHOUT a shared key —
   * the entity-resolution step behind customer-file merges and
   * cross-source corpus provenance. Candidates come from a BLOCKING
   * equi-join (records can only match inside a shared block — the
   * classic linkage scale guard: candidate count is Σ block_a·block_b,
   * never |A|·|B|), the caller's field-agreement expression scores each
   * candidate in exact integer points, sub-threshold pairs drop, and
   * one left-keyed window keeps each left record's best match
   * (score desc, right id asc — a total order, so "best" is a function
   * of the data).
   *
   * The score expression is caller-supplied on purpose: linkage quality
   * IS the scoring model (name distance, numeric closeness, category
   * agreement, each weighted); the operator owns the shape — blocking,
   * thresholding, best-match selection — that stays the same across
   * models.
   */
  def blockedLinkage(left: DataFrame, right: DataFrame,
      leftId: String, rightId: String, blockCol: String,
      score: Column, minScore: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(leftId))
      .orderBy(col("score").desc, col(rightId))
    left.join(right, blockCol)
      .withColumn("score", score)
      .filter(col("score") >= minScore)
      .withColumn("match_rank", row_number().over(w).cast("long"))
      .filter(col("match_rank") === 1)
      .drop("match_rank")
  }
}
