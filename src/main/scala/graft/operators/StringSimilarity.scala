package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Edit-distance similarity join via deletion neighborhoods (FastSS —
 * Bocek et al. 2007, public algorithm): two strings are within edit
 * distance 1 iff their deletion neighborhoods (the string itself plus
 * every single-character deletion) intersect. That turns the fuzzy join
 * into an EQUALITY join on neighborhood variants — the same move
 * MinHash makes for Jaccard (TextDedup) and binning makes for interval
 * overlap (IntervalJoin): candidates by hash bucket, exact predicate
 * only on survivors.
 *
 * Scale shape: each string of length n emits n+1 variant rows — linear
 * inflation, shuffled on the variant (a short string). Bucket width is
 * bounded by the alphabet at the varying position (≤ ~100), NOT corpus
 * size; the one corpus that defeats it — massive groups of identical /
 * 1-edit strings — has a quadratic TRUE result, so the blow-up is the
 * answer's size, not the algorithm's overhead. The final
 * `levenshtein ≤ 1` rerank discards the false candidates that share a
 * variant at distance 2 (two different single deletions landing equal).
 */
object StringSimilarity {

  /**
   * Unordered pairs (idA < idB) of rows whose `str` values are within
   * edit distance 1. Output: (id_a, id_b, str_a, str_b, dist).
   */
  def editDistanceOnePairs(df: DataFrame, id: String, str: String): DataFrame = {
    // variant i=0 is the string itself; i in 1..len deletes char i —
    // covers substitution (same position deleted both sides),
    // insertion/deletion (the longer side's deletion equals the
    // shorter side itself) and equality
    val variants = df.select(col(id).as("__sid"), col(str).as("__s"))
      .withColumn("__variant", explode(expr(
        """transform(sequence(0, length(__s)),
           i -> if(i = 0, __s,
                   concat(substring(__s, 1, i - 1), substring(__s, i + 1))))""")))
    val a = variants.select(col("__sid").as("id_a"), col("__s").as("str_a"),
      col("__variant"))
    val b = variants.select(col("__sid").as("id_b"), col("__s").as("str_b"),
      col("__variant").as("__variant_b"))
    a.join(b, col("__variant") === col("__variant_b") &&
        col("id_a") < col("id_b"))
      .select("id_a", "id_b", "str_a", "str_b")
      // a pair can share several variants (e.g. equal strings share all
      // n+1): one distinct on the surviving pairs, orders of magnitude
      // smaller than the variant stream
      .distinct()
      .withColumn("dist", levenshtein(col("str_a"), col("str_b")))
      .filter(col("dist") <= 1)
  }
}
