package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/**
 * Corpus indexing and lexical relevance scoring — the retrieval side of
 * a training-data pipeline (dedup finds what to drop; retrieval finds
 * what to KEEP for a topic mix, and BM25 is the standard lexical
 * ranker). The reference has no search surface at all; this is part of
 * the beyond-the-reference LLM-pipeline inventory (SURVEY §2.3).
 *
 * Tokenization is the engine-wide cross-engine contract (q60): ASCII
 * letter runs (`split('[^A-Za-z]+')`), `lower()` applied AFTER the
 * split, terms shorter than `minTermLen` dropped — identical under Java
 * regex and RE2.
 *
 * All scoring is FIXED-POINT (milli-units on longs): BM25's idf and
 * length normalization are rationals of corpus counts, so evaluating
 * them as scaled integer multiply/divides makes the score bit-identical
 * across engines and partitionings — same determinism discipline as the
 * k-means trainer and the fixed-point PageRank. The classic
 * `ln`-smoothed idf is deliberately replaced by its rational core
 * (N - df + 1) / (df + 1): monotone-equivalent for ranking within a
 * fixed corpus, and exactly reproducible (cross-engine `ln` of a double
 * is a last-ulp lottery).
 */
object Relevance {

  /** Fixed-point scale: scores/ratios carried in milli-units. */
  val Milli = 1000L

  /** BM25 k1 = 1.2 and b = 0.75, in milli-units. */
  val K1Milli = 1200L
  val BMilli = 750L

  val DefaultMinTermLen = 3

  /** Token stream (docId, term) — one Generate feeding map-side-combined
    * aggregates downstream; document bodies never leave the scan. */
  def tokenStream(docs: DataFrame, idCol: String, textCol: String,
      minTermLen: Int = DefaultMinTermLen): DataFrame =
    docs
      .select(col(idCol).as("doc_id"),
        explode(split(col(textCol), "[^A-Za-z]+")).as("raw"))
      .filter(length(col("raw")) >= minTermLen)
      .select(col("doc_id"), lower(col("raw")).as("term"))

  /**
   * Inverted index: one row per term with document frequency, total term
   * frequency, and a CAPPED sorted posting sample (first `postingCap`
   * doc ids). The cap is the scale guard — a full posting list for a
   * stopword-ish term is O(corpus) in one row; real indexes shard
   * postings, and the capped sample is the per-shard row this engine
   * would store. Everything is two map-side-combined aggregates; only
   * (term, doc_id, count) rows shuffle.
   */
  def invertedIndex(docs: DataFrame, idCol: String, textCol: String,
      postingCap: Int = 8, minDf: Long = 2): DataFrame =
    tokenStream(docs, idCol, textCol)
      .groupBy("term", "doc_id").agg(count(lit(1)).as("tf"))
      .groupBy("term")
      .agg(
        count(lit(1)).as("df"),
        sum(col("tf")).as("tf_total"),
        slice(array_sort(collect_list(col("doc_id"))), 1, postingCap)
          .as("posting_sample"))
      .filter(col("df") >= minDf)

  /**
   * Fixed-point BM25 top-k per query term.
   *
   * Per (term, doc): idf_m = (Milli·(N − df + 1)) div (df + 1);
   * norm_m = 250 + (BMilli·dl·Milli) div (avgdl_m·Milli/Milli) with
   * avgdl_m = (Milli·Σdl) div N; tf component in milli:
   * tfc_m = (tf·(Milli+K1) ·Milli) div (tf·Milli + (K1·norm_m) div Milli);
   * score_m = (idf_m · tfc_m) div Milli. Positive integers throughout —
   * Spark `div` (truncate) and DuckDB `//` (floor) agree.
   *
   * Plan shape: doc lengths and per-(term,doc) tf are map-side-combined
   * aggregates over the token Generate; the query-term filter is pushed
   * INTO the tf aggregation (only matching terms survive the first
   * shuffle); corpus constants (N, avgdl) ride a 1-row cross join the
   * optimizer broadcasts; top-k per term is a ranked window
   * (WindowGroupLimit partial top-k before the shuffle).
   */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], k: Int = 10): DataFrame = {
    val toks = tokenStream(docs, idCol, textCol)
    val docLen = toks.groupBy("doc_id").agg(count(lit(1)).as("dl"))
    val corpus = docLen.agg(
      count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
    val tf = toks
      .filter(col("term").isin(queryTerms: _*))
      .groupBy("term", "doc_id").agg(count(lit(1)).as("tf"))
    val df_ = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val scored = tf
      .join(docLen, "doc_id")
      .join(df_, "term")
      .crossJoin(broadcast(corpus))
      .withColumn("avgdl_m", expr(s"($Milli * sum_dl) div n_docs"))
      .withColumn("idf_m",
        expr(s"($Milli * (n_docs - df + 1)) div (df + 1)"))
      .withColumn("norm_m",
        expr(s"${Milli - BMilli} + ($BMilli * dl * $Milli) div avgdl_m"))
      .withColumn("tfc_m",
        expr(s"(tf * ${Milli + K1Milli} * $Milli) div " +
          s"(tf * $Milli + ($K1Milli * norm_m) div $Milli)"))
      .withColumn("score_m", expr(s"(idf_m * tfc_m) div $Milli"))
    val w = Window.partitionBy("term")
      .orderBy(col("score_m").desc, col("doc_id"))
    scored
      .withColumn("rnk", row_number().over(w).cast(LongType))
      .filter(col("rnk") <= k)
      .select(col("term"), col("doc_id"), col("tf"), col("df"),
        col("score_m"), col("rnk"))
  }
}
