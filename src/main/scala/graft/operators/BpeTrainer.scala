package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * BPE merge-rule training as a declarative driver loop — the iterative
 * fixed-point family (GraphOps.pageRankFixed, VectorSearch
 * .trainCentroids) applied to the tokenizer-training step of an LLM
 * data pipeline. Each round: count adjacent token pairs over the
 * weighted vocabulary, pick the argmax pair (deterministic tie-break:
 * weight desc, pair asc), rewrite the vocabulary with the merge, and
 * record the rule — textbook Sennrich et al. 2016 BPE over a word
 * vocabulary.
 *
 * Representation trick shared with the oracle: a word's token sequence
 * is ONE delimited string `|t1||t2||t3|` — every token carries its own
 * `|` on both sides, so the greedy-leftmost non-overlapping merge of
 * pair (p,q) is exactly `regexp_replace(s, '\|p\|\|q\|', '|pq|')`
 * scanning left to right ([[applyMerge]], which regex-quotes the
 * tokens so any non-structural character is safe). No lookahead needed
 * (DuckDB's RE2 has none), and Java regex and RE2 agree on replace-all
 * semantics. The two structural characters ('|', ' ') are excluded
 * from the vocabulary by [[vocab]].
 *
 * Scale shape: the vocabulary is a capped top-K word table (BPE trains
 * on vocab+counts, not the corpus — the ONE heavy corpus scan is the
 * word count that builds it). Each round shuffles only (pair, weight)
 * rows; the argmax is a 1-row driver decision per round, same as the
 * PageRank convergence probe. Rounds are inherently sequential — that
 * is BPE, not a Spark limitation.
 */
object BpeTrainer {

  /** Build the weighted vocabulary in delimited-token form from a word
    * stream: top `vocabSize` (count desc, word asc) for a bounded,
    * deterministic training set.
    *
    * Words containing the two STRUCTURAL characters are dropped here —
    * '|' delimits tokens inside `s` and ' ' separates the two tokens of
    * a rule's "p q" encoding, so either would corrupt the
    * representation no amount of regex escaping can fix. Every other
    * character is safe: [[train]] regex-quotes the tokens it
    * interpolates. */
  def vocab(words: DataFrame, wordCol: String, vocabSize: Int): DataFrame =
    words
      .filter(!(col(wordCol).contains("|") || col(wordCol).contains(" ")))
      .groupBy(col(wordCol).as("word"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("word"))
      .limit(vocabSize)
      .select(
        concat(lit("|"),
          array_join(expr(s"filter(split(word, ''), c -> c <> '')"), "||"),
          lit("|")).as("s"),
        col("cnt"))

  /** One merge round: weighted adjacent-pair counts over the delimited
    * vocabulary. Returns (pair "p q", weight).
    *
    * Entries whose word has FULLY merged into one token are filtered out
    * before the pair transform: a 1-token word has no adjacent pairs —
    * and mechanically, Spark's `sequence(1, 0)` is the DESCENDING
    * [1, 0] (unlike DuckDB's `range(1, 1)` = empty), so the unguarded
    * transform would hit `element_at(t, 0)` and throw. The filter gives
    * exactly the oracle's empty-range contribution. */
  def pairCounts(v: DataFrame): DataFrame =
    v.select(col("cnt"),
        expr("""split(substring(s, 2, length(s) - 2), '\\|\\|')""").as("t"))
      .where(size(col("t")) >= 2)
      .select(col("cnt"), explode(expr(
        """transform(sequence(1, size(t) - 1),
           i -> concat(element_at(t, i), ' ', element_at(t, i + 1)))"""))
        .as("pair"))
      .groupBy("pair").agg(sum("cnt").as("weight"))

  /** Truncate the rewrite lineage every this many merge rounds: round k
    * otherwise re-applies all k regex layers over the cached vocab
    * (O(nMerges²) expression work) and the plan tree deepens with every
    * rule. `localCheckpoint(eager = true)` pins the ≤`vocabSize`-row
    * rewritten vocab and resets the lineage to a leaf — the same
    * discipline as the connected-components loop (GraphOps) — so a
    * production 30k-merge vocabulary trains at O(nMerges) regex
    * applications with constant plan depth. */
  val CheckpointEvery = 20

  /**
   * Train `nMerges` rules. Returns (step, pair, weight) for each chosen
   * rule (step 1..nMerges) plus, at step nMerges+1, the `topKAfter`
   * strongest remaining pairs — the post-training pair table a gate can
   * hash. Empty-pair rounds stop early.
   */
  def train(spark: SparkSession, words: DataFrame, wordCol: String,
      vocabSize: Int, nMerges: Int, topKAfter: Int): DataFrame = {
    import spark.implicits._
    // cache the vocab base: every round's action re-derives its lineage,
    // and without the pin the corpus-scale word count would re-run once
    // per merge round; cached, rounds re-apply only their regex layers
    // over `vocabSize` rows
    val base = vocab(words, wordCol, vocabSize).cache()
    var v = base
    var rules = List.empty[(Int, String, Long)]
    var step = 1
    var exhausted = false
    while (step <= nMerges && !exhausted) {
      val top = pairCounts(v)
        .orderBy(col("weight").desc, col("pair")).limit(1)
        .collect()
      if (top.isEmpty) exhausted = true
      else {
        val pair = top.head.getString(0)
        val weight = top.head.getLong(1)
        rules ::= ((step, pair, weight))
        v = v.select(applyMerge(col("s"), pair).as("s"), col("cnt"))
        if (step % CheckpointEvery == 0) v = v.localCheckpoint(true)
      }
      step += 1
    }
    // materialize the post-training pair table while the cache is live,
    // then RELEASE it — the result is pure driver data (≤ nMerges +
    // topKAfter rows), so repeated train() calls leak no cached copies
    val after = pairCounts(v)
      .orderBy(col("weight").desc, col("pair")).limit(topKAfter)
      .collect().map(r => (nMerges + 1, r.getString(0), r.getLong(1)))
    base.unpersist()
    (rules.reverse ++ after).toDF("step", "pair", "weight")
  }

  /** Greedy-leftmost non-overlapping application of ONE merge rule
    * ("p q") to a delimited-token string column — the single
    * `regexp_replace` the representation trick buys. Tokens are
    * regex-QUOTED into the pattern and the replacement is quoted too
    * ('$'/'\' are group references in Java replacements), so any
    * non-structural character trains correctly; '|' and ' ' never
    * reach here ([[vocab]] drops them). Encoders replaying trained
    * rules ([[readRules]] consumers, q91) apply rules through this
    * same expression. */
  def applyMerge(s: Column, pair: String): Column = {
    val Array(p, q) = pair.split(" ", 2)
    regexp_replace(s,
      lit("\\|" + java.util.regex.Pattern.quote(p) + "\\|\\|" +
        java.util.regex.Pattern.quote(q) + "\\|"),
      lit(java.util.regex.Matcher.quoteReplacement("|" + p + q + "|")))
  }

  /** Land the trained merge rules as a MODEL ARTIFACT — the (step, pair,
    * weight) table is the tokenizer file production ships to a model
    * store. Training is the expensive step (a corpus-scale word count
    * plus `nMerges` sequential rounds); encoding is a pure columnar
    * replace chain — so the rules are trained ONCE and every encode
    * consumer reads the stored copy via [[readRules]], the same
    * discipline as the landed shingle index and the materialized PQ
    * codebook. Rows at step ≤ nMerges are the rules in training order;
    * step nMerges+1 is the post-training pair table. */
  def landRules(spark: SparkSession, words: DataFrame, wordCol: String,
      vocabSize: Int, nMerges: Int, topKAfter: Int, dir: String): Unit =
    train(spark, words, wordCol, vocabSize, nMerges, topKAfter)
      .write.mode("overwrite").parquet(dir)

  def readRules(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir)
}
