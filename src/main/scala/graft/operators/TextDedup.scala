package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Deduplication operators for large-scale text corpora — the
 * training-data-pipeline extension surface (builder brief / BASELINE.json
 * north star; the reference itself has no analytics operators, SURVEY §2.2).
 *
 * Everything is pure built-in expression composition (md5/conv/transform/
 * array_min/posexplode) — no UDFs — so shingling and signatures run inside
 * whole-stage codegen at scan speed.
 *
 * 100 TB design notes:
 *  - exact dedup shuffles a 16-byte content hash + id, never the document
 *    bodies;
 *  - MinHash/LSH generates candidate pairs by equality-joining banded
 *    signature keys — cost ∝ Σ bucket², never the all-pairs n²; skewed
 *    buckets (boilerplate shingles) are bounded because a band key is r
 *    concatenated minhashes, not one;
 *  - the cross-engine hash (first 60 bits of md5, mod a 31-bit prime) is
 *    chosen because the DuckDB oracle can reproduce it exactly; swap
 *    [[hash64]] for xxhash64 in production for ~4× hash throughput.
 */
object TextDedup {

  /** 31-bit Mersenne prime: (a·h+b) mod P stays in 62 bits — no overflow. */
  val Prime: Long = 2147483647L

  /** Signature length and banding: K = Bands × RowsPerBand. */
  val K = 16
  val Bands = 4
  val RowsPerBand = 4

  /** Default [[minhashCandidatePairs]] skew cap. A named constant because
    * the q23 DuckDB oracle must model the SAME cap (DedupQueries embeds
    * it in a HAVING clause) — if the cap ever trips on a corpus, both
    * engines drop the same buckets instead of silently diverging. */
  val DefaultMaxBandBucket = 1000

  /** Deterministic permutation constants, identical in the DuckDB oracle
    * (DedupQueries generates both sides from this list). */
  val perms: Seq[(Long, Long)] = {
    val rnd = new scala.util.Random(42)
    Seq.fill(K)((1L + rnd.nextInt((Prime - 1).toInt).toLong, rnd.nextInt(Prime.toInt).toLong))
  }

  /** Cross-engine 60-bit content hash (see class doc). */
  def hash64(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast(LongType)

  /** hash64 reduced mod P, the MinHash universe. */
  def hashMod(c: Column): Column = hash64(c) % Prime

  /** Whitespace tokenization, lower-cased. */
  def tokens(text: Column): Column = split(lower(text), "\\s+")

  /** Word n-gram shingles; a document shorter than n tokens contributes its
    * whole token sequence as one shingle (never an empty shingle set, which
    * would make the minhash undefined). */
  def shingles(text: Column, n: Int): Column = {
    val t = tokens(text)
    when(size(t) >= n,
      transform(sequence(lit(1), size(t) - lit(n - 1)),
        i => concat_ws(" ", slice(t, i, lit(n)))))
      .otherwise(array(concat_ws(" ", t)))
  }

  /** Shingle-hash array: one md5 per shingle, reduced into the MinHash
    * universe. Per-row COLUMN form of the signature path — use only for
    * single-column enrichment; the dedup pipeline uses [[signatures]]
    * (aggregate-shaped, codegen'd, inline-proof). Materialize this ONCE
    * per row (its own projection) before fanning out to the K
    * permutations — inlining it into [[signatureFromHashes]]'s K
    * expressions recomputes every md5 K times (measured 16× slowdown at
    * sf0.1). */
  def shingleHashes(text: Column, n: Int = 3): Column =
    transform(shingles(text, n), s => hashMod(s))

  /** MinHash signature from a materialized shingle-hash array: K minima of
    * the permuted hashes — pure arithmetic, no hashing. Must agree
    * value-for-value with [[signatures]] (asserted by spec: two
    * independent implementations of the same definition). */
  def signatureFromHashes(hv: Column): Column =
    array(perms.map { case (a, b) =>
      array_min(transform(hv, h => (lit(a) * h + lit(b)) % Prime))
    }: _*)

  /** Estimated Jaccard from two signatures: fraction of equal components. */
  def signatureSimilarity(sigA: Column, sigB: Column): Column =
    aggregate(
      zip_with(sigA, sigB, (x, y) => when(x === y, 1).otherwise(0)),
      lit(0), (acc, v) => acc + v).cast(DoubleType) / lit(K.toDouble)

  /** Exact word n-gram Jaccard between two texts (set semantics). The
    * intersection appears once as a shared subtree (whole-stage codegen
    * subexpression elimination evaluates it once per row). */
  def ngramJaccard(textA: Column, textB: Column, n: Int = 2): Column = {
    val a = array_distinct(shingles(textA, n))
    val b = array_distinct(shingles(textB, n))
    val inter = size(array_intersect(a, b))
    inter.cast(DoubleType) /
      (size(a) + size(b) - inter).cast(DoubleType)
  }

  /**
   * EXACT set-similarity self-join by prefix filtering (the AllPairs /
   * PPJoin family): every document pair whose word-`shingleN`-gram SETS
   * have Jaccard ≥ `tauPm`/1000 — with a completeness GUARANTEE, unlike
   * the MinHash pipeline ([[minhashCandidatePairs]]) whose banding is
   * probabilistic. The two are complements: minhash scales past exact
   * methods and misses with known probability; this join is the exact
   * verifier a q23-style recall audit runs on a sample.
   *
   * Prefix theorem (the candidate bound): order every gram by global
   * rarity (df asc, gram asc — total). If J(A,B) ≥ τ then
   * |A∩B| ≥ ⌈τ·|A|⌉, so A and B must SHARE a gram among each side's
   * first |s| − ⌈τ·|s|⌉ + 1 rarest grams — pairs are generated from the
   * tiny prefix-postings join, never the full posting lists, and the
   * rarest-first order makes those postings the SHORTEST available.
   * Candidates then pass the size filter (τ·max ≤ min, else J < τ
   * regardless of overlap) before the exact overlap count.
   *
   * All arithmetic integer (ceil via (τpm·s + 999) div 1000, the
   * Jaccard test cross-multiplied), so the pair set is bit-deterministic
   * cross-engine.
   *
   * Scale shape: three keyed shuffles of (gram, doc) rows (global df
   * window; per-doc size+position windows share one exchange; prefix
   * self-join on the gram) + one pair-keyed overlap aggregate. The df
   * window rides the same gram key the join shuffles on. Prefix postings
   * are short BY CONSTRUCTION on a natural-vocabulary corpus; a
   * pathological corpus (every doc the same grams) degrades toward the
   * all-pairs join the theorem can't avoid — J really is ≥ τ everywhere.
   */
  def jaccardPrefixJoin(df: DataFrame, idCol: String, textCol: String,
      tauPm: Long, shingleN: Int = 2): DataFrame = {
    require(tauPm >= 1 && tauPm <= 1000, s"tauPm in [1,1000], got $tauPm")
    import org.apache.spark.sql.expressions.Window
    // r17 OPTIMIZATION (guide §1.2): the tokenize + shingle Generate has
    // THREE consumers (the sizing windows and both exact-rerank join
    // sides) and profiled as three ~1 s stages each re-running the
    // explode; one materialization serves all three.
    // r18 re-adjudication (VERDICT r17 item 1): stash-A/B on a quiet box
    // (tight reps both legs): with checkpoint 1.857 s median vs without
    // 2.100 s — the materialization wins 1.13×; the r17 driver's 0.86×
    // reading was the box-speed confound, not this change.
    val sets = df.select(col(idCol).as("doc_id"),
      explode(array_distinct(shingles(col(textCol), shingleN))).as("g"))
      .localCheckpoint(true)
    val sized = sets
      .withColumn("gdf", count(lit(1)).over(Window.partitionBy("g")))
      .withColumn("ssize", count(lit(1)).over(Window.partitionBy("doc_id")))
      .withColumn("pos", row_number().over(
        Window.partitionBy("doc_id").orderBy(col("gdf"), col("g"))))
    val prefix = sized
      .filter(col("pos") <=
        col("ssize") - expr(s"($tauPm * ssize + 999) div 1000") + 1)
      .select(col("g"), col("doc_id"), col("ssize"))
    val cands = prefix.as("a")
      .join(prefix.as("b"),
        col("a.g") === col("b.g") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.ssize").as("sa"), col("b.ssize").as("sb"))
      .distinct()
      .filter(lit(tauPm) * greatest(col("sa"), col("sb")) <=
        lit(1000L) * least(col("sa"), col("sb")))
    cands
      .join(sets.as("ga"), col("doc_a") === col("ga.doc_id"))
      .join(sets.as("gb"),
        col("doc_b") === col("gb.doc_id") && col("ga.g") === col("gb.g"))
      .groupBy("doc_a", "doc_b", "sa", "sb")
      .agg(count(lit(1)).as("overlap"))
      .filter(col("overlap") * 1000 >=
        lit(tauPm) * (col("sa") + col("sb") - col("overlap")))
      .withColumn("jaccard_pm",
        expr("(overlap * 1000) div (sa + sb - overlap)"))
      .select(col("doc_a"), col("doc_b"), col("sa"), col("sb"),
        col("overlap"), col("jaccard_pm"))
  }

  /**
   * Directed CONTAINMENT-similarity join — C(A→B) = |A∩B| / |A| ≥ τ
   * over distinct gram sets: the subset-duplication detector symmetric
   * Jaccard structurally misses (a 100-gram quote inside a 10,000-gram
   * page has J ≈ 0.01 but C = 1.0) — doc-in-doc, excerpt pages and
   * quoted-reply chains are the LLM-corpus cases. Emits DIRECTED pairs
   * (doc_a contained in doc_b).
   *
   * Candidate generation: the prefix theorem applies on the CONTAINED
   * side only — C ≥ τ forces ≥ ⌈τ·|A|⌉ shared grams, so one of A's
   * (|A| − ⌈τ|A|⌉ + 1) RAREST grams must be shared — but B's size is
   * unconstrained (that asymmetry is the operator's point), so A's
   * prefix joins B's postings. The rarest-first prefix ordering
   * is what keeps those postings short on a natural vocabulary; the
   * exact overlap count then verifies every candidate (zero false
   * positives, completeness from the theorem). Same three keyed
   * shuffles as [[jaccardPrefixJoin]] + the one pair-keyed aggregate.
   *
   * `dfCapPermille` bounds the joined posting lists (VERDICT r10 #4):
   * a gram present in more than N·cap/1000 documents is boilerplate
   * whose posting list is O(corpus)-long — on a template-heavy corpus
   * a short doc whose RAREST grams are still globally common would
   * otherwise join the full corpus per prefix gram. Capped grams drop
   * from the B-side postings only (the A-side prefix and the exact
   * overlap count still see them), trading bounded completeness for a
   * bounded join: a containment relationship witnessed ONLY by
   * above-cap grams is missed, exactly the q97 corpus-relative-df
   * trade-off, and the cap is mirrored in the q186 oracle so a trip
   * can never diverge engines. The corpus count rides a 1-row
   * broadcast (the q97/q152 nested-loop shape, PlanAuditSpec-
   * allowlisted) — relative, so the cap cannot silently tighten as
   * the corpus grows the way an absolute cap would.
   */
  def containmentJoin(df: DataFrame, idCol: String, textCol: String,
      tauPm: Long, shingleN: Int = 2,
      dfCapPermille: Long = 100): DataFrame = {
    require(tauPm >= 1 && tauPm <= 1000, s"tauPm in [1,1000], got $tauPm")
    require(dfCapPermille >= 1 && dfCapPermille <= 1000,
      s"dfCapPermille in [1,1000], got $dfCapPermille")
    import org.apache.spark.sql.expressions.Window
    // r17 note: the jaccardPrefixJoin sets-checkpoint was tried here too
    // (same three-consumer Generate shape) and measured a ~0.1 s
    // REGRESSION at sf0.1 — in this operator the duplicated cost is the
    // sizing-window pipeline (two lazy consumers: prefix and the capped
    // postings), which a sets-level checkpoint does not deduplicate,
    // while its blocking materialization still serializes the plan.
    // Kept lazy; the A/B numbers live in OPTIMIZATION_r17.md.
    val sets = df.select(col(idCol).as("doc_id"),
      explode(array_distinct(shingles(col(textCol), shingleN))).as("g"))
    val nDocs = df.agg(count(lit(1)).as("n_docs"))
    val sized = sets
      .withColumn("gdf", count(lit(1)).over(Window.partitionBy("g")))
      .withColumn("ssize", count(lit(1)).over(Window.partitionBy("doc_id")))
      .withColumn("pos", row_number().over(
        Window.partitionBy("doc_id").orderBy(col("gdf"), col("g"))))
    val prefix = sized
      .filter(col("pos") <=
        col("ssize") - expr(s"($tauPm * ssize + 999) div 1000") + 1)
      .select(col("g"), col("doc_id"), col("ssize"))
    // floor of 2: a gram shared by just two docs is the containment
    // SIGNAL itself, never boilerplate — without it a tiny corpus
    // (N·cap/1000 < 1) would drop every posting
    val full = sized
      .crossJoin(broadcast(nDocs))
      .filter(col("gdf") <=
        greatest(expr(s"(n_docs * $dfCapPermille) div 1000"), lit(2L)))
      .select(col("g").as("gb"), col("doc_id").as("doc_b"),
        col("ssize").as("sb"))
    val cands = prefix
      .join(full, col("g") === col("gb") && col("doc_id") =!= col("doc_b"))
      .select(col("doc_id").as("doc_a"), col("doc_b"),
        col("ssize").as("sa"), col("sb"))
      .distinct()
    cands
      .join(sets.as("ga"), col("doc_a") === col("ga.doc_id"))
      .join(sets.as("gb2"),
        col("doc_b") === col("gb2.doc_id") && col("ga.g") === col("gb2.g"))
      .groupBy("doc_a", "doc_b", "sa", "sb")
      .agg(count(lit(1)).as("overlap"))
      .filter(col("overlap") * 1000 >= lit(tauPm) * col("sa"))
      .withColumn("containment_pm", expr("(overlap * 1000) div sa"))
      .select(col("doc_a"), col("doc_b"), col("sa"), col("sb"),
        col("overlap"), col("containment_pm"))
  }

  /**
   * Exact dedup groups: one row per distinct content, with the minimum id
   * as representative and the copy count. Only (hash, id) cross the
   * shuffle; document bodies stay at the scan.
   */
  def exactDupGroups(df: DataFrame, textCol: String, idCol: String): DataFrame =
    exactDupGroupsFromIndex(docHashRows(df, textCol, idCol))

  /** [[exactDupGroups]] fed from a landed doc index (doc_id,
    * content_hash) — zero hashing in the plan; the grouped aggregate is
    * the whole query. */
  def exactDupGroupsFromIndex(docIndex: DataFrame): DataFrame =
    docIndex
      .groupBy(col("content_hash"))
      .agg(min(col("doc_id")).as("rep_id"), count(lit(1)).as("n_copies"))

  // ------------------------------------------------------------------
  // The shared shingle index (VERDICT r4 #1). Exact dedup, MinHash/LSH
  // and decontamination all start from the same two per-document hash
  // frames; at warehouse scale the md5 pass over the corpus is the
  // dominant CPU cost and must run ONCE, not once per consumer. The
  // index is landed as two parquet tables and every consumer has a
  // *FromIndex / *FromHashRows variant that reads the stored copy —
  // hash-identical to the text path (asserted by ShingleIndexSpec and
  // the unchanged q22/q23/q47 oracle gates).
  // ------------------------------------------------------------------

  /** Per-document index rows (doc_id, content_hash) — the exact-dedup
    * slice of the shingle index. */
  def docHashRows(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.select(col(idCol).as("doc_id"), hash64(col(textCol)).as("content_hash"))

  /** Distinct shingle-hash rows (doc_id, h): one row per DISTINCT word
    * n-gram STRING per document (distinct BEFORE hashing, so a 60-bit
    * collision between two distinct shingles still contributes two rows —
    * the exact frame [[contaminationPairs]] counts and the DuckDB oracle
    * mirrors). MinHash minima are unchanged by the distinct (min over a
    * set = min over its multiset), so [[signaturesFromHashRows]] accepts
    * this frame too. */
  def shingleHashRows(df: DataFrame, textCol: String, idCol: String,
      shingleN: Int = 3): DataFrame =
    df.select(col(idCol).as("doc_id"),
      explode(array_distinct(shingles(col(textCol), shingleN))).as("s"))
      .select(col("doc_id"), hashMod(col("s")).as("h"))

  /** Land the shingle index for a corpus: `dir/docs` = (doc_id,
    * content_hash), `dir/shingles` = (doc_id, h) distinct. One pass of
    * content hashing and one of shingle hashing, total — every consumer
    * reads the stored copy via [[readDocIndex]]/[[readShingleIndex]].
    * Plain parquet, no global ordering: the consumers re-key on doc_id
    * (signatures) or h (decontamination join) anyway, and at scale the
    * landing would be bucketed by the dominant consumer's key. */
  def landShingleIndex(df: DataFrame, textCol: String, idCol: String,
      dir: String, shingleN: Int = 3): Unit = {
    docHashRows(df, textCol, idCol)
      .write.mode("overwrite").parquet(s"$dir/docs")
    shingleHashRows(df, textCol, idCol, shingleN)
      .write.mode("overwrite").parquet(s"$dir/shingles")
  }

  /**
   * Per-document duplicated-n-gram coverage — the exact-substring dedup
   * SIGNAL of Lee et al. 2022 ("Deduplicating Training Data Makes
   * Language Models Better"): for every document, the fraction of its
   * distinct word `shingleN`-grams that also occur in at least one other
   * row of the corpus. Documents above `flagPpm` are the "mostly
   * memorized elsewhere" slice an LLM-data pipeline drops or trims even
   * when no WHOLE-document duplicate exists (which is what q22/q23
   * catch); the gram size is the knob — Lee et al. use ~50-token
   * windows, and on this 30-word-vocabulary corpus 6-grams are the
   * smallest size whose 30⁶ universe makes sharing a signal instead of
   * a certainty (the landed 3-gram index is NOT reused for exactly that
   * reason: 27k possible trigrams are shared by construction).
   *
   * Scale shape: one explode pass over the corpus (one md5 per distinct
   * gram per doc — the same cost class as the shingle-index build), then
   * a count-window on the gram hash followed by the per-doc aggregate:
   * the window's `h` exchange is the only corpus-sized shuffle, and the
   * per-doc rollup shuffles (doc_id, flags) only. The count-window
   * replaces a groupBy(h)+self-join (one shuffle, not two — the q62
   * lesson). A gram's "occurs elsewhere" bit is count(rows with h) ≥ 2:
   * rows are distinct per (doc, gram string), so the count is the
   * document frequency (a 60-bit hash collision would overcount — both
   * engines hash identically, so the gate cannot diverge on it).
   */
  def dupNgramCoverage(df: DataFrame, idCol: String, textCol: String,
      shingleN: Int, flagPpm: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val rows = df.select(col(idCol).as("doc_id"),
        explode(array_distinct(shingles(col(textCol), shingleN))).as("s"))
      .select(col("doc_id"), hash64(col("s")).as("h"))
    rows
      .withColumn("df_h", count(lit(1)).over(Window.partitionBy("h")))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("df_h") >= 2, 1L).otherwise(0L)).as("n_dup_grams"))
      .select(col("doc_id"), col("n_grams"), col("n_dup_grams"),
        expr("(n_dup_grams * 1000000) div n_grams").as("dup_ppm"))
      .withColumn("dup_heavy",
        when(col("dup_ppm") >= flagPpm, 1L).otherwise(0L))
  }

  /**
   * Exact-substring dedup REMOVAL — the operator [[dupNgramCoverage]]
   * only measures (Lee et al. 2022, "Deduplicating Training Data Makes
   * Language Models Better": the production step excises every maximal
   * duplicated token run from each document instead of dropping whole
   * docs). A word `shingleN`-gram is DUPLICATED when its hash occurs in
   * ≥ 2 (doc, position) rows corpus-wide — including a second occurrence
   * inside the same document, exactly the suffix-array semantics (a
   * repeated span is a repeated span wherever its twin lives). Every
   * token covered by a duplicated gram is removed; maximal runs of
   * removed token indexes are the excised SPANS (overlapping and
   * abutting gram extents merge into one span — the q116
   * gaps-and-islands discipline on the integer token line, where
   * consecutive removed indexes form one island).
   *
   * Output, one row per input document: (doc_id, n_tokens,
   * tokens_removed, spans_removed, kept_text) — `kept_text` is the
   * whitespace-normalized lowercase text with removed runs excised
   * ("" when the whole document was duplicated), so the result frame IS
   * the cleaned corpus plus its drop accounting.
   *
   * Scale shape (the q107 discipline plus one doc-keyed tail):
   *  - the ONLY corpus-sized shuffle is the gram-hash count window —
   *    the token array is dropped from the projection before that
   *    exchange; only (doc_id, p, e, h) rows cross it;
   *  - flagged extents explode to ≤ n× flagged-gram removed-index rows,
   *    then everything is keyed on doc_id: one window+aggregate builds
   *    per-doc run stats and the removed-index array (bounded by the
   *    doc's own token count), one join hangs them back on the tokens;
   *  - the excision itself is a per-row indexed array filter — no
   *    second corpus pass, no text ever shuffles.
   */
  def removeDuplicateSpans(df: DataFrame, idCol: String, textCol: String,
      shingleN: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = df.select(col(idCol).as("doc_id"), tokens(col(textCol)).as("t"))
      .withColumn("nt", size(col("t")))
    val grams = gramExtents(toks, shingleN)
    val flagged = grams
      .withColumn("df_h", count(lit(1)).over(Window.partitionBy("h")))
      .filter(col("df_h") >= 2)
    val removed = flagged
      .select(col("doc_id"), explode(sequence(col("p"), col("e"))).as("i"))
      .distinct()
    val wd = Window.partitionBy("doc_id").orderBy("i")
    val perDoc = removed
      .withColumn("pv", lag(col("i"), 1).over(wd))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("tokens_removed"),
        sum(when(col("pv").isNull || col("i") > col("pv") + 1, 1L)
          .otherwise(0L)).as("spans_removed"),
        sort_array(collect_list(col("i"))).as("rem"))
    toks.join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), col("nt").cast(LongType).as("n_tokens"),
        coalesce(col("tokens_removed"), lit(0L)).as("tokens_removed"),
        coalesce(col("spans_removed"), lit(0L)).as("spans_removed"),
        when(col("rem").isNull, concat_ws(" ", col("t")))
          .otherwise(array_join(
            filter(col("t"), (_, i0) => !array_contains(col("rem"), i0 + 1)),
            " ")).as("kept_text"))
  }

  /** Positional gram extents over a (doc_id, t, nt) token frame —
    * (doc_id, p, e, h), one row per gram occurrence WITH multiplicity
    * (a within-doc repeat is a duplicate); short docs contribute their
    * whole token sequence as one gram, mirroring [[shingles]]. Shared
    * by [[removeDuplicateSpans]] and [[spanAttribution]] so the two
    * sides of the Lee-et-al pipeline can never disagree on what a
    * gram's extent is. */
  private def gramExtents(toks: DataFrame, shingleN: Int): DataFrame =
    toks
      .select(col("doc_id"), col("nt"), col("t"),
        explode(sequence(lit(1),
          greatest(col("nt") - lit(shingleN - 1), lit(1)))).as("p"))
      .select(col("doc_id"), col("p"),
        least(col("p") + lit(shingleN - 1), col("nt")).as("e"),
        hash64(concat_ws(" ", slice(col("t"), col("p"), lit(shingleN)))).as("h"))

  /**
   * Cross-document span ATTRIBUTION — the forensic complement of
   * [[removeDuplicateSpans]] (r11 verdict item #8): removal says a
   * span was duplicated; attribution says WHERE the duplicate lives.
   * For every ordered document pair sharing ≥ 1 flagged gram, the
   * rollup emits how many distinct gram hashes they share, how many of
   * doc_a's tokens are covered by shared grams (the union of extents —
   * overlapping extents merge, the q188 island arithmetic), and how
   * many maximal runs that coverage forms — the per-pair evidence
   * table source-level contamination forensics (q226) aggregates over.
   *
   * Scale shape: the gram-hash count window is the same single
   * corpus-sized shuffle q188 already pays; the self-join's equality
   * key is the gram hash with postings CAPPED corpus-relatively
   * (`dfCapPermille`, floor 2 — the q186 B-side discipline, mirrored
   * in the q243 oracle so a tripped cap can never diverge engines).
   * COST MODEL (r12 verdict advisory; default tightened to 1‰ per
   * r13): the pair join emits O(Σ_h df_h²) rows over surviving gram
   * hashes — quadratic in per-gram document frequency, so every
   * admitted permille of corpus-wide boilerplate costs (N/1000)² pair
   * rows PER GRAM: at 10⁹ documents even ONE gram admitted at the
   * 10‰ line would emit 10¹⁴ pairs. Unlike q186, where the capped
   * frame feeds an aggregate, here it feeds a self-join, so the
   * honest production default is 1‰ (grams shared by >0.1% of a web
   * corpus are boilerplate by definition and carry no attribution
   * signal; the floor of 2 keeps small fixtures and small corpora
   * exact); callers wanting mid-frequency grams attribute an explicit
   * candidate subset instead of raising the cap. The flagged frame is
   * localCheckpointed so both join sides read materialized partitions
   * (the q189 self-join rule); everything after the join is keyed on
   * the (doc_a, doc_b) pair and bounded by pair-shared extents. The
   * corpus count rides a 1-row broadcast (the q97/q186 nested-loop
   * shape, PlanAuditSpec-allowlisted).
   *
   * Output: (doc_a, doc_b, shared_grams, shared_tokens, shared_spans)
   * with doc_a < doc_b; token/span counts are in doc_a's coordinates.
   */
  def spanAttribution(df: DataFrame, idCol: String, textCol: String,
      shingleN: Int, dfCapPermille: Long = 1): DataFrame = {
    require(dfCapPermille >= 1 && dfCapPermille <= 1000,
      s"dfCapPermille in [1,1000], got $dfCapPermille")
    import org.apache.spark.sql.expressions.Window
    val toks = df.select(col(idCol).as("doc_id"), tokens(col(textCol)).as("t"))
      .withColumn("nt", size(col("t")))
    val nDocs = df.agg(count(lit(1)).as("n_docs"))
    val flagged = gramExtents(toks, shingleN)
      .withColumn("df_h", count(lit(1)).over(Window.partitionBy("h")))
      .crossJoin(broadcast(nDocs))
      .filter(col("df_h") >= 2 && col("df_h") <=
        greatest(expr(s"(n_docs * $dfCapPermille) div 1000"), lit(2L)))
      .select(col("doc_id"), col("p"), col("e"), col("h"))
      .localCheckpoint(true)
    val pairs = flagged.as("a")
      .join(flagged.as("b"),
        col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.p").as("p"), col("a.e").as("e"), col("a.h").as("h"))
    val gcnt = pairs.select(col("doc_a"), col("doc_b"), col("h")).distinct()
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("shared_grams"))
    val wp = Window.partitionBy("doc_a", "doc_b").orderBy("i")
    val roll = pairs
      .select(col("doc_a"), col("doc_b"),
        explode(sequence(col("p"), col("e"))).as("i"))
      .distinct()
      .withColumn("pv", lag(col("i"), 1).over(wp))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("shared_tokens"),
        sum(when(col("pv").isNull || col("i") > col("pv") + 1, 1L)
          .otherwise(0L)).as("shared_spans"))
    gcnt.join(roll, Seq("doc_a", "doc_b"))
  }

  /** [[winnowingFingerprints]] position bound: the (hash, position)
    * tie-break key packs the position into the low 20 bits of a
    * decimal, so a document may hold at most 2^20 grams (~1M tokens —
    * far above any web-document tokenizer output; a longer doc should
    * be chunked upstream, q95). */
  val WinnowPosBits = 20

  /**
   * Winnowing document fingerprints (Schleimer, Wilkerson & Aiken 2003
   * — the MOSS scheme): slide a window of `w` consecutive word-
   * `shingleN`-gram hashes over each document and select each window's
   * MINIMUM (hash, position) key; the distinct selected positions are
   * the document's fingerprints. Both winnowing guarantees hold by
   * construction and are pinned by spec:
   *  - DENSITY: every valid w-window contains its own argmin, so no
   *    w-gram stretch goes unfingerprinted (the guarantee the simpler
   *    "local minimum of a symmetric neighborhood" predicate LACKS — a
   *    monotone key run would select almost nothing);
   *  - LOCALITY/ROBUSTNESS: a window's argmin depends only on its own
   *    w keys, so any token run of >= w + shingleN - 1 tokens shared
   *    between two documents contains a full shared window, whose
   *    minimum HASH is identical in both (the position tie-break only
   *    arbitrates equal hashes = identical grams, picking the same
   *    hash either way) — cross-doc overlap detection by fingerprint
   *    equality join, no full-text comparison, no probabilistic bands.
   *
   * The key is total — hash·2^WinnowPosBits + position in
   * decimal(38,0) — so the fingerprint set is bit-deterministic
   * cross-engine.
   *
   * Scale shape: one explode pass (the q107/q188 cost class), ONE
   * doc-keyed window (the per-window minima ride a single per-doc
   * ordered scan, ROWS CURRENT..w-1 FOLLOWING), then a doc-keyed
   * self-semi-join lifts the distinct selected keys back to rows —
   * all exchanges on doc_id after the scan, only (doc_id, pos, h)
   * ever shuffles. Downstream match-finding joins fingerprints on h:
   * ~1/w the postings a full gram index would carry, winnowing's
   * point.
   *
   * Output: (doc_id, pos, h) for selected positions, ~2/(w+1) of
   * gram positions on random-ish keys.
   */
  def winnowingFingerprints(df: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, w: Int = 4): DataFrame = {
    require(w >= 2, s"winnow window must be >= 2, got $w")
    import org.apache.spark.sql.expressions.Window
    // r17 OPTIMIZATION (guide §2.4/§2.5): the explode + per-position
    // gram hash is the operator's CPU and has TWO consumers (the
    // window-minima pass and the final key join) — and it used to run
    // at the parquet split count. spreadSmallInput parallelizes the
    // scan; ONE explicit hash(doc_id) repartition then serves the
    // window, the distinct and both join sides via exchange reuse
    // (hash(doc_id) satisfies the (doc_id, k) join's clustering as a
    // key subset), so the gram stream is hashed once and shuffled once.
    val toks = ScanOps.spreadSmallInput(
      df.select(col(idCol).as("doc_id"), col(textCol).as("text")),
      col("doc_id"))
      .select(col("doc_id"), tokens(col("text")).as("t"))
      .withColumn("nt", size(col("t")))
    val grams = toks
      .select(col("doc_id"), col("nt"), col("t"),
        explode(sequence(lit(1),
          greatest(col("nt") - lit(shingleN - 1), lit(1)))).as("p"))
      .select(col("doc_id"), col("p"),
        greatest(col("nt") - lit(shingleN - 1), lit(1)).as("maxp"),
        hash64(concat_ws(" ", slice(col("t"), col("p"), lit(shingleN)))).as("h"))
      .withColumn("k", col("h").cast(DecimalType(38, 0)) *
        lit(1L << WinnowPosBits) + col("p"))
      .repartition(df.sparkSession.sparkContext.defaultParallelism,
        col("doc_id"))
    val headWin = Window.partitionBy("doc_id").orderBy("p")
      .rowsBetween(Window.currentRow, w - 1)
    // valid window heads: s <= maxp - w + 1 (every full window), plus
    // s = 1 when the doc has fewer than w grams (one clipped window)
    val selectedKeys = grams
      .withColumn("fmin", min(col("k")).over(headWin))
      .filter(col("p") <= greatest(col("maxp") - lit(w - 1), lit(1)))
      .select(col("doc_id"), col("fmin").as("k"))
      .distinct()
    grams.join(selectedKeys, Seq("doc_id", "k"))
      .select(col("doc_id"), col("p").cast(LongType).as("pos"), col("h"))
  }

  def readDocIndex(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/docs")

  def readShingleIndex(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/shingles")

  /**
   * Per-document MinHash signatures: (doc_id, sig).
   *
   * Shape: explode shingles → one codegen'd md5 per shingle → ONE
   * HashAggregate with K `min` columns. Chosen over the per-row
   * higher-order-function form (`transform`+`array_min` K times over a
   * shared hash array) for two scale reasons:
   *  - HOF lambdas evaluate interpreted (boxed per element) and their
   *    shared input is re-inlined by Catalyst wherever the projection is
   *    referenced from a join/generate — measured as the dominant cost of
   *    the whole dedup at sf0.1;
   *  - the aggregate is whole-stage-codegen'd with map-side partial min,
   *    so the shuffle carries one partially-aggregated row per (doc,
   *    partition) — the same weight as the signature itself — and the
   *    Aggregate node is a hard boundary no downstream consumer can
   *    inline expression trees through.
   */
  def signatures(texts: DataFrame, shingleN: Int): DataFrame =
    signaturesFromHashRows(texts
      .select(col("doc_id"), explode(shingles(col("text"), shingleN)).as("s"))
      .select(col("doc_id"), hashMod(col("s")).as("h")))

  /** The aggregate half of [[signatures]], over an already-hashed
    * (doc_id, h) frame — the landed shingle index slots in directly
    * (distinct vs multiset shingle hashes give the same minima). */
  def signaturesFromHashRows(hashed: DataFrame): DataFrame = {
    val minCols = perms.zipWithIndex.map { case ((a, b), k) =>
      min((lit(a) * col("h") + lit(b)) % Prime).as(s"m$k")
    }
    hashed.groupBy(col("doc_id"))
      .agg(minCols.head, minCols.tail: _*)
      .select(col("doc_id"),
        array((0 until K).map(k => col(s"m$k")): _*).as("sig"))
  }

  /** LSH band rows (doc_id, band_key) from a signature frame.
    *
    * The generator explodes a LITERAL band-index array and the band key is
    * assembled ABOVE the Generate from the materialized `sig` attribute.
    * The direct form `explode(bandKeys(sig))` lets Catalyst inline the
    * whole signature expression into the generator, where `hv` is no
    * longer a shared projection — every md5 is recomputed K times per
    * band (measured 28× slower at sf0.1: 4.5 s vs 0.16 s for this stage). */
  def bandRows(sigs: DataFrame): DataFrame =
    sigs
      .select(col("doc_id"), col("sig"),
        explode(typedlit((0 until Bands).toArray)).as("band"))
      .select(col("doc_id"),
        concat_ws("_",
          col("band").cast(StringType) +: (0 until RowsPerBand).map(r =>
            element_at(col("sig"), col("band") * RowsPerBand + r + 1)
              .cast(StringType)): _*)
          .as("band_key"))

  /** Band-key bucket sizes over a (doc_id, band_key) frame — the skew
    * diagnostic for [[minhashCandidatePairs]]'s `maxBandBucket` cap: a
    * caller that wants drop accounting filters this on
    * `bucket_size > cap` and counts/logs before running the dedup. */
  def bandBucketSizes(bands: DataFrame): DataFrame =
    bands.groupBy(col("band_key")).agg(count(lit(1)).as("bucket_size"))

  /**
   * MinHash/LSH candidate pairs with exact rerank columns. Input must have
   * (idCol, textCol); output: (doc_a, doc_b, est_sim, jaccard) for every
   * candidate pair sharing ≥1 band key, est_sim ≥ minEstSim.
   *
   * Shape (each stage exchanges the minimum possible width):
   *  1. band self-join emits BARE (doc_a, doc_b) pairs — two longs, no
   *     signatures ride along — and `.distinct()` collapses the per-band
   *     multiplicity BEFORE any similarity arithmetic, so a pair sharing
   *     b band keys is scored once, not b times;
   *  2. signatures join back onto the deduped pairs (16 longs per doc,
   *     joined once per side);
   *  3. cheap signature-similarity gate, THEN the O(tokens) exact-Jaccard
   *     rerank on survivors only (pre-filter rerank measured ~10× slower
   *     at sf0.1), with the bigram intersection computed once per pair in
   *     a staged projection.
   *
   * @param maxBandBucket skew guard: band buckets larger than this are
   *        dropped BEFORE their ids are ever collected. On a
   *        boilerplate-heavy corpus one hot band key (e.g. an empty-page
   *        template) otherwise degenerates to a bucket² pair explosion.
   *        Dropping a bucket of size m only loses pairs whose EVERY
   *        shared band is hot — candidates usually share a non-hot band
   *        too. Account for drops via [[bandBucketSizes]]
   *        (`bucket_size > maxBandBucket`). Bounded at 10000 because a
   *        kept bucket expands C(cap, 2) pair structs inside one row
   *        (~5·10⁷ at the bound); raise only with the row-size math done.
   */
  def minhashCandidatePairs(df: DataFrame, textCol: String, idCol: String,
      shingleN: Int = 3, minEstSim: Double = 0.3,
      maxBandBucket: Int = DefaultMaxBandBucket): DataFrame = {
    val texts = ScanOps.spreadSmallInput(
      df.select(col(idCol).as("doc_id"), col(textCol).as("text")), col("doc_id"))
    minhashCandidatePairsFromHashRows(
      texts.select(col("doc_id"), explode(shingles(col("text"), shingleN)).as("s"))
        .select(col("doc_id"), hashMod(col("s")).as("h")),
      texts, minEstSim, maxBandBucket)
  }

  /**
   * [[minhashCandidatePairs]] fed from an already-hashed (doc_id, h)
   * shingle frame — the landed index path. `texts` (doc_id, text) is
   * still needed, but ONLY for the exact-Jaccard rerank of surviving
   * candidates (a vanishing fraction of the corpus); all signature
   * hashing comes from `hashRows`. Same output, same oracle.
   *
   * Parallelism is the CALLER's job ([[ScanOps.spreadSmallInput]] on
   * scan-rooted inputs): spreading here would re-exchange the text
   * path's already-spread frames.
   */
  /** Bare (doc_a, doc_b) candidate pairs from an LSH band frame — the
    * shared generation stage of [[minhashCandidatePairsFromHashRows]]
    * and [[minhashCalibration]] (one definition, so the two can never
    * disagree on the candidate set):
    *  - skew cap FIRST, from a count-only aggregate: hot keys are few
    *    by construction (each holds > cap docs, so at most N/cap of
    *    them exist) → the broadcast is bounded at any corpus size, and
    *    a hot bucket's ids are never collected into a row;
    *  - candidate generation by bucket aggregation, not a self-join:
    *    ONE shuffle on band_key collects each surviving bucket's ids
    *    (every list ≤ cap); singleton buckets (the overwhelming
    *    majority) drop before any pair forms; pair expansion is an
    *    expression over the sorted id list — ≤ C(cap, 2) structs per
    *    bucket row, never joined. */
  private def bandCandidatePairs(bands: DataFrame,
      maxBandBucket: Int): DataFrame = {
    val kept = bands.join(
      broadcast(bandBucketSizes(bands)
        .filter(col("bucket_size") > maxBandBucket)
        .select(col("band_key"))),
      Seq("band_key"), "left_anti")
    // r17 OPTIMIZATION (guide §2.5): the bucket collect + C(bucket,2)
    // pair Generate carry seconds of CPU over ~1 MB of shuffle bytes;
    // AQE byte-coalescing folded the band_key exchange to one task (the
    // q62 block-probe finding). Pin it at session parallelism.
    kept
      .repartition(bands.sparkSession.sparkContext.defaultParallelism,
        col("band_key"))
      .groupBy(col("band_key"))
      .agg(collect_list(col("doc_id")).as("ids"))
      .filter(size(col("ids")) >= 2)
      .select(array_sort(col("ids")).as("ids"))
      // r18 OPTIMIZATION (guide §1.2 per-task work — the q152 lesson):
      // the nested transform/flatten pair lambda is CodegenFallback and
      // ran interpreted with a measured per-task setup cost; the same
      // ordered-pair stream as two codegen'd Generates (posexplode
      // anchors doc_a, slice+explode emits every later id — identical
      // multiset, C(bucket,2) bound unchanged).
      .select(col("ids"), posexplode(col("ids")))
      .select(col("col").as("doc_a"),
        explode(slice(col("ids"), col("pos") + lit(2),
          size(col("ids")))).as("doc_b"))
      .select(col("doc_a"), col("doc_b"))
      .distinct()
  }

  def minhashCandidatePairsFromHashRows(hashRows: DataFrame, texts: DataFrame,
      minEstSim: Double = 0.3,
      maxBandBucket: Int = DefaultMaxBandBucket): DataFrame = {
    require(maxBandBucket >= 2 && maxBandBucket <= 10000,
      s"maxBandBucket must be in [2, 10000], got $maxBandBucket")
    // r17 OPTIMIZATION (guide §1.2): same three-consumer shape as
    // [[minhashCalibration]] — materialize the signature aggregate once.
    val sigs = signaturesFromHashRows(hashRows).localCheckpoint(true)
    val cand = bandCandidatePairs(bandRows(sigs), maxBandBucket)
    val estimated = cand
      .join(sigs.select(col("doc_id"), col("sig").as("sig_a")),
        col("doc_a") === col("doc_id")).drop("doc_id")
      .join(sigs.select(col("doc_id"), col("sig").as("sig_b")),
        col("doc_b") === col("doc_id")).drop("doc_id")
      .select(col("doc_a"), col("doc_b"),
        signatureSimilarity(col("sig_a"), col("sig_b")).as("est_sim"))
      .filter(col("est_sim") >= minEstSim)
    // exact rerank on the survivors only; intersection sized once
    estimated
      .join(texts.select(col("doc_id"), col("text").as("text_a")),
        col("doc_a") === col("doc_id")).drop("doc_id")
      .join(texts.select(col("doc_id"), col("text").as("text_b")),
        col("doc_b") === col("doc_id")).drop("doc_id")
      .select(col("doc_a"), col("doc_b"), col("est_sim"),
        array_distinct(shingles(col("text_a"), 2)).as("ga"),
        array_distinct(shingles(col("text_b"), 2)).as("gb"))
      .select(col("doc_a"), col("doc_b"), col("est_sim"),
        size(array_intersect(col("ga"), col("gb"))).cast(DoubleType).as("inter"),
        size(col("ga")).cast(DoubleType).as("na"),
        size(col("gb")).cast(DoubleType).as("nb"))
      .select(col("doc_a"), col("doc_b"), col("est_sim"),
        // guard the 0/0 corner (DuckDB yields NaN for 0/0, Spark NULL —
        // either breaks the cross-engine hash): two empty shingle sets
        // are a perfect match. Unreachable with [[shingles]]'s short-doc
        // fallback (never an empty set), kept so a future tokenizer
        // change cannot reintroduce engine divergence; the oracle
        // carries the mirrored CASE.
        when(col("na") + col("nb") - col("inter") > 0,
          col("inter") / (col("na") + col("nb") - col("inter")))
          .otherwise(lit(1.0)).as("jaccard"))
  }

  /**
   * Per-source dedup-rate manifest — the curation report a dedup pass
   * should END with: for every source, how much of it was duplicate
   * (within-source copies: n_docs − distinct contents) and how much of
   * its content ALSO appears under other sources (cross-source
   * contamination — the mirror/aggregator-feed signal a per-source dup
   * rate alone cannot see). Feeds entirely from content hashes (the
   * landed doc index — zero text hashing in the plan), so the report
   * costs two hash-keyed aggregates: (source, hash) counts, then a
   * hash-level distinct-source count joined back. Rates in floor ppm.
   */
  def dedupRateManifest(rows: DataFrame, srcCol: String,
      hashCol: String): DataFrame =
    dedupRateManifestFromCounts(rows
      .groupBy(col(srcCol).as("src"), col(hashCol).as("ch"))
      .agg(count(lit(1)).as("cnt")))

  /** The IVM half of [[dedupRateManifest]]: the same per-source rollup
    * from a pre-aggregated (src, ch, cnt) counts frame. Counts COMMUTE
    * — a standing day-1 counts frame merged with a delta's counts
    * (union + grouped sum) feeds this and yields bit-identically the
    * manifest a full recompute would produce, which is what makes the
    * manifest maintainable at delta cost (the q81 discipline; the q244
    * refresh chain gates the equivalence end-to-end). */
  def dedupRateManifestFromCounts(sh: DataFrame): DataFrame = {
    val hs = sh.groupBy(col("ch")).agg(count(lit(1)).as("ns"))
    sh.join(hs, Seq("ch"))
      .groupBy(col("src"))
      .agg(sum(col("cnt")).as("n_docs"), count(lit(1)).as("n_unique"),
        sum(when(col("ns") > 1, col("cnt")).otherwise(0L))
          .as("shared_docs"))
      .select(col("src"), col("n_docs"), col("n_unique"),
        (col("n_docs") - col("n_unique")).as("dup_docs"),
        col("shared_docs"),
        expr("(1000000 * (n_docs - n_unique)) div n_docs")
          .as("dup_ppm"),
        expr("(1000000 * shared_docs) div n_docs").as("shared_ppm"))
  }

  /**
   * MinHash estimator calibration table — the q136 honest-approximation
   * discipline applied to the dedup estimator itself: over every LSH
   * candidate pair, bucket by the MATCHING SIGNATURE COMPONENT count
   * m ∈ [0, K] (the estimator's whole output lattice — est = m/K) and
   * report the exact-Jaccard distribution inside each bucket: mean,
   * mean absolute error, and the estimator's bias (est − mean exact).
   * This is the table that justifies — or refutes — every est-threshold
   * choice q23 makes: a threshold of 0.3 means "bucket m ≥ 5", and this
   * readout says what exact similarity that actually buys. All integer
   * ppm (per-pair j_ppm = ⌊10⁶·|∩|/|∪|⌋, bucket means are floored
   * sums), so the audit hash-gates.
   *
   * Scale shape: identical to [[minhashCandidatePairsFromHashRows]] —
   * shared [[bandCandidatePairs]] generation (capped buckets, bare id
   * pairs), signature/text joins on survivors only, then ONE ≤ K+1-row
   * aggregate. The calibration table is estimator-lattice-sized.
   */
  def minhashCalibration(hashRows: DataFrame, texts: DataFrame,
      maxBandBucket: Int = DefaultMaxBandBucket): DataFrame = {
    // r17 OPTIMIZATION (guide §1.2): `sigs` has three consumers (band
    // rows + both pair-side joins) and the K-min signature aggregate re-
    // ran for each; materialize it once (the q189 self-join rule).
    val sigs = signaturesFromHashRows(hashRows).localCheckpoint(true)
    val cand = bandCandidatePairs(bandRows(sigs), maxBandBucket)
    cand
      .join(sigs.select(col("doc_id"), col("sig").as("sig_a")),
        col("doc_a") === col("doc_id")).drop("doc_id")
      .join(sigs.select(col("doc_id"), col("sig").as("sig_b")),
        col("doc_b") === col("doc_id")).drop("doc_id")
      .select(col("doc_a"), col("doc_b"),
        aggregate(
          zip_with(col("sig_a"), col("sig_b"),
            (x, y) => when(x === y, 1L).otherwise(0L)),
          lit(0L), (acc, v) => acc + v).as("m"))
      .join(texts.select(col("doc_id"), col("text").as("text_a")),
        col("doc_a") === col("doc_id")).drop("doc_id")
      .join(texts.select(col("doc_id"), col("text").as("text_b")),
        col("doc_b") === col("doc_id")).drop("doc_id")
      .select(col("m"),
        array_distinct(shingles(col("text_a"), 2)).as("ga"),
        array_distinct(shingles(col("text_b"), 2)).as("gb"))
      .select(col("m"),
        size(array_intersect(col("ga"), col("gb"))).cast("long")
          .as("inter"),
        (size(col("ga")) + size(col("gb"))).cast("long").as("tot"))
      .select(col("m"),
        when(col("tot") - col("inter") > 0,
          expr("(1000000 * inter) div (tot - inter)"))
          .otherwise(lit(1000000L)).as("j_ppm"))
      .groupBy(col("m"))
      .agg(count(lit(1)).as("n_pairs"),
        expr("sum(j_ppm) div count(*)").as("mean_j_ppm"),
        expr(s"sum(abs(j_ppm - (1000000 * m) div $K)) div count(*)")
          .as("mae_ppm"))
      .select(col("m"), col("n_pairs"),
        expr(s"(1000000 * m) div $K").as("est_ppm"),
        col("mean_j_ppm"),
        (expr(s"(1000000 * m) div $K") - col("mean_j_ppm"))
          .as("bias_ppm"),
        col("mae_ppm"))
  }

  /**
   * Benchmark decontamination: which corpus documents share enough
   * word n-grams with an evaluation/benchmark set that they would leak
   * test data into training (the standard pre-training hygiene pass).
   *
   * Shape: distinct shingle hashes per document on BOTH sides (two
   * explode+distinct scans), then an equality join on the 60-bit hash —
   * never a doc×bench text comparison. Scale discipline:
   *  - a shingle's corpus document frequency is capped
   *    (`maxShingleDf`): shingles in more than that many documents are
   *    non-discriminative boilerplate ("in the world" phrases) and are
   *    anti-joined away via a BOUNDED broadcast (at most
   *    totalShingles/cap hot hashes exist) BEFORE the join — the same
   *    hot-key guard as [[minhashCandidatePairs]], preventing a
   *    stopword trigram from exploding the join;
   *  - only (id, hash) pairs shuffle; document bodies stay at the scan.
   *
   * Output: (doc_id, bench_id, n_shared, n_doc_shingles,
   * overlap_ratio) for pairs sharing ≥ `minShared` capped shingles;
   * `overlap_ratio` is against the document's FULL distinct shingle
   * count (pre-cap), so boilerplate removal can only lower recall of
   * the ratio, never inflate it.
   *
   * Text-path note: the corpus shingle frame feeds THREE aggregations
   * (doc totals, df cap, the join) on different keys, so this form
   * re-hashes once per consumer. The warehouse path is
   * [[contaminationPairsFromHashRows]] over the LANDED index
   * ([[landShingleIndex]]) — the stored (doc_id, h) table is scanned
   * three times but hashed zero times (q47 runs that way).
   */
  def contaminationPairs(corpus: DataFrame, bench: DataFrame,
      textCol: String, idCol: String, shingleN: Int = 3,
      maxShingleDf: Int = 100, minShared: Long = 3): DataFrame =
    contaminationPairsFromHashRows(
      shingleHashRows(ScanOps.spreadSmallInput(corpus, col(idCol)),
        textCol, idCol, shingleN),
      shingleHashRows(bench, textCol, idCol, shingleN)
        .withColumnRenamed("doc_id", "bench_id"),
      maxShingleDf, minShared)

  /** [[contaminationPairs]] over pre-hashed frames: corpus (doc_id, h)
    * and bench (bench_id, h), both DISTINCT per document (the
    * [[shingleHashRows]] / landed-index shape). No hashing in the plan. */
  def contaminationPairsFromHashRows(corpusRows: DataFrame, benchRows: DataFrame,
      maxShingleDf: Int = 100, minShared: Long = 3): DataFrame = {
    val cs = corpusRows
    val bs = benchRows
    val docTotals = cs.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_doc_shingles"))
    val hot = cs.groupBy(col("h")).agg(count(lit(1)).as("df"))
      .filter(col("df") > maxShingleDf).select(col("h"))
    cs.join(broadcast(hot), Seq("h"), "left_anti")
      .join(bs, Seq("h"))
      .groupBy(col("doc_id"), col("bench_id"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
      .join(docTotals, Seq("doc_id"))
      .select(col("doc_id"), col("bench_id"), col("n_shared"),
        col("n_doc_shingles"),
        (col("n_shared").cast(DoubleType)
          / col("n_doc_shingles").cast(DoubleType)).as("overlap_ratio"))
  }

  /**
   * 16-bit SimHash fingerprint via conditional aggregation: explode tokens,
   * per document sum ±1 per bit of the token hash, positive sums set the
   * bit. 16 bits keeps the oracle SQL tractable; widen by raising `bits`
   * (the expression shape is generated, not hand-written).
   */
  def simhashFingerprint(df: DataFrame, textCol: String, idCol: String,
      bits: Int = 16): DataFrame = {
    val tok = df.select(col(idCol).as("doc_id"),
      explode(tokens(col(textCol))).as("token"))
      .withColumn("h", hash64(col("token")))
    val bitSums = (0 until bits).map { j =>
      sum(when(shiftright(col("h"), j).bitwiseAND(lit(1L)) === 1L, 1)
        .otherwise(-1)).as(s"s$j")
    }
    tok.groupBy(col("doc_id"))
      .agg(bitSums.head, bitSums.tail :+ count(lit(1)).as("n_tokens"): _*)
      .select(col("doc_id"),
        (0 until bits).map(j =>
          when(col(s"s$j") > 0, lit(1L << j)).otherwise(lit(0L)))
          .reduce(_ + _).as("simhash"),
        col("n_tokens"))
  }

  /**
   * SimHash near-duplicate pairs — the Hamming-distance dedup family
   * beside MinHash/Jaccard ([[minhashCandidatePairs]]): fingerprint every
   * document ([[simhashFingerprint]], default widened to 32 bits here),
   * generate candidates by BLOCK PROBING, exact-rerank by Hamming
   * distance.
   *
   * Block probing is the pigeonhole guarantee of the Manku/Charikar
   * near-dup scheme: split the `bits`-bit fingerprint into `blocks`
   * equal blocks; any pair within Hamming distance `blocks - 1` must
   * agree EXACTLY on at least one block, so equality-joining per-block
   * values finds every such pair without an all-pairs scan. Pairs at
   * distance ≥ `blocks` may or may not surface (only via a luckily-clean
   * block) — both engines model the identical candidate set, so the gate
   * stays exact either way.
   *
   * Scale shape mirrors the MinHash path stage for stage:
   *  - only (doc_id, 1 long) cross the shuffles — no texts, no token
   *    arrays;
   *  - hot block values (a common bit pattern in a boilerplate-heavy
   *    corpus) are dropped via the same bounded-broadcast anti-join
   *    BEFORE ids are collected (`maxBlockBucket`, mirrored in the q62
   *    oracle's HAVING so a trip can never diverge engines);
   *  - candidate pairs come from bucket aggregation (≤ C(cap, 2) structs
   *    per bucket row), never a row self-join;
   *  - the rerank is one XOR + popcount per candidate — codegen'd
   *    integer ops, no text ever re-read.
   *
   * Production setting: 64-bit fingerprints with 4 × 16-bit blocks (the
   * standard web-dedup geometry). 32/4 here keeps the generated oracle
   * SQL (32 conditional sums) tractable; the shape is parameterized, not
   * hand-written.
   *
   * Output: (doc_a, doc_b, hamming) for candidate pairs with
   * hamming ≤ `maxHamming`, doc_a < doc_b.
   */
  def simhashNearDupPairs(df: DataFrame, textCol: String, idCol: String,
      bits: Int = 32, blocks: Int = 4, maxHamming: Int = 3,
      maxBlockBucket: Int = DefaultMaxBandBucket): DataFrame = {
    require(bits % blocks == 0, s"blocks ($blocks) must divide bits ($bits)")
    require(bits < 64, s"bits must fit a positive Long, got $bits")
    require(maxBlockBucket >= 2 && maxBlockBucket <= 10000,
      s"maxBlockBucket must be in [2, 10000], got $maxBlockBucket")
    val blockBits = bits / blocks
    val mask = (1L << blockBits) - 1
    // r17 OPTIMIZATION (guide §2.5): the tokenize + 32-bit-sum
    // fingerprint aggregate ran at the parquet split count (2 tasks at
    // bench scale); spread the scan to session parallelism first.
    val fps = simhashFingerprint(
      ScanOps.spreadSmallInput(df, col(idCol)), textCol, idCol, bits)
      .select(col("doc_id"), col("simhash"))
    // literal-array explode with the key assembled ABOVE the Generate —
    // same inlining discipline as [[bandRows]]; the fingerprint sits
    // behind an Aggregate (hard codegen boundary), so nothing heavy can
    // be re-inlined per block anyway.
    //
    // The fingerprint RIDES THROUGH the whole bucket pipeline (it is
    // one long beside the id), so the rerank needs NO joins back to the
    // fingerprint frame — the original three-consumer formulation
    // recomputed the tokenize+32-sum aggregate three times (Spark
    // reuses no subtrees across joins) and measured 4.9 s at sf0.1;
    // single-consumer + window-cap runs the corpus scan exactly once.
    val blockRows = fps
      .select(col("doc_id"), col("simhash"),
        explode(typedlit((0 until blocks).toArray)).as("blk"))
      .select(col("doc_id"), col("simhash"),
        concat_ws("_", col("blk").cast(StringType),
          array((0 until blocks).map(j =>
            shiftright(col("simhash"), j * blockBits).bitwiseAND(lit(mask))): _*)
            .getItem(col("blk")).cast(StringType)).as("block_key"))
    // hot-bucket cap as a count-window on the SAME key the candidate
    // aggregation groups by: one shuffle serves both (vs the
    // count-aggregate + broadcast anti-join form, which scans the
    // fingerprint subtree a second time to build the cap side)
    // r17 OPTIMIZATION (guide §2.5): the count-window + bucket
    // aggregation + C(bucket,2) pair Generate all sit downstream of ONE
    // hash(block_key) exchange whose bytes are tiny while its CPU is
    // seconds — AQE's byte-coalescing folded it to a single task and the
    // whole candidate pipeline ran serially (measured: a 1.8 s one-task
    // stage inside q62). REPARTITION_BY_NUM is exempt from coalescing;
    // the count follows the session's parallelism, never a constant.
    val keptW = org.apache.spark.sql.expressions.Window.partitionBy("block_key")
    val np = df.sparkSession.sparkContext.defaultParallelism
    val kept = blockRows
      .repartition(np, col("block_key"))
      .withColumn("__bucket_size", count(lit(1)).over(keptW))
      .filter(col("__bucket_size") <= maxBlockBucket)
    val cand = kept
      .groupBy(col("block_key"))
      .agg(collect_list(struct(col("doc_id"), col("simhash"))).as("ids"))
      .filter(size(col("ids")) >= 2)
      // struct sort orders by doc_id first: pair enumeration stays
      // (doc_a < doc_b) deterministic
      .select(array_sort(col("ids")).as("ids"))
      // r18 OPTIMIZATION (guide §1.2 — the q152 codegen-Generate lesson;
      // see bandCandidatePairs): same pair stream, no interpreted lambda
      .select(col("ids"), posexplode(col("ids")))
      .select(col("col").as("a"),
        explode(slice(col("ids"), col("pos") + lit(2),
          size(col("ids")))).as("b"))
      .select(col("a.doc_id").as("doc_a"), col("a.simhash").as("sh_a"),
        col("b.doc_id").as("doc_b"), col("b.simhash").as("sh_b"))
      .distinct()
    cand
      .select(col("doc_a"), col("doc_b"),
        bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).cast(LongType)
          .as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  /**
   * Content-defined chunking (the Rabin/Gear discipline at token
   * granularity — LBFS, Muthitacharoen et al. 2001): a chunk boundary
   * falls after token i wherever the hash of the trailing `w`-token
   * window ≡ 0 (mod `divisor`), plus a forced boundary at document
   * end. Because the predicate reads only CONTENT (never position),
   * an insertion early in a document reshuffles at most the chunk it
   * lands in — every later boundary re-synchronizes — which is
   * exactly what fixed-size chunking lacks and why chunk-level dedup
   * survives edits. Expected chunk length is `divisor` tokens; chunk
   * identity is [[hash64]] of the chunk's token span, so two
   * documents sharing any run longer than ~2·divisor tokens share
   * interior chunk hashes verbatim (the q188 span-removal measures
   * token overlap; this emits the DEDUPABLE UNITS).
   *
   * A `minLen` clamp (LBFS's min-size) suppresses boundaries that
   * would cut a chunk shorter than `minLen` tokens — without it,
   * 1–2-token chunks dominate the dup accounting (measured: 73% of
   * base-cohort dup chunks at minLen 1 were ≤ 2 tokens).
   *
   * Scale shape: the q107/q188 explode cost class — one positions
   * pass computes candidate boundaries, they collect per doc (bounded
   * by doc length), and the min-size clamp folds over them
   * sequentially per doc (the clamp is inherently order-dependent;
   * the fold is once per doc, off the hot scan path). Chunk re-slices
   * ride the doc row; only (doc_id, position) rows and per-doc
   * boundary lists shuffle.
   *
   * Output: (doc_id, cstart, clen, chash) — 1-based token start,
   * token count, 60-bit chunk content hash.
   */
  def cdcChunks(df: DataFrame, idCol: String, textCol: String,
      w: Int = 4, divisor: Int = 16, minLen: Int = 3): DataFrame = {
    require(w >= 1 && divisor >= 2 && minLen >= 1)
    val toks = df.select(col(idCol).as("doc_id"),
        tokens(col(textCol)).as("t"))
      .withColumn("nt", size(col("t")))
    // candidate boundaries: pure content predicate, no position input
    val cands = toks
      .select(col("doc_id"), explode(sequence(lit(1), col("nt"))).as("i"))
      .filter(col("i") >= w &&
        hash64(concat_ws(" ", slice(col("t"), col("i") - lit(w - 1),
          lit(w)))) % divisor === 0)
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(col("i"))).as("cb"))
    // the LBFS min-size clamp is inherently sequential (skipping a
    // boundary shifts which later ones are eligible), so it runs as a
    // per-doc array fold — bounded by doc length, once per doc, off
    // the hot scan path (the q188 per-doc array discipline). The
    // forced end-of-doc boundary appends AFTER the clamp: the tail
    // chunk may be short, as in LBFS.
    val kept = toks.join(cands, Seq("doc_id"), "left")
      .withColumn("kept", aggregate(
        coalesce(col("cb"), array().cast("array<int>")),
        array(lit(0)),
        (acc, c) => when(c - element_at(acc, -1) >= minLen,
          concat(acc, array(c))).otherwise(acc)))
      .withColumn("kb",
        when(element_at(col("kept"), -1) === col("nt"), col("kept"))
          .otherwise(concat(col("kept"), array(col("nt")))))
    kept
      .select(col("doc_id"), col("t"), col("kb"),
        explode(sequence(lit(2), size(col("kb")))).as("j"))
      .select(col("doc_id"),
        (element_at(col("kb"), col("j") - 1) + 1).cast(LongType)
          .as("cstart"),
        (element_at(col("kb"), col("j")) -
          element_at(col("kb"), col("j") - 1)).cast(LongType).as("clen"),
        hash64(concat_ws(" ", slice(col("t"),
          element_at(col("kb"), col("j") - 1) + 1,
          element_at(col("kb"), col("j")) -
            element_at(col("kb"), col("j") - 1)))).as("chash"))
  }
}
