package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Tables._
import graft.operators.{Relevance, ScanOps, TextAnalysis, TextPrivacy}

/**
 * Corpus hygiene + retrieval queries: PII redaction (q69), model-based
 * quality filtering (q70), fixed-point BM25 ranking (q71) and inverted
 * indexing (q72). Regex patterns, classifier weights and BM25 constants
 * are shared Scala constants interpolated into BOTH the Spark build and
 * the generated DuckDB oracle — the engines run the same model and must
 * agree bit-for-bit.
 */
object RetrievalQueries {

  /** DuckDB twins of the engine-wide tokenizer/stopword helpers. */
  private def sqlWsTokens(text: String) =
    s"string_split_regex(lower($text), '\\s+')"
  private def sqlHits(toks: String, words: Seq[String]) = {
    val lits = words.map(w => s"'$w'").mkString(", ")
    s"len(list_filter($toks, t -> list_contains([$lits], t)))"
  }
  /** q69 deterministic PII injection: every doc gets one synthetic PII
    * item by doc_id mod 3 (email / URL / phone) — the corpus itself is
    * letters-only, so injection makes the redaction observable (the
    * DedupQueries injected-duplicate discipline). */
  private def injectedSpark(textCol: String) =
    when(col("doc_id") % 3 === 0,
      concat(col(textCol), lit(" contact user"), col("doc_id"),
        lit("@mail.example.com now")))
      .when(col("doc_id") % 3 === 1,
        concat(col(textCol), lit(" see https://site"), col("doc_id"),
          lit(".example.org/a?b=1 ok")))
      .otherwise(concat(col(textCol), lit(" call +358-40-"),
        lit(1000000L) + col("doc_id") % 9000000L, lit(" end")))
  private val injectedSql =
    """CASE WHEN doc_id % 3 = 0 THEN
         text || ' contact user' || doc_id || '@mail.example.com now'
       WHEN doc_id % 3 = 1 THEN
         text || ' see https://site' || doc_id || '.example.org/a?b=1 ok'
       ELSE text || ' call +358-40-' || (1000000 + doc_id % 9000000)
         || ' end' END"""

  val Bm25QueryTerms = Seq("spark", "join", "window")
  val Bm25K = 10

  /** q191 nDCG evaluation depth (matches the BM25 list depth) and the
    * "title" window: a term among the doc's first 10 whitespace tokens
    * grades 3 — a position signal BM25 cannot see, so the measured
    * nDCG is genuinely < 1. */
  val NdcgK = 10
  val NdcgTitleTokens = 10
  val PostingCap = 8
  val IndexMinDf = 5L

  /** q181 RRF fusion: ranker depth, fused top-k, canonical K = 60
    * damping, 10⁹ contribution scale. */
  val RrfDepth = 20
  val RrfTopK = 10
  val RrfDamp = 60
  val RrfScale = 1000000000L

  /** q202 RBO evaluation depth (matches the other eval depths). */
  val RboK = 10

  /** The BM25 oracle CTE chain through ranked list `r` — shared by q71
    * (which selects it directly) and q181 (which fuses it with a
    * second ranker), so a scoring-lattice change cannot silently gate
    * two different formulas. */
  private def bm25CtesSql: String = bm25CtesSql(recursive = false)

  /** `recursive = true` emits WITH RECURSIVE (q191 appends the q180
    * log2-lattice CTE to the chain; DuckDB requires the keyword on the
    * whole WITH list). */
  private def bm25CtesSql(recursive: Boolean): String = {
    val lits = Bm25QueryTerms.map(t => s"'$t'").mkString(", ")
    val M = Relevance.Milli
    val K1 = Relevance.K1Milli
    val B = Relevance.BMilli
    s"""
        WITH ${if (recursive) "RECURSIVE " else ""}tok AS (SELECT doc_id, lower(t) AS term FROM (
            SELECT doc_id,
              unnest(regexp_split_to_array(text, '[^A-Za-z]+')) AS t
            FROM documents)
          WHERE length(t) >= ${Relevance.DefaultMinTermLen}),
        dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
        corpus AS (SELECT count(*) AS n_docs, CAST(sum(dl) AS BIGINT) AS sum_dl
          FROM dl),
        tf AS (SELECT term, doc_id, count(*) AS tf FROM tok
          WHERE term IN ($lits) GROUP BY term, doc_id),
        dfx AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
        s1 AS (SELECT t.term, t.doc_id, t.tf, x.df, l.dl, c.n_docs,
            ($M * c.sum_dl) // c.n_docs AS avgdl_m
          FROM tf t JOIN dl l USING (doc_id) JOIN dfx x USING (term)
          CROSS JOIN corpus c),
        s2 AS (SELECT *, ($M * (n_docs - df + 1)) // (df + 1) AS idf_m,
            ${M - B} + ($B * dl * $M) // avgdl_m AS norm_m
          FROM s1),
        s3 AS (SELECT term, doc_id, tf, df, idf_m,
            (tf * ${M + K1} * $M) // (tf * $M + ($K1 * norm_m) // $M) AS tfc_m
          FROM s2),
        s4 AS (SELECT term, doc_id, tf, df,
            (idf_m * tfc_m) // $M AS score_m
          FROM s3),
        r AS (SELECT term, doc_id, tf, df, score_m,
            CAST(row_number() OVER (PARTITION BY term
              ORDER BY score_m DESC, doc_id) AS BIGINT) AS rnk
          FROM s4)"""
  }

  /** q97 tf-idf cosine join: corpus-relative rare-term cap (df ≤ 10% of
    * N — an absolute cap empties the feature space as N grows), idf
    * scale, cosine threshold in centi-units (60 → cos ≥ 0.60), near-dup
    * injection stride. */
  val TfidfDfCapPm = 100L
  val TfidfIdfScale = 100L
  val TfidfTauBp = 60
  val TfidfDupMod = 20L; val TfidfDupShift = 700000L

  /** q298/q299 posting cap: candidates only from each term's K
    * strongest postings — candidate volume ≤ vocab·K², the linear
    * scale path beside q97's exact (but Σdf²-growing) join. */
  val TfidfPostingCap = 8

  /** q142 phrase-search query set (adjacent word pairs present in the
    * synthetic vocabulary) and result depth per phrase. */
  val PhraseList = Seq(("table", "part"), ("fast", "scan"), ("agg", "row"))
  val PhraseTopK = 10

  val all: Map[String, GraftQuery] = Map(

    // ------------------------------------------------------------------
    // q69 — PII redaction (TextPrivacy.redact): URL → email → phone
    // masking with per-kind counts, gated on the md5 of the fully
    // redacted text (so every masked byte is verified, not just the
    // counts). Patterns live in the Java∩RE2 regex subset and are
    // interpolated verbatim into both engines. Pure per-row projection —
    // the 100 TB shape is "runs at the scan".
    // ------------------------------------------------------------------
    "q69_pii_redaction" -> GraftQuery(
      build = (s, d) => {
        val injected = documents(s, d)
          .select(col("doc_id"), injectedSpark("text").as("pii_text"))
        val (urls, emails, phones) = TextPrivacy.piiCounts(col("pii_text"))
        ScanOps.spreadSmallInput(injected, col("doc_id"))
          .select(col("doc_id"),
            urls.cast("long").as("n_urls"),
            emails.cast("long").as("n_emails"),
            phones.cast("long").as("n_phones"),
            md5(TextPrivacy.redact(col("pii_text")).cast("binary"))
              .as("red_md5"),
            length(TextPrivacy.redact(col("pii_text"))).cast("long")
              .as("red_len"))
          .orderBy("doc_id")
      },
      oracle = Some {
        // DuckDB single-quoted literals are escape-free: the Scala-level
        // `\.` / `\+` backslashes pass through to RE2 verbatim, exactly
        // as Spark's Java regex sees them.
        val u = TextPrivacy.UrlRe
        val e = TextPrivacy.EmailRe
        val p = TextPrivacy.PhoneRe
        s"""
        WITH inj AS (SELECT doc_id, $injectedSql AS pii_text FROM documents),
        st AS (SELECT doc_id, pii_text,
            regexp_replace(pii_text, '$u', '${TextPrivacy.UrlMask}', 'g')
              AS no_url
          FROM inj),
        st2 AS (SELECT doc_id, pii_text, no_url,
            regexp_replace(no_url, '$e', '${TextPrivacy.EmailMask}', 'g')
              AS no_email
          FROM st)
        SELECT doc_id,
          CAST(len(regexp_extract_all(pii_text, '$u')) AS BIGINT) AS n_urls,
          CAST(len(regexp_extract_all(no_url, '$e')) AS BIGINT) AS n_emails,
          CAST(len(regexp_extract_all(no_email, '$p')) AS BIGINT) AS n_phones,
          md5(regexp_replace(no_email, '$p', '${TextPrivacy.PhoneMask}', 'g'))
            AS red_md5,
          CAST(length(regexp_replace(no_email, '$p',
            '${TextPrivacy.PhoneMask}', 'g')) AS BIGINT) AS red_len
        FROM st2 ORDER BY doc_id"""
      }),

    // ------------------------------------------------------------------
    // q70 — model-based quality filter (TextAnalysis.qualityClassify):
    // the fastText-style classifier stage as a fixed-point linear model —
    // milli-scaled integer features (stopword ratio, digit cleanliness,
    // saturating length), one integer dot product, one threshold. The
    // whole decision hash-gates cross-engine, which a float classifier
    // never could. Per-row projection, no shuffle.
    // ------------------------------------------------------------------
    "q70_quality_classifier" -> GraftQuery(
      build = (s, d) =>
        TextAnalysis.qualityClassify(
          ScanOps.spreadSmallInput(
            documents(s, d).select(col("doc_id"), col("text")),
            col("doc_id")),
          "text")
          .select(col("doc_id"), col("n_tokens"), col("sw_hits"),
            col("sw_ratio_m"), col("clean_m"), col("len_m"), col("score_m"),
            col("keep").cast("int").as("keep"))
          .orderBy("doc_id"),
      oracle = Some {
        import TextAnalysis._
        s"""
        WITH f AS (SELECT doc_id,
            CAST(len(${sqlWsTokens("text")}) AS BIGINT) AS n_tokens,
            CAST(${sqlHits(sqlWsTokens("text"), stopwords("en"))} AS BIGINT)
              AS sw_hits,
            CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g'))
              AS BIGINT) AS digit_chars,
            CAST(length(text) AS BIGINT) AS n_chars
          FROM documents),
        m AS (SELECT doc_id, n_tokens, sw_hits,
            CASE WHEN n_tokens > 0 THEN (1000 * sw_hits) // n_tokens
              ELSE 0 END AS sw_ratio_m,
            CASE WHEN n_chars > 0
              THEN 1000 - (1000 * digit_chars) // n_chars
              ELSE 0 END AS clean_m,
            least(1000, (1000 * n_tokens) // $QcLengthSaturation) AS len_m
          FROM f)
        SELECT doc_id, n_tokens, sw_hits, sw_ratio_m, clean_m, len_m,
          ($QcWeightStopword * sw_ratio_m + $QcWeightCleanliness * clean_m
            + $QcWeightLength * len_m) // 1000 AS score_m,
          CAST(($QcWeightStopword * sw_ratio_m + $QcWeightCleanliness * clean_m
            + $QcWeightLength * len_m) // 1000 >= $QcKeepThresholdMilli
            AS INTEGER) AS keep
        FROM m ORDER BY doc_id"""
      }),

    // ------------------------------------------------------------------
    // q71 — fixed-point BM25 top-k (Relevance.bm25TopK): lexical
    // retrieval over the corpus for a fixed query-term set. idf and
    // length-norm are integer rationals of corpus counts (milli-units on
    // longs) — rank-equivalent to ln-idf within a fixed corpus and
    // bit-reproducible cross-engine. The term filter is pushed into the
    // first tf aggregation; corpus constants ride a broadcast 1-row
    // frame; per-term top-k is a WindowGroupLimit.
    // ------------------------------------------------------------------
    "q71_bm25" -> GraftQuery(
      build = (s, d) =>
        Relevance.bm25TopK(
          ScanOps.spreadSmallInput(
            documents(s, d).select(col("doc_id"), col("text")),
            col("doc_id")),
          "doc_id", "text", Bm25QueryTerms, Bm25K)
          .orderBy("term", "rnk"),
      oracle = Some(s"""
        $bm25CtesSql
        SELECT term, doc_id, tf, df, score_m, rnk FROM r
        WHERE rnk <= $Bm25K ORDER BY term, rnk""")),

    // ------------------------------------------------------------------
    // q72 — inverted index (Relevance.invertedIndex): term → document
    // frequency, total tf, and a CAPPED sorted posting sample emitted as
    // CSV (array columns round-trip differently through the two engines'
    // pandas paths). Two map-side-combined aggregates; the posting cap
    // is the scale guard against O(corpus) stopword rows.
    // ------------------------------------------------------------------
    "q72_inverted_index" -> GraftQuery(
      build = (s, d) =>
        Relevance.invertedIndex(
          ScanOps.spreadSmallInput(
            documents(s, d).select(col("doc_id"), col("text")),
            col("doc_id")),
          "doc_id", "text", PostingCap, IndexMinDf)
          .select(col("term"), col("df"), col("tf_total"),
            array_join(col("posting_sample"), ",").as("posting_csv"))
          .orderBy("term"),
      oracle = Some(s"""
        WITH tok AS (SELECT doc_id, lower(t) AS term FROM (
            SELECT doc_id,
              unnest(regexp_split_to_array(text, '[^A-Za-z]+')) AS t
            FROM documents)
          WHERE length(t) >= ${Relevance.DefaultMinTermLen}),
        tf AS (SELECT term, doc_id, count(*) AS tf FROM tok
          GROUP BY term, doc_id)
        SELECT term, count(*) AS df, CAST(sum(tf) AS BIGINT) AS tf_total,
          array_to_string((list(doc_id ORDER BY doc_id))[1:$PostingCap], ',')
            AS posting_csv
        FROM tf GROUP BY term HAVING count(*) >= $IndexMinDf
        ORDER BY term""")),

    // ------------------------------------------------------------------
    // q97 — sparse tf-idf cosine similarity join (Relevance.
    // tfidfCosinePairs): document pairs with cosine ≥ 0.60 over
    // rare-term (df ≤ N/10) tf-idf vectors — the weight-aware lexical
    // near-match detector beside the hash (q23) and embedding (q26)
    // stacks. Integer idf rational, decimal128-exact dots/norms, and a
    // fixed-shape double threshold (dot·dot)·10⁴ ≥ τ²·n2a·n2b. An
    // injected near-dup slice (every 20th doc re-inserted with one
    // extra token) must surface; the df cap is the hot-bucket guard
    // that keeps the postings self-join off stopwords.
    // ------------------------------------------------------------------
    "q97_tfidf_cosine_join" -> GraftQuery(
      build = (s, d) => {
        val base = documents(s, d).select(col("doc_id"), col("text"))
        val dup = base.filter(col("doc_id") % TfidfDupMod === 0)
          .select((col("doc_id") + TfidfDupShift).as("doc_id"),
            concat(col("text"), lit(" zqx")).as("text"))
        Relevance.tfidfCosinePairs(
          ScanOps.spreadSmallInput(base.unionByName(dup), col("doc_id")),
          "doc_id", "text", TfidfDfCapPm, TfidfIdfScale, TfidfTauBp)
          .orderBy("doc_a", "doc_b")
      },
      oracle = Some(s"""
        WITH base(doc_id, text) AS (
          SELECT doc_id, text FROM documents
          UNION ALL
          SELECT doc_id + $TfidfDupShift, text || ' zqx' FROM documents
          WHERE doc_id % $TfidfDupMod = 0),
        tok AS (SELECT doc_id, lower(t) AS term FROM (
            SELECT doc_id,
              unnest(regexp_split_to_array(text, '[^A-Za-z]+')) AS t
            FROM base)
          WHERE length(t) >= ${Relevance.DefaultMinTermLen}),
        tf AS (SELECT term, doc_id, count(*) AS tf FROM tok
          GROUP BY term, doc_id),
        n AS (SELECT count(*) AS n_docs FROM base),
        kept AS (SELECT term, doc_id, tf,
            count(*) OVER (PARTITION BY term) AS df
          FROM tf, n QUALIFY df * 1000 <= n.n_docs * $TfidfDfCapPm),
        w AS (SELECT term, doc_id,
            CAST(tf AS HUGEINT) *
              ((CAST(n.n_docs AS HUGEINT) * $TfidfIdfScale) // df) AS w
          FROM kept, n),
        norms AS (SELECT doc_id, sum(w * w) AS n2 FROM w GROUP BY doc_id),
        p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
            sum(a.w * b.w) AS dot, count(*) AS n_shared
          FROM w a JOIN w b ON a.term = b.term AND a.doc_id < b.doc_id
          GROUP BY 1, 2),
        j AS (SELECT doc_a, doc_b, CAST(dot AS DOUBLE) AS dot, n_shared,
            CAST(na.n2 AS DOUBLE) AS n2a, CAST(nb.n2 AS DOUBLE) AS n2b
          FROM p JOIN norms na ON p.doc_a = na.doc_id
            JOIN norms nb ON p.doc_b = nb.doc_id)
        SELECT doc_a, doc_b, dot, n_shared, n2a, n2b FROM j
        WHERE dot * dot * 10000.0 >=
          ${(TfidfTauBp.toLong * TfidfTauBp).toDouble} * n2a * n2b
        ORDER BY doc_a, doc_b""")),

    // ------------------------------------------------------------------
    // q298 — posting-capped tf-idf cosine pairs (Relevance.
    // tfidfCosinePairsCapped): q97 with the in-plan candidate cap the
    // r16 scale adjudication calls for — candidates only from each
    // term's 8 strongest postings (w desc, doc_id asc), so candidate
    // volume is ≤ vocab·K² (linear in vocabulary) instead of Σdf²
    // (quadratic when df grows with the corpus); the dot/norms of the
    // surviving candidates are EXACT over the full capped-df vectors.
    // Same dup-slice input as q97 so the two are directly comparable;
    // q299 measures the recall trade.
    // ------------------------------------------------------------------
    "q298_tfidf_capped_pairs" -> GraftQuery(
      build = (s, d) => {
        val base = documents(s, d).select(col("doc_id"), col("text"))
        val dup = base.filter(col("doc_id") % TfidfDupMod === 0)
          .select((col("doc_id") + TfidfDupShift).as("doc_id"),
            concat(col("text"), lit(" zqx")).as("text"))
        Relevance.tfidfCosinePairsCapped(
          ScanOps.spreadSmallInput(base.unionByName(dup), col("doc_id")),
          "doc_id", "text", TfidfDfCapPm, TfidfIdfScale, TfidfTauBp,
          TfidfPostingCap)
          .orderBy("doc_a", "doc_b")
      },
      oracle = Some(s"""
        WITH base(doc_id, text) AS (
          SELECT doc_id, text FROM documents
          UNION ALL
          SELECT doc_id + $TfidfDupShift, text || ' zqx' FROM documents
          WHERE doc_id % $TfidfDupMod = 0),
        tok AS (SELECT doc_id, lower(t) AS term FROM (
            SELECT doc_id,
              unnest(regexp_split_to_array(text, '[^A-Za-z]+')) AS t
            FROM base)
          WHERE length(t) >= ${Relevance.DefaultMinTermLen}),
        tf AS (SELECT term, doc_id, count(*) AS tf FROM tok
          GROUP BY term, doc_id),
        n AS (SELECT count(*) AS n_docs FROM base),
        kept AS (SELECT term, doc_id, tf,
            count(*) OVER (PARTITION BY term) AS df
          FROM tf, n QUALIFY df * 1000 <= n.n_docs * $TfidfDfCapPm),
        w AS (SELECT term, doc_id, df,
            CAST(tf AS HUGEINT) *
              ((CAST(n.n_docs AS HUGEINT) * $TfidfIdfScale) // df) AS w
          FROM kept, n),
        r AS (SELECT term, doc_id, w,
            row_number() OVER (PARTITION BY term
              ORDER BY w DESC, doc_id) AS rn FROM w),
        cand AS (SELECT term, doc_id FROM r WHERE rn <= $TfidfPostingCap),
        cp AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM cand a JOIN cand b
            ON a.term = b.term AND a.doc_id < b.doc_id),
        norms AS (SELECT doc_id, sum(w * w) AS n2 FROM w GROUP BY doc_id),
        p AS (SELECT doc_a, doc_b, sum(wa.w * wb.w) AS dot,
            CAST(count(*) AS BIGINT) AS n_shared
          FROM cp JOIN w wa ON wa.doc_id = cp.doc_a
            JOIN w wb ON wb.doc_id = cp.doc_b AND wb.term = wa.term
          GROUP BY 1, 2),
        j AS (SELECT doc_a, doc_b, CAST(dot AS DOUBLE) AS dot, n_shared,
            CAST(na.n2 AS DOUBLE) AS n2a, CAST(nb.n2 AS DOUBLE) AS n2b
          FROM p JOIN norms na ON p.doc_a = na.doc_id
            JOIN norms nb ON p.doc_b = nb.doc_id)
        SELECT doc_a, doc_b, dot, n_shared, n2a, n2b FROM j
        WHERE dot * dot * 10000.0 >=
          ${(TfidfTauBp.toLong * TfidfTauBp).toDouble} * n2a * n2b
        ORDER BY doc_a, doc_b""")),

    // ------------------------------------------------------------------
    // q299 — posting-cap truncation accounting (Relevance.
    // tfidfCapAccounting): one summary row measuring q298's recall
    // trade — admitted vs truncated terms, postings in/out of candidate
    // generation, and the candidate-pair bound Σmin(df,K)² vs the
    // uncapped Σdf² — truncation as an auditable number (the q72/q297
    // discipline), never a silent drop.
    // ------------------------------------------------------------------
    "q299_tfidf_cap_accounting" -> GraftQuery(
      build = (s, d) => {
        val base = documents(s, d).select(col("doc_id"), col("text"))
        val dup = base.filter(col("doc_id") % TfidfDupMod === 0)
          .select((col("doc_id") + TfidfDupShift).as("doc_id"),
            concat(col("text"), lit(" zqx")).as("text"))
        Relevance.tfidfCapAccounting(
          ScanOps.spreadSmallInput(base.unionByName(dup), col("doc_id")),
          "doc_id", "text", TfidfDfCapPm, TfidfIdfScale, TfidfPostingCap)
      },
      oracle = Some(s"""
        WITH base(doc_id, text) AS (
          SELECT doc_id, text FROM documents
          UNION ALL
          SELECT doc_id + $TfidfDupShift, text || ' zqx' FROM documents
          WHERE doc_id % $TfidfDupMod = 0),
        tok AS (SELECT doc_id, lower(t) AS term FROM (
            SELECT doc_id,
              unnest(regexp_split_to_array(text, '[^A-Za-z]+')) AS t
            FROM base)
          WHERE length(t) >= ${Relevance.DefaultMinTermLen}),
        tf AS (SELECT term, doc_id, count(*) AS tf FROM tok
          GROUP BY term, doc_id),
        n AS (SELECT count(*) AS n_docs FROM base),
        kept AS (SELECT term, doc_id, tf,
            count(*) OVER (PARTITION BY term) AS df
          FROM tf, n QUALIFY df * 1000 <= n.n_docs * $TfidfDfCapPm),
        w AS (SELECT term, doc_id, df,
            CAST(tf AS HUGEINT) *
              ((CAST(n.n_docs AS HUGEINT) * $TfidfIdfScale) // df) AS w
          FROM kept, n),
        r AS (SELECT term, df, row_number() OVER (PARTITION BY term
            ORDER BY w DESC, doc_id) AS rn FROM w),
        t AS (SELECT term, max(df) AS df,
            sum(CASE WHEN rn <= $TfidfPostingCap THEN 1 ELSE 0 END) AS kept
          FROM r GROUP BY term)
        SELECT CAST(count(*) AS BIGINT) AS n_terms_admitted,
          CAST(sum(CASE WHEN df > $TfidfPostingCap THEN 1 ELSE 0 END)
            AS BIGINT) AS n_terms_truncated,
          CAST(sum(kept) AS BIGINT) AS postings_in_candidates,
          CAST(sum(df - kept) AS BIGINT) AS postings_dropped,
          CAST(sum(kept * kept) AS BIGINT) AS cand_pair_bound2,
          CAST(sum(df * df) AS BIGINT) AS uncapped_pair_bound2
        FROM t""")),

    // ------------------------------------------------------------------
    // q302 — posting-cap RECALL audit (Relevance.tfidfCapRecallAudit):
    // the q136 ANN-recall-audit discipline applied to the capped
    // tf-idf path (r16 verdict gap 3) — one summary row with the exact
    // vs capped pair counts, retained/missed/phantom splits, the
    // recall ppm at K=8, and the worst missed pair's cos² ppm.
    // n_phantom doubles as the containment property (capped ⊆ exact)
    // measured as an oracle-gated ZERO. Offline/sampled-slice
    // diagnostic by design: it pays the exact join's Σdf² cost to have
    // truth to compare against — the production path stays q298.
    // ------------------------------------------------------------------
    "q302_tfidf_cap_recall_audit" -> GraftQuery(
      build = (s, d) => {
        val base = documents(s, d).select(col("doc_id"), col("text"))
        val dup = base.filter(col("doc_id") % TfidfDupMod === 0)
          .select((col("doc_id") + TfidfDupShift).as("doc_id"),
            concat(col("text"), lit(" zqx")).as("text"))
        Relevance.tfidfCapRecallAudit(
          ScanOps.spreadSmallInput(base.unionByName(dup), col("doc_id")),
          "doc_id", "text", TfidfDfCapPm, TfidfIdfScale, TfidfTauBp,
          TfidfPostingCap)
      },
      oracle = Some(s"""
        WITH base(doc_id, text) AS (
          SELECT doc_id, text FROM documents
          UNION ALL
          SELECT doc_id + $TfidfDupShift, text || ' zqx' FROM documents
          WHERE doc_id % $TfidfDupMod = 0),
        tok AS (SELECT doc_id, lower(t) AS term FROM (
            SELECT doc_id,
              unnest(regexp_split_to_array(text, '[^A-Za-z]+')) AS t
            FROM base)
          WHERE length(t) >= ${Relevance.DefaultMinTermLen}),
        tf AS (SELECT term, doc_id, count(*) AS tf FROM tok
          GROUP BY term, doc_id),
        n AS (SELECT count(*) AS n_docs FROM base),
        kept AS (SELECT term, doc_id, tf,
            count(*) OVER (PARTITION BY term) AS df
          FROM tf, n QUALIFY df * 1000 <= n.n_docs * $TfidfDfCapPm),
        w AS (SELECT term, doc_id,
            CAST(tf AS HUGEINT) *
              ((CAST(n.n_docs AS HUGEINT) * $TfidfIdfScale) // df) AS w
          FROM kept, n),
        norms AS (SELECT doc_id, sum(w * w) AS n2 FROM w GROUP BY doc_id),
        pe AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
            sum(a.w * b.w) AS dot
          FROM w a JOIN w b ON a.term = b.term AND a.doc_id < b.doc_id
          GROUP BY 1, 2),
        je AS (SELECT doc_a, doc_b, CAST(dot AS DOUBLE) AS dot,
            CAST(na.n2 AS DOUBLE) AS n2a, CAST(nb.n2 AS DOUBLE) AS n2b
          FROM pe JOIN norms na ON pe.doc_a = na.doc_id
            JOIN norms nb ON pe.doc_b = nb.doc_id),
        e AS (SELECT doc_a, doc_b, dot, n2a, n2b, 1 AS in_e FROM je
          WHERE dot * dot * 10000.0 >=
            ${(TfidfTauBp.toLong * TfidfTauBp).toDouble} * n2a * n2b),
        r AS (SELECT term, doc_id, w,
            row_number() OVER (PARTITION BY term
              ORDER BY w DESC, doc_id) AS rn FROM w),
        cand AS (SELECT term, doc_id FROM r WHERE rn <= $TfidfPostingCap),
        cp AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM cand a JOIN cand b
            ON a.term = b.term AND a.doc_id < b.doc_id),
        pc AS (SELECT doc_a, doc_b, sum(wa.w * wb.w) AS dot
          FROM cp JOIN w wa ON wa.doc_id = cp.doc_a
            JOIN w wb ON wb.doc_id = cp.doc_b AND wb.term = wa.term
          GROUP BY 1, 2),
        jc AS (SELECT doc_a, doc_b, CAST(dot AS DOUBLE) AS dot,
            CAST(na.n2 AS DOUBLE) AS n2a, CAST(nb.n2 AS DOUBLE) AS n2b
          FROM pc JOIN norms na ON pc.doc_a = na.doc_id
            JOIN norms nb ON pc.doc_b = nb.doc_id),
        c AS (SELECT doc_a, doc_b, 1 AS in_c FROM jc
          WHERE dot * dot * 10000.0 >=
            ${(TfidfTauBp.toLong * TfidfTauBp).toDouble} * n2a * n2b),
        fo AS (SELECT dot, n2a, n2b, in_e, in_c
          FROM e FULL JOIN c USING (doc_a, doc_b))
        SELECT CAST(sum(coalesce(in_e, 0)) AS BIGINT) AS n_exact_pairs,
          CAST(sum(coalesce(in_c, 0)) AS BIGINT) AS n_capped_pairs,
          CAST(sum(CASE WHEN in_e = 1 AND in_c = 1 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_retained,
          CAST(sum(CASE WHEN in_e = 1 AND in_c IS NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_missed,
          CAST(sum(CASE WHEN in_e IS NULL AND in_c = 1 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_phantom,
          (1000000 * CAST(sum(CASE WHEN in_e = 1 AND in_c = 1
              THEN 1 ELSE 0 END) AS BIGINT))
            // CAST(sum(coalesce(in_e, 0)) AS BIGINT) AS recall_ppm,
          CAST(max(CASE WHEN in_e = 1 AND in_c IS NULL THEN
            floor(dot * dot * 1000000.0 / (n2a * n2b)) END) AS BIGINT)
            AS max_missed_cos2_ppm
        FROM fo""")),

    // ------------------------------------------------------------------
    // q142 — exact phrase search over positional postings
    // (Relevance.phraseSearch): occurrences of each two-word phrase per
    // document, top-10 docs per phrase. The adjacency test is a pure
    // EQUI-join — (phrase, doc, pos+1) meets (phrase, doc, pos) — so
    // cost is the posting-intersection bound, never a corpus rescan;
    // the phrase table broadcasts. Positions index the FULL lowercase
    // token sequence (no min-length gate — adjacency must see every
    // word); the oracle counts adjacent pairs straight off the token
    // arrays, so agreement proves the positional index's positions.
    // ------------------------------------------------------------------
    "q142_phrase_search" -> GraftQuery(
      build = (s, d) => {
        Relevance.phraseSearch(
            documents(s, d).select(col("doc_id"), col("text")),
            "doc_id", "text", PhraseList, PhraseTopK)
          .orderBy("phrase", "rnk")
      },
      oracle = Some {
        val phraseValues = PhraseList.map { case (a, b) =>
          s"('$a $b', '$a', '$b')" }.mkString(", ")
        s"""
        WITH toks AS (SELECT doc_id,
            list_filter(regexp_split_to_array(lower(text), '[^a-z]+'),
              t -> t <> '') AS ts
          FROM documents),
        ph(phrase, a, b) AS (VALUES $phraseValues),
        cnt AS (SELECT ph.phrase, t.doc_id,
            CAST(len(list_filter(range(1, len(ts)),
              i -> ts[i] = ph.a AND ts[i + 1] = ph.b)) AS BIGINT) AS n
          FROM toks t CROSS JOIN ph),
        r AS (SELECT phrase, doc_id, n,
            CAST(row_number() OVER (PARTITION BY phrase
              ORDER BY n DESC, doc_id) AS BIGINT) AS rnk
          FROM cnt WHERE n > 0)
        SELECT phrase, doc_id, n, rnk FROM r WHERE rnk <= $PhraseTopK
        ORDER BY phrase, rnk"""
      }),

    // ------------------------------------------------------------------
    // q181 — reciprocal-rank fusion (Relevance.rrfFuse): the standard
    // hybrid-retrieval merge (Cormack et al., SIGIR'09) — per query
    // term, the BM25 top-20 fuses with a raw-frequency top-20 by
    // RRF(d) = Σ ⌊10⁹/(60 + rank)⌋, rewarding docs BOTH rankers
    // surface without comparing incommensurable scores. Integer
    // contributions (a float 1/(K+r) sum is association-order-
    // dependent); fusion runs on ranker-output-sized frames only, so
    // its cost is corpus-size-independent. n_lists is the consensus
    // diagnostic.
    // ------------------------------------------------------------------
    "q181_rrf_fusion" -> GraftQuery(
      build = (s, d) => {
        val docs = ScanOps.spreadSmallInput(
          documents(s, d).select(col("doc_id"), col("text")),
          col("doc_id"))
        val bm25 = Relevance
          .bm25TopK(docs, "doc_id", "text", Bm25QueryTerms, RrfDepth)
          .select(col("term"), col("doc_id"), col("rnk"))
        val toks = Relevance.tokenStream(docs, "doc_id", "text")
        val byTf = Window.partitionBy("term")
          .orderBy(col("tf").desc, col("doc_id"))
        val rawTf = toks
          .filter(col("term").isin(Bm25QueryTerms: _*))
          .groupBy(col("term"), col("doc_id"))
          .agg(count(lit(1)).as("tf"))
          .withColumn("rnk", row_number().over(byTf).cast("long"))
          .filter(col("rnk") <= RrfDepth)
          .select(col("term"), col("doc_id"), col("rnk"))
        Relevance.rrfFuse(bm25, rawTf, "term", "doc_id", RrfTopK,
            RrfDamp, RrfScale)
          .orderBy("term", "rnk")
      },
      oracle = Some(s"""
        $bm25CtesSql,
        fa AS (SELECT term, doc_id, rnk FROM r WHERE rnk <= $RrfDepth),
        fb AS (SELECT term, doc_id, rnk FROM (
            SELECT term, doc_id,
              CAST(row_number() OVER (PARTITION BY term
                ORDER BY tf DESC, doc_id) AS BIGINT) AS rnk
            FROM tf) WHERE rnk <= $RrfDepth),
        u AS (SELECT term, doc_id, $RrfScale // ($RrfDamp + rnk) AS c
            FROM fa
          UNION ALL
          SELECT term, doc_id, $RrfScale // ($RrfDamp + rnk) FROM fb),
        fused AS (SELECT term, doc_id, CAST(sum(c) AS BIGINT) AS rrf,
            CAST(count(*) AS BIGINT) AS n_lists
          FROM u GROUP BY term, doc_id),
        rr AS (SELECT term, doc_id, rrf, n_lists,
            CAST(row_number() OVER (PARTITION BY term
              ORDER BY rrf DESC, doc_id) AS BIGINT) AS rnk
          FROM fused)
        SELECT term, doc_id, rrf, n_lists, rnk FROM rr
        WHERE rnk <= $RrfTopK ORDER BY term, rnk""")),

    // ------------------------------------------------------------------
    // q191 — nDCG@k ranking evaluation (Relevance.ndcgAtK): BM25's
    // top-10 per query term scored against a graded truth — grade 3
    // for a TITLE hit (term among the doc's first 10 tokens, a
    // relevance signal BM25's bag-of-words scoring cannot see — which
    // is what makes the measurement discriminating instead of
    // vacuously 1.0), else min(tf, 2) — normalized by the ideal DCG
    // of that truth. The
    // discount is the EXACT Q20 fixed-point log2 lattice of the native
    // Log2Q20 expression (q180's machinery), so ndcg_ppm itself
    // hash-gates; the oracle replays the lattice with the linear
    // 20-step recursive CTE over the 10-position rank spine and
    // re-derives DCG/IDCG integer-for-integer. Evaluation cost is
    // ranker-output-sized — corpus-independent by construction.
    // ------------------------------------------------------------------
    "q191_ndcg_eval" -> GraftQuery(
      build = (s, d) => {
        val docs = ScanOps.spreadSmallInput(
          documents(s, d).select(col("doc_id"), col("text")),
          col("doc_id"))
        val ranked = Relevance.bm25TopK(docs, "doc_id", "text",
          Bm25QueryTerms, NdcgK)
        val titles = docs.select(col("doc_id"),
          slice(split(lower(col("text")), "\\s+"), 1, NdcgTitleTokens)
            .as("head"))
        val truth = Relevance.tokenStream(docs, "doc_id", "text")
          .filter(col("term").isin(Bm25QueryTerms: _*))
          .groupBy("term", "doc_id").agg(count(lit(1)).as("tf"))
          .join(titles, Seq("doc_id"))
          .select(col("term"), col("doc_id"),
            when(array_contains(col("head"), col("term")), lit(3L))
              .otherwise(least(col("tf"), lit(2L))).as("grade"))
        Relevance.ndcgAtK(ranked, truth, "term", "doc_id", NdcgK)
          .orderBy("term")
      },
      oracle = Some(s"""
        ${bm25CtesSql(recursive = true)},
        rkspine AS (SELECT unnest(range(1, ${NdcgK + 1})) AS i),
        n0 AS (SELECT i, i + 1 AS m FROM rkspine),
        m0 AS (SELECT i, m, length(bin(m)) - 1 AS hb FROM n0),
        mant AS (SELECT i, hb,
            CASE WHEN hb >= 30 THEN m >> (hb - 30)
              ELSE m << (30 - hb) END AS x
          FROM m0),
        lgx AS (
          SELECT i, hb, x, 0 AS it, CAST(0 AS BIGINT) AS frac FROM mant
          UNION ALL
          SELECT i, hb,
            CASE WHEN x * x >= 2305843009213693952 THEN (x * x) >> 31
              ELSE (x * x) >> 30 END,
            it + 1,
            frac * 2 + CASE WHEN x * x >= 2305843009213693952
              THEN 1 ELSE 0 END
          FROM lgx WHERE it < 20),
        disc AS (SELECT i, (hb << 20) + frac AS l FROM lgx WHERE it = 20),
        ttl AS (SELECT doc_id,
            (${sqlWsTokens("text")})[1:$NdcgTitleTokens] AS head
          FROM documents),
        tr AS (SELECT tf.term, tf.doc_id,
            CASE WHEN list_contains(head, tf.term) THEN 3
              ELSE least(tf, 2) END AS grade
          FROM tf JOIN ttl ON tf.doc_id = ttl.doc_id),
        dc AS (SELECT r.term, coalesce(tr.grade, 0) AS grade0, d.l
          FROM r JOIN disc d ON d.i = r.rnk
          LEFT JOIN tr ON tr.term = r.term AND tr.doc_id = r.doc_id
          WHERE r.rnk <= $NdcgK),
        dper AS (SELECT term, CAST(count(*) AS BIGINT) AS n_ranked,
            CAST(sum((grade0 * ${Relevance.NdcgScale}) // l) AS BIGINT)
              AS dcg_fp
          FROM dc GROUP BY term),
        ir AS (SELECT term, doc_id, grade, row_number() OVER (
            PARTITION BY term ORDER BY grade DESC, doc_id) AS irn
          FROM tr),
        ic AS (SELECT term,
            CAST(sum((grade * ${Relevance.NdcgScale}) // l) AS BIGINT)
              AS idcg_fp
          FROM ir JOIN disc d ON d.i = ir.irn
          WHERE irn <= $NdcgK GROUP BY term)
        SELECT coalesce(dper.term, ic.term) AS term,
          coalesce(n_ranked, 0) AS n_ranked,
          coalesce(dcg_fp, 0) AS dcg_fp,
          coalesce(idcg_fp, 0) AS idcg_fp,
          CASE WHEN coalesce(idcg_fp, 0) > 0
            THEN (coalesce(dcg_fp, 0) * 1000000) // idcg_fp END
            AS ndcg_ppm
        FROM dper FULL JOIN ic ON dper.term = ic.term
        ORDER BY term""")),

    // ------------------------------------------------------------------
    // q202 — rank-biased overlap (Relevance.rboOverlap): how much two
    // RANKERS agree, truth-free and top-weighted — the list-vs-list
    // complement to q191's list-vs-truth nDCG, over the same ranker
    // pair q181 fuses (BM25 vs raw-tf). The geometric p^d weights are
    // an integer Q20 lattice (P(d) = (P(d−1)·p) >> 20) and each common
    // item contributes its max-rank suffix mass via one broadcast
    // lookup, so the per-depth sum never materializes and cost is
    // ranker-output-sized. The oracle replays the lattice with a
    // linear recursive CTE + a suffix-sum window. BM25's idf and
    // length-norm genuinely reorder the tf list, so the measured RBO
    // sits strictly inside (0, 1) — a real disagreement readout, not
    // a degenerate 1.
    // ------------------------------------------------------------------
    "q202_rbo_overlap" -> GraftQuery(
      build = (s, d) => {
        val docs = ScanOps.spreadSmallInput(
          documents(s, d).select(col("doc_id"), col("text")),
          col("doc_id"))
        val bm25 = Relevance
          .bm25TopK(docs, "doc_id", "text", Bm25QueryTerms, RboK)
          .select(col("term"), col("doc_id"), col("rnk"))
        val toks = Relevance.tokenStream(docs, "doc_id", "text")
        val byTf = Window.partitionBy("term")
          .orderBy(col("tf").desc, col("doc_id"))
        val rawTf = toks
          .filter(col("term").isin(Bm25QueryTerms: _*))
          .groupBy(col("term"), col("doc_id"))
          .agg(count(lit(1)).as("tf"))
          .withColumn("rnk", row_number().over(byTf).cast("long"))
          .filter(col("rnk") <= RboK)
          .select(col("term"), col("doc_id"), col("rnk"))
        Relevance.rboOverlap(bm25, rawTf, "term", "doc_id", RboK)
          .orderBy("q")
      },
      oracle = Some(s"""
        ${bm25CtesSql(recursive = true)},
        fa AS (SELECT term, doc_id, rnk FROM r WHERE rnk <= $RboK),
        fb AS (SELECT term, doc_id, rnk FROM (
            SELECT term, doc_id,
              CAST(row_number() OVER (PARTITION BY term
                ORDER BY tf DESC, doc_id) AS BIGINT) AS rnk
            FROM tf) WHERE rnk <= $RboK),
        pw AS (
          SELECT 1 AS d, CAST(${Relevance.RboPQ20} AS BIGINT) AS p
          UNION ALL
          SELECT d + 1, (p * ${Relevance.RboPQ20}) >> 20
          FROM pw WHERE d < $RboK),
        sv AS (SELECT d AS m,
            sum(p // d) OVER (ORDER BY d
              ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS s
          FROM pw),
        cm AS (SELECT fa.term, greatest(fa.rnk, fb.rnk) AS m
          FROM fa JOIN fb ON fa.term = fb.term
            AND fa.doc_id = fb.doc_id),
        ms AS (SELECT term, count(*) AS n_common, sum(s) AS mass
          FROM cm JOIN sv USING (m) GROUP BY term),
        ca AS (SELECT term, CAST(count(*) AS BIGINT) AS n_a
          FROM fa GROUP BY 1),
        cb AS (SELECT term, CAST(count(*) AS BIGINT) AS n_b
          FROM fb GROUP BY 1)
        SELECT coalesce(ca.term, cb.term) AS q,
          coalesce(n_a, 0) AS n_a, coalesce(n_b, 0) AS n_b,
          CAST(coalesce(n_common, 0) AS BIGINT) AS n_common,
          CAST(((${1L << 20} - ${Relevance.RboPQ20}) *
            coalesce(mass, 0)) // ${Relevance.RboPQ20} AS BIGINT)
            AS rbo_q20
        FROM ca FULL JOIN cb ON ca.term = cb.term
        LEFT JOIN ms ON coalesce(ca.term, cb.term) = ms.term
        ORDER BY q""")),

    // ------------------------------------------------------------------
    // q211 — precision / recall / AP@k (Relevance.prAtK): the binary
    // evaluation triple over the same BM25 ranking q191 grades — truth
    // here is PURELY positional (term among the doc's first 10 ws
    // tokens, the corpus is letters-only so a head hit is a real term
    // hit), a signal BM25's bag-of-words scoring cannot see: measured
    // P@10 sits strictly inside (0,1) (~36% of candidates are titled,
    // probed 138-155 relevant per term at sf0.01), recall@10 is
    // honestly small against ~140 relevant docs, and AP@10's
    // position-weighted fractions are exact on the lcm(1..10) = 2520
    // common denominator. Evaluation cost is ranker-output-sized.
    // ------------------------------------------------------------------
    "q211_precision_recall_at_k" -> GraftQuery(
      build = (s, d) => {
        val docs = ScanOps.spreadSmallInput(
          documents(s, d).select(col("doc_id"), col("text")),
          col("doc_id"))
        val ranked = Relevance.bm25TopK(docs, "doc_id", "text",
            Bm25QueryTerms, NdcgK)
          .select(col("term"), col("doc_id"), col("rnk"))
        val truth = docs
          .select(col("doc_id"),
            slice(split(lower(col("text")), "\\s+"), 1, NdcgTitleTokens)
              .as("head"),
            explode(array(Bm25QueryTerms.map(lit): _*)).as("term"))
          .filter(array_contains(col("head"), col("term")))
          .select(col("term"), col("doc_id"))
        Relevance.prAtK(ranked, truth, "term", "doc_id", NdcgK)
          .orderBy("term")
      },
      oracle = Some(s"""
        $bm25CtesSql,
        ttl AS (SELECT doc_id,
            (${sqlWsTokens("text")})[1:$NdcgTitleTokens] AS head
          FROM documents),
        tr AS (SELECT q.term, ttl.doc_id FROM ttl,
            (SELECT unnest(['${Bm25QueryTerms.mkString("','")}'])
              AS term) q
          WHERE list_contains(head, q.term)),
        nr AS (SELECT term, CAST(count(*) AS BIGINT) AS n_rel
          FROM tr GROUP BY term),
        rk AS (SELECT r.term, r.rnk,
            CASE WHEN tr.doc_id IS NULL THEN 0 ELSE 1 END AS rel0
          FROM r LEFT JOIN tr ON r.term = tr.term
            AND r.doc_id = tr.doc_id
          WHERE r.rnk <= $NdcgK),
        cw AS (SELECT term, rnk, rel0,
            sum(rel0) OVER (PARTITION BY term ORDER BY rnk
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
          FROM rk),
        ag AS (SELECT term, CAST(count(*) AS BIGINT) AS n_ranked,
            CAST(sum(rel0) AS BIGINT) AS hits,
            CAST(sum(rel0 * cum * (2520 // rnk)) AS BIGINT) AS ap_scaled
          FROM cw GROUP BY term)
        SELECT ag.term AS term, n_ranked, coalesce(n_rel, 0) AS n_rel,
          hits,
          (1000000 * hits) // n_ranked AS p_ppm,
          CASE WHEN coalesce(n_rel, 0) > 0
            THEN (1000000 * hits) // n_rel END AS r_ppm,
          CASE WHEN coalesce(n_rel, 0) > 0 THEN (1000000 * ap_scaled) //
            (2520 * least(n_rel, $NdcgK)) END AS ap_ppm
        FROM ag LEFT JOIN nr ON ag.term = nr.term
        ORDER BY term"""))
  )
}
