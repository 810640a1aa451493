package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import Tables._
import graft.operators.{CorpusAssembly, TextAnalysis}
import graft.operators.TextAnalysis._

/**
 * Text-analysis queries over `documents`, oracle-gated. Stopword lists,
 * tie-break priority, quality weights and the fingerprint modulus are
 * single Scala constants shared with the generated DuckDB SQL.
 *
 * Note: the synthetic corpus is English-ish word soup under every `lang`
 * label, so q27 verifies the DETERMINISM of the heuristic across engines,
 * not NLP accuracy — accuracy over this corpus is meaningless by
 * construction (its `is_match` column records exactly that).
 */
object TextQueries {

  private def sqlTokens(text: String) = s"string_split_regex(lower($text), '\\s+')"

  /** DuckDB twin of TextAnalysis.stopwordHits (multiset semantics). */
  private def sqlHits(toks: String, words: Seq[String]) = {
    val lits = words.map(w => s"'$w'").mkString(", ")
    s"len(list_filter($toks, t -> list_contains([$lits], t)))"
  }

  /** DuckDB twin of charClassCount; DuckDB needs the 'g' flag for
    * replace-all, Spark replaces all by default. */
  private def sqlClassCount(text: String, cls: String) =
    s"(length($text) - length(regexp_replace($text, '$cls', '', 'g')))"

  /** q46 per-mille mix rates, shared with the generated oracle CASE.
    * (Declared before `all` — its oracle is generated from this map at
    * object initialization.) */
  val SampleRates: Map[String, Int] =
    Map("en" -> 500, "de" -> 250, "es" -> 250, "fr" -> 125, "zh" -> 100)

  /** q48 seeded repetitive document (one phrase 30×), shared verbatim by
    * both engines. No quote characters — embedded as a SQL literal. */
  val RepetitionFixtureText: String = Seq.fill(30)("spam ham eggs").mkString(" ")

  /** q94 mixture document budget; q95 chunk window geometry (60-char
    * overlap). */
  val MixTargetDocs = 100000L
  val ChunkSize = 180
  val ChunkStride = 120

  /** q85 quality gates (length floor + whitespace-token floor). */
  val Q85MinChars = 200L
  val Q85MinTokens = 30L

  /** q110 bigram-LM size (see the q110 registry comment). */
  val LmTopK = 500

  /** q257 stupid-backoff model geometry: K₃ trigrams of the corpus's
    * ~27k possible, K₂ = 400 of ≤ ~900 possible bigrams, K₁ = 25 of
    * the ~30-word vocabulary — sized so every backoff rule carries
    * real mass at every SF (see the q257 registry comment). */
  val BackoffTopK3 = 300
  val BackoffTopK2 = 400
  val BackoffTopK1 = 25

  /** The landed whole-corpus stupid-backoff model (train once per
    * process, shared by q257/q261/q262 — the q90/q91 artifact rule). */
  private def rawLmDir(s: org.apache.spark.sql.SparkSession,
      d: String): String =
    Landings.landedPath(s"backoff_lm:$d") { dir =>
      TextAnalysis.trainBackoffLm(
        documents(s, d).select(col("text")), "text",
        BackoffTopK3, BackoffTopK2, BackoffTopK1)
        .write.mode("overwrite").parquet(dir)
    }

  /** The landed TARGET-slice backoff model for q262's importance
    * ratio: trained on the English documents only. */
  private def enLmDir(s: org.apache.spark.sql.SparkSession,
      d: String): String =
    Landings.landedPath(s"backoff_lm_en:$d") { dir =>
      TextAnalysis.trainBackoffLm(
        documents(s, d).filter(col("lang") === "en").select(col("text")),
        "text", BackoffTopK3, BackoffTopK2, BackoffTopK1)
        .write.mode("overwrite").parquet(dir)
    }

  /** q128 curriculum: length tier = n_chars div this, capped at 3
    * (short docs first — the easy→hard staging); 64 hash-prefix buckets
    * per tier for the two-level global-ordinal decomposition. */
  val CurriculumTierChars = 2000L; val CurriculumBuckets = 64

  /** q113 collocation floor and table size. */
  val LiftMinCount = 5L
  val LiftTopK = 50

  /** DuckDB twin of TextDedup.hash64 (q112; DedupQueries has its own). */
  private def sqlHash64(c: String) =
    s"CAST(('0x' || substr(md5($c), 1, 15)) AS BIGINT)"

  /** q86 BPE training geometry: top-200 word vocab, 3 merge rounds,
    * top-20 post-training pair table. */
  val BpeVocab = 200
  val BpeMerges = 3
  val BpeTopK = 20

  /** The corpus word stream both BPE queries train/encode over:
    * lowercase alpha runs, length 3–12 (q86's geometry). */
  private def bpeWords(s: org.apache.spark.sql.SparkSession, d: String) =
    documents(s, d)
      .select(col("doc_id"),
        explode(split(lower(col("text")), "[^a-z]+")).as("w"))
      .filter(length(col("w")).between(3, 12))

  /** The trained BPE model, landed ONCE per process per sf dir (the
    * VERDICT r7 #1 consistency fix): the 3 sequential training rounds —
    * the expensive, corpus-scanning step — run inside the landing, and
    * both q86 (rule inspection) and q91 (encode) read the stored
    * (step, pair, weight) artifact instead of re-training per consumer.
    * Same land-once/read-many discipline as the shingle index
    * (TextDedup.landShingleIndex) and the materialized PQ codebook
    * (VectorSearch.pqTrainCodebooks). */
  private def bpeModelDir(s: org.apache.spark.sql.SparkSession, d: String): String =
    Landings.landedPath(s"bpe_rules:$d") { dir =>
      graft.operators.BpeTrainer.landRules(
        s, bpeWords(s, d).select("w"), "w", BpeVocab, BpeMerges, BpeTopK, dir)
    }

  /** DuckDB twins of BpeTrainer.pairCounts / applyMerge, and the shared
    * training prolog both BPE oracles extend (q86 with the post-training
    * pair table, q91 with the per-word encode chain) — ONE copy of the
    * count→argmax→merge CTE chain, with the round count GENERATED from
    * [[BpeMerges]], so a tie-break or geometry change cannot silently
    * diverge the two gates.
    *
    * Early-exhaustion guard: a round whose pair table is EMPTY (training
    * exhausted — the Spark trainer stops) yields the sentinel no-op rule
    * `'¤ ¤'` instead of zero rows. '¤' cannot occur in the lowercase-
    * alpha token space, so the sentinel's replace never matches — and
    * every m_i CTE is guaranteed exactly ONE row, keeping q91's encode
    * cross join row-preserving where an empty m_i would silently drop
    * every document. q86 filters the sentinel out of its rule rows,
    * matching the Spark trainer's early stop. */
  val BpeNoopRule = "¤ ¤"
  private def bpePairsOfSql(v: String) = s"""
          SELECT pair, CAST(sum(cnt) AS BIGINT) AS weight FROM (
            SELECT cnt, unnest(list_transform(range(1, len(t)),
              i -> t[i] || ' ' || t[i + 1])) AS pair
            FROM (SELECT cnt, string_split(substr(s, 2, length(s) - 2), '||')
              AS t FROM $v))
          GROUP BY pair"""
  private def bpeMergedSql(v: String, m: String) = s"""
          SELECT regexp_replace($v.s,
              '\\|' || split_part($m.pair, ' ', 1) || '\\|\\|'
                || split_part($m.pair, ' ', 2) || '\\|',
              '|' || replace($m.pair, ' ', '') || '|', 'g') AS s, $v.cnt
          FROM $v, $m"""
  private def bpeRoundSql(i: Int) = s"""
        p$i AS (${bpePairsOfSql(s"v${i - 1}")}),
        m$i AS ((SELECT pair, weight FROM p$i ORDER BY weight DESC, pair LIMIT 1)
          UNION ALL (SELECT '$BpeNoopRule', 0
          WHERE (SELECT count(*) FROM p$i) = 0)),
        v$i AS (${bpeMergedSql(s"v${i - 1}", s"m$i")})"""
  private def bpeTrainPrologSql = s"""
        WITH w AS (
          SELECT w AS word, count(*) AS cnt FROM (
            SELECT unnest(string_split_regex(lower(text), '[^a-z]+')) AS w
            FROM documents)
          WHERE length(w) BETWEEN 3 AND 12
          GROUP BY w ORDER BY cnt DESC, word LIMIT $BpeVocab),
        v0 AS (SELECT '|' || array_to_string(
            list_filter(string_split(word, ''), c -> c <> ''), '||') || '|'
            AS s, cnt FROM w),
        ${(1 to BpeMerges).map(bpeRoundSql).mkString(",\n")}"""

  /** DuckDB twin of TextDedup.shingles for word bigrams (the q48 gram
    * unit; mirrors DedupQueries' general-n helper at n = 2). */
  private def sqlBigrams(t: String): String =
    s"""CASE WHEN len($t) >= 2
        THEN list_transform(range(1, len($t)), i -> array_to_string($t[i:i+1], ' '))
        ELSE [array_to_string($t, ' ')] END"""

  /** q165 boilerplate geometry: 8-word aligned blocks; a block
    * repeating in ≥ 20 distinct same-source docs is chrome. The
    * injected banner is 9 words, so block 0 is pure banner (identical
    * source-wide) and block 1 onward mixes into per-doc content —
    * exactly one flagged block per doc at sf ≥ 0.01 (~25+ docs per
    * source) and honestly zero at sf0.001 (~2 docs per source). */
  val BoilBlockWords = 8
  val BoilMinDf = 20

  /** q294/q295 unigram-LM geometry: top-200 training words (the q86
    * vocabulary discipline), 150 seeded multi-char candidates, 80 kept
    * after the EM prune (+ every corpus character for coverage). */
  val UniVocab = 200
  val UniSeed = 150
  val UniKeep = 80

  /** The landed unigram-LM model (train once per process per sf dir —
    * the q86/q90 artifact rule); q294 inspects it, q295 encodes with
    * it. Trained over the SAME word stream as the BPE pair (lowercase
    * alpha runs, length 3–12) so the two tokenizer families are
    * directly comparable. */
  private def uniModelDir(s: org.apache.spark.sql.SparkSession,
      d: String): String =
    Landings.landedPath(s"unigram_model:$d") { dir =>
      graft.operators.UnigramLM.landModel(
        s, bpeWords(s, d).select("w"), "w", UniVocab, UniSeed, UniKeep,
        dir)
    }

  /** DuckDB twin of the FixedLog.log2q20 lattice over a (piece, m)
    * source — the q180 20-step LINEAR recursive CTE, factored so the
    * unigram oracle can instantiate it twice (seed scores, pruned
    * scores). Emits `$name`(piece, lg). */
  private def uniLgSql(name: String, src: String): String = s"""
        ${name}_m AS (SELECT piece, m, length(bin(m)) - 1 AS hb
          FROM $src ${name}_s),
        ${name}_x AS (SELECT piece, hb,
            CASE WHEN hb >= 30 THEN m >> (hb - 30)
              ELSE m << (30 - hb) END AS x
          FROM ${name}_m),
        ${name}_it AS (
          SELECT piece, hb, x, 0 AS i, CAST(0 AS BIGINT) AS frac
          FROM ${name}_x
          UNION ALL
          SELECT piece, hb,
            CASE WHEN x * x >= 2305843009213693952 THEN (x * x) >> 31
              ELSE (x * x) >> 30 END,
            i + 1,
            frac * 2 + CASE WHEN x * x >= 2305843009213693952
              THEN 1 ELSE 0 END
          FROM ${name}_it WHERE i < 20),
        $name AS MATERIALIZED (SELECT piece, (hb << 20) + frac AS lg
          FROM ${name}_it WHERE i = 20)"""

  /** DuckDB twin of UnigramLM.viterbi: the DP unrolled to
    * WordMaxLen=12 MATERIALIZED level CTEs (levels i−1..i−4 feed level
    * i — unmaterialized, DuckDB would re-inline the shared levels into
    * ~4^12 paths, the same blow-up localCheckpoint pins on the Spark
    * side), arg-min per word via row_number ORDER BY (cost, np, seg) —
    * the struct-min order. Emits `${tag}_v`(word, cost, np, seg). */
  private def uniViterbiSql(tag: String, wordsSrc: String,
      costSrc: String): String = {
    val pMax = graft.operators.UnigramLM.PieceMaxLen
    val maxLen = graft.operators.UnigramLM.WordMaxLen
    val lvls = (1 to maxLen).map { i =>
      val cands = (1 to math.min(pMax, i)).map { k =>
        s"""SELECT b.word, b.cost + p.pcost AS cost, b.np + 1 AS np,
              b.seg || '|' || p.piece AS seg
            FROM ${tag}_l${i - k} b JOIN $costSrc p
              ON length(p.piece) = $k
              AND p.piece = substr(b.word, ${i - k + 1}, $k)
            WHERE length(b.word) >= $i"""
      }.mkString("\n          UNION ALL\n          ")
      s"""${tag}_l$i AS MATERIALIZED (
          SELECT word, cost, np, seg FROM (
            SELECT word, cost, np, seg, row_number() OVER (
                PARTITION BY word ORDER BY cost, np, seg) AS rn
            FROM ($cands) ${tag}_c$i) ${tag}_r$i
          WHERE rn = 1)"""
    }
    val fin = (1 to maxLen)
      .map(i =>
        s"SELECT word, cost, np, seg FROM ${tag}_l$i WHERE length(word) = $i")
      .mkString("\n          UNION ALL ")
    s"""${tag}_l0 AS (SELECT word, CAST(0 AS BIGINT) AS cost,
          CAST(0 AS BIGINT) AS np, '' AS seg FROM $wordsSrc ${tag}_w),
        ${lvls.mkString(",\n        ")},
        ${tag}_v AS MATERIALIZED ($fin)"""
  }

  /** The shared unigram-LM training prolog both q294 and q295 extend —
    * word stream → char/substring seeds → Q20 seed costs → E-step 1 →
    * prune → Q20 pruned costs (`ucost1`), every stage generated from
    * the SAME constants as the Spark trainer. '¤' keys the total row
    * inside the log CTEs (outside the lowercase-alpha piece space). */
  private def uniPrologSql: String = s"""
        WITH RECURSIVE uws AS MATERIALIZED (
          SELECT doc_id, w FROM (
            SELECT doc_id,
              unnest(string_split_regex(lower(text), '[^a-z]+')) AS w
            FROM documents) uws_r
          WHERE length(w) BETWEEN 3 AND 12),
        uchars AS (SELECT piece, CAST(count(*) AS BIGINT) AS seed_w
          FROM (SELECT unnest(string_split(w, '')) AS piece FROM uws) uc_r
          WHERE length(piece) = 1 GROUP BY piece),
        uvoc AS MATERIALIZED (
          SELECT w AS word, CAST(count(*) AS BIGINT) AS cnt
          FROM uws GROUP BY w ORDER BY cnt DESC, word LIMIT $UniVocab),
        umulti AS (SELECT piece, CAST(sum(cnt) AS BIGINT) AS seed_w
          FROM (SELECT cnt, unnest(flatten(list_transform(
                range(2, ${graft.operators.UnigramLM.PieceMaxLen + 1}),
                k -> list_filter(
                  list_transform(range(1, length(word) + 1),
                    i -> substr(word, i, k)),
                  p -> length(p) = k)))) AS piece
            FROM uvoc) um_r
          GROUP BY piece ORDER BY seed_w DESC, piece LIMIT $UniSeed),
        umodel0 AS MATERIALIZED (SELECT piece, seed_w FROM uchars
          UNION ALL SELECT piece, seed_w FROM umulti),
        ulg0src AS (SELECT piece, seed_w AS m FROM umodel0
          UNION ALL SELECT '¤',
            CAST((SELECT sum(seed_w) FROM umodel0) AS BIGINT)),
        ${uniLgSql("ulg0", "ulg0src")},
        ucost0 AS MATERIALIZED (SELECT mm.piece,
            (SELECT lg FROM ulg0 WHERE piece = '¤') - l.lg AS pcost
          FROM umodel0 mm JOIN ulg0 l ON mm.piece = l.piece),
        ${uniViterbiSql("ue1", "(SELECT word FROM uvoc)", "ucost0")},
        uuse1 AS MATERIALIZED (
          SELECT piece, CAST(sum(cnt) AS BIGINT) AS u_cnt FROM (
            SELECT v.word, unnest(string_split(v.seg, '|')) AS piece
            FROM ue1_v v) sp JOIN uvoc ON sp.word = uvoc.word
          WHERE length(piece) >= 1 GROUP BY piece),
        ukept AS MATERIALIZED (
          SELECT piece, u_cnt, u_cnt + 1 AS b FROM (
            SELECT c.piece, coalesce(u.u_cnt, 0) AS u_cnt
            FROM uchars c LEFT JOIN uuse1 u ON c.piece = u.piece
            UNION ALL
            SELECT piece, u_cnt FROM (
              SELECT piece, u_cnt FROM uuse1 WHERE length(piece) >= 2
              ORDER BY u_cnt DESC, piece LIMIT $UniKeep) ukm) uk_r),
        ulg1src AS (SELECT piece, b AS m FROM ukept
          UNION ALL SELECT '¤',
            CAST((SELECT sum(b) FROM ukept) AS BIGINT)),
        ${uniLgSql("ulg1", "ulg1src")},
        ucost1 AS MATERIALIZED (SELECT k.piece,
            (SELECT lg FROM ulg1 WHERE piece = '¤') - l.lg AS pcost
          FROM ukept k JOIN ulg1 l ON k.piece = l.piece)"""

  val all: Map[String, GraftQuery] = Map(

    // ------------------------------------------------------------------
    // q27 — language ID: CJK-char gate, then argmax of per-language
    // stopword hit counts with fixed tie-break priority. Pure per-row
    // expressions; the only shuffle is the final presentation sort.
    // ------------------------------------------------------------------
    "q27_lang_id" -> GraftQuery(
      build = (s, d) =>
        graft.operators.ScanOps.spreadSmallInput(documents(s, d), col("doc_id"))
          .select(col("doc_id"), col("lang").as("labeled_lang"),
            predictedLang(col("text")).as("predicted_lang"))
          .withColumn("is_match",
            (col("predicted_lang") === col("labeled_lang")).cast(IntegerType))
          .orderBy("doc_id"),
      oracle = Some {
        val scores = scoredLangs.map(l => s"${sqlHits("toks", stopwords(l))} AS s_$l")
          .mkString(",\n            ")
        val m = scoredLangs.map(l => s"s_$l").mkString("greatest(", ", ", ")")
        val argmax = scoredLangs.init.foldRight(s"'${scoredLangs.last}'") {
          case (l, els) => s"CASE WHEN s_$l = m THEN '$l' ELSE $els END"
        }
        s"""
        WITH toks AS (SELECT doc_id, lang, text, ${sqlTokens("text")} AS toks
          FROM documents),
        scored AS (SELECT doc_id, lang, text,
            $scores
          FROM toks),
        m AS (SELECT *, $m AS m FROM scored),
        pred AS (SELECT doc_id, lang AS labeled_lang,
            CASE WHEN ${sqlClassCount("text", "[\\x{4e00}-\\x{9fff}]")} > length(text) * 0.05
                 THEN 'zh'
                 WHEN m = 0 THEN 'und'
                 ELSE $argmax END AS predicted_lang
          FROM m)
        SELECT doc_id, labeled_lang, predicted_lang,
          CAST(predicted_lang = labeled_lang AS INT) AS is_match
        FROM pred ORDER BY doc_id"""
      }),

    // ------------------------------------------------------------------
    // q28 — per-document quality features + composite score (the corpus-
    // filtering feature set). Integer counts divided as doubles:
    // bit-deterministic cross-engine.
    // ------------------------------------------------------------------
    "q28_text_quality" -> GraftQuery(
      build = (s, d) =>
        qualityFeatures(graft.operators.ScanOps.spreadSmallInput(documents(s, d), col("doc_id")), "text")
          .select(col("doc_id"), col("n_chars_m"), col("n_tokens"),
            col("avg_token_len"), col("punct_ratio"), col("digit_ratio"),
            col("stopword_ratio"), col("quality_score"))
          .orderBy("doc_id"),
      oracle = Some(s"""
        WITH f AS (SELECT doc_id,
            CAST(length(text) AS BIGINT) AS n_chars_m,
            CAST(len(${sqlTokens("text")}) AS BIGINT) AS n_tokens,
            ${sqlClassCount("text", "\\s")} AS ws_chars,
            ${sqlClassCount("text", "[.,!?;:]")} AS punct_chars,
            ${sqlClassCount("text", "[0-9]")} AS digit_chars,
            ${sqlHits(sqlTokens("text"), stopwords("en"))} AS sw_hits
          FROM documents)
        SELECT doc_id, n_chars_m, n_tokens,
          CAST(n_chars_m - ws_chars AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS avg_token_len,
          CAST(punct_chars AS DOUBLE) / CAST(n_chars_m AS DOUBLE) AS punct_ratio,
          CAST(digit_chars AS DOUBLE) / CAST(n_chars_m AS DOUBLE) AS digit_ratio,
          CAST(sw_hits AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS stopword_ratio,
          0.4 * (CAST(sw_hits AS DOUBLE) / CAST(n_tokens AS DOUBLE))
            + 0.3 * (1.0 - CAST(punct_chars AS DOUBLE) / CAST(n_chars_m AS DOUBLE))
            + 0.2 * (CASE WHEN n_tokens >= 10 THEN 1.0 ELSE 0.0 END)
            + 0.1 * (1.0 - CAST(digit_chars AS DOUBLE) / CAST(n_chars_m AS DOUBLE)) AS quality_score
        FROM f ORDER BY doc_id""")),

    // ------------------------------------------------------------------
    // q29 — corpus token budgeting per (lang, source): whitespace tokens,
    // BPE-ish wordpieces, chars/4 BPE estimate. Per-row counting at scan
    // speed, one map-side-combined aggregation.
    // ------------------------------------------------------------------
    "q29_token_stats" -> GraftQuery(
      build = (s, d) =>
        graft.operators.ScanOps.spreadSmallInput(documents(s, d), col("doc_id"))
          .select(col("lang"), col("source"),
            wsTokenCount(col("text")).as("ws_toks"),
            wordpieceCount(col("text")).as("pieces"),
            bpeEstimate(col("n_chars")).as("bpe_est"))
          .groupBy(col("lang"), col("source"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("ws_toks")).as("sum_ws_tokens"),
            sum(col("pieces")).as("sum_wordpieces"),
            sum(col("bpe_est")).as("sum_bpe_est"),
            (sum(col("ws_toks")).cast(DoubleType)
              / count(lit(1)).cast(DoubleType)).as("avg_tokens_per_doc"))
          .orderBy("lang", "source"),
      oracle = Some(s"""
        WITH f AS (SELECT lang, source,
            CAST(len(${sqlTokens("text")}) AS BIGINT) AS ws_toks,
            CAST(len(list_filter(string_split_regex(text, '[^A-Za-z0-9]+'),
              p -> length(p) > 0)) AS BIGINT) AS pieces,
            CAST(floor(CAST(n_chars + 3 AS DOUBLE) / 4.0) AS BIGINT) AS bpe_est
          FROM documents)
        SELECT lang, source, count(*) AS n_docs,
          CAST(sum(ws_toks) AS BIGINT) AS sum_ws_tokens,
          CAST(sum(pieces) AS BIGINT) AS sum_wordpieces,
          CAST(sum(bpe_est) AS BIGINT) AS sum_bpe_est,
          CAST(sum(ws_toks) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avg_tokens_per_doc
        FROM f GROUP BY lang, source ORDER BY lang, source""")),

    // ------------------------------------------------------------------
    // q30 — rolling polynomial fingerprint: strict left fold of
    // (h·31 + codepoint) mod P over characters. Shuffle-free per-row.
    // ------------------------------------------------------------------
    "q30_doc_fingerprint" -> GraftQuery(
      build = (s, d) =>
        graft.operators.ScanOps.spreadSmallInput(documents(s, d), col("doc_id"))
          .select(col("doc_id"), rollingFingerprint(col("text")).as("fingerprint"))
          .orderBy("doc_id"),
      oracle = Some(s"""
        SELECT doc_id,
          CASE WHEN length(text) = 0 THEN 0
               ELSE list_reduce(
                 list_transform(string_split(text, ''), c -> CAST(ascii(c) AS BIGINT)),
                 (acc, c) -> (acc * 31 + c) % $FingerprintMod) END AS fingerprint
        FROM documents ORDER BY doc_id""")),

    // ------------------------------------------------------------------
    // q45 — context-window packing: documents fill 512-token training
    // sequences by cumulative whitespace-token count, next-fit within a
    // shard (bin = floor(tokens_before / budget)). The window partitions
    // by shard so packing never needs a global sort — each shard packs
    // independently at any scale. One window + one aggregation.
    // ------------------------------------------------------------------
    "q45_context_packing" -> GraftQuery(
      build = (s, d) => {
        val docs = graft.operators.ScanOps
          .spreadSmallInput(documents(s, d), col("doc_id"))
          .select(col("doc_id"), (col("doc_id") % 8).as("shard"),
            wsTokenCount(col("text")).as("n_tokens"))
        CorpusAssembly.binStats(
          CorpusAssembly.packBins(docs, "doc_id", "n_tokens", "shard", 512L),
          "shard", "n_tokens", "doc_id")
          .orderBy("shard", "bin")
      },
      oracle = Some(s"""
        WITH t AS (SELECT doc_id, doc_id % 8 AS shard,
            CAST(len(${sqlTokens("text")}) AS BIGINT) AS n_tokens FROM documents),
        c AS (SELECT doc_id, shard, n_tokens,
            coalesce(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
          FROM t),
        b AS (SELECT shard, doc_id, n_tokens,
            CAST(floor(CAST(cum_before AS DOUBLE) / 512.0) AS BIGINT) AS bin
          FROM c)
        SELECT shard, bin, count(*) AS n_docs,
          CAST(sum(n_tokens) AS BIGINT) AS tokens_packed,
          min(doc_id) AS first_doc, max(doc_id) AS last_doc
        FROM b GROUP BY shard, bin ORDER BY shard, bin""")),

    // ------------------------------------------------------------------
    // q48 — repetition / boilerplate metrics (the Gopher-rule family):
    // top-bigram fraction and duplicate-gram fraction per document,
    // with the keep/drop verdict of the standard thresholds. A seeded
    // slice of one phrase repeated 30× (every 25th doc, re-inserted)
    // must be flagged. Two map-side-combined aggregations; only
    // (doc_id, gram) pairs shuffle.
    // ------------------------------------------------------------------
    "q48_repetition_filter" -> GraftQuery(
      build = (s, d) => {
        val docs = documents(s, d).select(col("doc_id"), col("text"))
        val rep = docs.filter(col("doc_id") % 25 === 0)
          .select((col("doc_id") + 300000).as("doc_id"),
            lit(RepetitionFixtureText).as("text"))
        TextAnalysis.repetitionMetrics(
          graft.operators.ScanOps.spreadSmallInput(docs.union(rep), col("doc_id")),
          "text", "doc_id")
          .withColumn("keep",
            (col("top_gram_fraction") <= 0.2 && col("dup_gram_fraction") <= 0.3)
              .cast(IntegerType))
          .orderBy("doc_id")
      },
      oracle = Some(s"""
        WITH base(doc_id, text) AS (
          SELECT doc_id, text FROM documents
          UNION ALL
          SELECT doc_id + 300000, '$RepetitionFixtureText' FROM documents
          WHERE doc_id % 25 = 0),
        tok AS (SELECT doc_id, ${sqlTokens("text")} AS t FROM base),
        g AS (SELECT doc_id, unnest(${sqlBigrams("t")}) AS g FROM tok),
        counts AS (SELECT doc_id, g, count(*) AS c FROM g GROUP BY doc_id, g),
        m AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_grams,
            count(*) AS n_distinct_grams, CAST(max(c) AS BIGINT) AS top_c
          FROM counts GROUP BY doc_id)
        SELECT doc_id, n_grams, n_distinct_grams,
          CAST(top_c AS DOUBLE) / CAST(n_grams AS DOUBLE) AS top_gram_fraction,
          1.0 - CAST(n_distinct_grams AS DOUBLE) / CAST(n_grams AS DOUBLE) AS dup_gram_fraction,
          CAST(CAST(top_c AS DOUBLE) / CAST(n_grams AS DOUBLE) <= 0.2
            AND 1.0 - CAST(n_distinct_grams AS DOUBLE) / CAST(n_grams AS DOUBLE) <= 0.3
            AS INT) AS keep
        FROM m ORDER BY doc_id""")),

    // ------------------------------------------------------------------
    // q46 — deterministic stratified sampling (corpus mixing): keep a
    // document iff its content-hash per-mille bucket falls under its
    // language's rate. Hash-keyed (not rand()): the sample is exactly
    // reproducible on any cluster, and lowering a rate yields a strict
    // subset. Per-row filter at scan speed; the rates here mimic a
    // typical mix (upweight en, downweight zh).
    // ------------------------------------------------------------------
    "q46_stratified_sample" -> GraftQuery(
      build = (s, d) =>
        CorpusAssembly.stratifiedSample(
          graft.operators.ScanOps.spreadSmallInput(documents(s, d), col("doc_id"))
            .select(col("doc_id"), col("lang"), col("text")),
          "text", "lang", SampleRates)
          .select(col("doc_id"), col("lang"), col("hash_bucket"))
          .orderBy("doc_id"),
      oracle = Some {
        val rateCase = SampleRates.toSeq.sortBy(_._1)
          .map { case (l, r) => s"WHEN '$l' THEN $r" }
          .mkString("CASE lang ", " ", " ELSE 0 END")
        s"""
        WITH h AS (SELECT doc_id, lang,
            (CAST(('0x' || substr(md5(text), 1, 15)) AS BIGINT)) % ${CorpusAssembly.RateDenominator} AS hash_bucket
          FROM documents)
        SELECT doc_id, lang, hash_bucket FROM h
        WHERE hash_bucket < $rateCase
        ORDER BY doc_id"""
      }),

    // ------------------------------------------------------------------
    // q85 — the END-TO-END corpus build: language gate → quality gate →
    // exact dedup (keep-first) → stratified mix → context-window
    // packing, one declarative plan. Every stage is an operator the
    // registry already gates in isolation (q27/q28-family filters, q22
    // dedup, q46 sampling, q45 packing); this query proves they COMPOSE
    // — the thing a user actually runs nightly over 100 TB — and the
    // oracle recomputes the whole chain as one CTE pipeline. An
    // injected duplicate slice (every 10th doc re-labeled) must die at
    // the dedup stage, never reach packing. Scale: filters at scan
    // speed, ONE row shuffle on the content hash (dedup window), the
    // sample filter per-row, packing per-shard — no stage re-reads the
    // corpus.
    // ------------------------------------------------------------------
    "q85_corpus_pipeline" -> GraftQuery(
      build = (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val base = documents(s, d)
          .select(col("doc_id"), col("lang"), col("text"), col("n_chars"))
        val dup = base.filter(col("doc_id") % 10 === 0)
          .select((col("doc_id") + 500000).as("doc_id"), col("lang"),
            col("text"), col("n_chars"))
        val corpus = graft.operators.ScanOps
          .spreadSmallInput(base.unionByName(dup), col("doc_id"))
        val gated = corpus
          .filter(col("lang").isin("en", "de"))
          .filter(col("n_chars") >= Q85MinChars &&
            wsTokenCount(col("text")) >= Q85MinTokens)
        val deduped = gated
          .withColumn("__rep", min("doc_id")
            .over(Window.partitionBy(md5(col("text")))))
          .filter(col("doc_id") === col("__rep"))
        val mixed = CorpusAssembly.stratifiedSample(
          deduped.select(col("doc_id"), col("lang"), col("text")),
          "text", "lang", SampleRates)
        val docs = mixed.select(col("doc_id"),
          (col("doc_id") % 8).as("shard"),
          wsTokenCount(col("text")).as("n_tokens"))
        CorpusAssembly.binStats(
          CorpusAssembly.packBins(docs, "doc_id", "n_tokens", "shard", 512L),
          "shard", "n_tokens", "doc_id")
          .orderBy("shard", "bin")
      },
      oracle = Some {
        val rateCase = SampleRates.toSeq.sortBy(_._1)
          .map { case (l, r) => s"WHEN '$l' THEN $r" }
          .mkString("CASE lang ", " ", " ELSE 0 END")
        s"""
        WITH base(doc_id, lang, text, n_chars) AS (
          SELECT doc_id, lang, text, n_chars FROM documents
          UNION ALL
          SELECT doc_id + 500000, lang, text, n_chars FROM documents
          WHERE doc_id % 10 = 0),
        gated AS (SELECT doc_id, lang, text FROM base
          WHERE lang IN ('en', 'de') AND n_chars >= $Q85MinChars
            AND len(${sqlTokens("text")}) >= $Q85MinTokens),
        dd AS (SELECT doc_id, lang, text FROM (
            SELECT gated.*, min(doc_id) OVER (PARTITION BY md5(text)) AS rep
            FROM gated) WHERE doc_id = rep),
        mixed AS (SELECT doc_id, lang, text FROM dd
          WHERE (CAST(('0x' || substr(md5(text), 1, 15)) AS BIGINT))
            % ${CorpusAssembly.RateDenominator} < $rateCase),
        t AS (SELECT doc_id, doc_id % 8 AS shard,
            CAST(len(${sqlTokens("text")}) AS BIGINT) AS n_tokens FROM mixed),
        c AS (SELECT doc_id, shard, n_tokens,
            coalesce(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
          FROM t),
        b AS (SELECT shard, doc_id, n_tokens,
            CAST(floor(CAST(cum_before AS DOUBLE) / 512.0) AS BIGINT) AS bin
          FROM c)
        SELECT shard, bin, count(*) AS n_docs,
          CAST(sum(n_tokens) AS BIGINT) AS tokens_packed,
          min(doc_id) AS first_doc, max(doc_id) AS last_doc
        FROM b GROUP BY shard, bin ORDER BY shard, bin"""
      },
      headline = true),

    // ------------------------------------------------------------------
    // q86 — BPE merge-rule training (BpeTrainer.train): 3 rounds of
    // count-pairs → argmax → rewrite over the top-200 word vocabulary —
    // the iterative-driver-loop family (PageRank q67, k-means q43/q56)
    // applied to tokenizer training. The vocabulary travels as
    // double-delimited strings (|t1||t2||t3|) so the greedy-leftmost
    // merge is ONE regexp_replace with identical Java/RE2 semantics;
    // the oracle unrolls the three rounds as CTE stages and must
    // reproduce every chosen rule and the post-training pair table
    // bit-for-bit.
    // ------------------------------------------------------------------
    "q86_bpe_train" -> GraftQuery(
      build = (s, d) =>
        graft.operators.BpeTrainer.readRules(s, bpeModelDir(s, d))
          .orderBy(col("step"), col("weight").desc, col("pair")),
      oracle = Some(s"""
        $bpeTrainPrologSql,
        p${BpeMerges + 1} AS (${bpePairsOfSql(s"v$BpeMerges")})
        SELECT CAST(step AS INT) AS step, pair, weight FROM (
          ${(1 to BpeMerges).map(i =>
            s"SELECT $i AS step, pair, weight FROM m$i " +
              s"WHERE pair <> '$BpeNoopRule'").mkString("\n          UNION ALL ")}
          UNION ALL SELECT * FROM (
            SELECT ${BpeMerges + 1} AS step, pair, weight FROM p${BpeMerges + 1}
            ORDER BY weight DESC, pair LIMIT $BpeTopK))
        ORDER BY step, weight DESC, pair""")),

    // ------------------------------------------------------------------
    // q91 — BPE ENCODE: apply the q86-trained merge rules to the corpus
    // and measure the compression — the train→apply loop a tokenizer
    // pipeline actually runs. The rules come from the LANDED model
    // artifact (bpeModelDir — trained once per process, shared with
    // q86); encoding is per-word: chars → delimited string → one
    // literal replace per rule IN TRAINING ORDER (left-to-right
    // non-overlapping replacement ≡ greedy-leftmost merge, verified in
    // both engines) → token count. Only (doc_id, counts) aggregate; the
    // oracle re-trains and re-encodes the whole chain.
    // ------------------------------------------------------------------
    "q91_bpe_encode" -> GraftQuery(
      build = (s, d) => {
        val words = bpeWords(s, d)
        // the rules arrive as ≤3 driver-side strings read from the
        // ≤23-row landed model — then encode is pure columnar
        val rules = graft.operators.BpeTrainer
          .readRules(s, bpeModelDir(s, d))
          .filter(col("step") <= BpeMerges)
          .orderBy("step").select("pair").collect().map(_.getString(0))
        val delim = concat(lit("|"),
          array_join(expr("filter(split(w, ''), c -> c <> '')"), "||"),
          lit("|"))
        val encoded = rules.foldLeft(delim)(
          graft.operators.BpeTrainer.applyMerge)
        words
          .select(col("doc_id"), length(col("w")).as("n_chars_w"),
            size(split(encoded, "\\|\\|")).as("n_toks"))
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_words"),
            sum("n_chars_w").as("n_char_tokens"),
            sum("n_toks").as("n_bpe_tokens"))
          .orderBy("doc_id")
      },
      oracle = Some {
        def applyRule(inner: String, m: String) = s"""
          replace($inner,
            '|' || split_part($m.pair, ' ', 1) || '||'
              || split_part($m.pair, ' ', 2) || '|',
            '|' || replace($m.pair, ' ', '') || '|')"""
        s"""
        $bpeTrainPrologSql,
        wr AS (SELECT doc_id, w FROM (
            SELECT doc_id, unnest(string_split_regex(lower(text), '[^a-z]+'))
              AS w FROM documents)
          WHERE length(w) BETWEEN 3 AND 12),
        ds AS (SELECT doc_id, w, '|' || array_to_string(
            list_filter(string_split(w, ''), c -> c <> ''), '||') || '|'
            AS s0 FROM wr),
        enc AS (SELECT doc_id, w,
            ${(1 to BpeMerges).foldLeft("s0")((acc, i) =>
              applyRule(acc, s"m$i"))} AS s
          FROM ds, ${(1 to BpeMerges).map(i => s"m$i").mkString(", ")})
        SELECT doc_id, count(*) AS n_words,
          CAST(sum(length(w)) AS BIGINT) AS n_char_tokens,
          CAST(sum(len(string_split(s, '||'))) AS BIGINT) AS n_bpe_tokens
        FROM enc GROUP BY doc_id ORDER BY doc_id"""
      }),

    // ------------------------------------------------------------------
    // q60 — generator (lateral/explode) as a first-class relational op:
    // per-language top-10 terms by frequency. `explode(split(...))` is
    // Spark's UNNEST — a Generate node feeding a hash aggregate, so the
    // token stream is map-side combined and only (lang, term, count)
    // rows ever shuffle; document bodies stay at the scan. Tokenization
    // is ASCII-letter runs (split on '[^A-Za-z]+') and lower() is applied
    // to the pure-ASCII token AFTER splitting — identical across Java
    // and RE2/DuckDB regex semantics, no locale-sensitive casefolding of
    // raw text. Tie-break (count desc, term asc) makes the top-10 total.
    // ------------------------------------------------------------------
    "q60_top_terms" -> GraftQuery(
      build = (s, d) => {
        val toks = graft.operators.ScanOps
          .spreadSmallInput(
            documents(s, d).select(col("doc_id"), col("lang"), col("text")),
            col("doc_id"))
          .select(col("lang"),
            explode(split(col("text"), "[^A-Za-z]+")).as("raw"))
          .filter(length(col("raw")) >= 3)
          .select(col("lang"), lower(col("raw")).as("term"))
        val counts = toks.groupBy("lang", "term")
          .agg(count(lit(1)).as("cnt"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("lang").orderBy(col("cnt").desc, col("term"))
        counts
          .withColumn("rnk", row_number().over(w).cast(LongType))
          .filter(col("rnk") <= 10)
          .orderBy("lang", "rnk")
      },
      oracle = Some("""
        WITH tok AS (
          SELECT lang, lower(t) AS term FROM (
            SELECT lang, unnest(regexp_split_to_array(text, '[^A-Za-z]+')) AS t
            FROM documents)
          WHERE length(t) >= 3),
        c AS (SELECT lang, term, count(*) AS cnt FROM tok GROUP BY lang, term),
        r AS (SELECT lang, term, cnt,
            CAST(row_number() OVER (PARTITION BY lang ORDER BY cnt DESC, term)
              AS BIGINT) AS rnk
          FROM c)
        SELECT lang, term, cnt, rnk FROM r WHERE rnk <= 10
        ORDER BY lang, rnk""")),

    // ------------------------------------------------------------------
    // q64 — BPE pair statistics (TextAnalysis.bpePairFrequencies): the
    // merge-selection statistic of byte-pair-encoding vocabulary
    // training, top-50 by corpus-weighted frequency. Two map-side
    // combined aggregates (corpus -> vocab, vocab -> pairs); the global
    // top-k is a TakeOrderedAndProject, never a full sort. Tie-break
    // (count desc, pair asc) makes the cut deterministic.
    // ------------------------------------------------------------------
    "q64_bpe_pair_freq" -> GraftQuery(
      build = (s, d) =>
        graft.operators.TextAnalysis.bpePairFrequencies(
          graft.operators.ScanOps.spreadSmallInput(
            documents(s, d).select(col("doc_id"), col("text")), col("doc_id")),
          "text")
          .orderBy(col("n_pair").desc, col("pair")).limit(50),
      oracle = Some("""
        WITH w AS (SELECT lower(t) AS word, count(*) AS n_word FROM (
            SELECT unnest(regexp_split_to_array(text, '[^A-Za-z]+')) AS t
            FROM documents)
          WHERE length(t) >= 2 GROUP BY 1),
        p AS (SELECT substring(word, CAST(i AS INTEGER), 2) AS pair, n_word
          FROM (SELECT word, n_word,
              unnest(range(1, length(word))) AS i FROM w))
        SELECT pair, CAST(sum(n_word) AS BIGINT) AS n_pair
        FROM p GROUP BY pair ORDER BY n_pair DESC, pair LIMIT 50""")),

    // ------------------------------------------------------------------
    // q94 — temperature-scaled mixture weights (CorpusAssembly.
    // mixtureWeights): per-source sampling weights ∝ √n normalized to
    // ppm plus each source's document budget under a fixed target — the
    // α = 0.5 mix that upweights small sources vs proportional
    // sampling. isqrt + long floor-division only, so the whole weight
    // table is bit-reproducible (float pow(n, α) is not). One count
    // aggregate + a 1-row broadcast total; the corpus is read once.
    // Feeds q46/q89's per-mille samplers.
    // ------------------------------------------------------------------
    "q94_mixture_weights" -> GraftQuery(
      build = (s, d) =>
        CorpusAssembly.mixtureWeights(
          documents(s, d).select(col("source")), "source", MixTargetDocs)
          .orderBy("source"),
      oracle = Some(s"""
        WITH c AS (SELECT source, count(*) AS n_docs,
            CAST(floor(sqrt(count(*))) AS BIGINT) AS w_raw
          FROM documents GROUP BY source),
        t AS (SELECT CAST(sum(w_raw) AS BIGINT) AS w_total FROM c)
        SELECT source, n_docs, w_raw,
          (w_raw * ${CorpusAssembly.WeightScale}) // w_total AS weight_ppm,
          (((w_raw * ${CorpusAssembly.WeightScale}) // w_total)
            * $MixTargetDocs) // ${CorpusAssembly.WeightScale} AS target_docs
        FROM c, t ORDER BY source""")),

    // ------------------------------------------------------------------
    // q95 — sliding-window document chunking (CorpusAssembly.chunkDocs):
    // every document split into $ChunkSize-char windows every
    // $ChunkStride chars (60-char overlap) — the long-document splitter
    // in front of a fixed-context tokenizer. Gated on the md5 of every
    // chunk, so boundary arithmetic is verified byte-exactly. Pure
    // per-row Generate: no shuffle anywhere, scan speed at any scale.
    // ------------------------------------------------------------------
    "q95_doc_chunking" -> GraftQuery(
      build = (s, d) =>
        CorpusAssembly.chunkDocs(
          graft.operators.ScanOps.spreadSmallInput(
            documents(s, d).select(col("doc_id"), col("text")),
            col("doc_id")),
          "doc_id", "text", ChunkSize, ChunkStride)
          .orderBy("doc_id", "chunk_ix"),
      oracle = Some(s"""
        WITH d AS (SELECT doc_id, text FROM documents WHERE length(text) > 0),
        st AS (SELECT doc_id, text,
            unnest(generate_series(0, length(text) - 1, $ChunkStride))
              AS chunk_start
          FROM d)
        SELECT doc_id,
          CAST(chunk_start // $ChunkStride AS BIGINT) AS chunk_ix,
          CAST(chunk_start AS BIGINT) AS chunk_start,
          CAST(length(substr(text, CAST(chunk_start AS INTEGER) + 1,
            $ChunkSize)) AS BIGINT) AS chunk_len,
          md5(substr(text, CAST(chunk_start AS INTEGER) + 1, $ChunkSize))
            AS chunk_md5
        FROM st ORDER BY doc_id, chunk_ix""")),

    // ------------------------------------------------------------------
    // q112 — train/val/test hash split + leakage audit: content-hash
    // bucketing puts identical texts in one split by construction
    // (leaky_groups = 0, audited — not assumed); the naive docid scheme
    // computed alongside shows the counterfactual — the re-ingested
    // every-10th slice carries fresh ids, so its copies straddle splits
    // and leak. Assignment is a per-row hash (shuffle-free,
    // reproducible, nested); only the audit shuffles (scheme, hash).
    // ------------------------------------------------------------------
    "q112_split_leakage_audit" -> GraftQuery(
      build = (s, d) => {
        val base = documents(s, d).select(col("doc_id"), col("text"))
        val dup = base.filter(col("doc_id") % 10 === 0)
          .select((col("doc_id") + 100000).as("doc_id"), col("text"))
        CorpusAssembly.hashSplitAudit(base.union(dup), "doc_id", "text")
          .orderBy("scheme", "split")
      },
      oracle = Some(s"""
        WITH base(doc_id, text) AS (
          SELECT doc_id, text FROM documents
          UNION ALL
          SELECT doc_id + 100000, text FROM documents WHERE doc_id % 10 = 0),
        b AS (SELECT CAST(doc_id AS VARCHAR) AS id,
            ${sqlHash64("text")} AS content_hash,
            CAST(length(text) AS BIGINT) AS n_chars FROM base),
        sch AS (
          SELECT 'content' AS scheme, content_hash % 100 AS bucket,
            content_hash, n_chars FROM b
          UNION ALL
          SELECT 'docid', ${sqlHash64("id")} % 100, content_hash, n_chars
          FROM b),
        sp AS (SELECT scheme, CASE WHEN bucket < 98 THEN 'train'
            WHEN bucket = 98 THEN 'val' ELSE 'test' END AS split,
            content_hash, n_chars FROM sch),
        ps AS (SELECT scheme, split, count(*) AS n_docs,
            CAST(sum(n_chars) AS BIGINT) AS n_chars
          FROM sp GROUP BY scheme, split),
        lk AS (SELECT scheme, CAST(sum(CASE WHEN ns >= 2 THEN 1 ELSE 0 END)
            AS BIGINT) AS leaky_groups
          FROM (SELECT scheme, content_hash, count(DISTINCT split) AS ns
            FROM sp GROUP BY scheme, content_hash)
          GROUP BY scheme)
        SELECT ps.scheme, ps.split, n_docs, n_chars, leaky_groups
        FROM ps JOIN lk ON ps.scheme = lk.scheme
        ORDER BY ps.scheme, ps.split""")),

    // ------------------------------------------------------------------
    // q113 — collocation mining by association lift: top-K bigrams whose
    // co-occurrence beats chance, ⌊1e6·c_xy·N/(c_x·c_y)⌋ — PMI's
    // exponent in exact ppm (rank-equivalent to PMI, no cross-engine
    // ln). Counting aggregates + vocabulary equi-joins + a 1-row total
    // broadcast; decimal128 product (1e6·c_xy·N hits 1e30 at corpus
    // scale). Total (lift desc, g) order makes the K boundary exact.
    // ------------------------------------------------------------------
    "q113_collocation_lift" -> GraftQuery(
      build = (s, d) =>
        TextAnalysis.collocationLift(
          documents(s, d).select(col("text")), "text",
          LiftMinCount, LiftTopK),
      oracle = Some(s"""
        WITH tok AS (SELECT ${sqlTokens("text")} AS t FROM documents),
        tt AS (SELECT t FROM tok WHERE len(t) >= 2),
        bg AS (SELECT unnest(${sqlBigrams("t")}) AS g FROM tt),
        bc AS (SELECT g, count(*) AS c_xy FROM bg GROUP BY g
          HAVING count(*) >= $LiftMinCount),
        wrd AS (SELECT unnest(t) AS w FROM tt),
        wc AS (SELECT w, count(*) AS c_w FROM wrd GROUP BY w),
        n AS (SELECT CAST(sum(c_w) AS BIGINT) AS n_tokens FROM wc),
        j AS (SELECT g, c_xy, x.c_w AS c_x, y.c_w AS c_y FROM bc
          JOIN wc x ON split_part(bc.g, ' ', 1) = x.w
          JOIN wc y ON split_part(bc.g, ' ', 2) = y.w)
        SELECT g, c_xy, c_x, c_y,
          CAST((CAST(c_xy AS HUGEINT) * n_tokens * 1000000) //
            (CAST(c_x AS HUGEINT) * c_y) AS BIGINT) AS lift_ppm
        FROM j, n
        ORDER BY lift_ppm DESC, g LIMIT $LiftTopK""")),

    // ------------------------------------------------------------------
    // q110 — bigram-LM "unseen rate" scoring: the perplexity-proxy
    // fluency filter without the cross-engine ln lottery. The top-K
    // bigram model is a LANDED ARTIFACT (trained once per process, the
    // q90/q91 discipline); scoring is a broadcast join of the K-row
    // table against the exploded bigram stream with one per-doc rollup.
    // K = 500 of the ≤ 900 possible bigrams on this 30-word vocabulary,
    // so the unseen tail is a real signal, not zero.
    // ------------------------------------------------------------------
    "q110_bigram_lm_score" -> GraftQuery(
      build = (s, d) => {
        val lmDir = Landings.landedPath(s"bigram_lm:$d") { dir =>
          TextAnalysis.trainBigramLm(
            documents(s, d).select(col("text")), "text", LmTopK)
            .write.mode("overwrite").parquet(dir)
        }
        TextAnalysis.bigramUnseenScore(
          documents(s, d).select(col("doc_id"), col("text")),
          "doc_id", "text", s.read.parquet(lmDir))
          .orderBy("doc_id")
      },
      oracle = Some(s"""
        WITH tok AS (SELECT doc_id, ${sqlTokens("text")} AS t
          FROM documents),
        bg AS (SELECT doc_id, unnest(${sqlBigrams("t")}) AS g
          FROM tok WHERE len(t) >= 2),
        lm AS (SELECT g FROM (SELECT g, count(*) AS cnt FROM bg
          GROUP BY g ORDER BY cnt DESC, g LIMIT $LmTopK)),
        j AS (SELECT b.doc_id,
            CASE WHEN lm.g IS NULL THEN 1 ELSE 0 END AS unseen
          FROM bg b LEFT JOIN lm ON b.g = lm.g)
        SELECT doc_id, count(*) AS n_bigrams,
          CAST(sum(unseen) AS BIGINT) AS n_unseen,
          CAST((CAST(sum(unseen) AS BIGINT) * 1000000) // count(*)
            AS BIGINT) AS unseen_ppm
        FROM j GROUP BY doc_id ORDER BY doc_id""")),

    // ------------------------------------------------------------------
    // q128 — deterministic curriculum order (CorpusAssembly
    // .curriculumOrder): the exact global training sequence — length
    // tiers staged short→long (easy first), reproducibly hash-shuffled
    // inside each tier — WITHOUT a global sort. Ordinals come from the
    // two-level
    // decomposition (hash-prefix buckets + tiny offset table + per-
    // chunk ranks); the oracle computes the same ordinal with a single
    // global ORDER BY, so a hash match proves the decomposition
    // correct, not just the hashing.
    // ------------------------------------------------------------------
    "q128_curriculum_order" -> GraftQuery(
      build = (s, d) => {
        val docs = documents(s, d).select(col("doc_id"),
          least(expr(s"n_chars div $CurriculumTierChars"), lit(3L))
            .as("tier"),
          col("text"))
        graft.operators.CorpusAssembly.curriculumOrder(
            docs, "doc_id", "tier", "text", CurriculumBuckets)
          .orderBy("ordinal")
      },
      oracle = Some(s"""
        WITH h AS (SELECT doc_id,
            least(n_chars // $CurriculumTierChars, 3) AS tier,
            ${sqlHash64("text")} AS h
          FROM documents WHERE text IS NOT NULL)
        SELECT doc_id, tier, h,
          row_number() OVER (ORDER BY tier, h, doc_id) - 1 AS ordinal
        FROM h ORDER BY ordinal""")),

    // ------------------------------------------------------------------
    // q165 — boilerplate-block detection (TextAnalysis
    // .boilerplateBlocks): the CCNet/RefinedWeb chrome-removal step —
    // an aligned 8-word block repeating in ≥ 20 distinct docs of the
    // SAME source is banner/footer, not content (within-source, not
    // global: cross-source phrase sharing is diversity). The corpus
    // has no natural boilerplate, so the fixture prepends each
    // source's deterministic 8-word banner (the q26-mutant injection
    // discipline) — present in all ~25 docs per source, while the
    // random-word content blocks collide never. Only (source, 16-byte
    // md5, doc) ever shuffles; doc frequency is a two-phase aggregate;
    // clean_words is what downstream token budgets should see.
    // ------------------------------------------------------------------
    "q165_boilerplate" -> GraftQuery(
      build = (s, d) => {
        val injected = documents(s, d).select(col("doc_id"),
          col("source"),
          concat(lit("promo header from "), col("source"),
            lit(" subscribe to our newsletter today "), col("text"))
            .as("text"))
        TextAnalysis.boilerplateBlocks(injected, "doc_id", "source",
            "text", BoilBlockWords, BoilMinDf)
          .orderBy("doc")
      },
      oracle = Some(s"""
        WITH inj AS (SELECT doc_id AS doc, source AS src,
            'promo header from ' || source ||
              ' subscribe to our newsletter today ' || text AS text
          FROM documents),
        base AS (SELECT doc, src, string_split(text, ' ') AS words
          FROM inj),
        sz AS (SELECT doc, src, words,
            CAST(len(words) AS BIGINT) AS n_words,
            CAST(len(words) // $BoilBlockWords AS BIGINT) AS n_blocks
          FROM base),
        blocks AS (SELECT doc, src, n_words, n_blocks,
            unnest(list_transform(range(n_blocks),
              i -> md5(list_aggregate(list_slice(words,
                i * $BoilBlockWords + 1,
                i * $BoilBlockWords + $BoilBlockWords),
                'string_agg', ' ')))) AS h
          FROM sz),
        flagged AS (SELECT src, h FROM (
            SELECT src, h, count(DISTINCT doc) AS df
            FROM blocks GROUP BY src, h)
          WHERE df >= $BoilMinDf),
        boiler AS (SELECT doc, CAST(count(*) AS BIGINT) AS n_boiler
          FROM blocks b
          WHERE EXISTS (SELECT 1 FROM flagged f
            WHERE f.src = b.src AND f.h = b.h)
          GROUP BY doc)
        SELECT s.doc AS doc, s.src AS src, s.n_words, s.n_blocks,
          coalesce(bo.n_boiler, 0) AS n_boiler,
          CASE WHEN s.n_blocks > 0
            THEN (1000000 * coalesce(bo.n_boiler, 0)) // s.n_blocks
            ELSE 0 END AS boiler_ratio_ppm,
          s.n_words - coalesce(bo.n_boiler, 0) * $BoilBlockWords
            AS clean_words
        FROM sz s LEFT JOIN boiler bo ON bo.doc = s.doc
        ORDER BY doc""")),

    // ------------------------------------------------------------------
    // q182 — corpus manifest (QualityAudit.corpusManifest): the
    // per-source content fingerprint a dataset release ships — doc
    // count, char total, id range and an ORDER-INDEPENDENT additive
    // digest Σ hash64(id:text) mod 2⁶¹ — so "same corpus, same bytes"
    // verifies by one map-side-combined aggregate at any scale and any
    // partitioning (no sort, no collect; two manifests diff by
    // subtraction). 61 bits guards against accidental drift, the
    // versioning use case — adversarial audit is a Merkle build's job.
    // ------------------------------------------------------------------
    "q182_corpus_manifest" -> GraftQuery(
      build = (s, d) =>
        graft.operators.QualityAudit.corpusManifest(
            documents(s, d), "source", "doc_id", "text")
          .orderBy("source"),
      oracle = Some("""
        WITH h AS (SELECT source, doc_id, text,
            CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' ||
              text), 1, 15)) AS BIGINT) AS h64
          FROM documents)
        SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
          CAST(sum(length(text)) AS BIGINT) AS total_chars,
          min(doc_id) AS min_id, max(doc_id) AS max_id,
          CAST(sum(CAST(h64 AS HUGEINT)) % 2305843009213693952
            AS BIGINT) AS digest
        FROM h GROUP BY source ORDER BY source""")),

    // ------------------------------------------------------------------
    // q185 — normalization manifest (QualityAudit.normalizedManifest):
    // q182's before/after view of a cleaning pass — per source, the
    // additive digest of the RAW text, of the canonical normalized form
    // (ASCII control chars → space, space runs collapsed, trimmed,
    // lower-cased; deliberately ASCII-scope — Unicode NFC has no
    // cross-engine SQL surface), and how many docs actually changed.
    // Every 4th doc gets an injected dirty suffix ('  DIRTY\tTAIL ') so
    // the pass provably rewrites ≥ 25% of each source. Still ONE
    // map-side-combined aggregate; normalization is per-row codegen.
    // ------------------------------------------------------------------
    "q185_normalization_manifest" -> GraftQuery(
      build = (s, d) => {
        val dirty = documents(s, d).select(col("source"), col("doc_id"),
          when(col("doc_id") % 4 === 0,
            concat(col("text"), lit("  DIRTY\tTAIL ")))
            .otherwise(col("text")).as("text"))
        graft.operators.QualityAudit
          .normalizedManifest(dirty, "source", "doc_id", "text")
          .orderBy("source")
      },
      oracle = Some("""
        WITH d AS (SELECT source, doc_id,
            CASE WHEN doc_id % 4 = 0
              THEN text || '  DIRTY' || chr(9) || 'TAIL '
              ELSE text END AS text
          FROM documents),
        n AS (SELECT source, doc_id, text,
            lower(trim(regexp_replace(regexp_replace(text,
              '[\x00-\x1f]', ' ', 'g'), ' +', ' ', 'g'))) AS norm
          FROM d),
        h AS (SELECT source, doc_id, text, norm,
            CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' ||
              text), 1, 15)) AS BIGINT) AS hr,
            CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' ||
              norm), 1, 15)) AS BIGINT) AS hn
          FROM n)
        SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
          CAST(coalesce(sum(CASE WHEN norm <> text THEN 1 END), 0)
            AS BIGINT) AS n_changed,
          CAST(sum(CAST(hr AS HUGEINT)) % 2305843009213693952
            AS BIGINT) AS digest_raw,
          CAST(sum(CAST(hn AS HUGEINT)) % 2305843009213693952
            AS BIGINT) AS digest_norm
        FROM h GROUP BY source ORDER BY source""")),

    // ------------------------------------------------------------------
    // q194 — per-language Zipf slope (TextAnalysis.zipfSlope): the
    // log-log rank-frequency regression over each language's top-25
    // terms, on the exact Q20 log2 lattice (native Log2Q20; sums in
    // decimal128; one truncating division both engines share) — the
    // corpus-naturalness probe that flags synthetic/template feeds:
    // natural text fits slope_milli ≈ −1000, this driver's uniform
    // 30-word vocabulary reports a near-flat slope, and the spec
    // proves the discriminating direction on a constructed Zipfian
    // corpus. The oracle replays the lattice once over the DISTINCT
    // rank ∪ freq values (a bounded value set) and joins it back.
    // ------------------------------------------------------------------
    "q194_zipf_slope" -> GraftQuery(
      build = (s, d) =>
        graft.operators.TextAnalysis.zipfSlope(
          documents(s, d).select(col("lang"), col("text")), "lang", "text")
          .orderBy("g"),
      oracle = Some(s"""
        WITH RECURSIVE tok AS (SELECT g, lower(t) AS term FROM (
            SELECT lang AS g,
              unnest(regexp_split_to_array(text, '[^A-Za-z]+')) AS t
            FROM documents)
          WHERE length(t) >= 3),
        tf AS (SELECT g, term, CAST(count(*) AS BIGINT) AS freq
          FROM tok GROUP BY g, term),
        rk AS (SELECT g, freq, CAST(row_number() OVER (PARTITION BY g
            ORDER BY freq DESC, term) AS BIGINT) AS rnk
          FROM tf),
        top AS (SELECT g, rnk, freq FROM rk WHERE rnk <= 25),
        vals AS (SELECT DISTINCT m FROM (
          SELECT rnk AS m FROM top UNION ALL SELECT freq FROM top)),
        m0 AS (SELECT m, length(bin(m)) - 1 AS hb FROM vals),
        mant AS (SELECT m, hb,
            CASE WHEN hb >= 30 THEN m >> (hb - 30)
              ELSE m << (30 - hb) END AS x
          FROM m0),
        lgx AS (
          SELECT m, hb, x, 0 AS it, CAST(0 AS BIGINT) AS frac FROM mant
          UNION ALL
          SELECT m, hb,
            CASE WHEN x * x >= 2305843009213693952 THEN (x * x) >> 31
              ELSE (x * x) >> 30 END,
            it + 1,
            frac * 2 + CASE WHEN x * x >= 2305843009213693952
              THEN 1 ELSE 0 END
          FROM lgx WHERE it < 20),
        lut AS (SELECT m, (hb << 20) + frac AS l FROM lgx WHERE it = 20),
        xy AS (SELECT g, lx.l AS x, ly.l AS y FROM top
          JOIN lut lx ON top.rnk = lx.m
          JOIN lut ly ON top.freq = ly.m),
        sm AS (SELECT g, CAST(count(*) AS HUGEINT) AS n,
            sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(y AS HUGEINT)) AS sy,
            sum(CAST(x AS HUGEINT) * y) AS sxy,
            sum(CAST(x AS HUGEINT) * x) AS sxx
          FROM xy GROUP BY g)
        SELECT g, CAST(n AS BIGINT) AS n_terms,
          CASE WHEN n >= 2 THEN
            CAST((1000 * (n * sxy - sx * sy)) // (n * sxx - sx * sx)
              AS BIGINT) END AS slope_milli
        FROM sm ORDER BY g""")),

    // ------------------------------------------------------------------
    // q212 — Heaps'-law vocabulary growth (TextAnalysis.heapsSlope):
    // Zipf's companion naturalness probe — V(N) ≈ K·N^β over bigram
    // terms (the closed 30-word unigram vocab saturates instantly and
    // would measure nothing; the ~900-bigram space keeps the growth
    // regime observable — probed V through the 8 checkpoints: en
    // 596→907 saturating, de 424→888 still growing). Checkpoints are
    // 8 equal slices of the doc-id span via a 1-row bounds frame;
    // every first-occurrence and doc count maps to its checkpoint
    // CLOSED-FORM (no corpus inequality join), V_j/N_j are tiny
    // aggregates, and the fit is q194's exact Q20 lattice regression.
    // The oracle replays checkpoint arithmetic and lattice exactly.
    // ------------------------------------------------------------------
    "q212_heaps_law" -> GraftQuery(
      build = (s, d) =>
        TextAnalysis.heapsSlope(
          documents(s, d).select(col("lang"), col("doc_id"), col("text")),
          "lang", "doc_id", "text")
          .orderBy("g"),
      oracle = Some("""
        WITH RECURSIVE mx AS (SELECT max(doc_id) AS m FROM documents),
        tok AS (SELECT lang AS g, doc_id,
            string_split_regex(lower(text), '\s+') AS t
          FROM documents),
        bg AS (SELECT g, doc_id, t[i] || ' ' || t[i+1] AS b
          FROM (SELECT g, doc_id, t, unnest(range(1, len(t))) AS i
            FROM tok)),
        fo AS (SELECT g, b, min(doc_id) AS fd FROM bg GROUP BY 1, 2),
        vadd AS (SELECT g, (8 * (fd + 1) + m) // (m + 1) AS jm,
            count(*) AS c
          FROM fo, mx GROUP BY 1, 2),
        nadd AS (SELECT g, (8 * (doc_id + 1) + m) // (m + 1) AS jm,
            count(*) AS c
          FROM bg, mx GROUP BY 1, 2),
        sp AS (SELECT unnest(range(1, 9)) AS j),
        vj AS (SELECT g, j, CAST(sum(c) AS BIGINT) AS v
          FROM vadd JOIN sp ON jm <= j GROUP BY 1, 2),
        nj AS (SELECT g, j, CAST(sum(c) AS BIGINT) AS n
          FROM nadd JOIN sp ON jm <= j GROUP BY 1, 2),
        xy0 AS (SELECT vj.g, vj.j, v, n
          FROM vj JOIN nj ON vj.g = nj.g AND vj.j = nj.j
          WHERE v > 0 AND n > 0),
        vals AS (SELECT DISTINCT m FROM (
          SELECT v AS m FROM xy0 UNION ALL SELECT n FROM xy0)),
        m0 AS (SELECT m, length(bin(m)) - 1 AS hb FROM vals),
        mant AS (SELECT m, hb,
            CASE WHEN hb >= 30 THEN m >> (hb - 30)
              ELSE m << (30 - hb) END AS x
          FROM m0),
        lgx AS (
          SELECT m, hb, x, 0 AS it, CAST(0 AS BIGINT) AS frac FROM mant
          UNION ALL
          SELECT m, hb,
            CASE WHEN x * x >= 2305843009213693952 THEN (x * x) >> 31
              ELSE (x * x) >> 30 END,
            it + 1,
            frac * 2 + CASE WHEN x * x >= 2305843009213693952
              THEN 1 ELSE 0 END
          FROM lgx WHERE it < 20),
        lut AS (SELECT m, (hb << 20) + frac AS l FROM lgx WHERE it = 20),
        xy AS (SELECT g, lx.l AS x, ly.l AS y FROM xy0
          JOIN lut lx ON xy0.n = lx.m
          JOIN lut ly ON xy0.v = ly.m),
        sm AS (SELECT g, CAST(count(*) AS HUGEINT) AS np,
            sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(y AS HUGEINT)) AS sy,
            sum(CAST(x AS HUGEINT) * y) AS sxy,
            sum(CAST(x AS HUGEINT) * x) AS sxx
          FROM xy GROUP BY g)
        SELECT g, CAST(np AS BIGINT) AS n_points,
          CASE WHEN np >= 2 AND np * sxx - sx * sx <> 0 THEN
            CAST((1000 * (np * sxy - sx * sy)) // (np * sxx - sx * sx)
              AS BIGINT) END AS heaps_milli
        FROM sm ORDER BY g""")),

    // ------------------------------------------------------------------
    // q213 — length-bucketed batching plan
    // (CorpusAssembly.lengthBucketBatches): the padding-waste killer of
    // LLM training — docs bucket by their token count's power-of-two
    // class, order within a class by the deterministic md5 per-mille
    // hash, and cut batches of 8; each batch row carries its padding
    // waste (n·max − Σtok)/(n·max). The rank that cuts batches is
    // DISTRIBUTED (per-(class, hash-sub-bucket) windows + triangular
    // prefix offsets — no single-partition window), while the oracle
    // keeps the single-window formulation: the decomposition must be a
    // pure re-association, hash-gated. Probed classes at sf0.01:
    // 4 (10–15 tokens) through 7 (64–99).
    // ------------------------------------------------------------------
    "q213_length_bucket_batching" -> GraftQuery(
      build = (s, d) =>
        CorpusAssembly.lengthBucketBatches(
          graft.operators.ScanOps.spreadSmallInput(
            documents(s, d).select(col("doc_id"), col("text")),
            col("doc_id")),
          "doc_id", "text", batchSize = 8)
          .orderBy("cls", "batch"),
      oracle = Some("""
        WITH r AS (SELECT doc_id AS id,
            CAST(len(string_split_regex(lower(text), '\s+')) AS BIGINT)
              AS tok,
            CAST(('0x' || substr(md5(text), 1, 15)) AS BIGINT) % 1000
              AS h
          FROM documents),
        b AS (SELECT id, tok, h,
            CAST(length(bin(greatest(tok, 1))) AS BIGINT) AS cls
          FROM r),
        rk AS (SELECT cls, tok,
            CAST(row_number() OVER (PARTITION BY cls ORDER BY h, id)
              AS BIGINT) AS rn
          FROM b),
        bt AS (SELECT cls, (rn - 1) // 8 AS batch,
            CAST(count(*) AS BIGINT) AS n_docs,
            CAST(max(tok) AS BIGINT) AS max_tok,
            CAST(sum(tok) AS BIGINT) AS sum_tok
          FROM rk GROUP BY 1, 2)
        SELECT cls, batch, n_docs, max_tok, sum_tok,
          (1000000 * (n_docs * max_tok - sum_tok)) //
            (n_docs * max_tok) AS pad_ppm
        FROM bt ORDER BY cls, batch""")),

    // ------------------------------------------------------------------
    // q214 — cross-source n-gram novelty (TextAnalysis.gramNovelty):
    // the acquisition signal — per source, the share of distinct word
    // bigrams (and of bigram OCCURRENCES) absent from reference source
    // 'src0'. Bigrams probed to the informative density: unigrams on
    // the 30-word vocab read ~0 novelty, 3-grams ~0.95; bigrams sit at
    // ~0.21 distinct / strictly-interior occurrence rates, and src0's
    // own row reads 0/0 — the in-result sanity anchor. Gram TEXT never
    // shuffles: the join key is the 64-bit md5-prefix hash64 (the
    // house dedup key discipline).
    // ------------------------------------------------------------------
    "q214_gram_novelty" -> GraftQuery(
      build = (s, d) =>
        TextAnalysis.gramNovelty(
          documents(s, d).select(col("source"), col("text")),
          "source", "text", refSource = "src0")
          .orderBy("src"),
      oracle = Some("""
        WITH tok AS (SELECT source,
            string_split_regex(lower(text), '\s+') AS t
          FROM documents),
        bg AS (SELECT source,
            CAST(('0x' || substr(md5(t[i] || ' ' || t[i+1]), 1, 15))
              AS BIGINT) AS gh
          FROM (SELECT source, t, unnest(range(1, len(t))) AS i
            FROM tok)),
        c AS (SELECT source, gh, count(*) AS cnt FROM bg GROUP BY 1, 2),
        ref AS (SELECT DISTINCT gh FROM c WHERE source = 'src0'),
        d AS (SELECT c.source, c.cnt,
            CASE WHEN ref.gh IS NULL THEN 1 ELSE 0 END AS nov
          FROM c LEFT JOIN ref ON c.gh = ref.gh)
        SELECT source AS src, CAST(count(*) AS BIGINT) AS distinct_grams,
          CAST(sum(nov) AS BIGINT) AS novel_distinct,
          CAST(sum(cnt) AS BIGINT) AS occurrences,
          CAST(sum(nov * cnt) AS BIGINT) AS novel_occurrences,
          (1000000 * CAST(sum(nov) AS BIGINT)) //
            CAST(count(*) AS BIGINT) AS nov_distinct_ppm,
          (1000000 * CAST(sum(nov * cnt) AS BIGINT)) //
            CAST(sum(cnt) AS BIGINT) AS nov_occ_ppm
        FROM d GROUP BY 1 ORDER BY src""")),

    // ------------------------------------------------------------------
    // q221 — class-TF-IDF distinctive terms (TextAnalysis.
    // classTfidfTopTerms): the BERTopic c-TF-IDF readout — per
    // language, the top-5 terms by tf_class·log2(1 + A/f_corpus) on
    // the exact Q20 lattice. The generator draws the same 30-word
    // vocabulary for every language (probed: q60's raw top-terms are
    // near-identical across langs — exactly the failure c-TF-IDF
    // fixes), so the fixture plants a per-language topic marker: every
    // 11th token position ((doc_id·131 + pos) % 11, odd multiplier)
    // remaps to 'topic<lang>'. The class-exclusive marker must surface
    // at rank 1 for EVERY language while the shared vocabulary
    // collapses toward log2(1) — the discriminating direction is in
    // the gated result itself, not just a spec.
    // ------------------------------------------------------------------
    "q221_class_tfidf_terms" -> GraftQuery(
      build = (s, d) => {
        val toks = documents(s, d).select(col("lang"), col("doc_id"),
          posexplode(split(lower(col("text")), "\\s+"))
            .as(Seq("pos0", "t0")))
        val terms = toks.select(col("lang"),
          when((col("doc_id") * 131 + col("pos0") + 1) % 11 === 0,
            concat(lit("topic"), col("lang")))
            .otherwise(col("t0")).as("term"))
        TextAnalysis.classTfidfTopTerms(terms, "lang", "term", topK = 5)
          .orderBy("cls", "rnk")
      },
      oracle = Some("""
        WITH RECURSIVE base AS (SELECT doc_id, lang,
            string_split_regex(lower(text), '\s+') AS t
          FROM documents),
        ti AS (SELECT doc_id, lang, t,
            unnest(range(1, len(t) + 1)) AS i
          FROM base),
        tok AS (SELECT lang AS cls,
            CASE WHEN (doc_id * 131 + i) % 11 = 0
              THEN 'topic' || lang ELSE t[i] END AS term
          FROM ti),
        tfc AS (SELECT cls, term, CAST(count(*) AS BIGINT) AS tf
          FROM tok GROUP BY 1, 2),
        ft AS (SELECT term, CAST(sum(tf) AS BIGINT) AS f
          FROM tfc GROUP BY 1),
        am AS (SELECT CAST(sum(tf) AS BIGINT) //
            count(DISTINCT cls) AS av
          FROM tfc),
        vals AS (SELECT DISTINCT m FROM (
            SELECT f + av AS m FROM ft CROSS JOIN am
            UNION ALL SELECT f FROM ft)),
        m0 AS (SELECT m, length(bin(m)) - 1 AS hb FROM vals),
        mant AS (SELECT m, hb,
            CASE WHEN hb >= 30 THEN m >> (hb - 30)
              ELSE m << (30 - hb) END AS x
          FROM m0),
        lgx AS (
          SELECT m, hb, x, 0 AS it, CAST(0 AS BIGINT) AS frac FROM mant
          UNION ALL
          SELECT m, hb,
            CASE WHEN x * x >= 2305843009213693952 THEN (x * x) >> 31
              ELSE (x * x) >> 30 END,
            it + 1,
            frac * 2 + CASE WHEN x * x >= 2305843009213693952
              THEN 1 ELSE 0 END
          FROM lgx WHERE it < 20),
        lut AS (SELECT m, (hb << 20) + frac AS l FROM lgx WHERE it = 20),
        wt AS (SELECT cls, term, tf, tf * (l1.l - l2.l) AS w_q20
          FROM tfc
          JOIN ft USING (term)
          CROSS JOIN am
          JOIN lut l1 ON l1.m = f + av
          JOIN lut l2 ON l2.m = f),
        rk AS (SELECT cls, term, tf, w_q20,
            CAST(row_number() OVER (PARTITION BY cls
              ORDER BY w_q20 DESC, term) AS BIGINT) AS rnk
          FROM wt)
        SELECT cls, rnk, term, tf, w_q20 FROM rk
        WHERE rnk <= 5 ORDER BY cls, rnk""")),

    // ------------------------------------------------------------------
    // q223 — token-budget mixture planner (CorpusAssembly.mixturePlan):
    // the achievability half q94's mixture WEIGHTS assume away — given
    // per-source availability, linear weights w = source index + 1, and
    // a budget of 4/5 of the corpus, what can actually be sampled?
    // Probed: the heavy-weight sources' floor targets (w=20 →
    // 20/210·0.8 ≈ 7.6% of corpus) exceed their ~5% availability, so
    // the capping branch AND the one-round proportional redistribution
    // both fire in the gated result; floors make Σplanned < budget by
    // a visible ≤|sources| residue, never a hidden refit. |sources|-
    // frame arithmetic against three 1-row scalar broadcasts.
    // ------------------------------------------------------------------
    "q223_mixture_plan" -> GraftQuery(
      build = (s, d) => {
        val avail = documents(s, d)
          .select(col("source"), wsTokenCount(col("text")).as("tok"))
          .groupBy(col("source"))
          .agg(sum(col("tok")).as("avail_tok"))
          .withColumn("w", expr("cast(substr(source, 4) as long) + 1"))
        CorpusAssembly.mixturePlan(avail, "source", "avail_tok", "w",
            budgetNum = 4, budgetDen = 5)
          .orderBy("src")
      },
      oracle = Some("""
        WITH av AS (SELECT source AS src,
            CAST(sum(len(string_split_regex(lower(text), '\s+')))
              AS BIGINT) AS avail_tok,
            CAST(substr(source, 4) AS BIGINT) + 1 AS w
          FROM documents GROUP BY source),
        tot AS (SELECT CAST(sum(avail_tok) AS BIGINT) AS total_tok,
            CAST(sum(w) AS BIGINT) AS ws
          FROM av),
        p0 AS (SELECT src, w, avail_tok,
            CAST((((CAST(total_tok AS HUGEINT) * 4) // 5) * w) // ws
              AS BIGINT) AS target_tok
          FROM av CROSS JOIN tot),
        p1 AS (SELECT src, w, avail_tok, target_tok,
            least(avail_tok, target_tok) AS planned0,
            avail_tok - least(avail_tok, target_tok) AS rem
          FROM p0),
        sc AS (SELECT CAST(sum(target_tok - planned0) AS BIGINT) AS d,
            CAST(sum(rem) AS BIGINT) AS r
          FROM p1),
        p2 AS (SELECT src, w, avail_tok, target_tok,
            avail_tok < target_tok AS capped,
            CASE WHEN r > 0 THEN least(rem,
              CAST((CAST(d AS HUGEINT) * rem) // r AS BIGINT))
              ELSE 0 END AS extra_tok,
            planned0
          FROM p1 CROSS JOIN sc)
        SELECT src, w, avail_tok, target_tok, capped, extra_tok,
          planned0 + extra_tok AS planned_tok,
          CASE WHEN avail_tok > 0 THEN
            CAST((1000000 * CAST(planned0 + extra_tok AS HUGEINT)) //
              avail_tok AS BIGINT) END AS rate_ppm
        FROM p2 ORDER BY src""")),

    // ------------------------------------------------------------------
    // q224 — hapax-legomena vocabulary profile (TextAnalysis.
    // hapaxProfile): the frequency-SPECTRUM naturalness probe beside
    // Zipf (q194) and Heaps (q212) — per source, over BIGRAM terms
    // (the 30-word unigram vocab has zero hapax by construction;
    // probed bigram hapax 252–332 per source at both scales): token
    // mass, vocabulary, hapax/dis-legomena counts, type-token ratio
    // and hapax share, all exact integer ppm. One counts-of-counts
    // aggregate (q106's discipline pointed at terms).
    // ------------------------------------------------------------------
    "q224_hapax_profile" -> GraftQuery(
      build = (s, d) =>
        TextAnalysis.hapaxProfile(
          documents(s, d).select(col("source"), col("text")),
          "source", "text", gramN = 2)
          .orderBy("g"),
      oracle = Some("""
        WITH t AS (SELECT source AS g,
            string_split_regex(lower(text), '\s+') AS tk
          FROM documents),
        bg AS (SELECT g, tk[i] || ' ' || tk[i+1] AS term
          FROM (SELECT g, tk, unnest(range(1, len(tk))) AS i FROM t)),
        c AS (SELECT g, term, count(*) AS c FROM bg GROUP BY 1, 2)
        SELECT g, CAST(sum(c) AS BIGINT) AS n_tokens,
          CAST(count(*) AS BIGINT) AS vocab,
          CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
            AS hapax,
          CAST(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT)
            AS dis,
          (1000000 * CAST(count(*) AS BIGINT)) //
            CAST(sum(c) AS BIGINT) AS ttr_ppm,
          (1000000 * CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END)
            AS BIGINT)) // CAST(count(*) AS BIGINT) AS hapax_share_ppm
        FROM c GROUP BY g ORDER BY g""")),

    // ------------------------------------------------------------------
    // q225 — mixture diversity (CorpusAssembly.mixtureDiversity over
    // q223's plan): Shannon entropy + evenness of the PLANNED mix
    // beside the availability mix, exact Q20 — the one-number "did the
    // budget collapse the corpus onto two sources?" readout. The
    // fixture's availability is near-uniform (evenness ≈ 10⁶) while
    // the w-weighted plan is legitimately less even — the diversity
    // COST of the weighting is visible in the gated result. The oracle
    // replays q223's plan chain and the entropy lattice end to end.
    // ------------------------------------------------------------------
    "q225_mixture_diversity" -> GraftQuery(
      build = (s, d) => {
        val avail = documents(s, d)
          .select(col("source"), wsTokenCount(col("text")).as("tok"))
          .groupBy(col("source"))
          .agg(sum(col("tok")).as("avail_tok"))
          .withColumn("w", expr("cast(substr(source, 4) as long) + 1"))
        val plan = CorpusAssembly.mixturePlan(avail, "source",
          "avail_tok", "w", budgetNum = 4, budgetDen = 5)
        CorpusAssembly.mixtureDiversity(plan, "src", "avail_tok",
          "planned_tok")
      },
      oracle = Some("""
        WITH RECURSIVE av AS (SELECT source AS src,
            CAST(sum(len(string_split_regex(lower(text), '\s+')))
              AS BIGINT) AS avail_tok,
            CAST(substr(source, 4) AS BIGINT) + 1 AS w
          FROM documents GROUP BY source),
        tot AS (SELECT CAST(sum(avail_tok) AS BIGINT) AS total_tok,
            CAST(sum(w) AS BIGINT) AS ws
          FROM av),
        p0 AS (SELECT src, w, avail_tok,
            CAST((((CAST(total_tok AS HUGEINT) * 4) // 5) * w) // ws
              AS BIGINT) AS target_tok
          FROM av CROSS JOIN tot),
        p1 AS (SELECT src, w, avail_tok, target_tok,
            least(avail_tok, target_tok) AS planned0,
            avail_tok - least(avail_tok, target_tok) AS rem
          FROM p0),
        sc AS (SELECT CAST(sum(target_tok - planned0) AS BIGINT) AS d,
            CAST(sum(rem) AS BIGINT) AS r
          FROM p1),
        pl AS (SELECT src, avail_tok AS a, planned0 +
            CASE WHEN r > 0 THEN least(rem,
              CAST((CAST(d AS HUGEINT) * rem) // r AS BIGINT))
              ELSE 0 END AS p
          FROM p1 CROSS JOIN sc),
        tt AS (SELECT CAST(sum(a) AS BIGINT) AS ta,
            CAST(sum(p) AS BIGINT) AS tp,
            CAST(count(*) AS BIGINT) AS n,
            CAST(sum(CASE WHEN p = 0 THEN 1 ELSE 0 END) AS BIGINT)
              AS nz
          FROM pl),
        vals AS (SELECT DISTINCT m FROM (
            SELECT a AS m FROM pl WHERE a > 0
            UNION ALL SELECT p FROM pl WHERE p > 0
            UNION ALL SELECT ta FROM tt
            UNION ALL SELECT tp FROM tt
            UNION ALL SELECT n FROM tt)),
        m0 AS (SELECT m, length(bin(m)) - 1 AS hb FROM vals),
        mant AS (SELECT m, hb,
            CASE WHEN hb >= 30 THEN m >> (hb - 30)
              ELSE m << (30 - hb) END AS x
          FROM m0),
        lgx AS (
          SELECT m, hb, x, 0 AS it, CAST(0 AS BIGINT) AS frac FROM mant
          UNION ALL
          SELECT m, hb,
            CASE WHEN x * x >= 2305843009213693952 THEN (x * x) >> 31
              ELSE (x * x) >> 30 END,
            it + 1,
            frac * 2 + CASE WHEN x * x >= 2305843009213693952
              THEN 1 ELSE 0 END
          FROM lgx WHERE it < 20),
        lut AS (SELECT m, (hb << 20) + frac AS l FROM lgx WHERE it = 20),
        hx AS (SELECT
            CASE WHEN a > 0 THEN CAST(a AS HUGEINT) * (lta.l - la.l)
              ELSE 0 END AS ha,
            CASE WHEN p > 0 THEN CAST(p AS HUGEINT) * (ltp.l - lp.l)
              ELSE 0 END AS hp
          FROM pl CROSS JOIN tt
          LEFT JOIN lut la ON a > 0 AND la.m = a
          LEFT JOIN lut lp ON p > 0 AND lp.m = p
          JOIN lut lta ON lta.m = ta
          JOIN lut ltp ON ltp.m = tp),
        ag AS (SELECT sum(ha) AS sha, sum(hp) AS shp FROM hx)
        SELECT n AS n_sources, nz AS n_zero_planned,
          CAST(sha // ta AS BIGINT) AS h_avail_q20,
          CAST(shp // tp AS BIGINT) AS h_planned_q20,
          CAST((1000000 * (sha // ta)) // ln.l AS BIGINT)
            AS evenness_avail_ppm,
          CAST((1000000 * (shp // tp)) // ln.l AS BIGINT)
            AS evenness_planned_ppm
        FROM ag CROSS JOIN tt JOIN lut ln ON ln.m = n""")),

    // ------------------------------------------------------------------
    // q257 — stupid-backoff trigram fluency scoring (TextAnalysis
    // .trainBackoffLm + .backoffScore): q110's perplexity-proxy one
    // level deeper — Brants et al.'s S(w₃|w₁w₂) with λ = 0.4 folded in
    // as exact rationals (2/5, 4/25), every division one integer
    // floor, no cross-engine ln anywhere. The three-level model is a
    // LANDED ARTIFACT (train once per process, the q90/q91/q110
    // discipline); K₃ = 300 of the corpus's trigrams, K₂ = 400 of ≤
    // ~900 possible bigrams, K₁ = 25 of the ~30-word vocabulary — so
    // all four rule branches (trigram hit, bigram backoff, unigram
    // backoff, unseen) carry real mass at every SF, and the rule-mix
    // columns READ the backoff structure instead of asserting it.
    // Scoring is five broadcast joins against the exploded trigram
    // stream; the only shuffle is the per-doc rollup.
    // ------------------------------------------------------------------
    "q257_backoff_lm_score" -> GraftQuery(
      build = (s, d) => {
        TextAnalysis.backoffScore(
          documents(s, d).select(col("doc_id"), col("text")),
          "doc_id", "text", s.read.parquet(rawLmDir(s, d)))
          .orderBy("doc")
      },
      oracle = Some(s"""
        WITH tok AS (SELECT doc_id, ${sqlTokens("text")} AS t
          FROM documents),
        t3 AS (SELECT doc_id, t FROM tok WHERE len(t) >= 3),
        ix AS (SELECT doc_id, unnest(range(1, len(t) - 1)) AS i, t
          FROM t3),
        occ AS (SELECT doc_id,
            array_to_string(t[i:i+2], ' ') AS g3,
            array_to_string(t[i:i+1], ' ') AS g2p,
            array_to_string(t[i+1:i+2], ' ') AS g2c,
            t[i+1] AS g1p, t[i+2] AS g1c
          FROM ix),
        tric AS (SELECT g3 AS g, CAST(count(*) AS BIGINT) AS cnt
          FROM occ GROUP BY 1),
        lm3 AS (SELECT g, cnt FROM tric
          ORDER BY cnt DESC, g LIMIT $BackoffTopK3),
        bg AS (SELECT unnest(${sqlBigrams("t")}) AS g FROM tok
          WHERE len(t) >= 2),
        bgc AS (SELECT g, CAST(count(*) AS BIGINT) AS cnt
          FROM bg GROUP BY 1),
        lm2 AS (SELECT g, cnt FROM bgc
          ORDER BY cnt DESC, g LIMIT $BackoffTopK2),
        un AS (SELECT unnest(t) AS g FROM tok),
        unc AS (SELECT g, CAST(count(*) AS BIGINT) AS cnt
          FROM un GROUP BY 1),
        lm1 AS (SELECT g, cnt FROM unc
          ORDER BY cnt DESC, g LIMIT $BackoffTopK1),
        nt AS (SELECT CAST(sum(cnt) AS BIGINT) AS n_tok FROM unc),
        sc AS (SELECT occ.doc_id,
            CASE WHEN l3.cnt IS NOT NULL AND p2.cnt IS NOT NULL THEN 3
              WHEN c2.cnt IS NOT NULL AND p1.cnt IS NOT NULL THEN 2
              WHEN c1.cnt IS NOT NULL THEN 1 ELSE 0 END AS rule,
            CASE WHEN l3.cnt IS NOT NULL AND p2.cnt IS NOT NULL
                THEN (1000000 * l3.cnt) // p2.cnt
              WHEN c2.cnt IS NOT NULL AND p1.cnt IS NOT NULL
                THEN (2000000 * c2.cnt) // (5 * p1.cnt)
              WHEN c1.cnt IS NOT NULL
                THEN (4000000 * c1.cnt) // (25 * nt.n_tok)
              ELSE 0 END AS s_ppm
          FROM occ
          LEFT JOIN lm3 l3 ON occ.g3 = l3.g
          LEFT JOIN lm2 p2 ON occ.g2p = p2.g
          LEFT JOIN lm2 c2 ON occ.g2c = c2.g
          LEFT JOIN lm1 p1 ON occ.g1p = p1.g
          LEFT JOIN lm1 c1 ON occ.g1c = c1.g, nt)
        SELECT doc_id AS doc, CAST(count(*) AS BIGINT) AS n_tri,
          CAST(sum(s_ppm) // count(*) AS BIGINT) AS mean_score_ppm,
          CAST(sum(CASE WHEN rule = 3 THEN 1 ELSE 0 END) AS BIGINT)
            AS n_rule3,
          CAST(sum(CASE WHEN rule = 2 THEN 1 ELSE 0 END) AS BIGINT)
            AS n_rule2,
          CAST(sum(CASE WHEN rule = 1 THEN 1 ELSE 0 END) AS BIGINT)
            AS n_rule1,
          CAST(sum(CASE WHEN rule = 0 THEN 1 ELSE 0 END) AS BIGINT)
            AS n_unseen
        FROM sc GROUP BY doc_id ORDER BY doc""")),

    // ------------------------------------------------------------------
    // q261 — perplexity-gated corpus filter (TextAnalysis
    // .perplexityGate): the CCNet-style quality gate downstream of
    // q257 — score every document against the landed whole-corpus LM,
    // cut each source at its own lower-quartile fluency (counts-domain
    // exact: min s with 4·cum ≥ n), keep the rest. Per-source
    // thresholds, not one global line, so an idiosyncratic source is
    // trimmed against itself rather than emptied. The manifest emits
    // kept/dropped means so the separation is READ (mean_kept > thr >
    // mean_dropped per source). Scoring is q257's broadcast-join pass;
    // the quartile runs on (source, score) count frames.
    // ------------------------------------------------------------------
    "q261_perplexity_gate" -> GraftQuery(
      build = (s, d) => {
        TextAnalysis.perplexityGate(
          documents(s, d).select(col("doc_id"), col("text"),
            col("source")),
          "doc_id", "text", "source", s.read.parquet(rawLmDir(s, d)))
          .orderBy("source")
      },
      oracle = Some(s"""
        WITH tok AS (SELECT doc_id, ${sqlTokens("text")} AS t
          FROM documents),
        t3 AS (SELECT doc_id, t FROM tok WHERE len(t) >= 3),
        ix AS (SELECT doc_id, unnest(range(1, len(t) - 1)) AS i, t
          FROM t3),
        occ AS (SELECT doc_id,
            array_to_string(t[i:i+2], ' ') AS g3,
            array_to_string(t[i:i+1], ' ') AS g2p,
            array_to_string(t[i+1:i+2], ' ') AS g2c,
            t[i+1] AS g1p, t[i+2] AS g1c
          FROM ix),
        tric AS (SELECT g3 AS g, CAST(count(*) AS BIGINT) AS cnt
          FROM occ GROUP BY 1),
        lm3 AS (SELECT g, cnt FROM tric
          ORDER BY cnt DESC, g LIMIT $BackoffTopK3),
        bg AS (SELECT unnest(${sqlBigrams("t")}) AS g FROM tok
          WHERE len(t) >= 2),
        bgc AS (SELECT g, CAST(count(*) AS BIGINT) AS cnt
          FROM bg GROUP BY 1),
        lm2 AS (SELECT g, cnt FROM bgc
          ORDER BY cnt DESC, g LIMIT $BackoffTopK2),
        un AS (SELECT unnest(t) AS g FROM tok),
        unc AS (SELECT g, CAST(count(*) AS BIGINT) AS cnt
          FROM un GROUP BY 1),
        lm1 AS (SELECT g, cnt FROM unc
          ORDER BY cnt DESC, g LIMIT $BackoffTopK1),
        nt AS (SELECT CAST(sum(cnt) AS BIGINT) AS n_tok FROM unc),
        sc AS (SELECT occ.doc_id,
            CASE WHEN l3.cnt IS NOT NULL AND p2.cnt IS NOT NULL
                THEN (1000000 * l3.cnt) // p2.cnt
              WHEN c2.cnt IS NOT NULL AND p1.cnt IS NOT NULL
                THEN (2000000 * c2.cnt) // (5 * p1.cnt)
              WHEN c1.cnt IS NOT NULL
                THEN (4000000 * c1.cnt) // (25 * nt.n_tok)
              ELSE 0 END AS s_ppm
          FROM occ
          LEFT JOIN lm3 l3 ON occ.g3 = l3.g
          LEFT JOIN lm2 p2 ON occ.g2p = p2.g
          LEFT JOIN lm2 c2 ON occ.g2c = c2.g
          LEFT JOIN lm1 p1 ON occ.g1p = p1.g
          LEFT JOIN lm1 c1 ON occ.g1c = c1.g, nt),
        ds AS (SELECT doc_id, CAST(sum(s_ppm) // count(*) AS BIGINT)
            AS sm
          FROM sc GROUP BY 1),
        src AS (SELECT d.source, ds.sm
          FROM documents d JOIN ds ON d.doc_id = ds.doc_id),
        cnts AS (SELECT source, sm, CAST(count(*) AS BIGINT) AS cnt
          FROM src GROUP BY 1, 2),
        cum AS (SELECT source, sm, cnt,
            sum(cnt) OVER (PARTITION BY source ORDER BY sm
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
            sum(cnt) OVER (PARTITION BY source) AS n
          FROM cnts),
        thr AS (SELECT source, min(sm) AS thr_ppm FROM cum
          WHERE cum * 4 >= n GROUP BY 1),
        tot AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs
          FROM documents GROUP BY 1),
        ag AS (SELECT src.source,
            CAST(count(*) AS BIGINT) AS n_scored,
            max(thr.thr_ppm) AS thr_ppm,
            CAST(sum(CASE WHEN src.sm >= thr.thr_ppm THEN 1 ELSE 0 END)
              AS BIGINT) AS n_kept,
            CAST(sum(CASE WHEN src.sm >= thr.thr_ppm THEN src.sm
              ELSE 0 END) AS BIGINT) AS kept_sum,
            CAST(sum(CASE WHEN src.sm < thr.thr_ppm THEN src.sm
              ELSE 0 END) AS BIGINT) AS drop_sum
          FROM src JOIN thr ON src.source = thr.source GROUP BY 1)
        SELECT tot.source, tot.n_docs,
          COALESCE(ag.n_scored, 0) AS n_scored, ag.thr_ppm,
          COALESCE(ag.n_kept, 0) AS n_kept,
          CASE WHEN ag.n_scored > 0
            THEN (1000 * ag.n_kept) // ag.n_scored END AS kept_permille,
          CASE WHEN ag.n_kept > 0
            THEN kept_sum // n_kept END AS mean_kept_ppm,
          CASE WHEN ag.n_scored > ag.n_kept
            THEN drop_sum // (ag.n_scored - ag.n_kept) END
            AS mean_dropped_ppm
        FROM tot LEFT JOIN ag ON ag.source = tot.source
        ORDER BY tot.source""")),

    // ------------------------------------------------------------------
    // q262 — DSIR-style importance selection (TextAnalysis.dsirSelect):
    // Xie et al.'s Data Selection with Importance Resampling restated
    // on the exact lattice — importance weight = target-LM fluency
    // over raw-LM fluency, w = ⌊10⁶·(s_en+1)/(s_raw+1)⌋, with the
    // TARGET model trained on the English slice and the RAW model on
    // the whole corpus (both landed artifacts). The deterministic
    // counterpart of resampling keeps the global top quarter by
    // weight; the registry reads the per-LANGUAGE selection rates —
    // English documents select at a large multiple of every other
    // language, which is the entire point of importance weighting.
    // The global quartile is computed with the bucketPrefixOffsets
    // discipline (bucket-partitioned cumulatives + triangular offset
    // join of a ≤256-row frame) — no single-partition window.
    // ------------------------------------------------------------------
    "q262_dsir_selection" -> GraftQuery(
      build = (s, d) => {
        val sel = TextAnalysis.dsirSelect(
          documents(s, d).select(col("doc_id"), col("text")),
          "doc_id", "text", s.read.parquet(enLmDir(s, d)),
          s.read.parquet(rawLmDir(s, d)))
        sel
          .join(documents(s, d).select(col("doc_id").as("doc"),
            col("lang")), Seq("doc"))
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n_scored"),
            sum(col("sel").cast("long")).as("n_sel"),
            sum(col("w_ppm")).as("wsum"),
            max(col("thr_ppm")).as("thr_ppm"))
          .select(col("lang"), col("n_scored"), col("n_sel"),
            expr("(1000 * n_sel) div n_scored").as("sel_permille"),
            expr("wsum div n_scored").as("mean_w_ppm"),
            col("thr_ppm"))
          .orderBy("lang")
      },
      oracle = Some(s"""
        WITH tok AS (SELECT doc_id, lang, ${sqlTokens("text")} AS t
          FROM documents),
        t3 AS (SELECT doc_id, t FROM tok WHERE len(t) >= 3),
        ix AS (SELECT doc_id, unnest(range(1, len(t) - 1)) AS i, t
          FROM t3),
        occ AS (SELECT doc_id,
            array_to_string(t[i:i+2], ' ') AS g3,
            array_to_string(t[i:i+1], ' ') AS g2p,
            array_to_string(t[i+1:i+2], ' ') AS g2c,
            t[i+1] AS g1p, t[i+2] AS g1c
          FROM ix),
        rlm3 AS (SELECT g3 AS g, CAST(count(*) AS BIGINT) AS cnt
          FROM occ GROUP BY 1 ORDER BY cnt DESC, g LIMIT $BackoffTopK3),
        rbgc AS (SELECT g, CAST(count(*) AS BIGINT) AS cnt
          FROM (SELECT unnest(${sqlBigrams("t")}) AS g FROM tok
            WHERE len(t) >= 2) GROUP BY 1),
        rlm2 AS (SELECT g, cnt FROM rbgc
          ORDER BY cnt DESC, g LIMIT $BackoffTopK2),
        runc AS (SELECT g, CAST(count(*) AS BIGINT) AS cnt
          FROM (SELECT unnest(t) AS g FROM tok) GROUP BY 1),
        rlm1 AS (SELECT g, cnt FROM runc
          ORDER BY cnt DESC, g LIMIT $BackoffTopK1),
        rnt AS (SELECT CAST(sum(cnt) AS BIGINT) AS n_tok FROM runc),
        etok AS (SELECT doc_id, t FROM tok WHERE lang = 'en'),
        eocc AS (SELECT array_to_string(t[i:i+2], ' ') AS g3
          FROM (SELECT unnest(range(1, len(t) - 1)) AS i, t
            FROM etok WHERE len(t) >= 3)),
        elm3 AS (SELECT g3 AS g, CAST(count(*) AS BIGINT) AS cnt
          FROM eocc GROUP BY 1 ORDER BY cnt DESC, g LIMIT $BackoffTopK3),
        ebgc AS (SELECT g, CAST(count(*) AS BIGINT) AS cnt
          FROM (SELECT unnest(${sqlBigrams("t")}) AS g FROM etok
            WHERE len(t) >= 2) GROUP BY 1),
        elm2 AS (SELECT g, cnt FROM ebgc
          ORDER BY cnt DESC, g LIMIT $BackoffTopK2),
        eunc AS (SELECT g, CAST(count(*) AS BIGINT) AS cnt
          FROM (SELECT unnest(t) AS g FROM etok) GROUP BY 1),
        elm1 AS (SELECT g, cnt FROM eunc
          ORDER BY cnt DESC, g LIMIT $BackoffTopK1),
        ent AS (SELECT CAST(sum(cnt) AS BIGINT) AS n_tok FROM eunc),
        scr AS (SELECT occ.doc_id,
            CASE WHEN l3.cnt IS NOT NULL AND p2.cnt IS NOT NULL
                THEN (1000000 * l3.cnt) // p2.cnt
              WHEN c2.cnt IS NOT NULL AND p1.cnt IS NOT NULL
                THEN (2000000 * c2.cnt) // (5 * p1.cnt)
              WHEN c1.cnt IS NOT NULL
                THEN (4000000 * c1.cnt) // (25 * rnt.n_tok)
              ELSE 0 END AS s_ppm
          FROM occ
          LEFT JOIN rlm3 l3 ON occ.g3 = l3.g
          LEFT JOIN rlm2 p2 ON occ.g2p = p2.g
          LEFT JOIN rlm2 c2 ON occ.g2c = c2.g
          LEFT JOIN rlm1 p1 ON occ.g1p = p1.g
          LEFT JOIN rlm1 c1 ON occ.g1c = c1.g, rnt),
        sce AS (SELECT occ.doc_id,
            CASE WHEN l3.cnt IS NOT NULL AND p2.cnt IS NOT NULL
                THEN (1000000 * l3.cnt) // p2.cnt
              WHEN c2.cnt IS NOT NULL AND p1.cnt IS NOT NULL
                THEN (2000000 * c2.cnt) // (5 * p1.cnt)
              WHEN c1.cnt IS NOT NULL
                THEN (4000000 * c1.cnt) // (25 * ent.n_tok)
              ELSE 0 END AS s_ppm
          FROM occ
          LEFT JOIN elm3 l3 ON occ.g3 = l3.g
          LEFT JOIN elm2 p2 ON occ.g2p = p2.g
          LEFT JOIN elm2 c2 ON occ.g2c = c2.g
          LEFT JOIN elm1 p1 ON occ.g1p = p1.g
          LEFT JOIN elm1 c1 ON occ.g1c = c1.g, ent),
        dr AS (SELECT doc_id, CAST(sum(s_ppm) // count(*) AS BIGINT)
            AS s_raw FROM scr GROUP BY 1),
        de AS (SELECT doc_id, CAST(sum(s_ppm) // count(*) AS BIGINT)
            AS s_en FROM sce GROUP BY 1),
        w AS (SELECT dr.doc_id,
            (1000000 * (de.s_en + 1)) // (dr.s_raw + 1) AS w_ppm
          FROM dr JOIN de ON dr.doc_id = de.doc_id),
        wc AS (SELECT w_ppm AS wv, CAST(count(*) AS BIGINT) AS cnt
          FROM w GROUP BY 1),
        cw AS (SELECT wv, cnt,
            sum(cnt) OVER (ORDER BY wv ROWS BETWEEN UNBOUNDED
              PRECEDING AND CURRENT ROW) AS cum,
            sum(cnt) OVER () AS n
          FROM wc),
        thr AS (SELECT min(wv) AS thr_ppm FROM cw WHERE cum * 4 >= n * 3)
        SELECT d.lang, CAST(count(*) AS BIGINT) AS n_scored,
          CAST(sum(CASE WHEN w.w_ppm >= thr.thr_ppm THEN 1 ELSE 0 END)
            AS BIGINT) AS n_sel,
          (1000 * CAST(sum(CASE WHEN w.w_ppm >= thr.thr_ppm THEN 1
            ELSE 0 END) AS BIGINT)) // count(*) AS sel_permille,
          CAST(sum(w.w_ppm) // count(*) AS BIGINT) AS mean_w_ppm,
          max(thr.thr_ppm) AS thr_ppm
        FROM w JOIN documents d ON w.doc_id = d.doc_id, thr
        GROUP BY d.lang ORDER BY d.lang""")),

    // ------------------------------------------------------------------
    // q264 — epoch/repeat planner (CorpusAssembly.epochPlan): q223
    // answered "budget UNDER the corpus — what can be sampled"; this
    // answers the data-constrained regime "budget 3× the corpus — how
    // many times does each source repeat", with the Muennighoff ~4-
    // epoch cap and the unmet budget EMITTED where the cap binds. The
    // q223 avail/weight fixture (w = source ordinal + 1, ΣW = 210,
    // near-even availability) makes both branches fire at every sf:
    // low-weight sources plan fractional epochs (milli-exact floors),
    // sources with w ≥ ~14 hit the 4000-milli cap with real unmet_tok.
    // |sources|-row arithmetic against one 1-row totals broadcast.
    // ------------------------------------------------------------------
    "q264_epoch_plan" -> GraftQuery(
      build = (s, d) => {
        val avail = documents(s, d)
          .select(col("source"), wsTokenCount(col("text")).as("tok"))
          .groupBy(col("source"))
          .agg(sum(col("tok")).as("avail_tok"))
          .withColumn("w", expr("cast(substr(source, 4) as long) + 1"))
        CorpusAssembly.epochPlan(avail, "source", "avail_tok", "w",
            budgetNum = 3, budgetDen = 1)
          .orderBy("src")
      },
      oracle = Some("""
        WITH av AS (SELECT source AS src,
            CAST(sum(len(string_split_regex(lower(text), '\s+')))
              AS BIGINT) AS avail_tok,
            CAST(substr(source, 4) AS BIGINT) + 1 AS w
          FROM documents GROUP BY source),
        tot AS (SELECT CAST(sum(avail_tok) AS BIGINT) AS total_tok,
            CAST(sum(w) AS BIGINT) AS ws
          FROM av),
        p0 AS (SELECT src, w, avail_tok,
            CAST((((CAST(total_tok AS HUGEINT) * 3) // 1) * w) // ws
              AS BIGINT) AS target_tok
          FROM av CROSS JOIN tot),
        p1 AS (SELECT src, w, avail_tok, target_tok,
            CASE WHEN avail_tok > 0 THEN least(4000,
              (1000 * CAST(target_tok AS HUGEINT)) // avail_tok)
              ELSE 0 END AS epochs_milli
          FROM p0),
        p2 AS (SELECT src, w, avail_tok, target_tok,
            CAST(epochs_milli AS BIGINT) AS epochs_milli,
            epochs_milli = 4000 AS at_cap,
            CAST((CAST(avail_tok AS HUGEINT) * epochs_milli) // 1000
              AS BIGINT) AS planned_tok
          FROM p1)
        SELECT src, w, avail_tok, target_tok, epochs_milli, at_cap,
          planned_tok, target_tok - planned_tok AS unmet_tok
        FROM p2 ORDER BY src""")),

    // ------------------------------------------------------------------
    // q275 — vocabulary richness / coverage estimator panel
    // (TextAnalysis.vocabRichness): the three what-haven't-we-seen
    // readouts q224's raw hapax counts stop short of, per source —
    // Good–Turing missing mass N₁/N (the probability the NEXT token
    // is a never-seen type: the acquisition signal), Chao1 richness
    // V + N₁²/(2N₂) (lower-bound TRUE type count, with the
    // bias-corrected N₂ = 0 form), and Yule's K (Σf² − N)·10⁴/N²
    // (length-invariant repetitiveness, where raw TTR is not). All
    // counts integer; each derived stat is one flooring division.
    // ------------------------------------------------------------------
    "q275_vocab_richness" -> GraftQuery(
      build = (s, d) => {
        TextAnalysis.vocabRichness(
          documents(s, d).select(col("source"), col("text")),
          "source", "text")
          .withColumnRenamed("g", "source")
          .orderBy("source")
      },
      oracle = Some(s"""
        WITH tk AS (SELECT source, unnest(${sqlTokens("text")}) AS term
          FROM documents),
        tf AS (SELECT source, term, CAST(count(*) AS BIGINT) AS c
          FROM tk GROUP BY 1, 2),
        ag AS (SELECT source, CAST(sum(c) AS BIGINT) AS n_tokens,
            CAST(count(*) AS BIGINT) AS v_types,
            CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
              AS n1_hapax,
            CAST(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT)
              AS n2_dis,
            sum(CAST(c AS HUGEINT) * c) AS s2
          FROM tf GROUP BY 1)
        SELECT source, n_tokens, v_types, n1_hapax, n2_dis,
          (1000000 * n1_hapax) // n_tokens AS missing_mass_ppm,
          1000000 - (1000000 * n1_hapax) // n_tokens AS coverage_ppm,
          CASE WHEN n2_dis > 0 THEN
            v_types + (n1_hapax * n1_hapax) // (2 * n2_dis)
            ELSE v_types + (n1_hapax * (n1_hapax - 1)) // 2 END
            AS chao1_est,
          CASE WHEN n2_dis > 0 THEN
            (n1_hapax * n1_hapax) // (2 * n2_dis)
            ELSE (n1_hapax * (n1_hapax - 1)) // 2 END
            AS unseen_types_est,
          CAST((10000000 * (s2 - n_tokens)) //
            (CAST(n_tokens AS HUGEINT) * n_tokens) AS BIGINT)
            AS yule_k_milli
        FROM ag ORDER BY source""")),

    // ------------------------------------------------------------------
    // q294 — unigram-LM tokenizer TRAINING (UnigramLM.train): the
    // SentencePiece-family counterpart of q86's BPE — over-complete
    // substring seeds pruned by Viterbi-EM on the Q20 fixed-point
    // log2 lattice (FixedLog / the q180 recursive-CTE twin). The
    // oracle replays the whole chain: corpus char weights + top-200
    // word vocab → 150 seeded substrings → seed costs → unrolled
    // 12-level Viterbi DP (MATERIALIZED per level) → usage → prune to
    // 80 + chars → add-one re-score → final E-step — and must
    // reproduce the landed model bit-for-bit, costs included.
    // ------------------------------------------------------------------
    "q294_unigram_train" -> GraftQuery(
      build = (s, d) =>
        graft.operators.UnigramLM.readModel(s, uniModelDir(s, d))
          .orderBy(col("cost_q20"), col("piece")),
      oracle = Some(s"""
        $uniPrologSql,
        ${uniViterbiSql("ue2", "(SELECT word FROM uvoc)", "ucost1")},
        uuse2 AS (SELECT piece, CAST(sum(cnt) AS BIGINT) AS u_cnt
          FROM (SELECT v.word, unnest(string_split(v.seg, '|')) AS piece
            FROM ue2_v v) sp JOIN uvoc ON sp.word = uvoc.word
          WHERE length(piece) >= 1 GROUP BY piece)
        SELECT k.piece, CAST(length(k.piece) AS BIGINT) AS plen,
          m.seed_w, k.u_cnt AS usage_em,
          coalesce(u2.u_cnt, 0) AS usage_final, c.pcost AS cost_q20
        FROM ukept k JOIN umodel0 m ON k.piece = m.piece
          JOIN ucost1 c ON k.piece = c.piece
          LEFT JOIN uuse2 u2 ON k.piece = u2.piece
        ORDER BY cost_q20, k.piece""")),

    // ------------------------------------------------------------------
    // q295 — unigram-LM ENCODE (UnigramLM.encodeStats): Viterbi-
    // segment the corpus under the q294-landed model — the train→apply
    // loop, tokenizer family #2. Viterbi runs on the DISTINCT-word
    // frame only (vocabulary-scale, Heaps' law) and joins back to the
    // occurrence stream; per-doc output carries the char-token
    // baseline, the unigram token count and the total Q20 encoding
    // cost (the corpus log-likelihood numerator under the piece LM).
    // The oracle re-trains the chain and re-encodes end to end.
    // ------------------------------------------------------------------
    "q295_unigram_encode" -> GraftQuery(
      build = (s, d) =>
        graft.operators.UnigramLM.encodeStats(
          bpeWords(s, d), "doc_id", "w",
          graft.operators.UnigramLM.readModel(s, uniModelDir(s, d)))
          .orderBy("doc_id"),
      oracle = Some(s"""
        $uniPrologSql,
        udw AS MATERIALIZED (SELECT DISTINCT w AS word FROM uws),
        ${uniViterbiSql("uen", "udw", "ucost1")}
        SELECT uws.doc_id, count(*) AS n_words,
          CAST(sum(length(uws.w)) AS BIGINT) AS n_char_tokens,
          CAST(sum(v.np) AS BIGINT) AS n_uni_tokens,
          CAST(sum(v.cost) AS BIGINT) AS cost_q20_total
        FROM uws JOIN uen_v v ON uws.w = v.word
        GROUP BY uws.doc_id ORDER BY doc_id""")),
  )
}
