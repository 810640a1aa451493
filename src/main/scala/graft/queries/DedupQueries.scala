package graft.queries

import org.apache.spark.sql.functions._

import Tables._
import graft.operators.TextDedup
import graft.operators.TextDedup._

/**
 * Dedup operator queries over the `documents` table, each oracle-gated.
 * The DuckDB side is GENERATED from the same constants (prime, permutation
 * table, band geometry) as the Spark side — the two engines independently
 * implement the same algorithm and must agree bit-for-bit.
 *
 * The driver's corpus has no native duplicates at sf0.01, so each query
 * unions in a deterministic duplicated/mutated slice of the corpus itself:
 * the dedup logic is then verified against duplicates it provably must
 * find.
 */
object DedupQueries {

  private val P = TextDedup.Prime

  /** q100 Jaccard threshold (per-mille) and gram size (n = 3: the same
    * shingle universe q23's MinHash signatures hash — and the sparsity
    * that keeps prefix postings short; word BIGRAMS of this 30-word
    * corpus have df ≈ N/20, and their dense postings made the prefix
    * join 16 s at sf0.1 vs sub-second on trigrams). */
  val JaccardTauPm = 900L
  val JaccardShingleN = 3

  /** q107 gram size and "mostly duplicated" threshold (see the q107
    * registry comment for why 6-grams and not the landed 3-gram index). */
  val DupCoverageN = 6
  val DupCoverageFlagPpm = 500000L

  /** q188 span removal: the q107 6-gram universe (sharing is a signal,
    * not a certainty) and a chimera slice — every 10th doc's first
    * [[ChimeraTokens]] tokens + a per-doc unique separator token + the
    * NEXT doc's first [[ChimeraTokens]] tokens under a shifted id — so
    * removal must excise TWO separated spans from each chimera (and
    * flag the matching prefixes of both source docs) while the unique
    * token survives. */
  val SpanRemovalN = 6
  val ChimeraTokens = 12
  val ChimeraMod = 10L
  val ChimeraShift = 500000L

  /** q190 winnowing: trigram hashes, window 4 (guarantee threshold
    * w + n - 1 = 6 shared tokens); the quote slice (first 20 tokens of
    * every 13th doc under a shifted id) plants shared runs the
    * fingerprints provably catch. */
  val WinnowN = 3
  val WinnowW = 4
  val WinnowQuoteMod = 13L
  val WinnowQuoteTokens = 20
  val WinnowQuoteShift = 600000L

  /** q186 containment: 4-gram shingles — the q100 sparsity lesson one
    * step further: on the 30-word synthetic vocabulary even trigram
    * postings are dense enough that the prefix×full-postings join
    * benched 7.8 s at sf0.1; 4-grams are sparse and sub-second. τ =
    * 0.8; injected quotes = the first 14 tokens of every 17th doc
    * under a shifted id (a contiguous token slice's n-grams are a
    * subset of the source's, so true containment = 1000 by
    * construction). */
  val ContainTauPm = 800L
  val ContainShingleN = 4
  val QuoteTokens = 14
  val QuoteMod = 17L

  /** q201 CDC geometry: 4-token rolling window, divisor 8 ⇒ expected
    * 8-token chunks (docs here run 10–99 tokens, so ~2–12 chunks each);
    * chimera heads of 48 tokens guarantee several interior chunks
    * re-synchronize with the source doc after the splice. */
  val CdcW = 4
  val CdcDivisor = 8
  val CdcMinLen = 3
  val CdcCopyMod = 15L
  val CdcCopyShift = 700000L
  val CdcChimTokens = 48
  val CdcChimMod = 10L
  val CdcChimShift = 800000L

  /** q207 leakage fixture: every 12th doc duplicated under shifted ids. */
  val LeakCopyMod = 12L
  val LeakCopyShift = 900000L
  val QuoteShift = 970000L

  /** The shared shingle index over the BASE documents table, landed ONCE
    * per process per sf dir (VERDICT r4 #1): q22/q23/q47 all read the
    * stored (doc_id, content_hash) / (doc_id, h) tables instead of
    * re-hashing the corpus per query — each query hashes only its own
    * small injected-duplicate slice fresh (q22 derives even that from
    * the index). This is the warehouse shape: one md5 pass over the
    * standing corpus, incrementally-hashed deltas on top. */
  private def indexDir(s: org.apache.spark.sql.SparkSession, d: String): String =
    Landings.landedPath(s"shingle_index:$d") { dir =>
      TextDedup.landShingleIndex(
        documents(s, d).select(col("doc_id"), col("text")),
        "text", "doc_id", dir)
    }

  /** q244 standing day-1 state: the (src, ch, cnt) manifest counts and
    * the (ch, ntok) token-mass map of the day-1 corpus (doc_id % 3 != 0)
    * — hash-keyed aggregates only, never text. Landed once per process
    * so the refresh query's timed reps consume a STANDING index. */
  private def refreshDay1Dir(s: org.apache.spark.sql.SparkSession,
      d: String): String =
    Landings.landedPath(s"refresh_day1:$d") { dir =>
      val day1 = documents(s, d).filter(col("doc_id") % 3 =!= 0)
        .select(col("source").as("src"),
          TextDedup.hash64(col("text")).as("ch"),
          size(TextDedup.tokens(col("text"))).cast("long").as("ntok"))
      day1.groupBy(col("src"), col("ch"))
        .agg(count(lit(1)).as("cnt"))
        .write.mode("overwrite").parquet(s"$dir/sh")
      day1.select(col("ch"), col("ntok")).distinct()
        .write.mode("overwrite").parquet(s"$dir/ntok")
    }

  /** DuckDB twin of TextDedup.hash64 / hashMod. */
  private def sqlHash(c: String) = s"CAST(('0x' || substr(md5($c), 1, 15)) AS BIGINT)"
  private def sqlHashMod(c: String) = s"${sqlHash(c)} % $P"

  /** DuckDB twin of TextDedup.shingles (word n-grams w/ short-doc fallback). */
  private def sqlShingles(t: String, n: Int): String =
    s"""CASE WHEN len($t) >= $n
        THEN list_transform(range(1, len($t) - ${n - 2}), i -> array_to_string($t[i:i+${n - 1}], ' '))
        ELSE [array_to_string($t, ' ')] END"""

  private def sqlTokens(text: String) = s"string_split_regex(lower($text), '\\s+')"

  val all: Map[String, GraftQuery] = Map(

    // ------------------------------------------------------------------
    // q22 — exact dedup by content hash, fed ENTIRELY from the landed doc
    // index: the duplicated slice (every 10th doc re-inserted under a new
    // id) reuses the stored content hashes — the plan contains zero md5.
    // Only (hash, id) pairs cross the shuffle; the grouped hash
    // distributes uniformly, so no skew at any scale.
    // ------------------------------------------------------------------
    "q22_exact_dedup" -> GraftQuery(
      build = (s, d) => {
        val idx = TextDedup.readDocIndex(s, indexDir(s, d))
        val dup = idx.filter(col("doc_id") % 10 === 0)
          .select((col("doc_id") + 100000).as("doc_id"), col("content_hash"))
        TextDedup.exactDupGroupsFromIndex(idx.union(dup))
          .select(col("rep_id"), col("n_copies"), col("content_hash"))
          .orderBy("rep_id")
      },
      oracle = Some(s"""
        WITH base(doc_id, text) AS (
          SELECT doc_id, text FROM documents
          UNION ALL
          SELECT doc_id + 100000, text FROM documents WHERE doc_id % 10 = 0)
        SELECT min(doc_id) AS rep_id, count(*) AS n_copies,
               ${sqlHash("text")} AS content_hash
        FROM base GROUP BY 3 ORDER BY rep_id"""),
      headline = true),

    // ------------------------------------------------------------------
    // q23 — MinHash + banded-LSH near-duplicate candidate pairs, reranked
    // with exact word-bigram Jaccard. Candidates come from an equality
    // join on band keys (cost ∝ Σ bucket²) — NEVER an all-pairs product.
    // The mutated slice (every 20th doc + two appended tokens) guarantees
    // high-similarity pairs the banding provably catches.
    // ------------------------------------------------------------------
    "q23_minhash_lsh_dedup" -> GraftQuery(
      build = (s, d) => {
        import graft.operators.ScanOps
        val docs = documents(s, d).select(col("doc_id"), col("text"))
        val mut = docs.filter(col("doc_id") % 20 === 0)
          .select((col("doc_id") + 100000).as("doc_id"),
            concat(col("text"), lit(" zz qq")).as("text"))
        // signatures from the landed index for the base corpus; only the
        // mutated slice (1/20th) is hashed fresh. Rerank reads texts.
        val hashRows = ScanOps.spreadSmallInput(
          TextDedup.readShingleIndex(s, indexDir(s, d))
            .union(TextDedup.shingleHashRows(mut, "text", "doc_id")),
          col("doc_id"))
        minhashCandidatePairsFromHashRows(hashRows,
          ScanOps.spreadSmallInput(docs.union(mut), col("doc_id")))
          .orderBy("doc_a", "doc_b")
      },
      oracle = Some {
        val sigExprs = perms.map { case (a, b) =>
          s"list_min(list_transform(hv, h -> ($a * h + $b) % $P))"
        }.mkString(",\n            ")
        val bandExprs = (0 until Bands).map { bnd =>
          val comps = (0 until RowsPerBand)
            .map(r => s"sig[${bnd * RowsPerBand + r + 1}]").mkString(", ")
          s"concat_ws('_', '$bnd', $comps)"
        }.mkString(",\n            ")
        s"""
        WITH base(doc_id, text) AS (
          SELECT doc_id, text FROM documents
          UNION ALL
          SELECT doc_id + 100000, text || ' zz qq' FROM documents WHERE doc_id % 20 = 0),
        tok AS (SELECT doc_id, text, ${sqlTokens("text")} AS t FROM base),
        sh AS (SELECT doc_id, text, ${sqlShingles("t", 3)} AS sh FROM tok),
        hs AS (SELECT doc_id, text,
          list_transform(sh, s -> ${sqlHashMod("s")}) AS hv FROM sh),
        sig AS (SELECT doc_id, text,
          [ $sigExprs ] AS sig FROM hs),
        bands AS (SELECT doc_id, unnest([
            $bandExprs ]) AS band_key FROM sig),
        kept AS (SELECT doc_id, band_key FROM bands
          WHERE band_key IN (SELECT band_key FROM bands
            GROUP BY band_key HAVING count(*) <= ${TextDedup.DefaultMaxBandBucket})),
        cand AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
          FROM kept x JOIN kept y
            ON x.band_key = y.band_key AND x.doc_id < y.doc_id),
        joined AS (SELECT doc_a, doc_b, sa.sig AS sig_a, sb.sig AS sig_b,
            ${sqlTokens("sa.text")} AS ta, ${sqlTokens("sb.text")} AS tb
          FROM cand
          JOIN sig sa ON cand.doc_a = sa.doc_id
          JOIN sig sb ON cand.doc_b = sb.doc_id),
        gram AS (SELECT doc_a, doc_b, sig_a, sig_b,
            list_distinct(${sqlShingles("ta", 2)}) AS ga,
            list_distinct(${sqlShingles("tb", 2)}) AS gb
          FROM joined),
        scored AS (SELECT doc_a, doc_b,
            CAST(list_sum(list_transform(range(1, ${K + 1}),
              i -> CASE WHEN sig_a[i] = sig_b[i] THEN 1 ELSE 0 END)) AS DOUBLE)
              / ${K.toDouble} AS est_sim,
            CASE WHEN len(ga) + len(gb) - len(list_intersect(ga, gb)) > 0
              THEN CAST(len(list_intersect(ga, gb)) AS DOUBLE)
                / CAST(len(ga) + len(gb) - len(list_intersect(ga, gb)) AS DOUBLE)
              ELSE 1.0 END AS jaccard
          FROM gram)
        SELECT doc_a, doc_b, est_sim, jaccard FROM scored
        WHERE est_sim >= 0.3 ORDER BY doc_a, doc_b"""
      },
      headline = true),

    // ------------------------------------------------------------------
    // q47 — benchmark decontamination: corpus docs sharing ≥3 distinct
    // word trigrams with the held-out "benchmark" slice (every 50th
    // doc, excluded from the corpus side). A leaked slice (benchmark
    // texts re-inserted under new ids with a 2-token tail) guarantees
    // contamination the pass provably catches; shingles in >100 corpus
    // docs are capped away pre-join (boilerplate guard, bounded
    // broadcast — the minhash skew discipline applied to the join key).
    // ------------------------------------------------------------------
    "q47_decontamination" -> GraftQuery(
      build = (s, d) => {
        import graft.operators.ScanOps
        val idx = TextDedup.readShingleIndex(s, indexDir(s, d))
        val leaked = documents(s, d).select(col("doc_id"), col("text"))
          .filter(col("doc_id") % 50 === 0)
          .select((col("doc_id") + 200000).as("doc_id"),
            concat(col("text"), lit(" zz zz")).as("text"))
        // corpus side: stored index minus the bench slice, plus the
        // freshly-hashed leaked delta; bench side: the stored index rows
        // of the bench slice — md5 runs only over `leaked` (1/50th)
        val corpusRows = ScanOps.spreadSmallInput(
          idx.filter(col("doc_id") % 50 =!= 0)
            .union(TextDedup.shingleHashRows(leaked, "text", "doc_id")),
          col("doc_id"))
        val benchRows = idx.filter(col("doc_id") % 50 === 0)
          .select(col("doc_id").as("bench_id"), col("h"))
        TextDedup.contaminationPairsFromHashRows(corpusRows, benchRows)
          .orderBy("doc_id", "bench_id")
      },
      oracle = Some(s"""
        WITH bench AS (SELECT doc_id AS bench_id, text FROM documents
          WHERE doc_id % 50 = 0),
        corpus AS (SELECT doc_id, text FROM documents WHERE doc_id % 50 <> 0
          UNION ALL
          SELECT doc_id + 200000, text || ' zz zz' FROM documents
          WHERE doc_id % 50 = 0),
        ct AS (SELECT doc_id, ${sqlTokens("text")} AS t FROM corpus),
        csh AS (SELECT doc_id, unnest(list_distinct(${sqlShingles("t", 3)})) AS s FROM ct),
        cs AS (SELECT doc_id, ${sqlHashMod("s")} AS h FROM csh),
        bt AS (SELECT bench_id, ${sqlTokens("text")} AS t FROM bench),
        bsh AS (SELECT bench_id, unnest(list_distinct(${sqlShingles("t", 3)})) AS s FROM bt),
        bs AS (SELECT bench_id, ${sqlHashMod("s")} AS h FROM bsh),
        nd AS (SELECT doc_id, count(*) AS n_doc_shingles FROM cs GROUP BY doc_id),
        hot AS (SELECT h FROM cs GROUP BY h HAVING count(*) > 100),
        kept AS (SELECT doc_id, h FROM cs WHERE h NOT IN (SELECT h FROM hot)),
        ov AS (SELECT kept.doc_id, bs.bench_id, count(*) AS n_shared
          FROM kept JOIN bs ON kept.h = bs.h GROUP BY 1, 2)
        SELECT ov.doc_id, bench_id, n_shared, n_doc_shingles,
          CAST(n_shared AS DOUBLE) / CAST(n_doc_shingles AS DOUBLE) AS overlap_ratio
        FROM ov JOIN nd ON ov.doc_id = nd.doc_id
        WHERE n_shared >= 3 ORDER BY ov.doc_id, bench_id""")),

    // ------------------------------------------------------------------
    // q24 — 16-bit SimHash fingerprint per document: explode tokens, one
    // conditional aggregation per bit (generated, not hand-written), sign
    // of the sum sets the bit. One shuffle on doc_id; at scale the
    // explode+agg is map-side combined.
    // ------------------------------------------------------------------
    "q24_simhash_fingerprint" -> GraftQuery(
      build = (s, d) =>
        simhashFingerprint(documents(s, d), "text", "doc_id")
          .orderBy("doc_id"),
      oracle = Some {
        val bitSums = (0 until 16)
          .map(j => s"SUM(CASE WHEN (h >> $j) & 1 = 1 THEN 1 ELSE -1 END) AS s$j")
          .mkString(",\n            ")
        val bitVal = (0 until 16)
          .map(j => s"CASE WHEN s$j > 0 THEN ${1L << j} ELSE 0 END")
          .mkString(" + ")
        s"""
        WITH tok AS (SELECT doc_id, unnest(${sqlTokens("text")}) AS token
          FROM documents),
        h AS (SELECT doc_id, ${sqlHash("token")} AS h FROM tok),
        s AS (SELECT doc_id, count(*) AS n_tokens,
            $bitSums
          FROM h GROUP BY doc_id)
        SELECT doc_id, CAST($bitVal AS BIGINT) AS simhash, n_tokens
        FROM s ORDER BY doc_id"""
      }),

    // ------------------------------------------------------------------
    // q62 — SimHash NEAR-DUP PAIRS (q24 only fingerprints): 32-bit
    // simhash, candidate pairs by pigeonhole block probing (4 × 8-bit
    // blocks ⇒ every pair within Hamming 3 shares a block exactly),
    // exact XOR+popcount rerank. The mutated slice (every 25th doc with
    // one appended token) flips only the bit-sums sitting near zero, so
    // the injected pairs land at small Hamming distance and the pass
    // provably finds them. The oracle reproduces fingerprints, blocks,
    // the skew-cap HAVING, and the popcount bit-for-bit.
    // ------------------------------------------------------------------
    "q62_simhash_near_dup" -> GraftQuery(
      build = (s, d) => {
        val docs = documents(s, d).select(col("doc_id"), col("text"))
        val mut = docs.filter(col("doc_id") % 25 === 0)
          .select((col("doc_id") + 300000).as("doc_id"),
            concat(col("text"), lit(" qq")).as("text"))
        TextDedup.simhashNearDupPairs(docs.union(mut), "text", "doc_id")
          .orderBy("doc_a", "doc_b")
      },
      oracle = Some {
        val bits = 32
        val bitSums = (0 until bits)
          .map(j => s"SUM(CASE WHEN (h >> $j) & 1 = 1 THEN 1 ELSE -1 END) AS s$j")
          .mkString(",\n            ")
        val bitVal = (0 until bits)
          .map(j => s"CASE WHEN s$j > 0 THEN ${1L << j} ELSE 0 END")
          .mkString(" + ")
        val blockExprs = (0 until 4)
          .map(j => s"concat_ws('_', '$j', CAST((simhash >> ${j * 8}) & 255 AS VARCHAR))")
          .mkString(",\n            ")
        val hamming = (0 until bits)
          .map(j => s"CASE WHEN ((a.simhash >> $j) & 1) <> ((b.simhash >> $j) & 1) THEN 1 ELSE 0 END")
          .mkString(" + ")
        s"""
        WITH base(doc_id, text) AS (
          SELECT doc_id, text FROM documents
          UNION ALL
          SELECT doc_id + 300000, text || ' qq' FROM documents WHERE doc_id % 25 = 0),
        tok AS (SELECT doc_id, unnest(${sqlTokens("text")}) AS token FROM base),
        hh AS (SELECT doc_id, ${sqlHash("token")} AS h FROM tok),
        fp AS (SELECT doc_id, CAST($bitVal AS BIGINT) AS simhash
          FROM (SELECT doc_id,
            $bitSums
          FROM hh GROUP BY doc_id)),
        blk AS (SELECT doc_id, unnest([
            $blockExprs ]) AS block_key FROM fp),
        kept AS (SELECT doc_id, block_key FROM blk
          WHERE block_key IN (SELECT block_key FROM blk
            GROUP BY block_key HAVING count(*) <= ${TextDedup.DefaultMaxBandBucket})),
        cand AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
          FROM kept x JOIN kept y
            ON x.block_key = y.block_key AND x.doc_id < y.doc_id),
        scored AS (SELECT doc_a, doc_b, CAST($hamming AS BIGINT) AS hamming
          FROM cand JOIN fp a ON cand.doc_a = a.doc_id
                    JOIN fp b ON cand.doc_b = b.doc_id)
        SELECT doc_a, doc_b, hamming FROM scored
        WHERE hamming <= 3 ORDER BY doc_a, doc_b"""
      }),

    // ------------------------------------------------------------------
    // q61 — near-dup pairs → dedup CLUSTERS: connected components by
    // min-label propagation (GraphOps), the step that turns pairwise
    // similarity into "keep one canonical doc per cluster". The fixture
    // builds CHAINS (A~B, B~C with A~C never emitted, plus a branch
    // every 3rd chain) so the gate fails unless labels genuinely
    // propagate transitively — grouping by pair endpoints cannot pass
    // it. The oracle computes the same fixpoint with a recursive CTE
    // (reachability closure + min per node). `keep` marks the canonical
    // (min-id) member; DedupClusterSpec wires the same operator to the
    // real MinHash-LSH pairs.
    // ------------------------------------------------------------------
    "q61_dedup_clusters" -> GraftQuery(
      build = (s, d) => {
        val ids = documents(s, d).select(col("doc_id"))
        val tenth = ids.filter(col("doc_id") % 10 === 0)
        val pairs = tenth
          .select(col("doc_id").as("a"), (col("doc_id") + 100000).as("b"))
          .union(tenth.select((col("doc_id") + 100000).as("a"),
            (col("doc_id") + 200000).as("b")))
          .union(ids.filter(col("doc_id") % 30 === 0)
            .select(col("doc_id").as("a"), (col("doc_id") + 300000).as("b")))
        val cc = graft.operators.GraphOps.connectedComponents(pairs, "a", "b")
        val sizes = cc.groupBy("component")
          .agg(count(lit(1)).as("cluster_size"))
        cc.join(sizes, "component")
          .select(col("node"), col("component"), col("cluster_size"),
            (col("node") === col("component"))
              .cast(org.apache.spark.sql.types.IntegerType).as("keep"))
          .orderBy("node")
      },
      oracle = Some("""
        WITH RECURSIVE pairs(a, b) AS (
          SELECT doc_id, doc_id + 100000 FROM documents WHERE doc_id % 10 = 0
          UNION ALL
          SELECT doc_id + 100000, doc_id + 200000 FROM documents
          WHERE doc_id % 10 = 0
          UNION ALL
          SELECT doc_id, doc_id + 300000 FROM documents WHERE doc_id % 30 = 0),
        edges AS (SELECT a AS u, b AS v FROM pairs
          UNION SELECT b, a FROM pairs),
        nodes AS (SELECT DISTINCT u AS n FROM edges),
        reach(n, l) AS (
          SELECT n, n FROM nodes
          UNION
          SELECT e.v, r.l FROM reach r JOIN edges e ON e.u = r.n),
        cc AS (SELECT n AS node, min(l) AS component FROM reach GROUP BY n),
        sz AS (SELECT component, count(*) AS cluster_size FROM cc
          GROUP BY component)
        SELECT node, cc.component, cluster_size,
          CAST(node = cc.component AS INT) AS keep
        FROM cc JOIN sz ON cc.component = sz.component
        ORDER BY node""")),

    // ------------------------------------------------------------------
    // q84 — edit-distance-1 similarity join (StringSimilarity
    // .editDistanceOnePairs, FastSS deletion neighborhoods): customer
    // names within one typo of each other. The fuzzy predicate becomes
    // an EQUALITY join on deletion variants (n+1 per string, linear),
    // exact levenshtein only on surviving candidates — the same
    // candidates-by-bucket discipline as MinHash (q23) and SimHash
    // (q62), for the edit-distance metric those can't express. The
    // oracle pays the quadratic levenshtein cross join the engine
    // exists to avoid.
    // ------------------------------------------------------------------
    "q84_edit_distance_join" -> GraftQuery(
      build = (s, d) =>
        // r17 OPTIMIZATION (guide §2.5): the deletion-variant Generate
        // + three joins ran at the customer parquet's split count
        // (3 tasks, 2.5 s of a 3.9 s wall); spread first (q23/q100
        // discipline) so the variant fan-out runs at session
        // parallelism.
        graft.operators.StringSimilarity.editDistanceOnePairs(
          graft.operators.ScanOps.spreadSmallInput(
            Tables.customer(s, d), col("c_custkey")),
          "c_custkey", "c_name")
          .select(col("id_a").as("custkey_a"), col("id_b").as("custkey_b"),
            col("str_a").as("name_a"), col("str_b").as("name_b"),
            col("dist").cast("long").as("dist"))
          .orderBy("custkey_a", "custkey_b"),
      oracle = Some("""
        SELECT c1.c_custkey AS custkey_a, c2.c_custkey AS custkey_b,
          c1.c_name AS name_a, c2.c_name AS name_b,
          CAST(levenshtein(c1.c_name, c2.c_name) AS BIGINT) AS dist
        FROM customer c1 JOIN customer c2
          ON c1.c_custkey < c2.c_custkey
          AND levenshtein(c1.c_name, c2.c_name) <= 1
        ORDER BY custkey_a, custkey_b""")),

    // ------------------------------------------------------------------
    // q100 — EXACT Jaccard set-similarity join by prefix filtering
    // (TextDedup.jaccardPrefixJoin, the AllPairs/PPJoin family) over the
    // same word-bigram universe as q23's MinHash — the exact,
    // completeness-GUARANTEED counterpart of the probabilistic LSH
    // pipeline (the recall auditor runs this on samples of what q23
    // processes in full). Candidates come from the rarest-gram prefix
    // postings (never full posting lists), sized-filtered, then exactly
    // counted; ceil and the Jaccard test are integer cross-multiplied.
    // Injected slices: exact copies (J = 1) and two-token-appended
    // mutations (two extra trigrams, J ≈ 0.96) must both surface at
    // τ = 0.9.
    // ------------------------------------------------------------------
    "q100_jaccard_prefix_join" -> GraftQuery(
      build = (s, d) => {
        val base = documents(s, d).select(col("doc_id"), col("text"))
        val copies = base.filter(col("doc_id") % 15 === 0)
          .select((col("doc_id") + 900000).as("doc_id"), col("text"))
        val mutated = base.filter(col("doc_id") % 21 === 0)
          .select((col("doc_id") + 950000).as("doc_id"),
            concat(col("text"), lit(" zz qq")).as("text"))
        TextDedup.jaccardPrefixJoin(
          graft.operators.ScanOps.spreadSmallInput(
            base.unionByName(copies).unionByName(mutated), col("doc_id")),
          "doc_id", "text", JaccardTauPm, JaccardShingleN)
          .orderBy("doc_a", "doc_b")
      },
      oracle = Some(s"""
        WITH base(doc_id, text) AS (
          SELECT doc_id, text FROM documents
          UNION ALL
          SELECT doc_id + 900000, text FROM documents WHERE doc_id % 15 = 0
          UNION ALL
          SELECT doc_id + 950000, text || ' zz qq' FROM documents
          WHERE doc_id % 21 = 0),
        sets AS (SELECT DISTINCT doc_id,
            unnest(${sqlShingles(sqlTokens("text"), JaccardShingleN)})
              AS g FROM base),
        gd AS (SELECT doc_id, g, count(*) OVER (PARTITION BY g) AS gdf
          FROM sets),
        sz AS (SELECT doc_id, g, gdf,
            count(*) OVER (PARTITION BY doc_id) AS ssize,
            row_number() OVER (PARTITION BY doc_id ORDER BY gdf, g) AS pos
          FROM gd),
        pf AS (SELECT doc_id, g, ssize FROM sz
          WHERE pos <= ssize - ($JaccardTauPm * ssize + 999) // 1000 + 1),
        cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
            a.ssize AS sa, b.ssize AS sb
          FROM pf a JOIN pf b ON a.g = b.g AND a.doc_id < b.doc_id
          WHERE $JaccardTauPm * greatest(a.ssize, b.ssize) <=
            1000 * least(a.ssize, b.ssize)),
        ov AS (SELECT c.doc_a, c.doc_b, c.sa, c.sb, count(*) AS overlap
          FROM cand c JOIN sets ga ON c.doc_a = ga.doc_id
            JOIN sets gb ON c.doc_b = gb.doc_id AND ga.g = gb.g
          GROUP BY 1, 2, 3, 4)
        SELECT doc_a, doc_b, CAST(sa AS BIGINT) AS sa,
          CAST(sb AS BIGINT) AS sb, overlap,
          (overlap * 1000) // (sa + sb - overlap) AS jaccard_pm
        FROM ov WHERE overlap * 1000 >= $JaccardTauPm * (sa + sb - overlap)
        ORDER BY doc_a, doc_b""")),

    // ------------------------------------------------------------------
    // q107 — duplicated-n-gram coverage (Lee et al. 2022 exact-substring
    // dedup signal): per doc, the ppm of its distinct word 6-grams
    // occurring in ≥2 rows. 6-grams, NOT the landed 3-gram index: 30⁶
    // possible 6-grams make sharing a signal; 27k possible trigrams on
    // this vocabulary are shared by construction. The re-inserted
    // every-15th slice must score 1,000,000 ppm (every gram occurs in
    // its copy); base docs score by natural phrase overlap. One corpus
    // explode + one count-window on the gram hash (the only
    // corpus-sized shuffle) + a per-doc rollup.
    // ------------------------------------------------------------------
    "q107_dup_ngram_coverage" -> GraftQuery(
      build = (s, d) => {
        val docs = documents(s, d).select(col("doc_id"), col("text"))
        val dup = docs.filter(col("doc_id") % 15 === 0)
          .select((col("doc_id") + 100000).as("doc_id"), col("text"))
        // r17 OPTIMIZATION (guide §2.5 — input parallelism): the
        // shingle Generate is the CPU of this query and ran at the
        // parquet split count (2 tasks, 2.7 s of a 3.3 s wall);
        // spreading the small input first runs it at session
        // parallelism — the q23/q100 discipline.
        TextDedup.dupNgramCoverage(
          graft.operators.ScanOps.spreadSmallInput(
            docs.union(dup), col("doc_id")),
          "doc_id", "text",
          shingleN = DupCoverageN, flagPpm = DupCoverageFlagPpm)
          .orderBy("doc_id")
      },
      oracle = Some(s"""
        WITH base(doc_id, text) AS (
          SELECT doc_id, text FROM documents
          UNION ALL
          SELECT doc_id + 100000, text FROM documents WHERE doc_id % 15 = 0),
        cs AS (SELECT DISTINCT doc_id,
            unnest(${sqlShingles(sqlTokens("text"), DupCoverageN)}) AS g
          FROM base),
        hh AS (SELECT doc_id, ${sqlHash("g")} AS h FROM cs),
        w AS (SELECT doc_id, count(*) OVER (PARTITION BY h) AS df_h FROM hh),
        p AS (SELECT doc_id, count(*) AS n_grams,
            CAST(sum(CASE WHEN df_h >= 2 THEN 1 ELSE 0 END) AS BIGINT)
              AS n_dup_grams
          FROM w GROUP BY doc_id)
        SELECT doc_id, n_grams, n_dup_grams,
          CAST((n_dup_grams * 1000000) // n_grams AS BIGINT) AS dup_ppm,
          CASE WHEN (n_dup_grams * 1000000) // n_grams >= $DupCoverageFlagPpm
            THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS dup_heavy
        FROM p ORDER BY doc_id""")),

    // ------------------------------------------------------------------
    // q188 — exact-substring dedup REMOVAL (TextDedup
    // .removeDuplicateSpans): the Lee-et-al-2022 production step q107
    // only measures — every token covered by a corpus-duplicated 6-gram
    // is excised, maximal removed runs are the spans, and the output IS
    // the cleaned corpus (kept_text) plus drop accounting. Fixture:
    // the q107 full-duplicate slice (every 15th doc re-inserted → both
    // copies must come back EMPTY with one span) plus a chimera slice
    // (first 12 tokens of doc d + a unique separator + first 12 of doc
    // d+1) that must lose exactly its two borrowed regions as TWO
    // separate spans while the unique token survives — the overlap-
    // merge (consecutive gram extents → one island) and span-split
    // boundaries in one row. Oracle: identical gram/position
    // arithmetic, count window, integer-island lag, and token-index
    // anti-join re-derivation of kept_text.
    // ------------------------------------------------------------------
    "q188_dup_span_removal" -> GraftQuery(
      build = (s, d) => {
        val docs = documents(s, d).select(col("doc_id"), col("text"))
        val dup = docs.filter(col("doc_id") % 15 === 0)
          .select((col("doc_id") + 100000).as("doc_id"), col("text"))
        val heads = docs.select(col("doc_id"),
          slice(TextDedup.tokens(col("text")), 1, ChimeraTokens).as("head"))
        val chim = heads.as("x")
          .join(heads.select((col("doc_id") - 1).as("jid"),
            col("head").as("head_b")).as("y"),
            col("x.doc_id") === col("y.jid"))
          .filter(col("x.doc_id") % ChimeraMod === 0)
          .select((col("x.doc_id") + ChimeraShift).as("doc_id"),
            concat_ws(" ", array_join(col("head"), " "),
              concat(lit("uniq"), col("x.doc_id").cast("string")),
              array_join(col("head_b"), " ")).as("text"))
        TextDedup.removeDuplicateSpans(
          docs.unionByName(dup).unionByName(chim),
          "doc_id", "text", SpanRemovalN)
          .orderBy("doc_id")
      },
      oracle = Some(s"""
        WITH base(doc_id, text) AS (
          SELECT doc_id, text FROM documents
          UNION ALL
          SELECT doc_id + 100000, text FROM documents WHERE doc_id % 15 = 0
          UNION ALL
          SELECT a.doc_id + $ChimeraShift,
            array_to_string((${sqlTokens("a.text")})[1:$ChimeraTokens], ' ')
              || ' uniq' || CAST(a.doc_id AS VARCHAR) || ' ' ||
              array_to_string((${sqlTokens("b.text")})[1:$ChimeraTokens], ' ')
          FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
          WHERE a.doc_id % $ChimeraMod = 0),
        tok AS (SELECT doc_id, ${sqlTokens("text")} AS t FROM base),
        tk AS (SELECT doc_id, t, len(t) AS nt FROM tok),
        pos AS (SELECT doc_id, t, nt,
            unnest(range(1, greatest(nt - ${SpanRemovalN - 1}, 1) + 1)) AS p
          FROM tk),
        gr AS (SELECT doc_id, nt, p, least(p + ${SpanRemovalN - 1}, nt) AS e,
            ${sqlHash(s"array_to_string(t[p:p+${SpanRemovalN - 1}], ' ')")} AS h
          FROM pos),
        fl AS (SELECT doc_id, p, e FROM (
            SELECT *, count(*) OVER (PARTITION BY h) AS dfh FROM gr)
          WHERE dfh >= 2),
        rem AS (SELECT DISTINCT doc_id, i FROM (
            SELECT doc_id, unnest(range(p, e + 1)) AS i FROM fl)),
        rn AS (SELECT doc_id, i,
            lag(i) OVER (PARTITION BY doc_id ORDER BY i) AS pv FROM rem),
        pd AS (SELECT doc_id, count(*) AS tokens_removed,
            sum(CASE WHEN pv IS NULL OR i > pv + 1 THEN 1 ELSE 0 END)
              AS spans_removed
          FROM rn GROUP BY doc_id),
        ti AS (SELECT doc_id, t, unnest(range(1, nt + 1)) AS i FROM tk),
        tv AS (SELECT doc_id, i, t[i] AS tok FROM ti),
        kt AS (SELECT tv.doc_id AS doc_id,
            array_to_string(list(tok ORDER BY tv.i), ' ') AS kept_text
          FROM tv LEFT JOIN rem ON tv.doc_id = rem.doc_id AND tv.i = rem.i
          WHERE rem.i IS NULL GROUP BY tv.doc_id)
        SELECT tk.doc_id AS doc_id, CAST(nt AS BIGINT) AS n_tokens,
          CAST(coalesce(tokens_removed, 0) AS BIGINT) AS tokens_removed,
          CAST(coalesce(spans_removed, 0) AS BIGINT) AS spans_removed,
          coalesce(kept_text, '') AS kept_text
        FROM tk LEFT JOIN pd ON tk.doc_id = pd.doc_id
          LEFT JOIN kt ON tk.doc_id = kt.doc_id
        ORDER BY doc_id"""),
      headline = true),

    // ------------------------------------------------------------------
    // q190 — winnowing fingerprints (TextDedup.winnowingFingerprints,
    // the MOSS scheme): per-window argmin of (gram-hash, position) keys
    // selects ~2/(w+1) of positions with the density guarantee (no
    // w-gram stretch unfingerprinted) and the locality guarantee (any
    // >= w+n-1-token shared run yields an identical fingerprint hash in
    // both docs — pinned by spec on the quote slice). The sub-sampled
    // fingerprint index is what plagiarism/overlap detection joins on
    // instead of a full gram index. Oracle: identical key arithmetic
    // (hash*2^20+pos in HUGEINT), window min, head-validity filter,
    // and semi-join re-derivation.
    // ------------------------------------------------------------------
    "q190_winnowing_fingerprints" -> GraftQuery(
      build = (s, d) => {
        val docs = documents(s, d).select(col("doc_id"), col("text"))
        val quotes = docs.filter(col("doc_id") % WinnowQuoteMod === 0)
          .select((col("doc_id") + WinnowQuoteShift).as("doc_id"),
            array_join(slice(TextDedup.tokens(col("text")), 1,
              WinnowQuoteTokens), " ").as("text"))
        TextDedup.winnowingFingerprints(docs.unionByName(quotes),
          "doc_id", "text", WinnowN, WinnowW)
          .orderBy("doc_id", "pos")
      },
      oracle = Some(s"""
        WITH base(doc_id, text) AS (
          SELECT doc_id, text FROM documents
          UNION ALL
          SELECT doc_id + $WinnowQuoteShift,
            array_to_string((${sqlTokens("text")})[1:$WinnowQuoteTokens], ' ')
          FROM documents WHERE doc_id % $WinnowQuoteMod = 0),
        tok AS (SELECT doc_id, ${sqlTokens("text")} AS t FROM base),
        tk AS (SELECT doc_id, t, greatest(len(t) - ${WinnowN - 1}, 1) AS maxp
          FROM tok),
        pos AS (SELECT doc_id, t, maxp, unnest(range(1, maxp + 1)) AS p
          FROM tk),
        gr AS (SELECT doc_id, p, maxp,
            ${sqlHash(s"array_to_string(t[p:p+${WinnowN - 1}], ' ')")} AS h
          FROM pos),
        wk AS (SELECT doc_id, p, maxp, h,
            CAST(h AS HUGEINT) * ${1L << TextDedup.WinnowPosBits} + p AS k
          FROM gr),
        hm AS (SELECT doc_id, p, maxp, k,
            min(k) OVER (PARTITION BY doc_id ORDER BY p
              ROWS BETWEEN CURRENT ROW AND ${WinnowW - 1} FOLLOWING) AS fmin
          FROM wk),
        sel AS (SELECT DISTINCT doc_id, fmin AS k FROM hm
          WHERE p <= greatest(maxp - ${WinnowW - 1}, 1))
        SELECT wk.doc_id AS doc_id, CAST(wk.p AS BIGINT) AS pos, wk.h AS h
        FROM wk JOIN sel ON wk.doc_id = sel.doc_id AND wk.k = sel.k
        ORDER BY doc_id, pos""")),

    // ------------------------------------------------------------------
    // q114 — canonical-doc selection (GraphOps.canonicalMembers): the
    // production completion of q61. q61 proves labels propagate and
    // keeps the MIN-ID member; real dedup keeps the BEST member —
    // here the longest copy (n_chars, tie doc_id), the usual "keep the
    // most complete crawl" policy. The chain fixture (d ~ d+1 ~ d+2 per
    // every-10th doc, all REAL docs so the quality join is live) makes
    // the winner quality-dependent: a min-id or max-id shortcut gates
    // red whenever the middle doc is longest. Oracle: the q61 recursive
    // reachability closure + a quality-ranked window.
    // ------------------------------------------------------------------
    "q114_canonical_docs" -> GraftQuery(
      build = (s, d) => {
        val docs = documents(s, d)
        val tenth = docs.filter(col("doc_id") % 10 === 0)
          .select(col("doc_id"))
        val pairs = tenth
          .select(col("doc_id").as("a"), (col("doc_id") + 1).as("b"))
          .union(tenth.select((col("doc_id") + 1).as("a"),
            (col("doc_id") + 2).as("b")))
        graft.operators.GraphOps
          .canonicalMembers(pairs, "a", "b", docs, "doc_id", "n_chars")
          .orderBy("node")
      },
      oracle = Some("""
        WITH RECURSIVE pairs(a, b) AS (
          SELECT doc_id, doc_id + 1 FROM documents WHERE doc_id % 10 = 0
          UNION ALL
          SELECT doc_id + 1, doc_id + 2 FROM documents WHERE doc_id % 10 = 0),
        edges AS (SELECT a AS u, b AS v FROM pairs
          UNION SELECT b, a FROM pairs),
        nodes AS (SELECT DISTINCT u AS n FROM edges),
        reach(n, l) AS (
          SELECT n, n FROM nodes
          UNION
          SELECT e.v, r.l FROM reach r JOIN edges e ON e.u = r.n),
        cc AS (SELECT n AS node, min(l) AS component FROM reach GROUP BY n),
        m AS (SELECT node, component, n_chars AS quality
          FROM cc JOIN documents ON doc_id = node),
        r AS (SELECT node, component, quality,
            count(*) OVER (PARTITION BY component) AS cluster_size,
            row_number() OVER (PARTITION BY component
              ORDER BY quality DESC, node) AS rk
          FROM m)
        SELECT node, component, cluster_size, quality,
          CAST(rk = 1 AS INT) AS keep
        FROM r ORDER BY node""")),

    // ------------------------------------------------------------------
    // q186 — directed containment join (TextDedup.containmentJoin):
    // C(A→B) = |A∩B|/|A| ≥ 0.8 finds SUBSET duplication symmetric
    // Jaccard structurally misses (a quote inside a page has J ≈ 0.01
    // but C = 1.0) — doc-in-doc, excerpts, quoted replies. Prefix
    // theorem prunes on the CONTAINED side only (B's size is
    // unconstrained — that asymmetry is the point); A's rarest-gram
    // prefix joins B's postings under the corpus-relative 10% df cap
    // (floor 2 — r10 verdict #4; never fires on this fixture, max
    // 4-gram df is 6 of 5295 docs, and both engines mirror the cap),
    // exact overlap verifies. The injected quote slice must surface
    // with containment_pm = 1000 against its source (contiguous token
    // slices ⇒ trigram subset).
    // ------------------------------------------------------------------
    "q186_containment_join" -> GraftQuery(
      build = (s, d) => {
        val base = documents(s, d).select(col("doc_id"), col("text"))
        val quotes = base.filter(col("doc_id") % QuoteMod === 0)
          .select((col("doc_id") + QuoteShift).as("doc_id"),
            array_join(slice(split(lower(col("text")), "\\s+"), 1,
              QuoteTokens), " ").as("text"))
        TextDedup.containmentJoin(
          graft.operators.ScanOps.spreadSmallInput(
            base.unionByName(quotes), col("doc_id")),
          "doc_id", "text", ContainTauPm, ContainShingleN)
          .orderBy("doc_a", "doc_b")
      },
      oracle = Some(s"""
        WITH base(doc_id, text) AS (
          SELECT doc_id, text FROM documents
          UNION ALL
          SELECT doc_id + $QuoteShift,
            array_to_string((${sqlTokens("text")})[1:$QuoteTokens], ' ')
          FROM documents WHERE doc_id % $QuoteMod = 0),
        sets AS (SELECT DISTINCT doc_id,
            unnest(${sqlShingles(sqlTokens("text"), ContainShingleN)})
              AS g FROM base),
        gd AS (SELECT doc_id, g, count(*) OVER (PARTITION BY g) AS gdf
          FROM sets),
        sz AS (SELECT doc_id, g, gdf,
            count(*) OVER (PARTITION BY doc_id) AS ssize,
            row_number() OVER (PARTITION BY doc_id ORDER BY gdf, g) AS pos
          FROM gd),
        pf AS (SELECT doc_id, g, ssize FROM sz
          WHERE pos <= ssize - ($ContainTauPm * ssize + 999) // 1000 + 1),
        capped AS (SELECT doc_id, g, ssize FROM sz
          WHERE gdf <= greatest(((SELECT count(*) FROM base) * 100) // 1000, 2)),
        cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
            a.ssize AS sa, b.ssize AS sb
          FROM pf a JOIN capped b ON a.g = b.g AND a.doc_id <> b.doc_id),
        ov AS (SELECT c.doc_a, c.doc_b, c.sa, c.sb,
            CAST(count(*) AS BIGINT) AS overlap
          FROM cand c JOIN sets ga ON c.doc_a = ga.doc_id
            JOIN sets gb ON c.doc_b = gb.doc_id AND ga.g = gb.g
          GROUP BY 1, 2, 3, 4)
        SELECT doc_a, doc_b, CAST(sa AS BIGINT) AS sa,
          CAST(sb AS BIGINT) AS sb, overlap,
          (overlap * 1000) // sa AS containment_pm
        FROM ov WHERE overlap * 1000 >= $ContainTauPm * sa
        ORDER BY doc_a, doc_b""")),

    // ------------------------------------------------------------------
    // q201 — content-defined chunk dedup (TextDedup.cdcChunks): the
    // Rabin/LBFS boundary discipline at token granularity — the
    // DEDUPABLE-UNITS view that whole-doc hashing (q22) and span
    // accounting (q188) bracket. Fixture: base corpus ∪ exact copies
    // (every copy chunk must find its base twin) ∪ chimera docs
    // stitched from two 48-token heads (content-defined boundaries
    // RE-SYNCHRONIZE after the splice, so interior head chunks match
    // their source docs even though the documents differ — the CDC
    // property, demonstrated not asserted). Per-cohort accounting of
    // chunks whose content hash appears ≥2× corpus-wide; dup_ppm is
    // the exact integer lattice, hash-gated. The corpus-sized shuffles
    // are the positions explode and one chash-partitioned count
    // window — never a pairwise comparison.
    // ------------------------------------------------------------------
    "q201_cdc_chunk_dedup" -> GraftQuery(
      build = (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val docs = documents(s, d).select(col("doc_id"), col("text"))
        val base = docs.withColumn("cohort", lit("base"))
        val copy = docs.filter(col("doc_id") % CdcCopyMod === 0)
          .select((col("doc_id") + CdcCopyShift).as("doc_id"),
            col("text"), lit("copy").as("cohort"))
        val heads = docs.select(col("doc_id"),
          concat_ws(" ", slice(TextDedup.tokens(col("text")), 1,
            CdcChimTokens)).as("head"))
        val chim = heads.as("x")
          .join(heads.select((col("doc_id") - 1).as("jid"),
            col("head").as("hb")).as("y"),
            col("x.doc_id") === col("y.jid"))
          .filter(col("x.doc_id") % CdcChimMod === 0)
          .select((col("x.doc_id") + CdcChimShift).as("doc_id"),
            concat_ws(" ", col("head"),
              concat(lit("uniqcdc"), col("x.doc_id").cast("string")),
              col("hb")).as("text"),
            lit("chimera").as("cohort"))
        val corpus = base.unionByName(copy).unionByName(chim)
        val chunks = TextDedup.cdcChunks(corpus, "doc_id", "text",
          CdcW, CdcDivisor, CdcMinLen)
          .join(corpus.select(col("doc_id"), col("cohort")), Seq("doc_id"))
        chunks
          .withColumn("dfh",
            count(lit(1)).over(Window.partitionBy("chash")))
          .groupBy(col("cohort"))
          .agg(countDistinct(col("doc_id")).as("n_docs"),
            count(lit(1)).as("n_chunks"),
            sum(when(col("dfh") >= 2, 1L).otherwise(0L)).as("dup_chunks"),
            sum(col("clen")).as("n_tokens"))
          .withColumn("dup_ppm", expr(
            "cast((cast(dup_chunks as decimal(38,0)) * 1000000) " +
              "div n_chunks as bigint)"))
          .orderBy("cohort")
      },
      oracle = Some(s"""
        WITH RECURSIVE docs AS (SELECT doc_id, text FROM documents),
        corpus AS (
          SELECT doc_id, text, 'base' AS cohort FROM docs
          UNION ALL
          SELECT doc_id + $CdcCopyShift, text, 'copy' FROM docs
          WHERE doc_id % $CdcCopyMod = 0
          UNION ALL
          SELECT a.doc_id + $CdcChimShift,
            array_to_string((${sqlTokens("a.text")})[1:$CdcChimTokens],
              ' ') || ' uniqcdc' || a.doc_id || ' ' ||
              array_to_string((${sqlTokens("b.text")})[1:$CdcChimTokens],
              ' '),
            'chimera'
          FROM docs a JOIN docs b ON b.doc_id = a.doc_id + 1
          WHERE a.doc_id % $CdcChimMod = 0),
        tk AS (SELECT doc_id, cohort, ${sqlTokens("text")} AS t,
            len(${sqlTokens("text")}) AS nt
          FROM corpus),
        pos AS (SELECT doc_id, t, len(t) AS nt,
            unnest(range(1, len(t) + 1)) AS i
          FROM tk),
        cnd AS (SELECT doc_id, list(i ORDER BY i) AS cb FROM pos
          WHERE i >= $CdcW AND
            ${sqlHash(s"array_to_string(t[i-${CdcW - 1}:i], ' ')")}
              % $CdcDivisor = 0
          GROUP BY doc_id),
        rec AS (
          SELECT doc_id, 0 AS idx, CAST(0 AS BIGINT) AS last FROM tk
          UNION ALL
          SELECT r.doc_id, r.idx + 1,
            CASE WHEN c.cb[r.idx + 1] - r.last >= $CdcMinLen
              THEN c.cb[r.idx + 1] ELSE r.last END
          FROM rec r JOIN cnd c ON r.doc_id = c.doc_id
          WHERE r.idx + 1 <= len(c.cb)),
        bset AS (SELECT DISTINCT doc_id, b FROM (
          SELECT doc_id, last AS b FROM rec WHERE last > 0
          UNION ALL SELECT doc_id, nt FROM tk)),
        ch AS (SELECT doc_id, b AS i,
            coalesce(lag(b) OVER (PARTITION BY doc_id ORDER BY b), 0)
              AS pv
          FROM bset),
        ck AS (SELECT ch.doc_id, cohort, i - pv AS clen,
            ${sqlHash("array_to_string(t[pv+1:i], ' ')")} AS chash
          FROM ch JOIN tk ON ch.doc_id = tk.doc_id),
        dfh AS (SELECT cohort, doc_id, clen,
            count(*) OVER (PARTITION BY chash) AS dfh
          FROM ck)
        SELECT cohort, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
          CAST(count(*) AS BIGINT) AS n_chunks,
          CAST(sum(CASE WHEN dfh >= 2 THEN 1 ELSE 0 END) AS BIGINT)
            AS dup_chunks,
          CAST(sum(clen) AS BIGINT) AS n_tokens,
          CAST((sum(CASE WHEN dfh >= 2 THEN 1 ELSE 0 END) * 1000000)
            // count(*) AS BIGINT) AS dup_ppm
        FROM dfh GROUP BY cohort ORDER BY cohort""")),

    // ------------------------------------------------------------------
    // q207 — train/test split-leakage audit (QualityAudit.splitLeakage):
    // the eval-integrity gate — duplicated content landing on both
    // sides of a split inflates eval scores. Fixture: documents ∪ an
    // exact-copy slice under shifted ids; the naive per-id hash split
    // MUST leak (copies split independently, ~2·0.8·0.2 of dup groups
    // straddle), while the content-keyed group split reads ZERO leaked
    // pairs by construction — the audit demonstrates the failure AND
    // the fix side by side, hash-gated. Only (strategy, content-hash,
    // split) counts ever shuffle.
    // ------------------------------------------------------------------
    "q207_split_leakage" -> GraftQuery(
      build = (s, d) => {
        val docs = documents(s, d).select(col("doc_id"), col("text"))
        val dup = docs.filter(col("doc_id") % LeakCopyMod === 0)
          .select((col("doc_id") + LeakCopyShift).as("doc_id"),
            col("text"))
        graft.operators.QualityAudit.splitLeakage(
            docs.unionByName(dup), "doc_id", "text",
            Seq(("train", 800000L), ("test", 200000L)))
          .orderBy("strategy")
      },
      oracle = Some(s"""
        WITH corpus AS (
          SELECT doc_id, text FROM documents
          UNION ALL
          SELECT doc_id + $LeakCopyShift, text FROM documents
          WHERE doc_id % $LeakCopyMod = 0),
        keyed AS (SELECT doc_id,
            ${sqlHash("text")} AS ckey
          FROM corpus),
        sp AS (
          SELECT 'by_id' AS strategy, ckey,
            CASE WHEN ${sqlHash("CAST(doc_id AS VARCHAR)")} % 1000000
              < 800000 THEN 'train' ELSE 'test' END AS split
          FROM keyed
          UNION ALL
          SELECT 'by_content', ckey,
            CASE WHEN ${sqlHash("CAST(ckey AS VARCHAR)")} % 1000000
              < 800000 THEN 'train' ELSE 'test' END
          FROM keyed),
        cnt AS (SELECT strategy, ckey, split, count(*) AS ns
          FROM sp GROUP BY 1, 2, 3),
        grp AS (SELECT strategy, ckey, sum(ns) AS n,
            sum(CAST(ns AS HUGEINT) * ns) AS sq
          FROM cnt GROUP BY 1, 2)
        SELECT strategy, CAST(sum(n) AS BIGINT) AS n_docs,
          CAST(sum(CASE WHEN n >= 2 THEN 1 ELSE 0 END) AS BIGINT)
            AS n_dup_groups,
          CAST(sum(CASE WHEN CAST(n AS HUGEINT) * n > sq
            THEN 1 ELSE 0 END) AS BIGINT) AS n_leaking_groups,
          CAST(sum((CAST(n AS HUGEINT) * n - sq) // 2) AS BIGINT)
            AS leaked_pairs
        FROM grp GROUP BY strategy ORDER BY strategy""")),

    // ------------------------------------------------------------------
    // q222 — MinHash estimator calibration (TextDedup.
    // minhashCalibration): the q136 honest-approximation discipline
    // pointed at the dedup estimator itself — over q23's exact
    // candidate set (same injected near-dup slice, same landed-index
    // feed, shared bandCandidatePairs generation so the sets CANNOT
    // drift), bucket pairs by matching signature components m and
    // report mean exact Jaccard, bias (est − mean), and MAE per
    // bucket. This is the table that justifies q23's est ≥ 0.3
    // threshold choice with measurements instead of folklore: the
    // injected mutations populate the high-m buckets (near-1 Jaccard,
    // small bias), natural band collisions the low-m ones (where the
    // 16-component estimator is honestly coarse). All integer ppm,
    // hash-gated; output is ≤ K+1 rows.
    // ------------------------------------------------------------------
    "q222_minhash_calibration" -> GraftQuery(
      build = (s, d) => {
        import graft.operators.ScanOps
        val docs = documents(s, d).select(col("doc_id"), col("text"))
        val mut = docs.filter(col("doc_id") % 20 === 0)
          .select((col("doc_id") + 100000).as("doc_id"),
            concat(col("text"), lit(" zz qq")).as("text"))
        val hashRows = ScanOps.spreadSmallInput(
          TextDedup.readShingleIndex(s, indexDir(s, d))
            .union(TextDedup.shingleHashRows(mut, "text", "doc_id")),
          col("doc_id"))
        TextDedup.minhashCalibration(hashRows,
          ScanOps.spreadSmallInput(docs.union(mut), col("doc_id")))
          .orderBy("m")
      },
      oracle = Some {
        val sigExprs = perms.map { case (a, b) =>
          s"list_min(list_transform(hv, h -> ($a * h + $b) % $P))"
        }.mkString(",\n            ")
        val bandExprs = (0 until Bands).map { bnd =>
          val comps = (0 until RowsPerBand)
            .map(r => s"sig[${bnd * RowsPerBand + r + 1}]").mkString(", ")
          s"concat_ws('_', '$bnd', $comps)"
        }.mkString(",\n            ")
        s"""
        WITH base(doc_id, text) AS (
          SELECT doc_id, text FROM documents
          UNION ALL
          SELECT doc_id + 100000, text || ' zz qq' FROM documents
          WHERE doc_id % 20 = 0),
        tok AS (SELECT doc_id, text, ${sqlTokens("text")} AS t FROM base),
        sh AS (SELECT doc_id, text, ${sqlShingles("t", 3)} AS sh FROM tok),
        hs AS (SELECT doc_id, text,
          list_transform(sh, s -> ${sqlHashMod("s")}) AS hv FROM sh),
        sig AS (SELECT doc_id, text,
          [ $sigExprs ] AS sig FROM hs),
        bands AS (SELECT doc_id, unnest([
            $bandExprs ]) AS band_key FROM sig),
        kept AS (SELECT doc_id, band_key FROM bands
          WHERE band_key IN (SELECT band_key FROM bands
            GROUP BY band_key
            HAVING count(*) <= ${TextDedup.DefaultMaxBandBucket})),
        cand AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
          FROM kept x JOIN kept y
            ON x.band_key = y.band_key AND x.doc_id < y.doc_id),
        jm AS (SELECT doc_a, doc_b,
            CAST(list_sum(list_transform(range(1, ${TextDedup.K + 1}),
              i -> CASE WHEN sa.sig[i] = sb.sig[i] THEN 1 ELSE 0 END))
              AS BIGINT) AS m,
            ${sqlTokens("sa.text")} AS ta, ${sqlTokens("sb.text")} AS tb
          FROM cand
          JOIN sig sa ON cand.doc_a = sa.doc_id
          JOIN sig sb ON cand.doc_b = sb.doc_id),
        gr AS (SELECT m,
            list_distinct(${sqlShingles("ta", 2)}) AS ga,
            list_distinct(${sqlShingles("tb", 2)}) AS gb
          FROM jm),
        sc AS (SELECT m,
            CASE WHEN len(ga) + len(gb) - len(list_intersect(ga, gb)) > 0
              THEN (1000000 * len(list_intersect(ga, gb))) //
                (len(ga) + len(gb) - len(list_intersect(ga, gb)))
              ELSE 1000000 END AS j_ppm
          FROM gr),
        ag AS (SELECT m, CAST(count(*) AS BIGINT) AS n_pairs,
            CAST(sum(j_ppm) AS BIGINT) // count(*) AS mean_j_ppm,
            CAST(sum(abs(j_ppm - (1000000 * m) // ${TextDedup.K}))
              AS BIGINT) // count(*) AS mae_ppm
          FROM sc GROUP BY m)
        SELECT m, n_pairs, (1000000 * m) // ${TextDedup.K} AS est_ppm,
          mean_j_ppm,
          (1000000 * m) // ${TextDedup.K} - mean_j_ppm AS bias_ppm,
          mae_ppm
        FROM ag ORDER BY m"""
      }),

    // ------------------------------------------------------------------
    // q226 — per-source dedup-rate manifest (TextDedup.
    // dedupRateManifest): the report a dedup pass should END with —
    // per source, the within-source duplicate share AND the
    // cross-source contamination share (content also present under
    // another source: the mirror/aggregator signal a per-source rate
    // can't see). Fixture: a same-source duplicate slice (every 7th
    // doc, +100000) plus a 'mirror' aggregator slice (every 11th doc
    // relabeled, +200000) — ODD moduli co-prime with the 20-way
    // round-robin source assignment (the parity-modulus memory trap:
    // %10/%25 fired on only 4 of 20 sources), so EVERY source reads a
    // real ~14% dup / ~9% shared rate. Everything feeds from the
    // landed doc index, so the plan contains ZERO text hashing; the
    // mirror makes shared_ppm fire on every real source (its contents
    // now exist twice) and dup_ppm stays a within-source readout.
    // ------------------------------------------------------------------
    "q226_dedup_rate_manifest" -> GraftQuery(
      build = (s, d) => {
        import graft.operators.ScanOps
        val srcs = documents(s, d).select(col("doc_id"), col("source"))
        val base = TextDedup.readDocIndex(s, indexDir(s, d))
          .join(srcs, Seq("doc_id"))
        val dup = base.filter(col("doc_id") % 7 === 0)
          .select((col("doc_id") + 100000).as("doc_id"),
            col("content_hash"), col("source"))
        val mirror = base.filter(col("doc_id") % 11 === 0)
          .select((col("doc_id") + 200000).as("doc_id"),
            col("content_hash"), lit("mirror").as("source"))
        TextDedup.dedupRateManifest(
          ScanOps.spreadSmallInput(
            base.unionByName(dup).unionByName(mirror), col("doc_id")),
          "source", "content_hash")
          .orderBy("src")
      },
      oracle = Some(s"""
        WITH base(doc_id, text, source) AS (
          SELECT doc_id, text, source FROM documents
          UNION ALL
          SELECT doc_id + 100000, text, source FROM documents
          WHERE doc_id % 7 = 0
          UNION ALL
          SELECT doc_id + 200000, text, 'mirror' FROM documents
          WHERE doc_id % 11 = 0),
        h AS (SELECT source AS src, ${sqlHash("text")} AS ch FROM base),
        sh AS (SELECT src, ch, CAST(count(*) AS BIGINT) AS cnt
          FROM h GROUP BY 1, 2),
        hs AS (SELECT ch, CAST(count(*) AS BIGINT) AS ns
          FROM sh GROUP BY 1),
        ag AS (SELECT src, CAST(sum(cnt) AS BIGINT) AS n_docs,
            CAST(count(*) AS BIGINT) AS n_unique,
            CAST(sum(CASE WHEN ns > 1 THEN cnt ELSE 0 END) AS BIGINT)
              AS shared_docs
          FROM sh JOIN hs ON sh.ch = hs.ch GROUP BY src)
        SELECT src, n_docs, n_unique, n_docs - n_unique AS dup_docs,
          shared_docs,
          (1000000 * (n_docs - n_unique)) // n_docs AS dup_ppm,
          (1000000 * shared_docs) // n_docs AS shared_ppm
        FROM ag ORDER BY src""")),

    // ------------------------------------------------------------------
    // q243 — cross-document span attribution (TextDedup
    // .spanAttribution, r11 verdict #8): q188 removes duplicated
    // spans; this emits WHERE each duplicate lives — per ordered doc
    // pair, the distinct shared gram hashes, the union of shared-gram
    // extents in doc_a's coordinates (overlap-merged, the q188 island
    // arithmetic), and the span count — the contamination-forensics
    // evidence table feeding q226's source rollups. Same q188 fixture:
    // full duplicates must attribute nt-token single-span overlaps to
    // their re-inserted twins; each chimera must attribute its two
    // borrowed 12-token prefixes to BOTH source docs as separate
    // single-span pairs. Postings are corpus-relatively capped at the
    // 1-permille production default (the q186 B-side discipline,
    // floor 2; r13 verdict — 10-permille would admit 10^14 pairs per
    // hot gram at 10^9 docs), mirrored in the oracle.
    // ------------------------------------------------------------------
    "q243_span_attribution" -> GraftQuery(
      build = (s, d) => {
        val docs = documents(s, d).select(col("doc_id"), col("text"))
        val dup = docs.filter(col("doc_id") % 15 === 0)
          .select((col("doc_id") + 100000).as("doc_id"), col("text"))
        val heads = docs.select(col("doc_id"),
          slice(TextDedup.tokens(col("text")), 1, ChimeraTokens).as("head"))
        val chim = heads.as("x")
          .join(heads.select((col("doc_id") - 1).as("jid"),
            col("head").as("head_b")).as("y"),
            col("x.doc_id") === col("y.jid"))
          .filter(col("x.doc_id") % ChimeraMod === 0)
          .select((col("x.doc_id") + ChimeraShift).as("doc_id"),
            concat_ws(" ", array_join(col("head"), " "),
              concat(lit("uniq"), col("x.doc_id").cast("string")),
              array_join(col("head_b"), " ")).as("text"))
        TextDedup.spanAttribution(
          docs.unionByName(dup).unionByName(chim),
          "doc_id", "text", SpanRemovalN)
          .orderBy("doc_a", "doc_b")
      },
      oracle = Some(s"""
        WITH base(doc_id, text) AS (
          SELECT doc_id, text FROM documents
          UNION ALL
          SELECT doc_id + 100000, text FROM documents WHERE doc_id % 15 = 0
          UNION ALL
          SELECT a.doc_id + $ChimeraShift,
            array_to_string((${sqlTokens("a.text")})[1:$ChimeraTokens], ' ')
              || ' uniq' || CAST(a.doc_id AS VARCHAR) || ' ' ||
              array_to_string((${sqlTokens("b.text")})[1:$ChimeraTokens], ' ')
          FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
          WHERE a.doc_id % $ChimeraMod = 0),
        nd AS (SELECT count(*) AS n_docs FROM base),
        tk AS (SELECT doc_id, ${sqlTokens("text")} AS t,
            len(${sqlTokens("text")}) AS nt FROM base),
        pos AS (SELECT doc_id, t, nt,
            unnest(range(1, greatest(nt - ${SpanRemovalN - 1}, 1) + 1)) AS p
          FROM tk),
        gr AS (SELECT doc_id, p, least(p + ${SpanRemovalN - 1}, nt) AS e,
            ${sqlHash(s"array_to_string(t[p:p+${SpanRemovalN - 1}], ' ')")} AS h
          FROM pos),
        fl AS MATERIALIZED (SELECT doc_id, p, e, h FROM (
            SELECT *, count(*) OVER (PARTITION BY h) AS dfh FROM gr), nd
          WHERE dfh >= 2 AND dfh <= greatest((n_docs * 1) // 1000, 2)),
        pr AS MATERIALIZED (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
            a.p AS p, a.e AS e, a.h AS h
          FROM fl a JOIN fl b ON a.h = b.h AND a.doc_id < b.doc_id),
        gc AS (SELECT doc_a, doc_b,
            CAST(count(*) AS BIGINT) AS shared_grams
          FROM (SELECT DISTINCT doc_a, doc_b, h FROM pr) GROUP BY 1, 2),
        ps AS (SELECT DISTINCT doc_a, doc_b, i FROM (
            SELECT doc_a, doc_b, unnest(range(p, e + 1)) AS i FROM pr)),
        rn AS (SELECT doc_a, doc_b, i,
            lag(i) OVER (PARTITION BY doc_a, doc_b ORDER BY i) AS pv
          FROM ps),
        rl AS (SELECT doc_a, doc_b,
            CAST(count(*) AS BIGINT) AS shared_tokens,
            CAST(sum(CASE WHEN pv IS NULL OR i > pv + 1 THEN 1 ELSE 0 END)
              AS BIGINT) AS shared_spans
          FROM rn GROUP BY 1, 2)
        SELECT gc.doc_a AS doc_a, gc.doc_b AS doc_b, shared_grams,
          shared_tokens, shared_spans
        FROM gc JOIN rl ON gc.doc_a = rl.doc_a AND gc.doc_b = rl.doc_b
        ORDER BY doc_a, doc_b""")),

    // ------------------------------------------------------------------
    // q244 — incremental corpus-refresh chain (r11 verdict #3): the IVM
    // story end-to-end for the LLM pipeline. Day-2 delta docs (the
    // doc_id % 3 == 0 third of the corpus, plus a re-delivered slice
    // % 9 == 1 and a cross-source mirror slice % 9 == 4) merge into the
    // STANDING day-1 state — the landed (src, ch, cnt) manifest counts
    // and (ch, ntok) token map, hash-keyed aggregates only — and the
    // chain re-emits the updated q226 dedup manifest plus the
    // re-planned q223 mixture over deduped token availability, at
    // delta cost: day-1 TEXT is never re-read or re-hashed (only delta
    // arrivals hash), counts merge by union + grouped sum (they
    // COMMUTE — the q81 discipline), and availability counts each
    // (src, hash) once. The oracle recomputes the ENTIRE chain from
    // raw day-1 + day-2 text, so the gate IS the proof that delta-cost
    // maintenance ≡ full recompute bit-for-bit. Weights are q223's
    // linear lottery with the mirror source weighted 100 — probed: the
    // capping AND redistribution branches fire at every scale.
    // ------------------------------------------------------------------
    "q244_corpus_refresh_chain" -> GraftQuery(
      build = (s, d) => {
        import graft.operators.CorpusAssembly
        val docs = documents(s, d)
        val stand = refreshDay1Dir(s, d)
        // day-2 arrivals: the new third + a re-delivery + a mirror
        val d2new = docs.filter(col("doc_id") % 3 === 0)
          .select(col("source"), col("text"))
        val redeliver = docs.filter(col("doc_id") % 9 === 1)
          .select(col("source"), col("text"))
        val mirror = docs.filter(col("doc_id") % 9 === 4)
          .select(lit("day2_mirror").as("source"), col("text"))
        val delta = d2new.unionByName(redeliver).unionByName(mirror)
          .select(col("source").as("src"),
            TextDedup.hash64(col("text")).as("ch"),
            size(TextDedup.tokens(col("text"))).cast("long").as("ntok"))
        // merge: standing counts + delta counts (grouped sum), standing
        // token map + delta token map (distinct)
        val sh = s.read.parquet(s"$stand/sh")
          .unionByName(delta.groupBy(col("src"), col("ch"))
            .agg(count(lit(1)).as("cnt")))
          .groupBy(col("src"), col("ch"))
          .agg(sum(col("cnt")).as("cnt"))
        val ntok = s.read.parquet(s"$stand/ntok")
          .unionByName(delta.select(col("ch"), col("ntok")).distinct())
          .distinct()
        val manifest = TextDedup.dedupRateManifestFromCounts(sh)
        val avail = sh.join(ntok, Seq("ch"))
          .groupBy(col("src"))
          .agg(sum(col("ntok")).as("avail_tok"))
          .withColumn("w", when(col("src") === "day2_mirror", lit(100L))
            .otherwise(expr("cast(substr(src, 4) as long) + 1")))
        val plan = CorpusAssembly.mixturePlan(avail, "src", "avail_tok",
          "w", budgetNum = 1, budgetDen = 2)
        manifest
          .join(plan.select(col("src"), col("avail_tok"),
            col("target_tok"), col("capped"), col("planned_tok"),
            col("rate_ppm")), Seq("src"))
          .orderBy("src")
      },
      oracle = Some(s"""
        WITH base(doc_id, text, source) AS (
          SELECT doc_id, text, source FROM documents
          UNION ALL
          SELECT doc_id + 300000, text, source FROM documents
          WHERE doc_id % 9 = 1
          UNION ALL
          SELECT doc_id + 400000, text, 'day2_mirror' FROM documents
          WHERE doc_id % 9 = 4),
        h AS (SELECT source AS src, ${sqlHash("text")} AS ch,
            CAST(len(${sqlTokens("text")}) AS BIGINT) AS ntok
          FROM base),
        sh AS (SELECT src, ch, CAST(count(*) AS BIGINT) AS cnt,
            min(ntok) AS ntok
          FROM h GROUP BY 1, 2),
        hs AS (SELECT ch, CAST(count(*) AS BIGINT) AS ns
          FROM sh GROUP BY 1),
        mf AS (SELECT src, CAST(sum(cnt) AS BIGINT) AS n_docs,
            CAST(count(*) AS BIGINT) AS n_unique,
            CAST(sum(CASE WHEN ns > 1 THEN cnt ELSE 0 END) AS BIGINT)
              AS shared_docs
          FROM sh JOIN hs ON sh.ch = hs.ch GROUP BY src),
        av AS (SELECT src, CAST(sum(ntok) AS BIGINT) AS avail_tok,
            CASE WHEN src = 'day2_mirror' THEN CAST(100 AS BIGINT)
              ELSE CAST(substr(src, 4) AS BIGINT) + 1 END AS w
          FROM sh GROUP BY src),
        tot AS (SELECT CAST(sum(avail_tok) AS BIGINT) AS total_tok,
            CAST(sum(w) AS BIGINT) AS ws
          FROM av),
        p0 AS (SELECT src, w, avail_tok,
            CAST((((CAST(total_tok AS HUGEINT) * 1) // 2) * w) // ws
              AS BIGINT) AS target_tok
          FROM av CROSS JOIN tot),
        p1 AS (SELECT src, avail_tok, target_tok,
            least(avail_tok, target_tok) AS planned0,
            avail_tok - least(avail_tok, target_tok) AS rem
          FROM p0),
        sc AS (SELECT CAST(sum(target_tok - planned0) AS BIGINT) AS dd,
            CAST(sum(rem) AS BIGINT) AS r
          FROM p1),
        p2 AS (SELECT src, avail_tok, target_tok,
            avail_tok < target_tok AS capped,
            planned0 + CASE WHEN r > 0 THEN least(rem,
              CAST((CAST(dd AS HUGEINT) * rem) // r AS BIGINT))
              ELSE 0 END AS planned_tok
          FROM p1 CROSS JOIN sc)
        SELECT mf.src AS src, n_docs, n_unique,
          n_docs - n_unique AS dup_docs, shared_docs,
          (1000000 * (n_docs - n_unique)) // n_docs AS dup_ppm,
          (1000000 * shared_docs) // n_docs AS shared_ppm,
          avail_tok, target_tok, capped, planned_tok,
          CASE WHEN avail_tok > 0 THEN
            CAST((1000000 * CAST(planned_tok AS HUGEINT)) // avail_tok
              AS BIGINT) END AS rate_ppm
        FROM mf JOIN p2 ON mf.src = p2.src
        ORDER BY src"""))
  )
}
