package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import Tables._
import graft.operators.VectorSearch
import graft.operators.VectorSearch._

/**
 * Similarity-search queries over the `embeddings` table, oracle-gated.
 * The DuckDB side is generated from the same hyperplane constants and
 * implements the identical double-precision in-order arithmetic, so
 * cosines match bit-for-bit (see VectorSearch numeric-determinism note).
 */
object VectorQueries {

  /** Embedding dimensionality of the driver's fixture (q187's oracle
    * unrolls the dim spine from it; the Spark side posexplodes and
    * needs no constant). */
  val EmbDim = 64

  /** DuckDB twin of VectorSearch.toDouble. */
  private def sqlToDouble(c: String) =
    s"list_transform(range(1, len($c) + 1), i -> CAST($c[i] AS DOUBLE))"

  /** DuckDB twin of VectorSearch.dotD over double arrays (in-order fold;
    * no-seed list_reduce ≡ 0.0-seeded fold since 0.0+x == x). */
  private def sqlDot(a: String, b: String) =
    s"list_reduce(list_transform(range(1, len($a) + 1), i -> $a[i] * $b[i]), (x, y) -> x + y)"

  /** The bounded query-set predicate shared by q25/q87/q90/q105 —
    * defined ONCE so the Scala builds and the oracles can never drift
    * on which vectors are queries. */
  val QuerySetSql = "vec_id % 100 = 0 AND vec_id < 500"

  /** The same predicate with every column reference qualified — for
    * contexts (q136's band join) where `vec_id` alone is ambiguous. */
  private def querySetSqlOn(alias: String): String =
    QuerySetSql.replace("vec_id", s"$alias.vec_id")

  /** q136 recall audit depth (matches q25's top-k). */
  val RecallK = 5

  /** q154 MMR: 12 candidates in, 5 diversified picks out — candK is
    * the algorithm's own quadratic-work contract (candK² sims per
    * query), selectK the context-window budget. */
  val MmrCandK = 12
  val MmrSelectK = 5

  /** Shared q25/q105 oracle prolog: normed double vectors (with label)
    * and the bounded query set — one copy of the base/nb/q scaffold. */
  private def knnPrologSql(withLabel: Boolean) = {
    val lbl = if (withLabel) ", label" else ""
    val qLbl = if (withLabel) ", label AS q_label" else ""
    s"""
        base AS (SELECT vec_id$lbl, ${sqlToDouble("embedding")} AS v
          FROM embeddings${if (withLabel) " WHERE label IS NOT NULL" else ""}),
        nb AS (SELECT vec_id$lbl, v, sqrt(${sqlDot("v", "v")}) AS nrm
          FROM base),
        q AS (SELECT vec_id AS query_id$qLbl, v AS qv, nrm AS qn FROM nb
          WHERE $QuerySetSql)"""
  }

  /** DuckDB twin of VectorSearch.bandValues for one band: the same ±1
    * hyperplanes as inline list literals, sign bits packed into an int. */
  private def sqlBandValue(v: String, band: Int): String =
    (0 until VecRowsPerBand).map { r =>
      val hp = hyperplanes(band * VecRowsPerBand + r)
      val lits = hp.map(x => if (x > 0) "1.0" else "-1.0").mkString(", ")
      s"""CASE WHEN list_reduce(list_transform(range(1, len($v) + 1),
            i -> $v[i] * ([$lits])[i]), (x, y) -> x + y) > 0
          THEN ${1 << r} ELSE 0 END"""
    }.mkString("\n          + ")

  /** One DuckDB k-means iteration — the twin of
    * VectorSearch.trainCentroids' loop body (assign to nearest prev
    * centroid, fixed-point element-wise mean per surviving cluster).
    * Shared by q43 (IVF) and q56 (clustering). */
  private def kmeansIterSql(i: Int, prev: String): String = s"""
        a$i AS (SELECT vec_id, v, cent_id FROM (
            SELECT nb.vec_id, nb.v, c.cent_id,
              row_number() OVER (PARTITION BY nb.vec_id
                ORDER BY ${sqlDot("nb.v", "c.cv")} / (nb.nrm * c.cn) DESC, c.cent_id) AS crnk
            FROM nb CROSS JOIN $prev c) t WHERE crnk = 1),
        u$i AS (SELECT cent_id, dim,
            CAST(sum(CAST(floor(v[dim] * ${VectorSearch.KmeansScale}) AS BIGINT)) AS DOUBLE)
              / (count(*) * ${VectorSearch.KmeansScale}) AS cx
          FROM (SELECT cent_id, v, unnest(range(1, 65)) AS dim FROM a$i)
          GROUP BY cent_id, dim),
        c$i AS (SELECT cent_id, list(cx ORDER BY dim) AS cv FROM u$i GROUP BY cent_id),
        k$i AS (SELECT cent_id, cv, sqrt(${sqlDot("cv", "cv")}) AS cn FROM c$i),"""

  /** CTE prolog shared by q43/q56: corpus + norms, every-50th seed, two
    * training iterations, trained centroid set `cents`. */
  private def kmeansPrologSql: String = s"""
        WITH base AS (SELECT vec_id, ${sqlToDouble("embedding")} AS v FROM embeddings),
        nb AS (SELECT vec_id, v, sqrt(${sqlDot("v", "v")}) AS nrm FROM base),
        k0 AS (SELECT vec_id AS cent_id, v AS cv, nrm AS cn FROM nb
          WHERE vec_id % 50 = 0),
        ${kmeansIterSql(1, "k0")}
        ${kmeansIterSql(2, "k1")}
        cents AS (SELECT cent_id, cv, cn FROM k2)"""

  /** DuckDB twins shared by the PQ oracles (q87 sampled / q90 trained
    * codebooks) — ONE copy of the squared-distance, subvector-slice,
    * seed prolog, and encode→ADC→rank tail, so a geometry or seed-rule
    * change cannot silently gate two different algorithms. */
  private def pqSqSql(a: String, b: String) =
    s"(${sqlDot(a, a)} - 2.0 * ${sqlDot(a, b)} + ${sqlDot(b, b)})"
  private def pqSubOfSql(v: String) = (0 until PqSubspaces).map { sIdx =>
    s"WHEN $sIdx THEN $v[${sIdx * PqSubDim + 1}:${(sIdx + 1) * PqSubDim}]"
  }.mkString("CASE sub ", " ", " ELSE NULL END")

  /** base corpus, subspace index table, every-25th seed vectors, the
    * seed codebook `$seedBooks`, and the sub-exploded corpus. */
  private def pqPrologSql(seedBooks: String) = s"""
        WITH base AS (SELECT vec_id, ${sqlToDouble("embedding")} AS v
          FROM embeddings),
        subs(sub) AS (SELECT unnest(range(0, $PqSubspaces))),
        seeds AS (SELECT vec_id, v, code FROM (
            SELECT vec_id, v,
              CAST(row_number() OVER (ORDER BY vec_id) AS BIGINT) - 1 AS code
            FROM base WHERE vec_id % 25 = 0 AND vec_id < 400)
          WHERE code < $PqCodes),
        $seedBooks AS (SELECT sub, code, ${pqSubOfSql("v")} AS cv FROM seeds, subs),
        subrows AS (SELECT vec_id, sub, ${pqSubOfSql("v")} AS sv FROM base, subs)"""

  /** Encode against codebook CTE `$books`, pivot codes, ADC-score the
    * fixed query set, rank, top-5. The code pivot and the dar offset
    * arithmetic are GENERATED from PqSubspaces like every other helper
    * here — a hand-synced c0..c3 copy would silently score with 4
    * segments after a geometry change instead of failing. */
  private def pqAdcTailSql(books: String) = s"""
        enc AS (SELECT vec_id, sub, code FROM (
            SELECT sr.vec_id, sr.sub, b.code,
              row_number() OVER (PARTITION BY sr.vec_id, sr.sub
                ORDER BY ${pqSqSql("sr.sv", "b.cv")}, b.code) AS rk
            FROM subrows sr JOIN $books b USING (sub)) WHERE rk = 1),
        codes AS (SELECT vec_id,
            ${(0 until PqSubspaces).map(s =>
              s"max(CASE WHEN sub = $s THEN code END) AS c$s")
              .mkString(",\n            ")}
          FROM enc GROUP BY vec_id),
        q AS (SELECT vec_id AS query_id, v AS qv FROM base
          WHERE vec_id % 100 = 0 AND vec_id < 500),
        dt AS (SELECT query_id, sub, code,
            ${pqSqSql(s"(${pqSubOfSql("qv")})", "cv")} AS d2
          FROM q, $books),
        dar AS (SELECT query_id, list(d2 ORDER BY sub, code) AS dar
          FROM dt GROUP BY query_id),
        nbk AS (SELECT count(*) AS ncodes FROM $books WHERE sub = 0),
        scored AS (SELECT query_id, c.vec_id AS neighbor_id,
            ${(0 until PqSubspaces).map(s =>
              s"dar[$s * ncodes + c$s + 1]").mkString(" + ")}
              AS adist
          FROM codes c, dar, nbk WHERE c.vec_id <> query_id),
        ranked AS (SELECT query_id, neighbor_id, adist,
            CAST(row_number() OVER (PARTITION BY query_id
              ORDER BY adist, neighbor_id) AS BIGINT) AS rnk
          FROM scored)
        SELECT query_id, neighbor_id, adist, rnk FROM ranked
        WHERE rnk <= 5 ORDER BY query_id, rnk"""

  val all: Map[String, GraftQuery] = Map(

    // ------------------------------------------------------------------
    // q25 — exact cosine top-5 for a FIXED-SIZE query set (5 ids: every
    // 100th vector below 500, present at every sf) against the whole
    // corpus. The query side is broadcast: one corpus scan, linear cost,
    // no shuffle of vectors — and because the id predicate is
    // corpus-independent, the broadcast stays the same bytes at any
    // scale factor (a `% 100` alone would grow the "bounded" side with
    // N, quietly violating knnBrute's contract at 100×). This is the
    // audit baseline for the LSH path (q26), not the scale path itself.
    // ------------------------------------------------------------------
    "q25_knn_cosine_brute" -> GraftQuery(
      build = (s, d) => {
        val emb = embeddings(s, d)
        knnBrute(emb,
          emb.filter(col("vec_id") % 100 === 0 && col("vec_id") < 500),
          "vec_id", "embedding")
          .orderBy("query_id", "rnk")
      },
      oracle = Some(s"""
        WITH ${knnPrologSql(withLabel = false)},
        scored AS (SELECT query_id, b.vec_id AS neighbor_id,
            ${sqlDot("b.v", "qv")} / (b.nrm * qn) AS cosine
          FROM nb b CROSS JOIN q WHERE b.vec_id <> query_id),
        ranked AS (SELECT query_id, neighbor_id, cosine,
            CAST(row_number() OVER (PARTITION BY query_id
              ORDER BY cosine DESC, neighbor_id) AS BIGINT) AS rnk
          FROM scored)
        SELECT query_id, neighbor_id, cosine, rnk FROM ranked
        WHERE rnk <= 5 ORDER BY query_id, rnk""")),

    // ------------------------------------------------------------------
    // q26 — banded-LSH near-duplicate pairs: 32 random-hyperplane sign
    // bits as 4 bands × 8 bits; candidates = pairs agreeing on a full
    // band (equality join on (band, band_value)), bare-pair distinct,
    // exact cosine rerank ≥ 0.99. Candidates cost Σ bucket² per band with
    // 2^8 buckets/band — and the bit count scales with log(corpus) (see
    // VectorSearch.recommendedSigBits), unlike a fixed single bucket id
    // which stays ∝ N². Hot (band, bval) buckets above the skew cap are
    // dropped identically in both engines. Seeded near-identical mutants
    // (a FIXED 5-id slice present at every sf, alternate dims scaled by
    // 1.002) guarantee pairs the banding provably catches without the
    // seeded slice growing with the corpus.
    // ------------------------------------------------------------------
    "q26_ann_lsh_cosine" -> GraftQuery(
      build = (s, d) => {
        val emb = embeddings(s, d)
        val orig = emb.select(col("vec_id"), toDouble(col("embedding")).as("v"))
        val mut = emb.filter(col("vec_id") % 100 === 0 && col("vec_id") < 500)
          .select((col("vec_id") + 100000).as("vec_id"),
            transform(col("embedding"), (x, i) =>
              x.cast(DoubleType) * (lit(1.0) + lit(0.002) * (i % 2).cast(DoubleType)))
              .as("v"))
        VectorSearch.bucketedNearDupPairs(orig.union(mut), "vec_id", minCosine = 0.99)
          .orderBy("vec_a", "vec_b")
      },
      oracle = Some {
        val bandSelects = (0 until VecBands).map(b =>
          s"SELECT vec_id, $b AS band, bv$b AS bval FROM sigs")
          .mkString("\n          UNION ALL ")
        val bandCols = (0 until VecBands).map(b =>
          s"${sqlBandValue("v", b)} AS bv$b").mkString(",\n            ")
        s"""
        WITH orig AS (SELECT vec_id, ${sqlToDouble("embedding")} AS v FROM embeddings),
        mut AS (SELECT vec_id + 100000 AS vec_id,
            list_transform(range(1, len(embedding) + 1),
              i -> CAST(embedding[i] AS DOUBLE) * (1.0 + 0.002 * CAST((i - 1) % 2 AS DOUBLE))) AS v
          FROM embeddings WHERE vec_id % 100 = 0 AND vec_id < 500),
        allv AS (SELECT * FROM orig UNION ALL SELECT * FROM mut),
        sigs AS (SELECT vec_id, v, sqrt(${sqlDot("v", "v")}) AS nrm,
            $bandCols
          FROM allv),
        bands AS ($bandSelects),
        bsizes AS (SELECT band, bval, count(*) AS n FROM bands
          GROUP BY band, bval),
        kept AS (SELECT b.vec_id, b.band, b.bval FROM bands b
          JOIN bsizes s ON b.band = s.band AND b.bval = s.bval
          WHERE s.n <= ${VectorSearch.DefaultMaxBandBucket}),
        cand AS (SELECT DISTINCT x.vec_id AS vec_a, y.vec_id AS vec_b
          FROM kept x JOIN kept y
            ON x.band = y.band AND x.bval = y.bval AND x.vec_id < y.vec_id),
        scored AS (SELECT vec_a, vec_b,
            ${sqlDot("sa.v", "sb.v")} / (sa.nrm * sb.nrm) AS cosine
          FROM cand
          JOIN sigs sa ON cand.vec_a = sa.vec_id
          JOIN sigs sb ON cand.vec_b = sb.vec_id)
        SELECT vec_a, vec_b, cosine FROM scored
        WHERE cosine >= 0.99 ORDER BY vec_a, vec_b"""
      },
      headline = true),

    // ------------------------------------------------------------------
    // q43 — IVF approximate top-k with a TRAINED coarse quantizer: the
    // every-50th-vector sample seeds two deterministic spherical
    // k-means iterations (fixed-point element means — floor(x·2^20)
    // BIGINT sums, exact and order-independent in both engines — so
    // the trained centroids are bit-identical cross-engine), then
    // nearest-centroid inverted lists, nprobe=2 probing, exact cosine
    // rank within the probed lists. The other classic ANN scale path
    // next to q26's banded LSH: train iters·N·C dots, build N·C,
    // query C + list·nprobe — sub-quadratic with C ≈ √N.
    // ------------------------------------------------------------------
    "q43_ivf_ann" -> GraftQuery(
      build = (s, d) => {
        val emb = embeddings(s, d)
        VectorSearch.ivfTopK(emb,
          emb.filter(col("vec_id") % 100 === 0 && col("vec_id") < 500),
          "vec_id", "embedding", k = 5, centroidEvery = 50, nprobe = 2,
          kmeansIters = 2)
          .orderBy("query_id", "rnk")
      },
      oracle = Some {
        s"""
        $kmeansPrologSql,
        assigned AS (SELECT vec_id, v, nrm, cent_id FROM (
            SELECT nb.vec_id, nb.v, nb.nrm, c.cent_id,
              row_number() OVER (PARTITION BY nb.vec_id
                ORDER BY ${sqlDot("nb.v", "c.cv")} / (nb.nrm * c.cn) DESC, c.cent_id) AS crnk
            FROM nb CROSS JOIN cents c) t WHERE crnk = 1),
        q AS (SELECT vec_id AS query_id, v AS qv, nrm AS qn FROM nb
          WHERE vec_id % 100 = 0 AND vec_id < 500),
        probes AS (SELECT query_id, qv, qn, cent_id FROM (
            SELECT q.query_id, q.qv, q.qn, c.cent_id,
              row_number() OVER (PARTITION BY q.query_id
                ORDER BY ${sqlDot("q.qv", "c.cv")} / (q.qn * c.cn) DESC, c.cent_id) AS crnk
            FROM q CROSS JOIN cents c) t WHERE crnk <= 2),
        scored AS (SELECT query_id, a.vec_id AS neighbor_id,
            ${sqlDot("a.v", "qv")} / (a.nrm * qn) AS cosine
          FROM assigned a JOIN probes p ON a.cent_id = p.cent_id
          WHERE a.vec_id <> p.query_id),
        ranked AS (SELECT query_id, neighbor_id, cosine,
            CAST(row_number() OVER (PARTITION BY query_id
              ORDER BY cosine DESC, neighbor_id) AS BIGINT) AS rnk
          FROM scored)
        SELECT query_id, neighbor_id, cosine, rnk FROM ranked
        WHERE rnk <= 5 ORDER BY query_id, rnk"""
      }),

    // ------------------------------------------------------------------
    // q56 — k-means document CLUSTERING (VectorSearch.kmeansAssign):
    // the q43 quantizer exposed as the corpus-segmentation operator —
    // every embedding assigned to its nearest trained centroid, one row
    // per vector. The oracle re-runs the identical fixed-point training
    // (shared CTE prolog with q43) and the identical assignment, so a
    // hash match proves both the trained centroids AND the full-corpus
    // assignment are bit-equal cross-engine.
    // ------------------------------------------------------------------
    "q56_kmeans_clusters" -> GraftQuery(
      build = (s, d) =>
        VectorSearch.kmeansAssign(embeddings(s, d), "vec_id", "embedding",
          centroidEvery = 50, kmeansIters = 2)
          .orderBy("vec_id"),
      oracle = Some(s"""
        $kmeansPrologSql
        SELECT vec_id, cent_id, cent_cos FROM (
          SELECT nb.vec_id, c.cent_id,
            ${sqlDot("nb.v", "c.cv")} / (nb.nrm * c.cn) AS cent_cos,
            row_number() OVER (PARTITION BY nb.vec_id
              ORDER BY ${sqlDot("nb.v", "c.cv")} / (nb.nrm * c.cn) DESC, c.cent_id) AS crnk
          FROM nb CROSS JOIN cents c) t
        WHERE crnk = 1 ORDER BY vec_id""")),

    // ------------------------------------------------------------------
    // q66 — int8-quantized cosine top-5 (VectorSearch.quantizedTopK):
    // per-vector symmetric scale 127/max|x|, floor-coded (floor, not
    // round: no cross-engine half-tie rule), search entirely on the
    // codes — the 4×-memory-reduction serving path beside the float
    // baseline q25. Integer dots are double-exact at 64 dims, so both
    // engines agree bit-for-bit; same fixed query set as q25.
    // ------------------------------------------------------------------
    "q66_int8_quantized_knn" -> GraftQuery(
      build = (s, d) => {
        val emb = embeddings(s, d)
        VectorSearch.quantizedTopK(emb,
          emb.filter(col("vec_id") % 100 === 0 && col("vec_id") < 500),
          "vec_id", "embedding")
          .orderBy("query_id", "rnk")
      },
      oracle = Some(s"""
        WITH base AS (SELECT vec_id, ${sqlToDouble("embedding")} AS v FROM embeddings),
        mx AS (SELECT vec_id, v,
            list_max(list_transform(v, x -> abs(x))) AS m FROM base),
        qt AS (SELECT vec_id, list_transform(v,
            x -> floor(x * (CASE WHEN m > 0 THEN 127.0 / m ELSE 1.0 END))) AS qd
          FROM mx),
        nb AS (SELECT vec_id, qd, sqrt(${sqlDot("qd", "qd")}) AS nrm FROM qt),
        q AS (SELECT vec_id AS query_id, qd AS qqd, nrm AS qn FROM nb
          WHERE vec_id % 100 = 0 AND vec_id < 500),
        scored AS (SELECT query_id, b.vec_id AS neighbor_id,
            ${sqlDot("b.qd", "qqd")} / (b.nrm * qn) AS qcosine
          FROM nb b CROSS JOIN q WHERE b.vec_id <> query_id),
        ranked AS (SELECT query_id, neighbor_id, qcosine,
            CAST(row_number() OVER (PARTITION BY query_id
              ORDER BY qcosine DESC, neighbor_id) AS BIGINT) AS rnk
          FROM scored)
        SELECT query_id, neighbor_id, qcosine, rnk FROM ranked
        WHERE rnk <= 5 ORDER BY query_id, rnk""")),

    // ------------------------------------------------------------------
    // q87 — PRODUCT QUANTIZATION ADC top-k (VectorSearch.pqTopK): the
    // fourth classic ANN geometry (Jégou 2011) beside brute (q25),
    // LSH (q26), IVF (q43) and scalar int8 (q66). 64 dims = 4 × 16-dim
    // subspaces × 16 codewords → a 4-long code per vector; the query
    // precomputes one flat 64-entry distance table and every corpus
    // distance is 4 lookups added left-to-right (a group-sum would add
    // in shuffle order — the one nondeterminism PQ invites). Codebooks
    // come from a scale-independent deterministic sample (training is
    // q43/q56's proven story); the oracle re-derives codebooks, codes
    // and ADC distances bit-for-bit.
    // ------------------------------------------------------------------
    "q87_pq_adc_topk" -> GraftQuery(
      build = (s, d) => {
        val emb = embeddings(s, d)
        VectorSearch.pqTopK(emb,
          emb.filter(col("vec_id") % 100 === 0 && col("vec_id") < 500),
          "vec_id", "embedding",
          codebookIds = col("vec_id") % 25 === 0 && col("vec_id") < 400)
          .orderBy("query_id", "rnk")
      },
      oracle = Some(s"""
        ${pqPrologSql("books")},
        ${pqAdcTailSql("books")}""")),

    // ------------------------------------------------------------------
    // q90 — PQ with TRAINED codebooks (VectorSearch.pqTrainCodebooks):
    // two rounds of per-subspace L2 k-means in the q43 fixed-point
    // discipline (exact scaled-long element sums, one double division
    // per element), with empty codewords KEEPING their previous value —
    // PQ codes are positional, the codebook must never shrink. The
    // oracle unrolls both training rounds (assignment window → fixed-
    // point element means → coalesce) before re-deriving codes and ADC
    // ranks — the same centroids bit-for-bit in both engines, like the
    // IVF trainer's gate.
    // ------------------------------------------------------------------
    "q90_pq_trained_adc" -> GraftQuery(
      build = (s, d) => {
        val emb = embeddings(s, d)
        val books = VectorSearch.pqTrainCodebooks(emb, "vec_id", "embedding",
          col("vec_id") % 25 === 0 && col("vec_id") < 400, iters = 2)
        VectorSearch.pqTopKWith(emb,
          emb.filter(col("vec_id") % 100 === 0 && col("vec_id") < 500),
          "vec_id", "embedding", books, k = 5)
          .orderBy("query_id", "rnk")
      },
      oracle = Some {
        def trainIter(i: Int, prev: String) = s"""
        asg$i AS (SELECT sub, code, sv FROM (
            SELECT sr.vec_id, sr.sub, b.code, sr.sv,
              row_number() OVER (PARTITION BY sr.vec_id, sr.sub
                ORDER BY ${pqSqSql("sr.sv", "b.cv")}, b.code) AS rk
            FROM subrows sr JOIN $prev b USING (sub)) WHERE rk = 1),
        u$i AS (SELECT sub, code, dim,
            CAST(sum(CAST(floor(sv[dim] * ${VectorSearch.KmeansScale})
              AS BIGINT)) AS DOUBLE)
              / (count(*) * ${VectorSearch.KmeansScale}) AS cx
          FROM (SELECT sub, code, sv, unnest(range(1, ${PqSubDim + 1})) AS dim
            FROM asg$i)
          GROUP BY sub, code, dim),
        nc$i AS (SELECT sub, code, list(cx ORDER BY dim) AS ncv FROM u$i
          GROUP BY sub, code),
        bk$i AS (SELECT b.sub, b.code, coalesce(n.ncv, b.cv) AS cv
          FROM $prev b LEFT JOIN nc$i n ON b.sub = n.sub AND b.code = n.code),"""
        s"""
        ${pqPrologSql("bk0")},
        ${trainIter(1, "bk0")}
        ${trainIter(2, "bk1")}
        ${pqAdcTailSql("bk2")}"""
      }),

    // ------------------------------------------------------------------
    // q105 — contrastive hard-negative mining (VectorSearch.
    // contrastivePairs): per query vector, the best same-label positive
    // and the most-similar WRONG-label hard negative — the pair
    // construction step of contrastive/embedding training. Same bounded-
    // broadcast/linear-scan contract and in-order-dot determinism as
    // q25; per-(query, polarity) argmax is a WindowGroupLimit with a
    // total tie-break.
    // ------------------------------------------------------------------
    "q105_contrastive_pairs" -> GraftQuery(
      build = (s, d) => {
        val emb = embeddings(s, d)
        VectorSearch.contrastivePairs(emb,
          emb.filter(col("vec_id") % 100 === 0 && col("vec_id") < 500),
          "vec_id", "embedding", "label")
          .orderBy("query_id", "is_positive")
      },
      oracle = Some(s"""
        WITH ${knnPrologSql(withLabel = true)},
        scored AS (SELECT query_id,
            CAST(b.label = q_label AS INT) AS is_positive,
            b.vec_id AS neighbor_id,
            ${sqlDot("b.v", "qv")} / (b.nrm * qn) AS cosine
          FROM nb b CROSS JOIN q WHERE b.vec_id <> query_id),
        r AS (SELECT query_id, is_positive, neighbor_id, cosine,
            row_number() OVER (PARTITION BY query_id, is_positive
              ORDER BY cosine DESC, neighbor_id) AS rk
          FROM scored)
        SELECT query_id, is_positive, neighbor_id, cosine FROM r
        WHERE rk = 1 ORDER BY query_id, is_positive""")),

    // ------------------------------------------------------------------
    // q111 — cluster/label purity + Gini impurity over the band-0 LSH
    // buckets of the labeled embeddings: the clustering-quality readout
    // (StatsOps.clusterPurity scaladoc) on a deterministic bucketing
    // both engines derive from the shared hyperplanes. Gini, not
    // entropy: exact rationals of integer counts hash-gate; ln doesn't.
    // Majority tie-break = max count then smallest label; the oracle
    // reaches the same row via window-rank (DuckDB's arg_max takes no
    // composite order — the q101 pattern).
    // ------------------------------------------------------------------
    "q111_cluster_purity" -> GraftQuery(
      build = (s, d) => {
        val b = embeddings(s, d).where(col("label").isNotNull)
          .select(col("label"), toDouble(col("embedding")).as("v"))
          .select(col("label"),
            VectorSearch.bandValues(col("v")).getItem(0).as("bucket"))
        graft.operators.StatsOps.clusterPurity(b, "bucket", "label")
          .orderBy("cluster")
      },
      oracle = Some(s"""
        WITH base AS (SELECT label, ${sqlToDouble("embedding")} AS v
          FROM embeddings WHERE label IS NOT NULL),
        b AS (SELECT label, ${sqlBandValue("v", 0)} AS cluster FROM base),
        cl AS (SELECT cluster, label, count(*) AS cnt
          FROM b GROUP BY cluster, label),
        r AS (SELECT cluster, label, cnt, row_number() OVER
            (PARTITION BY cluster ORDER BY cnt DESC, label) AS rk
          FROM cl),
        p AS (SELECT cluster, CAST(sum(cnt) AS BIGINT) AS n_rows,
            count(*) AS n_labels, CAST(max(cnt) AS BIGINT) AS top_cnt,
            sum(CAST(cnt AS HUGEINT) * cnt) AS sum_sq
          FROM cl GROUP BY cluster)
        SELECT p.cluster, n_rows, n_labels, r.label AS top_label, top_cnt,
          CAST((top_cnt * 1000000) // n_rows AS BIGINT) AS purity_ppm,
          CAST(1000000 - (sum_sq * 1000000) //
            (CAST(n_rows AS HUGEINT) * n_rows) AS BIGINT) AS gini_ppm
        FROM p JOIN r ON p.cluster = r.cluster AND r.rk = 1
        ORDER BY p.cluster""")),

    // ------------------------------------------------------------------
    // q136 — ANN recall audit (VectorSearch.annRecallAudit): per query,
    // recall@5 and first-hit rank of the banded-LSH candidate path
    // against the exact cosine top-5 — the gate that justifies running
    // approximate search at 100 TB (recall too low → more bands/bits,
    // recommendedSigBits). The candidate pass is the SAME band geometry
    // production dedup buckets on; the exact pass is q25's broadcast
    // brute force (the audit's honest cost — sampled in production). A
    // missed true-nearest-neighbor emits null top1/mrr, never a fake 0.
    // ------------------------------------------------------------------
    "q136_ann_recall_audit" -> GraftQuery(
      build = (s, d) => {
        val emb = embeddings(s, d)
        VectorSearch.annRecallAudit(emb,
            emb.filter(col("vec_id") % 100 === 0 && col("vec_id") < 500),
            "vec_id", "embedding", RecallK)
          .orderBy("query_id")
      },
      oracle = Some {
        val bandCols = (0 until VecBands).map(b =>
          s"${sqlBandValue("v", b)} AS bv$b").mkString(",\n            ")
        val bandSelects = (0 until VecBands).map(b =>
          s"SELECT vec_id, $b AS band, bv$b AS bval FROM sigs")
          .mkString("\n          UNION ALL ")
        s"""
        WITH ${knnPrologSql(withLabel = false)},
        scored AS (SELECT query_id, b.vec_id AS neighbor_id,
            ${sqlDot("b.v", "qv")} / (b.nrm * qn) AS cosine
          FROM nb b CROSS JOIN q WHERE b.vec_id <> query_id),
        ex AS (SELECT query_id, neighbor_id, ex_rnk FROM (
            SELECT query_id, neighbor_id,
              CAST(row_number() OVER (PARTITION BY query_id
                ORDER BY cosine DESC, neighbor_id) AS BIGINT) AS ex_rnk
            FROM scored) WHERE ex_rnk <= $RecallK),
        sigs AS (SELECT vec_id, v, nrm,
            $bandCols
          FROM nb),
        bands AS ($bandSelects),
        cand AS (SELECT DISTINCT qb.vec_id AS query_id, b.vec_id
          FROM bands qb JOIN bands b
            ON qb.band = b.band AND qb.bval = b.bval
            AND b.vec_id <> qb.vec_id
          WHERE ${querySetSqlOn("qb")}),
        ncand AS (SELECT query_id, CAST(count(*) AS BIGINT) AS n_cand
          FROM cand GROUP BY 1),
        cscored AS (SELECT c.query_id, c.vec_id,
            ${sqlDot("nb.v", "q.qv")} / (nb.nrm * q.qn) AS cosine
          FROM cand c
          JOIN nb ON c.vec_id = nb.vec_id
          JOIN q ON c.query_id = q.query_id),
        approx AS (SELECT query_id, vec_id, rnk FROM (
            SELECT query_id, vec_id,
              CAST(row_number() OVER (PARTITION BY query_id
                ORDER BY cosine DESC, vec_id) AS BIGINT) AS rnk
            FROM cscored) WHERE rnk <= $RecallK),
        jj AS (SELECT a.query_id, a.rnk, e.ex_rnk
          FROM approx a LEFT JOIN ex e
            ON a.query_id = e.query_id AND a.vec_id = e.neighbor_id),
        agg AS (SELECT query_id, CAST(count(ex_rnk) AS BIGINT) AS hits,
            min(CASE WHEN ex_rnk = 1 THEN rnk END) AS top1_rnk
          FROM jj GROUP BY 1)
        SELECT a.query_id, n_cand, hits,
          (1000000 * hits) // $RecallK AS recall_ppm,
          top1_rnk, 1000000 // top1_rnk AS mrr_ppm
        FROM agg a JOIN ncand USING (query_id)
        ORDER BY a.query_id"""
      }),

    // ------------------------------------------------------------------
    // q154 — MMR diversity re-ranking (VectorSearch.mmrRerank): the
    // step between retrieval and a RAG/few-shot context window — plain
    // top-k hands the model k near-copies; MMR greedily picks the item
    // maximizing λ·rel − (1−λ)·max-sim-to-selected. λ = 1/2 on RAW
    // int8 inner products keeps the whole greedy walk in longs
    // (argmax of rel − redundancy, ties on vec_id) — hash-gateable
    // where float-cosine MMR is an ulp lottery. Corpus fan-out is
    // q66's (broadcast queries, one window caps candidates at 12);
    // the 5 greedy steps run on the |queries|·12 candidate frame. The
    // oracle unrolls the same 5 steps as chained argmax CTEs.
    // ------------------------------------------------------------------
    "q154_mmr_rerank" -> GraftQuery(
      build = (s, d) => {
        val emb = embeddings(s, d)
        VectorSearch.mmrRerank(emb,
          emb.filter(expr(QuerySetSql)), "vec_id", "embedding",
          candK = MmrCandK, selectK = MmrSelectK)
          .orderBy("query_id", "step")
      },
      oracle = Some {
        val steps = (2 to MmrSelectK).map { t =>
          s"""s$t AS (SELECT query_id, vec_id, CAST($t AS BIGINT) AS step,
              rel, redundancy, mmr2 FROM (
            SELECT c.query_id, c.vec_id, c.rel, r.redundancy,
              c.rel - r.redundancy AS mmr2,
              row_number() OVER (PARTITION BY c.query_id
                ORDER BY c.rel - r.redundancy DESC, c.vec_id) AS rn
            FROM cand c
            JOIN (SELECT s.query_id, s.sa AS vec_id,
                  max(s.sim) AS redundancy
                FROM sims s JOIN sel${t - 1} x
                  ON x.query_id = s.query_id AND x.vec_id = s.sb
                GROUP BY 1, 2) r
              ON r.query_id = c.query_id AND r.vec_id = c.vec_id
            WHERE NOT EXISTS (SELECT 1 FROM sel${t - 1} x
              WHERE x.query_id = c.query_id AND x.vec_id = c.vec_id)
            ) WHERE rn = 1),
          sel$t AS (SELECT * FROM sel${t - 1}
            UNION ALL SELECT * FROM s$t)"""
        }.mkString(",\n          ")
        s"""
        WITH base AS (SELECT vec_id, ${sqlToDouble("embedding")} AS v
          FROM embeddings),
        mx AS (SELECT vec_id, v,
            list_max(list_transform(v, x -> abs(x))) AS m FROM base),
        qt AS (SELECT vec_id, list_transform(v,
            x -> floor(x * (CASE WHEN m > 0 THEN 127.0 / m ELSE 1.0 END)))
            AS qd
          FROM mx),
        q AS (SELECT vec_id AS query_id, qd AS qqd FROM qt
          WHERE $QuerySetSql),
        scored AS (SELECT query_id, t.vec_id, t.qd,
            CAST(${sqlDot("t.qd", "qqd")} AS BIGINT) AS rel
          FROM qt t CROSS JOIN q WHERE t.vec_id <> query_id),
        cand AS (SELECT query_id, vec_id, qd, rel FROM (
            SELECT *, row_number() OVER (PARTITION BY query_id
              ORDER BY rel DESC, vec_id) AS rn FROM scored)
          WHERE rn <= $MmrCandK),
        sims AS (SELECT a.query_id, a.vec_id AS sa, b.vec_id AS sb,
            CAST(${sqlDot("a.qd", "b.qd")} AS BIGINT) AS sim
          FROM cand a JOIN cand b
            ON a.query_id = b.query_id AND a.vec_id <> b.vec_id),
        sel1 AS (SELECT query_id, vec_id, CAST(1 AS BIGINT) AS step, rel,
            CAST(0 AS BIGINT) AS redundancy, rel AS mmr2 FROM (
            SELECT query_id, vec_id, rel, row_number() OVER (
              PARTITION BY query_id ORDER BY rel DESC, vec_id) AS rn
            FROM cand) WHERE rn = 1),
          $steps
        SELECT query_id, vec_id, step, rel, redundancy, mmr2
        FROM sel$MmrSelectK ORDER BY query_id, step"""
      }),

    // ------------------------------------------------------------------
    // q187 — per-label embedding centroid drift (VectorSearch
    // .centroidDrift): which label's vectors sit farthest from the
    // corpus centroid, as the exact fixed-point L1 distance plus the
    // largest single-dimension gap — the representation-space monitor
    // that catches encoder/preprocessing drift q175's value-level TV
    // cannot see. Elements quantize once to ⌊double(v)·2²⁰⌋ (the q43
    // lattice); per-dim gaps in the common-denominator decimal form,
    // floored per dim. One posexplode + map-side (label, dim)
    // aggregate — |labels|·64 rows leave the scan, vectors never
    // shuffle.
    // ------------------------------------------------------------------
    "q187_centroid_drift" -> GraftQuery(
      build = (s, d) =>
        VectorSearch.centroidDrift(embeddings(s, d), "label", "embedding")
          .orderBy("grp"),
      oracle = Some(s"""
        WITH dims AS (SELECT unnest(range(1, $EmbDim + 1)) AS dim),
        e AS (SELECT label AS grp, dim,
            CAST(floor(CAST(embedding[dim] AS DOUBLE) *
              ${VectorSearch.KmeansScale.toLong}) AS BIGINT) AS v_fp
          FROM embeddings, dims),
        g AS (SELECT grp, dim, CAST(count(*) AS BIGINT) AS n_g,
            sum(CAST(v_fp AS HUGEINT)) AS s_g
          FROM e GROUP BY 1, 2),
        a AS (SELECT dim, CAST(sum(n_g) AS BIGINT) AS n_all,
            sum(s_g) AS s_all
          FROM g GROUP BY dim),
        q AS (SELECT grp, g.dim, n_g,
            CAST(abs(s_g * n_all - s_all * n_g) //
              (CAST(n_g AS HUGEINT) * n_all) AS BIGINT) AS qd
          FROM g JOIN a ON g.dim = a.dim)
        SELECT grp, max(n_g) AS n_vecs,
          CAST(sum(qd) AS BIGINT) AS l1_fp,
          max(qd) AS max_dim_fp
        FROM q GROUP BY grp ORDER BY grp""")),

    // ------------------------------------------------------------------
    // q189 — SemDeDup semantic deduplication (VectorSearch
    // .semanticDedup, Abbas et al. 2023): trained k-means clusters the
    // embedding space (the q56 fixed-point machinery, bit-identical
    // cross-engine), candidate pairs are generated WITHIN clusters only
    // (equality join on cent_id — never a corpus self-join; the
    // SemDeDup trick that makes web-scale semantic dedup tractable),
    // exact cosine ≥ 0.99 keeps true near-dups, connected components
    // (the q61 machinery) collapse them, min-id survives. Fixture: two
    // mutant twins per fixed query id (alternate dims scaled 1.002 /
    // 1.004 — near-identical to their source and to each other, and
    // shifted by +100001/+200002 so neither lands on the % 50 seed
    // lattice) must come back as 3-member components keeping the
    // source. The oracle re-derives training, assignment, per-cluster
    // pairs, and the reachability closure.
    // ------------------------------------------------------------------
    "q189_semantic_dedup" -> GraftQuery(
      build = (s, d) => {
        val emb = embeddings(s, d)
        def mut(shift: Long, eps: Double) = emb
          .filter(expr(QuerySetSql))
          .select((col("vec_id") + shift).as("vec_id"),
            transform(col("embedding"), (x, i) =>
              x.cast(DoubleType) *
                (lit(1.0) + lit(eps) * (i % 2).cast(DoubleType)))
              .as("embedding"))
        val orig = emb.select(col("vec_id"),
          toDouble(col("embedding")).as("embedding"))
        VectorSearch.semanticDedup(
          orig.unionByName(mut(100001L, 0.002)).unionByName(mut(200002L, 0.004)),
          "vec_id", "embedding", minCosine = 0.99)
          .orderBy("vec_id")
      },
      oracle = Some {
        def mutSql(shift: Long, eps: String) = s"""
          SELECT vec_id + $shift, list_transform(range(1, len(embedding) + 1),
            i -> CAST(embedding[i] AS DOUBLE) *
              (1.0 + $eps * CAST((i - 1) % 2 AS DOUBLE)))
          FROM embeddings WHERE $QuerySetSql"""
        s"""
        WITH RECURSIVE fx(vec_id, v) AS (
          SELECT vec_id, ${sqlToDouble("embedding")} FROM embeddings
          UNION ALL ${mutSql(100001L, "0.002")}
          UNION ALL ${mutSql(200002L, "0.004")}),
        nb AS (SELECT vec_id, v, sqrt(${sqlDot("v", "v")}) AS nrm FROM fx),
        k0 AS (SELECT vec_id AS cent_id, v AS cv, nrm AS cn FROM nb
          WHERE vec_id % 50 = 0),
        ${kmeansIterSql(1, "k0")}
        ${kmeansIterSql(2, "k1")}
        cents AS (SELECT cent_id, cv, cn FROM k2),
        assigned AS (SELECT vec_id, v, nrm, cent_id FROM (
            SELECT nb.vec_id, nb.v, nb.nrm, c.cent_id,
              row_number() OVER (PARTITION BY nb.vec_id
                ORDER BY ${sqlDot("nb.v", "c.cv")} / (nb.nrm * c.cn) DESC, c.cent_id) AS crnk
            FROM nb CROSS JOIN cents c) t WHERE crnk = 1),
        csz AS (SELECT cent_id, count(*) AS n FROM assigned GROUP BY cent_id),
        keptc AS (SELECT a.vec_id, a.v, a.nrm, a.cent_id FROM assigned a
          JOIN csz USING (cent_id)
          WHERE csz.n <= ${VectorSearch.DefaultMaxBandBucket}),
        prs AS (SELECT x.vec_id AS vec_a, y.vec_id AS vec_b
          FROM keptc x JOIN keptc y
            ON x.cent_id = y.cent_id AND x.vec_id < y.vec_id
          WHERE ${sqlDot("x.v", "y.v")} / (x.nrm * y.nrm) >= 0.99),
        edges AS (SELECT vec_a AS u, vec_b AS w FROM prs
          UNION SELECT vec_b, vec_a FROM prs),
        nodes AS (SELECT DISTINCT u AS n FROM edges),
        reach(n, l) AS (
          SELECT n, n FROM nodes
          UNION
          SELECT e.w, r.l FROM reach r JOIN edges e ON e.u = r.n),
        cc AS (SELECT n AS node, min(l) AS component FROM reach GROUP BY n),
        sz AS (SELECT component, count(*) AS cc_size FROM cc
          GROUP BY component)
        SELECT node AS vec_id, cc.component, cc_size,
          CAST(node = cc.component AS INT) AS keep
        FROM cc JOIN sz ON cc.component = sz.component
        ORDER BY vec_id"""
      },
      headline = true),

    // ------------------------------------------------------------------
    // q263 — embedding-space benchmark decontamination (VectorSearch
    // .decontaminateByEmbedding): q47's n-gram gate catches verbatim
    // leakage; this catches the PARAPHRASE — near-identical vectors
    // that share no 8-gram. Benchmark = the shared bounded query-set
    // slice (broadcast side). The fixture plants both outcomes: the
    // bench members themselves remain in train (exact leakage, cosine
    // 1.0), a +200000-id near-mutant family (alternate dims ×1.002 —
    // the q26 geometry, cosine ≈ 0.999998, flagged) and a +300000-id
    // distorted family (alternate dims ×1.5, cosine ≈ 0.98, correctly
    // BELOW the 0.99 line — the gate discriminates, the report stays
    // exactly 2·|bench| rows at every sf).
    // ------------------------------------------------------------------
    "q263_embedding_decontam" -> GraftQuery(
      build = (s, d) => {
        val emb = embeddings(s, d)
        val orig = emb.select(col("vec_id"),
          toDouble(col("embedding")).as("v"))
        def mutant(idOff: Int, eps: Double) = emb
          .filter(col("vec_id") % 100 === 0 && col("vec_id") < 500)
          .select((col("vec_id") + idOff).as("vec_id"),
            transform(col("embedding"), (x, i) =>
              x.cast(DoubleType) *
                (lit(1.0) + lit(eps) * (i % 2).cast(DoubleType)))
              .as("v"))
        val bench = emb.filter(expr(QuerySetSql))
          .select(col("vec_id"), toDouble(col("embedding")).as("v"))
        VectorSearch.decontaminateByEmbedding(
            orig.union(mutant(200000, 0.002)).union(mutant(300000, 0.5)),
            bench, "vec_id", "v")
          .orderBy("train_id")
      },
      oracle = Some(s"""
        WITH orig AS (SELECT vec_id, ${sqlToDouble("embedding")} AS v
          FROM embeddings),
        mut1 AS (SELECT vec_id + 200000 AS vec_id,
            list_transform(range(1, len(embedding) + 1),
              i -> CAST(embedding[i] AS DOUBLE) *
                (1.0 + 0.002 * CAST((i - 1) % 2 AS DOUBLE))) AS v
          FROM embeddings WHERE $QuerySetSql),
        mut2 AS (SELECT vec_id + 300000 AS vec_id,
            list_transform(range(1, len(embedding) + 1),
              i -> CAST(embedding[i] AS DOUBLE) *
                (1.0 + 0.5 * CAST((i - 1) % 2 AS DOUBLE))) AS v
          FROM embeddings WHERE $QuerySetSql),
        train AS (SELECT * FROM orig UNION ALL SELECT * FROM mut1
          UNION ALL SELECT * FROM mut2),
        tn AS (SELECT vec_id AS train_id, v,
            sqrt(${sqlDot("v", "v")}) AS nrm FROM train),
        bn AS (SELECT vec_id AS bench_id, v AS bv,
            sqrt(${sqlDot("v", "v")}) AS bn FROM orig
          WHERE $QuerySetSql),
        scored AS (SELECT train_id, bench_id,
            ${sqlDot("v", "bv")} / (nrm * bn) AS cosine
          FROM tn CROSS JOIN bn),
        ranked AS (SELECT train_id, bench_id, cosine,
            row_number() OVER (PARTITION BY train_id
              ORDER BY cosine DESC, bench_id) AS rnk
          FROM scored)
        SELECT train_id, bench_id, cosine FROM ranked
        WHERE rnk = 1 AND cosine >= 0.99 ORDER BY train_id""")),
  )
}
