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
    * universe. Materialize this ONCE per row (its own projection) before
    * fanning out to the K permutations — inlining it into
    * [[signatureFromHashes]]'s K expressions recomputes every md5 K times
    * (measured 16× slowdown at sf0.1). */
  def shingleHashes(text: Column, n: Int = 3): Column =
    transform(shingles(text, n), s => hashMod(s))

  /** MinHash signature from a materialized shingle-hash array: K minima of
    * the permuted hashes — pure arithmetic, no hashing. */
  def signatureFromHashes(hv: Column): Column =
    array(perms.map { case (a, b) =>
      array_min(transform(hv, h => (lit(a) * h + lit(b)) % Prime))
    }: _*)

  /** LSH band keys: Bands strings, each "b_m1_m2_…_mr" over one signature
    * band. Two documents sharing any band key are candidates. */
  def bandKeys(sig: Column): Column =
    array((0 until Bands).map { b =>
      concat_ws("_",
        lit(b.toString) +: (0 until RowsPerBand).map(r =>
          element_at(sig, b * RowsPerBand + r + 1).cast(StringType)): _*)
    }: _*)

  /** Estimated Jaccard from two signatures: fraction of equal components. */
  def signatureSimilarity(sigA: Column, sigB: Column): Column =
    aggregate(
      zip_with(sigA, sigB, (x, y) => when(x === y, 1).otherwise(0)),
      lit(0), (acc, v) => acc + v).cast(DoubleType) / lit(K.toDouble)

  /** Exact word n-gram Jaccard between two texts (set semantics). */
  def ngramJaccard(textA: Column, textB: Column, n: Int = 2): Column = {
    val a = array_distinct(shingles(textA, n))
    val b = array_distinct(shingles(textB, n))
    val inter = size(array_intersect(a, b)).cast(DoubleType)
    inter / (size(a) + size(b) - size(array_intersect(a, b))).cast(DoubleType)
  }

  /**
   * Exact dedup groups: one row per distinct content, with the minimum id
   * as representative and the copy count. Only (hash, id) cross the
   * shuffle; document bodies stay at the scan.
   */
  def exactDupGroups(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.select(hash64(col(textCol)).as("content_hash"), col(idCol))
      .groupBy(col("content_hash"))
      .agg(min(col(idCol)).as("rep_id"), count(lit(1)).as("n_copies"))

  /**
   * MinHash/LSH candidate pairs with exact rerank columns. Input must have
   * (idCol, textCol); output: (doc_a, doc_b, est_sim, jaccard) for every
   * candidate pair sharing ≥1 band key, est_sim ≥ minEstSim.
   */
  def minhashCandidatePairs(df: DataFrame, textCol: String, idCol: String,
      shingleN: Int = 3, minEstSim: Double = 0.3): DataFrame = {
    val texts = df.select(col(idCol).as("doc_id"), col(textCol).as("text"))
    // signatures only — the text column must NOT ride along: bands, the
    // candidate join and the est_sim join exchange 16 ints per doc, never
    // document bodies. Two-step projection: Catalyst keeps `hv` as a
    // single computed column because it is non-cheap and referenced K
    // times (CollapseProject declines to inline it).
    val sigs = texts
      .select(col("doc_id"), shingleHashes(col("text"), shingleN).as("hv"))
      .select(col("doc_id"), signatureFromHashes(col("hv")).as("sig"))
    // the signature rides along with its band rows (16 longs × Bands rows
    // per doc — trivial exchange weight) so est_sim is computable at the
    // moment a bucket pair is found, with no extra join back to sigs
    val bands = sigs.select(col("doc_id"), col("sig"),
      explode(bandKeys(col("sig"))).as("band_key"))
    // cheap signature-similarity gate FIRST: candidate buckets produce far
    // more pairs than survive est_sim, and the exact-Jaccard rerank costs
    // O(tokens) per pair — running it pre-filter made the whole operator
    // ~10× slower at sf0.1
    val estimated = bands.as("x")
      .join(bands.as("y"), col("x.band_key") === col("y.band_key")
        && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        signatureSimilarity(col("x.sig"), col("y.sig")).as("est_sim"))
      .distinct()
      .filter(col("est_sim") >= minEstSim)
    // exact rerank on the survivors only
    estimated
      .join(texts.select(col("doc_id"), col("text").as("text_a")),
        col("doc_a") === col("doc_id")).drop("doc_id")
      .join(texts.select(col("doc_id"), col("text").as("text_b")),
        col("doc_b") === col("doc_id")).drop("doc_id")
      .select(col("doc_a"), col("doc_b"), col("est_sim"),
        ngramJaccard(col("text_a"), col("text_b")).as("jaccard"))
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
}
