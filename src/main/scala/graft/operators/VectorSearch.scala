package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Similarity search over an embedding column (`Array[Float]`) — the
 * training-data-pipeline ANN surface (builder brief; absent from the
 * reference, SURVEY §2.2).
 *
 * Two strategies:
 *  - [[knnBrute]]: exact top-k for a BOUNDED query set — broadcast the
 *    queries, scan the corpus once. Linear in corpus size, never an
 *    all-pairs product; the baseline every ANN result is audited against.
 *  - [[bucketedNearDupPairs]]: random-hyperplane LSH with BANDED
 *    signatures — [[SigBits]] sign bits split into [[VecBands]] band keys
 *    of [[VecRowsPerBand]] bits each; two vectors are candidates iff they
 *    agree on EVERY bit of at least one band. Pairs come from an equality
 *    join on (band, band_value) and are reranked with exact cosine.
 *
 * 100 TB design: with banding, the candidate count is Σ over buckets of
 * bucket², where each band partitions the corpus into 2^[[VecRowsPerBand]]
 * buckets *per band* and near-duplicates concentrate together while the
 * bulk spreads. Growing the corpus 100× should grow [[SigBits]] by
 * ~log2(100)≈7 bits (add a band, or widen bands) to keep bucket occupancy
 * constant — see [[recommendedSigBits]]. A single fixed bucket id (the
 * round-2 design: 8 bits, 256 buckets, candidates ≈ N²/256) stays
 * quadratic in N; banding with size-tuned bits is the scale path, exactly
 * the [[TextDedup]] band-key pattern.
 *
 * Numeric determinism (DuckDB-oracle bit-equality): every dot product
 * casts elements to double BEFORE multiplying and folds strictly
 * left-to-right (`aggregate` with a 0.0 seed ≡ DuckDB `list_reduce`,
 * since 0.0+x == x). No UDFs — all higher-order built-ins.
 */
object VectorSearch {

  /** Total hyperplane sign bits = VecBands × VecRowsPerBand. */
  val VecBands = 4
  val VecRowsPerBand = 8
  val SigBits: Int = VecBands * VecRowsPerBand

  /** Bits needed to keep expected band-bucket occupancy ≈ constant as the
    * corpus grows: one extra bit per doubling. For corpusSize = n with
    * target per-band bucket occupancy c, each band wants ~log2(n/c) bits.
    * Callers running far beyond the 2^VecRowsPerBand × VecBands design
    * point should widen the geometry rather than accept hot buckets. */
  def recommendedSigBits(corpusSize: Long, bands: Int = VecBands,
      targetBucketOccupancy: Long = 1024): Int = {
    val perBand = math.max(VecRowsPerBand,
      math.ceil(math.log(math.max(corpusSize / targetBucketOccupancy, 2L).toDouble)
        / math.log(2.0)).toInt)
    bands * perBand
  }

  /** Deterministic ±1 hyperplanes (seeded), identical in the generated
    * DuckDB oracle (VectorQueries embeds the same literals). */
  val hyperplanes: Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(7)
    Seq.fill(SigBits)(Seq.fill(64)(if (rnd.nextBoolean()) 1.0 else -1.0))
  }

  /** Float array → double array (exact widening; all arithmetic after
    * this point is double, matching the oracle's CAST-first order).
    * A built-in array CAST, not `transform(v, _.cast(double))`: the
    * element-wise result is identical, but a higher-order function is a
    * CodegenFallback expression that drags its WHOLE projection out of
    * whole-stage codegen — with the cast, prep + signature + dot
    * projections compile into one generated stage. */
  def toDouble(v: Column): Column = v.cast(ArrayType(DoubleType))

  /** In-order double dot product — a native codegen'd Catalyst
    * expression ([[graft.functions.DoubleDotProduct]]): higher-order
    * functions evaluate interpreted per element, and this is the
    * engine's hottest arithmetic (32 hyperplane dots per row in the LSH
    * signature, one dot per candidate pair in kNN/IVF/rerank). Callers
    * pass double arrays (see [[toDouble]]); the result is bit-identical
    * to the HOF form — strict left-to-right summation from a 0.0 seed —
    * which the equivalence spec asserts against [[dotDReference]]. */
  def dotD(a: Column, b: Column): Column =
    graft.functions.DoubleDotProduct.dot(a, b)

  /** The higher-order-function form of [[dotD]], kept as the executable
    * specification the native expression is asserted against (zip_with
    * casts make it total over float arrays too). */
  private[graft] def dotDReference(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast(DoubleType) * y.cast(DoubleType)),
      lit(0.0), (acc, v) => acc + v)

  def norm(v: Column): Column = sqrt(dotD(v, v))

  /** Band values: element b is the VecRowsPerBand sign bits of band b
    * packed into an int. Materialize this array ONCE per row (its own
    * projection) before any explode/join fans out — the 32 hyperplane
    * dots are the expensive part. */
  def bandValues(v: Column): Column =
    bandValuesWith(v, VecBands, VecRowsPerBand)

  /** [[bandValues]] under an explicit (bands × rowsPerBand) geometry
    * over the same hyperplane table — the knob [[recommendedSigBits]]
    * turns. bands·rowsPerBand ≤ [[SigBits]]: regrouping the EXISTING
    * planes (4×8 ↔ 2×16) changes collision probability per band
    * without changing any per-vector arithmetic, which is exactly how
    * the recall/cost trade is tuned and what the q136 planted-recall
    * spec measures. */
  def bandValuesWith(v: Column, bands: Int, rowsPerBand: Int): Column = {
    require(bands >= 1 && rowsPerBand >= 1 && bands * rowsPerBand <= SigBits,
      s"geometry $bands x $rowsPerBand exceeds the $SigBits-plane table")
    array((0 until bands).map { b =>
      (0 until rowsPerBand).map { r =>
        when(dotD(v, typedlit(hyperplanes(b * rowsPerBand + r))) > 0,
          lit(1 << r)).otherwise(lit(0))
      }.reduce(_ + _)
    }: _*)
  }

  /**
   * Exact cosine top-k: every corpus vector scored against every QUERY
   * (queries broadcast — the small side by construction), ranked per query.
   * Input frames: base (idCol, vecCol float array), queries likewise.
   */
  /** (idCol, v: double array, nrm) — the shared vector prep every
    * cosine operator starts from (quantizedTopK has its own int8
    * variant; it is NOT this shape). */
  private def prepNormed(df: DataFrame, idCol: String, vecCol: String,
      extra: Seq[(String, String)] = Nil): DataFrame =
    df.select(col(idCol) +: toDouble(col(vecCol)).as("v") +:
        extra.map { case (c, a) => col(c).as(a) }: _*)
      .select(col(idCol) +: col("v") +: norm(col("v")).as("nrm") +:
        extra.map { case (_, a) => col(a) }: _*)

  /** Seed centroids (every `centroidEvery`-th id), fixed-point trained
    * for `kmeansIters` rounds over the prepped corpus `b` — the shared
    * training setup of [[ivfTopK]] and [[kmeansAssign]]
    * (`kmeansIters <= 0` returns the raw modulo sample).
    *
    * CONTRACT NOTE (ADVICE r17 #3): this wrapper is the designated
    * EAGER boundary of the vector family — the localCheckpoint below
    * runs the whole k-means training job at PLAN-CONSTRUCTION time, so
    * merely building an ivfTopK/kmeansAssign/semanticDedup frame costs
    * the training pass even if the caller never executes it.
    * [[trainCentroids]] itself stays lazy (its spec-pinned r4
    * contract); callers needing a lazy end-to-end build should call it
    * directly. */
  private def seededCents(base: DataFrame, b: DataFrame, idCol: String,
      vecCol: String, centroidEvery: Int, kmeansIters: Int,
      dims: Int): DataFrame = {
    val sampled = prepNormed(base.filter(col(idCol) % centroidEvery === 0),
      idCol, vecCol)
      .select(col(idCol).as("cent_id"), col("v").as("cv"), col("nrm").as("cn"))
    if (kmeansIters <= 0) sampled
    // r17 OPTIMIZATION (guide §1.2): the trained frame is tiny
    // (≤ N/centroidEvery rows) but its lineage is the full nested
    // training pipeline, and several callers broadcast it from TWO
    // consumers (ivfTopK's inverted lists AND its query probes) — each
    // re-ran training. One eager localCheckpoint here executes training
    // exactly once per operator; trainCentroids itself stays lazy (its
    // spec-pinned contract), this wrapper is the execution context.
    else trainCentroids(b, sampled, idCol, kmeansIters, dims)
      .localCheckpoint(true)
  }

  def knnBrute(base: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      k: Int = 5): DataFrame = {
    val b = prepNormed(ScanOps.spreadSmallInput(base, col(idCol)), idCol, vecCol)
    val q = prepNormed(queries, idCol, vecCol).select(
      col(idCol).as("query_id"), col("v").as("qv"), col("nrm").as("qn"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id"))
    b.join(broadcast(q), col(idCol) =!= col("query_id"))
      .select(col("query_id"), col(idCol).as("neighbor_id"),
        (dotD(col("v"), col("qv")) / (col("nrm") * col("qn"))).as("cosine"))
      .withColumn("rnk", row_number().over(w).cast(LongType))
      .filter(col("rnk") <= k)
  }

  /**
   * Contrastive training-pair mining: for every query vector, the best
   * POSITIVE (same label, highest cosine) and the HARD NEGATIVE
   * (different label, highest cosine) — the pair-construction step of
   * contrastive/embedding training, where "hardest negative" (the most
   * similar wrong-label example) is what makes the loss informative.
   *
   * Same contract as [[knnBrute]]: the query set is the BOUNDED
   * broadcast side, the corpus scans linearly, cosines come from the
   * codegen'd in-order dot, and the per-(query, polarity) argmax is a
   * WindowGroupLimit with a total tie-break — deterministic at any
   * partitioning. The LSH/IVF variants accelerate it the same way they
   * accelerate kNN: generate candidates per polarity, then exact-rerank.
   */
  def contrastivePairs(base: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, labelCol: String): DataFrame = {
    // unlabeled rows are EXCLUDED from mining on both sides: a null
    // label can be neither a positive nor a meaningful hard negative,
    // and null-safe matching would silently pair unlabeled rows while
    // the plain-equality oracle partitions them under NULL
    val b = prepNormed(
      ScanOps.spreadSmallInput(base.filter(col(labelCol).isNotNull),
        col(idCol)),
      idCol, vecCol, Seq(labelCol -> "b_label"))
    val q = prepNormed(queries.filter(col(labelCol).isNotNull),
      idCol, vecCol, Seq(labelCol -> "q_label"))
      .select(col(idCol).as("query_id"), col("v").as("qv"),
        col("nrm").as("qn"), col("q_label"))
    val w = Window.partitionBy("query_id", "is_positive")
      .orderBy(col("cosine").desc, col("neighbor_id"))
    b.join(broadcast(q), col(idCol) =!= col("query_id"))
      .select(col("query_id"),
        (col("b_label") === col("q_label")).cast("int").as("is_positive"),
        col(idCol).as("neighbor_id"),
        (dotD(col("v"), col("qv")) / (col("nrm") * col("qn"))).as("cosine"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") === 1)
      .select(col("query_id"), col("is_positive"), col("neighbor_id"),
        col("cosine"))
  }

  /** Fixed-point scale for the k-means centroid mean: element sums go
    * through `floor(x · 2^20)` longs — exact, order-independent integer
    * addition — so Spark's partial aggregation order and DuckDB's
    * sequential fold produce the SAME centroid, where a naive double sum
    * would differ in the last bits and flip assignments. 20 fraction
    * bits on unit-scale embeddings keep |sum| ≪ 2^53, so the final
    * long→double division is exact in both engines. */
  val KmeansScale: Double = 1048576.0

  /**
   * Deterministic spherical k-means refinement of an initial centroid
   * set: `iters` rounds of (assign every corpus vector to its nearest
   * centroid by cosine, tie-break on centroid id) → (new centroid =
   * fixed-point element-wise mean of its members). Clusters that lose
   * all members drop out (both engines agree by construction). The
   * centroid set stays broadcast-sized (≤ C rows) and the corpus is
   * re-scanned once per iteration — training cost iters·N·C dots, the
   * textbook k-means shape with C ≈ √N.
   *
   * `b` carries (idCol, v: double array, nrm); `init` carries
   * (cent_id, cv, cn). Returns the same (cent_id, cv, cn) shape.
   */
  def trainCentroids(b: DataFrame, init: DataFrame, idCol: String,
      iters: Int, dims: Int): DataFrame = {
    // dims guard, IN-PLAN (VERDICT r4 #6 — no driver-side probe job):
    // with ANSI off, element_at past the array end is null and training
    // would silently degrade to null centroids. The filter is a per-row
    // size compare that passes every well-shaped row; a mismatched row
    // hits the raise_error branch and fails the FIRST training job
    // loudly. CaseWhen's null-typed else coerces to the boolean branch,
    // and the filter's data dependence on `v` keeps Catalyst from
    // folding it away.
    val checked = b.withColumn("v",
      when(size(col("v")) === dims, col("v"))
        .otherwise(raise_error(concat(
          lit(s"dims=$dims but vector of "), col(idCol),
          lit(" has "), size(col("v")), lit(" elements")))))
    var cents = init
    for (_ <- 1 to iters) {
      // r17 OPTIMIZATION (guide §2.3 — aggregate before you shuffle):
      // the per-row argmin used to be a row_number window over the
      // N×C broadcast fan-out — the whole fan-out (8.8 M rows at bench
      // scale) shuffled on idCol and sorted. max_by is a declarative
      // aggregate with map-side partial combine: the fan-out collapses
      // to one row per vector BEFORE the exchange, and there is no
      // sort. The ordering key (cent_cos, −cent_id) reproduces the
      // window's (cos desc, cent_id asc) tie-break exactly; keys are
      // unique per group, so the argmax is total either way.
      val assigned = checked.join(broadcast(cents))
        .withColumn("cent_cos",
          dotD(col("v"), col("cv")) / (col("nrm") * col("cn")))
        .groupBy(col(idCol))
        .agg(max_by(
          struct(col("cent_id"), col("v")),
          struct(col("cent_cos"), negate(col("cent_id")))).as("m"))
        .select(col("m.cent_id").as("cent_id"), col("m.v").as("v"))
      // one map-side-combined aggregate: dims exact long sums + a count,
      // then the only double op is a single division per element
      val dimSums = (0 until dims).map(j =>
        sum(floor(element_at(col("v"), j + 1) * KmeansScale)).as(s"s$j"))
      // trainCentroids itself stays fully lazy (VERDICT r4 #6, spec-
      // pinned: building the plan runs NO job; the dims guard fires on
      // execute) — plan truncation for multi-consumer callers lives in
      // [[seededCents]], which materializes the FINAL trained frame.
      cents = assigned.groupBy(col("cent_id"))
        .agg(dimSums.head, dimSums.tail :+ count(lit(1)).as("n"): _*)
        .select(col("cent_id"),
          array((0 until dims).map(j =>
            col(s"s$j").cast(DoubleType) / (col("n") * KmeansScale)): _*).as("cv"))
        .select(col("cent_id"), col("cv"), norm(col("cv")).as("cn"))
    }
    cents
  }

  /**
   * IVF (inverted-file) approximate top-k: the OTHER classic ANN scale
   * path next to LSH banding. A deterministic coarse quantizer —
   * every `centroidEvery`-th corpus vector, optionally refined by
   * `kmeansIters` rounds of [[trainCentroids]] — partitions the corpus
   * into C inverted lists by nearest-centroid assignment; a query
   * probes only its `nprobe` nearest centroids' lists. With C ≈ √N the
   * build costs N·√N dots and each query √N·nprobe — sub-quadratic,
   * and the centroid set is broadcast (bounded) while the corpus only
   * shuffles on its centroid id.
   *
   * Everything is deterministic arithmetic (in-order double dots,
   * fixed-point k-means means, cosine-desc + id tie-breaks), so the
   * DuckDB oracle (q43) reproduces it bit-for-bit — INCLUDING the
   * trained centroids. kmeansIters = 0 gives the raw modulo sample
   * (the recall baseline the trained quantizer must beat, asserted by
   * VectorSearchSpec).
   *
   * Input frames carry (idCol, vecCol float array); output
   * (query_id, neighbor_id, cosine, rnk ≤ k).
   */
  def ivfTopK(base: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      k: Int = 5, centroidEvery: Int = 50, nprobe: Int = 2,
      kmeansIters: Int = 0, dims: Int = 64): DataFrame = {
    val b = prepNormed(ScanOps.spreadSmallInput(base, col(idCol)), idCol, vecCol)
    val cents = seededCents(base, b, idCol, vecCol, centroidEvery, kmeansIters, dims)
    def nearestCents(df: DataFrame, idName: String, keep: Int) =
      nearestCentroids(df, cents, idName, keep)
        .drop("cv", "cn", "cent_cos", "cent_rnk")
    // inverted lists: each corpus vector on its single nearest centroid
    val assigned = nearestCents(b, idCol, keep = 1)
    // probe: each query fans out to its nprobe nearest lists
    val probes = nearestCents(
      prepNormed(queries, idCol, vecCol)
        .select(col(idCol).as("query_id"), col("v"), col("nrm")),
      "query_id", keep = nprobe)
      .select(col("query_id"), col("v").as("qv"), col("nrm").as("qn"), col("cent_id"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id"))
    assigned.join(broadcast(probes), Seq("cent_id"))
      .filter(col(idCol) =!= col("query_id"))
      .select(col("query_id"), col(idCol).as("neighbor_id"),
        (dotD(col("v"), col("qv")) / (col("nrm") * col("qn"))).as("cosine"))
      .withColumn("rnk", row_number().over(w).cast(LongType))
      .filter(col("rnk") <= k)
  }

  /** Rank each row's cosine-nearest centroids (ties broken by cent_id),
    * keeping the top `keep`. `df` carries (idName, v, nrm); `cents`
    * carries (cent_id, cv, cn) and is broadcast — the shared kernel of
    * [[ivfTopK]] (inverted lists + query probes) and [[kmeansAssign]]. */
  private def nearestCentroids(df: DataFrame, cents: DataFrame,
      idName: String, keep: Int): DataFrame = {
    if (keep == 1) {
      // r17 OPTIMIZATION (guide §2.3): the keep-1 argmax (the corpus-
      // sized assignment path) as a map-side-combined max_by instead of
      // a row_number window over the N×C broadcast fan-out — the fan-
      // out collapses to one row per vector before any exchange and
      // nothing sorts. Ordering key (cent_cos, −cent_id) ≡ the window's
      // (cos desc, cent_id asc); output schema matches the window form
      // (cent_rnk pinned to literal 1) so callers are unchanged.
      df.join(broadcast(cents))
        .withColumn("cent_cos",
          dotD(col("v"), col("cv")) / (col("nrm") * col("cn")))
        .groupBy(col(idName))
        .agg(max_by(
          struct(col("v"), col("nrm"), col("cent_id"), col("cv"),
            col("cn"), col("cent_cos")),
          struct(col("cent_cos"), negate(col("cent_id")))).as("m"))
        .select(col(idName), col("m.v").as("v"), col("m.nrm").as("nrm"),
          col("m.cent_id").as("cent_id"), col("m.cv").as("cv"),
          col("m.cn").as("cn"), col("m.cent_cos").as("cent_cos"),
          lit(1).as("cent_rnk"))
    } else {
      val w = Window.partitionBy(idName)
        .orderBy(col("cent_cos").desc, col("cent_id"))
      df.join(broadcast(cents))
        .withColumn("cent_cos",
          dotD(col("v"), col("cv")) / (col("nrm") * col("cn")))
        .withColumn("cent_rnk", row_number().over(w))
        .filter(col("cent_rnk") <= keep)
    }
  }

  /**
   * Document clustering: assign EVERY corpus vector to its nearest
   * trained k-means centroid — [[ivfTopK]]'s quantizer exposed as the
   * clustering operator itself (corpus segmentation, topic bucketing,
   * per-cluster sampling quotas are all this one output). Same
   * deterministic machinery: fixed-point training, broadcast centroids,
   * one corpus scan to assign; only (id, cent_id, cos) leave the scan.
   * Output: (idCol, cent_id, cent_cos), one row per input vector.
   */
  def kmeansAssign(base: DataFrame, idCol: String, vecCol: String,
      centroidEvery: Int = 50, kmeansIters: Int = 2, dims: Int = 64): DataFrame = {
    val b = prepNormed(ScanOps.spreadSmallInput(base, col(idCol)), idCol, vecCol)
    val cents = seededCents(base, b, idCol, vecCol, centroidEvery, kmeansIters, dims)
    nearestCentroids(b, cents, idCol, keep = 1)
      .select(col(idCol), col("cent_id"), col("cent_cos"))
  }

  /**
   * SemDeDup-style SEMANTIC deduplication (Abbas et al. 2023,
   * "SemDeDup: Data-efficient learning at web-scale through semantic
   * deduplication"): cluster the embedding space with the trained
   * k-means quantizer, generate candidate pairs WITHIN each cluster
   * only, keep pairs with exact cosine ≥ `minCosine`, collapse them
   * into connected components, and mark one canonical survivor (min
   * id) per component — the dedup family that catches paraphrases and
   * re-encodings sharing no n-grams at all, which every textual path
   * (q22/q23/q100/q188) structurally misses.
   *
   * Composition of proven pieces: [[trainCentroids]]/[[kmeansAssign]]
   * (fixed-point deterministic training — the q56 gate), per-cluster
   * pairing (this method), [[graft.operators.GraphOps
   * .connectedComponents]] (the q61 gate), min-id canonical keep (the
   * q61 policy; [[graft.operators.GraphOps.canonicalMembers]] slots in
   * when a quality column exists).
   *
   * Scale shape — the candidate stage is NEVER a corpus self-join:
   *  - the pair join's equality key is the cluster id, so pair cost is
   *    Σ cluster² with C ≈ √N trained clusters (the SemDeDup paper's
   *    own trick), and vectors shuffle ONCE keyed on cent_id;
   *  - clusters above `maxClusterSize` are dropped whole via the same
   *    count-window cap discipline as every bucketed candidate
   *    generator here (a degenerate corpus collapsing into one cluster
   *    must not do cluster² work; the cap is mirrored in the q189
   *    oracle so a trip can never diverge engines);
   *  - the assigned frame is localCheckpointed before the self-join —
   *    both join sides read the materialized partitions instead of
   *    re-running train+assign twice (Spark shares no plan subtrees
   *    across self-join sides);
   *  - CC then moves only (node, label) longs (GraphOps discipline).
   *
   * Input: (idCol, vecCol) float/double arrays. Output: one row per
   * vector that participates in ≥1 kept pair — (vec_id, component,
   * cc_size, keep); `keep` = 1 on the component's min-id member.
   * Vectors with no near-duplicate are implicitly all keepers.
   */
  def semanticDedup(base: DataFrame, idCol: String, vecCol: String,
      minCosine: Double, centroidEvery: Int = 50, kmeansIters: Int = 2,
      dims: Int = 64, maxClusterSize: Int = DefaultMaxBandBucket): DataFrame = {
    val b = prepNormed(ScanOps.spreadSmallInput(base, col(idCol)), idCol, vecCol)
    val cents = seededCents(base, b, idCol, vecCol, centroidEvery, kmeansIters, dims)
    val assigned = nearestCentroids(b, cents, idCol, keep = 1)
      .select(col(idCol).as("vid"), col("v"), col("nrm"), col("cent_id"))
    val szW = Window.partitionBy("cent_id")
    val kept = assigned
      .withColumn("csize", count(lit(1)).over(szW))
      .filter(col("csize") <= maxClusterSize)
      .drop("csize")
      .localCheckpoint(true)
    val pairs = kept.as("a")
      .join(kept.as("b"),
        col("a.cent_id") === col("b.cent_id") && col("a.vid") < col("b.vid"))
      .select(col("a.vid").as("vec_a"), col("b.vid").as("vec_b"),
        (dotD(col("a.v"), col("b.v")) / (col("a.nrm") * col("b.nrm")))
          .as("cosine"))
      .filter(col("cosine") >= minCosine)
    val cc = graft.operators.GraphOps.connectedComponents(pairs, "vec_a", "vec_b")
    val sizes = cc.groupBy(col("component")).agg(count(lit(1)).as("cc_size"))
    cc.join(sizes, Seq("component"))
      .select(col("node").as("vec_id"), col("component"), col("cc_size"),
        (col("node") === col("component")).cast("int").as("keep"))
  }

  /** Default [[bucketedNearDupPairs]] skew cap, mirrored by the q26
    * DuckDB oracle (VectorQueries embeds it in the kept-bucket filter) so
    * a tripped cap drops the SAME buckets in both engines instead of
    * silently diverging. Shared bound rationale with
    * [[TextDedup.DefaultMaxBandBucket]]: a kept bucket expands ≤
    * C(cap, 2) pair structs inside one row. */
  val DefaultMaxBandBucket = 1000

  /** (band, bval) bucket sizes over a band-rows frame — the skew
    * diagnostic for [[bucketedNearDupPairs]]'s `maxBandBucket` cap: for
    * drop accounting, filter on `bucket_size > cap` and count/log before
    * running the dedup. */
  def vecBandBucketSizes(bands: DataFrame): DataFrame =
    bands.groupBy(col("band"), col("bval")).agg(count(lit(1)).as("bucket_size"))

  /**
   * ANN quality audit: per query, the recall@k and first-hit rank of
   * the banded-LSH candidate path against the exact cosine top-k — the
   * measurement that turns "we use approximate search" into a number a
   * pipeline owner can gate on (recall too low → add bands/bits, see
   * [[recommendedSigBits]]). Emits (query_id, n_cand, hits, recall_ppm,
   * top1_rnk, mrr_ppm): `hits` of the exact top-k found among the LSH
   * candidates' own top-k, `top1_rnk` where the TRUE nearest neighbor
   * landed in the approximate ranking (null = missed entirely, and
   * mrr_ppm propagates the null rather than faking a 0).
   *
   * Scale shape: the audit query set is BOUNDED (broadcast side); the
   * exact pass is [[knnBrute]] (linear corpus scan — the audit's
   * honest cost, run on a sample in production); the candidate pass is
   * one equi-join of the queries' band rows against the corpus band
   * index — the same access path the production [[bucketedNearDupPairs]]
   * uses, so the audit measures the deployed geometry, not a replica.
   */
  def annRecallAudit(base: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int = 5,
      bands: Int = VecBands, rowsPerBand: Int = VecRowsPerBand): DataFrame = {
    def geomBandRows(df: DataFrame, idName: String) =
      bandRowsFromBvals(
        df.select(col(idName).as("vec_id"),
          bandValuesWith(col("v"), bands, rowsPerBand).as("bvals")),
        bands)
    val exact = knnBrute(base, queries, idCol, vecCol, k)
      .select(col("query_id").as("ex_query_id"), col("neighbor_id"),
        col("rnk").as("ex_rnk"))
    val b = prepNormed(base, idCol, vecCol)
    val q = prepNormed(queries, idCol, vecCol).select(
      col(idCol).as("query_id"), col("v").as("qv"), col("nrm").as("qn"))
    val bBands = geomBandRows(
      b.select(col(idCol).as("vec_id"), col("v")), "vec_id")
    val qBands = geomBandRows(
        q.select(col("query_id").as("vec_id"), col("qv").as("v")), "vec_id")
      .select(col("vec_id").as("query_id"), col("band"), col("bval"))
    val cand = broadcast(qBands).join(bBands, Seq("band", "bval"))
      .filter(col("vec_id") =!= col("query_id"))
      .select("query_id", "vec_id").distinct()
    val nCand = cand.groupBy("query_id").agg(count(lit(1)).as("n_cand"))
    val scored = cand
      .join(b.select(col(idCol).as("vec_id"), col("v"), col("nrm")),
        "vec_id")
      .join(broadcast(q), "query_id")
      .select(col("query_id"), col("vec_id"),
        (dotD(col("v"), col("qv")) / (col("nrm") * col("qn"))).as("cosine"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("vec_id"))
    val approx = scored
      .withColumn("rnk", row_number().over(w).cast(LongType))
      .filter(col("rnk") <= k)
    approx
      .join(exact, col("query_id") === col("ex_query_id") &&
        col("vec_id") === col("neighbor_id"), "left")
      .groupBy("query_id")
      .agg(count(col("ex_rnk")).as("hits"),
        min(when(col("ex_rnk") === 1L, col("rnk"))).as("top1_rnk"))
      .join(nCand, "query_id")
      .withColumn("recall_ppm", expr(s"(1000000L * hits) div $k"))
      .withColumn("mrr_ppm", expr("1000000L div top1_rnk"))
      .select("query_id", "n_cand", "hits", "recall_ppm", "top1_rnk",
        "mrr_ppm")
  }

  /** Band rows (vec_id, band, bval) for a (idCol, v: double array)
    * frame. The generator explodes a LITERAL band index array and reads
    * the materialized band-value array ABOVE the Generate — the direct
    * `explode(bandValues(v))` form would let Catalyst inline all 32
    * hyperplane dots into the generator (the [[TextDedup.bandRows]]
    * measured pitfall). */
  def vecBandRows(df: DataFrame, idCol: String): DataFrame =
    bandRowsFromBvals(
      df.select(col(idCol).as("vec_id"), bandValues(col("v")).as("bvals")))

  /** The literal-band-explode kernel over a frame already carrying
    * `bvals` — shared by [[vecBandRows]] and [[bucketedNearDupPairs]]
    * (whose prep computes bvals alongside nrm in ONE projection), so
    * the band keying the diagnostic counts is BY CONSTRUCTION the one
    * the dedup buckets on. */
  private def bandRowsFromBvals(df: DataFrame,
      bands: Int = VecBands): DataFrame =
    df.select(col("vec_id"), col("bvals"),
        explode(typedlit((0 until bands).toArray)).as("band"))
      .select(col("vec_id"), col("band"),
        element_at(col("bvals"), col("band") + 1).as("bval"))

  /**
   * Banded-LSH near-duplicate pairs. Input: (idCol, v) with v already a
   * DOUBLE array (see [[toDouble]]). Output: (vec_a, vec_b, cosine) for
   * every pair sharing at least one full NON-HOT band bucket,
   * cosine ≥ minCosine.
   *
   * Stage shapes (the [[TextDedup.minhashCandidatePairs]] discipline,
   * ported verbatim to the vector path):
   *  - per-vector prep computes v, nrm and the band-value array in one
   *    projection;
   *  - band rows explode a LITERAL band-index array and read the
   *    materialized band-value array above the Generate, so the 32-dot
   *    signature is never inlined into the generator;
   *  - the skew cap comes FIRST, from a count-only aggregate: hot
   *    (band, bval) buckets (> maxBandBucket rows — a degenerate corpus
   *    of near-zero or template vectors collapsing onto one sign
   *    pattern) are anti-joined away via a BOUNDED broadcast (at most
   *    N/cap hot keys exist) before any id is collected, so a hot
   *    bucket can never do bucket² work;
   *  - candidates come from bucket AGGREGATION, not a row self-join:
   *    one shuffle on (band, bval) collects each surviving bucket's ids
   *    (≤ cap), pair expansion is an in-row expression over the sorted
   *    id list, and `.distinct()` collapses multi-band hits BEFORE the
   *    exact-cosine rerank, which joins the vectors back once per side.
   *
   * @param maxBandBucket skew guard; dropped buckets are observable via
   *        [[vecBandBucketSizes]] (`bucket_size > maxBandBucket`).
   *        Dropping a bucket only loses pairs whose EVERY shared band
   *        is hot — true near-duplicates usually share a non-hot band
   *        too (and identical-vector floods, the common degenerate, are
   *        exact-dedup's job, not ANN's).
   */
  def bucketedNearDupPairs(df: DataFrame, idCol: String, minCosine: Double,
      maxBandBucket: Int = DefaultMaxBandBucket): DataFrame = {
    require(maxBandBucket >= 2 && maxBandBucket <= 10000,
      s"maxBandBucket must be in [2, 10000], got $maxBandBucket")
    val vs = ScanOps.spreadSmallInput(df, col(idCol))
      .select(col(idCol).as("vec_id"), col("v"))
      .select(col("vec_id"), col("v"), norm(col("v")).as("nrm"),
        bandValues(col("v")).as("bvals"))
    val bands = bandRowsFromBvals(vs)
    val kept = bands.join(
      broadcast(vecBandBucketSizes(bands)
        .filter(col("bucket_size") > maxBandBucket)
        .select(col("band"), col("bval"))),
      Seq("band", "bval"), "left_anti")
    val cand = kept
      .groupBy(col("band"), col("bval"))
      .agg(collect_list(col("vec_id")).as("ids"))
      .filter(size(col("ids")) >= 2)
      .select(array_sort(col("ids")).as("ids"))
      // r18 OPTIMIZATION (guide §1.2 — the q152 codegen-Generate lesson;
      // see TextDedup.bandCandidatePairs): same pair stream, no
      // interpreted lambda
      .select(col("ids"), posexplode(col("ids")))
      .select(col("col").as("vec_a"),
        explode(slice(col("ids"), col("pos") + lit(2),
          size(col("ids")))).as("vec_b"))
      .select(col("vec_a"), col("vec_b"))
      .distinct()
    cand
      .join(vs.select(col("vec_id"), col("v").as("va"), col("nrm").as("na")),
        col("vec_a") === col("vec_id")).drop("vec_id")
      .join(vs.select(col("vec_id"), col("v").as("vb"), col("nrm").as("nb")),
        col("vec_b") === col("vec_id")).drop("vec_id")
      .select(col("vec_a"), col("vec_b"),
        (dotD(col("va"), col("vb")) / (col("na") * col("nb"))).as("cosine"))
      .filter(col("cosine") >= minCosine)
  }

  /**
   * int8 scalar quantization — the memory side of the ANN scale story:
   * a 64-dim float32 embedding (256 B) becomes 64 int8 codes + one
   * float scale (~68 B), so a 100 TB embedding store serves from ~27 TB
   * and each scan/shuffle moves 4× fewer bytes; search then runs
   * entirely on the codes.
   *
   * Per-vector symmetric scheme: scale = 127 / max|xᵢ|, code =
   * ⌊xᵢ·scale⌋. FLOOR, not round-half-*: floor of an exactly-shared
   * double is identical in every engine, so the q66 oracle reproduces
   * codes bit-for-bit (round's half-tie rule is the classic cross-engine
   * trap). All-zero vectors get scale 1 (all-zero codes). Codes ride as
   * longs — the storage contract is "small exact integers", and Spark
   * has no int8 array narrower than binary.
   */
  def quantizeInt8(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    df.select(col(idCol), toDouble(col(vecCol)).as("v"))
      .select(col(idCol),
        when(array_max(transform(col("v"), x => abs(x))) > 0,
          lit(127.0) / array_max(transform(col("v"), x => abs(x))))
          .otherwise(lit(1.0)).as("scale"), col("v"))
      .select(col(idCol), col("scale"),
        transform(col("v"), x => floor(x * col("scale")).cast(LongType)).as("qv"))

  /**
   * Exact cosine top-k over int8-QUANTIZED vectors — [[knnBrute]] run on
   * the codes: integer dot products (exact at any summation order: every
   * partial sum of 64 products bounded by 127²·64 ≪ 2^53 stays
   * double-exact, so the native [[dotD]] applies unchanged), one double
   * division per pair. The quantization runs once at ingest (HOFs,
   * interpreted — build-side cost); the search hot loop is the codegen'd
   * native expression over 4×-smaller rows.
   */
  def quantizedTopK(base: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int = 5): DataFrame = {
    def prepared(df: DataFrame) =
      quantizeInt8(df, idCol, vecCol)
        .select(col(idCol), toDouble(col("qv")).as("qd"))
        .select(col(idCol), col("qd"), norm(col("qd")).as("nrm"))
    val b = prepared(ScanOps.spreadSmallInput(base, col(idCol)))
    val q = prepared(queries).select(
      col(idCol).as("query_id"), col("qd").as("qqd"), col("nrm").as("qn"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("qcosine").desc, col("neighbor_id"))
    b.join(broadcast(q), col(idCol) =!= col("query_id"))
      .select(col("query_id"), col(idCol).as("neighbor_id"),
        (dotD(col("qd"), col("qqd")) / (col("nrm") * col("qn"))).as("qcosine"))
      .withColumn("rnk", row_number().over(w).cast(LongType))
      .filter(col("rnk") <= k)
  }

  // --------------------------------------------------------------------
  // Product quantization (PQ) — Jégou et al. 2011, the fourth classic
  // ANN memory geometry beside brute/LSH/IVF: split each vector into
  // [[PqSubspaces]] subvectors, encode every subvector as its nearest
  // codeword from a per-subspace codebook (PqCodes entries), and answer
  // queries by Asymmetric Distance Computation — the query precomputes
  // its distance to every codeword once, and each corpus vector's
  // approximate distance is M table lookups + M-1 adds.
  // --------------------------------------------------------------------

  /** PQ geometry: 64 dims = 4 × 16, 16 codewords per subspace → a
    * 4-byte code per vector (16× smaller than int8, 64× than float32). */
  val PqSubspaces = 4
  val PqSubDim = 16
  val PqCodes = 16

  /** Subvector s (0-based) of a double-array column. */
  def pqSub(v: Column, s: Int): Column = slice(v, s * PqSubDim + 1, PqSubDim)

  /** CASE over the exploded `sub` column: the matching literal-index
    * subvector of `v` (a chained `when`, one arm per subspace). */
  private def bySub(v: Column): Column =
    (1 until PqSubspaces).foldLeft(when(col("sub") === 0, pqSub(v, 0))) {
      (acc, s) => acc.when(col("sub") === s, pqSub(v, s))
    }

  /** Squared L2 distance with the FIXED evaluation order both engines
    * reproduce: (dot(a,a) − 2·dot(a,b)) + dot(b,b). */
  def sqDist(a: Column, b: Column): Column =
    dotD(a, a) - lit(2.0) * dotD(a, b) + dotD(b, b)

  /**
   * Per-subspace codebooks from a deterministic scale-independent
   * sample (`codebookIds` rows, code = rank by id): production would
   * train each with [[trainCentroids]] — the training story is proven
   * by q43/q56; the sampling keeps the q87 oracle tractable.
   * Output: (sub, code, cv) — PqSubspaces × PqCodes rows.
   */
  def pqCodebooks(base: DataFrame, idCol: String, vecCol: String,
      codebookIds: Column): DataFrame = {
    val w = Window.orderBy(col(idCol))
    val seeds = base.filter(codebookIds)
      .select(col(idCol), toDouble(col(vecCol)).as("v"))
      .withColumn("code", row_number().over(w).cast(LongType) - 1)
      .filter(col("code") < PqCodes)
    seeds.select(col("code"),
        explode(typedlit((0 until PqSubspaces).toArray)).as("sub"),
        col("v"))
      .select(col("sub").cast(LongType).as("sub"), col("code"),
        bySub(col("v")).as("cv"))
  }

  /** Sub-exploded corpus: one (id, sub, 16-dim subvector) row per
    * vector × subspace — the frame both encoding and training consume. */
  private def pqSubRows(base: DataFrame, idCol: String,
      vecCol: String): DataFrame =
    base
      .select(col(idCol), toDouble(col(vecCol)).as("v"),
        explode(typedlit((0 until PqSubspaces).toArray)).as("sub"))
      .select(col(idCol), col("sub").cast(LongType).as("sub"),
        bySub(col("v")).as("sv"))

  /**
   * TRAIN the codebooks: per-subspace L2 k-means in the same
   * deterministic fixed-point discipline as [[trainCentroids]] (exact
   * long element sums at [[KmeansScale]], one double division per
   * element — bit-identical at any partitioning; the q90 oracle unrolls
   * the same iterations). Differences from the IVF trainer: the metric
   * is squared L2 ([[sqDist]], what PQ minimizes) rather than cosine,
   * and a codeword losing every assignment KEEPS its previous value
   * (coalesce) — PQ codes are positional indices, so the codebook must
   * never shrink.
   */
  def pqTrainCodebooks(base: DataFrame, idCol: String, vecCol: String,
      codebookIds: Column, iters: Int = 2): DataFrame = {
    import base.sparkSession.implicits._
    // r18 OPTIMIZATION (guide §1.2 — VERDICT r17 item 3, the seededCents
    // discipline): land the ≤ PqSubspaces×PqCodes codebook as a LOCAL
    // frame once per iteration (the BPE-trainer collect shape — it is a
    // model artifact). The lazy books_{i} chain referenced books_{i-1}
    // TWICE (the keep-old coalesce side and inside the next assignment),
    // so executing the final plan re-ran every earlier iteration's
    // corpus assignment pass ~2^i times; landed, each iteration's corpus
    // pass runs exactly once and the broadcast build costs no job.
    def land(df: DataFrame): DataFrame = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Double](2)))
      .toSeq.toDF("sub", "code", "cv")
    var books = land(pqCodebooks(base, idCol, vecCol, codebookIds))
    val subRows = pqSubRows(base, idCol, vecCol)
    for (_ <- 1 to iters) {
      // r18 OPTIMIZATION (guide §2.3 — the q43 keep-1 argmax shape): the
      // per-(vector, subspace) argmin over the ×PqCodes broadcast
      // fan-out is a map-side-combined min_by instead of a row_number
      // window — the fan-out collapses to one row per (id, sub) BEFORE
      // any exchange and nothing sorts on shuffle. The min_by key
      // struct(d2, code) is the window's orderBy exactly, and code is
      // unique per group, so the argmin is total and identical.
      val assigned = subRows.join(broadcast(books), Seq("sub"))
        .withColumn("d2", sqDist(col("sv"), col("cv")))
        .groupBy(col(idCol), col("sub"))
        .agg(min_by(struct(col("code"), col("sv")),
          struct(col("d2"), col("code"))).as("best"))
        .select(col("sub"), col("best.code").as("code"),
          col("best.sv").as("sv"))
      // exact integer element sums (floored fixed-point values are
      // integer-valued doubles — sums below 2^53 are order-exact)
      val dimSums = (0 until PqSubDim).map(j =>
        sum(floor(element_at(col("sv"), j + 1) * KmeansScale)).as(s"s$j"))
      val updated = assigned.groupBy(col("sub"), col("code"))
        .agg(dimSums.head, dimSums.tail :+ count(lit(1)).as("n"): _*)
        .select(col("sub"), col("code"),
          array((0 until PqSubDim).map(j =>
            col(s"s$j").cast(DoubleType) / (col("n") * KmeansScale)): _*)
            .as("ncv"))
      books = land(books.as("b")
        .join(updated.as("u"), Seq("sub", "code"), "left")
        .select(col("sub"), col("code"),
          coalesce(col("ncv"), col("b.cv")).as("cv")))
    }
    // books is already a landed local frame (one land per iteration) —
    // downstream consumers (encode join + query table) broadcast it at
    // zero recompute cost, same as the old single tail collect.
    books
  }

  /** Encode the corpus: nearest codeword per (vector, subspace) —
    * sub-exploded corpus equi-joined to the broadcast codebooks, argmin
    * via a map-side-combined `min(struct(dist, code))`, then the M
    * codes pivoted back to one row per vector. Only (id, M codes) come
    * out — the 16×-compressed representation that is PQ's point. */
  def pqEncode(base: DataFrame, idCol: String, vecCol: String,
      codebooks: DataFrame): DataFrame = {
    val subRows = pqSubRows(base, idCol, vecCol)
    val pivots = (0 until PqSubspaces).map(s =>
      max(when(col("sub") === s, col("best.code"))).as(s"c$s"))
    subRows.join(broadcast(codebooks), Seq("sub"))
      .groupBy(col(idCol), col("sub"))
      .agg(min(struct(sqDist(col("sv"), col("cv")).as("d"),
        col("code").as("code"))).as("best"))
      .groupBy(col(idCol))
      .agg(pivots.head, pivots.tail: _*)
  }

  /**
   * ADC top-k: each query turns the codebooks into ONE keyed distance
   * map (≤ PqSubspaces × PqCodes doubles keyed by sub·16+code), the
   * 5-query frame broadcasts against the encoded corpus, and the
   * approximate distance is M `element_at` lookups added LEFT TO RIGHT
   * (deterministic — a group-sum over subspaces would add in shuffle
   * order). The corpus side carries 4 small longs per row; nothing
   * vector-sized shuffles.
   */
  def pqTopK(base: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, codebookIds: Column, k: Int = 5): DataFrame =
    pqTopKWith(base, queries, idCol, vecCol,
      pqCodebooks(base, idCol, vecCol, codebookIds), k)

  /** [[pqTopK]] against caller-supplied codebooks (sampled or trained —
    * q87 vs q90). */
  def pqTopKWith(base: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, books: DataFrame, k: Int): DataFrame = {
    val codes = pqEncode(ScanOps.spreadSmallInput(base, col(idCol)),
      idCol, vecCol, books)
    val qsub = queries
      .select(col(idCol).as("query_id"), toDouble(col(vecCol)).as("qv"))
      .crossJoin(broadcast(books))
      .select(col("query_id"), col("sub"), col("code"),
        sqDist(bySub(col("qv")), col("cv")).as("d2"))
    // keyed map, NOT a positional array: a positional dar assumes a
    // DENSE PqSubspaces×PqCodes codebook — with fewer codes per
    // subspace (a sparse codebookIds match) position ≠ sub·16+code and
    // the lookups silently read another code's distance. The map is
    // exact under any density; keys are distinct by construction.
    val dtab = qsub.groupBy(col("query_id"))
      .agg(map_from_entries(collect_list(struct(
        (col("sub") * PqCodes + col("code")).cast(IntegerType).as("idx"),
        col("d2")))).as("dmap"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("adist"), col("neighbor_id"))
    codes.join(broadcast(dtab), col(idCol) =!= col("query_id"))
      .select(col("query_id"), col(idCol).as("neighbor_id"),
        (0 until PqSubspaces).map(s =>
          element_at(col("dmap"), (lit(s * PqCodes) + col(s"c$s"))
            .cast(IntegerType)))
          .reduce(_ + _).as("adist"))
      .withColumn("rnk", row_number().over(w).cast(LongType))
      .filter(col("rnk") <= k)
  }

  // --------------------------------------------------------------------
  // Maximal Marginal Relevance (Carbonell & Goldstein 1998) — the
  // diversity re-ranker between retrieval and a RAG/few-shot context
  // window: plain top-k hands the LLM k near-copies of the same
  // passage; MMR greedily picks the item maximizing
  //   λ·rel(q, c) − (1−λ)·max_{s ∈ selected} sim(c, s)
  // so each pick is relevant AND novel against what's already chosen.
  // --------------------------------------------------------------------

  /**
   * MMR over int8-quantized inner products, λ = 1/2. Two determinism
   * choices make the greedy walk hash-gateable cross-engine:
   *  - relevance and redundancy are RAW integer dot products of the
   *    [[quantizeInt8]] vectors (entries in [-127, 127], 64-dim dots
   *    bounded by ~10⁶ — exact in doubles, emitted as longs): scaled
   *    inner-product MMR, no float norm division anywhere;
   *  - λ = 1/2 clears the one fraction: argmax of λ·rel − (1−λ)·red is
   *    the argmax of rel − red in pure longs; ties break on vec_id.
   *
   * Scale shape: the FAN-OUT stage (score the corpus per query) is
   * q66's — corpus × broadcast-bounded queries, one window keeps the
   * top `candK` per query; everything after runs on the |queries|·candK
   * candidate frame: the candidate×candidate sim matrix is a self-join
   * on query_id (≤ candK² rows per query, candK caller-bounded — MMR
   * over an unbounded candidate set is quadratic BY DEFINITION, the cap
   * is the algorithm's own contract), and each of the `selectK` greedy
   * steps is an anti-join + max-aggregate + rank-1 window on that
   * bounded frame. selectK ≤ candK iterations build one lazy plan —
   * bounded depth, the q67 pure-lazy discipline.
   *
   * Output: (query_id, vec_id, step 1..selectK, rel, redundancy, mmr2)
   * — mmr2 = rel − redundancy = twice the λ=1/2 MMR score; step 1 has
   * redundancy 0 by definition. Fewer than selectK candidates emit
   * fewer steps (honest exhaustion, never a repeat).
   */
  def mmrRerank(base: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, candK: Int = 12, selectK: Int = 5): DataFrame = {
    require(selectK >= 1 && selectK <= candK,
      s"need 1 <= selectK <= candK, got selectK=$selectK candK=$candK")
    def prepared(df: DataFrame) = quantizeInt8(df, idCol, vecCol)
      .select(col(idCol), toDouble(col("qv")).as("qd"))
    val b = prepared(ScanOps.spreadSmallInput(base, col(idCol)))
    val q = prepared(queries)
      .select(col(idCol).as("query_id"), col("qd").as("qqd"))
    val relW = Window.partitionBy("query_id")
      .orderBy(col("rel").desc, col("vec_id"))
    val cand = b.join(broadcast(q), col(idCol) =!= col("query_id"))
      .select(col("query_id"), col(idCol).as("vec_id"), col("qd"),
        dotD(col("qd"), col("qqd")).cast(LongType).as("rel"))
      .withColumn("rn", row_number().over(relW))
      .filter(col("rn") <= candK)
      .drop("rn")
      .localCheckpoint(true)
    val sims = cand.select(col("query_id"), col("vec_id").as("sa"),
        col("qd").as("da"))
      .join(cand.select(col("query_id"), col("vec_id").as("sb"),
        col("qd").as("db")), Seq("query_id"))
      .filter(col("sa") =!= col("sb"))
      .select(col("query_id"), col("sa"), col("sb"),
        dotD(col("da"), col("db")).cast(LongType).as("sim"))
      .localCheckpoint(true)
    val scores = cand.select(col("query_id"), col("vec_id"), col("rel"))
    val mmrW = Window.partitionBy("query_id")
      .orderBy(col("mmr2").desc, col("vec_id"))
    // each step references `selected` TWICE (anti-join + redundancy
    // join): left lazy, the plan tree doubles per step — the same
    // 2^steps expansion the oracle's CTE chain hits without
    // MATERIALIZED. The per-step frame is ≤ |queries| rows, so an eager
    // localCheckpoint per step is a no-op cost that keeps the whole
    // walk linear (measured 6.8 s → ~1 s at sf0.1)
    var selected = scores
      .withColumn("redundancy", lit(0L))
      .withColumn("mmr2", col("rel"))
      .withColumn("rn", row_number().over(mmrW))
      .filter(col("rn") === 1)
      .select(col("query_id"), col("vec_id"), lit(1L).as("step"),
        col("rel"), col("redundancy"), col("mmr2"))
      .localCheckpoint(true)
    for (stepNo <- 2 to selectK) {
      val next = scores
        .join(selected.select(col("query_id"), col("vec_id")),
          Seq("query_id", "vec_id"), "left_anti")
        .join(sims.join(selected.select(col("query_id"),
            col("vec_id").as("sb")), Seq("query_id", "sb"))
          .groupBy(col("query_id"), col("sa").as("vec_id"))
          .agg(max(col("sim")).as("redundancy")),
          Seq("query_id", "vec_id"))
        .withColumn("mmr2", col("rel") - col("redundancy"))
        .withColumn("rn", row_number().over(mmrW))
        .filter(col("rn") === 1)
        .select(col("query_id"), col("vec_id"),
          lit(stepNo.toLong).as("step"), col("rel"), col("redundancy"),
          col("mmr2"))
      selected = selected.union(next).localCheckpoint(true)
    }
    selected
  }

  /**
   * Per-group embedding centroid drift — the representation-level
   * monitor "which source/label's vectors moved away from the corpus":
   * per group, the exact L1 distance between the group centroid and
   * the GLOBAL centroid in fixed-point units, plus the largest
   * single-dimension gap. The embedding counterpart of the q175
   * value-distribution TV drift — a source whose text distribution
   * looks stable can still drift in representation space (encoder
   * update, upstream preprocessing change), and this is the aggregate
   * that catches it.
   *
   * Exact lattice: elements quantize once to ⌊double(v)·2²⁰⌋ longs
   * (the q43 k-means discipline — float→double widening then one
   * IEEE multiply+floor, identical cross-engine); per-dim centroid
   * gaps evaluate in the common-denominator form
   * ⌊|s_g·n_all − s_all·n_g| / (n_g·n_all)⌋ on decimal128 — no float
   * means, no division until the final per-dim floor.
   *
   * Scale shape: ONE posexplode + map-side (group, dim) aggregate —
   * |groups|·dims rows leave the scan, vectors never shuffle; the
   * global centroid re-aggregates the tiny frame and broadcasts back.
   */
  def centroidDrift(df: DataFrame, groupCol: String,
      vecCol: String, scale: Long = KmeansScale.toLong): DataFrame = {
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val dims = df.select(col(groupCol).as("grp"),
        posexplode(col(vecCol)).as(Seq("dim0", "v")))
      .select(col("grp"), (col("dim0") + 1).as("dim"),
        floor(col("v").cast(DoubleType) * scale).cast(LongType).as("v_fp"))
    val byGrpDim = dims.groupBy(col("grp"), col("dim"))
      .agg(count(lit(1)).as("n_g"), sum(dec(col("v_fp"))).as("s_g"))
      .localCheckpoint(true)
    val global = byGrpDim.groupBy(col("dim"))
      .agg(sum(col("n_g")).as("n_all"), sum(col("s_g")).as("s_all"))
    byGrpDim
      .join(broadcast(global), "dim")
      .withColumn("qd",
        expr("abs(s_g * n_all - s_all * n_g) div " +
          "(cast(n_g as decimal(38,0)) * n_all)"))
      .groupBy(col("grp"))
      .agg(max(col("n_g")).as("n_vecs"),
        sum(col("qd")).as("l1_fp"),
        max(col("qd")).as("max_dim_fp"))
  }

  /**
   * Embedding-space benchmark decontamination — the semantic sibling
   * of the n-gram gate (`TextDedup.contaminationPairs`, q47): a
   * PARAPHRASED test item shares almost no 8-gram with its source but
   * sits at cosine ≈ 1 in embedding space, so a corpus release gate
   * needs both readouts. For every train vector, the maximum cosine
   * against the benchmark set (ties by bench id — deterministic
   * argmax); rows at or above `tau` are the contamination report
   * (train_id, bench_id, cosine). Benchmark members literally present
   * in train surface at cosine 1.0 — exact leakage is a special case,
   * not an exclusion.
   *
   * Scale shape: the benchmark is the BOUNDED broadcast side (a
   * benchmark suite is small by nature — the [[knnBrute]] query-set
   * contract); one linear corpus scan computes N·|bench| codegen'd
   * in-order dots, and the per-train argmax is a map-side-combinable
   * `max(struct(cosine, −bench_id))` hash aggregate (r13 verdict
   * advisory: the aggregate form shuffles ONE row per train id by
   * construction, with no reliance on the WindowGroupLimit rewrite
   * firing for a rank-1 filter), so only |train| rows reach the
   * exchange and only flagged rows ever leave the executors. The
   * negated id keeps the window form's tie rule — max cosine, then
   * SMALLEST bench id — as a struct ordering.
   */
  def decontaminateByEmbedding(train: DataFrame, bench: DataFrame,
      idCol: String, vecCol: String, tau: Double = 0.99): DataFrame = {
    val t = prepNormed(ScanOps.spreadSmallInput(train, col(idCol)),
      idCol, vecCol)
    val b = prepNormed(bench, idCol, vecCol).select(
      col(idCol).as("bench_id"), col("v").as("bv"), col("nrm").as("bn"))
    t.select(col(idCol).as("train_id"), col("v"), col("nrm"))
      .crossJoin(broadcast(b))
      .select(col("train_id"),
        struct(
          (dotD(col("v"), col("bv")) / (col("nrm") * col("bn")))
            .as("cosine"),
          (-col("bench_id")).as("nid")).as("cand"))
      .groupBy(col("train_id"))
      .agg(max(col("cand")).as("best"))
      .filter(col("best.cosine") >= tau)
      .select(col("train_id"), (-col("best.nid")).as("bench_id"),
        col("best.cosine").as("cosine"))
  }
}
