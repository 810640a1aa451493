package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Corpus-assembly operators for training-data pipelines: deterministic
 * stratified sampling (domain/language mixing) and context-window
 * sequence packing (builder brief; absent from the reference,
 * SURVEY §2.2 — these sit downstream of dedup/quality filtering in a
 * real data pipeline).
 *
 * Everything is built-in expression composition — no UDFs, no
 * randomness: sampling decisions derive from a content hash, so a re-run
 * on any cluster keeps EXACTLY the same documents (`rand()`-based
 * sampling is irreproducible and partitioning-dependent), and packing
 * derives from a windowed cumulative sum.
 */
object CorpusAssembly {

  /** Sampling-rate denominator: rates are expressed per-mille. */
  val RateDenominator = 1000

  /** Deterministic per-mille bucket of a content key: the md5-derived
    * 60-bit [[TextDedup.hash64]] mod 1000 — uniform, reproducible
    * cross-engine (the DuckDB oracle computes the identical bucket). */
  def hashBucket(key: Column): Column =
    pmod(TextDedup.hash64(key), lit(RateDenominator.toLong))

  /**
   * Stratified deterministic sample: keep a row iff its content-hash
   * bucket falls below its stratum's per-mille rate; strata absent from
   * `ratesPerMille` drop entirely. Per-row filter — shuffle-free,
   * codegen'd, scan-speed at 100 TB — and NESTED by construction: the
   * rate-250 sample is a subset of the rate-500 sample of the same
   * corpus, so a mix can be dialed down without resampling the world.
   */
  def stratifiedSample(df: DataFrame, keyCol: String, strataCol: String,
      ratesPerMille: Map[String, Int]): DataFrame = {
    require(ratesPerMille.values.forall(r => r >= 0 && r <= RateDenominator),
      s"rates must be in [0, $RateDenominator]: $ratesPerMille")
    // deterministic CASE order (sorted keys): rates are disjoint equality
    // arms, but a stable expression keeps plans reusable across calls
    val rate = ratesPerMille.toSeq.sortBy(_._1).foldLeft(lit(0)) {
      case (els, (s, r)) => when(col(strataCol) === s, lit(r)).otherwise(els)
    }
    df.withColumn("hash_bucket", hashBucket(col(keyCol)))
      .filter(col("hash_bucket") < rate)
  }

  /** Split-fraction geometry for [[hashSplitAudit]]: buckets 0–97 train,
    * 98 val, 99 test (the conventional 98/1/1). */
  val SplitBuckets = 100L
  val ValBucket = 98L

  /**
   * Deterministic train/val/test assignment + leakage audit — the split
   * discipline of an LLM data pipeline, and the audit that catches its
   * classic failure. Two schemes are computed side by side over the same
   * corpus:
   *
   *  - `content`: bucket by the content hash. Identical documents land
   *    in the SAME split by construction, so evaluation rows can never
   *    be training-set memorization — this is the correct scheme.
   *  - `docid`: bucket by the document id — the naive scheme. Re-ingested
   *    duplicates carry fresh ids, so copies of one text straddle
   *    splits and `leaky_groups` counts exactly how many contents leak
   *    across a split boundary.
   *
   * Output: one row per (scheme, split) with doc/char counts, plus the
   * scheme's `leaky_groups` — content-hash groups present in ≥2 splits
   * (0 for `content` BY CONSTRUCTION; the audit proves it, the docid
   * rows show the counterfactual).
   *
   * Scale shape: assignment is a per-row hash — shuffle-free, nested and
   * reproducible like [[stratifiedSample]] (a re-run, a backfill, and a
   * second cluster all agree). The audit shuffles (scheme, content_hash)
   * once; the per-split rollup and the ≤2-row leak table are broadcast
   * territory.
   */
  def hashSplitAudit(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val b = df.select(col(idCol).cast("string").as("id"),
      TextDedup.hash64(col(textCol)).as("content_hash"),
      length(col(textCol)).cast("long").as("n_chars"))
    val schemes = b.select(
        explode(array(
          struct(lit("content").as("scheme"),
            pmod(col("content_hash"), lit(SplitBuckets)).as("bucket")),
          struct(lit("docid").as("scheme"),
            pmod(TextDedup.hash64(col("id")), lit(SplitBuckets)).as("bucket"))))
          .as("s"),
        col("content_hash"), col("n_chars"))
      .select(col("s.scheme").as("scheme"),
        when(col("s.bucket") < ValBucket, "train")
          .when(col("s.bucket") === ValBucket, "val")
          .otherwise("test").as("split"),
        col("content_hash"), col("n_chars"))
    val perSplit = schemes.groupBy("scheme", "split")
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").cast("long").as("n_chars"))
    val leaks = schemes
      .groupBy("scheme", "content_hash")
      .agg(countDistinct("split").as("ns"))
      .groupBy("scheme")
      .agg(sum(when(col("ns") >= 2, 1L).otherwise(0L)).as("leaky_groups"))
    perSplit.join(broadcast(leaks), Seq("scheme"))
      .select(col("scheme"), col("split"), col("n_docs"), col("n_chars"),
        col("leaky_groups"))
  }

  /**
   * Next-fit context-window packing: documents ordered by `idCol` within
   * a shard fill training sequences ("bins") of `budget` tokens; a
   * document lands in the bin where its cumulative span STARTS
   * (`bin = floor(tokens_before / budget)`), so bins can overflow by at
   * most one document — the standard greedy packing used to assemble
   * LLM context windows without splitting documents.
   *
   * Scale shape: the window is PARTITIONED BY `shardCol`, so each shard
   * sorts and packs independently — at 100 TB the sort never becomes a
   * single-partition global order-by; shards map 1:1 to the corpus's
   * natural write units (source file, date, bucket). Output adds
   * (cum_before, bin) to the input rows.
   */
  def packBins(df: DataFrame, idCol: String, tokenCol: String,
      shardCol: String, budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val w = Window.partitionBy(shardCol).orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("cum_before", coalesce(sum(col(tokenCol)).over(w), lit(0L)))
      // exact for cum < 2^53; floor-div matches the oracle's
      // floor(CAST ... AS DOUBLE) form bit-for-bit
      .withColumn("bin",
        floor(col("cum_before").cast(DoubleType) / lit(budget.toDouble))
          .cast(LongType))
  }

  /** Per-bin packing summary over a [[packBins]] frame. */
  def binStats(packed: DataFrame, shardCol: String, tokenCol: String,
      idCol: String): DataFrame =
    packed.groupBy(col(shardCol), col("bin"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col(tokenCol)).as("tokens_packed"),
        min(col(idCol)).as("first_doc"),
        max(col(idCol)).as("last_doc"))

  /**
   * Deterministic IMPORTANCE sampling: keep a row iff its content-hash
   * per-mille bucket falls under `weightPerMille` — a per-ROW integral
   * rate column (0..1000), where [[stratifiedSample]] takes one rate per
   * stratum. This is how a corpus mix upweights by a quality SCORE
   * rather than a label: rate = f(quality), still hash-keyed, so the
   * sample stays exactly reproducible, partition-independent, and
   * monotone (raising a row's weight can only ADD it, never swap the
   * rest — the property rate-based `rand()` sampling cannot give).
   * Same per-row filter-at-scan-speed shape as the stratified variant.
   */
  def weightedSample(df: DataFrame, keyCol: String,
      weightPerMille: Column): DataFrame =
    df.withColumn("hash_bucket", hashBucket(col(keyCol)))
      .withColumn("rate_pm",
        least(greatest(weightPerMille.cast("long"), lit(0L)),
          lit(RateDenominator.toLong)))
      .filter(col("hash_bucket") < col("rate_pm"))

  /** Mixture-weight scale: weights are expressed in parts-per-million. */
  val WeightScale = 1000000L

  /**
   * Temperature-scaled corpus-mixture weights: each stratum (source,
   * language, domain) gets sampling weight ∝ n^(1/2) of its document
   * count, normalized to ppm, plus its document budget under
   * `targetTotal` — the standard α-temperature mix (α = 0.5) that
   * upweights small sources relative to proportional sampling without
   * letting any source dominate (α = 1 is proportional, α = 0 uniform).
   *
   * Integer-exact: n^(1/2) is `floor(sqrt(n))` — IEEE sqrt of a small
   * integer is correctly rounded in every engine, and the floor lands
   * it back on an exact long — and normalization is long floor-division,
   * so weights are bit-reproducible cross-engine (a float `pow(n, α)`
   * pipeline is a last-ulp lottery; generalizing α to other rationals
   * means iterated isqrt, e.g. α = 0.25 = isqrt∘isqrt).
   *
   * Plan shape: one map-side-combined count per stratum (|strata| rows),
   * then a 1-row total broadcast by cross join — the corpus is read
   * once, nothing but the counts ever shuffles. The output feeds
   * [[stratifiedSample]]'s per-mille rates (floor-div ppm → pm) to
   * actually draw the mix.
   */
  def mixtureWeights(df: DataFrame, strataCol: String,
      targetTotal: Long): DataFrame = {
    require(targetTotal >= 0, s"targetTotal must be >= 0, got $targetTotal")
    val counts = df.groupBy(col(strataCol))
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("w_raw", floor(sqrt(col("n_docs").cast(DoubleType)))
        .cast(LongType))
    val total = counts.agg(sum(col("w_raw")).as("w_total"))
    counts.crossJoin(broadcast(total))
      .withColumn("weight_ppm", expr(s"(w_raw * $WeightScale) div w_total"))
      .withColumn("target_docs",
        expr(s"(weight_ppm * $targetTotal) div $WeightScale"))
      .drop("w_total")
  }

  /**
   * Sliding-window document chunking: split each document into
   * `size`-char windows starting every `stride` chars (overlap =
   * size − stride), the standard long-document splitter feeding a
   * fixed-context tokenizer. Chunk starts are generated only while they
   * land inside the text, so the last chunk may run short; empty
   * documents produce no chunks.
   *
   * Pure per-row Generate (sequence → explode → substr) — no shuffle,
   * no state, scan-speed at 100 TB; output carries (chunk_ix,
   * chunk_start, chunk_len, chunk_md5) so a gate can verify every
   * emitted byte without re-reading the parent document.
   */
  def chunkDocs(df: DataFrame, idCol: String, textCol: String,
      size: Int, stride: Int): DataFrame = {
    require(size > 0 && stride > 0 && stride <= size,
      s"need 0 < stride <= size, got size=$size stride=$stride")
    val chunk = col(textCol).substr(col("chunk_start").cast(IntegerType) + 1,
      lit(size))
    df.filter(length(col(textCol)) > 0)
      .select(col(idCol), col(textCol),
        explode(sequence(lit(0L), length(col(textCol)).cast(LongType) - 1,
          lit(stride.toLong))).as("chunk_start"))
      .select(col(idCol),
        expr(s"chunk_start div $stride").as("chunk_ix"),
        col("chunk_start"),
        length(chunk).cast(LongType).as("chunk_len"),
        md5(chunk.cast(BinaryType)).as("chunk_md5"))
  }

  /** [[curriculumOrder]] hash-bucket geometry: hash64 is 15 hex chars =
    * 60 bits, so bucket = h div (2^60/nBuckets) preserves hash order
    * across bucket boundaries (a modulo bucket would not). */
  val HashBits = 60

  /**
   * Deterministic curriculum ordering — the exact global training order
   * (tier asc, then pseudo-random within tier) WITHOUT a global sort.
   * Training pipelines need both halves: curriculum staging (easy→hard,
   * or clean→noisy tiers) and a reproducible shuffle inside each tier
   * (hash order, so the permutation is a pure function of the data, not
   * of partitioning or cluster size).
   *
   * The global ordinal is computed two-level, the way a distributed
   * sort's range partitioner would, but exact and shuffle-light:
   *  1. rows get (tier, bucket) where bucket is the TOP bits of the
   *     60-bit content hash — bucket order IS hash-prefix order, so
   *     (tier, bucket, hash, id) sorts identically to (tier, hash, id);
   *  2. a (tier, bucket) count table (tiny: tiers × nBuckets rows)
   *     gets running-sum offsets — the only global window, over the
   *     count table, never over data;
   *  3. offsets broadcast back; ordinal = offset + per-chunk rank,
   *     ranked inside each (tier, bucket) partition independently.
   * Equal hashes tie-break by id; equal hashes always share a bucket,
   * so the per-chunk rank sees every tie. The oracle cross-checks with
   * the single-ORDER-BY formulation — agreement proves the two-level
   * decomposition, not just the arithmetic.
   */
  def curriculumOrder(df: DataFrame, idCol: String, tierCol: String,
      keyCol: String, nBuckets: Int): DataFrame = {
    require(nBuckets > 0 && nBuckets <= (1 << 20), s"nBuckets: $nBuckets")
    import org.apache.spark.sql.expressions.Window
    val width = (1L << HashBits) / nBuckets
    // boundary discipline (changeStream's rule): a NULL key cannot be
    // hashed into the order — dropped HERE, visibly, rather than
    // silently vanishing at the null-bucket equi-join below
    val hashed = df.filter(col(keyCol).isNotNull)
      .select(col(idCol), col(tierCol).as("tier"),
        TextDedup.hash64(col(keyCol)).as("h"))
      .withColumn("bucket", expr(s"h div $width"))
    val offsets = hashed.groupBy("tier", "bucket")
      .agg(count(lit(1)).as("n"))
      .withColumn("offset",
        coalesce(sum("n").over(Window.orderBy("tier", "bucket")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("tier").as("o_tier"), col("bucket").as("o_bucket"),
        col("offset"))
    hashed
      .join(broadcast(offsets),
        col("tier") === col("o_tier") && col("bucket") === col("o_bucket"))
      .withColumn("ordinal",
        col("offset") + row_number().over(
          Window.partitionBy("tier", "bucket")
            .orderBy(col("h"), col(idCol))) - 1L)
      .select(col(idCol), col("tier"), col("h"), col("ordinal"))
  }

  /**
   * Neyman-allocation stratified sampling — the survey-statistics
   * optimum the uniform stratified sampler (q46/q74) leaves on the
   * table: for a fixed budget K, variance of the estimated total is
   * minimized by sampling each stratum ∝ N_h·σ_h (big AND volatile
   * strata deserve more budget; a constant stratum needs almost none).
   * The per-stratum σ comes from the exact decimal128 co-moment
   * n·Σx² − (Σx)² = n²·Var — whose square root is exactly n·σ, so the
   * Neyman weight N_h·σ_h IS that single square root, no division.
   * The sqrt is the one float: both engines take it on the identical
   * correctly-rounded double of the same exact decimal, so the floored
   * result matches bit-for-bit (the q98 corr discipline). Zero-variance
   * strata keep a 1-unit floor weight — presence, not absence, is the
   * conservative failure mode for a stratum the optimum would starve.
   *
   * Allocation integers come from [[StatsOps.prorateLargestRemainder]]
   * (shares sum EXACTLY to K), and the draw is the q74 rank-by-md5
   * reservoir — reproducible across engines, partitionings and reruns,
   * no RNG state. Three small keyed shuffles; the only corpus-sized
   * work is the moment scan and the rank window.
   */
  def neymanStratifiedSample(df: DataFrame, stratumCol: String,
      idCol: String, valueCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val moments = df.groupBy(col(stratumCol))
      .agg(count(lit(1)).as("n_h"),
        sum(dec(col(valueCol))).as("sv"),
        sum(dec(col(valueCol)) * dec(col(valueCol))).as("svv"))
      .withColumn("varnum", dec(col("n_h")) * col("svv") - col("sv") * col("sv"))
      .withColumn("neyman_w",
        greatest(floor(sqrt(col("varnum").cast("double"))).cast("long"),
          lit(1L)))
      .withColumn("pool", lit("all"))
    val alloc = StatsOps.prorateLargestRemainder(
        moments.select(col("pool"), col(stratumCol), col("neyman_w")),
        "pool", stratumCol, "neyman_w", k)
      .select(col(stratumCol), col("neyman_w"), col("alloc"))
    val byStratum = Window.partitionBy(col(stratumCol))
      .orderBy(col("hk"), col(idCol))
    df.select(col(stratumCol), col(idCol), col(valueCol),
        md5(col(idCol).cast("string").cast("binary")).as("hk"))
      .join(broadcast(alloc), Seq(stratumCol))
      .withColumn("rk", row_number().over(byStratum).cast("long"))
      .filter(col("rk") <= col("alloc"))
      .select(col(stratumCol), col(idCol), col(valueCol), col("rk"),
        col("alloc"), col("neyman_w"))
  }

  /**
   * Weighted sampling WITHOUT replacement, k per stratum — the
   * Efraimidis–Spirakis A-ES scheme (Inf. Process. Lett. 97(5), 2006)
   * in a fully DETERMINISTIC integer variant: the sampling mode the
   * assembly stack lacked (q89's per-row rates are with-replacement-
   * style; q74/q168 draw uniformly within strata). A-ES: each item
   * takes key uᵢ^(1/wᵢ) (u uniform) and the k LARGEST keys are exactly
   * a weighted draw without replacement. Equivalently the k SMALLEST
   * of −ln(uᵢ)/wᵢ — and since ln = log2·ln2 and constants cancel in
   * ranking, −log2(uᵢ)/wᵢ ranks identically.
   *
   * Determinism lattice (no RNG state, no floats): uᵢ = mᵢ/2⁶⁰ with
   * mᵢ = 60-bit md5 integer of the id + 1 (the q74 reservoir hash,
   * parsed to int); −log2(uᵢ) = (60≪20) − log2_q20(mᵢ) on the DEFINED
   * 31-bit shift-square lattice ([[graft.functions.FixedLog]], native
   * codegen'd expression); key = (L≪36) div w — L < 2²⁶ keeps the
   * shifted numerator inside int64 for ANY positive weight, and Q36
   * quantization ties break by id. Both engines run the identical
   * integer algorithm (DuckDB: 20-step recursive CTE on BIGINT), so
   * the SAMPLE ITSELF hash-gates — not just its size.
   *
   * Rows with w ≤ 0 or null are dropped (a non-positive weight has no
   * inclusion probability); strata smaller than k return whole.
   *
   * Scale shape: per-row hash + O(20) integer steps inside whole-stage
   * codegen, then ONE per-stratum rank window — WindowGroupLimit
   * prunes to k per group map-side before the shuffle, so only
   * ~k·|strata| rows ever move (the q74 shape with a weighted key).
   */
  def weightedSampleNoReplacement(df: DataFrame, stratumCol: String,
      idCol: String, weightCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    import org.apache.spark.sql.graft.Bridge
    import graft.functions.Log2Q20
    val m = conv(substring(
        md5(col(idCol).cast("string").cast("binary")), 1, 15), 16, 10)
      .cast("long") + 1L
    val lg = Bridge.column(Log2Q20(Bridge.expression(m)))
    val byKey = Window.partitionBy(col(stratumCol))
      .orderBy(col("aes_key"), col(idCol))
    df.filter(col(weightCol) > 0)
      .withColumn("aes_key", Bridge.column(
        new org.apache.spark.sql.catalyst.expressions.IntegralDivide(
          Bridge.expression((lit(60L) * (1L << 20) - lg) * (1L << 36)),
          Bridge.expression(col(weightCol)))))
      .withColumn("rk", row_number().over(byKey).cast("long"))
      .filter(col("rk") <= k)
      .select(col(stratumCol), col("rk"), col(idCol), col(weightCol),
        col("aes_key"))
  }

  /**
   * GROUP-AWARE train/val/test split — the leakage-safe assignment
   * every supervised pipeline needs: splitting ROWS at random leaks
   * whenever multiple rows share an entity (a user's events in train
   * and test lets the model memorize the user, q112's audit finds
   * exactly this), so the split key must be the GROUP: every row
   * inherits its group's deterministic md5 band, and no group can span
   * splits BY CONSTRUCTION — the property holds at any scale, any
   * partitioning, any rerun, with zero coordination.
   *
   * `splits` are (name, ppm) fractions summing to exactly 10⁶; a group
   * lands in the split whose cumulative band contains
   * hash64(group) mod 10⁶. Per-row work is one hash + one band lookup
   * (map-side, shuffle-free); the assignment column appends to the
   * input unchanged.
   */
  def groupSplit(df: DataFrame, groupCol: String,
      splits: Seq[(String, Long)]): DataFrame = {
    require(splits.nonEmpty && splits.forall(_._2 > 0) &&
      splits.map(_._2).sum == 1000000L,
      s"split ppm fractions must be positive and sum to 1e6: $splits")
    val band = TextDedup.hash64(col(groupCol).cast("string")) % 1000000L
    val bounds = splits.scanLeft(0L)(_ + _._2).tail
    val assign = splits.zip(bounds).init.foldRight(
      lit(splits.last._1)) { case (((name, _), hi), rest) =>
      when(band < hi, name).otherwise(rest)
    }
    df.withColumn("split", assign)
  }

  /**
   * Length-bucketed batching plan — the padding-waste killer of LLM
   * training: batching documents of wildly different lengths pads every
   * sequence to the batch max, so the standard move is to bucket by
   * length CLASS (here the token count's power-of-two class — fixed,
   * scale-free boundaries), shuffle deterministically WITHIN a bucket
   * (the md5 per-mille bucket of the content key — reproducible, not a
   * seed lottery), and cut fixed-size batches in that order. Output is
   * one row per batch with its fill stats and the padding waste the
   * plan actually buys: pad_ppm = (n·max − Σtok)/(n·max) — near 0
   * inside narrow buckets, the whole point of the operator.
   *
   * Scale shape: the within-bucket order is (hash, id), and the rank
   * that cuts batches is computed DISTRIBUTED — the
   * [[graft.operators.StatsOps.bucketPrefixOffsets]] discipline
   * specialized to the known hash range: per-mille hash div 16 gives
   * ~63 aligned sub-buckets per length class, ranks come from a window
   * per (class, sub) plus an exclusive prefix offset off the tiny
   * (class × sub) count table (triangular broadcast join) — no
   * single-partition window at any scale. Batch stats are one keyed
   * aggregate.
   */
  /**
   * Token-budget mixture planner — the operator that turns a mixture
   * DESIGN into an achievable PLAN: given each source's available
   * token mass, per-source target weights, and a total token budget,
   * compute what can actually be sampled. Targets are the defined
   * floor split target_i = (T·w_i) div ΣW; sources short of their
   * target cap at availability, and the resulting deficit
   * redistributes in ONE documented round to the uncapped sources
   * proportionally to their remaining capacity (floor — the ≤|sources|
   * undistributed residue is the price of exactness, visible as
   * Σplanned < T, never hidden by re-looping to a fixed point). This
   * is the planning half q94's temperature-scaled mixtureWeights
   * assumes away: WEIGHTS say what you want, this says what the corpus
   * can give and at what per-source sampling rate.
   *
   * Scale shape: one map-side token aggregate to the |sources| frame;
   * everything after is |sources|-row arithmetic against three 1-row
   * scalar broadcasts (total, deficit, remaining capacity). The rate
   * column feeds stratifiedSample directly.
   */
  def mixturePlan(avail: DataFrame, srcCol: String, availCol: String,
      weightCol: String, budgetNum: Long, budgetDen: Long): DataFrame = {
    require(budgetNum >= 0 && budgetDen > 0)
    val base = avail.select(col(srcCol).as("src"),
      col(availCol).cast("long").as("avail_tok"),
      col(weightCol).cast("long").as("w"))
    val tot = base.agg(sum(col("avail_tok")).cast("long").as("total_tok"),
      sum(col("w")).cast("long").as("ws"))
    val planned0 = base.crossJoin(broadcast(tot))
      .withColumn("t_budget",
        expr(s"(cast(total_tok as decimal(38,0)) * $budgetNum) div " +
          s"$budgetDen"))
      .withColumn("target_tok",
        expr("cast((t_budget * w) div ws as bigint)"))
      .withColumn("planned0", least(col("avail_tok"), col("target_tok")))
      .withColumn("rem", col("avail_tok") - col("planned0"))
    val scal = planned0
      .agg(sum(col("target_tok") - col("planned0")).cast("long").as("d"),
        sum(col("rem")).cast("long").as("r"))
    planned0.crossJoin(broadcast(scal))
      .withColumn("extra_tok", when(col("r") > 0,
        least(col("rem"),
          expr("cast((cast(d as decimal(38,0)) * rem) div r as bigint)")))
        .otherwise(0L))
      .withColumn("planned_tok", col("planned0") + col("extra_tok"))
      .select(col("src"), col("w"), col("avail_tok"), col("target_tok"),
        (col("avail_tok") < col("target_tok")).as("capped"),
        col("extra_tok"), col("planned_tok"),
        when(col("avail_tok") > 0,
          expr("cast((1000000 * cast(planned_tok as decimal(38,0))) " +
            "div avail_tok as bigint)")).as("rate_ppm"))
  }

  /**
   * Epoch/repeat planner — [[mixturePlan]]'s OVER-budget complement
   * (Muennighoff et al., Scaling Data-Constrained Language Models:
   * past ~4 epochs, repeated tokens stop buying loss, so a repeat
   * plan needs a cap and an honest unmet-budget readout): given
   * per-source availability, weights and a budget LARGER than the
   * corpus, how many times does each source repeat? target_i =
   * (T·w_i) div ΣW (the q223 floor rule), epochs land milli-exact as
   *   e_i = min(maxEpochsMilli, (1000·target_i) div avail_i),
   * planned_i = (avail_i·e_i) div 1000, and the unmet remainder
   * (target − planned) is EMITTED, never silently refit — the cap is
   * a data-constraint fact the caller must see, not an allocation
   * residue to hide. unmet_tok is DOMINATED by the cap where it binds
   * (at_cap rows carry target − avail·maxEpochs/1000); elsewhere it is
   * only the milli-floor residue of e_i — strictly less than
   * avail_i/1000 tokens — so at_cap=false rows may still read a small
   * positive unmet_tok. Zero-availability sources emit epochs 0 and
   * their full target unmet.
   *
   * Output: (src, w, avail_tok, target_tok, epochs_milli, at_cap,
   * planned_tok, unmet_tok).
   *
   * Scale shape: |sources|-row arithmetic against one 1-row totals
   * broadcast — the avail frame is the corpus-sized aggregate, built
   * upstream once.
   */
  def epochPlan(avail: DataFrame, srcCol: String, availCol: String,
      weightCol: String, budgetNum: Long, budgetDen: Long,
      maxEpochsMilli: Long = 4000L): DataFrame = {
    require(budgetNum >= 0 && budgetDen > 0 && maxEpochsMilli > 0)
    val base = avail.select(col(srcCol).as("src"),
      col(availCol).cast("long").as("avail_tok"),
      col(weightCol).cast("long").as("w"))
    val tot = base.agg(sum(col("avail_tok")).cast("long").as("total_tok"),
      sum(col("w")).cast("long").as("ws"))
    base.crossJoin(broadcast(tot))
      .withColumn("target_tok", expr(
        s"""cast(((cast(total_tok as decimal(38,0)) * $budgetNum)
             div $budgetDen * w) div ws as bigint)"""))
      .withColumn("epochs_milli",
        when(col("avail_tok") > 0, least(lit(maxEpochsMilli),
          expr("(1000 * target_tok) div avail_tok"))).otherwise(0L))
      .withColumn("planned_tok", expr(
        "cast((cast(avail_tok as decimal(38,0)) * epochs_milli)" +
          " div 1000 as bigint)"))
      .select(col("src"), col("w"), col("avail_tok"), col("target_tok"),
        col("epochs_milli"),
        (col("epochs_milli") === maxEpochsMilli).as("at_cap"),
        col("planned_tok"),
        (col("target_tok") - col("planned_tok")).as("unmet_tok"))
  }

  /**
   * Mixture diversity readout — Shannon entropy (exact Q20 log2 units)
   * and evenness of a corpus mix, for BOTH the availability
   * distribution and a planned one side by side: the one-number answer
   * to "did the sampling plan actually diversify the corpus, or did
   * the budget collapse it onto two sources?". H = Σ xᵢ(log₂T − log₂xᵢ)
   * / T on the defined lattice (zero-mass sources contribute exactly
   * 0·log0 = 0 and are counted, not dropped silently); evenness is
   * H / log₂n in ppm — 10⁶ = perfectly even mix, and the comparison
   * column pair makes the plan's diversity COST visible (a weighted
   * plan is legitimately less even than uniform availability).
   *
   * Scale shape: the input is already the |sources| plan frame
   * (q223's output or any (source, tokens) rollup); everything here is
   * |sources|-row arithmetic plus one 1-row totals broadcast.
   */
  def mixtureDiversity(plan: DataFrame, srcCol: String,
      availCol: String, plannedCol: String): DataFrame = {
    import org.apache.spark.sql.graft.Bridge
    import graft.functions.Log2Q20
    def lg(c: Column): Column =
      Bridge.column(Log2Q20(Bridge.expression(c.cast(LongType))))
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val base = plan.select(col(srcCol).as("src"),
      col(availCol).cast(LongType).as("a"),
      col(plannedCol).cast(LongType).as("p"))
    val tot = base.agg(sum(col("a")).cast(LongType).as("ta"),
      sum(col("p")).cast(LongType).as("tp"),
      count(lit(1)).as("n"),
      sum(when(col("p") === 0, 1L).otherwise(0L)).as("n_zero"))
    base.crossJoin(broadcast(tot))
      .select(col("n"), col("n_zero"), col("ta"), col("tp"),
        when(col("a") > 0, dec(col("a")) * (lg(col("ta")) - lg(col("a"))))
          .otherwise(lit(0)).as("ha"),
        when(col("p") > 0, dec(col("p")) * (lg(col("tp")) - lg(col("p"))))
          .otherwise(lit(0)).as("hp"),
        lg(col("n")).as("lgn"))
      .groupBy(col("n"), col("n_zero"), col("ta"), col("tp"), col("lgn"))
      .agg(sum(col("ha")).as("sha"), sum(col("hp")).as("shp"))
      .select(col("n").as("n_sources"), col("n_zero").as("n_zero_planned"),
        expr("cast(sha div ta as bigint)").as("h_avail_q20"),
        expr("cast(shp div tp as bigint)").as("h_planned_q20"),
        expr("cast((1000000 * (sha div ta)) div lgn as bigint)")
          .as("evenness_avail_ppm"),
        expr("cast((1000000 * (shp div tp)) div lgn as bigint)")
          .as("evenness_planned_ppm"))
  }

  def lengthBucketBatches(df: DataFrame, idCol: String, textCol: String,
      batchSize: Int): DataFrame = {
    require(batchSize >= 1, s"batchSize must be >= 1, got $batchSize")
    val sub = 16L // per-mille hash range per sub-bucket (~63 sub-buckets)
    val rows = df.select(col(idCol).as("id"),
        TextAnalysis.wsTokenCount(col(textCol)).as("tok"),
        hashBucket(col(textCol)).as("h"))
      .withColumn("cls", length(expr("bin(greatest(tok, 1))")))
      .withColumn("sb", expr(s"h div $sub"))
    val counts = rows.groupBy(col("cls"), col("sb"))
      .agg(count(lit(1)).as("cn"))
    val offsets = counts
      .join(broadcast(counts.select(col("cls").as("cls2"),
          col("sb").as("sb2"), col("cn").as("cn2"))),
        col("cls2") === col("cls") && col("sb2") < col("sb"), "left")
      .groupBy(col("cls"), col("sb"))
      .agg(coalesce(sum(col("cn2")), lit(0L)).as("off"))
    val w = Window.partitionBy("cls", "sb").orderBy("h", "id")
    rows
      .join(broadcast(offsets), Seq("cls", "sb"))
      .withColumn("rank", col("off") + row_number().over(w))
      .withColumn("batch", expr(s"(rank - 1) div $batchSize"))
      .groupBy(col("cls"), col("batch"))
      .agg(count(lit(1)).as("n_docs"), max(col("tok")).as("max_tok"),
        sum(col("tok")).as("sum_tok"))
      .select(col("cls").cast("long").as("cls"), col("batch"),
        col("n_docs"), col("max_tok"), col("sum_tok"),
        expr("(1000000 * (n_docs * max_tok - sum_tok)) div " +
          "(n_docs * max_tok)").as("pad_ppm"))
  }
}
