package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import graft.SparkSuite
import graft.queries.Tables

/** Semantic + plan properties of the vector-search operators beyond the
  * oracle gate (q25/q26). */
class VectorSearchSpec extends SparkSuite {

  private def emb = Tables.embeddings(spark, sf("0.01"))

  test("knnBrute: nearest neighbor of a seeded near-identical mutant is its original") {
    val orig = emb.select(col("vec_id"), col("embedding"))
    val mut = emb.filter(col("vec_id") % 100 === 0)
      .select((col("vec_id") + 100000).as("vec_id"),
        transform(col("embedding"), (x, i) =>
          (x.cast(DoubleType) * (lit(1.0) + lit(0.002) * (i % 2).cast(DoubleType)))
            .cast("float")).as("embedding"))
    val top1 = VectorSearch.knnBrute(orig.union(mut), mut, "vec_id", "embedding", k = 1)
    val rows = top1.collect()
    assert(rows.length === 5)
    assert(rows.forall(r => r.getAs[Long]("neighbor_id") === r.getAs[Long]("query_id") - 100000))
    assert(rows.forall(_.getAs[Double]("cosine") > 0.999))
  }

  test("cosine is exactly 1.0 on identical vectors and symmetric-bounded") {
    import spark.implicits._
    val df = Seq((1L, Seq(0.6f, 0.8f)), (2L, Seq(0.6f, 0.8f)), (3L, Seq(-0.8f, 0.6f)))
      .toDF("vec_id", "embedding")
    val scored = VectorSearch.knnBrute(df, df.filter($"vec_id" === 1), "vec_id", "embedding", k = 2)
      .orderBy("rnk").collect()
    // identical vector: 1.0 up to one ulp (sqrt of the squared norm rounds)
    assert(math.abs(scored(0).getAs[Double]("cosine") - 1.0) < 1e-12)
    assert(math.abs(scored(1).getAs[Double]("cosine")) < 1e-12) // orthogonal
  }

  test("LSH bucketed pairs plan: equality join on bucket, no cartesian product") {
    val vs = emb.select(col("vec_id"), VectorSearch.toDouble(col("embedding")).as("v"))
    val plan = VectorSearch.bucketedNearDupPairs(vs, "vec_id", 0.99)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("band values distribute the corpus across each band's bucket space") {
    val vs = emb.select(VectorSearch.toDouble(col("embedding")).as("v"))
      .select(VectorSearch.bandValues(col("v")).as("bvals"))
    for (b <- 0 until VectorSearch.VecBands) {
      val n = vs.select(countDistinct(element_at(col("bvals"), b + 1))).head().getLong(0)
      // 500 random vectors over 8 sign bits per band: most of 256 buckets hit
      assert(n > 100, s"band $b: only $n distinct buckets")
    }
  }

  test("banded LSH recall: finds every exact near-duplicate pair (mutant set)") {
    val orig = emb.select(col("vec_id"), VectorSearch.toDouble(col("embedding")).as("v"))
    val mut = emb.filter(col("vec_id") % 100 === 0)
      .select((col("vec_id") + 100000).as("vec_id"),
        transform(col("embedding"), (x, i) =>
          x.cast(DoubleType) * (lit(1.0) + lit(0.002) * (i % 2).cast(DoubleType)))
          .as("v"))
    val all = orig.union(mut)
    // ground truth: brute-force all-pairs at this test scale
    val vs = all.select(col("vec_id"), col("v"),
      VectorSearch.norm(col("v")).as("nrm"))
    val exact = vs.as("x").join(vs.as("y"), col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("vec_a"), col("y.vec_id").as("vec_b"),
        (VectorSearch.dotD(col("x.v"), col("y.v"))
          / (col("x.nrm") * col("y.nrm"))).as("cosine"))
      .filter(col("cosine") >= 0.99)
      .select(col("vec_a"), col("vec_b")).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val banded = VectorSearch.bucketedNearDupPairs(all, "vec_id", 0.99)
      .select(col("vec_a"), col("vec_b")).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty)
    // banded output can only contain true pairs (rerank is exact)...
    assert(banded.subsetOf(exact))
    // ...and with near-identical mutants the banding must catch them all
    assert(banded === exact, s"missed: ${exact -- banded}")
  }

  test("IVF: a near-identical mutant query finds its original at rank 1") {
    val orig = emb.select(col("vec_id"), col("embedding"))
    val mut = emb.filter(col("vec_id") % 100 === 0)
      .select((col("vec_id") + 100000).as("vec_id"),
        transform(col("embedding"), (x, i) =>
          (x.cast(DoubleType) * (lit(1.0) + lit(0.002) * (i % 2).cast(DoubleType)))
            .cast("float")).as("embedding"))
    val top1 = VectorSearch.ivfTopK(orig.union(mut), mut, "vec_id", "embedding",
      k = 1, centroidEvery = 50, nprobe = 2).collect()
    // a mutant lands in (or probes into) its original's inverted list:
    // near-identical vectors share a nearest centroid
    assert(top1.length === 5)
    assert(top1.forall(r => r.getAs[Long]("neighbor_id") === r.getAs[Long]("query_id") - 100000))
    assert(top1.forall(_.getAs[Double]("cosine") > 0.999))
  }

  test("trained IVF centroids: mutant-set recall >= the modulo quantizer's") {
    val orig = emb.select(col("vec_id"), col("embedding"))
    val mut = emb.filter(col("vec_id") % 100 === 0)
      .select((col("vec_id") + 100000).as("vec_id"),
        transform(col("embedding"), (x, i) =>
          (x.cast(DoubleType) * (lit(1.0) + lit(0.002) * (i % 2).cast(DoubleType)))
            .cast("float")).as("embedding"))
    // recall proxy: how many mutants find their original at rank 1 —
    // k-means refinement may move list boundaries but must never lose
    // a near-identical pair the raw sample catches
    def hits(iters: Int): Long =
      VectorSearch.ivfTopK(orig.union(mut), mut, "vec_id", "embedding",
        k = 1, centroidEvery = 50, nprobe = 2, kmeansIters = iters)
        .filter(col("neighbor_id") === col("query_id") - 100000).count()
    val modulo = hits(0)
    val trained = hits(2)
    assert(trained >= modulo, s"trained recall $trained < modulo $modulo")
    assert(trained === 5L)
  }

  test("IVF plan: centroids broadcast, corpus never shuffles on itself") {
    val plan = VectorSearch.ivfTopK(emb, emb.filter(col("vec_id") % 100 === 0),
      "vec_id", "embedding").queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"), plan)
  }

  test("hot-bucket skew cap: an identical-vector flood yields no pair explosion") {
    import spark.implicits._
    // 60 identical vectors collapse onto ONE sign pattern in every band —
    // the degenerate corpus the cap exists for — plus one seeded
    // near-duplicate pair that must still be found
    val rnd = new scala.util.Random(11)
    val base = Seq.fill(64)(rnd.nextDouble() - 0.5)
    val mutv = base.zipWithIndex.map { case (x, i) => if (i % 2 == 0) x else x * 1.0002 }
    val seeds = Seq((1L, base), (2L, mutv)).toDF("vec_id", "v")
    val flood = spark.range(1000, 1060)
      .select(col("id").as("vec_id"), typedlit(Seq.fill(64)(0.5)).as("v"))
    val all = seeds.union(flood)
    // capped: the flood's buckets (60 > 50) are dropped BEFORE pairing —
    // candidates are bounded to the seeded pair, not C(60,2) = 1770
    val capped = VectorSearch.bucketedNearDupPairs(all, "vec_id", 0.99,
      maxBandBucket = 50).collect()
    assert(capped.length === 1)
    assert((capped.head.getLong(0), capped.head.getLong(1)) === (1L, 2L))
    // uncapped control: the same input does the bucket² work the cap prevents
    val uncapped = VectorSearch.bucketedNearDupPairs(all, "vec_id", 0.99,
      maxBandBucket = 10000).count()
    assert(uncapped === 60L * 59 / 2 + 1)
    // drop accounting: the diagnostic surfaces exactly the flood's buckets
    val hot = VectorSearch.vecBandBucketSizes(
      VectorSearch.vecBandRows(all, "vec_id"))
      .filter(col("bucket_size") > 50).collect()
    assert(hot.length === VectorSearch.VecBands)
    assert(hot.forall(_.getAs[Long]("bucket_size") >= 60L))
  }

  test("trainCentroids dims guard is in-plan: lazy to build, loud on a mismatch") {
    val b = emb.select(col("vec_id"), VectorSearch.toDouble(col("embedding")).as("v"))
      .select(col("vec_id"), col("v"), VectorSearch.norm(col("v")).as("nrm"))
    val init = b.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("cent_id"), col("v").as("cv"), col("nrm").as("cn"))
    // wrong dims: building the plan runs NO job (no driver-side probe) —
    // the failure surfaces only when the training plan executes
    val wrong = VectorSearch.trainCentroids(b, init, "vec_id", iters = 1, dims = 32)
    val e = intercept[Exception] { wrong.collect() }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("dims=32")), e.getMessage)
    // right dims: trains normally through the same guard
    val ok = VectorSearch.trainCentroids(b, init, "vec_id", iters = 1, dims = 64)
    assert(ok.count() === 5)
  }

  test("recommendedSigBits grows logarithmically with corpus size") {
    val base = VectorSearch.recommendedSigBits(100000L)
    val x100 = VectorSearch.recommendedSigBits(10000000L)
    assert(x100 > base)
    assert(x100 - base <= VectorSearch.VecBands * 8) // ~log2(100)≈7 bits/band
  }

  test("int8 quantization: codes bounded, zero vector safe, high recall vs float top-5") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, sf("0.001"))
    val q = VectorSearch.quantizeInt8(emb, "vec_id", "embedding")
    // every code in the int8 envelope (floor can reach ±127±1 only via
    // FP slack on the extreme element; assert the true storable range)
    val bounds = q.select(
      min(array_min(col("qv"))).as("lo"), max(array_max(col("qv"))).as("hi"),
      min(col("scale")).as("ms")).head()
    assert(bounds.getLong(0) >= -128L && bounds.getLong(1) <= 127L,
      s"codes out of int8 range: $bounds")
    assert(bounds.getDouble(2) > 0.0)
    // an all-zero vector quantizes to all-zero codes, no NaN/Inf
    val z = VectorSearch.quantizeInt8(
      Seq((1L, Array.fill(4)(0f))).toDF("vec_id", "embedding"), "vec_id", "embedding")
      .head()
    assert(z.getDouble(1) === 1.0)
    assert(z.getSeq[Long](2).forall(_ === 0L))
    // serving quality: quantized top-5 keeps >= 4 of the float top-5 on
    // average (deterministic on the fixed corpus + query set)
    val queries = emb.filter(col("vec_id") % 100 === 0 && col("vec_id") < 500)
    val exact = VectorSearch.knnBrute(emb, queries, "vec_id", "embedding")
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val quant = VectorSearch.quantizedTopK(emb, queries, "vec_id", "embedding")
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = quant.count(exact).toDouble / exact.size
    assert(recall >= 0.8, s"quantized recall@5 degraded to $recall")
  }

  test("PQ/ADC: a near-identical mutant query ranks its original first") {
    val orig = emb.select(col("vec_id"), col("embedding"))
    val mut = emb.filter(col("vec_id") % 100 === 0 && col("vec_id") < 500)
      .select((col("vec_id") + 100000).as("vec_id"),
        transform(col("embedding"), (x, i) =>
          (x.cast(DoubleType) * (lit(1.0) + lit(0.002) * (i % 2).cast(DoubleType)))
            .cast("float")).as("embedding"))
    val top1 = VectorSearch.pqTopK(orig.union(mut), mut, "vec_id", "embedding",
      codebookIds = col("vec_id") % 25 === 0 && col("vec_id") < 400, k = 1)
      .collect()
    // the mutant's subvectors quantize to the same codewords as the
    // original's, so its ADC distance to the original is the minimum
    // (0 in code space)
    assert(top1.length === 5)
    assert(top1.forall(r =>
      r.getAs[Long]("neighbor_id") === r.getAs[Long]("query_id") - 100000))
  }

  test("PQ/ADC with a SPARSE codebook (fewer than PqCodes codes) still " +
      "ranks correctly — the distance map is keyed, not positional") {
    val orig = emb.select(col("vec_id"), col("embedding"))
    val mut = emb.filter(col("vec_id") % 100 === 0 && col("vec_id") < 500)
      .select((col("vec_id") + 100000).as("vec_id"),
        transform(col("embedding"), (x, i) =>
          (x.cast(DoubleType) * (lit(1.0) + lit(0.002) * (i % 2).cast(DoubleType)))
            .cast("float")).as("embedding"))
    // only 10 seed ids -> 10 codes per subspace, idx values are sparse
    // in [0, 64); a positional lookup reads the wrong entries for sub>=1
    // the positional bug's signature: sub>=1 lookups past the short
    // array returned null, null adists sorted FIRST, and garbage rows
    // took every rank. With the keyed map no lookup can miss.
    val out = VectorSearch.pqTopK(orig.union(mut), mut, "vec_id", "embedding",
      codebookIds = col("vec_id") % 25 === 0 && col("vec_id") < 250, k = 3)
      .collect()
    assert(out.length === 15) // 5 queries x k=3
    assert(out.forall(!_.isNullAt(2)), "null adist: a distance lookup missed")
    // the true original shares all 4 codewords with its mutant query, so
    // it carries the MINIMAL adist for that query (possibly tied with
    // cell-mates under the coarse 10-code quantizer — rank itself is
    // tie-broken by id, so assert distance optimality, not rank)
    val minAdist = out.groupBy(_.getAs[Long]("query_id"))
      .map { case (q, rows) => q -> rows.map(_.getDouble(2)).min }
    val origAdist = VectorSearch.pqTopK(orig.union(mut), mut, "vec_id",
      "embedding",
      codebookIds = col("vec_id") % 25 === 0 && col("vec_id") < 250, k = 1000)
      .filter(col("neighbor_id") === col("query_id") - 100000)
      .collect().map(r => r.getAs[Long]("query_id") -> r.getDouble(2)).toMap
    for ((q, m) <- minAdist)
      assert(origAdist(q) <= m + 1e-9, s"query $q: original not distance-optimal")
  }

  test("PQ training reduces quantization error vs the sampled codebooks " +
      "(the metric k-means minimizes)") {
    import org.apache.spark.sql.expressions.Window
    val seedPred = col("vec_id") % 25 === 0 && col("vec_id") < 400
    def totalerr(books: org.apache.spark.sql.DataFrame): Double = {
      // Σ over (vector, subspace) of the min squared distance to any
      // codeword — PQ's objective
      val subRows = emb
        .select(col("vec_id"), VectorSearch.toDouble(col("embedding")).as("v"),
          explode(typedlit((0 until VectorSearch.PqSubspaces).toArray)).as("s"))
        .select(col("vec_id"), col("s").cast("long").as("sub"),
          (1 until VectorSearch.PqSubspaces).foldLeft(
            when(col("sub") === 0, VectorSearch.pqSub(col("v"), 0))) {
            (acc, i) => acc.when(col("sub") === i, VectorSearch.pqSub(col("v"), i))
          }.as("sv"))
      val w = Window.partitionBy("vec_id", "sub").orderBy(col("d2"), col("code"))
      subRows.join(broadcast(books), Seq("sub"))
        .withColumn("d2", VectorSearch.sqDist(col("sv"), col("cv")))
        .withColumn("rk", row_number().over(w)).filter(col("rk") === 1)
        .agg(sum("d2")).head().getDouble(0)
    }
    val sampled = totalerr(
      VectorSearch.pqCodebooks(emb, "vec_id", "embedding", seedPred))
    val trained = totalerr(
      VectorSearch.pqTrainCodebooks(emb, "vec_id", "embedding", seedPred,
        iters = 2))
    assert(trained <= sampled,
      s"training worsened quantization error: $trained > $sampled")
    assert(trained < sampled * 0.9,
      s"training gained under 10%: $trained vs $sampled")
  }

  test("PQ codes are 4 small ints per vector; nothing vector-sized " +
      "shuffles in the ADC scan") {
    val out = VectorSearch.pqEncode(emb, "vec_id", "embedding",
      VectorSearch.pqCodebooks(emb, "vec_id", "embedding",
        col("vec_id") % 25 === 0 && col("vec_id") < 400))
    assert(out.columns.toSeq == Seq("vec_id", "c0", "c1", "c2", "c3"))
    val codes = out.collect()
    assert(codes.length === emb.count())
    assert(codes.forall(r => (1 to 4).forall { i =>
      val c = r.getLong(i); c >= 0 && c < VectorSearch.PqCodes
    }))
  }

  test("contrastivePairs: picks the nearest same-label positive and the " +
      "nearest WRONG-label hard negative, never the query itself") {
    import spark.implicits._
    // query (1,0): label A. Positives: (0.9,0.1) closer than (0,1).
    // Negatives: label B (0.95,0.05) is the hard one vs (-1,0)
    val vecs = Seq(
      (1L, Array(1f, 0f), 0),
      (2L, Array(0.9f, 0.1f), 0), (3L, Array(0f, 1f), 0),
      (4L, Array(0.95f, 0.05f), 1), (5L, Array(-1f, 0f), 1))
      .toDF("vec_id", "embedding", "label")
    val out = VectorSearch.contrastivePairs(vecs,
      vecs.filter(col("vec_id") === 1), "vec_id", "embedding", "label")
      .orderBy("is_positive").collect()
      .map(r => (r.getAs[Int]("is_positive"), r.getAs[Long]("neighbor_id")))
    assert(out.toSeq == Seq((0, 4L), (1, 2L)))
  }

  test("contrastivePairs: exactly one row per (query, polarity) that " +
      "exists; a label with no wrong-label rows yields no negative row") {
    import spark.implicits._
    val same = Seq(
      (1L, Array(1f, 0f), 7), (2L, Array(0f, 1f), 7), (3L, Array(1f, 1f), 7))
      .toDF("vec_id", "embedding", "label")
    val out = VectorSearch.contrastivePairs(same,
      same.filter(col("vec_id") === 1), "vec_id", "embedding", "label")
      .collect()
    assert(out.length == 1 && out(0).getAs[Int]("is_positive") == 1)
  }

  test("annRecallAudit: a planted near-identical neighbor is found at " +
      "approximate rank 1 with full top-1 credit; recall never exceeds " +
      "1e6 ppm; a query with zero candidates is absent, not faked") {
    import spark.implicits._
    // 64-dim corpus: query 1 and its mutant 2 are near-identical (same
    // sign pattern on every hyperplane → all 4 bands collide); the rest
    // is a pseudo-random cloud
    val dim = 64
    def vec(seed: Long): Array[Float] =
      Array.tabulate(dim)(i => (((seed * 7919L + i * 104729L) % 2001L)
        - 1000L).toFloat / 1000f)
    val base = vec(1L)
    val mutant = base.map(x => x * 1.001f)
    val cloud = (3L to 60L).map(i => (i, vec(i)))
    val df = ((1L, base) +: (2L, mutant) +: cloud).toDF("vec_id", "embedding")
    val got = VectorSearch.annRecallAudit(df,
        df.filter(col("vec_id") === 1), "vec_id", "embedding", 5)
      .collect()
    assert(got.length == 1)
    val r = got(0)
    assert(r.getAs[Long]("top1_rnk") == 1L, "mutant must rank first")
    assert(r.getAs[Long]("mrr_ppm") == 1000000L)
    assert(r.getAs[Long]("hits") >= 1L)
    assert(r.getAs[Long]("recall_ppm") <= 1000000L)
  }

  // ------------------------------------------------------------- MMR

  test("mmrRerank diverges from plain top-k: the redundant twin of the " +
      "top pick loses step 2 to a novel lower-relevance item") {
    import spark.implicits._
    // query along e1. A (id 10) and twin B (id 11): qd [127, 76] /
    // [127, 81], both rel 16129 (tie → A by id). C (id 12): qd
    // [63, -127], rel 8001. Step 2: B's redundancy sim(B,A) = 22285 ⇒
    // mmr2 = -6156; C's redundancy = sim(C,A) = 63·127 - 127·76 =
    // -1651 ⇒ mmr2 = 9652 ⇒ C wins despite half the relevance —
    // exactly the pick plain top-k gets wrong.
    val q = Seq(1.0f, 0.0f) ++ Seq.fill(6)(0.0f)
    val a = Seq(1.0f, 0.6f) ++ Seq.fill(6)(0.0f)
    val b = Seq(1.0f, 0.64f) ++ Seq.fill(6)(0.0f)
    val c = Seq(0.5f, -1.0f) ++ Seq.fill(6)(0.0f)
    val df = Seq((1L, q), (10L, a), (11L, b), (12L, c))
      .toDF("vec_id", "embedding")
    val rows = VectorSearch.mmrRerank(df, df.filter(col("vec_id") === 1L),
        "vec_id", "embedding", candK = 3, selectK = 3)
      .collect()
    val got = rows.map(r => r.getLong(2) -> r.getLong(1)).toMap
    assert(got(1L) == 10L, "step 1 = plain argmax relevance (tie on id)")
    assert(got(2L) == 12L, "step 2 trades relevance for novelty")
    assert(got(3L) == 11L)
    val step2 = rows.find(_.getLong(2) == 2L).get
    assert((step2.getLong(3), step2.getLong(4), step2.getLong(5)) ==
      ((8001L, -1651L, 9652L)))
  }

  test("mmrRerank: step 1 carries redundancy 0 and mmr2 = rel; later " +
      "steps carry max-sim-to-selected; candidate exhaustion emits " +
      "fewer steps, never a repeat") {
    import spark.implicits._
    val q = Seq(1.0f, 0.0f, 0.0f, 0.0f)
    val x = Seq(1.0f, 0.2f, 0.0f, 0.0f)
    val y = Seq(0.0f, 1.0f, 0.0f, 0.0f)
    val df = Seq((1L, q), (2L, x), (3L, y)).toDF("vec_id", "embedding")
    val rows = VectorSearch.mmrRerank(df, df.filter(col("vec_id") === 1L),
        "vec_id", "embedding", candK = 5, selectK = 5)
      .orderBy("step").collect()
    // only 2 candidates exist: exactly 2 steps, distinct picks
    assert(rows.length == 2)
    assert(rows(0).getLong(4) == 0L) // step-1 redundancy
    assert(rows(0).getLong(3) == rows(0).getLong(5)) // mmr2 = rel
    assert(rows(1).getLong(4) >= 0L)
    assert(rows.map(_.getLong(1)).distinct.length == 2)
  }

  test("centroidDrift: identical groups drift 0; a shifted group's L1 " +
      "gap matches the hand-computed fixed-point distance") {
    import spark.implicits._
    // two groups over 2-dim vectors: group 0 at the global center when
    // symmetric; group 1 shifted by +0.5 on dim 1
    val vecs = Seq(
      (0L, Array(0.0f, 1.0f)), (0L, Array(0.0f, -1.0f)),
      (1L, Array(0.5f, 1.0f)), (1L, Array(0.5f, -1.0f)))
      .toDF("label", "embedding")
    val got = VectorSearch.centroidDrift(vecs, "label", "embedding")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3)))).toMap
    // centroids: g0 = (0, 0), g1 = (0.5, 0), global = (0.25, 0)
    // L1 gap per group = 0.25 in dim 1 = 2^18 fp units exactly
    val q = 1L << 18
    assert(got(0L) == ((2L, q, q)))
    assert(got(1L) == ((2L, q, q)))
  }

  test("annRecallAudit on a PLANTED neighborhood: positive recall at the " +
      "recommended geometry, materially lower when the same planes are " +
      "over-sharded") {
    // the deployed 4x8 geometry IS recommendedSigBits' answer for this
    // corpus size — the audit gates the geometry the code recommends
    assert(VectorSearch.recommendedSigBits(2015) === VectorSearch.SigBits)
    // plant 5 true neighbors per query at cosine ~0.986 (alternate-mask
    // dims scaled 1.4): close enough to own the exact top-5, far enough
    // that each extra sign bit costs real collision probability
    def planted(shift: Long, m: Int, r: Int) = emb
      .filter(col("vec_id") % 100 === 0 && col("vec_id") < 500)
      .select((col("vec_id") + shift).as("vec_id"),
        transform(col("embedding"), (x, i) =>
          x.cast(DoubleType) *
            (lit(1.0) + lit(0.4) * (i % m === r).cast(DoubleType))).as("embedding"))
    val base = emb.select(col("vec_id"), col("embedding"))
      .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
      .unionByName(planted(100000L, 2, 0)).unionByName(planted(200000L, 2, 1))
      .unionByName(planted(300000L, 3, 0)).unionByName(planted(400000L, 3, 1))
      .unionByName(planted(500000L, 5, 0))
    val queries = emb.filter(col("vec_id") % 100 === 0 && col("vec_id") < 500)
    def avgRecall(bands: Int, rowsPerBand: Int): Double =
      VectorSearch.annRecallAudit(base, queries, "vec_id", "embedding",
          k = 5, bands = bands, rowsPerBand = rowsPerBand)
        .agg(avg(col("recall_ppm"))).head().getDouble(0)
    val recommended = avgRecall(VectorSearch.VecBands, VectorSearch.VecRowsPerBand)
    val oversharded = avgRecall(2, 16)
    // the audit demonstrably steers: recall >= 0.9 at the recommended
    // banding of the 32 planes, and regrouping them into 2 bands of 16
    // bits (what a 1000x corpus would want) costs >= 20 points of
    // recall on THIS corpus — sig-bit choice is a measured trade, not
    // a free parameter
    assert(recommended >= 900000.0, s"recommended-geometry recall $recommended")
    assert(oversharded <= recommended - 200000.0,
      s"over-sharded recall $oversharded vs $recommended")
  }

  test("semanticDedup: mutant twins collapse onto their source as one " +
      "3-member component keeping the min id") {
    val orig = emb.select(col("vec_id"), col("embedding"))
    def mut(shift: Long, eps: Double) = emb
      .filter(col("vec_id") % 100 === 0 && col("vec_id") < 500)
      .select((col("vec_id") + shift).as("vec_id"),
        transform(col("embedding"), (x, i) =>
          (x.cast(DoubleType) * (lit(1.0) + lit(eps) * (i % 2).cast(DoubleType)))).as("embedding"))
    val out = VectorSearch.semanticDedup(
      orig.unionByName(mut(100001L, 0.002)).unionByName(mut(200002L, 0.004)),
      "vec_id", "embedding", minCosine = 0.99)
    val rows = out.collect().map(r =>
      r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getInt(3)))).toMap
    // 5 sources, each a (source, twin1, twin2) triangle
    assert(rows.size === 15)
    for (s <- Seq(0L, 100L, 200L, 300L, 400L)) {
      assert(rows(s) === ((s, 3L, 1)), s"source $s must survive")
      assert(rows(s + 100001L) === ((s, 3L, 0)))
      assert(rows(s + 200002L) === ((s, 3L, 0)))
    }
    // candidate pairing is per-cluster: the executed tail (post-
    // checkpoint) joins the assigned frame on cent_id equality — never
    // a cartesian/nested-loop over the corpus
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("semanticDedup: maxClusterSize drops a degenerate one-cluster " +
      "flood before any pair is formed") {
    import spark.implicits._
    // 40 identical vectors (id 0 seeds the single centroid): cluster
    // size 40 > cap 10 -> no pairs at all; with the cap off the flood
    // pairs C(40,2) in one component
    val flood = (0L until 40L).map(i => (i, Array(1.0f, 2.0f, 3.0f, 4.0f)))
      .toDF("vec_id", "embedding")
    val capped = VectorSearch.semanticDedup(flood, "vec_id", "embedding",
      minCosine = 0.99, dims = 4, maxClusterSize = 10)
    assert(capped.count() === 0)
    val uncapped = VectorSearch.semanticDedup(flood, "vec_id", "embedding",
      minCosine = 0.99, dims = 4)
    assert(uncapped.count() === 40)
    assert(uncapped.filter(col("component") === 0 && col("cc_size") === 40)
      .count() === 40)
    assert(uncapped.filter(col("keep") === 1).count() === 1)
  }
}
