package graft

import org.apache.spark.sql.execution.FileSourceScanExec

/**
 * Engine-wide physical-plan invariants — the scale properties that must
 * hold for every registered query, asserted instead of hand-audited:
 * no accidental cartesian products, pushdown reaching the parquet scan,
 * constant-size dimensions broadcast.
 */
class PlanAuditSpec extends SparkSuite {

  /** Deliberate nested-loop joins, each with a BOUNDED broadcast side:
    * q25 broadcasts the query set against the corpus scan (non-equi
    * self-exclusion condition); q43/q56 broadcast the centroid set for
    * the k-means assignment (every vector scores every centroid —
    * C ≈ √N by construction). All are linear scans of the big side.
    * Everything else must plan hash/sort-merge joins. */
  /** q71's nested loop is the 1-row corpus-constants broadcast
    * (N, avgdl) against the scored term rows — not a row-pair scan.
    * q80's are the per-column 1-row × 1-row stat joins (StatsOps
    * .profile: global stats × distinct count). */
  /** q94/q97/q113's nested loops are 1-row constant broadcasts (the
    * corpus total / doc count / token total), the q71 shape. */
  /** q129's nested loop is the percentile-probe cross join: the 3-row
    * quantile list against the ≤ buckets-row MERGED histogram state —
    * both sides model-sized constants, never data. */
  private val allowedNestedLoop =
    Set("q25_knn_cosine_brute", "q43_ivf_ann", "q56_kmeans_clusters",
      "q66_int8_quantized_knn", "q71_bm25", "q80_column_profile",
      "q87_pq_adc_topk", "q90_pq_trained_adc",
      "q94_mixture_weights", "q97_tfidf_cosine_join",
      // q298/q299 reuse q97's 1-row corpus-count broadcast under the
      // corpus-relative df cap — the same deliberate shape
      "q298_tfidf_capped_pairs", "q299_tfidf_cap_accounting",
      // q302 embeds BOTH q97 (its exact truth side) and q298 (the
      // audited side), so it carries their 1-row corpus-count
      // broadcasts twice — the audit's definitional cost, the q136
      // precedent exactly
      "q302_tfidf_cap_recall_audit",
      "q105_contrastive_pairs", "q113_collocation_lift",
      "q129_ivm_quantile",
      // q136 embeds q25's knnBrute as its EXACT reference side — the
      // all-pairs scan against the bounded broadcast query set is the
      // audit's definitional cost, not an accident
      "q136_ann_recall_audit",
      // q152's nested loops are the 1-row basket-total broadcast under
      // the relative (ppm-of-N) support predicates — the q71/q94 shape
      "q152_basket_rules",
      // q155's nested loop is the 1-row max-period broadcast under the
      // churn-horizon predicate (p + 1 <= max_p) — the same shape
      "q155_growth_accounting",
      // q166's nested loop is the 1-row global-mean broadcast the
      // smoothed encoding shrinks toward — the q71/q94 shape
      "q166_target_encoding",
      // q186's nested loop is the 1-row corpus-count broadcast under the
      // B-side posting df cap (corpus-relative, the q97 shape)
      "q186_containment_join",
      // q168's nested loop lives inside the constant-pool proration of
      // the 5-row stratum-moments frame (q135's machinery under a
      // single allocation pool) — model-sized, never data
      "q168_neyman_sample",
      // q171's nested loops are the 1-row catalog-total broadcast the
      // cumulative share divides by (q71/q94 shape) plus the r10
      // bucket-prefix triangular join — ≤ nBuckets-row count tables
      // against each other, never data
      "q171_abc_xyz",
      // q173/q174's nested loops are 1-row broadcasts (pooled θ/x̄,
      // tile totals), q174's bucket-prefix + tile-cumsum triangular
      // joins (≤ nBuckets / ≤ tiles rows); q175's are the
      // bucket-marginal grid (≤ histogram cardinality) and the 1-row
      // corpus total — model-sized, never data
      "q173_cuped", "q174_cumulative_gains", "q175_source_drift_tv",
      // q177's nested loop is the 1-row corpus-total broadcast under
      // the region-share ratio — the q71/q94 shape
      "q177_share_of_parent",
      // q181 embeds q71's BM25 scorer, inheriting its 1-row
      // corpus-constants broadcast; the fusion itself is join-free
      "q181_rrf_fusion",
      // q191 ranks with the same embedded q71 BM25 scorer (1-row
      // (N, avgdl) broadcast); the nDCG arithmetic itself joins only
      // bounded top-k frames
      "q191_ndcg_eval",
      // q202 compares the same embedded BM25 ranker (1-row constants
      // broadcast); the RBO arithmetic joins only bounded top-k frames
      // and the k-row suffix-mass table
      "q202_rbo_overlap",
      // q189's nested loops are the broadcast-centroid joins of the q56
      // k-means trainer/assigner (bounded C-row model side); its
      // candidate PAIR stage is an equality join on cent_id, pinned by
      // VectorSearchSpec to never plan a cartesian
      "q189_semantic_dedup",
      // q192's nested loop is the 1-row 8 KB bitmap broadcast under the
      // per-row probe test — the operator's whole point is replacing
      // the fact-side shuffle with exactly this broadcast
      "q192_bloom_prefilter",
      // q193's nested loops are the 1-row frame-max broadcasts of the
      // HITS L-inf renormalization (one per half-iteration) — the
      // q71/q94 shape
      "q193_hits_bipartite",
      // q211 evaluates the same embedded q71 BM25 ranker (1-row
      // (N, avgdl) corpus-constants broadcast — the q181/q191/q202
      // precedent); the P/R/AP arithmetic itself joins only bounded
      // top-k frames and the per-query truth counts
      "q211_precision_recall_at_k",
      // q212's nested loops are the 1-row doc-span bounds broadcast
      // (the bucketPrefixOffsets shape) and the 8-row checkpoint spine
      // joined ≤ against the ≤ groups×8 jmin frames — checkpoint-
      // bounded, never data
      "q212_heaps_law",
      // q217/q218's nested loops are 1-row scalar broadcasts (the
      // positive-balance floor-average / the revenue maximum) under
      // the threshold predicates — the q71/q94/q155 shape
      "q217_dormant_high_balance", "q218_top_revenue_supplier",
      // q221's nested loop is the 1-row average-class-mass broadcast
      // inside the c-TF-IDF weight — the q71/q94 shape
      "q221_class_tfidf_terms",
      // q223's nested loops are the 1-row budget/deficit scalar
      // broadcasts onto the |sources| plan frame — model-sized twice
      "q223_mixture_plan",
      // q225 composes q223's plan (its scalar broadcasts) plus its own
      // 1-row totals broadcast for the entropy normalization
      "q225_mixture_diversity",
      // q235's nested loop is the 1-row (total, part-count) broadcast
      // under the 1.5x-average threshold predicate — the TPC-H Q11
      // scalar, the q217/q218 shape
      "q235_important_stock",
      // q243's nested loop is the 1-row corpus-count broadcast under
      // the corpus-relative posting cap — the q186/q97 shape
      "q243_span_attribution",
      // q244 embeds q223's mixturePlan, inheriting its 1-row
      // budget/deficit scalar broadcasts onto the |sources| frame
      "q244_corpus_refresh_chain",
      // q246's nested loop is tCloseness's 1-row table-total (N)
      // broadcast onto the class×bin dense frame — the q71/q94 shape
      "q246_t_closeness",
      // q253's nested loop is the 1-row corpus-total broadcast feeding
      // the Chebyshev p-value's expected counts — the q71/q94 shape
      "q253_bh_fdr",
      // q257's nested loop is backoffScore's 1-row unigram-total (N)
      // broadcast normalizing the lowest backoff order — model-sized
      "q257_backoff_lm_score",
      // q261 embeds q257's scorer (its 1-row N broadcast); the gate
      // itself joins per-source thresholds by key
      "q261_perplexity_gate",
      // q262 runs the scorer twice (two 1-row N broadcasts) plus the
      // bucketPrefixOffsets-style bounds and threshold broadcasts —
      // all 1-row frames under the quartile decomposition
      "q262_dsir_selection",
      // q263's nested loop is the bounded benchmark-set broadcast under
      // the all-pairs cosine scan — the q25/knnBrute query-set shape
      "q263_embedding_decontam",
      // q264's nested loop is the 1-row totals broadcast onto the
      // |sources| plan frame — the q223 shape
      "q264_epoch_plan")

  test("no registered query plans a cartesian product; nested-loop only where deliberate") {
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
      val plan = fn(spark, sf()).queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"), s"$name plans a cartesian:\n$plan")
      if (!allowedNestedLoop(name))
        assert(!plan.contains("BroadcastNestedLoopJoin"),
          s"$name plans a nested-loop join:\n$plan")
    }
  }

  test("q02: filter and projection push into the parquet scan") {
    // sparkPlan, not executedPlan: AdaptiveSparkPlanExec does not expose
    // its tree to collect() before execution
    val scans = SparkEntry.queries("q02_filter_project")(spark, sf())
      .queryExecution.sparkPlan
      .collect { case f: FileSourceScanExec => f }
    assert(scans.nonEmpty)
    val meta = scans.head.metadata
    assert(meta("PushedFilters").contains("GreaterThanOrEqual"), meta("PushedFilters"))
    val readSchema = meta("ReadSchema")
    assert(!readSchema.contains("l_tax") && !readSchema.contains("l_partkey"),
      s"projection not pruned: $readSchema")
  }

  test("q44: bounding-box range predicates push into the landed parquet scan") {
    val scans = SparkEntry.queries("q44_bbox_vehicles")(spark, sf())
      .queryExecution.sparkPlan
      .collect { case f: FileSourceScanExec => f }
    assert(scans.nonEmpty)
    val pushed = scans.head.metadata("PushedFilters")
    // both bounds of both axes reach the scan — run/init.sql:83-84's
    // lat/long B-trees restated as parquet row-group stat skipping
    for (f <- Seq("GreaterThanOrEqual(lat,60.15", "LessThanOrEqual(lat,60.25",
        "GreaterThanOrEqual(long,24.9", "LessThanOrEqual(long,25.05"))
      assert(pushed.contains(f), s"missing pushed filter $f in: $pushed")
  }

  test("q04/q40: constant-size dimensions broadcast, big-big joins shuffle") {
    for (q <- Seq("q04_join_star", "q40_part_supplier_profit")) {
      val plan = SparkEntry.queries(q)(spark, sf())
        .queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"), s"$q: no broadcast for dims")
    }
  }

  test("q59: the correlated scalar subquery decorrelates to an aggregate + join") {
    val qe = SparkEntry.queries("q59_correlated_subquery")(spark, sf())
      .queryExecution
    // RewriteCorrelatedScalarSubquery must leave no per-row subquery —
    // the optimized plan holds a grouped Aggregate joined back to the
    // outer side, and the physical plan has no scalar-subquery node.
    assert(!qe.optimizedPlan.toString.contains("scalar-subquery"),
      s"subquery survived optimization:\n${qe.optimizedPlan}")
    val physical = qe.executedPlan.toString
    assert(!physical.contains("Subquery"), s"per-row subquery exec:\n$physical")
  }

  test("q85: the corpus pipeline's language and length gates push into " +
      "the documents scan") {
    val scans = SparkEntry.queries("q85_corpus_pipeline")(spark, sf())
      .queryExecution.sparkPlan
      .collect { case f: FileSourceScanExec => f }
    assert(scans.nonEmpty)
    // every stage after the gates works on the filtered corpus, so the
    // gates must run AT the scan — In(lang) and the n_chars floor both
    // appear in PushedFilters (the token-count gate is expression-level
    // and correctly stays above)
    val pushed = scans.map(_.metadata.getOrElse("PushedFilters", "")).mkString(";")
    assert(pushed.contains("In(lang"), pushed)
    assert(pushed.contains("GreaterThanOrEqual(n_chars,200)"), pushed)
  }

  test("q84: FastSS pairs plan exactly three equality joins (variant " +
      "self-join + two string-table arms), never a nested loop") {
    val plan = SparkEntry.queries("q84_edit_distance_join")(spark, sf())
      .queryExecution.executedPlan.toString
    // the three arms of editDistanceOnePairs: substitution (variant
    // self-join) + insL/insR (strings × deletion variants). A fourth
    // join means someone reintroduced the three-way variant self-join
    // (six shuffle-sorts); a nested-loop means a candidate arm lost its
    // equality key and degenerated to a row-pair scan.
    val equiJoins = "SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin".r
      .findAllIn(plan).length
    assert(equiJoins == 3, s"expected 3 equality joins, got $equiJoins:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan)
  }

  test("q85: the corpus pipeline shuffles row data on the content hash " +
      "exactly once") {
    val plan = SparkEntry.queries("q85_corpus_pipeline")(spark, sf())
      .queryExecution.executedPlan.toString
    // exactly THREE row shuffles end-to-end: the requested doc_id
    // spread (spreadSmallInput), the dedup window keyed on the content
    // hash (md5(text) pre-projects to a _w0 window key), and the shard
    // re-key for packing. The sample filter is per-row. Any fourth
    // hashpartitioning Exchange means a stage re-hashed the corpus —
    // the N-consumer recompute trap this pipeline is built to avoid.
    val hashExchanges = plan.linesIterator
      .filter(_.contains("Exchange hashpartitioning")).toList
    assert(hashExchanges.size == 3,
      s"expected exactly 3 hash Exchanges, got:\n${hashExchanges.mkString("\n")}\n$plan")
    assert(hashExchanges.count(_.contains("_w0")) == 1,
      s"expected exactly 1 content-hash (window-key) Exchange:\n$plan")
    // renders as md5(cast(text#N as binary)) AS _w0
    assert(plan.contains("md5(cast(text"), "the dedup stage lost its md5 content key")
  }

  test("q107: dup-ngram coverage is join-free — ONE corpus-sized hash " +
      "Exchange (the gram-hash count-window), then the per-doc rollup") {
    val plan = SparkEntry.queries("q107_dup_ngram_coverage")(spark, sf())
      .queryExecution.executedPlan.toString
    // the count-window form replaces a groupBy(h)+join-back; a Join node
    // here means that regression, a second corpus-keyed ENSURE_
    // REQUIREMENTS Exchange means the window and the rollup stopped
    // sharing the gram-hash shuffle. The r17 input spread
    // (spreadSmallInput before the shingle Generate — the Generate is
    // this query's CPU and ran at the parquet split count) adds exactly
    // one REPARTITION_BY_NUM routing Exchange of the RAW doc rows,
    // pinned separately so it can't silently multiply.
    assert(!plan.contains("Join"), s"q107 grew a join:\n$plan")
    val hashExchanges = plan.linesIterator
      .filter(_.contains("Exchange hashpartitioning")).toList
    val (spread, keyed) = hashExchanges
      .partition(_.contains("REPARTITION_BY_NUM"))
    assert(spread.size == 1,
      s"expected 1 input-spread Exchange (REPARTITION_BY_NUM):\n" +
        hashExchanges.mkString("\n"))
    assert(keyed.size == 2,
      s"expected 2 keyed hash Exchanges (h window, doc_id rollup):\n" +
        hashExchanges.mkString("\n"))
  }

  test("q109: the first-event window and the (user, cohort, offset) " +
      "dedup share ONE user-keyed Exchange") {
    val plan = SparkEntry.queries("q109_cohort_retention")(spark, sf())
      .queryExecution.executedPlan.toString
    // hashpartitioning(uid) satisfies the distinct-aggregate's
    // ClusteredDistribution(uid, cohort, off) — a second uid-bearing
    // Exchange means that reuse broke and the corpus shuffles twice
    val uidExchanges = plan.linesIterator
      .filter(l => l.contains("Exchange hashpartitioning") && l.contains("uid"))
      .toList
    assert(uidExchanges.size == 1,
      s"expected the single shared user-keyed Exchange:\n" +
        uidExchanges.mkString("\n") + s"\n$plan")
  }

  test("every scan in the registry reads parquet batched (columnar)") {
    val unbatched = SparkEntry.queries.keys.toSeq.sorted.flatMap { name =>
      SparkEntry.queries(name)(spark, sf()).queryExecution.sparkPlan
        .collect { case f: FileSourceScanExec if !f.supportsColumnar => name }
    }
    assert(unbatched.isEmpty, s"non-columnar scans in: ${unbatched.distinct}")
  }

  test("snapshotDiff reads ONLY key + compared columns even when handed " +
      "the FULL-width frame (the narrow-projection claim — q92's build " +
      "pre-projects, so this feeds the operator the wide table directly)") {
    val wide = graft.queries.Tables.customer(spark, sf())
    val diff = graft.operators.MergeOps.snapshotDiff(
      wide, wide.filter(org.apache.spark.sql.functions.col("c_custkey") % 2 === 0),
      Seq("c_custkey"), Seq("c_acctbal"))
    val scans = diff.queryExecution.sparkPlan
      .collect { case f: FileSourceScanExec => f }
    assert(scans.nonEmpty)
    for (s <- scans) {
      val readSchema = s.metadata("ReadSchema")
      assert(!readSchema.contains("c_name") &&
        !readSchema.contains("c_nationkey") &&
        !readSchema.contains("c_mktsegment"),
        s"diff scan reads untracked columns: $readSchema")
    }
  }

  test("q116/q117/q120: the temporal operators prune the events scan " +
      "to the columns they use (props and the rest stay in parquet)") {
    def readSchemas(name: String): Seq[String] =
      SparkEntry.queries(name)(spark, sf())
        .queryExecution.sparkPlan
        .collect { case f: FileSourceScanExec => f.metadata("ReadSchema") }
    for (rs <- readSchemas("q116_interval_islands"))
      assert(!rs.contains("props") && !rs.contains("event_type") &&
        !rs.contains("value"), s"q116 reads dead columns: $rs")
    for (rs <- readSchemas("q117_time_weighted_avg"))
      assert(!rs.contains("props") && !rs.contains("event_type"),
        s"q117 reads dead columns: $rs")
    for (rs <- readSchemas("q120_km_survival"))
      assert(!rs.contains("props") && !rs.contains("event_type") &&
        !rs.contains("value") && !rs.contains("event_id"),
        s"q120 reads dead columns: $rs")
  }

  test("q121: every audit check aggregates before reporting — no " +
      "violating rows reach the final union, and the events scans are " +
      "column-pruned") {
    val q = SparkEntry.queries("q121_quality_audit")(spark, sf())
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    // seven 1-row check frames union: every union child must TOP OUT in
    // an Aggregate (modulo projections) — a check that fed base-table
    // rows into the union would break the |checks|-row report contract
    import org.apache.spark.sql.catalyst.plans.logical.{
      Aggregate => LAgg, LogicalPlan, Project => LProject, Union => LUnion}
    @annotation.tailrec
    def topsInAggregate(p: LogicalPlan): Boolean = p match {
      case _: LAgg => true
      case pr: LProject => topsInAggregate(pr.child)
      case _ => false
    }
    val union = q.queryExecution.optimizedPlan
      .collectFirst { case u: LUnion => u }
    assert(union.nonEmpty, q.queryExecution.optimizedPlan.toString)
    for (child <- union.get.children)
      assert(topsInAggregate(child), s"audit check is not 1-row:\n$child")
    val eventsScans = q.queryExecution.sparkPlan
      .collect { case f: FileSourceScanExec => f.metadata("ReadSchema") }
      .filter(_.contains("value"))
    assert(eventsScans.nonEmpty)
    for (rs <- eventsScans)
      assert(!rs.contains("props") && !rs.contains("user_id"),
        s"q121 events scan reads dead columns: $rs")
  }

  test("q95: document chunking is shuffle-free past the requested " +
      "spread (pure per-row Generate — the scan-speed claim)") {
    val plan = SparkEntry.queries("q95_doc_chunking")(spark, sf())
      .queryExecution.executedPlan.toString
    assert(plan.contains("Generate"), plan)
    // the only hash exchange allowed is spreadSmallInput's explicit
    // doc_id repartition; the final orderBy adds one range exchange
    val hashExchanges = plan.linesIterator
      .filter(_.contains("Exchange hashpartitioning")).size
    assert(hashExchanges <= 1,
      s"chunking should not shuffle beyond the input spread:\n$plan")
    assert(!plan.contains("Join"), plan)
  }

  test("q134: FIFO matching is ONE key-equi join over the cumsum " +
      "windows — no nested loop, no third orders shuffle") {
    val plan = SparkEntry.queries("q134_fifo_match")(spark, sf())
      .queryExecution.executedPlan.toString
    // the overlap predicate must ride a cust-keyed equality join as its
    // post-condition; a nested loop means the equi-key was lost and the
    // join degenerated to per-key all-pairs row scanning
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan)
    val equiJoins = "SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin".r
      .findAllIn(plan).length
    assert(equiJoins == 1, s"expected 1 equality join, got $equiJoins:\n$plan")
    // two hash exchanges: the (cust, is_lot) window and the join's
    // cust re-key (both join inputs derive from one scan; the final
    // orderBy adds a range exchange, not counted here)
    val hashExchanges = plan.linesIterator
      .filter(_.contains("Exchange hashpartitioning")).size
    assert(hashExchanges <= 3, s"FIFO shuffles too much:\n$plan")
  }

  test("q135: proration joins the per-group totals back by broadcast " +
      "and windows only per group — nothing global") {
    val qe = SparkEntry.queries("q135_proration")(spark, sf())
      .queryExecution
    assert(qe.executedPlan.toString.contains("BroadcastHashJoin"),
      s"group totals should broadcast:\n${qe.executedPlan}")
    // the rank/sum windows must partition by the group key — a global
    // (unpartitioned) window would single-thread every row
    val globals = qe.executedPlan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec
        if w.partitionSpec.isEmpty => w
    }
    assert(globals.isEmpty, s"global window in proration plan:\n${qe.executedPlan}")
  }

  test("q139: cadence windows stay key-partitioned; the percentile " +
      "picks are aggregates, not sorts of the frame") {
    val qe = SparkEntry.queries("q139_cadence_profile")(spark, sf())
      .queryExecution
    // every WindowExec must carry a non-empty partition spec (a global
    // window moves all gaps to one partition — the failure mode the
    // rank-predicate design avoids)
    val globals = qe.executedPlan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec
        if w.partitionSpec.isEmpty => w
    }
    assert(globals.isEmpty, s"global window in cadence plan:\n${qe.executedPlan}")
    assert(!qe.executedPlan.toString.contains("Join"), "cadence grew a join")
  }

  /** Queries whose plans carry a DELIBERATE unpartitioned window, each
    * over a bounded or pre-pruned frame (audited in their SURVEY §2
    * rows): q104's drift χ² windows over the histogram-bucket frame
    * (≤ bucket-cardinality rows); q124's exact skyline pass runs over
    * the bucket-PRUNED survivor set (the distributed pre-prune is the
    * guard, double-checked in its own spec); q128's running offsets
    * window over the tier×bucket count table; q129's cumulative counts
    * over the ≤-buckets-row merged histogram state; q168's
    * largest-remainder proration ranks the 5-row stratum-moment frame
    * (its single-pool literal partition key constant-folds away, which
    * is WHY it reads as unpartitioned); q87's PQ codebook ranks the
    * ≤-PqCodes seed sample. Everything else must partition every
    * window — the q171/q174 single-partition defect class stays dead
    * registry-wide. */
  /** q208's π₀ apportionment ranks the ≤|states|-row (5) distinct-
    * state frame — model-sized, never data. q246's global prefix is
    * tCloseness's cum_g over the dense ≤ nBins (8) global-histogram
    * frame — bin-bounded, never data. */
  private val allowedGlobalWindow: Set[String] =
    Set("q104_histogram_drift", "q124_pareto_frontier",
      "q128_curriculum_order", "q129_ivm_quantile", "q168_neyman_sample",
      "q87_pq_adc_topk", "q208_markov_stationary", "q246_t_closeness")

  test("registry-wide: unpartitioned windows only where deliberate " +
      "(bounded or pre-pruned frames)") {
    import org.apache.spark.sql.execution.window.{WindowExec, WindowGroupLimitExec}
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val globals = fn(spark, sf()).queryExecution.sparkPlan.collect {
          case w: WindowExec if w.partitionSpec.isEmpty => w
          case w: WindowGroupLimitExec if w.partitionSpec.isEmpty => w
        }
        if (globals.nonEmpty && !allowedGlobalWindow(name)) Some(name)
        else if (globals.isEmpty && allowedGlobalWindow(name))
          Some(s"$name (allowlisted but clean — remove)")
        else None
    }
    assert(offenders.isEmpty, s"global-window audit: $offenders")
  }

  test("q171/q174: NO single-partition window in any executed plan — " +
      "checkpoint segments included (r9 verdict #1)") {
    // bucketPrefixOffsets localCheckpoints its reduced frames, which
    // truncates the final df's lineage — so auditing only
    // df.queryExecution would miss the segments where the old global
    // windows used to live. Dataset.checkpoint runs through
    // withAction, so a QueryExecutionListener sees EVERY segment's
    // plan; delivery is async, hence the bounded poll for the final
    // collect's plan before auditing the snapshot.
    import scala.collection.mutable
    import org.apache.spark.sql.execution.{QueryExecution, SparkPlan}
    import org.apache.spark.sql.execution.window.{WindowExec, WindowGroupLimitExec}
    import org.apache.spark.sql.util.QueryExecutionListener
    for (name <- Seq("q171_abc_xyz", "q174_cumulative_gains")) {
      val plans = mutable.ArrayBuffer.empty[(String, SparkPlan)]
      val listener = new QueryExecutionListener {
        override def onSuccess(funcName: String, qe: QueryExecution,
            durationNs: Long): Unit =
          plans.synchronized { plans += ((funcName, qe.sparkPlan)) }
        override def onFailure(funcName: String, qe: QueryExecution,
            exception: Exception): Unit = ()
      }
      spark.listenerManager.register(listener)
      try {
        SparkEntry.queries(name)(spark, sf()).collect()
        val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
        while (System.nanoTime() < deadline &&
            !plans.synchronized(plans.exists(_._1 == "collect")))
          Thread.sleep(50)
        val snap = plans.synchronized(plans.toVector)
        assert(snap.exists(_._1 == "localCheckpoint"),
          s"$name: expected checkpoint segments in ${snap.map(_._1)}")
        val wins = snap.flatMap { case (fn, p) =>
          p.collect {
            case w: WindowExec => (fn, w.partitionSpec)
            case w: WindowGroupLimitExec => (fn, w.partitionSpec)
          }
        }
        assert(wins.nonEmpty,
          s"$name: expected per-bucket windows somewhere in the segments")
        wins.foreach { case (fn, ps) =>
          assert(ps.nonEmpty,
            s"$name plans a single-partition global window (in $fn segment)")
        }
      } finally spark.listenerManager.unregister(listener)
    }
  }
}
