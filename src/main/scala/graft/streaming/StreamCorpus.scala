package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode, TimeMode}

import graft.operators.{TextAnalysis, TextDedup}

/**
 * STREAMING twin of the q85 corpus-build front half: the scan-level
 * gates (language allow-list, char floor, whitespace-token floor) plus
 * ingest-time exact dedup, composed over a document STREAM — the shape
 * a production corpus runs when documents arrive continuously instead
 * of as a nightly batch.
 *
 * Division of labor at scale (and in the spec's equivalence proof) —
 * two shapes with different shuffle costs:
 *  - [[keepList]]: only (hash, id) pairs cross the stateful shuffle,
 *    document bodies stay at the source; the batch back half
 *    (stratified mix → packing → bin stats, all
 *    corpus-order-insensitive) runs over `corpus semi-join keep-list`
 *    whenever a training run is cut. The cheapest dedup-only path.
 *  - [[keptDocs]]/[[maintainShingleIndex]]: gated document BODIES cross
 *    the stateful shuffle once at ingest — the price of landing the
 *    shingle index without a second source pass. Size the deployment
 *    accordingly (shuffle ∝ gated corpus bytes per batch, not keys);
 *    when that is too heavy, run keepList and land shingles from a
 *    source-side semi-join instead.
 * In both shapes gates run BEFORE the hash so suppressed
 * languages/fragments never enter dedup state.
 *
 * Equivalence contract (asserted by StreamCorpusSpec): replaying a
 * corpus history in arrival order (originals before later re-inserts)
 * through this stream and then running the batch back half produces
 * BIT-FOR-BIT the q85 registry result. First-wins dedup matches the
 * batch min-id-per-hash rule whenever ids are assigned in arrival
 * order — the production invariant for ingest ids; out-of-order
 * replays fall back to the batch dedup's global rule, which is why the
 * batch operator (q22/q85) still owns full-history rebuilds.
 */
object StreamCorpus {

  /** q85's scan-level gates over a (doc_id, lang, text, n_chars)
    * document stream — language allow-list and char floor are
    * source-pushable predicates; the token floor is expression-level. */
  def gate(docs: DataFrame, langs: Seq[String], minChars: Long,
      minTokens: Long): DataFrame =
    docs.filter(col("lang").isin(langs: _*))
      .filter(col("n_chars") >= minChars &&
        TextAnalysis.wsTokenCount(col("text")) >= minTokens)

  /** Gate + hash + ingest-time dedup: the streaming keep-list
    * (content_hash, doc_id), first document per content hash wins
    * across micro-batches through the checkpoint (TTL = dedup horizon,
    * `ttlMs <= 0` keeps markers forever — closed replay fixtures).
    *
    * Key space: the FULL 128-bit md5 hex string — stricter than the
    * landed doc index's 60-bit `TextDedup.hash64` key. For the
    * index-compatible path (same key space, same column layout as
    * `TextDedup.landShingleIndex`) use [[keptDocs]] /
    * [[maintainShingleIndex]]; joining THIS keep-list against a landed
    * doc index would mismatch on type and key width. */
  def keepList(docs: DataFrame, langs: Seq[String], minChars: Long,
      minTokens: Long, ttlMs: Long): DataFrame =
    StatefulOps.streamDedupByHash(
      gate(docs, langs, minChars, minTokens)
        .select(md5(col("text")).as("content_hash"), col("doc_id")),
      "content_hash", "doc_id", ttlMs)
      // name the tuple-encoder columns so consumers get the documented
      // layout instead of _1/_2
      .toDF("content_hash", "doc_id")

  /** A kept (first-seen-per-content-hash) document with the landed
    * doc-index hash (TextDedup.hash64 — the 60-bit key the batch
    * exact-dedup groups on, so first-wins here and min-id-per-hash
    * there agree on the SAME key space, collisions included). */
  final case class KeptDoc(doc_id: Long, content_hash: Long, text: String)

  /** Gate + dedup, keeping the full first-seen document row: a
    * [[StatefulOps.KeepFirstProcessor]] keyed on the landed doc-index
    * hash. State is still only the marker — document bodies never
    * enter the state store, they ride the batch. */
  def keptDocs(docs: DataFrame, langs: Seq[String], minChars: Long,
      minTokens: Long, ttlMs: Long): Dataset[KeptDoc] = {
    import docs.sparkSession.implicits._
    gate(docs, langs, minChars, minTokens)
      .select(col("doc_id"), TextDedup.hash64(col("text")).as("content_hash"),
        col("text"))
      .as[KeptDoc]
      .groupByKey(_.content_hash)
      .transformWithState(
        new StatefulOps.KeepFirstProcessor[Long, KeptDoc](_.doc_id, ttlMs),
        TimeMode.ProcessingTime(), OutputMode.Append())
  }

  /**
   * Maintain the LANDED SHINGLE INDEX incrementally — the streaming
   * writer for the two tables every batch dedup consumer reads
   * (`dir/docs` = (doc_id, content_hash), `dir/shingles` = (doc_id, h);
   * TextDedup.landShingleIndex / readDocIndex / readShingleIndex, plus
   * a `batch_id=N` partition column readers ignore). Each micro-batch
   * writes only its KEPT documents' rows: the corpus-scale md5/shingle
   * pass runs once per document ever, at ingest — the "standing corpus
   * + incrementally-hashed deltas" shape the batch landing's scaladoc
   * promises.
   *
   * Delivery is EFFECTIVELY ONCE: each epoch overwrites its own
   * deterministic `batch_id=<epoch>` partition, so a foreachBatch retry
   * (e.g. the shingles write failed after the docs write committed)
   * rewrites the same partition instead of appending duplicate rows —
   * duplicates would corrupt COUNTING consumers like
   * `exactDupGroupsFromIndex` (n_copies) and `contaminationPairs`
   * (overlap counts), which group by key but do not dedup rows.
   * The contract binds index and CHECKPOINT into one lineage,
   * explicitly: the writer owns `checkpointDir` (it sets the stream's
   * checkpointLocation itself) and records it in a `_lineage` marker
   * inside the index dir on first write. Every batch verifies the
   * marker — an index landed under a DIFFERENT checkpoint is refused
   * outright, because epoch numbers only identify partitions while
   * their checkpoint lives (a fresh checkpoint restarts at epoch 0 and
   * would overwrite landed history whose dedup markers it has lost).
   * A marker-less dir that already holds batch partitions is refused
   * for the same reason (unknown lineage). Rebuild the index with the
   * new checkpoint, or archive the old one. The comparison is the
   * literal `checkpointDir` string — pass the same path across
   * restarts.
   *
   * Semantics: this is the index of the DEDUPED stream — within the TTL
   * horizon each content hash lands at most once, so `n_copies` read
   * from it counts cross-horizon re-occurrences only. Full-history copy
   * counts remain the batch operator's job (q22 over the raw corpus).
   *
   * Small files: one partition dir per micro-batch is the price of the
   * effectively-once contract, and at production cadence (a batch per
   * second, days of retention) it is a real file-count problem. Fold
   * old batches with `ScanOps.compactParquet` while the query is
   * STOPPED (or against a snapshot): the compactor reads the whole
   * directory with no commit filtering, so running it concurrently
   * with an in-flight epoch write or retry can capture half-written
   * partitions. StreamCorpusSpec asserts the stopped-stream compacted
   * copy is consumer-identical.
   */
  def maintainShingleIndex(docs: DataFrame, langs: Seq[String],
      minChars: Long, minTokens: Long, ttlMs: Long, dir: String,
      checkpointDir: String, shingleN: Int = 3): DataStreamWriter[KeptDoc] =
    keptDocs(docs, langs, minChars, minTokens, ttlMs)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[KeptDoc], batchId: Long) =>
        verifyLineage(batch.sparkSession, dir, checkpointDir, batchId, "docs")
        val b = batch.persist() // two sinks below — compute the batch once
        try {
          b.toDF().select(col("doc_id"), col("content_hash"))
            .write.mode("overwrite").parquet(s"$dir/docs/batch_id=$batchId")
          TextDedup.shingleHashRows(b.toDF(), "text", "doc_id", shingleN)
            .write.mode("overwrite").parquet(s"$dir/shingles/batch_id=$batchId")
        } finally { b.unpersist(); () }
      }

  /** Enforce the index↔checkpoint lineage binding (see
    * [[maintainShingleIndex]]): the `_lineage` marker must name THIS
    * checkpoint; a marker-less dir may only be adopted at epoch 0 while
    * it holds no landed partitions yet (a marker-less dir WITH
    * partitions is an index of unknown lineage — refuse). */
  /**
   * Maintain the q244 refresh-chain STANDING STATE incrementally — the
   * streaming writer for the two hash-keyed tables the incremental
   * corpus-refresh chain consumes: `dir/sh` = per-batch (src, ch, cnt)
   * manifest-count deltas and `dir/ntok` = per-batch (ch, ntok) token-
   * map rows. Arrivals are raw (source, text) documents; each
   * micro-batch hashes ONLY its own rows (the delta-cost contract —
   * standing text is never re-read) and lands its aggregate under a
   * deterministic `batch_id=<epoch>` partition, so a foreachBatch retry
   * overwrites instead of double-counting (the [[maintainShingleIndex]]
   * effectively-once shape; same `_lineage` checkpoint binding).
   *
   * The state REPRESENTATION is the additive decomposition: standing
   * (src, ch) counts = grouped SUM over all landed partitions (counts
   * commute — the q81/q244 merge discipline), the token map = DISTINCT
   * over partitions ((ch, ntok) is functionally determined by ch, so
   * distinct-of-unions ≡ union-of-distincts). [[readRefreshState]] is
   * the one reader that performs both folds, merging an optional
   * day-1 standing dir in the same pass; its output feeds
   * `TextDedup.dedupRateManifestFromCounts` and
   * `CorpusAssembly.mixturePlan` exactly as q244's batch build does —
   * StreamRefreshSpec proves the chain output bit-identical.
   *
   * Scale shape: per batch, one map-side-combined (src, ch) aggregate
   * over the ARRIVALS only; nothing ever rewrites standing partitions,
   * so maintenance cost is O(delta), not O(corpus). Compact old
   * partitions with `ScanOps.compactParquet` under the same
   * stopped-stream contract as the shingle index.
   */
  def maintainRefreshState(arrivals: DataFrame, dir: String,
      checkpointDir: String): DataStreamWriter[org.apache.spark.sql.Row] =
    arrivals
      .select(col("source").as("src"),
        TextDedup.hash64(col("text")).as("ch"),
        size(TextDedup.tokens(col("text"))).cast("long").as("ntok"))
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        verifyLineage(batch.sparkSession, dir, checkpointDir, batchId, "sh")
        val b = batch.persist() // two sinks below — compute the batch once
        try {
          b.groupBy(col("src"), col("ch"))
            .agg(count(lit(1)).as("cnt"))
            .write.mode("overwrite").parquet(s"$dir/sh/batch_id=$batchId")
          b.select(col("ch"), col("ntok")).distinct()
            .write.mode("overwrite").parquet(s"$dir/ntok/batch_id=$batchId")
        } finally { b.unpersist(); () }
      }

  /** Fold the stream-maintained refresh state (and an optional day-1
    * standing dir in `TextDedup`'s `sh`/`ntok` layout — plain OR
    * `batch_id=N`-partitioned, both legal: standing reads are
    * projected to the state columns before the union, so an extra
    * partition column can never poison the fold) into the exact
    * (src, ch, cnt) + (ch, ntok) frames q244's chain consumes. The
    * grouped sum / distinct are the ONLY folds — additivity is what
    * makes the per-batch partition layout a valid state encoding. */
  def readRefreshState(spark: org.apache.spark.sql.SparkSession,
      streamDir: String, standingDir: Option[String])
      : (DataFrame, DataFrame) = {
    val shParts = spark.read.parquet(s"$streamDir/sh")
      .select(col("src"), col("ch"), col("cnt"))
    val ntokParts = spark.read.parquet(s"$streamDir/ntok")
      .select(col("ch"), col("ntok"))
    val sh = standingDir.map(sd => spark.read.parquet(s"$sd/sh")
        .select(col("src"), col("ch"), col("cnt"))
        .unionByName(shParts)).getOrElse(shParts)
      .groupBy(col("src"), col("ch"))
      .agg(sum(col("cnt")).as("cnt"))
    val ntok = standingDir.map(sd => spark.read.parquet(s"$sd/ntok")
        .select(col("ch"), col("ntok"))
        .unionByName(ntokParts)).getOrElse(ntokParts)
      .distinct()
    (sh, ntok)
  }

  /**
   * Maintain the q261 FLUENCY-GATE state incrementally — the streaming
   * writer for the two tables [[graft.operators.TextAnalysis
   * .fluencyGateFromCounts]] consumes: `dir/sc` = per-batch
   * (source, s, cnt) score-histogram deltas and `dir/docs` = per-batch
   * (source, n_docs) arrival counts. Each micro-batch scores ONLY its
   * own documents against the LANDED stupid-backoff model (the static
   * artifact — five broadcast joins, the q257 scoring pass) and lands
   * its aggregates under a deterministic `batch_id=<epoch>` partition,
   * so a foreachBatch retry overwrites instead of double-counting (the
   * [[maintainShingleIndex]] effectively-once shape; same `_lineage`
   * checkpoint binding). Standing documents are never re-scored —
   * maintenance cost is O(delta).
   *
   * The state REPRESENTATION is additive: per-source score histograms
   * and doc totals are grouped SUMS over landed partitions, so chunking
   * can never change the fold ([[readFluencyState]] performs it,
   * merging an optional standing dir in the same pass). The quartile
   * threshold is deliberately NOT maintained incrementally — it is a
   * rank statistic, recomputed from the folded histogram at read time
   * (bounded by distinct scores, not documents).
   */
  def maintainFluencyState(arrivals: DataFrame, lm: DataFrame,
      dir: String, checkpointDir: String)
      : DataStreamWriter[org.apache.spark.sql.Row] =
    arrivals
      .select(col("doc_id"), col("source"), col("text"))
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        verifyLineage(batch.sparkSession, dir, checkpointDir, batchId,
          "sc")
        val b = batch.persist() // two sinks below — compute the batch once
        try {
          graft.operators.TextAnalysis.backoffScore(
              b.select(col("doc_id"), col("text")), "doc_id", "text", lm)
            .join(b.select(col("doc_id").as("doc"), col("source")),
              Seq("doc"))
            .groupBy(col("source"), col("mean_score_ppm").as("s"))
            .agg(count(lit(1)).as("cnt"))
            .write.mode("overwrite").parquet(s"$dir/sc/batch_id=$batchId")
          b.groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
            .write.mode("overwrite")
            .parquet(s"$dir/docs/batch_id=$batchId")
        } finally { b.unpersist(); () }
      }

  /** Fold the stream-maintained fluency state (and an optional
    * standing dir in the same `sc`/`docs` layout — plain OR
    * `batch_id=N`-partitioned, both legal: standing reads are
    * projected to the state columns before the union, matching how
    * scParts/docParts are projected) into the exact
    * (source, s, cnt) + (source, n_docs) frames
    * `TextAnalysis.fluencyGateFromCounts` consumes. Grouped sums are
    * the ONLY folds — additivity is the state encoding. */
  def readFluencyState(spark: org.apache.spark.sql.SparkSession,
      streamDir: String, standingDir: Option[String])
      : (DataFrame, DataFrame) = {
    val scParts = spark.read.parquet(s"$streamDir/sc")
      .select(col("source"), col("s"), col("cnt"))
    val docParts = spark.read.parquet(s"$streamDir/docs")
      .select(col("source"), col("n_docs"))
    val sc = standingDir.map(sd => spark.read.parquet(s"$sd/sc")
        .select(col("source"), col("s"), col("cnt"))
        .unionByName(scParts)).getOrElse(scParts)
      .groupBy(col("source"), col("s"))
      .agg(sum(col("cnt")).as("cnt"))
    val docs = standingDir.map(sd => spark.read.parquet(s"$sd/docs")
        .select(col("source"), col("n_docs"))
        .unionByName(docParts)).getOrElse(docParts)
      .groupBy(col("source"))
      .agg(sum(col("n_docs")).as("n_docs"))
    (sc, docs)
  }

  /**
   * Streaming twin of the q263 embedding decontamination gate (the
   * 20th batch≡stream twin) — the ingest-time form production runs:
   * a corpus release shouldn't discover benchmark leakage in a
   * nightly batch sweep when the leak was knowable the moment the
   * document ARRIVED. Every micro-batch scores ONLY its own train
   * vectors against the static benchmark suite (the bounded broadcast
   * side — [[graft.operators.VectorSearch.decontaminateByEmbedding]]'s
   * map-side-combinable argmax runs unchanged per batch; per-train-row
   * independence is what makes the batch operator streamable with NO
   * cross-batch state) and lands the flagged rows under a
   * deterministic `batch_id=<epoch>` partition, so a foreachBatch
   * retry overwrites instead of double-reporting (the
   * [[maintainShingleIndex]] effectively-once shape; same `_lineage`
   * checkpoint binding). Standing documents are never re-scored —
   * maintenance cost is O(delta)·|bench|.
   *
   * The flagged landing is repartition(1)-ed: a clean batch (zero
   * flags — the NORMAL case in production) must still land a
   * schema-bearing part file, or the read-side fold would fail to
   * infer a schema over all-clean history.
   */
  def maintainDecontamState(arrivals: DataFrame, bench: DataFrame,
      idCol: String, vecCol: String, tau: Double, dir: String,
      checkpointDir: String)
      : DataStreamWriter[org.apache.spark.sql.Row] =
    arrivals
      .select(col(idCol), col(vecCol))
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        verifyLineage(batch.sparkSession, dir, checkpointDir, batchId,
          "flagged")
        graft.operators.VectorSearch.decontaminateByEmbedding(
            batch, bench, idCol, vecCol, tau)
          .repartition(1)
          .write.mode("overwrite")
          .parquet(s"$dir/flagged/batch_id=$batchId")
        ()
      }

  /** Fold the stream-maintained decontamination report (and an
    * optional standing dir in the same `flagged` layout — plain OR
    * `batch_id=N`-partitioned; reads are projected to the report
    * columns first) into the exact (train_id, bench_id, cosine) frame
    * the batch q263 operator emits. The fold is a DISTINCT, not a
    * sum: per-train rows are idempotent facts (a re-delivered train
    * row carries the identical vector under the at-least-once
    * contract, so its re-scored row is bit-identical — two landed
    * copies collapse; a same-id row with a DIFFERENT vector is an
    * upstream key violation, not a fold case). */
  def readDecontamState(spark: org.apache.spark.sql.SparkSession,
      streamDir: String, standingDir: Option[String]): DataFrame = {
    val parts = spark.read.parquet(s"$streamDir/flagged")
      .select(col("train_id"), col("bench_id"), col("cosine"))
    standingDir.map(sd => spark.read.parquet(s"$sd/flagged")
        .select(col("train_id"), col("bench_id"), col("cosine"))
        .unionByName(parts)).getOrElse(parts)
      .distinct()
  }

  private def verifyLineage(spark: org.apache.spark.sql.SparkSession,
      dir: String, checkpointDir: String, batchId: Long,
      partsSubdir: String): Unit = {
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val marker = new org.apache.hadoop.fs.Path(s"$dir/_lineage")
    if (fs.exists(marker)) {
      val in = fs.open(marker)
      val owner = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      if (owner != checkpointDir)
        throw new IllegalStateException(
          s"index dir $dir belongs to checkpoint '$owner', not " +
            s"'$checkpointDir': a different checkpoint cannot extend it " +
            "(its dedup state is gone); rebuild or archive the standing index")
    } else {
      val docsPath = new org.apache.hadoop.fs.Path(s"$dir/$partsSubdir")
      val hasPartitions = fs.exists(docsPath) && fs.listStatus(docsPath)
        .exists(s => s.isDirectory && s.getPath.getName.startsWith("batch_id="))
      if (batchId == 0L && hasPartitions)
        throw new IllegalStateException(
          s"refusing epoch 0 into index dir $dir of unknown lineage " +
            "(landed partitions but no _lineage marker); rebuild or " +
            "archive the standing index")
      val out = fs.create(marker, true)
      try out.write(checkpointDir.getBytes("UTF-8")) finally out.close()
    }
  }
}
