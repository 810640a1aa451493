package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

/**
 * STREAMING twin of the q85 corpus-build front half: the scan-level
 * gates (language allow-list, char floor, whitespace-token floor) plus
 * ingest-time exact dedup, composed over a document STREAM — the shape
 * a production corpus runs when documents arrive continuously instead
 * of as a nightly batch.
 *
 * Division of labor at scale (and in the spec's equivalence proof):
 * the stream maintains the KEEP-LIST — (content_hash, doc_id) of each
 * hash's first-seen document — which is exactly the landed doc-index
 * contract of the batch pipeline (TextDedup.landShingleIndex's `docs`
 * table). Only (hash, id) pairs ever cross the stateful shuffle; the
 * document bodies stay at the source, and the batch back half
 * (stratified mix → packing → bin stats, all corpus-order-insensitive)
 * runs over `corpus semi-join keep-list` whenever a training run is
 * cut. Gates run BEFORE the hash so suppressed languages/fragments
 * never enter dedup state.
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
    * `ttlMs <= 0` keeps markers forever — closed replay fixtures). */
  def keepList(docs: DataFrame, langs: Seq[String], minChars: Long,
      minTokens: Long, ttlMs: Long): Dataset[(String, Long)] =
    StatefulOps.streamDedupByHash(
      gate(docs, langs, minChars, minTokens)
        .select(md5(col("text")).as("content_hash"), col("doc_id")),
      "content_hash", "doc_id", ttlMs)
}
