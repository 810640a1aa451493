package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal-column operators — the training-data-pipeline surface for
 * opaque media payloads (builder brief; absent from the reference, whose
 * only payload is the HFP telemetry struct, SURVEY §1.1).
 *
 * Design: media travels as an opaque `BinaryType` column plus a typed
 * metadata struct (`media_type`, `n_bytes`, `checksum`). Everything that
 * does NOT need to interpret the bytes — slicing, sampling, hashing,
 * metadata aggregation — is pure built-in expression composition
 * (substr/hex/md5/octet_length on binary are all codegen'd), so it runs
 * at scan speed and never leaves whole-stage codegen. Only genuine
 * per-byte interpretation (codec decode, feature extraction) drops to a
 * typed `Dataset.mapPartitions`, the Scala analogue of `mapInPandas`:
 * batch-shaped (one iterator per partition), shuffle-free, encoder-typed.
 *
 * 100 TB notes:
 *  - payload bytes never cross a shuffle: sampling/decoding are narrow
 *    per-partition transforms; aggregations ship only the metadata struct;
 *  - frame explode fans out rows but each output row carries a bounded
 *    `frameBytes` slice, so partition sizes stay proportional to input
 *    bytes — size `spark.sql.files.maxPartitionBytes` for the fan-out;
 *  - the decode stage is CPU-bound ⇒ scale executors, not shuffle width.
 */
object Multimodal {

  /** One media file: id + modality tag + opaque payload bytes. */
  case class MediaFile(doc_id: Long, media_type: String, content: Array[Byte])

  /** One decoded frame (image frame / audio chunk / video frame). */
  case class FrameRow(doc_id: Long, frame_idx: Int, n_bytes: Int, frame: Array[Byte])

  /** Extracted feature vector for the ANN path (VectorSearch). */
  case class MediaFeature(doc_id: Long, media_type: String, n_bytes: Long,
      features: Array[Float])

  /**
   * Codec boundary — the ONLY place that interprets payload bytes.
   *
   * STUB: real image/audio/video codecs (javax.imageio, ffmpeg bindings,
   * …) are not available in this environment. `decode` is a deterministic
   * fake — fixed-size chunking standing in for frame extraction — so the
   * Spark-side plumbing (schema, batch shape, partitioning, encoders) is
   * real and tested end-to-end; swap this object for a real codec in
   * production without touching any operator.
   */
  object MediaCodec {
    /** Fake decode: split the payload into `frameBytes` chunks (the last
      * chunk may be short). A real codec returns decoded frames here. */
    def decode(mediaType: String, content: Array[Byte], frameBytes: Int): Iterator[Array[Byte]] =
      content.grouped(frameBytes)

    /** Fake resize: deterministic truncate-or-zero-pad to `outBytes`. A
      * real implementation resamples pixels; the contract (fixed-size
      * output, pure function of input) is identical. */
    def resize(frame: Array[Byte], outBytes: Int): Array[Byte] =
      java.util.Arrays.copyOf(frame, outBytes)
  }

  /** Deterministic modality tag for the synthetic corpus (doc_id mod 3). */
  def mediaTypeOf(docId: Column): Column =
    when(docId % 3 === 0, "image")
      .when(docId % 3 === 1, "audio")
      .otherwise("video")

  /**
   * Attach an opaque binary payload + typed metadata struct to the
   * documents frame. On real data the payload column arrives from the
   * source (parquet/stream); here it is derived (UTF-8 bytes of `text`)
   * so the oracle can reproduce it.
   */
  def attachPayload(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"), col("source"),
      mediaTypeOf(col("doc_id")).as("media_type"),
      encode(col("text"), "UTF-8").as("payload"))
      .withColumn("meta", struct(
        octet_length(col("payload")).cast(LongType).as("n_bytes"),
        md5(col("payload")).as("checksum")))

  /**
   * Frame sampling, pure expressions: fixed `frameBytes` frames, keep
   * every `every`-th. The step-form `sequence(0, nFrames-1, every)`
   * generates ONLY the kept indices — un-kept frames are never
   * materialized, even as index rows — and the payload is sliced per
   * emitted row (binary substr is codegen'd). An empty payload yields
   * zero frames, the same convention as [[decodeFrames]]/
   * [[MediaCodec.decode]] (empty iterator from `grouped`).
   */
  def sampleFrames(withPayload: DataFrame, frameBytes: Int, every: Int): DataFrame = {
    require(frameBytes > 0, s"frameBytes must be positive, got $frameBytes")
    require(every > 0, s"every must be positive, got $every")
    val nFrames = ceil(octet_length(col("payload")).cast(DoubleType) / frameBytes)
      .cast(LongType)
    withPayload
      .select(col("doc_id"), col("payload"),
        explode(when(nFrames > 0,
          sequence(lit(0L), nFrames - 1, lit(every.toLong)))).as("frame_idx"))
      .select(col("doc_id"), col("frame_idx"),
        col("payload").substr(
          (col("frame_idx") * frameBytes + 1).cast(IntegerType), lit(frameBytes))
          .as("frame"))
  }

  /**
   * Decode stage: typed mapPartitions over media files → frames. Narrow
   * (no shuffle), batch-shaped (whole-partition iterator), encoder-typed;
   * the codec is the [[MediaCodec]] stub. Empty payloads produce zero
   * frames (same convention as [[sampleFrames]]).
   */
  def decodeFrames(files: Dataset[MediaFile], frameBytes: Int): Dataset[FrameRow] = {
    require(frameBytes > 0, s"frameBytes must be positive, got $frameBytes")
    import files.sparkSession.implicits._
    files.mapPartitions { batch =>
      batch.flatMap { f =>
        MediaCodec.decode(f.media_type, f.content, frameBytes).zipWithIndex.map {
          case (frame, i) => FrameRow(f.doc_id, i, frame.length, frame)
        }
      }
    }
  }

  /**
   * Feature extraction: L1-normalized byte histogram (`bins` buckets of
   * the 0–255 range) as `Array[Float]` — a real, deterministic feature
   * map whose output plugs directly into VectorSearch (knnBrute /
   * bucketedNearDupPairs). Swap the histogram for a model embedding in
   * production; the signature and batch shape are what matter.
   */
  def byteHistogramFeatures(files: Dataset[MediaFile], bins: Int = 64): Dataset[MediaFeature] = {
    import files.sparkSession.implicits._
    require(256 % bins == 0, s"bins must divide 256, got $bins")
    val width = 256 / bins
    files.mapPartitions { batch =>
      batch.map { f =>
        val h = new Array[Float](bins)
        var i = 0
        while (i < f.content.length) {
          h((f.content(i) & 0xff) / width) += 1f
          i += 1
        }
        if (f.content.length > 0) {
          var j = 0
          while (j < bins) { h(j) /= f.content.length.toFloat; j += 1 }
        }
        MediaFeature(f.doc_id, f.media_type, f.content.length.toLong, h)
      }
    }
  }
}
