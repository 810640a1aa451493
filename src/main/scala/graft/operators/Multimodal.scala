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

  /** Per-image decoded pixel statistics (q53): exact long channel sums
    * divided once into doubles — bit-reproducible by integer-arithmetic
    * oracles. width/height as Long to match SQL BIGINT arithmetic. */
  case class ImageStats(doc_id: Long, width: Long, height: Long,
      mean_r: Double, mean_g: Double, mean_b: Double)

  /** One decoded raster image: RGB-interleaved bytes, maxval 255. */
  case class DecodedImage(width: Int, height: Int, pixels: Array[Byte])

  /** Per-clip decoded PCM statistics (q63): exact long sums divided once
    * into doubles; `rms` is one IEEE-correctly-rounded sqrt of that — all
    * bit-reproducible by integer-arithmetic oracles. */
  case class AudioStats(doc_id: Long, sample_rate: Long, n_samples: Long,
      mean_amp: Double, peak_amp: Long, rms: Double, zero_crossings: Long)

  /**
   * Codec boundary — the ONLY place that interprets payload bytes.
   *
   * `image/ppm` decodes FOR REAL: binary PPM (the netpbm P6 format —
   * ASCII header `P6 <w> <h> <maxval>` with `#` comments, then raw RGB
   * triplets) is simple enough to parse in pure Scala with no codec
   * jars, so the decode→features→ANN chain runs on genuinely decoded
   * pixel bytes end to end. Malformed payloads THROW — callers route
   * them through the dead-letter discipline like every other parse
   * boundary in the engine.
   *
   * Other modalities (JPEG, audio, video) still fall back to
   * deterministic fixed-size chunking: their codecs (javax.imageio,
   * ffmpeg bindings) are not available offline. The plumbing — schema,
   * batch shape, partitioning, encoders — is identical either way; swap
   * the fallback for a real codec in production without touching any
   * operator.
   */
  object MediaCodec {

    /** Decode: real PPM parse for `image/ppm` (the pixel plane is the
      * single frame); fixed-size chunking for still-opaque modalities. */
    def decode(mediaType: String, content: Array[Byte], frameBytes: Int): Iterator[Array[Byte]] =
      if (mediaType == "image/ppm") Iterator.single(decodePpm(content).pixels)
      else content.grouped(frameBytes)

    private def isSpace(c: Byte): Boolean =
      c == ' ' || c == '\t' || c == '\n' || c == '\r'

    /** Strict binary-PPM (P6) parser: magic, three header ints with
      * whitespace/comment handling, maxval 255 only, exactly one
      * terminator byte, pixel payload sized w·h·3 with no trailing
      * garbage. Throws IllegalArgumentException on any violation. */
    def decodePpm(content: Array[Byte]): DecodedImage = {
      def fail(msg: String): Nothing =
        throw new IllegalArgumentException(s"malformed PPM: $msg")
      if (content.length < 2 || content(0) != 'P' || content(1) != '6')
        fail("missing P6 magic")
      var pos = 2
      def skipSpace(): Unit = {
        var more = true
        while (more && pos < content.length) {
          val c = content(pos)
          if (c == '#') { while (pos < content.length && content(pos) != '\n') pos += 1 }
          else if (isSpace(c)) pos += 1
          else more = false
        }
      }
      def headerInt(): Int = {
        skipSpace()
        val start = pos
        var v = 0L
        while (pos < content.length && content(pos) >= '0' && content(pos) <= '9') {
          v = v * 10 + (content(pos) - '0')
          if (v > Int.MaxValue) fail("header int overflow")
          pos += 1
        }
        if (pos == start) fail("expected integer in header")
        v.toInt
      }
      val w = headerInt(); val h = headerInt(); val maxval = headerInt()
      if (w <= 0 || h <= 0) fail(s"non-positive dims ${w}x$h")
      if (maxval != 255) fail(s"unsupported maxval $maxval")
      if (pos >= content.length || !isSpace(content(pos)))
        fail("missing header terminator")
      pos += 1
      val n = w.toLong * h * 3
      if (n > Int.MaxValue - pos) fail("pixel payload exceeds 2 GiB")
      if (content.length - pos != n) fail(
        s"pixel payload is ${content.length - pos} bytes, expected $n")
      DecodedImage(w, h,
        java.util.Arrays.copyOfRange(content, pos, pos + n.toInt))
    }

    /** Binary-PPM (P6) encoder, the parser's exact inverse. */
    def encodePpm(img: DecodedImage): Array[Byte] = {
      require(img.pixels.length == img.width * img.height * 3,
        s"pixel array ${img.pixels.length} != ${img.width}x${img.height}x3")
      s"P6\n${img.width} ${img.height}\n255\n".getBytes("US-ASCII") ++ img.pixels
    }

    /** Real nearest-neighbor image resize (pure, deterministic): output
      * pixel (x, y) samples source (⌊x·w/outW⌋, ⌊y·h/outH⌋). */
    def resizeImage(img: DecodedImage, outW: Int, outH: Int): DecodedImage = {
      require(outW > 0 && outH > 0, s"bad output dims ${outW}x$outH")
      val out = new Array[Byte](outW * outH * 3)
      var y = 0
      while (y < outH) {
        val sy = (y.toLong * img.height / outH).toInt
        var x = 0
        while (x < outW) {
          val si = (sy * img.width + (x.toLong * img.width / outW).toInt) * 3
          val di = (y * outW + x) * 3
          out(di) = img.pixels(si)
          out(di + 1) = img.pixels(si + 1)
          out(di + 2) = img.pixels(si + 2)
          x += 1
        }
        y += 1
      }
      DecodedImage(outW, outH, out)
    }

    /** Chunk resize for still-opaque modalities: deterministic
      * truncate-or-zero-pad to `outBytes` (contract stand-in; images use
      * [[resizeImage]]). */
    def resize(frame: Array[Byte], outBytes: Int): Array[Byte] =
      java.util.Arrays.copyOf(frame, outBytes)

    /** One decoded PCM clip: rate, interleaved 16-bit samples (mono here). */
    case class DecodedAudio(sampleRate: Int, samples: Array[Short])

    /** Strict RIFF/WAVE parser for 16-bit mono PCM — the audio analogue
      * of [[decodePpm]], pure Scala, no codec jars: RIFF magic + size,
      * WAVE tag, chunk walk tolerating extra chunks (LIST etc.), `fmt `
      * must say PCM (format 1), 1 channel, 16 bits; `data` length must
      * be even and match the remaining payload. Little-endian
      * throughout. Throws IllegalArgumentException on any violation —
      * callers dead-letter like every other parse boundary. */
    def decodeWav(content: Array[Byte]): DecodedAudio = {
      def fail(msg: String): Nothing =
        throw new IllegalArgumentException(s"malformed WAV: $msg")
      def u16(p: Int): Int = (content(p) & 0xff) | ((content(p + 1) & 0xff) << 8)
      def u32(p: Int): Long = (u16(p).toLong) | (u16(p + 2).toLong << 16)
      def tag(p: Int): String =
        if (p + 4 > content.length) fail("truncated chunk tag")
        else new String(content, p, 4, "US-ASCII")
      if (content.length < 12 || tag(0) != "RIFF") fail("missing RIFF magic")
      if (u32(4) != content.length - 8)
        fail(s"RIFF size ${u32(4)} != payload ${content.length - 8}")
      if (tag(8) != "WAVE") fail("missing WAVE tag")
      var pos = 12
      var rate = -1
      var samples: Array[Short] = null
      while (pos < content.length) {
        if (pos + 8 > content.length) fail("truncated chunk header")
        val id = tag(pos); val len = u32(pos + 4)
        if (len > content.length - pos - 8) fail(s"chunk $id overruns payload")
        val body = pos + 8
        id match {
          case "fmt " =>
            if (len < 16) fail(s"fmt chunk too short ($len)")
            if (u16(body) != 1) fail(s"not PCM (format ${u16(body)})")
            if (u16(body + 2) != 1) fail(s"not mono (${u16(body + 2)} channels)")
            if (u16(body + 14) != 16) fail(s"not 16-bit (${u16(body + 14)})")
            rate = u32(body + 4).toInt
            if (rate <= 0) fail(s"non-positive sample rate $rate")
          case "data" =>
            if (rate < 0) fail("data chunk before fmt")
            if (samples != null) fail("multiple data chunks")
            if (len % 2 != 0) fail(s"odd data length $len")
            val n = (len / 2).toInt
            // n == 0 would silently NaN every downstream mean/rms
            if (n == 0) fail("empty data chunk")
            samples = new Array[Short](n)
            var i = 0
            while (i < n) { samples(i) = u16(body + 2 * i).toShort; i += 1 }
          case _ => () // unknown chunks (LIST, fact, …) are legal; skip
        }
        pos = body + len.toInt + (len.toInt & 1) // chunks are word-aligned
      }
      if (samples == null) fail("no data chunk")
      DecodedAudio(rate, samples)
    }

    /** Canonical 44-byte-header WAV encoder (16-bit mono PCM), the
      * parser's exact inverse. */
    def encodeWav(audio: DecodedAudio): Array[Byte] = {
      require(audio.sampleRate > 0, s"bad sample rate ${audio.sampleRate}")
      val dataLen = audio.samples.length * 2
      val out = java.nio.ByteBuffer.allocate(44 + dataLen)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      out.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
        .put("WAVE".getBytes("US-ASCII"))
      out.put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1).putShort(1) // PCM, mono
        .putInt(audio.sampleRate).putInt(audio.sampleRate * 2)
        .putShort(2).putShort(16) // block align, bits
      out.put("data".getBytes("US-ASCII")).putInt(dataLen)
      audio.samples.foreach(out.putShort)
      out.array()
    }

    /** Real nearest-neighbor audio resample (the 1-D [[resizeImage]]):
      * output sample i takes source ⌊i·n/outN⌋. */
    def resampleAudio(audio: DecodedAudio, outN: Int, outRate: Int): DecodedAudio = {
      require(outN > 0 && outRate > 0, s"bad resample target $outN@$outRate")
      val n = audio.samples.length
      require(n > 0, "cannot resample empty clip")
      val out = new Array[Short](outN)
      var i = 0
      while (i < outN) {
        out(i) = audio.samples((i.toLong * n / outN).toInt)
        i += 1
      }
      DecodedAudio(outRate, out)
    }

    /** Deterministic synthetic clip for docId — the audio producer
      * stand-in, mirrored by the q63 oracle: 8 kHz mono,
      * n = 64 + id%49 samples, sample i = (31·id + 17·i) mod 4001 − 2000. */
    def syntheticAudio(docId: Long): DecodedAudio = {
      require(docId >= 0, s"docId must be non-negative, got $docId")
      val n = (64 + docId % 49).toInt
      val s = new Array[Short](n)
      var i = 0
      while (i < n) {
        s(i) = ((docId * 31 + i.toLong * 17) % 4001 - 2000).toShort
        i += 1
      }
      DecodedAudio(8000, s)
    }

    /** Deterministic synthetic image for docId — the upstream producer
      * stand-in, arithmetic simple enough for the q53 DuckDB oracle to
      * mirror exactly: w = 4 + id%5, h = 3 + id%4, pixel i channels
      * (7id+3i, 11id+5i, 13id+7i) mod 256. */
    def syntheticImage(docId: Long): DecodedImage = {
      require(docId >= 0, s"docId must be non-negative, got $docId")
      val w = (4 + docId % 5).toInt
      val h = (3 + docId % 4).toInt
      val px = new Array[Byte](w * h * 3)
      var i = 0
      while (i < w * h) {
        px(3 * i) = ((docId * 7 + i.toLong * 3) % 256).toByte
        px(3 * i + 1) = ((docId * 11 + i.toLong * 5) % 256).toByte
        px(3 * i + 2) = ((docId * 13 + i.toLong * 7) % 256).toByte
        i += 1
      }
      DecodedImage(w, h, px)
    }
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
   * Decode images and emit per-channel pixel statistics — the REAL
   * decode path (mapPartitions over [[MediaCodec.decodePpm]]'d bytes),
   * narrow and shuffle-free like [[decodeFrames]]. Channel sums are
   * exact longs (≤ 255·w·h ≪ 2^53); the single double division per
   * channel is bit-reproducible by any engine doing the same integer
   * arithmetic, which is what lets q53 oracle-gate a binary decoder.
   */
  def imageStats(files: Dataset[MediaFile]): Dataset[ImageStats] = {
    import files.sparkSession.implicits._
    files.mapPartitions { batch =>
      batch.map { f =>
        val img = MediaCodec.decodePpm(f.content)
        val n = img.width * img.height
        var sr = 0L; var sg = 0L; var sb = 0L
        var i = 0
        while (i < n) {
          sr += img.pixels(3 * i) & 0xff
          sg += img.pixels(3 * i + 1) & 0xff
          sb += img.pixels(3 * i + 2) & 0xff
          i += 1
        }
        ImageStats(f.doc_id, img.width.toLong, img.height.toLong,
          sr.toDouble / n, sg.toDouble / n, sb.toDouble / n)
      }
    }
  }

  /** One image patch's exact channel sums (q160): the patch grid is the
    * ViT tokenization geometry — patch (row, col) covers pixels
    * [col·P, min(col·P+P, w)) × [row·P, min(row·P+P, h)); edge patches
    * are smaller, never padded (padding would fabricate pixel values —
    * a patch EMBEDDER pads, a patch STATISTIC must not). All-integer
    * output: hash-gateable with no float in sight. */
  case class PatchStats(doc_id: Long, patch_row: Long, patch_col: Long,
      n_px: Long, sum_r: Long, sum_g: Long, sum_b: Long, luma_milli: Long)

  /**
   * Patchify decoded images and emit per-patch exact statistics — the
   * Spark-side geometry of ViT-style patch tokenization (decode →
   * P×P grid → per-patch feature), with the real pure-Scala PPM decode
   * at the same narrow typed mapPartitions codec boundary as
   * [[imageStats]]: one PatchStats row per patch leaves the scan, the
   * image bytes never shuffle, and the per-image fan-out is
   * ⌈w/P⌉·⌈h/P⌉ rows — bounded by image geometry, not corpus size.
   * luma_milli is the ITU-R BT.601 integer form
   * Σ(299·r + 587·g + 114·b) over the patch — exact longs end to end,
   * so the oracle can re-derive every cell from the generating
   * arithmetic and a hash match proves decode, grid arithmetic and
   * channel sums all at once.
   */
  def imagePatches(files: Dataset[MediaFile],
      patch: Int): Dataset[PatchStats] = {
    require(patch >= 1, s"patch size must be >= 1, got $patch")
    import files.sparkSession.implicits._
    files.mapPartitions { batch =>
      batch.flatMap { f =>
        val img = MediaCodec.decodePpm(f.content)
        val rows = (img.height + patch - 1) / patch
        val cols = (img.width + patch - 1) / patch
        for {
          pr <- (0 until rows).iterator
          pc <- 0 until cols
        } yield {
          var sr = 0L; var sg = 0L; var sb = 0L; var n = 0L
          var y = pr * patch
          val yEnd = math.min(y + patch, img.height)
          while (y < yEnd) {
            var x = pc * patch
            val xEnd = math.min(x + patch, img.width)
            while (x < xEnd) {
              val i = y * img.width + x
              sr += img.pixels(3 * i) & 0xff
              sg += img.pixels(3 * i + 1) & 0xff
              sb += img.pixels(3 * i + 2) & 0xff
              n += 1
              x += 1
            }
            y += 1
          }
          PatchStats(f.doc_id, pr.toLong, pc.toLong, n, sr, sg, sb,
            299L * sr + 587L * sg + 114L * sb)
        }
      }
    }
  }

  /**
   * Decode WAV clips and emit per-clip PCM statistics — the audio twin of
   * [[imageStats]]: narrow typed mapPartitions over
   * [[MediaCodec.decodeWav]]'d bytes, shuffle-free. Sums are exact longs
   * (|sample| ≤ 32768 ⇒ sums ≪ 2^53 at any clip length that fits memory);
   * each mean is one double division and `rms` one sqrt — IEEE
   * correctly-rounded in every engine, which is what lets q63 oracle-gate
   * a binary audio decoder. A zero-crossing is a sign change
   * (`sample ≥ 0` vs `< 0`) between consecutive samples.
   */
  def audioStats(files: Dataset[MediaFile]): Dataset[AudioStats] = {
    import files.sparkSession.implicits._
    files.mapPartitions { batch =>
      batch.map { f =>
        val clip = MediaCodec.decodeWav(f.content)
        val n = clip.samples.length
        var sum = 0L; var sumSq = 0L; var peak = 0L; var zc = 0L
        var i = 0
        while (i < n) {
          val s = clip.samples(i).toLong
          sum += s; sumSq += s * s
          if (math.abs(s) > peak) peak = math.abs(s)
          if (i > 0 && (s >= 0) != (clip.samples(i - 1) >= 0)) zc += 1
          i += 1
        }
        AudioStats(f.doc_id, clip.sampleRate.toLong, n.toLong,
          sum.toDouble / n, peak,
          math.sqrt(sumSq.toDouble / n), zc)
      }
    }
  }

  /**
   * Frame-energy voice-activity segmentation over REAL-decoded WAV PCM —
   * the speech-data curation primitive (how much of this clip is signal,
   * in how many bursts, how long is the longest one) that gates
   * transcription-corpus admission the way q28's quality features gate
   * text. Frames of `frameSize` samples (last frame partial), energy =
   * Σx² exact long, voiced = energy ≥ threshold; segments are maximal
   * voiced runs. Pure integer outputs (+ one floor-ppm ratio), so the
   * DuckDB oracle re-derives every number from the clip-generating
   * arithmetic — a match proves decode, framing, thresholding and run
   * detection all exact (the q53/q63 codec-query discipline).
   *
   * Scale shape: same narrow typed mapPartitions boundary as
   * [[audioStats]] — one stats row per clip leaves the codec scan,
   * audio bytes never shuffle; the whole VAD walk is a single in-memory
   * pass per clip.
   */
  case class VadStats(doc_id: Long, n_frames: Long, n_voiced: Long,
      n_segments: Long, longest_run: Long, voiced_ppm: Long)

  def audioVad(files: Dataset[MediaFile], frameSize: Int,
      energyThreshold: Long): Dataset[VadStats] = {
    import files.sparkSession.implicits._
    require(frameSize > 0)
    files.mapPartitions { batch =>
      batch.map { f =>
        val clip = MediaCodec.decodeWav(f.content)
        val n = clip.samples.length
        val nf = (n + frameSize - 1) / frameSize
        var voiced = 0L; var segs = 0L; var longest = 0L
        var run = 0L; var prevVoiced = false
        var fi = 0
        while (fi < nf) {
          var e = 0L
          var i = fi * frameSize
          val end = math.min(i + frameSize, n)
          while (i < end) {
            val s = clip.samples(i).toLong; e += s * s; i += 1
          }
          val v = e >= energyThreshold
          if (v) {
            voiced += 1
            if (!prevVoiced) { segs += 1; run = 0L }
            run += 1
            if (run > longest) longest = run
          }
          prevVoiced = v
          fi += 1
        }
        VadStats(f.doc_id, nf.toLong, voiced, segs, longest,
          if (nf > 0) 1000000L * voiced / nf else 0L)
      }
    }
  }

  /**
   * Decoded-PCM features for the ANN path — the audio twin of
   * [[imagePixelFeatures]]: nearest-neighbor resample to a fixed length
   * ([[MediaCodec.resampleAudio]]) so every clip yields the same-length
   * vector, then scale to [-1, 1) floats. Plugs into VectorSearch
   * unchanged.
   */
  def audioPcmFeatures(files: Dataset[MediaFile], outN: Int = 64): Dataset[MediaFeature] = {
    import files.sparkSession.implicits._
    files.mapPartitions { batch =>
      batch.map { f =>
        val clip = MediaCodec.resampleAudio(MediaCodec.decodeWav(f.content), outN, 8000)
        val v = new Array[Float](outN)
        var i = 0
        while (i < outN) { v(i) = clip.samples(i) / 32768f; i += 1 }
        MediaFeature(f.doc_id, f.media_type, f.content.length.toLong, v)
      }
    }
  }

  /**
   * Decoded-pixel features for the ANN path: resize to a fixed raster
   * (nearest-neighbor, [[MediaCodec.resizeImage]]) so every image yields
   * the same-length vector, then scale bytes to [0, 1) floats. Real
   * decode → real resample → VectorSearch-composable vector.
   */
  def imagePixelFeatures(files: Dataset[MediaFile], outW: Int = 8,
      outH: Int = 8): Dataset[MediaFeature] = {
    import files.sparkSession.implicits._
    files.mapPartitions { batch =>
      batch.map { f =>
        val img = MediaCodec.resizeImage(MediaCodec.decodePpm(f.content), outW, outH)
        val v = new Array[Float](outW * outH * 3)
        var i = 0
        while (i < v.length) { v(i) = (img.pixels(i) & 0xff) / 256f; i += 1 }
        MediaFeature(f.doc_id, f.media_type, f.content.length.toLong, v)
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

  /** 64-bit perceptual hash split into two 32-bit halves (bit i of the
    * 8×8 grid lands in `h_lo` for i < 32, else `h_hi` at i − 32) — two
    * BIGINT-safe longs instead of one sign-contested 64-bit value, so
    * the integer-arithmetic oracle can rebuild both exactly. */
  case class ImageHash(doc_id: Long, h_hi: Long, h_lo: Long)

  /**
   * Average-hash (aHash) perceptual fingerprint from REAL decoded
   * pixels: P6 decode → 8×8 nearest-neighbor resize → integer grayscale
   * `(r+g+b) div 3` → threshold each cell against the floor-mean → 64
   * bits. Every step is integer arithmetic over decoded bytes, so the
   * hash is bit-reproducible by an oracle that recomputes it from the
   * image-generating formulas (the q53 codec-query discipline) — and
   * two images that differ by resize-invisible noise land on nearby
   * hashes, which is what makes hamming distance a near-dup metric for
   * images the way simhash is for text.
   *
   * Typed `mapPartitions` at the codec boundary (binary parsing is not
   * a Catalyst expression); one hash row per image leaves the scan —
   * image bytes never shuffle.
   */
  def imageAHash(files: Dataset[MediaFile]): Dataset[ImageHash] = {
    import files.sparkSession.implicits._
    files.mapPartitions { batch =>
      batch.map { f =>
        val img = MediaCodec.resizeImage(MediaCodec.decodePpm(f.content), 8, 8)
        val gray = new Array[Int](64)
        var sum = 0L
        var i = 0
        while (i < 64) {
          gray(i) = ((img.pixels(3 * i) & 0xff) + (img.pixels(3 * i + 1) & 0xff) +
            (img.pixels(3 * i + 2) & 0xff)) / 3
          sum += gray(i)
          i += 1
        }
        val mean = sum / 64
        var hi = 0L; var lo = 0L
        i = 0
        while (i < 64) {
          if (gray(i) > mean) {
            if (i < 32) lo |= 1L << i else hi |= 1L << (i - 32)
          }
          i += 1
        }
        ImageHash(f.doc_id, hi, lo)
      }
    }
  }

  /**
   * Hamming near-duplicate pairs over an [[imageAHash]] frame — the
   * image twin of the simhash text pairing, same pigeonhole discipline:
   * split the 64 bits into 4 × 16-bit blocks; any pair within hamming
   * distance ≤ 3 shares at least one block EXACTLY, so candidates come
   * from an equality join on (block_idx, block_value) buckets — never a
   * row self-join — and the exact popcount distance filters them.
   * `maxBlockBucket` caps degenerate buckets (a constant-color corpus
   * would put every image in one bucket), mirrored in the oracle like
   * every skew cap in this engine.
   */
  def hammingNearDupPairs(hashes: DataFrame, maxDist: Int = 3,
      maxBlockBucket: Int = 100): DataFrame = {
    require(maxDist >= 0 && maxDist <= 3,
      s"4-block pigeonhole guarantees only maxDist <= 3, got $maxDist")
    // the sibling simhash pairing's validation: a cap below 2 silently
    // empties every bucket instead of failing fast
    require(maxBlockBucket >= 2 && maxBlockBucket <= 10000,
      s"maxBlockBucket in [2, 10000], got $maxBlockBucket")
    import org.apache.spark.sql.expressions.Window
    val blocks = hashes.select(col("doc_id"), col("h_hi"), col("h_lo"),
      posexplode(array(
        expr("h_lo % 65536"), expr("h_lo div 65536"),
        expr("h_hi % 65536"), expr("h_hi div 65536"))))
      .withColumnRenamed("pos", "blk").withColumnRenamed("col", "bval")
    val kept = blocks.withColumn("bucket_n",
      count(lit(1)).over(Window.partitionBy("blk", "bval")))
      .filter(col("bucket_n") <= maxBlockBucket)
    kept.as("a")
      .join(kept.as("b"),
        col("a.blk") === col("b.blk") && col("a.bval") === col("b.bval") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.h_hi").as("hi_a"), col("a.h_lo").as("lo_a"),
        col("b.h_hi").as("hi_b"), col("b.h_lo").as("lo_b"))
      .distinct()
      .withColumn("dist",
        bit_count(expr("hi_a ^ hi_b")) + bit_count(expr("lo_a ^ lo_b")))
      .filter(col("dist") <= maxDist)
      .select(col("doc_a"), col("doc_b"), col("dist").cast(LongType).as("dist"))
  }
}
