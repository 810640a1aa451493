package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import Tables._
import graft.operators.Multimodal._

/**
 * Multimodal-column queries over `documents`, oracle-gated. The payload
 * is the UTF-8 bytes of `text` (the corpus is pure ASCII at every scale
 * factor — verified — so DuckDB's char-indexed `substring(text, …)`
 * slices the same bytes Spark's binary `substr(payload, …)` does, and
 * `length(text) = octet_length(encode(text))`). Hex is lower-cased on
 * both sides to erase the engines' case choice.
 */
object MultimodalQueries {

  /** q102 injection strata (copy = byte-identical image under a new id;
    * mutant = pixel-0 red channel shifted +128, a decisive perturbation)
    * and the hamming pairing geometry. */
  val PhCopyMod = 12L; val PhCopyShift = 200000L
  val PhMutMod = 18L; val PhMutShift = 250000L
  val PhMaxDist = 3; val PhBucketCap = 100

  /** q146 VAD geometry: 16-sample frames (2 ms at the 8 kHz synthetic
    * rate); the threshold sits at the mean frame energy of the ±2000
    * uniform-ish synthetic PCM (16·E[x²] ≈ 2.13e7), so frames split
    * both ways and the partial tail frame is usually silence. */
  val VadFrame = 16; val VadThreshold = 21000000L

  /** q160 patch edge (2 px): the 4-8 x 3-6 synthetic images yield 2x2
    * to 4x3 patch grids with genuine edge-partial patches. */
  val PatchPx = 2

  val all: Map[String, GraftQuery] = Map(

    // ------------------------------------------------------------------
    // q36 — metadata aggregation over opaque media payloads: binary
    // payload + typed meta struct (n_bytes, md5 checksum), rolled up per
    // modality. Only the metadata struct crosses the shuffle — payload
    // bytes stay at the scan.
    // ------------------------------------------------------------------
    "q36_media_meta" -> GraftQuery(
      build = (s, d) =>
        attachPayload(documents(s, d))
          .groupBy(col("media_type"))
          .agg(
            count(lit(1)).as("n_files"),
            sum(col("meta.n_bytes")).as("total_bytes"),
            max(col("meta.n_bytes")).as("max_bytes"),
            countDistinct(col("meta.checksum")).as("n_distinct_payloads"))
          .orderBy("media_type"),
      oracle = Some("""
        WITH p AS (SELECT doc_id,
            CASE WHEN doc_id % 3 = 0 THEN 'image'
                 WHEN doc_id % 3 = 1 THEN 'audio'
                 ELSE 'video' END AS media_type,
            CAST(length(text) AS BIGINT) AS n_bytes,
            md5(text) AS checksum
          FROM documents
          WHERE CASE WHEN octet_length(encode(text)) = length(text) THEN TRUE
                ELSE error('non-ASCII corpus: byte/char oracle equivalence broken') END)
        SELECT media_type, count(*) AS n_files,
          CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
          max(n_bytes) AS max_bytes,
          count(DISTINCT checksum) AS n_distinct_payloads
        FROM p GROUP BY media_type ORDER BY media_type""")),

    // ------------------------------------------------------------------
    // q37 — frame sampling: 16-byte frames, every 4th kept, emitted as
    // lower-hex. Binary substr/hex are codegen'd; un-kept frames are
    // never materialized. Bounded to doc_id < 64 to keep the verified
    // output small while exercising the full fan-out shape.
    // ------------------------------------------------------------------
    "q37_frame_sample" -> GraftQuery(
      build = (s, d) =>
        sampleFrames(
          attachPayload(documents(s, d)).filter(col("doc_id") < 64),
          frameBytes = 16, every = 4)
          .select(col("doc_id"), col("frame_idx"),
            octet_length(col("frame")).cast(LongType).as("frame_bytes"),
            lower(hex(col("frame"))).as("frame_hex"))
          .orderBy("doc_id", "frame_idx"),
      oracle = Some("""
        WITH p AS (SELECT doc_id, text FROM documents WHERE doc_id < 64
          AND CASE WHEN octet_length(encode(text)) = length(text) THEN TRUE
              ELSE error('non-ASCII corpus: byte/char oracle equivalence broken') END),
        f AS (SELECT doc_id, text,
            unnest(range(0, CAST(ceil(length(text) / 16.0) AS BIGINT), 4)) AS frame_idx
          FROM p)
        SELECT doc_id, frame_idx,
          CAST(length(substring(text, CAST(frame_idx * 16 + 1 AS BIGINT), 16)) AS BIGINT) AS frame_bytes,
          lower(hex(encode(substring(text, CAST(frame_idx * 16 + 1 AS BIGINT), 16)))) AS frame_hex
        FROM f ORDER BY doc_id, frame_idx""")),

    // ------------------------------------------------------------------
    // q53 — REAL image decode: deterministic binary PPM files (header +
    // raw RGB payload, generated per doc_id by the producer stand-in)
    // are parsed by the pure-Scala P6 codec inside a narrow typed
    // mapPartitions, and per-channel means come from the DECODED pixel
    // bytes. The oracle never sees the binary — it recomputes the same
    // channel sums from the generating arithmetic, so a hash match
    // proves header parse, payload slicing and byte decode are all
    // exact. Long sums, one double division: bit-equal across engines.
    // ------------------------------------------------------------------
    "q53_image_decode_stats" -> GraftQuery(
      build = (s, d) => {
        import s.implicits._
        val files = documents(s, d).select(col("doc_id")).as[Long]
          .map(id => MediaFile(id, "image/ppm",
            MediaCodec.encodePpm(MediaCodec.syntheticImage(id))))
        imageStats(files).toDF().orderBy("doc_id")
      },
      oracle = Some("""
        WITH g AS (SELECT doc_id, 4 + doc_id % 5 AS width,
            3 + doc_id % 4 AS height FROM documents)
        SELECT doc_id, width, height,
          CAST(list_sum(list_transform(range(0, width * height),
            i -> (doc_id * 7 + i * 3) % 256)) AS DOUBLE) / (width * height) AS mean_r,
          CAST(list_sum(list_transform(range(0, width * height),
            i -> (doc_id * 11 + i * 5) % 256)) AS DOUBLE) / (width * height) AS mean_g,
          CAST(list_sum(list_transform(range(0, width * height),
            i -> (doc_id * 13 + i * 7) % 256)) AS DOUBLE) / (width * height) AS mean_b
        FROM g ORDER BY doc_id""")),

    // ------------------------------------------------------------------
    // q63 — REAL audio decode: deterministic RIFF/WAVE files (44-byte
    // header + little-endian 16-bit PCM, generated per doc_id by the
    // producer stand-in) are parsed by the pure-Scala WAV codec inside a
    // narrow typed mapPartitions, and the per-clip amplitude stats come
    // from the DECODED samples. As with q53, the oracle never sees the
    // binary — it recomputes the same sums from the generating
    // arithmetic, so a hash match proves chunk walk, header fields and
    // sample decode are all exact. Long sums; mean/rms are one double
    // division (+ one correctly-rounded sqrt): bit-equal across engines.
    // ------------------------------------------------------------------
    "q63_audio_decode_stats" -> GraftQuery(
      build = (s, d) => {
        import s.implicits._
        val files = documents(s, d).select(col("doc_id")).as[Long]
          .map(id => MediaFile(id, "audio/wav",
            MediaCodec.encodeWav(MediaCodec.syntheticAudio(id))))
        audioStats(files).toDF().orderBy("doc_id")
      },
      oracle = Some("""
        WITH g AS (SELECT doc_id, 64 + doc_id % 49 AS n FROM documents),
        s AS (SELECT doc_id, n,
            list_transform(range(0, n),
              i -> (doc_id * 31 + i * 17) % 4001 - 2000) AS smp
          FROM g)
        SELECT doc_id, CAST(8000 AS BIGINT) AS sample_rate,
          CAST(n AS BIGINT) AS n_samples,
          CAST(list_sum(smp) AS DOUBLE) / n AS mean_amp,
          CAST(list_max(list_transform(smp, x -> abs(x))) AS BIGINT) AS peak_amp,
          sqrt(CAST(list_sum(list_transform(smp, x -> x * x)) AS DOUBLE) / n) AS rms,
          CAST(list_sum(list_transform(range(1, n),
            i -> CASE WHEN (smp[i + 1] >= 0) <> (smp[i] >= 0)
                 THEN 1 ELSE 0 END)) AS BIGINT) AS zero_crossings
        FROM s ORDER BY doc_id""")),

    // ------------------------------------------------------------------
    // q102 — perceptual-hash image dedup (Multimodal.imageAHash +
    // hammingNearDupPairs): the multimodal twin of simhash text dedup.
    // aHash runs on REAL decoded pixels (P6 parse → 8×8 nearest resize →
    // integer grayscale → floor-mean threshold → 64 bits), and pairs
    // come from 4×16-bit pigeonhole block buckets (hamming ≤ 3 shares a
    // block), never a row self-join. Byte-identical copies under new
    // ids must pair at distance 0; the pixel-shifted mutants land where
    // the arithmetic puts them — deterministically, because the oracle
    // recomputes hash bits, blocks, caps and popcounts from the image-
    // generating formulas (the q53/q63 codec-query discipline: a match
    // proves decode, resize indexing, bit assembly and distance all
    // exact). Image bytes never shuffle; one hash row per image leaves
    // the codec scan.
    // ------------------------------------------------------------------
    "q102_image_phash_dedup" -> GraftQuery(
      build = (s, d) => {
        import s.implicits._
        val ids = documents(s, d).select(col("doc_id")).as[Long]
        val files = ids.flatMap { id =>
          val base = MediaCodec.syntheticImage(id)
          val out = scala.collection.mutable.ArrayBuffer(
            MediaFile(id, "image/ppm", MediaCodec.encodePpm(base)))
          if (id % PhCopyMod == 0)
            out += MediaFile(id + PhCopyShift, "image/ppm",
              MediaCodec.encodePpm(base))
          if (id % PhMutMod == 0) {
            val px = base.pixels.clone()
            px(0) = ((id * 7 + 128) % 256).toByte
            out += MediaFile(id + PhMutShift, "image/ppm",
              MediaCodec.encodePpm(DecodedImage(base.width, base.height, px)))
          }
          out
        }
        hammingNearDupPairs(imageAHash(files).toDF(), PhMaxDist, PhBucketCap)
          .orderBy("doc_a", "doc_b")
      },
      oracle = Some(s"""
        WITH ids AS (SELECT doc_id FROM documents),
        base AS (
          SELECT doc_id, doc_id AS src, 0 AS mut FROM ids
          UNION ALL
          SELECT doc_id + $PhCopyShift, doc_id, 0 FROM ids
          WHERE doc_id % $PhCopyMod = 0
          UNION ALL
          SELECT doc_id + $PhMutShift, doc_id, 1 FROM ids
          WHERE doc_id % $PhMutMod = 0),
        dims AS (SELECT doc_id, src, mut, 4 + src % 5 AS w, 3 + src % 4 AS h
          FROM base),
        idx AS (SELECT doc_id, src, mut, list_transform(range(0, 64),
            o -> ((o // 8) * h // 8) * w + ((o % 8) * w // 8)) AS ii
          FROM dims),
        grays AS (SELECT doc_id, list_transform(ii, i ->
            ((CASE WHEN mut = 1 AND i = 0 THEN (src * 7 + 128) % 256
              ELSE (src * 7 + i * 3) % 256 END)
             + (src * 11 + i * 5) % 256
             + (src * 13 + i * 7) % 256) // 3) AS gr
          FROM idx),
        hm AS (SELECT doc_id, gr, list_sum(gr) // 64 AS mean FROM grays),
        hashes AS (SELECT doc_id,
            CAST(list_sum(list_transform(range(0, 32), o ->
              CASE WHEN gr[o + 1] > mean THEN (1::BIGINT << o)
              ELSE 0 END)) AS BIGINT) AS h_lo,
            CAST(list_sum(list_transform(range(32, 64), o ->
              CASE WHEN gr[o + 1] > mean THEN (1::BIGINT << (o - 32))
              ELSE 0 END)) AS BIGINT) AS h_hi
          FROM hm),
        blk AS (SELECT doc_id, h_hi, h_lo,
            unnest([0, 1, 2, 3]) AS blkidx,
            unnest([h_lo % 65536, h_lo // 65536,
              h_hi % 65536, h_hi // 65536]) AS bval
          FROM hashes),
        kept AS (SELECT doc_id, h_hi, h_lo, blkidx, bval FROM (
            SELECT *, count(*) OVER (PARTITION BY blkidx, bval) AS bn
            FROM blk) WHERE bn <= $PhBucketCap),
        cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
            a.h_hi AS hi_a, a.h_lo AS lo_a, b.h_hi AS hi_b, b.h_lo AS lo_b
          FROM kept a JOIN kept b ON a.blkidx = b.blkidx
            AND a.bval = b.bval AND a.doc_id < b.doc_id)
        SELECT doc_a, doc_b,
          CAST(bit_count(xor(hi_a, hi_b)) + bit_count(xor(lo_a, lo_b))
            AS BIGINT) AS dist
        FROM cand
        WHERE bit_count(xor(hi_a, hi_b)) + bit_count(xor(lo_a, lo_b))
          <= $PhMaxDist
        ORDER BY doc_a, doc_b""")),

    // ------------------------------------------------------------------
    // q146 — voice-activity segmentation over REAL-decoded WAV PCM
    // (Multimodal.audioVad): per-clip frame count, voiced frames,
    // segment count, longest voiced run and floor-ppm voiced ratio —
    // the speech-corpus admission gate beside q63's PCM stats. The
    // oracle re-derives every number from the clip-generating
    // arithmetic (q53/q63 codec-query discipline), so a match proves
    // WAV decode, 16-sample framing, Σx² energies, thresholding and
    // maximal-run detection all exact. One stats row per clip leaves
    // the typed mapPartitions codec scan; audio bytes never shuffle.
    // ------------------------------------------------------------------
    "q146_audio_vad" -> GraftQuery(
      build = (s, d) => {
        import s.implicits._
        val files = documents(s, d).select(col("doc_id")).as[Long]
          .map(id => MediaFile(id, "audio/wav",
            MediaCodec.encodeWav(MediaCodec.syntheticAudio(id))))
        audioVad(files, VadFrame, VadThreshold).toDF().orderBy("doc_id")
      },
      oracle = Some(s"""
        WITH g AS (SELECT doc_id, 64 + doc_id % 49 AS n FROM documents),
        s AS (SELECT doc_id, n, list_transform(range(0, n),
            i -> (doc_id * 31 + i * 17) % 4001 - 2000) AS smp
          FROM g),
        f AS (SELECT doc_id, n, (n + ${VadFrame - 1}) // $VadFrame AS nf,
            smp
          FROM s),
        e AS (SELECT doc_id, nf, list_transform(range(0, nf), fi ->
            list_sum(list_transform(
              smp[fi * $VadFrame + 1 : least((fi + 1) * $VadFrame, n)],
              x -> x * x)) >= $VadThreshold) AS vo
          FROM f),
        m AS (SELECT doc_id, CAST(nf AS BIGINT) AS n_frames,
            CAST(len(list_filter(vo, v -> v)) AS BIGINT) AS n_voiced,
            CAST(len(list_filter(range(1, nf + 1),
              i -> vo[i] AND (i = 1 OR NOT vo[i - 1]))) AS BIGINT)
              AS n_segments,
            CAST(coalesce(list_max(list_transform(range(1, nf + 1), i ->
              CASE WHEN vo[i] THEN i - coalesce(list_max(
                list_filter(range(1, i), j -> NOT vo[j])), 0)
              ELSE 0 END)), 0) AS BIGINT) AS longest_run
          FROM e)
        SELECT doc_id, n_frames, n_voiced, n_segments, longest_run,
          (1000000 * n_voiced) // n_frames AS voiced_ppm
        FROM m ORDER BY doc_id""")),

    // ------------------------------------------------------------------
    // q160 — image patchification (Multimodal.imagePatches): the ViT
    // tokenization geometry — REAL PPM decode → 2×2 patch grid →
    // per-patch exact channel sums + BT.601 integer luma — at the same
    // narrow typed mapPartitions codec boundary as q53 (one row per
    // patch leaves the scan, bytes never shuffle; fan-out bounded by
    // image geometry). Edge patches are smaller, never padded (a patch
    // EMBEDDER pads, a patch STATISTIC must not). The oracle re-derives
    // every cell from the generating arithmetic, so a hash match proves
    // decode, grid arithmetic and channel sums at once.
    // ------------------------------------------------------------------
    "q160_image_patches" -> GraftQuery(
      build = (s, d) => {
        import s.implicits._
        val files = documents(s, d).select(col("doc_id")).as[Long]
          .map(id => MediaFile(id, "image/ppm",
            MediaCodec.encodePpm(MediaCodec.syntheticImage(id))))
        imagePatches(files, PatchPx).toDF()
          .orderBy("doc_id", "patch_row", "patch_col")
      },
      oracle = Some(s"""
        WITH g AS (SELECT doc_id, 4 + doc_id % 5 AS w, 3 + doc_id % 4 AS h
          FROM documents),
        pp AS (SELECT doc_id, w, h,
            unnest(flatten(list_transform(range((h + $PatchPx - 1) // $PatchPx),
              pr -> list_transform(range((w + $PatchPx - 1) // $PatchPx),
                pc -> {'pr': pr, 'pc': pc})))) AS p
          FROM g),
        px AS (SELECT doc_id, p.pr AS pr, p.pc AS pc,
            flatten(list_transform(
              range($PatchPx * p.pr, least($PatchPx * p.pr + $PatchPx, h)),
              y -> list_transform(
                range($PatchPx * p.pc, least($PatchPx * p.pc + $PatchPx, w)),
                x -> y * w + x))) AS idxs
          FROM pp),
        st AS (SELECT doc_id, pr, pc, len(idxs) AS n_px,
            list_sum(list_transform(idxs, i -> (doc_id * 7 + i * 3) % 256))
              AS sum_r,
            list_sum(list_transform(idxs, i -> (doc_id * 11 + i * 5) % 256))
              AS sum_g,
            list_sum(list_transform(idxs, i -> (doc_id * 13 + i * 7) % 256))
              AS sum_b
          FROM px)
        SELECT doc_id, CAST(pr AS BIGINT) AS patch_row,
          CAST(pc AS BIGINT) AS patch_col, CAST(n_px AS BIGINT) AS n_px,
          CAST(sum_r AS BIGINT) AS sum_r, CAST(sum_g AS BIGINT) AS sum_g,
          CAST(sum_b AS BIGINT) AS sum_b,
          CAST(299 * sum_r + 587 * sum_g + 114 * sum_b AS BIGINT)
            AS luma_milli
        FROM st ORDER BY doc_id, patch_row, patch_col"""))
  )
}
