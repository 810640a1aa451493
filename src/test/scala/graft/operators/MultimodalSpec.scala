package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.operators.Multimodal._
import graft.operators.VectorSearch

class MultimodalSpec extends SparkSuite {

  private def mediaFiles = {
    import spark.implicits._
    attachPayload(spark.read.parquet(s"${sf()}/documents.parquet"))
      .select(col("doc_id"), col("media_type"), col("payload").as("content"))
      .as[MediaFile]
  }

  test("attachPayload: metadata struct matches payload bytes") {
    val rows = attachPayload(spark.read.parquet(s"${sf()}/documents.parquet"))
      .select(col("payload"), col("meta.n_bytes"), col("meta.checksum"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Array[Byte]](0).length.toLong == r.getLong(1))
      assert(r.getString(2).matches("[0-9a-f]{32}"))
    }
  }

  test("decodeFrames: lossless chunking, frame count = ceil(bytes/frameBytes)") {
    import spark.implicits._
    val files = mediaFiles
    val frames = decodeFrames(files, frameBytes = 16)
    val recon = frames.groupByKey(_.doc_id)
      .mapGroups { (id, fs) =>
        val sorted = fs.toSeq.sortBy(_.frame_idx)
        (id, sorted.map(_.n_bytes).sum, sorted.flatMap(_.frame).toArray)
      }.collect().map { case (id, n, bytes) => id -> ((n, bytes)) }.toMap
    val originals = files.collect()
    originals.foreach { f =>
      val (n, bytes) = recon(f.doc_id)
      assert(n == f.content.length)
      assert(java.util.Arrays.equals(bytes, f.content),
        s"doc ${f.doc_id} reassembled bytes differ")
    }
    val counts = frames.groupBy("doc_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    originals.foreach { f =>
      assert(counts(f.doc_id) == (f.content.length + 15) / 16)
    }
  }

  test("decodeFrames is a narrow transform: partition count preserved") {
    val files = mediaFiles.repartition(3)
    assert(decodeFrames(files, 16).rdd.getNumPartitions == 3)
  }

  test("sampleFrames expression path agrees with the typed decode path") {
    import spark.implicits._
    val withPayload = attachPayload(spark.read.parquet(s"${sf()}/documents.parquet"))
    val exprFrames = sampleFrames(withPayload, frameBytes = 16, every = 4)
      .select(col("doc_id"), col("frame_idx"), lower(hex(col("frame"))).as("h"))
      .as[(Long, Long, String)].collect().toSet
    val typedFrames = decodeFrames(mediaFiles, 16)
      .filter(_.frame_idx % 4 == 0)
      .map(f => (f.doc_id, f.frame_idx.toLong,
        f.frame.map("%02x".format(_)).mkString))
      .collect().toSet
    assert(exprFrames == typedFrames)
  }

  test("byteHistogramFeatures: L1-normalized, deterministic, ANN-composable") {
    import spark.implicits._
    val feats = byteHistogramFeatures(mediaFiles, bins = 64)
    val rows = feats.collect()
    assert(rows.nonEmpty)
    rows.foreach { f =>
      assert(f.features.length == 64)
      assert(math.abs(f.features.sum - 1f) < 1e-4, s"doc ${f.doc_id} not normalized")
    }
    // deterministic across runs
    assert(byteHistogramFeatures(mediaFiles, bins = 64).collect()
      .map(_.features.toSeq).toSet == rows.map(_.features.toSeq).toSet)
    // features feed the similarity-search path unchanged
    val fdf = feats.toDF().select(col("doc_id").as("vec_id"),
      col("features").as("embedding"))
    val knn = VectorSearch.knnBrute(fdf, fdf.filter(col("vec_id") === 0),
      "vec_id", "embedding", k = 3)
    assert(knn.count() == 3)
  }

  test("empty payload yields zero frames on both paths; non-positive frameBytes rejected") {
    import spark.implicits._
    val files = Seq(MediaFile(1L, "image", Array.empty[Byte])).toDS()
    assert(decodeFrames(files, 16).count() === 0)
    val df = files.toDF().select(col("doc_id"), col("content").as("payload"))
    assert(sampleFrames(df, 16, 4).count() === 0)
    intercept[IllegalArgumentException](sampleFrames(df, 0, 4))
    intercept[IllegalArgumentException](decodeFrames(files, -1))
  }

  test("media -> features -> ANN end to end: duplicated payload's top-1 is its original at cosine 1") {
    import spark.implicits._
    val dups = mediaFiles.filter(_.doc_id % 100 == 0)
      .map(f => f.copy(doc_id = f.doc_id + 100000))
    val feats = byteHistogramFeatures(mediaFiles.union(dups), bins = 64).toDF()
      .select(col("doc_id").as("vec_id"), col("features").as("embedding"))
    val queries = feats.filter(col("vec_id") >= 100000)
    val top1 = VectorSearch.knnBrute(feats, queries, "vec_id", "embedding", k = 1)
      .collect()
    assert(top1.length === queries.count())
    top1.foreach { r =>
      assert(r.getAs[Long]("neighbor_id") === r.getAs[Long]("query_id") - 100000)
      assert(math.abs(r.getAs[Double]("cosine") - 1.0) < 1e-9)
    }
  }

  test("MediaCodec.resize stub: fixed-size deterministic output") {
    val in = Array[Byte](1, 2, 3)
    assert(MediaCodec.resize(in, 5).toSeq == Seq[Byte](1, 2, 3, 0, 0))
    assert(MediaCodec.resize(in, 2).toSeq == Seq[Byte](1, 2))
  }

  test("PPM codec: encode/decode round-trip, header whitespace+comments, malformed rejected") {
    val img = MediaCodec.syntheticImage(42L)
    val back = MediaCodec.decodePpm(MediaCodec.encodePpm(img))
    assert(back.width === img.width && back.height === img.height)
    assert(java.util.Arrays.equals(back.pixels, img.pixels))
    // a header another producer might write: comments and mixed whitespace
    val liberal = "P6 # a comment\n# another\n  2\t1 # dims\n255\n".getBytes("US-ASCII") ++
      Array[Byte](1, 2, 3, 4, 5, 6)
    val dec = MediaCodec.decodePpm(liberal)
    assert((dec.width, dec.height) === (2, 1))
    assert(dec.pixels.toSeq === Seq[Byte](1, 2, 3, 4, 5, 6))
    // every malformation fails loudly (dead-letter discipline)
    def bad(bytes: Array[Byte]) =
      intercept[IllegalArgumentException](MediaCodec.decodePpm(bytes))
    bad("P5\n1 1\n255\n".getBytes ++ Array[Byte](0, 0, 0))          // wrong magic
    bad("P6\n1 1\n65535\n".getBytes ++ Array[Byte](0, 0, 0))       // 16-bit maxval
    bad("P6\n2 1\n255\n".getBytes ++ Array[Byte](1, 2, 3))         // truncated pixels
    bad("P6\n1 1\n255\n".getBytes ++ Array[Byte](1, 2, 3, 4))      // trailing bytes
    bad("P6\n0 1\n255\n".getBytes)                                 // zero dim
    bad("P6\nx 1\n255\n".getBytes)                                 // non-numeric
  }

  test("nearest-neighbor resizeImage: identity at same size, constant image stays constant") {
    val img = MediaCodec.syntheticImage(7L)
    val same = MediaCodec.resizeImage(img, img.width, img.height)
    assert(java.util.Arrays.equals(same.pixels, img.pixels))
    val const = Multimodal.DecodedImage(3, 3, Array.fill(27)(17.toByte))
    val up = MediaCodec.resizeImage(const, 5, 4)
    assert(up.pixels.forall(_ == 17.toByte) && up.pixels.length === 60)
    // downsample picks source pixels, never invents values
    val down = MediaCodec.resizeImage(img, 2, 1)
    assert(down.pixels.length === 6)
  }

  test("real decode chain: decoded-pixel features -> ANN finds the duplicated image at cosine 1") {
    import spark.implicits._
    val ids = spark.range(0, 200).as[Long]
    val files = ids.map(id => MediaFile(id, "image/ppm",
      MediaCodec.encodePpm(MediaCodec.syntheticImage(id))))
    // duplicate every 20th image under a new id: after REAL decode +
    // resample, its pixel-feature vector must be identical to the source
    val dups = ids.filter(_ % 20 == 0).map(id => MediaFile(id + 100000, "image/ppm",
      MediaCodec.encodePpm(MediaCodec.syntheticImage(id))))
    val feats = imagePixelFeatures(files.union(dups)).toDF()
      .select(col("doc_id").as("vec_id"), col("features").as("embedding"))
    val top1 = VectorSearch.knnBrute(feats, feats.filter(col("vec_id") >= 100000),
      "vec_id", "embedding", k = 1).collect()
    assert(top1.length === 10)
    top1.foreach { r =>
      assert(r.getAs[Long]("neighbor_id") === r.getAs[Long]("query_id") - 100000)
      assert(math.abs(r.getAs[Double]("cosine") - 1.0) < 1e-9)
    }
    // and the decode is genuinely exercised: imageStats decodes the same
    // bytes and reproduces the generator's channel means exactly
    val st = imageStats(files).filter(_.doc_id == 42L).head()
    val img = MediaCodec.syntheticImage(42L)
    val n = img.width * img.height
    val sr = (0 until n).map(i => img.pixels(3 * i) & 0xff).sum
    assert(st.width === img.width.toLong)
    assert(st.mean_r === sr.toDouble / n)
  }

  test("WAV codec: encode/decode round-trip, extra chunks skipped, malformed rejected") {
    import MediaCodec._
    val clip = DecodedAudio(8000, Array[Short](0, 100, -200, 32767, -32768, 5))
    val wav = encodeWav(clip)
    val back = decodeWav(wav)
    assert(back.sampleRate === 8000)
    assert(back.samples.toSeq === clip.samples.toSeq)
    // an unknown chunk between fmt and data is legal RIFF and must be
    // skipped (with word alignment for odd-length bodies)
    val extra = java.nio.ByteBuffer.allocate(wav.length + 8 + 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    extra.put(wav, 0, 36) // RIFF..fmt chunk (size patched below)
    extra.put("LIST".getBytes("US-ASCII")).putInt(3)
      .put(Array[Byte](1, 2, 3, 0)) // 3-byte body + pad byte
    extra.put(wav, 36, wav.length - 36)
    val withExtra = extra.array()
    val newSize = withExtra.length - 8
    withExtra(4) = (newSize & 0xff).toByte
    withExtra(5) = ((newSize >> 8) & 0xff).toByte
    withExtra(6) = ((newSize >> 16) & 0xff).toByte
    withExtra(7) = ((newSize >> 24) & 0xff).toByte
    assert(decodeWav(withExtra).samples.toSeq === clip.samples.toSeq)
    // malformed payloads throw (the dead-letter contract)
    def rejects(mutate: Array[Byte] => Array[Byte]): Unit =
      intercept[IllegalArgumentException](decodeWav(mutate(wav.clone())))
    rejects { b => b(0) = 'X'; b }                         // bad magic
    rejects { b => b(20) = 3; b }                          // non-PCM format
    rejects { b => b(22) = 2; b }                          // stereo
    rejects { b => b(34) = 8; b }                          // 8-bit
    rejects(b => java.util.Arrays.copyOf(b, b.length - 1)) // truncated (RIFF size mismatch)
    rejects(_ => encodeWav(clip).take(44))                 // header only, data chunk overruns
  }

  test("audioStats decodes real WAV bytes and reproduces the generator arithmetic") {
    import spark.implicits._
    val files = spark.range(0, 100).as[Long]
      .map(id => MediaFile(id, "audio/wav",
        MediaCodec.encodeWav(MediaCodec.syntheticAudio(id))))
    val st = audioStats(files).filter(_.doc_id == 7L).head()
    val clip = MediaCodec.syntheticAudio(7L)
    val n = clip.samples.length
    assert(st.n_samples === n.toLong)
    assert(st.mean_amp === clip.samples.map(_.toLong).sum.toDouble / n)
    assert(st.peak_amp === clip.samples.map(s => math.abs(s.toLong)).max)
    assert(st.zero_crossings === (1 until n).count(i =>
      (clip.samples(i) >= 0) != (clip.samples(i - 1) >= 0)).toLong)
  }

  test("audio decode chain: resampled PCM features -> ANN finds the duplicated clip at cosine 1") {
    import spark.implicits._
    val ids = spark.range(0, 200).as[Long]
    val files = ids.map(id => MediaFile(id, "audio/wav",
      MediaCodec.encodeWav(MediaCodec.syntheticAudio(id))))
    val dups = ids.filter(_ % 20 == 0).map(id => MediaFile(id + 100000, "audio/wav",
      MediaCodec.encodeWav(MediaCodec.syntheticAudio(id))))
    val feats = audioPcmFeatures(files.union(dups)).toDF()
      .select(col("doc_id").as("vec_id"), col("features").as("embedding"))
    val top1 = VectorSearch.knnBrute(feats, feats.filter(col("vec_id") >= 100000),
      "vec_id", "embedding", k = 1).collect()
    assert(top1.length === 10)
    top1.foreach { r =>
      assert(r.getAs[Long]("neighbor_id") === r.getAs[Long]("query_id") - 100000)
      assert(math.abs(r.getAs[Double]("cosine") - 1.0) < 1e-9)
    }
  }

  test("imageAHash: byte-identical images hash identically; a constant-" +
      "color image hashes to zero (no cell exceeds the mean)") {
    import spark.implicits._
    val flat = DecodedImage(4, 4, Array.fill(48)(100.toByte))
    val a = MediaCodec.syntheticImage(7L)
    val files = Seq(
      MediaFile(1L, "image/ppm", MediaCodec.encodePpm(a)),
      MediaFile(2L, "image/ppm", MediaCodec.encodePpm(a)),
      MediaFile(3L, "image/ppm", MediaCodec.encodePpm(flat))).toDS()
    val h = imageAHash(files).collect().map(x => x.doc_id -> (x.h_hi, x.h_lo)).toMap
    assert(h(1L) == h(2L))
    assert(h(3L) == (0L, 0L))
  }

  test("hammingNearDupPairs: distance filter is exact — a block-sharing " +
      "pair beyond maxDist is rejected, a close pair kept") {
    import spark.implicits._
    // doc 2 differs from doc 1 in bit 0 only (dist 1); doc 3 shares
    // blocks 1-3 with doc 1 but differs in 8 bits of block 0 (dist 8)
    val hashes = Seq(
      (1L, 0L, 0L), (2L, 0L, 1L), (3L, 0L, 255L)).toDF("doc_id", "h_hi", "h_lo")
    val out = hammingNearDupPairs(hashes, maxDist = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getAs[Long]("dist")))
    // candidates include (1,3) and (2,3) via the intact blocks, but only
    // (1,2) survives the exact popcount filter
    assert(out.toSet == Set((1L, 2L, 1L)))
  }

  test("hammingNearDupPairs: pigeonhole completeness at the boundary — " +
      "distance exactly 3 is always caught through the intact blocks") {
    import spark.implicits._
    // bits 0,1,2 differ (all inside block 0): blocks 1-3 still match
    val hashes = Seq((1L, 0L, 0L), (2L, 0L, 7L)).toDF("doc_id", "h_hi", "h_lo")
    val out = hammingNearDupPairs(hashes, maxDist = 3).collect()
    assert(out.length == 1 && out(0).getAs[Long]("dist") == 3L)
  }

  test("hammingNearDupPairs: hot block buckets are capped away (the " +
      "simhash discipline), lifting the cap restores the pairs") {
    import spark.implicits._
    val same = (1L to 5L).map(i => (i, 7L, 7L)).toDF("doc_id", "h_hi", "h_lo")
    assert(hammingNearDupPairs(same, 3, maxBlockBucket = 4).count() == 0L)
    assert(hammingNearDupPairs(same, 3, maxBlockBucket = 5).count() == 10L)
  }

  test("audioVad: hand-built loud/silent frame patterns segment " +
      "exactly — runs, counts, partial tail frame, all-silence clip") {
    import spark.implicits._
    // frame size 4, threshold 100. Clip 1: frames L L S L (run 2 + run
    // 1); clip 2: 10 samples → frames L S (partial, silent); clip 3:
    // all silence
    def clip(id: Long, frames: Seq[Boolean], tail: Int = 0): MediaFile = {
      val loud: Short = 50; val quiet: Short = 1
      val samples = frames.flatMap(v =>
        Seq.fill(4)(if (v) loud else quiet)) ++
        Seq.fill(tail)(quiet)
      MediaFile(id, "audio/wav", MediaCodec.encodeWav(
        MediaCodec.DecodedAudio(8000, samples.toArray)))
    }
    // 4·50² = 10000 ≥ 100 voiced; 4·1² = 4 < 100 silent; tail 2·1² < 100
    val files = Seq(
      clip(1L, Seq(true, true, false, true)),
      clip(2L, Seq(true), tail = 2),
      clip(3L, Seq(false, false))).toDS()
    val got = audioVad(files, 4, 100L).collect()
      .map(v => v.doc_id -> ((v.n_frames, v.n_voiced, v.n_segments,
        v.longest_run, v.voiced_ppm))).toMap
    assert(got(1L) == ((4L, 3L, 2L, 2L, 750000L)))
    assert(got(2L) == ((2L, 1L, 1L, 1L, 500000L)))
    assert(got(3L) == ((2L, 0L, 0L, 0L, 0L)))
  }

  test("imagePatches: a 3x2 image at patch 2 yields a 2x1 grid with an " +
      "edge-partial second row; channel sums conserve exactly") {
    import spark.implicits._
    // 3 wide x 2 tall: full patch (0,0) covers pixels (0,0),(1,0),
    // (0,1),(1,1); edge patch (0,1) covers (2,0),(2,1). Channel value =
    // pixel index i (r), 2i (g), 3i mod 256 (b), i = y*3+x.
    val px = new Array[Byte](3 * 2 * 3)
    for (i <- 0 until 6) {
      px(3 * i) = i.toByte
      px(3 * i + 1) = (2 * i).toByte
      px(3 * i + 2) = (3 * i).toByte
    }
    val img = DecodedImage(3, 2, px)
    val files = Seq(MediaFile(7L, "image/ppm",
      MediaCodec.encodePpm(img))).toDS()
    val got = imagePatches(files, 2).collect()
      .map(p => (p.patch_row, p.patch_col) -> p).toMap
    assert(got.keySet == Set((0L, 0L), (0L, 1L)))
    val full = got((0L, 0L))  // pixels i = 0,1,3,4
    assert((full.n_px, full.sum_r, full.sum_g, full.sum_b) ==
      ((4L, 8L, 16L, 24L)))
    assert(full.luma_milli == 299L * 8 + 587L * 16 + 114L * 24)
    val edge = got((0L, 1L))  // pixels i = 2,5
    assert((edge.n_px, edge.sum_r, edge.sum_g, edge.sum_b) ==
      ((2L, 7L, 14L, 21L)))
    // conservation: patch sums add back to the whole image's sums
    assert(full.sum_r + edge.sum_r == (0 until 6).sum)
  }

  test("imagePatches: patch larger than the image emits exactly one " +
      "patch covering everything") {
    import spark.implicits._
    val img = MediaCodec.syntheticImage(5L)
    val files = Seq(MediaFile(5L, "image/ppm",
      MediaCodec.encodePpm(img))).toDS()
    val got = imagePatches(files, 64).collect()
    assert(got.length == 1)
    assert(got(0).n_px == img.width.toLong * img.height)
  }
}
