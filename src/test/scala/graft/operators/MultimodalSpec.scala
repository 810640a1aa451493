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
}
