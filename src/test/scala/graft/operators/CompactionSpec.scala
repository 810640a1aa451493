package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** ScanOps.compactParquet: fewer files out, identical rows. */
class CompactionSpec extends SparkSuite {

  private def parquetFiles(dir: java.io.File): Seq[java.io.File] = {
    val here = Option(dir.listFiles()).getOrElse(Array.empty).toSeq
    here.filter(f => f.isFile && f.getName.endsWith(".parquet")) ++
      here.filter(_.isDirectory).flatMap(parquetFiles)
  }

  test("unpartitioned compaction merges small files without losing rows") {
    val root = Files.createTempDirectory("compact").toFile
    val in = s"${root.getPath}/in"
    val out = s"${root.getPath}/out"
    val docs = spark.read.parquet(sf() + "/documents.parquet")
    docs.repartition(8).write.parquet(in)
    assert(parquetFiles(new java.io.File(in)).length == 8)

    // target far above total bytes -> everything merges into one file
    val planned = ScanOps.compactParquet(spark, in, out, 1L << 30)
    assert(planned == 1)
    assert(parquetFiles(new java.io.File(out)).length == 1)

    val a = spark.read.parquet(in)
    val b = spark.read.parquet(out)
    assert(b.count() == a.count())
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("partitioned compaction leaves one file per partition dir, preserving pruning layout") {
    val root = Files.createTempDirectory("compactp").toFile
    val in = s"${root.getPath}/in"
    val out = s"${root.getPath}/out"
    val docs = spark.read.parquet(sf() + "/documents.parquet")
    docs.repartition(8).write.partitionBy("lang").parquet(in)
    val langDirsIn = new java.io.File(in).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("lang="))
    assert(langDirsIn.exists(d => parquetFiles(d).length > 1),
      "fixture should start fragmented")

    ScanOps.compactParquet(spark, in, out, partitionCols = Seq("lang"))

    val langDirsOut = new java.io.File(out).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("lang="))
    assert(langDirsOut.map(_.getName).sorted.sameElements(
      langDirsIn.map(_.getName).sorted))
    for (d <- langDirsOut)
      assert(parquetFiles(d).length == 1, s"${d.getName} not compacted")

    val a = spark.read.parquet(in).select("doc_id", "lang", "text")
    val b = spark.read.parquet(out).select("doc_id", "lang", "text")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }
}
