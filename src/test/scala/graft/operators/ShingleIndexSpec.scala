package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.queries.Tables

/**
 * The shared shingle index (VERDICT r4 #1): landing hashes the corpus
 * ONCE, and every index-fed consumer (exact dedup, MinHash signatures,
 * decontamination) reproduces its text-path twin bit-for-bit with ZERO
 * hashing in its own plan.
 */
class ShingleIndexSpec extends SparkSuite {

  private lazy val docs =
    Tables.documents(spark, sf("0.01")).select(col("doc_id"), col("text"))

  private lazy val indexDir: String = {
    val dir = Files.createTempDirectory("graft_shidx_").toString
    TextDedup.landShingleIndex(docs, "text", "doc_id", dir)
    dir
  }

  private def md5Count(df: org.apache.spark.sql.DataFrame): Int =
    "md5".r.findAllIn(df.queryExecution.executedPlan.toString).length

  test("landing plans hash exactly once; index-fed plans hash zero times") {
    // each landing frame carries ONE md5 projection
    assert(md5Count(TextDedup.docHashRows(docs, "text", "doc_id")) === 1)
    assert(md5Count(TextDedup.shingleHashRows(docs, "text", "doc_id")) === 1)
    // every index-fed consumer is hash-free: the md5 work ran at landing
    val docIdx = TextDedup.readDocIndex(spark, indexDir)
    val shIdx = TextDedup.readShingleIndex(spark, indexDir)
    assert(md5Count(TextDedup.exactDupGroupsFromIndex(docIdx)) === 0)
    assert(md5Count(TextDedup.signaturesFromHashRows(shIdx)) === 0)
    assert(md5Count(TextDedup.contaminationPairsFromHashRows(
      shIdx, shIdx.withColumnRenamed("doc_id", "bench_id"))) === 0)
  }

  test("exact dedup from the index equals the text path") {
    val viaText = TextDedup.exactDupGroups(docs, "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val viaIndex = TextDedup.exactDupGroupsFromIndex(
      TextDedup.readDocIndex(spark, indexDir))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(viaText.nonEmpty)
    assert(viaIndex === viaText)
  }

  test("MinHash signatures from the index equal the text path") {
    val viaText = TextDedup.signatures(docs, 3)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val viaIndex = TextDedup.signaturesFromHashRows(
      TextDedup.readShingleIndex(spark, indexDir))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(viaText.nonEmpty)
    assert(viaIndex === viaText)
  }

  test("decontamination from the index equals the text path") {
    // bench docs stay IN the corpus side so every bench doc provably
    // overlaps its own corpus copy — a guaranteed-nonempty comparison
    val bench = docs.filter(col("doc_id") % 50 === 0)
    val viaText = TextDedup.contaminationPairs(
      docs, bench, "text", "doc_id", minShared = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).toSet
    val idx = TextDedup.readShingleIndex(spark, indexDir)
    val viaIndex = TextDedup.contaminationPairsFromHashRows(
      idx,
      idx.filter(col("doc_id") % 50 === 0)
        .select(col("doc_id").as("bench_id"), col("h")),
      minShared = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).toSet
    assert(viaText.nonEmpty)
    assert(viaIndex === viaText)
  }
}
