package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.queries.Tables

/**
 * Hand-derived cases for the posting-capped tf-idf pair join
 * (q298/q299) plus the load-bearing containment property: a capped
 * pair carries the IDENTICAL exact dot/norms the uncapped operator
 * computes — only recall is traded, never precision.
 */
class TfidfCappedSpec extends SparkSuite {

  // N=4, no df cap (permille 1000), idfScale 1, tau 0, postingCap 2:
  // idf aaa=1 (df 3), bbb=1 (df 3), ccc=2 (df 2); weights
  // d1{aaa:1,bbb:1} d2{aaa:2,bbb:1} d3{aaa:1,ccc:2} d4{bbb:1,ccc:4}.
  // Top-2 postings: aaa→{d2,d1}, bbb→{d1,d2}, ccc→{d3,d4} ⇒ candidate
  // pairs {(1,2),(3,4)} only — the cap visibly prunes (uncapped, tau=0
  // admits every co-occurring pair).
  private def docs = {
    import spark.implicits._
    Seq((1L, "aaa bbb"), (2L, "aaa aaa bbb"), (3L, "aaa ccc"),
      (4L, "bbb ccc ccc")).toDF("doc_id", "text")
  }

  test("capped pairs: candidates from top-K postings, exact dots") {
    val got = Relevance
      .tfidfCosinePairsCapped(docs, "doc_id", "text", 1000L, 1L, 0, 2)
      .orderBy("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getLong(3), r.getDouble(4), r.getDouble(5)))
      .toSeq
    assert(got === Seq(
      (1L, 2L, 3.0, 2L, 2.0, 5.0),
      (3L, 4L, 8.0, 1L, 5.0, 17.0)))
  }

  test("cap accounting: truncated terms and pair bounds, by hand") {
    val r = Relevance
      .tfidfCapAccounting(docs, "doc_id", "text", 1000L, 1L, 2)
      .head()
    // terms admitted 3; aaa/bbb (df 3 > 2) truncated; kept 2+2+2,
    // dropped 1+1+0; bounds 4+4+4 vs 9+9+4
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5)) === ((3L, 2L, 6L, 2L, 12L, 22L)))
  }

  test("recall audit: counts, recall ppm and worst missed cos² by hand") {
    // uncapped at tau=0 admits every co-occurring pair: (1,2) (1,3)
    // (1,4) (2,3) (2,4) (3,4) = 6; capped keeps {(1,2),(3,4)} = 2.
    // recall = ⌊1e6·2/6⌋ = 333333. Missed cos²·1e6 floors:
    // (1,3) 1²/(2·5)→100000, (1,4) 1²/(2·17)→29411,
    // (2,3) 2²/(5·5)→160000, (2,4) 1²/(5·17)→11764 ⇒ max 160000.
    val r = Relevance
      .tfidfCapRecallAudit(docs, "doc_id", "text", 1000L, 1L, 0, 2)
      .head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5), r.getLong(6)) ===
      ((6L, 2L, 2L, 4L, 0L, 333333L, 160000L)))
  }

  test("recall audit agrees with the set algebra of the two operators " +
      "on the real corpus; containment reads as n_phantom = 0") {
    val base = Tables.documents(spark, sf())
      .select(col("doc_id"), col("text"))
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_a", "doc_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Relevance
      .tfidfCosinePairs(base, "doc_id", "text", 100L, 100L, 60))
    val capped = pairs(Relevance
      .tfidfCosinePairsCapped(base, "doc_id", "text", 100L, 100L, 60, 8))
    val r = Relevance
      .tfidfCapRecallAudit(base, "doc_id", "text", 100L, 100L, 60, 8)
      .head()
    assert(r.getLong(0) === exact.size.toLong)
    assert(r.getLong(1) === capped.size.toLong)
    assert(r.getLong(2) === (exact & capped).size.toLong)
    assert(r.getLong(3) === (exact -- capped).size.toLong)
    assert(r.getLong(4) === 0L, "containment: capped ⊆ exact")
    assert(r.getLong(5) ===
      1000000L * (exact & capped).size / exact.size)
  }

  test("containment: capped ⊆ uncapped with identical exact values " +
      "on the real corpus") {
    val base = Tables.documents(spark, sf())
      .select(col("doc_id"), col("text"))
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1)) ->
        ((r.getDouble(2), r.getLong(3), r.getDouble(4), r.getDouble(5)))
    val capped = Relevance
      .tfidfCosinePairsCapped(base, "doc_id", "text", 100L, 100L, 60, 8)
      .collect().map(key).toMap
    val uncapped = Relevance
      .tfidfCosinePairs(base, "doc_id", "text", 100L, 100L, 60)
      .collect().map(key).toMap
    assert(capped.nonEmpty, "fixture should produce at least one pair")
    assert(capped.keySet.subsetOf(uncapped.keySet))
    for ((k, v) <- capped) assert(uncapped(k) === v, s"pair $k")
  }
}
