package graft.operators

import graft.SparkSuite

class RelevanceSpec extends SparkSuite {
  import spark.implicits._

  private def docs = Seq(
    (1L, "spark join spark window"),
    (2L, "join join join filter"),
    (3L, "spark spark spark spark spark"),
    (4L, "window scan sort"),
    (5L, "ab x y")) // tokens under minTermLen drop out entirely
    .toDF("doc_id", "text")

  test("invertedIndex: df/tf totals and capped sorted postings") {
    val ix = Relevance.invertedIndex(docs, "doc_id", "text",
      postingCap = 2, minDf = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getSeq[Long](3))).sortBy(_._1)
    // spark: docs 1 (tf 2) and 3 (tf 5); join: docs 1 (1) and 2 (3);
    // window: docs 1 and 4 (1 each)
    assert(ix.toSeq == Seq(
      ("join", 2L, 4L, Seq(1L, 2L)),
      ("spark", 2L, 7L, Seq(1L, 3L)),
      ("window", 2L, 2L, Seq(1L, 4L))))
  }

  test("invertedIndex: posting cap truncates, never reorders") {
    val many = (1L to 10L).map(i => (i, "common")).toDF("doc_id", "text")
    val ix = Relevance.invertedIndex(many, "doc_id", "text",
      postingCap = 3, minDf = 2).collect()
    assert(ix.length == 1)
    assert(ix.head.getSeq[Long](3) == Seq(1L, 2L, 3L))
  }

  test("bm25TopK: higher tf ranks higher at equal length; all-integer scores") {
    val d = Seq(
      (1L, "spark spark spark scan"),
      (2L, "spark scan sort merge"),
      (3L, "scan sort merge agg")).toDF("doc_id", "text")
    val out = Relevance.bm25TopK(d, "doc_id", "text", Seq("spark"), k = 5)
      .orderBy("rnk").collect()
    assert(out.map(_.getLong(1)).toSeq == Seq(1L, 2L)) // doc 3 has no hit
    assert(out(0).getLong(4) > out(1).getLong(4)) // tf=3 beats tf=1
  }

  test("bm25TopK: rarer term gets the larger idf contribution") {
    val d = (1L to 9L).map(i => (i, "common common filler"))
      .toDF("doc_id", "text")
      .union(Seq((10L, "rare common filler")).toDF("doc_id", "text"))
    val out = Relevance.bm25TopK(d, "doc_id", "text",
      Seq("rare", "common"), k = 1)
      .collect().map(r => (r.getString(0), r.getLong(4))).toMap
    assert(out("rare") > out("common"))
  }
}
