package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.queries.Tables

/** Semantic properties of the corpus-assembly operators beyond the
  * oracle gate (q45/q46): packing conservation/contiguity/overflow
  * bounds, sampling determinism and rate-nesting. */
class CorpusAssemblySpec extends SparkSuite {

  private def docs = Tables.documents(spark, sf("0.01"))

  private def tokenized =
    docs.select(col("doc_id"), (col("doc_id") % 4).as("shard"),
      TextAnalysis.wsTokenCount(col("text")).as("n_tokens"))

  test("packing conserves every token and fills contiguous bins per shard") {
    val budget = 256L
    val stats = CorpusAssembly.binStats(
      CorpusAssembly.packBins(tokenized, "doc_id", "n_tokens", "shard", budget),
      "shard", "n_tokens", "doc_id").collect()
    val total = tokenized.agg(sum("n_tokens")).head().getLong(0)
    assert(stats.map(_.getAs[Long]("tokens_packed")).sum === total)
    stats.groupBy(_.getAs[Long]("shard")).foreach { case (shard, rows) =>
      val bins = rows.map(_.getAs[Long]("bin")).sorted.toSeq
      assert(bins === (0L until bins.length.toLong),
        s"shard $shard bins not contiguous: $bins")
    }
  }

  test("next-fit overflow bound: a bin exceeds the budget by less than one document") {
    val budget = 256L
    val maxDoc = tokenized.agg(max("n_tokens")).head().getLong(0)
    val stats = CorpusAssembly.binStats(
      CorpusAssembly.packBins(tokenized, "doc_id", "n_tokens", "shard", budget),
      "shard", "n_tokens", "doc_id").collect()
    // docs STARTING in a bin span at most budget-1 tokens before the
    // last one begins, so packed ≤ budget - 1 + the largest document
    assert(stats.forall(_.getAs[Long]("tokens_packed") <= budget - 1 + maxDoc))
  }

  test("property: packing conserves tokens and respects the overflow bound on generated inputs") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    import spark.implicits._
    val rowsG = Gen.listOfN(60, for {
      shard <- Gen.chooseNum(0L, 3L)
      toks <- Gen.chooseNum(1L, 400L) // docs can exceed the 256 budget
    } yield (shard, toks))
    for (seed <- 0 until 5) {
      val rows = rowsG(Gen.Parameters.default, Seed(seed.toLong)).get
        .zipWithIndex.map { case ((sh, tk), i) => (i.toLong, sh, tk) }
      val df = rows.toDF("doc_id", "shard", "n_tokens")
      val stats = CorpusAssembly.binStats(
        CorpusAssembly.packBins(df, "doc_id", "n_tokens", "shard", 256L),
        "shard", "n_tokens", "doc_id").collect()
      assert(stats.map(_.getAs[Long]("tokens_packed")).sum === rows.map(_._3).sum)
      val maxDoc = rows.map(_._3).max
      assert(stats.forall(_.getAs[Long]("tokens_packed") <= 255 + maxDoc))
    }
  }

  test("stratified sample is deterministic and nested across rates") {
    def ids(perMille: Int): Set[Long] =
      CorpusAssembly.stratifiedSample(docs, "text", "lang",
        Map("en" -> perMille, "de" -> perMille, "es" -> perMille,
          "fr" -> perMille, "zh" -> perMille))
        .select("doc_id").collect().map(_.getLong(0)).toSet
    val half = ids(500)
    assert(ids(500) === half) // re-derivable: same rows on a second run
    val quarter = ids(250)
    assert(quarter.subsetOf(half), "lowering the rate must yield a subset")
    assert(quarter.nonEmpty && half.size > quarter.size)
    // an unlisted stratum drops entirely
    val enOnly = CorpusAssembly.stratifiedSample(docs, "text", "lang",
      Map("en" -> 1000)).select("lang").distinct().collect().map(_.getString(0))
    assert(enOnly.toSeq === Seq("en"))
  }
}
