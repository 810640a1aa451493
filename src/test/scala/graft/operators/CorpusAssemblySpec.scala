package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.queries.Tables

/** Semantic properties of the corpus-assembly operators beyond the
  * oracle gate (q45/q46): packing conservation/contiguity/overflow
  * bounds, sampling determinism and rate-nesting. */
class CorpusAssemblySpec extends SparkSuite {
  import spark.implicits._

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

  test("mixtureWeights: √n weights, ppm normalization, budget split") {
    import spark.implicits._
    // strata of 100 / 400 / 900 docs → isqrt 10 / 20 / 30, total 60:
    // ppm = 166666 / 333333 / 500000; budget 6000 → 999 / 1999 / 3000
    val df = (Seq.fill(100)("a") ++ Seq.fill(400)("b") ++ Seq.fill(900)("c"))
      .toDF("src")
    val out = CorpusAssembly.mixtureWeights(df, "src", 6000L)
      .orderBy("src").collect()
      .map(r => (r.getAs[String]("src"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("w_raw"), r.getAs[Long]("weight_ppm"),
        r.getAs[Long]("target_docs"))).toSeq
    assert(out == Seq(
      ("a", 100L, 10L, 166666L, 999L),
      ("b", 400L, 20L, 333333L, 1999L),
      ("c", 900L, 30L, 500000L, 3000L)))
  }

  test("mixtureWeights: α = 0.5 sits between uniform and proportional " +
      "(small stratum upweighted, big stratum damped)") {
    import spark.implicits._
    val df = (Seq.fill(100)("small") ++ Seq.fill(10000)("big")).toDF("src")
    val m = CorpusAssembly.mixtureWeights(df, "src", 1000000L)
      .collect().map(r => r.getAs[String]("src") -> r.getAs[Long]("weight_ppm"))
      .toMap
    // proportional would give small ~9900 ppm; uniform 500000; √n gives
    // 10/110 ≈ 90909 — strictly between
    assert(m("small") > 9901L && m("small") < 500000L, m.toString)
    assert(m("small") + m("big") <= 1000000L)
  }

  test("chunkDocs: boundary arithmetic — starts every stride, last " +
      "chunk short, empty docs emit nothing") {
    import spark.implicits._
    val df = Seq((1L, "a" * 250), (2L, ""), (3L, "xyz")).toDF("id", "text")
    val out = CorpusAssembly.chunkDocs(df, "id", "text", 100, 80)
      .orderBy("id", "chunk_ix").collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[Long]("chunk_ix"),
        r.getAs[Long]("chunk_start"), r.getAs[Long]("chunk_len"))).toSeq
    // doc 1 (250 chars): starts 0,80,160,240 → lens 100,100,90,10
    // doc 2: empty, absent; doc 3: one 3-char chunk
    assert(out == Seq(
      (1L, 0L, 0L, 100L), (1L, 1L, 80L, 100L), (1L, 2L, 160L, 90L),
      (1L, 3L, 240L, 10L), (3L, 0L, 0L, 3L)))
  }

  test("chunkDocs: overlapping windows reconstruct the document — " +
      "every byte is covered and consecutive chunks agree on the overlap") {
    import spark.implicits._
    val text = ('a' to 'z').mkString * 10 // 260 chars
    val df = Seq((7L, text)).toDF("id", "text")
    val size = 100; val stride = 60
    val chunks = CorpusAssembly.chunkDocs(df, "id", "text", size, stride)
      .orderBy("chunk_ix")
      .select("chunk_start", "chunk_md5", "chunk_len").collect()
    chunks.foreach { r =>
      val start = r.getAs[Long]("chunk_start").toInt
      val expect = text.substring(start, math.min(start + size, text.length))
      assert(r.getAs[String]("chunk_md5") ==
        java.security.MessageDigest.getInstance("MD5")
          .digest(expect.getBytes("UTF-8"))
          .map("%02x".format(_)).mkString)
    }
    // coverage: last chunk reaches the end, first starts at 0
    val starts = chunks.map(_.getAs[Long]("chunk_start"))
    assert(starts.head == 0L &&
      starts.last + chunks.last.getAs[Long]("chunk_len") == text.length)
  }

  test("chunkDocs rejects stride > size (holes) and non-positive geometry") {
    import spark.implicits._
    val df = Seq((1L, "abc")).toDF("id", "text")
    intercept[IllegalArgumentException] {
      CorpusAssembly.chunkDocs(df, "id", "text", 10, 20)
    }
    intercept[IllegalArgumentException] {
      CorpusAssembly.chunkDocs(df, "id", "text", 0, 0)
    }
  }

  test("hashSplitAudit: content scheme never leaks, docid scheme leaks " +
    "exactly the duplicated contents that straddle splits") {
    // 200 distinct texts + every text re-inserted under a shifted id:
    // content buckets of the two copies are identical (same text) →
    // leaky_groups = 0; docid buckets are independent → some groups
    // straddle (deterministic given the hash, asserted > 0).
    val base = (1L to 200L).map(i => (i, s"document body number $i"))
    val dup = base.map { case (i, t) => (i + 10000L, t) }
    val df = (base ++ dup).toSeq.toDF("doc_id", "text")
    val out = CorpusAssembly.hashSplitAudit(df, "doc_id", "text")
      .collect()
    val bySch = out.groupBy(_.getString(0))
    assert(bySch("content").head.getLong(4) === 0L)
    assert(bySch("docid").head.getLong(4) > 0L,
      "docid scheme produced no leaks — fixture too small or hash broken")
    // totals: every scheme partitions all 400 docs
    bySch.foreach { case (s, rows) =>
      assert(rows.map(_.getLong(2)).sum === 400L, s"$s loses docs")
    }
    // split assignment is reproducible: a re-run agrees bit-for-bit
    val again = CorpusAssembly.hashSplitAudit(df, "doc_id", "text").collect()
    assert(out.map(_.toString).sorted.toSeq === again.map(_.toString).sorted.toSeq)
  }

  test("curriculumOrder: ordinals are a permutation of 0..n-1 ordered " +
      "exactly as the global (tier, hash, id) sort") {
    val df = (1L to 300L).map(i =>
      (i, i % 3, s"doc body number $i")).toDF("doc_id", "tier", "text")
    val out = CorpusAssembly.curriculumOrder(df, "doc_id", "tier", "text", 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(out.map(_._4).sorted.toSeq == (0L until 300L).toSeq)
    // the two-level ordinal must equal the single global sort's ordinal
    val want = out.sortBy(r => (r._2, r._3, r._1)).map(_._1).toSeq
    assert(out.sortBy(_._4).map(_._1).toSeq == want)
  }

  test("curriculumOrder: NULL-keyed rows drop at the boundary and the " +
      "remaining ordinals stay a contiguous permutation") {
    val df = Seq((1L, 0L, Option("a")), (2L, 0L, None),
      (3L, 0L, Option("b")), (4L, 1L, None), (5L, 1L, Option("c")))
      .toDF("doc_id", "tier", "text")
    val out = CorpusAssembly.curriculumOrder(df, "doc_id", "tier", "text", 4)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(out.keySet == Set(1L, 3L, 5L))
    assert(out.values.toSeq.sorted == Seq(0L, 1L, 2L))
  }

  test("curriculumOrder is partitioning-independent and stages tiers " +
      "strictly (every tier-0 ordinal precedes every tier-1 ordinal)") {
    val df = (1L to 200L).map(i =>
      (i, i % 2, s"text $i")).toDF("doc_id", "tier", "text")
    def run(d: org.apache.spark.sql.DataFrame) =
      CorpusAssembly.curriculumOrder(d, "doc_id", "tier", "text", 8)
        .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    val a = run(df.repartition(7))
    assert(a === run(df.coalesce(1)))
    val byTier = CorpusAssembly.curriculumOrder(df, "doc_id", "tier",
        "text", 8).collect()
      .map(r => r.getLong(1) -> r.getLong(3)).groupBy(_._1)
    assert(byTier(0L).map(_._2).max < byTier(1L).map(_._2).min)
  }

  test("curriculumOrder: only the tiny offset table sees a global " +
      "window; data rows rank inside (tier, bucket) partitions") {
    val df = (1L to 50L).map(i => (i, 0L, s"t$i")).toDF("doc_id", "tier", "text")
    val plan = CorpusAssembly.curriculumOrder(df, "doc_id", "tier", "text", 8)
      .queryExecution.executedPlan.toString
    // offsets come back via broadcast — the data never shuffles for the
    // join
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
    // the data-side rank window is keyed by (tier, bucket) — the only
    // unpartitioned window is the offset table's running sum
    val rn = "row_number\\(\\)[^\\n]*".r.findFirstIn(plan).getOrElse("")
    assert(rn.contains("windowspecdefinition(tier"), plan)
  }

  // ------------------------------------------------ Neyman allocation

  test("neymanStratifiedSample: allocations sum EXACTLY to k, the " +
      "volatile stratum out-draws the constant one, and the draw is " +
      "the deterministic hash reservoir") {
    import spark.implicits._
    // stratum "wild": values swing 0/1000 (σ·n = sqrt(n·Σx²−(Σx)²) =
    // sqrt(20·10·1e6 − 1e8) = 10000); "calm": constant 500 (varnum 0 →
    // floor weight 1). Same sizes, so uniform allocation would split
    // 10/10 — Neyman must give wild ~everything.
    val wild = (0 until 20).map(i => ("wild", i.toLong,
      if (i % 2 == 0) 0L else 1000L))
    val calm = (0 until 20).map(i => ("calm", 100L + i, 500L))
    val df = (wild ++ calm).toDF("stratum", "id", "v")
    val out = CorpusAssembly
      .neymanStratifiedSample(df, "stratum", "id", "v", 10)
    val rows = out.collect()
    assert(rows.map(_.getAs[Long]("rk")).forall(_ >= 1))
    val alloc = rows.map(r => r.getAs[String]("stratum") ->
      r.getAs[Long]("alloc")).toMap
    assert(alloc.values.sum >= 10) // per-stratum alloc repeated per row
    val drawn = rows.groupBy(_.getAs[String]("stratum"))
      .view.mapValues(_.length).toMap
    assert(drawn.values.sum == 10, s"total draw: $drawn")
    assert(drawn.getOrElse("wild", 0) >= 9, s"Neyman skew lost: $drawn")
    // determinism: a rerun draws the identical id set
    val again = CorpusAssembly
      .neymanStratifiedSample(df, "stratum", "id", "v", 10)
      .collect().map(_.getAs[Long]("id")).toSet
    assert(again == rows.map(_.getAs[Long]("id")).toSet)
  }

  test("groupSplit: no group spans splits, fractions land near ppm " +
      "targets, assignment is partition/rerun invariant, bad fractions " +
      "rejected") {
    import spark.implicits._
    val rows = (1 to 4000).map(i => (i.toLong % 500, i.toLong))
      .toDF("user", "row_id")
    val splits = Seq(("train", 800000L), ("val", 100000L),
      ("test", 100000L))
    val assigned = CorpusAssembly.groupSplit(rows, "user", splits)
    // leakage-free BY CONSTRUCTION: every group maps to exactly 1 split
    val spanning = assigned.groupBy("user")
      .agg(countDistinct("split").as("n"))
      .filter(col("n") > 1).count()
    assert(spanning === 0L)
    // fractions: 500 groups, expect ~400/50/50 with hash tolerance
    val counts = assigned.select("user", "split").distinct()
      .groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("train") > 350 && counts("train") < 450, counts.toString)
    assert(counts("val") > 20 && counts("val") < 80)
    assert(counts("test") > 20 && counts("test") < 80)
    // invariance under repartitioning
    val again = CorpusAssembly.groupSplit(rows.repartition(17), "user", splits)
      .select("user", "split").distinct()
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val base = assigned.select("user", "split").distinct()
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(again === base)
    intercept[IllegalArgumentException] {
      CorpusAssembly.groupSplit(rows, "user", Seq(("a", 999999L)))
    }
  }

  test("mixturePlan: capped sources surrender their deficit to uncapped " +
      "ones proportionally; full-capacity plans consume the whole " +
      "budget; an all-capped plan never divides by zero") {
    import spark.implicits._
    def plan(rows: Seq[(String, Long, Long)], num: Long, den: Long) =
      CorpusAssembly.mixturePlan(rows.toDF("src", "avail", "w"),
          "src", "avail", "w", num, den)
        .collect().map(r => r.getString(0) ->
          ((r.getLong(3), r.getBoolean(4), r.getLong(5), r.getLong(6),
            Option(r.get(7)).map(_.asInstanceOf[Long])))).toMap
    // T = 220, W = 4: targets (55, 55, 110); c caps at 20, deficit 90
    // redistributes 45/45 onto a and b -> everyone fully consumed
    val p = plan(Seq(("a", 100L, 1L), ("b", 100L, 1L), ("c", 20L, 2L)),
      1, 1)
    assert(p("a") === ((55L, false, 45L, 100L, Some(1000000L))))
    assert(p("b") === ((55L, false, 45L, 100L, Some(1000000L))))
    assert(p("c") === ((110L, true, 0L, 20L, Some(1000000L))))
    // every source capped: remaining capacity 0 -> extras 0, no 0/0
    val q = plan(Seq(("a", 10L, 1L), ("b", 10L, 1L)), 2, 1)
    assert(q("a") === ((20L, true, 0L, 10L, Some(1000000L))))
    assert(q("b") === ((20L, true, 0L, 10L, Some(1000000L))))
    // floor residue: T = 200/10 = 20, weights (1,2), W = 3 -> targets
    // (6, 13); nothing capped, planned = targets, 19 < 20 (visible
    // residue, never a hidden refit)
    val r = plan(Seq(("a", 100L, 1L), ("b", 100L, 2L)), 1, 10)
    assert(r("a")._1 === 6L && r("b")._1 === 13L)
    assert(r("a")._4 + r("b")._4 === 19L)
  }

  test("mixtureDiversity: a uniform power-of-two mix reads evenness " +
      "exactly 1e6; a single-source collapse reads entropy exactly 0; " +
      "zero-planned sources are counted, not dropped") {
    import spark.implicits._
    // 4 equal sources: H = log2(4) = 2 exactly on the lattice
    val even = Seq(("a", 100L, 100L), ("b", 100L, 100L),
      ("c", 100L, 100L), ("d", 100L, 100L)).toDF("src", "av", "pl")
    val er = CorpusAssembly.mixtureDiversity(even, "src", "av", "pl")
      .head()
    assert(er.getLong(2) === 2L << 20)
    assert(er.getLong(4) === 1000000L && er.getLong(5) === 1000000L)
    // planned collapses onto one source: H_planned = 0, two zero rows
    val coll = Seq(("a", 100L, 400L), ("b", 100L, 0L),
      ("c", 100L, 0L)).toDF("src", "av", "pl")
    val cr = CorpusAssembly.mixtureDiversity(coll, "src", "av", "pl")
      .head()
    assert(cr.getLong(1) === 2L)
    assert(cr.getLong(3) === 0L && cr.getLong(5) === 0L)
    assert(cr.getLong(2) > 0L) // availability stays diverse
  }

  test("lengthBucketBatches: the distributed rank decomposition equals " +
      "the single-window definition; constant-length buckets read zero " +
      "padding; batches cut at the exact size") {
    import spark.implicits._
    // 37 docs of 5 tokens (class 3: 4..7) and 20 docs of 40-47 tokens
    // (class 6: 32..63)
    val docs = ((1 to 37).map(i => (i.toLong, ("w " * 5).trim)) ++
      (1 to 20).map(i => (100L + i,
        ("x " * (40 + i % 8)).trim + s" id$i"))).toDF("doc_id", "text")
    val got = CorpusAssembly.lengthBucketBatches(docs, "doc_id", "text", 8)
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    // class 3: 37 docs -> batches of 8,8,8,8,5; all 5 tokens -> pad 0
    val c3 = got.keys.filter(_._1 == 3L).toSeq.sortBy(_._2)
    assert(c3.map(got(_)._1) === Seq(8L, 8L, 8L, 8L, 5L))
    assert(c3.forall(k => got(k)._4 === 0L))
    // class 6: 20 docs -> 8,8,4; padding strictly positive (mixed lens)
    val c6 = got.keys.filter(_._1 == 6L).toSeq.sortBy(_._2)
    assert(c6.map(got(_)._1) === Seq(8L, 8L, 4L))
    assert(c6.exists(k => got(k)._4 > 0L))
    // decomposed ranks == the single-window definition, replayed naively
    val h = (s: String) =>
      BigInt(java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
        .take(15), 16).toLong % 1000L
    val naive = ((1 to 37).map(i => (i.toLong, ("w " * 5).trim)) ++
      (1 to 20).map(i => (100L + i,
        ("x " * (40 + i % 8)).trim + s" id$i")))
      .map { case (id, t) =>
        val tok = t.split("\\s+").length.toLong
        val cls = java.lang.Long.toBinaryString(tok).length.toLong
        (cls, h(t), id, tok)
      }
      .groupBy(_._1).toSeq.flatMap { case (cls, rs) =>
        rs.sortBy(r => (r._2, r._3)).zipWithIndex.map { case (r, i) =>
          ((cls, i.toLong / 8), r._4)
        }
      }
      .groupBy(_._1).map { case (k, vs) =>
        k -> ((vs.size.toLong, vs.map(_._2).max, vs.map(_._2).sum))
      }
    assert(got.view.mapValues(v => (v._1, v._2, v._3)).toMap === naive)
  }
}
