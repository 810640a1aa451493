package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

class QualityAuditSpec extends SparkSuite {
  import spark.implicits._

  private def one(df: org.apache.spark.sql.DataFrame): (Long, Long, Int) = {
    val r = df.collect()(0)
    (r.getLong(2), r.getLong(3), r.getInt(4))
  }

  test("completeness counts nulls; a clean column passes") {
    val df = Seq(Some(1L), None, Some(3L), None).toDF("v")
    assert(one(QualityAudit.completeness(df, "v", "t.v")) === ((4L, 2L, 0)))
    val clean = Seq(1L, 2L).toDF("v")
    assert(one(QualityAudit.completeness(clean, "v", "t.v")) === ((2L, 0L, 1)))
  }

  test("uniqueness: violations are rows beyond the first per key, " +
      "composite keys and null-bearing keys included") {
    val df = Seq((1L, "a"), (1L, "a"), (1L, "b"), (2L, "a"))
      .toDF("k1", "k2")
    // single col: key 1 has 3 rows (2 extra), key 2 has 1 → 2 violations
    assert(one(QualityAudit.uniqueness(df, Seq("k1"), "t")) === ((4L, 2L, 0)))
    // composite: (1,a) twice → 1 violation
    assert(one(QualityAudit.uniqueness(df, Seq("k1", "k2"), "t")) === ((4L, 1L, 0)))
    val withNull = Seq((Option.empty[java.lang.Long], "x"),
      (Option.empty[java.lang.Long], "x")).toDF("k1", "k2")
    // the null-bearing key is a key value: duplicated once
    assert(one(QualityAudit.uniqueness(withNull, Seq("k1", "k2"), "t")) ===
      ((2L, 1L, 0)))
  }

  test("functionalDependency counts determinants with >1 dependent; " +
      "a held FD passes; null dependents are distinct values") {
    val df = Seq((1L, "x"), (1L, "x"), (2L, "x"), (2L, "y"), (3L, "z"))
      .toDF("a", "b")
    // det 2 maps to {x, y} → 1 violating determinant of 3
    assert(one(QualityAudit.functionalDependency(df, "a", "b", "t")) ===
      ((3L, 1L, 0)))
    val held = Seq((1L, "x"), (1L, "x"), (2L, "y")).toDF("a", "b")
    assert(one(QualityAudit.functionalDependency(held, "a", "b", "t")) ===
      ((2L, 0L, 1)))
    val nulls = Seq((1L, Some("x")), (1L, Option.empty[String])).toDF("a", "b")
    assert(one(QualityAudit.functionalDependency(nulls, "a", "b", "t")) ===
      ((1L, 1L, 0)))
  }

  test("referentialOrphans: non-null FKs missing from the parent violate; " +
      "null FKs do not (they are a completeness concern)") {
    val child = Seq(Some(1L), Some(2L), Some(9L), None).toDF("fk")
    val parent = Seq(1L, 2L, 3L, 3L).toDF("pk") // parent dups must not
    val got = QualityAudit.referentialOrphans(child, "fk", parent, "pk", "t")
    assert(one(got) === ((4L, 1L, 0))) // only fk=9 is an orphan
    val ok = QualityAudit.referentialOrphans(
      Seq(1L, 3L).toDF("fk"), "fk", parent, "pk", "t")
    assert(one(ok) === ((2L, 0L, 1)))
  }

  test("inRange: out-of-range and null rows violate") {
    val df = Seq(Some(0L), Some(500L), Some(501L), Some(-1L), None).toDF("v")
    assert(one(QualityAudit.inRange(df, "v", 0L, 500L, "t")) === ((5L, 3L, 0)))
  }

  test("an empty input reports (0, 0, pass=1) from EVERY check — no " +
      "null counts for a gate consumer to trip on") {
    val e = spark.emptyDataset[(Long, Long)].toDF("a", "b")
    val checks = Seq(
      QualityAudit.completeness(e, "a", "t"),
      QualityAudit.uniqueness(e, Seq("a", "b"), "t"),
      QualityAudit.functionalDependency(e, "a", "b", "t"),
      QualityAudit.referentialOrphans(e, "a", Seq(1L).toDF("pk"), "pk", "t"),
      QualityAudit.inRange(e, "a", 0L, 9L, "t"))
    for (c <- checks) assert(one(c) === ((0L, 0L, 1)), c.columns.mkString(","))
  }

  test("the audit report schema is uniform and union-ready") {
    val df = Seq(1L).toDF("v")
    val rep = QualityAudit.completeness(df, "v", "a")
      .unionAll(QualityAudit.inRange(df, "v", 0L, 9L, "b"))
    assert(rep.columns.toSeq === QualityAudit.Schema)
    assert(rep.count() === 2L)
  }

  // -------------------------------------------- Benford first-digit audit

  test("benfordAudit: all 9 digit rows emit, absent digits carry the " +
      "full negative expected deviation, ppm floors against the " +
      "positive-value total") {
    // group g: values 1xx ×3, 2x ×1, 9 ×1 (plus a 0 and a negative that
    // must not count). digits: 1→3, 2→1, 9→1, rest 0; total 5.
    val df = Seq(100L, 150L, 199L, 25L, 9L, 0L, -300L)
      .map(("g", _)).toDF("grp", "v")
    val rows = QualityAudit.benfordAudit(df, "grp", "v")
      .collect().map(r => r.getLong(1) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(rows.keySet == (1L to 9L).toSet)
    assert(rows(1L) == ((3L, 600000L, 301029L, 298971L)))
    assert(rows(2L) == ((1L, 200000L, 176091L, 23909L)))
    assert(rows(9L) == ((1L, 200000L, 45757L, 154243L)))
    assert(rows(5L) == ((0L, 0L, 79181L, -79181L)))
  }

  test("benfordAudit: the expected table is the exact ppm floor of " +
      "log10(1+1/d) and nearly sums to one") {
    QualityAudit.BenfordPpm.zipWithIndex.foreach { case (ppm, i) =>
      val d = i + 1
      assert(ppm == math.floor(1e6 * math.log10(1.0 + 1.0 / d)).toLong)
    }
    assert(QualityAudit.BenfordPpm.sum == 999995L)
  }

  test("benfordAudit: a group with no positive values emits no rows " +
      "(spine derives from observed groups)") {
    val df = Seq(("a", 10L), ("b", 0L), ("b", -5L)).toDF("grp", "v")
    val out = QualityAudit.benfordAudit(df, "grp", "v")
    assert(out.filter($"g" === "b").count() == 0L)
    assert(out.count() == 9L)
  }

  // ---------------------------------------------------- FD discovery

  test("fdDiscovery: an exact dependency reads 0 ppm, its lossy " +
      "converse reads the exact g3 fraction, and every ordered pair " +
      "emits") {
    // code = first char of name ⇒ name→code exact. code→name: code
    // 'x' splits 3/1 between names ⇒ 1 of 6 rows must change ⇒
    // 166666 ppm. id is a key ⇒ id→anything exact; name→id violated.
    val df = Seq((1L, "xa"), (2L, "xa"), (3L, "xa"), (4L, "xb"),
      (5L, "ya"), (6L, "ya"))
      .toDF("id", "name")
      .withColumn("code", org.apache.spark.sql.functions.substring($"name", 1, 1))
    val got = QualityAudit.fdDiscovery(df, Seq("id", "name", "code"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(3), r.getBoolean(4))).toMap
    assert(got.size == 6)
    assert(got(("name", "code")) == ((0L, true)))
    assert(got(("code", "name")) == ((166666L, false)))
    assert(got(("id", "name")) == ((0L, true)))
    // name→id: 'xa' (3 rows) keeps 1, 'xb' keeps 1, 'ya' (2) keeps 1
    // ⇒ keep 3 of 6 ⇒ 500000 ppm
    assert(got(("name", "id")) == ((500000L, false)))
  }

  test("fdDiscovery: a null dependent is a distinct value and breaks " +
      "an otherwise-exact FD") {
    val df = Seq((1L, Option("p")), (1L, Option("p")),
      (1L, Option.empty[String])).toDF("a", "b")
    val got = QualityAudit.fdDiscovery(df, Seq("a", "b"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        r.getLong(3)).toMap
    // a=1 maps to {p, p, null}: keep 2 of 3 ⇒ 333333 ppm
    assert(got(("a", "b")) == 333333L)
  }

  test("corpusManifest: digest is order/partition independent, moves on " +
      "any text edit AND on id swaps between identical texts") {
    import spark.implicits._
    val docs = Seq((1L, "alpha", "s"), (2L, "beta", "s"), (3L, "alpha", "s"),
      (4L, "gamma", "t")).toDF("doc_id", "text", "source")
    def digest(df: org.apache.spark.sql.DataFrame) =
      QualityAudit.corpusManifest(df, "source", "doc_id", "text")
        .collect().map(r => r.getString(0) -> r.getLong(5)).toMap
    val base = digest(docs)
    assert(digest(docs.repartition(7)) === base)
    assert(digest(docs.orderBy(org.apache.spark.sql.functions.col("doc_id")
      .desc)) === base)
    val edited = Seq((1L, "alphaX", "s"), (2L, "beta", "s"),
      (3L, "alpha", "s"), (4L, "gamma", "t")).toDF("doc_id", "text", "source")
    assert(digest(edited)("s") !== base("s"))
    assert(digest(edited)("t") === base("t"))
    // ids 1 and 3 carry IDENTICAL text — swapping them must still move
    // the digest (the id is part of the hash input)
    val swapped = Seq((3L, "alpha", "s"), (2L, "beta", "s"), (1L, "alpha", "s"),
      (4L, "gamma", "t")).toDF("doc_id", "text", "source")
    assert(digest(swapped)("s") === base("s"),
      "identical (id,text) multiset => identical digest")
    val crossSwap = Seq((2L, "alpha", "s"), (1L, "beta", "s"),
      (3L, "alpha", "s"), (4L, "gamma", "t")).toDF("doc_id", "text", "source")
    assert(digest(crossSwap)("s") !== base("s"))
  }

  test("normalizedManifest: clean text leaves digests equal and " +
      "n_changed 0; dirty text moves only digest_norm-vs-raw, and " +
      "normalization is idempotent") {
    import spark.implicits._
    val clean = Seq((1L, "already clean", "s"), (2L, "also fine", "s"))
      .toDF("doc_id", "text", "source")
    val cm = QualityAudit.normalizedManifest(clean, "source", "doc_id", "text")
      .head()
    assert(cm.getLong(2) === 0L)          // n_changed
    assert(cm.getLong(3) === cm.getLong(4)) // digests equal
    val dirty = Seq((1L, "  Mixed\tCase  text ", "s"), (2L, "ok", "s"))
      .toDF("doc_id", "text", "source")
    val dm = QualityAudit.normalizedManifest(dirty, "source", "doc_id", "text")
      .head()
    assert(dm.getLong(2) === 1L)
    assert(dm.getLong(3) !== dm.getLong(4))
    // idempotence: normalizing the normalized text is a no-op
    val normed = dirty.select(col("doc_id"),
      graft.operators.TextAnalysis.normalizeText(col("text")).as("text"),
      col("source"))
    val nm = QualityAudit.normalizedManifest(normed, "source", "doc_id", "text")
      .head()
    assert(nm.getLong(2) === 0L)
    assert(nm.getLong(3) === nm.getLong(4))
    assert(nm.getLong(4) === dm.getLong(4))
  }

  test("splitLeakage: content-keyed split NEVER leaks; per-group " +
      "cross-split pairs are the exact (n^2 - sum ns^2)/2; unique " +
      "docs never count as dup groups") {
    import spark.implicits._
    // 40 unique docs + one text duplicated 5x + one duplicated 2x
    val docs = (1L to 40L).map(i => (i, s"unique text $i")) ++
      (101L to 105L).map(i => (i, "dup five")) ++
      (201L to 202L).map(i => (i, "dup two"))
    val out = QualityAudit.splitLeakage(docs.toDF("doc_id", "text"),
        "doc_id", "text", Seq(("train", 800000L), ("test", 200000L)))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val (nc, nd) = (out("by_content"), out("by_id"))
    assert(nc._1 === 47L && nd._1 === 47L)
    assert(nc._2 === 2L && nd._2 === 2L)
    // the fix: grouped split cannot straddle, ever
    assert(nc._3 === 0L && nc._4 === 0L)
    // naive split: recompute the exact expected leak from the same
    // hash the operator uses
    def band(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      java.lang.Long.parseLong(md.digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15), 16) % 1000000L
    }
    def leak(ids: Seq[Long]): Long = {
      val n = ids.size.toLong
      val tr = ids.count(i => band(i.toString) < 800000L).toLong
      (n * n - (tr * tr + (n - tr) * (n - tr))) / 2
    }
    val wantPairs = leak(101L to 105L) + leak(Seq(201L, 202L))
    assert(nd._4 === wantPairs)
  }

  test("kAnonymity: a small QI cohort flags under k and a uniform " +
      "sensitive value reads l-diversity 1; doubling the release at " +
      "the same QI reads safer (the measurement's direction)") {
    import spark.implicits._
    // segment A: one 10-row group (safe, diverse) + one 2-row group
    // (risky) whose sensitive value is CONSTANT -> min_l_div 1
    // segment B: two 6-row groups, diverse -> fully safe
    val rows = ((1 to 10).map(i => ("A", 1L, i.toLong % 5)) ++
      Seq(("A", 2L, 7L), ("A", 2L, 7L)) ++
      (1 to 6).map(i => ("B", 1L, i.toLong)) ++
      (1 to 6).map(i => ("B", 2L, i.toLong))).toDF("seg", "band", "sens")
    val got = QualityAudit.kAnonymity(rows, Seq("seg", "band"), "sens",
        k = 4, reportCol = "seg")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6), r.getLong(7)))).toMap
    assert(got("A") === ((12L, 2L, 2L, 1L, 2L, 166666L, 1L)))
    assert(got("B") === ((12L, 2L, 6L, 0L, 0L, 0L, 6L)))
    // same QI, doubled rows: the risky cohort clears k -> safer
    val doubled = QualityAudit.kAnonymity(
        rows.unionByName(rows), Seq("seg", "band"), "sens", k = 4, "seg")
      .collect().map(r => r.getString(0) -> r.getLong(4)).toMap
    assert(doubled("A") === 0L)
  }
}
