package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

/**
 * Hand-derived cases for the full-PSL registered-domain resolution
 * (q303): each publicsuffix.org rule form (plain at three depths,
 * wildcard, exception, default), the exception-beats-longest pick,
 * host-is-a-suffix NULLs, and the zero-shuffle broadcast plan shape.
 */
class PublicSuffixSpec extends SparkSuite {

  private def resolve(hosts: String*)
      : Seq[(String, String, Option[String], Long, String)] = {
    import spark.implicits._
    val df = hosts.zipWithIndex.map { case (h, i) => (i.toLong, h) }
      .toDF("id", "host")
    PublicSuffix.resolve(df, "host").orderBy("id").collect()
      .map(r => (r.getString(1), r.getString(2),
        Option(r.getString(3)), r.getLong(4), r.getString(5)))
      .toSeq
  }

  test("plain rules: longest match wins, one label registers") {
    assert(resolve(
      "x.y.site.com", "www.site.co.uk", "a.github.io",
      "blog.blogspot.co.uk", "bucket.s3.amazonaws.com") === Seq(
      ("x.y.site.com", "com", Some("site.com"), 1L, "plain"),
      ("www.site.co.uk", "co.uk", Some("site.co.uk"), 2L, "plain"),
      ("a.github.io", "github.io", Some("a.github.io"), 2L, "plain"),
      ("blog.blogspot.co.uk", "blogspot.co.uk",
        Some("blog.blogspot.co.uk"), 3L, "plain"),
      ("bucket.s3.amazonaws.com", "s3.amazonaws.com",
        Some("bucket.s3.amazonaws.com"), 3L, "plain")))
  }

  test("wildcard rules: * consumes exactly one label") {
    assert(resolve("shop.ck", "b.shop.ck", "ck",
      "vm.zone1.compute.amazonaws.com") === Seq(
      // the host IS the public suffix -> registered domain undefined
      ("shop.ck", "shop.ck", None, 2L, "wildcard"),
      ("b.shop.ck", "shop.ck", Some("b.shop.ck"), 2L, "wildcard"),
      // bare tail: the wildcard needs one more label; default applies
      ("ck", "ck", None, 1L, "default"),
      ("vm.zone1.compute.amazonaws.com",
        "zone1.compute.amazonaws.com",
        Some("vm.zone1.compute.amazonaws.com"), 4L, "wildcard")))
  }

  test("exception rules beat every other match") {
    assert(resolve("www.ck", "sub.www.ck", "city.kobe.jp",
      "x.city.kobe.jp", "other.kobe.jp") === Seq(
      ("www.ck", "ck", Some("www.ck"), 1L, "exception"),
      ("sub.www.ck", "ck", Some("www.ck"), 1L, "exception"),
      ("city.kobe.jp", "kobe.jp", Some("city.kobe.jp"), 2L,
        "exception"),
      ("x.city.kobe.jp", "kobe.jp", Some("city.kobe.jp"), 2L,
        "exception"),
      // non-excepted sibling stays under the *.kobe.jp wildcard: the
      // host itself is the (3-label) public suffix
      ("other.kobe.jp", "other.kobe.jp", None, 3L, "wildcard")))
  }

  test("default rule: unknown TLD registers one label; bare known " +
      "TLD has no registered domain") {
    assert(resolve("node.example", "deep.node.example", "io") === Seq(
      ("node.example", "example", Some("node.example"), 1L, "default"),
      ("deep.node.example", "example", Some("node.example"), 1L,
        "default"),
      ("io", "io", None, 1L, "plain")))
  }

  test("plan pin: resolution is broadcast-only — zero shuffle " +
      "exchanges, one broadcast join per probe level") {
    import spark.implicits._
    val df = (1 to 50).map(i => (i.toLong, s"h$i.site$i.co.uk"))
      .toDF("id", "host")
    val plan = PublicSuffix.resolve(df, "host")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("ShuffleExchange"), plan.take(3000))
    val nBroadcast = "BroadcastHashJoin".r
      .findAllMatchIn(plan).length
    assert(nBroadcast === PublicSuffix.MaxProbeLevel, plan.take(3000))
  }
}
