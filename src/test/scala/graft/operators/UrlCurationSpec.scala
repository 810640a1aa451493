package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

/**
 * Hand-derived cases for the URL-curation family (q296/q297): each
 * canonicalization rule exercised alone and in combination, the
 * registered-domain longest-match, and the per-domain cap accounting
 * on a frame whose kept set and checksums are computed by hand.
 */
class UrlCurationSpec extends SparkSuite {

  private def canon(urls: String*): Seq[(String, String, String)] = {
    import spark.implicits._
    val df = urls.zipWithIndex.map { case (u, i) => (i.toLong, u) }
      .toDF("id", "url")
    UrlCuration.canonicalizeDocs(df, "id", "url")
      .orderBy("id")
      .collect()
      .map(r => (r.getString(1), r.getString(2), r.getString(3)))
      .toSeq
  }

  test("canonicalization: the six rules, hand-derived") {
    val got = canon(
      // case noise + www + default https port + trailing slash +
      // tracking params + fragment, all at once
      "HTTPS://WWW.Src1.COM:443/p/3/?utm_source=feed&id=7&utm_campaign=x#sec",
      // :443 on http is NON-default and must be kept; subdomain stays
      "http://media.SrcX.co.uk:443/p/10",
      // root path never loses its slash; params sort bytewise
      "Https://Host.IO:8080/?b=2&a=1",
      // default http port dropped
      "http://example.org:80/x",
      // no known public suffix: host registers as itself
      "https://localhost/a",
      // empty path reads '/'
      "http://A.com",
      // only tracking params -> the '?' goes away entirely
      "https://WWW.a.CO.UK/p/?id=3&ref=abc&gclid=zzz",
      // a query BEFORE any path must not fold into the host (r16
      // advice #2): authority ends at the first of '/' or '?'
      "http://H.com?a=1",
      "https://www.Q.io?b=2&utm_source=x&a=1#frag")
    assert(got === Seq(
      ("https://src1.com/p/3?id=7", "src1.com", "src1.com"),
      ("http://media.srcx.co.uk:443/p/10", "media.srcx.co.uk",
        "srcx.co.uk"),
      ("https://host.io:8080/?a=1&b=2", "host.io", "host.io"),
      ("http://example.org/x", "example.org", "example.org"),
      ("https://localhost/a", "localhost", "localhost"),
      ("http://a.com/", "a.com", "a.com"),
      ("https://a.co.uk/p?id=3", "a.co.uk", "a.co.uk"),
      ("http://h.com/?a=1", "h.com", "h.com"),
      ("https://q.io/?a=1&b=2", "q.io", "q.io")))
  }

  test("registered domain: longest suffix wins, one label kept") {
    import spark.implicits._
    val hosts = Seq("x.y.example.com", "a.b.co.uk", "deep.sub.site.io",
      "plain.dev", "weird.host").toDF("h")
    val got = hosts.select(UrlCuration.registeredDomain(col("h")))
      .collect().map(_.getString(0)).toSeq
    assert(got === Seq("example.com", "b.co.uk", "site.io",
      "plain.dev", "weird.host"))
  }

  test("per-domain cap: kept set, checksums and dropped accounting") {
    import spark.implicits._
    // domain X: 7 docs, weights make the top-3 {id3(w9), id5(w7),
    // id6(w7)} (weight desc, id asc tie-break); domain Y: 2 docs,
    // under the cap, nothing dropped
    val df = Seq(
      ("X", 1L, 5L), ("X", 2L, 5L), ("X", 3L, 9L), ("X", 4L, 2L),
      ("X", 5L, 7L), ("X", 6L, 7L), ("X", 7L, 1L),
      ("Y", 10L, 4L), ("Y", 11L, 8L))
      .toDF("dom", "id", "w")
    val got = UrlCuration.capPerDomain(df, "dom", "id", "w", 3)
      .orderBy("dom").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
      .toSeq
    assert(got === Seq(
      ("X", 7L, 3L, 4L, 3L + 5L + 6L, 9L + 7L + 7L, 36L - 23L),
      ("Y", 2L, 2L, 0L, 21L, 12L, 0L)))
  }

  test("canonicalization is idempotent over the full synthesized " +
      "URL space") {
    import spark.implicits._
    // every CASE-arm combination the q296 synthesis can produce:
    // drive all moduli through 0..max via one id range
    val df = spark.range(0, 2520) // lcm(3,5,4,7,2,9) covers all arms
      .select(col("id"),
        expr("""concat(
          CASE CAST(id % 3 AS INT) WHEN 0 THEN 'HTTPS'
            WHEN 1 THEN 'http' ELSE 'Https' END, '://',
          CASE CAST(id % 5 AS INT) WHEN 0 THEN 'WWW.'
            WHEN 1 THEN 'www.' WHEN 2 THEN 'media.' ELSE '' END,
          'src', CAST(id % 20 AS STRING),
          CASE CAST(id % 4 AS INT) WHEN 0 THEN '.COM'
            WHEN 1 THEN '.com' WHEN 2 THEN '.CO.UK' ELSE '.io' END,
          CASE CAST(id % 7 AS INT) WHEN 0 THEN ':443'
            WHEN 1 THEN ':80' WHEN 2 THEN ':8080' ELSE '' END,
          '/p/', CAST(id div 7 AS STRING),
          CASE WHEN id % 2 = 0 THEN '/' ELSE '' END,
          CASE CAST(id % 4 AS INT)
            WHEN 0 THEN concat('?utm_source=feed&id=',
              CAST(id % 50 AS STRING), '&utm_campaign=x')
            WHEN 1 THEN concat('?id=', CAST(id % 50 AS STRING),
              '&ref=abc&gclid=zzz')
            WHEN 2 THEN '?b=2&a=1' ELSE '' END,
          CASE WHEN id % 9 = 0 THEN '#sec' ELSE '' END)""").as("url"))
    val once = UrlCuration.canonicalizeDocs(df, "id", "url")
      .select(col("id"), col("canonical_url").as("url"))
    val twice = UrlCuration.canonicalizeDocs(once, "id", "url")
    val diff = once
      .join(twice.select(col("id"),
        col("canonical_url").as("url2")), Seq("id"))
      .filter(col("url") =!= col("url2"))
    assert(diff.count() === 0L)
  }

  test("plan pin: the cap's rn <= K filter rides WindowGroupLimit " +
      "(partial top-K before the shuffle)") {
    import spark.implicits._
    val df = (1 to 100).map(i => (s"d${i % 7}", i.toLong, (i * 13 % 50).toLong))
      .toDF("dom", "id", "w")
    val plan = UrlCuration.capPerDomain(df, "dom", "id", "w", 3)
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan.take(2000))
  }
}
