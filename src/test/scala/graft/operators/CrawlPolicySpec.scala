package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

/**
 * Hand-derived cases for the robots.txt family (q305/q306): the parse
 * contract (segments, comments, empty values), REP group choice
 * (specific eclipses star), longest-prefix + Allow-wins-ties
 * decisions, the default-allow path, and the delay preference.
 */
class CrawlPolicySpec extends SparkSuite {
  import spark.implicits._

  private val Bot = "graftbot"

  private def rules(robots: (String, String)*) =
    CrawlPolicy.parseRobots(
      robots.toSeq.toDF("domain", "robots"), "domain", "robots")

  test("parse: segments bind rules to their agent; comments, blanks " +
      "and empty values drop") {
    val got = rules(
      ("d1", "# preamble\nUser-agent: *\nDisallow: /a  # tail\n\n" +
        "Allow:\nUser-agent: graftbot\nCrawl-delay: 7\nDisallow: /b"))
      .collect().map(r => (r.getString(1), r.getString(2),
        r.getString(3))).toSeq.sorted
    // 'Allow:' (empty) drops; the comment strips from '/a'
    assert(got === Seq(("*", "disallow", "/a"),
      ("graftbot", "crawl-delay", "7"),
      ("graftbot", "disallow", "/b")))
  }

  test("gate: longest prefix wins, Allow beats Disallow on ties, " +
      "specific group eclipses star, default allow") {
    val rs = rules(
      // shadowing: /p blocked except /p/1...
      ("d1", "User-agent: *\nDisallow: /p\nAllow: /p/1"),
      // specific group eclipses the star Disallow-/ entirely
      ("d2", "User-agent: graftbot\nDisallow: /x\n" +
        "User-agent: *\nDisallow: /"),
      // tie: Allow and Disallow at equal length -> Allow wins
      ("d3", "User-agent: *\nAllow: /t\nDisallow: /t"),
      // group for someone else -> untouched
      ("d4", "User-agent: otherbot\nDisallow: /"))
    val frontier = Seq(
      (1L, "d1", "/p/1x"), (2L, "d1", "/p/9"), (3L, "d1", "/q"),
      (4L, "d2", "/x/1"), (5L, "d2", "/y"),
      (6L, "d3", "/t/z"), (7L, "d4", "/anything"))
      .toDF("id", "dom", "path")
    val got = CrawlPolicy
      .fetchGate(frontier, "id", "dom", "path", rs, Bot)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getBoolean(3),
        Option(r.getString(4)), r.getLong(5), r.getString(6))).toSeq
    assert(got === Seq(
      (1L, true, Some("/p/1"), 4L, "star"),   // shadowed allow
      (2L, false, Some("/p"), 2L, "star"),
      (3L, true, None, 0L, "none"),           // no rule matches /q
      (4L, false, Some("/x"), 2L, "specific"),
      (5L, true, None, 0L, "none"),           // star's Disallow-/ eclipsed
      (6L, true, Some("/t"), 2L, "star"),     // tie -> Allow
      (7L, true, None, 0L, "none")))
  }

  test("policy summary: counts, blocked ppm, specific delay beats star") {
    val rs = rules(
      ("d1", "User-agent: *\nDisallow: /p\nCrawl-delay: 2\n" +
        "User-agent: graftbot\nCrawl-delay: 5\nDisallow: /p"),
      ("d2", "User-agent: *\nCrawl-delay: 3\nDisallow: /z"))
    val frontier = Seq(
      (1L, "d1", "/p/a"), (2L, "d1", "/q"), (3L, "d1", "/p"),
      (4L, "d2", "/ok"))
      .toDF("id", "dom", "path")
    val gated = CrawlPolicy.fetchGate(frontier, "id", "dom", "path",
      rs, Bot)
    val got = CrawlPolicy.policySummary(gated, "dom", rs, Bot)
      .orderBy("dom").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    // d1: graftbot group blocks /p twice of 3 urls -> 666666 ppm,
    // delay 5 (specific beats star's 2); d2: nothing blocked, delay 3
    assert(got === Seq(("d1", 3L, 1L, 2L, 666666L, 5L),
      ("d2", 1L, 1L, 0L, 0L, 3L)))
  }
}
