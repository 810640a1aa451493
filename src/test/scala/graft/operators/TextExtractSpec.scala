package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

/**
 * Hand-derived cases for the HTML extraction family (q300/q301): each
 * strip rule alone and composed, the entity decode order trap, link
 * metrics, and the outlink domain grouping through the full URL
 * canonicalization chain.
 */
class TextExtractSpec extends SparkSuite {

  private def strip(htmls: String*): Seq[String] = {
    import spark.implicits._
    htmls.toDF("h").select(TextExtract.stripMarkup(col("h")))
      .collect().map(_.getString(0)).toSeq
  }

  test("strip rules, hand-derived") {
    assert(strip(
      // tags become spaces, entities decode, whitespace collapses
      "<p>a&amp;b</p>  <b>c</b>",
      // script/style/comment content VANISHES, including the <, &&
      // and quote characters inside
      "<script>var j = 1 < 2 && \"s\";</script>keep<style>p{}</style>",
      "x<!-- dropped words -->y",
      // decode order: &amp;lt; is the ESCAPED literal '&lt;' and must
      // surface as '&lt;', never double-decode to '<'
      "&amp;lt; &lt;i&gt;",
      // decoded '<h>' is TEXT (decode happens after tag strip)
      "<h1>T &amp; U &lt;h&gt;</h1>",
      // uppercase tags strip; nbsp becomes a plain space
      "<P>one&nbsp;two</P>") === Seq(
      "a&b c",
      "keep",
      "x y",
      "&lt; <i>",
      "T & U <h>",
      "one two"))
  }

  test("markup stats: counts, md5 target and ppm floors by hand") {
    import spark.implicits._
    // raw: '<p>ab</p><a href="u">xy z</a>' -> text 'ab xy z' (7),
    // raw length 29, links 1, link text 'xy z' (4)
    val df = Seq((1L, "<p>ab</p><a href=\"u\">xy z</a>")).toDF("id", "h")
    val r = TextExtract.markupStats(df, "id", "h").head()
    assert(r.getLong(1) === 29L)
    assert(r.getLong(2) === 7L)
    assert(r.getString(3) === java.security.MessageDigest
      .getInstance("MD5").digest("ab xy z".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString)
    assert(r.getLong(4) === 1L)
    assert(r.getLong(5) === 4L)
    // markup ppm = floor(1e6 * 22/29); link density = floor(1e6 * 4/7)
    assert(r.getLong(6) === 1000000L * 22L / 29L)
    assert(r.getLong(7) === 1000000L * 4L / 7L)
  }

  test("hrefs: double-quoted, single-quoted and unquoted attribute " +
      "spellings all extract (r16 verdict gap 2c)") {
    import spark.implicits._
    val html =
      "<a href=\"http://dq.com/a\">d</a> " +
        "<a class='k' href='http://sq.org/b?x=1'>s</a> " +
        "<a id=u href=HTTPS://Uq.net:8443/u >u</a> " +
        "<a href = 'spaced.io/x'>ws around =</a> " +
        // no href at all, and an href in a non-anchor tag: neither emits
        "<a name=\"plain\">none</a> <link href=\"http://css.com/s\">"
    val got = Seq((1L, html)).toDF("id", "h")
      .select(TextExtract.hrefs(col("h")))
      .head().getSeq[String](0)
    assert(got === Seq("http://dq.com/a", "http://sq.org/b?x=1",
      "HTTPS://Uq.net:8443/u", "spaced.io/x"))
  }

  test("anchor-term profile: href↔text alignment, tokenization, " +
      "top-k tie-breaks") {
    import spark.implicits._
    val df = Seq(
      // doc 1: two anchors to t.com ('great docs', 'great stuff'), one
      // to u.co.uk; an href-less anchor contributes nothing
      (1L, "<a href=\"http://t.com/a\">Great docs</a>" +
        "<a href='https://WWW.T.com/b'>great&nbsp;stuff</a>" +
        "<a name=\"x\">ignored words</a>" +
        "<a href=\"http://u.co.uk/\">tiny</a>"),
      // doc 2: unquoted href; short tokens (< 3 chars) drop
      (2L, "<a href=http://t.com/c >great at it</a>"))
      .toDF("id", "h")
    val got = TextExtract.anchorTermProfile(df, "id", "h", 2)
      .orderBy("registered_domain", "rank").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3))).toSeq
    // t.com terms: great×3, docs×1, stuff×1 → top-2 (count desc, term
    // asc): great(3), docs(1); u.co.uk: tiny(1)
    assert(got === Seq(
      ("t.com", "great", 3L, 1L), ("t.com", "docs", 1L, 2L),
      ("u.co.uk", "tiny", 1L, 1L)))
  }

  test("anchor-term profile plan pin: rank <= k rides WindowGroupLimit") {
    import spark.implicits._
    val df = (1 to 40).map(i =>
      (i.toLong, s"<a href=" + "\"http://d" + (i % 3) +
        s".com/x\">word$i common</a>")).toDF("id", "h")
    val plan = TextExtract.anchorTermProfile(df, "id", "h", 2)
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan.take(2000))
  }

  test("outlink domains: canonicalization + registered-domain grouping") {
    import spark.implicits._
    val df = Seq(
      (1L, "<a href=\"HTTPS://WWW.T.COM:443/a\">x</a>" +
        "<a class=\"k\" href=\"http://sub.t.com/b?utm_source=z\">y</a>"),
      (2L, "<a href=\"http://media.u.co.uk:80/c\">z</a>" +
        "<a href=\"https://t.com/d\">w</a>"))
      .toDF("id", "h")
    val got = TextExtract.outlinkDomains(df, "id", "h")
      .orderBy("registered_domain").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    // t.com: three links (doc1 x2, doc2 x1) from two docs;
    // u.co.uk: one link from one doc
    assert(got === Seq(("t.com", 3L, 2L), ("u.co.uk", 1L, 1L)))
  }
}
