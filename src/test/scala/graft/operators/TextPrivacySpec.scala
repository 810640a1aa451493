package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

class TextPrivacySpec extends SparkSuite {
  import spark.implicits._

  private def redacted(s: String): String =
    Seq(s).toDF("t").select(TextPrivacy.redact(col("t"))).head().getString(0)

  test("redact masks emails, urls and phones; order prevents partial leaks") {
    assert(redacted("mail a.b-c_1%d@ex-ample.co.uk please") ==
      "mail <EMAIL> please")
    assert(redacted("go to https://u:p@host/x?y=1#z now") == "go to <URL> now")
    assert(redacted("call +358-40-1234567 today") == "call <PHONE> today")
    // an email inside a URL's userinfo must redact as URL, not leak a host
    assert(redacted("see http://user@host.org/p q") == "see <URL> q")
  }

  test("redact leaves clean text untouched") {
    val t = "plain words only no contacts here"
    assert(redacted(t) == t)
  }

  test("piiCounts counts each kind once on the original text") {
    val df = Seq("x https://a.example/y and b@c.io plus +1-22-55555 end")
      .toDF("t")
    val (u, e, p) = TextPrivacy.piiCounts(col("t"))
    val r = df.select(u.as("u"), e.as("e"), p.as("p")).head()
    assert((r.getInt(0), r.getInt(1), r.getInt(2)) == ((1, 1, 1)))
  }

  test("quality classifier: stopword-rich long text keeps, digit soup drops") {
    val df = Seq(
      (1L, Seq.fill(60)("the quick fox and the dog of it").mkString(" ")),
      (2L, Seq.fill(40)("123 456 7890").mkString(" ")))
      .toDF("doc_id", "text")
    val out = TextAnalysis.qualityClassify(df, "text")
      .select("doc_id", "keep").orderBy("doc_id").collect()
    assert(out(0).getBoolean(1))
    assert(!out(1).getBoolean(1))
  }
}
