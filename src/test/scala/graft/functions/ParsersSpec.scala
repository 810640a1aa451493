package graft.functions

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSuite
import graft.functions.{parsers => P}

/**
 * Null-safe parser semantics (reference safeParse* contract, SURVEY §1.3;
 * FIXTURES.md F3/F4): malformed → NULL, never throw — except strictTimestamp.
 */
class ParsersSpec extends SparkSuite {
  import spark.implicits._

  private def one[T](c: org.apache.spark.sql.Column, input: String): Option[T] = {
    val r = Seq(input).toDF("v").select(c.as("r")).collect()(0)
    if (r.isNullAt(0)) None else Some(r.getAs[T](0))
  }

  test("tryInt parses valid ints, nulls malformed (F3: dir='abc')") {
    assert(one[Int](P.tryInt($"v"), "42").contains(42))
    assert(one[Int](P.tryInt($"v"), "-7").contains(-7))
    assert(one[Int](P.tryInt($"v"), "abc").isEmpty)
    assert(one[Int](P.tryInt($"v"), "1.5").isEmpty)
    assert(one[Int](P.tryInt($"v"), "").isEmpty)
  }

  test("tryInt/tryShort/tryLong: overflow → NULL, never wrap (VERDICT r1 #1)") {
    // reference Integer.parseInt throws → Optional.empty → NULL; a non-ANSI
    // Long→Int cast would instead wrap "3000000000" to -1294967296
    assert(one[Int](P.tryInt($"v"), "3000000000").isEmpty)
    assert(one[Int](P.tryInt($"v"), "-3000000000").isEmpty)
    assert(one[Int](P.tryInt($"v"), "2147483647").contains(Int.MaxValue))
    assert(one[Int](P.tryInt($"v"), "-2147483648").contains(Int.MinValue))
    assert(one[Short](P.tryShort($"v"), "40000").isEmpty)
    assert(one[Short](P.tryShort($"v"), "-40000").isEmpty)
    assert(one[Short](P.tryShort($"v"), "99999").isEmpty) // 5-digit dir garbage
    assert(one[Short](P.tryShort($"v"), "32767").contains(Short.MaxValue))
    assert(one[Short](P.tryShort($"v"), "-32768").contains(Short.MinValue))
    assert(one[Long](P.tryLong($"v"), "999999999999999999").contains(999999999999999999L))
    // the full parseLong domain: 19-digit in-range values parse...
    assert(one[Long](P.tryLong($"v"), Long.MaxValue.toString)
      .contains(Long.MaxValue))
    assert(one[Long](P.tryLong($"v"), Long.MinValue.toString)
      .contains(Long.MinValue))
    // ...19-digit overflows NULL at the cast, longer shapes at the regex
    assert(one[Long](P.tryLong($"v"), "9999999999999999999").isEmpty)
    assert(one[Long](P.tryLong($"v"), "-99999999999999999999").isEmpty)
    assert(one[Long](P.tryLong($"v"), "9999999999999999999999").isEmpty)
  }

  test("tst parse honors STAMPED offsets across the Helsinki DST " +
      "boundaries — instants, not zone rules (r14 item 8: the HFP " +
      "domain's classic failure, pinned at the parser)") {
    def epochS(input: String): Option[Long] =
      one[Long](unix_micros(P.tryTimestamp($"v")), input).map(_ / 1000000L)
    // spring-forward 2024-03-31 01:00Z: +03:00 is the post-transition
    // offset; 03:30+02:00 names a wall time that never existed in
    // Helsinki, but an offset-stamped ISO string is SELF-CONTAINED —
    // the parse must do offset arithmetic, never zone-rule lookup
    assert(epochS("2024-03-31T03:30:00+03:00").contains(1711845000L))
    assert(epochS("2024-03-31T03:30:00+02:00").contains(1711848600L))
    // fall-back 2024-10-27 01:00Z: the repeated 03:30 wall hour is two
    // REAL instants an hour apart, disambiguated only by the offset;
    // first pass (+03:00) sorts before the second (+02:00)
    val first = epochS("2024-10-27T03:30:00+03:00")
    val second = epochS("2024-10-27T03:30:00+02:00")
    assert(first.contains(1729989000L) && second.contains(1729992600L))
    assert(first.get < second.get)
    // Zulu and offset spellings of one instant agree exactly
    assert(epochS("2024-03-31T00:30:00Z") === epochS("2024-03-31T03:30:00+03:00"))
    // strict variant parses the same strings (no false batch failures
    // on legitimate offset-stamped instants)
    assert(one[Long](unix_micros(P.strictTimestamp($"v")),
      "2024-10-27T03:30:00+02:00").contains(1729992600000000L))
    // oday/start stay zone-free on the transition dates: a date is a
    // date, seconds-since-midnight is an operating-day offset
    assert(one[java.sql.Date](P.tryDate($"v"), "2024-03-31").nonEmpty)
    assert(one[Int](P.parseTimeOfDay($"v"), "03:30").contains(12600))
  }

  test("tryBool: HFP drst semantics 0/1, null on '2' (F3)") {
    assert(one[Boolean](P.tryBool($"v"), "1").contains(true))
    assert(one[Boolean](P.tryBool($"v"), "0").contains(false))
    assert(one[Boolean](P.tryBool($"v"), "true").contains(true))
    assert(one[Boolean](P.tryBool($"v"), "2").isEmpty)
    assert(one[Boolean](P.tryBool($"v"), "x").isEmpty)
  }

  test("tryDate: yyyy-MM-dd, nulls out-of-range '2024-13-99' (F3)") {
    assert(one[java.sql.Date](P.tryDate($"v"), "2024-06-05")
      .contains(java.sql.Date.valueOf("2024-06-05")))
    assert(one[java.sql.Date](P.tryDate($"v"), "2024-13-99").isEmpty)
    assert(one[java.sql.Date](P.tryDate($"v"), "05/06/2024").isEmpty)
    assert(one[java.sql.Date](P.tryDate($"v"), "junk").isEmpty)
  }

  test("parseTimeOfDay: HH:mm → seconds-since-midnight, wraps >24h (SURVEY §7.4)") {
    assert(one[Int](P.parseTimeOfDay($"v"), "08:29").contains(8 * 3600 + 29 * 60))
    assert(one[Int](P.parseTimeOfDay($"v"), "00:00").contains(0))
    assert(one[Int](P.parseTimeOfDay($"v"), "23:59").contains(23 * 3600 + 59 * 60))
    // post-midnight departure wraps like the reference's java.sql.Time path
    assert(one[Int](P.parseTimeOfDay($"v"), "25:15").contains(1 * 3600 + 15 * 60))
    assert(one[Int](P.parseTimeOfDay($"v"), "25:99").isEmpty) // F3
    assert(one[Int](P.parseTimeOfDay($"v"), "xx:yy").isEmpty) // F3
    assert(one[Int](P.parseTimeOfDay($"v"), "8").isEmpty)
  }

  test("formatTimeOfDay round-trips") {
    val r = Seq("08:29").toDF("v")
      .select(P.formatTimeOfDay(P.parseTimeOfDay($"v")).as("r")).collect()(0).getString(0)
    assert(r == "08:29:00")
  }

  test("tryTimestamp lenient vs strictTimestamp crash parity (F4)") {
    assert(one[java.sql.Timestamp](P.tryTimestamp($"v"), "2024-06-05T08:00:01.412Z")
      .contains(java.sql.Timestamp.from(java.time.Instant.parse("2024-06-05T08:00:01.412Z"))))
    assert(one[java.sql.Timestamp](P.tryTimestamp($"v"), "not-a-timestamp").isEmpty)
    // strict: matches the reference's hard failure on malformed tst
    // (QueueWriter.java:106 .get() on empty Optional)
    val ex = intercept[Exception] {
      Seq("not-a-timestamp").toDF("v").select(P.strictTimestamp($"v")).collect()
    }
    assert(ex.getMessage.contains("strict timestamp parse failed") ||
      ex.getCause != null)
  }

  test("enumGuard / invalidEnum split (F8)") {
    val df = Seq("VP", "DUE", "XX", null).toDF("v")
    val kept = df.select(P.enumGuard($"v", graft.model.HfpModel.EventTypes).as("r"))
      .collect().map(r => Option(r.getString(0)))
    assert(kept.toSeq == Seq(Some("VP"), Some("DUE"), None, None))
    val bad = df.filter(P.invalidEnum($"v", graft.model.HfpModel.EventTypes)).count()
    assert(bad == 1) // only "XX"; NULL is valid-nullable, not invalid
  }

  test("property: parsers never throw on arbitrary strings (SURVEY §5)") {
    val gen = Gen.oneOf(
      Gen.alphaNumStr, Gen.asciiPrintableStr,
      Gen.chooseNum(-1000000, 1000000).map(_.toString),
      Gen.oneOf("", " ", ":", "1:2:3", "99:99", "-0", "2024-02-30"))
    val samples = (0 until 200).flatMap(i =>
      gen.apply(Gen.Parameters.default, Seed(42L + i))) :+ null
    // single plan over all generated inputs; must evaluate without throwing
    val df = samples.map(Option(_)).toDF("v")
    val rows = df.select(
      P.tryInt($"v"), P.tryShort($"v"), P.tryLong($"v"), P.tryBool($"v"),
      P.tryDate($"v"), P.tryTimestamp($"v"), P.parseTimeOfDay($"v")).collect()
    assert(rows.length == samples.length)
  }
}
