package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Null-safe scalar parsing library — the Spark restatement of the
 * reference's `HfpParser.safeParse*` helpers (observable contract at
 * QueueWriter.java:88-132; SURVEY.md §1.3).
 *
 * Semantics: malformed input → NULL, never throw — EXCEPT the strict
 * timestamp variant, mirroring the reference's unguarded `.get()` on `tst`
 * (QueueWriter.java:106) which fails the whole batch on a malformed value.
 *
 * Everything here is pure `Column` expression composition over built-in
 * functions — no UDFs — so every parse stays inside whole-stage codegen and
 * Catalyst can constant-fold / push filters through them. That is the
 * 100 TB-scale design point: a scalar UDF on a 40-column × 10^12-row scan
 * would break codegen and disable pushdown around it.
 *
 * Guards are written to be ANSI-mode safe: each potentially-throwing cast
 * is wrapped so malformed values return NULL under both
 * `spark.sql.ansi.enabled` settings.
 */
object parsers {

  private val intRe = "^[+-]?\\d{1,18}$"
  // long admits the full 19-digit range; the string→long CAST itself
  // NULLs on overflow (string casts never wrap, unlike numeric
  // narrowing), so shape + cast = exactly Long.parseLong-in-Optional
  private val longRe = "^[+-]?\\d{1,19}$"

  /**
   * Shape-guarded string → long, then range-guarded narrowing. The range
   * guard BEFORE the narrowing cast is essential: under
   * `spark.sql.ansi.enabled=false` a Long→Int/Short cast silently WRAPS on
   * overflow ("3000000000" → -1294967296), whereas the reference's
   * `Integer.parseInt` inside an Optional (QueueWriter.java:100-102) yields
   * empty → NULL. Overflow must be NULL, never a wrapped wrong value.
   */
  private def boundedIntegral(c: Column, lo: Long, hi: Long, t: DataType): Column = {
    val l = when(c.rlike(intRe), c.cast(LongType))
    when(l.between(lo, hi), l.cast(t)).otherwise(lit(null).cast(t))
  }

  /** string → int, NULL on malformed or out-of-range (ref: safeParseInt, QueueWriter.java:100-102). */
  def tryInt(c: Column): Column =
    boundedIntegral(c, Int.MinValue, Int.MaxValue, IntegerType)

  /** string → short, NULL on malformed or out-of-range; for SMALLINT columns like `dir`. */
  def tryShort(c: Column): Column =
    boundedIntegral(c, Short.MinValue, Short.MaxValue, ShortType)

  /** string → long, NULL on malformed or overflowing — the full
    * Long.parseLong domain: 19-digit values up to Long.MaxValue parse
    * (the previous 18-digit guard silently rejected them), 19-digit
    * overflows NULL at the cast. */
  def tryLong(c: Column): Column =
    when(c.rlike(longRe), c.cast(LongType)).otherwise(lit(null).cast(LongType))

  /** string → double, NULL on malformed — shape-guarded so the cast is
    * ANSI-safe (a matching plain decimal can at worst overflow to
    * Infinity, which double casts never throw on). */
  def tryDouble(c: Column): Column =
    when(c.rlike("^[+-]?(\\d+(\\.\\d*)?|\\.\\d+)$"), c.cast(DoubleType))
      .otherwise(lit(null).cast(DoubleType))

  /**
   * string → boolean, NULL on malformed (ref: safeParseBoolean,
   * QueueWriter.java:117-119). HFP `drst` is "0"/"1"; "true"/"false" also
   * accepted for robustness.
   */
  def tryBool(c: Column): Column = {
    val lc = lower(trim(c))
    when(lc.isin("1", "true"), lit(true))
      .when(lc.isin("0", "false"), lit(false))
      .otherwise(lit(null).cast(BooleanType))
  }

  /**
   * string "yyyy-MM-dd" → date, NULL on malformed (ref: safeParseDate,
   * QueueWriter.java:121-123). The regex admits shape-valid strings like
   * "2024-13-99"; `try_to_timestamp` then rejects out-of-range fields
   * without throwing under ANSI mode.
   */
  def tryDate(c: Column): Column =
    when(c.rlike("^\\d{4}-\\d{2}-\\d{2}$"),
      try_to_timestamp(c, lit("yyyy-MM-dd")).cast(DateType))
      .otherwise(lit(null).cast(DateType))

  /**
   * ISO-8601 string → timestamp, NULL on malformed. Lenient variant of the
   * `tst` parse (ref: safeParseTimestamp, QueueWriter.java:106).
   */
  def tryTimestamp(c: Column): Column = try_to_timestamp(c)

  /**
   * ISO-8601 string → timestamp, strict: a non-null unparsable value raises,
   * matching the reference's `.get()` on an empty Optional
   * (QueueWriter.java:106) that fails (and rolls back) the whole batch.
   */
  def strictTimestamp(c: Column): Column = {
    val parsed = try_to_timestamp(c)
    when(c.isNotNull && parsed.isNull,
      raise_error(concat(lit("strict timestamp parse failed: "), c)))
      .otherwise(parsed)
  }

  /**
   * "HH:mm" time-of-day → Int seconds-since-midnight, NULL on malformed
   * (ref: safeParseTime, QueueWriter.java:88-90,127-129; SURVEY §7.4).
   *
   * Spark has no TIME type; seconds-since-midnight sorts, ranges and
   * subtracts correctly, which is what the reference's B-tree index on
   * `journey_start_time` (run/init.sql:80) exists for. HSL operating-day
   * times may exceed 24:00 for post-midnight departures; like the
   * reference's java.sql.Time path we wrap modulo 24 h and flag it as a
   * known quirk (SURVEY §7.4).
   */
  def parseTimeOfDay(c: Column): Column = {
    val parts = split(c, ":")
    val hh = parts.getItem(0).cast(IntegerType)
    val mm = parts.getItem(1).cast(IntegerType)
    when(c.rlike("^\\d{1,2}:\\d{2}$") && mm < 60,
      pmod(hh * 3600 + mm * 60, lit(86400)))
      .otherwise(lit(null).cast(IntegerType))
  }

  /** Int seconds-since-midnight → "HH:mm:ss" display string (PG TIME parity view). */
  def formatTimeOfDay(c: Column): Column =
    when(c.isNotNull, concat(
      lpad((c / 3600).cast(IntegerType).cast(StringType), 2, "0"), lit(":"),
      lpad(pmod(c / 60, lit(60)).cast(IntegerType).cast(StringType), 2, "0"), lit(":"),
      lpad(pmod(c, lit(60)).cast(StringType), 2, "0")))

  /** epoch milliseconds → timestamp (ref: received_at, QueueWriter.java:62). */
  def epochMillisToTimestamp(c: Column): Column = timestamp_millis(c)

  /**
   * Enum-domain guard: value in domain → value, else NULL. Replaces the
   * reference's server-side `?::ENUM` casts (QueueWriter.java:45-46) with a
   * cheap codegen'd `isin`; pair with [[invalidEnum]] to route rejects to a
   * dead-letter output instead of poisoning the batch (SURVEY §7.4).
   */
  def enumGuard(c: Column, domain: Seq[String]): Column =
    when(c.isin(domain.map(lit): _*), c).otherwise(lit(null).cast(StringType))

  /** True when a non-null value falls outside its enum domain (dead-letter predicate). */
  def invalidEnum(c: Column, domain: Seq[String]): Column =
    c.isNotNull && !c.isin(domain.map(lit): _*)
}
