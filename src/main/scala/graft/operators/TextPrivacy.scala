package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * PII scrubbing — a standard hygiene pass in training-data pipelines
 * (alongside dedup q22/q23 and decontamination q47): detect and mask
 * emails, URLs and phone numbers before a corpus ships.
 *
 * The regexes are deliberately written in the common subset of Java
 * regex (Spark) and RE2 (DuckDB): character classes, bounded repeats,
 * no backrefs/lookaround, a literal space class instead of `\s` (whose
 * membership differs by one control char between the dialects). The
 * SAME constants generate the oracle SQL (q69), so both engines run
 * byte-identical patterns.
 *
 * Scale shape: pure per-row projection — no shuffle, no state;
 * redaction runs at the scan and composes with any downstream operator.
 * Counts are emitted alongside so a pipeline can route high-PII
 * documents to quarantine instead of merely masking them.
 */
object TextPrivacy {

  /** Order matters: URLs first (an email regex would chew on
    * `user@host` inside a URL's userinfo), then emails, then phones. */
  val UrlRe = "https?://[^ ]+"
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\+[0-9]{1,3}-[0-9]{2,4}-[0-9]{5,9}"

  val UrlMask = "<URL>"
  val EmailMask = "<EMAIL>"
  val PhoneMask = "<PHONE>"

  /** Masked text: url → email → phone, in that order. */
  def redact(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, UrlRe, UrlMask),
        EmailRe, EmailMask),
      PhoneRe, PhoneMask)

  /** Per-kind match counts on the ORIGINAL text (pre-masking). */
  def piiCounts(text: Column): (Column, Column, Column) = {
    val noUrl = regexp_replace(text, UrlRe, UrlMask)
    (regexp_count(text, lit(UrlRe)),
      regexp_count(noUrl, lit(EmailRe)),
      regexp_count(regexp_replace(noUrl, EmailRe, EmailMask), lit(PhoneRe)))
  }
}
