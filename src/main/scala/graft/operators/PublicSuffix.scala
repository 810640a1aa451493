package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Public-Suffix-List registered-domain resolution — the PRODUCTION
 * shape of [[UrlCuration.registeredDomain]] (r16 verdict gap 2b: the
 * fixed 7-suffix regex chain was the expression-only gate path; the
 * full PSL was "designed but not built"). This operator implements the
 * full publicsuffix.org algorithm over a rule TABLE, so swapping the
 * curated subset below for the complete ~9k-rule list changes one Seq
 * and nothing else:
 *
 *  - plain rules (`co.uk`) — the last `n` labels of the host equal the
 *    rule ⇒ those `n` labels are a public suffix;
 *  - wildcard rules (`*.ck`) — `*` matches exactly one label ⇒ the
 *    last `tail+1` labels are a public suffix;
 *  - exception rules (`!www.ck`) — override every match: the public
 *    suffix is the rule minus its leftmost label;
 *  - no rule matches ⇒ the default rule `*` applies (the bare TLD is
 *    the public suffix);
 *  - exception beats everything, otherwise the match with the MOST
 *    labels wins; registered domain = public suffix + one label, NULL
 *    when the host IS a public suffix (PSL: undefined).
 *
 * Scale shape: rules are normalized at PLAN time to one row per
 * (match key, probe level) and joined as a BROADCAST hash lookup —
 * one broadcast left join per probe level (bounded by the deepest
 * rule, 3 here, ≤5 for the full PSL), each probing the host's last-j
 * labels. All probes are map-side; ZERO shuffles, no regex chains
 * that grow with the rule count (the fixed-chain gate path would need
 * one anchored regex per rule — linear per-row cost in |PSL|; the
 * hash probe is O(1) per level regardless of rule count). The winner
 * pick and the suffix/registered-domain slicing are one fixed
 * expression shape replayed verbatim by the DuckDB oracle (q303).
 *
 * ASCII/lowercase hosts are a precondition (the [[UrlCuration]]
 * canonical host contract); IDN/punycode stays out of scope as there.
 */
object PublicSuffix {

  /** Curated PSL subset in publicsuffix.org rule syntax — ICANN
    * gTLD/ccTLD entries, second-level ccTLD registries, common
    * private-section hosting suffixes, and the wildcard/exception
    * forms. Public knowledge (publicsuffix.org); swap for the full
    * list in production. */
  val Rules: Seq[String] = Seq(
    // 1-label
    "com", "org", "net", "io", "dev", "app", "edu", "gov", "mil",
    "info", "biz", "xyz", "co", "uk", "jp", "au", "de", "fr", "fi",
    "se", "nl", "br", "in", "cn", "ru", "it", "es", "pl", "ca", "ch",
    "at", "be", "dk", "no", "us", "eu", "me", "tv", "cc", "ai", "sh",
    "nz", "kr", "mx", "tr", "sg", "hk", "tw", "za", "ar", "th",
    // 2-label ccTLD registries
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "net.uk",
    "co.jp", "ne.jp", "or.jp", "ac.jp", "ad.jp",
    "com.au", "net.au", "org.au", "edu.au", "gov.au", "asn.au",
    "co.nz", "net.nz", "org.nz", "govt.nz",
    "com.br", "net.br", "org.br", "gov.br",
    "com.cn", "net.cn", "org.cn", "gov.cn",
    "co.in", "net.in", "org.in", "firm.in", "gen.in", "ind.in",
    "com.mx", "org.mx", "gob.mx", "co.kr", "or.kr", "com.tr",
    "com.sg", "com.hk", "com.tw", "co.za", "org.za", "web.za",
    "com.ar", "com.pl", "net.pl", "org.pl", "co.th", "in.th",
    // private-section hosting suffixes
    "github.io", "gitlab.io", "blogspot.com", "herokuapp.com",
    "firebaseapp.com", "web.app", "netlify.app", "vercel.app",
    "pages.dev", "workers.dev", "wordpress.com", "appspot.com",
    "cloudfront.net", "azurewebsites.net", "fastly.net",
    // 3-label
    "s3.amazonaws.com", "blogspot.co.uk",
    // wildcards
    "*.ck", "*.er", "*.bd", "*.kobe.jp", "*.compute.amazonaws.com",
    // exceptions
    "!www.ck", "!city.kobe.jp")

  /** One row per (match key, probe level): `d` = public-suffix label
    * count from a plain rule, `w` = from a wildcard rule (tail key,
    * implies level+1 labels, valid only when the host is strictly
    * deeper than the tail), `e` = from an exception rule (rule labels
    * minus one). Merged so each level needs exactly one lookup. */
  private[operators] lazy val normalized
      : Seq[(String, Int, Option[Int], Option[Int], Option[Int])] = {
    def labels(s: String): Int = s.count(_ == '.') + 1
    val rows = Rules.map {
      case r if r.startsWith("!") =>
        val k = r.drop(1); (k, labels(k), None, None, Some(labels(k) - 1))
      case r if r.startsWith("*.") =>
        val t = r.drop(2); (t, labels(t), None, Some(labels(t) + 1), None)
      case r => (r, labels(r), Some(labels(r)), None, None)
    }
    rows.groupBy(t => (t._1, t._2)).map { case ((k, l), g) =>
      (k, l,
        g.flatMap(_._3).headOption,
        g.flatMap(_._4).headOption,
        g.flatMap(_._5).headOption)
    }.toSeq.sortBy(t => (t._2, t._1))
  }

  /** Deepest probe level any rule needs. */
  lazy val MaxProbeLevel: Int = normalized.map(_._2).max

  /** Resolve (public_suffix, registered_domain, ps_labels, rule_kind)
    * for `hostCol`, appended to the input frame. One broadcast left
    * join per probe level; everything else is per-row expressions. */
  def resolve(df: DataFrame, hostCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val rules = normalized.toDF("key", "lvl", "d", "w", "e")
    var out = df.withColumn("_nl",
      size(split(col(hostCol), "\\.")).cast("int"))
    for (j <- 1 to MaxProbeLevel) {
      val r = rules.filter(col("lvl") === j)
        .select(col("key").as(s"_k$j"), col("d").as(s"_d$j"),
          col("w").as(s"_w$j"), col("e").as(s"_e$j"))
      // probe key is NULL when the host is shallower than the level —
      // a null key never equi-matches, so no per-row join predicate
      // beyond the hash lookup itself
      out = out.join(broadcast(r),
        col(s"_k$j") === when(col("_nl") >= j,
          substring_index(col(hostCol), ".", -j)),
        "left").drop(s"_k$j")
    }
    val levels = 1 to MaxProbeLevel
    // exception beats everything; at most one exception rule matches a
    // host, and if two ever did the DEEPEST (largest ps) must win —
    // coalesce from the deepest probe down
    val excPs = coalesce(levels.reverse.map(j => col(s"_e$j")): _*)
    val bestD = greatest(levels.map(j => col(s"_d$j")): _*)
    val bestW = greatest(levels.map(j =>
      when(col("_nl") > j, col(s"_w$j"))): _*)
    val anyMatch = bestD.isNotNull || bestW.isNotNull
    val ps = coalesce(excPs,
      when(anyMatch,
        greatest(coalesce(bestD, lit(0)), coalesce(bestW, lit(0))))
        .otherwise(lit(1)))
    val kind = when(excPs.isNotNull, lit("exception"))
      .when(bestW.isNotNull && (bestD.isNull || bestW > bestD),
        lit("wildcard"))
      .when(bestD.isNotNull, lit("plain"))
      .otherwise(lit("default"))
    out
      .withColumn("_ps", ps)
      .withColumn("public_suffix",
        expr(s"substring_index($hostCol, '.', -_ps)"))
      .withColumn("registered_domain",
        when(col("_nl") > col("_ps"),
          expr(s"substring_index($hostCol, '.', -(_ps + 1))")))
      .withColumn("ps_labels", col("_ps").cast("long"))
      .withColumn("rule_kind", kind)
      .drop("_nl" +: "_ps" +: levels.flatMap(j =>
        Seq(s"_d$j", s"_w$j", s"_e$j")): _*)
  }

  /** The rule table rendered as a DuckDB VALUES body — the oracle
    * consumes the SAME normalized Seq, so the two engines cannot
    * drift on the rule set (the urlSynth single-template discipline). */
  def rulesValuesSql: String = normalized.map { case (k, l, d, w, e) =>
    def o(v: Option[Int]) = v.map(_.toString).getOrElse("NULL")
    s"('$k', $l, ${o(d)}, ${o(w)}, ${o(e)})"
  }.mkString(", ")
}
