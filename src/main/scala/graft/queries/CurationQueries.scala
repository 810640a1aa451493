package graft.queries

import org.apache.spark.sql.functions._

import Tables._
import graft.operators.{CrawlPolicy, PublicSuffix, UrlCuration}

/**
 * URL/domain curation queries (r15 verdict item 4) — the standard
 * CommonCrawl/CCNet curation steps: canonical-URL normalization,
 * registered-domain grouping, and per-domain document caps with honest
 * truncation accounting.
 *
 * The documents table carries no URL column, so both engines synthesize
 * the SAME deterministic messy URL per document from (doc_id, source)
 * — the established planting discipline (q286's shifts, q97's dup
 * slice): scheme/host case noise, www and subdomain prefixes, default
 * and non-default ports (including the tricky :443-on-http, which must
 * be KEPT), tracking params, unsorted params, trailing slashes and
 * fragments. The synthesis template is one Scala string rendered for
 * each engine's cast/intdiv spelling, so the inputs cannot drift.
 */
object CurationQueries {

  /** q297 per-domain cap (quality-first: n_chars DESC, doc_id ASC). */
  val DomainCapK = 5

  /** q304 anchor-term profile depth per target domain. */
  val AnchorTopK = 3

  /** Messy-URL synthesis shared by Spark (`STRING`/`div`) and DuckDB
    * (`VARCHAR`/`//`). Every CASE arm is keyed on a different modulus
    * so the canonicalization rules compose in many combinations. */
  private def urlSynth(strT: String, intDiv: String): String = s"""
    (CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'HTTPS'
       WHEN 1 THEN 'http' ELSE 'Https' END)
    || '://' ||
    (CASE CAST(doc_id % 5 AS INT) WHEN 0 THEN 'WWW.'
       WHEN 1 THEN 'www.' WHEN 2 THEN 'media.' ELSE '' END)
    || source ||
    (CASE CAST(doc_id % 4 AS INT) WHEN 0 THEN '.COM'
       WHEN 1 THEN '.com' WHEN 2 THEN '.CO.UK' ELSE '.io' END)
    ||
    (CASE CAST(doc_id % 7 AS INT) WHEN 0 THEN ':443'
       WHEN 1 THEN ':80' WHEN 2 THEN ':8080' ELSE '' END)
    || '/p/' || CAST(doc_id $intDiv 7 AS $strT) ||
    (CASE WHEN doc_id % 2 = 0 THEN '/' ELSE '' END)
    ||
    (CASE CAST(doc_id % 4 AS INT)
       WHEN 0 THEN '?utm_source=feed&id=' || CAST(doc_id % 50 AS $strT)
         || '&utm_campaign=x'
       WHEN 1 THEN '?id=' || CAST(doc_id % 50 AS $strT)
         || '&ref=abc&gclid=zzz'
       WHEN 2 THEN '?b=2&a=1' ELSE '' END)
    ||
    (CASE WHEN doc_id % 9 = 0 THEN '#sec' ELSE '' END)"""

  /** q305/q306 robots.txt synthesis, keyed DETERMINISTICALLY off the
    * domain string itself (length + first-char code — both engines):
    * five arms covering a star group with prefix shadowing + delay, a
    * specific group that must ECLIPSE the star group entirely, an
    * allow-all with comments/preamble, a group for someone else
    * (default-allow), and an EMPTY Disallow (restricts nothing) with
    * a specific crawl delay. */
  private def robotsSynth: String = """
    (CASE CAST((length(domain) * 7 + ascii(substr(domain, 1, 1))) % 5
        AS INT)
      WHEN 0 THEN 'User-agent: *' || chr(10) || 'Disallow: /p'
        || chr(10) || 'Allow: /p/1' || chr(10) || 'Crawl-delay: 2'
      WHEN 1 THEN 'User-agent: graftbot' || chr(10)
        || 'Disallow: /p/3' || chr(10) || 'User-agent: *' || chr(10)
        || 'Disallow: /'
      WHEN 2 THEN '# banner' || chr(10) || 'User-agent: *' || chr(10)
        || 'Allow: /   # trailing comment'
      WHEN 3 THEN 'User-agent: otherbot' || chr(10) || 'Disallow: /'
      ELSE 'User-agent: graftbot' || chr(10) || 'Disallow:'
        || chr(10) || 'Crawl-delay: 5' END)"""

  /** DuckDB CTE chain from the q296 canonical frame `rd` to the gated
    * frontier `g`: frontier paths, synthesized robots per distinct
    * domain, segment-split parse, group choice, longest-prefix
    * decision (row_number twin of Spark's max-struct). */
  private def robotsGateChain: String = s"""
    f AS (SELECT doc_id, registered_domain,
      split_part(regexp_replace(canonical_url, '^[a-z]+://[^/]*', ''),
        '?', 1) AS path FROM rd),
    doms AS (SELECT DISTINCT registered_domain AS domain FROM f),
    rb AS (SELECT domain, $robotsSynth AS robots FROM doms),
    sg AS (SELECT domain, unnest(string_split(robots, 'User-agent:'))
      AS seg FROM rb),
    rl AS (SELECT domain,
      trim(string_split(seg, chr(10))[1]) AS agent,
      unnest(list_slice(string_split(seg, chr(10)), 2,
        len(string_split(seg, chr(10))))) AS line0 FROM sg),
    pr AS (SELECT domain, agent,
      lower(trim(regexp_extract(trim(regexp_replace(line0, '#.*$$', '')),
        '^([A-Za-z-]+)\\s*:', 1))) AS kind,
      trim(regexp_extract(trim(regexp_replace(line0, '#.*$$', '')),
        '^[A-Za-z-]+\\s*:\\s*(.*)$$', 1)) AS prefix FROM rl),
    rls AS (SELECT * FROM pr
      WHERE kind IN ('allow', 'disallow', 'crawl-delay')
        AND prefix <> ''),
    pths AS (SELECT * FROM rls WHERE kind IN ('allow', 'disallow')),
    hs AS (SELECT DISTINCT domain FROM pths WHERE agent = 'graftbot'),
    chosen AS (
      SELECT domain, kind, prefix, 'specific' AS grp FROM pths
      WHERE agent = 'graftbot'
      UNION ALL
      SELECT p.domain, kind, prefix, 'star' FROM pths p
      WHERE agent = '*'
        AND p.domain NOT IN (SELECT domain FROM hs)),
    candr AS (SELECT f.doc_id, length(c.prefix) AS len,
        CASE WHEN c.kind = 'allow' THEN 1 ELSE 0 END AS allow,
        c.prefix, c.grp,
        row_number() OVER (PARTITION BY f.doc_id
          ORDER BY length(c.prefix) DESC,
            CASE WHEN c.kind = 'allow' THEN 1 ELSE 0 END DESC,
            c.prefix DESC, c.grp DESC) AS rn
      FROM f JOIN chosen c ON f.registered_domain = c.domain
        AND starts_with(f.path, c.prefix)),
    bst AS (SELECT doc_id, len, allow, prefix, grp FROM candr
      WHERE rn = 1),
    g AS (SELECT f.doc_id, f.registered_domain, f.path,
      coalesce(bst.allow = 1, TRUE) AS allowed,
      bst.prefix AS matched_prefix,
      CAST(coalesce(bst.len, 0) AS BIGINT) AS matched_len,
      coalesce(bst.grp, 'none') AS agent_group
      FROM f LEFT JOIN bst USING (doc_id))"""

  /** DuckDB replay of UrlCuration.registeredDomain over a `host`
    * column: longest-suffix coalesce chain, host itself as fallback. */
  private def rdCoalesce: String = {
    val chain = (UrlCuration.PublicSuffixes2 ++
      UrlCuration.PublicSuffixes1).map { s =>
      val esc = s.replace(".", "\\.")
      s"nullif(regexp_extract(host, '([^.]+\\.$esc)$$', 1), '')"
    }.mkString(", ")
    s"coalesce($chain, host)"
  }

  /** DuckDB replay of the UrlCuration.canonicalParts +
    * registeredDomain pipeline as a CTE chain ending in relation `rd`
    * with (doc_id, canonical_url, host, registered_domain); `uBody`
    * is the SELECT producing the (doc_id, url) input relation. */
  private def canonChain(uBody: String): String = {
    val rdChain = (UrlCuration.PublicSuffixes2 ++
      UrlCuration.PublicSuffixes1).map { s =>
      val esc = s.replace(".", "\\.")
      s"nullif(regexp_extract(host, '([^.]+\\.$esc)$$', 1), '')"
    }.mkString(", ")
    val drop = UrlCuration.TrackingTokenPrefixes
      .map(p => s"starts_with(p, '$p')").mkString(" OR ")
    s"""
    u AS ($uBody),
    s1 AS (SELECT doc_id, split_part(url, '#', 1) AS nofrag FROM u),
    s2 AS (SELECT doc_id, nofrag,
      lower(split_part(nofrag, '://', 1)) AS scheme,
      substr(nofrag, length(split_part(nofrag, '://', 1)) + 4) AS rest
      FROM s1),
    s3 AS (SELECT *, regexp_extract(rest, '^[^/?]*') AS hostport,
      substr(rest, length(regexp_extract(rest, '^[^/?]*')) + 1) AS pathq
      FROM s2),
    s4 AS (SELECT *,
      regexp_replace(lower(regexp_replace(hostport, ':[0-9]+$$', '')),
        '^www\\.', '') AS host,
      regexp_extract(hostport, ':([0-9]+)$$', 1) AS port FROM s3),
    s5 AS (SELECT *, split_part(pathq, '?', 1) AS path0,
      CASE WHEN contains(pathq, '?') THEN split_part(pathq, '?', 2)
        ELSE '' END AS q FROM s4),
    s6 AS (SELECT *,
      CASE WHEN path0 = '' THEN '/'
        WHEN length(path0) > 1 AND ends_with(path0, '/')
          THEN substr(path0, 1, length(path0) - 1)
        ELSE path0 END AS path1,
      list_sort(list_filter(string_split(q, '&'),
        p -> p <> '' AND NOT ($drop))) AS params FROM s5),
    rd AS (SELECT doc_id,
      scheme || '://' || host ||
      CASE WHEN port <> '' AND NOT ((scheme = 'http' AND port = '80')
          OR (scheme = 'https' AND port = '443'))
        THEN ':' || port ELSE '' END
      || path1 ||
      CASE WHEN len(params) > 0
        THEN '?' || array_to_string(params, '&') ELSE '' END
        AS canonical_url,
      host,
      coalesce($rdChain, host) AS registered_domain FROM s6)"""
  }

  /** The q296/q297 instance: synthesized URLs over documents. */
  private def oracleCanonChain: String = canonChain(
    s"""SELECT doc_id, ${urlSynth("VARCHAR", "//")} AS url
      FROM documents""")

  /** q300/q301 deterministic messy-HTML synthesis (one template, both
    * engines): each document's text wrapped in a page with doc_id-keyed
    * style/script/comment blocks (content must VANISH), entity-bearing
    * headers, an unconditional tracking-parameterized anchor splitting
    * the text mid-body, and a second anchor on even ids. */
  private def htmlSynth(strT: String): String = s"""
    '<!DOCTYPE html><html><head><title>D' || CAST(doc_id AS $strT)
    || '</title>'
    || (CASE WHEN doc_id % 3 = 0
        THEN '<style type="text/css">p.x { color: red; }</style>'
        ELSE '' END)
    || (CASE WHEN doc_id % 4 = 0
        THEN '<script>var j = 1 < 2 && "s";</script>' ELSE '' END)
    || '</head><body>'
    || (CASE WHEN doc_id % 5 = 0
        THEN '<!-- hidden comment words -->' ELSE '' END)
    || '<h1 class="t">T &amp; U &lt;h&gt;</h1><P>'
    || substr(text, 1, 120)
    || ' <a href="HTTPS://WWW.Out' || CAST(doc_id % 13 AS $strT)
    || '.COM:443/p/' || CAST(doc_id % 9 AS $strT)
    || '/?utm_source=z&id=' || CAST(doc_id % 4 AS $strT)
    || '">anchor ' || CAST(doc_id % 5 AS $strT) || '</a> '
    || (CASE WHEN doc_id % 2 = 0
        THEN '<a class="x" href="http://media.out'
          || CAST(doc_id % 7 AS $strT)
          || '.CO.UK:80/q">second&nbsp;link</a>' ELSE '' END)
    || (CASE WHEN doc_id % 3 = 1
        THEN '<a href=' || chr(39) || 'http://Sq'
          || CAST(doc_id % 6 AS $strT)
          || '.Org/a/b/?x=1&utm_medium=m' || chr(39)
          || '>sq</a>' ELSE '' END)
    || (CASE WHEN doc_id % 7 = 0
        THEN '<a id=u href=HTTPS://Uq' || CAST(doc_id % 11 AS $strT)
          || '.net:8443/u >unq</a>' ELSE '' END)
    || substr(text, 121)
    || '</p><br/></body></html>'"""

  /** q303 host synthesis: every PSL rule form — deep subdomains under
    * 1/2/3-label plain rules, wildcard suffixes (host-as-suffix and
    * one-deeper), exception rules at two depths, an unknown TLD
    * (default rule), a private 3-label suffix, and a bare TLD. One
    * template, both engines. */
  private def hostSynth(strT: String): String = s"""
    (CASE CAST(doc_id % 13 AS INT)
      WHEN 0 THEN 'a' || CAST(doc_id % 7 AS $strT) || '.github.io'
      WHEN 1 THEN 'www.site' || CAST(doc_id % 5 AS $strT) || '.co.uk'
      WHEN 2 THEN 'x.y.site' || CAST(doc_id % 5 AS $strT) || '.com'
      WHEN 3 THEN 'shop' || CAST(doc_id % 3 AS $strT) || '.ck'
      WHEN 4 THEN 'b.shop' || CAST(doc_id % 3 AS $strT) || '.ck'
      WHEN 5 THEN 'www.ck'
      WHEN 6 THEN 'sub.www.ck'
      WHEN 7 THEN 'node' || CAST(doc_id % 4 AS $strT) || '.example'
      WHEN 8 THEN 'bucket' || CAST(doc_id % 3 AS $strT)
        || '.s3.amazonaws.com'
      WHEN 9 THEN 'vm' || CAST(doc_id % 3 AS $strT)
        || '.zone1.compute.amazonaws.com'
      WHEN 10 THEN 'city.kobe.jp'
      WHEN 11 THEN 'blog' || CAST(doc_id % 4 AS $strT)
        || '.blogspot.co.uk'
      ELSE 'io' END)"""

  /** DuckDB twin of TextExtract.stripMarkup around any expression:
    * comment/script/style blocks vanish with content, tags become
    * spaces, the five entities decode with &amp; last, whitespace
    * collapses. */
  private def stripSql(in: String): String = s"""
    trim(regexp_replace(
      replace(replace(replace(replace(replace(replace(
        regexp_replace(regexp_replace(regexp_replace(regexp_replace(
          $in,
          '(?s)<!--.*?-->', ' ', 'g'),
          '(?is)<script[^>]*>.*?</script>', ' ', 'g'),
          '(?is)<style[^>]*>.*?</style>', ' ', 'g'),
          '<[^>]+>', ' ', 'g'),
        '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
        '&#39;', CHR(39)), '&nbsp;', ' '), '&amp;', '&'),
      '\\s+', ' ', 'g'))"""

  val all: Map[String, GraftQuery] = Map(

    // ------------------------------------------------------------------
    // q296 — canonical-URL normalization + registered-domain grouping
    // (UrlCuration.canonicalizeDocs): per document, the six-rule
    // canonical form, the canonical host and its registered domain
    // under the fixed public-suffix subset. Expression-only map-side
    // plan; the oracle replays every rule as a CTE chain on the
    // identical synthesized URL.
    // ------------------------------------------------------------------
    "q296_url_canonicalize" -> GraftQuery(
      build = (s, d) => {
        val docs = documents(s, d)
          .withColumn("url", expr(urlSynth("STRING", "div")))
        UrlCuration.canonicalizeDocs(docs, "doc_id", "url")
          .orderBy("doc_id")
      },
      oracle = Some(s"""
        WITH $oracleCanonChain
        SELECT doc_id, canonical_url, host, registered_domain
        FROM rd ORDER BY doc_id""")),

    // ------------------------------------------------------------------
    // q297 — per-domain document cap with truncation accounting
    // (UrlCuration.capPerDomain): keep at most K docs per registered
    // domain, quality-first (n_chars DESC, doc_id ASC), and report per
    // domain the totals before/after, the kept-id checksum and the
    // kept/dropped weight — truncation as an auditable measurement.
    // The rn <= K filter rides WindowGroupLimit (partial top-k before
    // the shuffle); dropped rows never leave the executors.
    // ------------------------------------------------------------------
    "q297_domain_cap" -> GraftQuery(
      build = (s, d) => {
        // one projection carries n_chars beside the domain — a
        // re-join of documents for the weight column would scan and
        // shuffle the corpus twice for no reason
        val docs = documents(s, d)
          .withColumn("url", expr(urlSynth("STRING", "div")))
        val (_, host) = UrlCuration.canonicalParts(col("url"))
        val rd = docs.select(col("doc_id"),
          UrlCuration.registeredDomain(host).as("registered_domain"),
          col("n_chars"))
        UrlCuration.capPerDomain(rd, "registered_domain", "doc_id",
          "n_chars", DomainCapK)
          .orderBy("registered_domain")
      },
      oracle = Some(s"""
        WITH $oracleCanonChain,
        d AS (SELECT rd.doc_id, registered_domain, n_chars
          FROM rd JOIN documents ON rd.doc_id = documents.doc_id),
        r AS (SELECT *, row_number() OVER (PARTITION BY registered_domain
            ORDER BY n_chars DESC, doc_id) AS rn FROM d),
        kept AS (SELECT registered_domain,
            CAST(count(*) AS BIGINT) AS n_kept,
            CAST(sum(doc_id) AS BIGINT) AS kept_id_sum,
            CAST(sum(n_chars) AS BIGINT) AS kept_weight
          FROM r WHERE rn <= $DomainCapK GROUP BY 1),
        tot AS (SELECT registered_domain,
            CAST(count(*) AS BIGINT) AS n_total,
            CAST(sum(n_chars) AS BIGINT) AS total_weight
          FROM d GROUP BY 1)
        SELECT tot.registered_domain, n_total, n_kept,
          n_total - n_kept AS n_dropped, kept_id_sum, kept_weight,
          total_weight - kept_weight AS dropped_weight
        FROM tot JOIN kept ON tot.registered_domain = kept.registered_domain
        ORDER BY tot.registered_domain""")),

    // ------------------------------------------------------------------
    // q300 — HTML -> text extraction metrics (TextExtract.markupStats):
    // per document over the synthesized messy page — raw/extracted
    // sizes, the md5 of the EXACT extracted text (the oracle verifies
    // the extraction itself, not just lengths), anchor count, link-text
    // share and the markup/link-density ppm gates a crawl pipeline
    // filters on. One narrow map-side projection; the oracle replays
    // the synthesis and all four strip rules.
    // ------------------------------------------------------------------
    "q300_html_extract" -> GraftQuery(
      build = (s, d) => {
        val docs = documents(s, d)
          .withColumn("html", expr(htmlSynth("STRING")))
        graft.operators.TextExtract.markupStats(docs, "doc_id", "html")
          .orderBy("doc_id")
      },
      oracle = Some(s"""
        WITH h AS (SELECT doc_id, ${htmlSynth("VARCHAR")} AS html
          FROM documents),
        t AS (SELECT doc_id, html,
          ${stripSql("html")} AS txt,
          regexp_extract_all(html, '(?is)<a[^>]*>(.*?)</a>', 1)
            AS anchors FROM h),
        m AS (SELECT doc_id,
          CAST(length(html) AS BIGINT) AS n_raw_chars,
          CAST(length(txt) AS BIGINT) AS n_text_chars,
          md5(txt) AS text_md5,
          CAST(len(anchors) AS BIGINT) AS n_links,
          CAST(length(${stripSql("array_to_string(anchors, ' ')")})
            AS BIGINT) AS link_text_chars
          FROM t)
        SELECT doc_id, n_raw_chars, n_text_chars, text_md5, n_links,
          link_text_chars,
          (1000000 * (n_raw_chars - n_text_chars)) // n_raw_chars
            AS markup_ratio_ppm,
          CASE WHEN n_text_chars > 0
            THEN (1000000 * link_text_chars) // n_text_chars END
            AS link_density_ppm
        FROM m ORDER BY doc_id""")),

    // ------------------------------------------------------------------
    // q301 — domain-level outlink graph (TextExtract.outlinkDomains):
    // hrefs exploded from the synthesized pages, canonicalized with the
    // FULL q296 rule chain (case, www, default ports, tracking params),
    // grouped by the target registered domain — link counts + distinct
    // linking docs, the web-graph aggregation behind link-spam scoring
    // and per-domain crawl budgets. One Generate + map-side
    // canonicalization + ONE shuffle on the domain.
    // ------------------------------------------------------------------
    "q301_outlink_domains" -> GraftQuery(
      build = (s, d) => {
        val docs = documents(s, d)
          .withColumn("html", expr(htmlSynth("STRING")))
        graft.operators.TextExtract
          .outlinkDomains(docs, "doc_id", "html")
          .orderBy("registered_domain")
      },
      oracle = Some(s"""
        WITH h AS (SELECT doc_id, ${htmlSynth("VARCHAR")} AS html
          FROM documents),
        ${canonChain("""SELECT src_doc AS doc_id, url FROM (
          SELECT h.doc_id AS src_doc, unnest(list_transform(
            regexp_extract_all(html,
              '(?is)<a[^>]*\shref\s*=\s*("[^"]*"|''[^'']*''|[^"''\s>]+)',
              1),
            v -> regexp_replace(v, '^["'']|["'']$', '', 'g'))) AS url
          FROM h) x""")}
        SELECT registered_domain, CAST(count(*) AS BIGINT) AS n_links,
          CAST(count(DISTINCT doc_id) AS BIGINT) AS n_src_docs
        FROM rd GROUP BY registered_domain ORDER BY registered_domain""")),

    // ------------------------------------------------------------------
    // q303 — full-PSL registered-domain resolution (PublicSuffix.
    // resolve): the production shape of q296's fixed-chain extraction
    // (r16 verdict gap 2b) — plain/wildcard/exception rules as a
    // broadcast lookup table, one broadcast hash probe per suffix
    // level, exception-beats-longest-match winner pick, NULL when the
    // host IS a public suffix. The oracle consumes the identical
    // normalized rule table (PublicSuffix.rulesValuesSql) and replays
    // the match/pick/slice chain.
    // ------------------------------------------------------------------
    "q303_psl_registered_domain" -> GraftQuery(
      build = (s, d) => {
        val hosts = documents(s, d)
          .select(col("doc_id"), expr(hostSynth("STRING")).as("host"))
        PublicSuffix.resolve(hosts, "host")
          .select(col("doc_id"), col("host"), col("public_suffix"),
            col("registered_domain"), col("ps_labels"), col("rule_kind"))
          .orderBy("doc_id")
      },
      oracle = Some(s"""
        WITH rules(key, lvl, d, w, e) AS (
          VALUES ${PublicSuffix.rulesValuesSql}),
        h AS (SELECT doc_id, ${hostSynth("VARCHAR")} AS host
          FROM documents),
        hx AS (SELECT doc_id, host,
          len(string_split(host, '.')) AS nl FROM h),
        m AS (SELECT hx.doc_id, hx.host, hx.nl, r.lvl, r.d, r.w, r.e
          FROM hx LEFT JOIN rules r
          ON hx.nl >= r.lvl AND r.key = array_to_string(
            list_slice(string_split(hx.host, '.'),
              hx.nl - r.lvl + 1, hx.nl), '.')),
        a AS (SELECT doc_id, host, nl,
            max(e) AS exc_ps,
            max(d) AS best_d,
            max(CASE WHEN nl > lvl THEN w END) AS best_w
          FROM m GROUP BY 1, 2, 3),
        p AS (SELECT doc_id, host, nl,
            coalesce(exc_ps,
              CASE WHEN best_d IS NULL AND best_w IS NULL THEN 1
                ELSE greatest(coalesce(best_d, 0), coalesce(best_w, 0))
                END) AS ps,
            CASE WHEN exc_ps IS NOT NULL THEN 'exception'
              WHEN best_w IS NOT NULL
                AND (best_d IS NULL OR best_w > best_d) THEN 'wildcard'
              WHEN best_d IS NOT NULL THEN 'plain'
              ELSE 'default' END AS rule_kind
          FROM a)
        SELECT doc_id, host,
          array_to_string(list_slice(string_split(host, '.'),
            nl - ps + 1, nl), '.') AS public_suffix,
          CASE WHEN nl > ps THEN array_to_string(
            list_slice(string_split(host, '.'), nl - ps, nl), '.') END
            AS registered_domain,
          CAST(ps AS BIGINT) AS ps_labels, rule_kind
        FROM p ORDER BY doc_id""")),

    // ------------------------------------------------------------------
    // q304 — anchor-term profile per target domain (TextExtract.
    // anchorTermProfile): what the web CALLS each domain — per target
    // registered domain, the top-3 anchor-text terms by occurrence
    // (count desc, term asc), hrefs kept ALIGNED with their own anchor
    // text via whole-element extraction, resolved through the full
    // canonical-host chain, tokenized with the corpus 3-char minimum.
    // Two keyed exchanges; the rank filter rides WindowGroupLimit.
    // ------------------------------------------------------------------
    "q304_anchor_term_profile" -> GraftQuery(
      build = (s, d) => {
        val docs = documents(s, d)
          .withColumn("html", expr(htmlSynth("STRING")))
        graft.operators.TextExtract
          .anchorTermProfile(docs, "doc_id", "html", AnchorTopK)
          .orderBy("registered_domain", "rank")
      },
      oracle = Some(s"""
        WITH h AS (SELECT doc_id, ${htmlSynth("VARCHAR")} AS html
          FROM documents),
        el AS (SELECT unnest(regexp_extract_all(html,
            '(?is)<a[^>]*\\shref\\s*=\\s*("[^"]*"|''[^'']*''|[^"''\\s>]+)[^>]*>.*?</a>',
            0)) AS elem FROM h),
        pr AS (SELECT
          regexp_replace(regexp_extract(elem,
            '(?is)\\shref\\s*=\\s*("[^"]*"|''[^'']*''|[^"''\\s>]+)', 1),
            '^["'']|["'']$$', '', 'g') AS url,
          regexp_extract(elem, '(?is)<a[^>]*>(.*)</a>', 1) AS atext
          FROM el),
        hp AS (SELECT atext, regexp_extract(
            substr(split_part(url, '#', 1),
              length(split_part(split_part(url, '#', 1), '://', 1)) + 4),
            '^[^/?]*') AS hostport FROM pr),
        ho AS (SELECT atext,
          regexp_replace(lower(regexp_replace(hostport, ':[0-9]+$$', '')),
            '^www\\.', '') AS host FROM hp),
        rd AS (SELECT $rdCoalesce AS registered_domain, atext FROM ho),
        tm AS (SELECT registered_domain,
          unnest(list_filter(regexp_split_to_array(
            lower(${stripSql("atext")}), '[^a-z]+'),
            t -> length(t) >= 3)) AS term FROM rd),
        c AS (SELECT registered_domain, term,
          CAST(count(*) AS BIGINT) AS n FROM tm GROUP BY 1, 2),
        r AS (SELECT *, CAST(row_number() OVER (
            PARTITION BY registered_domain
            ORDER BY n DESC, term) AS BIGINT) AS rank FROM c)
        SELECT registered_domain, term, n, rank FROM r
        WHERE rank <= $AnchorTopK
        ORDER BY registered_domain, rank""")),

    // ------------------------------------------------------------------
    // q305 — robots.txt fetch gate (CrawlPolicy.parseRobots +
    // fetchGate): the decision a crawler makes before EVERY fetch —
    // segment-split parse (comments/blank lines stripped, empty rule
    // values dropped), REP group choice (a specific-agent group
    // ECLIPSES the star group entirely), longest-prefix wins with
    // Allow beating Disallow on ties, default allow. The five
    // synthesized policy arms exercise prefix shadowing (Allow /p/1
    // inside Disallow /p), group eclipse, comment handling,
    // someone-else's-group default-allow, and the empty-Disallow
    // restricts-nothing rule. Equi-join on domain (AQE-sized), one
    // max-struct aggregate per URL — no window over candidates.
    // ------------------------------------------------------------------
    "q305_robots_fetch_gate" -> GraftQuery(
      build = (s, d) => {
        val docs = documents(s, d)
          .withColumn("url", expr(urlSynth("STRING", "div")))
        val canon = UrlCuration.canonicalizeDocs(docs, "doc_id", "url")
        // r17 OPTIMIZATION (guide §1.2): the frontier feeds BOTH the
        // domain-distinct (robots side) and the gate join — without the
        // pin the canonicalization chain over the corpus evaluates once
        // per consumer. One materialization, both consumers read it.
        val frontier = canon.select(col("doc_id"),
          col("registered_domain"),
          split_part(regexp_replace(col("canonical_url"),
            "^[a-z]+://[^/]*", ""), lit("?"), lit(1)).as("path"))
          .localCheckpoint(true)
        val doms = frontier
          .select(col("registered_domain").as("domain")).distinct()
        val rules = CrawlPolicy.parseRobots(
          doms.withColumn("robots", expr(robotsSynth)),
          "domain", "robots")
        CrawlPolicy.fetchGate(frontier, "doc_id", "registered_domain",
          "path", rules, "graftbot")
          .orderBy("doc_id")
      },
      oracle = Some(s"""
        WITH $oracleCanonChain,
        $robotsGateChain
        SELECT doc_id, registered_domain, path, allowed,
          matched_prefix, matched_len, agent_group
        FROM g ORDER BY doc_id""")),

    // ------------------------------------------------------------------
    // q306 — per-domain crawl-policy accounting (CrawlPolicy.
    // policySummary): frontier outcomes per domain (urls, allowed,
    // blocked, blocked ppm) plus the chosen group's crawl delay
    // (specific beats star, NULL when neither sets one) — the
    // politeness budget as an auditable row (the q297/q299
    // accounting discipline).
    // ------------------------------------------------------------------
    "q306_robots_policy_summary" -> GraftQuery(
      build = (s, d) => {
        val docs = documents(s, d)
          .withColumn("url", expr(urlSynth("STRING", "div")))
        val canon = UrlCuration.canonicalizeDocs(docs, "doc_id", "url")
        // r17 OPTIMIZATION (guide §1.2), the q305 pin plus one more:
        // `rules` is consumed twice here (the gate's group choice AND
        // policySummary's crawl-delay side), and its own subtree
        // contains the frontier-derived domain distinct — materialize
        // both shared frames once.
        val frontier = canon.select(col("doc_id"),
          col("registered_domain"),
          split_part(regexp_replace(col("canonical_url"),
            "^[a-z]+://[^/]*", ""), lit("?"), lit(1)).as("path"))
          .localCheckpoint(true)
        val doms = frontier
          .select(col("registered_domain").as("domain")).distinct()
        val rules = CrawlPolicy.parseRobots(
          doms.withColumn("robots", expr(robotsSynth)),
          "domain", "robots")
          .localCheckpoint(true)
        val gated = CrawlPolicy.fetchGate(frontier, "doc_id",
          "registered_domain", "path", rules, "graftbot")
        CrawlPolicy.policySummary(gated, "registered_domain", rules,
          "graftbot")
          .orderBy("registered_domain")
      },
      oracle = Some(s"""
        WITH $oracleCanonChain,
        $robotsGateChain,
        dl AS (SELECT domain,
            max(CASE WHEN agent = 'graftbot'
              THEN CAST(prefix AS BIGINT) END) AS ds,
            max(CASE WHEN agent = '*'
              THEN CAST(prefix AS BIGINT) END) AS dw
          FROM rls WHERE kind = 'crawl-delay' GROUP BY 1),
        ag AS (SELECT registered_domain,
            CAST(count(*) AS BIGINT) AS n_urls,
            CAST(sum(CASE WHEN allowed THEN 1 ELSE 0 END) AS BIGINT)
              AS n_allowed,
            CAST(sum(CASE WHEN allowed THEN 0 ELSE 1 END) AS BIGINT)
              AS n_blocked
          FROM g GROUP BY 1)
        SELECT registered_domain, n_urls, n_allowed, n_blocked,
          (1000000 * n_blocked) // n_urls AS blocked_ppm,
          coalesce(ds, dw) AS crawl_delay_s
        FROM ag LEFT JOIN dl ON ag.registered_domain = dl.domain
        ORDER BY registered_domain"""))
  )
}
