package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * HTML/markup → text extraction — the step a web-corpus pipeline runs
 * BEFORE every operator that reads `text` (CCNet/RefinedWeb extract
 * from crawled HTML; trafilatura-class heavy extraction is a library
 * concern, but the deterministic core — drop non-content blocks, strip
 * tags, decode entities, measure markup/link density — is engine work
 * and belongs beside [[UrlCuration]] in the curation family).
 *
 * Extraction contract (each rule replayed verbatim by the DuckDB
 * oracle, CurationQueries q300/q301):
 *  1. comments (`<!-- … -->`), `<script>` and `<style>` blocks vanish
 *     INCLUDING their content (dotall non-greedy, case-insensitive);
 *  2. every remaining tag `<…>` is replaced by a space (block
 *     boundaries must separate words, never glue them);
 *  3. the five core entities decode (`&lt; &gt; &quot; &#39; &nbsp;`),
 *     `&amp;` LAST — decoding it first would double-decode
 *     `&amp;lt;`;
 *  4. whitespace collapses to single spaces, ends trimmed.
 *
 * All four stages are regexp_replace / replace chains — per-row,
 * map-side, codegen'd, shuffle-free: the 100-TB shape is one
 * projection over the raw-HTML scan, exactly like the URL
 * canonicalizer. ASCII-scope entities (named Unicode entities and
 * numeric references beyond &#39; are out of scope, stated).
 */
object TextExtract {

  /** Rule-1 block patterns: content-bearing non-content blocks. */
  private val BlockPatterns = Seq(
    "(?s)<!--.*?-->",
    "(?is)<script[^>]*>.*?</script>",
    "(?is)<style[^>]*>.*?</style>")

  /** Rule-3 entity table in decode order (`&amp;` strictly last). */
  val Entities: Seq[(String, String)] = Seq(
    "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
    "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")

  /** Rules 1–4 as one Column pipeline. */
  def stripMarkup(html: Column): Column = {
    val noBlocks = BlockPatterns.foldLeft(html)(
      (c, p) => regexp_replace(c, p, " "))
    val noTags = regexp_replace(noBlocks, "<[^>]+>", " ")
    val decoded = Entities.foldLeft(noTags) {
      case (c, (e, ch)) => replace(c, lit(e), lit(ch))
    }
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** Anchor inner-HTML occurrences, document order. */
  def anchorTexts(html: Column): Column =
    regexp_extract_all(html, lit("(?is)<a[^>]*>(.*?)</a>"), lit(1))

  /** href attribute values of anchors, document order — the outlink
    * feed for [[UrlCuration]]. All three HTML attribute spellings
    * match (double-quoted, single-quoted, unquoted — single/unquoted
    * are common in real crawl HTML and silently dropped from the
    * outlink graph before r17, r16 verdict gap 2c): one alternation
    * captures the value with its quotes, a bounded per-element
    * transform strips them. Unquoted values run to the first
    * whitespace or `>` per the HTML spec. */
  def hrefs(html: Column): Column =
    transform(
      regexp_extract_all(html,
        lit("(?is)<a[^>]*\\shref\\s*=\\s*(\"[^\"]*\"|'[^']*'|[^\"'\\s>]+)"),
        lit(1)),
      v => regexp_replace(v, "^[\"']|[\"']$", ""))

  /**
   * Per-document extraction metrics: raw/extracted sizes, markup
   * ratio, link count, link-text share — the quality gates a crawl
   * pipeline filters on (boilerplate-heavy and link-farm pages score
   * high here), plus the md5 of the extracted text so the oracle
   * verifies the EXACT extraction, not just its lengths. One narrow
   * map-side projection; ratios are integer ppm floors (Spark `div` ≡
   * DuckDB `//` on non-negative operands).
   *
   * `link_density_ppm` is NULL (not 0) when `n_text_chars = 0`: a page
   * with no extracted text is UNMEASURABLE, not link-free — a crawl
   * filter branching on this column must treat NULL as "gate on
   * markup_ratio/n_links instead", never as a passing low density
   * (r16 verdict advisory #2).
   */
  def markupStats(docs: DataFrame, idCol: String,
      htmlCol: String): DataFrame = {
    val text = stripMarkup(col(htmlCol))
    val linkText = stripMarkup(
      array_join(anchorTexts(col(htmlCol)), " "))
    docs.select(col(idCol),
      length(col(htmlCol)).cast("long").as("n_raw_chars"),
      length(text).cast("long").as("n_text_chars"),
      md5(text).as("text_md5"),
      size(anchorTexts(col(htmlCol))).cast("long").as("n_links"),
      length(linkText).cast("long").as("link_text_chars"))
      .withColumn("markup_ratio_ppm",
        expr("(1000000 * (n_raw_chars - n_text_chars)) div n_raw_chars"))
      .withColumn("link_density_ppm",
        when(col("n_text_chars") > 0,
          expr("(1000000 * link_text_chars) div n_text_chars")))
  }

  /** Whole `<a href=…>…</a>` elements, document order — keeps each
    * href ALIGNED with its own anchor text (separate [[hrefs]] /
    * [[anchorTexts]] extractions lose the pairing when some anchors
    * lack an href). Same three attribute-quoting spellings as
    * [[hrefs]]; a quoted href value containing a literal `>` is out
    * of scope (stated — it would end the element early). */
  def anchorElements(html: Column): Column =
    regexp_extract_all(html,
      lit("(?is)<a[^>]*\\shref\\s*=\\s*(\"[^\"]*\"|'[^']*'|[^\"'\\s>]+)" +
        "[^>]*>.*?</a>"), lit(0))

  /**
   * Anchor-term profile per TARGET registered domain — the classic
   * web-graph retrieval/quality signal: what the rest of the web
   * CALLS a domain (anchor text is the strongest off-page evidence in
   * BM25F-class rankers, and a skewed profile flags link farms). Per
   * target domain, the top-`k` anchor terms by occurrence count
   * (count desc, term asc — deterministic): each linking element's
   * href resolves through the full [[UrlCuration]] canonical-host +
   * registered-domain chain, its OWN anchor text (alignment via
   * [[anchorElements]]) is entity-decoded/tag-stripped and tokenized
   * lowercase with the corpus tokenizer's 3-char minimum.
   *
   * Scale shape: one Generate over the scan, per-row href/text
   * extraction and canonicalization (map-side), then TWO keyed
   * exchanges — the (domain, term) count aggregate (map-side combined)
   * and the per-domain top-k window whose `rank <= k` filter rides
   * WindowGroupLimit, so a mega-domain's ranked term tail never
   * materializes (the q297 discipline). Anchor bodies never shuffle —
   * only (domain, term) pairs do.
   */
  def anchorTermProfile(docs: DataFrame, idCol: String,
      htmlCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val pairs = docs
      .select(explode(anchorElements(col(htmlCol))).as("elem"))
      .select(
        regexp_replace(regexp_extract(col("elem"),
            "(?is)\\shref\\s*=\\s*(\"[^\"]*\"|'[^']*'|[^\"'\\s>]+)", 1),
          "^[\"']|[\"']$", "").as("url"),
        regexp_extract(col("elem"), "(?is)<a[^>]*>(.*)</a>", 1)
          .as("inner"))
    val (_, host) = UrlCuration.canonicalParts(col("url"))
    val terms = pairs.select(
      UrlCuration.registeredDomain(host).as("registered_domain"),
      explode(filter(
        split(lower(stripMarkup(col("inner"))), "[^a-z]+"),
        t => length(t) >= 3)).as("term"))
    terms
      .groupBy(col("registered_domain"), col("term"))
      .agg(count(lit(1)).as("n"))
      // filter on the raw row_number so the rank <= k rewrite to
      // WindowGroupLimit stays visible to the optimizer; widen to
      // long only afterwards (oracle type parity)
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("registered_domain"))
          .orderBy(col("n").desc, col("term"))))
      .filter(col("rank") <= k)
      .withColumn("rank", col("rank").cast("long"))
  }

  /**
   * Domain-level outlink graph: explode each document's hrefs,
   * canonicalize ([[UrlCuration]] rules), group by the target's
   * registered domain — the standard web-graph aggregation behind
   * link-spam scoring and per-domain crawl budgeting. Scale shape:
   * one Generate over the scan, the canonicalization chain per link
   * (map-side), ONE shuffle on the registered domain for the
   * count/distinct aggregate — link rows never carry document bodies.
   */
  def outlinkDomains(docs: DataFrame, idCol: String,
      htmlCol: String): DataFrame = {
    val (_, host) = UrlCuration.canonicalParts(col("url"))
    docs
      .select(col(idCol).as("src_doc"),
        explode(hrefs(col(htmlCol))).as("url"))
      .select(col("src_doc"),
        UrlCuration.registeredDomain(host).as("registered_domain"))
      .groupBy(col("registered_domain"))
      .agg(count(lit(1)).as("n_links"),
        countDistinct(col("src_doc")).as("n_src_docs"))
  }
}
