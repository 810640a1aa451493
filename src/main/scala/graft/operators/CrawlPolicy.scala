package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Crawl politeness — robots.txt parsing and the fetch gate a crawler
 * evaluates before EVERY fetch (the step upstream of [[UrlCuration]]
 * in a web pipeline; REP semantics per the public robots.txt RFC 9309
 * / Google documentation):
 *
 *  - a rule binds to the `User-agent:` group it appears under (the
 *    segment-split contract: consecutive multi-agent group headers
 *    are out of scope, stated — each rule belongs to the most recent
 *    single agent line);
 *  - group CHOICE per domain: if any rule group names the crawler's
 *    agent exactly, ONLY those rules apply; else the `*` group; else
 *    everything is allowed;
 *  - within the chosen group the MOST SPECIFIC (longest) matching
 *    path prefix wins, and on equal length `Allow` beats `Disallow`;
 *  - no matching rule → allowed (the REP default);
 *  - an empty rule value (`Disallow:` with nothing) restricts
 *    nothing and is dropped at parse time;
 *  - `#` comments and blank lines are stripped; directive names are
 *    case-insensitive; `*`/`$` pattern rules are out of scope
 *    (plain-prefix rules only, stated).
 *
 * Scale shape: parsing is Generate (segments, then lines) + per-row
 * regex extracts — map-side, linear in robots bytes. The gate is an
 * EQUI-join on the registered domain between the frontier and the
 * chosen rule group (unhinted — AQE broadcasts the rule table when it
 * fits; a billion-domain rules table shuffles instead of killing the
 * driver), candidates bounded by rules-per-domain, then ONE
 * max-struct aggregate per frontier row — (len, allow, prefix)
 * ordering makes longest-prefix-then-allow-wins a single `max`, no
 * window, no second pass over candidates.
 */
object CrawlPolicy {

  /**
   * Parse robots.txt bodies into rule rows (domain, agent, kind,
   * prefix) — kind ∈ {allow, disallow} — plus crawl-delay rows
   * (kind = crawl-delay, prefix = the seconds value as text).
   * Segment-split on the `User-agent:` token keeps group binding a
   * per-row computation (no ordered window over line numbers).
   */
  def parseRobots(docs: DataFrame, domainCol: String,
      robotsCol: String): DataFrame = {
    val segs = docs
      .select(col(domainCol).as("domain"),
        posexplode(split(col(robotsCol), "User-agent:")))
      .filter(col("pos") >= 1)
      .select(col("domain"),
        trim(split_part(col("col"), lit("\n"), lit(1))).as("agent"),
        split(col("col"), "\n").as("lines"))
    segs
      .select(col("domain"), col("agent"),
        explode(expr("slice(lines, 2, greatest(size(lines) - 1, 0))"))
          .as("line0"))
      // strip comments, then parse `Directive: value`
      .withColumn("line", trim(regexp_replace(col("line0"), "#.*$", "")))
      .select(col("domain"), col("agent"),
        lower(trim(regexp_extract(col("line"),
          "^([A-Za-z-]+)\\s*:", 1))).as("kind"),
        trim(regexp_extract(col("line"),
          "^[A-Za-z-]+\\s*:\\s*(.*)$", 1)).as("prefix"))
      .filter(col("kind").isin("allow", "disallow", "crawl-delay") &&
        col("prefix") =!= "")
  }

  /**
   * Fetch gate over a frontier (idCol, domainCol, pathCol) against
   * [[parseRobots]] rules: per URL — allowed?, the matched prefix and
   * its length, and which group decided (`specific`/`star`/`none`).
   */
  def fetchGate(frontier: DataFrame, idCol: String, domainCol: String,
      pathCol: String, rules: DataFrame, botAgent: String): DataFrame = {
    val paths = rules.filter(col("kind").isin("allow", "disallow"))
    val specific = paths.filter(col("agent") === botAgent)
    val star = paths.filter(col("agent") === "*")
    val hasSpecific = specific.select(col("domain")).distinct()
      .withColumn("has_specific", lit(true))
    // group choice: specific rules, else the star group for domains
    // with no specific group (left-anti keeps the star side pruned
    // BEFORE the frontier join — never both groups as candidates)
    val chosen = specific.withColumn("grp", lit("specific"))
      .unionByName(
        star.join(hasSpecific.select("domain"), Seq("domain"),
          "left_anti").withColumn("grp", lit("star")))
    // r17 OPTIMIZATION (guide §2.4 — remove shuffles outright): ONE
    // pass over the frontier. The previous shape built an id-keyed
    // candidate aggregate from an INNER join and then re-joined the
    // frontier to restore unmatched rows — evaluating the frontier
    // subtree (its whole upstream canonicalization chain) twice and
    // paying an extra id-keyed Exchange. A LEFT join + one max-struct
    // aggregate keyed on the frontier row is the same decision: a row
    // with no matching rule survives as a single all-null candidate
    // whose max-struct has null fields (the `when` chain below leaves
    // `allow` null for it, never 0), so the default-allow coalesce
    // reads exactly what the re-join's null struct used to produce.
    // (len, allow-beats-disallow, prefix, grp): longest prefix wins,
    // Allow wins ties, prefix/grp ride along deterministically.
    frontier
      .join(chosen,
        frontier(domainCol) === chosen("domain") &&
          col(pathCol).startsWith(col("prefix")),
        "left")
      .groupBy(col(idCol), col(domainCol), col(pathCol))
      .agg(max(struct(
        length(col("prefix")).as("len"),
        when(col("kind") === "allow", 1)
          .when(col("kind").isNotNull, 0).as("allow"),
        col("prefix").as("prefix"),
        col("grp").as("grp"))).as("best"))
      .select(col(idCol), col(domainCol), col(pathCol),
        coalesce(col("best.allow") === 1, lit(true)).as("allowed"),
        col("best.prefix").as("matched_prefix"),
        coalesce(col("best.len").cast("long"), lit(0L))
          .as("matched_len"),
        coalesce(col("best.grp"), lit("none")).as("agent_group"))
  }

  /**
   * Per-domain policy accounting: frontier outcome counts + blocked
   * ppm + the chosen group's crawl delay (specific beats star, NULL
   * when neither group sets one) — the politeness budget per domain,
   * accounting-style (the q297/q299 discipline).
   */
  def policySummary(gated: DataFrame, domainCol: String,
      rules: DataFrame, botAgent: String): DataFrame = {
    val delays = rules.filter(col("kind") === "crawl-delay")
      .groupBy(col("domain"))
      .agg(
        max(when(col("agent") === botAgent,
          col("prefix").cast("long"))).as("delay_specific"),
        max(when(col("agent") === "*",
          col("prefix").cast("long"))).as("delay_star"))
      .withColumnRenamed("domain", "_rd_dom")
    gated.groupBy(col(domainCol))
      .agg(count(lit(1)).as("n_urls"),
        sum(when(col("allowed"), 1L).otherwise(0L)).as("n_allowed"),
        sum(when(col("allowed"), 0L).otherwise(1L)).as("n_blocked"))
      .withColumn("blocked_ppm",
        expr("(1000000 * n_blocked) div n_urls"))
      .join(delays, col(domainCol) === col("_rd_dom"), "left")
      .select(col(domainCol), col("n_urls"), col("n_allowed"),
        col("n_blocked"), col("blocked_ppm"),
        coalesce(col("delay_specific"), col("delay_star"))
          .as("crawl_delay_s"))
  }
}
