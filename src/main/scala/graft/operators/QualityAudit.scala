package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Declarative data-quality constraint checks — the contract gate a
 * warehouse runs before promoting a landed batch (and a training
 * pipeline runs before trusting a corpus drop): completeness,
 * key uniqueness, functional dependencies, referential integrity, and
 * domain ranges, each reported as one uniform row
 * (check_name, target, n_rows, n_violations, pass).
 *
 * Every check is an aggregate — the report is |checks| rows no matter
 * the table size, and violating ROWS never leave the executors (a
 * violation *sample* would be a separate, limit-bounded query; the gate
 * decision needs only counts). Scale shapes per check:
 *  - completeness / inRange: one map-side-combined scan aggregate, no
 *    keyed shuffle at all (checks on the same table can share one scan
 *    if composed manually; kept separate here for orthogonality —
 *    distinct-based checks below cannot join them in one pass anyway,
 *    the q80 multi-distinct Expand lesson);
 *  - uniqueness / functionalDependency: two-phase over the key
 *    ((key) then 1-row), both map-side combined — never a count
 *    distinct in a single global aggregate;
 *  - referentialOrphans: LEFT join against the parent's deduped keys
 *    so total and orphan counts come from ONE pass (an anti-join would
 *    need a second job for the total); null FKs are NOT orphans (SQL
 *    semantics — a null reference is a completeness problem, reported
 *    by that check, not a dangling one).
 *
 * Null-key conventions (documented because both engines must agree):
 * uniqueness counts null-bearing keys as key values (struct equality);
 * inRange counts nulls as violations (a null is not inside any range);
 * functionalDependency counts a null dependent as a distinct value.
 * An EMPTY input reports (n_rows 0, n_violations 0, pass 1) from every
 * check — the sums coalesce to zero so a gate consumer never reads a
 * null count (an empty staged batch is vacuously clean; whether "no
 * data" should itself fail the gate is a freshness check's job).
 */
object QualityAudit {

  val Schema = Seq("check_name", "target", "n_rows", "n_violations", "pass")

  private def row(check: String, target: String, nRows: Column,
      nViol: Column): Seq[Column] =
    Seq(lit(check).as("check_name"), lit(target).as("target"),
      nRows.cast("long").as("n_rows"), nViol.cast("long").as("n_violations"),
      (nViol === 0).cast("int").as("pass"))

  /** Nulls in `c`: n_violations = rows where the column is null. */
  def completeness(df: DataFrame, c: String, target: String): DataFrame =
    df.agg(count(lit(1)).as("n"), count(col(c)).as("nn"))
      .select(row("completeness", target, col("n"), col("n") - col("nn")): _*)

  /** Duplicate keys: n_violations = rows beyond the first per key. */
  def uniqueness(df: DataFrame, keys: Seq[String], target: String): DataFrame =
    df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("cnt"))
      .agg(coalesce(sum(col("cnt")), lit(0L)).as("n"),
        count(lit(1)).as("nk"))
      .select(row("uniqueness", target, col("n"), col("n") - col("nk")): _*)

  /** A → B: n_rows = distinct determinants; n_violations = determinants
    * mapping to more than one dependent value. */
  def functionalDependency(df: DataFrame, det: String, dep: String,
      target: String): DataFrame =
    df.groupBy(col(det), col(dep)).agg(count(lit(1)).as("cnt"))
      .groupBy(col(det)).agg(count(lit(1)).as("ndep"))
      .agg(count(lit(1)).as("n"),
        coalesce(sum(when(col("ndep") > 1, 1L).otherwise(0L)), lit(0L))
          .as("viol"))
      .select(row("functional_dependency", target, col("n"), col("viol")): _*)

  /** FK ⊆ PK: n_violations = child rows with a non-null FK absent from
    * the parent. One pass: LEFT join to the parent's deduped keys. */
  def referentialOrphans(child: DataFrame, fk: String, parent: DataFrame,
      pk: String, target: String): DataFrame =
    child.select(col(fk).as("__fk"))
      .join(parent.select(col(pk).as("__pk")).distinct(),
        col("__fk") === col("__pk"), "left")
      .agg(count(lit(1)).as("n"),
        coalesce(sum(when(col("__fk").isNotNull && col("__pk").isNull, 1L)
          .otherwise(0L)), lit(0L)).as("viol"))
      .select(row("referential", target, col("n"), col("viol")): _*)

  /** Domain range: n_violations = rows outside [lo, hi]; nulls violate
    * (a null is not inside any range). */
  def inRange(df: DataFrame, c: String, lo: Long, hi: Long,
      target: String): DataFrame =
    df.agg(count(lit(1)).as("n"),
      coalesce(sum(when(col(c).between(lo, hi), 1L).otherwise(0L)), lit(0L))
        .as("ok"))
      .select(row("in_range", target, col("n"), col("n") - col("ok")): _*)

  /** ⌊10⁶·log₁₀(1+1/d)⌋ for d = 1..9 — Benford's law in the engine's
    * exact ppm lattice. Compile-time constants (the only log₁₀ this
    * audit ever takes), so the expected distribution is identical in
    * the engine and any oracle by construction. */
  val BenfordPpm: Seq[Long] =
    Seq(301029L, 176091L, 124938L, 96910L, 79181L, 66946L, 57991L,
      51152L, 45757L)

  /**
   * Benford first-digit audit — the forensic screen on any organically-
   * grown amount column (invoices, order totals, expense claims):
   * naturally occurring multi-magnitude amounts put digit d first with
   * probability log₁₀(1+1/d) ≈ 30.1% for 1 down to 4.6% for 9, while
   * fabricated or clamped data drifts toward uniform. Per (group,
   * digit 1..9): observed count, observed ppm, expected Benford ppm and
   * the signed deviation — the analyst reads |dev_ppm| spikes, a
   * monitor alerts on max |dev_ppm| per group.
   *
   * All 9 digit rows ALWAYS emit per group (a digit that never appears
   * is the loudest signal — deviation −expected, not a missing row):
   * the observed counts left-join a generated group×9 spine (explode of
   * a 9-literal array on the distinct-group frame — never a data-sized
   * join). Only strictly positive values audit; zero/negative/null
   * amounts are a domain check's job ([[inRange]]), not a digit
   * distribution's. First digit via substring of the decimal rendering
   * of a BIGINT — exact in any engine; obs_ppm floors against the
   * group's positive-value total.
   *
   * Scale shape: ONE map-side-combined (group, digit) count — digit
   * cardinality 9 caps the aggregate at 9·|groups| rows — plus a
   * broadcast-sized spine join; nothing else touches the facts.
   */
  /**
   * Approximate functional-dependency DISCOVERY — the profiling step
   * that finds the near-keys and derivable columns a schema never
   * wrote down ([[functionalDependency]] CHECKS a given A→B; this
   * RANKS every ordered pair from a candidate list): violation rate
   * for A→B = (N − Σ_a max_b n_ab) / N — the fraction of rows that
   * would have to change for the dependency to hold exactly (the g3
   * error of the FD-mining literature), in floor ppm; 0 = the FD
   * holds exactly. Near-FDs (small nonzero ppm) are the dirty-data
   * finding — a column that is ALMOST derivable usually means a few
   * corrupt rows, not a design choice.
   *
   * Per pair: one (A, B) count aggregate, then a per-A max — both
   * map-side combined, |pairs| small plans unioned (the candidate
   * list is a handful of columns by construction; all-pairs FD mining
   * over wide schemas is a search problem upstream of this operator).
   * Null semantics follow [[functionalDependency]]: null A is a
   * determinant value, null B a distinct dependent.
   */
  def fdDiscovery(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, "need at least two candidate columns")
    val pairs = for {
      a <- cols; b <- cols if a != b
    } yield {
      df.groupBy(col(a).as("__a"), col(b).as("__b"))
        .agg(count(lit(1)).as("n_ab"))
        .groupBy(col("__a"))
        .agg(sum(col("n_ab")).as("n_a"), max(col("n_ab")).as("mx"))
        // coalesce + guarded div: an EMPTY staged batch must report
        // clean (violation_ppm 0, holds_exactly true) per the file
        // convention, not null counts from sum-over-zero-rows
        .agg(count(lit(1)).as("n_groups"),
          coalesce(sum(col("n_a")), lit(0L)).as("n"),
          coalesce(sum(col("mx")), lit(0L)).as("keep"))
        .select(lit(a).as("determinant"), lit(b).as("dependent"),
          col("n_groups"),
          when(col("n") > 0, expr("(1000000L * (n - keep)) div n"))
            .otherwise(lit(0L)).as("violation_ppm"))
    }
    pairs.reduce(_ unionByName _)
      .withColumn("holds_exactly", col("violation_ppm") === 0L)
  }

  def benfordAudit(df: DataFrame, group: String,
      valueCol: String): DataFrame = {
    val obs = df
      .filter(col(valueCol) > 0)
      .select(col(group).as("g"),
        substring(col(valueCol).cast("long").cast("string"), 1, 1)
          .cast("long").as("digit"))
      .groupBy(col("g"), col("digit")).agg(count(lit(1)).as("n_obs"))
    val exp = BenfordPpm.zipWithIndex.map { case (ppm, i) =>
      struct(lit(i + 1L).as("digit"), lit(ppm).as("exp_ppm"))
    }
    val spine = obs.select(col("g")).distinct()
      .select(col("g"), explode(array(exp: _*)).as("e"))
      .select(col("g"), col("e.digit").as("digit"),
        col("e.exp_ppm").as("exp_ppm"))
    spine
      .join(obs, Seq("g", "digit"), "left")
      .withColumn("n_obs", coalesce(col("n_obs"), lit(0L)))
      .withColumn("obs_ppm",
        expr("(1000000L * n_obs) div sum(n_obs) over (partition by g)"))
      .select(col("g"), col("digit"), col("n_obs"), col("obs_ppm"),
        col("exp_ppm"),
        (col("obs_ppm") - col("exp_ppm")).as("dev_ppm"))
  }

  /**
   * Corpus manifest — the per-source content fingerprint a dataset
   * release ships so a consumer can verify "same corpus, same bytes"
   * without re-reading it: per group, document count, total characters,
   * id range, and an ORDER-INDEPENDENT additive content digest —
   * Σ hash64(id ‖ ':' ‖ text) mod 2⁶¹. Additive (not a rolling hash of
   * a sorted stream) is the distributed-native choice: partials merge
   * commutatively and associatively, so the digest is one map-side-
   * combined aggregate at ANY scale and ANY partitioning — no global
   * sort, no collect — and two manifests diff by subtraction (a
   * changed doc moves the digest by its hash delta). The id joins the
   * hash input so id-swaps between identical texts still change the
   * digest. Collision posture: 61 bits against ACCIDENTAL drift (the
   * versioning use case), not an adversary — an auditable Merkle
   * build is the adversarial path and costs the sort this avoids.
   *
   * Exactness: per-doc hashes are 60-bit md5 integers (the q74/q128
   * lattice); the sum runs in decimal128 and reduces mod 2⁶¹ at the
   * end — both engines compute the identical long.
   */
  def corpusManifest(df: DataFrame, group: String, idCol: String,
      textCol: String): DataFrame = {
    val Mod = 1L << 61
    val h = TextDedup.hash64(
      concat(col(idCol).cast("string"), lit(":"), col(textCol)))
    df.groupBy(col(group))
      .agg(count(lit(1)).as("n_docs"),
        sum(length(col(textCol)).cast("long")).as("total_chars"),
        min(col(idCol)).as("min_id"), max(col(idCol)).as("max_id"),
        sum(h.cast("decimal(38,0)")).as("hsum"))
      .select(col(group), col("n_docs"), col("total_chars"),
        col("min_id"), col("max_id"),
        pmod(col("hsum"), lit(Mod).cast("decimal(38,0)"))
          .cast("long").as("digest"))
  }

  /**
   * Normalization manifest — [[corpusManifest]]'s before/after view of
   * a cleaning pass: per source, the additive digest of the RAW text,
   * the digest of the [[TextAnalysis.normalizeText]] canonical form,
   * and how many documents the normalization actually changed. The
   * readout a corpus-release pipeline wants before swapping raw for
   * normalized: digest_norm is the id of the cleaned release,
   * digest_raw proves provenance, n_changed sizes the diff — all still
   * ONE map-side-combined aggregate (normalization is per-row codegen,
   * the digests commute).
   */
  def normalizedManifest(df: DataFrame, group: String, idCol: String,
      textCol: String): DataFrame = {
    val Mod = 1L << 61
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val norm = TextAnalysis.normalizeText(col(textCol))
    val hRaw = TextDedup.hash64(
      concat(col(idCol).cast("string"), lit(":"), col(textCol)))
    val hNorm = TextDedup.hash64(
      concat(col(idCol).cast("string"), lit(":"), norm))
    df.groupBy(col(group))
      .agg(count(lit(1)).as("n_docs"),
        coalesce(sum(when(norm =!= col(textCol), 1L)), lit(0L))
          .as("n_changed"),
        sum(dec(hRaw)).as("hr"), sum(dec(hNorm)).as("hn"))
      .select(col(group), col("n_docs"), col("n_changed"),
        pmod(col("hr"), lit(Mod).cast("decimal(38,0)"))
          .cast("long").as("digest_raw"),
        pmod(col("hn"), lit(Mod).cast("decimal(38,0)"))
          .cast("long").as("digest_norm"))
  }

  /**
   * Train/test split-leakage audit — the eval-integrity gate every
   * benchmark number silently depends on: duplicated content that
   * lands on BOTH sides of a split inflates eval scores (Lee et al.
   * 2022 measured the effect; q47 decontaminates against a fixed
   * benchmark — this audits the corpus's own splits). Two strategies
   * run SIDE BY SIDE on the same corpus: 'by_id' (the naive
   * per-document hash split) and 'by_content' (the fix —
   * [[CorpusAssembly.groupSplit]] keyed on the exact-dup content hash,
   * so a duplicate group moves as a unit and leakage is ZERO by
   * construction, which the fixture demonstrates rather than
   * asserts). Per content-group the cross-split pair count is the
   * exact integer (n² − Σ n_split²) div 2.
   *
   * Scale shape: one (strategy, content-hash, split) count is the
   * only corpus-sized shuffle (the doc ids and text never travel past
   * the first projection); near-dup leakage composes upstream — run
   * the corpus through q114/q189 canonicalization first and feed the
   * canonical key as `textCol`.
   */
  def splitLeakage(df: DataFrame, idCol: String, textCol: String,
      splits: Seq[(String, Long)]): DataFrame = {
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val keyed = df.select(col(idCol).as("doc_id"),
      graft.operators.TextDedup.hash64(col(textCol)).as("ckey"))
    val byId = CorpusAssembly.groupSplit(keyed, "doc_id", splits)
      .withColumn("strategy", lit("by_id"))
    val byCk = CorpusAssembly.groupSplit(keyed, "ckey", splits)
      .withColumn("strategy", lit("by_content"))
    byId.unionByName(byCk)
      .groupBy(col("strategy"), col("ckey"), col("split"))
      .agg(count(lit(1)).as("ns"))
      .groupBy(col("strategy"), col("ckey"))
      .agg(sum(col("ns")).as("n"),
        sum(dec(col("ns")) * col("ns")).as("sq"))
      .groupBy(col("strategy"))
      .agg(sum(col("n")).cast("long").as("n_docs"),
        sum(when(col("n") >= 2, 1L).otherwise(0L)).as("n_dup_groups"),
        sum(when(dec(col("n")) * col("n") > col("sq"), 1L)
          .otherwise(0L)).as("n_leaking_groups"),
        expr("cast(sum((cast(n as decimal(38,0)) * n - sq) div 2) " +
          "as bigint)").as("leaked_pairs"))
  }

  /**
   * k-anonymity / l-diversity release audit — the privacy gate on any
   * data release or eval-set publication: a row is re-identifiable when
   * its quasi-identifier combination is shared by fewer than k rows,
   * and a QI group is attribute-disclosing when all its members share
   * the sensitive value (l-diversity 1: "everyone in this small cohort
   * has the same diagnosis"). Reported per `reportCol` (the first QI
   * dimension, typically): the achieved k (min group size — the number
   * the release can CLAIM), the risky group/row counts under the
   * requested k, the risky row share in ppm, and the minimum
   * l-diversity across groups. The summary row count is
   * |reportCol values| at any scale; larger releases at the same QI
   * legitimately read safer — the operator measures, the fixture's
   * constructed-frame spec proves the discriminating direction.
   *
   * Scale shape: ONE aggregate to the QI-group frame (count +
   * count-distinct over the sensitive column — two-phase, map-side
   * combined), then a |groups|-row rollup. Individual rows never
   * leave the executors (the q121 gate discipline).
   */
  def kAnonymity(df: DataFrame, qiCols: Seq[String], sensitiveCol: String,
      k: Long, reportCol: String): DataFrame = {
    require(qiCols.nonEmpty && qiCols.contains(reportCol))
    val groups = df
      .groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        countDistinct(col(sensitiveCol)).as("ldiv"))
    groups
      .groupBy(col(reportCol).as("report"))
      .agg(sum(col("n")).as("n_rows"), count(lit(1)).as("n_groups"),
        min(col("n")).as("k_achieved"),
        sum(when(col("n") < k, 1L).otherwise(0L)).as("risky_groups"),
        sum(when(col("n") < k, col("n")).otherwise(0L)).as("risky_rows"),
        min(col("ldiv")).as("min_l_div"))
      .select(col("report"), col("n_rows"), col("n_groups"),
        col("k_achieved"), col("risky_groups"), col("risky_rows"),
        expr("(1000000 * risky_rows) div n_rows").as("risky_ppm"),
        col("min_l_div"))
  }

  /**
   * Benford first-digit audit — the fabrication/truncation smell test
   * for any positive magnitude column (amounts, counts, file sizes):
   * per cell, the observed first-significant-digit distribution
   * against Benford's law, both on the exact ppm lattice. The digit is
   * the first character of the base-10 rendering (positives only —
   * callers filter or the row drops here), observed shares are
   * (10⁶·n_d) div n, expectations are the [[BenfordPpm]] constants,
   * and EVERY digit 1–9 appears per cell (a missing digit is a 0-count
   * row — absence is the strongest signal, never silently dropped).
   * dev_ppm = |obs − exp| per digit; callers threshold or sum.
   *
   * Scale shape: one (cell, digit) aggregate is the only corpus-sized
   * shuffle; the dense 9-digit spine is an explode over the cell
   * frame.
   */
  def benfordProfile(df: DataFrame, cellCol: String,
      valueCol: String): DataFrame = {
    val expMap = map(BenfordPpm.zipWithIndex.flatMap { case (p, i) =>
      Seq(lit(i + 1), lit(p)) }: _*)
    val digits = df
      .select(col(cellCol).as("cell"), col(valueCol).cast("long").as("v"))
      .filter(col("v").isNotNull && col("v") > 0)
      .select(col("cell"),
        substring(col("v").cast("string"), 1, 1).cast("int").as("digit"))
      .groupBy(col("cell"), col("digit"))
      .agg(count(lit(1)).as("n_d"))
    val totals = digits.groupBy(col("cell")).agg(sum(col("n_d")).as("n"))
    totals
      .select(col("cell"), col("n"),
        explode(sequence(lit(1), lit(9))).as("digit"))
      .join(digits, Seq("cell", "digit"), "left")
      .withColumn("n_d", coalesce(col("n_d"), lit(0L)))
      .withColumn("obs_ppm", expr("(1000000 * n_d) div n"))
      .withColumn("exp_ppm", expMap(col("digit")))
      .select(col("cell"), col("digit"), col("n"), col("n_d"),
        col("obs_ppm"), col("exp_ppm"),
        abs(col("obs_ppm") - col("exp_ppm")).as("dev_ppm"))
  }

  /**
   * t-closeness (Li, Li & Venkatasubramanian 2007) — the third leg of
   * the anonymity family after k-anonymity and l-diversity
   * ([[kAnonymity]]): a quasi-identifier class can be k-large and
   * l-diverse yet still LEAK if its sensitive-value DISTRIBUTION sits
   * far from the table's. For an ORDERED sensitive attribute binned
   * to 0..nBins−1, the Earth Mover's Distance with unit ground
   * distance is the mean absolute prefix gap — exact in counts on a
   * common denominator: emd_ppm = ⌊10⁶·Σ_k |cum_c(k)·N − cum_g(k)·n_c|
   * / ((m−1)·n_c·N)⌋, everything in decimal128. Classes above
   * `tPpm` flag `breach` — the release gate readout.
   *
   * Scale shape: one (class, bin) aggregate is the only corpus-sized
   * shuffle; the dense class×bin spine, both prefix windows, and the
   * final rollup all run on bounded class/bin frames. The global
   * total rides a 1-row broadcast (the q71/q94 shape).
   */
  def tCloseness(df: DataFrame, classCol: String, binCol: String,
      nBins: Int, tPpm: Long): DataFrame = {
    require(nBins >= 2, s"nBins must be >= 2, got $nBins")
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val cb = df
      .select(col(classCol).as("cls"), col(binCol).cast("long").as("b"))
      .filter(col("b").isNotNull && col("b") >= 0 && col("b") < nBins)
      .groupBy(col("cls"), col("b")).agg(count(lit(1)).as("c"))
    val glob = cb.groupBy(col("b")).agg(sum(col("c")).as("g"))
    val globDense = glob.select(explode(sequence(lit(0),
        lit(nBins - 1))).as("b")).distinct()
      .join(glob, Seq("b"), "left")
      .withColumn("g", coalesce(col("g"), lit(0L)))
      .withColumn("cum_g", sum(col("g")).over(
        Window.orderBy("b").rowsBetween(Window.unboundedPreceding,
          Window.currentRow)))
    val nTot = cb.agg(sum(col("c")).as("nn"))
    val wc = Window.partitionBy("cls").orderBy("b")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cb.groupBy(col("cls")).agg(sum(col("c")).as("nc"))
      .select(col("cls"), col("nc"),
        explode(sequence(lit(0), lit(nBins - 1))).as("b"))
      .join(cb, Seq("cls", "b"), "left")
      .withColumn("c", coalesce(col("c"), lit(0L)))
      .withColumn("cum_c", sum(col("c")).over(wc))
      .join(broadcast(globDense.select(col("b"), col("cum_g"))), Seq("b"))
      .crossJoin(broadcast(nTot))
      .groupBy(col("cls"))
      .agg(max(col("nc")).as("n"),
        sum(abs(dec(col("cum_c")) * col("nn") -
          dec(col("cum_g")) * col("nc"))).as("gap"),
        max(dec(col("nc")) * col("nn")).as("den"))
      .select(col("cls"), col("n"),
        expr(s"cast((1000000 * gap) div (${nBins - 1} * den) as bigint)")
          .as("emd_ppm"))
      .withColumn("breach", (col("emd_ppm") > tPpm).cast("int"))
  }
}
