package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge

import graft.functions.Log2Q20

/**
 * Unigram-LM (SentencePiece-style, Kudo 2018) tokenizer training and
 * encoding — the second tokenizer family beside BPE ([[BpeTrainer]]):
 * where BPE GROWS a vocabulary by merging, the unigram model starts
 * from an over-complete substring candidate set and PRUNES it with EM,
 * segmenting text by maximum likelihood instead of greedy merge
 * replay. Production LLM pipelines train both families; this trainer
 * follows the same landed-artifact discipline (train once per corpus,
 * every encode consumer reads the stored model).
 *
 * The classic algorithm runs soft EM over float log-probabilities —
 * non-reproducible across engines in the last ulp. This trainer is the
 * VITERBI-EM (hard EM) variant on a fully integer lattice, so both
 * engines produce the bit-identical model:
 *
 *  - piece scores are Q20 fixed-point −log2 relative frequencies
 *    computed on the [[graft.functions.FixedLog]] 31-bit shift-square
 *    lattice (the q180 determinism workhorse; the oracle replays it
 *    with a 20-step linear recursive CTE): cost(p) = log2q20(T) −
 *    log2q20(w(p)), positive, exact;
 *  - the E-step segments each training word by MINIMUM total cost
 *    (Viterbi, [[viterbi]]), tie-broken deterministically by
 *    (cost, piece count, segmentation string) — hard counts replace
 *    forward–backward expectations;
 *  - the M-step re-scores kept pieces from usage+1 (add-one smoothing
 *    keeps every kept piece scorable: log2q20 needs m ≥ 1).
 *
 * Training chain (one EM round + final re-segmentation, the q86
 * 3-round-BPE sizing discipline — enough rounds to exercise every
 * moving part while the generated oracle stays reviewable):
 *   1. seed: all single characters of the CORPUS word stream (coverage
 *      guarantee — every corpus word stays segmentable) weighted by
 *      corpus occurrence, plus the top `nSeed` substrings of length
 *      2..[[PieceMaxLen]] of the top-`vocabSize` word table weighted
 *      by word-count × occurrence;
 *   2. E-step under seed scores over the word vocabulary → usage;
 *   3. prune: keep ALL single chars plus the top `nKeep` multi-char
 *      pieces by (usage desc, piece asc); re-score from usage+1;
 *   4. final E-step under pruned scores → usage_final (the model
 *      artifact records both usage columns plus the final costs).
 *
 * Scale shape: the corpus is scanned exactly twice (char weights, word
 * counts — both map-side-combined aggregates); everything downstream
 * runs on the capped vocab / piece frames. [[encodeStats]] runs
 * Viterbi on the DISTINCT-word frame (vocabulary-scale by Heaps' law,
 * not corpus-scale) and joins the per-word result back to the
 * occurrence stream — the corpus is never re-scanned per DP level.
 * The DP itself is pure projection work: the capped piece table
 * collects to per-length literal maps and every level is an
 * `element_at` + `least(struct…)` expression — zero joins, zero
 * shuffles (the oracle mirrors the levels as MATERIALIZED CTEs; its
 * join-based spelling and this expression spelling share the same
 * (cost, np, seg) arg-min order).
 */
object UnigramLM {

  /** Longest candidate piece; bounds the DP fan-in to 4 predecessors
    * per position in both engines. */
  val PieceMaxLen = 4

  /** Longest word the DP unrolls to — the bpeWords stream geometry
    * (lowercase alpha runs, length 3–12). Words longer than this never
    * reach the trainer/encoder. */
  val WordMaxLen = 12

  private def lg(c: Column): Column =
    Bridge.column(Log2Q20(Bridge.expression(c)))

  /**
   * Minimum-cost segmentation of each word under an integer piece-cost
   * table — bottom-up DP over positions 1..`maxLen`, level i =
   * best(i−k) + cost(word[i−k+1 .. i]) over k = 1..[[PieceMaxLen]],
   * arg-min by (cost, n_pieces, seg) — a deterministic total order
   * both engines share (the oracle's row_number ORDER BY cost, np,
   * seg). Words containing a character absent from `pieces` produce
   * NO output row (cannot happen for the training chain: the seed
   * includes every corpus character).
   *
   * Physical shape: the piece table is a CAPPED MODEL ARTIFACT
   * (≤ nSeed + alphabet rows), so it collects to per-length literal
   * maps (the BpeTrainer bounded-collect discipline) and the whole DP
   * runs as PROJECTIONS — `element_at` on a map literal per (level,
   * piece-length), `least(struct(cost, np, seg))` as the arg-min —
   * zero joins, zero shuffles, zero broadcasts; the word frame is
   * touched map-side only. A level references the four previous state
   * columns, so project collapse would inline the chain ~12×/level
   * (the FixedLog blow-up class); a `localCheckpoint(true)` every
   * [[CheckpointEvery]] levels pins the states and keeps the
   * expression tree bounded.
   *
   * Output: (word, cost_q20, n_pieces, seg) with seg = "|p1|p2|…".
   */
  val CheckpointEvery = 2

  def viterbi(words: DataFrame, pieces: DataFrame,
      maxLen: Int = WordMaxLen): DataFrame = {
    // bounded collect: the piece table is a capped model artifact
    val byLen: Map[Int, Map[String, Long]] = pieces
      .select(col("piece"), col("pcost")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1.length)
      .map { case (k, v) => k -> v.toMap }
    val stType = "struct<cost_q20:bigint,n_pieces:bigint,seg:string>"
    val nullSt = lit(null).cast(stType)
    var df = words.select(col("word"),
      struct(lit(0L).as("cost_q20"), lit(0L).as("n_pieces"),
        lit("").as("seg")).as("s0"))
    for (i <- 1 to maxLen) {
      val cands: Seq[Column] =
        (1 to math.min(PieceMaxLen, i)).flatMap { k =>
          byLen.get(k).map { m =>
            // end-truncated substrings are shorter than k, so they can
            // never falsely hit the length-k map
            val sub = substring(col("word"), i - k + 1, k)
            val c = element_at(typedlit(m), sub)
            val prev = col(s"s${i - k}")
            when(prev.isNotNull && c.isNotNull,
              struct(
                (prev.getField("cost_q20") + c).as("cost_q20"),
                (prev.getField("n_pieces") + 1L).as("n_pieces"),
                concat(prev.getField("seg"), lit("|"), sub).as("seg")))
          }
        }
      val si = cands.size match {
        case 0 => nullSt
        case 1 => cands.head // bare when(): null on no-match, like least
        case _ => least(cands: _*)
      }
      df = df.withColumn(s"s$i", si)
      if (i % CheckpointEvery == 0 || i == maxLen)
        df = df.localCheckpoint(true)
    }
    val fin = (1 to maxLen).foldLeft(nullSt) { (acc, i) =>
      when(length(col("word")) === i, col(s"s$i")).otherwise(acc)
    }
    df.select(col("word"), fin.as("f"))
      .filter(col("f").isNotNull)
      .select(col("word"), col("f.cost_q20").as("cost_q20"),
        col("f.n_pieces").as("n_pieces"), col("f.seg").as("seg"))
  }

  /** Q20 −log2 relative-frequency costs for a piece table: cost(p) =
    * log2q20(Σw) − log2q20(w(p)). The total is a 1-row broadcast cross
    * join (the bounded-crossJoin discipline). */
  private def withCosts(m: DataFrame, wCol: Column): DataFrame = {
    val t = m.agg(sum(wCol).as("t"))
    m.crossJoin(broadcast(t))
      .select(col("piece"), (lg(col("t")) - lg(wCol)).as("pcost"))
  }

  /** Hard-EM usage counts: per piece, Σ word-count over the words
    * whose Viterbi segmentation uses it (multiset — a piece used twice
    * in one word counts its word twice). */
  private def usageCounts(seg: DataFrame, vocab: DataFrame): DataFrame =
    seg.join(vocab, Seq("word"))
      .select(col("cnt"), explode(split(col("seg"), "\\|")).as("piece"))
      .filter(length(col("piece")) >= 1)
      .groupBy(col("piece")).agg(sum(col("cnt")).as("u_cnt"))

  /**
   * Train the unigram model over a word-occurrence stream (one row per
   * token occurrence, column `wordCol`). Returns the model artifact:
   * (piece, plen, seed_w, usage_em, usage_final, cost_q20) — seed_w
   * the seed weight (corpus char count / weighted substring count),
   * usage_em the first-E-step hard counts the prune read, usage_final
   * the counts under the shipped scores, cost_q20 the Q20 −log2
   * probability the encoder pays per use of the piece.
   */
  def train(spark: SparkSession, wordStream: DataFrame, wordCol: String,
      vocabSize: Int, nSeed: Int, nKeep: Int): DataFrame = {
    val ws = wordStream.select(col(wordCol).as("w"))
    // corpus scan 1: character coverage weights
    val chars = ws.select(explode(split(col("w"), "")).as("piece"))
      .filter(length(col("piece")) === 1)
      .groupBy(col("piece")).agg(count(lit(1)).as("seed_w"))
    // corpus scan 2: the capped training word table (count desc, word
    // asc — the q86 vocabulary discipline), pinned for its 3 readers
    val vocab = ws.groupBy(col("w").as("word"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("word")).limit(vocabSize)
      .localCheckpoint(true)
    // over-complete multi-char candidates: every substring of length
    // 2..PieceMaxLen of every vocab word, weighted cnt × occurrences
    // (the nested-lambda keeps k in scope so end-truncated substrings
    // are length-filtered EXACTLY, never double-counted)
    val multi = vocab.select(col("cnt"), explode(expr(
        s"""flatten(transform(sequence(2, $PieceMaxLen),
              k -> filter(transform(sequence(1, length(word)),
                     i -> substring(word, i, k)),
                   p -> length(p) = k)))""")).as("piece"))
      .groupBy(col("piece")).agg(sum(col("cnt")).as("seed_w"))
      .orderBy(col("seed_w").desc, col("piece")).limit(nSeed)
    val model0 = chars.unionByName(multi).localCheckpoint(true)
    // E-step 1 under seed scores
    val use1 = usageCounts(
      viterbi(vocab.select("word"), withCosts(model0, col("seed_w"))),
      vocab)
    // prune: all chars (coverage) + top-nKeep multi-char by usage
    val keptChars = model0.filter(length(col("piece")) === 1)
      .select("piece")
      .join(use1, Seq("piece"), "left")
      .select(col("piece"), coalesce(col("u_cnt"), lit(0L)).as("u_cnt"))
    val keptMulti = use1.filter(length(col("piece")) >= 2)
      .orderBy(col("u_cnt").desc, col("piece")).limit(nKeep)
    val kept = keptChars.unionByName(keptMulti).localCheckpoint(true)
    // M-step: re-score from usage+1 (add-one smoothing)
    val cost1 = withCosts(kept.withColumn("b", col("u_cnt") + 1L),
      col("b")).localCheckpoint(true)
    // final E-step under the shipped scores
    val use2 = usageCounts(viterbi(vocab.select("word"), cost1), vocab)
    kept
      .join(model0, Seq("piece"))
      .join(cost1, Seq("piece"))
      .join(use2.withColumnRenamed("u_cnt", "u2"), Seq("piece"), "left")
      .select(col("piece"), length(col("piece")).cast("long").as("plen"),
        col("seed_w"), col("u_cnt").as("usage_em"),
        coalesce(col("u2"), lit(0L)).as("usage_final"),
        col("pcost").as("cost_q20"))
  }

  /** Land the trained model as the parquet artifact every encode
    * consumer reads — the [[BpeTrainer.landRules]] discipline. */
  def landModel(spark: SparkSession, wordStream: DataFrame,
      wordCol: String, vocabSize: Int, nSeed: Int, nKeep: Int,
      dir: String): Unit =
    train(spark, wordStream, wordCol, vocabSize, nSeed, nKeep)
      .write.mode("overwrite").parquet(dir)

  def readModel(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir)

  /**
   * Encode a (doc, word) occurrence stream with a trained model and
   * aggregate per document: word count, character-token baseline,
   * unigram token count and total Q20 encoding cost (the corpus
   * log-perplexity numerator under the piece LM). Viterbi runs ONCE
   * per distinct word; the occurrence stream joins the segmented
   * frame by word (AQE broadcasts it when small; at vocabulary scale
   * it shuffles on the word key — never on documents). Words with
   * out-of-model characters drop from the stats (cannot happen when
   * the model trained on the same corpus stream — the char seed
   * covers it).
   */
  def encodeStats(docWords: DataFrame, docCol: String, wordCol: String,
      model: DataFrame): DataFrame = {
    val seg = viterbi(
      docWords.select(col(wordCol).as("word")).distinct()
        .localCheckpoint(true),
      model.select(col("piece"), col("cost_q20").as("pcost")))
    docWords.select(col(docCol).as("doc_id"), col(wordCol).as("word"))
      .join(seg, Seq("word"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"),
        sum(length(col("word"))).as("n_char_tokens"),
        sum(col("n_pieces")).as("n_uni_tokens"),
        sum(col("cost_q20")).as("cost_q20_total"))
  }
}
