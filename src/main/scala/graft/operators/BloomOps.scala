package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._


/**
 * Deterministic Bloom-filter pre-join pruning — the broadcast-filter
 * scale pattern made an explicit, LANDABLE operator. Spark's own AQE
 * runtime filters (InjectRuntimeFilter) do this transparently but
 * per-query and engine-internally; here the bitmap is a first-class
 * frame a warehouse can land once and reuse across jobs and days
 * (e.g. "customers active this quarter" pre-filtering every fact scan
 * of the day), and its contents are bit-deterministic cross-engine —
 * the md5-derived probe positions are the same integers in DuckDB, so
 * the FALSE-POSITIVE SET itself is part of the oracle-gated contract,
 * not an implementation accident.
 *
 * Geometry: `bits` bit positions (a power of two), `probes` hash
 * probes per key, each position the 60-bit md5 hash of
 * "<probe>_<key>" reduced mod `bits`, packed into bits/32 words by
 * bitwise-OR aggregation (32-bit words, not 64: setting bit 63 of a
 * BIGINT overflows DuckDB's checked left shift, and the oracle must
 * replay the identical bitmap — every word stays a small positive
 * long in both engines).
 *
 * 100 TB shape: the bitmap build is one map-side-combined aggregate
 * over the SMALL side (output: one row, bits/8 bytes — 8 KB at the
 * default 2^16 bits, broadcastable at any corpus size); the probe is
 * a per-row projection on the large side — zero shuffle of large
 * rows, versus the full shuffle a semi-join would pay. A passing row
 * is only PROBABLY a member: callers either tolerate the (measured,
 * deterministic) fp rate — dashboards, pre-aggregation pruning — or
 * run the exact join on the ~thousandth-sized survivor set.
 */
object BloomOps {

  /** Default geometry: 2^16 bits (2048 words, 8 KB) × 3 probes — fp
    * ≈ (n·3/65536)³ for n keys, ~2e-5 at n = 1000. */
  val DefaultBits = 65536
  val DefaultProbes = 3
  val WordBits = 32

  /** Probe position for `probe` of `key`: md5("<probe>_<key>") low 60
    * bits mod `bits` — positive (hash64 ≥ 0), identical in the oracle. */
  def probePos(key: Column, probe: Int, bits: Int): Column =
    TextDedup.hash64(concat_ws("_", lit(probe), key.cast("string"))) % bits

  /**
   * Build the bitmap: ONE row with `words` = array of bits/32 words
   * (dense — absent words are zero). Land this frame to reuse the
   * filter across jobs.
   */
  def buildBitmap(small: DataFrame, keyCol: String,
      bits: Int = DefaultBits, probes: Int = DefaultProbes): DataFrame = {
    require(bits % WordBits == 0 && bits > 0,
      s"bits must be a multiple of $WordBits: $bits")
    require(probes >= 1 && probes <= 8, s"probes in [1,8], got $probes")
    val words = bits / WordBits
    val pos = small.select(explode(array((0 until probes).map(j =>
      probePos(col(keyCol), j, bits)): _*)).as("pos"))
      .select(expr(s"pos div $WordBits").as("word_idx"),
        expr(s"shiftleft(1L, cast(pos % $WordBits as int))").as("bit"))
      .groupBy("word_idx").agg(expr("bit_or(bit)").as("bits"))
    // dense word spine so the bitmap is positionally indexable: a 1-row
    // literal-sequence frame left-joined by the sparse OR rows
    val spine = small.sparkSession.range(words.toLong)
      .select(col("id").as("word_idx"))
    spine.join(pos, Seq("word_idx"), "left")
      .select(col("word_idx"), coalesce(col("bits"), lit(0L)).as("bits"))
      .groupBy()
      .agg(transform(
        array_sort(collect_list(struct(col("word_idx"), col("bits")))),
        w => w.getField("bits")).as("words"))
  }

  /**
   * Tag every `large` row with `bloom_pass`: 1 iff all `probes` bits
   * are set. The bitmap rides a 1-row broadcast (the q71/q94 shape);
   * the test is `probes` shifts+ANDs per row inside codegen.
   */
  def bloomTag(large: DataFrame, keyCol: String, bitmap: DataFrame,
      bits: Int = DefaultBits, probes: Int = DefaultProbes): DataFrame = {
    val withPos = (0 until probes).foldLeft(
      large.crossJoin(broadcast(bitmap))) { (df, j) =>
      df.withColumn(s"__p$j", probePos(col(keyCol), j, bits))
    }
    val tests = (0 until probes).map { j =>
      expr(s"(shiftright(element_at(words, cast(__p$j div $WordBits as int) + 1), " +
        s"cast(__p$j % $WordBits as int)) & 1L) = 1L")
    }
    withPos
      .withColumn("bloom_pass", tests.reduce(_ && _).cast("int"))
      .drop("words" +: (0 until probes).map(j => s"__p$j"): _*)
  }
}
