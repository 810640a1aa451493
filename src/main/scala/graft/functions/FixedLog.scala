package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/**
 * Exact Q20 fixed-point log2 on a defined 31-bit shift-square lattice —
 * the determinism workhorse behind the A-ES weighted sampler (q180):
 * weighted-without-replacement sampling orders items by −log(u)/w, and
 * a float `ln` is libm-dependent (Spark and DuckDB may differ in the
 * last ulp, flipping ranks on near-ties), so the log itself is DEFINED
 * as this integer algorithm and both engines run it exactly:
 *
 *   h     = ⌊log2 m⌋                       (bit length − 1)
 *   x₀    = m normalized to [2^30, 2^31)   (31-bit mantissa)
 *   step: x² ∈ [2^60, 2^62) — fits int64 —
 *         bit = [x² ≥ 2^61];  x ← x² >> (30 + bit)   (truncating)
 *   20 steps MSB-first: log2_q20(m) = (h << 20) + Σ bitⱼ·2^(20−j)
 *
 * The 31-bit re-truncation each step makes the low bits differ from
 * the REAL log2 by O(2^-19) — irrelevant for sampling keys and the
 * price of staying inside int64 in BOTH engines (DuckDB replicates the
 * identical lattice with BIGINT `*`, `//` and a 20-step recursive CTE;
 * no HUGEINT anywhere). Why a native Expression and not a Column fold:
 * each step references its predecessor twice (x·x), so a 20-step
 * column chain inlines into a 2^20-node Catalyst tree under project
 * collapse — the same blow-up class as the MMR loop
 * (graft-round-workflow memory), but unfixable with localCheckpoint
 * inside one row-wise expression. Codegen emits a single static call,
 * so the enclosing operator stays inside whole-stage codegen.
 *
 * Input m must be ≥ 1 (0/negative → null: there is no log to take);
 * null-safe unary otherwise.
 */
object FixedLog {
  final val FracBits = 20

  /** The defining lattice — called from BOTH interpreted eval and
    * generated code. */
  def log2q20(m: Long): Long = {
    val h = 63 - java.lang.Long.numberOfLeadingZeros(m)
    var x = if (h >= 30) m >>> (h - 30) else m << (30 - h)
    var frac = 0L
    var i = 0
    while (i < FracBits) {
      val x2 = x * x
      if (x2 >= (1L << 61)) { frac = frac * 2 + 1; x = x2 >>> 31 }
      else { frac = frac * 2; x = x2 >>> 30 }
      i += 1
    }
    (h.toLong << FracBits) + frac
  }
}

case class Log2Q20(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a bigint input, got ${child.dataType.simpleString}")

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_log2q20"

  protected override def nullSafeEval(input: Any): Any = {
    val m = input.asInstanceOf[Long]
    if (m < 1L) null else FixedLog.log2q20(m)
  }

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, m => {
      s"""
         |if ($m < 1L) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = graft.functions.FixedLog.log2q20($m);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Log2Q20 =
    copy(child = newChild)
}
