package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/**
 * Native codegen'd merge-intersection of two SORTED long arrays — the
 * hot-path replacement for `array_intersect` in
 * [[graft.operators.GraphOps.triangleCounts]] (r17 optimization round,
 * guide §1.2 "per-task work" / the DoubleDotProduct precedent).
 *
 * Why: `array_intersect` is hash-based — per ROW it builds an
 * OpenHashSet over one side and probes the other, boxing every long on
 * the way in. The triangle closure evaluates one intersection per
 * oriented edge (1.2 M rows at sf0.1, Σ|out(s)|+|out(t)| ≈ 10⁸ element
 * visits), which profiled as ~60 s of executor CPU in the closing
 * stage. Both inputs here are `sort_array(collect_list(...))` products
 * — sorted, distinct, null-free — so a two-pointer merge with zero
 * allocation per element is the right kernel, and it compiles into the
 * enclosing whole-stage-codegen body.
 *
 * Semantics — IDENTICAL to `array_intersect(a, b)` for ANY inputs
 * sorted ascending with no null elements (the type check REQUIRES
 * containsNull = false so a misuse fails analysis, not silently;
 * duplicates are allowed since r18 — the merge skips equal runs after
 * emitting a match, so the result is the DISTINCT common elements in
 * ascending order, exactly array_intersect's left-order-preserving
 * dedup on sorted input):
 *  - null array → null (BinaryExpression default).
 *
 * Only SORTEDNESS remains the caller's contract (the only call site
 * feeds sort_array products; unsorted input silently returns a wrong
 * subset); the spec pins equality against array_intersect on
 * randomized sorted frames with and without duplicates, plus the
 * null-in → null-out path.
 */
case class LongSortedIntersect(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(LongType, false) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<bigint> (containsNull = false) " +
        s"inputs, got ${left.dataType.simpleString} and " +
        s"${right.dataType.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_sorted_intersect"

  protected override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData].toLongArray()
    val y = b.asInstanceOf[ArrayData].toLongArray()
    val out = new Array[Long](math.min(x.length, y.length))
    var i = 0; var j = 0; var k = 0
    while (i < x.length && j < y.length) {
      if (x(i) < y(j)) i += 1
      else if (x(i) > y(j)) j += 1
      else {
        // r18 (ADVICE r17 #1): emit once, then skip the whole equal RUN
        // on both sides — on sorted-distinct input this advances exactly
        // one element (bit-identical to before), and on sorted input
        // with duplicates it makes the result equal array_intersect
        // (distinct common elements) instead of silently emitting one
        // row per matching occurrence pair.
        val v = x(i)
        out(k) = v; k += 1
        while (i < x.length && x(i) == v) i += 1
        while (j < y.length && y(j) == v) j += 1
      }
    }
    ArrayData.toArrayData(java.util.Arrays.copyOf(out, k))
  }

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val k = ctx.freshName("k")
      val buf = ctx.freshName("buf")
      val xi = ctx.freshName("xi")
      val yj = ctx.freshName("yj")
      s"""
         |final int $n = $a.numElements();
         |final int $m = $b.numElements();
         |final long[] $buf = new long[$n < $m ? $n : $m];
         |int $i = 0, $j = 0, $k = 0;
         |while ($i < $n && $j < $m) {
         |  final long $xi = $a.getLong($i);
         |  final long $yj = $b.getLong($j);
         |  if ($xi < $yj) { $i++; }
         |  else if ($xi > $yj) { $j++; }
         |  else {
         |    $buf[$k++] = $xi;
         |    while ($i < $n && $a.getLong($i) == $xi) { $i++; }
         |    while ($j < $m && $b.getLong($j) == $xi) { $j++; }
         |  }
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.util.ArrayData
         |  .toArrayData(java.util.Arrays.copyOf($buf, $k));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LongSortedIntersect =
    copy(left = newLeft, right = newRight)
}

object LongSortedIntersect {
  /** Column-API entry: merge-intersection of two sorted long-array
    * columns (sorted, distinct, null-free elements — the caller's
    * contract; equals `array_intersect` on such inputs). */
  def sortedIntersect(a: Column, b: Column): Column =
    Bridge.column(LongSortedIntersect(Bridge.expression(a), Bridge.expression(b)))
}
