package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native codegen'd dynamic-time-warping distance of two BIGINT array
  * columns with |a−b| step cost and the classic 3-way recurrence
  * (match / insert / delete, no band, no slope constraint).
  *
  * Why custom (SURVEY §7.3 preference order (b)): the DP's inner cell
  * depends on the CURRENT row's previous cell, so it cannot be phrased
  * as `transform`/`zip_with` (those are element-independent), and a
  * nested `aggregate` fold would run interpreted outside whole-stage
  * codegen while allocating an array per step. This expression
  * generates the two-rolling-rows primitive loop instead — O(n·m) with
  * zero allocation beyond the two rows.
  *
  * All-integer semantics (inputs, costs, minima, result) — no FP, so
  * any engine that implements the same recurrence matches EXACTLY; the
  * q_dtw_profile oracle replays it as a 144-step recursive CTE.
  * Null/empty arrays → null; null ELEMENTS are not expected (builders
  * construct dense arrays) and read as 0.
  */
case class DtwDistance(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(e: Expression): Boolean = e.dataType match {
      case ArrayType(LongType, _) => true
      case _                      => false
    }
    if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dtw expects array<bigint> inputs, " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")
  }

  override def dataType: DataType = LongType

  // empty arrays yield null even for non-null inputs — without this the
  // codegen path would assign into a constant-false isNull slot
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (xs, ys) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val n = xs.numElements()
    val m = ys.numElements()
    if (n == 0 || m == 0) return null
    var prev = new Array[Long](m)
    var cur = new Array[Long](m)
    var i = 0
    while (i < n) {
      var j = 0
      while (j < m) {
        val cost = math.abs(xs.getLong(i) - ys.getLong(j))
        val best =
          if (i == 0 && j == 0) 0L
          else if (i == 0) cur(j - 1)
          else if (j == 0) prev(j)
          else math.min(math.min(prev(j), cur(j - 1)), prev(j - 1))
        cur(j) = cost + best
        j += 1
      }
      val t = prev; prev = cur; cur = t
      i += 1
    }
    prev(m - 1)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val prev = ctx.freshName("prev")
      val cur = ctx.freshName("cur")
      val tmp = ctx.freshName("tmp")
      val cost = ctx.freshName("cost")
      val best = ctx.freshName("best")
      s"""
         |int $n = $a.numElements();
         |int $m = $b.numElements();
         |if ($n == 0 || $m == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  long[] $prev = new long[$m];
         |  long[] $cur = new long[$m];
         |  for (int $i = 0; $i < $n; $i++) {
         |    for (int $j = 0; $j < $m; $j++) {
         |      long $cost = java.lang.Math.abs($a.getLong($i) - $b.getLong($j));
         |      long $best;
         |      if ($i == 0 && $j == 0) { $best = 0L; }
         |      else if ($i == 0) { $best = $cur[$j - 1]; }
         |      else if ($j == 0) { $best = $prev[$j]; }
         |      else {
         |        $best = java.lang.Math.min(
         |          java.lang.Math.min($prev[$j], $cur[$j - 1]), $prev[$j - 1]);
         |      }
         |      $cur[$j] = $cost + $best;
         |    }
         |    long[] $tmp = $prev; $prev = $cur; $cur = $tmp;
         |  }
         |  ${ev.value} = $prev[$m - 1];
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DtwDistance =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_dtw"
}
