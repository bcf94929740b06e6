package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Native codegen'd Morton (z-order) interleave of two integral columns.
  *
  * `graft_zorder(x, y[, bits])` → bigint: bit i of x lands at result bit
  * 2i, bit i of y at 2i+1, for the low `bits` (≤ 31) bits of each input —
  * the space-filling-curve clustering key used for multi-dimensional data
  * layout (a z-sorted write co-locates rows that are close in BOTH
  * dimensions, so 2-D range predicates prune contiguous file runs;
  * see q_zorder_layout for the quantize → interleave → tile pipeline).
  *
  * Why custom (SURVEY §7.3 preference order (b)): the composable
  * formulation — `aggregate(sequence(0, bits-1), ...)` over shift
  * arithmetic — allocates a per-row array and evaluates the lambda
  * interpreted (HOFs are excluded from whole-stage codegen). This
  * generates a tight primitive loop with no allocation instead, and
  * stays inside the WholeStageCodegen span of the projection it rides.
  *
  * Deterministic integer arithmetic only — bit-identical to any engine
  * computing Σ bit-shifts, so DuckDB oracles replicate it exactly.
  * Negative inputs take their two's-complement low bits (callers
  * quantize to [0, 2^bits) first); null in → null out.
  */
case class ZOrder(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {
  require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(e: Expression): Boolean = e.dataType match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _                                             => false
    }
    if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_zorder expects integral inputs, " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")
  }

  override def dataType: DataType = LongType

  private def asLong(v: Any): Long = v match {
    case b: Byte  => b.toLong
    case s: Short => s.toLong
    case i: Int   => i.toLong
    case l: Long  => l
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (asLong(a), asLong(b))
    var z = 0L
    var i = 0
    while (i < bits) {
      z |= ((x >>> i) & 1L) << (2 * i) | ((y >>> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  // Janino (Spark's codegen compiler) misparses parenthesized arithmetic
  // directly after a shift operator ("(2 * i) is not a type"), which
  // would silently demote the expression to interpreted fallback — keep
  // every shift amount in a plain local variable.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val sh = ctx.freshName("sh")
      val z = ctx.freshName("z")
      s"""
         |long $z = 0L;
         |int $sh = 0;
         |for (int $i = 0; $i < $bits; $i++) {
         |  $z |= ((((long) $a) >>> $i) & 1L) << $sh;
         |  $sh++;
         |  $z |= ((((long) $b) >>> $i) & 1L) << $sh;
         |  $sh++;
         |}
         |${ev.value} = $z;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZOrder =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_zorder"
}
