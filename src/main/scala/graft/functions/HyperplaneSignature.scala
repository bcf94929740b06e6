package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** All `numBits` hyperplane sign bits of an embedding in ONE codegen'd
  * pass: bit k is set iff `dot(emb, plane_k) > 0`, where plane component
  * `plane_k[i] = ±1` from the parity of `xxhash64(k*64+i, seed=42)` —
  * deterministic, no RNG, identical to what a chain of 64 separate
  * dot-product calls would compute.
  *
  * Why one expression instead of composing 64 `graft_dot` calls: the
  * composed form generates ~4096 inlined multiply terms (64 plane
  * literals × 64 dims), which blows up janino compile time; here the
  * generated code is one nested loop over a referenced plane matrix.
  *
  * Designed for 64-dim embeddings (plane index = k*64+i); longer arrays
  * reuse later bits' planes — fine for bucketing, documented.
  */
case class HyperplaneSignature(child: Expression, numBits: Int, seed: Long)
    extends UnaryExpression {

  require(numBits >= 1 && numBits <= 64, s"numBits must be 1..64, got $numBits")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_hyperplane_sig expects array<float>/array<double>, got ${t.sql}")
  }

  override def dataType: DataType = LongType

  /** ±1 plane matrix, flattened [bit*64 + dim]; plan-time constant. */
  @transient private lazy val planes: Array[Double] =
    Array.tabulate(numBits * 64) { idx =>
      if (math.floorMod(XXH64.hashLong(idx.toLong, seed), 2L) == 0L) 1.0 else -1.0
    }

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var bits = 0L
    var k = 0
    while (k < numBits) {
      var sum = 0.0
      var i = 0
      val limit = math.min(n, 64)
      while (i < limit) {
        if (!arr.isNullAt(i)) {
          val x = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
          sum += x * planes(k * 64 + i)
        }
        i += 1
      }
      if (sum > 0) bits |= 1L << k
      k += 1
    }
    bits
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("planes", planes, "double[]")
    nullSafeCodeGen(ctx, ev, a => {
      val (k, i, n, sum, bits) = (ctx.freshName("k"), ctx.freshName("i"),
        ctx.freshName("n"), ctx.freshName("sum"), ctx.freshName("bits"))
      val get = if (isFloat) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      s"""
         |int $n = java.lang.Math.min($a.numElements(), 64);
         |long $bits = 0L;
         |for (int $k = 0; $k < $numBits; $k++) {
         |  double $sum = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if (!$a.isNullAt($i)) {
         |      $sum += $get * $planesRef[$k * 64 + $i];
         |    }
         |  }
         |  if ($sum > 0) $bits |= 1L << $k;
         |}
         |${ev.value} = $bits;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneSignature =
    copy(child = newChild)

  override def prettyName: String = "graft_hyperplane_sig"
}
