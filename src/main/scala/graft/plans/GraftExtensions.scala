package graft.plans

import graft.functions.{DotProduct, HyperplaneSignature}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** Engine extensions — custom Catalyst surface registered the supported
  * way (`spark.sql.extensions=graft.plans.GraftExtensions`).
  *
  * Registered functions:
  *   - `graft_dot(arrayA, arrayB)` → double: codegen'd vector dot product
  *     ([[graft.functions.DotProduct]]).
  *   - `graft_hyperplane_sig(array[, numBits[, seed]])` → bigint: all LSH
  *     hyperplane sign bits in one pass
  *     ([[graft.functions.HyperplaneSignature]]).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.all.foreach(ext.injectFunction)
}

object GraftExtensions {

  private def intArg(e: Expression, name: String): Int = e match {
    case Literal(v: Int, _)  => v
    case Literal(v: Long, _) => v.toInt
    case other => throw new IllegalArgumentException(
      s"$name must be an integer literal, got $other")
  }

  private val dotFn = (
    FunctionIdentifier("graft_dot"),
    new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
    (children: Seq[Expression]) => DotProduct(children.head, children(1)))

  private val sigFn = (
    FunctionIdentifier("graft_hyperplane_sig"),
    new ExpressionInfo(classOf[HyperplaneSignature].getName, "graft_hyperplane_sig"),
    (children: Seq[Expression]) => {
      val numBits = if (children.length > 1) intArg(children(1), "numBits") else 64
      val seed = if (children.length > 2) intArg(children(2), "seed").toLong else 42L
      HyperplaneSignature(children.head, numBits, seed)
    })

  private val all = Seq(dotFn, sigFn)

  /** Idempotently register the functions on an existing session — the
    * driver invokes `SparkEntry.queries` with its OWN session (no
    * extensions config), so query builders call this first.
    *
    * Also registers the UDAF surface: `graft_topk(id, score)` →
    * array<struct<id, score>> — the bounded-heap top-3
    * ([[graft.functions.TopKAggregator]]; other k via the class).
    */
  def ensureRegistered(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    all.foreach { case (ident, info, builder) =>
      if (!registry.functionExists(ident)) {
        registry.registerFunction(ident, info, builder)
      }
    }
    if (!registry.functionExists(FunctionIdentifier("graft_topk"))) {
      spark.udf.register("graft_topk", org.apache.spark.sql.functions.udaf(
        new graft.functions.TopKAggregator(3),
        org.apache.spark.sql.Encoders.product[graft.functions.Scored]))
    }
  }
}
