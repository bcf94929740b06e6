package graft.plans

import graft.functions.{DeflateLen, DotProduct, DtwDistance, HyperplaneSignature, MgCounter, MinHashSig, MisraGries, Scored, ShingleHashes, SimHash64, SortedIntersect, TopKAggregator, ZOrder}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.execution.aggregate.ScalaAggregator

/** Engine extensions — custom Catalyst surface registered the supported
  * way (`spark.sql.extensions=graft.plans.GraftExtensions`).
  *
  * Registered functions:
  *   - `graft_dot(arrayA, arrayB)` → double: codegen'd vector dot product
  *     ([[graft.functions.DotProduct]]).
  *   - `graft_hyperplane_sig(array[, numBits[, seed]])` → bigint: all LSH
  *     hyperplane sign bits in one pass
  *     ([[graft.functions.HyperplaneSignature]]).
  *   - `graft_topk(id, score[, k])` → array<struct<id, score>>: bounded-
  *     heap top-k ([[graft.functions.TopKAggregator]]); k is an integer
  *     literal, default 3. Registered as a registry BUILDER (not a fixed
  *     `spark.udf.register` instance) so each call site picks its own k.
  *   - `graft_simhash(array<string>)` → bigint,
  *     `graft_shingle_hashes(array<string>[, n])` → array<bigint>,
  *     `graft_minhash(array<bigint>[, k])` → array<bigint>: one-pass
  *     row-local dedup sketches ([[graft.functions.HashOps]]) — the
  *     shuffle-free replacements for the explode→groupBy signature
  *     aggregations.
  *   - `graft_mg(token[, k])` → array<string>: mergeable Misra-Gries
  *     heavy-hitter candidates ([[graft.functions.MisraGries]]); k is an
  *     integer literal, default 64.
  *   - `graft_zorder(x, y[, bits])` → bigint: codegen'd Morton
  *     interleave for z-order data layout ([[graft.functions.ZOrder]]);
  *     bits is an integer literal, default 16.
  *   - `graft_deflate_len(string)` → int: Deflate-compressed byte count
  *     of the text ([[graft.functions.DeflateLen]]) — the per-document
  *     redundancy signal behind q_compression_ratio.
  *   - `graft_sorted_inter(array<bigint>, array<bigint>)` → bigint:
  *     codegen'd merge-walk intersection size of two sorted arrays
  *     ([[graft.functions.SortedIntersect]]) — the row-local exact-
  *     Jaccard verify kernel (replaces explode → join → count).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.all.foreach(ext.injectFunction)
    // AQE small-sort compaction (round 14): strictly runtime-size-based,
    // physical-only — results are identical with or without it, so the
    // driver's own extension-less correctness session is unaffected.
    ext.injectQueryStagePrepRule(CompactSmallSort)
  }
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

  // Aggregate builder: analyzer wraps the returned AggregateFunction in an
  // AggregateExpression and the built-in ResolveEncodersInScalaAgg rule
  // resolves the encoders — same machinery `functions.udaf` rides on, but
  // parameterized over the k literal at each call site.
  private val topkFn = (
    FunctionIdentifier("graft_topk"),
    new ExpressionInfo(classOf[TopKAggregator].getName, "graft_topk"),
    (children: Seq[Expression]) => {
      val k = if (children.length > 2) intArg(children(2), "k") else 3
      ScalaAggregator(
        children.take(2),
        new TopKAggregator(k),
        ExpressionEncoder[Scored](),
        ExpressionEncoder[Seq[Scored]](),
        nullable = false,
        aggregatorName = Some("graft_topk"))
    })

  private val simhashFn = (
    FunctionIdentifier("graft_simhash"),
    new ExpressionInfo(classOf[SimHash64].getName, "graft_simhash"),
    (children: Seq[Expression]) => SimHash64(children.head))

  private val shingleFn = (
    FunctionIdentifier("graft_shingle_hashes"),
    new ExpressionInfo(classOf[ShingleHashes].getName, "graft_shingle_hashes"),
    (children: Seq[Expression]) => {
      val n = if (children.length > 1) intArg(children(1), "n") else 3
      ShingleHashes(children.head, n)
    })

  private val minhashFn = (
    FunctionIdentifier("graft_minhash"),
    new ExpressionInfo(classOf[MinHashSig].getName, "graft_minhash"),
    (children: Seq[Expression]) => {
      val k = if (children.length > 1) intArg(children(1), "numHashes") else 32
      MinHashSig(children.head, k)
    })

  private val mgFn = (
    FunctionIdentifier("graft_mg"),
    new ExpressionInfo(classOf[MisraGries].getName, "graft_mg"),
    (children: Seq[Expression]) => {
      val k = if (children.length > 1) intArg(children(1), "k") else 64
      ScalaAggregator(
        children.take(1),
        new MisraGries(k),
        ExpressionEncoder[String](),
        ExpressionEncoder[Seq[MgCounter]](),
        nullable = false,
        aggregatorName = Some("graft_mg"))
    })

  private val zorderFn = (
    FunctionIdentifier("graft_zorder"),
    new ExpressionInfo(classOf[ZOrder].getName, "graft_zorder"),
    (children: Seq[Expression]) => {
      val bits = if (children.length > 2) intArg(children(2), "bits") else 16
      ZOrder(children.head, children(1), bits)
    })

  private val interFn = (
    FunctionIdentifier("graft_sorted_inter"),
    new ExpressionInfo(classOf[SortedIntersect].getName, "graft_sorted_inter"),
    (children: Seq[Expression]) => SortedIntersect(children.head, children(1)))

  private val deflateFn = (
    FunctionIdentifier("graft_deflate_len"),
    new ExpressionInfo(classOf[DeflateLen].getName, "graft_deflate_len"),
    (children: Seq[Expression]) => DeflateLen(children.head))

  private val dtwFn = (
    FunctionIdentifier("graft_dtw"),
    new ExpressionInfo(classOf[DtwDistance].getName, "graft_dtw"),
    (children: Seq[Expression]) => DtwDistance(children.head, children(1)))

  private val all = Seq(dotFn, sigFn, topkFn, simhashFn, shingleFn, minhashFn,
    mgFn, zorderFn, interFn, deflateFn, dtwFn)

  /** Idempotently register the functions on an existing session — the
    * driver invokes `SparkEntry.queries` with its OWN session (no
    * extensions config), so query builders call this first.
    */
  def ensureRegistered(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    all.foreach { case (ident, info, builder) =>
      if (!registry.functionExists(ident)) {
        registry.registerFunction(ident, info, builder)
      }
    }
  }
}
