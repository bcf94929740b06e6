package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Row-local hash-sketch kernels shared by the interpreted and codegen
  * paths of [[SimHash64]], [[ShingleHashes]] and [[MinHashSig]].
  *
  * Rationale (SURVEY §7.3 preference order (b)): the round-1 versions of
  * these sketches were explode → groupBy aggregations — correct, but the
  * signature of EVERY document crossed a shuffle (64 weight sums for
  * SimHash, 32 minima for MinHash). A signature is a pure function of one
  * row, so these expressions compute it in a single pass with zero
  * shuffle; the only remaining exchange in the dedup queries is the
  * banded candidate join itself. Token/shingle hashing goes through
  * Spark's own `XxHash64Function` with the identical seed-chaining that
  * `xxhash64(a, b, ...)` uses, so the produced signatures are
  * bit-identical to the round-1 aggregation formulations (asserted in
  * `HashSketchesSpec`).
  */
object HashOps {

  private val Seed = 42L

  private def hashStr(s: Any, seed: Long): Long =
    XxHash64Function.hash(s, StringType, seed)

  /** 64-bit SimHash over the non-empty tokens: bit k of the result is
    * set iff Σ_tokens (bit k of xxhash64(token) ? +1 : -1) > 0.
    * Zero non-empty tokens → 0L (callers filter empty docs).
    */
  def simhash(tokens: ArrayData): Long = {
    val counts = new Array[Int](64)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val t = tokens.getUTF8String(i)
        if (t.numBytes() > 0) {
          val h = hashStr(t, Seed)
          var k = 0
          while (k < 64) {
            counts(k) += (((h >>> k) & 1L).toInt << 1) - 1
            k += 1
          }
        }
      }
      i += 1
    }
    var sig = 0L
    var k = 0
    while (k < 64) {
      if (counts(k) > 0) sig |= (1L << k)
      k += 1
    }
    sig
  }

  /** Distinct hashed word n-gram shingles, first-occurrence order —
    * hash(shingle i) = xxhash64(tok(i), .., tok(i+n-1)) with Spark's
    * seed chaining. Fewer than n tokens → empty array.
    */
  def shingleHashes(tokens: ArrayData, n: Int): ArrayData = {
    val len = tokens.numElements()
    if (len < n) return new GenericArrayData(Array.emptyLongArray)
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    var i = 0
    while (i <= len - n) {
      var h = Seed
      var j = 0
      while (j < n) {
        h = hashStr(if (tokens.isNullAt(i + j)) null else tokens.getUTF8String(i + j), h)
        j += 1
      }
      seen.add(h)
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    new GenericArrayData(out)
  }

  /** k salted-minimum MinHash signature over pre-hashed shingles:
    * sig[j] = min_s xxhash64(j: int, s: long) — identical seed chaining
    * to the SQL `min(xxhash64(lit(j), shingle))` aggregation.
    */
  def minhash(shingles: ArrayData, numHashes: Int): ArrayData = {
    val out = Array.fill(numHashes)(Long.MaxValue)
    val n = shingles.numElements()
    var j = 0
    while (j < numHashes) {
      val salt = XxHash64Function.hash(j, IntegerType, Seed)
      var i = 0
      var mn = Long.MaxValue
      while (i < n) {
        val h = XxHash64Function.hash(shingles.getLong(i), LongType, salt)
        if (h < mn) mn = h
        i += 1
      }
      out(j) = mn
      j += 1
    }
    new GenericArrayData(out)
  }
}

object SetOps {
  /** Intersection size of two ASCENDING-sorted long arrays — one merge
    * walk, O(|a|+|b|), no allocation. Callers sort row-locally
    * (`sort_array`); inputs are distinct-element sets by construction
    * ([[HashOps.shingleHashes]] dedups), so the count is |A ∩ B|.
    */
  def sortedIntersect(a: ArrayData, b: ArrayData): Long = {
    val (na, nb) = (a.numElements(), b.numElements())
    var i = 0
    var j = 0
    var c = 0L
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }
}

private[functions] trait ArrayInputCheck { self: UnaryExpression =>
  def expectedElem: DataType
  def fnName: String
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(et, _) if et == expectedElem => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$fnName expects array<${expectedElem.sql}> input, got ${other.sql}")
  }
}

/** `graft_simhash(array<string>) -> bigint` — one-pass 64-bit SimHash. */
case class SimHash64(child: Expression) extends UnaryExpression with ArrayInputCheck {
  override def expectedElem: DataType = StringType
  override def fnName: String = prettyName
  override def dataType: DataType = LongType
  override protected def nullSafeEval(input: Any): Any =
    HashOps.simhash(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashOps.simhash($c)")
  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
  override def prettyName: String = "graft_simhash"
}

/** `graft_shingle_hashes(array<string>[, n]) -> array<bigint>` —
  * distinct hashed word n-gram shingles (default n=3).
  */
case class ShingleHashes(child: Expression, n: Int)
    extends UnaryExpression with ArrayInputCheck {
  require(n > 0, s"shingle width must be positive, got $n")
  override def expectedElem: DataType = StringType
  override def fnName: String = prettyName
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    HashOps.shingleHashes(input.asInstanceOf[ArrayData], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashOps.shingleHashes($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
  override def prettyName: String = "graft_shingle_hashes"
}

/** `graft_minhash(array<bigint>[, k]) -> array<bigint>` — k-salted
  * MinHash signature over pre-hashed shingles (default k=32).
  */
case class MinHashSig(child: Expression, numHashes: Int)
    extends UnaryExpression with ArrayInputCheck {
  require(numHashes > 0, s"numHashes must be positive, got $numHashes")
  override def expectedElem: DataType = LongType
  override def fnName: String = prettyName
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    HashOps.minhash(input.asInstanceOf[ArrayData], numHashes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashOps.minhash($c, $numHashes)")
  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
  override def prettyName: String = "graft_minhash"
}

/** `graft_sorted_inter(array<bigint>, array<bigint>) -> bigint` —
  * intersection size of two ascending-sorted long arrays in one
  * codegen'd merge walk. The row-local replacement for the
  * explode → equi-join → count intersection counting in the near-dup
  * VERIFY stage: once a candidate pair's two shingle sets sit in one
  * row, |A ∩ B| needs no shuffle at all.
  */
case class SortedIntersect(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects two array<bigint> inputs, got ${l.sql}, ${r.sql}")
    }
  override protected def nullSafeEval(a: Any, b: Any): Any =
    SetOps.sortedIntersect(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.SetOps.sortedIntersect($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersect =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "graft_sorted_inter"
}
