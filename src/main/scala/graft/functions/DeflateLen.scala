package graft.functions

import java.util.zip.Deflater

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Row-local Deflate kernel behind [[DeflateLen]].
  *
  * One `Deflater` per thread, `reset()` per row — zlib native-handle
  * allocation is ~µs and would dominate the per-row cost; reuse makes
  * the kernel allocation-free except for the (bounded) scratch buffer.
  */
object TextCodec {
  private val scratch = new ThreadLocal[Array[Byte]] {
    override def initialValue(): Array[Byte] = new Array[Byte](64 * 1024)
  }
  private val deflater = new ThreadLocal[Deflater] {
    // level 6 = zlib default (the ratio/speed point corpus-quality
    // filters standardize on); nowrap=true drops the 6-byte zlib
    // envelope so tiny inputs aren't dominated by framing
    override def initialValue(): Deflater =
      new Deflater(Deflater.DEFAULT_COMPRESSION, true)
  }

  /** Deflate-compressed byte count of a string's UTF-8 bytes. */
  def deflateLen(s: UTF8String): Int = {
    val in = s.getBytes
    val d = deflater.get()
    d.reset()
    d.setInput(in)
    d.finish()
    var total = 0
    val buf = scratch.get()
    while (!d.finished()) {
      total += d.deflate(buf)
    }
    total
  }
}

/** `graft_deflate_len(string) -> int` — Deflate-compressed size of the
  * UTF-8 text, the classic cheap redundancy signal corpus curation runs
  * per document (near-constant text compresses far below prose; random
  * noise compresses above it). Custom expression (SURVEY §7.3 preference
  * (b)): a UDF would box every row and fall out of whole-stage codegen;
  * this stays a static call inside the generated projection loop.
  *
  * Deterministic for a fixed zlib build (same JVM ⇒ same bytes), which
  * is exactly the reproducibility a single pipeline run needs; the
  * derived RATIO is additionally stable across zlib builds to well
  * under the filter thresholds, so the op is spec-verified (bounds +
  * ordering invariants), not byte-oracled against another engine.
  */
case class DeflateLen(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string input, got ${other.sql}")
  }
  override def dataType: DataType = IntegerType
  override protected def nullSafeEval(input: Any): Any =
    TextCodec.deflateLen(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextCodec.deflateLen($c)")
  override protected def withNewChildInternal(newChild: Expression): DeflateLen =
    copy(child = newChild)
  override def prettyName: String = "graft_deflate_len"
}
