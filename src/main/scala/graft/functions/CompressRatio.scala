package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Deflate compression ratio of a string/binary column: compressed
  * bytes / raw bytes (empty input → 1.0). The classic cheap
  * quality/repetition signal for corpus curation — boilerplate,
  * templated spam, and degenerate repetition compress far better than
  * natural prose, so a low ratio flags low-entropy documents without
  * any model. One native pass per row inside whole-stage codegen; the
  * per-thread Deflater is reused across rows (allocating a zlib stream
  * per row would dominate the cost).
  *
  * Determinism: fixed level/strategy on one JVM — gates and tests
  * compare ratios computed within the same run (relative ordering),
  * never golden constants, so zlib version drift cannot break them.
  */
case class CompressRatio(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = CompressRatio.name

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string or binary, got $other")
  }

  override def nullSafeEval(input: Any): Any = input match {
    case s: UTF8String => CompressRatio.ratioUtf8(s)
    case b: Array[Byte] => CompressRatio.ratioBytes(b)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in => child.dataType match {
      case StringType =>
        s"${ev.value} = graft.functions.CompressRatio.ratioUtf8($in);"
      case _ =>
        s"${ev.value} = graft.functions.CompressRatio.ratioBytes($in);"
    })

  override protected def withNewChildInternal(newChild: Expression): CompressRatio =
    copy(child = newChild)
}

object CompressRatio {
  val name = "graft_compress_ratio"

  // one zlib stream per executor thread, reset per row; nowrap (raw
  // deflate, no zlib header) keeps tiny inputs honest. BEST_SPEED: the
  // signal is entropy-shaped, not size-optimal — level 1 is ~3x the
  // throughput of level 6 with near-identical ordering between docs.
  private val local: ThreadLocal[java.util.zip.Deflater] =
    new ThreadLocal[java.util.zip.Deflater] {
      override def initialValue(): java.util.zip.Deflater =
        new java.util.zip.Deflater(java.util.zip.Deflater.BEST_SPEED, true)
    }

  def ratioUtf8(s: UTF8String): Double = ratioBytes(s.getBytes)

  def ratioBytes(bytes: Array[Byte]): Double = {
    if (bytes.length == 0) return 1.0
    val d = local.get()
    d.reset()
    d.setInput(bytes)
    d.finish()
    val buf = new Array[Byte](8192)
    var out = 0L
    while (!d.finished()) out += d.deflate(buf)
    out.toDouble / bytes.length
  }
}
