package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** zlib compressibility of a string: deflated size / raw UTF-8 size.
  *
  * The corpus-quality signal entropy statistics approximate from one
  * distribution at a time, measured directly: templated or stamped
  * text deflates far below natural prose (LZ77 sees the long-range
  * repeats that per-token entropy and n-gram dup fractions both
  * miss), so a low ratio flags machine-generated filler even when
  * every individual sentence looks clean. Deterministic for a fixed
  * zlib level within a JVM, but NOT a cross-engine contract (DuckDB
  * exposes no deflate) — queries over this expression are rows-only
  * in the oracle gate, with exactness pinned in specs against
  * java.util.zip directly.
  *
  * Raw deflate (nowrap, no zlib header) so tiny inputs aren't
  * dominated by framing bytes; empty input is defined as ratio 1.0
  * (nothing to compress, nothing saved).
  */
case class DeflateRatio(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"argument must be string, got ${t.sql}")
  }
  override def nullSafeEval(v: Any): Any =
    DeflateRatioUtil.ratio(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.DeflateRatioUtil.ratio($c);")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object DeflateRatioUtil {
  private val Level = 6 // zlib default: the ratio people mean by "zlib ratio"

  def ratio(s: UTF8String): Double = {
    val bytes = s.getBytes
    if (bytes.length == 0) return 1.0
    val d = new java.util.zip.Deflater(Level, true)
    try {
      d.setInput(bytes)
      d.finish()
      val buf = new Array[Byte](8192)
      var total = 0L
      while (!d.finished()) total += d.deflate(buf)
      total.toDouble / bytes.length
    } finally d.end()
  }
}
