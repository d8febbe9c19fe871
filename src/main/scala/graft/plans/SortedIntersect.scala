package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** |A∩B| over two SORTED, DISTINCT string arrays by linear merge.
  *
  * The composed `size(array_intersect(a, b))` builds a hash set of
  * one side and materializes the intersection ARRAY per invocation —
  * in a near-dup verifier that means one set build (UTF8String
  * hashing re-reads every byte) plus one allocation PER CANDIDATE
  * PAIR. When the inputs are sorted once per document upstream
  * (`array_sort` in a cached frame, paid |corpus| times instead of
  * |pairs| times), the count is a zero-allocation two-pointer merge
  * of byte-compares with early exit — the classic sorted-posting-
  * list intersection from IR (same contract as DuckDB's
  * list_intersect cardinality, which is set-semantic and
  * order-independent, so oracles never see the difference).
  *
  * Contract: both inputs sorted ascending by UTF8String binary order
  * (Spark's `array_sort` default) with distinct elements; null
  * elements sort last and terminate the merge (a null never equals
  * anything, and nothing non-null follows it).
  */
case class SortedIntersectSize(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"arguments must be array<string>, got ${l.sql}, ${r.sql}")
    }

  override def nullSafeEval(l: Any, r: Any): Any =
    SortedIntersectUtil.count(
      l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.plans.SortedIntersectUtil.count($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectUtil {
  /** Two-pointer merge count; see [[SortedIntersectSize]] contract. */
  def count(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var c = 0
    while (i < na && j < nb) {
      val ua = a.getUTF8String(i)
      val ub = b.getUTF8String(j)
      if (ua == null || ub == null) return c // nulls sort last: done
      val cmp = ua.compareTo(ub)
      if (cmp == 0) { c += 1; i += 1; j += 1 }
      else if (cmp < 0) i += 1
      else j += 1
    }
    c
  }
}
