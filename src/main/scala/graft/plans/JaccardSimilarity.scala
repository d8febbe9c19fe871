package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{ArrayIntersect, ArrayUnion, BinaryExpression, Cast, Divide, Expression, Size}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native set-Jaccard over two string arrays, plus the optimizer
  * rule that rewrites the composed form into it.
  *
  * The composed `size(array_intersect(a,b)) / size(array_union(a,b))`
  * builds two hash tables and two result ARRAYS per row (intersect
  * and union both materialize their output). The native form builds
  * one set per side and counts — no output arrays — with
  * |A∪B| = |A|+|B|−|A∩B|. Results are identical for the engine's
  * usage (distinct, non-null shingle sets; both operators are
  * null/NaN-compatible set semantics on such inputs).
  */
case class JaccardSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"arguments must be array<string>, got ${l.sql}, ${r.sql}")
    }

  override def nullSafeEval(l: Any, r: Any): Any =
    JaccardUtil.jaccard(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.plans.JaccardUtil.jaccard($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object JaccardUtil {
  /** |A∩B| / |A∪B| over the DISTINCT elements of each side. */
  def jaccard(a: ArrayData, b: ArrayData): Double = {
    val setA = new java.util.HashSet[UTF8String](math.max(8, a.numElements() * 2))
    var i = 0
    while (i < a.numElements()) { setA.add(a.getUTF8String(i)); i += 1 }
    val setB = new java.util.HashSet[UTF8String](math.max(8, b.numElements() * 2))
    i = 0
    while (i < b.numElements()) { setB.add(b.getUTF8String(i)); i += 1 }
    var inter = 0
    val it = setB.iterator()
    while (it.hasNext) { if (setA.contains(it.next())) inter += 1 }
    val union = setA.size() + setB.size() - inter
    inter.toDouble / union
  }
}

/** Optimizer rule: size(array_intersect(a,b)) / size(array_union(a,b))
  * → JaccardSimilarity(a,b) when both sides reference the same pair
  * of string arrays. Injected via GraftExtensions; applies to any
  * user query spelled the composed way, including raw SQL.
  */
object RewriteJaccard extends Rule[LogicalPlan] {

  /** The analyzer wraps the int sizes in casts to double before the
    * divide — accept Size with or without that cast.
    */
  private object SizeOf {
    def unapply(e: Expression): Option[Expression] = e match {
      case Size(c, _) => Some(c)
      case Cast(Size(c, _), DoubleType, _, _) => Some(c)
      case _ => None
    }
  }

  private def isStringArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(StringType, _) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case Divide(
          SizeOf(ArrayIntersect(l1, r1)),
          SizeOf(ArrayUnion(l2, r2)), _)
          if l1.semanticEquals(l2) && r1.semanticEquals(r2) &&
            isStringArray(l1) && isStringArray(r1) =>
        JaccardSimilarity(l1, r1)
    }
}
