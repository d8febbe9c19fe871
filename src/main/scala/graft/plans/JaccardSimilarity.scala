package graft.plans

import org.apache.spark.QueryContext
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{ArrayIntersect, ArrayUnion, BinaryExpression, Cast, Divide, EvalMode, Expression, Size}
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
  * builds two hash tables and materializes two result ARRAYS per
  * row; the native form builds one set per side and counts, with
  * |A∪B| = |A|+|B|−|A∩B|. Division semantics are preserved exactly:
  * an empty union throws DIVIDE_BY_ZERO under ANSI and yields NULL
  * otherwise — the `ansi` flag is captured from the session conf at
  * rewrite time, matching what the replaced Divide would have done.
  */
case class JaccardSimilarity(left: Expression, right: Expression,
    ansi: Boolean) extends BinaryExpression {

  override def dataType: DataType = DoubleType

  // empty-union yields NULL in non-ANSI mode even for non-null inputs
  override def nullable: Boolean = !ansi || super.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"arguments must be array<string>, got ${l.sql}, ${r.sql}")
    }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val iu = JaccardUtil.interUnion(
      l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
    if (iu(1) == 0) {
      if (ansi) throw JaccardUtil.divideByZeroError(origin.context)
      else null
    } else iu(0).toDouble / iu(1)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val errCtx = ctx.addReferenceObj("errCtx", origin.context,
      classOf[QueryContext].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val iu = ctx.freshName("iu")
      val onZero =
        if (ansi)
          s"throw graft.plans.JaccardUtil.divideByZeroError($errCtx);"
        else s"${ev.isNull} = true;"
      s"""
         |int[] $iu = graft.plans.JaccardUtil.interUnion($a, $b);
         |if ($iu[1] == 0) { $onZero }
         |else { ${ev.value} = (double) $iu[0] / $iu[1]; }
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object JaccardUtil {

  /** The same DIVIDE_BY_ZERO the replaced Divide raises under ANSI.
    * QueryExecutionErrors and SparkArithmeticException are both
    * Scala-private[.] (their JVM classes are public), so the error
    * is built reflectively; a plain ArithmeticException with the
    * same message is the fallback.
    */
  def divideByZeroError(ctx: QueryContext): ArithmeticException =
    try {
      val cls = Class.forName("org.apache.spark.SparkArithmeticException")
      val ctor = cls.getConstructor(classOf[String],
        classOf[scala.collection.immutable.Map[_, _]],
        classOf[Array[QueryContext]])
      ctor.newInstance("DIVIDE_BY_ZERO",
        Map("config" -> "\"spark.sql.ansi.enabled\""),
        Option(ctx).toArray).asInstanceOf[ArithmeticException]
    } catch {
      case scala.util.control.NonFatal(_) =>
        new ArithmeticException(
          "[DIVIDE_BY_ZERO] Division by zero (empty union in jaccard).")
    }

  /** (|A∩B|, |A∪B|) over the DISTINCT elements of each side. */
  def interUnion(a: ArrayData, b: ArrayData): Array[Int] = {
    val setA = new java.util.HashSet[UTF8String](math.max(8, a.numElements() * 2))
    var i = 0
    while (i < a.numElements()) { setA.add(a.getUTF8String(i)); i += 1 }
    val setB = new java.util.HashSet[UTF8String](math.max(8, b.numElements() * 2))
    i = 0
    while (i < b.numElements()) { setB.add(b.getUTF8String(i)); i += 1 }
    var inter = 0
    val it = setB.iterator()
    while (it.hasNext) { if (setA.contains(it.next())) inter += 1 }
    Array(inter, setA.size() + setB.size() - inter)
  }
}

/** Optimizer rule: size(array_intersect(a,b)) / size(array_union(a,b))
  * → JaccardSimilarity(a,b) when both sides reference the same pair
  * of string arrays. Injected via GraftExtensions; applies to any
  * query spelled the composed way, including raw SQL.
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
      // ansi derives from the matched Divide's own evalMode (captured
      // at analysis), not the conf at optimization time; TRY-mode
      // (try_divide) and nondeterministic inputs are left un-rewritten
      // — the fused form would change their observable behavior
      // NOTE: Divide's third ctor param is a NumericEvalContext in
      // Spark 4 — the mode must come from the node's evalMode accessor
      case d @ Divide(
          SizeOf(ArrayIntersect(l1, r1)),
          SizeOf(ArrayUnion(l2, r2)), _)
          if d.evalMode != EvalMode.TRY &&
            l1.deterministic && r1.deterministic &&
            l1.semanticEquals(l2) && r1.semanticEquals(r2) &&
            isStringArray(l1) && isStringArray(r1) =>
        JaccardSimilarity(l1, r1, d.evalMode == EvalMode.ANSI)
    }
}
