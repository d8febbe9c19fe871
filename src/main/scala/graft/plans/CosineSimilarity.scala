package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression: cosine similarity of two double
  * arrays in ONE fused loop with full codegen.
  *
  * The composed form (`aggregate(zip_with(a,b,*), ..)/sqrt(..)`)
  * walks both arrays four times and materializes an intermediate
  * product array per row; this walks them once, allocates nothing,
  * and inlines into WholeStageCodegen. Accumulation order is
  * ascending-index for all three sums — the same order the composed
  * form uses — so scores are bit-identical and the DuckDB oracle
  * comparison is unaffected.
  *
  * This is the (b) tier of the custom-operator ladder (compose
  * built-ins < custom Expression < custom SparkPlan): semantics fit
  * a scalar expression, so no LogicalPlan/Strategy machinery is
  * warranted.
  */
case class CosineSimilarity(left: Expression, right: Expression,
    ansi: Boolean) extends BinaryExpression {

  // zero-norm input yields NULL in non-ANSI mode even for non-null
  // arrays — same contract as the Divide in the composed form
  override def nullable: Boolean = !ansi || super.nullable

  // AbstractDataType (and so ImplicitCastInputTypes) is private[sql];
  // callers cast to array<double> and this validates explicitly.
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == ArrayType(DoubleType) ||
        left.dataType == ArrayType(DoubleType, containsNull = false))
      if (right.dataType == ArrayType(DoubleType) ||
          right.dataType == ArrayType(DoubleType, containsNull = false))
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"right argument must be array<double>, got ${right.dataType.sql}")
    else TypeCheckResult.TypeCheckFailure(
      s"left argument must be array<double>, got ${left.dataType.sql}")

  override def dataType: DataType = DoubleType

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getDouble(i); val y = b.getDouble(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) {
      if (ansi) throw JaccardUtil.divideByZeroError(origin.context)
      else null
    } else dot / denom
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val errCtx = ctx.addReferenceObj("errCtx", origin.context,
      classOf[org.apache.spark.QueryContext].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val denom = ctx.freshName("denom")
      val onZero =
        if (ansi)
          s"throw graft.plans.JaccardUtil.divideByZeroError($errCtx);"
        else s"${ev.isNull} = true;"
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = $a.getDouble($i);
         |  double $y = $b.getDouble($i);
         |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |}
         |double $denom = java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb);
         |if ($denom == 0.0) { $onZero }
         |else { ${ev.value} = $dot / $denom; }
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object GraftFunctions {
  val CosineName = "graft_cosine"

  private def arity(name: String, n: Int)(
      b: Seq[Expression] => Expression): Seq[Expression] => Expression =
    exprs => {
      if (exprs.length != n) throw new IllegalArgumentException(
        s"$name expects $n arguments, got ${exprs.length}")
      b(exprs)
    }

  /** Single source of truth for every native function: consumed by
    * register() (imperative) AND GraftExtensions (injection) so the
    * two paths can never drift.
    */
  val all: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    (CosineName,
      "cosine similarity of two array<double> in one fused pass",
      // ansi is captured at analysis time from the active session conf,
      // mirroring what the Divide in the composed form would have done
      arity(CosineName, 2)(e => CosineSimilarity(e(0), e(1),
        org.apache.spark.sql.internal.SQLConf.get.ansiEnabled))),
    (TextHashFunctions.MinHashName,
      "MinHash signature over word n-grams: (words, n, k) -> array<long>",
      arity(TextHashFunctions.MinHashName, 3)(e => ShingleMinHash(e(0),
        TextHashFunctions.intLitValue(e(1)),
        TextHashFunctions.intLitValue(e(2))))),
    (TextHashFunctions.SimHashName,
      "64-bit SimHash as four 16-bit bands: (words) -> array<long>",
      arity(TextHashFunctions.SimHashName, 1)(e => SimHashBands64(e(0)))),
    (TextHashFunctions.SrpBucketName,
      "sign-random-projection LSH bucket: (array<double>, planes) -> long",
      arity(TextHashFunctions.SrpBucketName, 2)(e => SrpBucket(e(0),
        TextHashFunctions.intLitValue(e(1))))))

  /** Register graft's native expressions in a session (idempotent).
    * Callers (Verify/Bench/tests) invoke this once; library code
    * picks the native path up automatically when present.
    */
  def register(spark: SparkSession): Unit =
    all.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "scala_udf")
    }

  def isRegistered(spark: SparkSession): Boolean =
    spark.sessionState.functionRegistry
      .functionExists(FunctionIdentifier(CosineName))
}
