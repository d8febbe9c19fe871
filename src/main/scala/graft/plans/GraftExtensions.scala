package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: makes graft's native
  * expressions first-class SQL functions in any session built with
  *
  *   spark.sql.extensions=graft.plans.GraftExtensions
  *
  * (or `.withExtensions(new GraftExtensions)`), with no imperative
  * register call — the injection runs for every new session,
  * including ones created by thriftserver/connect where library code
  * never executes. GraftFunctions.register remains for sessions that
  * already exist.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, name, usage, "", "")

  override def apply(e: SparkSessionExtensions): Unit = {
    // optimizer rule: composed size(intersect)/size(union) → native
    // single-pass JaccardSimilarity (see RewriteJaccard)
    e.injectOptimizerRule(_ => RewriteJaccard)
    e.injectFunction((FunctionIdentifier(GraftFunctions.CosineName),
      info(GraftFunctions.CosineName,
        "cosine similarity of two array<double> in one fused pass"),
      (exprs: Seq[Expression]) => CosineSimilarity(exprs(0), exprs(1))))
    e.injectFunction((FunctionIdentifier(TextHashFunctions.MinHashName),
      info(TextHashFunctions.MinHashName,
        "MinHash signature over word n-grams: (words, n, k) -> array<long>"),
      (exprs: Seq[Expression]) => ShingleMinHash(exprs(0),
        TextHashFunctions.intLitValue(exprs(1)),
        TextHashFunctions.intLitValue(exprs(2)))))
    e.injectFunction((FunctionIdentifier(TextHashFunctions.SimHashName),
      info(TextHashFunctions.SimHashName,
        "64-bit SimHash as four 16-bit bands: (words) -> array<long>"),
      (exprs: Seq[Expression]) => SimHashBands64(exprs(0))))
    e.injectFunction((FunctionIdentifier(TextHashFunctions.SrpBucketName),
      info(TextHashFunctions.SrpBucketName,
        "sign-random-projection LSH bucket: (array<double>, planes) -> long"),
      (exprs: Seq[Expression]) => SrpBucket(exprs(0),
        TextHashFunctions.intLitValue(exprs(1)))))
  }
}
