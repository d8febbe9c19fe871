package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native DSIR micro-nat score: Σ over the feature grams of a token
  * array (unigrams + adjacent-pair bigrams) of `ratios[bucket(gram)]`,
  * with bucket = first 15 md5 hex digits of the gram as a 60-bit
  * integer mod |ratios| — the fused form of
  * [[graft.selection.Dsir.score6Local]]'s composed fold.
  *
  * The composed form pays, per gram: a lambda-variable bind, an md5
  * over a freshly-concatenated gram STRING (the bigram array is
  * materialized first by transform/concat_ws), a hex substring, a
  * decimal `conv` parse, and an O(1) `element_at` — all interpreted,
  * because higher-order aggregate never joins whole-stage codegen.
  * This walks the token array once, hashes prev+' '+cur straight from
  * the token bytes (no gram array, no hex, no string parse — the
  * bucket reads the digest's first 7.5 bytes directly), and inlines
  * into WholeStageCodegen.
  *
  * Null contract matches the composed fold exactly: null array →
  * null; any null TOKEN → null (a null unigram nullifies the md5 →
  * bucket → element_at → sum chain). The ratio table must be a
  * foldable array<bigint> literal — it is the frozen model artifact,
  * bounded by [[graft.selection.Dsir.MaxBuckets]] at train time.
  */
case class DsirScore6(tokens: Expression, ratios: Expression)
    extends BinaryExpression {

  override def left: Expression = tokens
  override def right: Expression = ratios
  override def nullable: Boolean = true
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (tokens.dataType != ArrayType(StringType) &&
        tokens.dataType != ArrayType(StringType, containsNull = false))
      TypeCheckResult.TypeCheckFailure(
        s"tokens must be array<string>, got ${tokens.dataType.sql}")
    else if (ratios.dataType != ArrayType(LongType) &&
        ratios.dataType != ArrayType(LongType, containsNull = false))
      TypeCheckResult.TypeCheckFailure(
        s"ratios must be array<bigint>, got ${ratios.dataType.sql}")
    else if (!ratios.foldable)
      TypeCheckResult.TypeCheckFailure(
        "ratios must be a foldable literal (the frozen model artifact)")
    else TypeCheckResult.TypeCheckSuccess

  @transient private lazy val table: Array[Long] = {
    val ad = ratios.eval(null).asInstanceOf[ArrayData]
    require(ad != null && ad.numElements() > 0, "ratios must be non-empty")
    ad.toLongArray()
  }

  override def nullSafeEval(t: Any, r: Any): Any =
    DsirScoreUtil.score6(t.asInstanceOf[ArrayData], table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tableRef = ctx.addReferenceObj("dsirTable", table, "long[]")
    nullSafeCodeGen(ctx, ev, (t, _) => {
      val boxed = ctx.freshName("dsirScore")
      s"""
         |java.lang.Long $boxed = graft.plans.DsirScoreUtil.score6($t, $tableRef);
         |if ($boxed == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $boxed.longValue(); }
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): Expression = copy(tokens = l, ratios = r)
}

object DsirScoreUtil {
  /** One pass over the tokens: per token, hash the unigram and (from
    * index 1) the `prev + ' ' + cur` bigram; each digest's first 60
    * bits pick the ratio bucket. Token bytes are fetched once each.
    */
  def score6(tokens: ArrayData, table: Array[Long]): java.lang.Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val scratch = new Array[Byte](16)
    val buckets = table.length
    val n = tokens.numElements()
    var sum = 0L
    var prev: Array[Byte] = null
    var i = 0
    while (i < n) {
      if (tokens.isNullAt(i)) return null
      val cur = tokens.getUTF8String(i).getBytes
      md.reset()
      md.update(cur)
      md.digest(scratch, 0, 16)
      sum += table(bucketOf(scratch, buckets))
      if (prev != null) {
        md.reset()
        md.update(prev)
        md.update(' '.toByte)
        md.update(cur)
        md.digest(scratch, 0, 16)
        sum += table(bucketOf(scratch, buckets))
      }
      prev = cur
      i += 1
    }
    sum
  }

  /** First 15 hex digits = first 7.5 digest bytes big-endian: read 8
    * bytes as an unsigned long and drop the low nibble. Identical to
    * parsing `substring(md5hex, 1, 15)` base-16.
    */
  private def bucketOf(d: Array[Byte], buckets: Int): Int = {
    var h = 0L
    var i = 0
    while (i < 8) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
    ((h >>> 4) % buckets).toInt
  }
}
