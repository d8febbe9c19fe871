package graft.textanalysis

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

class QualitySignalsSpec extends SparkSpec {
  import spark.implicits._

  /** Scala replica of the micro-nat contract: Σ c·round(ln(n/c)·1e6)
    * over token counts, then /(n·1e6) rounded to 4.
    */
  private def refEntropy(text: String): Double = {
    val ws = text.split(" ", -1)
    val n = ws.length.toLong
    val sum6 = ws.groupBy(identity).values.map(_.length.toLong)
      .map(c => c * math.round(math.log(n.toDouble / c) * 1e6))
      .sum
    BigDecimal(sum6 / (n * 1e6))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  test("token entropy matches the exact integer reference on the corpus") {
    val docs = Tables.documents(spark, sfDir).limit(120)
    val got = TextAnalysis.tokenEntropy(docs)
      .select($"doc_id", $"entropy").as[(Long, Double)].collect().toMap
    val want = docs.select($"doc_id", $"text").as[(Long, String)]
      .collect().map { case (id, t) => id -> refEntropy(t) }.toMap
    assert(got.keySet === want.keySet)
    got.foreach { case (id, e) => assert(e === want(id), s"doc $id") }
  }

  test("entropy extremes: uniform tokens hit ln(k), stamped tokens hit 0") {
    val rows = Seq(
      (1L, "a b c d"),                    // 4 distinct → ln(4)
      (2L, "spam spam spam spam spam"),   // 1 distinct → 0
      (3L, "x"))                          // singleton → 0
      .toDF("doc_id", "text")
    val got = TextAnalysis.tokenEntropy(rows)
      .select($"doc_id", $"entropy").as[(Long, Double)].collect().toMap
    assert(got(1L) === BigDecimal(math.round(math.log(4.0) * 1e6) / 1e6)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(got(2L) === 0.0)
    assert(got(3L) === 0.0)
  }

  test("token entropy is narrow: zero exchanges before the query-edge sort") {
    val p = TextAnalysis.tokenEntropy(Tables.documents(spark, sfDir))
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange hashpartitioning"), p)
  }

  test("deflate ratio matches java.util.zip and ranks prose above stamps") {
    val prose = Tables.documents(spark, sfDir)
      .select($"text").as[String].head()
    val stamp = ("lorem ipsum " * 200).trim
    def direct(s: String): Double = {
      val bytes = s.getBytes("UTF-8")
      val d = new java.util.zip.Deflater(6, true)
      try {
        d.setInput(bytes); d.finish()
        val buf = new Array[Byte](8192)
        var total = 0L
        while (!d.finished()) total += d.deflate(buf)
        total.toDouble / bytes.length
      } finally d.end()
    }
    val got = TextAnalysis.compressionRatio(
        Seq((1L, prose), (2L, stamp)).toDF("doc_id", "text"))
      .select($"doc_id", $"deflate_ratio").as[(Long, Double)]
      .collect().toMap
    def r4(x: Double): Double = BigDecimal(x)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(1L) === r4(direct(prose)))
    assert(got(2L) === r4(direct(stamp)))
    assert(got(2L) < got(1L) / 2, s"stamp ${got(2L)} vs prose ${got(1L)}")
  }

  test("deflate ratio edges: empty → 1.0, null → null") {
    val got = Seq((1L, ""), (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
      .select($"doc_id",
        call_function(graft.plans.TextHashFunctions.DeflateRatioName,
          $"text").as("r"))
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    assert(got(1L) === Some(1.0))
    assert(got(2L) === None)
  }
}
