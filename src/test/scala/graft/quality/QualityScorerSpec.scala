package graft.quality

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

class QualityScorerSpec extends SparkSpec {
  import spark.implicits._

  test("PII detection catches email / ssn / phone, passes clean text") {
    val df = Seq(
      (1L, "contact me at alice@example.com for details"),
      (2L, "ssn is 123-45-6789 do not share"),
      (3L, "call +1 (555) 123-4567 today"),
      (4L, "perfectly clean text with no identifiers at all")
    ).toDF("doc_id", "text")
    val scored = RuleBasedScorer.score(df, "text")
      .select("doc_id", "has_pii").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(scored(1L) && scored(2L) && scored(3L) && !scored(4L))
  }

  test("scores bounded 0..100, weights sum to 1") {
    val rows = RuleBasedScorer.score(Tables.documents(spark, sfDir), "text")
      .select("completeness", "consistency", "pii_detection",
        "language_quality", "quality_score").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      (0 to 3).foreach(i => assert(r.getLong(i) >= 0 && r.getLong(i) <= 100))
      val expected = (r.getLong(0) * 3 + r.getLong(1) * 3 +
        r.getLong(2) * 2 + r.getLong(3) * 2) / 10.0
      assert(r.getDouble(4) === expected)
    }
  }

  test("empty-ish content scores invalid (error-result path U3)") {
    val df = Seq((1L, "x")).toDF("doc_id", "text")
    val r = RuleBasedScorer.score(df, "text").select("quality_is_valid").head()
    assert(!r.getBoolean(0))
  }

  test("gate drops exactly the invalid rows") {
    val scored = RuleBasedScorer.score(Tables.documents(spark, sfDir), "text")
    val kept = RuleBasedScorer.qualityGate(scored, block = true).count()
    val validCount = scored.filter(col("quality_is_valid")).count()
    assert(kept === validCount)
    assert(RuleBasedScorer.qualityGate(scored, block = false).count() === scored.count())
  }

  test("issues explode one row per failed dimension") {
    val df = Seq((1L, "short")).toDF("doc_id", "text") // fails completeness + language
    val issues = RuleBasedScorer.issues(RuleBasedScorer.score(df, "text"), "doc_id")
      .select("issue_type").as[String].collect().toSet
    assert(issues.contains("completeness"))
    assert(issues.contains("language_quality"))
    assert(!issues.contains("pii"))
  }

  test("provider factory swaps scorers; unknown name fails fast (U2)") {
    val df = Seq((1L, "some reasonably long content with words repeated words")).toDF("doc_id", "text")
    val rule = QualityScorerFactory.create("rule-based").score(df, "text")
    val len = QualityScorerFactory.create("length-only").score(df, "text")
    // both produce the enriched shape; backends differ in the values
    assert(rule.columns.toSet === len.columns.toSet)
    assert(len.select("pii_detection").head.getLong(0) === 100L)
    intercept[IllegalArgumentException] {
      QualityScorerFactory.create("openai")
    }
  }
}
