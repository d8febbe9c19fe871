package graft.curation

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.textanalysis.TextAnalysis

/** End-to-end training-corpus curation: the full gate sequence a
  * 100 TB crawl passes through before packing — each stage is an
  * already-oracled operator, composed here into the one call a
  * pipeline owner actually runs.
  *
  *   raw corpus ─ repetition gate (Gopher filters)
  *              ─ decontamination gate (benchmark n-gram overlap)
  *              ─ LM-quality gate (corpus-trained bigram nll)
  *              ─ exact dedup (min-id survivor per text)
  *
  * Scale shape: the three metric frames each aggregate on the doc id
  * (the repetition gate is narrow until its join), so the gate joins
  * co-partition on one key; no stage shuffles document text except
  * the final text-keyed dedup, whose join-back is md5-bounded. Gate
  * ORDER is free (they commute — each reads the raw corpus), so the
  * optimizer can collapse the three metric scans into shared stages.
  */
object Curation {

  /** Curate `documents` against a held-out `benchmark`: survivors of
    * all three quality gates, exact-deduped (min doc_id kept per
    * identical text), with the LM score retained for downstream
    * curriculum use. Gate thresholds are the operators' documented
    * defaults.
    */
  def curate(documents: DataFrame, benchmark: DataFrame,
      nllThreshold: Double = 10.0,
      contaminationThreshold: Double = 0.4): DataFrame = {
    val rep = TextAnalysis.repetitionStats(documents)
      .select(col("doc_id"), col("repetitive"))
    val con = TextAnalysis.contaminationStats(documents, benchmark,
        "doc_id", "text", threshold = contaminationThreshold)
      .select(col("doc_id"), col("contaminated"))
    val lm = TextAnalysis.lmScore(documents, nllThreshold)
      .select(col("doc_id"), col("lm_nll"), col("unusual"))
    val gated = documents
      .join(rep, "doc_id")
      .join(con, "doc_id")
      .join(lm, "doc_id")
      .filter(!col("repetitive") && !col("contaminated") && !col("unusual"))
    Dedup.dropExactDuplicates(gated, "doc_id", Seq("text"))
      .select(col("doc_id"), col("source"), col("lm_nll"))
      .orderBy(col("doc_id"))
  }
}
