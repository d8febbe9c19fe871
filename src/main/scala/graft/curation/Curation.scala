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
  * the final text-keyed dedup, whose join-back is md5-bounded. The
  * corpus is scanned once per metric (three passes) — deliberate:
  * each gate stays the standalone, individually-oracled operator. A
  * fused single-explode variant (contamination and LM share the
  * bigram explode) would save one pass at the cost of that
  * composability; build it only if a profile shows the scan bound.
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
      contaminationThreshold: Double = 0.4): DataFrame =
    curateObserved(documents, benchmark, nllThreshold,
      contaminationThreshold)._1

  /** [[curate]] with per-gate drop telemetry riding the SAME job via
    * `Dataset.observe` — no second pass, no extra action: whenever
    * the returned frame executes, the observation fills with how many
    * documents each gate rejected (a doc can trip several gates; the
    * counts are per-gate, not disjoint). This is the operational
    * readout a 100 TB curation run needs — "the LM gate suddenly
    * drops 40%" is a data incident, and it should cost zero extra
    * cluster time to see.
    */
  def curateObserved(documents: DataFrame, benchmark: DataFrame,
      nllThreshold: Double = 10.0,
      contaminationThreshold: Double = 0.4)
      : (DataFrame, org.apache.spark.sql.Observation) = {
    val rep = TextAnalysis.repetitionStats(documents)
      .select(col("doc_id"), col("repetitive"))
    val con = TextAnalysis.contaminationStats(documents, benchmark,
        "doc_id", "text", threshold = contaminationThreshold)
      .select(col("doc_id"), col("contaminated"))
    val lm = TextAnalysis.lmScore(documents, nllThreshold)
      .select(col("doc_id"), col("lm_nll"), col("unusual"))
    val obs = org.apache.spark.sql.Observation()
    val gated = documents
      .join(rep, "doc_id")
      .join(con, "doc_id")
      .join(lm, "doc_id")
      .observe(obs,
        count(lit(1)).as("docs_in"),
        sum(col("repetitive").cast("long")).as("dropped_repetitive"),
        sum(col("contaminated").cast("long")).as("dropped_contaminated"),
        sum(col("unusual").cast("long")).as("dropped_unusual"))
      .filter(!col("repetitive") && !col("contaminated") && !col("unusual"))
    val out = Dedup.dropExactDuplicates(gated, "doc_id", Seq("text"))
      .select(col("doc_id"), col("source"), col("lm_nll"))
      .orderBy(col("doc_id"))
    (out, obs)
  }

  /** Snapshot diff between two corpus versions keyed on `idCol`: one
    * row per id present in either side, with status `added` (new
    * side only), `removed` (old side only), `changed` (both sides,
    * different content), or `unchanged`. The dataset-versioning
    * readout of iterative corpus construction — "what did this
    * curation change actually do" as a relational result. Content
    * equality uses the same null-safe JSON-struct digest as exact
    * dedup ([[graft.dedup.Dedup.exactDuplicateGroups]]).
    *
    * Scale shape: each side reduces to (id, 16-byte digest) narrowly
    * before the single full-outer join on the id — text never
    * shuffles, and the join is the only exchange per side.
    */
  def corpusDiff(oldCorpus: DataFrame, newCorpus: DataFrame,
      idCol: String, contentCols: Seq[String]): DataFrame = {
    def digested(df: DataFrame, as: String) =
      df.select(col(idCol), Dedup.rowDigest(contentCols).as(as))
    digested(oldCorpus, "__old")
      .join(digested(newCorpus, "__new"), Seq(idCol), "full_outer")
      .withColumn("status",
        when(col("__old").isNull, "added")
          .when(col("__new").isNull, "removed")
          .when(col("__old") =!= col("__new"), "changed")
          .otherwise("unchanged"))
      .select(col(idCol), col("status"))
      .orderBy(col(idCol))
  }
}
