package graft.curation

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.functions.TextFunctions.words
import graft.textanalysis.TextAnalysis

/** End-to-end training-corpus curation: the full gate sequence a
  * 100 TB crawl passes through before packing — each stage keeps the
  * semantics of its already-oracled standalone operator
  * ([[TextAnalysis.repetitionStats]], [[TextAnalysis.contaminationStats]],
  * [[TextAnalysis.lmScore]], [[Dedup.dropExactDuplicates]]), composed
  * here into the one call a pipeline owner actually runs.
  *
  *   raw corpus ─ repetition gate (Gopher filters)
  *              ─ decontamination gate (benchmark n-gram overlap)
  *              ─ LM-quality gate (corpus-trained bigram nll)
  *              ─ exact dedup (min-id survivor per text)
  *
  * Scale shape — the fused form: the corpus is read exactly TWICE.
  * Scan 1 is the narrow per-document pass (text kept for the final
  * dedup key, the repetition gate inlined — it is pure row-local
  * array math, so it needs neither a metric frame nor a join). Scan 2
  * is THE tokenization pass: tagged unigrams (LM vocabulary) and
  * bigrams (LM model, contamination, scoring) explode once,
  * pre-aggregate to (doc_id, kind, gram, cnt), and materialize via
  * localCheckpoint; model training, the vocabulary scalar,
  * contamination hits, and per-document scoring all read that
  * artifact instead of re-exploding text. The final exact dedup is a
  * group-winner aggregation on the 16-byte text digest (the min
  * struct IS the surviving row, cf. [[Dedup.segmentWinners]]), so the
  * gated subtree is evaluated once — no join-back, no second pass.
  * Output is deliberately UNORDERED: a corpus-wide orderBy here would
  * charge every caller a range-partitioning shuffle + global sort for
  * presentation only; callers sort at the query edge.
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
    // benchmark gram set — tiny vs the corpus, explicitly broadcast
    // (identical to contaminationStats's bench side)
    val benchGrams = benchmark
      .select(explode(Dedup.shingles(col("text"), 2)).as("bg"))
      .distinct()
      .withColumn("__hit", lit(1L))

    // corpus scan 1 of 2: the narrow per-doc pass; repetition gate
    // inlined (same rounded expressions as repetitionStats)
    val base = documents.select(
      col("doc_id"), col("source"), col("text"),
      TextAnalysis.repetitiveFlag(words(col("text"))).as("repetitive"))

    // corpus scan 2 of 2: the one tokenization pass, materialized.
    // kind 1 = unigram (vocabulary), kind 2 = bigram; cnt keeps the
    // multiplicity the LM mean weights by, while the rows themselves
    // are the per-doc DISTINCT grams contamination counts.
    val ws = words(col("text"))
    val tagged = concat(
      transform(ws, w => struct(lit(1).as("kind"), w.as("gram"))),
      transform(TextAnalysis.ngrams(ws, 2),
        g => struct(lit(2).as("kind"), g.as("gram"))))
    val tokens = documents
      .select(col("doc_id"), explode(tagged).as("t"))
      .select(col("doc_id"), col("t.kind").as("kind"), col("t.gram").as("gram"))
      .groupBy(col("doc_id"), col("kind"), col("gram"))
      .agg(count(lit(1)).as("cnt"))
      .localCheckpoint()

    val bg = tokens.filter(col("kind") === 2)
      .select(col("doc_id"), col("gram").as("bg"), col("cnt"))
    // the corpus-trained bigram LM, derived from the token artifact —
    // identical counts to TextAnalysis.lmTrain on the same corpus
    val mGrams = bg.groupBy(col("bg")).agg(sum(col("cnt")).as("c12"))
      .withColumn("w1", substring_index(col("bg"), " ", 1))
    val mContexts = mGrams.groupBy(col("w1")).agg(sum(col("c12")).as("c1"))
    val mVocab = tokens.filter(col("kind") === 1)
      .agg(count_distinct(col("gram")).as("v"))

    // contamination + LM scoring fused over the one bigram frame
    // (same nll6 integer micro-nat contract as lmScoreWith)
    val gateMetrics = bg
      .join(mGrams.select(col("bg"), col("c12")), Seq("bg"), "left")
      .withColumn("w1", substring_index(col("bg"), " ", 1))
      .join(mContexts, Seq("w1"), "left")
      .crossJoin(broadcast(mVocab))
      .join(broadcast(benchGrams), Seq("bg"), "left")
      .withColumn("nll6",
        round(log((coalesce(col("c1"), lit(0L)) + col("v")) /
          (coalesce(col("c12"), lit(0L)) + lit(1.0))) * 1e6).cast("long"))
      .groupBy(col("doc_id"))
      .agg(
        sum(col("cnt")).as("n_bigrams"),
        sum(col("cnt") * col("nll6")).as("__s6"),
        count(lit(1)).as("n_grams"),
        sum(coalesce(col("__hit"), lit(0L))).as("n_hits"))
      .select(
        col("doc_id"),
        round(col("__s6") / (col("n_bigrams") * lit(1e6)), 4).as("lm_nll"),
        round(col("n_hits") / col("n_grams"), 4).as("contamination"))

    val obs = org.apache.spark.sql.Observation()
    val gated = base
      .join(gateMetrics, Seq("doc_id"), "left")
      // docs with <2 words have no bigram rows: lm_nll/contamination
      // default to 0.0 exactly as the standalone operators' explode_outer
      .withColumn("lm_nll", coalesce(col("lm_nll"), lit(0.0)))
      .withColumn("contaminated",
        coalesce(col("contamination"), lit(0.0)) >= contaminationThreshold)
      .withColumn("unusual", col("lm_nll") >= nllThreshold)
      .observe(obs,
        count(lit(1)).as("docs_in"),
        sum(col("repetitive").cast("long")).as("dropped_repetitive"),
        sum(col("contaminated").cast("long")).as("dropped_contaminated"),
        sum(col("unusual").cast("long")).as("dropped_unusual"))
      .filter(!col("repetitive") && !col("contaminated") && !col("unusual"))

    // exact dedup, min-id survivor, group-winner form: one shuffle on
    // the null-safe 16-byte digest, no join-back (the gated subtree —
    // and with it the corpus scan — is evaluated exactly once)
    val out = gated
      .groupBy(Dedup.rowDigest(Seq("text")).as("__dk"))
      .agg(min(struct(col("doc_id"), col("source"), col("lm_nll"))).as("__w"))
      .select(col("__w.doc_id").as("doc_id"), col("__w.source").as("source"),
        col("__w.lm_nll").as("lm_nll"))
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
    * shuffles, and the join is the only exchange per side. The diff
    * frame is corpus-sized, so output is UNORDERED (callers who need
    * presentation order sort at the query edge — an operator-level
    * orderBy would add a global sort per call).
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
  }
}
