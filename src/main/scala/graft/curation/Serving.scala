package graft.curation

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions.words
import graft.textanalysis.TextAnalysis

/** The curation gates in SERVING form: every gate a row-local Column
  * over bounded literal artifacts, so the same quality rules run
  * over a document STREAM — no state, no watermark, no stream-side
  * shuffle; each micro-batch is a narrow projection. This is the
  * serving split the rest of the library already uses for models
  * that fit (PQ codebooks, BPE merge tables, IVF centroids): train
  * on the batch corpus, freeze to literals, apply per row.
  *
  * The batch operators ([[Curation.curate]],
  * [[TextAnalysis.lmScoreWith]], …) remain the scale path — the
  * literal LM requires a BOUNDED model (`collectLmLiteral` refuses
  * past `maxEntries`); an unbounded vocabulary belongs to the
  * relational stream-static join, not a literal.
  *
  * `ServingSpec` pins each gate bit-equal to its relational batch
  * twin, and the stream output equal to the batch run of the same
  * gates — the flags can't drift between serving and training.
  */
object Serving {

  /** A frozen bigram LM collapsed to driver-side literals.
    * @param grams    bigram → count (c12)
    * @param contexts first-word → count (c1)
    * @param v        vocabulary size
    */
  final case class LmLiteral(grams: Map[String, Long],
      contexts: Map[String, Long], v: Long)

  /** Collect a [[TextAnalysis.LmModel]] into literal maps, refusing
    * unbounded models: past `maxEntries` grams the literal would
    * stop being a broadcast-sized artifact and the stream-static
    * join path is the right tool.
    */
  def collectLmLiteral(model: TextAnalysis.LmModel,
      maxEntries: Long = 2000000L): LmLiteral = {
    val n = model.grams.count()
    require(n <= maxEntries,
      s"LM has $n grams > maxEntries=$maxEntries: a literal this large " +
        "stops being a serving artifact — score with lmScoreWith instead")
    val grams = model.grams.select(col("bg"), col("c12"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val contexts = model.contexts.select(col("w1"), col("c1"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val v = model.vocab.head().getLong(0)
    LmLiteral(grams, contexts, v)
  }

  /** Benchmark decontamination grams as a sorted literal array. */
  def collectBenchGrams(benchmark: DataFrame, textCol: String = "text",
      n: Int = 2, maxGrams: Long = 2000000L): Seq[String] = {
    val g = benchmark
      .select(explode(graft.dedup.Dedup.shinglesFor(benchmark)(
        col(textCol), n)).as("g"))
      .distinct()
    val cnt = g.count()
    require(cnt <= maxGrams,
      s"benchmark has $cnt grams > maxGrams=$maxGrams")
    g.collect().map(_.getString(0)).toSeq.sorted
  }

  /** Per-row mean bigram NLL against the literal model — the exact
    * integer micro-nat form of [[TextAnalysis.lmScoreWith]], so the
    * two agree bit-for-bit on any document.
    */
  def lmNllLocal(lm: LmLiteral)(ws: Column): Column = {
    val gramMap = typedlit(lm.grams)
    val ctxMap = typedlit(lm.contexts)
    val bg = TextAnalysis.ngrams(ws, 2)
    val terms = transform(bg, b =>
      round(log(
        (coalesce(element_at(ctxMap, substring_index(b, " ", 1)), lit(0L)) +
          lit(lm.v)) /
        (coalesce(element_at(gramMap, b), lit(0L)) + lit(1.0))) * 1e6)
        .cast("long"))
    val s6 = aggregate(terms, lit(0L), (acc, x) => acc + x)
    when(size(bg) > 0, round(s6 / (size(bg) * lit(1e6)), 4))
      .otherwise(lit(0.0))
  }

  /** Per-row contamination fraction against the literal benchmark
    * gram set — the row-local form of
    * [[TextAnalysis.contaminationStats]] (shingle sets are distinct,
    * so the intersect size IS the hit count).
    */
  def contaminationLocal(benchGrams: Seq[String], n: Int = 2)(
      text: Column): Column =
    contaminationLocalWords(benchGrams, n)(
      graft.functions.TextFunctions.words(text))

  /** [[contaminationLocal]] over a pre-split token array — the form
    * [[flagStream]] uses so the shared `__ws` tokenization feeds this
    * gate too instead of re-running `words(text)` inside the shingle
    * build. `contaminationLocal(g)(text)` ≡
    * `contaminationLocalWords(g)(words(text))` by construction.
    */
  def contaminationLocalWords(benchGrams: Seq[String], n: Int = 2)(
      ws: Column): Column = {
    val grams = graft.dedup.Dedup.shinglesOfWords(ws, n)
    when(size(grams) > 0,
      round(size(array_intersect(grams, typedlit(benchGrams))) /
        size(grams), 4))
      .otherwise(lit(0.0))
  }

  /** Per-row DSIR importance log-weight against a frozen ratio
    * literal (the [[graft.selection.Dsir.DsirModel]] artifact) — the
    * serving form of [[graft.selection.Dsir.dsirScore]]'s `dsir_logw`,
    * bit-equal by construction (both run the same micro-nat fold and
    * exact integer readout). A stream filtered on this gate keeps the
    * target-like slice with zero state, zero shuffle — data selection
    * at ingest time instead of as a batch pass.
    */
  def dsirLogwLocal(model: graft.selection.Dsir.DsirModel)(
      ws: Column): Column =
    graft.selection.Dsir.micro4(
      graft.selection.Dsir.score6Local(model)(ws))

  /** One curated row in serving shape — flags carried with the doc. */
  final case class CuratedDoc(doc_id: Long, source: String, text: String,
      repetitive: Boolean, contamination: Double, contaminated: Boolean,
      lm_nll: Double, unusual: Boolean, entropy: Double,
      low_entropy: Boolean)

  /** Flag a document stream (or batch frame — the plan is identical)
    * with every row-local gate. Returns a TYPED Dataset: the typed
    * boundary is load-bearing, not cosmetic — a later `filter` on
    * the flag columns would otherwise be pushed below the projection
    * by alias substitution, re-evaluating the higher-order-function
    * subtrees once per predicate (the documented `flaggedInternal`
    * hazard; batch solves it with an aggregation barrier, serving
    * solves it with the object boundary).
    */
  def flagStream(docs: DataFrame, benchGrams: Seq[String], lm: LmLiteral,
      nllThreshold: Double = 10.0, contaminationThreshold: Double = 0.4,
      entropyThreshold: Double = 2.0, minWords: Int = 20)
      : Dataset[CuratedDoc] = {
    import docs.sparkSession.implicits._
    // tokenize ONCE into an attribute the four gates reference:
    // CollapseProject declines to inline a non-cheap alias used many
    // times, so `__ws` stays a single computed column instead of four
    // independent words(text) subtrees (the flaggedInternal lesson,
    // applied to the serving projection)
    val ws = col("__ws")
    docs
      .select(col("doc_id"), col("source"), col("text"),
        words(col("text")).as("__ws"))
      .select(col("doc_id"), col("source"), col("text"),
        TextAnalysis.repetitiveFlag(ws).as("repetitive"),
        contaminationLocalWords(benchGrams)(ws).as("contamination"),
        lmNllLocal(lm)(ws).as("lm_nll"),
        TextAnalysis.entropyNatsFor(docs)(ws).as("entropy"),
        size(ws).cast("long").as("__nw"))
      .select(col("doc_id"), col("source"), col("text"),
        col("repetitive"),
        col("contamination"),
        (col("contamination") >= contaminationThreshold).as("contaminated"),
        col("lm_nll"),
        (col("lm_nll") >= nllThreshold).as("unusual"),
        col("entropy"),
        (col("__nw") >= minWords && col("entropy") < entropyThreshold)
          .as("low_entropy"))
      .as[CuratedDoc]
  }

  /** The survivors of a flagged stream — typed filter, see
    * [[flagStream]] for why it must be typed.
    */
  def survivors(flagged: Dataset[CuratedDoc]): Dataset[CuratedDoc] =
    flagged.filter(d =>
      !d.repetitive && !d.contaminated && !d.unusual && !d.low_entropy)

  /** One document scored by every frozen-ARTIFACT admission gate —
    * the fused ingest decision's row shape. nb_d6 stays in exact
    * integer micro-nats (the decision the MAP rule thresholds);
    * lm_nll and dsir_logw in their 4-decimal exact readouts.
    */
  final case class AdmissionScores(doc_id: Long, text: String,
      lm_nll: Double, nb_d6: Long, dsir_logw: Double)

  /** Score a batch (or micro-batch — same plan) against THREE frozen
    * artifacts over ONE shared tokenization: the bigram-LM
    * perplexity gate, the learned NB quality gate, and the DSIR
    * importance gate all consume the same `__ws` attribute, so the
    * fused admission pays one `words(text)` pass where running the
    * three gate sinks separately would tokenize (and scan) three
    * times. Typed boundary for the [[flagStream]] reason: an eager
    * filter on the score columns would otherwise be pushed below the
    * projection by alias substitution and re-inline the shared
    * tokenization into every gate subtree.
    */
  def admissionScores(docs: DataFrame, lm: LmLiteral,
      nb: graft.quality.NbClassifier.NbModel,
      dsir: graft.selection.Dsir.DsirModel): Dataset[AdmissionScores] = {
    import docs.sparkSession.implicits._
    val ws = col("__ws")
    docs
      .select(col("doc_id"), col("text"), words(col("text")).as("__ws"))
      .select(col("doc_id"), col("text"),
        lmNllLocal(lm)(ws).as("lm_nll"),
        graft.quality.NbClassifier.decision6Local(nb)(ws).as("nb_d6"),
        dsirLogwLocal(dsir)(ws).as("dsir_logw"))
      .as[AdmissionScores]
  }

  /** The fused admission decision: a document enters the corpus only
    * if it clears ALL gates — familiar perplexity (lm_nll below the
    * threshold), learned quality (NB decision above the threshold;
    * 0 = the MAP rule), and target-likeness (DSIR log-weight at
    * least `minLogw`). Typed filter (see [[admissionScores]]).
    */
  def admit(scored: Dataset[AdmissionScores], nllThreshold: Double = 10.0,
      nbThreshold6: Long = 0L, minLogw: Double = 0.0)
      : Dataset[AdmissionScores] =
    scored.filter(a => a.lm_nll < nllThreshold &&
      a.nb_d6 > nbThreshold6 && a.dsir_logw >= minLogw)
}
