package graft.curation

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}
import graft.textanalysis.TextAnalysis

class ServingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.documents(spark, sfDir)
    .select("doc_id", "source", "text").limit(150).cache()
  private lazy val bench = docs.filter(col("doc_id") % 101 === 7)
  private lazy val corpus = docs.filter(col("doc_id") % 101 =!= 7)
  private lazy val lm = Serving.collectLmLiteral(TextAnalysis.lmTrain(corpus))
  private lazy val benchGrams = Serving.collectBenchGrams(bench)
  private lazy val flagged = Serving.flagStream(corpus, benchGrams, lm)
    .collect().map(d => d.doc_id -> d).toMap

  test("serving lm gate ≡ relational lmScoreWith, bit-for-bit") {
    val batch = TextAnalysis.lmScoreWith(
        TextAnalysis.lmTrain(corpus), corpus)
      .select($"doc_id", $"lm_nll", $"unusual")
      .as[(Long, Double, Boolean)].collect()
    assert(batch.nonEmpty)
    batch.foreach { case (id, nll, unusual) =>
      assert(flagged(id).lm_nll === nll, s"doc $id")
      assert(flagged(id).unusual === unusual, s"doc $id")
    }
  }

  test("serving contamination gate ≡ relational contaminationStats") {
    val batch = TextAnalysis.contaminationStats(corpus, bench,
        "doc_id", "text")
      .select($"doc_id", $"contamination", $"contaminated")
      .as[(Long, Double, Boolean)].collect()
    // the planted bench slice comes from the same corpus family, so
    // SOME doc must actually register contamination > 0 for this
    // equivalence to mean anything
    assert(batch.exists(_._2 > 0))
    batch.foreach { case (id, c, flag) =>
      assert(flagged(id).contamination === c, s"doc $id")
      assert(flagged(id).contaminated === flag, s"doc $id")
    }
  }

  test("serving repetition and entropy gates ≡ their batch operators") {
    val rep = TextAnalysis.repetitionStats(corpus)
      .select($"doc_id", $"repetitive").as[(Long, Boolean)].collect()
    rep.foreach { case (id, r) =>
      assert(flagged(id).repetitive === r, s"doc $id") }
    val ent = TextAnalysis.tokenEntropy(corpus)
      .select($"doc_id", $"entropy", $"low_entropy")
      .as[(Long, Double, Boolean)].collect()
    ent.foreach { case (id, e, low) =>
      assert(flagged(id).entropy === e, s"doc $id")
      assert(flagged(id).low_entropy === low, s"doc $id")
    }
  }

  test("streamed gates ≡ batch gates over micro-batches, survivors filter typed") {
    implicit val sqlCtx = spark.sqlContext
    val rows = corpus.as[(Long, String, String)].collect().toSeq
    val (b1, b2) = rows.splitAt(rows.length / 2)
    val mem = MemoryStream[(Long, String, String)]
    val q = Serving.survivors(Serving.flagStream(
        mem.toDF().toDF("doc_id", "source", "text"), benchGrams, lm))
      .writeStream.format("memory").queryName("curated_out")
      .outputMode("append").start()
    mem.addData(b1); q.processAllAvailable()
    mem.addData(b2); q.processAllAvailable(); q.stop()
    val streamed = spark.table("curated_out")
      .select($"doc_id").as[Long].collect().toSet
    val batch = Serving.survivors(
        Serving.flagStream(corpus, benchGrams, lm))
      .collect().map(_.doc_id).toSet
    assert(streamed === batch)
    assert(batch.nonEmpty && batch.size < rows.size,
      s"survivors ${batch.size} of ${rows.size}: gates should bind")
  }

  test("serving gates + exact dedup ≡ the independent batch curate() pipeline") {
    // entropyThreshold=0 disables the serving-only entropy gate
    // (entropy ≥ 0 always), leaving exactly curate()'s gate set; the
    // min-id exact dedup is curate()'s final stage, applied here to
    // the serving survivors. Two independently built pipelines —
    // relational gates behind an aggregation barrier vs row-local
    // literal gates behind a typed boundary — must keep the same docs.
    val servingPass = Serving.survivors(Serving.flagStream(
        corpus, benchGrams, lm, entropyThreshold = 0.0))
      .toDF()
    val servingKept = servingPass
      .groupBy(graft.dedup.Dedup.rowDigest(Seq("text")).as("__dk"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id")).as[Long].collect().toSet
    val batchKept = Curation.curate(corpus, bench)
      .select(col("doc_id")).as[Long].collect().toSet
    assert(servingKept === batchKept)
    assert(batchKept.nonEmpty)
  }

  test("serving dsir gate ≡ batch dsirScore, and streams stateless") {
    import graft.selection.Dsir
    val full = Tables.documents(spark, sfDir)
    val model = Dsir.dsirTrainWith(full, col("lang") === "en", 64)
    // row-local gate equals the batch operator's readout per doc
    val batch = Dsir.dsirScore(full, model)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val local = full.select(col("doc_id"),
        Serving.dsirLogwLocal(model)(
          graft.functions.TextFunctions.words(col("text"))).as("w"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(local === batch)
    // and over a MemoryStream: same scores, no state store
    implicit val sqlCtx = spark.sqlContext
    val rows = full.select("doc_id", "text").limit(60)
      .as[(Long, String)].collect().toSeq
    val mem = MemoryStream[(Long, String)]
    val q = mem.toDF().toDF("doc_id", "text")
      .select(col("doc_id"), Serving.dsirLogwLocal(model)(
        graft.functions.TextFunctions.words(col("text"))).as("w"))
      .writeStream.format("memory").queryName("dsir_out")
      .outputMode("append").start()
    mem.addData(rows); q.processAllAvailable(); q.stop()
    val streamed = spark.table("dsir_out")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(streamed === rows.map { case (id, _) => id -> batch(id) }.toMap)
  }

  test("collectLmLiteral refuses an unbounded model") {
    intercept[IllegalArgumentException] {
      Serving.collectLmLiteral(TextAnalysis.lmTrain(corpus), maxEntries = 1)
    }
  }
}
