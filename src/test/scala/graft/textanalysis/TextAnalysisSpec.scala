package graft.textanalysis

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}
import graft.dedup.Dedup

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("token counts: whitespace vs bpe-ish vs estimate") {
    val df = Seq((1L, "hello world, it's 42 degrees!")).toDF("doc_id", "text")
    val r = df.select(
      TextAnalysis.tokenCount($"text"),
      TextAnalysis.bpeishTokenCount($"text"),
      TextAnalysis.estimatedLlmTokens($"text")).head
    assert(r.getLong(0) === 5)
    // hello|world|,|it|'|s|42|degrees|! = 9
    assert(r.getLong(1) === 9)
    assert(r.getLong(2) === math.ceil(29 / 4.0).toLong)
  }

  test("language detection picks the profile with most hits") {
    val df = Seq(
      (1L, "the cat and the dog is a friend of mine"),
      (2L, "le chat et la maison des amis les voisins"),
      (3L, "der hund und die katze das ist gut"),
      (4L, "xyzzy plugh qwerty")
    ).toDF("doc_id", "text")
    val langs = df.select($"doc_id", TextAnalysis.detectLang($"text").as("l"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(langs(1L) === "en")
    assert(langs(2L) === "fr")
    assert(langs(3L) === "de")
    assert(langs(4L) === "und")
  }

  test("rolling hash: deterministic, order-sensitive, bounded") {
    val df = Seq((1L, "abc"), (2L, "acb"), (3L, "abc")).toDF("doc_id", "text")
    val h = df.select(TextAnalysis.rollingHash($"text")).collect().map(_.getLong(0))
    assert(h(0) === h(2))
    assert(h(0) !== h(1)) // order matters — not a bag hash
    assert(h.forall(v => v >= 0 && v < TextAnalysis.FpMod))
    // matches the direct fold
    val expected = "abc".foldLeft(0L)((acc, c) => (acc * 31 + c.toLong) % TextAnalysis.FpMod)
    assert(h(0) === expected)
  }

  test("bottom-k sketch overlap tracks similarity") {
    val a = Dedup.shingles(lit("the quick brown fox jumps over the lazy dog"), 2)
    val b = Dedup.shingles(lit("the quick brown fox jumps over the lazy cat"), 2)
    val c = Dedup.shingles(lit("entirely different words in this sentence here"), 2)
    val r = spark.range(1).select(
      TextAnalysis.bottomKSketch(a, 4).as("sa"),
      TextAnalysis.bottomKSketch(b, 4).as("sb"),
      TextAnalysis.bottomKSketch(c, 4).as("sc")).head
    val (sa, sb, sc) = (r.getSeq[Long](0).toSet, r.getSeq[Long](1).toSet, r.getSeq[Long](2).toSet)
    assert(sa.intersect(sb).size > sa.intersect(sc).size)
  }

  test("corpus stats partition the corpus") {
    val docs = Tables.documents(spark, sfDir)
    val stats = TextAnalysis.corpusStats(docs).collect()
    assert(stats.map(_.getAs[Long]("n_docs")).sum === docs.count())
    stats.foreach(r => assert(r.getAs[Long]("min_chars") <= r.getAs[Long]("max_chars")))
  }

  test("repetition stats: hand-computed fractions and the length gate") {
    val docs = Seq(
      // ws=("a b")×10: 20 words, 2 distinct → dup_word 0.9; bg: 19
      // slots, 2 distinct ("a b"×10, "b a"×9) → dup_bigram
      // 1-2/19=0.8947, top 10/19=0.5263; tg: 18 slots, 2 distinct →
      // dup_trigram 1-2/18=0.8889 — flagged on both criteria
      (1L, "a b a b a b a b a b a b a b a b a b a b"),
      // all-unique 4-word doc: top_bigram_frac 1/3 but UNDER the
      // length gate → never flagged
      (2L, "p q r s"),
      // 20 unique words: every dup fraction 0, top 1/19 → clean
      (3L, "a b c d e f g h i j k l m n o p q r s t")
    ).toDF("doc_id", "text")
    val r = TextAnalysis.repetitionStats(docs).collect()
      .map(x => x.getAs[Long]("doc_id") -> x).toMap
    assert(r(1L).getAs[Double]("dup_word_frac") === 0.9)
    assert(r(1L).getAs[Double]("dup_bigram_frac") === 0.8947)
    assert(r(1L).getAs[Double]("top_bigram_frac") === 0.5263)
    assert(r(1L).getAs[Double]("dup_trigram_frac") === 0.8889)
    assert(r(1L).getAs[Boolean]("repetitive"))
    assert(r(2L).getAs[Double]("top_bigram_frac") === 0.3333)
    assert(!r(2L).getAs[Boolean]("repetitive"))
    assert(r(3L).getAs[Double]("dup_word_frac") === 0.0)
    assert(r(3L).getAs[Double]("top_bigram_frac") === 0.0526)
    assert(!r(3L).getAs[Boolean]("repetitive"))
  }

  test("maxMultiplicity: run-length fold equals brute-force mode count") {
    val arrs = Seq(
      Seq("a", "a", "a", "b", "c"), Seq("x"), Seq[String](),
      Seq("m", "n", "m", "n", "m", "q", "q", "q", "q"))
    val df = arrs.zipWithIndex.map { case (a, i) => (i.toLong, a) }.toDF("id", "arr")
    val got = df.select($"id",
      TextAnalysis.maxMultiplicity(array_sort($"arr")).as("m"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    arrs.zipWithIndex.foreach { case (a, i) =>
      val want = if (a.isEmpty) 0L
        else a.groupBy(identity).values.map(_.size).max.toLong
      assert(got(i.toLong) === want, s"arr $a")
    }
  }

  test("decontamination: copies flag, disjoint docs score zero") {
    val benchmark = Seq((100L, "the quick brown fox jumps high")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "the quick brown fox jumps high"),     // exact copy → 1.0
      (2L, "the quick brown cat sleeps"),          // shares 2 of 4 bigrams
      (3L, "entirely different words here now")    // disjoint → 0.0
    ).toDF("doc_id", "text")
    val r = TextAnalysis.contaminationStats(corpus, benchmark, "doc_id", "text")
      .collect().map(x => x.getAs[Long]("doc_id") -> x).toMap
    assert(r(1L).getAs[Double]("contamination") === 1.0)
    assert(r(1L).getAs[Boolean]("contaminated"))
    assert(r(2L).getAs[Double]("contamination") === 0.5)
    assert(r(2L).getAs[Boolean]("contaminated"))
    assert(r(3L).getAs[Double]("contamination") === 0.0)
    assert(!r(3L).getAs[Boolean]("contaminated"))
    // totals are per-doc distinct bigram counts
    assert(r(2L).getAs[Long]("n_grams") === 4)
    assert(r(2L).getAs[Long]("n_hits") === 2)
  }

  test("decontamination keeps zero-gram docs with zero contamination") {
    val benchmark = Seq((100L, "a b c")).toDF("doc_id", "text")
    val corpus = Seq((1L, "solo")).toDF("doc_id", "text") // < 2 words → no bigrams
    val r = TextAnalysis.contaminationStats(corpus, benchmark, "doc_id", "text").head
    assert(r.getAs[Long]("n_grams") === 0)
    assert(r.getAs[Double]("contamination") === 0.0)
    assert(!r.getAs[Boolean]("contaminated"))
  }

  test("sequence packing: blocks chunk each shard's token stream in order") {
    import spark.implicits._
    // tokens: 3,3,3 with budget 5 in one shard → starts at 0,3,6 →
    // blocks 0,0,1 (doc 2 starts inside block 0, straddles boundary)
    val docs = Seq(
      (0L, "a b c"), (8L, "d e f"), (16L, "g h i")
    ).toDF("doc_id", "text") // all ≡ 0 mod 8 → same shard
    val packed = TextAnalysis.packSequences(docs, "doc_id",
      TextAnalysis.tokenCount($"text"), budget = 5, nShards = 8)
      .select("doc_id", "shard", "block")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(packed.toSet === Set((0L, 0, 0L), (8L, 0, 0L), (16L, 0, 1L)))
  }

  test("sequence packing covers every doc exactly once, shard-parallel") {
    val docs = Tables.documents(spark, sfDir)
    val packed = TextAnalysis.packSequences(docs, "doc_id",
      TextAnalysis.tokenCount(col("text")), budget = 512, nShards = 8)
    assert(packed.count() === docs.count())
    assert(packed.select("doc_id").distinct().count() === docs.count())
    // block ids are contiguous from 0 within every shard
    val gaps = packed.groupBy("shard").agg(
      max(col("block")).as("mx"),
      countDistinct(col("block")).as("nb"))
      .filter(col("mx") =!= col("nb") - 1)
    assert(gaps.count() === 0)
  }
}
