package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.words

/** Deterministic search — the engine's replacement for the
  * reference's Elasticsearch query (services/search/app/main.py:72-147:
  * multi_match over title^2 + created_by with fuzziness AUTO, term
  * filters, range filter, sort by score desc/created_at desc,
  * pagination, highlight, hits.total).
  *
  * ES BM25 is not reproducible bit-for-bit, so scoring is a documented
  * deterministic rubric (SURVEY §7.5.2): title hits count double
  * (the reference's `title^2` boost, search/main.py:94), body hits
  * count once, ties broken by doc_id for stable pages.
  *
  * Scale: filters + scoring are narrow and codegen'd; ranking is
  * `orderBy(...).limit(k)` = TakeOrdered (per-partition heaps + one
  * merge of k·partitions rows — no global sort, no full shuffle).
  * The reference caps pages at 100 (search/main.py:80), so k stays
  * tiny no matter the corpus size; a 100 TB corpus ranks with one
  * pass and O(k) driver memory.
  */
object SearchOps {

  /** Occurrences of `q` inside `c` — length-delta trick, exact
    * arithmetic in both engines.
    */
  def occurrences(c: Column, q: String): Column =
    ((length(c) - length(replace(c, lit(q), lit("")))) / q.length).cast("long")

  /** The reference's fuzziness AUTO: 0 edits below 3 chars, 1 edit
    * for 3-5, 2 edits above (ES semantics, search/main.py:96).
    */
  def autoFuzziness(q: String): Int =
    if (q.length < 3) 0 else if (q.length <= 5) 1 else 2

  /** Fuzzy token hits: tokens of `c` within `maxEdits` of `q`. */
  def fuzzyHits(c: Column, q: String, maxEdits: Int): Column =
    size(filter(words(c), w => levenshtein(w, lit(q)) <= maxEdits)).cast("long")

  /** Relevance score: 2×title-field hits + body hits. A null field
    * counts zero hits instead of nulling the whole score — the
    * reference's multi_match still matches on whichever fields are
    * present.
    */
  def score(title: Column, body: Column, q: String): Column =
    coalesce(occurrences(title, q), lit(0L)) * 2 +
      coalesce(occurrences(body, q), lit(0L))

  def fuzzyScore(title: Column, body: Column, q: String): Column = {
    val k = autoFuzziness(q)
    coalesce(fuzzyHits(title, q, k), lit(0L)) * 2 +
      coalesce(fuzzyHits(body, q, k), lit(0L))
  }

  /** Full search: filters (P5/P6) → must-match scoring → total (A5)
    * → top-k page (W1/W2). `title` = source, `body` = text on the
    * driver documents table.
    */
  def search(documents: DataFrame, q: String,
      lang: Option[String] = None, minChars: Option[Long] = None,
      fuzzy: Boolean = false, from: Int = 0, size: Int = 10): DataFrame =
    searchManaged(documents, q, lang, minChars, fuzzy, from, size).df

  /** Managed-lifecycle variant: the persisted match set feeding both
    * the count pass and the page pass is released via the returned
    * handle (see [[graft.Managed]]); the plain variant leaves it to
    * session-level cleanup, which suits one-shot jobs only.
    */
  def searchManaged(documents: DataFrame, q: String,
      lang: Option[String] = None, minChars: Option[Long] = None,
      fuzzy: Boolean = false, from: Int = 0, size: Int = 10): graft.Managed = {
    // an empty query would divide by q.length=0 in occurrences():
    // NULL scores non-ANSI, DIVIDE_BY_ZERO under ANSI — reject early
    require(q.nonEmpty, "search query must be non-empty")
    val filtered = Seq(
      lang.map(l => col("lang") === l),
      minChars.map(m => col("n_chars") >= m)
    ).flatten.foldLeft(documents)((df, p) => df.filter(p))
    val scoreCol =
      if (fuzzy) fuzzyScore(col("source"), col("text"), q)
      else score(col("source"), col("text"), q)
    val matches = filtered
      .withColumn("score", scoreCol)
      .filter(col("score") > 0)
      .persist() // feeds both the count pass and the page pass
    val result = matches
      .crossJoin(broadcast(totalHits(matches)))
      .select(col("doc_id"), col("lang"), col("n_chars"), col("score"),
        col("total_hits"))
      .orderBy(col("score").desc, col("doc_id"))
      .offset(from)
      .limit(size)
    new graft.Managed(result, Seq(matches))
  }

  /** A5: hits.total as a broadcast 1-row aggregate. An empty-window
    * count (`count().over(Window.partitionBy())`) would funnel every
    * matching row through one partition; a parallel count + broadcast
    * cross join costs a second (parallel) pass instead and keeps the
    * per-row path shuffle-free.
    */
  private def totalHits(matches: DataFrame): DataFrame =
    matches.groupBy().agg(count(lit(1)).as("total_hits"))

  /** The reference's full GET /search semantics over the ENRICHED
    * corpus (search/app/main.py:100-109): text match + quality-score
    * range filter (P6) + PII exclusion (P5) + top-k page + total.
    * Runs against the quality pipeline's output — the engine's
    * equivalent of querying the ES index the pipeline maintains.
    */
  def searchEnriched(enriched: DataFrame, q: String,
      minQualityScore: Double, excludePii: Boolean,
      from: Int = 0, size: Int = 10): DataFrame =
    searchEnrichedManaged(enriched, q, minQualityScore, excludePii,
      from, size).df

  /** Managed-lifecycle variant — see `searchManaged`. */
  def searchEnrichedManaged(enriched: DataFrame, q: String,
      minQualityScore: Double, excludePii: Boolean,
      from: Int = 0, size: Int = 10): graft.Managed = {
    require(q.nonEmpty, "search query must be non-empty")
    val base = enriched
      .filter(col("quality_score") >= minQualityScore)
    val piiFiltered = if (excludePii) base.filter(!col("has_pii")) else base
    val matches = piiFiltered
      .withColumn("score", score(col("source"), col("text"), q))
      .filter(col("score") > 0)
      .persist() // the enrichment upstream is expensive — compute once
    val result = matches
      .crossJoin(broadcast(totalHits(matches)))
      .select(col("doc_id"), col("quality_score"), col("score"),
        col("total_hits"))
      .orderBy(col("score").desc, col("doc_id"))
      .offset(from)
      .limit(size)
    new graft.Managed(result, Seq(matches))
  }

  /** BM25 ranked search (Robertson–Spärck Jones; the scoring function
    * behind the reference's Elasticsearch ranking) — offered as a
    * first-class alternative to the deterministic rubric above. The
    * whole computation is exact relational algebra, so unlike ES's
    * shard-local statistics it IS reproducible bit-for-bit:
    *
    *   score(D,Q) = Σ_t idf(t) · tf(t,D)·(k1+1)
    *                        / (tf(t,D) + k1·(1 − b + b·|D|/avgdl))
    *   idf(t)     = ln((N − df(t) + ½)/(df(t) + ½) + 1)
    *
    * Scale shape: the corpus pass explodes tokens but filters to the
    * QUERY terms before any shuffle, so the aggregated state is
    * O(matching docs × query terms). Document frequencies and the
    * (N, avgdl) scalars are broadcast; ranking is TakeOrdered. idf is
    * rounded to 6 places on both engines before the product (ln is
    * libm-dependent in its last ulp), the final score to 4.
    *
    * This one-shot form re-tokenizes the corpus per call — right for
    * a single ad-hoc query, wrong as a serving path. Serving goes
    * through [[writeBm25Index]] + [[searchBm25FromIndex]], which pay
    * the corpus pass once.
    */
  def searchBm25(documents: DataFrame, queryTerms: Seq[String], k: Int,
      k1: Double = 1.2, b: Double = 0.75, from: Int = 0): DataFrame = {
    require(queryTerms.nonEmpty, "BM25 needs at least one query term")
    val base = documents
      .select(col("doc_id"), words(col("text")).as("__ws"))
      .withColumn("dl", size(col("__ws")))
    val stats = base.agg(count(lit(1)).as("n_docs"), avg(col("dl")).as("avgdl"))
    val tf = base
      .select(col("doc_id"), col("dl"), explode(col("__ws")).as("term"))
      .filter(col("term").isin(queryTerms: _*))
      .groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    scoreBm25(tf, dfreq, stats, k, k1, b, from)
  }

  /** Number of term-hash partitions in a written BM25 index — the
    * pruning granularity: a query reads ~|terms|/`Bm25Buckets` of the
    * postings directories. 64 keeps directories coarse enough that a
    * small corpus doesn't fragment into thousands of tiny files while
    * a 100 TB corpus still prunes ~98% of the index per term.
    */
  val Bm25Buckets = 64

  /** The term→partition assignment, computed identically on the
    * executor (write side, Spark md5 over the term column) and the
    * driver (probe side, [[termBucket]] over the query literals) — 15
    * hex chars = 60 bits, exact in a long on both sides.
    */
  private[graft] def termBucketCol(term: Column): Column =
    pmod(conv(substring(md5(term), 1, 15), 16, 10).cast("long"),
      lit(Bm25Buckets.toLong))

  private[graft] def termBucket(term: String): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(term.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val h = java.lang.Long.parseLong(hex.substring(0, 15), 16)
    ((h % Bm25Buckets) + Bm25Buckets) % Bm25Buckets
  }

  /** Build-once BM25 term-statistics index: [[searchBm25]] recomputes
    * the corpus pass (tokenize → explode → tf/df aggregation) on
    * EVERY call, which is the right one-shot shape but the wrong
    * serving shape — at 100 TB the tokenize pass costs more than the
    * query. This writes the classic inverted-file artifact instead:
    *
    *   `path/postings/bucket=H/` — (term, doc_id, tf, dl) rows,
    *     partitioned by the term-hash bucket so a query's literal
    *     bucket IN-list prunes to |query terms| directories
    *     (the IVF/PQ index pattern applied to text);
    *   `path/stats/` — the one-row (n_docs, avgdl) corpus scalars.
    *
    * Document frequencies need no separate table: after pruning, the
    * per-term posting count IS df, already in the rows being read.
    * One corpus tokenize pays for every subsequent query.
    */
  /** Doc-axis bucket count for the per-document length sidecar
    * (`path/doclens`) — what lets a DELETE read only its ids'
    * directories instead of scanning the index.
    */
  val DoclenBuckets = 64

  private[graft] def docBucketCol(c: Column): Column =
    pmod(xxhash64(c), lit(DoclenBuckets.toLong))

  private[graft] def bm25Doclens(base: DataFrame): DataFrame =
    base.select(col("doc_id"), col("dl"))
      .withColumn("dbucket", docBucketCol(col("doc_id")))

  def writeBm25Index(documents: DataFrame, path: String): Unit = {
    val base = bm25Base(documents)
    // the corpus scalars are an append-only LEDGER of exact longs:
    // (n_docs, sum_dl) rows that serving sums before deriving avgdl.
    // Document-length sums fit a double exactly (≤ 2^53), so a
    // ledger of any shape — one build row, appended batch rows, a
    // streaming sink's per-batch partitions — derives an average
    // bit-identical to a full rebuild's. Both artifacts carry a
    // batch_id partition level (the build is batch "build") so
    // [[appendToBm25Index]] retries can dynamic-overwrite exactly
    // their own partitions — the streaming sink's idempotence layout.
    bm25StatsRow(base).withColumn("batch_id", lit("build"))
      .write.mode("overwrite").partitionBy("batch_id")
      .parquet(path + "/stats")
    bm25Postings(base).withColumn("batch_id", lit("build"))
      .write.mode("overwrite").partitionBy("bucket", "batch_id")
      .parquet(path + "/postings")
    // the doc-length sidecar, bucketed on the DOC axis: deletes read
    // only their ids' directories to derive the exact negative
    // (n_docs, sum_dl) ledger correction
    bm25Doclens(base).withColumn("batch_id", lit("build"))
      .write.mode("overwrite").partitionBy("dbucket", "batch_id")
      .parquet(path + "/doclens")
  }

  private[graft] def bm25StatsRow(base: DataFrame): DataFrame =
    base.agg(count(lit(1)).as("n_docs"),
      coalesce(sum(col("dl")), lit(0L)).as("sum_dl"))

  private[graft] def bm25Base(documents: DataFrame): DataFrame =
    documents
      .select(col("doc_id"), words(col("text")).as("__ws"))
      .withColumn("dl", size(col("__ws")).cast("long"))

  private[graft] def bm25Postings(base: DataFrame): DataFrame =
    base
      .select(col("doc_id"), col("dl"), explode(col("__ws")).as("term"))
      .groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
      .withColumn("bucket", termBucketCol(col("term")))
      .repartition(col("bucket"))

  /** Ingest a batch of NEW documents into a written BM25 index
    * WITHOUT rebuilding it — the text-retrieval member of the
    * index-maintenance family ([[graft.similarity.Similarity.appendToIvfIndex]],
    * the gram/fingerprint probes). The batch's postings append inside
    * the existing term-bucket directories (same term-hash assignment,
    * so a query's PartitionFilter prunes old and new postings through
    * one listing), and the corpus scalars merge EXACTLY from the
    * stored longs: n_docs and sum_dl add, avgdl re-derives — document
    * frequencies were never stored (df re-aggregates from the pruned
    * postings at query time), so there is nothing else to maintain.
    * Append ≡ full rebuild bit-for-bit; q_search_bm25_incremental
    * shares the one-shot operator's oracle to gate exactly that.
    *
    * Per-batch cost is O(batch tokenize): the existing postings are
    * never read. The caller owns doc_id disjointness (a re-ingested
    * document under a NEW batchKey would double-count — upserts
    * belong to the keyed sinks). The one-row stats read is bounded
    * driver metadata.
    *
    * `batchKey` names the append: both artifacts land under their
    * own (…, batch_id=batchKey) partitions via DYNAMIC partition
    * overwrite, so a RETRY of the same key — including recovery from
    * a partial failure between the postings write and the stats
    * row — recomputes identical rows and overwrites exactly its own
    * partitions instead of double-appending (the
    * [[graft.streaming.Pipelines.processBm25IngestBatch]] idempotence
    * story applied to the batch path). Distinct appends need distinct
    * keys; "build" is reserved for [[writeBm25Index]].
    */
  def appendToBm25Index(newDocuments: DataFrame, path: String,
      batchKey: String): Unit = {
    requireBatchKey(batchKey)
    val spark = newDocuments.sparkSession
    require(spark.read.parquet(path + "/stats")
        .schema.fieldNames.contains("sum_dl"),
      s"BM25 index at $path predates the mergeable-stats layout " +
        "(no sum_dl) — rebuild it with writeBm25Index before appending")
    val base = bm25Base(newDocuments)
    // postings first, stats last: a failure between the two leaves a
    // stale-but-consistent average, never scalars counting ghost docs
    bm25Postings(base).withColumn("batch_id", lit(batchKey))
      .write.partitionBy("bucket", "batch_id")
      .option("partitionOverwriteMode", "dynamic")
      .mode("overwrite")
      .parquet(path + "/postings")
    // the batch writes its own ledger row under its own partition —
    // nothing is read, merged, or rewritten; serving sums the ledger
    // (exact long addition)
    bm25StatsRow(base).withColumn("batch_id", lit(batchKey))
      .write.partitionBy("batch_id")
      .option("partitionOverwriteMode", "dynamic")
      .mode("overwrite")
      .parquet(path + "/stats")
    // keep the delete sidecar in step with the appended docs (older
    // indexes without doclens stay append-able; only DELETE requires
    // the sidecar and checks for it)
    if (fsFor(spark, path).exists(hadoopPath(path + "/doclens")))
      bm25Doclens(base).withColumn("batch_id", lit(batchKey))
        .write.partitionBy("dbucket", "batch_id")
        .option("partitionOverwriteMode", "dynamic")
        .mode("overwrite")
        .parquet(path + "/doclens")
  }

  private def hadoopPath(p: String) = new org.apache.hadoop.fs.Path(p)
  private def fsFor(spark: org.apache.spark.sql.SparkSession, p: String) =
    hadoopPath(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** DELETE documents from a written BM25 index WITHOUT rewriting it
    * — the erasure member of the index-maintenance family (the
    * "right to be forgotten" path a serving index needs between
    * rebuilds). Deletion is logical: the ids land as TOMBSTONES
    * (`path/tombstones/batch_id=K/`), serving anti-joins them
    * (document frequencies re-aggregate from the pruned, filtered
    * postings, so df is the REMAINING corpus's df), and the corpus
    * scalars get an exact NEGATIVE ledger row derived from the
    * `doclens` sidecar — tombstoned serving ≡ rebuild-on-remaining
    * bit-for-bit (q_search_bm25_deleted shares the filtered-corpus
    * replay to gate exactly that). [[compactBm25Index]] later makes
    * the deletion physical.
    *
    * Cost is O(delete batch): the doclens read prunes to the ids'
    * hash-bucket directories (≤ [[DoclenBuckets]]), postings are
    * never touched. Retries of the same `batchKey` are idempotent:
    * new ids are computed against OTHER batches' tombstones only
    * (self-exclusion), so a replay recomputes identical rows and
    * dynamic-overwrites exactly its own tombstone partition and its
    * own ledger row. Ids never indexed (or already deleted by
    * another batch) contribute nothing to the correction.
    */
  def deleteFromBm25Index(deleteIds: DataFrame, path: String,
      batchKey: String): Unit = {
    requireBatchKey(batchKey)
    // a MANUAL batchKey shaped like a registered delete stream's
    // generated keys ("<keyPrefix>-N") would be dynamic-overwritten
    // by that stream's checkpoint replay of micro-batch N — silently
    // resurrecting this erasure. Streams register their prefix under
    // _delete_streams/ ([[registerDeleteStreamPrefix]]); reject here.
    val sess = deleteIds.sparkSession
    sinkShapedPrefix(sess, path, batchKey).foreach { p =>
      throw new IllegalArgumentException(
        s"batchKey \"$batchKey\" collides with delete stream prefix " +
          s"\"$p\" registered on the index at $path — a checkpoint " +
          "replay of that stream would overwrite this batch's " +
          "tombstones; pick a key that is not \"<prefix>-<digits>\"")
    }
    deleteFromBm25IndexImpl(deleteIds, path, batchKey)
  }

  /** The streaming sink's entry: same idempotent delete core, but the
    * sink OWNS its "<keyPrefix>-N" keys so the reservation check is
    * skipped (a replay overwriting its own partitions is the design).
    */
  private[graft] def deleteFromBm25IndexSink(deleteIds: DataFrame,
      path: String, batchKey: String): Unit = {
    requireBatchKey(batchKey)
    deleteFromBm25IndexImpl(deleteIds, path, batchKey)
  }

  /** Idempotent marker registering a delete STREAM's keyPrefix on the
    * index, so manual batch keys can never collide with the stream's
    * generated "<keyPrefix>-N" keys (see [[deleteFromBm25Index]]).
    */
  private[graft] def registerDeleteStreamPrefix(
      spark: org.apache.spark.sql.SparkSession, path: String,
      keyPrefix: String): Unit = {
    require(!keyPrefix.contains("/"),
      s"keyPrefix must not contain '/': $keyPrefix")
    val marker = hadoopPath(path + "/_delete_streams/" + keyPrefix)
    val fs = fsFor(spark, path)
    if (!fs.exists(marker)) fs.create(marker, true).close()
  }

  /** If `batchKey` is "<p>-<digits>" for any registered delete stream
    * prefix `p`, return that prefix. Every hyphen split with an
    * all-digit suffix is a candidate ("a-b-0" checks "a-b" AND "a"
    * would not match since "b-0" has a hyphen — only the LAST hyphen
    * can start the digit suffix, so at most one candidate exists).
    */
  private def sinkShapedPrefix(spark: org.apache.spark.sql.SparkSession,
      path: String, batchKey: String): Option[String] = {
    val i = batchKey.lastIndexOf('-')
    if (i <= 0 || i == batchKey.length - 1) return None
    val suffix = batchKey.substring(i + 1)
    if (!suffix.forall(_.isDigit)) return None
    val p = batchKey.substring(0, i)
    val fs = fsFor(spark, path)
    if (fs.exists(hadoopPath(path + "/_delete_streams/" + p))) Some(p)
    else None
  }

  private def deleteFromBm25IndexImpl(deleteIds: DataFrame, path: String,
      batchKey: String): Unit = {
    val spark = deleteIds.sparkSession
    require(fsFor(spark, path).exists(hadoopPath(path + "/doclens")),
      s"BM25 index at $path predates the delete-capable layout " +
        "(no doclens sidecar) — rebuild it with writeBm25Index first")
    val tombDir = path + "/tombstones"
    val ids = deleteIds.select(col("doc_id")).distinct()
    val newIds = (if (fsFor(spark, path).exists(hadoopPath(tombDir))) {
      val prior = spark.read.parquet(tombDir)
        .filter(col("batch_id") =!= batchKey) // retry self-exclusion
        .select(col("doc_id"))
      ids.join(prior, Seq("doc_id"), "left_anti")
    } else ids).localCheckpoint(true)
    try {
      // tombstones first: exclusion (ranking correctness) lands
      // before the stats adjustment — a failure in between leaves a
      // stale-but-consistent average, and the same-key retry
      // overwrites both (the appendToBm25Index ordering rationale)
      newIds.withColumn("batch_id", lit(batchKey))
        .write.partitionBy("batch_id")
        .option("partitionOverwriteMode", "dynamic")
        .mode("overwrite")
        .parquet(tombDir)
      // the ids' doclens buckets only — a bounded literal IN-list
      // (≤ DoclenBuckets values), computed with the SAME expression
      // the build used, so bucket assignment can never drift
      val buckets = newIds
        .select(docBucketCol(col("doc_id")).as("b")).distinct()
        .collect().map(_.getLong(0)).toIndexedSeq
      val dl =
        if (buckets.isEmpty)
          spark.read.parquet(path + "/doclens").filter(lit(false))
        else spark.read.parquet(path + "/doclens")
          .filter(col("dbucket").isin(buckets: _*))
          .join(newIds, Seq("doc_id"), "left_semi")
      dl.agg((-count(lit(1))).as("n_docs"),
          (-coalesce(sum(col("dl")), lit(0L))).as("sum_dl"))
        .withColumn("batch_id", lit("del-" + batchKey))
        .write.partitionBy("batch_id")
        .option("partitionOverwriteMode", "dynamic")
        .mode("overwrite")
        .parquet(path + "/stats")
    } finally graft.Frames.freeLocalCheckpoint(newIds)
  }

  /** Make the logical deletions physical: rewrite postings and
    * doclens without the tombstoned docs (partition SCHEME preserved
    * — the same (bucket, batch_id) / (dbucket, batch_id) columns, so
    * later appends and prunes are unaffected — but every row's
    * batch_id collapses to "build": compaction destroys HISTORY, and
    * leaving stale batch names in postings while the ledger collapses
    * would let an as-of read pair a batch's postings with the whole
    * corpus's scalars), collapse the stats ledger to one exact
    * "build" row, and clear the tombstones. Serving before and after
    * compaction is bit-identical (q_search_bm25_compacted shares
    * q_search_bm25_deleted's oracle to gate exactly that); as-of
    * reads naming pre-compaction batches fail LOUDLY afterward (the
    * serve-path ledger require). Deliberately O(index) — this is the
    * background maintenance job, not the delete path.
    */
  def compactBm25Index(spark: org.apache.spark.sql.SparkSession,
      path: String): Unit = {
    val fs = fsFor(spark, path)
    val tombDir = hadoopPath(path + "/tombstones")
    if (!fs.exists(tombDir)) return
    val tomb = spark.read.parquet(path + "/tombstones")
      .select(col("doc_id")).distinct().localCheckpoint(true)
    val kept = Seq(
      (path + "/postings", Seq("bucket", "batch_id")),
      (path + "/doclens", Seq("dbucket", "batch_id"))).map {
      case (dir, parts) =>
        // materialize BEFORE overwriting the directory being read
        (dir, parts,
          spark.read.parquet(dir)
            .join(graft.Frames.hintTombstones(tomb, path + "/tombstones"),
              Seq("doc_id"), "left_anti")
            .withColumn("batch_id", lit("build"))
            .localCheckpoint(true))
    }
    val stats = spark.read.parquet(path + "/stats")
      .agg(sum(col("n_docs")).as("n_docs"), sum(col("sum_dl")).as("sum_dl"))
      .withColumn("batch_id", lit("build"))
      .localCheckpoint(true)
    try {
      kept.foreach { case (dir, parts, live) =>
        live.write.mode("overwrite").partitionBy(parts: _*).parquet(dir)
      }
      stats.write.mode("overwrite").partitionBy("batch_id")
        .parquet(path + "/stats")
      fs.delete(tombDir, true)
    } finally {
      (stats +: kept.map(_._3)).foreach(graft.Frames.freeLocalCheckpoint)
      graft.Frames.freeLocalCheckpoint(tomb)
    }
  }

  /** BOUNDED-HISTORY compaction for the BM25 index — the
    * [[graft.similarity.Similarity.compactIvfIndexKeeping]] member of
    * the lexical family, across all FOUR artifacts (postings, stats
    * ledger, doclens sidecar, tombstones): every batch NOT in `keep`
    * folds into the collapsed "build" base with folded tombstones
    * applied physically, while kept append batches and kept delete
    * batches survive untouched and as-of addressable.
    *
    * The subtle cell is a FOLDED delete whose tombstones cover a
    * KEPT append's documents: those postings/doclens rows stay (kept
    * partitions are never rewritten), so their erasure must stay
    * too — the kept-part of the folded corrections re-materializes
    * as tombstones under the reserved batch "retained" with an exact
    * "del-retained" ledger row (re-derived from the kept doclens),
    * and the folded "build" ledger row gets that part pulled back
    * out, so EVERY ledger row again states exactly its own
    * partitions' contribution. Serving (sum of everything) is
    * invariant; as-of("build") is self-consistent (folded postings
    * against folded-only scalars); folded batch names fail the as-of
    * ledger check loudly. `_delete_streams` markers survive — no
    * directory root is overwritten. O(folded + tombstones); kept
    * partitions never read except the bounded doclens probe.
    *
    * Crash contract: an IN-PLACE rewrite like [[compactBm25Index]] —
    * a crash mid-sequence leaves a partial layout; run in a
    * maintenance window, recover by rebuild from source. Everything
    * folded is materialized before any deletion.
    */
  def compactBm25IndexKeeping(spark: org.apache.spark.sql.SparkSession,
      path: String, keep: Seq[String]): Unit = {
    require(keep.nonEmpty,
      "retention needs at least one kept batch — to collapse ALL " +
        "history use compactBm25Index")
    require(!keep.contains("build"),
      "batch \"build\" is the collapse target and always survives " +
        "retention — name only append/delete batches in keep")
    require(!keep.contains("retained"),
      "\"retained\" is retention's reserved delete key")
    val fs = fsFor(spark, path)
    require(fs.exists(hadoopPath(path + "/doclens")),
      s"BM25 index at $path predates the delete-capable layout " +
        "(no doclens sidecar) — rebuild it with writeBm25Index first")
    val ledgerRows = spark.read.parquet(path + "/stats")
      .select(col("batch_id").cast("string"), col("n_docs"),
        col("sum_dl"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val appendNames = ledgerRows.map(_._1)
      .filterNot(_.startsWith("del-")).toSet
    require(!appendNames.contains("retained"),
      "an append batch named \"retained\" conflicts with retention's " +
        "reserved delete key")
    val tombExists = fs.exists(hadoopPath(path + "/tombstones"))
    def batchDirs(glob: String): Seq[org.apache.hadoop.fs.FileStatus] =
      Option(fs.globStatus(hadoopPath(path + glob)))
        .map(_.toSeq).getOrElse(Seq.empty)
    def dirName(st: org.apache.hadoop.fs.FileStatus): String =
      org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
        .unescapePathName(st.getPath.getName.stripPrefix("batch_id="))
    val delNames: Set[String] =
      if (tombExists) batchDirs("/tombstones/batch_id=*")
        .map(dirName).toSet
      else Set.empty
    val known = appendNames ++ delNames
    val missing = keep.filterNot(known)
    require(missing.isEmpty,
      s"kept batches ${missing.mkString(", ")} have no partitions in " +
        s"the BM25 index at $path")
    val keepSet = keep.toSet
    val foldApps = appendNames -- keepSet
    val foldDels = delNames -- keepSet
    val keptApps = appendNames & keepSet
    val keptDels = delNames & keepSet
    def inSet(s: Set[String])(c: Column): Column =
      if (s.isEmpty) lit(false) else c.cast("string").isin(s.toSeq: _*)
    val foldedTombIds = (
      if (foldDels.nonEmpty)
        spark.read.parquet(path + "/tombstones")
          .filter(inSet(foldDels)(col("batch_id")))
          .select(col("doc_id")).distinct()
      else spark.read.parquet(path + "/doclens")
        .select(col("doc_id")).filter(lit(false))
      ).localCheckpoint(true)
    // the kept-part of the folded corrections, re-derived exactly
    // from the kept batches' doclens (the deleteFromBm25Index rule:
    // corrections always come from stored lengths, never recomputed
    // text)
    val retained = foldedTombIds.join(
        spark.read.parquet(path + "/doclens")
          .filter(inSet(keptApps)(col("batch_id")))
          .select(col("doc_id"), col("dl")),
        Seq("doc_id"))
      .localCheckpoint(true)
    val retAgg = retained
      .agg(count(lit(1)).as("cnt"),
        coalesce(sum(col("dl")), lit(0L)).as("sdl")).head()
    val (retCnt, retSdl) = (retAgg.getLong(0), retAgg.getLong(1))
    // folded "build" ledger row = folded appends + folded delete
    // corrections, with the kept-part pulled back out (it
    // re-materializes as "del-retained")
    val foldLedgerNames = foldApps ++ foldDels.map("del-" + _)
    val foldCnt = ledgerRows.filter(r => foldLedgerNames(r._1))
      .map(_._2).sum + retCnt
    val foldSdl = ledgerRows.filter(r => foldLedgerNames(r._1))
      .map(_._3).sum + retSdl
    val postFolded = spark.read.parquet(path + "/postings")
      .filter(inSet(foldApps)(col("batch_id")))
      .join(graft.Frames.hintTombstones(foldedTombIds,
        path + "/tombstones"), Seq("doc_id"), "left_anti")
      .withColumn("batch_id", lit("build"))
      .localCheckpoint(true)
    val dlFolded = spark.read.parquet(path + "/doclens")
      .filter(inSet(foldApps)(col("batch_id")))
      .join(graft.Frames.hintTombstones(foldedTombIds,
        path + "/tombstones"), Seq("doc_id"), "left_anti")
      .withColumn("batch_id", lit("build"))
      .localCheckpoint(true)
    try {
      // drop every folded batch directory FIRST — including the old
      // "build" partitions: a bucket whose folded rows were all
      // tombstoned writes nothing below, and a stale base directory
      // would otherwise resurrect the erased rows
      batchDirs("/postings/bucket=*/batch_id=*")
        .foreach(st => if (!keepSet(dirName(st))) fs.delete(st.getPath, true))
      batchDirs("/doclens/dbucket=*/batch_id=*")
        .foreach(st => if (!keepSet(dirName(st))) fs.delete(st.getPath, true))
      val statsKeep = keptApps ++ keptDels.map("del-" + _)
      batchDirs("/stats/batch_id=*")
        .foreach(st => if (!statsKeep(dirName(st))) fs.delete(st.getPath, true))
      if (tombExists)
        batchDirs("/tombstones/batch_id=*")
          .foreach(st => if (!keptDels(dirName(st))) fs.delete(st.getPath, true))
      // the common retention case: every delete batch folded and no
      // kept-part corrections — nothing is (re)written below, and a
      // tombstones/ root with no data files would make every later
      // indexTfStats read throw "Unable to infer schema"; drop the
      // root wholesale (the compactBm25Index convention)
      if (tombExists && keptDels.isEmpty && retCnt == 0L)
        fs.delete(hadoopPath(path + "/tombstones"), true)
      postFolded.write.partitionBy("bucket", "batch_id")
        .option("partitionOverwriteMode", "dynamic")
        .mode("overwrite").parquet(path + "/postings")
      dlFolded.write.partitionBy("dbucket", "batch_id")
        .option("partitionOverwriteMode", "dynamic")
        .mode("overwrite").parquet(path + "/doclens")
      spark.range(1)
        .select(lit(foldCnt).as("n_docs"), lit(foldSdl).as("sum_dl"),
          lit("build").as("batch_id"))
        .write.partitionBy("batch_id")
        .option("partitionOverwriteMode", "dynamic")
        .mode("overwrite").parquet(path + "/stats")
      if (retCnt > 0L) {
        retained.select(col("doc_id")).distinct()
          .withColumn("batch_id", lit("retained"))
          .write.partitionBy("batch_id")
          .option("partitionOverwriteMode", "dynamic")
          .mode("overwrite").parquet(path + "/tombstones")
        spark.range(1)
          .select(lit(-retCnt).as("n_docs"), lit(-retSdl).as("sum_dl"),
            lit("del-retained").as("batch_id"))
          .write.partitionBy("batch_id")
          .option("partitionOverwriteMode", "dynamic")
          .mode("overwrite").parquet(path + "/stats")
      }
    } finally {
      Seq(foldedTombIds, retained, postFolded, dlFolded)
        .foreach(graft.Frames.freeLocalCheckpoint)
    }
  }

  /** [[searchBm25]] served from a [[writeBm25Index]] artifact: the
    * query terms' literal buckets become PartitionFilters (directory
    * pruning), df re-aggregates from the pruned postings, and scoring
    * + rounding replay the one-shot operator exactly — same result,
    * no corpus pass. The plan never tokenizes: zero Generate nodes
    * (PlanSpec pins this).
    */
  def searchBm25FromIndex(spark: org.apache.spark.sql.SparkSession,
      path: String, queryTerms: Seq[String], k: Int,
      k1: Double = 1.2, b: Double = 0.75, from: Int = 0): DataFrame =
    bm25ServeFromIndex(spark, path, queryTerms, k, k1, b, from, None)

  /** Re-lay the index's postings out as a TERM-bucketed catalog table
    * — the lexical twin of the vec_id-bucketed embeddings behind
    * [[graft.similarity.Similarity.pqMultiTopKRefinedQTBucketed]]:
    * at 100 TB the postings table is the corpus-sized artifact, and
    * bucketing it on `term` means (a) a query's term predicate prunes
    * bucket FILES (the same mechanism directory pruning gives the
    * path layout, but surviving arbitrary term counts), and (b) the
    * document-frequency re-aggregation `groupBy(term)` plans ZERO
    * exchange — the one corpus-sized shuffle left on the serve path
    * rides the write-time layout instead. Tombstones, stats, and
    * doclens stay in the PATH index (bounded maintenance artifacts);
    * only the corpus-sized postings move.
    */
  def writeBm25BucketedPostings(spark: org.apache.spark.sql.SparkSession,
      indexPath: String, table: String, buckets: Int = 16): Unit =
    graft.ops.BucketedTables.writeBucketed(
      spark.read.parquet(indexPath + "/postings")
        .select(col("doc_id"), col("dl"), col("term"), col("tf")),
      table, "term", buckets)

  /** [[searchBm25FromIndex]] served from a
    * [[writeBm25BucketedPostings]] layout: identical ranking (the
    * path serve's oracle is the gate), with the df re-aggregation
    * riding the bucket layout exchange-free and the term restriction
    * pruning bucket files. The opt-in 100 TB twin, pin-and-twin like
    * the bucketed re-rank: the path layout stays the default (its
    * per-batch partition dirs carry the maintenance story), this
    * layout serves the frozen hot corpus.
    */
  def searchBm25FromBucketedPostings(
      spark: org.apache.spark.sql.SparkSession, path: String,
      table: String, queryTerms: Seq[String], k: Int,
      k1: Double = 1.2, b: Double = 0.75, from: Int = 0): DataFrame = {
    require(queryTerms.nonEmpty, "BM25 needs at least one query term")
    val posts = graft.ops.BucketedTables.readTable(spark, table)
    val (tf, stats) = tfStatsTail(spark, path,
      termFiltered(spark, posts, queryTerms.distinct), None)
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    scoreBm25(tf, dfreq, stats, k, k1, b, from)
  }

  /** The index's ingestion/erasure HISTORY as a table — the stats
    * ledger read out verbatim: one (batch_id, n_docs, sum_dl) row
    * per build/append/delete batch ("del-<key>" rows carry the exact
    * NEGATIVE correction). This is the operational audit behind
    * [[searchBm25FromIndexAsOf]]: which batches exist, what each
    * contributed, and what serving's summed scalars are made of —
    * a metadata-only read (the ledger is one tiny file per batch),
    * never postings. The oracle replays each batch's contribution
    * from its document split, so a ledger row that drifted from its
    * batch's true counts fails the hash.
    */
  def bm25IndexHistory(spark: org.apache.spark.sql.SparkSession,
      path: String): DataFrame =
    spark.read.parquet(path + "/stats")
      .select(col("batch_id"), col("n_docs"), col("sum_dl"))
      .orderBy(col("batch_id"))

  /** SNAPSHOT read of a maintained index: [[searchBm25FromIndex]]
    * restricted to the named ingestion/erasure batches — `"build"`
    * for [[writeBm25Index]]'s base, append batchKeys
    * ([[appendToBm25Index]]; the streaming INGEST sink's batches are
    * its NUMERIC micro-batch ids, `"0"`, `"1"`, …), and delete
    * batchKeys ([[deleteFromBm25Index]]; the streaming DELETE sink's
    * are `"<keyPrefix>-N"`, default prefix "stream" — naming one
    * makes its tombstones AND its negative ledger row visible). Because
    * every batch lands in its own `batch_id` partitions, time travel
    * is pure partition pruning: serving "as of batch K" reads
    * exactly the directories that existed then, so the ranking is
    * bit-identical to a rebuild on those batches' documents
    * (q_search_bm25_asof gates this with the base-only replay).
    * At 100 TB this is what lets evals and debugging replay
    * YESTERDAY'S index under continuous ingestion — no copy, no
    * restore, one IN-list on a partition column. Unnamed batches'
    * files are never read. Compaction collapses history to one
    * "build" batch; as-of reads predating it are gone by design
    * (that is what compaction is for). Compliance note: an as-of
    * read that omits a delete batch reproduces PRE-ERASURE history —
    * if erasure must be irreversible even to time travel, compact
    * after deleting (physical destruction of the erased rows).
    */
  def searchBm25FromIndexAsOf(spark: org.apache.spark.sql.SparkSession,
      path: String, queryTerms: Seq[String], k: Int,
      batches: Seq[String], k1: Double = 1.2, b: Double = 0.75,
      from: Int = 0): DataFrame = {
    require(batches.nonEmpty, "as-of needs at least one visible batch")
    bm25ServeFromIndex(spark, path, queryTerms, k, k1, b, from,
      Some(batches))
  }

  /** Batch-name contract shared by append and delete: "build" is the
    * build's reserved name, and "del-" is reserved as the delete
    * correction's ledger prefix — an APPEND named "del-x" would let
    * [[searchBm25FromIndexAsOf]]'s `known(b) || known("del-" + b)`
    * existence check (and its visibility union) silently pair batch
    * "x" with an unrelated append's ledger row: plausible-looking
    * wrong scalars instead of the loud error the check exists for.
    */
  private def requireBatchKey(batchKey: String): Unit = {
    require(batchKey.nonEmpty && batchKey != "build",
      "batchKey must be a non-empty name other than the reserved \"build\"")
    require(!batchKey.startsWith("del-"),
      "batchKey must not start with \"del-\" — that prefix is reserved " +
        "for delete-correction ledger rows (deleteFromBm25Index writes " +
        "its stats row as \"del-<key>\")")
    // retention writes its kept-part corrections as tombstone batch
    // "retained" and ledger row "del-retained"; a later append or
    // delete under that name would dynamic-overwrite them, silently
    // resurrecting previously erased kept-batch documents
    require(batchKey != "retained",
      "\"retained\" is reserved for compactBm25IndexKeeping's " +
        "kept-part delete corrections — pick another name")
    // the ingest sink ([[graft.streaming.Pipelines.bm25IndexSink]])
    // partitions by the RAW numeric micro-batch id: a manual append
    // named "5" on a stream-fed index would be dynamic-overwritten by
    // a checkpoint replay of micro-batch 5, silently dropping its docs
    require(!batchKey.forall(_.isDigit),
      s"batchKey \"$batchKey\" is all digits — the streaming ingest " +
        "sink keys its partitions by raw numeric micro-batch id, and a " +
        "checkpoint replay of that micro-batch would overwrite this " +
        "append; pick a non-numeric name")
  }

  private def bm25ServeFromIndex(spark: org.apache.spark.sql.SparkSession,
      path: String, queryTerms: Seq[String], k: Int,
      k1: Double, b: Double, from: Int,
      visible: Option[Seq[String]]): DataFrame = {
    require(queryTerms.nonEmpty, "BM25 needs at least one query term")
    val (tf, stats) = indexTfStats(spark, path, queryTerms, visible)
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    scoreBm25(tf, dfreq, stats, k, k1, b, from)
  }

  /** The (tf, corpus-scalars) pair a written index SERVES from,
    * restricted to the `visible` batches: bucket-pruned postings
    * minus tombstones, ledger-summed (n_docs, avgdl). Shared by
    * ranking ([[bm25ServeFromIndex]]) and evaluation
    * ([[retrievalEvalFromIndex]] / [[retrievalEvalFromIndexAsOf]]),
    * so both see the IDENTICAL post-maintenance corpus — an eval
    * over a tombstoned index scores the remaining documents exactly
    * as serving ranks them, never a mix of live postings and
    * corrected scalars.
    */
  private def indexTfStats(spark: org.apache.spark.sql.SparkSession,
      path: String, terms: Seq[String],
      visible: Option[Seq[String]]): (DataFrame, DataFrame) = {
    // batch_id is compared AS STRING throughout: a pure stream-built
    // index's partition values are numeric micro-batch ids (0,1,2…),
    // which Spark's partition-type inference reads back as an
    // integer column — without the cast, string batch names would
    // never match and the ledger collect below would ClassCastException
    def inVisible(df: DataFrame): DataFrame = visible match {
      case Some(bs) => df.filter(col("batch_id").cast("string").isin(bs: _*))
      case None     => df
    }
    val buckets = terms.map(termBucket).distinct
    // bucket pruning stays LITERAL at any scale (≤ the fixed bucket
    // count of distinct values); the TERM filter is literal only up
    // to `spark.graft.termLiteralMax` (default 128) — past it (a
    // large eval batch's union of query terms) the plan-sized In
    // predicate becomes a BROADCAST join against the bounded term
    // frame, the lexical twin of the vector side's query-table
    // re-shape: plan size stays O(1) in the term count and only the
    // row-group term pushdown is traded away (bucket directory
    // pruning is unaffected)
    val pruned = inVisible(spark.read.parquet(path + "/postings")
      .filter(col("bucket").isin(buckets: _*))) // directory pruning
    tfStatsTail(spark, path, termFiltered(spark, pruned, terms), visible)
  }

  /** The literal-or-join TERM restriction every lexical serve path
    * shares: a plan-bounded In below `spark.graft.termLiteralMax`
    * (row-group pushdown), a broadcast term-frame join above it.
    */
  private def termFiltered(spark: org.apache.spark.sql.SparkSession,
      postings: DataFrame, terms: Seq[String]): DataFrame = {
    val termLiteralMax = spark.conf
      .get("spark.graft.termLiteralMax", "128").toInt
    (if (terms.length <= termLiteralMax)
        postings.filter(col("term").isin(terms: _*))
      else {
        import spark.implicits._
        postings.join(broadcast(terms.distinct.toDF("term")),
          Seq("term"))
      })
      .select(col("doc_id"), col("dl"), col("term"), col("tf"))
  }

  /** The (tombstone anti-join, stats-ledger) tail shared by the
    * path-layout and bucketed-postings serves: `tf0` is the
    * term-restricted (doc_id, dl, term, tf) frame, whatever layout
    * it was read from; tombstones and scalars always come from the
    * PATH index (they are bounded maintenance artifacts — the
    * bucketed twin re-lays out only the corpus-sized postings).
    */
  private def tfStatsTail(spark: org.apache.spark.sql.SparkSession,
      path: String, tf0: DataFrame,
      visible: Option[Seq[String]]): (DataFrame, DataFrame) = {
    def inVisible(df: DataFrame): DataFrame = visible match {
      case Some(bs) => df.filter(col("batch_id").cast("string").isin(bs: _*))
      case None     => df
    }
    // logical deletions ([[deleteFromBm25Index]]): anti-join the
    // tombstones so df below re-aggregates as the REMAINING corpus's
    // document frequencies — tombstoned serving ≡ rebuild-on-remaining
    val tf =
      if (fsFor(spark, path).exists(hadoopPath(path + "/tombstones")))
        tf0.join(graft.Frames.hintTombstones(
          inVisible(spark.read.parquet(path + "/tombstones"))
            .select(col("doc_id")).distinct(), path + "/tombstones"),
          Seq("doc_id"), "left_anti")
      else tf0
    // the stats artifact is an append-only LEDGER of exact
    // (n_docs, sum_dl) long rows — one build row, appended batch
    // rows, or a streaming sink's per-batch partitions. Summing longs
    // and deriving the average here is bit-identical to a full
    // rebuild's single row (length sums are exact in a double).
    // A delete batch's correction row is "del-<key>": visible iff its
    // delete batch is.
    val statsVisible = visible match {
      case Some(bs) =>
        // every named batch must still exist in the ledger (as its
        // own row or its delete correction "del-<key>"): after
        // compaction the ledger is one "build" row, and an as-of
        // read naming a pre-compaction batch would otherwise score
        // the batch's postings against the WHOLE corpus's scalars —
        // plausible-looking wrong rankings instead of a loud error
        val known = spark.read.parquet(path + "/stats")
          .select(col("batch_id").cast("string")).distinct()
          .collect().map(_.getString(0)).toSet
        val missing = bs.filterNot(b => known(b) || known("del-" + b))
        require(missing.isEmpty,
          s"batches ${missing.mkString(", ")} have no stats-ledger row " +
            s"in the index at $path — compaction collapses history " +
            "(as-of reads predating it are gone by design)")
        val all = bs ++ bs.map("del-" + _)
        spark.read.parquet(path + "/stats")
          .filter(col("batch_id").cast("string").isin(all: _*))
      case None => spark.read.parquet(path + "/stats")
    }
    val stats = statsVisible
      .agg(sum(col("n_docs")).as("n_docs"), sum(col("sum_dl")).as("sum_dl"))
      .select(col("n_docs"),
        when(col("n_docs") > 0, col("sum_dl") * lit(1.0) / col("n_docs"))
          .as("avgdl"))
    (tf, stats)
  }

  /** The shared BM25 scoring tail over a (doc_id, dl, term, tf)
    * frame: idf from broadcast df + corpus scalars, per-term partial
    * scores, per-doc sum, TakeOrdered page. Rounding contract: idf to
    * 6 places before the product, the final score to 4 — identical in
    * the one-shot and indexed paths (and the DuckDB oracle).
    */
  private def scoreBm25(tf: DataFrame, dfreq: DataFrame, stats: DataFrame,
      k: Int, k1: Double, b: Double, from: Int): DataFrame =
    tf
      .join(broadcast(dfreq), "term")
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        round(log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1.0), 6))
      .withColumn("tscore",
        col("idf") * (col("tf") * (lit(k1) + 1.0)) /
          (col("tf") + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl") / col("avgdl"))))
      .groupBy(col("doc_id"))
      .agg(round(sum(col("tscore")), 4).as("bm25"))
      .orderBy(col("bm25").desc, col("doc_id"))
      .offset(from)
      .limit(k)

  /** Retrieval operating-point evaluation — the [[searchBm25]]
    * counterpart of annRecall / classifier PR: MRR, precision@k and
    * recall@k of the BM25 ranking per eval query, against a
    * deterministic graded-relevance rule (a document is relevant to
    * a query iff EVERY query term occurs ≥ `minTf` times — the same
    * tokenizer as the ranking, so ground truth and ranking can never
    * disagree about what a term is). The measurement that justifies
    * a retrieval config before a deployment trusts it; every metric
    * is an exact integer rational (first-rank reciprocal, hit
    * counts), so the numbers themselves hash-gate.
    *
    * Scale shape: ONE corpus tokenize shared across every eval query
    * (terms ride a broadcast (query, term) frame through the same
    * tf/df aggregation searchBm25 runs for one query); rankings are
    * per-query window top-k over the scored subset (docs containing
    * ≥1 query term), metrics are two bounded aggregations. Eval
    * batches are small by definition — the corpus pass dominates and
    * is paid once.
    */
  def retrievalEval(documents: DataFrame,
      queries: Seq[(String, Seq[String])], k: Int,
      k1: Double = 1.2, b: Double = 0.75, minTf: Long = 3L): DataFrame = {
    require(queries.nonEmpty && queries.forall(_._2.nonEmpty),
      "retrievalEval needs at least one query with at least one term")
    val spark = documents.sparkSession
    val allTerms = queries.flatMap(_._2).distinct
    val base = documents
      .select(col("doc_id"), words(col("text")).as("__ws"))
      .withColumn("dl", size(col("__ws")))
    val stats = base.agg(count(lit(1)).as("n_docs"), avg(col("dl")).as("avgdl"))
    val tf = base
      .select(col("doc_id"), col("dl"), explode(col("__ws")).as("term"))
      .filter(col("term").isin(allTerms: _*))
      .groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
    retrievalEvalFrom(spark, tf, stats, queries, k, k1, b, minTf)
  }

  /** [[retrievalEval]] served from a written [[writeBm25Index]]
    * artifact — the eval a 100 TB deployment actually runs: the eval
    * terms' literal buckets PRUNE the postings scan (PartitionFilters,
    * like the serving query itself) and the corpus scalars come from
    * the stats ledger, so the whole eval batch touches |eval-term
    * buckets| directories and never tokenizes — or even reads — the
    * corpus. Identical output to the one-shot form by construction
    * (same tf/df/scalars the index serves queries from);
    * q_retrieval_eval_indexed shares the corpus oracle to gate it.
    */
  def retrievalEvalFromIndex(spark: org.apache.spark.sql.SparkSession,
      path: String, queries: Seq[(String, Seq[String])], k: Int,
      k1: Double = 1.2, b: Double = 0.75, minTf: Long = 3L): DataFrame = {
    require(queries.nonEmpty && queries.forall(_._2.nonEmpty),
      "retrievalEval needs at least one query with at least one term")
    // the SAME (tf, scalars) serving reads — tombstones excluded, so
    // an eval over a maintained index scores exactly the corpus that
    // serving ranks (postings of erased docs paired with corrected
    // scalars would skew every metric)
    val (tf, stats) = indexTfStats(spark, path,
      queries.flatMap(_._2).distinct, None)
    retrievalEvalFrom(spark, tf, stats, queries, k, k1, b, minTf)
  }

  /** [[retrievalEvalFromIndex]] at a SNAPSHOT — the eval-owner's real
    * question under continuous ingestion: "did last week's index
    * serve worse than today's?" Metrics computed against the named
    * batch set's postings and ledger scalars
    * ([[searchBm25FromIndexAsOf]]'s visibility rules: tombstones
    * retroactive, missing ledger rows fail loudly) — the whole eval
    * batch is still |eval-term buckets| pruned directories, no copy,
    * no restore. q_retrieval_eval_asof gates it with a base-split
    * rebuild replay of the full metric SQL.
    */
  def retrievalEvalFromIndexAsOf(spark: org.apache.spark.sql.SparkSession,
      path: String, queries: Seq[(String, Seq[String])], k: Int,
      batches: Seq[String], k1: Double = 1.2, b: Double = 0.75,
      minTf: Long = 3L): DataFrame = {
    require(queries.nonEmpty && queries.forall(_._2.nonEmpty),
      "retrievalEval needs at least one query with at least one term")
    require(batches.nonEmpty, "as-of needs at least one visible batch")
    val (tf, stats) = indexTfStats(spark, path,
      queries.flatMap(_._2).distinct, Some(batches))
    retrievalEvalFrom(spark, tf, stats, queries, k, k1, b, minTf)
  }

  /** The shared eval tail over a (doc_id, dl, term, tf) frame +
    * 1-row corpus scalars — document frequencies re-aggregate from
    * the (possibly pruned) postings exactly as serving does.
    */
  private def retrievalEvalFrom(spark: org.apache.spark.sql.SparkSession,
      tf: DataFrame, stats: DataFrame,
      queries: Seq[(String, Seq[String])], k: Int,
      k1: Double, b: Double, minTf: Long): DataFrame = {
    import spark.implicits._
    val qt = queries.flatMap { case (q, ts) => ts.distinct.map(t => (q, t)) }
      .toDF("query_label", "term")
    val qs = qt.groupBy(col("query_label"))
      .agg(count(lit(1)).as("n_terms"))
    val sc = scoredEvidence(tf, stats, qt, k1, b)
    val wQ = Window.partitionBy(col("query_label"))
      .orderBy(col("bm25").desc, col("doc_id"))
    val ranked = sc
      .withColumn("rank", row_number().over(wQ))
      .filter(col("rank") <= k)
      .select(col("query_label"), col("doc_id"), col("rank"))
    evalMetricsTail(qs.select(col("query_label")), ranked,
      relevanceFrom(sc, qs, minTf), k)
  }

  /** Per-(query, doc) BM25 + the relevance evidence in ONE pass over
    * the query-term-replicated postings (same idf/tscore math as
    * scoreBm25, rounded identically) — shared by the lexical eval and
    * the hybrid eval so the scoring/relevance rule cannot drift
    * between the two gates.
    */
  private def scoredEvidence(tf: DataFrame, stats: DataFrame,
      qt: DataFrame, k1: Double, b: Double): DataFrame = {
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    tf
      .join(broadcast(dfreq), "term")
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        round(log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1.0), 6))
      .withColumn("tscore",
        col("idf") * (col("tf") * (lit(k1) + 1.0)) /
          (col("tf") + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl") / col("avgdl"))))
      .join(broadcast(qt), "term")
      .groupBy(col("query_label"), col("doc_id"))
      .agg(round(sum(col("tscore")), 4).as("bm25"),
        count(lit(1)).as("n_present"), min(col("tf")).as("min_tf"))
  }

  /** The deterministic graded-relevance rule every retrieval eval
    * shares: a doc is relevant to a query iff EVERY query term is
    * present with tf ≥ `minTf`.
    */
  private def relevanceFrom(sc: DataFrame, qs: DataFrame,
      minTf: Long): DataFrame =
    sc.join(qs, "query_label")
      .filter(col("n_present") === col("n_terms") && col("min_tf") >= minTf)
      .select(col("query_label"), col("doc_id"), lit(1L).as("is_rel"))

  /** The exact-rational metric tail shared by [[retrievalEval]] and
    * [[hybridEval]]: per-query hit counts, first-rank reciprocal,
    * precision/recall@k over a (query_label, doc_id, rank) ranking
    * and a (query_label, doc_id, is_rel) relevance set. One text, two
    * gates — the metric math cannot drift between the lexical and the
    * fused evals.
    */
  private def evalMetricsTail(labels: DataFrame, ranked: DataFrame,
      rel: DataFrame, k: Int): DataFrame = {
    val nrel = rel.groupBy(col("query_label"))
      .agg(count(lit(1)).as("n_relevant"))
    val hits = ranked
      .join(rel, Seq("query_label", "doc_id"), "left")
      .groupBy(col("query_label"))
      .agg(coalesce(sum(col("is_rel")), lit(0L)).as("n_hit"),
        min(when(col("is_rel").isNotNull, col("rank"))).as("fr"))
    labels
      .join(nrel, Seq("query_label"), "left")
      .join(hits, Seq("query_label"), "left")
      .select(col("query_label"),
        coalesce(col("n_relevant"), lit(0L)).as("n_relevant"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"),
        coalesce(col("fr"), lit(0)).as("first_rank"),
        coalesce(round(lit(1.0) / col("fr"), 4), lit(0.0)).as("mrr"),
        round(coalesce(col("n_hit"), lit(0L)) * lit(1.0) / lit(k), 4)
          .as("p_at_k"),
        when(coalesce(col("n_relevant"), lit(0L)) > 0,
          round(coalesce(col("n_hit"), lit(0L)) * lit(1.0) / col("n_relevant"), 4))
          .otherwise(lit(0.0)).as("r_at_k"))
      .orderBy(col("query_label"))
  }

  /** Operating-point eval of the FULLY-SERVED hybrid stack — the
    * measured quality number behind [[hybridSearchServed]], the
    * [[retrievalEval]] convention applied to the fused ranking: each
    * eval query serves through BOTH compressed branches (bucket-pruned
    * BM25 + two-stage PQ) and the RRF fusion, the fused top-`k` is
    * scored against the SAME deterministic relevance rule the lexical
    * eval uses (every query term present with tf ≥ `minTf`, evidence
    * from the index's pruned postings), and the metrics flow through
    * the SAME exact-rational tail — so "what does fusion do to
    * end-to-end retrieval quality" is a number, not a hope, and the
    * lexical eval next to it is directly comparable. Query vectors
    * resolve from `embeddings` by id inside the keyed batched serve
    * (bounded driver collect at small Q, a broadcast join past the
    * literal threshold); a query id with no embedding row fails
    * loudly on either path (an eval that silently drops queries
    * overstates the operating point). Two eval labels MAY share one
    * vector id (round 16): the batch keys by a synthetic index and
    * the serve dedups vector ids itself.
    *
    * Scale shape (round-15 verdict #4): ranking production goes
    * through [[hybridMultiSearchServed]], so the WHOLE eval batch
    * costs three scans — one pruned postings read over the union of
    * eval-term buckets, one code scan over the union of probed
    * cells, one bounded float fetch — where the per-query loop it
    * replaced issued ~4·Q; relevance evidence re-reads only the eval
    * terms' pruned postings. Nothing corpus-wide. Metric math is
    * untouched (same ranks, same exact-rational tail — the
    * q_hybrid_eval hash is the gate).
    */
  def hybridEval(spark: org.apache.spark.sql.SparkSession,
      bm25Path: String, pqIndex: DataFrame, embeddings: DataFrame,
      cents: Seq[Seq[Double]],
      cb: graft.similarity.Similarity.PqCodebook,
      queries: Seq[(String, Seq[String], Long)], k: Int,
      depth: Int = 20, nProbe: Int = 2, shortlist: Int = 40,
      rrfK: Int = 60, k1: Double = 1.2, b: Double = 0.75,
      minTf: Long = 3L): DataFrame = {
    import spark.implicits._
    require(queries.nonEmpty && queries.forall(_._2.nonEmpty),
      "hybridEval needs at least one query with at least one term")
    // two queries sharing a label would union their rankings and
    // merge their relevance sets under one query_label — a single
    // plausible-but-wrong metrics row instead of a loud error
    require(queries.map(_._1).distinct.length == queries.length,
      "query labels must be distinct — each label keys one metrics row")
    // ranking production = the KEYED batched serve (per-query rows ≡
    // Q single hybridSearchServed calls, its own oracle gate), keyed
    // by a SYNTHETIC query index carrying (label, vector id) — two
    // eval queries may legitimately share one embedding id with
    // different term sets (comparing term formulations against the
    // same relevance vector), which the round-15 distinct-vector-id
    // restriction refused; the serve now dedups vector ids itself.
    // Ranks recomputed per query by the same (rrf desc, doc_id)
    // order the single-path eval used; vector lookup + loud
    // missing-id check live inside the batched serve
    val indexed = queries.zipWithIndex
      .map { case ((l, ts, vid), i) => (i.toLong, l, ts, vid) }
    val labelDf = indexed.map(q => (q._1, q._2))
      .toDF("query_id", "query_label")
    val ranked = hybridMultiSearchServedKeyed(spark, bm25Path, pqIndex,
      embeddings, cents, cb, indexed.map(q => (q._1, q._3, q._4)), k,
      depth, nProbe, shortlist, rrfK)
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("rrf").desc, col("doc_id"))))
      .join(broadcast(labelDf), Seq("query_id"))
      .select(col("query_label"), col("doc_id"), col("rank"))
    val qt = queries
      .flatMap { case (l, ts, _) => ts.distinct.map(t => (l, t)) }
      .toDF("query_label", "term")
    val qs = qt.groupBy(col("query_label"))
      .agg(count(lit(1)).as("n_terms"))
    val (tf, stats) = indexTfStats(spark, bm25Path,
      queries.flatMap(_._2).distinct, None)
    val sc = scoredEvidence(tf, stats, qt, k1, b)
    evalMetricsTail(qs.select(col("query_label")), ranked,
      relevanceFrom(sc, qs, minTf), k)
  }

  /** BATCHED fully-served hybrid — the whole compressed retrieval
    * stack at high QPS: Q queries' lexical rankings from ONE pruned
    * postings read (the union of all eval terms' buckets, per-query
    * BM25 via the shared [[scoredEvidence]] scoring), their semantic
    * rankings from [[graft.similarity.Similarity.pqMultiTopKRefined]]
    * (one code scan + one bounded float fetch), RRF-fused per query
    * with the single-path formula. Three scans for the whole batch
    * where Q single [[hybridSearchServed]] calls issue ~4Q. Output:
    * (query_id, doc_id, lex_rank, sem_rank, rrf), k rows per query —
    * per-query rows ≡ Q single serves (spec- and oracle-gated).
    * Query vectors collect from `embeddings` by id; an id with no
    * row fails loudly.
    */
  def hybridMultiSearchServed(spark: org.apache.spark.sql.SparkSession,
      bm25Path: String, pqIndex: DataFrame, embeddings: DataFrame,
      cents: Seq[Seq[Double]],
      cb: graft.similarity.Similarity.PqCodebook,
      queries: Seq[(Long, Seq[String])], k: Int, depth: Int = 20,
      nProbe: Int = 2, shortlist: Int = 40, rrfK: Int = 60,
      k1: Double = 1.2, b: Double = 0.75): DataFrame =
    hybridMultiSearchServedKeyed(spark, bm25Path, pqIndex, embeddings,
      cents, cb, queries.map(q => (q._1, q._2, q._1)), k, depth,
      nProbe, shortlist, rrfK, k1, b)

  /** The batched hybrid's KEYED core: queries arrive as (query_id,
    * terms, vector id), so two queries may share one embedding id
    * with different term sets (the eval comparison [[hybridEval]]
    * needs) — the semantic branch serves each DISTINCT vector id once
    * and joins the rankings back to the query keys. Past
    * [[graft.similarity.Similarity.literalMaxQ]] the vector fetch is
    * a JOIN against the query-id frame and the two-stage serve runs
    * through the QUERY-TABLE plan (round-16 verdict #5: the
    * driver-collected `isin` vector fetch was exactly the pattern
    * the QT family retired — past the threshold the code scan was
    * already QT-shaped while its own query vectors still collected
    * as literals); at small Q the bounded collect + literal plan
    * stays (measured faster, the established operating point). A
    * vector id with no embedding row fails loudly on either path:
    * the large-Q side carries the partial-missing check in-plan
    * (count guard riding the joined rows) and closes the all-missing
    * shape — where zero joined rows carry zero guards — with one
    * bounded limit-1 action (round-16; previously a documented edge
    * that degraded to a silently empty semantic branch).
    */
  def hybridMultiSearchServedKeyed(
      spark: org.apache.spark.sql.SparkSession,
      bm25Path: String, pqIndex: DataFrame, embeddings: DataFrame,
      cents: Seq[Seq[Double]],
      cb: graft.similarity.Similarity.PqCodebook,
      queries: Seq[(Long, Seq[String], Long)], k: Int, depth: Int = 20,
      nProbe: Int = 2, shortlist: Int = 40, rrfK: Int = 60,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    import spark.implicits._
    require(queries.nonEmpty && queries.forall(_._2.nonEmpty),
      "batched hybrid needs at least one query with at least one term")
    val qids = queries.map(_._1)
    require(qids.distinct.length == qids.length,
      "query ids must be distinct")
    val vids = queries.map(_._3).distinct
    // lexical: one pruned read of the union of all terms' buckets;
    // per-query scoring through the SAME evidence aggregation the
    // eval paths use (identical idf/tscore/rounding to scoreBm25)
    val qt = queries
      .flatMap { case (qid, ts, _) => ts.distinct.map(t => (qid, t)) }
      .toDF("query_label", "term")
    val (tf, stats) = indexTfStats(spark, bm25Path,
      queries.flatMap(_._2).distinct, None)
    val lex = scoredEvidence(tf, stats, qt, k1, b)
      .withColumn("lex_rank", row_number().over(
        Window.partitionBy(col("query_label"))
          .orderBy(col("bm25").desc, col("doc_id"))))
      .filter(col("lex_rank") <= depth)
      .select(col("query_label").as("query_id"), col("doc_id"),
        col("lex_rank"))
    // semantic: one code scan + one bounded float fetch for ALL
    // distinct vector ids' two-stage rankings, joined back to the
    // query keys (rankings are per-vector, so shared ids share rows)
    val semByVid =
      if (vids.length <= graft.similarity.Similarity
          .literalMaxQ(embeddings)) {
        // small batch: bounded driver collect of the vectors, the
        // measured-fastest literal plan
        val qvecs = embeddings.filter(col("vec_id").isin(vids: _*))
          .select(col("vec_id"),
            col("embedding").cast("array<double>").as("e"))
          .collect()
          .map(r => r.getLong(0) -> (r.getSeq[Double](1).toVector: Seq[Double]))
          .toMap
        val missing = vids.filterNot(qvecs.contains)
        require(missing.isEmpty,
          s"query vector ids ${missing.mkString(", ")} have no " +
            "embedding row")
        graft.similarity.Similarity.pqMultiTopKRefined(pqIndex,
          embeddings, cents, cb, vids.map(v => v -> qvecs(v)),
          depth, nProbe, shortlist)
      } else {
        // large batch: the vectors never touch the driver — the
        // query frame is a broadcast join on vec_id, the serve the
        // query-table plan; the missing-id contract stays loud via
        // an in-plan count guard over the bounded joined frame
        val vidDf = vids.toDF("vec_id")
        val fetched = embeddings
          .join(broadcast(vidDf), Seq("vec_id"))
          .select(col("vec_id").as("query_id"), col("embedding"))
        // the row-carried guard below cannot fire when the join finds
        // NOTHING (zero rows carry zero guards) — the one shape that
        // previously degraded to a silently empty semantic branch.
        // One bounded limit-1 action on this rare path closes it
        require(!fetched.isEmpty,
          s"none of the ${vids.length} query vector ids have an " +
            "embedding row — the batched hybrid refuses to serve a " +
            "lexical-only ranking as if it were fused")
        val guarded = fetched.withColumn("query_id",
          when(count(lit(1)).over(Window.partitionBy())
              === lit(vids.length.toLong), col("query_id"))
            .otherwise(raise_error(lit(
              s"some of the ${vids.length} query vector ids have no " +
                "embedding row — the batched hybrid refuses to " +
                "silently drop eval queries"))
              .cast("long")))
        graft.similarity.Similarity.pqMultiTopKRefinedQT(pqIndex,
          embeddings, cents, cb, guarded, depth, nProbe, shortlist)
      }
    val vidMap = queries.map(q => (q._1, q._3))
      .toDF("query_id", "q_vid")
    val sem = semByVid
      .withColumn("sem_rank", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("cos_sim").desc, col("vec_id"))))
      .select(col("query_id").as("q_vid"), col("vec_id").as("doc_id"),
        col("sem_rank"))
      .join(broadcast(vidMap), Seq("q_vid"))
      .select(col("query_id"), col("doc_id"), col("sem_rank"))
    lex.join(sem, Seq("query_id", "doc_id"), "full_outer")
      .withColumn("rrf", round(
        coalesce(lit(1.0) / (lit(rrfK) + col("lex_rank")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(rrfK) + col("sem_rank")), lit(0.0)), 6))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("rrf").desc, col("doc_id"))))
      .filter(col("rn") <= k).drop("rn")
      .orderBy(col("query_id"), col("rrf").desc, col("doc_id"))
  }

  /** Recall@k of the FUSED ranking against the exact SEMANTIC
    * (cosine top-k) baseline — the measurement [[hybridEval]]'s
    * lexical relevance rule cannot make: under that rule the fused
    * metric is INVARIANT to which (irrelevant) candidates the
    * semantic branch supplies, so semantic drift never reaches it
    * (measured: stale ≡ refreshed rows in q_hybrid_eval_drift).
    * Here the ground truth is the query vector's true float top-k,
    * so a drifted PQ branch's routing loss shows up in the fused
    * number — and the lexical branch's fixed share of the fused
    * slots quantifies exactly how much fusion dampens both the
    * drop and the recluster's recovery relative to the pure
    * semantic path (q_pq_recluster_recall's 0.32→0.44).
    * Readout: (query_id, n_exact, recall), the servingRecall shape.
    */
  def hybridSemanticRecall(spark: org.apache.spark.sql.SparkSession,
      bm25Path: String, pqIndex: DataFrame, embeddings: DataFrame,
      cents: Seq[Seq[Double]],
      cb: graft.similarity.Similarity.PqCodebook,
      queries: Seq[(String, Seq[String], Long)], k: Int,
      depth: Int = 20, nProbe: Int = 2, shortlist: Int = 40,
      rrfK: Int = 60): DataFrame = {
    require(queries.nonEmpty && queries.forall(_._2.nonEmpty),
      "hybridSemanticRecall needs at least one query with terms")
    val qids = queries.map(_._3)
    require(qids.distinct.length == qids.length,
      "query vector ids must be distinct — each id keys one readout row")
    val qvecs = embeddings.filter(col("vec_id").isin(qids: _*))
      .select(col("vec_id"),
        col("embedding").cast("array<double>").as("e"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toVector)
      .toMap
    val missing = qids.filterNot(qvecs.contains)
    require(missing.isEmpty,
      s"query vector ids ${missing.mkString(", ")} have no embedding row")
    val fusedHits = queries.map { case (_, terms, vid) =>
      hybridSearchServed(spark, bm25Path, pqIndex, embeddings, cents,
        cb, terms, qvecs(vid), k, depth, nProbe, shortlist, rrfK)
        .select(lit(vid).as("query_id"), col("doc_id").as("vec_id"),
          lit(1L).as("hit"))
    }.reduce(_.unionByName(_))
    graft.similarity.Similarity.multiQueryTopK(embeddings, qids, k)
      .select(col("query_id"), col("vec_id"))
      .join(fusedHits, Seq("query_id", "vec_id"), "left")
      .groupBy(col("query_id"))
      .agg(count(lit(1)).as("n_exact"),
        coalesce(sum(col("hit")), lit(0L)).as("n_hit"))
      .select(col("query_id"), col("n_exact"),
        round(col("n_hit") * lit(1.0) / col("n_exact"), 4).as("recall"))
      .orderBy(col("query_id"))
  }

  /** Hybrid retrieval via Reciprocal Rank Fusion (Cormack et al.
    * 2009) — the standard way to blend a lexical and a semantic
    * ranking without score normalization:
    *
    *   rrf(d) = Σ_r 1/(k0 + rank_r(d))   over rankings containing d
    *
    * The lexical ranking is [[searchBm25]] top-`depth`; the semantic
    * ranking is cosine top-`depth` against a stored query vector
    * (ids shared across `documents` and `embeddings`). Ranks are
    * exact integers and the two reciprocal terms add in a fixed
    * order, so the fused score is engine-deterministic with no
    * float-sum-order caveat; rounded to 6 for stable tie-breaks
    * (doc_id asc).
    *
    * Scale shape: each branch is already a TakeOrdered top-`depth`
    * (tiny); the fusion full-outer-joins two ≤depth-row frames —
    * negligible next to the branch scans, which carry the
    * [[searchBm25]] / [[graft.similarity.Similarity.bruteForceTopK]]
    * scale properties unchanged.
    */
  def hybridSearch(documents: DataFrame, embeddings: DataFrame,
      queryTerms: Seq[String], queryVecId: Long, k: Int,
      depth: Int = 50, rrfK: Int = 60): DataFrame =
    hybridSearchFrom(searchBm25(documents, queryTerms, depth), embeddings,
      queryVecId, k, depth, rrfK)

  /** [[hybridSearch]] with the lexical branch served from a written
    * BM25 index — the serving-path composition (one corpus tokenize
    * amortized over every query, like the IVF/PQ serving stack).
    * Identical fused ranking: the indexed branch is row-identical to
    * the one-shot [[searchBm25]].
    */
  def hybridSearchIndexed(indexPath: String, embeddings: DataFrame,
      queryTerms: Seq[String], queryVecId: Long, k: Int,
      depth: Int = 50, rrfK: Int = 60): DataFrame =
    hybridSearchFrom(
      searchBm25FromIndex(embeddings.sparkSession, indexPath, queryTerms,
        depth),
      embeddings, queryVecId, k, depth, rrfK)

  /** RRF fusion over a precomputed lexical top-`depth` (`lex0`:
    * (doc_id, bm25)) and the cosine branch — both branches are tiny
    * TakeOrdered results, so the global rank windows below order
    * ≤depth rows each.
    */
  private def hybridSearchFrom(lex0: DataFrame, embeddings: DataFrame,
      queryVecId: Long, k: Int, depth: Int, rrfK: Int): DataFrame =
    rrfFuse(lex0,
      graft.similarity.Similarity.bruteForceTopK(embeddings, queryVecId,
        depth),
      k, rrfK)

  /** The fusion core shared by every hybrid variant: rank the lexical
    * (doc_id, bm25) and semantic (vec_id, cos_sim) branches, full-
    * outer-join the two ≤depth-row frames, fuse reciprocally. Exact
    * integer ranks + fixed-order addition keep the fused score
    * engine-deterministic.
    */
  private def rrfFuse(lex0: DataFrame, sem0: DataFrame, k: Int,
      rrfK: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // the semantic branch must be exactly (vec_id, <score>) — with
    // extra or reordered columns, inferring "the first non-vec_id
    // column" could silently rank by the wrong one
    require(sem0.columns.length == 2 && sem0.columns.contains("vec_id"),
      "semantic branch must have exactly two columns, vec_id and a " +
        s"score — got (${sem0.columns.mkString(", ")})")
    val simCol = sem0.columns.find(_ != "vec_id").get
    val lex = lex0
      .withColumn("lex_rank", row_number().over(
        Window.orderBy(col("bm25").desc, col("doc_id"))))
      .select(col("doc_id"), col("lex_rank"))
    val sem = sem0
      .withColumn("sem_rank", row_number().over(
        Window.orderBy(col(simCol).desc, col("vec_id"))))
      .select(col("vec_id").as("doc_id"), col("sem_rank"))
    lex.join(sem, Seq("doc_id"), "full_outer")
      .withColumn("rrf", round(
        coalesce(lit(1.0) / (lit(rrfK) + col("lex_rank")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(rrfK) + col("sem_rank")), lit(0.0)), 6))
      .orderBy(col("rrf").desc, col("doc_id"))
      .limit(k)
  }

  /** The FULLY-SERVED hybrid — both branches from written artifacts,
    * no corpus pass on either: the lexical top-`depth` from the BM25
    * inverted file (bucket-pruned postings + ledger scalars), the
    * semantic top-`depth` from the IVF-PQ store via two-stage serving
    * ([[graft.similarity.Similarity.pqTopKRefined]]: directory-pruned
    * 8-byte ADC shortlist, then exact re-rank of the bounded
    * candidate ids — In-pushdown point lookups). This is the complete
    * production retrieval stack at 100 TB: the only per-query I/O is
    * a handful of term buckets, nProbe code cells, and `shortlist`
    * float rows. Fused ranking via the same RRF core as
    * [[hybridSearch]].
    */
  def hybridSearchServed(spark: org.apache.spark.sql.SparkSession,
      bm25Path: String, pqIndex: DataFrame, embeddings: DataFrame,
      cents: Seq[Seq[Double]],
      cb: graft.similarity.Similarity.PqCodebook,
      queryTerms: Seq[String], queryVec: Seq[Double], k: Int,
      depth: Int = 20, nProbe: Int = 2, shortlist: Int = 40,
      rrfK: Int = 60): DataFrame =
    rrfFuse(
      searchBm25FromIndex(spark, bm25Path, queryTerms, depth),
      graft.similarity.Similarity.pqTopKRefined(pqIndex, embeddings,
        cents, cb, queryVec, depth, nProbe, shortlist),
      k, rrfK)

  /** F4: highlight matched terms — presentation-level, regex-free. */
  def highlight(c: Column, q: String): Column =
    replace(c, lit(q), lit(s"<em>$q</em>"))

  def searchWithHighlight(documents: DataFrame, q: String,
      size: Int = 10): DataFrame = {
    require(q.nonEmpty, "search query must be non-empty")
    documents
      .withColumn("score", score(col("source"), col("text"), q))
      .filter(col("score") > 0)
      .select(col("doc_id"), col("score"),
        highlight(substring(col("text"), 1, 80), q).as("snippet"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(size)
  }
}
