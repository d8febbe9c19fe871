package graft.tools

import org.apache.spark.sql.functions._

/** Decompose q_dedup_incremental wall time: one-time signature-index
  * build (the sigIndexCache localCheckpoint) vs the per-increment
  * probe — the r7 verdict's #1 ask (3.09 s driver tail in the round
  * that de-shuffled the probe).
  * Usage: runMain graft.tools.ProfileIncremental <sfDir>
  */
object ProfileIncremental {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = DevSession.local(32)
    import graft.dedup.Dedup

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $label%-44s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }

    spark.range(1000000L).selectExpr("sum(id)").collect()

    val docs = graft.Tables.documents(spark, sfDir).select("doc_id", "text")
    val ws = split(col("text"), " ", -1)
    val newBatch = docs.filter(col("doc_id") % 5 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"),
        concat_ws(" ", slice(ws, lit(1), greatest(size(ws) - 2, lit(1)))).as("text"))

    (1 to 3).foreach { pass =>
      println(s"--- pass $pass ---")
      val index = time("index build (sign + localCheckpoint)") {
        Dedup.minhashSignatures(docs, "doc_id", "text", hashMode = "md5")
          .localCheckpoint(true)
      }
      time("probe: full dedupIncrement") {
        Dedup.dedupIncrement(newBatch, index, "doc_id", "text",
          hashMode = "md5")
          .select(col("doc_id")).orderBy(col("doc_id")).count()
      }
      // decomposed probe stages
      val pairs = Dedup.incrementalNearDuplicatesManaged(newBatch, index,
        "doc_id", "text", hashMode = "md5")
      time("probe: pairs only (managed)") { pairs.df.count() }
      pairs.release()
      // finer decomposition mirroring incrementalNearDuplicatesManaged
      locally {
        import graft.plans.TextHashFunctions
        val newSigs = Dedup.minhashSignatures(newBatch, "doc_id", "text",
          hashMode = "md5").persist()
        time("  stage: newSigs materialize") { newSigs.count() }
        def explodeBuckets(sigs: org.apache.spark.sql.DataFrame, isNew: Boolean) = sigs
          .select(col("id"), lit(isNew).as("is_new"),
            posexplode(Dedup.bandHashesMd5(col("sig"), 16, 4)))
          .select(col("id"), col("is_new"), col("pos").as("band"),
            col("col").as("bucket"))
        val all = explodeBuckets(index, isNew = false)
          .union(explodeBuckets(newSigs, isNew = true))
        val big = all.groupBy(col("band"), col("bucket"))
          .agg(count(lit(1)).as("bsz"))
          .filter(col("bsz") > 100)
          .select(col("band"), col("bucket"))
        time("  stage: big (bucket-size agg)") { big.count() }
        val capped = all.join(broadcast(big), Seq("band", "bucket"), "left_anti")
        val newCapped = explodeBuckets(newSigs, isNew = true)
          .join(broadcast(big), Seq("band", "bucket"), "left_anti")
          .select(col("band"), col("bucket"), col("id"))
        val candidates = capped.as("l")
          .join(broadcast(newCapped).as("r"),
            col("l.band") === col("r.band") &&
            col("l.bucket") === col("r.bucket") &&
            (!col("l.is_new") || col("l.id") < col("r.id")) &&
            col("l.id") =!= col("r.id"))
          .select(col("l.id").as("id_a"), col("r.id").as("id_b"))
          .distinct()
        time("  stage: candidates distinct") { candidates.count() }
        val cachedCand = candidates.persist()
        cachedCand.count()
        val texts = index.select(col("id"), col("text"))
          .union(newSigs.select(col("id"), col("text")))
        val verified = cachedCand
          .join(texts.withColumnRenamed("id", "id_a").withColumnRenamed("text", "text_a"), "id_a")
          .join(texts.withColumnRenamed("id", "id_b").withColumnRenamed("text", "text_b"), "id_b")
          .withColumn("jaccard", Dedup.jaccard(
            Dedup.shingles(col("text_a"), 3), Dedup.shingles(col("text_b"), 3)))
          .filter(col("jaccard") >= 0.5)
        time("  stage: verify (given cached cand)") { verified.count() }
        cachedCand.unpersist(false)
        newSigs.unpersist(false)
      }
      index.unpersist()
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
