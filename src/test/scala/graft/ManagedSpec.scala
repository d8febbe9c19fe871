package graft

import graft.dedup.Dedup
import graft.ops.SearchOps
import graft.similarity.Similarity

class ManagedSpec extends SparkSpec {

  // suites share one session, so other specs' caches may be live —
  // assert relatively: release leaves no NEW persisted RDDs behind
  private def persistedIds: Set[Int] =
    spark.sparkContext.getPersistentRDDs.keySet.toSet

  private def assertNoLeak[T](body: => T): T = {
    val before = persistedIds
    val out = body
    val leaked = persistedIds -- before
    assert(leaked.isEmpty, s"released run left persisted RDDs: $leaked")
    out
  }

  test("managed search releases the match-set cache after the action") {
    val docs = Tables.documents(spark, sfDir)
    val rows = assertNoLeak {
      SearchOps.searchManaged(docs, "merge", size = 5)(_.collect())
    }
    assert(rows.nonEmpty)
  }

  test("managed minhash near-dup releases the signature cache") {
    val docs = Tables.documents(spark, sfDir)
    assertNoLeak {
      Dedup.minhashNearDuplicatesManaged(docs, "doc_id", "text")(_.count())
    }
  }

  test("managed embedding near-dup releases the bucket cache") {
    val emb = Tables.embeddings(spark, sfDir)
    assertNoLeak {
      Similarity.embeddingNearDuplicatesManaged(emb, 0.999)(_.count())
    }
  }

  test("release is idempotent and fires even when the action throws") {
    val docs = Tables.documents(spark, sfDir)
    assertNoLeak {
      val m = SearchOps.searchManaged(docs, "merge", size = 5)
      intercept[RuntimeException] { m(_ => throw new RuntimeException("boom")) }
      m.release() // second release is a no-op
    }
  }

  test("unmanaged variants still return the same rows as managed") {
    val docs = Tables.documents(spark, sfDir)
    val plain = SearchOps.search(docs, "merge", size = 5).collect()
    val managed = SearchOps.searchManaged(docs, "merge", size = 5)(_.collect())
    assert(plain.map(_.toString).toSeq === managed.map(_.toString).toSeq)
    spark.catalog.clearCache() // the plain variant's cache is session-scoped
  }

  test("autoReleased frees the pipeline caches after the first action") {
    // the one-shot convenience lifecycle behind the plain containment
    // wrapper and dedupIncrement: the release listener fires on the
    // ASYNC ExecutionListenerBus, so poll (the curate()-spec pattern)
    val docs = Tables.documents(spark, sfDir).limit(60)
    val before = persistedIds
    val out = Dedup
      .containmentNearDuplicatesManaged(docs, "doc_id", "text",
        hashMode = "md5")
      .autoReleased()
    assert(out.count() >= 0)
    val deadline = System.currentTimeMillis + 15000
    while ((persistedIds -- before).nonEmpty &&
      System.currentTimeMillis < deadline) Thread.sleep(50)
    assert((persistedIds -- before).isEmpty,
      "autoReleased left pipeline caches persisted after the action")
  }
}
