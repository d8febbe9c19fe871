package graft.multimodal

import graft.{SparkSpec, Tables}

class MultimodalSpec extends SparkSpec {

  lazy val assets = Multimodal.syntheticAssets(Tables.documents(spark, sfDir))

  test("asset synthesis: kinds partition the corpus, metadata typed") {
    val byKind = assets.collect().groupBy(_.kind)
    assert(byKind.keySet === Set("image", "audio", "video"))
    byKind("image").foreach(a => assert(a.meta.durationMs === 0L))
    byKind("audio").foreach(a => assert(a.meta.sampleRate === 16000))
    byKind("video").foreach(a => assert(a.meta.durationMs >= 1000L))
  }

  test("feature extraction: histogram is a distribution, binary dies here") {
    val feats = Multimodal.extractFeatures(assets).collect()
    assert(feats.length === assets.count())
    feats.foreach { f =>
      assert(f.histogram.length === 16)
      assert(math.abs(f.histogram.sum - 1.0) < 1e-9)
      assert(f.n_bytes > 0)
    }
  }

  test("decode stub is deterministic") {
    val a = Multimodal.FakeCodec.decodeToFeatures("same bytes".getBytes)
    val b = Multimodal.FakeCodec.decodeToFeatures("same bytes".getBytes)
    assert(a.toSeq === b.toSeq)
  }

  test("frame sampling explodes videos only, one row per interval") {
    val frames = Multimodal.sampleFrames(assets, 1000L).collect()
    val videos = assets.collect().filter(_.kind == "video")
    assert(frames.map(_.asset_id).toSet === videos.map(_.asset_id).toSet)
    val perAsset = frames.groupBy(_.asset_id)
    videos.foreach { v =>
      assert(perAsset(v.asset_id).length === math.max(1, (v.meta.durationMs / 1000L).toInt))
    }
    // offsets are the sampling grid
    val f0 = perAsset(videos.head.asset_id).sortBy(_.frame_idx)
    assert(f0.map(_.offset_ms).toSeq === f0.indices.map(_ * 1000L))
  }

  test("resize stub produces bounded deterministic output") {
    val r1 = Multimodal.FakeCodec.resize("content".getBytes, 640, 360)
    val r2 = Multimodal.FakeCodec.resize("content".getBytes, 640, 360)
    assert(r1.toSeq === r2.toSeq)
    assert(r1.length <= 4096)
  }

  test("resize stage rewrites payload + dimensions, keeps row count") {
    val assets = Multimodal.syntheticAssets(
      graft.Tables.documents(spark, sfDir).limit(30))
    val resized = Multimodal.resizeAssets(assets, 320, 180).collect()
    assert(resized.length === assets.count())
    resized.foreach { a =>
      assert(a.meta.width === 320 && a.meta.height === 180)
      assert(a.content.length <= 4096) // stub's bounded output
    }
    // deterministic: same input → same bytes
    val again = Multimodal.resizeAssets(assets, 320, 180).collect()
    assert(resized.map(_.content.toSeq).toSeq === again.map(_.content.toSeq).toSeq)
    intercept[IllegalArgumentException] {
      Multimodal.resizeAssets(assets, 0, 180)
    }
  }
}
