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

  test("ImageCodec decodes a checked-in real PNG byte-for-byte") {
    // gray_4x2.png was hand-assembled (pure zlib/struct, NOT our own
    // encoder) — decoding it proves interop with external PNGs, and
    // the exact sample values prove there is no color-space drift
    val in = getClass.getResourceAsStream("/gray_4x2.png")
    val bytes = in.readAllBytes(); in.close()
    val img = Multimodal.ImageCodec.decode(bytes).get
    assert(img.getWidth === 4 && img.getHeight === 2)
    val want = Seq(Seq(0, 64, 128, 255), Seq(10, 20, 30, 40))
    for (y <- 0 until 2; x <- 0 until 4)
      assert(Multimodal.ImageCodec.gray(img, x, y) === want(y)(x), s"($x,$y)")
  }

  test("PNG encode→decode round-trips the gray raster losslessly") {
    val png = Multimodal.ImageCodec.renderGrayPng(7L, 19, 9)
    // a real PNG, not a stand-in: magic bytes present
    assert((png.take(4).map(_ & 0xff).toSeq) === Seq(0x89, 'P'.toInt, 'N'.toInt, 'G'.toInt))
    val img = Multimodal.ImageCodec.decode(png).get
    assert(img.getWidth === 19 && img.getHeight === 9)
    for (i <- 0 until 19 * 9)
      assert(Multimodal.ImageCodec.gray(img, i % 19, i / 19)
        === ((7L * 31 + i * 7) % 256).toInt, s"pixel $i")
  }

  test("real resize is exact nearest-neighbor on integer downscale") {
    val png = Multimodal.ImageCodec.renderGrayPng(3L, 16, 8)
    val src = Multimodal.ImageCodec.decode(png).get
    val out = Multimodal.ImageCodec.decode(
      Multimodal.ImageCodec.resize(src, 8, 4)).get
    assert(out.getWidth === 8 && out.getHeight === 4)
    for (y <- 0 until 4; x <- 0 until 8)
      assert(Multimodal.ImageCodec.gray(out, x, y)
        === Multimodal.ImageCodec.gray(src, 2 * x, 2 * y), s"($x,$y)")
  }

  test("feature extraction takes the REAL pixel path for decodable images") {
    import spark.implicits._
    // one real PNG asset + one text-byte 'image': the first must get
    // the pixel histogram, the second degrades to the byte fallback
    val png = Multimodal.ImageCodec.renderGrayPng(1L, 16, 8)
    val real = Multimodal.MediaAsset(0L, "image", png,
      Multimodal.MediaMeta(16, 8, 0, 0L, "png"))
    val fake = Multimodal.MediaAsset(3L, "image", "just text".getBytes("UTF-8"),
      Multimodal.MediaMeta(640, 360, 0, 0L, "png"))
    val feats = Multimodal.extractFeatures(
      spark.createDataset(Seq(real, fake)))
      .collect().map(f => f.asset_id -> f).toMap
    val img = Multimodal.ImageCodec.decode(png).get
    assert(feats(0L).histogram.toSeq
      === Multimodal.ImageCodec.grayHistogram(img).toSeq)
    assert(feats(3L).histogram.toSeq
      === Multimodal.FakeCodec.decodeToFeatures("just text".getBytes("UTF-8")).toSeq)
  }

  test("realImageStats matches a direct pixel-rule evaluation") {
    val out = Multimodal.realImageStats(
      Tables.documents(spark, sfDir).limit(25)).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out.nonEmpty)
    out.foreach { case (id, r) =>
      val w = 16 + (id % 8).toInt; val h = 8 + (id % 4).toInt
      val grays = (0 until w * h).map(i => ((id * 31 + i * 7) % 256).toInt)
      assert(r.getInt(1) === w && r.getInt(2) === h)
      assert(r.getLong(3) === w.toLong * h)
      assert(r.getLong(4) === grays.map(_.toLong).sum)
      assert(r.getLong(5) === grays.count(_ >= 128).toLong)
      assert(r.getInt(6) === grays.min && r.getInt(7) === grays.max)
    }
  }

  test("dHash is invariant under NN-resize to the 9×8 sampling grid") {
    // dHash samples exactly the 9×8 NN grid, so resizing TO that grid
    // first (a real encode→decode round trip) must not change the
    // fingerprint — the perceptual-invariance contract on the real
    // codec path
    (0L until 40L).foreach { id =>
      val w = 16 + (id % 8).toInt
      val h = 8 + (id % 4).toInt
      val img = Multimodal.ImageCodec
        .decode(Multimodal.ImageCodec.renderGrayPng(id, w, h)).get
      val small = Multimodal.ImageCodec
        .decode(Multimodal.ImageCodec.resize(img, 9, 8)).get
      assert(Multimodal.ImageCodec.dHash(img) ===
        Multimodal.ImageCodec.dHash(small), s"doc $id")
    }
  }

  test("imageHashes: identical test cards hash identically, ids 256 apart") {
    // pixel rule (id·31 + i·7) % 256 repeats exactly when Δid ≡ 0
    // (mod 256) and the dims match (256 ≡ 0 mod 8) — those pairs must
    // be hamming-0 in the fingerprint frame
    val docs = spark.range(0, 300).toDF("doc_id")
    val fps = Multimodal.imageHashes(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0L until 44L).foreach { id =>
      assert(fps(id) === fps(id + 256L), s"doc $id vs ${id + 256}")
    }
    // and a shifted id with the same dims is (generically) different
    assert((0L until 44L).count(id => fps(id) != fps(id + 8L)) > 30)
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

  test("WAV encode→decode round-trips PCM samples losslessly") {
    val samples = Array.tabulate(200)(i =>
      (((7L * 31 + i * 7) % 65536) - 32768).toShort)
    val wav = Multimodal.AudioCodec.encodeWav(samples, 8000)
    val (rate, back) = Multimodal.AudioCodec.decode(wav).get
    assert(rate === 8000)
    assert(back.toSeq === samples.toSeq)
    // edge samples: full-scale min/max survive the container
    val extremes = Array(Short.MinValue, Short.MaxValue, 0.toShort,
      (-1).toShort, 1.toShort)
    val (_, back2) = Multimodal.AudioCodec.decode(
      Multimodal.AudioCodec.encodeWav(extremes, 16000)).get
    assert(back2.toSeq === extremes.toSeq)
  }

  test("AudioCodec degrades on non-audio and non-matching profiles") {
    import Multimodal.AudioCodec
    assert(AudioCodec.decode("not audio".getBytes("UTF-8")).isEmpty)
    assert(AudioCodec.decode(Array.emptyByteArray).isEmpty)
    assert(AudioCodec.decode(null).isEmpty)
    // a real PNG is not audio either
    assert(AudioCodec.decode(
      Multimodal.ImageCodec.renderGrayPng(1L, 16, 8)).isEmpty)
    // non-matching WAV profiles are "not ours": flip the fmt fields
    // of a valid payload and the chunk walk must refuse each
    val good = AudioCodec.encodeWav(Array[Short](1, -2, 3), 8000)
    assert(AudioCodec.decode(good).isDefined)
    def mutated(off: Int, v: Int): Array[Byte] = {
      val b = good.clone(); b(off) = (v & 0xff).toByte; b
    }
    assert(AudioCodec.decode(mutated(20, 3)).isEmpty)  // IEEE float, not PCM
    assert(AudioCodec.decode(mutated(22, 2)).isEmpty)  // stereo
    assert(AudioCodec.decode(mutated(34, 8)).isEmpty)  // 8-bit
    // a truncated data chunk is a degrade, never a partial read
    assert(AudioCodec.decode(good.take(good.length - 2)).isEmpty)
  }

  test("hand-rolled WAV bytes decode identically under javax.sound") {
    // the independent-decoder check: the JDK's WaveFileReader (kept
    // OUT of the hot path — AudioSystem's provider registry
    // serializes concurrent decodes) must read our container
    // byte-for-byte to the same samples
    import javax.sound.sampled.AudioSystem
    val pcm = Array[Short](0, 32767, -32768, -1, 1, 12345, -12345)
    val wav = Multimodal.AudioCodec.encodeWav(pcm, 16000)
    val ais = AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(wav))
    val f = ais.getFormat
    assert(f.getSampleRate.toInt === 16000 && f.getChannels === 1 &&
      f.getSampleSizeInBits === 16 && !f.isBigEndian)
    val bytes = ais.readAllBytes()
    val back = Array.tabulate(bytes.length / 2)(i =>
      ((bytes(2 * i) & 0xff) | (bytes(2 * i + 1) << 8)).toShort)
    assert(back.toSeq === pcm.toSeq)
  }

  test("feature extraction takes the REAL sample path for decodable audio") {
    import spark.implicits._
    val samples = Array.tabulate(128)(i => ((i * 523) % 65536 - 32768).toShort)
    val wav = Multimodal.AudioCodec.encodeWav(samples, 8000)
    val real = Multimodal.MediaAsset(1L, "audio", wav,
      Multimodal.MediaMeta(0, 0, 8000, 16L, "wav"))
    val fake = Multimodal.MediaAsset(4L, "audio", "just text".getBytes("UTF-8"),
      Multimodal.MediaMeta(0, 0, 16000, 1000L, "wav"))
    val feats = Multimodal.extractFeatures(
      spark.createDataset(Seq(real, fake)))
      .collect().map(f => f.asset_id -> f).toMap
    assert(feats(1L).histogram.toSeq
      === Multimodal.AudioCodec.amplitudeHistogram(samples).toSeq)
    assert(feats(4L).histogram.toSeq
      === Multimodal.FakeCodec.decodeToFeatures("just text".getBytes("UTF-8")).toSeq)
  }

  test("audio envelope hash matches the direct rule; empty stream is 0") {
    (0L until 40L).foreach { id =>
      val n = 64 + (id % 64).toInt
      val vs = Array.tabulate(n)(i =>
        ((id * 31 + i * 7919) % 65536 - 32768).toShort)
      val want = (0 until 64).foldLeft(0L) { (fp, g) =>
        if (vs(((g + 1) * n) / 65) > vs((g * n) / 65)) fp | (1L << g) else fp
      }
      val wav = Multimodal.AudioCodec.renderPcmWav(id, 8000, n)
      val (_, pcm) = Multimodal.AudioCodec.decode(wav).get
      assert(Multimodal.AudioCodec.envelopeHash(pcm) === want, s"doc $id")
    }
    assert(Multimodal.AudioCodec.envelopeHash(Array.empty[Short]) === 0L)
    // sub-65-sample streams fingerprint without indexing errors
    assert(Multimodal.AudioCodec.envelopeHash(Array[Short](5, -3, 7)) !== 0L)
  }

  test("resampleAudio: exact NN map down and up, degrade passthrough") {
    import spark.implicits._
    val pcm = Array.tabulate(200)(i => ((i * 523) % 65536 - 32768).toShort)
    val wav = Multimodal.AudioCodec.encodeWav(pcm, 16000)
    val real = Multimodal.MediaAsset(1L, "audio", wav,
      Multimodal.MediaMeta(0, 0, 16000, 12L, "wav"))
    val poison = Multimodal.MediaAsset(2L, "audio",
      "not audio".getBytes("UTF-8"),
      Multimodal.MediaMeta(0, 0, 16000, 1000L, "wav"))
    val video = Multimodal.MediaAsset(3L, "video", "vvv".getBytes("UTF-8"),
      Multimodal.MediaMeta(640, 360, 0, 2000L, "mp4"))
    val out = Multimodal.resampleAudio(
      spark.createDataset(Seq(real, poison, video)), 8000)
      .collect().map(a => a.asset_id -> a).toMap
    // downsample halves the sample count via the explicit NN map
    val (rate, down) = Multimodal.AudioCodec.decode(out(1L).content).get
    assert(rate === 8000 && out(1L).meta.sampleRate === 8000)
    assert(down.length === 100)
    down.zipWithIndex.foreach { case (v, i) =>
      assert(v === pcm((i.toLong * 200 / 100).toInt), s"sample $i")
    }
    // upsample repeats samples, still exact
    val (_, up) = Multimodal.AudioCodec.decode(
      Multimodal.resampleAudio(spark.createDataset(Seq(real)), 32000)
        .head().content).get
    assert(up.length === 400)
    up.zipWithIndex.foreach { case (v, i) =>
      assert(v === pcm((i.toLong * 200 / 400).toInt), s"sample $i")
    }
    // poison audio and non-audio rows pass through untouched
    assert(out(2L).content.toSeq === poison.content.toSeq)
    assert(out(2L).meta === poison.meta)
    assert(out(3L).content.toSeq === video.content.toSeq)
    intercept[IllegalArgumentException] {
      Multimodal.resampleAudio(spark.createDataset(Seq(real)), 0)
    }
  }

  test("normalizeAudio: exact integer peak scale, silence + degrade passthrough") {
    import spark.implicits._
    import Multimodal.AudioCodec
    // known stream: peak 20000, mixed signs, a small value that
    // scales to zero — every output sample checked against the
    // sign-peeled integer rule
    val pcm = Array[Short](-20000, 10000, -1, 0, 1, 19999)
    val direct = AudioCodec.normalize(pcm, 30000)
    assert(direct.toSeq === Seq[Short](-30000, 15000, -1, 0, 1, 29998))
    assert(direct.toSeq === pcm.toSeq.map { v =>
      val s = math.abs(v.toInt).toLong * 30000 / 20000
      (if (v < 0) -s else s).toShort
    })
    // Short.MinValue peak: |−32768| is the peak, never clips
    val extreme = AudioCodec.normalize(Array[Short](Short.MinValue, 32767), 32767)
    assert(extreme.toSeq === Seq[Short](-32767, 32766))
    // silence has no direction — unchanged
    assert(AudioCodec.normalize(Array[Short](0, 0), 30000).toSeq === Seq[Short](0, 0))
    intercept[IllegalArgumentException] { AudioCodec.normalize(pcm, 0) }
    intercept[IllegalArgumentException] { AudioCodec.normalize(pcm, 32768) }
    // asset path: real audio rewrites through the codec, poison and
    // non-audio rows pass through untouched
    val wav = AudioCodec.encodeWav(pcm, 16000)
    val real = Multimodal.MediaAsset(1L, "audio", wav,
      Multimodal.MediaMeta(0, 0, 16000, 12L, "wav"))
    val poison = Multimodal.MediaAsset(2L, "audio",
      "not audio".getBytes("UTF-8"),
      Multimodal.MediaMeta(0, 0, 16000, 1000L, "wav"))
    val video = Multimodal.MediaAsset(3L, "video", "vvv".getBytes("UTF-8"),
      Multimodal.MediaMeta(640, 360, 0, 2000L, "mp4"))
    val out = Multimodal.normalizeAudio(
      spark.createDataset(Seq(real, poison, video)), 30000)
      .collect().map(a => a.asset_id -> a).toMap
    val (rate, back) = AudioCodec.decode(out(1L).content).get
    assert(rate === 16000)
    assert(back.toSeq === direct.toSeq)
    assert(out(2L).content.toSeq === poison.content.toSeq)
    assert(out(3L).content.toSeq === video.content.toSeq)
  }

  test("realAudioNormalizeStats matches the direct scale-rule evaluation") {
    val out = Multimodal.realAudioNormalizeStats(
      Tables.documents(spark, sfDir).limit(25), 30000).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out.nonEmpty)
    out.foreach { case (id, r) =>
      val n = 64 + (id % 64).toInt
      val vs = (0 until n).map(i => ((id * 31 + i * 7919) % 65536 - 32768).toInt)
      val peak = vs.map(math.abs).max
      val ws = vs.map { v =>
        val s = math.abs(v).toLong * 30000 / peak
        (if (v < 0) -s else s).toInt
      }
      assert(r.getInt(1) === peak)
      assert(r.getLong(2) === n.toLong)
      assert(r.getLong(3) === ws.map(_.toLong).sum)
      assert(r.getLong(4) === ws.count(_ > 0).toLong)
      assert(r.getInt(5) === ws.min && r.getInt(6) === ws.max)
      val crossings = ws.sliding(2).count(p => (p(0) < 0) != (p(1) < 0))
      assert(r.getLong(7) === crossings.toLong, s"doc $id")
    }
  }

  test("realAudioStats matches a direct sample-rule evaluation") {
    val out = Multimodal.realAudioStats(
      Tables.documents(spark, sfDir).limit(25)).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out.nonEmpty)
    out.foreach { case (id, r) =>
      val n = 64 + (id % 64).toInt
      val vs = (0 until n).map(i => ((id * 31 + i * 7919) % 65536 - 32768).toInt)
      assert(r.getInt(1) === 8000)
      assert(r.getLong(2) === n.toLong)
      assert(r.getLong(3) === vs.map(_.toLong).sum)
      assert(r.getLong(4) === vs.count(_ > 0).toLong)
      assert(r.getInt(5) === vs.min && r.getInt(6) === vs.max)
      val crossings = vs.sliding(2).count(p => (p(0) < 0) != (p(1) < 0))
      assert(r.getLong(7) === crossings.toLong, s"doc $id")
    }
  }

  test("IMA ADPCM: per-block-constant class round-trips bit-exactly; " +
      "arbitrary signals decode length-exact with adaptive-bounded error") {
    import Multimodal.AudioCodec
    val spb = AudioCodec.adpcmSamplesPerBlock(12)
    assert(spb === 17)
    // the exactly-representable class: block headers store sample 0
    // verbatim, zero deltas at step index 0 reconstruct +0
    val tone = AudioCodec.renderBlockTonePcm(7L, spb, 4)
    val (rate, back) = AudioCodec.decode(
      AudioCodec.encodeAdpcmWav(tone, 8000, 12)).get
    assert(rate === 8000)
    assert(back.toSeq === tone.toSeq)
    // full-scale constants survive too (clamp edges)
    val edges = Array.fill(spb)(Short.MinValue) ++
      Array.fill(spb)(Short.MaxValue) ++ Array.fill(spb)(0.toShort)
    assert(AudioCodec.decode(AudioCodec.encodeAdpcmWav(edges, 16000, 12))
      .get._2.toSeq === edges.toSeq)
    // a slow ramp is LOSSY but tracked: length exact (the fact chunk
    // trims the padded final block — 40 is not a multiple of 17),
    // error bounded once the step adapts
    val ramp = Array.tabulate(40)(i => (i * 3 - 60).toShort)
    val (_, dec) = AudioCodec.decode(
      AudioCodec.encodeAdpcmWav(ramp, 8000, 12)).get
    assert(dec.length === ramp.length)
    val maxErr = ramp.indices.map(i => math.abs(dec(i) - ramp(i))).max
    assert(maxErr <= 64, s"ramp error $maxErr")
    // larger blockAlign profile round-trips the constant class too
    val tone2 = AudioCodec.renderBlockTonePcm(12L,
      AudioCodec.adpcmSamplesPerBlock(256), 2)
    assert(AudioCodec.decode(AudioCodec.encodeAdpcmWav(tone2, 8000, 256))
      .get._2.toSeq === tone2.toSeq)
  }

  test("ADPCM degrades on malformed geometry, alien profiles, and " +
      "out-of-domain block headers") {
    import Multimodal.AudioCodec
    val good = AudioCodec.encodeAdpcmWav(
      AudioCodec.renderBlockTonePcm(3L, 17, 2), 8000, 12)
    assert(AudioCodec.decode(good).isDefined)
    def mutated(off: Int, v: Int): Array[Byte] = {
      val b = good.clone(); b(off) = (v & 0xff).toByte; b
    }
    assert(AudioCodec.decode(mutated(22, 2)).isEmpty)  // stereo ADPCM
    assert(AudioCodec.decode(mutated(38, 99)).isEmpty) // spb ≠ geometry
    assert(AudioCodec.decode(mutated(62, 120)).isEmpty) // step index > 88
    // a fact chunk claiming more samples than the blocks hold is an
    // internally inconsistent container — degrade, not partial read
    assert(AudioCodec.decode(mutated(49, 0xff)).isEmpty)
    // data not a whole number of blocks: truncation, never partial
    assert(AudioCodec.decode(good.take(good.length - 2)).isEmpty)
    // PCM payloads still decode through the same walk (profile routing)
    assert(AudioCodec.decode(
      AudioCodec.encodeWav(Array[Short](1, -2, 3), 8000)).isDefined)
  }

  test("realAudioStatsMixed: PCM and ADPCM containers are " +
      "behaviorally indistinguishable through the shared decode walk") {
    val docs = Tables.documents(spark, sfDir).limit(20)
    val mixed = Multimodal.realAudioStatsMixed(docs).collect()
      .map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    val adpcm = Multimodal.realAudioStatsAdpcm(docs).collect()
      .map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    assert(mixed === adpcm) // same stats whichever container carried them
  }

  test("realAudioStatsAdpcm matches the block-rule evaluation") {
    val out = Multimodal.realAudioStatsAdpcm(
      Tables.documents(spark, sfDir).limit(25)).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out.nonEmpty)
    out.foreach { case (id, r) =>
      val n = 17 * (2 + (id % 4).toInt)
      val vs = (0 until n).map(i =>
        ((id * 31 + (i / 17) * 7919) % 65536 - 32768).toInt)
      assert(r.getInt(1) === 8000)
      assert(r.getLong(2) === n.toLong)
      assert(r.getLong(3) === vs.map(_.toLong).sum)
      assert(r.getLong(4) === vs.count(_ > 0).toLong)
      assert(r.getInt(5) === vs.min && r.getInt(6) === vs.max)
      val crossings = vs.sliding(2).count(p => (p(0) < 0) != (p(1) < 0))
      assert(r.getLong(7) === crossings.toLong, s"doc $id")
    }
  }

  test("AVI encode→demux round-trips frames losslessly incl. stride pads") {
    import Multimodal.VideoCodec
    // widths 8..12 cover stride pad 0 (8, 12) and pads 1..3 (9, 10, 11)
    (8 to 12).foreach { w =>
      val h = 8
      val frames = Array.tabulate(3)(f =>
        Array.tabulate(w * h)(p => (f * 101 + p * 7919) % 256))
      val avi = VideoCodec.encodeAvi(frames, w, h, fps = 4)
      val clip = VideoCodec.decode(avi).getOrElse(fail(s"w=$w no decode"))
      assert(clip.width === w && clip.height === h)
      assert(clip.microSecPerFrame === 250000L)
      assert(clip.frames.length === 3)
      clip.frames.zip(frames).foreach { case (got, want) =>
        assert(got.toSeq === want.toSeq, s"w=$w")
      }
    }
    // 1×1 single-frame extreme values survive the container
    val tiny = VideoCodec.decode(
      VideoCodec.encodeAvi(Array(Array(0), Array(255)), 1, 1, fps = 25)).get
    assert(tiny.microSecPerFrame === 40000L)
    assert(tiny.frames.map(_.head).toSeq === Seq(0, 255))
    intercept[IllegalArgumentException] {
      VideoCodec.encodeAvi(Array(Array(1, 2)), 3, 1, fps = 4) // wrong length
    }
  }

  test("MJPEG-in-AVI: uniform frames round-trip bit-exactly; profile " +
      "and corruption degrade") {
    import Multimodal.VideoCodec
    // uniform frames at every boundary value, odd widths (odd JPEG
    // chunk lengths exercise the RIFF even-padding on the walk)
    (8 to 12).foreach { w =>
      val h = 8
      val frames = Array.tabulate(4)(f =>
        Array.fill(w * h)(Seq(0, 127, 128, 255)(f)))
      val avi = VideoCodec.encodeMjpegAvi(frames, w, h, fps = 4)
      val clip = VideoCodec.decode(avi).getOrElse(fail(s"w=$w no decode"))
      assert(clip.width === w && clip.height === h)
      assert(clip.microSecPerFrame === 250000L)
      assert(clip.frames.length === 4)
      clip.frames.zip(frames).foreach { case (got, want) =>
        assert(got.toSeq === want.toSeq, s"w=$w")
      }
    }
    // the render rule's own clips round-trip to the rule
    val clip = VideoCodec.decode(VideoCodec.renderMjpegAvi(13L)).get
    assert(clip.frames.zipWithIndex.forall { case (fr, f) =>
      fr.forall(_ == ((13L * 31 + f * 101) % 256).toInt)
    })
    // a corrupted JPEG frame degrades the whole clip (not ours)
    val avi = VideoCodec.renderMjpegAvi(13L)
    val corrupt = avi.clone()
    // find the first 00dc chunk and damage its JPEG payload
    val movi = {
      var i = 0
      while (!(corrupt(i) == '0'.toByte && corrupt(i + 1) == '0'.toByte &&
        corrupt(i + 2) == 'd'.toByte && corrupt(i + 3) == 'c'.toByte)) i += 1
      i
    }
    // zero the SOI marker — decoders tolerate mid-stream damage, but
    // a stream that doesn't start FFD8 is definitively not a JPEG
    corrupt(movi + 8) = 0x00.toByte
    corrupt(movi + 9) = 0x00.toByte
    assert(VideoCodec.decode(corrupt).isEmpty)
    // an unknown compression fourcc is not ours: flip 'MJPG' -> 'XJPG'
    val alien = avi.clone()
    var j = 0
    var flipped = false
    while (j < alien.length - 4 && !flipped) {
      if (alien(j) == 'M'.toByte && alien(j + 1) == 'J'.toByte &&
          alien(j + 2) == 'P'.toByte && alien(j + 3) == 'G'.toByte) {
        alien(j) = 'X'.toByte; flipped = true // strh fccHandler first
      }
      j += 1
    }
    assert(flipped)
    // the strf biCompression (a second MJPG occurrence) still says
    // MJPG for `alien` — flip it too so the profile is truly unknown
    var k = j
    var flipped2 = false
    while (k < alien.length - 4 && !flipped2) {
      if (alien(k) == 'M'.toByte && alien(k + 1) == 'J'.toByte &&
          alien(k + 2) == 'P'.toByte && alien(k + 3) == 'G'.toByte) {
        alien(k) = 'X'.toByte; flipped2 = true
      }
      k += 1
    }
    assert(flipped2)
    assert(VideoCodec.decode(alien).isEmpty)
    // BI_RGB clips still decode through the same walker
    assert(VideoCodec.decode(VideoCodec.renderGrayAvi(13L)).isDefined)
  }

  test("realVideoStatsMjpeg matches the constant-frame rule") {
    val docs = Tables.documents(spark, sfDir).limit(40)
    val got = Multimodal.realVideoStatsMjpeg(docs).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val id = r.getLong(0)
      val w = 8 + (id % 5).toInt; val h = 8; val nF = 4 + (id % 4).toInt
      val vals = (0 until nF).map(f => ((id * 31 + f * 101) % 256).toInt)
      assert(r.getInt(1) === w && r.getInt(2) === h && r.getInt(3) === nF)
      assert(r.getLong(4) === nF.toLong * w * h)
      assert(r.getLong(5) === vals.map(_.toLong * w * h).sum)
      assert(r.getLong(6) === vals.filter(_ >= 128).size.toLong * w * h)
      assert(r.getInt(7) === vals.min && r.getInt(8) === vals.max)
    }
  }

  test("VideoCodec degrades on non-video payloads and truncation") {
    import Multimodal.VideoCodec
    assert(VideoCodec.decode("not a video".getBytes("UTF-8")).isEmpty)
    assert(VideoCodec.decode(Array.emptyByteArray).isEmpty)
    assert(VideoCodec.decode(null).isEmpty)
    // other real containers are not this profile
    assert(VideoCodec.decode(
      Multimodal.ImageCodec.renderGrayPng(1L, 16, 8)).isEmpty)
    assert(VideoCodec.decode(
      Multimodal.AudioCodec.renderPcmWav(1L, 8000, 64)).isEmpty)
    // a truncated AVI (cut mid-frame) degrades instead of throwing
    val avi = VideoCodec.renderGrayAvi(7L)
    assert(VideoCodec.decode(avi.take(avi.length / 2)).isEmpty)
    // RIFF magic with garbage inside degrades too
    val garbage = avi.clone()
    garbage(20) = 'X'.toByte // corrupt the avih fourcc region
    // decode either still parses (header intact) or degrades — never throws
    VideoCodec.decode(garbage)
  }

  test("video envelope hash matches the direct rule over the render rule") {
    import Multimodal.VideoCodec
    (0L until 40L).foreach { id =>
      val w = 8 + (id % 5).toInt; val h = 8
      val nF = 4 + (id % 4).toInt
      val n = nF * w * h
      val seq = (0 until n).map(j =>
        ((id * 31 + (j / (w * h)) * 101 + (j % (w * h)) * 7919) % 256).toInt)
      val want = (0 until 64).foldLeft(0L) { (fp, g) =>
        if (seq(((g + 1) * n) / 65) > seq((g * n) / 65)) fp | (1L << g) else fp
      }
      val clip = VideoCodec.decode(VideoCodec.renderGrayAvi(id)).get
      assert(VideoCodec.envelopeHash(clip) === want, s"doc $id")
    }
    // fingerprints discriminate across ids (the audio prime-step lesson)
    val hashes = (0L until 40L).map(id =>
      VideoCodec.envelopeHash(
        VideoCodec.decode(VideoCodec.renderGrayAvi(id)).get))
    assert(hashes.distinct.size > 30)
  }

  test("realVideoStats matches a direct pixel-rule evaluation") {
    val out = Multimodal.realVideoStats(
      Tables.documents(spark, sfDir).limit(25)).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out.nonEmpty)
    out.foreach { case (id, r) =>
      val w = 8 + (id % 5).toInt; val h = 8
      val nF = 4 + (id % 4).toInt
      val px = for (f <- 0 until nF; p <- 0 until w * h)
        yield ((id * 31 + f * 101 + p * 7919) % 256).toInt
      assert(r.getInt(1) === w && r.getInt(2) === h)
      assert(r.getInt(3) === nF)
      assert(r.getLong(4) === px.size.toLong)
      assert(r.getLong(5) === px.map(_.toLong).sum)
      assert(r.getLong(6) === px.count(_ >= 128).toLong)
      assert(r.getInt(7) === px.min && r.getInt(8) === px.max, s"doc $id")
    }
  }

  test("realVideoFrames samples by index with decoded-header timestamps") {
    val rows = Multimodal.realVideoFrames(
      Tables.documents(spark, sfDir).limit(10), every = 2).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getLong(0); val f = r.getInt(1)
      assert(f % 2 === 0)
      assert(r.getLong(2) === f * 250L) // 4 fps → 250 ms/frame, from avih
      val w = 8 + (id % 5).toInt
      val want = (0 until w * 8).map(p =>
        ((id * 31 + f * 101 + p * 7919) % 256).toLong).sum
      assert(r.getLong(3) === want, s"doc $id frame $f")
    }
    // every doc contributes ceil(nF/2) frames
    val byDoc = rows.groupBy(_.getLong(0))
    byDoc.foreach { case (id, fs) =>
      val nF = 4 + (id % 4).toInt
      assert(fs.length === (nF + 1) / 2, s"doc $id")
    }
  }

  test("video resize is exact per-frame NN + re-mux at the source rate") {
    import spark.implicits._
    import Multimodal.VideoCodec
    val avi = VideoCodec.renderGrayAvi(9L) // 12×8, 5 frames
    val src = VideoCodec.decode(avi).get
    val real = Multimodal.MediaAsset(1L, "video", avi,
      Multimodal.MediaMeta(12, 8, 0, 1250L, "avi"))
    val poison = Multimodal.MediaAsset(2L, "video",
      "not avi".getBytes("UTF-8"),
      Multimodal.MediaMeta(640, 360, 0, 2000L, "mp4"))
    val out = Multimodal.resizeAssets(
      spark.createDataset(Seq(real, poison)), 6, 4)
      .collect().map(a => a.asset_id -> a).toMap
    val back = VideoCodec.decode(out(1L).content).get
    assert(back.width === 6 && back.height === 4)
    assert(back.microSecPerFrame === 250000L) // source rate survives
    assert(back.frames.length === src.frames.length)
    back.frames.zip(src.frames).foreach { case (got, orig) =>
      (0 until 4).foreach { y =>
        (0 until 6).foreach { x =>
          assert(got(y * 6 + x) ===
            orig((y * 8 / 4) * 12 + (x * 12 / 6)), s"($x,$y)")
        }
      }
    }
    assert(out(1L).meta.width === 6 && out(1L).meta.height === 4)
    // undecodable video payloads keep the fake byte resize
    assert(out(2L).content.toSeq ===
      Multimodal.FakeCodec.resize(poison.content, 6, 4).toSeq)
  }

  test("feature extraction takes the REAL demux path for decodable video") {
    import spark.implicits._
    import Multimodal.VideoCodec
    val avi = VideoCodec.renderGrayAvi(3L)
    val real = Multimodal.MediaAsset(1L, "video", avi,
      Multimodal.MediaMeta(11, 8, 0, 1000L, "avi"))
    val poison = Multimodal.MediaAsset(2L, "video",
      "just text".getBytes("UTF-8"),
      Multimodal.MediaMeta(640, 360, 0, 2000L, "mp4"))
    val feats = Multimodal.extractFeatures(
      spark.createDataset(Seq(real, poison)))
      .collect().map(f => f.asset_id -> f).toMap
    assert(feats(1L).histogram.toSeq ===
      VideoCodec.grayHistogram(VideoCodec.decode(avi).get).toSeq)
    assert(math.abs(feats(1L).histogram.sum - 1.0) < 1e-9)
    assert(feats(2L).histogram.toSeq ===
      Multimodal.FakeCodec.decodeToFeatures("just text".getBytes("UTF-8")).toSeq)
  }
}
