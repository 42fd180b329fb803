package graft

import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal

/** Multimodal plumbing contract: schema, metadata, batch-shaped execution,
  * determinism of the stub codec, frame sampling.
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val media = Multimodal.attach(
    Seq((1L, "hello world"), (2L, ""), (3L, "another payload"))
      .toDF("id", "payload")
      .select(col("id"), encode(col("payload"), "UTF-8").as("bytes")),
    "id", "bytes", kind = "image", mime = "image/fake")

  test("attach: binary + typed metadata (mime, size, checksum)") {
    val rows = media.collect().sortBy(_.media_id)
    assert(rows.map(_.meta.mime).forall(_ == "image/fake"))
    assert(rows(0).meta.sizeBytes == 11)
    assert(rows(1).meta.sizeBytes == 0)
    assert(rows(0).meta.checksum.nonEmpty)
  }

  test("extractFeatures: fixed feature dim, deterministic, empty-safe") {
    val f1 = Multimodal.extractFeatures(media).collect().sortBy(_.media_id)
    val f2 = Multimodal.extractFeatures(media).collect().sortBy(_.media_id)
    assert(f1.map(_.meanIntensity).toSeq == f2.map(_.meanIntensity).toSeq)
    assert(f1.forall(_.features.length == Multimodal.featureDim))
    assert(f1(1).meanIntensity == 0.0) // empty payload
    assert(f1(0).width >= 64 && f1(0).width < 1280)
  }

  test("batch shape: small batchSize still yields every record exactly once") {
    val out = Multimodal.extractFeatures(media, batchSize = 1)
      .select("media_id").as[Long].collect().sorted
    assert(out.toSeq == Seq(1L, 2L, 3L))
  }

  test("frameOffsets: every-N sampling across the duration") {
    val df = Seq((1L, 1000)).toDF("id", "duration_ms")
    val offs = Multimodal.frameOffsets(df, "duration_ms", 250)
      .select("frame_offsets_ms").as[Seq[Long]].collect()(0)
    assert(offs == Seq(0L, 250L, 500L, 750L, 1000L))
  }

  // ---- real-codec goldens on synthetic PNGs --------------------------

  /** PNG bytes for a w x h image painted by (x, y) => rgb. */
  private def png(w: Int, h: Int)(paint: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, paint(x, y))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private def lum(rgb: Int): Double =
    0.299 * ((rgb >> 16) & 0xff) + 0.587 * ((rgb >> 8) & 0xff) +
      0.114 * (rgb & 0xff)

  test("imageio codec: true dimensions + luminance from decoded pixels") {
    val grey = 0x808080 // r=g=b=128 → luminance exactly formula(128)
    val mediaPng = Multimodal.attach(
      Seq((10L, png(20, 10)((_, _) => grey))).toDF("id", "bytes"),
      "id", "bytes", kind = "image", mime = "image/png")
    val f = Multimodal.extractFeatures(mediaPng).collect()(0)
    assert((f.width, f.height) == ((20, 10)))
    assert(f.meanIntensity == lum(grey))
    // uniform image → every 4x4 grid cell carries the same normalized value
    assert(f.features.toSeq == Seq.fill(16)((lum(grey) / 255.0).toFloat))
  }

  test("imageio codec: grid features localize a half-black half-white image") {
    val bytes = png(16, 16)((x, _) => if (x < 8) 0x000000 else 0xffffff)
    val m = Multimodal.attach(Seq((11L, bytes)).toDF("id", "bytes"),
      "id", "bytes", kind = "image", mime = "image/png")
    val f = Multimodal.extractFeatures(m).collect()(0)
    assert(f.meanIntensity == lum(0xffffff) / 2)
    // left two grid columns black, right two white, every row band
    val feats = f.features
    for (cy <- 0 until 4; cx <- 0 until 4) {
      val expected = if (cx < 2) 0.0f else (lum(0xffffff) / 255.0).toFloat
      assert(feats(cy * 4 + cx) == expected, s"cell ($cx,$cy)")
    }
  }

  test("imageio codec: undecodable bytes fall back to the stub, not an error") {
    val junk = "not an image".getBytes("UTF-8")
    val (w, h, mean, feats) = Multimodal.ImageIoCodec.decode(junk)
    assert((w, h, mean, feats.toSeq) == {
      val (sw, sh, sm, sf) = Multimodal.MediaCodecStub.decode(junk)
      (sw, sh, sm, sf.toSeq)
    })
  }

  test("resizeToFit really resizes decodable images (re-decoded dims match)") {
    val bytes = png(200, 100)((_, _) => 0x406080)
    val m = Multimodal.attach(Seq((12L, bytes)).toDF("id", "bytes"),
      "id", "bytes", kind = "image", mime = "image/png")
    val r = Multimodal.resizeToFit(m, maxDim = 50).collect()(0)
    assert((r.width, r.height) == ((50, 25)))
    val redecoded = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(r.content))
    assert((redecoded.getWidth, redecoded.getHeight) == ((50, 25)))
  }

  // ---- real audio codec (javax.sound.sampled) on synthetic WAVs ------

  /** Closed-form WAV: PCM16 mono, constant amplitude A → RMS exactly
    * A/32768 and every envelope bin |A|/32768. */
  private def constWav(nSamples: Int, amp: Short,
                       sampleRate: Int = 8000): Array[Byte] = {
    val dataLen = nSamples * 2
    val out = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1)
      .putInt(sampleRate).putInt(sampleRate * 2)
      .putShort(2).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    (0 until nSamples).foreach(_ => out.putShort(amp))
    out.array()
  }

  test("wav codec: format metadata, duration, closed-form RMS + envelope") {
    val amp: Short = 16384 // a/32768 = 0.5 exactly
    val (sr, ch, dur, rms, feats) = Multimodal.WavCodec.decode(
      constWav(nSamples = 8000, amp = amp))
    assert((sr, ch) == ((8000, 1)))
    assert(dur == 1000L) // 8000 samples at 8 kHz = 1 s
    assert(math.abs(rms - 0.5) < 1e-12)
    assert(feats.length == Multimodal.featureDim)
    assert(feats.forall(f => math.abs(f - 0.5f) < 1e-6f))
  }

  test("wav codec: sample count not divisible by the read buffer or bins") {
    // 1037 samples: exercises the split-sample carry across 8 KiB reads
    // (2074 bytes of data) and ragged envelope bins (1037 % 16 != 0).
    val (sr, _, dur, rms, feats) = Multimodal.WavCodec.decode(
      constWav(nSamples = 1037, amp = 8192))
    assert(sr == 8000)
    assert(dur == math.round(1037 * 1000.0 / 8000))
    assert(math.abs(rms - 0.25) < 1e-12)
    assert(feats.forall(f => math.abs(f - 0.25f) < 1e-6f))
  }

  test("wav codec: undecodable bytes fall back to the audio stub") {
    val junk = "certainly not audio".getBytes("UTF-8")
    val real = Multimodal.WavCodec.decode(junk)
    val stub = Multimodal.AudioCodecStub.decode(junk)
    assert((real._1, real._2, real._3, real._4, real._5.toSeq) ==
      ((stub._1, stub._2, stub._3, stub._4, stub._5.toSeq)))
  }

  test("synthWav round-trips through the real decoder deterministically") {
    val bytes = Multimodal.synthWav(seed = 42L, nSamples = 4000)
    assert(bytes.length == 44 + 8000)
    val d1 = Multimodal.WavCodec.decode(bytes)
    val d2 = Multimodal.WavCodec.decode(Multimodal.synthWav(42L, 4000))
    assert(d1._5.toSeq == d2._5.toSeq && d1._4 == d2._4)
    assert((d1._1, d1._2, d1._3) == ((8000, 1, 500L)))
    assert(d1._4 > 0.1 && d1._4 < 0.9) // a real signal, not silence/clipping
  }

  test("extractAudioFeatures: batched distributed decode == driver codec") {
    val audio = Multimodal.attach(
      Seq(20L, 21L, 22L).map(id =>
          (id, Multimodal.synthWav(id, 1600 + 160 * id.toInt)))
        .toDF("id", "bytes"),
      "id", "bytes", kind = "audio", mime = "audio/wav")
    val rows = Multimodal.extractAudioFeatures(audio, batchSize = 2)
      .collect().sortBy(_.media_id)
    assert(rows.map(_.media_id).toSeq == Seq(20L, 21L, 22L))
    rows.foreach { r =>
      val exp = Multimodal.WavCodec.decode(
        Multimodal.synthWav(r.media_id, 1600 + 160 * r.media_id.toInt))
      assert((r.sampleRate, r.channels, r.durationMs) ==
        ((exp._1, exp._2, exp._3)))
      assert(r.rms == exp._4 && r.features.toSeq == exp._5.toSeq)
    }
  }

  // ---- video container (GFV1): real per-frame imageio decode ---------

  test("video codec: closed-form dims, duration, luminance envelope") {
    // 4 frames of uniform gray 0, 85, 170, 255 at 2 fps, 8x6 px.
    val frames = Seq(0, 85, 170, 255).map(g =>
      png(8, 6)((_, _) => (g << 16) | (g << 8) | g))
    val packed = Multimodal.VideoCodec.pack(frames, fps = 2)
    val (w, h, n, dur, mean, feats) = Multimodal.VideoCodec.decode(packed)
    assert((w, h, n, dur) == ((8, 6, 4, 2000L)))
    // Gray means are exact multiples of the luminance weights' sum (1.0).
    assert(mean == (0.0 + 85 + 170 + 255) / 4)
    // 4 frames over 16 bins: each frame owns 4 consecutive bins.
    val expected = Seq(0, 85, 170, 255)
      .flatMap(g => Seq.fill(4)((g / 255.0).toFloat))
    assert(feats.toSeq == expected)
  }

  test("video codec: non-container bytes fall back to the stub") {
    val junk = "definitely not video".getBytes("UTF-8")
    val (w, h, n, dur, mean, feats) = Multimodal.VideoCodec.decode(junk)
    val (sw, sh, sm, sf) = Multimodal.MediaCodecStub.decode(junk)
    assert((w, h, n, dur, mean, feats.toSeq) ==
      ((sw, sh, 0, 0L, sm, sf.toSeq)))
  }

  test("synthVideo round-trips; distributed decode == driver codec") {
    val video = Multimodal.attach(
      Seq(30L, 31L, 32L).map(id =>
          (id, Multimodal.synthVideo(id, nFrames = 3 + id.toInt % 4)))
        .toDF("id", "bytes"),
      "id", "bytes", kind = "video", mime = "video/x-graft-frames")
    val rows = Multimodal.extractVideoFeatures(video, batchSize = 2)
      .collect().sortBy(_.media_id)
    rows.foreach { r =>
      val exp = Multimodal.VideoCodec.decode(
        Multimodal.synthVideo(r.media_id, 3 + r.media_id.toInt % 4))
      assert((r.width, r.height, r.nFrames, r.durationMs) ==
        ((exp._1, exp._2, exp._3, exp._4)))
      assert(r.meanIntensity == exp._5 && r.features.toSeq == exp._6.toSeq)
    }
  }

  test("sampleVideoFrames: every-Nth real frame, re-decodable, timed") {
    val packed = Multimodal.synthVideo(7L, nFrames = 9, fps = 3)
    val video = Multimodal.attach(Seq((40L, packed)).toDF("id", "bytes"),
      "id", "bytes", kind = "video", mime = "video/x-graft-frames")
    val sampled = Multimodal.sampleVideoFrames(video, everyN = 3)
      .collect().sortBy(_.frame_idx)
    assert(sampled.map(_.frame_idx).toSeq == Seq(0, 3, 6))
    assert(sampled.map(_.offset_ms).toSeq == Seq(0L, 1000L, 2000L))
    // Each sampled payload is a genuinely decodable standalone PNG whose
    // pixels equal the packed frame's.
    val Some((_, original)) = Multimodal.VideoCodec.frames(packed)
    sampled.foreach { f =>
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(f.content))
      assert(img != null && img.getWidth == 16 && img.getHeight == 16)
      assert(f.content.toSeq == original(f.frame_idx).toSeq)
    }
  }

  test("dHash: brightness-invariant, cell-tweak flips few bits, clusters separate, stub deterministic") {
    import graft.multimodal.Multimodal.DHashCodec.dhash
    import graft.multimodal.Multimodal.synthImage
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val base = dhash(synthImage(seed = 3))
    // A uniform brightness lift preserves every horizontal gradient:
    // the exact invariance that makes dHash a dedup key, not a checksum.
    assert(ham(base, dhash(synthImage(seed = 3, brightness = 16))) == 0)
    // Inverting one 4x4 grid cell can only flip the comparisons that
    // touch that cell (2 bits of 64).
    assert(ham(base, dhash(synthImage(seed = 3, tweak = true))) <= 2)
    // Different pattern seeds are far apart relative to the tweak.
    assert(ham(base, dhash(synthImage(seed = 4))) > 2)
    // Undecodable bytes: md5-derived, deterministic, input-sensitive.
    val junk = "definitely not a png".getBytes("UTF-8")
    assert(dhash(junk) == dhash(junk.clone()))
    assert(dhash(junk) != dhash("other junk".getBytes("UTF-8")))
    // Sub-grid images route to the stub, not a degenerate grid.
    assert(dhash(synthImage(seed = 1, w = 4, h = 4)) !=
      dhash(synthImage(seed = 1, w = 36, h = 32)))
  }

  test("hammingPairs64 banded join equals the all-pairs answer on dHashes") {
    import spark.implicits._
    val hashes = (0L until 120L)
      .map(i => (i, graft.multimodal.Multimodal.DHashCodec.dhash(
        graft.multimodal.Multimodal.synthImage(seed = i % 12,
          brightness = ((i / 12) % 3).toInt * 8, tweak = (i / 12) % 2 == 1))))
    val got = graft.operators.Dedup.hammingPairs64(
        hashes.toDF("id", "h"), "id", "h", maxHamming = 6)
      .as[(Long, Long, Int)].collect().toSet
    val want = (for {
      (a, ha) <- hashes; (b, hb) <- hashes
      if a < b && java.lang.Long.bitCount(ha ^ hb) <= 6
    } yield (a, b, java.lang.Long.bitCount(ha ^ hb))).toSet
    assert(got == want && want.nonEmpty)
  }

  test("audio fingerprint: gain-invariant (up to truncation noise), clusters separate, stub fallback") {
    import graft.multimodal.Multimodal
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val base = Multimodal.synthWav(seed = 5, nSamples = 4000)
    val fp = Multimodal.AudioFingerprint.fingerprint(base)
    // A re-levelled copy (half amplitude, integer truncation) moves the
    // fingerprint by at most the truncation noise on near-tied bins.
    val half = Multimodal.AudioFingerprint.fingerprint(
      Multimodal.scaleWavAmplitude(base, 1, 2))
    assert(ham(fp, half) <= 4)
    // An exact integer gain (x2 is exact for our synth amplitudes'
    // headroom? use 3/4 then 4/3 round trip instead: just assert a
    // different RECORDING is far away).
    val other = Multimodal.AudioFingerprint.fingerprint(
      Multimodal.synthWav(seed = 6, nSamples = 4000))
    assert(ham(fp, other) > 8)
    // Same bytes → same fingerprint; junk → deterministic md5 stub.
    assert(Multimodal.AudioFingerprint.fingerprint(base.clone()) == fp)
    val junk = "not audio".getBytes("UTF-8")
    assert(Multimodal.AudioFingerprint.fingerprint(junk) ==
      Multimodal.AudioFingerprint.fingerprint(junk.clone()))
  }

  test("video near-dup: frame voting joins aligned frames only") {
    import spark.implicits._
    import graft.multimodal.Multimodal
    // Videos 0,1: same pattern cluster (one tweaked); video 2: different
    // cluster; video 3: cluster 0 but frames REORDERED (tests alignment:
    // unaligned identical frames must NOT vote).
    def vid(seed: Long, tweak: Boolean) =
      Multimodal.synthVideoPatterned(seed, nFrames = 4, tweak = tweak)
    val reordered = {
      val Some((fps, fs)) = Multimodal.VideoCodec.frames(vid(0, false))
      Multimodal.VideoCodec.pack(fs.reverse, fps)
    }
    val media = Multimodal.attach(
      Seq((0L, vid(0, false)), (1L, vid(0, true)), (2L, vid(9, false)),
        (3L, reordered))
        .toDF("id", "bytes"), "id", "bytes", "video", "video/gfv1")
    val frameHashes = Multimodal.sampleVideoFrames(media, everyN = 1)
      .map(f => (f.media_id, f.frame_idx,
        Multimodal.DHashCodec.dhash(f.content)))
      .toDF("media_id", "frame_idx", "fhash")
    val pairs = graft.operators.Dedup.videoNearDupPairs(frameHashes,
        "media_id", "frame_idx", "fhash", maxHamming = 4, minMatching = 3)
      .as[(Long, Long, Long, Int)].collect()
      .map(p => (p._1, p._2)).toSet
    assert(pairs.contains((0L, 1L))) // tweak stays within the vote
    assert(!pairs.contains((0L, 2L)) && !pairs.contains((1L, 2L)))
    // Reversed frames share only the palindromic positions (if any) —
    // below the 3-frame vote.
    assert(!pairs.contains((0L, 3L)))
  }

  test("resizeToFit: longest edge capped, aspect preserved, no upscale") {
    val dims = Multimodal.extractFeatures(media).collect()
      .map(f => f.media_id -> (f.width, f.height)).toMap
    val resized = Multimodal.resizeToFit(media, maxDim = 100).collect()
    resized.foreach { r =>
      val (w, h) = dims(r.media_id)
      assert(math.max(r.width, r.height) <= 100)
      assert(r.scale <= 1.0 && r.scale > 0.0)
      if (math.max(w, h) <= 100) { // already small → untouched
        assert(r.scale == 1.0 && (r.width, r.height) == ((w, h)))
      } else { // aspect ratio preserved within floor rounding
        val expW = math.max(1, math.floor(w * r.scale).toInt)
        val expH = math.max(1, math.floor(h * r.scale).toInt)
        assert((r.width, r.height) == ((expW, expH)))
      }
    }
  }
}
