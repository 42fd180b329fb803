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
