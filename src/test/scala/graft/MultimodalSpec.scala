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
