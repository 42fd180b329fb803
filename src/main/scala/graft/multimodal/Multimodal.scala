package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns: images/audio/video as opaque BINARY plus typed
  * metadata, with decode / feature-extraction / resize / frame-sampling as
  * batched per-partition transforms.
  *
  * The Spark-side plumbing here is real and tested — schema contract,
  * partition-preserving batched execution (the `mapPartitions`+grouped-batch
  * shape is the JVM analogue of a vectorized `mapInPandas` UDF: fixed-size
  * batches amortize per-record overhead), deterministic outputs. The codec
  * itself is a STUB: this container ships no image/audio libraries, so
  * [[MediaCodecStub]] derives pseudo pixel stats from the raw bytes
  * deterministically. Swapping in a real codec changes ONE function, not
  * the pipeline.
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

  /** STUB CODEC — deterministic fake. A real deployment replaces this with
    * an actual image/audio decode (e.g. TwelveMonkeys/JavaCV); the
    * signature — bytes in, fixed-dim features out — is the contract. */
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
        // One codec "context" per batch (stub: nothing to init).
        batch.iterator.map { m =>
          val (w, h, mean, feats) = MediaCodecStub.decode(m.content)
          MediaFeatures(m.media_id, m.kind, w, h, mean, feats)
        }
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

  /** Resize-to-fit plumbing: cap the longest edge at `maxDim`, never
    * upscale, preserve aspect ratio (floor rounding, min 1px). Batched
    * per-partition like [[extractFeatures]]; the stub "re-encode" passes
    * the original bytes through — a real codec swaps ONE line. */
  def resizeToFit(media: Dataset[MediaRow],
                  maxDim: Int, batchSize: Int = 64): Dataset[ResizedMedia] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { m =>
          val (w, h, _, _) = MediaCodecStub.decode(m.content)
          val scale = math.min(1.0, maxDim.toDouble / math.max(w, h))
          val nw = math.max(1, math.floor(w * scale).toInt)
          val nh = math.max(1, math.floor(h * scale).toInt)
          ResizedMedia(m.media_id, m.kind, nw, nh, scale, m.content)
        }
      }
    }
  }
}
