package graft.multimodal

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column support (builder contract): image/audio/video
  * travel as opaque `BINARY` columns with typed metadata; decode /
  * feature-extract / resize / frame-sample run as batched
  * per-partition transforms.
  *
  * The actual codecs are STUBBED (this container has no image/audio
  * libraries): [[Codecs.decodeImageStub]] etc. derive deterministic fake
  * metadata from the bytes. Everything around the stub — schema,
  * encoders, partition-preserving batched execution, the binary
  * round-trip — is real and tested (MultimodalSpec, E03).
  *
  * In Scala the batched-vectorized shape is `mapPartitions` over an
  * iterator that is consumed in fixed-size batches (the JVM analogue of
  * `mapInPandas` batches); swapping the stub for a real codec changes
  * one function.
  */
object Multimodal {

  case class MediaRecord(doc_id: Long, media_type: String, payload: Array[Byte])
  case class ImageFeatures(doc_id: Long, byte_len: Int, sha256: String,
      width: Int, height: Int, channels: Int, brightness: Double)
  case class FrameSample(doc_id: Long, frame_idx: Int, frame_sha: String)

  object Codecs {
    /** STUB image decode — a real implementation would parse the codec
      * header; this derives (width, height, channels, mean-brightness)
      * deterministically from the payload bytes. */
    def decodeImageStub(payload: Array[Byte]): (Int, Int, Int, Double) = {
      val n = payload.length
      val w = 64 + (if (n > 0) (payload(0) & 0x7f) else 0)
      val h = 64 + (if (n > 1) (payload(1) & 0x7f) else 0)
      val mean = if (n == 0) 0.0
        else payload.iterator.map(b => (b & 0xff).toDouble).sum / n / 255.0
      (w, h, 3, math.rint(mean * 1e6) / 1e6)
    }

    /** STUB resize — keeps bytes opaque; real codec would re-encode. */
    def resizeStub(payload: Array[Byte], maxBytes: Int): Array[Byte] =
      payload.take(maxBytes)

    /** STUB frame sampling — every `stride`-th 16-byte window is a
      * "frame". */
    def sampleFramesStub(payload: Array[Byte], stride: Int): Seq[Array[Byte]] =
      payload.grouped(16).zipWithIndex.collect {
        case (frame, i) if i % stride == 0 => frame
      }.toSeq

    def sha256Hex(bytes: Array[Byte]): String =
      MessageDigest.getInstance("SHA-256").digest(bytes)
        .map(b => f"$b%02x").mkString
  }

  /** Build a media table from documents: the UTF-8 payload stands in for
    * an encoded image. BinaryType column + typed metadata. */
  def mediaTable(s: SparkSession, dir: String): Dataset[MediaRecord] = {
    import s.implicits._
    graft.Tables(s, dir, "documents")
      .select($"doc_id", lit("image/fake").as("media_type"),
        encode($"text", "UTF-8").as("payload"))
      .as[MediaRecord]
  }

  /** Batched per-partition feature extraction. The `grouped(batchSize)`
    * shape is the integration point for a VECTORIZED decoder (real
    * codecs amortize per-call setup across a batch); it also means the
    * task holds up to `batchSize` raw payloads at once — size it DOWN
    * when payloads are MBs (a per-record codec could use batchSize=1
    * for strictly minimal memory; the stub decodes per record either
    * way, so results never depend on the batch split). */
  def extractImageFeatures(media: Dataset[MediaRecord],
      batchSize: Int = 64): Dataset[ImageFeatures] = {
    require(batchSize > 0, s"batchSize must be positive: $batchSize")
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.map { rec =>
          val (w, h, c, bright) = Codecs.decodeImageStub(rec.payload)
          ImageFeatures(rec.doc_id, rec.payload.length,
            Codecs.sha256Hex(rec.payload), w, h, c, bright)
        }
      }
    }
  }

  /** Frame sampling: one media row → many frame rows (generator shape). */
  def sampleFrames(media: Dataset[MediaRecord], stride: Int = 4): Dataset[FrameSample] = {
    // driver-side argument error, not an executor-side ArithmeticException
    // (i % 0) mid-job; a negative stride would silently sample at |stride|
    require(stride > 0, s"stride must be positive: $stride")
    import media.sparkSession.implicits._
    media.flatMap { rec =>
      Codecs.sampleFramesStub(rec.payload, stride).zipWithIndex.map {
        case (frame, i) => FrameSample(rec.doc_id, i, Codecs.sha256Hex(frame))
      }
    }
  }
}
